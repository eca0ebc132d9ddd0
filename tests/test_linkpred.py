"""Third references for q_link_prediction and q_degree_assortativity:
pure-Python recomputation of the exact integer scores over the same
co-purchase graph, plus tiny-graph edge cases for the candidate set and
the zero-variance assortativity guard."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from nyc_landmarks_datalake_spark import registry
from nyc_landmarks_datalake_spark.operators.graph import LP_TOPK

registry.load_all()

_LN2_PPM = 693_147


def _copurchase_und(sf_dir: str) -> list[tuple[int, int]]:
    return duckdb.sql(
        f"""
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM '{sf_dir}/lineitem.parquet' a
        JOIN '{sf_dir}/lineitem.parquet' b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        """
    ).fetchall()


def _ln_ppm(deg: int) -> int:
    """The shared fixed-point ln chain (lp_weight_steps) in Python //."""
    k = deg.bit_length() - 1
    m = (deg * 1_000_000) // (1 << k)
    z = ((m - 1_000_000) * 1_000_000) // (m + 1_000_000)
    z2 = (z * z) // 1_000_000
    z3 = (z2 * z) // 1_000_000
    z4 = (z2 * z2) // 1_000_000
    z5 = (z4 * z) // 1_000_000
    z7 = (z4 * z3) // 1_000_000
    z9 = ((z4 * z4) // 1_000_000 * z) // 1_000_000
    return k * _LN2_PPM + 2 * (z + z3 // 3 + z5 // 5 + z7 // 7 + z9 // 9)


def _python_link_prediction(edges):
    adj: dict[int, set[int]] = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    deg = {n: len(s) for n, s in adj.items()}
    und = set(edges)
    scores: dict[tuple[int, int], list[int]] = {}
    for w, nbrs in adj.items():
        aa_w = 1_000_000_000_000 // _ln_ppm(deg[w])
        ra_w = 1_000_000_000_000 // deg[w]
        snb = sorted(nbrs)
        for i, x in enumerate(snb):
            for y in snb[i + 1 :]:
                row = scores.setdefault((x, y), [0, 0, 0])
                row[0] += 1
                row[1] += aa_w
                row[2] += ra_w
    out = []
    for (u, v), (cn, aa, ra) in scores.items():
        if (u, v) in und:
            continue
        jac = cn * 1_000_000 // (deg[u] + deg[v] - cn)
        out.append((u, v, cn, jac, aa, ra, deg[u] * deg[v]))
    out.sort(key=lambda r: (-r[4], r[0], r[1]))
    return out[:LP_TOPK]


def test_link_prediction_matches_pure_python_reference(spark, sf_small):
    edges = _copurchase_und(sf_small)
    exp = _python_link_prediction(edges)
    got = [
        (r.u, r.v, r.cn, r.jaccard_ppm, r.aa_e6, r.ra_e12, r.pa)
        for r in registry.QUERIES["q_link_prediction"](
            spark, sf_small
        ).collect()
    ]
    assert got == exp
    # candidates are genuinely non-edges and non-degenerate
    und = set(edges)
    assert all((u, v) not in und for u, v, *_ in got)
    assert len({r[4] for r in got}) > 3  # aa separates the candidates


def test_link_prediction_square_graph(spark):
    """On a 4-cycle 1-2-3-4-1 the only distance-2 pairs are the two
    diagonals, each with cn=2, jaccard=2/2, aa=2/ln2, ra=2/2, pa=4."""
    from pyspark.sql import functions as F

    from nyc_landmarks_datalake_spark.operators import graph as G

    sq = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], ["u", "v"]
    )
    orig = G.copurchase_und
    G.copurchase_und = lambda _spark, _sf: sq
    try:
        rows = sorted(
            (r.u, r.v, r.cn, r.jaccard_ppm, r.aa_e6, r.ra_e12, r.pa)
            for r in registry.QUERIES["q_link_prediction"](spark, "").collect()
        )
    finally:
        G.copurchase_und = orig
    aa_w = 1_000_000_000_000 // _ln_ppm(2)
    assert rows == [
        (1, 3, 2, 1_000_000, 2 * aa_w, 1_000_000_000_000, 4),
        (2, 4, 2, 1_000_000, 2 * aa_w, 1_000_000_000_000, 4),
    ]
    _ = F  # silence unused-import lint paths


def test_link_prediction_chunked_equals_whole(spark, sf_small):
    """The native-scale execution path: candidates partition by their
    smaller endpoint u, so merging per-chunk top-Ks (same order) equals
    the whole-space top-K exactly — in BOTH engines. This is the
    formulation-equivalence pin behind verify_sf10_tail --checks
    linkpred (the sf1+ path where the whole-space wedge aggregation
    exceeds a single box)."""
    import pandas as pd

    from nyc_landmarks_datalake_spark.operators.graph import (
        _lp_sql,
        link_prediction_frame,
    )
    from tests.oracle_harness import duckdb_conn

    n_chunks = 4
    whole = registry.QUERIES["q_link_prediction"](spark, sf_small).toPandas()
    parts = [
        link_prediction_frame(spark, sf_small, chunk=(c, n_chunks)).toPandas()
        for c in range(n_chunks)
    ]
    merged = (
        pd.concat(parts)
        .sort_values(["aa_e6", "u", "v"], ascending=[False, True, True])
        .head(LP_TOPK)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(merged, whole.reset_index(drop=True))
    con = duckdb_conn(sf_small)
    o_parts = [
        con.execute(_lp_sql(chunk=(c, n_chunks))).fetchdf()
        for c in range(n_chunks)
    ]
    o_merged = (
        pd.concat(o_parts)
        .sort_values(["aa_e6", "u", "v"], ascending=[False, True, True])
        .head(LP_TOPK)
        .reset_index(drop=True)
    )
    o_whole = con.execute(_lp_sql()).fetchdf().reset_index(drop=True)
    pd.testing.assert_frame_equal(o_merged, o_whole)


def _python_assortativity(edges):
    deg: dict[int, int] = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    m2 = sxy = sx = sxx = 0
    for u, v in edges:
        for a, b in ((u, v), (v, u)):
            m2 += 1
            sxy += deg[a] * deg[b]
            sx += deg[a]
            sxx += deg[a] * deg[a]
    num = m2 * sxy - sx * sx
    den = m2 * sxx - sx * sx
    if den == 0:
        r = None
    elif num < 0:
        r = -((-num * 1_000_000) // den)
    else:
        r = (num * 1_000_000) // den
    return len(deg), m2 // 2, r


def test_assortativity_matches_pure_python_reference(spark, sf_small):
    edges = _copurchase_und(sf_small)
    exp = _python_assortativity(edges)
    row = registry.QUERIES["q_degree_assortativity"](
        spark, sf_small
    ).collect()[0]
    assert (row.n_nodes, row.n_edges, row.assortativity_ppm) == exp


def test_assortativity_regular_graph_is_null(spark):
    """A cycle is 2-regular: zero degree variance, r undefined → NULL
    (the den=0 guard, identical in both engines)."""
    from nyc_landmarks_datalake_spark.operators import graph as G

    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], ["u", "v"]
    )
    orig = G.copurchase_und
    G.copurchase_und = lambda _spark, _sf: cyc
    try:
        row = registry.QUERIES["q_degree_assortativity"](
            spark, ""
        ).collect()[0]
    finally:
        G.copurchase_und = orig
    assert (row.n_nodes, row.n_edges, row.assortativity_ppm) == (4, 4, None)


def test_assortativity_star_graph_is_minus_one(spark):
    """A star is maximally disassortative: r = −1 exactly (−1e6 ppm)."""
    from nyc_landmarks_datalake_spark.operators import graph as G

    star = spark.createDataFrame([(0, i) for i in range(1, 6)], ["u", "v"])
    orig = G.copurchase_und
    G.copurchase_und = lambda _spark, _sf: star
    try:
        row = registry.QUERIES["q_degree_assortativity"](
            spark, ""
        ).collect()[0]
    finally:
        G.copurchase_und = orig
    assert row.assortativity_ppm == -1_000_000
