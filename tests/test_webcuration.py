"""Semantics pins for the web-curation tier (operators/webcuration.py).
Oracle value parity is covered by tests/test_oracle_parity.py."""

from __future__ import annotations

from nyc_landmarks_datalake_spark import registry
from nyc_landmarks_datalake_spark.sources.catalog import table

registry.load_all()


def test_url_aliases_collapse(spark, sf_small):
    """Port/param-order variants of the same logical URL must dedupe:
    canonical distinct < raw distinct overall, and never exceeds it."""
    rows = registry.QUERIES["q_url_canonicalize"](spark, sf_small).collect()
    assert rows
    assert all(r.n_canon_distinct <= r.n_raw_distinct for r in rows)
    assert sum(r.n_canon_distinct for r in rows) < sum(
        r.n_raw_distinct for r in rows
    )
    assert all(r.host == r.host.lower() for r in rows)


def test_pii_found_and_redacted(spark, sf_small):
    """Every constructed record embeds exactly one email and one phone;
    redaction must shrink/normalize them away (length strictly drops —
    '<EMAIL>' is shorter than any constructed address)."""
    rows = registry.QUERIES["q_pii_redaction"](spark, sf_small).collect()
    n_docs = sum(r.n_docs for r in rows)
    assert n_docs == table(spark, sf_small, "customer").count()
    assert sum(r.n_emails for r in rows) == n_docs
    assert sum(r.n_phones for r in rows) == n_docs


def test_length_buckets_partition_the_corpus(spark, sf_small):
    """NTILE(16): every doc in exactly one bucket, bucket sizes within
    one of each other, waste nonnegative and bounded by n*(max-min)."""
    rows = registry.QUERIES["q_length_bucket_batching"](spark, sf_small).collect()
    assert len(rows) == 16
    total = sum(r.n_docs for r in rows)
    assert total == table(spark, sf_small, "documents").count()
    sizes = [r.n_docs for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for r in rows:
        assert 0 <= r.padding_waste <= r.n_docs * (r.max_len - r.min_len)


def test_point_in_polygon_rejects_bbox_hits(spark, sf_oracle):
    """The concave star must reject a substantial share of its bbox
    candidates (containment is a real test, not bbox echo), and a
    pure-Python ray caster must agree on the totals."""
    rows = registry.QUERIES["q_point_in_polygon"](spark, sf_oracle).collect()
    n_cand = sum(r.n_candidates for r in rows)
    n_in = sum(r.n_inside for r in rows)
    assert 0 < n_in < n_cand

    # independent scalar reference on the full candidate set
    from nyc_landmarks_datalake_spark.operators.geometry_ops import _STAR_EDGES

    import duckdb

    con = duckdb.connect()
    cust = con.sql(
        f"SELECT c_custkey FROM '{sf_oracle}/customer.parquet'"
    ).fetchall()
    supp = con.sql(
        f"SELECT s_suppkey FROM '{sf_oracle}/supplier.parquet'"
    ).fetchall()

    def inside(px, py, cx, cy, s):
        c = 0
        for (dx1, dy1), (dx2, dy2) in _STAR_EDGES:
            x1, y1 = cx + dx1 * s, cy + dy1 * s
            x2, y2 = cx + dx2 * s, cy + dy2 * s
            if (y1 > py) != (y2 > py):
                d = y2 - y1
                u = (x1 - px) * d + (py - y1) * (x2 - x1)
                if (d > 0 and u > 0) or (d < 0 and u < 0):
                    c += 1
        return c % 2 == 1

    want = 0
    polys = [
        (k, 10000 + k * 48611 % 80000, 10000 + k * 15485863 % 30000, 1 + k % 3)
        for (k,) in supp
    ]
    for (ck,) in cust:
        px, py = ck * 7919 % 100000, ck * 104729 % 50000
        for _pid, cx, cy, s in polys:
            if abs(px - cx) <= 2000 * s and abs(py - cy) <= 2000 * s:
                if inside(px, py, cx, cy, s):
                    want += 1
    assert n_in == want
