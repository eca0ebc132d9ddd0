"""Fellegi-Sunter record linkage (operators/linkage.py): pure-Python
third reference for the full pipeline.

The Python side generates candidates by BRUTE-FORCE levenshtein <= 1
over all A x B pairs, while the Spark side goes through FastSS
deletion-neighborhood blocking — census equality therefore also proves
the blocking is complete (no distance-<=1 pair missed) and sound
(distance-2 shared-variant pairs discarded).
"""

from __future__ import annotations

import hashlib

import duckdb

from nyc_landmarks_datalake_spark import registry
from nyc_landmarks_datalake_spark.operators.linkage import (
    CORRUPT_PCT,
    LABEL_MOD,
    LABEL_TAKE,
    ODDS_CAP_PPM,
    T_MATCH,
    T_NONMATCH_INV,
)

registry.load_all()


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _lev_le1(a: str, b: str) -> bool:
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def _clamp(agree: int, n: int) -> int:
    return min(999_999, max(1, (agree + 1) * 1_000_000 // (n + 2)))


def _reference(sf_dir: str):
    rows = duckdb.sql(
        "SELECT c_custkey, c_name, c_mktsegment, c_nationkey, c_acctbal"
        f" FROM '{sf_dir}/customer.parquet'"
    ).fetchall()
    a_recs = {r[0]: (r[1], r[2], int(r[3]), r[4]) for r in rows}
    b_recs = {}
    for cid, (name, seg, nat, bal) in a_recs.items():
        r_nm, r_sg, r_bl = _h(f"{cid}:nm"), _h(f"{cid}:sg"), _h(f"{cid}:bl")
        if r_nm % 100 < CORRUPT_PCT:
            p = (r_nm // 100) % len(name)
            name = name[:p] + "x" + name[p + 1 :]
        if r_sg % 100 < CORRUPT_PCT:
            seg = "UNKNOWN"
        if r_bl % 100 < CORRUPT_PCT:
            bal = bal + 1000.0
        b_recs[cid] = (name, seg, nat, bal)

    gams = []
    for ida, ra in a_recs.items():
        for idb, rb in b_recs.items():
            if not _lev_le1(ra[0], rb[0]):
                continue
            gams.append(
                (
                    ida,
                    idb,
                    tuple(int(ra[i] == rb[i]) for i in range(4)),
                    int(ida == idb),
                    int(_h(f"{ida}:{idb}") % LABEL_MOD < LABEL_TAKE),
                )
            )

    lab = [(g, m) for _, _, g, m, is_lab in gams if is_lab]
    n_m = sum(m for _, m in lab)
    n_u = len(lab) - n_m
    mw = [
        _clamp(sum(g[i] for g, m in lab if m), n_m) for i in range(4)
    ]
    uw = [
        _clamp(sum(g[i] for g, m in lab if not m), n_u) for i in range(4)
    ]

    census = {}
    for ida, idb, g, m, _ in gams:
        c = census.setdefault(g, [0, 0, None])
        c[0] += 1
        c[1] += m
        s = f"{ida}:{idb}"
        c[2] = s if c[2] is None else min(c[2], s)

    out = {}
    for g, (n_pairs, n_true, sample) in census.items():
        num = den = 1
        for i in range(4):
            num *= mw[i] if g[i] else 1_000_000 - mw[i]
            den *= uw[i] if g[i] else 1_000_000 - uw[i]
        odds = (
            ODDS_CAP_PPM
            if num > den * 1_000_000_000
            else num * 1_000_000 // den
        )
        cls = (
            "match"
            if num >= den * T_MATCH
            else ("non_match" if num * T_NONMATCH_INV <= den else "possible")
        )
        pat = "".join("A" if x else "D" for x in g)
        out[pat] = (odds, cls, n_pairs, n_true, sample)
    return out, (n_m, n_u, mw, uw)


def test_record_linkage_matches_pure_python(spark, sf_small):
    exp, _ = _reference(sf_small)
    got = {
        r.pattern: (
            r.odds_ppm,
            r.cls,
            r.n_pairs,
            r.n_true_pairs,
            r.sample_pair,
        )
        for r in registry.QUERIES["q_record_linkage"](
            spark, sf_small
        ).collect()
    }
    assert got == exp
    # the labeled-subset estimator must classify every true pair seen at
    # this sf as match or possible, and every all-agree pattern as match
    assert exp["AAAA"][1] == "match"


def test_linkage_weights_match_pure_python(spark, sf_small):
    _, (n_m, n_u, mw, uw) = _reference(sf_small)
    fields = ["name", "segment", "nation", "acctbal"]
    exp = {}
    for i, f in enumerate(fields):
        exp[f] = (
            mw[i],
            uw[i],
            mw[i] * 1_000_000 // uw[i],
            (1_000_000 - mw[i]) * 1_000_000 // (1_000_000 - uw[i]),
            n_m,
            n_u,
        )
    got = {
        r.field: (
            r.m_ppm,
            r.u_ppm,
            r.agree_lr_ppm,
            r.disagree_lr_ppm,
            r.n_labeled_match,
            r.n_labeled_nonmatch,
        )
        for r in registry.QUERIES["q_linkage_weights"](
            spark, sf_small
        ).collect()
    }
    assert got == exp
