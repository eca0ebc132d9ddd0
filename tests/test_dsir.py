"""DSIR importance weighting (operators/dsir.py)."""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb

from nyc_landmarks_datalake_spark import registry
from nyc_landmarks_datalake_spark.operators.dsir import K_DSIR, TOPK
from nyc_landmarks_datalake_spark.operators.textops import STOPWORDS
from nyc_landmarks_datalake_spark.plans.audit import audit

registry.load_all()


def _py_scored(sf_dir: str) -> list[tuple]:
    """(doc_id, lang, y, importance) — hashlib + plain ints only."""
    rows = duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    stop = set(STOPWORDS)

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % K_DSIR

    docs = []
    n_all: Counter[int] = Counter()
    n_good: Counter[int] = Counter()
    for doc_id, lang, text in rows:
        toks = [w for w in text.split(" ") if w != ""]
        y = (
            1
            if (
                sum(1 for w in toks if w in stop) * 12 >= len(toks)
                and len(set(toks)) * 2 >= len(toks)
            )
            else -1
        )
        grams = toks + [
            f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
        ]
        bs = [bucket(g) for g in grams]
        for b in bs:
            n_all[b] += 1
            if y == 1:
                n_good[b] += 1
        docs.append((doc_id, lang, y, bs))

    t_all = sum(n_all.values())
    t_good = sum(n_good.values())
    delta = {
        b: n_good.get(b, 0) * 1_000_000 // t_good
        - n_all[b] * 1_000_000 // t_all
        for b in n_all
    }
    return [
        (doc_id, lang, y, sum(delta[b] for b in bs))
        for doc_id, lang, y, bs in docs
    ]


def test_importance_census_matches_pure_python(spark, sf_small):
    scored = _py_scored(sf_small)
    exp: dict[str, list] = {}
    for _id, lang, y, imp in scored:
        c = exp.setdefault(lang, [0, 0, 0, 0])
        c[0] += 1
        c[1] += imp
        c[2] += imp > 0
        c[3] += y == 1
    got = {
        r.lang: [r.n_docs, r.sum_importance, r.n_positive, r.n_label_good]
        for r in registry.QUERIES["q_dsir_importance"](
            spark, sf_small
        ).collect()
    }
    assert got == exp


def test_topk_selection_matches_pure_python(spark, sf_small):
    scored = _py_scored(sf_small)
    exp = sorted(scored, key=lambda d: (-d[3], d[0]))[:TOPK]
    got = [
        (r.doc_id, r.lang, r.importance)
        for r in registry.QUERIES["q_dsir_select_topk"](
            spark, sf_small
        ).collect()
    ]
    assert got == [(d, lg, imp) for d, lg, y, imp in exp]
    # the selection must actually up-weight the target class
    sel_good = sum(1 for d, lg, y, imp in exp if y == 1)
    all_good = sum(1 for d in scored if d[2] == 1)
    assert sel_good / TOPK > all_good / len(scored)


def test_scorer_and_selection_plans(spark, sf_oracle):
    # scoring = BROADCAST HASH JOIN of gram instances to the K-row
    # delta table (O(1) lookups — a K=1024 map-literal fold is O(K)
    # per lookup and took 190 s at sf1); selection = TakeOrdered,
    # never a global sort
    df = registry.QUERIES["q_dsir_select_topk"](spark, sf_oracle)
    a = audit(df)
    assert not a.has_python_eval
    assert a.broadcast_hash_joins >= 1, a
    # the score-to-corpus attach is a doc_id-keyed merge join — the
    # co-partitioned plan you WANT at scale; only the delta attach
    # must stay broadcast
    assert a.sort_merge_joins <= 1, a
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
