"""Quality-classifier training (operators/quality_clf.py).

The DuckDB oracle already gates both queries (test_oracle_parity); the
tests here add a THIRD, pure-Python reference for the full training
trajectory (so a shared cross-engine SQL bug can't hide), plus the
plan pins the 100 TB posture depends on.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb

from nyc_landmarks_datalake_spark import registry
from nyc_landmarks_datalake_spark.operators.quality_clf import (
    K_BUCKETS,
    N_ITERS,
    clf_chain,
)
from nyc_landmarks_datalake_spark.operators.textops import STOPWORDS
from nyc_landmarks_datalake_spark.plans.audit import audit

registry.load_all()


def _py_reference(sf_dir: str) -> tuple[dict[int, int], dict[str, tuple]]:
    """Independent batch-perceptron implementation: hashlib md5, plain
    Python integers, no SQL engine anywhere. Returns (weights,
    per-lang apply census)."""
    rows = duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    stop = set(STOPWORDS)

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % K_BUCKETS

    docs = []
    for doc_id, lang, text in rows:
        toks = [w for w in text.split(" ") if w != ""]
        good = (
            sum(1 for w in toks if w in stop) * 12 >= len(toks)
            and len(set(toks)) * 2 >= len(toks)
        )
        grams = toks + [
            f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
        ]
        feats = Counter(bucket(g) for g in grams)
        docs.append((doc_id, lang, 1 if good else -1, feats))

    w = dict.fromkeys(range(K_BUCKETS), 0)
    for _ in range(N_ITERS):
        grad: Counter[int] = Counter()
        for _id, _lang, y, feats in docs:
            if feats and y * sum(w[b] * x for b, x in feats.items()) <= 0:
                for b, x in feats.items():
                    grad[b] += y * x
        for b, g in grad.items():
            w[b] += g

    census: dict[str, list] = {}
    for _id, lang, y, feats in docs:
        score = sum(w[b] * x for b, x in feats.items())
        c = census.setdefault(lang, [0, 0, 0, 0])
        c[0] += 1
        c[1] += y == 1
        c[2] += score > 0
        c[3] += score
    return w, {k: tuple(v) for k, v in census.items()}


def test_train_matches_pure_python_reference(spark, sf_small):
    exp_w, _ = _py_reference(sf_small)
    got = {
        r.bucket: r.weight
        for r in registry.QUERIES["q_quality_clf_train"](
            spark, sf_small
        ).collect()
    }
    assert got == exp_w


def test_apply_matches_pure_python_reference(spark, sf_small):
    _, exp_census = _py_reference(sf_small)
    got = {
        r.lang: (r.n_docs, r.n_label_good, r.n_pred_good, r.sum_score)
        for r in registry.QUERIES["q_quality_clf_apply"](
            spark, sf_small
        ).collect()
    }
    assert got == exp_census


def test_labels_not_degenerate(spark, sf_small):
    # both classes must exist or the trained vector is just the class
    # centroid; and the learned weights must be non-trivial
    lab, _feat, w = clf_chain(spark, sf_small)
    ys = {r.y for r in lab.select("y").distinct().collect()}
    assert ys == {1, -1}
    weights = [r.w for r in w.collect()]
    assert len(weights) == K_BUCKETS
    assert any(x != 0 for x in weights)
    assert all(isinstance(x, int) for x in weights)  # BIGINT end to end


def test_train_weight_vector_stays_broadcast(spark, sf_oracle):
    # rebuild one checkpoint-free iteration and pin its plan: the
    # weight vector attaches to the feature relation as a BROADCAST
    # hash join (never a feature-relation shuffle on b), and nothing
    # anywhere is Python (eager checkpoints hide the registered
    # query's per-iteration plans — the repo-wide ExistingRDD trap)
    from pyspark.sql import functions as F

    from nyc_landmarks_datalake_spark.operators.quality_clf import _lab_feat

    _lab, feat = _lab_feat(spark, sf_oracle)
    w0 = spark.range(K_BUCKETS).select(
        F.col("id").cast("long").alias("b"),
        F.lit(0).cast("long").alias("w"),
    )
    scores = (
        feat.join(F.broadcast(w0), "b")
        .groupBy("doc_id", "y")
        .agg(F.sum(F.col("x") * F.col("w")).cast("long").alias("score"))
    )
    a = audit(scores)
    assert not a.has_python_eval
    assert a.broadcast_hash_joins >= 1, a
    assert a.sort_merge_joins == 0, a


def test_apply_scorer_is_map_side(spark, sf_oracle):
    # the registered apply query: zero Python, and the scorer itself
    # contributes no shuffle — the only exchanges are the one-row
    # weight-map fold and the 5-group lang census
    df = registry.QUERIES["q_quality_clf_apply"](spark, sf_oracle)
    a = audit(df)
    assert not a.has_python_eval
    assert a.broadcast_exchanges >= 1, a
    assert a.exchanges <= 3, a


def test_eval_matches_pure_python_reference(spark, sf_small):
    # third implementation of the holdout protocol: train on the md5
    # 4/5 fold with plain-integer perceptron steps, confusion-census
    # the held-out 1/5
    rows = duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    stop = set(STOPWORDS)

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % K_BUCKETS

    def is_test(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:15]
        return int(h, 16) % 5 == 0

    docs = []
    for doc_id, lang, text in rows:
        toks = [w for w in text.split(" ") if w != ""]
        good = (
            sum(1 for w in toks if w in stop) * 12 >= len(toks)
            and len(set(toks)) * 2 >= len(toks)
        )
        grams = toks + [
            f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
        ]
        docs.append(
            (doc_id, lang, 1 if good else -1, Counter(map(bucket, grams)))
        )

    train = [d for d in docs if not is_test(d[0])]
    w = dict.fromkeys(range(K_BUCKETS), 0)
    for _ in range(N_ITERS):
        grad: Counter[int] = Counter()
        for _id, _lang, y, feats in train:
            if feats and y * sum(w[b] * x for b, x in feats.items()) <= 0:
                for b, x in feats.items():
                    grad[b] += y * x
        for b, g in grad.items():
            w[b] += g

    exp: dict[str, list] = {}
    for doc_id, lang, y, feats in docs:
        if not is_test(doc_id):
            continue
        pred = sum(w[b] * x for b, x in feats.items()) > 0
        c = exp.setdefault(lang, [0, 0, 0, 0, 0])
        c[0] += 1
        c[1] += y == 1 and pred
        c[2] += y == -1 and pred
        c[3] += y == -1 and not pred
        c[4] += y == 1 and not pred
    expected = {
        k: (n, tp, fp, tn, fn, (tp + tn) * 1_000_000 // n)
        for k, (n, tp, fp, tn, fn) in exp.items()
    }
    got = {
        r.lang: (r.n_test, r.tp, r.fp, r.tn, r.fn, r.accuracy_ppm)
        for r in registry.QUERIES["q_quality_clf_eval"](
            spark, sf_small
        ).collect()
    }
    assert got == expected


def test_model_select_matches_pure_python_reference(spark, sf_small):
    # third implementation of multi-epoch training + holdout selection
    from nyc_landmarks_datalake_spark.operators.quality_clf import N_EPOCHS

    rows = duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    stop = set(STOPWORDS)

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % K_BUCKETS

    def is_test(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:15]
        return int(h, 16) % 5 == 0

    docs = []
    for doc_id, lang, text in rows:
        toks = [w for w in text.split(" ") if w != ""]
        good = (
            sum(1 for w in toks if w in stop) * 12 >= len(toks)
            and len(set(toks)) * 2 >= len(toks)
        )
        grams = toks + [
            f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
        ]
        docs.append(
            (doc_id, 1 if good else -1, Counter(map(bucket, grams)))
        )
    train = [d for d in docs if not is_test(d[0])]
    test = [d for d in docs if is_test(d[0])]

    w = dict.fromkeys(range(K_BUCKETS), 0)
    expected = {}
    for e in range(1, N_EPOCHS + 1):
        grad: Counter[int] = Counter()
        for _id, y, feats in train:
            if feats and y * sum(w[b] * x for b, x in feats.items()) <= 0:
                for b, x in feats.items():
                    grad[b] += y * x
        for b, g in grad.items():
            w[b] += g
        n_correct = sum(
            1
            for _id, y, feats in test
            if (y == 1) == (sum(w[b] * x for b, x in feats.items()) > 0)
        )
        expected[e] = (n_correct, len(test), n_correct * 1_000_000 // len(test))
    best = max(expected, key=lambda e: (expected[e][0], -e))

    got = {
        r.epoch: (r.n_correct, r.n_test, r.accuracy_ppm, r.selected)
        for r in registry.QUERIES["q_quality_clf_model_select"](
            spark, sf_small
        ).collect()
    }
    assert got == {
        e: (*v, e == best) for e, v in expected.items()
    }
    assert sum(1 for v in got.values() if v[3]) == 1  # exactly one winner
