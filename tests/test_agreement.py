"""Eval statistics (operators/agreement.py) and classifier k-fold CV
(quality_clf.q_quality_clf_cv): pure-Python third references.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb

from nyc_landmarks_datalake_spark import registry
from nyc_landmarks_datalake_spark.operators.quality_clf import (
    K_BUCKETS,
    N_FOLDS,
    N_ITERS,
)
from nyc_landmarks_datalake_spark.operators.textops import STOPWORDS

registry.load_all()


def test_kappa_matches_pure_python_reference(spark, sf_small):
    rows = duckdb.sql(
        f"SELECT lang, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    stop = set(STOPWORDS)
    cm: dict[str, list] = {}
    for lang, text in rows:
        toks = [w for w in text.split(" ") if w != ""]
        ra = sum(1 for w in toks if w in stop) * 12 >= len(toks)
        rb = len(set(toks)) * 2 >= len(toks)
        c = cm.setdefault(lang, [0, 0, 0, 0, 0])
        c[0] += 1
        c[1] += ra and rb
        c[2] += ra and not rb
        c[3] += not ra and rb
        c[4] += not ra and not rb
    exp = {}
    for lang, (n, bg, oa, ob, nt) in cm.items():
        pe_num = (bg + oa) * (bg + ob) + (nt + ob) * (nt + oa)
        den = n * n - pe_num
        kappa = 0 if den == 0 else (n * (bg + nt) - pe_num) * 1_000_000 // den
        # python floor != truncation for negatives: emulate trunc
        if den != 0:
            num = (n * (bg + nt) - pe_num) * 1_000_000
            q = abs(num) // abs(den)
            kappa = q if (num >= 0) == (den >= 0) else -q
        exp[lang] = (n, bg, oa, ob, nt, kappa)
    got = {
        r.lang: (
            r.n_docs,
            r.both_good,
            r.only_a,
            r.only_b,
            r.neither,
            r.kappa_ppm,
        )
        for r in registry.QUERIES["q_rater_agreement_kappa"](
            spark, sf_small
        ).collect()
    }
    assert got == exp


def test_spearman_matches_pure_python_reference(spark, sf_small):
    spend = {
        r[0]: (r[1], r[2])
        for r in duckdb.sql(f"""
            SELECT c.c_custkey, c.c_acctbal,
                   COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(30,6))), 0)
                       AS s
            FROM '{sf_small}/customer.parquet' c
            LEFT JOIN '{sf_small}/orders.parquet' o
              ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        """).fetchall()
    }
    by_bal = sorted(spend, key=lambda k: (spend[k][0], k))
    by_spend = sorted(spend, key=lambda k: (spend[k][1], k))
    r1 = {k: i + 1 for i, k in enumerate(by_bal)}
    r2 = {k: i + 1 for i, k in enumerate(by_spend)}
    n = len(spend)
    d2 = sum((r1[k] - r2[k]) ** 2 for k in spend)
    den = n * (n * n - 1)
    num = (den - 6 * d2) * 1_000_000
    rho = (
        0
        if n < 2
        else (abs(num) // den if num >= 0 else -(abs(num) // den))
    )
    row = registry.QUERIES["q_spearman_corr"](spark, sf_small).collect()[0]
    assert (row.n_customers, row.sum_d2, row.rho_ppm) == (n, d2, rho)


def test_cv_matches_pure_python_reference(spark, sf_small):
    rows = duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    stop = set(STOPWORDS)

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % K_BUCKETS

    def fold(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:15]
        return int(h, 16) % N_FOLDS

    docs = []
    for doc_id, _lang, text in rows:
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

    exp = {}
    for j in range(N_FOLDS):
        train = [d for d in docs if fold(d[0]) != j]
        w = dict.fromkeys(range(K_BUCKETS), 0)
        for _ in range(N_ITERS):
            grad: Counter[int] = Counter()
            for _id, y, feats in train:
                if feats and y * sum(w[b] * x for b, x in feats.items()) <= 0:
                    for b, x in feats.items():
                        grad[b] += y * x
            for b, g in grad.items():
                w[b] += g
        n = tp = fp = tn = fn = 0
        for doc_id, y, feats in docs:
            if fold(doc_id) != j:
                continue
            pred = sum(w[b] * x for b, x in feats.items()) > 0
            n += 1
            tp += y == 1 and pred
            fp += y == -1 and pred
            tn += y == -1 and not pred
            fn += y == 1 and not pred
        exp[j] = (n, tp, fp, tn, fn, (tp + tn) * 1_000_000 // n)

    got = {
        r.fold: (r.n_test, r.tp, r.fp, r.tn, r.fn, r.accuracy_ppm)
        for r in registry.QUERIES["q_quality_clf_cv"](
            spark, sf_small
        ).collect()
    }
    assert got == exp


def test_perplexity_buckets_are_exact_tertiles(spark, sf_small):
    # per lang: buckets 0/1/2, sizes differ by <= 1, head scores >=
    # tail scores, and sizes sum to the scored-doc count
    rows = registry.QUERIES["q_perplexity_buckets"](
        spark, sf_small
    ).collect()
    # scored docs = >=1 bigram over the RAW space-split (the LM scorer
    # does not filter empty tokens — mirrored here)
    n_scored = duckdb.sql(f"""
        SELECT COUNT(*) FROM '{sf_small}/documents.parquet'
        WHERE len(string_split(text, ' ')) >= 2
    """).fetchone()[0]
    by_lang: dict[str, dict[int, tuple]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = (
            r.n_docs,
            r.min_score,
            r.max_score,
        )
    assert sum(r.n_docs for r in rows) == n_scored
    for _lang, bks in by_lang.items():
        assert set(bks) == {0, 1, 2}
        sizes = [bks[b][0] for b in (0, 1, 2)]
        assert max(sizes) - min(sizes) <= 1
        assert bks[0][1] >= bks[1][2]  # head min >= middle max
        assert bks[1][1] >= bks[2][2]  # middle min >= tail max


def test_ks_matches_pure_python_reference(spark, sf_small):
    rows = duckdb.sql(
        f"SELECT o_totalprice, o_orderstatus FROM '{sf_small}/orders.parquet'"
    ).fetchall()
    from collections import defaultdict

    counts: dict[float, list] = defaultdict(lambda: [0, 0])
    for v, st in rows:
        counts[v][0 if st == "F" else 1] += 1
    n_a = sum(c[0] for c in counts.values())
    n_b = sum(c[1] for c in counts.values())
    cum_a = cum_b = 0
    d_max, at_v = -1, None
    for v in sorted(counts):
        cum_a += counts[v][0]
        cum_b += counts[v][1]
        d = abs(cum_a * n_b - cum_b * n_a)
        if d > d_max:
            d_max, at_v = d, v
        elif d == d_max and v < at_v:
            at_v = v
    row = registry.QUERIES["q_ks_two_sample"](spark, sf_small).collect()[0]
    assert (row.n_a, row.n_b) == (n_a, n_b)
    assert row.ks_ppm == d_max * 1_000_000 // (n_a * n_b)
    assert row.at_value == at_v


def test_calibration_deciles_balanced_and_ordered(spark, sf_small):
    rows = sorted(
        registry.QUERIES["q_clf_calibration"](spark, sf_small).collect(),
        key=lambda r: r.decile,
    )
    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_small}/documents.parquet'"
    ).fetchone()[0]
    assert [r.decile for r in rows] == list(range(10))
    sizes = [r.n_docs for r in rows]
    assert sum(sizes) == n_docs
    assert max(sizes) - min(sizes) <= 1  # exact deciles
    # bin edges ordered: decile d's max_score <= decile d+1's min_score
    for a, b in zip(rows, rows[1:]):
        assert a.max_score <= b.min_score
    # a sane classifier: top decile at least as positive as bottom
    assert rows[-1].pos_rate_ppm >= rows[0].pos_rate_ppm


def test_fuzzy_and_ks_plan_shapes(spark, sf_oracle):
    # fuzzy: blocking is a plain equi hash/SMJ self-join — NEVER a
    # nested-loop/cartesian pair scan; both stay JVM-side
    from nyc_landmarks_datalake_spark.plans.audit import audit

    a = audit(registry.QUERIES["q_fuzzy_join_names"](spark, sf_oracle))
    assert not a.has_python_eval
    assert a.nested_loop_joins == 0, a
    k = audit(registry.QUERIES["q_ks_two_sample"](spark, sf_oracle))
    assert not k.has_python_eval


def test_cv_folds_partition_the_corpus(spark, sf_small):
    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_small}/documents.parquet'"
    ).fetchone()[0]
    rows = registry.QUERIES["q_quality_clf_cv"](spark, sf_small).collect()
    assert len(rows) == N_FOLDS
    assert sum(r.n_test for r in rows) == n_docs
