"""Soft-EM unigram-LM trainer (operators/unigram_soft.py).

The DuckDB oracle gates the query (test_oracle_parity); here a
pure-Python THIRD implementation of the fixed-point forward-backward
trajectory pins the semantics independently of both SQL engines, plus
the broadcast-map plan pin.
"""

from __future__ import annotations

from collections import Counter

import duckdb

from nyc_landmarks_datalake_spark import registry
from nyc_landmarks_datalake_spark.operators.unigram_lm import LMAX, V_SEED
from nyc_landmarks_datalake_spark.operators.unigram_soft import N_SOFT, S
from nyc_landmarks_datalake_spark.plans.audit import audit

registry.load_all()


def _py_reference(sf_dir: str):
    rows = duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    words: Counter[str] = Counter()
    for (text,) in rows:
        for w in text.split(" "):
            if w:
                words[w] += 1

    subs: Counter[str] = Counter()
    for w, c in words.items():
        for s in range(len(w)):
            for e in range(s + 1, min(len(w), s + LMAX) + 1):
                subs[w[s:e]] += c
    multi = sorted(
        ((p, c) for p, c in subs.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:V_SEED]
    vocab = dict(multi) | {p: c for p, c in subs.items() if len(p) == 1}
    total = sum(vocab.values())
    pm = {p: c * 1_000_000 // max(total, 1) for p, c in vocab.items()}

    for _ in range(N_SOFT):
        usage: Counter[str] = Counter()
        for w, c in words.items():
            L = len(w)
            f = [S] + [0] * L
            for i in range(1, L + 1):
                f[i] = sum(
                    f[s - 1] * pm[w[s - 1 : i]] // 1_000_000
                    for s in range(max(1, i - LMAX + 1), i + 1)
                    if w[s - 1 : i] in pm
                )
            b = [0] * L + [S]
            for i in range(L - 1, -1, -1):
                b[i] = sum(
                    pm[w[i:e]] * b[e] // 1_000_000
                    for e in range(i + 1, min(L, i + LMAX) + 1)
                    if w[i:e] in pm
                )
            if f[L] <= 0:
                continue
            for s in range(1, L + 1):
                for e in range(s, min(L, s + LMAX - 1) + 1):
                    piece = w[s - 1 : e]
                    if piece in pm:
                        g = f[s - 1] * pm[piece] * b[e] // (f[L] * S)
                        usage[piece] += c * g
        kept = {
            p: usage.get(p, 0)
            for p in pm
            if len(p) == 1 or usage.get(p, 0) > 0
        }
        t = sum(kept.values())
        pm = {p: u * 1_000_000 // max(t, 1) for p, u in kept.items()}
        last = kept
    return {p: (last[p], pm[p]) for p in pm}


def test_soft_em_matches_pure_python_reference(spark, sf_small):
    exp = _py_reference(sf_small)
    got = {
        r.piece: (r.u, r.p_ppm)
        for r in registry.QUERIES["q_unigram_lm_soft_em"](
            spark, sf_small
        ).collect()
    }
    assert got == exp


def test_soft_counts_denser_than_viterbi(spark, sf_small):
    # soft-EM's defining property: expected counts spread over ALL
    # segmentations, so strictly more multi-char pieces keep nonzero
    # mass than survive the hard-EM (Viterbi) prune on the same seed
    soft = registry.QUERIES["q_unigram_lm_soft_em"](spark, sf_small)
    hard = registry.QUERIES["q_unigram_lm_train"](spark, sf_small)
    n_soft = sum(1 for r in soft.collect() if len(r.piece) >= 2)
    n_hard = sum(1 for r in hard.collect() if len(r.piece) >= 2 and r.cnt > 0)
    assert n_soft > n_hard, (n_soft, n_hard)


def test_lattice_stays_broadcast_map(spark, sf_oracle):
    # one E-step lattice pass, rebuilt checkpoint-free: piece table is
    # a one-row broadcast map, lattices are in-plan folds, no python
    from pyspark.sql import functions as F

    from nyc_landmarks_datalake_spark.operators.unigram_lm import (
        _word_freq,
    )
    from nyc_landmarks_datalake_spark.operators.unigram_soft import (
        _ARCS,
        _BWD,
        _FWD,
        _wmap,
        soft_em_chain,
    )

    vocab = soft_em_chain(spark, sf_oracle)
    lat = (
        _word_freq(spark, sf_oracle)
        .crossJoin(F.broadcast(_wmap(vocab)))
        .selectExpr(
            "word", "cnt", "wmap", f"({_FWD}) AS farr", f"({_BWD}) AS barr"
        )
        .selectExpr("word", "cnt", f"({_ARCS}) AS arcs")
    )
    a = audit(lat)
    assert not a.has_python_eval
    assert a.broadcast_exchanges >= 1, a
    assert a.sort_merge_joins == 0 and a.shuffled_hash_joins == 0, a
    full = audit(registry.QUERIES["q_unigram_lm_soft_em"](spark, sf_oracle))
    assert not full.has_python_eval
