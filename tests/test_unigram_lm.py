"""Unigram-LM tokenizer training (operators/unigram_lm.py).

The DuckDB oracle gates both queries (test_oracle_parity); here a
pure-Python THIRD implementation of the full seed→EM→prune trajectory
pins the semantics independently of both SQL engines, plus the plan
pins for the broadcast-map scale posture.
"""

from __future__ import annotations

from collections import Counter

import duckdb

from nyc_landmarks_datalake_spark import registry
from nyc_landmarks_datalake_spark.operators.unigram_lm import (
    LMAX,
    N_EM,
    V_SEED,
)
from nyc_landmarks_datalake_spark.plans.audit import audit

registry.load_all()


def _viterbi(word: str, vocab: dict[str, int]) -> list[str]:
    """Same total-order objective as both engines: (fewest pieces,
    greatest summed count, lexicographically smallest piece list)."""
    best: list[tuple] = [(0, 0, [])]
    for i in range(1, len(word) + 1):
        cands = []
        for s in range(max(0, i - LMAX), i):
            piece = word[s:i]
            if piece in vocab:
                n, negsum, pieces = best[s]
                cands.append((n + 1, negsum - vocab[piece], pieces + [piece]))
        best.append(min(cands))
    return best[len(word)][2]


def _py_reference(sf_dir: str):
    rows = duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    words = Counter()
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

    for _ in range(N_EM):
        used: Counter[str] = Counter()
        for w, c in words.items():
            for piece in _viterbi(w, vocab):
                used[piece] += c
        vocab = {
            p: used.get(p, 0)
            for p in vocab
            if len(p) == 1 or used.get(p, 0) > 0
        }

    total = sum(vocab.values())
    train = {p: (c, c * 1_000_000 // total) for p, c in vocab.items()}

    census: dict[int, list] = {}
    for w, c in words.items():
        k = len(_viterbi(w, vocab))
        row = census.setdefault(len(w), [0, 0, 0, 0])
        row[0] += 1
        row[1] += c
        row[2] += c * len(w)
        row[3] += c * k
    apply_ = {
        wl: (n, occ, ch, pc, pc * 1_000_000 // ch)
        for wl, (n, occ, ch, pc) in census.items()
    }
    return train, apply_


def test_train_matches_pure_python_reference(spark, sf_small):
    exp, _ = _py_reference(sf_small)
    got = {
        r.piece: (r.cnt, r.p_ppm)
        for r in registry.QUERIES["q_unigram_lm_train"](
            spark, sf_small
        ).collect()
    }
    assert got == exp


def test_apply_matches_pure_python_reference(spark, sf_small):
    _, exp = _py_reference(sf_small)
    got = {
        r.word_len: (
            r.n_words,
            r.n_occurrences,
            r.total_chars,
            r.total_pieces,
            r.ratio_ppm,
        )
        for r in registry.QUERIES["q_unigram_lm_apply"](
            spark, sf_small
        ).collect()
    }
    assert got == exp


def test_em_actually_prunes_and_compresses(spark, sf_small):
    # the EM rounds must do something: unused multi-char seeds pruned,
    # and the final tokenizer beats the character baseline
    train = registry.QUERIES["q_unigram_lm_train"](spark, sf_small)
    rows = train.collect()
    multi = [r for r in rows if len(r.piece) >= 2]
    assert multi, "no multi-char pieces survived"
    assert all(r.cnt > 0 for r in multi)  # prune invariant
    ap = registry.QUERIES["q_unigram_lm_apply"](spark, sf_small).collect()
    assert all(r.ratio_ppm < 1_000_000 for r in ap if r.word_len >= 2)


def test_segmentation_stays_broadcast_map(spark, sf_oracle):
    # one EM segmentation pass, rebuilt checkpoint-free (checkpoints
    # hide plans behind ExistingRDD scans — the repo-wide trap): the
    # piece table attaches as a one-row broadcast map (never a
    # word-relation shuffle), everything JVM-side
    from pyspark.sql import functions as F

    from nyc_landmarks_datalake_spark.operators.unigram_lm import (
        _DP,
        _word_freq,
        unigram_chain,
    )

    _words, vocab = unigram_chain(spark, sf_oracle)
    words = _word_freq(spark, sf_oracle)
    wmap = vocab.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("piece"), F.col("cnt")))
        ).alias("wmap")
    )
    seg = words.crossJoin(F.broadcast(wmap)).selectExpr(
        "word", "cnt", f"({_DP}).pieces AS pieces"
    )
    a = audit(seg)
    assert not a.has_python_eval
    assert a.broadcast_exchanges >= 1, a
    assert a.sort_merge_joins == 0 and a.shuffled_hash_joins == 0, a
    full = audit(registry.QUERIES["q_unigram_lm_train"](spark, sf_oracle))
    assert not full.has_python_eval
