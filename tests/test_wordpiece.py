"""WordPiece trainer + greedy apply (operators/wordpiece.py) and the
fuzzy entity-resolution join (operators/fuzzyjoin.py).

The DuckDB oracles gate both under test_oracle_parity; here pure-Python
THIRD implementations pin the semantics independently of both SQL
engines (a shared-SQL-shape bug passes two-engine parity but not this),
plus plan pins for the broadcast/zero-python scale posture.
"""

from __future__ import annotations

from collections import Counter

import duckdb

from nyc_landmarks_datalake_spark import registry
from nyc_landmarks_datalake_spark.operators.wordpiece import MMAX, N_MERGES
from nyc_landmarks_datalake_spark.plans.audit import audit

registry.load_all()


def _words(sf_dir: str) -> Counter:
    rows = duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    words: Counter[str] = Counter()
    for (text,) in rows:
        for w in text.split(" "):
            if w and "#" not in w and "|" not in w:
                words[w] += 1
    return words


def _enc0(word: str) -> str:
    return "|" + "|".join(
        [word[0]] + [f"##{c}" for c in word[1:]]
    ) + "|"


def _py_train(words: Counter):
    """Same trajectory as both engines: fixed-point likelihood winner,
    two-sweep greedy replace rewrite."""
    enc = {w: _enc0(w) for w in words}
    merges = []
    for it in range(1, N_MERGES + 1):
        sc: Counter[str] = Counter()
        pc: Counter[str] = Counter()
        for w, c in words.items():
            syms = [t for t in enc[w].split("|") if t]
            for s in syms:
                sc[s] += c
            for a, b in zip(syms, syms[1:]):
                pc[f"{a}|{b}"] += c
        scored = [
            (p, c, c * 10**12 // (sc[p.split("|")[0]] * sc[p.split("|")[1]]))
            for p, c in pc.items()
        ]
        pair, c, score = min(scored, key=lambda t: (-t[2], t[0]))
        new = pair.replace("|##", "")
        merges.append((it, pair, new, c, score))
        for w in enc:
            e = enc[w].replace(f"|{pair}|", f"|{new}|")
            enc[w] = e.replace(f"|{pair}|", f"|{new}|")
    return merges, enc


def _py_apply(words: Counter, merges, enc):
    vocab = set()
    for w in words:
        vocab.add(w[0])
        vocab.update(f"##{c}" for c in w[1:])
    vocab.update(m[2] for m in merges)

    census: dict[int, list] = {}
    for w, c in words.items():
        i, pieces, unk = 0, [], 0
        while i < len(w):
            ml = None
            for l in range(min(MMAX, len(w) - i), 0, -1):
                cand = w[i : i + l] if i == 0 else "##" + w[i : i + l]
                if cand in vocab:
                    ml = l
                    break
            if ml is None:
                pieces.append("[UNK]")
                unk += 1
                i += 1
            else:
                pieces.append(w[i : i + ml] if i == 0 else "##" + w[i : i + ml])
                i += ml
        row = census.setdefault(len(w), [0, 0, 0, 0, 0])
        row[0] += 1
        row[1] += c
        row[2] += c * len(w)
        row[3] += c * len(pieces)
        row[4] += c * unk
    return {
        wl: (n, occ, ch, pcs, unk, pcs * 1_000_000 // ch)
        for wl, (n, occ, ch, pcs, unk) in census.items()
    }


def test_merges_match_pure_python_reference(spark, sf_small):
    words = _words(sf_small)
    exp, _ = _py_train(words)
    got = [
        (r.merge_idx, r.pair, r.new_symbol, r.pair_count, r.score_fp)
        for r in registry.QUERIES["q_wordpiece_merges"](spark, sf_small)
        .orderBy("merge_idx")
        .collect()
    ]
    assert got == exp


def test_apply_matches_pure_python_reference(spark, sf_small):
    words = _words(sf_small)
    merges, enc = _py_train(words)
    exp = _py_apply(words, merges, enc)
    got = {
        r.word_len: (
            r.n_words,
            r.n_occurrences,
            r.total_chars,
            r.total_pieces,
            r.total_unk,
            r.ratio_ppm,
        )
        for r in registry.QUERIES["q_wordpiece_apply"](
            spark, sf_small
        ).collect()
    }
    assert got == exp


def test_likelihood_score_differs_from_raw_count(spark, sf_small):
    # WordPiece must actually be WordPiece: at least one of its winners
    # is NOT the raw-count argmax BPE would pick on the same state
    from nyc_landmarks_datalake_spark.operators.bpe import (
        N_MERGES as BPE_N,
    )

    wp = {
        r.merge_idx: r.pair
        for r in registry.QUERIES["q_wordpiece_merges"](
            spark, sf_small
        ).collect()
    }
    bpe = {
        r.merge_idx: r.pair
        for r in registry.QUERIES["q_bpe_merges"](spark, sf_small).collect()
    }
    common = min(N_MERGES, BPE_N)
    # pair formats differ only in the ## continuation marker; strip it
    assert any(
        wp[i].replace("##", "") != bpe[i] for i in range(1, common + 1)
    ), (wp, bpe)


def test_no_unk_and_compression(spark, sf_small):
    rows = registry.QUERIES["q_wordpiece_apply"](spark, sf_small).collect()
    assert all(r.total_unk == 0 for r in rows)
    assert any(r.ratio_ppm < 1_000_000 for r in rows if r.word_len >= 4)


def test_apply_stays_broadcast_map(spark, sf_oracle):
    # the greedy tokenizer, rebuilt checkpoint-free (checkpoints hide
    # plans behind ExistingRDD scans — the repo-wide trap): vocab
    # attaches as a one-row broadcast map, no python eval, no
    # word-relation shuffle join
    from pyspark.sql import functions as F

    from nyc_landmarks_datalake_spark.operators.wordpiece import (
        _GREEDY,
        _vocab_df,
    )

    words, vocab = _vocab_df(spark, sf_oracle)
    vmap = vocab.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("sym"), F.lit(1).alias("v")))
        ).alias("vmap")
    )
    seg = words.crossJoin(F.broadcast(vmap)).selectExpr(
        "word", "cnt", f"({_GREEDY}) AS st"
    )
    a = audit(seg)
    assert not a.has_python_eval
    assert a.broadcast_exchanges >= 1, a
    assert a.sort_merge_joins == 0 and a.shuffled_hash_joins == 0, a
    full = audit(registry.QUERIES["q_wordpiece_apply"](spark, sf_oracle))
    assert not full.has_python_eval


def test_fuzzy_join_matches_brute_force(spark, sf_small):
    names = [
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT c_name FROM '{sf_small}/customer.parquet'"
        ).fetchall()
    ]

    def lev1(a: str, b: str) -> bool:
        # edit distance <= 1 without full DP
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

    exp: dict[int, int] = Counter()
    samples: dict[int, str] = {}
    for i, x in enumerate(names):
        for y in names[i + 1 :]:
            a, b = min(x, y), max(x, y)
            if lev1(a, b):
                dp = next(
                    (
                        k + 1
                        for k in range(max(len(a), len(b)))
                        if (a[k : k + 1] or None) != (b[k : k + 1] or None)
                    ),
                )
                exp[dp] += 1
                key = f"{a}|{b}"
                if dp not in samples or key < samples[dp]:
                    samples[dp] = key
    got = {
        r.diff_pos: (r.n_pairs, r.sample_pair)
        for r in registry.QUERIES["q_fuzzy_join_names"](
            spark, sf_small
        ).collect()
    }
    assert got == {dp: (n, samples[dp]) for dp, n in exp.items()}
