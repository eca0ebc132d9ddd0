"""Distributed WordPiece tokenizer training + greedy apply.

Completes the subword-trainer triad next to BPE (:mod:`bpe`) and
Unigram-LM (:mod:`unigram_lm`). WordPiece differs from BPE in exactly
one training decision — the merge winner maximizes the LIKELIHOOD gain
``count(ab) / (count(a) * count(b))`` instead of the raw pair count —
and in its apply step, which is greedy longest-match-first against the
final vocabulary rather than a merge replay.

Same iterate-on-a-relation discipline as the other two trainers: the
corpus text is touched ONCE (word-frequency hash-agg — the only stage
that ever sees the 100 TB); every merge iteration runs on the
vocabulary relation with two small aggregated relations (symbol
counts, pair counts) joined broadcast-side, and the winning pair stays
IN-PLAN as a one-row broadcast — never a driver collect.

Integer-exact by construction: the likelihood score is the fixed-point
``score_fp = count(ab) * 10^12 // (count(a) * count(b))`` computed in
DECIMAL(38,0) Spark-side / HUGEINT DuckDB-side (both truncate toward
zero; all quantities non-negative, verified identical), with ties
broken by pair string ascending — a total order, so both engines pick
identical merge trajectories. ``score_fp <= 10^12`` always, since
``count(ab) <= min(count(a), count(b))``.

Continuation symbols carry the standard ``##`` prefix (word-initial
symbols are bare). Words containing ``#`` or ``|`` (the internal
separator) are excluded from training in BOTH engines — the corpus
alphabet is space + [a-y], so this is a documented no-op guard, not a
data loss.

Apply (`q_wordpiece_apply`) is greedy longest-match-first: the final
vocabulary (initial alphabet + one merged symbol per iteration)
attaches as a one-row broadcast membership map and each distinct word
is tokenized by a single ``aggregate`` fold that jumps match-length
positions; candidate matches are probed up to ``MMAX`` chars, a bound
ASSERTED against the learned vocabulary post-training (merges of two
multi-char pieces could exceed it in general). The DuckDB twin
walks the same greedy jumps with a RECURSIVE CTE. At 100 TB the vocab
broadcasts and tokenization is a zero-shuffle map over the
word-frequency relation.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.operators.bpe import (
    _PAIRS_EXPR,
    _PAIRS_SQL,
)
from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import compute_table

N_MERGES = 6
#: greedy-apply match-length bound. NOT a theorem: a merge of two
#: already-merged symbols grows the longest piece by more than one
#: char (k merges can reach 2^k chars in the worst case), so the bound
#: is ASSERTED against the learned vocabulary post-training
#: (:func:`_vocab_df` raises if any merged symbol exceeds it) rather
#: than assumed. It holds for chain-shaped merge trajectories (each
#: winner extends a piece by one alphabet char), which is what this
#: corpus learns — and the assert makes any future deviation loud.
MMAX = N_MERGES + 1

#: the two-sweep merge rewrite over (enc, pair) — identical to bpe.py's
#: except the folded symbol strips the junction's continuation marker
#: ('h|##e' -> 'he', '##l|##o' -> '##lo'); symbols never contain '|',
#: so '|##' occurs exactly once in the pair string
_REWRITE = (
    "replace(replace(enc,"
    " concat('|', pair, '|'), concat('|', replace(pair, '|##', ''), '|')),"
    " concat('|', pair, '|'), concat('|', replace(pair, '|##', ''), '|'))"
)
_REWRITE_SQL = (
    "replace(replace(enc,"
    " '|' || pair || '|', '|' || replace(pair, '|##', '') || '|'),"
    " '|' || pair || '|', '|' || replace(pair, '|##', '') || '|')"
)

#: initial WordPiece encoding: '|h|##e|##l|##l|##o|'
_ENC0 = """
CASE WHEN length(word) >= 2 THEN
  concat('|', substring(word, 1, 1), '|',
    concat_ws('|', transform(sequence(2, length(word)),
      i -> concat('##', substring(word, i, 1)))), '|')
ELSE concat('|', word, '|') END
"""
_ENC0_SQL = """
'|' || substr(word, 1, 1) ||
CASE WHEN length(word) >= 2 THEN
  '|' || array_to_string(list_transform(range(2, length(word) + 1),
    i -> '##' || substr(word, CAST(i AS INTEGER), 1)), '|')
ELSE '' END || '|'
"""

#: fixed-point likelihood score over (c, ca, cb) BIGINT columns
_SCORE = (
    "CAST(CAST(c AS DECIMAL(38,0)) * 1000000000000"
    " div (CAST(ca AS DECIMAL(38,0)) * cb) AS BIGINT)"
)
_SCORE_SQL = (
    "CAST(CAST(c AS HUGEINT) * 1000000000000"
    " // (CAST(ca AS HUGEINT) * cb) AS BIGINT)"
)


def _word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, cnt) — the single corpus pass; '#'/'|' guard documented
    in the module docstring."""
    docs = compute_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(
            (F.col("word") != "")
            & ~F.col("word").contains("#")
            & ~F.col("word").contains("|")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def wordpiece_chain(
    spark: SparkSession, sf_dir: str
) -> tuple[list[DataFrame], DataFrame]:
    """Run the N_MERGES WordPiece iterations; return (one-row merge
    DFs, the final vocabulary relation (word, enc, cnt))."""
    words = _word_freq(spark, sf_dir)
    vocab = words.select(
        "word", F.expr(_ENC0).alias("enc"), "cnt"
    ).localCheckpoint(eager=False)

    merges: list[DataFrame] = []
    for it in range(1, N_MERGES + 1):
        # checkpoint computed symbol arrays before the explode
        # (GenerateExec re-evaluates its child — the repo-wide trap)
        syms = vocab.select(
            F.expr("filter(split(enc, '[|]'), t -> t != '')").alias("syms"),
            "cnt",
        ).localCheckpoint(eager=False)
        sc = (
            syms.select(F.explode("syms").alias("sym"), "cnt")
            .groupBy("sym")
            .agg(F.sum("cnt").cast("long").alias("scnt"))
        )
        pc = (
            syms.select(F.explode(F.expr(_PAIRS_EXPR)).alias("pair"), "cnt")
            .groupBy("pair")
            .agg(F.sum("cnt").cast("long").alias("c"))
        )
        scored = (
            pc.withColumn("lsym", F.expr("element_at(split(pair, '[|]'), 1)"))
            .withColumn("rsym", F.expr("element_at(split(pair, '[|]'), 2)"))
            .join(
                F.broadcast(sc.selectExpr("sym AS lsym", "scnt AS ca")),
                "lsym",
            )
            .join(
                F.broadcast(sc.selectExpr("sym AS rsym", "scnt AS cb")),
                "rsym",
            )
            .selectExpr("pair", "c", f"{_SCORE} AS score_fp")
        )
        best = (
            scored.orderBy(
                F.desc("score_fp"), F.asc("pair")
            )
            .limit(1)
            .select(
                F.lit(it).alias("merge_idx"),
                "pair",
                F.expr("replace(pair, '|##', '')").alias("new_symbol"),
                F.col("c").alias("pair_count"),
                "score_fp",
            )
            .localCheckpoint(eager=True)  # one row; reused twice
        )
        merges.append(best)
        vocab = (
            vocab.crossJoin(F.broadcast(best.select("pair")))
            .select("word", F.expr(_REWRITE).alias("enc"), "cnt")
            .localCheckpoint(eager=False)
        )
    return merges, vocab


def _chain_ctes() -> str:
    """The unrolled DuckDB training chain: w0/v0 then per-iteration
    symbol counts s{k}, pair counts p{k}, winner b{k}, rewrite v{k}."""
    stages = [
        f"""w0 AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word != '' AND word NOT LIKE '%#%' AND word NOT LIKE '%|%'
        GROUP BY 1
    ),
    v0 AS (
        SELECT word, {_ENC0_SQL} AS enc, cnt FROM w0
    )"""
    ]
    # AS MATERIALIZED: DuckDB inlines CTEs by default; each iteration
    # references the previous one 3-4x, so un-materialized the plan
    # tree grows ~4^N_MERGES and planning hangs (observed at sf0.001)
    for k in range(1, N_MERGES + 1):
        stages.append(f"""y{k} AS MATERIALIZED (
        SELECT list_filter(string_split(enc, '|'), t -> t != '') AS syms,
               cnt
        FROM v{k - 1}
    ),
    s{k} AS MATERIALIZED (
        SELECT sym, CAST(SUM(cnt) AS BIGINT) AS scnt FROM (
            SELECT unnest(syms) AS sym, cnt FROM y{k}
        ) GROUP BY 1
    ),
    p{k} AS (
        SELECT pair, CAST(SUM(cnt) AS BIGINT) AS c FROM (
            SELECT unnest({_PAIRS_SQL}) AS pair, cnt FROM y{k}
        ) GROUP BY 1
    ),
    b{k} AS MATERIALIZED (
        SELECT CAST({k} AS INTEGER) AS merge_idx, pair,
               replace(pair, '|##', '') AS new_symbol,
               c AS pair_count,
               {_SCORE_SQL} AS score_fp
        FROM (
            SELECT p.pair, p.c, la.scnt AS ca, rb.scnt AS cb
            FROM p{k} p
            JOIN s{k} la ON la.sym = string_split(p.pair, '|')[1]
            JOIN s{k} rb ON rb.sym = string_split(p.pair, '|')[2]
        )
        ORDER BY score_fp DESC, pair LIMIT 1
    ),
    v{k} AS MATERIALIZED (
        SELECT word, {_REWRITE_SQL} AS enc, cnt
        FROM v{k - 1} CROSS JOIN b{k}
    )""")
    return "WITH " + ",\n    ".join(stages)


def _train_oracle_sql() -> str:
    unions = " UNION ALL ".join(
        f"SELECT merge_idx, pair, new_symbol, pair_count, score_fp FROM b{k}"
        for k in range(1, N_MERGES + 1)
    )
    return _chain_ctes() + "\n    " + unions


@query("q_wordpiece_merges", sql=_train_oracle_sql())
def q_wordpiece_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First N_MERGES WordPiece merge rules: per iteration the
    likelihood-winning adjacent-symbol pair, its folded symbol, its
    frequency-weighted count, and the fixed-point likelihood score
    count(ab)*10^12 // (count(a)*count(b)) that chose it."""
    merges, _vocab = wordpiece_chain(spark, sf_dir)
    return reduce(DataFrame.unionByName, merges)


def _vocab_df(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(words, final vocab symbols): initial alphabet + merged
    symbols."""
    merges, _enc = wordpiece_chain(spark, sf_dir)
    words = _word_freq(spark, sf_dir).localCheckpoint(eager=False)
    alphabet = (
        words.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word)), i -> CASE WHEN"
                    " i = 1 THEN substring(word, 1, 1) ELSE"
                    " concat('##', substring(word, i, 1)) END)"
                )
            ).alias("sym")
        )
        .distinct()
    )
    merged = reduce(
        DataFrame.unionByName,
        [m.select(F.col("new_symbol").alias("sym")) for m in merges],
    )
    # the greedy fold probes candidate lengths 1..MMAX only — a learned
    # piece longer than MMAX bare chars would silently never match. The
    # bound is not a theorem (see MMAX), so verify it against the
    # N_MERGES-row ALREADY-MATERIALIZED merge outputs (alphabet symbols
    # are single chars and can't violate it).
    longest = max(
        len(r.sym[2:]) if r.sym.startswith("##") else len(r.sym)
        for r in merged.collect()
    )
    if longest > MMAX:
        raise RuntimeError(
            f"learned WordPiece vocabulary has a {longest}-char piece; "
            f"greedy apply only probes matches up to MMAX={MMAX} chars "
            "and would mis-tokenize — raise MMAX (both engines) to at "
            "least the learned maximum"
        )
    return words, alphabet.unionByName(merged).distinct()


#: greedy longest-match fold over ``word`` with membership map ``vmap``;
#: the one-element transform binds the chosen match length (ml) — SQL
#: lambdas have no let-binding. Yields struct(nxt, pieces, unk).
_GREEDY = f"""
  aggregate(
    sequence(1, length(word)),
    named_struct('nxt', 1, 'pieces', cast(array() as array<string>),
                 'unk', 0),
    (acc, i) -> CASE WHEN i < acc.nxt THEN acc ELSE
      element_at(transform(array(
        array_max(filter(
          transform(sequence(1, least({MMAX}, length(word) - i + 1)),
            l -> CASE WHEN vmap[CASE WHEN i = 1 THEN substring(word, i, l)
                       ELSE concat('##', substring(word, i, l)) END]
                      IS NOT NULL THEN l END),
          x -> x IS NOT NULL))),
        ml -> CASE WHEN ml IS NULL THEN
                named_struct('nxt', i + 1,
                  'pieces', array_append(acc.pieces, '[UNK]'),
                  'unk', acc.unk + 1)
              ELSE
                named_struct('nxt', i + ml,
                  'pieces', array_append(acc.pieces,
                    CASE WHEN i = 1 THEN substring(word, i, ml)
                    ELSE concat('##', substring(word, i, ml)) END),
                  'unk', acc.unk)
              END), 1)
    END)
"""


def _apply_oracle_sql() -> str:
    # WITH RECURSIVE for the greedy-walk CTE (non-recursive CTEs are
    # legal under it)
    return (
        _chain_ctes().replace("WITH ", "WITH RECURSIVE ", 1)
        + f""",
    vsyms AS (
        SELECT DISTINCT sym FROM (
            SELECT unnest(list_transform(range(1, length(word) + 1),
                i -> CASE WHEN i = 1 THEN substr(word, 1, 1)
                     ELSE '##' || substr(word, CAST(i AS INTEGER), 1)
                     END)) AS sym
            FROM w0
            {"UNION ALL ".join([""] + [f"SELECT new_symbol AS sym FROM b{k} " for k in range(1, N_MERGES + 1)])}
        )
    ),
    vm AS (
        SELECT map_from_entries(list({{'k': sym, 'v': 1}})) AS m FROM vsyms
    ),
    tok AS (
        SELECT word, cnt, 1 AS pos,
               CAST([] AS VARCHAR[]) AS pieces, 0 AS unk
        FROM w0
        UNION ALL
        SELECT word, cnt,
               CASE WHEN ml IS NULL THEN pos + 1
                    ELSE pos + CAST(ml AS INTEGER) END,
               list_append(pieces,
                 CASE WHEN ml IS NULL THEN '[UNK]'
                      WHEN pos = 1 THEN
                        substr(word, pos, CAST(ml AS INTEGER))
                      ELSE '##' ||
                        substr(word, pos, CAST(ml AS INTEGER)) END),
               unk + CASE WHEN ml IS NULL THEN 1 ELSE 0 END
        FROM (
            SELECT word, cnt, pos, pieces, unk,
              list_max(list_filter(
                list_transform(
                  range(1, least({MMAX}, length(word) - pos + 1) + 1),
                  l -> CASE WHEN len(m[
                         CASE WHEN pos = 1 THEN
                           substr(word, pos, CAST(l AS INTEGER))
                         ELSE '##' ||
                           substr(word, pos, CAST(l AS INTEGER)) END
                       ]) > 0 THEN l END),
                x -> x IS NOT NULL)) AS ml
            FROM tok, vm
            WHERE pos <= length(word)
        )
    ),
    fin AS (
        SELECT word, cnt, pieces, unk
        FROM tok WHERE pos = length(word) + 1
    )
    SELECT CAST(length(word) AS BIGINT) AS word_len,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(cnt) AS BIGINT) AS n_occurrences,
           CAST(SUM(cnt * length(word)) AS BIGINT) AS total_chars,
           CAST(SUM(cnt * len(pieces)) AS BIGINT) AS total_pieces,
           CAST(SUM(cnt * unk) AS BIGINT) AS total_unk,
           CAST(SUM(cnt * len(pieces)) * 1000000
                // SUM(cnt * length(word)) AS BIGINT) AS ratio_ppm
    FROM fin GROUP BY 1"""
    )


@query("q_wordpiece_apply", sql=_apply_oracle_sql())
def q_wordpiece_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy longest-match-first WordPiece tokenization with the
    learned vocabulary, censused per word length: pieces emitted vs the
    character baseline plus the [UNK] count (zero by construction here
    — every corpus char is in the initial alphabet — but carried so a
    vocab/corpus mismatch is loud). The RECURSIVE-CTE oracle walks the
    identical greedy jumps."""
    words, vocab = _vocab_df(spark, sf_dir)
    vmap = vocab.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("sym"), F.lit(1).alias("v")))
        ).alias("vmap")
    )
    seg = (
        words.crossJoin(F.broadcast(vmap))
        .selectExpr("word", "cnt", f"({_GREEDY}) AS st")
        .localCheckpoint(eager=False)
    )
    return seg.groupBy(
        F.length("word").cast("long").alias("word_len")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("cnt").cast("long").alias("n_occurrences"),
        F.sum(F.col("cnt") * F.length("word"))
        .cast("long")
        .alias("total_chars"),
        F.sum(F.col("cnt") * F.size("st.pieces"))
        .cast("long")
        .alias("total_pieces"),
        F.sum(F.col("cnt") * F.col("st.unk")).cast("long").alias("total_unk"),
        F.expr(
            "CAST(SUM(cnt * size(st.pieces)) * 1000000"
            " div SUM(cnt * length(word)) AS BIGINT)"
        ).alias("ratio_ppm"),
    )
