"""Distributed BPE tokenizer training over the documents corpus.

Byte-pair-encoding training is the canonical iterative LLM-pipeline
job Spark handles well once it's phrased right: the corpus collapses
to a WORD-FREQUENCY table first (one hash-agg — the only pass that
ever touches the 100 TB of text), and every merge iteration then runs
on that vocabulary relation (millions of rows, not terabytes):

  1. adjacent-symbol pair counts, weighted by word frequency
     (map-side explode + partial-aggregated hash agg);
  2. the argmax pair (count desc, pair asc — deterministic tie-break)
     stays IN-PLAN as a one-row broadcast, never a driver collect;
  3. the vocabulary re-encodes map-side: two sequential literal
     ``replace`` sweeps fold the winning pair into one symbol.

Merge semantics: each iteration applies the winning pair with two
greedy left-to-right non-overlapping replace passes over the
separator-encoded symbol string ('|a|b|c|'). A single pass misses
occurrences that share a separator with a replaced one ('x y x y');
the second pass folds those. For chains of a repeated symbol the
result is the two-sweep greedy folding, not textbook leftmost-BPE —
deterministic, and IDENTICAL in both engines (Spark `replace` and
DuckDB `replace` share left-to-right non-overlap semantics, verified
by test_bpe_replace_semantics_match).

Oracle: the DuckDB twin unrolls the same N_MERGES iterations as CTE
stages over the same word-frequency table — bit-exact counts (integer
sums), bit-exact winners (same tie-break).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import compute_table

N_MERGES = 6

#: Spark: pair list over a symbol array column ``syms`` (0-based)
_PAIRS_EXPR = (
    "CASE WHEN size(syms) >= 2 THEN "
    "transform(sequence(0, size(syms)-2), i -> concat(syms[i], '|', syms[i+1])) "
    "ELSE array() END"
)
#: DuckDB: same over ``syms`` (1-based)
_PAIRS_SQL = (
    "CASE WHEN len(syms) >= 2 THEN "
    "list_transform(range(1, len(syms)), i -> syms[i] || '|' || syms[i+1]) "
    "ELSE [] END"
)
#: the two-sweep merge rewrite over (enc, pair) columns — shared shape;
#: `replace` is literal (non-regex) in both engines
_REWRITE = (
    "replace(replace(enc,"
    " concat('|', pair, '|'), concat('|', replace(pair, '|', ''), '|')),"
    " concat('|', pair, '|'), concat('|', replace(pair, '|', ''), '|'))"
)
_REWRITE_SQL = (
    "replace(replace(enc,"
    " '|' || pair || '|', '|' || replace(pair, '|', '') || '|'),"
    " '|' || pair || '|', '|' || replace(pair, '|', '') || '|')"
)


def _oracle_sql() -> str:
    stages = [
        """w0 AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word != ''
        GROUP BY 1
    ),
    v0 AS (
        SELECT word,
               '|' || array_to_string(
                   list_transform(range(1, len(word)+1), i -> word[i]), '|')
               || '|' AS enc,
               cnt
        FROM w0
    )"""
    ]
    for k in range(1, N_MERGES + 1):
        stages.append(f"""p{k} AS (
        SELECT pair, CAST(SUM(cnt) AS BIGINT) AS c FROM (
            SELECT unnest({_PAIRS_SQL}) AS pair, cnt
            FROM (SELECT list_filter(string_split(enc, '|'), t -> t != '')
                         AS syms, cnt
                  FROM v{k - 1})
        ) GROUP BY 1
    ),
    b{k} AS (
        SELECT CAST({k} AS INTEGER) AS merge_idx, pair,
               replace(pair, '|', '') AS new_symbol,
               c AS pair_count
        FROM p{k} ORDER BY c DESC, pair LIMIT 1
    ),
    v{k} AS (
        SELECT word, {_REWRITE_SQL} AS enc, cnt
        FROM v{k - 1} CROSS JOIN b{k}
    )""")
        # (vN is built but unused for the last k — DuckDB prunes it)
    unions = " UNION ALL ".join(
        f"SELECT merge_idx, pair, new_symbol, pair_count FROM b{k}"
        for k in range(1, N_MERGES + 1)
    )
    return "WITH " + ",\n    ".join(stages) + "\n    " + unions


def bpe_chain(
    spark: SparkSession, sf_dir: str
) -> tuple[list[DataFrame], DataFrame]:
    """Run the N_MERGES training chain; return (one-row merge DFs, the
    FINAL re-encoded vocabulary (word, enc, cnt)) — shared by the
    merge-rule query and the apply/compression census."""
    docs = compute_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    vocab = words.select(
        "word",
        F.expr(
            "concat('|', concat_ws('|', transform(sequence(1, length(word)),"
            " i -> substring(word, i, 1))), '|')"
        ).alias("enc"),
        "cnt",
    ).localCheckpoint(eager=False)

    merges: list[DataFrame] = []
    for it in range(1, N_MERGES + 1):
        # checkpoint the computed symbol arrays before the explode
        # (GenerateExec re-evaluates its child — the repo-wide trap)
        syms = vocab.select(
            F.expr("filter(split(enc, '[|]'), t -> t != '')").alias("syms"),
            "cnt",
        ).localCheckpoint(eager=False)
        agg = (
            syms.select(F.explode(F.expr(_PAIRS_EXPR)).alias("pair"), "cnt")
            .groupBy("pair")
            .agg(F.sum("cnt").cast("long").alias("c"))
        )
        best = (
            agg.orderBy(F.desc("c"), F.asc("pair"))
            .limit(1)
            .select(
                F.lit(it).alias("merge_idx"),
                "pair",
                F.expr("replace(pair, '|', '')").alias("new_symbol"),
                F.col("c").alias("pair_count"),
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


@query("q_bpe_merges", sql=_oracle_sql())
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First N_MERGES BPE merge rules learned from the corpus: per
    iteration the winning adjacent-symbol pair, its folded symbol, and
    its frequency-weighted count."""
    merges, _vocab = bpe_chain(spark, sf_dir)
    return reduce(DataFrame.unionByName, merges)


def _apply_oracle_sql() -> str:
    # the training chain's CTEs, then the compression census off the
    # FINAL vocabulary v{N_MERGES}
    chain = _oracle_sql()
    with_block = chain[: chain.rindex(")") + 1]  # drop the merges union
    return f"""{with_block},
    fin AS (
        SELECT CAST(len(word) AS BIGINT) AS word_len,
               cnt,
               CAST(len(word) AS BIGINT) AS syms_before,
               CAST(len(list_filter(string_split(enc, '|'), t -> t != ''))
                    AS BIGINT) AS syms_after
        FROM v{N_MERGES}
    )
    SELECT word_len,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(cnt) AS BIGINT) AS n_occurrences,
           CAST(SUM(cnt * syms_before) AS BIGINT) AS total_syms_before,
           CAST(SUM(cnt * syms_after) AS BIGINT) AS total_syms_after,
           CAST(SUM(cnt * syms_after) * 1000000
                // SUM(cnt * syms_before) AS BIGINT) AS ratio_ppm
    FROM fin
    GROUP BY 1
    """


@query("q_bpe_apply", sql=_apply_oracle_sql())
def q_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the learned merges and census the
    compression: per original word length, how many symbols the
    N_MERGES-rule tokenizer emits vs the character baseline
    (frequency-weighted, integer-exact ppm). The apply step is the same
    map-side re-encode the training loop uses — at 100 TB the learned
    merge table broadcasts and tokenization is a zero-shuffle map over
    the corpus (here over the word-frequency relation, which carries
    the full weight information)."""
    _merges, vocab = bpe_chain(spark, sf_dir)
    fin = vocab.selectExpr(
        "CAST(length(word) AS BIGINT) AS word_len",
        "cnt",
        "CAST(length(word) AS BIGINT) AS syms_before",
        "CAST(size(filter(split(enc, '[|]'), t -> t != '')) AS BIGINT)"
        " AS syms_after",
    )
    return fin.groupBy("word_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("cnt").cast("long").alias("n_occurrences"),
        F.sum(F.col("cnt") * F.col("syms_before"))
        .cast("long")
        .alias("total_syms_before"),
        F.sum(F.col("cnt") * F.col("syms_after"))
        .cast("long")
        .alias("total_syms_after"),
        F.expr(
            "CAST(SUM(cnt * syms_after) * 1000000"
            " div SUM(cnt * syms_before) AS BIGINT)"
        ).alias("ratio_ppm"),
    )
