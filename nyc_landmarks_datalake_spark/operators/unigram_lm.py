"""Unigram-LM (SentencePiece-style) tokenizer training.

The second classic subword trainer next to BPE (:mod:`bpe`), phrased
with the same iterate-on-a-relation discipline: the corpus text is
touched ONCE (word-frequency hash-agg); every EM iteration runs on the
DISTINCT-WORD vocabulary relation with the current piece table
attached as a one-row broadcast map — never a driver collect, never a
corpus rescan.

Algorithm (hard-EM / Viterbi variant, integer-exact by construction):

  1. seed: every substring of length 1..LMAX of every word, weighted
     by word frequency; keep the top V_SEED multi-char pieces (count
     desc, piece asc — total order) plus ALL single characters (which
     guarantees every word stays segmentable at every iteration);
  2. E-step: segment each distinct word with a Viterbi DP over the
     current piece scores. The DP objective is the lexicographic
     triple (fewest pieces, greatest summed piece count, smallest
     piece sequence) — a TOTAL order, so both engines pick the
     identical segmentation; scores are plain BIGINT counts (the
     fixed-point stand-in for log-probs: real SentencePiece maximizes
     Σ log p(piece); at fixed piece count that ranking is
     count-monotone, and the piece-count term mirrors its per-token
     prior). No float exists anywhere in the trajectory.
  3. M-step: replace piece counts with frequency-weighted usage
     counts from the chosen segmentations; prune multi-char pieces
     that went unused (count 0), keep single chars unconditionally.
  4. after N_EM rounds, emit the piece table with fixed-point
     probabilities (ppm = cnt * 10^6 // total — integer division).

The Spark DP is one ``aggregate`` fold over word positions (each step
min-selects over ≤ LMAX candidate splits via ``array_min`` — Spark
orders structs, array fields included, lexicographically). The DuckDB
oracle mirrors it with a RECURSIVE CTE over positions carrying the
last LMAX+1 DP states as a list — same struct order, same tie-breaks,
verified bit-identical.

At 100 TB: the corpus pass is the only data-scale stage; the word
relation is vocabulary-sized, the piece table is V_SEED-sized and
broadcasts, and the DP is O(len · LMAX) per distinct word.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import compute_table

#: max piece length considered (SentencePiece's max_sentencepiece_length)
LMAX = 4
#: multi-char seed-vocabulary cap
V_SEED = 150
#: hard-EM rounds (unrolled in the oracle)
N_EM = 2

#: Spark Viterbi DP over ``word`` with piece scores in map ``wmap``;
#: yields the final best struct (n, negsum, pieces)
_DP = f"""
element_at(
  aggregate(
    sequence(1, length(word)),
    array(named_struct(
      'n', 0, 'negsum', 0L, 'pieces', cast(array() as array<string>))),
    (acc, i) -> array_append(acc,
      array_min(
        filter(
          transform(sequence(greatest(1, i - {LMAX - 1}), i),
            s -> CASE WHEN wmap[substring(word, s, i - s + 1)]
                      IS NOT NULL THEN
                   named_struct(
                     'n', element_at(acc, s).n + 1,
                     'negsum', element_at(acc, s).negsum
                               - wmap[substring(word, s, i - s + 1)],
                     'pieces', array_append(
                         element_at(acc, s).pieces,
                         substring(word, s, i - s + 1)))
                 END),
          x -> x IS NOT NULL)))),
  length(word) + 1)
"""

#: all substrings of length 1..LMAX with multiplicity, Spark / DuckDB
_SUBSTRINGS = f"""
flatten(transform(sequence(1, length(word)),
  s -> transform(sequence(s, least(length(word), s + {LMAX - 1})),
       e -> substring(word, s, e - s + 1))))
"""
_SUBSTRINGS_SQL = f"""
flatten(list_transform(range(1, length(word) + 1),
  s -> list_transform(range(s, least(length(word), s + {LMAX - 1}) + 1),
       e -> substr(word, CAST(s AS INTEGER), CAST(e - s + 1 AS INTEGER)))))
"""


def _word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, cnt) — the single corpus pass (same shape as bpe.py)."""
    docs = compute_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )


def _segment(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """(word, cnt, pieces) — Viterbi-segment every distinct word with
    the current piece table as a one-row broadcast map. Checkpointed
    lazily: callers explode ``pieces`` (GenerateExec re-evaluates its
    child — the repo-wide trap)."""
    wmap = vocab.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("piece"), F.col("cnt")))
        ).alias("wmap")
    )
    return (
        words.crossJoin(F.broadcast(wmap))
        .selectExpr("word", "cnt", f"({_DP}).pieces AS pieces")
        .localCheckpoint(eager=False)
    )


def unigram_chain(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Run seed + N_EM hard-EM rounds; return (words, final vocab)."""
    words = _word_freq(spark, sf_dir)
    subs = (
        words.select(F.explode(F.expr(_SUBSTRINGS)).alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    multi = (
        subs.filter(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(V_SEED)
    )
    chars = subs.filter(F.length("piece") == 1)
    vocab = multi.unionByName(chars).localCheckpoint(eager=True)

    for _ in range(N_EM):
        seg = _segment(words, vocab)
        used = (
            seg.select(F.explode("pieces").alias("piece"), "cnt")
            .groupBy("piece")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
        vocab = (
            vocab.select("piece")
            .join(used, "piece", "left")
            .select(
                "piece",
                F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
            )
            .filter((F.length("piece") == 1) | (F.col("cnt") > 0))
            .localCheckpoint(eager=True)
        )
    return words, vocab


def _dp_cte(k: int, words_cte: str, wm_cte: str) -> str:
    """DuckDB recursive-CTE Viterbi DP: per word, walk positions
    carrying the last LMAX+1 DP states; identical struct order and
    tie-breaks as the Spark fold."""
    look = f"m[substr(word, CAST(s AS INTEGER), i + 2 - CAST(s AS INTEGER))]"
    prev = f"recent[CAST(s AS INTEGER) - greatest(0, i - {LMAX})]"
    piece = f"substr(word, CAST(s AS INTEGER), i + 2 - CAST(s AS INTEGER))"
    return f"""dp{k} AS (
        SELECT word, cnt, 0 AS i,
               [{{'n': 0, 'negsum': CAST(0 AS BIGINT),
                  'pieces': CAST([] AS VARCHAR[])}}] AS recent
        FROM {words_cte}
        UNION ALL
        SELECT word, cnt, i + 1,
          (recent || [ list_sort(
              list_filter(
                list_transform(range(greatest(1, i + 2 - {LMAX}), i + 2),
                  s -> CASE WHEN len({look}) > 0 THEN
                    {{'n': {prev}.n + 1,
                      'negsum': {prev}.negsum - {look}[1],
                      'pieces': list_append({prev}.pieces, {piece})}}
                  END),
                x -> x IS NOT NULL))[1] ])[-{LMAX + 1}:] AS recent
        FROM dp{k}, {wm_cte}
        WHERE i < length(word)
    ),
    seg{k} AS (
        SELECT word, cnt, recent[len(recent)].pieces AS pieces
        FROM dp{k} WHERE i = length(word)
    )"""


def _chain_ctes() -> str:
    stages = [
        """w0 AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word != ''
        GROUP BY 1
    ),
    p0 AS (
        SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
            SELECT unnest(SUBS) AS piece, cnt
            FROM w0
        ) GROUP BY 1
    ),
    v0 AS (
        SELECT piece, cnt FROM (
            SELECT piece, cnt FROM p0 WHERE length(piece) >= 2
            ORDER BY cnt DESC, piece LIMIT V_SEED
        )
        UNION ALL
        SELECT piece, cnt FROM p0 WHERE length(piece) = 1
    )""".replace("SUBS", _SUBSTRINGS_SQL).replace("V_SEED", str(V_SEED))
    ]
    for k in range(1, N_EM + 1):
        p = k - 1
        stages.append(
            f"""wm{p} AS (
        SELECT map_from_entries(list({{'k': piece, 'v': cnt}})) AS m
        FROM v{p}
    )"""
        )
        stages.append(_dp_cte(k, "w0", f"wm{p}"))
        stages.append(f"""u{k} AS (
        SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
            SELECT unnest(pieces) AS piece, cnt FROM seg{k}
        ) GROUP BY 1
    ),
    v{k} AS (
        SELECT v.piece, CAST(COALESCE(u.cnt, 0) AS BIGINT) AS cnt
        FROM v{p} v LEFT JOIN u{k} u USING (piece)
        WHERE length(v.piece) = 1 OR COALESCE(u.cnt, 0) > 0
    )""")
    return "WITH RECURSIVE " + ",\n    ".join(stages)


def _train_oracle_sql() -> str:
    return (
        _chain_ctes()
        + f""",
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM v{N_EM})
    SELECT piece, cnt,
           CAST(cnt * 1000000 // t AS BIGINT) AS p_ppm
    FROM v{N_EM}, tot"""
    )


@query("q_unigram_lm_train", sql=_train_oracle_sql())
def q_unigram_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned piece table after N_EM hard-EM rounds: piece,
    frequency-weighted usage count, and fixed-point probability (ppm,
    integer division) — every value reached by integer-only
    arithmetic, so any divergence in any round's segmentations or
    prune set shows up here."""
    _words, vocab = unigram_chain(spark, sf_dir)
    tot = vocab.agg(F.sum("cnt").cast("long").alias("t"))
    return vocab.crossJoin(F.broadcast(tot)).select(
        "piece",
        "cnt",
        F.expr("CAST(cnt * 1000000 div t AS BIGINT)").alias("p_ppm"),
    )


def _apply_oracle_sql() -> str:
    return (
        _chain_ctes()
        + f""",
    wmF AS (
        SELECT map_from_entries(list({{'k': piece, 'v': cnt}})) AS m
        FROM v{N_EM}
    ),
    {_dp_cte("F", "w0", "wmF")}
    SELECT CAST(length(word) AS BIGINT) AS word_len,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(cnt) AS BIGINT) AS n_occurrences,
           CAST(SUM(cnt * length(word)) AS BIGINT) AS total_chars,
           CAST(SUM(cnt * len(pieces)) AS BIGINT) AS total_pieces,
           CAST(SUM(cnt * len(pieces)) * 1000000
                // SUM(cnt * length(word)) AS BIGINT) AS ratio_ppm
    FROM segF GROUP BY 1"""
    )


@query("q_unigram_lm_apply", sql=_apply_oracle_sql())
def q_unigram_lm_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the vocabulary with the learned piece table and census
    the compression per word length: pieces emitted vs the character
    baseline, frequency-weighted, integer-exact ppm. The apply step is
    the same broadcast-map Viterbi the training loop uses — at 100 TB
    the piece table broadcasts and tokenization is a zero-shuffle map
    over the corpus."""
    words, vocab = unigram_chain(spark, sf_dir)
    seg = _segment(words, vocab)
    return seg.groupBy(
        F.length("word").cast("long").alias("word_len")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("cnt").cast("long").alias("n_occurrences"),
        F.sum(F.col("cnt") * F.length("word"))
        .cast("long")
        .alias("total_chars"),
        F.sum(F.col("cnt") * F.size("pieces"))
        .cast("long")
        .alias("total_pieces"),
        F.expr(
            "CAST(SUM(cnt * size(pieces)) * 1000000"
            " div SUM(cnt * length(word)) AS BIGINT)"
        ).alias("ratio_ppm"),
    )
