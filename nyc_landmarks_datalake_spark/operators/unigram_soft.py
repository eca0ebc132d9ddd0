"""Soft-EM (forward-backward) unigram-LM tokenizer training.

The full-EM counterpart to :mod:`unigram_lm`'s hard-EM/Viterbi variant
— real SentencePiece accumulates EXPECTED piece counts over all
segmentations, not just the best one. The expected count of an arc
(s, e) labeled with piece w[s..e] is the posterior

    gamma(s, e) = f[s-1] * p(piece) * b[e] / f[L]

with f/b the forward/backward lattice sums. Floats would drift across
engines, so the whole trajectory is FIXED-POINT INTEGER by
construction:

  * probabilities are ppm integers (p_ppm <= 10^6);
  * lattice values are scaled by S = 10^12 (f[0] = b[L] = S) and every
    lattice step floors per term: f[i] = sum_s (f[s-1] * p_ppm) // 10^6
    — total path mass <= 1, so every f/b stays <= S and each product
    f * p_ppm <= 10^18 stays inside BIGINT;
  * gamma is computed in ppm with ONE wide (DECIMAL(38,0) Spark-side,
    HUGEINT DuckDB-side) triple product:
    g_ppm = f[s-1] * p_ppm * b[e] // (f[L] * S), <= 10^30 intermediate
    — both engines truncate toward zero, verified identical;
  * M-step: usage u(piece) = sum_w cnt(w) * g_ppm (BIGINT), prune
    multi-char pieces with u = 0 (chars kept unconditionally — the
    alphabet guarantee), re-normalize p_ppm = u * 10^6 // max(total, 1)
    in the same wide type.

Quantization semantics (identical in both engines, documented rather
than hidden): a piece whose probability floors to 0 ppm contributes
zero mass, and a word whose entire lattice floors to f[L] = 0
contributes no expected counts that round.

Spark plan shape: ONE corpus pass (word-frequency hash agg); each of
the N_SOFT EM rounds runs on the DISTINCT-WORD relation with the piece
table attached as a one-row broadcast map — forward and backward are
single ``aggregate`` folds over word positions, the arc explosion is
O(len * LMAX) structs per word (localCheckpoint'ed before the explode
— GenerateExec re-evaluates its child), and the M-step is a hash agg
on the piece key. At 100 TB only the first pass sees the data.

The DuckDB oracle unrolls the same N_SOFT rounds: RECURSIVE CTEs carry
the full forward/backward lists per word (words are short), the arc
list mirrors the Spark expression element-for-element, and every
multiply-referenced CTE is AS MATERIALIZED (DuckDB inlines CTEs by
default; un-materialized the per-round 3-4x references make planning
exponential — the wordpiece.py lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.operators.unigram_lm import (
    LMAX,
    V_SEED,
    _SUBSTRINGS,
    _SUBSTRINGS_SQL,
    _word_freq,
)
from nyc_landmarks_datalake_spark.registry import query

#: soft-EM rounds (unrolled in the oracle)
N_SOFT = 2
#: lattice fixed-point scale (f[0] = b[len] = S)
S = 10**12

#: Spark forward lattice over ``word`` with ppm map ``wmap``:
#: array f where element i+1 == f[i], f[0] = S
_FWD = f"""
aggregate(
  sequence(1, length(word)),
  array(CAST({S} AS BIGINT)),
  (acc, i) -> array_append(acc,
    aggregate(
      filter(
        transform(sequence(greatest(1, i - {LMAX - 1}), i),
          s -> CASE WHEN wmap[substring(word, s, i - s + 1)]
                    IS NOT NULL THEN
                 (element_at(acc, s)
                  * wmap[substring(word, s, i - s + 1)]) div 1000000
               END),
        x -> x IS NOT NULL),
      0L, (a, x) -> a + x)))
"""

#: Spark backward lattice: array b where element j == b[len - j + 1],
#: i.e. b[e] == element_at(barr, length(word) - e + 1); b[len] = S
_BWD = f"""
aggregate(
  sequence(length(word) - 1, 0, -1),
  array(CAST({S} AS BIGINT)),
  (acc, i) -> array_append(acc,
    aggregate(
      filter(
        transform(sequence(i + 1, least(length(word), i + {LMAX})),
          e -> CASE WHEN wmap[substring(word, i + 1, e - i)]
                    IS NOT NULL THEN
                 (wmap[substring(word, i + 1, e - i)]
                  * element_at(acc, length(word) - e + 1)) div 1000000
               END),
        x -> x IS NOT NULL),
      0L, (a, x) -> a + x)))
"""

#: Spark arc list over (word, farr, barr, wmap): struct(piece, g_ppm)
#: per in-vocab arc of a word with nonzero total mass
_ARCS = f"""
flatten(transform(sequence(1, length(word)),
  s -> filter(
    transform(sequence(s, least(length(word), s + {LMAX - 1})),
      e -> CASE WHEN wmap[substring(word, s, e - s + 1)] IS NOT NULL
                AND element_at(farr, length(word) + 1) > 0 THEN
             named_struct(
               'piece', substring(word, s, e - s + 1),
               'g', CAST(
                 CAST(element_at(farr, s) AS DECIMAL(38,0))
                 * wmap[substring(word, s, e - s + 1)]
                 * element_at(barr, length(word) - e + 1)
                 div (CAST(element_at(farr, length(word) + 1)
                           AS DECIMAL(38,0)) * {S})
                 AS BIGINT))
           END),
    x -> x IS NOT NULL)))
"""


def _wmap(vocab: DataFrame) -> DataFrame:
    return vocab.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("piece"), F.col("p_ppm")))
        ).alias("wmap")
    )


def soft_em_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed (identical to the hard-EM seed, ppm-normalized) + N_SOFT
    forward-backward EM rounds; returns the final (piece, u, p_ppm)."""
    words = _word_freq(spark, sf_dir)
    subs = (
        words.select(F.explode(F.expr(_SUBSTRINGS)).alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("u"))
        .localCheckpoint(eager=False)
    )
    multi = (
        subs.filter(F.length("piece") >= 2)
        .orderBy(F.desc("u"), F.asc("piece"))
        .limit(V_SEED)
    )
    chars = subs.filter(F.length("piece") == 1)
    vocab = _normalize(multi.unionByName(chars)).localCheckpoint(eager=True)

    for _ in range(N_SOFT):
        lat = (
            words.crossJoin(F.broadcast(_wmap(vocab)))
            .selectExpr(
                "word",
                "cnt",
                "wmap",
                f"({_FWD}) AS farr",
                f"({_BWD}) AS barr",
            )
            .selectExpr("word", "cnt", f"({_ARCS}) AS arcs")
            .localCheckpoint(eager=False)  # explode re-evaluates child
        )
        usage = (
            lat.select(F.explode("arcs").alias("a"), "cnt")
            .groupBy(F.col("a.piece").alias("piece"))
            .agg(
                F.sum(F.col("cnt") * F.col("a.g")).cast("long").alias("u")
            )
        )
        kept = (
            vocab.select("piece")
            .join(usage, "piece", "left")
            .select(
                "piece",
                F.coalesce(F.col("u"), F.lit(0)).cast("long").alias("u"),
            )
            .filter((F.length("piece") == 1) | (F.col("u") > 0))
        )
        vocab = _normalize(kept).localCheckpoint(eager=True)
    return vocab


def _normalize(counted: DataFrame) -> DataFrame:
    """(piece, u) -> (piece, u, p_ppm) with the wide-type ppm division."""
    tot = counted.agg(F.sum("u").cast("long").alias("t"))
    return counted.crossJoin(F.broadcast(tot)).selectExpr(
        "piece",
        "u",
        "CAST(CAST(u AS DECIMAL(38,0)) * 1000000"
        " div greatest(CAST(t AS DECIMAL(38,0)), 1) AS BIGINT) AS p_ppm",
    )


def _fwd_cte(k: int, vm: str) -> str:
    return f"""fw{k} AS (
        SELECT word, cnt, 0 AS i, [CAST({S} AS BIGINT)] AS f FROM w0
        UNION ALL
        SELECT word, cnt, i + 1, list_append(f, CAST(COALESCE(
          list_sum(list_filter(
            list_transform(range(greatest(1, i + 2 - {LMAX}), i + 2),
              s -> CASE WHEN len(m[substr(word, CAST(s AS INTEGER),
                                  CAST(i + 2 - s AS INTEGER))]) > 0 THEN
                     (f[CAST(s AS INTEGER)]
                      * m[substr(word, CAST(s AS INTEGER),
                          CAST(i + 2 - s AS INTEGER))][1]) // 1000000
                   END),
            x -> x IS NOT NULL)), 0) AS BIGINT))
        FROM fw{k}, {vm} WHERE i < length(word)
    )"""


def _bwd_cte(k: int, vm: str) -> str:
    # state i: list b holds [b[L], ..., b[i]]; b[e] = b[L - e + 1]
    return f"""bw{k} AS (
        SELECT word, cnt, length(word) AS i,
               [CAST({S} AS BIGINT)] AS b FROM w0
        UNION ALL
        SELECT word, cnt, i - 1, list_append(b, CAST(COALESCE(
          list_sum(list_filter(
            list_transform(range(i, least(length(word), i - 1 + {LMAX}) + 1),
              e -> CASE WHEN len(m[substr(word, CAST(i AS INTEGER),
                                  CAST(e - i + 1 AS INTEGER))]) > 0 THEN
                     (m[substr(word, CAST(i AS INTEGER),
                        CAST(e - i + 1 AS INTEGER))][1]
                      * b[CAST(length(word) - e + 1 AS INTEGER)]) // 1000000
                   END),
            x -> x IS NOT NULL)), 0) AS BIGINT))
        FROM bw{k}, {vm} WHERE i > 0
    )"""


def _round_ctes(k: int) -> str:
    """One unrolled EM round: lattices off vm{k-1}, arcs, usage, prune,
    re-normalized v{k}/vm{k}."""
    p = k - 1
    return f"""{_fwd_cte(k, f"vm{p}")},
    {_bwd_cte(k, f"vm{p}")},
    lat{k} AS MATERIALIZED (
        SELECT fw.word, fw.cnt, fw.f, bw.b
        FROM (SELECT word, cnt, f FROM fw{k} WHERE i = length(word)) fw
        JOIN (SELECT word, b FROM bw{k} WHERE i = 0) bw USING (word)
    ),
    arcs{k} AS MATERIALIZED (
        SELECT word, cnt, unnest(
          flatten(list_transform(range(1, length(word) + 1),
            s -> list_filter(
              list_transform(range(s, least(length(word),
                                            s + {LMAX - 1}) + 1),
                e -> CASE WHEN len(m[substr(word, CAST(s AS INTEGER),
                                    CAST(e - s + 1 AS INTEGER))]) > 0
                          AND f[length(word) + 1] > 0 THEN
                       {{'piece': substr(word, CAST(s AS INTEGER),
                                         CAST(e - s + 1 AS INTEGER)),
                         'g': CAST(
                           CAST(f[CAST(s AS INTEGER)] AS HUGEINT)
                           * m[substr(word, CAST(s AS INTEGER),
                               CAST(e - s + 1 AS INTEGER))][1]
                           * b[CAST(length(word) - e + 1 AS INTEGER)]
                           // (CAST(f[length(word) + 1] AS HUGEINT)
                               * {S})
                           AS BIGINT)}}
                     END),
              x -> x IS NOT NULL)))) AS a
        FROM lat{k}, vm{p}
    ),
    u{k} AS MATERIALIZED (
        SELECT a.piece AS piece, CAST(SUM(cnt * a.g) AS BIGINT) AS u
        FROM arcs{k} GROUP BY 1
    ),
    v{k} AS MATERIALIZED (
        SELECT piece, u, CAST(CAST(u AS HUGEINT) * 1000000
               // greatest(t, 1) AS BIGINT) AS p_ppm
        FROM (
            SELECT v.piece, CAST(COALESCE(u.u, 0) AS BIGINT) AS u
            FROM v{p} v LEFT JOIN u{k} u USING (piece)
            WHERE length(v.piece) = 1 OR COALESCE(u.u, 0) > 0
        ), (SELECT CAST(SUM(CAST(COALESCE(u.u, 0) AS HUGEINT)) AS HUGEINT)
                   AS t
            FROM v{p} v LEFT JOIN u{k} u USING (piece)
            WHERE length(v.piece) = 1 OR COALESCE(u.u, 0) > 0)
    ),
    vm{k} AS MATERIALIZED (
        SELECT map_from_entries(list({{'k': piece, 'v': p_ppm}})) AS m
        FROM v{k}
    )"""


def _oracle_sql() -> str:
    stages = [
        """w0 AS MATERIALIZED (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word != ''
        GROUP BY 1
    ),
    p0 AS (
        SELECT piece, CAST(SUM(cnt) AS BIGINT) AS u FROM (
            SELECT unnest(SUBS) AS piece, cnt FROM w0
        ) GROUP BY 1
    ),
    v0 AS MATERIALIZED (
        SELECT piece, u, CAST(CAST(u AS HUGEINT) * 1000000
               // greatest(t, 1) AS BIGINT) AS p_ppm
        FROM (
            SELECT piece, u FROM (
                SELECT piece, u FROM p0 WHERE length(piece) >= 2
                ORDER BY u DESC, piece LIMIT V_SEED
            )
            UNION ALL
            SELECT piece, u FROM p0 WHERE length(piece) = 1
        ), (SELECT CAST(SUM(u) AS HUGEINT) AS t FROM (
                SELECT u FROM (
                    SELECT piece, u FROM p0 WHERE length(piece) >= 2
                    ORDER BY u DESC, piece LIMIT V_SEED
                )
                UNION ALL
                SELECT u FROM p0 WHERE length(piece) = 1
            ))
    ),
    vm0 AS MATERIALIZED (
        SELECT map_from_entries(list({'k': piece, 'v': p_ppm})) AS m
        FROM v0
    )""".replace("SUBS", _SUBSTRINGS_SQL).replace("V_SEED", str(V_SEED))
    ]
    for k in range(1, N_SOFT + 1):
        stages.append(_round_ctes(k))
    return (
        "WITH RECURSIVE "
        + ",\n    ".join(stages)
        + f"\n    SELECT piece, u, p_ppm FROM v{N_SOFT}"
    )


@query("q_unigram_lm_soft_em", sql=_oracle_sql())
def q_unigram_lm_soft_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The piece table after N_SOFT forward-backward EM rounds: piece,
    fixed-point expected usage (ppm-scaled BIGINT), re-normalized
    probability — every value reached by integer-only arithmetic, so
    any divergence anywhere in either lattice or the prune set
    surfaces here."""
    return soft_em_chain(spark, sf_dir)
