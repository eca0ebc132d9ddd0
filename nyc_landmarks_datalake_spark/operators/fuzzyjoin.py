"""Fuzzy entity-resolution join: edit-distance-1 key matching at scale.

The classic record-linkage primitive (dirty-key self-join) phrased so
it NEVER goes all-pairs: deletion-neighborhood blocking (FastSS /
SymSpell). Every key generates its identity plus its |key| single-
deletion variants (linear in total key length); two keys within edit
distance 1 — substitution, insertion, or deletion — are guaranteed to
share at least one variant, so a plain hash self-join on the variant
column finds every candidate, and an O(len) ``levenshtein`` verify
(built-in in BOTH engines, unit-cost semantics) discards the false
positives (shared-variant pairs at true distance 2). Candidate pairs
are DISTINCT-ed before verification — a pair can share several
variants (adjacent duplicate characters).

At 100 TB: variant generation is a map-side explode (~(L+1)× row
expansion on the KEY relation, not the corpus), the self-join shuffles
co-partitioned on the variant hash, and verification + census are
embarrassingly parallel. No similarity scan ever enumerates the
cross product.

`q_fuzzy_join_names` runs it over customer names (`Customer#%09d`),
where single-digit substitutions are dense, and censuses the matched
pairs by the 1-based position of the first differing character — a
deterministic integer breakdown (plus the lexicographically smallest
pair as a sample) that pins both the blocking and the verify step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.registry import query
from nyc_landmarks_datalake_spark.sources.catalog import table

#: identity + all single-deletion variants, deduped (array_union dedups)
_VARIANTS = """
array_union(
  array(name),
  transform(sequence(1, length(name)),
    i -> concat(substring(name, 1, i - 1),
                substring(name, i + 1, length(name)))))
"""
_VARIANTS_SQL = """
list_distinct(list_append(
  list_transform(range(1, length(name) + 1),
    i -> substr(name, 1, CAST(i - 1 AS INTEGER)) ||
         substr(name, CAST(i + 1 AS INTEGER), length(name))),
  name))
"""

_ORACLE = f"""
WITH names AS (
    SELECT DISTINCT c_name AS name FROM customer
),
keys AS (
    SELECT name, unnest({_VARIANTS_SQL}) AS k FROM names
),
cand AS (
    -- verify BEFORE the pair-dedup shuffle: the O(len) levenshtein is
    -- far cheaper than shuffling distance-2 false-positive candidates
    SELECT DISTINCT a.name AS name_a, b.name AS name_b
    FROM keys a JOIN keys b ON a.k = b.k AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= 1
),
pairs AS (
    SELECT name_a, name_b,
           CAST(list_position(
               list_transform(
                 range(1, greatest(length(name_a), length(name_b)) + 1),
                 i -> substr(name_a, CAST(i AS INTEGER), 1) =
                      substr(name_b, CAST(i AS INTEGER), 1)),
               false) AS BIGINT) AS diff_pos
    FROM cand
)
SELECT diff_pos,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       MIN(name_a || '|' || name_b) AS sample_pair
FROM pairs GROUP BY 1
"""


@query("q_fuzzy_join_names", sql=_ORACLE)
def q_fuzzy_join_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 fuzzy self-join over customer names via
    deletion-neighborhood blocking, censused by the 1-based first
    differing character position."""
    names = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_name").alias("name"))
        .distinct()
    )
    # block on the 8-byte hash of the variant, not the variant string:
    # the join compares/hashes a long instead of an ~L-char key and the
    # exchange carries 8 bytes per key (guide §2.3 narrower types).
    # Exact: any pair with lev <= 1 shares a REAL deletion variant
    # (delete the differing position from both), so hash collisions can
    # only add rows that the levenshtein filter rejects or the DISTINCT
    # dedups — never remove a true pair.
    keys = names.select(
        "name", F.explode(F.expr(_VARIANTS)).alias("k")
    ).select("name", F.xxhash64("k").alias("k")).localCheckpoint(eager=False)
    # verify BEFORE the pair-dedup shuffle: the map-side levenshtein
    # drops distance-2 false positives so the DISTINCT only shuffles
    # true pairs (sf10: 142 s -> the filter halves the shuffled rows).
    # levenshtein(a, b, 1) is the bounded form — it walks only the
    # width-3 diagonal band and exits early, ~6x fewer DP cells on the
    # ~L-char names than the unbounded call (guide §1.2 per-task work);
    # it returns -1 iff the distance exceeds 1, so `>= 0` is exactly
    # the old `<= 1` (row-count-verified at sf0.1: 572,554 both ways)
    cand = (
        keys.alias("a")
        .join(keys.alias("b"), "k")
        .filter(
            (F.col("a.name") < F.col("b.name"))
            & F.expr("levenshtein(a.name, b.name, 1) >= 0")
        )
        .select(
            F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b")
        )
        .distinct()
    )
    pairs = cand.withColumn(
        "diff_pos",
        F.expr(
            "CAST(array_position(transform("
            "  sequence(1, greatest(length(name_a), length(name_b))),"
            "  i -> substring(name_a, i, 1) = substring(name_b, i, 1)),"
            " false) AS BIGINT)"
        ),
    )
    return pairs.groupBy("diff_pos").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.min(F.expr("concat(name_a, '|', name_b)")).alias("sample_pair"),
    )
