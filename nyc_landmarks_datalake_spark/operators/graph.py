"""Duplicate-cluster resolution: connected components over the verified
MinHash-LSH near-dup pair graph, by iterative min-label propagation.

The canonical last step of web-scale dedup: pairs → clusters → one
canonical doc per cluster. The DataFrame loop below IS the Pregel
pattern (messages = neighbor labels, combiner = MIN, vertex update =
least), which is how GraphX/GraphFrames implement it; at 100 TB each
iteration is one shuffle of the (tiny) edge set joined against labels,
and the iteration count is the cluster diameter — near-dup clusters are
quasi-cliques, so it converges in 2–4 rounds. ``localCheckpoint`` cuts
the growing lineage each round (otherwise plan size doubles per
iteration).

Oracle: the same fixpoint expressed as a DuckDB recursive CTE —
min(label over the reachable set) per vertex — giving the iterative
algorithm a full value-level parity check rather than a rows-only one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.operators.dedup import LSH_PAIR_CTES
from nyc_landmarks_datalake_spark.registry import QUERIES, query

MAX_ITERS = 20


def connected_components(
    pairs: DataFrame, max_iters: int = MAX_ITERS, algorithm: str = "plain"
) -> DataFrame:
    """(doc1, doc2) undirected pair list → (doc_id, cluster_id) with
    cluster_id = min doc id reachable from the vertex.

    ``algorithm='plain'`` converges in O(cluster diameter) rounds —
    right for near-dup graphs, whose clusters are quasi-cliques.
    ``algorithm='jump'`` adds pointer jumping (label := label's label)
    each round, converging in O(log diameter) — the choice for graphs
    with long chains (e.g. web-link components), at the cost of one
    extra self-join of the (small) label table per round."""
    import warnings

    if algorithm not in ("plain", "jump"):
        raise ValueError(f"algorithm must be 'plain' or 'jump', got {algorithm!r}")
    fwd = pairs.select(F.col("doc1").alias("src"), F.col("doc2").alias("dst"))
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("doc"))
        .distinct()
        .withColumn("lbl", F.col("doc"))
        .localCheckpoint()
    )
    changed = 0  # max_iters=0 skips the loop; 0 suppresses the warning
    for _ in range(max_iters):
        nbr = (
            edges.join(labels, edges.src == labels.doc)
            .groupBy(F.col("dst").alias("ndoc"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(nbr, labels.doc == nbr.ndoc, "left_outer")
            .select(
                "doc",
                F.least(F.col("lbl"), F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
            )
        )
        if algorithm == "jump":
            # label := label-of-label; every label is a vertex id (min
            # over the vertex set), so the inner join is total.
            jump = new_labels.select(
                F.col("doc").alias("jdoc"), F.col("lbl").alias("jlbl")
            )
            new_labels = (
                new_labels.join(jump, new_labels.lbl == jump.jdoc)
                .select("doc", F.col("jlbl").alias("lbl"))
            )
        new_labels = new_labels.localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # the loop exhausted max_iters with labels still moving —
        # components wider than the iteration budget would come back
        # split. Surface it instead of returning silently-wrong labels.
        if changed:
            warnings.warn(
                f"connected_components did not converge in {max_iters} "
                f"iterations ({changed} labels still changing); raise "
                "max_iters or use algorithm='jump' for long-chain graphs",
                RuntimeWarning,
                stacklevel=2,
            )
    return labels.select(F.col("doc").alias("doc_id"), F.col("lbl").alias("cluster_id"))


@query(
    "q_dup_clusters",
    sql=f"""
    WITH RECURSIVE {LSH_PAIR_CTES},
    edges AS (
        SELECT doc1 AS src, doc2 AS dst FROM lsh_pairs
        UNION ALL
        SELECT doc2 AS src, doc1 AS dst FROM lsh_pairs
    ),
    verts AS (SELECT DISTINCT src AS doc FROM edges),
    reach AS (
        SELECT doc, doc AS lbl FROM verts
        UNION
        SELECT e.dst AS doc, r.lbl
        FROM reach r JOIN edges e ON e.src = r.doc
    )
    SELECT doc AS doc_id, MIN(lbl) AS cluster_id
    FROM reach GROUP BY doc
    """,
)
def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 'jump' (pointer jumping, O(log diameter) rounds): oversized band
    # buckets now expand as consecutive-pair CHAINS (dedup.
    # MAX_BAND_BUCKET), so a degenerate mega-bucket yields a long-chain
    # component that plain propagation would need O(members) rounds to
    # label. Result is identical; only convergence speed differs.
    pairs = QUERIES["q_dedup_minhash_lsh"](spark, sf_dir)
    return connected_components(pairs, algorithm="jump")


# ---------------------------------------------------------------------------
# Dedup applied end-to-end: keep one canonical doc (min id) per near-dup
# cluster and census the surviving corpus — the actual deliverable of a
# dedup pipeline. Non-canonical members anti-join out of the corpus;
# at 100 TB the drop list is tiny (near-dup members only) and
# broadcasts.
# ---------------------------------------------------------------------------
@query(
    "q_dedup_apply",
    sql=f"""
    WITH RECURSIVE {LSH_PAIR_CTES},
    edges AS (
        SELECT doc1 AS src, doc2 AS dst FROM lsh_pairs
        UNION ALL
        SELECT doc2 AS src, doc1 AS dst FROM lsh_pairs
    ),
    verts AS (SELECT DISTINCT src AS doc FROM edges),
    reach AS (
        SELECT doc, doc AS lbl FROM verts
        UNION
        SELECT e.dst AS doc, r.lbl
        FROM reach r JOIN edges e ON e.src = r.doc
    ),
    clusters AS (
        SELECT doc, MIN(lbl) AS cluster_id FROM reach GROUP BY doc
    ),
    dropped AS (SELECT doc FROM clusters WHERE doc <> cluster_id)
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE doc_id NOT IN (SELECT doc FROM dropped)
    GROUP BY 1
    """,
)
def q_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F  # local alias for clarity

    from nyc_landmarks_datalake_spark.sources.catalog import table

    pairs = QUERIES["q_dedup_minhash_lsh"](spark, sf_dir)
    clusters = connected_components(pairs, algorithm="jump")
    dropped = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    docs = table(spark, sf_dir, "documents")
    return (
        docs.join(F.broadcast(dropped), "doc_id", "left_anti")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )
