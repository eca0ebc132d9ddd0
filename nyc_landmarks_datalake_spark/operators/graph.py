"""Duplicate-cluster resolution: connected components over the union of
verified MinHash-LSH near-dup pairs AND exact-duplicate star edges, by
iterative min-label propagation.

The canonical last step of web-scale dedup: pairs → clusters → one
canonical doc per cluster. The DataFrame loop below IS the Pregel
pattern (messages = neighbor labels, combiner = MIN, vertex update =
least), which is how GraphX/GraphFrames implement it; at 100 TB each
iteration is one shuffle of the (tiny) edge set joined against labels,
and the iteration count is the cluster diameter — near-dup clusters are
quasi-cliques, so it converges in 2–4 rounds. ``localCheckpoint`` cuts
the growing lineage each round (otherwise plan size doubles per
iteration).

The exact-dedup star edges (dedup.exact_dup_edges) matter: the
df-capped verification Jaccard scores every pair inside a
>MAX_SHINGLE_DF byte-identical template group 0, so LSH pairs alone
would leave exactly the headline web-dedup target (massive template
groups) undeduped. The star union restores that class at O(group) cost.

Oracle: the same fixpoint expressed as a DuckDB recursive CTE —
min(label over the reachable set) per vertex — giving the iterative
algorithm a full value-level parity check rather than a rows-only one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.operators.dedup import (
    EXACT_DUP_EDGES_SQL,
    LSH_PAIR_CTES,
    exact_dup_edges,
)
from nyc_landmarks_datalake_spark.registry import QUERIES, query
from nyc_landmarks_datalake_spark.sources.catalog import table

MAX_ITERS = 20
#: with algorithm='auto', plain propagation runs for this many rounds
#: before pointer jumping kicks in — quasi-clique near-dup graphs
#: converge within it and never pay the jump self-join; chain-shaped
#: components (mega-bucket fallback) escalate automatically.
AUTO_JUMP_AFTER = 3


def connected_components(
    pairs: DataFrame,
    max_iters: int = MAX_ITERS,
    algorithm: str = "plain",
    stats: dict | None = None,
) -> DataFrame:
    """(doc1, doc2) undirected pair list → (doc_id, cluster_id) with
    cluster_id = min doc id reachable from the vertex.

    ``algorithm='plain'`` converges in O(cluster diameter) rounds —
    right for near-dup graphs, whose clusters are quasi-cliques.
    ``algorithm='jump'`` adds pointer jumping (label := label's label)
    every round, converging in O(log diameter) — for graphs known to be
    chain-shaped, at the cost of one extra self-join of the (small)
    label table per round. ``algorithm='auto'`` starts plain and
    enables jumping from round AUTO_JUMP_AFTER on: clique-like graphs
    (the common case) finish before ever paying for a jump, long chains
    still converge in O(log n) — this is the adaptive default for the
    dedup pipeline, where chains only exist if some band bucket hit
    MAX_BAND_BUCKET.

    Pass a dict as ``stats`` to receive convergence telemetry:
    ``iterations`` (rounds run) and ``changed`` (labels moved per
    round, last entry 0 on convergence) — the per-round driver-side
    ``count()`` already exists for convergence detection, so recording
    it is free. Tests pin the iteration budget with this."""
    import warnings

    if algorithm not in ("plain", "jump", "auto"):
        raise ValueError(
            f"algorithm must be 'plain', 'jump' or 'auto', got {algorithm!r}"
        )
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
    changed_per_round: list[int] = []
    for it in range(max_iters):
        jumping = algorithm == "jump" or (
            algorithm == "auto" and it >= AUTO_JUMP_AFTER
        )
        nbr = (
            edges.join(labels, edges.src == labels.doc)
            .groupBy(F.col("dst").alias("ndoc"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        # the update carries the previous label alongside so convergence
        # detection is a filter over the checkpointed frame — no extra
        # old-vs-new join per round
        upd = labels.join(nbr, labels.doc == nbr.ndoc, "left_outer").select(
            "doc",
            F.col("lbl").alias("__old"),
            F.least(F.col("lbl"), F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
        )
        if jumping:
            # label := label-of-label; every label is a vertex id (min
            # over the vertex set), so the inner join is total.
            jump = upd.select(F.col("doc").alias("jdoc"), F.col("lbl").alias("jlbl"))
            upd = upd.join(jump, upd.lbl == jump.jdoc).select(
                "doc", "__old", F.col("jlbl").alias("lbl")
            )
        new_labels = upd.localCheckpoint()
        changed = new_labels.filter(F.col("lbl") != F.col("__old")).count()
        changed_per_round.append(changed)
        labels = new_labels.drop("__old")
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
    if stats is not None:
        stats["iterations"] = len(changed_per_round)
        stats["changed"] = changed_per_round
    return labels.select(
        F.col("doc").alias("doc_id"), F.col("lbl").alias("cluster_id")
    )


def _dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering input: LSH-verified near-dup pairs ∪ exact-duplicate
    star edges. Duplicate edges between the two sources are harmless to
    min-label propagation (the MIN combiner dedups), so no distinct."""
    lsh = QUERIES["q_dedup_minhash_lsh"](spark, sf_dir).select("doc1", "doc2")
    exact = exact_dup_edges(table(spark, sf_dir, "documents"))
    return lsh.unionByName(exact)


#: edge CTEs shared by the two clustering consumers (expects
#: LSH_PAIR_CTES before it in the WITH list).
_EDGE_CTES = f"""exact_edges AS ({EXACT_DUP_EDGES_SQL}),
    all_pairs AS (
        SELECT doc1, doc2 FROM lsh_pairs
        UNION ALL
        SELECT doc1, doc2 FROM exact_edges
    ),
    edges AS (
        SELECT doc1 AS src, doc2 AS dst FROM all_pairs
        UNION ALL
        SELECT doc2 AS src, doc1 AS dst FROM all_pairs
    )"""


@query(
    "q_dup_clusters",
    sql=f"""
    WITH RECURSIVE {LSH_PAIR_CTES},
    {_EDGE_CTES},
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
    return connected_components(_dup_pairs(spark, sf_dir), algorithm="auto")


# ---------------------------------------------------------------------------
# Dedup applied end-to-end: keep one canonical doc (min id) per
# near-dup/exact-dup cluster and census the surviving corpus — the
# actual deliverable of a dedup pipeline. Non-canonical members
# anti-join out of the corpus; at 100 TB the drop list is tiny (dup
# members only) and broadcasts.
# ---------------------------------------------------------------------------
@query(
    "q_dedup_apply",
    sql=f"""
    WITH RECURSIVE {LSH_PAIR_CTES},
    {_EDGE_CTES},
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
    clusters = connected_components(_dup_pairs(spark, sf_dir), algorithm="auto")
    dropped = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    docs = table(spark, sf_dir, "documents")
    # No broadcast hint: at a high dup rate the drop list is O(corpus) —
    # billions of ids at 100 TB — so a mandatory broadcast would OOM the
    # driver. Catalyst's size-based threshold still broadcasts when the
    # list is actually small; otherwise a shuffled anti-join is correct.
    return (
        docs.join(dropped, "doc_id", "left_anti")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )
