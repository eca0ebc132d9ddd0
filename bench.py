"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Queries are materialized through the noop sink so the full plan executes
(count() would let Catalyst prune the computed columns).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nyc_landmarks_datalake_spark import registry
from nyc_landmarks_datalake_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q10_returned_items",
    "q09_product_profit",
    "q21_waiting_suppliers",
    "q_correlated_avg_qty",
    "q_topk_per_group",
    "q_running_total",
    "q_tumbling_window",
    "q_session_window",
    "q_asof_join_events_orders",
    "q_json_props",
    "q_dedup_minhash_lsh",
    "q_dup_clusters",
    "q_dedup_ngram_jaccard",
    "q_merge_upsert",
    "q_sequence_pack",
    "q_simhash_signatures",
    "q_dedup_simhash_hamming",
    "q_cosine_topk",
    "q_ivf_topk",
    "q_embedding_neardup",
    "q_text_stats",
    # added r2: the curation composition + contamination probe, and the
    # distributed global-rank rewrite (r1 VERDICT's flagged bottleneck)
    "q_curation_census",
    "q_contamination_check",
    "q_rank_battery",
    # added r7: the r6 additions (Python image-decode path especially
    # needs a tracked number before it grows) + the r7 PNG decoder and
    # the stateful-streaming replay
    "q_image_decode_stats",
    "q_mixture_weights",
    "q_repetition_signals",
    "q_png_decode_stats",
    "q_gif_decode_stats",
    "q_gif_frame_sample",
    "q_jpeg_decode_stats",
    "q_wav_decode_stats",
    "q_image_resize_stats",
    "q_stateful_user_profiles",
    # added late-r7: clustering/retrieval tier — k-means drives two
    # broadcast-assign passes plus a k*d agg, SemDeDup adds the capped
    # intra-cluster pair scan, BM25/quantize/chunking are map-heavy
    "q_kmeans_lloyd",
    "q_semantic_dedup",
    "q_doc_chunks",
    "q_bm25_topk",
    "q_embedding_quantize",
    "q_pagerank_purchases",
    "q_dedup_jaccard_wide",
    "q_matryoshka_recall",
    "q_zorder_layout",
    "q_hll_union_rollup",
    # added r7 (second leg): graph tier (oriented triangles, unrolled
    # BFS), deterministic CMS, bloom pre-filter join, association lift,
    # fixed-point LM scoring, exact covariance, robust stats
    "q_triangle_count",
    "q_bfs_hops",
    "q_cms_heavy_hitters",
    "q_bloom_join",
    "q_copurchase_lift",
    "q_ngram_lm_score",
    "q_embedding_covariance",
    "q_mad_outliers",
    "q_chisq_independence",
    # added r7 (third leg): Spark 4 SQL surface, web curation,
    # content-defined span dedup, Arrow-native map, ray-cast
    # containment — newly TRACKED work, not regressions
    "q_variant_shred",
    "q_sql_udf_pricing",
    "q_collation_distinct",
    "q_pipe_syntax_pricing",
    "q_lateral_topk_customers",
    "q_url_canonicalize",
    "q_pii_redaction",
    "q_length_bucket_batching",
    "q_substring_dup_spans",
    "q_arrow_map_counts",
    "q_point_in_polygon",
    "q_time_weighted_avg",
    "q_ohlc_bars",
    "q_skewness_kurtosis",
    "q_mode_quantity",
    "q_tokenizer_coverage",
    "q_listagg_ordered",
    "q_retrieval_mrr",
    "q_cusum_drift",
    "q_trimmed_mean",
    "q_try_arithmetic",
    "q_map_hof_battery",
    "q_pandas_api_agg",
    "q_decayed_counts",
    "q_incremental_dedup",
    "q_string_funcs3",
    "q_compaction_census",
    "q_quantized_retrieval_recall",
    "q_degree_distribution",
    "q_k_anonymity",
    "q_dedup_containment",
    "q_selection_parity",
    "q_sax_words",
    "q_stream_sliding_replay",
    "q_activity_heatmap",
    "q_asof_forward_join",
    "q_benford_digits",
    "q_cohort_ltv",
    "q_illegal_transitions",
    "q_rrf_fusion",
    "q_kll_quantile_rollup",
    "q_theta_sketch_setops",
    "q_rerank_two_stage",
    "q_curriculum_schedule",
    "q_session_variables",
    # added r9 (second leg): PQ completes the compression tier
    "q_pq_retrieval_recall",
    "q_image_phash_dedup",
    "q_hard_negative_mining",
    # added r9 (third leg): domain-partitioned dedup + DPP star join
    "q_domain_dedup_cascade",
    "q_dpp_join_agg",
    "q_repetition_filter",
    "q_soft_dedup_weights",
    # added r10: streaming outer-join flush + ingest-loop LSH dedup
    "q_stream_outer_join",
    "q_stream_ingest_dedup",
    "q_curation_pipeline_e2e",
    "q_bpe_merges",
    "q_recursive_cte_hierarchy",
    "q_bpe_apply",
    "q_video_decode_stats",
    "q_exact_quantiles_bucketed",
    # added r11: hashed-n-gram quality-classifier training + scorer,
    # chained stateful operators (stream-stream join -> windowed agg)
    "q_quality_clf_train",
    "q_quality_clf_apply",
    "q_stream_join_windowed",
    "q_unigram_lm_train",
    "q_dsir_importance",
    # added late-r11: WordPiece completes the tokenizer-trainer triad;
    # the deletion-neighborhood fuzzy join is a new (blocking-join)
    # shuffle shape worth a tracked number
    "q_wordpiece_merges",
    "q_fuzzy_join_names",
    # added r13: Fellegi-Sunter linkage (landed r12 untracked) + the
    # r13 additions — iterative graph peeling and the PSI drift monitor
    "q_record_linkage",
    "q_linkage_weights",
    "q_kcore_decomposition",
    "q_psi_drift",
    "q_js_drift",
    # added r14: semi-synchronous label-propagation communities and
    # the bitmask multi-source-BFS harmonic-centrality sketch
    "q_label_propagation",
    "q_harmonic_centrality",
    "q_betweenness_sketch",
    # added r15: classic closeness + eccentricity from the same
    # bitmask MS-BFS machinery (same pivots as harmonic), and the
    # directional KL pair completing the drift family
    "q_closeness_eccentricity",
    "q_kl_drift",
    "q_distance_distribution",
    # added r16: neighborhood-index link prediction (wedge-enumerated
    # distance-2 candidates, fixed-point AA/RA weights) and Newman
    # degree assortativity over the same co-purchase graph
    "q_link_prediction",
    "q_degree_assortativity",
]


def _bench_ingest(spark, sf_dir: str) -> float:
    """Time the bronze→silver ingest pipeline (the reference's entire
    production surface, R1-R14) over a CSV staged from the documents
    table with a synthesized WKT geometry column. Staging is outside
    the timer; the measured span is read+validate+massage+partitioned
    parquet write."""
    import json as _json
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from nyc_landmarks_datalake_spark.ingest.csv_ingest import ingest_csv

    tmp = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        reps = 10
        big = docs.crossJoin(
            spark.range(reps).withColumnRenamed("id", "rep")
        )
        wkt = F.concat(
            F.lit("MULTIPOLYGON ((("),
            F.concat_ws(
                ", ",
                F.concat_ws(" ", (F.col("doc_id") % 100).cast("string"),
                            (F.col("doc_id") % 50).cast("string")),
                F.concat_ws(" ", ((F.col("doc_id") + 7) % 100).cast("string"),
                            ((F.col("doc_id") + 3) % 50).cast("string")),
            ),
            F.lit(")))"),
        )
        staged = (
            big.select(
                (F.col("doc_id") * reps + F.col("rep")).alias("id"),
                "text",
                wkt.alias("the_geom"),
                "lang",
            )
        )
        bronze = os.path.join(tmp, "bronze")
        staged.coalesce(4).write.option("header", True).mode("overwrite").csv(bronze)
        sidecar = os.path.join(tmp, "sidecar.json")
        with open(sidecar, "w") as f:
            _json.dump(
                [
                    {"key": "id", "type": "bigint", "partition_key": "false", "comment": ""},
                    {"key": "text", "type": "string", "partition_key": "false", "comment": ""},
                    {"key": "the_geom", "type": "string", "partition_key": "false", "comment": ""},
                    {"key": "lang", "type": "string", "partition_key": "true", "comment": ""},
                ],
                f,
            )
        silver = os.path.join(tmp, "silver")
        t0 = _time.time()
        ingest_csv(spark, bronze, sidecar, silver, geometry_mode="encode")
        return round(_time.time() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    registry.load_all()
    # Console progress bars write \r-rewritten frames to stdout; if the
    # driver captures stdout into the bench artifact they corrupt the
    # JSON line (BENCH_r07.json recorded "parsed": null). Kill them.
    spark = get_spark(
        "bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen path once so per-query numbers measure the
    # engine, not first-call classloading.
    registry.QUERIES["q01_pricing_summary"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    # best-of-N (default 2) per query: single-shot numbers carry JVM/JIT
    # noise that swamps real regressions round-over-round.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    timings["ingest_csv_silver"] = _bench_ingest(spark, sf_dir)
    # total = sum of recorded per-query times (NOT the wall across all
    # reps, which would scale with rep count rather than engine speed)
    total = round(sum(timings.values()), 3)

    line = json.dumps(
        {
            "metric": "headline_query_wall_clock",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
        }
    )
    # The JSON line is the contract: emit it first on a clean stdout
    # (before any teardown chatter), flush, AND persist a copy to
    # BENCH.json so a truncated/interleaved capture can be recovered.
    print(line, flush=True)
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.json"),
            "w",
        ) as f:
            f.write(line + "\n")
    except OSError:
        pass
    # The full line above is ~100 entries and can outgrow a bounded
    # tail capture (BENCH_r08.json recorded "parsed": null). Emit a
    # SHORT headline summary LAST so the total always lands inside the
    # captured tail; the full breakdown lives in BENCH.json.
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "sf": sf,
            }
        ),
        flush=True,
    )
    # r16 PERF lost its per-query comparison because the single giant
    # per-query line is FRONT-truncated by the driver's bounded tail
    # capture (PERF_r16: per_query = {}). Re-emit the same map AFTER
    # the headline in bounded chunks (~25 entries, well under 4 KB per
    # line) so the captured tail always carries every entry whole; each
    # chunk is a self-describing JSON line with the same "queries"
    # shape. Measurement methodology is unchanged — this is output
    # formatting only (r16 VERDICT "Next round" #5).
    names = list(timings)
    chunk_size = 25
    n_chunks = (len(names) + chunk_size - 1) // chunk_size
    for i in range(n_chunks):
        part = names[i * chunk_size : (i + 1) * chunk_size]
        print(
            json.dumps(
                {
                    "metric": "headline_query_wall_clock_per_query",
                    "chunk": i,
                    "n_chunks": n_chunks,
                    "queries": {n: timings[n] for n in part},
                    "sf": sf,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
