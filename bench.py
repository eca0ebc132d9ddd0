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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    registry.load_all()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen path once so per-query numbers measure the
    # engine, not first-call classloading.
    registry.QUERIES["q01_pricing_summary"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    timings: dict[str, float] = {}
    t_all = time.time()
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_all, 3)

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
