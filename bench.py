"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed as a full pipeline-to-action (count or collect of the
final DataFrame), timed wall-clock after a warm-up of the input scans.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_mssql_to_postgres_dailysync_spark.session import get_spark

# Headline set: the flagship merge family + representative scan/agg/dedup/
# similarity queries. Keep this stable round-over-round for comparability.
HEADLINE = [
    "daily_partition_extract",
    "backfill_range_counts",
    "merge_upsert",
    "merge_conditional",
    "coercion_casts",
    "fake_orders_generator",
    "merge_composite_key",
    "pricing_summary",
    "revenue_by_nation",
    "shipping_priority",
    "local_supplier_volume",
    "promo_revenue",
    "rollup_revenue",
    "running_total",
    "event_window_agg",
    "sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "text_quality",
    "text_lang_id",
    "similarity_brute_topk",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "asof_join",
    "range_join_incidents",
    "hypertable_rollup",
    "kmv_distinct_sketch",
    "quality_filter_pipeline",
    "event_funnel",
    "multimodal_meta",
    # round-1 additions: subquery-shape joins, sketches, trained IVF, ACID table
    "order_priority_count",
    "customer_order_distribution",
    "large_volume_customers",
    "waiting_supplier_orders",
    "cms_frequency_sketch",
    "similarity_ann_ivf_trained",
    "txn_table_snapshot",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = [n for n in HEADLINE if n in qs]
    # Warm-up pass: run every headline query once so the timed pass measures
    # steady-state execution (JIT-compiled codegen, Python worker pool, OS
    # page cache) rather than single-shot JVM/interpreter warm-up.
    for name in names:
        qs[name](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
