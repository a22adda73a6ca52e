"""Dump formatted physical plans of representative queries to PLANS.md.

The scale contract isn't just "the result matches" — it's "the plan is the
one you'd want at 100 TB": filters pushed into scans, pruned read schemas,
broadcast dims, map-side partial aggregation, semi/anti joins instead of
nested loops. tests/test_plans.py asserts these properties; this tool makes
them inspectable.

Usage: python tools/dump_plans.py [sf_dir]   (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_mssql_to_postgres_dailysync_spark.session import get_spark

SHOWCASE = {
    "daily_partition_extract": "sargable date range -> PushedFilters + pruned ReadSchema",
    "pricing_summary": "partial_ HashAggregate before the exchange (map-side combine)",
    "local_supplier_volume": "star join: dims broadcast, fact never shuffles for them",
    "order_priority_count": "EXISTS as LeftSemi hash join with non-equi residual",
    "customer_order_distribution": "fact pre-aggregated BEFORE the outer join",
    "supplier_part_variety": "NOT IN as broadcast LeftAnti; dims broadcast",
    "merge_upsert": "MERGE as one full-outer join, single shuffle per side",
    "dedup_minhash_lsh": "signatures fold shuffle-free; join only on (band, band_hash)",
    "grouping_sets_revenue": "four grouping sets in ONE Expand + aggregate",
    "similarity_ann_ivf_trained": "cell-local search after broadcast cell assignment",
    "revenue_forecast": "Q6 pure scan-agg: every predicate pushed, one 1-row shuffle",
    "min_cost_supplier": "Q2 decorrelated: argmin join-back, all dims broadcast",
    "scd2_temporal_join": "point-in-time join: equi hash join + interval residual",
    "rolling_revenue_7d": "day-grain RANGE frame after pre-aggregation",
    "similarity_quantized_topk": "int8 candidate sweep then exact re-rank on top-20",
    "waiting_supplier_orders": "Q21: (order,supplier)-grain collapse before join-back",
    "gopher_quality_rules": "bigram hashes shuffle (never text); two partial aggs",
    "decontamination_overlap": "eval shingle-set broadcast probe; corpus unshuffled",
    "quality_filter_pipeline": "score+dedup fused: ONE exchange, min-struct rep",
    "similarity_pq_adc": "ADC scan shuffle-free; exchanges only for the two top-k windows",
    "dedup_substring_spans": "window hashes shuffle (8-byte longs, never text); islands merge per doc",
    "dedup_incremental_batch": "batch band rows probe the corpus index; no corpus self-join",
    "text_encode_ids": "encode pass is ONE project over the scan: vocab as map literal, zero joins",
    "global_running_revenue": "global cumsum WITHOUT a single-partition window: range exchange + per-partition windows",
    "similarity_ann_lsh": "heap-generated probe masks (Arrow UDF, query side only); corpus equi-joins on bucket — no mask join",
    "exact_percentiles": "exact percentiles by two-phase global rank: range exchange + pid-partitioned window + 5-row broadcast rank spine",
    "equidepth_histogram": "exact ntile WITHOUT a single-partition window (distributed global_ntile)",
    "join_skew_audit": "heavy-hitter audit: rank/share windows run over the key-grain aggregate only",
    "text_bigram_lm_score": "self-trained bigram LM: model tables built and applied via token-keyed equi-joins + 1-row vocab scalar; partial aggs before every exchange",
    "embedding_covariance_topk": "d^2/2 pair products generated JVM-side per row (no self-join, no UDF); partial agg bounds the shuffle to d^2 rows per task; top-k window over the 2016-row aggregate",
    "join_size_estimate_cms": "join-size pre-flight: two d*w-bounded sketches, per-seed inner products, 1-row scalar arms — neither fact table ever shuffles",
    "grouped_weighted_median": "weight pre-aggregated to (group, value) grain with map-side combine BEFORE the cumulative window — the window sees the value domain, never data rows",
    "kmv_cross_source_jaccard": "mergeable KMV union: k-row-per-source state, pairwise arms over source-grain aggregates only",
    "ngram_novelty_curve": "shingle-keyed min + join-back; decile via distributed global_ntile — no data-grain global window",
    "dsir_importance_weights": "TWO corpus passes: one conditional-sum groupBy builds both hashed-unigram models; apply is a B-row equi-join + 1-row scalar",
    "hll_distinct_by_source": "HLL registers from ONE md5 per row; per-group state is m=1024 rows at any corpus size",
    "bloom_semijoin_reduction": "m-bit filter broadcast to the fact side; exact/bloom membership counted in one pass over fact keys",
    "cms_heavy_hitters_twopass": "sketch->verify: d*w sketch pass, then exact count ONLY of the semi-join-reduced candidates",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

    out = [
        "# PLANS — formatted physical plans of representative queries",
        "",
        f"Generated by `python tools/dump_plans.py {sf_dir}`. Each plan is the",
        "Catalyst/AQE physical plan the engine actually executes; the one-line",
        "note states the scale property the plan must (and does) exhibit,",
        "enforced by tests/test_plans.py.",
        "",
    ]
    for name, note in SHOWCASE.items():
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", "", f"*{note}*", "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
