"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output protocol (r5): the driver keeps only a fixed-size tail of stdout and
json-parses the LAST line, so the LAST line printed is the compact headline
metric {"metric", "value", "unit", "queries", "sf"} and nothing else —
r4's artifact came back "parsed": null because spread/runs_per_query made
that single line overflow the tail window. Everything diagnostic (per-query
spread, runs_per_query, the non-headline tranche section) is printed on
EARLIER lines and also written whole to BENCH_FULL.json next to this file.

Each query is executed as a full pipeline-to-action (count of the final
DataFrame). After a warm-up pass, every query is timed N_RUNS times and the
reported figure is the PER-QUERY MEDIAN — single-shot timings on a shared
box carry enough scheduler/GC jitter to fake ±50% regressions (r3's bench
showed six 'regressions' on unchanged plans that re-runs couldn't
reproduce); a median-of-3 makes a round-over-round delta a real signal.
Runs are interleaved round-robin (all queries run 1, then run 2, ...) so a
transient system-wide stall degrades one run of many queries (discarded by
the median) instead of all runs of one query.
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

# Heaviest non-headline registry queries (r4 tranche). Reported as a SEPARATE
# tranche_queries_total section so the headline set stays frozen for
# round-over-round comparability (VERDICT r4 ask #5).
TRANCHE = [
    "dedup_lsh_audit",
    "dedup_lsh_audit_wide",
    "dedup_jaccard_prefix_filter",
    "similarity_ann_lsh_wide",
    "text_zipf_fit",
    "text_unigram_surprisal",
    "text_bigram_lm_score",
    "chunk_dedup_crossdoc",
    "exact_percentiles",
    "dedup_semantic_prune",
    # r5 additions (new operators benched from their first round)
    "kmv_cross_source_jaccard",
    "join_size_estimate_cms",
    "grouped_weighted_median",
    "embedding_covariance_topk",
    "ngram_novelty_curve",
    "dsir_importance_weights",
    "char_entropy_profile",
    "quality_dup_calibration",
    "bloom_semijoin_reduction",
    "hll_distinct_by_source",
    "cms_heavy_hitters_twopass",
    "hll_incremental_daily",
    "sessionize_gap_sensitivity",
    "zorder_pruning_audit",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    def run_set(names: list[str]) -> tuple[dict[str, float], dict[str, float]]:
        names = [n for n in names if n in qs]
        # Warm-up pass: run every query once so the timed passes measure
        # steady-state execution (JIT-compiled codegen, Python worker pool,
        # OS page cache) rather than single-shot JVM/interpreter warm-up.
        for name in names:
            qs[name](spark, sf_dir).count()
        samples: dict[str, list[float]] = {name: [] for name in names}
        for _ in range(n_runs):
            for name in names:
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                samples[name].append(time.time() - t0)
        timings = {name: round(median(ts), 3) for name, ts in samples.items()}
        spread = {name: round(max(ts) - min(ts), 3) for name, ts in samples.items()}
        return timings, spread

    timings, spread = run_set(HEADLINE)
    tranche_timings, tranche_spread = run_set(TRANCHE)

    headline_line = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    tranche_line = {
        "metric": "tranche_queries_total",
        "value": round(sum(tranche_timings.values()), 3),
        "unit": "sec",
        "queries": tranche_timings,
        "sf": sf,
    }
    diag_line = {
        "runs_per_query": n_runs,
        "spread": spread,
        "tranche_spread": tranche_spread,
    }
    full = {"headline": headline_line, "tranche": tranche_line, "diag": diag_line}
    try:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
        with open(out, "w") as fh:
            json.dump(full, fh, indent=1)
    except OSError:
        pass  # diagnostics file is best-effort; stdout lines below are canonical
    # Diagnostic lines first; the compact headline metric line MUST be last.
    print(json.dumps(diag_line))
    print(json.dumps(tranche_line))
    print(json.dumps(headline_line))


if __name__ == "__main__":
    main()
