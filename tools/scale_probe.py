"""Scaling probe: run representative queries at sf0.001 / sf0.01 / sf0.1 and
report wall-clock growth vs the 100x data growth.

The scale claim ("would still work at 1000 executors reading 100 TB") is an
extrapolation; this gives it a measured foundation: a query whose time is
flat across 100x (overhead-bound) or grows far slower than data (scan-bound
with fixed parallelism) has no super-linear term waiting at scale. Writes
SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_mssql_to_postgres_dailysync_spark.session import get_spark

PROBES = [
    "pricing_summary",          # scan+agg
    "revenue_by_nation",        # broadcast star join
    "waiting_supplier_orders",  # multi-stage fact self-analysis (Q21)
    "dedup_minhash_lsh",        # Arrow UDF + LSH join
    "sessionize",               # window over events
    "merge_upsert",             # the engine MERGE
    "gopher_quality_rules",     # bigram-hash explode + two-level agg
    "similarity_pq_adc",        # PQ train + ADC scan + rerank
    "quality_filter_pipeline",  # fused score+dedup single exchange
    "dedup_substring_spans",    # positional window hashes + islands merge (r2)
    "dedup_incremental_batch",  # batch-vs-corpus LSH index probe (r2)
    "text_encode_ids",          # vocab TakeOrdered + shuffle-free encode (r2)
    "dedup_semantic_prune",     # SemDeDup cell-local pair prune (r3)
    "bloom_decontaminate",      # Bloom-sketch membership probe (r3)
    "text_bigram_lift",         # bigram/unigram collocation joins (r3)
    "rolling_28d_active_users", # user-day grain x bounded day-spine join (r3)
    "text_unigram_surprisal",   # self-trained unigram LM scoring (r4)
    "text_bigram_lm_score",     # add-one bigram LM + model-apply join (r4)
    "frequent_itemset_pairs",   # basket-bounded pair self-join (r6)
    "skipgram_pairs_subsampled",  # position-keyed window pair join (r6)
    "copurchase_degree_powerlaw",  # distinct edges + degree-grain fit (r6)
    "logistic_regression_irls",  # 4x full-scan IRLS sufficient stats (r6)
    "streaming_sessionize",     # availableNow session_window stream (r6)
]
SFS = ["sf0.001", "sf0.01", "sf0.1"]


def main() -> None:
    root = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs = e.queries()
    # warm everything once (JIT, Python workers, page cache)
    for name in PROBES:
        for sf in SFS:
            qs[name](spark, f"{root}/{sf}").count()
    rows = []
    for name in PROBES:
        times = []
        for sf in SFS:
            t0 = time.time()
            qs[name](spark, f"{root}/{sf}").count()
            times.append(time.time() - t0)
        growth = times[-1] / times[0] if times[0] > 0 else float("inf")
        rows.append((name, times, growth))
        print(name, [f"{t:.2f}" for t in times], f"x{growth:.1f} over 100x data")
    lines = [
        "# SCALING — wall-clock growth across 100x data (sf0.001 -> sf0.1)",
        "",
        "Warm runs on local[32]; data grows 100x left to right. Time growth",
        "far below 100x = fixed-overhead/parallelism headroom; near-linear",
        "growth only appears once per-task work dominates scheduling.",
        "",
        "| query | sf0.001 s | sf0.01 s | sf0.1 s | growth over 100x data |",
        "|---|---|---|---|---|",
    ]
    for name, times, growth in rows:
        lines.append(
            f"| {name} | {times[0]:.2f} | {times[1]:.2f} | {times[2]:.2f} | x{growth:.1f} |"
        )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote SCALING.md")


if __name__ == "__main__":
    main()
