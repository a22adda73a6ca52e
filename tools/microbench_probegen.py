"""Measure heap-based margin-probe generation cost across (bits, T).

functions/similarity._heap_probe_masks claims O(T log T) per query with NO
dependence on 2^bits — the property that makes bits=16..20 (the 100 TB
bucket geometry) usable where full-mask enumeration (2^bits subsets/query)
is impossible. This tool measures raw Python generation throughput plus the
end-to-end Arrow UDF path on a synthetic query batch, so the claim is a
number, not an assertion.

Usage: python tools/microbench_probegen.py [n_queries]
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_mssql_to_postgres_dailysync_spark.functions.similarity import (
    _heap_probe_masks,
    margin_probe_masks_udf,
)


def main() -> None:
    n_q = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    rng = random.Random(11)

    print(f"## raw generation, {n_q} queries (single core)")
    print("| bits | T | enum subsets/query | wall s | queries/s |")
    print("|---|---|---|---|---|")
    for bits, T in [(6, 16), (12, 1024), (16, 8192), (20, 1024), (20, 8192)]:
        batches = [
            [rng.randint(0, 1_000_000) for _ in range(bits)] for _ in range(n_q)
        ]
        t0 = time.time()
        for m in batches:
            _heap_probe_masks(m, T)
        dt = time.time() - t0
        print(
            f"| {bits} | {T} | 2^{bits} = {1 << bits} | {dt:.2f} | {n_q / dt:,.0f} |"
        )

    # end-to-end Arrow path: margins -> exploded probe rows, 32 cores
    from pyspark.sql import functions as F

    from etl_mssql_to_postgres_dailysync_spark.session import get_spark

    spark = get_spark(app_name="microbench-probegen")
    spark.sparkContext.setLogLevel("ERROR")
    bits, T = 16, 8192
    df = (
        spark.range(n_q)
        .select(
            "id",
            F.array(
                *[F.abs(F.hash(F.col("id") + j) % 1_000_000).cast("long")
                  for j in range(bits)]
            ).alias("margins"),
        )
    )
    df.count()  # warm
    t0 = time.time()
    n_rows = (
        df.withColumn("mask", F.explode(margin_probe_masks_udf(T)(F.col("margins"))))
        .count()
    )
    dt = time.time() - t0
    print()
    print(
        f"## Arrow UDF end-to-end, local[32]: bits={bits} T={T} "
        f"{n_q} queries -> {n_rows:,} probe rows in {dt:.2f}s "
        f"({n_q / dt:,.0f} queries/s)"
    )


if __name__ == "__main__":
    main()
