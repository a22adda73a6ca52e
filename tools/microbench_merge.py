"""Measure the two MERGE strategies against delta-size ratios.

operators/merge.py offers ``full_outer`` (one shuffle each side) and
``small_source`` (broadcast delta, target never shuffles). The right choice
depends on |delta| / |target|; this tool measures the crossover on real data
so the strategy guidance in the module docstring stays a measured claim.

Usage: python tools/microbench_merge.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_mssql_to_postgres_dailysync_spark.operators.merge import merge
from etl_mssql_to_postgres_dailysync_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="microbench-merge")
    spark.sparkContext.setLogLevel("ERROR")
    target = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "rid", F.monotonically_increasing_id()
    ).repartition(32).cache()
    n = target.count()
    for frac in (0.001, 0.01, 0.1, 0.5):
        delta = target.filter(F.col("l_orderkey") % int(1 / frac) == 0).withColumn(
            "l_quantity", F.col("l_quantity") + 1
        ).cache()
        nd = delta.count()
        row = [f"delta={frac:>5} ({nd}/{n} rows)"]
        for strat in ("full_outer", "small_source"):
            fn = lambda: merge(target, delta, ["rid"], strategy=strat).df.count()
            fn()  # warm
            t0 = time.time()
            for _ in range(2):
                fn()
            row.append(f"{strat}={round((time.time() - t0) / 2, 3)}s")
        delta.unpersist()
        print("  ".join(row))


if __name__ == "__main__":
    main()
