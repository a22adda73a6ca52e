"""Streaming throughput benchmark: end-to-end rows/sec for the engine's
three streaming paths, measured with availableNow (bounded replay — the
same trigger the daily-sync backfill uses).

  1. file-stream ingest -> event-time watermark -> windowed agg  (the §2.7
     daily micro-batch shape)
  2. TxnTable CDC source -> parquet sink (signed deltas out of the commit
     log via the Spark 4 Python Data Source)
  3. file-stream -> TxnTable exactly-once streaming SINK (executor-direct
     parquet + batchId-idempotent commits)

Rows/sec here is single-node local[32]; at scale each path is
embarrassingly parallel (per-file / per-commit-partition / per-partition
writers), so the number to watch round-over-round is the ratio between
paths, not the absolute. Writes STREAMBENCH.md.

Usage: python tools/stream_bench.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_mssql_to_postgres_dailysync_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    from etl_mssql_to_postgres_dailysync_spark.sources.txn_table import TxnTable
    from etl_mssql_to_postgres_dailysync_spark.streaming.cdc_source import (
        TxnTableCdcDataSource,
    )
    from etl_mssql_to_postgres_dailysync_spark.streaming.txn_sink import (
        TxnTableSinkDataSource,
    )

    spark.dataSource.register(TxnTableCdcDataSource)
    spark.dataSource.register(TxnTableSinkDataSource)

    base = tempfile.mkdtemp(prefix="stream_bench_")
    results = []
    try:
        # staging dir: the source table split into 16 files -> 16 stream tasks
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        n_rows = li.count()
        li.repartition(16).write.mode("overwrite").parquet(f"{base}/staged")
        schema = spark.read.parquet(f"{base}/staged").schema

        # 1. ingest + watermark + windowed agg
        t0 = time.time()
        s = (
            spark.readStream.schema(schema).parquet(f"{base}/staged")
            .withColumn("ts", F.col("l_shipdate").cast("timestamp"))
            .withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "7 days"), "l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("l_quantity").alias("qty"))
        )
        q = (
            s.writeStream.format("parquet")
            .option("path", f"{base}/agg_out")
            .option("checkpointLocation", f"{base}/ck1")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.time() - t0
        results.append(("file-stream -> watermark -> 7d window agg",
                        n_rows, dt))

        # 2. CDC source -> parquet sink (3 appends + 1 merge = 4 commits)
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        t = TxnTable(spark, f"{base}/tbl")
        n_ord = orders.count()
        third = n_ord // 3
        t.append(orders.limit(third))
        t.append(orders.limit(2 * third).subtract(orders.limit(third)))
        t.append(orders.subtract(orders.limit(2 * third)))
        t.merge(orders.limit(third // 2).withColumn(
            "o_totalprice", F.col("o_totalprice") + 1.0), ["o_orderkey"])
        t0 = time.time()
        s = (spark.readStream.format("txntable_cdc")
             .option("path", f"{base}/tbl").load())
        q = (
            s.writeStream.format("parquet")
            .option("path", f"{base}/cdc_out")
            .option("checkpointLocation", f"{base}/ck2")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.time() - t0
        n_cdc = spark.read.parquet(f"{base}/cdc_out").count()
        results.append(("TxnTable CDC source -> parquet sink", n_cdc, dt))

        # 3. file-stream -> TxnTable exactly-once sink
        t0 = time.time()
        s = spark.readStream.schema(schema).parquet(f"{base}/staged")
        q = (
            s.writeStream.format("txntable")
            .option("path", f"{base}/sink_tbl")
            .option("checkpointLocation", f"{base}/ck3")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.time() - t0
        sunk = TxnTable(spark, f"{base}/sink_tbl").read().count()
        assert sunk == n_rows, (sunk, n_rows)
        results.append(("file-stream -> TxnTable exactly-once sink",
                        n_rows, dt))
    finally:
        shutil.rmtree(base, ignore_errors=True)

    lines = [
        "# STREAMBENCH — streaming path throughput (availableNow replay)",
        "",
        f"sf_dir={sf_dir}, local[32], cold checkpoints (worst case: every",
        "batch plans + commits). Single-node rows/sec; all three paths",
        "parallelize per-file / per-commit-partition at scale.",
        "",
        "| path | rows | wall s | rows/s |",
        "|---|---|---|---|",
    ]
    for name, rows, dt in results:
        lines.append(f"| {name} | {rows} | {dt:.2f} | {rows/dt:,.0f} |")
        print(lines[-1])
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "STREAMBENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote STREAMBENCH.md")


if __name__ == "__main__":
    main()
