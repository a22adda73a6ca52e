"""S11 — synthetic orders generator, Spark-native (SURVEY.md §2.1).

The reference generates 1000 fake orders driver-side with Faker
(fake_data_producer.py:8-37): products from a fixed list, 70/30
complete/incomplete split, cart->order lag 5-180 min, amount U(100, 2000),
IsDelivered always False for incomplete orders (:21-24).

Here: ``spark.range(n)`` + deterministic md5-derived pseudo-randoms — fully
distributed (no driver loop, scales to billions of rows) and reproducible in
any engine that has md5 (so the generator itself is oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mssql_to_postgres_dailysync_spark.functions.hashing import uniform_long

PRODUCTS = ["Laptop", "Tablet", "Smartphone", "Headphones", "Monitor", "Keyboard"]
EPOCH_START = "2025-01-01 00:00:00"
RANGE_SECONDS = 180 * 24 * 3600  # ~Jan..Jun 2025, matching the generator window


def fake_orders(spark: SparkSession, n: int = 1000, num_partitions: int | None = None) -> DataFrame:
    """Deterministic distributed twin of fake_data_producer.generate_fake_orders."""
    df = spark.range(1, n + 1, numPartitions=num_partitions or spark.sparkContext.defaultParallelism)
    oid = F.col("id")
    added = F.to_timestamp(F.lit(EPOCH_START)) + F.make_dt_interval(
        secs=uniform_long(oid, RANGE_SECONDS, seed=1).cast("double")
    )
    lag_min = F.lit(5) + uniform_long(oid, 176, seed=2)  # 5..180 minutes
    incomplete = (uniform_long(oid, 100, seed=3) < 30)  # ~30% NULL OrderCreatedAt
    return df.select(
        oid.alias("OrderID"),
        (F.lit(1000) + uniform_long(oid, 9000, seed=4)).alias("UserID"),
        added.cast("timestamp_ntz").alias("AddedToCartAt"),
        F.when(incomplete, F.lit(None).cast("timestamp_ntz"))
        .otherwise(
            (added + F.make_dt_interval(mins=lag_min.cast("double"))).cast("timestamp_ntz")
        )
        .alias("OrderCreatedAt"),
        (
            (F.lit(10000) + uniform_long(oid, 190001, seed=5)).cast("decimal(18,4)")
            / F.lit(100)
        ).cast("decimal(18,4)").alias("Amount"),
        F.element_at(
            F.array(*[F.lit(p) for p in PRODUCTS]),
            (uniform_long(oid, len(PRODUCTS), seed=6) + 1).cast("int"),
        ).alias("Product"),
        F.when(incomplete, F.lit(False))
        .otherwise(uniform_long(oid, 2, seed=7) == 1)
        .alias("IsDelivered"),
    )
