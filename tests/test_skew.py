"""Salting operators: result parity with their unsalted equivalents."""

from pyspark.sql import functions as F

from etl_mssql_to_postgres_dailysync_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)


def _skewed(spark):
    # 90% of rows share one hot key
    return spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: (r["s"], r["c"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("c"),
             F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["s"], r["c"], r["mn"], r["mx"])
        for r in salted_aggregate(
            df, ["k"],
            {"s": ("sum", "v"), "c": ("count", "v"), "mn": ("min", "v"), "mx": ("max", "v")},
            salt_cols=["v"], buckets=16,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([("hot", 1), ("cold", 2)], ["k", "w"])
    plain = big.join(small, "k").select("k", "v", "w")
    salted = salted_join(big, small, ["k"], buckets=4).select("k", "v", "w")
    assert salted.count() == plain.count() == 2000
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
