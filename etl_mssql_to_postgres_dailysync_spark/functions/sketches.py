"""Mergeable frequency sketches (CountMin) for 100 TB-scale profiling.

The reference has no sketches (its only profiling is exact per-column null
counts, column_check.py:5); at cluster scale the engine needs sub-linear,
mergeable summaries.  Like the KMV distinct sketch in plans/driver_queries,
the CountMin here is built from engine-portable md5 + integer arithmetic, so
a DuckDB oracle can verify THE SKETCH ITSELF bit-for-bit — not just sanity
bounds.

Scale design:
  * the sketch table is at most ``depth * width`` rows regardless of input
    size, built with ONE scan + one map-side-combined shuffle of ~d*w groups;
  * sketches from different partitions / days merge by summing counters
    (groupBy seed,bucket SUM) — the streaming/incremental path;
  * estimation broadcasts the tiny sketch onto the probe keys (no second
    fact shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_mssql_to_postgres_dailysync_spark.functions.hashing import md5_long, md5_long_sql

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _bucket(col: Column, seed: int, width: int) -> Column:
    return md5_long(col, seed) % F.lit(width)


def cms_hash_pairs(df: DataFrame, key_col: str, depth: int = CMS_DEPTH,
                   width: int = CMS_WIDTH) -> DataFrame:
    """Explode each row into its ``depth`` (seed, bucket) coordinates — one
    scan, whole-stage-codegen'd md5s, no Python."""
    pairs = F.array(*[
        F.struct(F.lit(s).alias("seed"), _bucket(F.col(key_col), s, width).alias("bucket"))
        for s in range(depth)
    ])
    return df.select(F.col(key_col), F.explode(pairs).alias("p")).select(
        F.col(key_col), F.col("p.seed").alias("seed"), F.col("p.bucket").alias("bucket")
    )


def cms_build(df: DataFrame, key_col: str, depth: int = CMS_DEPTH,
              width: int = CMS_WIDTH) -> DataFrame:
    """Build the sketch: (seed, bucket, counter).  Partial aggregation means
    each task emits at most depth*width rows however large its input."""
    return (
        cms_hash_pairs(df, key_col, depth, width)
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): counters add."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("seed", "bucket").agg(F.sum("counter").alias("counter"))


def cms_estimate(sketch: DataFrame, probes: DataFrame, key_col: str,
                 depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Point-estimate each probe key: min over seeds of its bucket counter.
    The sketch (<= depth*width rows) is broadcast; probe keys never shuffle."""
    coords = cms_hash_pairs(probes, key_col, depth, width)
    return (
        coords.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("counter"), F.lit(0))).cast("bigint").alias("cms_est"))
    )


def cms_oracle_pairs_sql(table: str, key_expr: str, depth: int = CMS_DEPTH,
                         width: int = CMS_WIDTH) -> str:
    """DuckDB twin of :func:`cms_hash_pairs` as a SELECT producing
    (key, seed, bucket)."""
    arms = " UNION ALL ".join(
        f"SELECT {key_expr} AS k, {s} AS seed, "
        f"{md5_long_sql(key_expr, s)} % {width} AS bucket FROM {table}"
        for s in range(depth)
    )
    return arms
