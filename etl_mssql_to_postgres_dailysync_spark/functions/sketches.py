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


def cms_hash_pairs(df: DataFrame, key_col: str, depth: int = CMS_DEPTH,
                   width: int = CMS_WIDTH) -> DataFrame:
    """Explode each row into its ``depth`` (seed, bucket) coordinates — one
    scan, ONE whole-stage-codegen'd md5 per row, no Python.

    The d per-seed hash functions are disjoint 12-bit slices of a single
    md5 digest (seed s reads hex chars [3s, 3s+3); 12 bits = 4096 values,
    an exact multiple of width=1024, so the modulus stays perfectly
    uniform). md5's output bits are uniform and the slices are disjoint,
    which is all the CMS analysis needs from its "independent" rows — and
    one digest instead of d cuts the dominant sketch-build cost (hashing)
    by d at 100 TB. Requires 3*depth <= 32 hex chars (depth <= 10)."""
    assert 3 * depth <= 32, "depth > 10 would overrun the md5 digest"
    assert 4096 % width == 0, "width must divide 4096 for a uniform modulus"
    hexd = F.md5(F.col(key_col).cast("string"))
    pairs = F.array(*[
        F.struct(
            F.lit(s).alias("seed"),
            (F.conv(F.substring(hexd, 1 + 3 * s, 3), 16, 10).cast("bigint")
             % F.lit(width)).alias("bucket"),
        )
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
    (key, seed, bucket) — same single-digest 12-bit-slice scheme."""
    arms = " UNION ALL ".join(
        f"SELECT {key_expr} AS k, {s} AS seed, "
        f"CAST('0x' || substr(md5({key_expr}), {1 + 3 * s}, 3) AS BIGINT)"
        f" % {width} AS bucket FROM {table}"
        for s in range(depth)
    )
    return arms


# ---------------------------------------------------------------------------
# Bloom filter (bounded-memory membership), engine-portable like the CMS:
# bit positions come from md5 so a DuckDB oracle replays the EXACT filter.
# The filter materializes as a DataFrame of distinct set positions — at most
# ``m_bits`` rows no matter how large the build side is, so it broadcasts at
# any corpus size (that bound is the entire point of the sketch: membership
# state is O(m), not O(n distinct keys), and merging two filters is a
# distinct-union of positions).
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 18
BLOOM_K = 3
_BLOOM_SEED0 = 9000


def bloom_positions(col: Column, k: int = BLOOM_K, m_bits: int = BLOOM_BITS) -> Column:
    """The ``k`` bit positions a key sets / probes: ``md5(key#seed) % m``
    per seed. Returns ``array<long>`` (JVM-side, codegen)."""
    return F.array(*[md5_long(col, seed=_BLOOM_SEED0 + i) % F.lit(m_bits) for i in range(k)])


def bloom_positions_sql(expr: str, k: int = BLOOM_K, m_bits: int = BLOOM_BITS) -> str:
    """DuckDB twin of :func:`bloom_positions` (a LIST literal of k hashes)."""
    parts = ", ".join(
        f"{md5_long_sql(expr, seed=_BLOOM_SEED0 + i)} % {m_bits}" for i in range(k)
    )
    return f"[{parts}]"


def bloom_build(df: DataFrame, key_col: str, k: int = BLOOM_K,
                m_bits: int = BLOOM_BITS) -> DataFrame:
    """Build the filter from a key column: one scan, explode k positions,
    distinct. Output schema: (pos long), <= m_bits rows."""
    return (
        df.select(F.explode(bloom_positions(F.col(key_col), k, m_bits)).alias("pos"))
        .distinct()
    )


def bloom_probe(probe: DataFrame, key_col: str, bloom: DataFrame,
                k: int = BLOOM_K, m_bits: int = BLOOM_BITS) -> DataFrame:
    """Probe: a key might be a member iff ALL k of its positions are set.
    The filter broadcasts (<= m_bits rows); the probe side only shuffles for
    its own per-key count, keyed by the probe key. Adds ``might_contain``
    (int 0/1) to the probe's distinct keys."""
    pr = probe.select(F.col(key_col)).distinct().select(
        key_col, F.posexplode(bloom_positions(F.col(key_col), k, m_bits)).alias("i", "pos")
    )
    hits = (
        pr.join(F.broadcast(bloom.withColumn("__set__", F.lit(1))), "pos", "left")
        .groupBy(key_col)
        .agg(F.sum(F.coalesce(F.col("__set__"), F.lit(0))).alias("__hits__"))
    )
    return hits.select(
        key_col, (F.col("__hits__") == F.lit(k)).cast("int").alias("might_contain")
    )
