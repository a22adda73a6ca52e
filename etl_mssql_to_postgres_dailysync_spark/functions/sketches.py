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


def cms_build_from_counts(counts: DataFrame, key_col: str, weight_col: str,
                          depth: int = CMS_DEPTH,
                          width: int = CMS_WIDTH) -> DataFrame:
    """Build the sketch from a KEY-GRAIN count table instead of raw rows:
    counter(seed, bucket) = sum of the weights of the keys hashing there —
    bit-identical counters to :func:`cms_build` over the un-aggregated rows
    (the bucket depends only on the key value, so counting rows per bucket
    equals summing per-key row counts per bucket; a NULL key yields the same
    NULL-bucket rows on both paths). Two wins at scale (r11, guide §6/§2.3):
    one md5 + explode per DISTINCT key instead of one per row, and the
    key-grain aggregate can be SHARED with an exact-count arm through
    runtime exchange reuse — one scan feeds both the sketch and the truth."""
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
    return (
        counts.select(F.col(weight_col).alias("_w"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.seed").alias("seed"), F.col("p.bucket").alias("bucket"))
        .agg(F.sum("_w").alias("counter"))
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
# CountSketch (Charikar-Chen-Farach-Colton, ICALP 2002): the SIGNED cousin of
# the CountMin above.  Each seed hashes a key to a bucket AND a +-1 sign; the
# bucket counter accumulates sign * count, and the point estimate is the
# MEDIAN over seeds of sign * counter.  Unlike CMS (pure overestimate,
# collisions only inflate), CountSketch is UNBIASED: colliding keys cancel in
# expectation, so light keys are not systematically over-counted — the right
# tool when the downstream consumer subtracts or compares frequencies rather
# than thresholding them.  Same engine-portable single-digest scheme: seed s
# takes its 12-bit bucket from hex chars [3s, 3s+3) of ONE md5 per row and
# its sign from the parity of hex char 3*depth + s, so a DuckDB oracle
# replays every counter bit-for-bit.  depth is ODD so the median is an exact
# order statistic (no averaging, no float, no trunc-vs-floor hazard).
# Sketch state: depth * width rows regardless of input; merge = counter SUM.
# ---------------------------------------------------------------------------

CS_DEPTH = 5
CS_WIDTH = 1024


def cs_hash_triples(df: DataFrame, key_col: str, depth: int = CS_DEPTH,
                    width: int = CS_WIDTH) -> DataFrame:
    """Explode each row into ``depth`` (seed, bucket, sign) coordinates —
    one whole-stage-codegen'd md5 per row, no Python.  Bucket slices are the
    same disjoint 12-bit windows as the CMS; the sign bit for seed s is the
    parity of the single hex char at 1-based position ``3*depth + s + 1``,
    disjoint from every bucket slice.  Requires 4*depth <= 32 hex chars."""
    assert depth % 2 == 1, "depth must be odd for an exact-order-stat median"
    assert 4 * depth <= 32, "bucket+sign slices would overrun the md5 digest"
    assert 4096 % width == 0, "width must divide 4096 for a uniform modulus"
    hexd = F.md5(F.col(key_col).cast("string"))
    triples = F.array(*[
        F.struct(
            F.lit(s).alias("seed"),
            (F.conv(F.substring(hexd, 1 + 3 * s, 3), 16, 10).cast("bigint")
             % F.lit(width)).alias("bucket"),
            (F.lit(1) - F.lit(2) * (
                F.conv(F.substring(hexd, 1 + 3 * depth + s, 1), 16, 10)
                .cast("bigint") % F.lit(2)
            )).cast("bigint").alias("sign"),
        )
        for s in range(depth)
    ])
    return df.select(F.col(key_col), F.explode(triples).alias("p")).select(
        F.col(key_col), F.col("p.seed").alias("seed"),
        F.col("p.bucket").alias("bucket"), F.col("p.sign").alias("sign")
    )


def cs_build(df: DataFrame, key_col: str, depth: int = CS_DEPTH,
             width: int = CS_WIDTH) -> DataFrame:
    """Build the signed sketch: (seed, bucket, counter) with
    counter = SUM(sign).  Partial aggregation bounds every task's output at
    depth*width rows however large its input."""
    return (
        cs_hash_triples(df, key_col, depth, width)
        .groupBy("seed", "bucket")
        .agg(F.sum("sign").cast("bigint").alias("counter"))
    )


def cs_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): counters add
    (signs already folded in at build time)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("seed", "bucket").agg(
        F.sum("counter").cast("bigint").alias("counter"))


def cs_estimate(sketch: DataFrame, probes: DataFrame, key_col: str,
                depth: int = CS_DEPTH, width: int = CS_WIDTH) -> DataFrame:
    """Point-estimate each probe key: median over seeds of
    sign * bucket-counter.  With odd depth the median is the exact middle
    order statistic of the sorted per-seed values — pure integer, identical
    in both engines.  The sketch (<= depth*width rows) broadcasts; probe
    keys never shuffle the fact side."""
    coords = cs_hash_triples(probes, key_col, depth, width)
    vals = coords.join(F.broadcast(sketch), ["seed", "bucket"], "left").select(
        F.col(key_col),
        (F.col("sign") * F.coalesce(F.col("counter"), F.lit(0))).alias("v"),
    )
    mid = depth // 2 + 1  # 1-based middle index for element_at
    return vals.groupBy(key_col).agg(
        F.element_at(F.array_sort(F.collect_list("v")), mid)
        .cast("bigint").alias("cs_est"),
        F.min("v").cast("bigint").alias("cs_min"),
        F.max("v").cast("bigint").alias("cs_max"),
    )


def cs_oracle_triples_sql(table: str, key_expr: str, depth: int = CS_DEPTH,
                          width: int = CS_WIDTH) -> str:
    """DuckDB twin of :func:`cs_hash_triples` as a SELECT producing
    (k, seed, bucket, sign) — same single-digest slice + parity-sign
    scheme."""
    arms = " UNION ALL ".join(
        f"SELECT {key_expr} AS k, {s} AS seed, "
        f"CAST('0x' || substr(md5({key_expr}), {1 + 3 * s}, 3) AS BIGINT)"
        f" % {width} AS bucket, "
        f"CAST(1 - 2 * (CAST('0x' || substr(md5({key_expr}),"
        f" {1 + 3 * depth + s}, 1) AS BIGINT) % 2) AS BIGINT) AS sign"
        f" FROM {table}"
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
