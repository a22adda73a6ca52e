"""Join operators Spark lacks natively, built as DataFrame compositions.

As-of join (time-series point-in-time lookup): for each left row, the most
recent right row with ``right.ts <= left.ts`` on the same key. Spark has no
ASOF JOIN; the naive formulations are catastrophic at scale — a range
theta-join explodes to O(|L|·|R|) per key, and a per-left-row subquery is a
correlated scan. The scalable pattern is union + ordered window:

    1. tag both sides and union them (one relation, no join at all)
    2. one shuffle: partition by key, sort by (ts, side) within partition
    3. running ``last(right_value, ignorenulls=True)`` carries the latest
       right values forward onto each left row
    4. keep the left rows

Cost: a single exchange of |L|+|R| rows — the same price as one equi-join
shuffle — regardless of time-range density. Ties (right.ts == left.ts)
match, i.e. the inclusive/backward as-of convention (DuckDB ``ASOF JOIN``
``l.ts >= r.ts``, pandas ``merge_asof`` default).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    prefix: str = "asof_",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward (inclusive) as-of join: left rows gain ``{prefix}{col}`` for
    each right value column, taken from the latest right row at-or-before
    the left timestamp; NULL when no such row exists (left-join semantics).

    ``keys`` are equality keys with standard join NULL semantics: a left row
    whose key is NULL matches nothing (NULL = NULL is not true), exactly like
    DuckDB ASOF JOIN / pandas merge_asof — even though the window
    implementation below physically groups NULL keys into one partition, the
    final projection nulls those matches out. Right rows should be unique per
    (keys, right_ts) — with duplicates, the row sorted last wins.

    ``tolerance_seconds`` bounds staleness (the pandas merge_asof
    ``tolerance``): a match older than the bound is nulled out AFTER the
    carry-forward — a pure post-projection, so the join plan (one union +
    one window) is unchanged.
    """
    keys = list(keys)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys and c != right_ts]
    value_cols = list(value_cols)
    if tolerance_seconds is not None and right_ts not in value_cols:
        value_cols = [right_ts, *value_cols]  # need the matched ts to bound it

    # Right values travel as ONE nullable struct: the struct is non-NULL for
    # every right row (even when its fields are NULL), so carry-forward with
    # last(ignorenulls) is correct for NULL right values — and it's a single
    # window expression regardless of how many columns are carried.
    payload = F.struct(*[F.col(c).alias(c) for c in value_cols])
    null_payload = F.lit(None).cast(
        "struct<" + ", ".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols) + ">"
    )
    l_tag = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts__"),
        F.lit(1).alias("__is_left__"),
        *[F.col(c) for c in left.columns if c not in keys and c != left_ts],
        null_payload.alias("__r__"),
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts__"),
        F.lit(0).alias("__is_left__"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in keys and c != left_ts
        ],
        payload.alias("__r__"),
    )
    u = l_tag.unionByName(r_tag)

    # right rows sort BEFORE left rows at equal ts -> inclusive match
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts__").asc(), F.col("__is_left__").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("__m__", F.last("__r__", ignorenulls=True).over(w))
    matched = F.col("__m__")
    # join NULL semantics: PARTITION BY groups NULL keys together (they
    # would spuriously match each other), so null the carry-forward out for
    # NULL-keyed rows — one scalar predicate, no plan change
    for k in keys:
        matched = F.when(F.col(k).isNotNull(), matched)
    if tolerance_seconds is not None:
        fresh = (
            F.unix_micros(F.col("__ts__")) - F.unix_micros(F.col(f"__m__.{right_ts}"))
        ) <= tolerance_seconds * 1_000_000
        matched = F.when(matched.isNotNull() & fresh, F.col("__m__"))
    out_cols = (
        keys
        + [F.col("__ts__").alias(left_ts)]
        + [c for c in left.columns if c not in keys and c != left_ts]
        + [matched[c].alias(f"{prefix}{c}") for c in value_cols]
    )
    return carried.filter(F.col("__is_left__") == 1).select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 3600,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Interval containment join: each point row joined to every interval row
    with ``start <= point < end`` (plus optional equality ``keys``).

    Spark plans the naive theta join as a broadcast-nested-loop —
    O(|points| x |intervals|) comparisons, hopeless at scale. The scalable
    pattern is TIME BINNING: every interval is exploded to the fixed-width
    buckets it overlaps, every point maps to exactly one bucket, and the
    containment check runs only within the equi-joined bucket. Cost:
    O(|intervals| x avg_span/bucket + matches) — and because a point lives
    in exactly one bucket, each (point, interval) pair meets at most once,
    so no dedup pass is needed. Choose ``bucket_seconds`` near the typical
    interval length: too small explodes intervals, too large widens the
    per-bucket candidate sets.

    Returns all columns of both inputs (points' first on name conflicts are
    the caller's responsibility to alias).
    """
    keys = list(keys)
    p_us = F.unix_micros(F.col(point_ts).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_ts).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_ts).cast("timestamp"))
    w = F.lit(int(bucket_seconds) * 1_000_000)

    p = points.withColumn("__bucket__", F.floor(p_us / w))
    i = intervals.withColumn(
        "__bucket__",
        # end is exclusive: the bucket of (end - 1 microsecond) is the last
        F.explode(F.sequence(F.floor(s_us / w), F.floor((e_us - 1) / w))),
    )
    cond = [p["__bucket__"] == i["__bucket__"]] + [p[k] == i[k] for k in keys]
    joined = p.join(i, cond).filter(
        (p[point_ts] >= i[start_ts]) & (p[point_ts] < i[end_ts])
    )
    return joined.drop("__bucket__")
