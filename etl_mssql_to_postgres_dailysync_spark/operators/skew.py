"""Skew mitigation: salting for hot keys.

AQE's skew-join split (``spark.sql.adaptive.skewJoin.enabled``, on by
default in session.py) handles sort-merge join skew at runtime. Salting
covers the cases AQE can't:

  * aggregation skew — one group so hot its partial aggregate state
    overwhelms a single reducer (e.g. count-distinct over a celebrity key):
    two-stage ``salted_aggregate`` spreads stage 1 over ``buckets``
    reducers, then combines the per-salt partials.
  * hash-join skew where the small side fits in memory replicated but not
    broadcast: ``salted_join`` salts the big side deterministically and
    explodes the small side ``buckets``× so every salted key still matches.

Salt derivation is a deterministic hash of stable columns (never
``rand()`` — retries and speculative tasks must agree on each row's salt).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (stage1, stage2) aggregate pairs: stage2 re-aggregates stage1 partials
_REAGG = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salt_column(cols: Sequence[str], buckets: int) -> Column:
    """Deterministic salt in [0, buckets) from a hash of ``cols``."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))


def salted_aggregate(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    *,
    salt_cols: Sequence[str],
    buckets: int = 32,
) -> DataFrame:
    """Two-stage aggregation for skewed groups.

    ``aggs`` maps output name -> (function, input column) with function in
    {sum, count, min, max} (the re-aggregatable set; avg = sum/count at the
    call site). ``salt_cols`` are the high-cardinality columns the salt is
    derived from (NOT the group columns — those are constant within a hot
    group).
    """
    group_cols = list(group_cols)
    stage1 = df.withColumn("__salt__", salt_column(salt_cols, buckets)).groupBy(
        *group_cols, "__salt__"
    )
    partials = stage1.agg(
        *[_REAGG[fn][0](col).alias(name) for name, (fn, col) in aggs.items()]
    )
    final = partials.groupBy(*group_cols).agg(
        *[_REAGG[fn][1](name).alias(name) for name, (fn, _col) in aggs.items()]
    )
    return final


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    *,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a skewed big side: big rows get a deterministic salt,
    the small side is replicated ``buckets``× so each (key, salt) bucket
    joins locally. Shuffle of the hot key spreads over ``buckets``
    reducers; the small side's shuffle grows ``buckets``× (keep it small).
    """
    keys = list(keys)
    non_key_big = [c for c in big.columns if c not in keys]
    b = big.withColumn("__salt__", salt_column(non_key_big or keys, buckets))
    s = small.withColumn(
        "__salt__", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return b.join(s, on=keys + ["__salt__"], how=how).drop("__salt__")
