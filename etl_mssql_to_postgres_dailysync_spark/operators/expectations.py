"""Declarative data-quality expectations — validation as an operator.

The reference validates one thing: extract-count == load-count per day
(dags/mssql_to_postgresql_orders_daily.py:530-584), and quarantines NULL-key
rows into a side table (:354-527).  This module generalizes both into the
expectations pattern (as popularized by Delta Live Tables / Great
Expectations, public designs): declare named row-level rules, evaluate them
ALL in one pass over the batch, split pass/quarantine, and report per-rule
violation counts from the same pass.

Scale shape: rules compile to one boolean column each (whole-stage codegen);
the split is two filters over one scan; metrics are a single aggregate —
nothing is per-rule re-scanned.  Referential rules (FK exists) compile to a
broadcast LEFT ANTI mark join instead of a row expression.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FLAG = "__exp_{name}__"


@dataclass(frozen=True)
class Expectation:
    """A named row-level rule; ``condition`` is TRUE for GOOD rows."""

    name: str
    condition: Column


def not_null(cols: Sequence[str]) -> Expectation:
    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(c).isNotNull()
    return Expectation(f"not_null_{'_'.join(cols)}", cond)


def in_range(col: str, lo=None, hi=None) -> Expectation:
    cond = F.col(col).isNotNull()
    if lo is not None:
        cond = cond & (F.col(col) >= lo)
    if hi is not None:
        cond = cond & (F.col(col) <= hi)
    return Expectation(f"range_{col}", cond)


def matches(col: str, pattern: str) -> Expectation:
    return Expectation(f"regex_{col}", F.col(col).rlike(pattern))


def one_of(col: str, values: Sequence) -> Expectation:
    return Expectation(f"one_of_{col}", F.col(col).isin(list(values)))


def apply_expectations(
    df: DataFrame,
    expectations: Sequence[Expectation],
    *,
    fk: dict[str, DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Evaluate all rules in one pass.

    ``fk`` maps a column name to a 1-column DataFrame of valid keys
    (dimension side); compiled as a broadcast mark-join existence check.

    Returns (good, quarantined, metrics): good rows satisfy every rule;
    quarantined rows carry a ``_violations`` array naming the failed rules
    (the reference's incomplete_orders side table, generalized); metrics is
    a lazy 1-row DataFrame with total/passed and one violation count per
    rule — all computable from a single scan.
    """
    flagged = df
    names = []
    for e in expectations:
        flagged = flagged.withColumn(_FLAG.format(name=e.name), e.condition)
        names.append(e.name)
    for col, dim in (fk or {}).items():
        name = f"fk_{col}"
        key = dim.columns[0]
        marked = dim.select(F.col(key).alias("__fk_key__"), F.lit(True).alias("__fk_hit__"))
        flagged = flagged.join(
            F.broadcast(marked), flagged[col] == marked["__fk_key__"], "left"
        ).withColumn(_FLAG.format(name=name), F.coalesce("__fk_hit__", F.lit(False))).drop(
            "__fk_key__", "__fk_hit__"
        )
        names.append(name)
    all_ok = F.lit(True)
    for n in names:
        all_ok = all_ok & F.col(_FLAG.format(name=n))
    flags = [_FLAG.format(name=n) for n in names]
    good = flagged.filter(all_ok).drop(*flags)
    quarantined = (
        flagged.filter(~all_ok)
        .withColumn(
            "_violations",
            F.filter(
                F.array(*[
                    F.when(~F.col(_FLAG.format(name=n)), F.lit(n)) for n in names
                ]),
                lambda x: x.isNotNull(),
            ),
        )
        .drop(*flags)
    )
    metrics = flagged.agg(
        F.count(F.lit(1)).alias("total"),
        F.count_if(all_ok).alias("passed"),
        *[
            F.count_if(~F.col(_FLAG.format(name=n))).alias(f"viol_{n}")
            for n in names
        ],
    )
    return good, quarantined, metrics
