"""Predicates & filters — P1-P4 (SURVEY.md §2.2).

All are plain Catalyst expressions: filters placed directly on a parquet/JDBC
read are pushed into the scan (predicate pushdown + row-group pruning), which
is the Spark-native form of the reference's "run the WHERE inside MSSQL"
design (dags/mssql_to_postgresql_orders_daily.py:199).
"""

from __future__ import annotations

from datetime import date, timedelta
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _next_day(d: str) -> str:
    return (date.fromisoformat(d) + timedelta(days=1)).isoformat()


def daily_partition(ts_col: str, run_date: str) -> Column:
    """P1 — the reference's ``CAST(ts AS DATE) = run_date``
    (dags/mssql_to_postgresql_orders_daily.py:198-199), expressed as the
    SARGABLE half-open range ``ts >= d AND ts < d+1day``. Same result set
    (NULLs excluded by SQL semantics), but unlike a ``to_date(ts) = d``
    predicate — a function of the column, which Spark cannot push — the
    range reaches the parquet scan as PushedFilters and prunes row groups /
    partitions. At 100 TB this is the difference between a full scan and
    reading one day."""
    lo = F.lit(run_date).cast("timestamp_ntz")
    hi = F.lit(_next_day(run_date)).cast("timestamp_ntz")
    c = F.col(ts_col)
    return (c >= lo) & (c < hi)


def date_range_partition(ts_col: str, start_date: str, end_date: str) -> Column:
    """Backfill range predicate (backfill/historical pyc variants): one scan
    over the whole range, naturally partition-parallel, instead of the
    reference's sequential per-date Airflow fan-out. Sargable half-open
    range, inclusive of end_date (matching CAST(ts AS DATE) <= end_date)."""
    lo = F.lit(start_date).cast("timestamp_ntz")
    hi = F.lit(_next_day(end_date)).cast("timestamp_ntz")
    c = F.col(ts_col)
    return (c >= lo) & (c < hi)


def null_partition(ts_col: str) -> Column:
    """P2 — the complementary IS NULL partition (incomplete orders,
    dags/mssql_to_postgresql_orders_daily.py:373)."""
    return F.col(ts_col).isNull()


def drop_null_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """P3 — drop rows with NULL in any unique-key column before a merge
    (csv_to_mssqldb.py:337-362; the woutnull variant extends the key set,
    csv_to_mssqldb_woutnull.py:339)."""
    return df.na.drop(subset=list(keys))


def split_complete_incomplete(df: DataFrame, ts_col: str) -> tuple[DataFrame, DataFrame]:
    """The daily DAG's two-way partition of one source scan: complete
    (ts NOT NULL) vs incomplete/quarantined (ts NULL)
    (dags/mssql_to_postgresql_orders_daily.py:182-235 vs :356-411).
    Spark reads the source once; both branches share the scan."""
    return df.filter(F.col(ts_col).isNotNull()), df.filter(F.col(ts_col).isNull())
