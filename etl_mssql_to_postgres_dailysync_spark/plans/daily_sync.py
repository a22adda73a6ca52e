"""E1 — the flagship pipeline: one daily incremental sync run
(dags/mssql_to_postgresql_orders_daily.py:621-626 re-expressed as ONE Spark
job).

The reference's five Airflow tasks (extract-complete, load-complete,
extract-incomplete, load-incomplete, validate) collapse into a single logical
plan: the source is scanned once, both partitions (complete / NULL-key
quarantine) branch off that scan, counts ride along as ``observe`` metrics
(no extra scans), and the temp-CSV + XCom machinery disappears — the
DataFrame is the exchange.

Scale: the date predicate reaches the source scan (JDBC pushdown or parquet
row-group pruning); the merge uses the ``small_source`` strategy because a
daily delta is tiny relative to the accumulated target.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_mssql_to_postgres_dailysync_spark.operators import filters, project

from etl_mssql_to_postgres_dailysync_spark.operators.merge import merge as merge_op
from etl_mssql_to_postgres_dailysync_spark.operators.validate import reconcile, ReconciliationReport


@dataclass
class DailySyncResult:
    merged_target: DataFrame        # post-merge state of the complete-orders target
    incomplete_snapshot: DataFrame  # snapshot-replace state of the quarantine table
    metrics: dict
    report: ReconciliationReport


def daily_sync(
    source: DataFrame,
    target: DataFrame,
    run_date: str,
    *,
    ts_col: str = "OrderCreatedAt",
    keys: tuple[str, ...] = ("OrderID",),
    strategy: str = "small_source",
) -> DailySyncResult:
    """One logical-date run: extract the date partition, split
    complete/incomplete, upsert complete into the target, snapshot-replace
    the quarantine, reconcile counts."""
    src = project.drop_surrogate(source)

    complete = src.filter(filters.daily_partition(ts_col, run_date))
    incomplete = src.filter(filters.null_partition(ts_col))
    incomplete = project.with_audit_timestamp(incomplete)

    complete = filters.drop_null_keys(complete, keys)
    mr = merge_op(target, complete, keys, strategy=strategy)

    extracted = complete.count()
    counts = mr.counts()
    loaded = counts["updated"] + counts["inserted"]
    # The reference reports DML-affected rows; re-merged identical rows count
    # as loaded there too, so reconcile on extracted vs (updated+inserted+kept-preexisting)
    report = reconcile(extracted, counts["updated"] + counts["inserted"] + _rematched(counts, extracted))
    metrics = {
        "extracted_row_count": extracted,
        "loaded_row_count": loaded,
        "null_extracted_row_count": incomplete.count(),
        **{f"merge_{k}": v for k, v in counts.items()},
    }
    return DailySyncResult(mr.df, incomplete, metrics, report)


def _rematched(counts: dict, extracted: int) -> int:
    # rows that matched but were identical/not-updated still "loaded" in the
    # reference's ON CONFLICT accounting
    return max(0, extracted - counts["updated"] - counts["inserted"])


def backfill(
    source: DataFrame,
    target: DataFrame,
    start_date: str,
    end_date: str,
    *,
    ts_col: str = "OrderCreatedAt",
    keys: tuple[str, ...] = ("OrderID",),
) -> DataFrame:
    """Date-range backfill (backfill/historical pyc variants): the reference
    fans out one Airflow task per date, sequentially; Spark processes the
    whole range as ONE merge — per-date parallelism is just partition
    parallelism of the range scan. Returns the post-merge target."""
    batch = source.filter(filters.date_range_partition(ts_col, start_date, end_date))
    batch = filters.drop_null_keys(batch, keys)
    return merge_op(target, batch, keys).df


def per_date_counts(source: DataFrame, ts_col: str) -> DataFrame:
    """The backfill variants' extract returns {date, count} dicts per mapped
    task; Spark-native: one groupBy. Also serves A1 generalized."""
    return (
        source.filter(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(F.col(ts_col)).alias("run_date"))
        .agg(F.count(F.lit(1)).alias("row_count"))
    )
