"""Structured Streaming skins over the batch operators (SURVEY.md §2.7).

The reference is a scheduled batch pipeline whose semantics are streaming in
disguise: daily event-time micro-batches, catchup replay, NULL-event-time
quarantine as a side output, idempotent per-partition upsert. Mapped here:

  - daily micro-batch -> ``trigger(availableNow=True)`` replay
  - per-batch upsert  -> ``foreachBatch`` + the same merge operator
  - quarantine        -> a second filter branch of the same micro-batch
  - tumbling/window aggregation + watermark for late data
  - sessionization via ``session_window``
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_mssql_to_postgres_dailysync_spark.operators.merge import merge as merge_op, dedupe_last_wins


def read_stream_parquet(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """File-source stream (schema required for streaming reads)."""
    return spark.readStream.format("parquet").schema(schema).load(path)


def merge_sink(
    target_path: str,
    keys: Sequence[str],
    *,
    quarantine_ts_col: str | None = None,
    quarantine_path: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function applying the engine merge to a parquet
    target — exactly-once per partition in effect because the merge is
    idempotent (re-running a micro-batch converges to the same state,
    the reference's re-run safety property, dags/…_orders_daily.py:28-29)."""

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        complete = batch
        if quarantine_ts_col is not None:
            incomplete = batch.filter(F.col(quarantine_ts_col).isNull())
            complete = batch.filter(F.col(quarantine_ts_col).isNotNull())
            if quarantine_path is not None:
                incomplete.write.mode("append").parquet(quarantine_path)
        try:
            target = spark.read.parquet(target_path)
            merged = merge_op(target, complete, keys).df
        except Exception:  # first batch: no target yet
            merged = dedupe_last_wins(complete, keys)
        # rewrite target atomically (parquet has no txn; staging-dir rename
        # or a table format (Delta/Iceberg) supplies atomicity in production)
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(target_path)

    return apply_batch


def run_available_now(
    stream: DataFrame, batch_fn: Callable[[DataFrame, int], None], checkpoint: str
) -> None:
    """Catchup/backfill replay: process everything currently available then
    stop — the streaming analog of Airflow ``catchup=True``."""
    q = (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
    group_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Tumbling event-time aggregation with a watermark for late data — the
    streaming generalization of the reference's daily partition counts."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def sessionized(
    events: DataFrame, *, ts_col: str = "ts", gap: str = "30 minutes", key: str = "user_id"
) -> DataFrame:
    """Session windows per user (streaming-native stateful operator)."""
    return (
        events.withWatermark(ts_col, gap)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def streaming_dedup(
    stream: DataFrame,
    keys: Sequence[str],
    *,
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival per key, with state
    bounded by the watermark (keys older than the watermark are evicted, so
    state doesn't grow with the stream — the streaming twin of
    operators.merge.dedupe_last_wins / exact_dedup for at-least-once
    sources that can replay events)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(list(keys))


def jdbc_upsert_sink(
    connect: Callable[[], object],
    table: str,
    keys: Sequence[str],
    *,
    dialect: str = "postgres",
    single_writer: bool = False,
    **upsert_kwargs,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink pushing each micro-batch through the
    distributed dialect-aware upsert (sources/writers.jdbc_upsert_write).
    Upserts are idempotent per key, so micro-batch replays after a failure
    converge — effective exactly-once on the JDBC target, which is the
    reference's daily-rerun guarantee in streaming form.
    ``single_writer`` serializes partitions for targets like SQLite."""
    from etl_mssql_to_postgres_dailysync_spark.sources.writers import jdbc_upsert_write

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if single_writer:
            batch = batch.coalesce(1)
        jdbc_upsert_write(batch, connect, table, keys, dialect=dialect, **upsert_kwargs)

    return apply_batch


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str,
    right_ts: str,
    watermark: str = "1 hour",
    within: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join with an event-time interval condition — the
    attribution pattern (e.g. click within 30 min of impression). Both sides
    carry watermarks and the join condition bounds right_ts to
    [left_ts, left_ts + within], so Spark can evict buffered state once the
    watermark passes the interval: state is bounded, exactly the
    range-join-with-horizon semantics of operators/joins.py in streaming
    form."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = F.expr(
        f"l.{key} = r.{key} AND r.{right_ts} >= l.{left_ts} "
        f"AND r.{right_ts} <= l.{left_ts} + interval {within}"
    )
    return l.alias("l").join(r.alias("r"), cond, "inner")


def txn_merge_sink(table_path: str, keys: Sequence[str], **merge_kwargs):
    """``foreachBatch`` sink merging each micro-batch into a TxnTable
    (sources/txn_table.py): streaming ingestion with ACID visibility — every
    micro-batch is one atomic commit, readers only ever see complete
    batches, and a replayed batch re-merges idempotently (the checkpoint +
    idempotent-commit pair is the streaming exactly-once contract in
    lake-table form)."""
    from etl_mssql_to_postgres_dailysync_spark.sources.txn_table import TxnTable

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        t = TxnTable(batch.sparkSession, table_path)
        if t.version() < 0:
            t.append(batch, meta={"epoch": epoch_id})
        else:
            t.merge(batch, keys, **merge_kwargs)

    return apply_batch
