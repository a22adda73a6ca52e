"""Sinks — S4-S9 (SURVEY.md §2.1).

Two worlds:
  * files/tables we own (parquet): merge-as-rewrite via operators.merge, and
    date-partitioned layout so a daily merge touches only affected partitions
    (the scale path — partition pruning on ``order_date``).
  * real JDBC targets: Spark has no native upsert, so ``jdbc_upsert_write``
    replays the reference's batched ``INSERT ... ON CONFLICT`` per partition
    (dags/mssql_to_postgresql_orders_daily.py:296-343) — idempotent, so
    task retries are safe. Gated: needs a live DB + driver jar, neither in
    this container.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame


def write_csv(df: DataFrame, path: str, *, timestamp_format: str = "yyyy-MM-dd HH:mm:ss.SSSSSS") -> None:
    """S4 — CSV sink in the reference's interchange format
    (dags/…_orders_daily.py:219). Exists for interchange parity only — the
    intra-pipeline temp-CSV hop is eliminated (the DataFrame is the exchange)."""
    df.write.mode("overwrite").option("header", True).option(
        "timestampFormat", timestamp_format
    ).option("timestampNTZFormat", timestamp_format).csv(path)


def write_parquet_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str] = (), mode: str = "overwrite"
) -> None:
    """Date-partitioned parquet: the engine-of-record layout. Daily syncs
    rewrite only the partitions present in the batch (dynamic overwrite)."""
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols).option(
            "partitionOverwriteMode", "dynamic"
        )
    writer.parquet(path)


def merge_into_partitioned_parquet(
    spark,
    path: str,
    batch: DataFrame,
    keys: Sequence[str],
    partition_col: str,
    **merge_kwargs,
) -> list:
    """The 100 TB upsert: merge ``batch`` into a date-partitioned parquet
    target, touching ONLY the partitions present in the batch.

    1. enumerate the batch's partition values (tiny: a daily delta spans a
       handful of dates);
    2. read just those partitions of the target (partition pruning — the
       other 99.9% of the table is never opened);
    3. run the relational merge on that slice;
    4. rewrite with dynamic partition overwrite, which replaces exactly the
       affected directories and leaves every other partition's files intact.

    The merged slice is materialized (localCheckpoint) before the write
    because the write target is also the read source; a transactional table
    format (Delta/Iceberg) replaces this with a real commit at production
    scale. Returns the list of partition values rewritten.
    """
    from pyspark.sql import functions as F

    from etl_mssql_to_postgres_dailysync_spark.operators.merge import merge as merge_op

    parts = [r[0] for r in batch.select(partition_col).distinct().collect()]
    target_slice = spark.read.parquet(path).filter(F.col(partition_col).isin(parts))
    merged = merge_op(target_slice, batch, keys, **merge_kwargs).df
    merged = merged.localCheckpoint(eager=True)
    (
        merged.write.mode("overwrite")
        .partitionBy(partition_col)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )
    return parts


def snapshot_overwrite(df: DataFrame, path: str) -> None:
    """S9 — TRUNCATE + full reload (dags/…_orders_daily.py:492-503) as an
    atomic overwrite."""
    df.write.mode("overwrite").parquet(path)


def jdbc_append(
    df: DataFrame, url: str, table: str, *, batchsize: int = 5000, truncate: bool = False,
    properties: dict[str, str] | None = None,
) -> None:
    """S5 — staging append (csv_to_mssqldb.py:449-462): TRUNCATE-then-append
    becomes ``mode("overwrite").option("truncate", True)``; chunksize becomes
    JDBC ``batchsize``. Gated: requires a live database."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    if truncate:
        writer.mode("overwrite").option("truncate", True).save()
    else:
        writer.mode("append").save()


def make_on_conflict_sql(
    table: str, columns: Sequence[str], keys: Sequence[str],
    exclude_update_cols: Sequence[str] = (), matched_condition_sql: str | None = None,
    placeholder: str = "%s",
) -> str:
    """Build the reference's dynamic upsert statement
    (dags/…_orders_daily.py:296-308; conditional variant from the sync pyc).
    Kept as a pure function so it is unit-testable without a database.
    ``placeholder`` adapts to the driver's paramstyle ('%s' psycopg,
    '?' pyodbc/sqlite)."""
    collist = ", ".join(columns)
    placeholders = ", ".join([placeholder] * len(columns))
    update_cols = [c for c in columns if c not in keys and c not in exclude_update_cols]
    sets = ", ".join(f"{c} = EXCLUDED.{c}" for c in update_cols)
    sql = (
        f"INSERT INTO {table} ({collist}) VALUES ({placeholders}) "
        f"ON CONFLICT ({', '.join(keys)}) DO UPDATE SET {sets}"
    )
    if matched_condition_sql:
        sql += f" WHERE {matched_condition_sql}"
    return sql


def jdbc_upsert_write(
    df: DataFrame,
    connect: Callable[[], "object"],
    table: str,
    keys: Sequence[str],
    *,
    page_size: int = 100,
    exclude_update_cols: Sequence[str] = (),
    matched_condition_sql: str | None = None,
    placeholder: str = "%s",
    dialect=None,
) -> None:
    """S6/S7 — distributed ON CONFLICT upsert for real JDBC targets: each
    Spark partition opens its own connection (via the picklable ``connect``
    factory), executes batched upserts in one transaction, and rolls back on
    error — exactly the reference's loader
    (dags/…_orders_daily.py:296-343) but parallel per partition. Idempotent
    per row, so partition-level retries are exactly-once in effect.

    ``dialect`` (sources/dialects.py, a Dialect or its name) renders the
    upsert in the target engine's native form — Postgres/SQLite ON CONFLICT,
    MSSQL MERGE, MySQL ON DUPLICATE KEY; without it the legacy
    placeholder-parameterized ON CONFLICT builder is used."""
    columns = df.columns
    if dialect is not None:
        from etl_mssql_to_postgres_dailysync_spark.sources.dialects import get_dialect

        if isinstance(dialect, str):
            dialect = get_dialect(dialect)
        sql = dialect.upsert_sql(
            table, columns, keys,
            exclude_update_cols=exclude_update_cols,
            matched_condition_sql=matched_condition_sql,
        )
    else:
        sql = make_on_conflict_sql(
            table, columns, keys,
            exclude_update_cols=exclude_update_cols,
            matched_condition_sql=matched_condition_sql,
            placeholder=placeholder,
        )

    def load_partition(rows) -> None:
        conn = connect()
        try:
            cur = conn.cursor()
            batch = []
            for row in rows:
                batch.append(tuple(row))
                if len(batch) >= page_size:
                    cur.executemany(sql, batch)
                    batch = []
            if batch:
                cur.executemany(sql, batch)
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()

    df.foreachPartition(load_partition)
