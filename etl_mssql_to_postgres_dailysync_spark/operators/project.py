"""Projection ops — P5-P8 (SURVEY.md §2.2)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def drop_surrogate(df: DataFrame, col: str = "id") -> DataFrame:
    """P5 — drop surrogate column if present
    (dags/mssql_to_postgresql_orders_daily.py:217,392)."""
    return df.drop(col) if col in df.columns else df


def lowercase_columns(df: DataFrame) -> DataFrame:
    """P6 — lowercase all column names to match PG identifiers
    (dags/mssql_to_postgresql_orders_daily.py:216,391)."""
    return df.toDF(*[c.lower() for c in df.columns])


def align_columns(df: DataFrame, schema: T.StructType) -> DataFrame:
    """P7 — add missing expected columns as typed NULLs, coerce present ones,
    and emit in the fixed schema order (csv_to_mssqldb.py:225-239,503-505)."""
    cols = []
    for field in schema.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def with_audit_timestamp(df: DataFrame, col: str = "loaded_at_timestamp") -> DataFrame:
    """P8 — engine-filled audit column, the Spark analog of the target DDL's
    ``DEFAULT CURRENT_TIMESTAMP`` (postgres_init/init.sql:23)."""
    return df.withColumn(col, F.current_timestamp().cast(T.TimestampNTZType()))
