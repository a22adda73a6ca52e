"""Coercion layer (C1-C10) against the reference's own CSV dialect:
'M/D/YYYY H:MM' single-digit timestamps, lexical booleans, errors->NULL."""

import datetime as dt
from decimal import Decimal

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_mssql_to_postgres_dailysync_spark.operators import coerce


def test_orders_raw_coercion(spark):
    raw = spark.createDataFrame(
        [
            Row(
                OrderID="17",
                UserID="abc",          # malformed -> NULL (C1)
                AddedToCartAt="4/20/2025 4:11",   # single-digit form (C3)
                OrderCreatedAt="",     # empty -> NULL
                Amount="1234.56",
                Product="Laptop",
                IsDelivered="T",       # lexical true (C4)
            )
        ]
    )
    row = coerce.coerce_orders_raw(raw).collect()[0]
    assert row["OrderID"] == 17
    assert row["UserID"] is None
    assert row["AddedToCartAt"] == dt.datetime(2025, 4, 20, 4, 11)
    assert row["OrderCreatedAt"] is None
    assert row["Amount"] == Decimal("1234.5600")
    assert row["IsDelivered"] is True


def test_boolean_lexicon(spark):
    vals = ["TRUE", "false", "1", "0", "yes", "No", "t", "F", "maybe", None]
    df = spark.createDataFrame([Row(v=v) for v in vals])
    got = [r[0] for r in df.select(coerce.to_boolean_lexical("v")).collect()]
    assert got == [True, False, True, False, True, False, True, False, None, None]


def test_timestamp_ladder_iso_fallback(spark):
    df = spark.createDataFrame(
        [Row(v="2025-01-02 03:04:05"), Row(v="12/31/2024 23:59"), Row(v="junk")]
    )
    got = [r[0] for r in df.select(coerce.to_timestamp_ladder("v")).collect()]
    assert got[0] == dt.datetime(2025, 1, 2, 3, 4, 5)
    assert got[1] == dt.datetime(2024, 12, 31, 23, 59)
    assert got[2] is None


def test_coercion_accounting(spark):
    raw = spark.createDataFrame(
        [Row(a="1", b="x"), Row(a="oops", b="2"), Row(a=None, b="3")]
    )
    acct = coerce.coercion_accounting(
        raw, {"a": F.col("a").cast("bigint"), "b": F.col("b").cast("bigint")}
    ).collect()[0]
    # 'oops' nulled (NULL input doesn't count); 'x' nulled
    assert acct["a_nulled"] == 1
    assert acct["b_nulled"] == 1


def test_reference_orders_csv_parses(spark):
    """End-to-end against the reference's checked-in fixture: 1000 rows,
    320 with empty OrderCreatedAt (BASELINE.md)."""
    from etl_mssql_to_postgres_dailysync_spark.schemas import ORDERS_RAW_SCHEMA
    from etl_mssql_to_postgres_dailysync_spark.sources.readers import read_csv

    raw = read_csv(spark, "/root/reference/orders.csv", ORDERS_RAW_SCHEMA)
    typed = coerce.coerce_orders_raw(raw)
    assert typed.count() == 1000
    assert typed.filter(F.col("OrderCreatedAt").isNull()).count() == 320
    # no timestamps lost by the format ladder
    assert typed.filter(
        F.col("AddedToCartAt").isNull()
    ).count() == 0
