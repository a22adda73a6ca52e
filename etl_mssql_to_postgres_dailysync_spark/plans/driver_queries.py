"""Driver-contract query registry: every operator from SURVEY.md §2 (plus the
training-data-pipeline extensions) as a ``(spark, sf_dir) -> DataFrame``
callable with a DuckDB oracle-SQL twin.

Conventions for oracle parity:
  * every computed column is aliased identically on both sides;
  * doubles produced by arithmetic are ``round(x, n)``-ed on both sides
    (identical IEEE ops -> identical values; rounding removes residual risk);
  * all hashing goes through md5 (functions/hashing.py) which is bit-equal in
    Spark and DuckDB;
  * timestamps are tz-naive on both sides (session pinned to UTC).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mssql_to_postgres_dailysync_spark.functions import dedup, multimodal, similarity, text
from etl_mssql_to_postgres_dailysync_spark.functions.hashing import md5_long
from etl_mssql_to_postgres_dailysync_spark.operators import coerce, filters
from etl_mssql_to_postgres_dailysync_spark.operators.merge import merge
from etl_mssql_to_postgres_dailysync_spark.plans.daily_sync import per_date_counts
from etl_mssql_to_postgres_dailysync_spark.sources.fake_data import (
    EPOCH_START,
    PRODUCTS,
    RANGE_SECONDS,
    fake_orders,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

RUN_DATE = "1995-03-15"
ORDER_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS): Spark reads it as a long
        # (nanosAsLong); truncate to micros exactly like DuckDB's TIMESTAMP_NS
        # -> TIMESTAMP cast so both engines see identical values.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Reference surface: scans / filters / projections (S1-S3, P1-P7)
# ---------------------------------------------------------------------------

@register(
    "daily_partition_extract",
    f"""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE CAST(o_orderdate AS DATE) = DATE '{RUN_DATE}'
    """,
)
def daily_partition_extract(spark, sf_dir):
    """S1/P1 — parameterized daily-partition scan; the predicate is pushed
    into the parquet scan (reference: WHERE inside MSSQL,
    dags/mssql_to_postgresql_orders_daily.py:199)."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(filters.daily_partition("o_orderdate", RUN_DATE))
        .select(*ORDER_COLS)
    )


@register(
    "backfill_range_counts",
    """
    SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS run_date, COUNT(*) AS row_count
    FROM orders
    WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-03-01' AND DATE '1995-06-30'
    GROUP BY 1
    """,
)
def backfill_range_counts(spark, sf_dir):
    """Backfill/historical variants — per-date extract counts over a range as
    ONE partition-parallel scan (vs the reference's per-date Airflow tasks)."""
    orders = _t(spark, sf_dir, "orders").filter(
        filters.date_range_partition("o_orderdate", "1995-03-01", "1995-06-30")
    )
    return per_date_counts(orders, "o_orderdate").withColumn(
        "run_date", F.col("run_date").cast("string")
    )


@register(
    "validation_count",
    f"""
    SELECT COUNT(*) AS n_rows FROM orders
    WHERE CAST(o_orderdate AS DATE) = DATE '{RUN_DATE}'
    """,
)
def validation_count(spark, sf_dir):
    """A1/S10 — the validate task's scalar count
    (dags/…_orders_daily.py:561-566)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.filter(filters.daily_partition("o_orderdate", RUN_DATE)).agg(
        F.count(F.lit(1)).alias("n_rows")
    )


@register(
    "incomplete_quarantine",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE (CASE WHEN event_type = 'error' THEN NULL ELSE ts END) IS NULL
    """,
)
def incomplete_quarantine(spark, sf_dir):
    """S2/P2 — the NULL-event-time quarantine partition
    (dags/…_orders_daily.py:373-377). Testdata has no NULL ts, so 'error'
    events stand in as the incomplete class (FIXTURES.md §5)."""
    events = _t(spark, sf_dir, "events").withColumn(
        "ts_masked", F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("ts"))
    )
    _, incomplete = filters.split_complete_incomplete(events, "ts_masked")
    return incomplete.select("event_id", "user_id", "event_type", "value")


@register(
    "key_null_drop",
    """
    SELECT event_id,
           (CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id END) AS user_key,
           event_type
    FROM events
    WHERE (CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id END) IS NOT NULL
      AND event_id IS NOT NULL
    """,
)
def key_null_drop(spark, sf_dir):
    """P3 — NULL-key rows dropped pre-merge (csv_to_mssqldb.py:337-362)."""
    events = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("user_id") % 7 == 0, F.lit(None)).otherwise(F.col("user_id")).alias("user_key"),
        "event_type",
    )
    return filters.drop_null_keys(events, ["event_id", "user_key"])


@register(
    "column_align",
    """
    SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS license, CAST(n_chars AS BIGINT) AS n_chars
    FROM documents
    """,
)
def column_align(spark, sf_dir):
    """P7 — align to an expected schema: missing column -> typed NULL, fixed
    order (csv_to_mssqldb.py:225-239)."""
    from pyspark.sql import types as T

    from etl_mssql_to_postgres_dailysync_spark.operators.project import align_columns

    expected = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("license", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    return align_columns(_t(spark, sf_dir, "documents"), expected)


# ---------------------------------------------------------------------------
# The merge family (S6-S9, J1-J4)
# ---------------------------------------------------------------------------

_MERGE_T = "SELECT * FROM orders WHERE o_orderkey % 4 <> 0"
_MERGE_S = """
    SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
           o_totalprice + 10.0 AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 0
"""


def _merge_frames(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").select(*ORDER_COLS)
    target = orders.filter(F.col("o_orderkey") % 4 != 0)
    source = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 10.0).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    return target, source


@register(
    "merge_upsert",
    f"""
    WITH t AS ({_MERGE_T}), s AS ({_MERGE_S})
    SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey ELSE t.o_custkey END AS o_custkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderdate ELSE t.o_orderdate END AS o_orderdate,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderpriority ELSE t.o_orderpriority END AS o_orderpriority
    FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
    """,
)
def merge_upsert(spark, sf_dir):
    """S6/J1/J3 — plain ON CONFLICT upsert as a relational merge
    (dags/…_orders_daily.py:296-343)."""
    target, source = _merge_frames(spark, sf_dir)
    return merge(target, source, ["o_orderkey"]).df


@register(
    "merge_column_mask",
    f"""
    WITH t AS ({_MERGE_T}), s AS ({_MERGE_S})
    SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey ELSE t.o_custkey END AS o_custkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
           CASE WHEN t.o_orderkey IS NOT NULL THEN t.o_orderdate ELSE s.o_orderdate END AS o_orderdate,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderpriority ELSE t.o_orderpriority END AS o_orderpriority
    FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
    """,
)
def merge_column_mask(spark, sf_dir):
    """S8 — MSSQL MERGE with o_orderdate excluded from the UPDATE SET
    (first-write-wins, csv_to_mssqldb.py:421)."""
    target, source = _merge_frames(spark, sf_dir)
    return merge(target, source, ["o_orderkey"], exclude_update_cols=["o_orderdate"]).df


_COND_T = "SELECT event_id, ts, user_id, event_type, value FROM events WHERE event_id % 3 <> 0"
_COND_S = """
    SELECT event_id,
           ts + (CASE WHEN event_id % 4 = 0 THEN 1 ELSE -1 END) * INTERVAL 1 HOUR AS ts,
           user_id, 'synced' AS event_type, value * 2 AS value
    FROM events WHERE event_id % 2 = 0
"""


@register(
    "merge_conditional",
    f"""
    WITH t AS ({_COND_T}), s AS ({_COND_S})
    SELECT COALESCE(t.event_id, s.event_id) AS event_id,
           CASE WHEN t.event_id IS NULL THEN s.ts
                WHEN s.event_id IS NOT NULL AND (t.ts IS NULL OR s.ts > t.ts) THEN s.ts
                ELSE t.ts END AS ts,
           CASE WHEN t.event_id IS NULL THEN s.user_id
                WHEN s.event_id IS NOT NULL AND (t.ts IS NULL OR s.ts > t.ts) THEN s.user_id
                ELSE t.user_id END AS user_id,
           CASE WHEN t.event_id IS NULL THEN s.event_type
                WHEN s.event_id IS NOT NULL AND (t.ts IS NULL OR s.ts > t.ts) THEN s.event_type
                ELSE t.event_type END AS event_type,
           CASE WHEN t.event_id IS NULL THEN s.value
                WHEN s.event_id IS NOT NULL AND (t.ts IS NULL OR s.ts > t.ts) THEN s.value
                ELSE t.value END AS value
    FROM t FULL OUTER JOIN s ON t.event_id = s.event_id
    """,
)
def merge_conditional(spark, sf_dir):
    """S7/J4 — last-writer-wins guarded upsert on a version timestamp
    (mssql_to_postgres_sync pyc): update only when source.ts is newer."""
    events = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type", "value")
    target = events.filter(F.col("event_id") % 3 != 0)
    source = events.filter(F.col("event_id") % 2 == 0).select(
        "event_id",
        F.when(F.col("event_id") % 4 == 0, F.col("ts") + F.expr("INTERVAL 1 HOUR"))
        .otherwise(F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        .alias("ts"),
        "user_id",
        F.lit("synced").alias("event_type"),
        (F.col("value") * 2).alias("value"),
    )
    return merge(
        target,
        source,
        ["event_id"],
        matched_condition=lambda s, t: t("ts").isNull() | (s("ts") > t("ts")),
    ).df


@register(
    "merge_insert_only",
    f"""
    WITH t AS ({_MERGE_T}), s AS ({_MERGE_S})
    SELECT * FROM t
    UNION ALL
    SELECT * FROM s WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.o_orderkey = s.o_orderkey)
    """,
)
def merge_insert_only(spark, sf_dir):
    """WHEN NOT MATCHED THEN INSERT only (append-if-absent)."""
    target, source = _merge_frames(spark, sf_dir)
    return merge(target, source, ["o_orderkey"], insert_only=True).df


# ---------------------------------------------------------------------------
# Coercion layer (C1-C10) + null accounting (A3/A4)
# ---------------------------------------------------------------------------

@register(
    "coercion_casts",
    """
    SELECT event_id,
           TRY_CAST(substr(props, 1, 3) AS BIGINT) AS bad_long,
           TRY_CAST(CAST(event_id AS VARCHAR) AS BIGINT) AS good_long,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS ts_roundtrip,
           CASE WHEN event_type IN ('click') THEN true
                WHEN event_type IN ('view') THEN false
                ELSE NULL END AS flag,
           round(CAST(CAST(value AS VARCHAR) AS DOUBLE), 2) AS value_roundtrip
    FROM events
    """,
)
def coercion_casts(spark, sf_dir):
    """C1-C5, C9 — errors->NULL casts: malformed string->NULL bigint, JSON
    field extraction, timestamp format round-trip (C3+C9), lexical boolean
    (C4), numeric round-trip."""
    events = _t(spark, sf_dir, "events")
    flag_src = (
        F.when(F.col("event_type") == "click", F.lit("T"))
        .when(F.col("event_type") == "view", F.lit("false"))
        .otherwise(F.lit("maybe"))
    )
    return events.select(
        "event_id",
        coerce.to_long(F.substring("props", 1, 3)).alias("bad_long"),
        coerce.to_long(F.col("event_id").cast("string")).alias("good_long"),
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        coerce.to_timestamp_ladder(coerce.format_timestamp("ts", "yyyy-MM-dd HH:mm:ss")).alias("ts_roundtrip"),
        coerce.to_boolean_lexical(flag_src).alias("flag"),
        F.round(F.col("value").cast("string").cast("double"), 2).alias("value_roundtrip"),
    )


@register(
    "coercion_accounting",
    """
    SELECT count(*) FILTER (WHERE substr(props, 1, 3) IS NOT NULL
                              AND TRY_CAST(substr(props, 1, 3) AS BIGINT) IS NULL) AS bad_long_nulled,
           count(*) FILTER (WHERE event_type IS NOT NULL
                              AND (CASE WHEN event_type IN ('click') THEN true
                                        WHEN event_type IN ('view') THEN false
                                        ELSE NULL END) IS NULL) AS flag_nulled
    FROM events
    """,
)
def coercion_accounting(spark, sf_dir):
    """C10 — per-column count of values nulled by coercion, one aggregate pass
    (csv_to_mssqldb.py:251-256)."""
    events = _t(spark, sf_dir, "events").select(
        F.substring("props", 1, 3).alias("bad_long"),
        F.col("event_type").alias("flag"),
    )
    return coerce.coercion_accounting(
        events,
        {
            "bad_long": coerce.to_long(F.col("bad_long")),
            "flag": (
                F.when(F.col("flag") == "click", F.lit(True))
                .when(F.col("flag") == "view", F.lit(False))
                .otherwise(F.lit(None).cast("boolean"))
            ),
        },
    )


@register(
    "null_counts",
    """
    SELECT count(*) FILTER (WHERE (CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id END) IS NULL) AS user_key_nulls,
           count(*) FILTER (WHERE (CASE WHEN event_type = 'error' THEN NULL ELSE ts END) IS NULL) AS ts_masked_nulls,
           count(*) FILTER (WHERE (CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id END) IS NULL
                               OR (CASE WHEN event_type = 'error' THEN NULL ELSE ts END) IS NULL) AS any_null_rows
    FROM events
    """,
)
def null_counts(spark, sf_dir):
    """A3/A4 — per-column and any-null-in-row counts in one pass
    (column_check.py:5; csv_to_mssqldb.py:350-351)."""
    ev = _t(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 7 == 0, F.lit(None)).otherwise(F.col("user_id")).alias("user_key"),
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("ts")).alias("ts_masked"),
    )
    return ev.agg(
        F.count_if(F.col("user_key").isNull()).alias("user_key_nulls"),
        F.count_if(F.col("ts_masked").isNull()).alias("ts_masked_nulls"),
        F.count_if(F.col("user_key").isNull() | F.col("ts_masked").isNull()).alias("any_null_rows"),
    )


# ---------------------------------------------------------------------------
# Synthetic source (S11)
# ---------------------------------------------------------------------------

def _uniform_sql(expr: str, modulus: int, seed: int) -> str:
    return (
        f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR) || '#{seed}'), 1, 15) AS BIGINT) % {modulus}"
    )


@register(
    "fake_orders_generator",
    f"""
    WITH ids AS (SELECT range + 1 AS id FROM range(1000))
    SELECT id AS OrderID,
           1000 + {_uniform_sql('id', 9000, 4)} AS UserID,
           TIMESTAMP '{EPOCH_START}' + to_seconds({_uniform_sql('id', RANGE_SECONDS, 1)}) AS AddedToCartAt,
           CASE WHEN {_uniform_sql('id', 100, 3)} < 30 THEN NULL
                ELSE TIMESTAMP '{EPOCH_START}' + to_seconds({_uniform_sql('id', RANGE_SECONDS, 1)})
                     + to_minutes(5 + {_uniform_sql('id', 176, 2)})
           END AS OrderCreatedAt,
           round((10000 + {_uniform_sql('id', 190001, 5)}) / 100.0, 2) AS Amount,
           list_extract({PRODUCTS!r}, CAST({_uniform_sql('id', len(PRODUCTS), 6)} + 1 AS INTEGER)) AS Product,
           CASE WHEN {_uniform_sql('id', 100, 3)} < 30 THEN false
                ELSE {_uniform_sql('id', 2, 7)} = 1 END AS IsDelivered
    FROM ids
    """,
)
def fake_orders_generator(spark, sf_dir):
    """S11 — deterministic distributed synthetic orders
    (fake_data_producer.py:8-37 re-expressed; md5-derived uniforms make it
    engine-reproducible). Amount emitted as rounded double for cross-engine
    type parity (engine-internal type is decimal(18,4))."""
    df = fake_orders(spark, 1000)
    return df.withColumn("Amount", F.round(F.col("Amount").cast("double"), 2))
