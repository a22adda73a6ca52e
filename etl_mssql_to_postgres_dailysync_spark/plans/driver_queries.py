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

from etl_mssql_to_postgres_dailysync_spark.functions import dedup, multimodal, similarity, sketches, text
from etl_mssql_to_postgres_dailysync_spark.functions.hashing import md5_long, md5_long_sql
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
        # events.ts arrives either as parquet TIMESTAMP(NANOS) — which Spark
        # reads as a raw long (nanosAsLong) — or natively as TIMESTAMP(MICROS)
        # depending on the fixture generation. Normalize the long form by
        # truncating to micros exactly like DuckDB's TIMESTAMP_NS -> TIMESTAMP
        # cast so both engines see identical values; the micros form passes
        # through untouched.
        from pyspark.sql.types import LongType, TimestampNTZType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            # session tz is pinned UTC, so NTZ -> LTZ preserves the wall-clock
            # value; LTZ keeps unix_micros()/epoch arithmetic working downstream
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if name in ("documents", "embeddings"):
        # These fixtures are one small parquet file = ONE input split, so
        # every doc-level pipeline (shingling, hashing, Pandas-UDF decode)
        # would run on a single core. Fan out to the cluster's parallelism
        # when the scan can't; at real scale the file splits already provide
        # this and the repartition is a no-op branch.
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
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
    "project_normalize",
    """
    SELECT o_orderkey AS orderkey, o_custkey AS custkey, o_orderstatus AS orderstatus
    FROM orders WHERE o_orderkey % 10 = 0
    """,
)
def project_normalize(spark, sf_dir):
    """P5/P6 — surrogate-column drop + lowercase-normalize column names
    (dags/…_orders_daily.py:216-217), on a renamed slice of orders."""
    from etl_mssql_to_postgres_dailysync_spark.operators.project import (
        drop_surrogate,
        lowercase_columns,
    )

    df = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(
            F.col("o_orderkey").alias("OrderKey"),
            F.col("o_custkey").alias("CustKey"),
            F.col("o_orderstatus").alias("OrderStatus"),
            F.monotonically_increasing_id().alias("id"),
        )
    )
    return lowercase_columns(drop_surrogate(df))


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


@register(
    "merge_small_source",
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
def merge_small_source(spark, sf_dir):
    """The 100 TB merge path: huge target + small delta. Target rows never
    shuffle (left join against broadcast(source)); inserts anti-join only the
    target's pruned key column. Result must be identical to the full-outer
    strategy — same oracle as merge_upsert."""
    target, source = _merge_frames(spark, sf_dir)
    return merge(target, source, ["o_orderkey"], strategy="small_source").df


@register(
    "merge_composite_key",
    """
    WITH t AS (SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
               WHERE l_orderkey % 4 <> 0),
    s AS (SELECT l_orderkey, l_linenumber, max(l_quantity) + 5 AS l_quantity,
                 'S' AS l_returnflag
          FROM lineitem WHERE l_orderkey % 2 = 0 GROUP BY 1, 2)
    SELECT COALESCE(t.l_orderkey, s.l_orderkey) AS l_orderkey,
           COALESCE(t.l_linenumber, s.l_linenumber) AS l_linenumber,
           CASE WHEN s.l_orderkey IS NOT NULL THEN s.l_quantity ELSE t.l_quantity END AS l_quantity,
           CASE WHEN s.l_orderkey IS NOT NULL THEN s.l_returnflag ELSE t.l_returnflag END AS l_returnflag
    FROM t FULL OUTER JOIN s
      ON t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber
    """,
)
def merge_composite_key(spark, sf_dir):
    """J2 — composite conflict key (l_orderkey, l_linenumber), the engine
    analog of the sync variant's 4-column ON CONFLICT target
    (mssql_to_postgres_sync pyc). Source is made key-unique by construction
    (the testdata's composite key has duplicates, and cross-engine tie-break
    order in last-wins dedupe is undefined)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    target = li.filter(F.col("l_orderkey") % 4 != 0)
    source = (
        li.filter(F.col("l_orderkey") % 2 == 0)
        .groupBy("l_orderkey", "l_linenumber")
        .agg((F.max("l_quantity") + 5).alias("l_quantity"))
        .withColumn("l_returnflag", F.lit("S"))
    )
    return merge(target, source, ["l_orderkey", "l_linenumber"]).df


@register(
    "merge_metrics",
    f"""
    WITH t AS ({_MERGE_T}), s AS ({_MERGE_S}),
    j AS (SELECT t.o_orderkey AS tk, s.o_orderkey AS sk
          FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey)
    SELECT count(*) AS total,
           count(*) FILTER (WHERE tk IS NOT NULL AND sk IS NOT NULL) AS updated,
           count(*) FILTER (WHERE tk IS NULL) AS inserted,
           count(*) FILTER (WHERE tk IS NOT NULL AND sk IS NULL) AS kept
    FROM j
    """,
)
def merge_metrics(spark, sf_dir):
    """A5 — merge operation metrics (affected-rows accounting): one aggregate
    pass over the merge's action markers, the engine's ``cur.rowcount``
    (dags/…_orders_daily.py:328-335)."""
    target, source = _merge_frames(spark, sf_dir)
    return merge(target, source, ["o_orderkey"]).counts_df()


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
    "json_functions",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
           CAST(json_valid(props) AS BOOLEAN) AS is_valid,
           CAST(json_array_length(json_extract(('[' || json_extract_string(props, '$.k') || ',2]'), '$')) AS INT) AS arr_len,
           json_extract_string('{"missing": 1}', '$.k') AS absent
    FROM events
    """,
)
def json_functions(spark, sf_dir):
    """Semi-structured extraction over a JSON string column: typed field
    extraction (from_json with schema — JVM-side Jackson parse, one pass),
    validity probe, array construction + length, missing-path NULL."""
    from pyspark.sql import types as T

    events = _t(spark, sf_dir, "events")
    parsed = F.from_json("props", T.StructType([T.StructField("k", T.LongType())]))
    return events.select(
        "event_id",
        parsed["k"].alias("k_typed"),
        parsed.isNotNull().alias("is_valid"),
        F.size(
            F.from_json(
                F.concat(F.lit("["), F.get_json_object("props", "$.k"), F.lit(",2]")),
                T.ArrayType(T.LongType()),
            )
        ).cast("int").alias("arr_len"),
        F.get_json_object(F.lit('{"missing": 1}'), "$.k").alias("absent"),
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


_DS_DATE = "2025-03-15"


@register(
    "daily_sync_pipeline",
    f"""
    WITH gen AS ({ORACLES["fake_orders_generator"].replace("range(1000)", "range(10000)")})
    SELECT OrderID, UserID, AddedToCartAt, OrderCreatedAt, Amount, Product, IsDelivered
    FROM gen
    WHERE OrderCreatedAt >= TIMESTAMP '{_DS_DATE} 00:00:00'
      AND OrderCreatedAt < TIMESTAMP '{_DS_DATE} 00:00:00' + INTERVAL 1 DAY
    """,
)
def daily_sync_pipeline(spark, sf_dir):
    """E1 — the flagship pipeline end-to-end as ONE plan: generate the
    source, run daily_sync (date-partition extract, NULL-key split, key
    drop, small-source merge, reconciliation) against an empty target, and
    return the post-merge target state. With an empty target that state ==
    the complete partition for the run date, which the oracle derives from
    the generator SQL directly."""
    from etl_mssql_to_postgres_dailysync_spark.plans.daily_sync import daily_sync

    src = fake_orders(spark, 10000)
    target = src.filter(F.lit(False))
    res = daily_sync(src, target, _DS_DATE)
    return res.merged_target.withColumn(
        "Amount", F.round(F.col("Amount").cast("double"), 2)
    )


@register(
    "csv_roundtrip",
    ORACLES["fake_orders_generator"],
)
def csv_roundtrip(spark, sf_dir):
    """S3/S4/C9 — the reference's CSV interchange boundary: write the orders
    batch as CSV in the reference's timestamp format
    ('%Y-%m-%d %H:%M:%S.%f', dags/…_orders_daily.py:219), read it back with
    an explicit schema, and prove the round trip is lossless (oracle = the
    generator itself)."""
    import tempfile

    from etl_mssql_to_postgres_dailysync_spark.schemas import ORDERS_SCHEMA
    from etl_mssql_to_postgres_dailysync_spark.sources.readers import read_csv
    from etl_mssql_to_postgres_dailysync_spark.sources.writers import write_csv

    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    path = f"{tempfile.gettempdir()}/spark_graft_csv_roundtrip"
    write_csv(fake_orders(spark, 1000), path, timestamp_format=fmt)
    back = read_csv(spark, path, schema=ORDERS_SCHEMA, timestamp_format=fmt)
    return back.withColumn("Amount", F.round(F.col("Amount").cast("double"), 2))


# ---------------------------------------------------------------------------
# Training-data pipeline extensions: dedup / text / similarity / multimodal
# (BASELINE.json north-star; first-class alongside the reference surface)
# ---------------------------------------------------------------------------

_NORM_SQL = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_TOKS_SQL = rf"regexp_split_to_array({_NORM_SQL}, ' ')"
_HASH15 = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"

# distinct 3-word shingle HASHES with the <3-token fallback (matches
# dedup.shingle_hashes: one md5 per token, polynomial window combination)
_SH_P = dedup.MINHASH_P
_SH_C1 = dedup.SHINGLE_C1
_SHINGLES_CTE = rf"""
    toks AS (SELECT doc_id, source,
                    list_transform({_TOKS_SQL},
                                   t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % {_SH_P}) AS th
             FROM documents),
    pos AS (SELECT doc_id, source, th, unnest(range(1, greatest(len(th) - 2, 1) + 1)) AS i FROM toks),
    sh AS (
        SELECT DISTINCT doc_id, source,
               CASE WHEN len(th) >= 3
                      THEN (((th[i] * {_SH_C1} + th[i+1]) % {_SH_P}) * {_SH_C1} + th[i+2]) % {_SH_P}
                    WHEN len(th) = 2 THEN (th[1] * {_SH_C1} + th[2]) % {_SH_P}
                    ELSE th[1] END AS sh
        FROM pos
    )
"""


@register(
    "dedup_exact",
    f"""
    SELECT {_HASH15.format(x=_NORM_SQL)} AS content_hash,
           min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on the normalized-content fingerprint; only
    (hash, id) pairs shuffle, never document text."""
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"), "text", "doc_id")


_MH_SEED_VALUES = ", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(dedup.minhash_coeffs(16))
)


@register(
    "dedup_minhash_lsh",
    f"""
    WITH {_SHINGLES_CTE},
    hs AS (SELECT doc_id, sh AS h FROM sh),
    seeds AS (SELECT * FROM (VALUES {_MH_SEED_VALUES}) AS t(seed, a, b)),
    sig AS (
        SELECT doc_id, seed, min((a * h + b) % {dedup.MINHASH_P}) AS sig
        FROM hs CROSS JOIN seeds GROUP BY doc_id, seed
    ),
    bands AS (
        SELECT doc_id, seed // 4 AS band,
               string_agg(CAST(sig AS VARCHAR), '|' ORDER BY seed) AS sigstr
        FROM sig GROUP BY doc_id, seed // 4
    ),
    bh AS (
        SELECT doc_id, band,
               CAST('0x' || substr(md5(sigstr || '#' || (1000 + band)), 1, 15) AS BIGINT) AS band_hash
        FROM bands
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bh a JOIN bh b ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(16)+LSH(4 bands x 4 rows) near-dup candidate pairs; one md5
    per shingle, per-seed hashes derived arithmetically (universal-hash
    family), signature in one shuffle-free fold; join only on
    (band, band_hash)."""
    return dedup.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", num_hashes=16, bands=4, k=3
    )


@register(
    "dedup_simhash",
    f"""
    WITH t1 AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    tk AS (SELECT DISTINCT doc_id, unnest(tk) AS t FROM t1),
    th AS (SELECT doc_id, {_HASH15.format(x='t')} AS h FROM tk),
    bits AS (SELECT unnest(range(0, 60)) AS j),
    votes AS (
        SELECT doc_id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS cnt
        FROM th CROSS JOIN bits GROUP BY doc_id, j
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN cnt > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """,
)
def dedup_simhash(spark, sf_dir):
    """SimHash(60-bit) fingerprints, one ordered fold per document."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", dedup.simhash(F.col("text")).alias("simhash"))


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH {_SHINGLES_CTE},
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.source = b.source AND a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           inter / (sa.n + sb.n - inter) AS jaccard,
           (inter * 1000000) // (sa.n + sb.n - inter) AS jaccard_ppm
    FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
    WHERE (inter * 1000000) // (sa.n + sb.n - inter) >= 100000
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard pairs >= 0.1, blocked by source (inverted-index
    join: shuffle is O(matching shingles), not O(n^2))."""
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        k=3, threshold=0.1, block_col="source",
    )


_NGRAM_CAP = 20


@register(
    "dedup_ngram_jaccard_capped",
    f"""
    WITH {_SHINGLES_CTE},
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    keep AS (SELECT source, sh FROM sh GROUP BY source, sh
             HAVING count(*) BETWEEN 2 AND {_NGRAM_CAP}),
    shc AS (SELECT s.doc_id, s.source, s.sh FROM sh s JOIN keep k
            ON s.source = k.source AND s.sh = k.sh),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM shc a JOIN shc b ON a.source = b.source AND a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           inter / (sa.n + sb.n - inter) AS jaccard,
           (inter * 1000000) // (sa.n + sb.n - inter) AS jaccard_ppm
    FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
    WHERE (inter * 1000000) // (sa.n + sb.n - inter) >= 100000
    """,
)
def dedup_ngram_jaccard_capped(spark, sf_dir):
    """Stop-shingle-capped 3-gram Jaccard: posting lists hotter than
    {_NGRAM_CAP} docs (boilerplate shingles) are dropped before pair
    expansion, bounding fan-out at cap^2 per hot shingle. Per-doc sizes
    |A|,|B| are pre-cap, so capped jaccard underestimates — it can only
    miss boilerplate-driven pairs."""
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        k=3, threshold=0.1, block_col="source", max_posting=_NGRAM_CAP,
    )


def _window_fold_sql(w: int) -> str:
    """DuckDB expression for the w-token positional window fold over th[i..i+w-1]
    (exact twin of dedup._window_hashes_py / dedup.window_hashes)."""
    e = "th[i]"
    for j in range(1, w):
        e = f"(({e}) * {_SH_C1} + th[i+{j}]) % {_SH_P}"
    return e


_SPAN_W = 8
# positional (non-distinct) window hashes for docs with >= w tokens
_WINDOWS_CTE = rf"""
    toks AS (SELECT doc_id,
                    list_transform({_TOKS_SQL},
                                   t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % {_SH_P}) AS th
             FROM documents),
    wpos AS (SELECT doc_id, th, unnest(range(1, len(th) - {_SPAN_W - 1} + 1)) AS i
             FROM toks WHERE len(th) >= {_SPAN_W}),
    wins AS (SELECT doc_id, i AS pos, {_window_fold_sql(_SPAN_W)} AS wh FROM wpos)
"""


@register(
    "dedup_substring_spans",
    f"""
    WITH {_WINDOWS_CTE},
    nw AS (SELECT doc_id, len(th) - {_SPAN_W - 1} AS n_windows
           FROM toks WHERE len(th) >= {_SPAN_W}),
    dup AS (SELECT wh FROM wins GROUP BY wh HAVING min(doc_id) <> max(doc_id)),
    fl AS (SELECT w.doc_id, w.pos FROM wins w JOIN dup d USING (wh)),
    isl AS (SELECT doc_id, pos,
                   pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
            FROM fl),
    spans AS (SELECT doc_id, grp, min(pos) AS s, max(pos) AS e, count(*) AS nwin
              FROM isl GROUP BY 1, 2),
    pd AS (SELECT doc_id, count(*) AS n_spans, sum(nwin) AS n_dup_windows,
                  max(e - s + {_SPAN_W}) AS max_span_tokens
           FROM spans GROUP BY doc_id)
    SELECT p.doc_id, CAST(n.n_windows AS BIGINT) AS n_windows,
           CAST(p.n_dup_windows AS BIGINT) AS n_dup_windows,
           CAST(p.n_spans AS BIGINT) AS n_spans,
           CAST(p.max_span_tokens AS BIGINT) AS max_span_tokens,
           CAST((p.n_dup_windows * 1000000) // n.n_windows AS BIGINT) AS dup_ppm
    FROM pd p JOIN nw n USING (doc_id)
    """,
)
def dedup_substring_spans(spark, sf_dir):
    """Exact repeated-span dedup (suffix-array-style, Lee et al. 2022): docs
    whose 8-token windows recur in other docs, with duplicated windows merged
    into maximal spans (islands trick). Shuffle keys are 8-byte window hashes
    only — document text never leaves the scan."""
    return dedup.substring_span_stats(
        _t(spark, sf_dir, "documents"), "text", "doc_id", w=_SPAN_W
    )


@register(
    "dedup_span_removal",
    f"""
    WITH {_WINDOWS_CTE},
    rawtk AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    dup AS (SELECT wh FROM wins GROUP BY wh HAVING min(doc_id) <> max(doc_id)),
    fl AS (SELECT w.doc_id, w.pos FROM wins w JOIN dup d USING (wh)),
    isl AS (SELECT doc_id, pos,
                   pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
            FROM fl),
    spans AS (SELECT doc_id, grp, min(pos) AS s, max(pos) AS e FROM isl GROUP BY 1, 2),
    pos2 AS (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i FROM rawtk),
    keptrows AS (
        SELECT p.doc_id, p.i, p.tk[p.i] AS t FROM pos2 p
        WHERE NOT EXISTS (SELECT 1 FROM spans sp
                          WHERE sp.doc_id = p.doc_id
                            AND p.i BETWEEN sp.s AND sp.e + {_SPAN_W - 1})
    ),
    ka AS (SELECT doc_id, count(*) AS n_kept,
                  CAST('0x' || substr(md5(string_agg(t, ' ' ORDER BY i)), 1, 15) AS BIGINT) AS fp
           FROM keptrows GROUP BY doc_id)
    SELECT r.doc_id, CAST(len(r.tk) AS BIGINT) AS n_tokens,
           CAST(coalesce(ka.n_kept, 0) AS BIGINT) AS n_tokens_kept,
           coalesce(ka.fp, CAST('0x' || substr(md5(''), 1, 15) AS BIGINT)) AS kept_fp
    FROM rawtk r LEFT JOIN ka USING (doc_id)
    """,
)
def dedup_span_removal(spark, sf_dir):
    """The transform half of substring dedup: every document rebuilt with its
    cross-document duplicated 8-token spans removed; kept_fp fingerprints the
    exact cleaned text so the oracle verifies the reconstruction without
    shipping it. Spans stay as per-doc arrays; reconstruction is one indexed
    filter HOF over the token array — no token explode."""
    return dedup.substring_span_removal(
        _t(spark, sf_dir, "documents"), "text", "doc_id", w=_SPAN_W
    )


@register(
    "dedup_top_spans",
    f"""
    WITH {_WINDOWS_CTE}
    SELECT wh, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences,
           min(doc_id) AS example_doc
    FROM wins GROUP BY wh HAVING count(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, n_occurrences DESC, wh ASC LIMIT 20
    """,
)
def dedup_top_spans(spark, sf_dir):
    """Memorization audit: top-20 most-duplicated 8-token spans across the
    corpus (TakeOrdered top-N on (distinct docs, occurrences), no global
    sort)."""
    return dedup.top_duplicated_spans(
        _t(spark, sf_dir, "documents"), "text", "doc_id", w=_SPAN_W, top_n=20
    )


@register(
    "dedup_minhash_estimate",
    f"""
    WITH {_SHINGLES_CTE},
    hs AS (SELECT doc_id, sh AS h FROM sh),
    seeds AS (SELECT * FROM (VALUES {_MH_SEED_VALUES}) AS t(seed, a, b)),
    sig AS (
        SELECT doc_id, seed, min((a * h + b) % {dedup.MINHASH_P}) AS sig
        FROM hs CROSS JOIN seeds GROUP BY doc_id, seed
    ),
    bands AS (
        SELECT doc_id, seed // 4 AS band,
               string_agg(CAST(sig AS VARCHAR), '|' ORDER BY seed) AS sigstr
        FROM sig GROUP BY doc_id, seed // 4
    ),
    bh AS (
        SELECT doc_id, band,
               CAST('0x' || substr(md5(sigstr || '#' || (1000 + band)), 1, 15) AS BIGINT) AS band_hash
        FROM bands
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bh a JOIN bh b ON a.band = b.band AND a.band_hash = b.band_hash
                            AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           CAST(count(*) FILTER (WHERE sa.sig = sb.sig) * 62500 AS BIGINT) AS est_ppm
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.id_a
    JOIN sig sb ON sb.doc_id = c.id_b AND sb.seed = sa.seed
    GROUP BY 1, 2
    """,
)
def dedup_minhash_estimate(spark, sf_dir):
    """Tiered near-dup verify, middle tier: Jaccard estimated from MinHash
    signature agreement on each LSH candidate pair — O(16) integer compares
    per pair, no text, no shingle re-expansion; pairs failing the estimate
    never reach the exact verify tier."""
    return dedup.minhash_estimate_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", num_hashes=16, bands=4, k=3
    )


@register(
    "dedup_cross_source_matrix",
    f"""
    WITH {_SHINGLES_CTE},
    hs AS (SELECT doc_id, sh AS h FROM sh),
    seeds AS (SELECT * FROM (VALUES {_MH_SEED_VALUES}) AS t(seed, a, b)),
    sig AS (
        SELECT doc_id, seed, min((a * h + b) % {dedup.MINHASH_P}) AS sig
        FROM hs CROSS JOIN seeds GROUP BY doc_id, seed
    ),
    bands AS (
        SELECT doc_id, seed // 4 AS band,
               string_agg(CAST(sig AS VARCHAR), '|' ORDER BY seed) AS sigstr
        FROM sig GROUP BY doc_id, seed // 4
    ),
    bh AS (
        SELECT doc_id, band,
               CAST('0x' || substr(md5(sigstr || '#' || (1000 + band)), 1, 15) AS BIGINT) AS band_hash
        FROM bands
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bh a JOIN bh b ON a.band = b.band AND a.band_hash = b.band_hash
                            AND a.doc_id < b.doc_id
    )
    SELECT da.source AS source_a, db.source AS source_b, count(*) AS n_pairs
    FROM cand c
    JOIN documents da ON da.doc_id = c.id_a
    JOIN documents db ON db.doc_id = c.id_b
    GROUP BY 1, 2
    """,
)
def dedup_cross_source_matrix(spark, sf_dir):
    """Corpus diagnostics: which SOURCES duplicate each other — LSH candidate
    pairs rolled up to a (source_a, source_b) matrix. The source lookup is a
    broadcast join of the (id, source) projection; the matrix is
    |sources|^2-bounded regardless of corpus size."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, "text", "doc_id", num_hashes=16, bands=4, k=3)
    src = F.broadcast(docs.select("doc_id", "source"))
    return (
        pairs.join(src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("source_a")), ["id_a"])
        .join(src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("source_b")), ["id_b"])
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "dedup_tiered_pipeline",
    f"""
    WITH {_SHINGLES_CTE},
    hs AS (SELECT doc_id, sh AS h FROM sh),
    seeds AS (SELECT * FROM (VALUES {_MH_SEED_VALUES}) AS t(seed, a, b)),
    sig AS (
        SELECT doc_id, seed, min((a * h + b) % {dedup.MINHASH_P}) AS sig
        FROM hs CROSS JOIN seeds GROUP BY doc_id, seed
    ),
    bands AS (
        SELECT doc_id, seed // 4 AS band,
               string_agg(CAST(sig AS VARCHAR), '|' ORDER BY seed) AS sigstr
        FROM sig GROUP BY doc_id, seed // 4
    ),
    bh AS (
        SELECT doc_id, band,
               CAST('0x' || substr(md5(sigstr || '#' || (1000 + band)), 1, 15) AS BIGINT) AS band_hash
        FROM bands
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bh a JOIN bh b ON a.band = b.band AND a.band_hash = b.band_hash
                            AND a.doc_id < b.doc_id
    ),
    surv AS (
        SELECT c.id_a, c.id_b,
               CAST(count(*) FILTER (WHERE sa.sig = sb.sig) * 62500 AS BIGINT) AS est_ppm
        FROM cand c
        JOIN sig sa ON sa.doc_id = c.id_a
        JOIN sig sb ON sb.doc_id = c.id_b AND sb.seed = sa.seed
        GROUP BY 1, 2
        HAVING count(*) FILTER (WHERE sa.sig = sb.sig) * 62500 >= 250000
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    vint AS (
        SELECT s.id_a, s.id_b, s.est_ppm, count(*) AS inter
        FROM surv s
        JOIN sh a ON a.doc_id = s.id_a
        JOIN sh b ON b.doc_id = s.id_b AND b.sh = a.sh
        GROUP BY 1, 2, 3
    )
    SELECT v.id_a, v.id_b, v.est_ppm,
           (v.inter * 1000000) // (sa.n + sb.n - v.inter) AS jaccard_ppm
    FROM vint v JOIN sz sa ON sa.doc_id = v.id_a JOIN sz sb ON sb.doc_id = v.id_b
    WHERE (v.inter * 1000000) // (sa.n + sb.n - v.inter) >= 500000
    """,
)
def dedup_tiered_pipeline(spark, sf_dir):
    """Full tiered near-dup pipeline in one plan: LSH banding (every doc,
    once) -> signature-agreement estimate (candidate pairs only) -> exact
    shingle-intersection verify (estimate survivors only)."""
    return dedup.tiered_dedup_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        num_hashes=16, bands=4, k=3, est_threshold=0.25, jaccard_threshold=0.5,
    )


@register(
    "dedup_incremental_batch",
    f"""
    WITH {_SHINGLES_CTE},
    hs AS (SELECT doc_id, sh AS h FROM sh),
    seeds AS (SELECT * FROM (VALUES {_MH_SEED_VALUES}) AS t(seed, a, b)),
    sig AS (
        SELECT doc_id, seed, min((a * h + b) % {dedup.MINHASH_P}) AS sig
        FROM hs CROSS JOIN seeds GROUP BY doc_id, seed
    ),
    bands AS (
        SELECT doc_id, seed // 4 AS band,
               string_agg(CAST(sig AS VARCHAR), '|' ORDER BY seed) AS sigstr
        FROM sig GROUP BY doc_id, seed // 4
    ),
    bh AS (
        SELECT doc_id, band,
               CAST('0x' || substr(md5(sigstr || '#' || (1000 + band)), 1, 15) AS BIGINT) AS band_hash
        FROM bands
    )
    SELECT b.doc_id, count(DISTINCT c.doc_id) AS n_corpus_matches
    FROM bh b JOIN bh c ON b.band = c.band AND b.band_hash = c.band_hash
    WHERE b.doc_id % 10 = 3 AND c.doc_id % 10 <> 3
    GROUP BY 1
    """,
)
def dedup_incremental_batch(spark, sf_dir):
    """Incremental dedup, the daily-sync shape: today's batch (doc_id%10==3)
    probed against the standing corpus's LSH band index — never a corpus
    self-join. At scale the corpus band rows are a persisted index table."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 3)
    batch = docs.filter(F.col("doc_id") % 10 == 3)
    return dedup.incremental_lsh_dedup(
        corpus, batch, "text", "doc_id", num_hashes=16, bands=4, k=3
    )


@register(
    "text_fingerprint",
    f"""
    SELECT doc_id, {_HASH15.format(x=_NORM_SQL)} AS fp FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    """Document content fingerprint (rolling-hash analog, md5-portable)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", text.fingerprint(F.col("text")).alias("fp"))


@register(
    "text_token_stats",
    rf"""
    SELECT doc_id,
           length(text) AS n_chars_calc,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]')) AS n_bpe_tokens
    FROM documents
    """,
)
def text_token_stats(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish word-piece proxy."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.char_count(F.col("text")).alias("n_chars_calc"),
        text.token_count(F.col("text")).cast("long").alias("n_tokens"),
        text.bpe_ish_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
    )


_VOCAB_SIZE = 256
_OOV_BUCKETS = 256


@register(
    "text_encode_ids",
    rf"""
    WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    ex AS (SELECT doc_id, unnest(tk) AS t, generate_subscripts(tk, 1) AS i FROM tk),
    vc AS (
        SELECT t, row_number() OVER (ORDER BY count(*) DESC, t ASC) - 1 AS vid
        FROM (SELECT unnest({_TOKS_SQL}) AS t FROM documents)
        GROUP BY t ORDER BY count(*) DESC, t ASC LIMIT {_VOCAB_SIZE}
    ),
    enc AS (
        SELECT e.doc_id, e.i,
               CAST(coalesce(v.vid,
                             {_VOCAB_SIZE} + {_HASH15.format(x='e.t')} % {_OOV_BUCKETS})
                    AS BIGINT) AS tid
        FROM ex e LEFT JOIN vc v USING (t)
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           array_to_string(list(tid ORDER BY i), ',') AS token_ids_csv
    FROM enc GROUP BY doc_id
    """,
)
def text_encode_ids(spark, sf_dir):
    """Tokenizer-style id encoding: corpus-frequency vocab (one explode +
    TakeOrdered job, collected like the IVF centroids), then a SHUFFLE-FREE
    encode pass — the vocab rides inside the expression as a map literal;
    OOV tokens land in deterministic hash buckets (feature hashing).

    The id sequence is emitted as a comma-joined string (not array<long>):
    external comparators canonicalize by sorting rows over all columns, and
    array cells are unhashable there — a scalar encoding is loss-free and
    comparable."""
    docs = _t(spark, sf_dir, "documents")
    vocab = text.build_vocab(docs, "text", size=_VOCAB_SIZE)
    enc = text.encode_token_ids(docs, "text", "doc_id", vocab, oov_buckets=_OOV_BUCKETS)
    return enc.select(
        "doc_id", "n_tokens",
        F.concat_ws(",", F.col("token_ids")).alias("token_ids_csv"),
    )


@register(
    "training_pack_bins",
    r"""
    WITH t AS (
        SELECT doc_id, source,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, source, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens AS start_offset
        FROM t
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(start_offset AS BIGINT) AS start_offset,
           CAST(start_offset // 2048 AS BIGINT) AS bin_id
    FROM c
    """,
)
def training_pack_bins(spark, sf_dir):
    """Context-window packing for training shards: within each source shard,
    documents fill 2048-token bins in doc_id order (running-offset cumsum ->
    bin = offset div window). Per-key windows parallelize across shards; a
    GLOBAL packing order would serialize, which is why the shard is the
    packing unit at scale."""
    docs = _t(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = docs.select(
        "doc_id", "source", text.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return t.select(
        "doc_id", "source", "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset"),
    ).withColumn("bin_id", F.expr("start_offset div 2048"))


@register(
    "source_quota_sample",
    """
    SELECT doc_id, source, CAST(rk AS INT) AS rk FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#777'), 1, 15) AS BIGINT),
                            doc_id) AS rk
        FROM documents
    ) WHERE rk <= 30
    """,
)
def source_quota_sample(spark, sf_dir):
    """Per-source quota sampling (domain caps in corpus curation): keep at
    most 30 docs per source, chosen by deterministic hash priority so the
    sample is stable under re-runs and incremental arrivals. Per-key window
    top-k — no global sort; heavy domains are bounded by the quota."""
    docs = _t(spark, sf_dir, "documents")
    pr = md5_long(F.col("doc_id").cast("string"), seed=777)
    w = Window.partitionBy("source").orderBy(pr.asc(), F.col("doc_id").asc())
    return (
        docs.select(
            "doc_id", "source", F.row_number().over(w).cast("int").alias("rk")
        )
        .filter(F.col("rk") <= 30)
    )


@register(
    "text_quality",
    rf"""
    WITH q AS (
        SELECT doc_id, text,
               length(text) AS nc,
               length(text) - length(regexp_replace(text, '[!-/:-@\[-`{{-~]', '', 'g')) AS np,
               CASE WHEN trim(lower(text)) = '' THEN CAST(NULL AS BIGINT)
                    ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END AS nt,
               len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                   x -> list_contains(['the','a','an','and','or','of','to','in','is','it'], x))) AS sw
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN nc = 0 THEN 0.0 ELSE np / nc END AS punct_ratio,
           CASE WHEN nt = 0 THEN 0.0 ELSE sw / nt END AS stopword_ratio,
           (least(nc / 500.0, 1.0) * 0.4
            + least((CASE WHEN nt = 0 THEN 0.0 ELSE sw / nt END) * 5.0, 1.0) * 0.4
            + (1.0 - least((CASE WHEN nc = 0 THEN 0.0 ELSE np / nc END) * 4.0, 1.0)) * 0.2
           ) AS quality_score
    FROM q
    """,
)
def text_quality(spark, sf_dir):
    """Quality scoring: punct/stopword ratios + composite heuristic score.
    Raw doubles (identical IEEE expression trees on both engines)."""
    docs = _t(spark, sf_dir, "documents")
    # tokenize once; Catalyst won't CSE the regexp split across expressions
    toked = docs.select("doc_id", "text", text.tokens(F.lower(F.col("text"))).alias("_toks"))
    return toked.select(
        "doc_id",
        text.punct_ratio(F.col("text")).alias("punct_ratio"),
        text.stopword_ratio_from(F.col("_toks")).alias("stopword_ratio"),
        text.quality_score_from(F.col("text"), F.col("_toks")).alias("quality_score"),
    )


@register(
    "text_ngram_freq",
    f"""
    WITH {_SHINGLES_CTE},
    freq AS (SELECT sh, count(*) AS n_docs FROM sh GROUP BY sh)
    SELECT sh AS shingle_hash, n_docs,
           CAST(row_number() OVER (ORDER BY n_docs DESC, sh ASC) AS INT) AS rank
    FROM freq ORDER BY n_docs DESC, sh ASC LIMIT 20
    """,
)
def text_ngram_freq(spark, sf_dir):
    """Corpus n-gram frequency profile: top-20 trigram hashes by document
    frequency (the stop-shingle detector for the Jaccard/MinHash pipelines).
    One explode + one partial-aggregated groupBy + a global top-k."""
    docs = _t(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id", F.explode(dedup.shingle_hashes_arrow(F.col("text"))).alias("sh")
    )
    freq = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("n_docs"))
    # distributed top-k (TakeOrdered — per-partition heads, merged on the
    # driver), NOT a global window, which would sort every group on one
    # partition; the rank window then runs over only 20 rows
    top = freq.orderBy(F.col("n_docs").desc(), F.col("sh").asc()).limit(20)
    w = Window.orderBy(F.col("n_docs").desc(), F.col("sh").asc())
    return top.select(
        F.col("sh").alias("shingle_hash"),
        "n_docs",
        F.row_number().over(w).cast("int").alias("rank"),
    )


@register(
    "event_funnel",
    """
    WITH su AS (SELECT user_id, min(ts) AS t_signup FROM events WHERE event_type = 'signup' GROUP BY user_id),
    cl AS (SELECT e.user_id, min(e.ts) AS t_click
           FROM events e JOIN su ON su.user_id = e.user_id
           WHERE e.event_type = 'click' AND e.ts > su.t_signup GROUP BY e.user_id),
    pu AS (SELECT e.user_id, min(e.ts) AS t_purchase
           FROM events e JOIN cl ON cl.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND e.ts > cl.t_click GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM su) AS n_signup,
           (SELECT count(*) FROM cl) AS n_click_after,
           (SELECT count(*) FROM pu) AS n_purchase_after
    """,
)
def event_funnel(spark, sf_dir):
    """Conversion funnel (signup -> first later click -> first later
    purchase): per-stage min-timestamp joins; every stage aggregates to one
    row per user before joining, so the exchanges carry user ids, not
    events."""
    events = _t(spark, sf_dir, "events")
    su = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("ts").alias("t_signup"))
    )
    cl = (
        events.filter(F.col("event_type") == "click")
        .join(su, "user_id")
        .filter(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id").agg(F.min("ts").alias("t_click"))
    )
    pu = (
        events.filter(F.col("event_type") == "purchase")
        .join(cl, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id").agg(F.min("ts").alias("t_purchase"))
    )
    return (
        su.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(cl.agg(F.count(F.lit(1)).alias("n_click_after")))
        .crossJoin(pu.agg(F.count(F.lit(1)).alias("n_purchase_after")))
    )


def _lang_score_sql(markers: list[str]) -> str:
    lst = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
    return (
        rf"len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),"
        rf" x -> list_contains({lst}, x)))"
    )


def _lang_id_oracle() -> str:
    scores = {lang: _lang_score_sql(m) for lang, m in text.LANG_MARKERS.items()}
    cols = ",\n           ".join(f"{sql} AS s_{lang}" for lang, sql in scores.items())
    langs = sorted(scores)
    greatest = "greatest(" + ", ".join(f"s_{x}" for x in langs) + ")"
    case = f"CASE WHEN {greatest} = 0 THEN 'und' " + " ".join(
        f"WHEN s_{lang} = {greatest} THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
    WITH s AS (
        SELECT doc_id,
           {cols}
        FROM documents
    )
    SELECT doc_id, {case} AS lang_pred FROM s
    """


@register("text_lang_id", _lang_id_oracle())
def text_lang_id(spark, sf_dir):
    """Heuristic language ID via marker-lexicon hits (n-gram/stopword
    method); ties break to the alphabetically-first language."""
    docs = _t(spark, sf_dir, "documents")
    toked = docs.select("doc_id", text.tokens(F.lower(F.col("text"))).alias("_toks"))
    scored = toked.select(
        "doc_id",
        *[
            s.alias(f"_s_{lang}")
            for lang, s in text.lang_scores_from(F.col("_toks")).items()
        ],
    )
    return scored.select(
        "doc_id",
        text.argmax_lang(
            {lang: F.col(f"_s_{lang}") for lang in text.LANG_MARKERS}
        ).alias("lang_pred"),
    )


_COS_SQL = "round(list_cosine_similarity(q.qv::DOUBLE[], c.cv::DOUBLE[]), 6)"


@register(
    "similarity_brute_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
        SELECT q.query_id, c.neighbor_id, {_COS_SQL} AS sim
        FROM c CROSS JOIN q WHERE c.neighbor_id <> q.query_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5
    """,
)
def similarity_brute_topk(spark, sf_dir):
    """Exact cosine top-5 per query vector: broadcast queries over the corpus
    (map-side), window top-k; ties break by neighbor id."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return similarity.brute_force_topk(queries_df, emb, k=5).withColumn(
        "rank", F.col("rank").cast("int")
    )


def _bucket_sql(bits: int, v: str = "{v}") -> str:
    return (
        "("
        + " + ".join(
            f"(CASE WHEN {v}[{j + 1}] > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
            for j in range(bits)
        )
        + ")"
    )


_BUCKET_SQL = _bucket_sql(6)


_LSH_BITS = 12   # 2^12 buckets — the fine-bucket regime (heap probe gen)
_LSH_T = 1024    # margin-ordered probes -> scan fraction T/2^bits = 25%


def _margin_sum_sql(bits: int) -> str:
    """Per-(query, mask) integer margin sum: sum over set bits of
    round(|qv[j]| * 1e6). Same staged expression as Spark's margins array."""
    return " + ".join(
        f"(CASE WHEN (mask >> {j}) & 1 = 1 THEN"
        f" CAST(abs(round(qv[{j + 1}]::DOUBLE * {similarity.QUANT_SCALE})) AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END)"
        for j in range(bits)
    )


@register(
    "similarity_ann_lsh",
    f"""
    WITH q0 AS (SELECT vec_id AS query_id, embedding AS qv,
                       {_bucket_sql(_LSH_BITS, 'embedding')} AS bucket0
                FROM embeddings WHERE vec_id < 10),
    masks AS (SELECT CAST(unnest(range(0, {1 << _LSH_BITS})) AS BIGINT) AS mask),
    qm AS (SELECT query_id, qv, bucket0, mask,
                  {_margin_sum_sql(_LSH_BITS)} AS s
           FROM q0 CROSS JOIN masks),
    pr AS (SELECT query_id, qv, xor(bucket0, mask) AS bucket,
                  row_number() OVER (PARTITION BY query_id ORDER BY s ASC, mask ASC) AS rn
           FROM qm),
    q AS (SELECT query_id, qv, bucket FROM pr WHERE rn <= {_LSH_T}),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
                 {_bucket_sql(_LSH_BITS, 'embedding')} AS bucket
          FROM embeddings),
    scored AS (
        SELECT q.query_id, c.neighbor_id, {_COS_SQL} AS sim
        FROM c JOIN q ON c.bucket = q.bucket WHERE c.neighbor_id <> q.query_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5
    """,
)
def similarity_ann_lsh(spark, sf_dir):
    """Approximate top-5 via sign-bucket LSH with margin-ordered multi-probe
    (Lv et al. 2007): the 1024 bit-flip subsets with the smallest
    (margin-sum, mask) key out of 2^12 buckets, generated per query by the
    HEAP best-first expansion (functions/similarity.py:_heap_probe_masks, an
    Arrow pandas UDF on the 10-row query side — never 2^bits enumeration),
    then a plain bucket equi-join against the corpus (the 100 TB path: the
    corpus is bucketed by the 12-bit key and each probe touches one bucket).
    Scan fraction T/2^bits = 25%; recall@5 ~0.6 on the RANDOM-embedding
    fixture (even exact top-5 neighbors are near-orthogonal there — the
    adversarial case for sign LSH; clustered corpora fare far better;
    tools/recall_report.py). The oracle re-ranks a full range(2^12) mask
    spine — exact same (s, mask) ordering, no heap needed engine-side."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return similarity.lsh_bucketed_topk(
        queries_df, emb, k=5, bits=_LSH_BITS, margin_probes=_LSH_T
    ).withColumn("rank", F.col("rank").cast("int"))


@register(
    "similarity_ann_ivf",
    f"""
    WITH cent AS (SELECT vec_id AS cell_id, embedding AS cv FROM embeddings WHERE vec_id < 8),
    a AS (
        SELECT e.vec_id, e.embedding, c.cell_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv::DOUBLE[]), 6) DESC,
                            c.cell_id ASC) AS rn
        FROM embeddings e CROSS JOIN cent c
    ),
    corpus AS (SELECT vec_id AS neighbor_id, embedding AS cve, cell_id FROM a WHERE rn = 1),
    qa AS (SELECT vec_id AS query_id, embedding AS qv, cell_id FROM a WHERE vec_id < 10 AND rn <= 2),
    scored AS (
        SELECT qa.query_id, corpus.neighbor_id,
               round(list_cosine_similarity(qa.qv::DOUBLE[], corpus.cve::DOUBLE[]), 6) AS sim
        FROM corpus JOIN qa ON corpus.cell_id = qa.cell_id
        WHERE corpus.neighbor_id <> qa.query_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5
    """,
)
def similarity_ann_ivf(spark, sf_dir):
    """IVF approximate top-5: corpus assigned to nearest-centroid cells (one
    broadcast pass, no corpus shuffle), queries probe their 2 nearest cells,
    search runs cell-local. Centroids = a deterministic subset (vec_id < 8)
    so the full path is oracle-checkable; at scale they come from offline
    k-means and the corpus is stored bucketed by cell."""
    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    queries_df = emb.filter(F.col("vec_id") < 10)
    return similarity.ivf_topk(
        queries_df, emb, centroids, k=5, nprobe=2
    ).withColumn("rank", F.col("rank").cast("int"))


@register(
    "dedup_embedding_near",
    f"""
    WITH v AS (SELECT vec_id, embedding, {_BUCKET_SQL.format(v='embedding')} AS bucket
               FROM embeddings),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
        FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, sim FROM pairs WHERE sim >= 0.5
    """,
)
def dedup_embedding_near(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (sim >= 0.5) within sign-buckets
    — the embedding analog of MinHash-LSH blocking."""
    from etl_mssql_to_postgres_dailysync_spark.functions.similarity import sign_bucket
    from etl_mssql_to_postgres_dailysync_spark.functions.vectors import cosine_prenormed, norm

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding",
        norm(F.col("embedding")).alias("nrm"),
        sign_bucket(F.col("embedding"), 6).alias("bucket"),
    )
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"), "bucket",
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"), "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            cosine_prenormed(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")).alias("sim"),
        )
        .filter(F.col("sim") >= 0.5)
    )


@register(
    "embedding_norms",
    """
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) AS l2_norm,
           round(list_sum(embedding::DOUBLE[]), 6) AS comp_sum
    FROM embeddings
    """,
)
def embedding_norms(spark, sf_dir):
    """Vector math stays JVM-side (ordered folds over array<float> — no
    Python round-trip): L2 norm + component sum per embedding."""
    from etl_mssql_to_postgres_dailysync_spark.functions import vectors

    emb = _t(spark, sf_dir, "embeddings")
    comp_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.round(vectors.norm(F.col("embedding")), 6).alias("l2_norm"),
        F.round(comp_sum, 6).alias("comp_sum"),
    )


@register(
    "array_functions",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS n_dims,
           array_to_string(list_transform(embedding[1:3]::DOUBLE[],
                           x -> CAST(CAST(round(x * 1000000) AS BIGINT) AS VARCHAR)), '|') AS head3,
           CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS INT) AS n_pos,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val
    FROM embeddings
    """,
)
def array_functions(spark, sf_dir):
    """Array/higher-order function surface over array<float>: size, slice +
    per-element transform, predicate filter, max — all JVM-side, no UDFs."""
    emb = _t(spark, sf_dir, "embeddings")
    d = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").cast("int").alias("n_dims"),
        # serialized as integer micro-units: array-typed outputs break
        # pandas-based comparators, and double->string diverges cross-engine
        # (Spark uses scientific notation below 1e-3)
        F.concat_ws(
            "|",
            F.transform(F.slice(d, 1, 3), lambda x: F.round(x * 1_000_000).cast("bigint").cast("string")),
        ).alias("head3"),
        F.size(F.filter(d, lambda x: x > 0)).cast("int").alias("n_pos"),
        F.round(F.array_max(d), 6).alias("max_val"),
    )


@register(
    "agg_distinct_scalable",
    """
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT event_type, count(*) AS n_users FROM d GROUP BY event_type
    """,
)
def agg_distinct_scalable(spark, sf_dir):
    """The 100 TB exact-distinct pattern: two-stage aggregation (dedupe on
    (group, key) first — partial map-side — then count). Unlike a direct
    count(DISTINCT x), no single reducer ever holds a group's full value set;
    skewed groups spread over the cluster in stage 1."""
    events = _t(spark, sf_dir, "events")
    deduped = events.select("event_type", "user_id").distinct()
    return deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "dedup_keep_representatives",
    f"""
    WITH h AS (
        SELECT doc_id, {_HASH15.format(x=_NORM_SQL)} AS content_hash
        FROM documents
    ),
    keep AS (SELECT min(doc_id) AS keep_id FROM h GROUP BY content_hash)
    SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars
    FROM documents d JOIN keep ON d.doc_id = keep.keep_id
    """,
)
def dedup_keep_representatives(spark, sf_dir):
    """The dedup pipeline's OUTPUT stage: the corpus reduced to one
    representative per content group (semi join against the keep set — only
    (hash, id) pairs shuffle, then ids)."""
    docs = _t(spark, sf_dir, "documents")
    keep = dedup.exact_dedup(docs, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    return docs.join(keep, "doc_id", "left_semi").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )


def _quality_pipeline_oracle() -> str:
    lang_case = _lang_id_oracle().split("SELECT doc_id,")[-1].split("AS lang_pred")[0]
    return f"""
    WITH s AS (
        SELECT doc_id, text,
           {", ".join(f"{_lang_score_sql(m)} AS s_{lang}" for lang, m in text.LANG_MARKERS.items())}
        FROM documents
    ),
    lid AS (SELECT doc_id, {lang_case} AS lang_pred FROM s),
    q AS (
        SELECT d.doc_id,
               length(d.text) AS nc,
               length(d.text) - length(regexp_replace(d.text, '[!-/:-@\\[-`{{-~]', '', 'g')) AS np,
               CASE WHEN trim(lower(d.text)) = '' THEN CAST(NULL AS BIGINT)
                    ELSE len(regexp_split_to_array(trim(lower(d.text)), '\\s+')) END AS nt,
               len(list_filter(regexp_split_to_array(trim(lower(d.text)), '\\s+'),
                   x -> list_contains(['the','a','an','and','or','of','to','in','is','it'], x))) AS sw
        FROM documents d
    ),
    scored AS (
        SELECT doc_id,
               (least(nc / 500.0, 1.0) * 0.4
                + least((CASE WHEN nt = 0 THEN 0.0 ELSE sw / nt END) * 5.0, 1.0) * 0.4
                + (1.0 - least((CASE WHEN nc = 0 THEN 0.0 ELSE np / nc END) * 4.0, 1.0)) * 0.2
               ) AS quality
        FROM q
    ),
    h AS (SELECT doc_id, {_HASH15.format(x=_NORM_SQL)} AS content_hash FROM documents),
    keep AS (SELECT min(doc_id) AS keep_id FROM h GROUP BY content_hash)
    SELECT d.doc_id, lid.lang_pred, scored.quality
    FROM documents d
    JOIN lid ON lid.doc_id = d.doc_id
    JOIN scored ON scored.doc_id = d.doc_id
    JOIN keep ON keep.keep_id = d.doc_id
    WHERE lid.lang_pred = 'en' AND scored.quality >= 0.5
    """


@register("quality_filter_pipeline", _quality_pipeline_oracle())
def quality_filter_pipeline(spark, sf_dir):
    """The composed training-data curation pipeline: language filter (en) +
    quality threshold + exact dedup, in ONE pass over the corpus and ONE
    partial-aggregable exchange: each doc's (score, lang, content-hash)
    computes map-side, then ``min(struct(doc_id, lang, quality))`` per hash
    carries the representative's WHOLE row through the dedup aggregation —
    no second scan of the table and no join back (the previous groupBy +
    left-semi shape cost both; min-struct ordering is doc_id-first, so the
    representative is exactly exact_dedup's min(doc_id))."""
    docs = _t(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", "text", text.tokens(F.lower(F.col("text"))).alias("_toks")
    )
    marks = toked.select(
        "doc_id",
        "text",
        text.quality_score_from(F.col("text"), F.col("_toks")).alias("quality"),
        *[
            s.alias(f"_s_{lang}")
            for lang, s in text.lang_scores_from(F.col("_toks")).items()
        ],
    )
    scored = marks.select(
        "doc_id",
        text.argmax_lang(
            {lang: F.col(f"_s_{lang}") for lang in text.LANG_MARKERS}
        ).alias("lang_pred"),
        "quality",
        md5_long(text.normalize(F.col("text"))).alias("_h"),
    )
    rep = (
        scored.groupBy("_h")
        .agg(F.min(F.struct("doc_id", "lang_pred", "quality")).alias("r"))
        .select("r.doc_id", "r.lang_pred", "r.quality")
    )
    return rep.filter((F.col("lang_pred") == "en") & (F.col("quality") >= 0.5))


# ---------------------------------------------------------------------------
# Streaming-semantics operators, batch-checkable (SURVEY.md §2.7)
# ---------------------------------------------------------------------------

@register(
    "event_window_agg",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_value_cents
    FROM events GROUP BY 1, 2
    """,
)
def event_window_agg(spark, sf_dir):
    """Tumbling 1-hour event-time aggregation (the streaming windowed-agg
    operator run on a batch frame); money summed exactly in cents."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_value_cents"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value_cents",
        )
    )


@register(
    "hypertable_rollup",
    """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, event_type,
               count(*) AS n, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    )
    SELECT CAST(CAST(date_trunc('day', h) AS DATE) AS VARCHAR) AS day, event_type,
           CAST(sum(n) AS BIGINT) AS n_events, CAST(sum(cents) AS BIGINT) AS total_cents
    FROM hourly GROUP BY 1, 2
    """,
)
def hypertable_rollup(spark, sf_dir):
    """Hypertable-style continuous aggregate: the DAILY rollup is derived by
    RE-AGGREGATING the hourly rollup (sums of sums), never re-scanning raw
    events — the tiered-materialization pattern where each resolution is
    ~1/1000th the size of the tier below. Exact integer cents make every
    tier losslessly re-aggregatable."""
    events = _t(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    # at scale `hourly` is a materialized table; the daily tier reads IT
    return hourly.groupBy(
        F.to_date(F.date_trunc("day", "h")).cast("string").alias("day"), "event_type"
    ).agg(F.sum("n").alias("n_events"), F.sum("cents").alias("total_cents"))


_KMV_K = 64
# 52-bit hash space (13 hex chars): (k-1) * 2^52 stays well inside int64
_KMV_HASH = "CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13) AS BIGINT)"


@register(
    "kmv_distinct_sketch",
    f"""
    WITH h AS (SELECT DISTINCT event_type, {_KMV_HASH} AS h FROM events),
    r AS (SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rn
          FROM h),
    kth AS (SELECT event_type, max(h) AS kth, count(*) AS n_kept
            FROM r WHERE rn <= {_KMV_K} GROUP BY event_type)
    SELECT event_type,
           CASE WHEN n_kept < {_KMV_K} THEN n_kept
                ELSE ({_KMV_K} - 1) * (CAST(1 AS BIGINT) << 52) // kth END AS est_distinct
    FROM kth
    """,
)
def kmv_distinct_sketch(spark, sf_dir):
    """KMV (k-minimum-values) distinct-count sketch: keep the k smallest
    52-bit hashes per group; estimate = (k-1) * 2^52 / kth_min. A mergeable
    sketch like HLL, but built from engine-portable md5 + integer arithmetic
    so the ORACLE CHECKS THE SKETCH ITSELF — under k distinct values it is
    exact by construction."""
    events = _t(spark, sf_dir, "events")
    h = events.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 13), 16, 10)
        .cast("bigint")
        .alias("h"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy(F.col("h").asc())
    kth = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("event_type")
        .agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("n_kept"))
    )
    return kth.select(
        "event_type",
        F.when(F.col("n_kept") < _KMV_K, F.col("n_kept"))
        .otherwise(F.expr(f"({_KMV_K} - 1) * (CAST(1 AS BIGINT) << 52) div kth"))
        .alias("est_distinct"),
    )


@register(
    "sessionize",
    """
    WITH l AS (
        SELECT user_id, ts, event_id,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ),
    f AS (
        SELECT *, CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        FROM l
    ),
    s AS (
        SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM f
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def sessionize(spark, sf_dir):
    """Sessionization (30-min inactivity gap) via gaps-and-islands windows —
    the batch twin of streaming ``session_window``."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id", "ts", "event_id", F.lag("ts").over(w).alias("prev")
    ).withColumn(
        "new_s",
        F.when(
            F.col("prev").isNull()
            | (F.col("ts") - F.col("prev") > F.expr("INTERVAL 30 MINUTES")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ).drop("sid")


# ---------------------------------------------------------------------------
# Multimodal column plumbing (binary payloads + Pandas-UDF decode)
# ---------------------------------------------------------------------------

@register(
    "multimodal_meta",
    """
    WITH m AS (
        SELECT doc_id AS media_id,
               list_extract(['image', 'audio', 'video'], CAST(doc_id % 3 + 1 AS INTEGER)) AS media_type,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    )
    SELECT media_id, media_type, CAST(n_bytes AS BIGINT) AS n_bytes,
           CASE WHEN media_type IN ('image', 'video') THEN CAST(n_bytes % 64 + 1 AS INTEGER) END AS width,
           CASE WHEN media_type IN ('image', 'video') THEN CAST(n_bytes % 48 + 1 AS INTEGER) END AS height,
           CASE WHEN media_type = 'image' THEN 1
                WHEN media_type = 'video' THEN CAST(n_bytes % 30 + 1 AS INTEGER) END AS n_frames,
           CASE WHEN media_type = 'audio' THEN CAST(8000 + (n_bytes % 8) * 1000 AS INTEGER) END AS sample_rate
    FROM m
    """,
)
def multimodal_meta(spark, sf_dir):
    """Multimodal metadata decode: binary payload column -> typed metadata via
    Arrow-batched mapInPandas (decode kernel is a deterministic stub; the
    Spark-side plumbing — schema, batching, no-shuffle — is real)."""
    docs = _t(spark, sf_dir, "documents")
    media = multimodal.attach_fake_payload(docs, "doc_id", "text")
    return multimodal.decode_metadata(media).drop("payload")


@register(
    "multimodal_frames",
    """
    WITH m AS (
        SELECT doc_id AS media_id,
               list_extract(['image', 'audio', 'video'], CAST(doc_id % 3 + 1 AS INTEGER)) AS media_type,
               text
        FROM documents
    ),
    v AS (SELECT media_id, text, octet_length(encode(text)) AS n FROM m WHERE media_type = 'video'),
    f AS (SELECT media_id, text,
                 unnest(range(0, least(8, greatest(1, n // 64)))) AS frame_index
          FROM v)
    -- testdata text is pure ASCII (byte length == char length, verified), so
    -- char slicing == byte slicing of the payload; frames are compared by
    -- md5 digest (binary columns don't survive the pandas-based comparator)
    SELECT media_id, CAST(frame_index AS INT) AS frame_index,
           md5(text[(CAST(frame_index AS INT) * 64 + 1):(CAST(frame_index AS INT) * 64 + 64)]) AS frame_md5,
           CAST(octet_length(encode(text[(CAST(frame_index AS INT) * 64 + 1):(CAST(frame_index AS INT) * 64 + 64)])) AS INT) AS frame_len
    FROM f
    """,
)
def multimodal_frames(spark, sf_dir):
    """Video frame sampling: one row per fixed-stride chunk of the payload
    (stub for codec-based frame extraction), emitted per Arrow batch with no
    shuffle; output partitioning inherits the input's. Frames reported as
    (md5, length) digests for cross-engine comparison."""
    docs = _t(spark, sf_dir, "documents")
    media = multimodal.attach_fake_payload(docs, "doc_id", "text")
    frames = multimodal.sample_frames(media)
    return frames.select(
        "media_id",
        "frame_index",
        F.md5("frame_bytes").alias("frame_md5"),
        F.length("frame_bytes").cast("int").alias("frame_len"),
    )


# ---------------------------------------------------------------------------
# General analytics (aggregation / window / join coverage at scale)
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_centipct,
           count(*) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary with exact integer money arithmetic
    (cents / cent-percent units): shuffle-safe, engine-portable, and faster
    than decimal at scale."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.sum(cents).alias("sum_base_cents"),
        F.sum(cents * (100 - disc_pct)).alias("sum_disc_centipct"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "topk_per_group",
    """
    WITH ranked AS (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
        FROM orders
    )
    SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
    """,
)
def topk_per_group(spark, sf_dir):
    """Top-3 orders by price per priority class (window top-k)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_orderpriority", "o_orderkey", "o_totalprice",
            F.row_number().over(w).cast("int").alias("rank"),
        )
        .filter(F.col("rank") <= 3)
    )


@register(
    "revenue_by_nation",
    """
    SELECT n.n_name, count(*) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def revenue_by_nation(spark, sf_dir):
    """Fact-dim star join: orders x customer x nation; the nation (and at
    scale, customer) side broadcasts — no shuffle of the fact table."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("revenue_cents"),
        )
    )


@register(
    "asof_join",
    """
    SELECT l.event_id, l.user_id, l.ts, r.ts AS asof_ts, r.value AS asof_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_join_query(spark, sf_dir):
    """As-of join (point-in-time lookup): each click joined to the user's
    most recent purchase at-or-before it. Spark has no ASOF JOIN; the engine
    operator (operators/joins.py) uses union + ordered window — ONE shuffle
    of |L|+|R| rows, no range-join explosion. Oracle: DuckDB's native
    ASOF LEFT JOIN."""
    from etl_mssql_to_postgres_dailysync_spark.operators.joins import asof_join

    events = _t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = events.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    out = asof_join(clicks, purchases, ["user_id"], value_cols=["ts", "value"])
    return out.select(
        "event_id", "user_id", "ts",
        F.col("asof_ts"), F.col("asof_value"),
    )


@register(
    "range_join_incidents",
    """
    SELECT p.event_id, i.event_id AS incident_id
    FROM (SELECT event_id, ts FROM events WHERE event_type <> 'error') p
    JOIN (SELECT event_id, ts AS istart, ts + INTERVAL 30 MINUTE AS iend
          FROM events WHERE event_type = 'error') i
      ON p.ts >= i.istart AND p.ts < i.iend
    """,
)
def range_join_incidents(spark, sf_dir):
    """Range/interval join: every event inside any error-incident window
    [error_ts, error_ts + 30min). The engine operator bins intervals to
    fixed-width buckets and equi-joins on bucket — O(matches), not the
    O(|points| x |intervals|) nested loop Spark would plan for the raw theta
    join. Oracle: DuckDB's native interval theta join."""
    from etl_mssql_to_postgres_dailysync_spark.operators.joins import range_join

    events = _t(spark, sf_dir, "events")
    points = events.filter(F.col("event_type") != "error").select("event_id", "ts")
    incidents = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("istart"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("iend"),
    )
    out = range_join(
        points, incidents,
        point_ts="ts", start_ts="istart", end_ts="iend", bucket_seconds=1800,
    )
    return out.select("event_id", "incident_id")


@register(
    "shipping_priority",
    f"""
    SELECT o.o_orderkey,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_centipct,
           CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS orderdate,
           o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '{RUN_DATE}'
      AND CAST(l.l_shipdate AS DATE) > DATE '{RUN_DATE}'
    GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    ORDER BY revenue_centipct DESC, o.o_orderkey ASC LIMIT 10
    """,
)
def shipping_priority(spark, sf_dir):
    """TPC-H Q3-style: selective fact-fact join + top-10 by aggregated
    revenue. Filters reach both parquet scans (pushdown); customer is the
    broadcast side; exact integer money arithmetic for oracle parity."""
    customer = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.to_date("o_orderdate") < F.lit(RUN_DATE))
    lineitem = _t(spark, sf_dir, "lineitem").filter(F.to_date("l_shipdate") > F.lit(RUN_DATE))
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("od"), "o_orderpriority")
        .agg(F.sum(cents * (100 - disc)).alias("revenue_centipct"))
        .select(
            "o_orderkey", "revenue_centipct",
            F.col("od").cast("string").alias("orderdate"), "o_orderpriority",
        )
        .orderBy(F.col("revenue_centipct").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@register(
    "local_supplier_volume",
    """
    SELECT n.n_name,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_centipct
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def local_supplier_volume(spark, sf_dir):
    """TPC-H Q5-style 6-way join: all dimension sides broadcast; the only
    shuffles are the lineitem⋈orders key exchange and the final agg."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (supplier.s_nationkey == customer.c_nationkey),
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(cents * (100 - disc)).alias("revenue_centipct"))
    )


@register(
    "promo_revenue",
    """
    SELECT CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                         THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                              * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                         ELSE 0 END) AS BIGINT) AS promo_centipct,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS total_centipct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def promo_revenue(spark, sf_dir):
    """TPC-H Q14-style conditional aggregation over a fact⋈dim join (part
    broadcasts; one shuffle-free map-side join + scalar agg)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    rev = cents * (100 - disc)
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0))).alias(
                "promo_centipct"
            ),
            F.sum(rev).alias("total_centipct"),
        )
    )


@register(
    "customers_without_orders",
    """
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND CAST(o.o_orderdate AS DATE) >= DATE '1995-03-01'
                        AND CAST(o.o_orderdate AS DATE) < DATE '1995-04-01')
    """,
)
def customers_without_orders(spark, sf_dir):
    """Anti join (TPC-H Q22 flavor): customers with no orders in a month.
    The date filter pushes into the orders scan; only its key column
    shuffles."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1995-03-01"))
        & (F.to_date("o_orderdate") < F.lit("1995-04-01"))
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


@register(
    "suppliers_with_returns",
    """
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_returnflag = 'R')
    """,
)
def suppliers_with_returns(spark, sf_dir):
    """Semi join: suppliers having at least one returned lineitem. The
    existence probe never materializes the matching rows."""
    supplier = _t(spark, sf_dir, "supplier")
    lineitem = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return supplier.join(
        lineitem, supplier.s_suppkey == lineitem.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@register(
    "rollup_revenue",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderpriority,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           count(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (CAST(year(o_orderdate) AS INT), o_orderpriority)
    """,
)
def rollup_revenue(spark, sf_dir):
    """Hierarchical aggregation (ROLLUP year -> priority -> grand total) —
    grouping-sets coverage; partial aggregation keeps one shuffle."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .rollup("order_year", "o_orderpriority")
        .agg(F.sum("cents").alias("revenue_cents"), F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "set_operations",
    """
    WITH a AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0),
         b AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0)
    SELECT (SELECT count(*) FROM (SELECT o_orderkey FROM a UNION SELECT o_orderkey FROM b)) AS n_union,
           (SELECT count(*) FROM (SELECT o_orderkey FROM a INTERSECT SELECT o_orderkey FROM b)) AS n_intersect,
           (SELECT count(*) FROM (SELECT o_orderkey FROM a EXCEPT SELECT o_orderkey FROM b)) AS n_except,
           (SELECT count(*) FROM (SELECT o_orderkey FROM a UNION ALL SELECT o_orderkey FROM b)) AS n_union_all
    """,
)
def set_operations(spark, sf_dir):
    """Set operations (§2.5): union/intersect/except distinct + union all —
    each a hash-partitioned distinct under the hood except union-all (which
    is a zero-shuffle concatenation of partitions)."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey")
    a = orders.filter(F.col("o_orderkey") % 3 == 0)
    b = orders.filter(F.col("o_orderkey") % 2 == 0)
    return (
        a.union(b).distinct().agg(F.count(F.lit(1)).alias("n_union"))
        .crossJoin(a.intersect(b).agg(F.count(F.lit(1)).alias("n_intersect")))
        .crossJoin(a.exceptAll(b).distinct().agg(F.count(F.lit(1)).alias("n_except")))
        .crossJoin(a.union(b).agg(F.count(F.lit(1)).alias("n_union_all")))
    )


@register(
    "string_functions",
    """
    SELECT doc_id,
           upper(lang) AS lang_upper,
           trim(concat('  ', lang, '  ')) AS trimmed,
           substr(source, 1, 3) AS src3,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
           levenshtein(lang, 'en') AS lev_en,
           CAST(length(source) AS INT) AS src_len,
           replace(source, '-', '_') AS src_snake
    FROM documents
    """,
)
def string_functions(spark, sf_dir):
    """String function surface (C8 generalized): case, trim, substring, pad,
    edit distance, replace — all whole-stage-codegen'd expressions."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper("lang").alias("lang_upper"),
        F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit("  "))).alias("trimmed"),
        F.substring("source", 1, 3).alias("src3"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.levenshtein("lang", F.lit("en")).alias("lev_en"),
        F.length("source").cast("int").alias("src_len"),
        F.replace(F.col("source"), F.lit("-"), F.lit("_")).alias("src_snake"),
    )


@register(
    "datetime_functions",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow_sunday1,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)::VARCHAR AS due_date,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_95
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def datetime_functions(spark, sf_dir):
    """Date/time function surface: extraction, truncation, arithmetic.
    Cross-engine conventions normalized explicitly: Spark dayofweek is
    1=Sunday while DuckDB's is 0=Sunday (+1), and datediff argument order
    is (end, start) in Spark vs (unit, start, end) in DuckDB."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.dayofweek("o_orderdate").cast("int").alias("dow_sunday1"),
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("month_start"),
        F.date_add(F.to_date("o_orderdate"), 30).cast("string").alias("due_date"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_95"),
    )


@register(
    "cube_revenue",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderstatus,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           count(*) AS n_orders
    FROM orders
    GROUP BY CUBE (CAST(year(o_orderdate) AS INT), o_orderstatus)
    """,
)
def cube_revenue(spark, sf_dir):
    """CUBE aggregation (all grouping-set combinations of year x status) —
    one pass, partial-aggregated like any groupBy."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .cube("order_year", "o_orderstatus")
        .agg(F.sum("cents").alias("revenue_cents"), F.count(F.lit(1)).alias("n_orders"))
    )


_PIVOT_STATUSES = ["F", "O", "P"]


@register(
    "pivot_orders",
    f"""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           {", ".join(
               f"count(*) FILTER (WHERE o_orderstatus = '{s}') AS n_{s}" for s in _PIVOT_STATUSES
           )}
    FROM orders GROUP BY 1
    """,
)
def pivot_orders(spark, sf_dir):
    """Pivot: order counts by year with one column per status. Explicit pivot
    values keep it a single pass (no distinct-values pre-scan)."""
    orders = _t(spark, sf_dir, "orders")
    out = (
        orders.select(
            F.year("o_orderdate").cast("int").alias("order_year"), "o_orderstatus"
        )
        .groupBy("order_year")
        .pivot("o_orderstatus", _PIVOT_STATUSES)
        .agg(F.count(F.lit(1)))
    )
    renamed = out.select(
        "order_year", *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in _PIVOT_STATUSES]
    )
    return renamed


@register(
    "unpivot_orders",
    f"""
    WITH p AS (
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
               {", ".join(
                   f"count(*) FILTER (WHERE o_orderstatus = '{s}') AS n_{s}" for s in _PIVOT_STATUSES
               )}
        FROM orders GROUP BY 1
    )
    SELECT order_year, status, n FROM p
    UNPIVOT (n FOR status IN (n_F AS 'F', n_O AS 'O', n_P AS 'P'))
    """,
)
def unpivot_orders(spark, sf_dir):
    """Unpivot/melt: the wide per-status counts back to long form —
    map-side only, no shuffle beyond the upstream aggregate."""
    wide = pivot_orders(spark, sf_dir)
    return wide.unpivot(
        "order_year",
        [f"n_{s}" for s in _PIVOT_STATUSES],
        "status_col",
        "n",
    ).select(
        "order_year",
        F.substring("status_col", 3, 1).alias("status"),
        "n",
    )


@register(
    "percentiles",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders GROUP BY o_orderpriority
    """,
)
def percentiles(spark, sf_dir):
    """Exact continuous percentiles per group (both engines use linear
    interpolation; rounded to 4 dp). At 100 TB swap to approx_percentile
    (t-digest-style sketch) — kept exact here for oracle parity."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


@register(
    "running_total",
    """
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
    FROM orders WHERE o_custkey % 100 = 0
    """,
)
def running_total(spark, sf_dir):
    """Cumulative revenue per customer over order time (running-total window;
    deterministic tie-break on o_orderkey)."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(w).alias("running_cents"),
    )


@register(
    "global_running_revenue",
    """
    SELECT o_orderkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                OVER (ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
    FROM orders
    """,
)
def global_running_revenue(spark, sf_dir):
    """GLOBAL running revenue over every order — the serialization trap a
    naive sum() OVER (ORDER BY ...) hits at scale (Spark: one-partition
    window). Runs as operators/cumsum.global_cumsum: range repartition ->
    parallel per-partition prefix sums -> tiny per-partition totals collect
    -> broadcast offset add. (o_orderdate, o_orderkey) is a total order, so
    the result is boundary-independent and exactly matches the oracle's
    global window."""
    from etl_mssql_to_postgres_dailysync_spark.operators.cumsum import global_cumsum

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    out = global_cumsum(
        orders, ["o_orderdate", "o_orderkey"], "cents", "running_cents"
    )
    return out.select("o_orderkey", F.col("running_cents").cast("long").alias("running_cents"))


@register(
    "window_functions",
    """
    SELECT o_custkey, o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT)
             - lag(CAST(round(o_totalprice * 100) AS BIGINT))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS delta_cents,
           CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS quartile,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving_cents
    FROM orders WHERE o_custkey % 50 = 0
    """,
)
def window_functions(spark, sf_dir):
    """Window-function breadth on one shuffle: lag delta, ntile quartiles,
    and a 3-row moving sum share a single (partition, order) exchange."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (cents - F.lag(cents).over(w)).alias("delta_cents"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.sum(cents).over(w.rowsBetween(-2, 0)).alias("moving_cents"),
    )


@register(
    "approx_distinct_users",
    """
    SELECT event_type, count(DISTINCT user_id) AS exact_users,
           count(*) AS n_events, 1 AS approx_within_5pct
    FROM events GROUP BY event_type
    """,
)
def approx_distinct_users(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) — the 100 TB replacement for
    exact distinct counts (fixed-size sketch per group, mergeable across
    partitions). HLL internals are engine-specific, so the oracle checks the
    CONTRACT: the estimate must land within 5% of the exact count (rsd=0.02
    gives ~2 sigma headroom), emitted as a boolean the oracle expects TRUE —
    the same pattern as approx_percentile_bounds."""
    events = _t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.02)
                - F.count_distinct("user_id")
            )
            <= F.greatest(F.count_distinct("user_id") * 0.05, F.lit(1.0))
        )
        .cast("int")
        .alias("approx_within_5pct"),
    )


@register(
    "agg_distinct_users",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def agg_distinct_users(spark, sf_dir):
    """Distinct aggregation (exact); at 100 TB swap to approx_count_distinct
    (HLL) — kept exact here for oracle parity."""
    events = _t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# TPC-H-flavor optimizer workouts: subquery shapes (EXISTS / NOT EXISTS /
# IN / NOT IN / scalar-correlated) re-expressed as Spark join strategies
# ---------------------------------------------------------------------------

@register(
    "order_priority_count",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-07-01' AND DATE '1995-09-30'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60)
    GROUP BY o_orderpriority
    """,
)
def order_priority_count(spark, sf_dir):
    """TPC-H Q4 flavor — correlated EXISTS as a LEFT SEMI join. Catalyst
    splits the condition: the equi part (l_orderkey = o_orderkey) drives the
    hash join, the non-equi ship-lag part is applied as a join residual, so
    no theta-join blowup. The date range on orders is sargable and pushed to
    the scan; lineitem is column-pruned to 2 columns."""
    orders = _t(spark, sf_dir, "orders").filter(
        filters.date_range_partition("o_orderdate", "1995-07-01", "1995-09-30")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "customer_order_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
               ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 flavor — order-count distribution. Instead of the naive
    outer-join-then-count (joins every order row before aggregating), orders
    are pre-aggregated per customer FIRST (map-side partial agg shrinks the
    shuffle to one row per customer), then outer-joined to customer and
    null-filled — at 100 TB this turns a fact-sized shuffle into a dim-sized
    one."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    counts = cust.join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left_outer").select(
        F.coalesce(F.col("n_orders"), F.lit(0).cast("long")).alias("c_count")
    )
    return counts.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "small_quantity_revenue",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 flavor — scalar correlated subquery (per-part average) as a
    broadcast self-join: aggregate the brand-filtered fact once per part,
    broadcast the tiny per-part threshold table back onto the same fact.
    Parity note: quantities are whole-number doubles, so avg = exact-sum /
    count is IEEE-deterministic across engines; money compared in integer
    cents."""
    part_b = (
        _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    brand_items = li.join(F.broadcast(part_b), F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresholds = brand_items.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thr")
    )
    return (
        brand_items.join(F.broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "large_volume_customers",
    """
    SELECT c_custkey, c_name, o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
           CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
           sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(CAST(l_quantity AS BIGINT)) > 250) big
         ON o_orderkey = l_orderkey
    """,
)
def large_volume_customers(spark, sf_dir):
    """TPC-H Q18 flavor — IN (GROUP BY … HAVING) as aggregate-then-join. The
    heavy fact aggregation happens once with map-side combine; the HAVING
    filter shrinks it to a handful of keys, so the joins back to orders and
    customer are broadcast-able (AQE converts them at runtime)."""
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").cast("string").alias("order_date"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("total_cents"),
            "sum_qty",
        )
    )


@register(
    "global_sales_opportunity",
    """
    WITH bal AS (SELECT c_custkey, c_name, c_acctbal,
                        CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
                 FROM customer),
         avg_bal AS (SELECT avg(bal_cents) AS ab FROM bal WHERE c_acctbal > 0)
    SELECT right(c_name, 2) AS cseg,
           count(*) AS numcust,
           CAST(sum(bal_cents) AS BIGINT) AS totacctbal_cents
    FROM bal, avg_bal
    WHERE bal_cents > ab
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND CAST(o_orderdate AS DATE)
                            BETWEEN DATE '1995-01-01' AND DATE '1995-12-31')
    GROUP BY cseg
    """,
)
def global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 flavor — uncorrelated scalar subquery (global average
    balance) as a 1-row broadcast cross join, NOT EXISTS as a LEFT ANTI join
    against the date-pruned orders scan. Averaging integer cents (not raw
    doubles) keeps the threshold bit-identical across engines."""
    cust = _t(spark, sf_dir, "customer").withColumn(
        "bal_cents", F.round(F.col("c_acctbal") * 100).cast("bigint")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("bal_cents").alias("ab"))
    orders95 = (
        _t(spark, sf_dir, "orders")
        .filter(filters.date_range_partition("o_orderdate", "1995-01-01", "1995-12-31"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("bal_cents") > F.col("ab"))
        .join(orders95, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.expr("right(c_name, 2)").alias("cseg"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal_cents").cast("bigint").alias("totacctbal_cents"),
        )
    )


@register(
    "top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS total_rev
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_rev AS BIGINT) AS total_revenue_centipct
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    """,
)
def top_supplier(spark, sf_dir):
    """TPC-H Q15 flavor — scalar MAX subquery over a derived view. The
    revenue aggregation runs ONCE; its 1-row max is broadcast back (argmax
    without a global sort), and the supplier dim joins broadcast. Revenue in
    integer centi-percent units so max/equality are exact."""
    li = _t(spark, sf_dir, "lineitem").filter(
        filters.date_range_partition("l_shipdate", "1996-01-01", "1996-03-31")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
        )
        .cast("bigint")
        .alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", F.col("total_rev").alias("total_revenue_centipct"))
    )


@register(
    "supplier_part_variety",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'PROMO%' AND p_size IN (1, 4, 7)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def supplier_part_variety(spark, sf_dir):
    """TPC-H Q16 flavor — NOT IN rewritten as LEFT ANTI (sound because
    s_suppkey is non-null; a nullable NOT IN needs null-aware anti join,
    which Catalyst plans from the SQL form automatically). Both the excluded
    suppliers and the filtered part dim are broadcast, so the only shuffle
    is the final distinct-count aggregation."""
    bad_supp = (
        _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    parts = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#45")
            & (~F.col("p_type").like("PROMO%"))
            & (F.col("p_size").isin(1, 4, 7))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "waiting_supplier_orders",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND CAST(l1.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 30
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND CAST(l3.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 30)
    GROUP BY s_name
    """,
)
def waiting_supplier_orders(spark, sf_dir):
    """TPC-H Q21 flavor — the classic double-correlated EXISTS / NOT EXISTS
    pair re-expressed as ONE per-order aggregate: an order qualifies for a
    late lineitem iff it has >=2 distinct suppliers and exactly 1 distinct
    LATE supplier. Two correlated-subquery rescans of the fact collapse into
    a single groupBy over the already-joined rows — one fact shuffle total,
    instead of three in the naive plan."""
    orders_f = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lo = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "is_late",
            F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 30),
        )
    )
    # collapse to (order, supplier) FIRST: every downstream consumer derives
    # from this one aggregation, so its shuffle exchange is reused (the fact
    # join runs once), and the join-back operates on the collapsed relation,
    # not raw lineitems
    per_os = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(F.col("is_late").cast("long")).alias("n_late_rows")
    )
    per_order = per_os.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.count_if(F.col("n_late_rows") > 0).alias("n_late_supp"),
    )
    qualifying = per_os.filter(F.col("n_late_rows") > 0).join(
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)),
        F.col("l_orderkey") == F.col("po_orderkey"),
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        qualifying.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").cast("bigint").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# CountMin frequency sketch (functions/sketches.py)
# ---------------------------------------------------------------------------

# probe coordinates under the same single-digest 12-bit-slice scheme as
# sketches.cms_hash_pairs / cms_oracle_pairs_sql
_CMS_PROBE_COORDS = " UNION ALL ".join(
    f"SELECT user_id, exact_cnt, {s} AS seed, "
    f"CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), {1 + 3 * s}, 3) AS BIGINT)"
    f" % {sketches.CMS_WIDTH} AS bucket FROM probes"
    for s in range(sketches.CMS_DEPTH)
)

@register(
    "cms_frequency_sketch",
    f"""
    WITH pairs AS ({sketches.cms_oracle_pairs_sql("events", "CAST(user_id AS VARCHAR)")}),
    sketch AS (SELECT seed, bucket, count(*) AS counter FROM pairs GROUP BY 1, 2),
    probes AS (SELECT user_id, count(*) AS exact_cnt FROM events GROUP BY 1
               ORDER BY exact_cnt DESC, user_id ASC LIMIT 10),
    coords AS ({_CMS_PROBE_COORDS}),
    est AS (SELECT user_id, exact_cnt, CAST(min(coalesce(counter, 0)) AS BIGINT) AS cms_est
            FROM coords LEFT JOIN sketch USING (seed, bucket) GROUP BY 1, 2)
    SELECT user_id, exact_cnt, cms_est FROM est
    """,
)
def cms_frequency_sketch(spark, sf_dir):
    """CountMin frequency sketch over event user_ids, probed at the exact
    top-10 heavy hitters.  The oracle recomputes the SKETCH ITSELF (same md5
    bucket functions, integer counters) — so this checks the full pipeline:
    build (one scan, d*w-bounded shuffle), broadcast estimate, and the
    CMS >= exact overestimate guarantee, bit-for-bit.  The sketch stays
    ~depth*width rows at any input scale; merging day-sketches is a counter
    SUM (sketches.cms_merge)."""
    events = _t(spark, sf_dir, "events")
    sketch = sketches.cms_build(events, "user_id")
    exact = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("user_id").asc())
        .limit(10)
    )
    est = sketches.cms_estimate(sketch, exact.select("user_id"), "user_id")
    return exact.join(F.broadcast(est), ["user_id"]).select("user_id", "exact_cnt", "cms_est")


# ---------------------------------------------------------------------------
# Transactional table format (sources/txn_table.py)
# ---------------------------------------------------------------------------

@register(
    "txn_table_snapshot",
    f"""
    WITH base AS (SELECT * FROM orders
                  WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-03-01' AND DATE '1995-04-30'),
    final AS (SELECT o_orderkey, o_orderdate,
                     CASE WHEN CAST(o_orderdate AS DATE) = DATE '{RUN_DATE}'
                          THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
                     CASE WHEN CAST(o_orderdate AS DATE) = DATE '{RUN_DATE}'
                          THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice
              FROM base)
    SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderstatus,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM final GROUP BY 1, 2
    """,
)
def txn_table_snapshot(spark, sf_dir):
    """ACID table format end-to-end: append March 1995, append April 1995
    (both range-clustered on o_orderdate for zone-map pruning), then a
    copy-on-write MERGE that bumps the run date's orders — three atomic
    commits in a Delta-style commit log — and read the head snapshot back.
    The merge is file-granular (prune_col="o_orderdate"): zone maps keep
    April's files byte-untouched while March rewrites.
    The oracle recomputes the same final state relationally, so this checks
    commit replay + merge semantics + snapshot read in one pass. Time
    travel / concurrency / vacuum are covered in tests/test_txn_table.py."""
    import shutil

    from etl_mssql_to_postgres_dailysync_spark.sources.txn_table import TxnTable

    path = f"/tmp/spark_graft_txn_{sf_dir.strip('/').replace('/', '_')}"
    shutil.rmtree(path, ignore_errors=True)
    orders = _t(spark, sf_dir, "orders")
    t = TxnTable(spark, path, stats_cols=["o_orderdate"])
    t.append(
        orders.filter(filters.date_range_partition("o_orderdate", "1995-03-01", "1995-03-31")),
        cluster_by=["o_orderdate"],
    )
    t.append(
        orders.filter(filters.date_range_partition("o_orderdate", "1995-04-01", "1995-04-30")),
        cluster_by=["o_orderdate"],
    )
    src = (
        orders.filter(filters.daily_partition("o_orderdate", RUN_DATE))
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(10.0))
    )
    t.merge(src, ["o_orderkey"], prune_col="o_orderdate")
    return (
        t.read()
        .groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"), "o_orderstatus"
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Trained-k-means IVF (functions/similarity.py kmeans_fit / ivf_topk_trained)
# ---------------------------------------------------------------------------

def _kmeans_oracle_ctes(k: int, iters: int, dim: int = 64,
                        train_sample: int = similarity.TRAIN_SAMPLE_DEFAULT) -> str:
    """The DuckDB twin of similarity.kmeans_fit, unrolled per iteration.
    Exactness contract: micro-unit quantization, int64 distances, truncating
    integer-mean update (DuckDB // == Spark div), md5 seeding — every step
    bit-identical to the Spark operator. The ``tr`` CTE replays the fit-side
    hash-priority sample cap (similarity.TRAIN_SAMPLE_DEFAULT): training
    iterates over the smallest-(md5,id) ``train_sample`` rows only, exactly
    like the Spark TakeOrdered collect."""
    from etl_mssql_to_postgres_dailysync_spark.functions.hashing import md5_long_sql

    md5v = md5_long_sql("CAST(vid AS VARCHAR)")
    dist = (f"list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> (q.qv[i]-c.cv[i])*(q.qv[i]-c.cv[i])))")
    out = f"""
    q AS (SELECT vec_id AS vid, embedding,
                 list_transform(embedding::DOUBLE[],
                                x -> CAST(round(x * {similarity.QUANT_SCALE}) AS BIGINT)) AS qv
          FROM embeddings),
    tr AS (SELECT vid, qv FROM q ORDER BY {md5v}, vid LIMIT {train_sample}),
    seeds AS (SELECT vid, qv FROM tr ORDER BY {md5v}, vid LIMIT {k}),
    cent0 AS (SELECT row_number() OVER (ORDER BY {md5v}, vid) - 1 AS cell_id, qv AS cv
              FROM seeds)"""
    for i in range(iters):
        out += f""",
    a{i} AS (SELECT vid, qv, cell_id FROM (
         SELECT q.vid, q.qv, c.cell_id,
                row_number() OVER (PARTITION BY q.vid ORDER BY {dist}, c.cell_id) AS rn
         FROM tr q CROSS JOIN cent{i} c) WHERE rn = 1),
    s{i} AS (SELECT cell_id, t.i AS pos, sum(qv[t.i]) AS s, count(*) AS n
         FROM a{i}, generate_series(1, {dim}) t(i) GROUP BY 1, 2),
    n{i} AS (SELECT cell_id, list(CAST(s // n AS BIGINT) ORDER BY pos) AS cv
             FROM s{i} GROUP BY 1),
    cent{i + 1} AS (SELECT c.cell_id, coalesce(n.cv, c.cv) AS cv
                    FROM cent{i} c LEFT JOIN n{i} n USING (cell_id))"""
    return out


_KM_ITERS = 2
_KM_DIST_FINAL = (f"list_sum(list_transform(generate_series(1, 64), "
                  f"i -> (q.qv[i]-c.cv[i])*(q.qv[i]-c.cv[i])))")

@register(
    "similarity_ann_ivf_trained",
    f"""
    WITH {_kmeans_oracle_ctes(8, _KM_ITERS)},
    asgn AS (SELECT vid, embedding, cell_id, rn FROM (
         SELECT q.vid, q.embedding, c.cell_id,
                row_number() OVER (PARTITION BY q.vid ORDER BY {_KM_DIST_FINAL}, c.cell_id) AS rn
         FROM q CROSS JOIN cent{_KM_ITERS} c)),
    corpus AS (SELECT vid AS neighbor_id, embedding AS cve, cell_id FROM asgn WHERE rn = 1),
    qa AS (SELECT vid AS query_id, embedding AS qv2, cell_id FROM asgn
           WHERE vid < 10 AND rn <= 4),
    scored AS (
        SELECT qa.query_id, corpus.neighbor_id,
               round(list_cosine_similarity(qa.qv2::DOUBLE[], corpus.cve::DOUBLE[]), 6) AS sim
        FROM corpus JOIN qa ON corpus.cell_id = qa.cell_id
        WHERE corpus.neighbor_id <> qa.query_id),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        FROM scored)
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5
    """,
)
def similarity_ann_ivf_trained(spark, sf_dir):
    """IVF over TRAINED cells: integer-exact Lloyd k-means fit on the
    bounded hash-priority train sample (md5 seeding, broadcast assignment,
    truncating integer-mean update) followed by nprobe=4 cell-local cosine
    top-5. nprobe tuned against tools/recall_report.py with the
    train-sample cap engaged (sf0.1 corpus 2000 > cap 1024): 3 probes gave
    0.58 recall@5, 4 gives 0.66 — sampling costs ~6pts recall vs training
    on everything, the standard IVF tradeoff; at scale num_cells grows with
    the corpus and nprobe/num_cells stays small (this 8-cell layout is
    oracle-sized). The oracle replays the ENTIRE TRAINING LOOP including
    the sample cap in SQL and matches bit-for-bit — training, cell
    assignment, and search are all checked, not just the output shape.
    At 100 TB: fit on the sample, persist centroids, store the corpus
    bucketed by cell_id; per-query cost is nprobe/num_cells of the data."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return similarity.ivf_topk_trained(
        queries_df, emb, k=5, nprobe=4, num_cells=8, iters=_KM_ITERS
    ).withColumn("rank", F.col("rank").cast("int"))


# ---------------------------------------------------------------------------
# Grouping sets / null-aware anti join / regexp / deterministic sampling
# ---------------------------------------------------------------------------

_GROUPING_SETS_SQL = """
    SELECT n_name, o_orderpriority,
           CAST(grouping(n_name) AS INT) AS g_nation,
           CAST(grouping(o_orderpriority) AS INT) AS g_prio,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    GROUP BY GROUPING SETS ((n_name), (o_orderpriority), (n_name, o_orderpriority), ())
"""

@register("grouping_sets_revenue", _GROUPING_SETS_SQL)
def grouping_sets_revenue(spark, sf_dir):
    """GROUPING SETS beyond rollup/cube: four explicit grouping combinations
    in ONE expand+aggregate pass (Catalyst's Expand operator replicates each
    input row once per set, then a single hash aggregate) — vs four separate
    scans unioned. grouping() flags disambiguate NULL-as-subtotal from
    NULL-as-value. The identical SQL text runs on both engines."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(_GROUPING_SETS_SQL)


_NULL_NOT_IN_SQL = """
    SELECT l_returnflag, count(*) AS n_items
    FROM (SELECT l_returnflag, nullif(l_suppkey % 97, 13) AS supp_bucket FROM lineitem)
    WHERE supp_bucket NOT IN (SELECT s_suppkey % 97 FROM supplier WHERE s_acctbal < -900)
    GROUP BY l_returnflag
"""

@register("null_aware_not_in", _NULL_NOT_IN_SQL)
def null_aware_not_in(spark, sf_dir):
    """NOT IN over a NULLABLE column — three-valued logic: rows whose probe
    value is NULL are dropped (NULL NOT IN S is never TRUE). Catalyst plans
    this as a null-aware anti join (BroadcastHashJoin LeftAnti with
    isNullAwareAntiJoin=true), which a plain left_anti DataFrame join does
    NOT reproduce — so this entry goes through spark.sql deliberately."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_NULL_NOT_IN_SQL)


@register(
    "regexp_functions",
    r"""
    SELECT doc_id,
           regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_numbers,
           regexp_replace(substr(text, 1, 40), '[aeiou]', '_', 'g') AS devoweled,
           CAST(regexp_matches(source, '^(web|wiki)') AS INT) AS is_webish
    FROM documents
    """,
)
def regexp_functions(spark, sf_dir):
    """Regexp surface: extract / extract-all / global replace / match-test.
    Cross-engine notes: Spark's regexp_replace is global by default while
    DuckDB needs the 'g' flag; DuckDB's regexp_matches is Spark's rlike.
    Patterns restricted to the RE2-and-Java-common subset."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"([A-Za-z]+)", 1).alias("first_word"),
        F.size(F.expr(r"regexp_extract_all(text, '[0-9]+', 0)")).cast("int").alias("n_numbers"),
        F.regexp_replace(F.substring("text", 1, 40), r"[aeiou]", "_").alias("devoweled"),
        F.col("source").rlike("^(web|wiki)").cast("int").alias("is_webish"),
    )


@register(
    "deterministic_sample",
    f"""
    SELECT l_returnflag,
           count(*) AS n_sampled,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sampled
    FROM lineitem
    WHERE {{h}} % 100 < 10
    GROUP BY l_returnflag
    """.format(h=__import__("etl_mssql_to_postgres_dailysync_spark.functions.hashing",
                            fromlist=["md5_long_sql"]).md5_long_sql(
                                "CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)")),
)
def deterministic_sample(spark, sf_dir):
    """Reproducible ~10% sample via key hashing — the scale-path replacement
    for TABLESAMPLE/F.rand sampling, which is neither engine-portable nor
    stable under retries/repartitioning. Hash-mod sampling pushes to every
    executor with no coordination, keeps the SAME rows on re-run (critical
    for training-data reproducibility), and supports stratification by
    hashing within groups."""
    li = _t(spark, sf_dir, "lineitem")
    h = md5_long(F.col("l_orderkey") * 10 + F.col("l_linenumber"))
    return (
        li.filter(h % 100 < 10)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty_sampled"),
        )
    )


# ---------------------------------------------------------------------------
# Duplicate clustering: connected components over LSH candidate pairs
# ---------------------------------------------------------------------------

@register(
    "dedup_cluster_components",
    f"""
    WITH RECURSIVE pairs AS (SELECT * FROM ({ORACLES["dedup_minhash_lsh"]})),
    e AS (SELECT id_a AS u, id_b AS n FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
    reach AS (
        SELECT doc_id AS id, doc_id AS r FROM documents
        UNION
        SELECT e.n AS id, reach.r FROM reach JOIN e ON e.u = reach.id
    ),
    comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id)
    SELECT c.doc_id, c.component, s.cluster_size
    FROM comp c JOIN (SELECT component, count(*) AS cluster_size
                      FROM comp GROUP BY component) s USING (component)
    """,
)
def dedup_cluster_components(spark, sf_dir):
    """Near-dup CLUSTERING (not just pairs): connected components over the
    MinHash-LSH candidate graph via hash-min label propagation, iterated to
    a checked fixed point. The oracle computes true components with a
    recursive transitive closure — convergence of the distributed loop is
    therefore verified exactly, doc by doc. component = min doc_id in the
    cluster (the canonical representative); cluster_size joins back on."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, "text", "doc_id", num_hashes=16, bands=4, k=3)
    comp = dedup.connected_components(docs, pairs)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(F.broadcast(sizes), ["component"]).select(
        "doc_id", "component", "cluster_size"
    )


@register(
    "dedup_cluster_stats",
    f"""
    WITH base AS (SELECT * FROM ({ORACLES["dedup_cluster_components"]}))
    SELECT cluster_size,
           CAST(count(DISTINCT component) AS BIGINT) AS n_clusters,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM base WHERE cluster_size >= 2 GROUP BY cluster_size
    """,
)
def dedup_cluster_stats(spark, sf_dir):
    """Duplicate-cluster size distribution (how much of the corpus sits in
    2-doc pairs vs large boilerplate families) — the summary that drives
    keep-one-per-cluster volume estimates. Constant-size output over the
    component labels."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, "text", "doc_id", num_hashes=16, bands=4, k=3)
    comp = dedup.connected_components(docs, pairs)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        sizes.filter(F.col("cluster_size") >= 2)
        .groupBy("cluster_size")
        .agg(
            F.countDistinct("component").alias("n_clusters"),
            F.sum("cluster_size").alias("n_docs"),
        )
    )


@register(
    "txn_table_changes",
    f"""
    WITH apr AS (SELECT * FROM orders
                 WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-04-01' AND DATE '1995-04-03'),
    upd AS (SELECT * FROM orders WHERE CAST(o_orderdate AS DATE) = DATE '{RUN_DATE}')
    SELECT 'insert' AS _change_type, count(*) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM apr
    UNION ALL
    SELECT 'update_postimage', count(*),
           CAST(sum(CAST(round((o_totalprice + 10.0) * 100) AS BIGINT)) AS BIGINT)
    FROM upd
    """,
)
def txn_table_changes(spark, sf_dir):
    """CDC over the transactional table — the capability the reference
    explicitly lacks (README.md:78: in-place updates missed by daily
    partition re-extract). Version 0 = March orders; version 1 = a merge
    that updates the run date (+10.00, status 'U') and inserts April 1-3.
    table_changes(0, 1) recovers exactly that changeset as typed
    insert/update rows via one key-partitioned full-outer snapshot diff."""
    import shutil

    from etl_mssql_to_postgres_dailysync_spark.sources.txn_table import TxnTable, table_changes

    path = f"/tmp/spark_graft_cdc_{sf_dir.strip('/').replace('/', '_')}"
    shutil.rmtree(path, ignore_errors=True)
    orders = _t(spark, sf_dir, "orders")
    t = TxnTable(spark, path)
    t.append(orders.filter(filters.date_range_partition("o_orderdate", "1995-03-01", "1995-03-31")))
    src = (
        orders.filter(filters.daily_partition("o_orderdate", RUN_DATE))
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(10.0))
    ).unionByName(
        orders.filter(filters.date_range_partition("o_orderdate", "1995-04-01", "1995-04-03"))
    )
    t.merge(src, ["o_orderkey"])
    return (
        table_changes(t, 0, 1, ["o_orderkey"])
        .groupBy("_change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast("bigint").alias("cents"),
        )
    )


# ---------------------------------------------------------------------------
# Time-series gap filling and histogramming
# ---------------------------------------------------------------------------

@register(
    "gap_fill_daily",
    """
    WITH days AS (SELECT CAST(unnest(generate_series(DATE '1995-03-01', DATE '1995-03-31',
                                                     INTERVAL 1 DAY)) AS DATE) AS d),
    nat AS (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5),
    counts AS (SELECT c_nationkey, CAST(o_orderdate AS DATE) AS d,
                      count(*) AS cnt,
                      CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
               FROM orders JOIN customer ON o_custkey = c_custkey
               WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'
               GROUP BY 1, 2),
    spine AS (SELECT n_name, n_nationkey, d FROM nat CROSS JOIN days),
    filled AS (SELECT s.n_name, s.d,
                      coalesce(c.cnt, 0) AS n_orders,
                      c.cents
               FROM spine s LEFT JOIN counts c
                    ON c.c_nationkey = s.n_nationkey AND c.d = s.d)
    SELECT n_name, CAST(d AS VARCHAR) AS day, n_orders,
           coalesce(last_value(cents IGNORE NULLS) OVER (
               PARTITION BY n_name ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS last_rev_cents
    FROM filled
    """,
)
def gap_fill_daily(spark, sf_dir):
    """Time-series gap filling: a generated date spine (F.sequence, no table
    scan) cross-joined with the dimension, zero-fill via outer join, and
    forward-fill via last_value(IGNORE NULLS) over an ordered frame — the
    standard hypertable `time_bucket_gapfill`/`locf` pattern. The spine is
    metadata-sized, so it broadcasts; the fact side aggregates BEFORE the
    join (dim-sized shuffle only)."""
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-03-01").cast("date"),
                F.lit("1995-03-31").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("d")
    )
    nat = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_nationkey") < 5)
        .select("n_nationkey", "n_name")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        filters.date_range_partition("o_orderdate", "1995-03-01", "1995-03-31")
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    counts = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey", F.to_date("o_orderdate").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
        )
    )
    spine = nat.crossJoin(F.broadcast(days))
    filled = spine.join(
        counts,
        (F.col("c_nationkey") == F.col("n_nationkey")) & (counts["d"] == spine["d"]),
        "left",
    ).select(
        "n_name", spine["d"].alias("d"), F.coalesce("cnt", F.lit(0)).alias("n_orders"), "cents"
    )
    w = (
        Window.partitionBy("n_name")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "n_name",
        F.col("d").cast("string").alias("day"),
        "n_orders",
        F.coalesce(F.last("cents", ignorenulls=True).over(w), F.lit(0)).alias("last_rev_cents"),
    )


@register(
    "histogram_prices",
    """
    SELECT CAST(CAST(round(o_totalprice * 100) AS BIGINT) * 12 // 60000000 + 1 AS INT) AS bucket,
           count(*) AS n_orders,
           CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS min_cents,
           CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
    FROM orders GROUP BY 1
    """,
)
def histogram_prices(spark, sf_dir):
    """Equal-width histogram (width_bucket semantics) in pure integer
    arithmetic — ``cents * n_buckets div range + 1`` with truncating int
    division on both engines, so bin edges are exact (a double-valued
    width_bucket would diverge at boundaries; DuckDB also lacks the
    function). One map-side-combined aggregation."""
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        _t(spark, sf_dir, "orders")
        .select(F.expr("CAST(round(o_totalprice * 100) AS BIGINT) * 12 div 60000000 + 1").cast("int").alias("bucket"), cents.alias("c"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("c").cast("bigint").alias("min_cents"),
            F.max("c").cast("bigint").alias("max_cents"),
        )
    )


@register(
    "incremental_rollup_maintenance",
    f"""
    WITH mar AS (SELECT * FROM orders
                 WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'),
    apr AS (SELECT * FROM orders
            WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-04-01' AND DATE '1995-04-03'),
    final AS (
        SELECT o_orderkey, o_orderdate,
               CASE WHEN CAST(o_orderdate AS DATE) = DATE '{RUN_DATE}'
                    THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice
        FROM mar
        UNION ALL SELECT o_orderkey, o_orderdate, o_totalprice FROM apr)
    SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM final GROUP BY 1
    """,
)
def incremental_rollup_maintenance(spark, sf_dir):
    """Incremental view maintenance: a daily rollup updated from the CDC
    changeset ALONE — inserts add, deletes retract, updates retract the
    pre-image and add the post-image — then merged into the stored rollup.
    The 100 TB property: maintaining the aggregate costs O(|delta|), never
    a re-scan of the base table; the oracle recomputes the same rollup from
    scratch, proving delta-application == full recompute."""
    import shutil

    from etl_mssql_to_postgres_dailysync_spark.sources.txn_table import TxnTable, table_changes

    path = f"/tmp/spark_graft_ivm_{sf_dir.strip('/').replace('/', '_')}"
    shutil.rmtree(path, ignore_errors=True)
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_totalprice")
    t = TxnTable(spark, path)
    t.append(orders.filter(filters.date_range_partition("o_orderdate", "1995-03-01", "1995-03-31")))

    # the stored rollup at v0 (normally persisted; recomputed here once)
    day = F.to_date("o_orderdate").cast("string").alias("day")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    rollup_v0 = (
        t.read()
        .groupBy(day)
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum(cents).alias("revenue_cents"))
    )

    src = (
        orders.filter(filters.daily_partition("o_orderdate", RUN_DATE))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(10.0))
    ).unionByName(
        orders.filter(filters.date_range_partition("o_orderdate", "1995-04-01", "1995-04-03"))
    )
    t.merge(src, ["o_orderkey"])

    # delta-apply: signed contributions per change row, aggregated per day
    ch = table_changes(t, 0, 1, ["o_orderkey"], include_preimage=True)
    sign = F.when(F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)).otherwise(
        F.lit(-1)
    )
    deltas = ch.groupBy(day).agg(
        F.sum(sign).alias("d_n"), F.sum(sign * cents).alias("d_cents")
    )
    merged = (
        rollup_v0.join(deltas, ["day"], "full_outer")
        .select(
            "day",
            (F.coalesce("n_orders", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias("n_orders"),
            (F.coalesce("revenue_cents", F.lit(0)) + F.coalesce("d_cents", F.lit(0)))
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .filter(F.col("n_orders") > 0)
    )
    return merged


@register(
    "tfidf_top_terms",
    rf"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
               round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, term ASC) AS rnk
        FROM scored)
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           tfidf, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """TF-IDF with top-3 terms per document — the standard relevance/
    keyword-extraction primitive. Shuffle shape: tf is one (doc, term)
    aggregation; df re-aggregates the ALREADY-REDUCED tf table (never the
    raw token stream); the df table (one row per distinct term) broadcasts
    back. ln() is IEEE-identical here because both engines feed it the same
    exact double (integer N / integer df) and round at 6dp."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")).alias(
            "term"
        ),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", F.col("tf").cast("bigint"), F.col("df").cast("bigint"),
                "tfidf", F.col("rnk").cast("int"))
    )


@register(
    "map_functions",
    """
    WITH cnts AS (SELECT user_id, event_type, count(*) AS cnt
                  FROM events WHERE user_id % 10 = 0 GROUP BY 1, 2),
    m AS (SELECT user_id,
                 map_from_entries(list(struct_pack(k := event_type, v := cnt)
                                       ORDER BY event_type)) AS em
          FROM cnts GROUP BY user_id)
    SELECT user_id,
           CAST(coalesce(em['click'][1], 0) AS BIGINT) AS clicks,
           CAST(coalesce(em['view'][1], 0) AS BIGINT) AS views,
           CAST(coalesce(em['purchase'][1], 0) AS BIGINT) AS purchases,
           CAST(cardinality(em) AS INT) AS n_types
    FROM m
    """,
)
def map_functions(spark, sf_dir):
    """Map-typed column surface: build map<event_type, count> per user from
    an aggregation (map_from_entries over a sorted entry array — canonical
    key order), then key-lookup + cardinality. Extraction semantics differ
    across engines (DuckDB map[k] yields a LIST; Spark element_at yields the
    value or NULL) — normalized via coalesce on both sides."""
    events = _t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    cnts = events.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    m = cnts.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(F.col("event_type").alias("k"), F.col("cnt").alias("v"))))
        ).alias("em")
    )
    return m.select(
        "user_id",
        F.coalesce(F.element_at("em", F.lit("click")), F.lit(0)).cast("bigint").alias("clicks"),
        F.coalesce(F.element_at("em", F.lit("view")), F.lit(0)).cast("bigint").alias("views"),
        F.coalesce(F.element_at("em", F.lit("purchase")), F.lit(0)).cast("bigint").alias("purchases"),
        F.size("em").cast("int").alias("n_types"),
    )


@register(
    "conditional_aggregates",
    """
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           count(*) FILTER (WHERE l_quantity >= 30) AS n_bulk,
           CAST(bool_or(l_tax > 0.07) AS INT) AS any_high_tax,
           CAST(bool_and(l_quantity > 0) AS INT) AS all_positive_qty,
           CAST(min(CASE WHEN l_discount > 0.05
                         THEN CAST(round(l_extendedprice * 100) AS BIGINT) END) AS BIGINT)
               AS min_discounted_cents
    FROM lineitem GROUP BY l_returnflag
    """,
)
def conditional_aggregates(spark, sf_dir):
    """Conditional-aggregate surface: FILTERed counts, bool_or/bool_and
    (any/every), and conditional min — all in ONE hash aggregate pass (no
    per-condition scans). Booleans cast to INT for a stable cross-engine
    hash representation."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.count_if(F.col("l_quantity") >= 30).alias("n_bulk"),
        F.bool_or(F.col("l_tax") > 0.07).cast("int").alias("any_high_tax"),
        F.bool_and(F.col("l_quantity") > 0).cast("int").alias("all_positive_qty"),
        F.min(F.when(F.col("l_discount") > 0.05, cents)).cast("bigint")
        .alias("min_discounted_cents"),
    )


@register(
    "array_set_ops",
    """
    WITH per_user AS (
        SELECT user_id,
               list_sort(list(DISTINCT event_type)) AS types
        FROM events GROUP BY user_id),
    pairs AS (
        SELECT a.user_id AS user_a, b.user_id AS user_b, a.types AS ta, b.types AS tb
        FROM per_user a JOIN per_user b ON b.user_id = a.user_id + 1
        WHERE a.user_id % 20 = 0)
    SELECT user_a, user_b,
           array_to_string(list_sort(list_intersect(ta, tb)), '|') AS common_types,
           CAST(len(list_intersect(ta, tb)) AS INT) AS n_common,
           CAST(len(list_distinct(list_concat(ta, tb))) AS INT) AS n_union,
           CAST(len(list_filter(ta, x -> NOT list_contains(tb, x))) AS INT) AS n_only_a
    FROM pairs
    """,
)
def array_set_ops(spark, sf_dir):
    """Array set algebra (intersect/union/except) over per-user event-type
    profiles — collect_set is the single shuffle; the pairwise set ops are
    in-row JVM expressions. Arrays sorted canonically on both engines before
    comparison."""
    events = _t(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    a = per_user.filter(F.col("user_id") % 20 == 0).select(
        F.col("user_id").alias("user_a"), F.col("types").alias("ta")
    )
    b = per_user.select((F.col("user_id") - 1).alias("user_a"), F.col("user_id").alias("user_b"),
                        F.col("types").alias("tb"))
    return a.join(b, "user_a").select(
        "user_a",
        "user_b",
        F.array_join(F.array_sort(F.array_intersect("ta", "tb")), "|").alias("common_types"),
        F.size(F.array_intersect("ta", "tb")).cast("int").alias("n_common"),
        F.size(F.array_distinct(F.concat("ta", "tb"))).cast("int").alias("n_union"),
        F.size(F.array_except("ta", "tb")).cast("int").alias("n_only_a"),
    )


@register(
    "approx_percentile_bounds",
    """
    WITH cents AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
    ranked AS (SELECT c, row_number() OVER (ORDER BY c) AS rn, count(*) OVER () AS n FROM cents)
    SELECT CAST(max(CASE WHEN rn <= (n + 1) // 2 THEN c END) AS BIGINT) AS exact_p50,
           CAST(max(CASE WHEN rn <= CAST(ceil(n * 0.95) AS BIGINT) THEN c END) AS BIGINT) AS exact_p95,
           1 AS approx_p50_ok, 1 AS approx_p95_ok
    FROM ranked
    """,
)
def approx_percentile_bounds(spark, sf_dir):
    """The approximate-percentile path validated against the exact one IN
    the query: percentile_approx (GK sketch, mergeable, one pass — the
    100 TB path) must land within the configured rank tolerance of the
    exact integer percentile; the oracle recomputes the exact values and
    expects the bound checks to hold (columns ...._ok = 1). This is how
    non-deterministic-by-algorithm operators stay oracle-checkable: assert
    the CONTRACT, not the internals."""
    orders = _t(spark, sf_dir, "orders")
    cents = orders.select(F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"))
    n = cents.count()
    idx50 = (n + 1) // 2              # lower-median rank
    idx95 = int(-(-(n * 0.95) // 1))  # ceil(n * 0.95)
    tol = max(n // 10000, 1)          # percentile_approx accuracy=10000 -> rank error <= n/10000
    stats = cents.agg(
        F.expr("percentile_approx(c, 0.5, 10000)").alias("a50"),
        F.expr("percentile_approx(c, 0.95, 10000)").alias("a95"),
        F.sort_array(F.collect_list("c")).alias("sorted"),
    )
    rank_of = lambda val: F.size(F.filter("sorted", lambda x: x <= val))
    return stats.select(
        F.element_at("sorted", idx50).cast("bigint").alias("exact_p50"),
        F.element_at("sorted", idx95).cast("bigint").alias("exact_p95"),
        (F.abs(rank_of(F.col("a50")) - F.lit(idx50)) <= tol).cast("int").alias("approx_p50_ok"),
        (F.abs(rank_of(F.col("a95")) - F.lit(idx95)) <= tol).cast("int").alias("approx_p95_ok"),
    )


@register(
    "top_session_paths",
    """
    WITH l AS (
        SELECT user_id, ts, event_id, event_type,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
    f AS (SELECT *, CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
                         THEN 1 ELSE 0 END AS new_s FROM l),
    s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sid FROM f),
    paths AS (
        SELECT user_id, sid,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
               count(*) AS path_len
        FROM s GROUP BY user_id, sid),
    counted AS (SELECT path, count(*) AS n_sessions FROM paths
                WHERE path_len <= 4 GROUP BY path)
    SELECT path, n_sessions FROM counted
    ORDER BY n_sessions DESC, path ASC LIMIT 20
    """,
)
def top_session_paths(spark, sf_dir):
    """Path analysis: the most common within-session event sequences
    (sessionize -> ordered path string -> top-k). The path assembly is ONE
    ordered string aggregation per session on the already-sessionized rows;
    top-k is TakeOrdered (no global sort). Paths capped at 4 events so the
    path-space stays bounded — the standard guard at 100 TB where unbounded
    paths explode combinatorially."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id", "ts", "event_id", "event_type", F.lag("ts").over(w).alias("prev")
    ).withColumn(
        "new_s",
        F.when(
            F.col("prev").isNull()
            | (F.col("ts").cast("long") - F.col("prev").cast("long") > 1800),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    paths = (
        sess.groupBy("user_id", "sid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path"),
            F.count(F.lit(1)).alias("path_len"),
        )
        .filter(F.col("path_len") <= 4)
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(20)
    )


@register(
    "cohort_retention",
    """
    WITH firsts AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id),
    cohorts AS (
        SELECT user_id, CAST(date_trunc('week', first_day) AS DATE) AS cohort_week
        FROM firsts),
    activity AS (
        SELECT DISTINCT e.user_id,
               CAST(date_trunc('week', CAST(e.ts AS DATE)) AS DATE) AS active_week
        FROM events e)
    SELECT CAST(c.cohort_week AS VARCHAR) AS cohort_week,
           CAST(date_diff('week', c.cohort_week, a.active_week) AS INT) AS weeks_since,
           count(DISTINCT a.user_id) AS n_active
    FROM cohorts c JOIN activity a ON a.user_id = c.user_id
    WHERE date_diff('week', c.cohort_week, a.active_week) BETWEEN 0 AND 8
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark, sf_dir):
    """Cohort retention: users grouped by first-seen week, counted active in
    each subsequent week. Two aggregations over the fact (first-touch, then
    distinct user-weeks — both map-side-combined); the cohort dim joins back
    on user_id. Week arithmetic normalized: Spark weekly date_trunc anchors
    Monday, as does DuckDB; week distance computed on day diffs div 7 to
    avoid engine-specific week-boundary counting."""
    events = _t(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    cohorts = firsts.select(
        "user_id", F.date_trunc("week", "first_day").cast("date").alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", F.to_date("ts")).cast("date").alias("active_week")
    ).distinct()
    joined = cohorts.join(activity, "user_id").withColumn(
        "weeks_since",
        (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7).cast("int"),
    )
    return (
        joined.filter(F.col("weeks_since").between(0, 8))
        .groupBy(F.col("cohort_week").cast("string").alias("cohort_week"), "weeks_since")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@register(
    "ohlc_daily",
    f"""
    WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d, o_orderkey,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS cents
               FROM orders
               WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'),
    r AS (SELECT *, row_number() OVER (PARTITION BY d ORDER BY o_orderkey ASC) AS rn_a,
                    row_number() OVER (PARTITION BY d ORDER BY o_orderkey DESC) AS rn_d
          FROM o)
    SELECT CAST(d AS VARCHAR) AS day,
           CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
           CAST(max(cents) AS BIGINT) AS high_cents,
           CAST(min(cents) AS BIGINT) AS low_cents,
           CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
           count(*) AS n_orders
    FROM r GROUP BY d
    """,
)
def ohlc_daily(spark, sf_dir):
    """OHLC bars (open/high/low/close) per day — the time-series rollup
    shape. Open/close are first/last by a TOTAL order (orderkey; the
    fixture's timestamps are midnight-equal, so arg_min on ts alone would be
    non-deterministic); both row_number directions ride ONE window shuffle,
    then a single aggregate finishes. At scale this runs per
    (symbol, day) partition with the same plan."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(filters.date_range_partition("o_orderdate", "1995-03-01", "1995-03-31"))
        .select(
            F.to_date("o_orderdate").alias("d"),
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
    )
    wa = Window.partitionBy("d").orderBy(F.col("o_orderkey").asc())
    wd = Window.partitionBy("d").orderBy(F.col("o_orderkey").desc())
    r = o.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    return r.groupBy(F.col("d").cast("string").alias("day")).agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("cents"))).cast("bigint").alias("open_cents"),
        F.max("cents").cast("bigint").alias("high_cents"),
        F.min("cents").cast("bigint").alias("low_cents"),
        F.max(F.when(F.col("rn_d") == 1, F.col("cents"))).cast("bigint").alias("close_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "manual_corr_stats",
    """
    WITH b AS (SELECT l_returnflag,
                      CAST(l_quantity AS BIGINT) AS x,
                      CAST(round(l_discount * 100) AS BIGINT) AS y
               FROM lineitem),
    s AS (SELECT l_returnflag, count(*) AS n,
                 sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
                 sum(y*y) AS syy, sum(x*y) AS sxy
          FROM b GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
                 (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
                  sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS corr_qty_disc,
           round(sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) /
                      (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))), 6) AS stddev_qty
    FROM s
    """,
)
def manual_corr_stats(spark, sf_dir):
    """Correlation and stddev computed from EXACT integer sufficient
    statistics (Σx, Σy, Σx², Σy², Σxy as int64 — one aggregate pass) and a
    fixed IEEE expression on top. Spark's built-in corr/stddev use
    incremental co-moment updates whose rounding is engine- and
    partition-order-specific; this formulation is the cross-engine-exact
    (and perfectly partition-parallel) alternative — the sums are also the
    MERGEABLE form you'd keep in a 100 TB statistics rollup."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("y"),
    )
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    return s.select(
        "l_returnflag",
        "n",
        F.round(
            (nd * F.col("sxy") - sxd * F.col("sy"))
            / (
                F.sqrt(nd * F.col("sxx") - sxd * F.col("sx"))
                * F.sqrt(nd * F.col("syy") - syd * F.col("sy"))
            ),
            6,
        ).alias("corr_qty_disc"),
        F.round(
            F.sqrt((nd * F.col("sxx") - sxd * F.col("sx")) / (nd * (nd - F.lit(1.0)))), 6
        ).alias("stddev_qty"),
    )


@register(
    "graph_triangle_count",
    f"""
    WITH pairs AS (SELECT * FROM ({ORACLES["dedup_minhash_lsh"]})),
    e AS (SELECT id_a AS a, id_b AS b FROM pairs),
    tri AS (
        SELECT e1.a, e1.b, e2.b AS c
        FROM e e1 JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
    SELECT count(*) AS n_triangles,
           (SELECT count(*) FROM e) AS n_edges
    FROM tri
    """,
)
def graph_triangle_count(spark, sf_dir):
    """Triangle counting over the near-dup candidate graph — the standard
    graph-density primitive (clustering coefficient numerator). Edges are
    canonically ordered (a < b from the LSH pair generator), so each
    triangle is counted exactly once by the two-hop join + closing-edge
    semi-check. Both joins are equi-joins on vertex ids (8-byte longs); at
    scale the classic degree-ordered optimization bounds the join fan-out.
    Exact integer result — bit-checkable against the SQL oracle."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, "text", "doc_id", num_hashes=16, bands=4, k=3)
    e = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    two_hop = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e2.a") == F.col("e1.b"))
        .select(F.col("e1.a").alias("ta"), F.col("e1.b").alias("tb"), F.col("e2.b").alias("tc"))
    )
    tri = two_hop.join(
        e.alias("e3"), (F.col("e3.a") == F.col("ta")) & (F.col("e3.b") == F.col("tc"))
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles")).crossJoin(
        e.agg(F.count(F.lit(1)).alias("n_edges"))
    )


_PR_ITERS = 3

def _pagerank_oracle() -> str:
    """Unrolled integer PageRank twin: mass in micro-units, contributions by
    truncating division (DuckDB // == Spark div), damping 850/1000 in
    integer arithmetic — bit-identical to the Spark loop on any engine."""
    its = ""
    for i in range(_PR_ITERS):
        its += f""",
    inflow{i} AS (
        SELECT e.b AS v, sum(m.mass // d.deg) AS infl
        FROM e JOIN mass{i} m ON m.v = e.a JOIN deg d ON d.v = e.a
        GROUP BY e.b),
    mass{i + 1} AS (
        SELECT d.v, 150000 + (850 * coalesce(i.infl, 0)) // 1000 AS mass
        FROM deg d LEFT JOIN inflow{i} i ON i.v = d.v)"""
    return f"""
    WITH pairs AS (SELECT * FROM ({ORACLES["dedup_minhash_lsh"]})),
    e AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
    deg AS (SELECT a AS v, count(*) AS deg FROM e GROUP BY a),
    mass0 AS (SELECT v, CAST(1000000 AS BIGINT) AS mass FROM deg){its}
    SELECT v AS doc_id, CAST(mass AS BIGINT) AS rank_mass
    FROM mass{_PR_ITERS}
    ORDER BY rank_mass DESC, doc_id ASC LIMIT 20
    """


@register("pagerank_neardup_graph", _pagerank_oracle())
def pagerank_neardup_graph(spark, sf_dir):
    """PageRank (3 iterations, damping 0.85) over the near-dup candidate
    graph in INTEGER micro-mass — each iteration is one join + one aggregate,
    and because contributions use truncating integer division the entire
    trajectory is deterministic on any partitioning AND bit-identical to the
    SQL oracle's unrolled replay. The centrality signal ranks 'hub'
    documents inside duplicate clusters (useful for picking canonical docs).
    At scale: same loop, edges pre-partitioned by source vertex."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, "text", "doc_id", num_hashes=16, bands=4, k=3)
    e = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b")).union(
        pairs.select(F.col("id_b").alias("a"), F.col("id_a").alias("b"))
    ).persist()
    deg = e.groupBy(F.col("a").alias("dv")).agg(F.count(F.lit(1)).alias("deg")).persist()
    mass = deg.select(F.col("dv").alias("mv"), F.lit(1000000).cast("bigint").alias("mass"))
    for _ in range(_PR_ITERS):
        contrib = (
            e.join(mass, F.col("a") == F.col("mv"))
            .join(deg, F.col("a") == F.col("dv"))
            .select(F.col("b").alias("tv"), F.expr("mass div deg").alias("c"))
        )
        inflow = contrib.groupBy("tv").agg(F.sum("c").alias("infl"))
        mass = deg.join(inflow, F.col("dv") == F.col("tv"), "left").select(
            F.col("dv").alias("mv"),
            (F.lit(150000) + F.expr("(850 * coalesce(infl, 0)) div 1000"))
            .cast("bigint")
            .alias("mass"),
        )
    return mass.select(F.col("mv").alias("doc_id"), F.col("mass").alias("rank_mass")).orderBy(
        F.col("rank_mass").desc(), F.col("doc_id").asc()
    ).limit(20)


# ---------------------------------------------------------------------------
# Interchange formats beyond CSV/parquet: ORC and JSON-lines round trips
# ---------------------------------------------------------------------------

@register(
    "orc_roundtrip",
    f"""
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders WHERE CAST(o_orderdate AS DATE) = DATE '{RUN_DATE}'
    GROUP BY o_orderstatus
    """,
)
def orc_roundtrip(spark, sf_dir):
    """ORC interchange: write the daily partition as ORC (zstd), read it
    back with the explicit schema, aggregate — proving the ORC source/sink
    is lossless for the engine's types. The oracle aggregates the original
    parquet directly, so any round-trip corruption hash-mismatches."""
    import tempfile

    path = tempfile.mkdtemp(prefix="spark_graft_orc_") + "/orders_day"
    day = _t(spark, sf_dir, "orders").filter(filters.daily_partition("o_orderdate", RUN_DATE))
    day.write.mode("overwrite").option("compression", "zstd").orc(path)
    back = spark.read.schema(day.schema).orc(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast("bigint").alias("cents"),
    )


@register(
    "jsonl_roundtrip",
    f"""
    SELECT o_orderkey, o_orderstatus,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date
    FROM orders WHERE CAST(o_orderdate AS DATE) = DATE '{RUN_DATE}'
    """,
)
def jsonl_roundtrip(spark, sf_dir):
    """JSON-lines interchange: the daily partition out to .jsonl and back
    with an explicit schema (timestamps ISO-formatted; money as integer
    cents so the double never transits a decimal string). Schema-on-read
    with explicit StructType — never inferSchema in production paths."""
    import tempfile

    path = tempfile.mkdtemp(prefix="spark_graft_jsonl_") + "/orders_day"
    day = (
        _t(spark, sf_dir, "orders")
        .filter(filters.daily_partition("o_orderdate", RUN_DATE))
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            F.to_date("o_orderdate").cast("string").alias("order_date"),
        )
    )
    day.write.mode("overwrite").json(path)
    return spark.read.schema(day.schema).json(path)


@register(
    "data_quality_expectations",
    f"""
    WITH gen AS ({ORACLES["fake_orders_generator"]}),
    f AS (SELECT (OrderCreatedAt IS NOT NULL) AS ok1,
                 (Amount IS NOT NULL AND Amount >= 100 AND Amount <= 1050) AS ok2,
                 (Product IN {tuple(PRODUCTS[:-1])!r}) AS ok3,
                 (UserID % 7 <> 0) AS ok4
          FROM gen)
    SELECT count(*) AS total,
           count(*) FILTER (ok1 AND ok2 AND ok3 AND ok4) AS passed,
           count(*) FILTER (NOT ok1) AS viol_not_null_OrderCreatedAt,
           count(*) FILTER (NOT ok2) AS viol_range_Amount,
           count(*) FILTER (NOT ok3) AS viol_one_of_Product,
           count(*) FILTER (NOT ok4) AS viol_fk_UserID
    FROM f
    """,
)
def data_quality_expectations(spark, sf_dir):
    """Declarative expectations (operators/expectations.py) — the
    reference's validation + quarantine generalized: four named rules
    (not-null event time, amount range, product domain, FK-to-users via
    broadcast mark join) evaluated in ONE scan; output is the per-rule
    violation report the reference logs as XCom metrics. The pass/fail
    split and the metrics share the same flag columns — nothing re-scans."""
    from etl_mssql_to_postgres_dailysync_spark.operators import expectations as X

    src = fake_orders(spark, 1000).withColumn(
        "Amount", F.round(F.col("Amount").cast("double"), 2)
    )
    users = spark.range(1000, 10000).filter(F.col("id") % 7 != 0).select(
        F.col("id").alias("user_id")
    )
    good, quarantined, metrics = X.apply_expectations(
        src,
        [
            X.not_null(["OrderCreatedAt"]),
            X.in_range("Amount", 100, 1050),
            X.one_of("Product", PRODUCTS[:-1]),
        ],
        fk={"UserID": users},
    )
    return metrics


@register(
    "volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
               AS revenue_centipct
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice, l_discount
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def volume_shipping(spark, sf_dir):
    """TPC-H Q7 flavor — bidirectional nation-pair trade volume. The two
    nation dims broadcast twice under different roles; the OR-pair predicate
    prunes AFTER the cheap broadcast joins, so the fact shuffles only for
    the orders join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        filters.date_range_partition("l_shipdate", "1995-01-01", "1996-12-31")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nk") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("c_nk") == F.col("c_nationkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
    ).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
        )
        .cast("bigint")
        .alias("revenue_centipct")
    )


@register(
    "nation_market_share",
    """
    WITH base AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS vol,
             n_name
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31')
    SELECT o_year,
           round(CAST(sum(CASE WHEN n_name = 'NATION_5' THEN vol ELSE 0 END) AS DOUBLE)
                 / CAST(sum(vol) AS DOUBLE), 6) AS mkt_share
    FROM base GROUP BY o_year
    """,
)
def nation_market_share(spark, sf_dir):
    """TPC-H Q8 flavor — one nation's share of total volume per year: a
    conditional-sum ratio in ONE aggregation (no self-join of totals), exact
    integer sums divided once at the end (single IEEE op, cross-engine
    deterministic)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        filters.date_range_partition("o_orderdate", "1995-01-01", "1996-12-31")
    ).select("o_orderkey", "o_orderdate")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    vol = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    j = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(F.year("o_orderdate").cast("int").alias("o_year"), vol.alias("vol"), "n_name")
    )
    return j.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("n_name") == "NATION_5", F.col("vol")).otherwise(0)).cast("double")
            / F.sum("vol").cast("double"),
            6,
        ).alias("mkt_share")
    )


@register(
    "returned_item_customers",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue,
           count(*) AS n_items
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND CAST(o_orderdate AS DATE) BETWEEN DATE '1995-10-01' AND DATE '1995-12-31'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
)
def returned_item_customers(spark, sf_dir):
    """TPC-H Q10 flavor — top customers by returned-item revenue. Return
    flag + date filters reach the scans; top-20 is TakeOrdered on the
    aggregated (customer-sized) relation, never a global sort of the fact."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        filters.date_range_partition("o_orderdate", "1995-10-01", "1995-12-31")
    ).select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
                * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
            )
            .cast("bigint")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "priority_line_summary",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
    GROUP BY l_returnflag
    """,
)
def priority_line_summary(spark, sf_dir):
    """TPC-H Q12 flavor — CASE-pivot counts by priority class in one
    aggregation after a single fact-fact equi-join (both sides date/flag
    pruned before the exchange)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        filters.date_range_partition("l_shipdate", "1995-01-01", "1995-12-31")
    ).select("l_orderkey", "l_returnflag")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "discounted_revenue_or",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def discounted_revenue_or(spark, sf_dir):
    """TPC-H Q19 flavor — disjunction of brand/size/quantity triples across
    the join. Catalyst factors the OR into per-side conjuncts (p_brand IN
    (...) pushes to the part scan, quantity range to lineitem) before
    applying the full predicate post-join — the classic CNF-extraction
    workout; the part side stays broadcastable."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(cond).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
        )
        .cast("bigint")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "governed_ingest",
    f"""
    WITH gen AS ({ORACLES["fake_orders_generator"]})
    SELECT count(*) FILTER (OrderCreatedAt IS NOT NULL AND Amount <= 1900) AS rows_loaded,
           count(*) FILTER (OrderCreatedAt IS NULL OR Amount > 1900) AS rows_quarantined,
           count(*) FILTER (OrderCreatedAt IS NULL) AS viol_not_null,
           count(*) FILTER (Amount > 1900) AS viol_amount,
           count(*) AS rows_seen
    FROM gen
    """,
)
def governed_ingest(spark, sf_dir):
    """The governed-ingest composition — the engine's three pillars in one
    pipeline: expectations gate (one-scan rules), ACID merge of passing rows
    into a TxnTable (atomic visibility), quarantine side table for the rest
    (the reference's incomplete_orders generalized), and a reconciliation
    row proving loaded + quarantined == seen. The oracle recomputes every
    count relationally, so gating, merge and reconciliation all check."""
    import shutil

    from etl_mssql_to_postgres_dailysync_spark.operators import expectations as X
    from etl_mssql_to_postgres_dailysync_spark.sources.txn_table import TxnTable

    base = f"/tmp/spark_graft_govern_{sf_dir.strip('/').replace('/', '_')}"
    shutil.rmtree(base, ignore_errors=True)
    src = fake_orders(spark, 1000).withColumn(
        "Amount", F.round(F.col("Amount").cast("double"), 2)
    )
    good, quarantined, _ = X.apply_expectations(
        src,
        [X.not_null(["OrderCreatedAt"]), X.in_range("Amount", None, 1900)],
    )
    t = TxnTable(spark, f"{base}/orders")
    t.append(good)
    quarantined.write.mode("overwrite").parquet(f"{base}/quarantine")
    loaded = t.read().agg(F.count(F.lit(1)).alias("rows_loaded"))
    quar = spark.read.parquet(f"{base}/quarantine")
    viol = quar.agg(
        F.count(F.lit(1)).alias("rows_quarantined"),
        F.count_if(F.array_contains("_violations", "not_null_OrderCreatedAt")).alias(
            "viol_not_null"
        ),
        F.count_if(F.array_contains("_violations", "range_Amount")).alias("viol_amount"),
    )
    return (
        loaded.crossJoin(viol)
        .withColumn("rows_seen", F.col("rows_loaded") + F.col("rows_quarantined"))
    )


# ---------------------------------------------------------------------------
# TPC-H batch 3 — Q2 / Q9 / Q11 / Q20 flavors. The fixture set has no
# partsupp table, so lineitem plays the part-supplier relation: a supplier's
# "offer" for a part is the minimum line price it ever shipped that part at.
# ---------------------------------------------------------------------------

@register(
    "min_cost_supplier",
    """
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_cents
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    eligible AS (
      SELECT p_partkey, p_name, s_name, s_acctbal, n_name, cost_cents
      FROM costs
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE p_type = 'ECONOMY' AND p_size <= 15 AND r_name = 'EUROPE')
    SELECT p_partkey, p_name, s_name, n_name, s_acctbal, cost_cents
    FROM eligible e
    WHERE cost_cents = (SELECT min(cost_cents) FROM eligible e2
                        WHERE e2.p_partkey = e.p_partkey)
    ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC LIMIT 100
    """,
)
def min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 flavor — cheapest eligible supplier per part (correlated
    scalar-min subquery). Decorrelated Spark-first: one composite-key
    aggregation builds the (part, supplier) offer table, the per-part min is
    a second part-keyed aggregation broadcast back as a filter (the
    qualifying-part side is dimension-sized after the type/size/region
    filters, so the join-back never shuffles the offers again). Top-100 is
    TakeOrdered, not a global sort."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_name")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select("r_regionkey")
    euro_nations = nation.join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey")).select(
        "n_nationkey", "n_name"
    )
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("cost_cents")
    )
    eligible = (
        costs.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(euro_nations), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name", "cost_cents")
    )
    best = eligible.groupBy(F.col("p_partkey").alias("b_partkey")).agg(
        F.min("cost_cents").alias("b_cost")
    )
    return (
        eligible.join(
            F.broadcast(best),
            (F.col("b_partkey") == F.col("p_partkey")) & (F.col("b_cost") == F.col("cost_cents")),
        )
        .select("p_partkey", "p_name", "s_name", "n_name", "s_acctbal", "cost_cents")
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name").asc(), F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(100)
    )


@register(
    "product_type_profit",
    """
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT))
                    - CAST(round(p_retailprice * 100) AS BIGINT) * 100
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_centipct
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE 'red%'
    GROUP BY n_name, o_year
    """,
)
def product_type_profit(spark, sf_dir):
    """TPC-H Q9 flavor — profit by supplier nation × order year for parts
    matching a name pattern (retail price stands in for ps_supplycost).
    The LIKE filter prunes part BEFORE the broadcast, so the fact-side
    part join doubles as the selective filter; only the orders join
    shuffles. Exact integer cents×pct arithmetic end to end."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey", "p_retailprice"
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint"))
        - F.round(F.col("p_retailprice") * 100).cast("bigint")
        * F.lit(100)
        * F.col("l_quantity").cast("bigint")
    )
    j = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
    )
    return j.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(F.sum(profit).cast("bigint").alias("profit_centipct"))


@register(
    "important_part_value",
    """
    WITH pv AS (
      SELECT l_partkey, SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS value_cents
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_4'
      GROUP BY l_partkey)
    SELECT l_partkey AS p_partkey, CAST(value_cents AS BIGINT) AS value_cents
    FROM pv
    WHERE value_cents * 10000 > (SELECT SUM(value_cents) FROM pv)
    """,
)
def important_part_value(spark, sf_dir):
    """TPC-H Q11 flavor — parts whose shipped value through one nation's
    suppliers exceeds a fixed fraction of that nation's total. The global
    total is a scalar aggregate broadcast via crossJoin (never a
    single-partition window); the threshold compare is integer-exact
    (value*10000 > total, no division)."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4").select(
        "n_nationkey"
    )
    pv = (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("value_cents"))
    )
    total = pv.agg(F.sum("value_cents").alias("total_cents"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 10000 > F.col("total_cents"))
        .select(F.col("l_partkey").alias("p_partkey"), "value_cents")
    )


@register(
    "promotion_part_suppliers",
    """
    WITH sq AS (
      SELECT l_suppkey,
             SUM(CAST(l_quantity AS BIGINT)) AS qty_total,
             SUM(CASE WHEN CAST(l_shipdate AS DATE)
                        BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
                      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS qty_1995
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%'
      GROUP BY l_suppkey, l_partkey)
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_2'
      AND s_suppkey IN (SELECT l_suppkey FROM sq WHERE qty_1995 * 2 > qty_total)
    """,
)
def promotion_part_suppliers(spark, sf_dir):
    """TPC-H Q20 flavor — suppliers in one nation who concentrated more than
    half their all-time shipments of pattern-named parts into 1995 (the
    availqty>half-year-demand correlation, reformulated without partsupp).
    Decorrelated: conditional sums compute both the correlated scalar and
    the outer quantity in ONE (supplier, part) aggregation; the IN becomes
    a LEFT SEMI join against the distinct qualifying suppliers."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2").select(
        "n_nationkey"
    )
    in_1995 = F.col("l_shipdate").cast("date").between("1995-01-01", "1995-12-31")
    sq = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty_total"),
            F.sum(F.when(in_1995, F.col("l_quantity").cast("bigint")).otherwise(0)).alias(
                "qty_1995"
            ),
        )
        .filter(F.col("qty_1995") * 2 > F.col("qty_total"))
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(sq, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "streaming_cdc_rollup",
    f"""
    WITH mar AS (SELECT * FROM orders
                 WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'),
    apr AS (SELECT * FROM orders
            WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-04-01' AND DATE '1995-04-03'),
    final AS (
        SELECT o_orderkey, o_orderdate,
               CASE WHEN CAST(o_orderdate AS DATE) = DATE '{RUN_DATE}'
                    THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice
        FROM mar
        UNION ALL SELECT o_orderkey, o_orderdate, o_totalprice FROM apr)
    SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
           count(*) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM final GROUP BY 1
    """,
)
def streaming_cdc_rollup(spark, sf_dir):
    """STREAMING incremental view maintenance, end to end: a Spark 4 Python
    Data Source (streaming/cdc_source.py) tails the TxnTable commit log and
    emits signed row deltas (added file rows +1, removed file rows -1, one
    input partition per changed file); a foreachBatch maintainer folds them
    into a stored rollup. Two availableNow passes run here — initial load,
    then a merge of price updates + new days — with a shared checkpoint, so
    the second pass processes ONLY the merge commit (exactly-once offsets =
    commit versions). The oracle recomputes the rollup from the final table
    state: delta-maintained state == recompute, at O(|changed files|) cost
    per refresh instead of a base-table rescan."""
    import shutil

    from etl_mssql_to_postgres_dailysync_spark.sources.txn_table import TxnTable
    from etl_mssql_to_postgres_dailysync_spark.streaming.cdc_source import (
        TxnTableCdcDataSource,
        rollup_maintainer,
    )

    base = f"/tmp/spark_graft_scdc_{sf_dir.strip('/').replace('/', '_')}"
    shutil.rmtree(base, ignore_errors=True)
    spark.dataSource.register(TxnTableCdcDataSource)
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_totalprice")
    t = TxnTable(spark, f"{base}/tbl")
    t.append(orders.filter(filters.date_range_partition("o_orderdate", "1995-03-01", "1995-03-31")))

    def run_stream():
        fb = rollup_maintainer(
            spark, f"{base}/state", ["day"],
            {"revenue_cents": "CAST(round(o_totalprice * 100) AS BIGINT)"},
        )
        s = (
            spark.readStream.format("txntable_cdc").option("path", f"{base}/tbl").load()
            .withColumn("day", F.to_date("o_orderdate").cast("string"))
        )
        q = (
            s.writeStream.foreachBatch(fb)
            .option("checkpointLocation", f"{base}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_stream()
    src = (
        orders.filter(filters.daily_partition("o_orderdate", RUN_DATE))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(10.0))
    ).unionByName(
        orders.filter(filters.date_range_partition("o_orderdate", "1995-04-01", "1995-04-03"))
    )
    t.merge(src, ["o_orderkey"])
    run_stream()
    return spark.read.parquet(f"{base}/state").select("day", "n_rows", "revenue_cents")


# ---------------------------------------------------------------------------
# Analytics breadth batch (round 2): string similarity, sampling, binning,
# distribution stats, time-weighted aggregation, anomaly flags, mode,
# range-frame rolling windows
# ---------------------------------------------------------------------------

@register(
    "levenshtein_name_pairs",
    """
    WITH names AS (SELECT DISTINCT p_name FROM part),
    blocked AS (
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             levenshtein(a.p_name, b.p_name) AS dist
      FROM names a JOIN names b
        ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
       AND a.p_name < b.p_name)
    SELECT name_a, name_b, dist FROM blocked WHERE dist <= 4
    """,
)
def levenshtein_name_pairs(spark, sf_dir):
    """Fuzzy string-similarity self-join with blocking: DISTINCT names first
    (the corpus-size reduction that makes edit-distance joins feasible —
    dedupe before the quadratic step), then first-character blocking keeps
    the pair join an EQUI hash join (never a nested-loop over the cross
    product); levenshtein runs only inside blocks. Standard blocking
    tradeoff: cross-block pairs are sacrificed for a plan that scales with
    block sizes, not n^2."""
    names = _t(spark, sf_dir, "part").select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"), F.substring("p_name", 1, 1).alias("blk_a"))
    b = names.select(F.col("p_name").alias("name_b"), F.substring("p_name", 1, 1).alias("blk_b"))
    return (
        a.join(b, (F.col("blk_a") == F.col("blk_b")) & (F.col("name_a") < F.col("name_b")))
        .select("name_a", "name_b", F.levenshtein("name_a", "name_b").alias("dist"))
        .filter(F.col("dist") <= 4)
    )


_STRATA_RATES = {"1-URGENT": 500, "2-HIGH": 250, "3-MEDIUM": 100, "4-NOT SPECIFIED": 50}


@register(
    "stratified_sample",
    f"""
    SELECT o_orderpriority, count(*) AS n_sampled,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sampled_cents
    FROM orders
    WHERE CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '#77'), 1, 15) AS BIGINT)
          % 1000 <
          CASE o_orderpriority
            {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _STRATA_RATES.items())}
            ELSE 0 END
    GROUP BY o_orderpriority
    """,
)
def stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling: per-stratum rates (URGENT 50%,
    HIGH 25%, MEDIUM 10%, rest 5%/0%) decided by a salted key hash — the
    same row is sampled on every engine and every run (vs F.rand), the
    filter is a pure per-row predicate (no shuffle, no state), and rates are
    exact in expectation per stratum. The rate lookup is a broadcast-free
    CASE over the stratum column."""
    rate = F.lit(None).cast("int")
    expr = None
    for k, v in _STRATA_RATES.items():
        expr = F.when(F.col("o_orderpriority") == k, F.lit(v)) if expr is None else expr.when(
            F.col("o_orderpriority") == k, F.lit(v)
        )
    rate = expr.otherwise(F.lit(0))
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(md5_long(F.col("o_orderkey"), seed=77) % 1000 < rate)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("sampled_cents"),
        )
    )


@register(
    "ntile_binning",
    """
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(4) OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice ASC, o_orderkey ASC) AS INT) AS quartile
    FROM orders
    WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'
    """,
)
def ntile_binning(spark, sf_dir):
    """Quantile binning via ntile(4) per priority stratum. The ORDER BY
    carries the key as tiebreak so bin assignment is total-ordered and
    engine-reproducible (ntile on a non-unique ordering is
    implementation-defined at the boundaries)."""
    orders = _t(spark, sf_dir, "orders").filter(
        filters.date_range_partition("o_orderdate", "1995-03-01", "1995-03-31")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderkey", "o_orderpriority", F.ntile(4).over(w).cast("int").alias("quartile")
    )


@register(
    "rfm_segmentation",
    """
    WITH m AS (
        SELECT o_custkey,
               max(CAST(o_orderdate AS DATE)) AS last_day,
               count(*) AS frequency,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
        FROM orders GROUP BY o_custkey
    ),
    g AS (SELECT max(last_day) AS head_day FROM m),
    s AS (
        SELECT o_custkey,
               CAST(date_diff('day', last_day, (SELECT head_day FROM g)) AS BIGINT) AS recency_days,
               CAST(frequency AS BIGINT) AS frequency, monetary_cents,
               CAST(ntile(4) OVER (ORDER BY date_diff('day', last_day, (SELECT head_day FROM g)) ASC, o_custkey ASC) AS INT) AS r_score,
               CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey ASC) AS INT) AS f_score,
               CAST(ntile(4) OVER (ORDER BY monetary_cents DESC, o_custkey ASC) AS INT) AS m_score
        FROM m
    )
    SELECT o_custkey, recency_days, frequency, monetary_cents,
           r_score, f_score, m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS rfm_code
    FROM s
    """,
)
def rfm_segmentation(spark, sf_dir):
    """RFM customer segmentation: per-customer recency (days since last
    order, vs the corpus head date), frequency, monetary (exact cents), each
    quartile-scored with ntile over a total order (metric + custkey
    tie-break). The global windows run over the CUSTOMER-grain aggregate —
    corpus-size-independent — and the head date is one scalar broadcast."""
    orders = _t(spark, sf_dir, "orders")
    m = orders.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("monetary_cents"),
    )
    head_day = m.agg(F.max("last_day")).first()[0]
    s = m.select(
        "o_custkey",
        F.datediff(F.lit(head_day), F.col("last_day")).cast("long").alias("recency_days"),
        F.col("frequency").cast("long").alias("frequency"),
        "monetary_cents",
    )
    r_w = Window.orderBy(F.col("recency_days").asc(), F.col("o_custkey").asc())
    f_w = Window.orderBy(F.col("frequency").desc(), F.col("o_custkey").asc())
    m_w = Window.orderBy(F.col("monetary_cents").desc(), F.col("o_custkey").asc())
    scored = s.select(
        "o_custkey", "recency_days", "frequency", "monetary_cents",
        F.ntile(4).over(r_w).cast("int").alias("r_score"),
        F.ntile(4).over(f_w).cast("int").alias("f_score"),
        F.ntile(4).over(m_w).cast("int").alias("m_score"),
    )
    return scored.withColumn(
        "rfm_code",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).cast("int"),
    )


@register(
    "source_pareto_classes",
    r"""
    WITH st AS (
        SELECT source,
               CAST(sum(CASE WHEN trim(text) = '' THEN 0
                             ELSE len(regexp_split_to_array(trim(text), '\s+')) END)
                    AS BIGINT) AS tokens
        FROM documents GROUP BY source
    ),
    c AS (
        SELECT source, tokens,
               CAST(sum(tokens) OVER (ORDER BY tokens DESC, source ASC
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
               CAST(sum(tokens) OVER () AS BIGINT) AS total_tokens
        FROM st
    )
    SELECT source, tokens, cum_tokens,
           CASE WHEN cum_tokens * 100 <= total_tokens * 80 THEN 'A'
                WHEN cum_tokens * 100 <= total_tokens * 95 THEN 'B'
                ELSE 'C' END AS pareto_class
    FROM c
    """,
)
def source_pareto_classes(spark, sf_dir):
    """Pareto/ABC classification of corpus sources by token mass (which
    domains carry 80% / 95% of the training tokens — the curation view that
    drives mixture and quota decisions). The ranking window runs over the
    SOURCE-grain aggregate (tiny, corpus-size-independent); thresholds are
    division-free integer comparisons."""
    docs = _t(spark, sf_dir, "documents")
    st = docs.groupBy("source").agg(
        F.sum(text.token_count(F.col("text")).cast("long")).alias("tokens")
    )
    w = (
        Window.orderBy(F.col("tokens").desc(), F.col("source").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = st.select(
        "source", "tokens",
        F.sum("tokens").over(w).alias("cum_tokens"),
        F.sum("tokens").over(Window.partitionBy()).alias("total_tokens"),
    )
    return c.select(
        "source", "tokens", "cum_tokens",
        F.when(F.col("cum_tokens") * 100 <= F.col("total_tokens") * 80, "A")
        .when(F.col("cum_tokens") * 100 <= F.col("total_tokens") * 95, "B")
        .otherwise("C")
        .alias("pareto_class"),
    )


@register(
    "conversion_lag_stats",
    """
    WITH f AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        FROM events GROUP BY user_id
    ),
    lag AS (
        SELECT user_id,
               CAST((epoch_us(first_purchase) - epoch_us(first_view)) // 1000000
                    AS BIGINT) AS lag_s
        FROM f
        WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
          AND first_purchase >= first_view
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converting,
           CAST(min(lag_s) AS BIGINT) AS min_lag_s,
           CAST(max(lag_s) AS BIGINT) AS max_lag_s,
           CAST(sum(lag_s) AS BIGINT) AS sum_lag_s,
           CAST(floor(median(lag_s)) AS BIGINT) AS median_lag_s
    FROM lag
    """,
)
def conversion_lag_stats(spark, sf_dir):
    """View-to-purchase conversion lag: one conditional-min pass collapses
    events to user grain (first view / first purchase per user), then lag
    stats over the small user-grain relation. median over bigint seconds is
    exact on both engines (odd/even midpoint of integers; Spark `median` and
    DuckDB `median` both interpolate — integer seconds make the midpoint
    exact)."""
    ev = _t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    lag = (
        f.filter(
            F.col("first_view").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") >= F.col("first_view"))
        )
        .select(
            (
                (F.unix_micros("first_purchase") - F.unix_micros("first_view"))
                / F.lit(1_000_000)
            ).cast("long").alias("lag_s")
        )
    )
    return lag.agg(
        F.count(F.lit(1)).alias("n_converting"),
        F.min("lag_s").alias("min_lag_s"),
        F.max("lag_s").alias("max_lag_s"),
        F.sum("lag_s").alias("sum_lag_s"),
        F.floor(F.median("lag_s")).cast("long").alias("median_lag_s"),
    )


@register(
    "event_activity_heatmap",
    """
    SELECT CAST(dayofweek(CAST(ts AS DATE)) AS INT) AS dow,
           CAST(hour(ts) AS INT) AS hour,
           count(*) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1, 2
    """,
)
def event_activity_heatmap(spark, sf_dir):
    """Activity heatmap: events and distinct users by (day-of-week, hour) —
    the 2D time-binned reporting shape; output is 7x24-bounded regardless of
    corpus size. Day numbering pinned to DuckDB's dayofweek (0=Sunday)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        (F.dayofweek(F.col("ts").cast("date")) - 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "order_backlog_daily",
    """
    WITH placed AS (
        SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_placed
        FROM orders GROUP BY 1
    ),
    done AS (
        SELECT ship_day AS day, count(*) AS n_shipped FROM (
            SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS ship_day
            FROM lineitem GROUP BY l_orderkey
        ) GROUP BY 1
    ),
    days AS (
        SELECT day, coalesce(p.n_placed, 0) AS n_placed, coalesce(d.n_shipped, 0) AS n_shipped
        FROM placed p FULL OUTER JOIN done d USING (day)
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(n_placed AS BIGINT) AS n_placed,
           CAST(n_shipped AS BIGINT) AS n_shipped,
           CAST(sum(n_placed - n_shipped) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open_backlog
    FROM days
    """,
)
def order_backlog_daily(spark, sf_dir):
    """Open-order backlog over time: orders placed minus orders fully
    shipped (an order completes at its max lineitem ship date), as two
    day-grain series full-outer joined and cumulatively differenced. Both
    fact scans collapse to day grain before the (constant-size) global
    window."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    placed = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_placed"))
    done = (
        li.groupBy("l_orderkey")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_shipped"))
    )
    days = (
        placed.join(done, ["day"], "full_outer")
        .select(
            "day",
            F.coalesce("n_placed", F.lit(0)).alias("n_placed"),
            F.coalesce("n_shipped", F.lit(0)).alias("n_shipped"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return days.select(
        F.col("day").cast("string").alias("day"),
        F.col("n_placed").cast("long").alias("n_placed"),
        F.col("n_shipped").cast("long").alias("n_shipped"),
        F.sum(F.col("n_placed") - F.col("n_shipped")).over(w).cast("long").alias("open_backlog"),
    )


@register(
    "customer_value_deciles",
    """
    WITH cv AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ),
    d AS (
        SELECT o_custkey, cents,
               CAST(ntile(10) OVER (ORDER BY cents DESC, o_custkey ASC) AS INT) AS decile
        FROM cv
    )
    SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents
    FROM d GROUP BY decile
    """,
)
def customer_value_deciles(spark, sf_dir):
    """Customer-value decile profile (the 'top decile drives X% of revenue'
    analysis): ntile(10) over the customer-grain aggregate with a total
    order, then per-decile count/sum/min/max.

    Eager note: CONSTRUCTING this query runs Spark jobs (the two-phase
    rank's offset collect and localCheckpoint execute at build time), so
    registry functions in this family are not lazy plan builders —
    plan-dump/sweep tooling must reuse _PLAN_CACHE rather than rebuild
    per inspection.
    """
    orders = _t(spark, sf_dir, "orders")
    cv = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    w = Window.orderBy(F.col("cents").desc(), F.col("o_custkey").asc())
    d = cv.select("o_custkey", "cents", F.ntile(10).over(w).cast("int").alias("decile"))
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("revenue_cents"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    )


@register(
    "monthly_revenue_growth",
    """
    WITH m AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM orders GROUP BY 1
    )
    SELECT month, revenue_cents,
           CAST(revenue_cents - lag(revenue_cents) OVER (ORDER BY month)
                AS BIGINT) AS mom_delta_cents
    FROM m
    """,
)
def monthly_revenue_growth(spark, sf_dir):
    """Month-over-month revenue deltas (exact cents; lag over the month-grain
    aggregate — the global window is per-month rows, constant-size)."""
    orders = _t(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("revenue_cents"))
    w = Window.orderBy("month")
    return m.select(
        "month", "revenue_cents",
        (F.col("revenue_cents") - F.lag("revenue_cents").over(w)).alias("mom_delta_cents"),
    )


@register(
    "event_error_rate_daily",
    """
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           count(*) AS n_events,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_errors,
           CAST(count(*) FILTER (WHERE event_type = 'error') * 1000000 // count(*)
                AS BIGINT) AS error_ppm
    FROM events GROUP BY 1
    """,
)
def event_error_rate_daily(spark, sf_dir):
    """Operational monitoring: daily error-event share in exact ppm — one
    conditional aggregate per day partition, the shape an alerting rule
    consumes."""
    ev = _t(spark, sf_dir, "events")
    n_err = F.count_if(F.col("event_type") == "error")
    return ev.groupBy(
        F.col("ts").cast("date").cast("string").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        n_err.cast("long").alias("n_errors"),
        F.expr(
            "count_if(event_type = 'error') * 1000000 div count(1)"
        ).alias("error_ppm"),
    )


@register(
    "text_charset_profile",
    r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(length(regexp_replace(text, '[^ -~]', '', 'g')) * 1000000
                          // length(text) AS BIGINT) END AS printable_ascii_ppm,
           CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1000000
                          // length(text) AS BIGINT) END AS digit_ppm,
           CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) * 1000000
                          // length(text) AS BIGINT) END AS upper_ppm
    FROM documents
    """,
)
def text_charset_profile(spark, sf_dir):
    """Charset-level quality signals (printable-ASCII / digit / uppercase
    character shares in exact ppm) — the cheap first-pass filters a corpus
    pipeline runs before tokenization; pure map expressions over the scan."""
    docs = _t(spark, sf_dir, "documents")
    n = F.length("text")

    def ppm(cls: str):
        return F.when(n == 0, F.lit(0).cast("long")).otherwise(
            F.expr(f"length(regexp_replace(text, '{cls}', '')) * 1000000 div length(text)")
        )

    return docs.select(
        "doc_id",
        n.cast("long").alias("n_chars"),
        ppm("[^ -~]").alias("printable_ascii_ppm"),
        ppm("[^0-9]").alias("digit_ppm"),
        ppm("[^A-Z]").alias("upper_ppm"),
    )


@register(
    "brand_share_topn",
    """
    WITH rev AS (
        SELECT p.p_brand AS brand,
               CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand
    ),
    ranked AS (
        SELECT brand, cents,
               row_number() OVER (ORDER BY cents DESC, brand ASC) AS rk
        FROM rev
    )
    SELECT CASE WHEN rk <= 5 THEN brand ELSE 'OTHER' END AS brand_label,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_brands
    FROM ranked GROUP BY 1
    """,
)
def brand_share_topn(spark, sf_dir):
    """Top-N + OTHER reporting rollup: revenue by part brand, top 5 named,
    the tail collapsed into one OTHER bucket. The part dim broadcasts; the
    rank window runs over the BRAND-grain aggregate (tiny)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cents"))
    )
    w = Window.orderBy(F.col("cents").desc(), F.col("brand").asc())
    ranked = rev.withColumn("rk", F.row_number().over(w))
    return (
        ranked.select(
            F.when(F.col("rk") <= 5, F.col("brand")).otherwise("OTHER").alias("brand_label"),
            "cents",
        )
        .groupBy("brand_label")
        .agg(
            F.sum("cents").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_brands"),
        )
    )


@register(
    "weekday_seasonality",
    """
    WITH d AS (
        SELECT dayofweek(CAST(o_orderdate AS DATE)) AS dow,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    a AS (
        SELECT dow, count(*) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS revenue_cents
        FROM d GROUP BY dow
    )
    SELECT CAST(dow AS INT) AS dow, n_orders, revenue_cents,
           CAST(revenue_cents * 1000000 // (SELECT sum(revenue_cents) FROM a)
                AS BIGINT) AS revenue_share_ppm
    FROM a
    """,
)
def weekday_seasonality(spark, sf_dir):
    """Order revenue by day-of-week with exact integer share-of-total (ppm).
    Day numbering pinned to DuckDB's dayofweek (0=Sunday) via Spark's
    dayofweek()-1; the share denominator is a 7-row scalar broadcast."""
    orders = _t(spark, sf_dir, "orders")
    a = orders.select(
        (F.dayofweek(F.col("o_orderdate").cast("date")) - 1).cast("int").alias("dow"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("revenue_cents"),
    )
    total = a.agg(F.sum("revenue_cents")).first()[0]
    return a.select(
        "dow", "n_orders", "revenue_cents",
        F.expr(f"revenue_cents * 1000000 div {total}").alias("revenue_share_ppm"),
    )


@register(
    "event_transition_matrix",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    )
    SELECT event_type, next_type, count(*) AS n
    FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    """,
)
def event_transition_matrix(spark, sf_dir):
    """First-order Markov transition counts between event types, per-user
    sequences (lead over the user-keyed window — parallel across users; the
    matrix itself is event-type^2, constant-size)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "dist_moments",
    """
    WITH s AS (
      SELECT l_returnflag,
             count(*) AS n,
             SUM(CAST(l_quantity AS BIGINT)) AS s1,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s2,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                 * CAST(l_quantity AS BIGINT)) AS s3,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                 * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s4
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
           CAST(s3 AS BIGINT) AS s3, CAST(s4 AS BIGINT) AS s4,
           round((CAST(n AS DOUBLE) * s3 - 3.0 * s1 * s2
                  + 2.0 * s1 * s1 * s1 / n)
                 / (n * pow((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) / n / n, 1.5)),
                 6) AS skewness,
           round(n * (CAST(n AS DOUBLE) * s4 - 4.0 * s1 * s3
                      + 6.0 * s1 * s1 * s2 / n - 3.0 * s1 * s1 * s1 * s1 / n / n)
                 / pow(CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1, 2) - 3.0,
                 6) AS kurtosis_excess
    FROM s
    """,
)
def dist_moments(spark, sf_dir):
    """Skewness and excess kurtosis per return flag from INTEGER power sums
    (sum x, x^2, x^3, x^4 — quantities <= 50 keep x^4 sums far inside
    int64): the sufficient-statistics pattern for higher moments. The final
    moment formulas run on doubles of exactly-representable integers with a
    fixed operation order, so both engines produce bit-identical results
    before the round(6). One aggregation, map-side partials, no second
    pass for the mean (vs the naive two-pass algorithm)."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
        F.sum(q * q * q * q).alias("s4"),
    )
    n = F.col("n").cast("double")
    s1, s2 = F.col("s1"), F.col("s2")
    s3, s4 = F.col("s3"), F.col("s4")
    s1d = F.col("s1").cast("double")
    var_num = n * s2 - s1d * s1  # n^2 * variance
    skew = (n * s3 - 3.0 * s1 * s2 + 2.0 * s1 * s1 * s1 / F.col("n")) / (
        F.col("n") * F.pow(var_num / F.col("n") / F.col("n"), 1.5)
    )
    kurt = F.col("n") * (
        n * s4 - 4.0 * s1 * s3 + 6.0 * s1 * s1 * s2 / F.col("n")
        - 3.0 * s1 * s1 * s1 * s1 / F.col("n") / F.col("n")
    ) / F.pow(var_num, 2) - 3.0
    return s.select(
        "l_returnflag", "n", "s1", "s2", "s3", "s4",
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("kurtosis_excess"),
    )


@register(
    "time_weighted_avg",
    """
    WITH seq AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(round(value * 100) AS BIGINT) AS v_cents,
             lead(epoch_us(ts)) OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                      ORDER BY ts ASC, event_id ASC)
               - epoch_us(ts) AS dt_us
      FROM events)
    SELECT event_type, day,
           CAST(sum(v_cents * dt_us) AS BIGINT) AS weighted_sum,
           CAST(sum(dt_us) AS BIGINT) AS total_us,
           round(CAST(sum(v_cents * dt_us) AS DOUBLE) / sum(dt_us), 6) AS twa_cents
    FROM seq WHERE dt_us IS NOT NULL
    GROUP BY event_type, day
    """,
)
def time_weighted_avg(spark, sf_dir):
    """Time-weighted average (the timescaledb-style operator): each reading
    is weighted by how long it was current (lead() to the next event in the
    same (type, day) series; the day's last reading carries no weight).
    Microsecond integer weights x integer cents stay exact; ONE division at
    the end. The window partitions by (type, day) — series-parallel, no
    global sort."""
    ev = _t(spark, sf_dir, "events")
    day = F.col("ts").cast("date").cast("string").alias("day")
    w = Window.partitionBy("event_type", F.col("ts").cast("date")).orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = ev.select(
        "event_type",
        day,
        F.round(F.col("value") * 100).cast("bigint").alias("v_cents"),
        (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return seq.groupBy("event_type", "day").agg(
        F.sum(F.col("v_cents") * F.col("dt_us")).cast("bigint").alias("weighted_sum"),
        F.sum("dt_us").cast("bigint").alias("total_us"),
        F.round(
            F.sum(F.col("v_cents") * F.col("dt_us")).cast("double") / F.sum("dt_us"), 6
        ).alias("twa_cents"),
    )


@register(
    "zscore_anomaly",
    """
    WITH v AS (SELECT event_id, event_type,
                      CAST(round(value * 100) AS BIGINT) AS v_cents FROM events),
    st AS (SELECT event_type, count(*) AS n, SUM(v_cents) AS s1,
                  SUM(v_cents * v_cents) AS s2
           FROM v GROUP BY event_type)
    SELECT event_id, v.event_type, v_cents
    FROM v JOIN st ON st.event_type = v.event_type
    WHERE pow(CAST(n AS DOUBLE) * v_cents - CAST(s1 AS DOUBLE), 2)
          > 9.0 * (CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
    """,
)
def zscore_anomaly(spark, sf_dir):
    """|z| > 3 anomaly flags WITHOUT computing z: the threshold inequality
    is cleared of divisions and square roots — (n*v - s1)^2 > 9*(n*s2 -
    s1^2) — so the comparison runs on doubles of exactly-representable
    integers (deterministic across engines; no epsilon at the boundary).
    Per-type stats are a tiny aggregate broadcast back onto the stream; two
    scans, no window."""
    ev = _t(spark, sf_dir, "events")
    v = ev.select(
        "event_id", "event_type", F.round(F.col("value") * 100).cast("bigint").alias("v_cents")
    )
    st = v.groupBy(F.col("event_type").alias("st_type")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_cents").alias("s1"),
        F.sum(F.col("v_cents") * F.col("v_cents")).alias("s2"),
    )
    n = F.col("n").cast("double")
    s1d = F.col("s1").cast("double")
    j = v.join(F.broadcast(st), F.col("st_type") == F.col("event_type"))
    return j.filter(
        F.pow(n * F.col("v_cents") - s1d, 2) > 9.0 * (n * F.col("s2") - s1d * F.col("s1"))
    ).select("event_id", "event_type", "v_cents")


@register(
    "mode_per_group",
    """
    WITH counts AS (
      SELECT c_mktsegment, o_orderpriority, count(*) AS n
      FROM orders JOIN customer ON c_custkey = o_custkey
      GROUP BY c_mktsegment, o_orderpriority),
    ranked AS (
      SELECT c_mktsegment, o_orderpriority AS mode_priority, n,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY n DESC, o_orderpriority ASC) AS rk
      FROM counts)
    SELECT c_mktsegment, mode_priority, n AS n_orders
    FROM ranked WHERE rk = 1
    """,
)
def mode_per_group(spark, sf_dir):
    """Deterministic mode (most frequent order priority per market segment):
    count per (group, value), then argmax via min(struct(-n, value)) — a
    PARTIAL-AGGREGABLE reduction (ties break to the smallest value), not a
    row_number window over the counts. On high-cardinality groups the
    two-aggregation shape shuffles counts once and never sorts."""
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    counts = (
        orders.join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    best = counts.groupBy("c_mktsegment").agg(
        F.min(F.struct((-F.col("n")).alias("neg_n"), F.col("o_orderpriority").alias("v"))).alias(
            "b"
        )
    )
    return best.select(
        "c_mktsegment",
        F.col("b.v").alias("mode_priority"),
        (-F.col("b.neg_n")).cast("bigint").alias("n_orders"),
    )


@register(
    "rolling_revenue_7d",
    """
    WITH daily AS (
      SELECT o_orderpriority,
             CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day_num,
             CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders
      WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-03-01' AND DATE '1995-05-31'
      GROUP BY 1, 2, 3)
    SELECT o_orderpriority, day,
           CAST(sum(cents) OVER (PARTITION BY o_orderpriority ORDER BY day_num
                                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS rolling_7d_cents
    FROM daily
    """,
)
def rolling_revenue_7d(spark, sf_dir):
    """7-day rolling revenue per priority: aggregate to day grain FIRST
    (shrinks the window input from orders to days), then a RANGE frame over
    the integer day number — range frames handle calendar gaps correctly
    where a 7-ROW frame would silently span them."""
    orders = _t(spark, sf_dir, "orders").filter(
        filters.date_range_partition("o_orderdate", "1995-03-01", "1995-05-31")
    )
    daily = orders.groupBy(
        "o_orderpriority",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).alias(
            "day_num"
        ),
        F.col("o_orderdate").cast("date").cast("string").alias("day"),
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast("bigint").alias("cents"))
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day_num")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "o_orderpriority", "day", F.sum("cents").over(w).cast("bigint").alias("rolling_7d_cents")
    )


@register(
    "revenue_forecast",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
             AS revenue_centipct,
           count(*) AS n_lines
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
      AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def revenue_forecast(spark, sf_dir):
    """TPC-H Q6 — the pure scan-filter-aggregate: every predicate is
    sargable and reaches the parquet scan (PushedFilters on shipdate), the
    discount band compares INTEGER percent points (no float-equality traps),
    and the whole query is one map-side-combined aggregation: zero joins,
    one shuffle of one row."""
    li = _t(spark, sf_dir, "lineitem").filter(
        filters.date_range_partition("l_shipdate", "1995-01-01", "1995-12-31")
    )
    disc_pct = F.round(F.col("l_discount") * 100).cast("bigint")
    return (
        li.filter(disc_pct.between(5, 7) & (F.col("l_quantity") < 24))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint") * disc_pct)
            .cast("bigint")
            .alias("revenue_centipct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "xml_roundtrip",
    ORACLES["fake_orders_generator"],
)
def xml_roundtrip(spark, sf_dir):
    """XML interchange boundary (Spark 4 ships the former spark-xml as a
    built-in source): write the orders batch as row-tagged XML, read it back
    with an explicit schema, prove losslessness (oracle = the generator).
    Same contract as the CSV/ORC/JSONL round trips — every interchange
    format the engine claims is proven by a write-read-compare, not by
    assertion."""
    import tempfile

    from etl_mssql_to_postgres_dailysync_spark.schemas import ORDERS_SCHEMA

    path = f"{tempfile.gettempdir()}/spark_graft_xml_roundtrip"
    src = fake_orders(spark, 1000)
    (
        src.write.mode("overwrite").format("xml")
        .option("rootTag", "orders").option("rowTag", "order")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .save(path)
    )
    back = (
        spark.read.format("xml").option("rowTag", "order")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .schema(ORDERS_SCHEMA).load(path)
    )
    return back.withColumn("Amount", F.round(F.col("Amount").cast("double"), 2))


@register(
    "pii_redaction",
    """
    WITH contacts AS (
      SELECT c_custkey,
             'reach ' || c_name || ' at ' || lower(replace(c_name, ' ', '.'))
               || '@example.com or call 555-'
               || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-'
               || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
               || ' re account ' || c_name AS note
      FROM customer),
    red AS (
      SELECT c_custkey, note,
             regexp_replace(
               regexp_replace(note, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+',
                              '<EMAIL>', 'g'),
               '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
      FROM contacts)
    SELECT c_custkey, redacted,
           len(regexp_extract_all(note, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+'))
             AS n_emails,
           len(regexp_extract_all(note, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones
    FROM red
    """,
)
def pii_redaction(spark, sf_dir):
    """PII scrubbing for training-data curation: email/phone patterns are
    counted AND redacted in one projection (no second scan for the audit
    metrics); patterns are dialect-portable regex (no lookarounds). The
    synthetic contact notes are derived deterministically from the customer
    dim so the oracle constructs byte-identical input."""
    cust = _t(spark, sf_dir, "customer")
    note = F.concat(
        F.lit("reach "), F.col("c_name"), F.lit(" at "),
        F.lower(F.replace(F.col("c_name"), F.lit(" "), F.lit("."))),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" re account "), F.col("c_name"),
    )
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
    phone_re = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
    notes = cust.select("c_custkey", note.alias("note"))
    return notes.select(
        "c_custkey",
        F.regexp_replace(
            F.regexp_replace(F.col("note"), email_re, "<EMAIL>"), phone_re, "<PHONE>"
        ).alias("redacted"),
        F.size(F.regexp_extract_all(F.col("note"), F.lit(email_re), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("note"), F.lit(phone_re), F.lit(0))).alias("n_phones"),
    )


@register(
    "similarity_quantized_topk",
    f"""
    WITH normed AS (
      SELECT vec_id,
             list_transform(embedding, x ->
               x::DOUBLE / sqrt(list_dot_product(embedding::DOUBLE[],
                                                 embedding::DOUBLE[]))) AS xn
      FROM embeddings),
    g AS (SELECT max(list_max(list_transform(xn, x -> abs(x)))) AS gmax FROM normed),
    q8s AS (
      SELECT vec_id,
             list_transform(xn, x -> CAST(floor(x * 127.0 / gmax) AS BIGINT)) AS q8
      FROM normed CROSS JOIN g),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(list_dot_product(q.q8::DOUBLE[], c.q8::DOUBLE[]) AS BIGINT) AS q_score
      FROM q8s c CROSS JOIN q8s q
      WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
    cand AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY q_score DESC, neighbor_id ASC) AS qrank
      FROM scored),
    rerank AS (
      SELECT cand.query_id, cand.neighbor_id, cand.q_score,
             round(list_cosine_similarity(qe.embedding::DOUBLE[],
                                          ce.embedding::DOUBLE[]), 6) AS sim
      FROM cand
      JOIN embeddings qe ON qe.vec_id = cand.query_id
      JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
      WHERE cand.qrank <= 20),
    final AS (
      SELECT query_id, neighbor_id, q_score, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM rerank)
    SELECT query_id, neighbor_id, q_score, sim, CAST(rank AS INT) AS rank
    FROM final WHERE rank <= 5
    """,
)
def similarity_quantized_topk(spark, sf_dir):
    """Scalar-quantized ANN, the memory-bound tier of a vector index:
    vectors NORMALIZE first, then one GLOBAL signed-int8 scale (q =
    floor(x_hat * 127 / gmax); floor, never round — half-even vs half-up
    diverges across engines). A single uniform scale keeps the integer dot
    product PROPORTIONAL to cosine (per-dimension affine scaling adds
    per-vector bias terms that wreck candidate ranking — measured recall@5
    0.08 affine vs ~0.9+ normalized-global; see tools/recall_report.py), so
    the candidate sweep runs on 64-byte codes (4x smaller than float32 —
    the part that must fit in memory at corpus scale) and the top-20
    re-rank by exact cosine (the Faiss SQ8 + re-rank design). The global
    scale is one tiny aggregation; everything joins broadcast-side."""
    from etl_mssql_to_postgres_dailysync_spark.functions.vectors import norm

    emb = _t(spark, sf_dir, "embeddings")
    # materialize the norm first: referencing norm(embedding) inside the
    # transform lambda would re-evaluate the whole fold per ELEMENT
    with_norm = emb.select("vec_id", "embedding", norm(F.col("embedding")).alias("_n"))
    xn = F.transform(F.col("embedding"), lambda x: x.cast("double") / F.col("_n"))
    normed = with_norm.select("vec_id", "embedding", xn.alias("xn"))
    gmax = normed.agg(
        F.max(F.array_max(F.transform(F.col("xn"), F.abs))).alias("g")
    ).first()["g"]
    q8 = F.transform(F.col("xn"), lambda x: F.floor(x * 127.0 / F.lit(gmax)).cast("bigint"))
    codes = normed.select("vec_id", q8.alias("q8"), F.col("embedding"))
    qs = codes.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("q8").alias("qa"),
        F.col("embedding").alias("qv"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("q8"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    scored = (
        codes.join(F.broadcast(qs), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            dot.alias("q_score"), "qv", F.col("embedding").alias("cv"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("q_score").desc(), F.col("neighbor_id").asc()
    )
    cand = scored.withColumn("qrank", F.row_number().over(wq)).filter(F.col("qrank") <= 20)
    from etl_mssql_to_postgres_dailysync_spark.functions.vectors import cosine_rounded

    rerank = cand.select(
        "query_id", "neighbor_id", "q_score",
        cosine_rounded(F.col("qv"), F.col("cv")).alias("sim"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        rerank.withColumn("rank", F.row_number().over(wf).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "q_score", "sim", "rank")
    )


@register(
    "sequence_detection",
    """
    WITH e AS (
      SELECT user_id, ts, event_id, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_view
      FROM events),
    e2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts > first_view THEN ts END)
                  OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_click_after
      FROM e),
    hits AS (
      SELECT user_id, min(ts) AS converted_at
      FROM e2
      WHERE event_type = 'purchase' AND ts > first_click_after
      GROUP BY user_id)
    SELECT user_id, CAST(converted_at AS VARCHAR) AS converted_at FROM hits
    """,
)
def sequence_detection(spark, sf_dir):
    """Ordered-pattern detection (view -> click -> purchase, strictly in
    time order) — the MATCH_RECOGNIZE-style funnel: two layered running-min
    windows over ONE (user, ts) partitioning chain the 'earliest qualifying
    previous stage' through the event stream, then the first purchase after
    a qualifying click marks conversion. One shuffle by user; no self-joins
    of the event table (the naive 3-way join shape)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    e = ev.withColumn(
        "first_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    e2 = e.withColumn(
        "first_click_after",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("first_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    return (
        e2.filter(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("first_click_after"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").cast("string").alias("converted_at"))
    )


@register(
    "skew_salted_agg",
    """
    SELECT event_type, count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events GROUP BY event_type
    """,
)
def skew_salted_agg(spark, sf_dir):
    """Two-stage salted aggregation for skewed keys: stage 1 groups by
    (key, salt=hash(id)%16) so one hot key spreads over 16 reducers; stage 2
    folds the 16 partials. For algebraic aggregates the rewrite is exact —
    the oracle is the PLAIN single-stage aggregation. (Spark's partial
    aggregation usually hides moderate skew, but when a single key dominates
    a reducer — the 100 TB hot-partition case — explicit salting bounds the
    largest reduce task; same pattern as test_skew's salted JOIN.)"""
    ev = _t(spark, sf_dir, "events")
    salted = ev.groupBy(
        "event_type", (F.pmod(F.hash("event_id"), F.lit(16))).alias("_salt")
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("pc"),
    )
    return salted.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.sum("pc").cast("bigint").alias("total_cents"),
    )


@register(
    "triangle_count_degree_ordered",
    f"""
    WITH pairs AS (SELECT * FROM ({ORACLES["dedup_minhash_lsh"]})),
    und AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs),
    deg AS (SELECT a AS v, count(*) AS d FROM und GROUP BY a),
    oriented AS (
      SELECT CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.a ELSE u.b END AS src,
             CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.b ELSE u.a END AS dst,
             CASE WHEN (da.d, u.a) < (db.d, u.b) THEN db.d ELSE da.d END AS dst_d
      FROM (SELECT a, b FROM und WHERE a < b) u
      JOIN deg da ON da.v = u.a JOIN deg db ON db.v = u.b),
    two_path AS (
      SELECT e1.src, e1.dst AS v, e2.dst AS w
      FROM oriented e1 JOIN oriented e2
        ON e2.src = e1.src AND (e1.dst_d, e1.dst) < (e2.dst_d, e2.dst)),
    tri AS (
      SELECT 1 FROM two_path t
      JOIN oriented e3 ON e3.src = t.v AND e3.dst = t.w),
    outd AS (SELECT src, count(*) AS od FROM oriented GROUP BY src)
    SELECT (SELECT count(*) FROM tri) AS n_triangles,
           (SELECT count(*) FROM oriented) AS n_edges,
           (SELECT max(od) FROM outd) AS max_outdeg,
           (SELECT CASE WHEN max(od) * max(od) <= 2 * (SELECT count(*) FROM oriented)
                        THEN 1 ELSE 0 END FROM outd) AS outdeg_bound_holds
    """,
)
def triangle_count_degree_ordered(spark, sf_dir):
    """Degree-ordered triangle counting — the scale-robust variant of
    graph_triangle_count: every edge is oriented from its lower-(degree, id)
    endpoint to the higher one, so each triangle is counted exactly once
    from its lowest vertex AND the two-path fan-out per vertex is bounded by
    max out-degree <= sqrt(2m) (a theorem of this orientation — emitted as
    the oracle-checked ``outdeg_bound_holds`` contract column). On
    power-law graphs this is the difference between the hub vertex
    exploding the join (d^2 pairs) and a provably bounded candidate set;
    plain two-hop joins die on the first celebrity vertex at 100 TB."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, "text", "doc_id", num_hashes=16, bands=4, k=3)
    und = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b")).unionAll(
        pairs.select(F.col("id_b").alias("a"), F.col("id_a").alias("b"))
    )
    deg = und.groupBy(F.col("a").alias("v")).agg(F.count(F.lit(1)).alias("d"))
    e = (
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .join(deg.select(F.col("v").alias("va"), F.col("d").alias("da")), F.col("va") == F.col("a"))
        .join(deg.select(F.col("v").alias("vb"), F.col("d").alias("db")), F.col("vb") == F.col("b"))
    )
    a_first = (F.col("da") < F.col("db")) | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    oriented = e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dst_d"),
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    lt = (F.col("e1.dst_d") < F.col("e2.dst_d")) | (
        (F.col("e1.dst_d") == F.col("e2.dst_d")) & (F.col("e1.dst") < F.col("e2.dst"))
    )
    two_path = e1.join(e2, (F.col("e2.src") == F.col("e1.src")) & lt).select(
        F.col("e1.dst").alias("tv"), F.col("e2.dst").alias("tw")
    )
    tri = two_path.join(
        oriented.alias("e3"), (F.col("e3.src") == F.col("tv")) & (F.col("e3.dst") == F.col("tw"))
    )
    outd = oriented.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    return (
        tri.agg(F.count(F.lit(1)).alias("n_triangles"))
        .crossJoin(oriented.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(outd.agg(F.max("od").alias("max_outdeg")))
        .withColumn(
            "outdeg_bound_holds",
            F.when(
                F.col("max_outdeg") * F.col("max_outdeg") <= 2 * F.col("n_edges"), F.lit(1)
            ).otherwise(F.lit(0)),
        )
    )


@register(
    "cumulative_distinct_users",
    """
    WITH first_seen AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id),
    daily AS (
      SELECT first_day, count(*) AS new_users FROM first_seen GROUP BY first_day)
    SELECT CAST(first_day AS VARCHAR) AS day, new_users,
           CAST(sum(new_users) OVER (ORDER BY first_day
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_distinct_users
    FROM daily
    """,
)
def cumulative_distinct_users(spark, sf_dir):
    """Cumulative distinct users per day WITHOUT a distinct-over-window
    (which Spark rightly refuses — it would re-deduplicate an unbounded set
    per row): reduce each user to their FIRST day (one user-keyed
    aggregation), count first-appearances per day, running-sum the day-grain
    series. The only global window runs over days, not events — constant-size
    regardless of corpus scale. The first-touch reduction is the standard
    web-analytics 'new vs returning' decomposition."""
    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("first_day"))
    daily = first_seen.groupBy("first_day").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("first_day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        F.col("first_day").cast("string").alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_distinct_users"),
    )


@register(
    "robust_stats_mad",
    """
    WITH med AS (
      SELECT l_returnflag, quantile_cont(CAST(l_quantity AS BIGINT), 0.5) AS med
      FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag, m.med AS median_qty,
           quantile_cont(abs(CAST(l.l_quantity AS BIGINT) - m.med), 0.5) AS mad_qty
    FROM lineitem l JOIN med m ON m.l_returnflag = l.l_returnflag
    GROUP BY l.l_returnflag, m.med
    """,
)
def robust_stats_mad(spark, sf_dir):
    """Median absolute deviation per group — the outlier-robust scale
    estimator: exact interpolated median (Spark percentile == DuckDB
    quantile_cont on integer inputs: halves are exact in binary), then the
    median of absolute deviations from it. The group medians are a tiny
    aggregate broadcast back for the second pass — two shuffles total, both
    on the group key."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    med = li.groupBy(F.col("l_returnflag").alias("mflag")).agg(
        F.percentile(q, F.lit(0.5)).alias("med")
    )
    j = li.join(F.broadcast(med), F.col("mflag") == F.col("l_returnflag"))
    return j.groupBy("l_returnflag", F.col("med").alias("median_qty")).agg(
        F.percentile(F.abs(q - F.col("med")), F.lit(0.5)).alias("mad_qty")
    )


@register(
    "equidepth_histogram",
    """
    WITH b AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             ntile(8) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS bucket
      FROM orders)
    SELECT CAST(bucket AS INT) AS bucket, count(*) AS n_rows,
           min(cents) AS lo_cents, max(cents) AS hi_cents
    FROM b GROUP BY bucket
    """,
)
def equidepth_histogram(spark, sf_dir):
    """Equi-DEPTH histogram (quantile boundaries — equal row counts per
    bucket, data-adaptive bin edges) complementing the equi-width
    histogram_prices. The naive ``ntile() OVER (ORDER BY ...)`` is a global
    single-partition window (one task sees every row — the 100 TB trap the
    plan-sweep window gate forbids); this uses the distributed exact form
    instead: ``operators/cumsum.global_ntile`` = range-repartition +
    per-partition local rank + a #partitions-row offset collect, then the
    closed-form ntile bucket from (global rank, total). Bit-identical to
    the one-task window (the oracle runs real ntile), at range-shuffle
    cost. Approximate alternative at scale: approx_percentile boundaries +
    broadcast bucket join (cf. approx_percentile_bounds).

    Eager note: CONSTRUCTING this query runs Spark jobs (the two-phase
    rank's offset collect and localCheckpoint execute at build time), so
    registry functions in this family are not lazy plan builders —
    plan-dump/sweep tooling must reuse _PLAN_CACHE rather than rebuild
    per inspection.
    """
    from etl_mssql_to_postgres_dailysync_spark.operators.cumsum import global_ntile

    orders = _t(spark, sf_dir, "orders")
    b = global_ntile(
        orders.select("o_totalprice", "o_orderkey"),
        ["o_totalprice", "o_orderkey"],
        8,
        "bucket",
    ).select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.col("bucket").cast("int").alias("bucket"),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
    )


@register(
    "scd2_build",
    """
    WITH src AS (SELECT o_custkey, o_orderpriority, CAST(o_orderdate AS DATE) AS d,
                        o_orderkey
                 FROM orders WHERE o_custkey < 500),
    v AS (
      SELECT o_custkey, o_orderpriority,
             CAST(d AS VARCHAR) AS valid_from,
             CAST(lead(d) OVER (PARTITION BY o_custkey
                                ORDER BY d ASC, o_orderkey ASC) AS VARCHAR) AS valid_to
      FROM src)
    SELECT o_custkey, o_orderpriority, valid_from, valid_to,
           CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
    FROM v
    """,
)
def scd2_build(spark, sf_dir):
    """Build a type-2 slowly-changing dimension from a change stream: each
    change event opens a version; ``lead()`` over (key, time) closes the
    previous one (half-open [valid_from, valid_to) intervals, NULL = current)
    — the standard warehouse SCD2 derivation as ONE key-partitioned window,
    no self-join. Downstream point-in-time joins consume these intervals
    (see scd2_temporal_join)."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 500)
    src = orders.select(
        "o_custkey", "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("d"), "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy(F.col("d").asc(), F.col("o_orderkey").asc())
    return src.select(
        "o_custkey",
        "o_orderpriority",
        F.col("d").cast("string").alias("valid_from"),
        F.lead("d").over(w).cast("string").alias("valid_to"),
    ).withColumn(
        "is_current", F.when(F.col("valid_to").isNull(), F.lit(1)).otherwise(F.lit(0))
    )


@register(
    "scd2_temporal_join",
    """
    WITH dim AS (
      SELECT s_suppkey, s_acctbal AS bal, DATE '1990-01-01' AS valid_from,
             DATE '1995-07-01' AS valid_to, 1 AS ver FROM supplier
      UNION ALL
      SELECT s_suppkey, s_acctbal + 100.0, DATE '1995-07-01', DATE '2999-01-01', 2
      FROM supplier)
    SELECT ver, count(*) AS n_lines,
           CAST(sum(CAST(round(bal * 100) AS BIGINT)) AS BIGINT) AS bal_cents_sum
    FROM lineitem
    JOIN dim ON s_suppkey = l_suppkey
            AND CAST(l_shipdate AS DATE) >= valid_from
            AND CAST(l_shipdate AS DATE) < valid_to
    WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
    GROUP BY ver
    """,
)
def scd2_temporal_join(spark, sf_dir):
    """Point-in-time (temporal) join against a versioned dimension: each
    fact row joins the dim version whose [valid_from, valid_to) interval
    contains its event date. The join is an EQUI hash join on the surrogate
    key with the interval containment as residual predicate — never an
    interval-only nested loop — and the dim (2 versions/supplier here)
    broadcasts. This is how a 100 TB fact joins SCD2 dims without sorting
    either side."""
    li = _t(spark, sf_dir, "lineitem").filter(
        filters.date_range_partition("l_shipdate", "1995-01-01", "1995-12-31")
    ).select("l_suppkey", F.col("l_shipdate").cast("date").alias("d"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    v1 = supp.select(
        "s_suppkey", F.col("s_acctbal").alias("bal"),
        F.lit("1990-01-01").cast("date").alias("valid_from"),
        F.lit("1995-07-01").cast("date").alias("valid_to"), F.lit(1).alias("ver"),
    )
    v2 = supp.select(
        "s_suppkey", (F.col("s_acctbal") + 100.0).alias("bal"),
        F.lit("1995-07-01").cast("date").alias("valid_from"),
        F.lit("2999-01-01").cast("date").alias("valid_to"), F.lit(2).alias("ver"),
    )
    dim = v1.unionByName(v2)
    j = li.join(
        F.broadcast(dim),
        (F.col("s_suppkey") == F.col("l_suppkey"))
        & (F.col("d") >= F.col("valid_from"))
        & (F.col("d") < F.col("valid_to")),
    )
    return j.groupBy("ver").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.round(F.col("bal") * 100).cast("bigint")).cast("bigint").alias("bal_cents_sum"),
    )


_CHUNK_LEN = 16
_CHUNK_STRIDE = 12


@register(
    "document_chunking",
    rf"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    starts AS (
      SELECT doc_id, toks,
             unnest(range(1, greatest(len(toks) - {_CHUNK_LEN - 1}, 1) + 1,
                          {_CHUNK_STRIDE})) AS s
      FROM t),
    chunks AS (
      SELECT doc_id, CAST((s - 1) / {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
             array_to_string(toks[s : s + {_CHUNK_LEN - 1}], ' ') AS chunk_text,
             least(CAST(len(toks) AS BIGINT) - s + 1, {_CHUNK_LEN}) AS n_tokens
      FROM starts)
    SELECT doc_id, chunk_id, n_tokens,
           {_HASH15.format(x='chunk_text')} AS chunk_hash
    FROM chunks
    """,
)
def document_chunking(spark, sf_dir):
    """Overlapping token-window chunking — the RAG/pretraining prep
    operator: {_CHUNK_LEN}-token chunks at stride {_CHUNK_STRIDE} (4-token
    overlap), emitted one row per chunk with an md5 fingerprint (the
    dedupe/lineage key for chunk-level pipelines). Tokens materialize ONCE
    per document; chunk starts are a generated sequence (no self-join, no
    UDF); short docs yield their single whole-doc chunk. Chunk text is
    hashed, not shuffled, once fingerprinted."""
    docs = _t(spark, sf_dir, "documents")
    toked = docs.select("doc_id", text.tokens(text.normalize(F.col("text"))).alias("toks"))
    n = F.size("toks")
    starts = F.sequence(
        F.lit(1), F.greatest(n - F.lit(_CHUNK_LEN - 1), F.lit(1)), F.lit(_CHUNK_STRIDE)
    )
    ex = toked.select("doc_id", "toks", F.explode(starts).alias("s"))
    chunk_text = F.concat_ws(" ", F.slice(F.col("toks"), F.col("s"), _CHUNK_LEN))
    return ex.select(
        "doc_id",
        ((F.col("s") - 1) / _CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
        F.least(n.cast("bigint") - F.col("s") + 1, F.lit(_CHUNK_LEN).cast("bigint")).alias(
            "n_tokens"
        ),
        md5_long(chunk_text).alias("chunk_hash"),
    )


@register(
    "weighted_sample_topk",
    f"""
    WITH scored AS (
      SELECT o_orderkey, o_orderpriority,
             ln((CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '#91'), 1, 15)
                      AS BIGINT) % 2147483647 + 1) / 2147483647.0)
               / (round(o_totalprice * 100) / 100.0) AS score
      FROM orders)
    SELECT o_orderkey, o_orderpriority, round(score, 6) AS score
    FROM scored
    ORDER BY score DESC, o_orderkey ASC LIMIT 100
    """,
)
def weighted_sample_topk(spark, sf_dir):
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): key_i = ln(u_i)/w_i with u_i a salted-hash uniform and
    w_i the order value; the top-k keys ARE a weighted sample. One scan +
    TakeOrdered — no per-stratum passes, no rejection loops, reproducible
    across engines (hash-derived u, identical IEEE ln/div). The standard
    one-pass distributed weighted-sampling design."""
    orders = _t(spark, sf_dir, "orders")
    u = (md5_long(F.col("o_orderkey"), seed=91) % 2147483647 + 1) / F.lit(2147483647.0)
    w_ = F.round(F.col("o_totalprice") * 100) / F.lit(100.0)
    scored = orders.select(
        "o_orderkey", "o_orderpriority", (F.log(u) / w_).alias("score")
    )
    return (
        scored.select("o_orderkey", "o_orderpriority", F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "variant_props_extract",
    """
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           count(*) FILTER (CAST(json_extract(props, '$.k') AS BIGINT) > 50) AS n_high
    FROM events GROUP BY event_type
    """,
)
def variant_props_extract(spark, sf_dir):
    """Semi-structured payloads via Spark 4's VARIANT type: parse_json once
    into a variant column (binary-encoded, no schema declared up front —
    the open-content-model answer to rigid struct schemas), then typed
    variant_get path extraction feeds ordinary aggregation. At scale
    variant's binary encoding skips per-row JSON re-parsing in every
    downstream expression — parse once, extract many."""
    ev = _t(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").cast("bigint").alias("k_sum"),
        F.count_if(F.col("k") > 50).alias("n_high"),
    )


_CLOSURE_SQL_BODY = """
    sym AS (
        SELECT id_a AS a, id_b AS b FROM {pairs}
        UNION ALL SELECT id_b, id_a FROM {pairs}),
    reach(a, b, d) AS (
        SELECT a, b, 1 FROM sym
        UNION ALL
        SELECT r.a, s.b, r.d + 1 FROM reach r JOIN sym s ON s.a = r.b
        WHERE r.d < 6 AND s.b <> r.a),
    labels AS (
        SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a)
    SELECT component, count(*) AS n_members, min(doc_id) AS rep
    FROM labels GROUP BY component
"""


@register(
    "components_recursive_sql",
    f"""
    WITH RECURSIVE pairs AS (SELECT * FROM ({ORACLES["dedup_minhash_lsh"]})),
    {_CLOSURE_SQL_BODY.format(pairs="pairs")}
    """,
)
def components_recursive_sql(spark, sf_dir):
    """Connected components of the near-dup graph via Spark 4's native
    WITH RECURSIVE — the declarative twin of dedup_cluster_components'
    driver-side loop: the transitive closure grows as a recursive UNION
    (set-semantics dedupe bounds the fixpoint), labels are min-reachable-id.
    The loop version remains the 100 TB path (closure materialization is
    O(component^2) rows); this is the SQL-surface parity proof, and the
    oracle runs the IDENTICAL recursive SQL in DuckDB."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, "text", "doc_id", num_hashes=16, bands=4, k=3)
    pairs.createOrReplaceTempView("__neardup_pairs")
    return spark.sql(
        "WITH RECURSIVE " + _CLOSURE_SQL_BODY.format(pairs="__neardup_pairs")
    )


@register(
    "udtf_sentence_split",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
                                        s -> trim(s)),
                         s -> s <> '') AS sents
      FROM documents),
    st AS (SELECT doc_id,
                  unnest(list_transform(sents,
                         (x, i) -> {'s': x, 'i': i})) AS u
           FROM t)
    SELECT doc_id, CAST(u.i AS INT) AS sent_no, u.s AS sentence,
           length(u.s) AS n_chars
    FROM st
    """,
)
def udtf_sentence_split(spark, sf_dir):
    """Sentence segmentation through a Spark 4 Python UDTF — the
    extension-point for dynamic-cardinality row generators (one doc in, N
    sentences out) when logic outgrows expressions; here the segmentation
    itself is regex-simple (the built-in path would be
    explode(split(...)), cf. document_chunking which stays JVM-side) so
    the UDTF's value is demonstrating the lateral-join surface with an
    exact DuckDB oracle."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_no: int, sentence: string, n_chars: long")
    class SentenceSplit:
        def eval(self, text: str):
            i = 0
            for raw in re.split(r"[.!?]+", text):
                s = raw.strip()
                if s:
                    i += 1
                    yield i, s, len(s)

    spark.udtf.register("__sentence_split", SentenceSplit)
    docs = _t(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__docs_for_udtf")
    return spark.sql(
        "SELECT d.doc_id, s.sent_no, s.sentence, s.n_chars "
        "FROM __docs_for_udtf d, LATERAL __sentence_split(d.text) s"
    )


@register(
    "window_rank_suite",
    """
    WITH s AS (SELECT o_orderkey, o_orderpriority,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS cents
               FROM orders
               WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-03-01' AND DATE '1995-03-07')
    SELECT o_orderkey, o_orderpriority, cents,
           CAST(rank() OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           round(percent_rank() OVER w, 6) AS prnk,
           round(cume_dist() OVER w, 6) AS cdist,
           nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderpriority
                                          ORDER BY cents DESC, o_orderkey ASC
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING) AS second_best
    FROM s
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents DESC, o_orderkey ASC)
    """,
)
def window_rank_suite(spark, sf_dir):
    """The ranking-window family in one pass: rank / dense_rank /
    percent_rank / cume_dist / nth_value share ONE window definition, so
    Spark evaluates them in a single sort per partition (the WINDOW clause
    / shared WindowSpec pattern); the total order (value, key) makes every
    output — including the rational-valued percent_rank — deterministic
    cross-engine."""
    orders = _t(spark, sf_dir, "orders").filter(
        filters.date_range_partition("o_orderdate", "1995-03-01", "1995-03-07")
    )
    s = orders.select(
        "o_orderkey", "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("cents").desc(), F.col("o_orderkey").asc()
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return s.select(
        "o_orderkey", "o_orderpriority", "cents",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_best"),
    )


@register(
    "corrupt_json_handling",
    """
    WITH raw AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 10 = 0 THEN substr(props, 1, length(props) - 2)
                  ELSE props END AS payload
      FROM events),
    parsed AS (
      SELECT event_id, event_type, payload,
             CASE WHEN json_valid(payload)
                  THEN CAST(json_extract(payload, '$.k') AS BIGINT) END AS k
      FROM raw)
    SELECT event_type,
           count(*) AS n_rows,
           count(k) AS n_parsed,
           count(*) FILTER (k IS NULL) AS n_corrupt,
           CAST(sum(k) AS BIGINT) AS k_sum
    FROM parsed GROUP BY event_type
    """,
)
def corrupt_json_handling(spark, sf_dir):
    """The errors->NULL contract extended to semi-structured ingest: a 10%
    corrupted payload stream parses with from_json in PERMISSIVE mode —
    malformed rows yield NULL (never a job abort at row 3 billion), and the
    corruption rate is accounted in the SAME aggregation that consumes the
    parsed values (the reference's validation-count pattern, C-layer
    semantics applied to JSON)."""
    ev = _t(spark, sf_dir, "events")
    payload = F.when(
        F.col("event_id") % 10 == 0,
        F.substring(F.col("props"), 1, F.length("props") - 2),
    ).otherwise(F.col("props"))
    parsed = ev.select(
        "event_id", "event_type",
        F.from_json(payload, "k bigint", {"mode": "PERMISSIVE"})["k"].alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("k").alias("n_parsed"),
        F.count_if(F.col("k").isNull()).alias("n_corrupt"),
        F.sum("k").cast("bigint").alias("k_sum"),
    )


@register(
    "linear_regression_stats",
    """
    WITH s AS (
      SELECT l_returnflag,
             count(*) AS n,
             SUM(CAST(l_quantity AS BIGINT)) AS sx,
             SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
             SUM(CAST(l_quantity AS BIGINT)
                 * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
           CAST(sxx AS BIGINT) AS sxx, CAST(sxy AS BIGINT) AS sxy,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6) AS slope_cents,
           round((CAST(sy AS DOUBLE)
                  - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * sx) / n, 6)
             AS intercept_cents
    FROM s
    """,
)
def linear_regression_stats(spark, sf_dir):
    """Closed-form simple linear regression (price-per-quantity curve per
    return flag) from INTEGER sufficient statistics — n, Σx, Σy, Σx², Σxy in
    one map-side-combined aggregation, slope/intercept by the normal
    equations on doubles of exactly-representable integers (fixed op order →
    cross-engine bit-equal before round(6)). The distributed-ML pattern:
    sufficient stats shuffle, never rows."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    y = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    slope = (n * F.col("sxy") - sx * F.col("sy")) / (n * F.col("sxx") - sx * F.col("sx"))
    intercept = (sy - slope * F.col("sx")) / F.col("n")
    return s.select(
        "l_returnflag", "n", "sx", "sy", "sxx", "sxy",
        F.round(slope, 6).alias("slope_cents"),
        F.round(intercept, 6).alias("intercept_cents"),
    )


_PSI_BINS = 10
_PSI_LO, _PSI_HI = 0, 60000_00  # cents


@register(
    "drift_psi",
    f"""
    WITH binned AS (
      SELECT CASE WHEN CAST(o_orderdate AS DATE) < DATE '1995-04-01' THEN 'base'
                  ELSE 'cur' END AS period,
             least(CAST(round(o_totalprice * 100) AS BIGINT) * {_PSI_BINS}
                   // {_PSI_HI - _PSI_LO}, {_PSI_BINS - 1}) AS bin
      FROM orders
      WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-03-01' AND DATE '1995-04-30'),
    counts AS (
      SELECT bin,
             count(*) FILTER (period = 'base') AS nb,
             count(*) FILTER (period = 'cur') AS nc
      FROM binned GROUP BY bin),
    tot AS (SELECT sum(nb) AS tb, sum(nc) AS tc FROM counts)
    SELECT bin, nb, nc,
           round(CASE WHEN nb > 0 AND nc > 0
                 THEN (CAST(nb AS DOUBLE) / tb - CAST(nc AS DOUBLE) / tc)
                      * ln((CAST(nb AS DOUBLE) / tb) / (CAST(nc AS DOUBLE) / tc))
                 ELSE 0.0 END, 6) AS psi_term
    FROM counts CROSS JOIN tot
    """,
)
def drift_psi(spark, sf_dir):
    """Population-stability-index drift monitor — per-bin PSI terms for the
    order-value distribution, March (base) vs April (current): fixed-width
    integer binning (truncating div — cross-engine), per-bin counts for both
    periods in ONE conditional aggregation (never two scans), totals as a
    1-row broadcast. Empty-on-either-side bins contribute 0 by the standard
    PSI convention. Σ psi_term > 0.2 is the usual retrain/alert threshold —
    kept per-bin here so the monitor can localize WHERE the distribution
    moved."""
    orders = _t(spark, sf_dir, "orders").filter(
        filters.date_range_partition("o_orderdate", "1995-03-01", "1995-04-30")
    )
    binned = orders.select(
        F.when(F.col("o_orderdate").cast("date") < "1995-04-01", F.lit("base"))
        .otherwise(F.lit("cur"))
        .alias("period"),
        F.least(
            F.expr(
                f"CAST(round(o_totalprice * 100) AS BIGINT) * {_PSI_BINS} "
                f"div {_PSI_HI - _PSI_LO}"
            ),
            F.lit(_PSI_BINS - 1).cast("bigint"),
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.count_if(F.col("period") == "base").alias("nb"),
        F.count_if(F.col("period") == "cur").alias("nc"),
    )
    tot = counts.agg(F.sum("nb").alias("tb"), F.sum("nc").alias("tc"))
    pb = F.col("nb").cast("double") / F.col("tb")
    pc = F.col("nc").cast("double") / F.col("tc")
    term = F.when(
        (F.col("nb") > 0) & (F.col("nc") > 0), (pb - pc) * F.log(pb / pc)
    ).otherwise(F.lit(0.0))
    return counts.crossJoin(F.broadcast(tot)).select(
        "bin", "nb", "nc", F.round(term, 6).alias("psi_term")
    )


@register(
    "multimodal_audio_chunks",
    """
    WITH m AS (
      SELECT doc_id AS media_id, text,
             list_extract(['image', 'audio', 'video'],
                          CAST(doc_id % 3 + 1 AS INTEGER)) AS media_type,
             length(text) AS n
      FROM documents),
    a AS (SELECT media_id, text, n FROM m WHERE media_type = 'audio'),
    starts AS (
      SELECT media_id, text, n, unnest(range(0, least(CAST(n AS BIGINT), 4 * 192), 192)) AS pos
      FROM a),
    chunks AS (
      SELECT media_id,
             CAST(pos / 192 AS INT) AS chunk_no,
             pos AS start_byte,
             least(CAST(256 AS BIGINT), n - pos) AS n_bytes,
             CAST('0x' || substr(md5(substr(text, CAST(pos + 1 AS BIGINT), 256)), 1, 15)
                  AS BIGINT) AS chunk_hash
      FROM starts)
    SELECT media_id, chunk_no, start_byte, n_bytes, chunk_hash FROM chunks
    """,
)
def multimodal_audio_chunks(spark, sf_dir):
    """Audio chunking plumbing, end to end: binary payload column ->
    Arrow-batched overlapping byte windows (256-byte window, 192 stride, <=4
    chunks) with 60-bit md5 chunk fingerprints — the chunk-level dedupe /
    lineage substrate for audio corpora. Spark operates on REAL binary
    (mapInPandas over payload bytes); the oracle replays the same slices
    over the ASCII source text (byte slice == char slice on this fixture,
    verified), so the binary path is value-checked, not just shape-checked."""
    docs = _t(spark, sf_dir, "documents")
    media = multimodal.attach_fake_payload(docs, "doc_id", "text")
    return multimodal.chunk_audio(media, window=256, stride=192, max_chunks=4)


def _curation_oracle() -> str:
    return f"""
    WITH kept_ids AS (SELECT doc_id FROM ({_quality_pipeline_oracle()})),
    kept AS (
      SELECT d.doc_id, d.source, d.text FROM documents d
      JOIN kept_ids k ON k.doc_id = d.doc_id),
    t AS (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM kept),
    starts AS (
      SELECT doc_id, source, toks,
             unnest(range(1, greatest(len(toks) - {_CHUNK_LEN - 1}, 1) + 1,
                          {_CHUNK_STRIDE})) AS s
      FROM t),
    chunks AS (
      SELECT doc_id, source,
             least(CAST(len(toks) AS BIGINT) - s + 1, {_CHUNK_LEN}) AS n_tokens
      FROM starts)
    SELECT source,
           count(DISTINCT doc_id) AS docs_kept,
           count(*) AS n_chunks,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM chunks GROUP BY source
    """


@register("curation_pipeline_full", _curation_oracle())
def curation_pipeline_full(spark, sf_dir):
    """The composed training-data curation macro-pipeline, end to end in one
    oracle-checked query: language-ID + quality gate + exact dedup (the
    quality_filter_pipeline stage) -> surviving docs -> overlapping
    token-window chunking (the document_chunking stage) -> per-source corpus
    accounting (docs kept, chunks produced, total tokens — the numbers a
    pretraining data ticket actually quotes). Each stage reuses the
    already-verified operator; the composition itself is what's under test
    (stage wiring, no row loss between stages). One corpus scan feeds the
    score+dedup stages, one more the chunker."""
    docs = _t(spark, sf_dir, "documents")
    kept_ids = quality_filter_pipeline(spark, sf_dir).select("doc_id")
    kept = docs.join(kept_ids, "doc_id", "left_semi").select("doc_id", "source", "text")
    toked = kept.select(
        "doc_id", "source", text.tokens(text.normalize(F.col("text"))).alias("toks")
    )
    n = F.size("toks")
    starts = F.sequence(
        F.lit(1), F.greatest(n - F.lit(_CHUNK_LEN - 1), F.lit(1)), F.lit(_CHUNK_STRIDE)
    )
    chunks = toked.select(
        "doc_id", "source", n.alias("n_toks"), F.explode(starts).alias("s")
    ).select(
        "doc_id", "source",
        F.least(
            F.col("n_toks").cast("bigint") - F.col("s") + 1,
            F.lit(_CHUNK_LEN).cast("bigint"),
        ).alias("n_tokens"),
    )
    return chunks.groupBy("source").agg(
        F.count_distinct("doc_id").alias("docs_kept"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


@register(
    "asof_join_tolerance",
    """
    SELECT l.event_id, l.user_id, l.ts,
           CASE WHEN epoch_us(l.ts) - epoch_us(r.ts) <= CAST(21600 AS BIGINT) * 1000000
                THEN r.ts END AS asof_ts,
           CASE WHEN epoch_us(l.ts) - epoch_us(r.ts) <= CAST(21600 AS BIGINT) * 1000000
                THEN r.value END AS asof_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_join_tolerance(spark, sf_dir):
    """As-of join with a staleness bound (pandas merge_asof ``tolerance``):
    a matched purchase older than 6 hours is nulled out — the point-in-time
    lookup that refuses stale context. Same one-union-one-window plan as
    asof_join; the bound is a post-projection, so tolerance costs nothing
    at any scale."""
    from etl_mssql_to_postgres_dailysync_spark.operators.joins import asof_join

    events = _t(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = events.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    out = asof_join(
        clicks, purchases, ["user_id"], value_cols=["ts", "value"],
        tolerance_seconds=21600,
    )
    return out.select("event_id", "user_id", "ts", "asof_ts", "asof_value")


@register(
    "record_linkage",
    """
    WITH dirty AS (
      SELECT c_custkey + 1000000 AS d_custkey,
             CASE WHEN c_custkey % 3 = 0
                  THEN replace(c_name, 'Customer', 'Custmer')
                  WHEN c_custkey % 3 = 1
                  THEN c_name || ' '
                  ELSE c_name END AS d_name,
             c_nationkey AS d_nationkey
      FROM customer),
    blocked AS (
      SELECT c.c_custkey, d.d_custkey,
             levenshtein(trim(c.c_name), trim(d.d_name)) AS name_dist,
             CASE WHEN c.c_nationkey = d.d_nationkey THEN 1 ELSE 0 END AS nation_agree
      FROM customer c
      JOIN dirty d
        ON substr(c.c_name, length(c.c_name) - 2, 3)
         = substr(trim(d.d_name), length(trim(d.d_name)) - 2, 3)),
    scored AS (
      SELECT c_custkey, d_custkey, name_dist, nation_agree,
             (CASE WHEN name_dist = 0 THEN 40 WHEN name_dist <= 2 THEN 25 ELSE 0 END
              + nation_agree * 10) AS match_score
      FROM blocked)
    SELECT c_custkey, d_custkey, name_dist, nation_agree, match_score
    FROM scored WHERE match_score >= 35
    """,
)
def record_linkage(spark, sf_dir):
    """Record linkage / identity resolution (the MDM dedupe the reference's
    upsert pipeline implicitly assumes solved): a deterministic 'dirty' twin
    of the customer dim (typo / trailing-space corruptions) links back via
    (1) BLOCKING on a name-suffix key — the equi-join that keeps the
    candidate space linear, (2) per-field comparison vectors (edit distance,
    nation agreement), (3) Fellegi-Sunter-style additive log-odds weights
    with a match threshold. Same three-stage shape at any corpus size;
    only the blocking key choice tunes recall vs cost."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    dirty = cust.select(
        (F.col("c_custkey") + 1000000).alias("d_custkey"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Custmer")),
        )
        .when(F.col("c_custkey") % 3 == 1, F.concat(F.col("c_name"), F.lit(" ")))
        .otherwise(F.col("c_name"))
        .alias("d_name"),
        F.col("c_nationkey").alias("d_nationkey"),
    )
    blk_c = F.substring(F.col("c_name"), F.length("c_name") - 2, 3)
    blk_d = F.substring(F.trim(F.col("d_name")), F.length(F.trim(F.col("d_name"))) - 2, 3)
    blocked = cust.withColumn("blk", blk_c).join(
        dirty.withColumn("blk", blk_d), "blk"
    )
    name_dist = F.levenshtein(F.trim(F.col("c_name")), F.trim(F.col("d_name")))
    scored = blocked.select(
        "c_custkey", "d_custkey",
        name_dist.alias("name_dist"),
        F.when(F.col("c_nationkey") == F.col("d_nationkey"), F.lit(1)).otherwise(0).alias(
            "nation_agree"
        ),
    ).withColumn(
        "match_score",
        F.when(F.col("name_dist") == 0, F.lit(40))
        .when(F.col("name_dist") <= 2, F.lit(25))
        .otherwise(F.lit(0))
        + F.col("nation_agree") * 10,
    )
    return scored.filter(F.col("match_score") >= 35)


@register(
    "multimodal_image_resize",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             list_extract(['image', 'audio', 'video'],
                          CAST(doc_id % 3 + 1 AS INTEGER)) AS media_type,
             rpad(substr(text, 1, 192), 192, '.') AS padded
      FROM documents),
    img AS (SELECT media_id, padded FROM m
            WHERE media_type = 'image' AND length(padded) >= 192),
    rs AS (SELECT media_id, substr(padded, 1, 1) || substr(padded, 2, 1) || substr(padded, 3, 1) || substr(padded, 7, 1) || substr(padded, 8, 1) || substr(padded, 9, 1) || substr(padded, 13, 1) || substr(padded, 14, 1) || substr(padded, 15, 1) || substr(padded, 19, 1) || substr(padded, 20, 1) || substr(padded, 21, 1) || substr(padded, 49, 1) || substr(padded, 50, 1) || substr(padded, 51, 1) || substr(padded, 55, 1) || substr(padded, 56, 1) || substr(padded, 57, 1) || substr(padded, 61, 1) || substr(padded, 62, 1) || substr(padded, 63, 1) || substr(padded, 67, 1) || substr(padded, 68, 1) || substr(padded, 69, 1) || substr(padded, 97, 1) || substr(padded, 98, 1) || substr(padded, 99, 1) || substr(padded, 103, 1) || substr(padded, 104, 1) || substr(padded, 105, 1) || substr(padded, 109, 1) || substr(padded, 110, 1) || substr(padded, 111, 1) || substr(padded, 115, 1) || substr(padded, 116, 1) || substr(padded, 117, 1) || substr(padded, 145, 1) || substr(padded, 146, 1) || substr(padded, 147, 1) || substr(padded, 151, 1) || substr(padded, 152, 1) || substr(padded, 153, 1) || substr(padded, 157, 1) || substr(padded, 158, 1) || substr(padded, 159, 1) || substr(padded, 163, 1) || substr(padded, 164, 1) || substr(padded, 165, 1) AS out_str FROM img)
    SELECT media_id, 4 AS out_w, 4 AS out_h,
           CAST(length(out_str) AS BIGINT) AS n_bytes,
           CAST('0x' || substr(md5(out_str), 1, 15) AS BIGINT) AS content_hash
    FROM rs
    """,
)
def multimodal_image_resize(spark, sf_dir):
    '''REAL nearest-neighbor image resize over raw interleaved-RGB buffers
    (8x8x3 -> 4x4x3): the formerly codec-stubbed stage made concrete — the
    payload is the decoded pixel buffer, numpy index-selects per Arrow
    batch, and the resized BYTES are fingerprinted. The oracle recomputes
    the exact same byte selection character-wise over the ASCII source
    (byte==char on this fixture), so the kernel is value-checked, not just
    shape-checked. At scale this is the post-decode stage of an image
    pipeline: map-only, no shuffle, batch-vectorized.'''
    docs = _t(spark, sf_dir, "documents")
    need = 192
    padded = F.rpad(F.substring(F.col("text"), 1, need), need, ".")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(padded, "utf-8").alias("payload"),
    ).filter(F.col("media_type") == "image")
    return multimodal.resize_raw_images(
        media, src_w=8, src_h=8, dst_w=4, dst_h=4, channels=3
    )


@register(
    "yoy_growth",
    """
    WITH monthly AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS month_num,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM orders GROUP BY 1, 2),
    j AS (
      SELECT month, revenue_cents,
             lag(revenue_cents, 12) OVER (ORDER BY month_num) AS prev_year_cents
      FROM monthly)
    SELECT month, revenue_cents, prev_year_cents,
           CAST(((revenue_cents - prev_year_cents) * 1000000) // prev_year_cents
                AS BIGINT) AS yoy_growth_ppm
    FROM j WHERE prev_year_cents IS NOT NULL AND prev_year_cents > 0
    """,
)
def yoy_growth(spark, sf_dir):
    """Year-over-year growth — the ratio-to-prior-period report: month-grain
    aggregation first (shrinks the window input to months), lag(12) over a
    gap-free month NUMBER (year*12+month — lag by ROWS over formatted
    strings silently breaks on missing months; a numeric axis makes the
    offset calendar-correct for contiguous data), growth in exact
    integer ppm (truncating div, both engines). The global month window
    is constant-size at any corpus scale."""
    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("bigint")
        .alias("month_num"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("revenue_cents")
    )
    w = Window.orderBy("month_num")
    j = monthly.select(
        "month", "revenue_cents", F.lag("revenue_cents", 12).over(w).alias("prev_year_cents")
    )
    return j.filter(F.col("prev_year_cents").isNotNull() & (F.col("prev_year_cents") > 0)).select(
        "month", "revenue_cents", "prev_year_cents",
        F.expr("((revenue_cents - prev_year_cents) * 1000000) div prev_year_cents")
        .cast("bigint")
        .alias("yoy_growth_ppm"),
    )


@register(
    "null_safe_join",
    """
    WITH l AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderpriority END AS grp
      FROM orders WHERE o_orderkey < 2000),
    r AS (
      SELECT DISTINCT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                           ELSE o_orderpriority END AS grp
      FROM orders WHERE o_orderkey < 2000)
    SELECT coalesce(l.grp, '<NULL>') AS grp_key, count(*) AS n_matched
    FROM l JOIN r ON l.grp IS NOT DISTINCT FROM r.grp
    GROUP BY 1
    """,
)
def null_safe_join(spark, sf_dir):
    """NULL-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
    each other instead of silently dropping — the semantics dirty-key ETL
    joins actually need (a plain equi-join discards every NULL-keyed row
    with no error). Spark plans eqNullSafe as a HASH join (the null bucket
    is just another key), not a nested loop."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    grp_l = F.when(F.col("o_orderkey") % 5 == 0, F.lit(None)).otherwise(
        F.col("o_orderpriority")
    )
    grp_r = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
        F.col("o_orderpriority")
    )
    l = orders.select("o_orderkey", grp_l.alias("lgrp"))
    r = orders.select(grp_r.alias("rgrp")).distinct()
    return (
        l.join(F.broadcast(r), F.col("lgrp").eqNullSafe(F.col("rgrp")))
        .groupBy(F.coalesce(F.col("lgrp"), F.lit("<NULL>")).alias("grp_key"))
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )


@register(
    "latest_per_key",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders)
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS latest_orderdate,
           CAST(round(o_totalprice * 100) AS BIGINT) AS latest_cents
    FROM ranked WHERE rn = 1
    """,
)
def latest_per_key(spark, sf_dir):
    """Latest-record-per-key (the CDC compaction / last-wins dedup primitive
    the merge family uses internally, exposed standalone): one key-
    partitioned window with a TOTAL order (ts desc, id desc — ties must
    break deterministically or two engines disagree on 'latest'). At scale
    prefer the max_by/struct-min aggregation twin when only a few columns
    are carried (partial-aggregable, no sort); row_number wins when the
    whole row survives."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").cast("date").cast("string").alias("latest_orderdate"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("latest_cents"),
        )
    )


@register(
    "concurrent_sessions_peak",
    """
    WITH sess AS (
      SELECT user_id, ts AS start_ts, ts + INTERVAL 30 MINUTE AS end_ts
      FROM events WHERE event_type = 'signup'),
    pts AS (
      SELECT CAST(start_ts AS DATE) AS day, epoch_us(start_ts) AS t, 1 AS delta FROM sess
      UNION ALL
      SELECT CAST(start_ts AS DATE) AS day, epoch_us(end_ts) AS t, -1 AS delta FROM sess),
    swept AS (
      SELECT day, t,
             sum(delta) OVER (PARTITION BY day ORDER BY t ASC, delta ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
      FROM pts)
    SELECT CAST(day AS VARCHAR) AS day, CAST(max(live) AS BIGINT) AS peak_concurrent
    FROM swept GROUP BY day
    """,
)
def concurrent_sessions_peak(spark, sf_dir):
    """Peak concurrency via sweep-line: every interval becomes a +1 start
    and a -1 end event, a running sum over the time-ordered events is the
    live-session count, its max is the peak — O(n log n) against the naive
    O(n^2) interval-overlap self-join. Ends sort BEFORE starts at equal
    timestamps (delta ASC), the half-open-interval convention. Partitioned
    by day so the sweep parallelizes; cross-midnight sessions here attribute
    to their start day (stated contract)."""
    ev = _t(spark, sf_dir, "events")
    sess = ev.filter(F.col("event_type") == "signup").select(
        F.col("ts").cast("date").alias("day"),
        F.unix_micros("ts").alias("start_us"),
        (F.unix_micros("ts") + 30 * 60 * 1_000_000).alias("end_us"),
    )
    pts = sess.select("day", F.col("start_us").alias("t"), F.lit(1).alias("delta")).unionAll(
        sess.select("day", F.col("end_us").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("day")
        .orderBy(F.col("t").asc(), F.col("delta").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = pts.withColumn("live", F.sum("delta").over(w))
    return swept.groupBy(F.col("day").cast("string").alias("day")).agg(
        F.max("live").cast("bigint").alias("peak_concurrent")
    )


# ---------------------------------------------------------------------------
# Round-2 additions: corpus-curation rules the large LM pipelines run
# (Gopher repetition filters, benchmark decontamination, domain mixing)
# ---------------------------------------------------------------------------

_BIGRAM_CTE = rf"""
    nt AS (SELECT doc_id, regexp_split_to_array({_NORM_SQL}, ' ') AS toks FROM documents),
    nb AS (SELECT doc_id, toks, len(toks) AS n_words,
                  length(array_to_string(toks, ' ')) - len(toks) + 1 AS n_tok_chars
           FROM nt),
    bg AS (SELECT doc_id,
                  CAST('0x' || substr(md5(toks[i] || ' ' || toks[i+1]), 1, 15) AS BIGINT) AS bgh
           FROM nb, unnest(range(1, greatest(n_words - 1, 0) + 1)) AS u(i)),
    bgc AS (SELECT doc_id, bgh, count(*) AS cnt FROM bg GROUP BY 1, 2),
    rep AS (SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS total_bg,
                   sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS dup_cnt
            FROM bgc GROUP BY 1)
"""


@register(
    "gopher_quality_rules",
    rf"""
    WITH {_BIGRAM_CTE}
    SELECT nb.doc_id AS doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST((n_tok_chars * 1000000) // n_words AS BIGINT) AS mean_word_len_ppm,
           CAST((top_cnt * 1000000) // total_bg AS BIGINT) AS top_bigram_ppm,
           CAST((dup_cnt * 1000000) // total_bg AS BIGINT) AS dup_bigram_ppm,
           coalesce(n_words >= 30 AND n_words <= 2000
                    AND (n_tok_chars * 1000000) // n_words BETWEEN 3000000 AND 12000000
                    AND (top_cnt * 1000000) // total_bg <= 120000
                    AND (dup_cnt * 1000000) // total_bg <= 400000, FALSE) AS keep
    FROM nb LEFT JOIN rep ON nb.doc_id = rep.doc_id
    """,
)
def gopher_quality_rules(spark, sf_dir):
    """Gopher-style repetition/quality filter (Rae et al. 2021 §A1.1): word
    count, mean word length, top-bigram and duplicate-bigram mass — all
    integer-ppm — with the keep/drop verdict. Document text never shuffles
    (only 60-bit bigram hashes); both aggregations partial-aggregate
    map-side, so the rule scan stays linear at corpus scale."""
    stats = text.repetition_stats(_t(spark, sf_dir, "documents"), "text", "doc_id")
    return stats.withColumn(
        "keep",
        F.coalesce(
            (F.col("n_words") >= 30) & (F.col("n_words") <= 2000)
            & F.col("mean_word_len_ppm").between(3_000_000, 12_000_000)
            & (F.col("top_bigram_ppm") <= 120_000)
            & (F.col("dup_bigram_ppm") <= 400_000),
            F.lit(False),
        ),
    )


@register(
    "decontamination_overlap",
    rf"""
    WITH {_SHINGLES_CTE},
    eval_sh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
    corpus AS (SELECT doc_id, sh FROM sh WHERE doc_id % 97 <> 0),
    sz AS (SELECT doc_id, count(*) AS n_sh FROM corpus GROUP BY 1),
    hits AS (SELECT c.doc_id, count(*) AS n_matched
             FROM corpus c JOIN eval_sh e ON c.sh = e.sh GROUP BY 1)
    SELECT h.doc_id AS doc_id, n_matched, n_sh,
           (n_matched * 1000000) // n_sh AS contamination_ppm
    FROM hits h JOIN sz USING (doc_id)
    """,
)
def decontamination_overlap(spark, sf_dir):
    """Benchmark decontamination (GPT-3 appx C / Gopher style): flag training
    documents sharing word-shingles with a held-out eval set (here the
    deterministic doc_id % 97 == 0 slice). The eval side collapses to a
    DISTINCT shingle-hash set and BROADCASTS — the corpus never shuffles for
    the probe; per-doc overlap is one map-side-partial count. At 100 TB the
    eval set is the benchmark suite (tiny by construction), so the broadcast
    always fits."""
    docs = _t(spark, sf_dir, "documents")
    shingled = docs.select(
        "doc_id",
        dedup.shingle_hashes_arrow(F.col("text"), 3).alias("shingles"),
    ).withColumn("n_sh", F.size("shingles"))
    is_eval = F.col("doc_id") % 97 == 0
    eval_sh = (
        shingled.filter(is_eval)
        .select(F.explode("shingles").alias("sh")).distinct()
    )
    corpus = shingled.filter(~is_eval).select(
        "doc_id", "n_sh", F.explode("shingles").alias("sh")
    )
    return (
        corpus.join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id", "n_sh")
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .select(
            "doc_id", "n_matched", F.col("n_sh").cast("long").alias("n_sh"),
            F.expr("n_matched * 1000000 div n_sh").alias("contamination_ppm"),
        )
    )


@register(
    "domain_mixing_weights",
    rf"""
    WITH tok AS (
        SELECT source,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
        FROM documents),
    per AS (SELECT source, count(*) AS n_docs, sum(n_tokens) AS tokens
            FROM tok GROUP BY 1),
    w AS (SELECT *, (tokens * 1000000) // (SELECT sum(tokens) FROM per) AS weight_ppm
          FROM per),
    c AS (SELECT *, least(weight_ppm, 150000) AS capped FROM w)
    SELECT source, n_docs, CAST(tokens AS BIGINT) AS tokens,
           CAST(weight_ppm AS BIGINT) AS weight_ppm,
           CAST((capped * 1000000) // (SELECT sum(capped) FROM c) AS BIGINT) AS mix_ppm
    FROM c
    """,
)
def domain_mixing_weights(spark, sf_dir):
    """Training-mixture weights per source domain (The-Pile-style): token
    share in ppm, then a per-domain cap + renormalization so no domain
    exceeds 15% of the mixture. Two scalar totals decorrelate into broadcast
    joins (the Q11 pattern); everything is integer arithmetic."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.select(
        "source", text.token_count(F.col("text")).cast("long").alias("n_tokens")
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("tokens")
    )
    total = per.agg(F.sum("tokens").alias("__tot__"))
    w = per.crossJoin(F.broadcast(total)).select(
        "source", "n_docs", "tokens",
        F.expr("tokens * 1000000 div __tot__").alias("weight_ppm"),
    ).withColumn("capped", F.least(F.col("weight_ppm"), F.lit(150_000)))
    ctot = w.agg(F.sum("capped").alias("__ctot__"))
    return w.crossJoin(F.broadcast(ctot)).select(
        "source", "n_docs", "tokens", "weight_ppm",
        F.expr("capped * 1000000 div __ctot__").alias("mix_ppm"),
    )


def _pq_oracle_ctes(m: int, k: int, d: int, iters: int,
                    train_sample: int = similarity.TRAIN_SAMPLE_DEFAULT) -> str:
    """DuckDB twin of similarity.pq_fit_list + PQ encode + ADC scoring:
    per-subspace k-means chains (same exactness contract as
    _kmeans_oracle_ctes — micro-unit ints, int64 distances, truncating
    integer-mean update, shared md5-smallest-k seed rows), a final
    assignment per subspace (the PQ code), and per-subspace partial ADC
    distances that sum into the full asymmetric distance. ``tr`` replays
    the fit-side hash-priority sample cap; encode/ADC still cover the full
    corpus ``q``."""
    from etl_mssql_to_postgres_dailysync_spark.functions.hashing import md5_long_sql

    md5v = md5_long_sql("CAST(vid AS VARCHAR)")

    def dist(base: str, qv: str, cw: str) -> str:
        return (f"list_sum(list_transform(generate_series(1, {d}), "
                f"i -> ({qv}[{base} + i]-{cw}[i])*({qv}[{base} + i]-{cw}[i])))")

    out = f"""
    q AS (SELECT vec_id AS vid, embedding,
                 list_transform(embedding::DOUBLE[],
                                x -> CAST(round(x * {similarity.QUANT_SCALE}) AS BIGINT)) AS qv
          FROM embeddings),
    tr AS (SELECT vid, qv FROM q ORDER BY {md5v}, vid LIMIT {train_sample}),
    seeds AS (SELECT vid, qv, row_number() OVER (ORDER BY {md5v}, vid) - 1 AS code_id
              FROM tr ORDER BY {md5v}, vid LIMIT {k})"""
    pd_names = []
    for s in range(m):
        base = s * d
        out += f""",
    cb{s}_0 AS (SELECT code_id,
                       list_transform(generate_series(1, {d}), i -> qv[{base} + i]) AS cw
                FROM seeds)"""
        for it in range(iters):
            out += f""",
    a{s}_{it} AS (SELECT vid, qv, code_id FROM (
         SELECT q.vid, q.qv, c.code_id,
                row_number() OVER (PARTITION BY q.vid
                                   ORDER BY {dist(base, 'q.qv', 'c.cw')}, c.code_id) AS rn
         FROM tr q CROSS JOIN cb{s}_{it} c) WHERE rn = 1),
    s{s}_{it} AS (SELECT code_id, t.i AS pos, sum(qv[{base} + t.i]) AS su, count(*) AS n
         FROM a{s}_{it}, generate_series(1, {d}) t(i) GROUP BY 1, 2),
    n{s}_{it} AS (SELECT code_id, list(CAST(su // n AS BIGINT) ORDER BY pos) AS cw
             FROM s{s}_{it} GROUP BY 1),
    cb{s}_{it + 1} AS (SELECT c.code_id, coalesce(n.cw, c.cw) AS cw
                    FROM cb{s}_{it} c LEFT JOIN n{s}_{it} n USING (code_id))"""
        out += f""",
    e{s} AS (SELECT vid, code_id FROM (
         SELECT q.vid, c.code_id,
                row_number() OVER (PARTITION BY q.vid
                                   ORDER BY {dist(base, 'q.qv', 'c.cw')}, c.code_id) AS rn
         FROM q CROSS JOIN cb{s}_{iters} c) WHERE rn = 1),
    pd{s} AS (SELECT qq.vid AS query_id, e.vid AS neighbor_id,
                     {dist(base, 'qq.qv', 'c.cw')} AS dd
              FROM e{s} e JOIN cb{s}_{iters} c USING (code_id)
              CROSS JOIN (SELECT vid, qv FROM q WHERE vid < 10) qq)"""
        pd_names.append(f"pd{s}")
    union = " UNION ALL ".join(f"SELECT * FROM {n}" for n in pd_names)
    out += f""",
    adc AS (SELECT query_id, neighbor_id, sum(dd) AS adc_dist
            FROM ({union}) GROUP BY 1, 2)"""
    return out


_PQ_M, _PQ_K, _PQ_D, _PQ_ITERS, _PQ_NCAND = 8, 32, 8, 2, 64


@register(
    "similarity_pq_adc",
    f"""
    WITH {_pq_oracle_ctes(_PQ_M, _PQ_K, _PQ_D, _PQ_ITERS)},
    cand AS (
        SELECT query_id, neighbor_id, CAST(adc_dist AS BIGINT) AS adc_dist,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc_dist ASC, neighbor_id ASC) AS qrank
        FROM adc WHERE query_id <> neighbor_id),
    rerank AS (
        SELECT cand.query_id, cand.neighbor_id, cand.adc_dist,
               round(list_cosine_similarity(qe.embedding::DOUBLE[],
                                            ce.embedding::DOUBLE[]), 6) AS sim
        FROM cand
        JOIN embeddings qe ON qe.vec_id = cand.query_id
        JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
        WHERE cand.qrank <= {_PQ_NCAND}),
    final AS (
        SELECT query_id, neighbor_id, adc_dist, sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id ASC) AS rank
        FROM rerank)
    SELECT query_id, neighbor_id, adc_dist, sim, CAST(rank AS INT) AS rank
    FROM final WHERE rank <= 5
    """,
)
def similarity_pq_adc(spark, sf_dir):
    """Product-quantization ANN with asymmetric-distance scan (Jégou et al.
    2011; the Faiss PQ + refine design): 8 sub-codebooks x 16 codewords turn
    each 64-dim vector into 8 small codes (32x smaller than float32 — the
    tier that must fit in memory at corpus scale), every (query, corpus)
    pair scores through per-query int64 lookup tables (the corpus floats
    are never touched during the scan), top-24 ADC candidates re-rank by
    exact cosine. The oracle replays ALL EIGHT per-subspace k-means chains,
    the encoding, and the table distances bit-for-bit."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.pq_adc_topk(
        emb.filter(F.col("vec_id") < 10), emb,
        k=5, m=_PQ_M, codebook_k=_PQ_K, iters=_PQ_ITERS,
        n_candidates=_PQ_NCAND,
    ).withColumn("rank", F.col("rank").cast("int"))


@register(
    "multimodal_dhash_neardup",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             list_extract(['image', 'audio', 'video'],
                          CAST(doc_id % 3 + 1 AS INTEGER)) AS media_type,
             rpad(substr(text, 1, 192), 192, '.') AS padded
      FROM documents),
    img AS (SELECT media_id, padded FROM m WHERE media_type = 'image'),
    gr AS (SELECT media_id,
                  list_transform(generate_series(0, 63), p ->
                      (ord(substr(padded, 3*p + 1, 1))
                       + ord(substr(padded, 3*p + 2, 1))
                       + ord(substr(padded, 3*p + 3, 1))) // 3) AS g
           FROM img),
    dh AS (SELECT media_id,
                  list_sum(list_transform(generate_series(0, 55), b ->
                      CASE WHEN g[(b // 7) * 8 + (b % 7) + 1]
                                < g[(b // 7) * 8 + (b % 7) + 2]
                           THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END))
                  AS dhash
           FROM gr),
    bands AS (SELECT media_id, dhash, t.i AS band,
                     (dhash >> (14 * t.i)) & 16383 AS bv
              FROM dh, generate_series(0, 3) t(i)),
    pairs AS (SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                     a.dhash AS ha, b.dhash AS hb
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.bv = b.bv AND a.media_id < b.media_id)
    SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM pairs WHERE bit_count(xor(ha, hb)) <= 10
    """,
)
def multimodal_dhash_neardup(spark, sf_dir):
    """Perceptual near-duplicate detection for images: REAL dHash (integer
    grayscale + adjacent-pixel comparisons packed into 56 bits, numpy per
    Arrow batch) over the raw-RGB payloads, then LSH banding on the hash (4
    x 14-bit bands — identical-band candidates only, the same band-join
    shape as MinHash LSH) and a Hamming <= 10 verify via bit_count(xor).
    The oracle recomputes grayscale, every hash bit, the banding, and the
    Hamming filter character-wise. At scale: hashing is map-only; the only
    shuffle is (band, value) candidate buckets — never pixels."""
    docs = _t(spark, sf_dir, "documents")
    padded = F.rpad(F.substring(F.col("text"), 1, 192), 192, ".")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(padded, "utf-8").alias("payload"),
    ).filter(F.col("media_type") == "image")
    dh = multimodal.dhash_images(media, src_w=8, src_h=8, channels=3)
    bands = dh.select(
        "media_id", "dhash",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("band"),
    ).withColumn("bv", F.expr("shiftright(dhash, 14 * band) & 16383"))
    a = bands.select(F.col("media_id").alias("id_a"), F.col("dhash").alias("ha"),
                     "band", "bv")
    b = bands.select(F.col("media_id").alias("id_b"), F.col("dhash").alias("hb"),
                     "band", "bv")
    pairs = (
        a.join(b, ["band", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
        .distinct()
    )
    return pairs.select(
        "id_a", "id_b",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("bigint").alias("hamming"),
    ).filter(F.col("hamming") <= 10)


# ---------------------------------------------------------------------------
# r3 tranche — containment dedup, apportionment, inequality/quality stats,
# sliding-distinct, CUSUM, quantization error. All outputs scalar + BIGINT
# (the two driver-canonicalizer hazards: no arrays, no HUGEINT drift).
# ---------------------------------------------------------------------------


@register(
    "dedup_shingle_containment",
    f"""
    WITH {_SHINGLES_CTE},
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.source = b.source AND a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST((inter * 1000000) // sa.n AS BIGINT) AS containment_a_ppm,
           CAST((inter * 1000000) // sb.n AS BIGINT) AS containment_b_ppm,
           CAST((inter * 1000000) // least(sa.n, sb.n) AS BIGINT) AS containment_ppm
    FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
    WHERE (inter * 1000000) // least(sa.n, sb.n) >= 500000
    """,
)
def dedup_shingle_containment(spark, sf_dir):
    """Asymmetric containment near-dup (excerpt/quote detection): pairs
    where the smaller shingle set is >= 50% contained in the larger. The
    complement of Jaccard dedup — a 200-token excerpt of a 10k-token doc
    scores ~1.0 containment but ~0.02 Jaccard, so threshold-Jaccard alone
    ships the duplicate text twice. Same inverted-index plan (posting
    lists on 8-byte hashes, no self-join of the text)."""
    return dedup.shingle_containment_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        k=3, threshold=0.5, block_col="source",
    )


@register(
    "intra_doc_repetition",
    rf"""
    WITH tk AS (SELECT doc_id, unnest({_TOKS_SQL}) AS t FROM documents),
    cnt AS (SELECT doc_id, t, count(*) AS c FROM tk GROUP BY 1, 2),
    agg AS (
        SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct,
               min(struct_pack(nc := -c, t := t)) AS top
        FROM cnt GROUP BY doc_id)
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST((n_distinct * 1000000) // n_tokens AS BIGINT) AS distinct_ratio_ppm,
           CAST(((-top.nc) * 1000000) // n_tokens AS BIGINT) AS top_token_ppm
    FROM agg WHERE n_tokens > 0
    """,
)
def intra_doc_repetition(spark, sf_dir):
    """Within-document repetition profile — type/token ratio and the mass of
    the single most-repeated token (ties -> lexicographically smallest via
    min over (-count, token), identical in both engines) — the
    intra-document half of repetition quality filtering (the Gopher rules
    cover bigram repetition). One explode + two partial-agg shuffles on
    (doc, token); text itself never shuffles beyond the token split."""
    docs = _t(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id", F.explode(text.tokens(text.normalize(F.col("text")))).alias("t")
    )
    cnt = tk.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.min(F.struct((-F.col("c")).alias("nc"), F.col("t").alias("t"))).alias("top"),
    )
    return agg.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.expr("n_distinct * 1000000 div n_tokens").alias("distinct_ratio_ppm"),
        F.expr("(-top.nc) * 1000000 div n_tokens").alias("top_token_ppm"),
    )


@register(
    "doc_length_log_histogram",
    """
    WITH b AS (SELECT doc_id, n_chars,
                      CAST(length(printf('%b', n_chars + 1)) - 1 AS BIGINT) AS bucket
               FROM documents)
    SELECT bucket,
           CAST(1 << bucket AS BIGINT) AS bucket_lo,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM b GROUP BY bucket
    """,
)
def doc_length_log_histogram(spark, sf_dir):
    """Power-of-two document-length histogram (the shard-size planning
    view). floor(log2(n+1)) is computed as the INTEGER bit length of n+1
    (length of the binary rendering minus one) in both engines — never
    float log2, whose boundary ulps can disagree cross-engine. Pure
    map + one tiny groupBy on ~20 buckets; partial-aggregates map-side."""
    docs = _t(spark, sf_dir, "documents")
    bucket = (F.length(F.bin(F.col("n_chars") + 1)) - 1).cast("long")
    return (
        docs.select("doc_id", "n_chars", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .select(
            "bucket",
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))").alias("bucket_lo"),
            "n_docs", "total_chars", "min_chars", "max_chars",
        )
    )


_TOKEN_BUDGET = 100_000


@register(
    "token_budget_allocation",
    rf"""
    WITH tok AS (
        SELECT source,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
        FROM documents),
    per AS (SELECT source, sum(n_tokens) AS tokens FROM tok GROUP BY 1),
    quota AS (SELECT source, tokens,
                     ({_TOKEN_BUDGET} * tokens) // (SELECT sum(tokens) FROM per) AS base,
                     ({_TOKEN_BUDGET} * tokens) % (SELECT sum(tokens) FROM per) AS rem
              FROM per),
    ranked AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source ASC) AS rk,
                      (SELECT {_TOKEN_BUDGET} - sum(base) FROM quota) AS leftover
               FROM quota)
    SELECT source, CAST(tokens AS BIGINT) AS tokens,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc_tokens
    FROM ranked
    """,
)
def token_budget_allocation(spark, sf_dir):
    """Integer apportionment of a global token budget across source domains
    by the largest-remainder method (Hamilton): exact floor quotas, then the
    leftover units go to the largest fractional remainders (ties -> source
    asc). Allocations sum EXACTLY to the budget — proportional-float
    rounding doesn't. Two scalar broadcasts (total tokens, leftover) + one
    rank window over the per-source grain (bounded by source cardinality,
    not data size)."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.select(
        "source", text.token_count(F.col("text")).cast("long").alias("n_tokens")
    ).groupBy("source").agg(F.sum("n_tokens").alias("tokens"))
    tot = per.agg(F.sum("tokens").alias("__tot__"))
    quota = per.crossJoin(F.broadcast(tot)).select(
        "source", "tokens",
        F.expr(f"({_TOKEN_BUDGET} * tokens) div __tot__").alias("base"),
        F.expr(f"({_TOKEN_BUDGET} * tokens) % __tot__").alias("rem"),
    )
    leftover = quota.agg(
        (F.lit(_TOKEN_BUDGET) - F.sum("base")).alias("__left__")
    )
    w = Window.orderBy(F.desc("rem"), F.asc("source"))
    ranked = quota.withColumn("rk", F.row_number().over(w)).crossJoin(
        F.broadcast(leftover)
    )
    return ranked.select(
        "source", "tokens",
        (F.col("base")
         + F.when(F.col("rk") <= F.col("__left__"), 1).otherwise(0)).cast("long")
        .alias("alloc_tokens"),
    )


@register(
    "revenue_gini_by_nation",
    """
    WITH cust AS (
        SELECT c_custkey, n_name,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey
        GROUP BY 1, 2),
    rk AS (SELECT *, row_number() OVER (PARTITION BY n_name
                                        ORDER BY cents ASC, c_custkey ASC) AS i
           FROM cust),
    agg AS (SELECT n_name, count(*) AS n, sum(cents) AS tot, sum(i * cents) AS iws
            FROM rk GROUP BY 1)
    SELECT n_name, CAST(n AS BIGINT) AS n_customers,
           CAST(tot AS BIGINT) AS total_cents,
           CAST((2 * iws - (n + 1) * tot) * 1000000 // (n * tot) AS BIGINT) AS gini_ppm
    FROM agg WHERE tot > 0
    """,
)
def revenue_gini_by_nation(spark, sf_dir):
    """Revenue-concentration Gini coefficient per nation over customer
    lifetime value, via the rank-sum identity G = (2*Σ(i*x_i) - (n+1)*Σx)
    / (n*Σx) with x ascending — one window rank + one aggregation, all
    integer cents (exact, engine-portable), no O(n^2) pair differences.
    The window partitions by nation, so ranking parallelizes across
    nations; per-nation customer counts bound each sort.

    Spark computes the Gini fold on DECIMAL(38,0): 2*Σ(i*cents)*1e6 crosses
    int64 already at sf0.1 (iws ≈ 4.5e13 per nation → ×2e6 ≈ 9e19 > 2^63,
    found as a wrapped-negative gini_ppm by the r5 sf0.1 parity snapshot);
    decimal carries to ~1e38. DuckDB needs nothing — integer sum() is
    HUGEINT natively. Numerator is ≥0 by construction (x ascending), so
    Spark's truncating div == DuckDB's flooring //."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = (
        orders.join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "n_name")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
    )
    w = Window.partitionBy("n_name").orderBy(F.asc("cents"), F.asc("c_custkey"))
    rk = cents.withColumn("i", F.row_number().over(w))
    agg = rk.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("tot"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents")).alias("iws"),
    )
    return agg.filter(F.col("tot") > 0).select(
        "n_name",
        F.col("n").cast("long").alias("n_customers"),
        F.col("tot").cast("long").alias("total_cents"),
        F.expr(
            "cast((2 * iws - (n + 1) * cast(tot as decimal(38,0))) * 1000000"
            " div (cast(n as decimal(38,0)) * tot) as bigint)"
        ).alias("gini_ppm"),
    )


@register(
    "ship_latency_histogram",
    """
    WITH d AS (
        SELECT o_orderpriority,
               datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS delay
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
    b AS (SELECT o_orderpriority,
                 CASE WHEN delay <= 7  THEN 'week_1'
                      WHEN delay <= 14 THEN 'week_2'
                      WHEN delay <= 30 THEN 'month_1'
                      WHEN delay <= 60 THEN 'month_2'
                      WHEN delay <= 90 THEN 'month_3'
                      ELSE 'over_90d' END AS bucket
          FROM d),
    c AS (SELECT o_orderpriority, bucket, count(*) AS n FROM b GROUP BY 1, 2),
    t AS (SELECT o_orderpriority, sum(n) AS tot FROM c GROUP BY 1)
    SELECT c.o_orderpriority, c.bucket, CAST(c.n AS BIGINT) AS n_lines,
           CAST((c.n * 1000000) // t.tot AS BIGINT) AS share_ppm
    FROM c JOIN t USING (o_orderpriority)
    """,
)
def ship_latency_histogram(spark, sf_dir):
    """Order-to-ship latency distribution per order priority (the SLA view):
    fixed day buckets, counts, and integer-ppm share of the priority's
    lines. The orders side joins on the shuffle-free broadcast path only if
    small — here it's the fact-fact equi-join on l_orderkey (AQE picks the
    strategy); the share join is priority-cardinality-sized and broadcast."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    d = li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
    delay = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    bucket = (
        F.when(delay <= 7, "week_1")
        .when(delay <= 14, "week_2")
        .when(delay <= 30, "month_1")
        .when(delay <= 60, "month_2")
        .when(delay <= 90, "month_3")
        .otherwise("over_90d")
    )
    c = d.select("o_orderpriority", bucket.alias("bucket")).groupBy(
        "o_orderpriority", "bucket"
    ).agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("o_orderpriority").agg(F.sum("n").alias("tot"))
    return c.join(F.broadcast(t), "o_orderpriority").select(
        "o_orderpriority", "bucket",
        F.col("n").cast("long").alias("n_lines"),
        F.expr("n * 1000000 div tot").alias("share_ppm"),
    )


@register(
    "rolling_28d_active_users",
    """
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    days AS (SELECT DISTINCT day FROM ud),
    contrib AS (
        SELECT DISTINCT ud.user_id, d.day AS target_day
        FROM ud JOIN days d
          ON d.day >= ud.day AND d.day < ud.day + INTERVAL 28 DAY)
    SELECT CAST(target_day AS VARCHAR) AS day, count(*) AS active_28d
    FROM contrib GROUP BY target_day
    """,
)
def rolling_28d_active_users(spark, sf_dir):
    """Rolling 28-day distinct active users per day — the sliding-window
    COUNT DISTINCT that a naive window function cannot partial-aggregate.
    Scalable shape: dedupe to (user, day) grain FIRST (events collapse by
    orders of magnitude), then each user-day contributes to <= 28 target
    days via a bounded range join against the distinct-day dimension
    (broadcast — day cardinality is bounded), then one distinct + count per
    day. Shuffle volume is user-days x 28, linear in users, never raw
    events."""
    ev = _t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    days = ud.select(F.col("day").alias("target_day")).distinct()
    contrib = (
        ud.join(
            F.broadcast(days),
            (F.col("target_day") >= F.col("day"))
            & (F.col("target_day") < F.date_add(F.col("day"), 28)),
        )
        .select("user_id", "target_day")
        .distinct()
    )
    return contrib.groupBy("target_day").agg(
        F.count(F.lit(1)).alias("active_28d")
    ).select(F.col("target_day").cast("string").alias("day"), "active_28d")


@register(
    "event_rate_cusum",
    """
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               count(*) AS n_events,
               count(*) FILTER (WHERE event_type = 'error') AS n_errors
        FROM events GROUP BY 1),
    r AS (SELECT day, n_events, n_errors,
                 (n_errors * 1000000) // n_events AS rate_ppm
          FROM d),
    m AS (SELECT (sum(n_errors) * 1000000) // sum(n_events) AS mean_ppm FROM r),
    c AS (SELECT r.day, r.n_events, r.n_errors, r.rate_ppm, m.mean_ppm,
                 sum(r.rate_ppm - m.mean_ppm)
                     OVER (ORDER BY r.day ROWS UNBOUNDED PRECEDING) AS cusum
          FROM r CROSS JOIN m)
    SELECT CAST(day AS VARCHAR) AS day, CAST(n_events AS BIGINT) AS n_events,
           CAST(n_errors AS BIGINT) AS n_errors,
           CAST(rate_ppm AS BIGINT) AS rate_ppm,
           CAST(cusum AS BIGINT) AS cusum_ppm_days
    FROM c
    """,
)
def event_rate_cusum(spark, sf_dir):
    """CUSUM changepoint statistic over the daily error rate: cumulative sum
    of (daily rate - global mean rate), all integer ppm — sustained drift
    shows as a monotone ramp long before any single day breaches a
    threshold. The cumulative window runs AFTER day-grain aggregation (a
    few hundred rows regardless of event volume), so the single-partition
    window is bounded; the global mean is one scalar broadcast."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_if(F.col("event_type") == "error").alias("n_errors"),
    )
    r = d.withColumn("rate_ppm", F.expr("n_errors * 1000000 div n_events"))
    m = r.agg(
        F.expr("sum(n_errors) * 1000000 div sum(n_events)").alias("mean_ppm")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = r.crossJoin(F.broadcast(m)).withColumn(
        "cusum", F.sum(F.col("rate_ppm") - F.col("mean_ppm")).over(w)
    )
    return c.select(
        F.col("day").cast("string").alias("day"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_errors").cast("long").alias("n_errors"),
        F.col("rate_ppm").cast("long").alias("rate_ppm"),
        F.col("cusum").cast("long").alias("cusum_ppm_days"),
    )


@register(
    "embedding_quantization_error",
    f"""
    WITH e AS (
        SELECT label,
               list_sum(list_transform(embedding::DOUBLE[],
                   x -> abs(127 * CAST(round(x * 1000000) AS BIGINT)
                            - 1000000 * CAST(round(x * 127) AS BIGINT)))) AS err,
               list_sum(list_transform(embedding::DOUBLE[],
                   x -> abs(CAST(round(x * 1000000) AS BIGINT)))) AS mag
        FROM embeddings)
    SELECT label, count(*) AS n_vectors,
           CAST(sum(err) AS BIGINT) AS total_err_scaled,
           CAST(max(err) AS BIGINT) AS max_vec_err_scaled,
           CAST(sum(err) // count(*) AS BIGINT) AS mean_vec_err_scaled,
           CAST((sum(err) * 1000) // (127 * sum(mag)) AS BIGINT) AS rel_err_permille
    FROM e GROUP BY label
    """,
)
def embedding_quantization_error(spark, sf_dir):
    """Reconstruction error of int8 scalar quantization (code = round(x*127))
    per label group, in EXACT integer arithmetic: the error of element x is
    |127*round(x*1e6) - 1e6*round(x*127)| — micro-units scaled by 127, no
    float division anywhere, so both engines agree bit-for-bit. The
    compression-planning view: rel_err_permille tells whether the int8 tier
    (32x smaller than float32) is usable for a first-pass ANN scan. Pure
    map + one small groupBy."""
    emb = _t(spark, sf_dir, "embeddings")
    err = F.aggregate(
        F.transform(
            F.col("embedding"),
            lambda x: F.abs(
                F.lit(127) * F.round(x.cast("double") * 1_000_000).cast("long")
                - F.lit(1_000_000) * F.round(x.cast("double") * 127).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    mag = F.aggregate(
        F.transform(
            F.col("embedding"),
            lambda x: F.abs(F.round(x.cast("double") * 1_000_000).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    e = emb.select("label", err.alias("err"), mag.alias("mag"))
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("err").cast("long").alias("total_err_scaled"),
        F.max("err").cast("long").alias("max_vec_err_scaled"),
        F.expr("sum(err) div count(*)").alias("mean_vec_err_scaled"),
        F.expr("(sum(err) * 1000) div (127 * sum(mag))").alias("rel_err_permille"),
    )


@register(
    "session_duration_histogram",
    """
    WITH l AS (
        SELECT user_id, ts, event_id,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
    f AS (SELECT *, CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
                         THEN 1 ELSE 0 END AS new_s FROM l),
    s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sid FROM f),
    sess AS (SELECT user_id, sid,
                    date_diff('second', min(ts), max(ts)) // 60 AS dur_min,
                    count(*) AS n_events
             FROM s GROUP BY 1, 2),
    b AS (SELECT CASE WHEN dur_min = 0 THEN 'bounce'
                      WHEN dur_min <= 5 THEN 'min_1_5'
                      WHEN dur_min <= 15 THEN 'min_6_15'
                      WHEN dur_min <= 30 THEN 'min_16_30'
                      WHEN dur_min <= 60 THEN 'min_31_60'
                      ELSE 'over_60' END AS bucket,
                 n_events
          FROM sess),
    c AS (SELECT bucket, count(*) AS n_sessions,
                 sum(n_events) AS total_events
          FROM b GROUP BY 1)
    SELECT bucket, CAST(n_sessions AS BIGINT) AS n_sessions,
           CAST(total_events AS BIGINT) AS total_events,
           CAST((n_sessions * 1000000) // (SELECT sum(n_sessions) FROM c) AS BIGINT)
               AS share_ppm
    FROM c
    """,
)
def session_duration_histogram(spark, sf_dir):
    """Session-length distribution: gaps-and-islands sessionization (30-min
    inactivity), session duration in whole minutes, fixed buckets with
    integer-ppm share of all sessions. Same parallel per-user windows as
    `sessionize`; the bucket rollup and scalar total are tiny."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id", "ts", "event_id", F.lag("ts").over(w).alias("prev")
    ).withColumn(
        "new_s",
        F.when(
            F.col("prev").isNull()
            | (F.col("ts") - F.col("prev") > F.expr("INTERVAL 30 MINUTES")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = (
        flagged.withColumn(
            "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("user_id", "sid")
        .agg(
            ((F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))) / 60)
            .cast("long").alias("dur_min"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    bucket = (
        F.when(F.col("dur_min") == 0, "bounce")
        .when(F.col("dur_min") <= 5, "min_1_5")
        .when(F.col("dur_min") <= 15, "min_6_15")
        .when(F.col("dur_min") <= 30, "min_16_30")
        .when(F.col("dur_min") <= 60, "min_31_60")
        .otherwise("over_60")
    )
    c = sess.select(bucket.alias("bucket"), "n_events").groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").cast("long").alias("total_events"),
    )
    tot = c.agg(F.sum("n_sessions").alias("__tot__"))
    return c.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.col("n_sessions").cast("long").alias("n_sessions"),
        "total_events",
        F.expr("n_sessions * 1000000 div __tot__").alias("share_ppm"),
    )


@register(
    "customer_segment_transitions",
    """
    WITH py AS (
        SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS yr,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders WHERE year(o_orderdate) IN (1995, 1996)
        GROUP BY 1, 2),
    dec AS (SELECT o_custkey, yr,
                   ntile(5) OVER (PARTITION BY yr ORDER BY cents DESC, o_custkey ASC)
                       AS quintile
            FROM py),
    a AS (SELECT o_custkey, quintile AS q_from FROM dec WHERE yr = 1995),
    b AS (SELECT o_custkey, quintile AS q_to FROM dec WHERE yr = 1996)
    SELECT CAST(coalesce(a.q_from, 0) AS BIGINT) AS q_from,
           CAST(coalesce(b.q_to, 0) AS BIGINT) AS q_to,
           count(*) AS n_customers
    FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
    GROUP BY 1, 2
    """,
)
def customer_segment_transitions(spark, sf_dir):
    """Year-over-year customer-value quintile transition matrix (1995 ->
    1996), quintile 0 = not active that year (churn/acquisition rows). The
    ntile windows rank the CUSTOMER-YEAR grain (bounded well below raw
    orders); the transition join is customer-keyed and the output is at
    most 6x6 cells. Ties -> higher revenue first, custkey asc — identical
    in both engines."""
    orders = _t(spark, sf_dir, "orders")
    py = (
        orders.filter(F.year("o_orderdate").isin(1995, 1996))
        .groupBy("o_custkey", F.year("o_orderdate").cast("int").alias("yr"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
    )
    w = Window.partitionBy("yr").orderBy(F.desc("cents"), F.asc("o_custkey"))
    dec = py.withColumn("quintile", F.ntile(5).over(w))
    a = dec.filter(F.col("yr") == 1995).select(
        "o_custkey", F.col("quintile").alias("q_from")
    )
    b = dec.filter(F.col("yr") == 1996).select(
        F.col("o_custkey").alias("ck_b"), F.col("quintile").alias("q_to")
    )
    j = a.join(b, F.col("o_custkey") == F.col("ck_b"), "full_outer")
    return j.groupBy(
        F.coalesce(F.col("q_from"), F.lit(0)).cast("long").alias("q_from"),
        F.coalesce(F.col("q_to"), F.lit(0)).cast("long").alias("q_to"),
    ).agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "minhash_band_stats",
    f"""
    WITH {_SHINGLES_CTE},
    hs AS (SELECT doc_id, sh AS h FROM sh),
    seeds AS (SELECT * FROM (VALUES {_MH_SEED_VALUES}) AS t(seed, a, b)),
    sig AS (
        SELECT doc_id, seed, min((a * h + b) % {dedup.MINHASH_P}) AS sig
        FROM hs CROSS JOIN seeds GROUP BY doc_id, seed
    ),
    bands AS (
        SELECT doc_id, seed // 4 AS band,
               string_agg(CAST(sig AS VARCHAR), '|' ORDER BY seed) AS sigstr
        FROM sig GROUP BY doc_id, seed // 4
    ),
    bh AS (
        SELECT doc_id, band,
               CAST('0x' || substr(md5(sigstr || '#' || (1000 + band)), 1, 15) AS BIGINT) AS band_hash
        FROM bands
    ),
    buckets AS (SELECT band, band_hash, count(*) AS s
                FROM bh GROUP BY 1, 2)
    SELECT CAST(band AS BIGINT) AS band,
           count(*) AS n_buckets,
           CAST(count(*) FILTER (WHERE s = 1) AS BIGINT) AS n_singletons,
           CAST(max(s) AS BIGINT) AS max_bucket,
           CAST(sum(s * (s - 1) // 2) AS BIGINT) AS candidate_pairs
    FROM buckets GROUP BY band
    """,
)
def minhash_band_stats(spark, sf_dir):
    """LSH index diagnostics per band — bucket count, singleton count,
    hottest bucket, and the exact candidate-pair mass Σ s·(s−1)/2 each band
    contributes. THE tuning view for the bands/rows tradeoff at scale: a
    band whose candidate_pairs explodes signals too few rows per band (or a
    degenerate corpus) BEFORE the pair join runs. Aggregates over (band,
    band_hash) — bucket grain, never pairs."""
    band_rows = dedup.lsh_band_rows(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        num_hashes=16, bands=4, k=3,
    )
    buckets = band_rows.groupBy("band", "band_hash").agg(
        F.count(F.lit(1)).alias("s")
    )
    return buckets.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.count_if(F.col("s") == 1).cast("long").alias("n_singletons"),
        F.max("s").cast("long").alias("max_bucket"),
        F.sum(F.expr("s * (s - 1) div 2")).cast("long").alias("candidate_pairs"),
    ).select(
        F.col("band").cast("long").alias("band"),
        "n_buckets", "n_singletons", "max_bucket", "candidate_pairs",
    )


# ---------------------------------------------------------------------------
# r3 tranche 2: semantic dedup, corpus-linguistics profiling, statistical
# tests, Bloom-sketch decontamination (all scalar / BIGINT outputs)
# ---------------------------------------------------------------------------

_SEMDEDUP_THRESH = 500_000  # cosine micro-units


@register(
    "dedup_semantic_prune",
    f"""
    WITH cent AS (SELECT vec_id AS cell_id, embedding AS cv
                  FROM embeddings WHERE vec_id < 8),
    a AS (
        SELECT e.vec_id, e.embedding, c.cell_id,
               CAST(round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv::DOUBLE[]) * 1000000) AS BIGINT) AS cs,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY CAST(round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv::DOUBLE[]) * 1000000) AS BIGINT) DESC,
                            c.cell_id ASC) AS rn
        FROM embeddings e CROSS JOIN cent c),
    asg AS (SELECT vec_id, embedding, cell_id, cs FROM a WHERE rn = 1),
    dropped AS (
        SELECT DISTINCT y.vec_id AS did
        FROM asg x JOIN asg y
          ON x.cell_id = y.cell_id AND x.vec_id <> y.vec_id
         AND (x.cs > y.cs OR (x.cs = y.cs AND x.vec_id < y.vec_id))
        WHERE CAST(round(list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) * 1000000) AS BIGINT)
               >= {_SEMDEDUP_THRESH})
    SELECT asg.vec_id, CAST(asg.cell_id AS BIGINT) AS cell_id,
           asg.cs AS cent_sim_micro,
           CAST(CASE WHEN d.did IS NULL THEN 1 ELSE 0 END AS INT) AS kept
    FROM asg LEFT JOIN dropped d ON asg.vec_id = d.did
    """,
)
def dedup_semantic_prune(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): nearest-centroid cluster assignment,
    intra-cell cosine pairs only, drop the less-prototypical member of any
    pair >= 0.5. All keep/drop comparisons run on integer cosine micro-units
    so both engines decide identically. Centroids here are the deterministic
    vec_id<8 subset (same convention as similarity_ann_ivf) so the full path
    is oracle-checkable; at 100 TB they come from the capped k-means fit and
    cell count scales ~sqrt(N), keeping the intra-cell pair mass
    O(N * cell_size)."""
    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell_id"), "embedding"
    )
    return similarity.semdedup_prune(
        emb, centroids, threshold_micro=_SEMDEDUP_THRESH
    )


@register(
    "text_vocab_heaps",
    f"""
    WITH t1 AS (SELECT source, unnest({_TOKS_SQL}) AS tok
                FROM documents WHERE length(trim(text)) > 0),
    tc AS (SELECT source, tok, count(*) AS c FROM t1 GROUP BY 1, 2)
    SELECT source,
           CAST(sum(c) AS BIGINT) AS total_tokens,
           count(*) AS distinct_tokens,
           CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS hapax_tokens,
           CAST((count(*) FILTER (WHERE c = 1)) * 1000000 // count(*) AS BIGINT) AS hapax_share_ppm,
           CAST(max(c) AS BIGINT) AS top_token_count
    FROM tc GROUP BY source
    """,
)
def text_vocab_heaps(spark, sf_dir):
    """Corpus vocabulary profile per source — the Heaps'-law / hapax view a
    tokenizer-training pipeline reads before fixing a vocab size: token mass,
    distinct types, hapax legomena count + ppm share, and the hottest token's
    count. One explode + one (source, token)-keyed shuffle with map-side
    partial aggregation; the per-source rollup is tiny."""
    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim(F.col("text"))) > 0)
    toks = docs.select(
        "source", F.explode(text.tokens(text.normalize(F.col("text")))).alias("tok")
    )
    tc = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    return tc.groupBy("source").agg(
        F.sum("c").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).alias("distinct_tokens"),
        F.count_if(F.col("c") == 1).cast("long").alias("hapax_tokens"),
        F.expr("count_if(c = 1) * 1000000 div count(*)").alias("hapax_share_ppm"),
        F.max("c").cast("long").alias("top_token_count"),
    )


@register(
    "chi_square_priority_status",
    """
    WITH o AS (SELECT o_orderpriority AS priority, o_orderstatus AS status,
                      count(*) AS obs
               FROM orders GROUP BY 1, 2),
    r AS (SELECT priority, sum(obs) AS rt FROM o GROUP BY 1),
    c AS (SELECT status, sum(obs) AS ct FROM o GROUP BY 1),
    t AS (SELECT sum(obs) AS tt FROM o),
    e AS (SELECT o.priority, o.status, o.obs,
                 (r.rt * c.ct * 1000) // t.tt AS em
          FROM o JOIN r USING (priority) JOIN c USING (status) CROSS JOIN t)
    SELECT priority, status, CAST(obs AS BIGINT) AS observed,
           CAST(em AS BIGINT) AS expected_milli,
           CAST(((obs * 1000 - em) * (obs * 1000 - em)) // greatest(em, 1) AS BIGINT)
               AS contribution_milli
    FROM e
    """,
)
def chi_square_priority_status(spark, sf_dir):
    """Chi-square test of independence (order priority x order status) in
    exact integer milli-units: expected_milli = row_total*col_total*1000/T,
    per-cell contribution = (1000*O - E_milli)^2 / E_milli — identical
    integer floor divisions on both engines, no float anywhere. The
    contingency grid is 15 cells regardless of order volume; marginals are
    map-side combined. (Milli scaling overflows int64 only past ~3e6 rows
    per CELL x 1e3 — switch to DECIMAL(38) arithmetic beyond that.)"""
    orders = _t(spark, sf_dir, "orders")
    o = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count(F.lit(1)).alias("obs"))
    r = o.groupBy("priority").agg(F.sum("obs").alias("rt"))
    c = o.groupBy("status").agg(F.sum("obs").alias("ct"))
    t = o.agg(F.sum("obs").alias("tt"))
    e = (
        o.join(F.broadcast(r), "priority")
        .join(F.broadcast(c), "status")
        .crossJoin(F.broadcast(t))
        .withColumn("em", F.expr("rt * ct * 1000 div tt"))
    )
    return e.select(
        "priority", "status",
        F.col("obs").cast("long").alias("observed"),
        F.col("em").alias("expected_milli"),
        F.expr("((obs * 1000 - em) * (obs * 1000 - em)) div greatest(em, 1)")
        .alias("contribution_milli"),
    )


# round(log10(1 + 1/d) * 1e6) for d = 1..9 — identical constants both sides
_BENFORD_PPM = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]
_BENFORD_VALUES = ", ".join(f"({d + 1}, {p})" for d, p in enumerate(_BENFORD_PPM))


@register(
    "benford_first_digit",
    f"""
    WITH cents AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
                   FROM orders WHERE o_totalprice > 0),
    d AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM cents),
    g AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
    t AS (SELECT sum(n) AS tt FROM g),
    exp AS (SELECT * FROM (VALUES {_BENFORD_VALUES}) AS e(digit, expected_ppm))
    SELECT g.digit, CAST(g.n AS BIGINT) AS n_orders,
           CAST(g.n * 1000000 // t.tt AS BIGINT) AS observed_ppm,
           CAST(exp.expected_ppm AS BIGINT) AS expected_ppm,
           CAST(g.n * 1000000 // t.tt - exp.expected_ppm AS BIGINT) AS deviation_ppm
    FROM g JOIN exp ON g.digit = exp.digit CROSS JOIN t
    """,
)
def benford_first_digit(spark, sf_dir):
    """Benford's-law first-digit profile of order totals (in cents): observed
    count and ppm share per leading digit vs the log10(1+1/d) expectation —
    the classic fraud/synthetic-data screen. One digit-keyed 9-group
    aggregate; expectation is a 9-row broadcast of shared integer
    constants."""
    orders = _t(spark, sf_dir, "orders")
    exp_df = spark.createDataFrame(
        [(d + 1, p) for d, p in enumerate(_BENFORD_PPM)],
        "digit long, expected_ppm long",
    )
    g = (
        orders.filter(F.col("o_totalprice") > 0)
        .select(
            F.substring(
                F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
            ).cast("long").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = g.agg(F.sum("n").alias("tt"))
    return (
        g.join(F.broadcast(exp_df), "digit")
        .crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.col("n").cast("long").alias("n_orders"),
            F.expr("n * 1000000 div tt").alias("observed_ppm"),
            F.col("expected_ppm").cast("long").alias("expected_ppm"),
            F.expr("n * 1000000 div tt - expected_ppm").alias("deviation_ppm"),
        )
    )


@register(
    "text_bigram_lift",
    f"""
    WITH t1 AS (SELECT doc_id, {_TOKS_SQL} AS tk
                FROM documents WHERE length(trim(text)) > 0),
    uni AS (SELECT unnest(tk) AS tok FROM t1),
    u AS (SELECT tok, count(*) AS c FROM uni GROUP BY 1),
    nu AS (SELECT sum(c) AS nu FROM u),
    bp AS (SELECT tk, unnest(range(2, len(tk) + 1)) AS i FROM t1 WHERE len(tk) >= 2),
    bg AS (SELECT tk[i-1] AS w1, tk[i] AS w2, count(*) AS cxy FROM bp GROUP BY 1, 2),
    nb AS (SELECT sum(cxy) AS nb FROM bg)
    SELECT bg.w1, bg.w2, CAST(bg.cxy AS BIGINT) AS n_pairs,
           CAST(((bg.cxy * nu.nu) // u1.c) * nu.nu * 1000 // (u2.c * nb.nb) AS BIGINT)
               AS lift_milli
    FROM bg JOIN u u1 ON bg.w1 = u1.tok JOIN u u2 ON bg.w2 = u2.tok
    CROSS JOIN nu CROSS JOIN nb
    WHERE bg.cxy >= 5
    ORDER BY lift_milli DESC, w1 ASC, w2 ASC LIMIT 20
    """,
)
def text_bigram_lift(spark, sf_dir):
    """Collocation mining via integer lift: for each adjacent token bigram
    with support >= 5, lift = P(xy) / (P(x)P(y)) in milli-units computed by
    a FIXED staged floor-division (((cxy*Nu)//cx)*Nu*1000//(cy*Nb)) so both
    engines produce the same integer. Bigrams come from an index transform
    over the per-doc token array (no self-join); unigram and bigram counts
    are token-keyed shuffles with map-side combine; top-20 is a TakeOrdered,
    never a global sort materialization. Int64 bound: the staged numerator
    reaches ~Nu^2 * 1000 for maximal-lift bigrams, overflowing int64 once
    corpus token mass Nu exceeds ~1e8 (DuckDB raises on the same bound —
    its staged ops stay BIGINT); past that, widen the staged expression to
    DECIMAL(38,0) on BOTH sides exactly as gini_impurity_profile does."""
    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim(F.col("text"))) > 0)
    tk = docs.select(text.tokens(text.normalize(F.col("text"))).alias("tk"))
    uni = tk.select(F.explode("tk").alias("tok"))
    u = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    nu = u.agg(F.sum("c").alias("nu"))
    bg = (
        tk.filter(F.size("tk") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1), "
                    "i -> struct(tk[i-1] AS w1, tk[i] AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cxy"))
    )
    nb = bg.agg(F.sum("cxy").alias("nb"))
    u1 = u.select(F.col("tok").alias("w1"), F.col("c").alias("cx"))
    u2 = u.select(F.col("tok").alias("w2"), F.col("c").alias("cy"))
    return (
        bg.filter(F.col("cxy") >= 5)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select(
            "w1", "w2",
            F.col("cxy").cast("long").alias("n_pairs"),
            F.expr("((cxy * nu) div cx) * nu * 1000 div (cy * nb)").alias("lift_milli"),
        )
        .orderBy(F.desc("lift_milli"), F.asc("w1"), F.asc("w2"))
        .limit(20)
    )


@register(
    "bloom_decontaminate",
    f"""
    WITH {_SHINGLES_CTE},
    bsh AS (SELECT DISTINCT sh AS key FROM sh WHERE doc_id < 25),
    bloom AS (SELECT DISTINCT unnest({sketches.bloom_positions_sql('CAST(key AS VARCHAR)')}) AS pos
              FROM bsh),
    pk AS (SELECT DISTINCT sh AS key FROM sh WHERE doc_id >= 25),
    pp AS (SELECT key, unnest({sketches.bloom_positions_sql('CAST(key AS VARCHAR)')}) AS pos
           FROM pk),
    hits AS (SELECT pp.key, count(b.pos) AS nhit
             FROM pp LEFT JOIN bloom b USING (pos) GROUP BY pp.key),
    flag AS (SELECT key, CASE WHEN nhit = {sketches.BLOOM_K} THEN 1 ELSE 0 END AS mc
             FROM hits),
    pd AS (SELECT s.doc_id, s.source, count(*) AS n_sh, sum(f.mc) AS n_hit
           FROM sh s JOIN flag f ON s.sh = f.key
           WHERE s.doc_id >= 25 GROUP BY 1, 2)
    SELECT source, count(*) AS n_docs,
           CAST(count(*) FILTER (WHERE n_hit * 1000 // n_sh >= 100) AS BIGINT)
               AS n_flagged_docs,
           CAST(sum(n_hit) AS BIGINT) AS total_hit_shingles,
           CAST(sum(n_sh) AS BIGINT) AS total_shingles
    FROM pd GROUP BY source
    """,
)
def bloom_decontaminate(spark, sf_dir):
    """Benchmark decontamination through a Bloom sketch instead of an exact
    shingle set: the contamination side (doc_id < 25 stands in for the eval
    benchmark) compiles to <= 2^18 set bit positions — O(m) state regardless
    of benchmark size, broadcastable at any scale, mergeable by position
    union — and every corpus shingle probes with k=3 md5 positions. A doc is
    flagged when >= 10% of its shingles might be contained. The md5 position
    arithmetic is engine-portable, so the oracle replays the EXACT filter
    (false positives included). Complements `decontamination_overlap` (exact
    broadcast set) with the bounded-memory variant used when the benchmark
    suite itself is large."""
    docs = _t(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", "source",
        F.explode(dedup.shingle_hashes(F.col("text"), 3)).alias("key"),
    )
    bloom = sketches.bloom_build(sh.filter(F.col("doc_id") < 25), "key")
    probe_sh = sh.filter(F.col("doc_id") >= 25)
    flags = sketches.bloom_probe(probe_sh, "key", bloom)
    pd_ = (
        probe_sh.join(flags, "key")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum("might_contain").alias("n_hit"),
        )
    )
    return pd_.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.expr("n_hit * 1000 div n_sh >= 100")).cast("long")
        .alias("n_flagged_docs"),
        F.sum("n_hit").cast("long").alias("total_hit_shingles"),
        F.sum("n_sh").cast("long").alias("total_shingles"),
    )


@register(
    "gini_impurity_profile",
    """
    WITH g1 AS (SELECT o_orderstatus AS v, count(*) AS c FROM orders GROUP BY 1),
    g2 AS (SELECT o_orderpriority AS v, count(*) AS c FROM orders GROUP BY 1),
    g3 AS (SELECT l_returnflag AS v, count(*) AS c FROM lineitem GROUP BY 1),
    g4 AS (SELECT l_linestatus AS v, count(*) AS c FROM lineitem GROUP BY 1),
    g5 AS (SELECT event_type AS v, count(*) AS c FROM events GROUP BY 1)
    SELECT 'o_orderstatus' AS column_name, count(*) AS n_distinct,
           CAST((sum(c) * sum(c) - sum(c * c)) * 1000000 // (sum(c) * sum(c)) AS BIGINT) AS gini_ppm
    FROM g1
    UNION ALL
    SELECT 'o_orderpriority', count(*),
           CAST((sum(c) * sum(c) - sum(c * c)) * 1000000 // (sum(c) * sum(c)) AS BIGINT) FROM g2
    UNION ALL
    SELECT 'l_returnflag', count(*),
           CAST((sum(c) * sum(c) - sum(c * c)) * 1000000 // (sum(c) * sum(c)) AS BIGINT) FROM g3
    UNION ALL
    SELECT 'l_linestatus', count(*),
           CAST((sum(c) * sum(c) - sum(c * c)) * 1000000 // (sum(c) * sum(c)) AS BIGINT) FROM g4
    UNION ALL
    SELECT 'event_type', count(*),
           CAST((sum(c) * sum(c) - sum(c * c)) * 1000000 // (sum(c) * sum(c)) AS BIGINT) FROM g5
    """,
)
def gini_impurity_profile(spark, sf_dir):
    """Categorical-column profiling via Gini impurity, 1 - sum(p_i^2), in
    EXACT rational ppm: (T^2 - sum(c^2)) * 1e6 // T^2 — no logs, no floats,
    so the data-quality dashboard number is bit-identical cross-engine
    (entropy would need transcendental parity). One groupBy per column; the
    impurity fold sees only the per-value counts. Spark computes on
    DECIMAL(38,0) — (T^2 - sum c^2) * 1e6 would overflow int64 at T ≈ 3e6
    rows per column (sf1 lineitem already crosses it); decimal carries to
    T ≈ 1e16. DuckDB needs nothing: its integer sum() is already HUGEINT."""
    def prof(df, col):
        g = df.groupBy(F.col(col).alias("v")).agg(F.count(F.lit(1)).alias("c"))
        return g.agg(
            F.lit(col).alias("column_name"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.expr(
                "cast((cast(sum(c) as decimal(38,0)) * sum(c)"
                " - sum(cast(c as decimal(38,0)) * c)) * 1000000"
                " div (cast(sum(c) as decimal(38,0)) * sum(c)) as bigint)"
            ).alias("gini_ppm"),
        )
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    events = _t(spark, sf_dir, "events")
    return (
        prof(orders, "o_orderstatus")
        .unionAll(prof(orders, "o_orderpriority"))
        .unionAll(prof(lineitem, "l_returnflag"))
        .unionAll(prof(lineitem, "l_linestatus"))
        .unionAll(prof(events, "event_type"))
    )


# ---------------------------------------------------------------------------
# r4 tranche: distributed order statistics (exact percentiles / deciles on
# the two-phase rank operator), training-data splits & sampling, RAG-style
# chunking, join-skew ops audit, and a wide-bucket heap-probe LSH tier
# ---------------------------------------------------------------------------

_PCTS = [25, 50, 75, 90, 99]


@register(
    "exact_percentiles",
    f"""
    WITH r AS (SELECT o_totalprice,
                      row_number() OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
                      count(*) OVER () AS n
               FROM orders),
    p AS (SELECT unnest([{", ".join(map(str, _PCTS))}]) AS pct)
    SELECT CAST(p.pct AS INT) AS pct, CAST(r.rn AS BIGINT) AS at_rank,
           CAST(round(r.o_totalprice * 100) AS BIGINT) AS value_cents
    FROM r JOIN p ON r.rn = (p.pct * r.n + 99) // 100
    """,
)
def exact_percentiles(spark, sf_dir):
    """EXACT percentile values (P25/50/75/90/99 of order price) at scale:
    rank every row with the distributed two-phase global_row_number (range
    repartition + per-partition offsets — never a one-task window), then
    equi-join the 5 target ranks ceil(p*N/100) as a broadcast spine. The
    oracle's one-task row_number() produces the identical ranking, so the
    values match bit-for-bit; approx_percentile_bounds remains the sketch
    tier when one pass must suffice.

    Eager note: CONSTRUCTING this query runs Spark jobs (the two-phase
    rank's offset collect and localCheckpoint execute at build time), so
    registry functions in this family are not lazy plan builders —
    plan-dump/sweep tooling must reuse _PLAN_CACHE rather than rebuild
    per inspection.
    """
    from etl_mssql_to_postgres_dailysync_spark.operators.cumsum import global_row_number

    orders = _t(spark, sf_dir, "orders")
    ranked, total = global_row_number(
        orders.select("o_totalprice", "o_orderkey"),
        ["o_totalprice", "o_orderkey"],
        "rn",
    )
    spine = spark.createDataFrame(
        [(p, (p * total + 99) // 100) for p in _PCTS], "pct int, at_rank long"
    )
    return (
        ranked.join(F.broadcast(spine), ranked["rn"] == spine["at_rank"])
        .select(
            "pct",
            "at_rank",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("value_cents"),
        )
    )


@register(
    "curriculum_length_deciles",
    """
    WITH d AS (SELECT len(text) AS chars, doc_id,
                      ntile(10) OVER (ORDER BY len(text) ASC, doc_id ASC) AS decile
               FROM documents)
    SELECT CAST(decile AS INT) AS decile, count(*) AS n_docs,
           CAST(min(chars) AS BIGINT) AS min_chars,
           CAST(max(chars) AS BIGINT) AS max_chars,
           CAST(sum(chars) AS BIGINT) AS sum_chars
    FROM d GROUP BY decile
    """,
)
def curriculum_length_deciles(spark, sf_dir):
    """Curriculum-ordering support: documents cut into 10 equal-count
    difficulty tranches by length (the standard easy->hard curriculum
    proxy), via the distributed exact global_ntile — range repartition +
    offsets, bit-identical to the oracle's one-task ntile() but never
    single-partition. Per-decile count and char-mass bounds are what a
    curriculum scheduler consumes.

    Eager note: CONSTRUCTING this query runs Spark jobs (the two-phase
    rank's offset collect and localCheckpoint execute at build time), so
    registry functions in this family are not lazy plan builders —
    plan-dump/sweep tooling must reuse _PLAN_CACHE rather than rebuild
    per inspection.
    """
    from etl_mssql_to_postgres_dailysync_spark.operators.cumsum import global_ntile

    docs = _t(spark, sf_dir, "documents").select(
        F.length("text").alias("chars"), "doc_id"
    )
    d = global_ntile(docs, ["chars", "doc_id"], 10, "decile")
    return d.groupBy(F.col("decile").cast("int").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("chars").cast("long").alias("min_chars"),
        F.max("chars").cast("long").alias("max_chars"),
        F.sum("chars").cast("long").alias("sum_chars"),
    )


@register(
    "cv_fold_assignment",
    f"""
    WITH f AS (SELECT {md5_long_sql("CAST(doc_id AS VARCHAR)", 42)} % 5 AS fold,
                      doc_id, len(text) AS chars,
                      {md5_long_sql("CAST(doc_id AS VARCHAR)")} AS h
               FROM documents)
    SELECT CAST(fold AS INT) AS fold, count(*) AS n_docs,
           CAST(sum(chars) AS BIGINT) AS sum_chars,
           CAST(bit_xor(h) AS BIGINT) AS fold_checksum
    FROM f GROUP BY fold
    """,
)
def cv_fold_assignment(spark, sf_dir):
    """Deterministic k-fold split (k=5) for eval/ablation holdouts:
    fold = md5(doc_id, seed) % k — reproducible on any engine and stable
    under corpus growth (a doc never changes folds), unlike rand(). The
    bit_xor membership checksum is order- and partitioning-independent, so
    two engines (or two cluster runs) can verify they hold the exact same
    fold contents without exchanging id lists."""
    docs = _t(spark, sf_dir, "documents")
    f = docs.select(
        (md5_long(F.col("doc_id"), 42) % 5).cast("int").alias("fold"),
        F.length("text").alias("chars"),
        md5_long(F.col("doc_id")).alias("h"),
    )
    return f.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("chars").cast("long").alias("sum_chars"),
        F.bit_xor("h").cast("long").alias("fold_checksum"),
    )


@register(
    "class_weights",
    """
    WITH g AS (SELECT o_orderpriority AS label, count(*) AS n_rows FROM orders GROUP BY 1),
    t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total, count(*) AS k FROM g)
    SELECT g.label, CAST(g.n_rows AS BIGINT) AS n_rows,
           CAST(t.total * 1000000 // (t.k * g.n_rows) AS BIGINT) AS weight_ppm
    FROM g CROSS JOIN t
    """,
)
def class_weights(spark, sf_dir):
    """Inverse-frequency class weights (the sklearn 'balanced' rule,
    w_i = T / (k * c_i)) in exact integer ppm for an imbalanced label —
    what a training pipeline feeds the loss to de-bias skewed labels. One
    groupBy + a 1-row (total, k) scalar cross join; T * 1e6 stays in int64
    to ~9e12 label rows — DECIMAL(38) beyond that, like
    gini_impurity_profile."""
    orders = _t(spark, sf_dir, "orders")
    g = orders.groupBy(F.col("o_orderpriority").alias("label")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    t = g.agg(
        F.sum("n_rows").cast("long").alias("total"), F.count(F.lit(1)).alias("k")
    )
    return g.crossJoin(F.broadcast(t)).select(
        "label",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.expr("total * 1000000 div (k * n_rows)").alias("weight_ppm"),
    )


def _skew_audit_sql(table: str, key: str) -> str:
    return f"""
    SELECT '{table}' AS tbl, CAST({key} AS BIGINT) AS key_val,
           count(*) AS n_rows,
           CAST(count(*) * 1000000 // (SELECT count(*) FROM {table}) AS BIGINT) AS share_ppm,
           CAST(row_number() OVER (ORDER BY count(*) DESC, {key} ASC NULLS FIRST) AS INT) AS rnk
    FROM {table} GROUP BY {key}
    QUALIFY rnk <= 5
    """


@register(
    "join_skew_audit",
    " UNION ALL ".join(
        [
            _skew_audit_sql("orders", "o_custkey"),
            _skew_audit_sql("lineitem", "l_suppkey"),
            _skew_audit_sql("events", "user_id"),
        ]
    ),
)
def join_skew_audit(spark, sf_dir):
    """Shuffle-skew pre-flight: the top-5 heaviest join keys per fact-side
    join column with their ppm share of the table — the number that decides
    whether a join needs salting / AQE skew handling BEFORE it runs at 100
    TB. Per column: one map-side-combined count agg; the rank and share
    windows run over the aggregate (bounded key-grain rows), which is
    exactly the global-window shape the plan gate sanctions."""

    def audit(df, table, key):
        g = df.groupBy(F.col(key).alias("key_val")).agg(
            F.count(F.lit(1)).alias("n_rows")
        )
        t = g.agg(F.sum("n_rows").cast("long").alias("__tot__"))
        # asc_nulls_first is Spark's ASC default, but the oracle needs it
        # SPELLED OUT: DuckDB sorts NULLS LAST by default, and a null join
        # key reaching the top-5 ties is precisely what this audit exists
        # to surface — the engines must agree on where it ranks.
        w = Window.orderBy(F.col("n_rows").desc(), F.col("key_val").asc_nulls_first())
        return (
            g.withColumn("rnk", F.row_number().over(w).cast("int"))
            .filter(F.col("rnk") <= 5)
            .crossJoin(F.broadcast(t))
            .select(
                F.lit(table).alias("tbl"),
                F.col("key_val").cast("long").alias("key_val"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.expr("n_rows * 1000000 div __tot__").alias("share_ppm"),
                "rnk",
            )
        )

    return (
        audit(_t(spark, sf_dir, "orders"), "orders", "o_custkey")
        .unionAll(audit(_t(spark, sf_dir, "lineitem"), "lineitem", "l_suppkey"))
        .unionAll(audit(_t(spark, sf_dir, "events"), "events", "user_id"))
    )


_CHUNK_W = 50   # tokens per chunk
_CHUNK_S = 40   # stride (10-token overlap)


@register(
    "doc_chunking",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
               WHERE len(trim(text)) > 0),
    s AS (SELECT doc_id, toks, unnest(range(1, len(toks) + 1, {_CHUNK_S})) AS start
          FROM t),
    c AS (SELECT doc_id, CAST((start - 1) // {_CHUNK_S} AS INT) AS chunk_idx,
                 toks[start:start + {_CHUNK_W - 1}] AS chunk
          FROM s)
    SELECT doc_id, chunk_idx, CAST(len(chunk) AS INT) AS n_tok,
           {_HASH15.format(x="array_to_string(chunk, ' ')")} AS chunk_hash
    FROM c
    """,
)
def doc_chunking(spark, sf_dir):
    """RAG / pretraining chunker: overlapping 50-token windows at stride
    40 over whitespace tokens of the normalized text, emitting per-chunk
    token counts and an md5 content fingerprint (the key downstream
    chunk-level dedup and embedding jobs join on). Pure JVM expressions
    (sequence + slice + explode) — a narrow map over the scan, no shuffle,
    no Python; chunk boundaries depend only on the row, so the operator is
    embarrassingly parallel at any corpus size (window/stride from
    _CHUNK_W/_CHUNK_S)."""
    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim(F.col("text"))) > 0)
    toked = docs.select(
        "doc_id", text.tokens(text.normalize(F.col("text"))).alias("toks")
    )
    s = toked.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(1), F.size("toks"), F.lit(_CHUNK_S))).alias("start"),
    )
    c = s.select(
        "doc_id",
        F.expr(f"CAST((start - 1) div {_CHUNK_S} AS INT)").alias("chunk_idx"),
        F.slice(F.col("toks"), F.col("start"), F.lit(_CHUNK_W)).alias("chunk"),
    )
    return c.select(
        "doc_id",
        "chunk_idx",
        F.size("chunk").cast("int").alias("n_tok"),
        md5_long(F.array_join("chunk", " ")).alias("chunk_hash"),
    )


@register(
    "stratified_source_sample",
    f"""
    WITH d AS (SELECT source,
                      250 + ({md5_long_sql("source")} % 3) * 250 AS rate_milli,
                      CASE WHEN {md5_long_sql("CAST(doc_id AS VARCHAR)", 7)} % 1000
                                < 250 + ({md5_long_sql("source")} % 3) * 250
                           THEN 1 ELSE 0 END AS kept
               FROM documents)
    SELECT source, CAST(max(rate_milli) AS BIGINT) AS rate_milli,
           count(*) AS n_total, CAST(sum(kept) AS BIGINT) AS n_kept
    FROM d GROUP BY source
    """,
)
def stratified_source_sample(spark, sf_dir):
    """Per-stratum Bernoulli downsampling with DETERMINISTIC coin flips:
    each source gets a rate in {{250, 500, 750}} permille (derived here
    from a hash of the source name; in production from a quota config) and
    a doc survives iff md5(doc_id, seed) % 1000 < rate. Hash coins instead
    of rand() make the sample reproducible across engines, retries, and
    partitionings — a re-run keeps EXACTLY the same documents, so
    downstream caches and dedup indexes stay valid. Complements
    source_quota_sample (hard top-k caps) with rate-based thinning."""
    docs = _t(spark, sf_dir, "documents")
    rate = (F.lit(250) + (md5_long(F.col("source")) % 3) * 250).cast("long")
    kept = F.when(
        md5_long(F.col("doc_id"), 7) % 1000 < rate, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        docs.select("source", rate.alias("rate_milli"), kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.max("rate_milli").alias("rate_milli"),
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").cast("long").alias("n_kept"),
        )
    )


_LSHW_BITS = 16  # 2^16 buckets: enumeration is 65536 masks/query — heap only
_LSHW_T = 16384  # scan fraction 25% — matches the narrow tier's fraction
# (r6 frontier, RECALL.md: at MATCHED scan fraction the wide tier beats the
# narrow one — 25%: 0.70 vs 0.64, 12.5%: 0.50 vs 0.40 — so the r5 "recall
# dip" was an unequal-probe-budget comparison; 25% makes wide the best tier)


@register(
    "similarity_ann_lsh_wide",
    f"""
    WITH q0 AS (SELECT vec_id AS query_id, embedding AS qv,
                       {_bucket_sql(_LSHW_BITS, 'embedding')} AS bucket0
                FROM embeddings WHERE vec_id < 10),
    masks AS (SELECT CAST(unnest(range(0, {1 << _LSHW_BITS})) AS BIGINT) AS mask),
    qm AS (SELECT query_id, qv, bucket0, mask,
                  {_margin_sum_sql(_LSHW_BITS)} AS s
           FROM q0 CROSS JOIN masks),
    pr AS (SELECT query_id, qv, xor(bucket0, mask) AS bucket,
                  row_number() OVER (PARTITION BY query_id ORDER BY s ASC, mask ASC) AS rn
           FROM qm),
    q AS (SELECT query_id, qv, bucket FROM pr WHERE rn <= {_LSHW_T}),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
                 {_bucket_sql(_LSHW_BITS, 'embedding')} AS bucket
          FROM embeddings),
    scored AS (
        SELECT q.query_id, c.neighbor_id, {_COS_SQL} AS sim
        FROM c JOIN q ON c.bucket = q.bucket WHERE c.neighbor_id <> q.query_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5
    """,
)
def similarity_ann_lsh_wide(spark, sf_dir):
    """The fine-bucket LSH regime: 2^16 buckets, 16384 margin-ordered probes
    (25% scan — the same scan fraction as the narrow bits=12 tier, where the
    wide geometry wins on recall: 0.70 vs 0.64 at sf0.1, see RECALL.md's
    frontier). At 100 TB this is the geometry that matters — bucket
    count must clear executor-partition count by orders of magnitude for
    the bucket equi-join to spread — and it is exactly where per-row mask
    enumeration becomes impossible (65536 subsets/query); the heap
    best-first generator pays only O(T log T). The oracle, free of that
    constraint at fixture scale, ranks the full 65536-mask spine and must
    agree mask-for-mask with the heap's (margin-sum, mask) order."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    return similarity.lsh_bucketed_topk(
        queries_df, emb, k=5, bits=_LSHW_BITS, margin_probes=_LSHW_T
    ).withColumn("rank", F.col("rank").cast("int"))


@register(
    "chunk_dedup_crossdoc",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
               WHERE len(trim(text)) > 0),
    s AS (SELECT doc_id, toks, unnest(range(1, len(toks) + 1, {_CHUNK_S})) AS start
          FROM t),
    c AS (SELECT doc_id,
                 {_HASH15.format(x="array_to_string(toks[start:start + " + str(_CHUNK_W - 1) + "], ' ')")} AS chunk_hash
          FROM s)
    SELECT chunk_hash, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           count(*) AS n_occ
    FROM c GROUP BY chunk_hash HAVING count(DISTINCT doc_id) >= 2
    """,
)
def chunk_dedup_crossdoc(spark, sf_dir):
    """Chunk-level exact dedup — the pass that runs BETWEEN chunking and
    embedding in a RAG/pretraining pipeline (boilerplate paragraphs repeat
    across documents even when whole docs are unique, and embedding a
    duplicate chunk twice wastes the GPU budget): same 50/40 chunker as
    doc_chunking, then a hash-groupBy keeping fingerprints seen in >= 2
    distinct docs. Shuffle carries only (8-byte hash, doc_id) pairs, never
    text, with map-side partial aggregation."""
    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim(F.col("text"))) > 0)
    toked = docs.select(
        "doc_id", text.tokens(text.normalize(F.col("text"))).alias("toks")
    )
    c = toked.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("toks"), F.lit(_CHUNK_S))).alias("start"),
        "toks",
    ).select(
        "doc_id",
        md5_long(
            F.array_join(F.slice(F.col("toks"), F.col("start"), F.lit(_CHUNK_W)), " ")
        ).alias("chunk_hash"),
    )
    return (
        c.groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@register(
    "embedding_dim_stats",
    """
    WITH u AS (SELECT CAST(generate_subscripts(embedding, 1) AS INT) AS dim,
                      CAST(round(unnest(embedding)::DOUBLE * 1000000) AS BIGINT) AS micro
               FROM embeddings)
    SELECT dim, count(*) AS n_vecs,
           CAST(sum(micro) AS BIGINT) AS sum_micro,
           CAST(sum(micro * micro) // count(*) AS BIGINT) AS meansq_micro2
    FROM u GROUP BY dim
    """,
)
def embedding_dim_stats(spark, sf_dir):
    """Per-dimension embedding profile (the sufficient stats for
    mean-centering / whitening / dead-dimension detection before ANN
    indexing): posexplode to (dim, component), integer micro-units, one
    64-group aggregate. sum(micro^2) stays in int64 to ~9e6 vectors per
    dimension (micro^2 <= ~1e12 for unit-scale embeddings); past that cast
    the square to DECIMAL(38,0) on both sides as gini_impurity_profile
    does. DuckDB's unnest/generate_subscripts pair zips positionally —
    same 1-based dim as posexplode's pos + 1."""
    emb = _t(spark, sf_dir, "embeddings")
    u = emb.select(
        F.posexplode(F.col("embedding")).alias("pos", "v")
    ).select(
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.round(F.col("v").cast("double") * 1_000_000).cast("long").alias("micro"),
    )
    return u.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("micro").cast("long").alias("sum_micro"),
        F.expr("sum(micro * micro) div count(*)").alias("meansq_micro2"),
    )


@register(
    "winsorized_price_stats",
    """
    WITH r AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                      row_number() OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
                      count(*) OVER () AS n
               FROM orders),
    b AS (SELECT min(CASE WHEN rn = (n + 99) // 100 THEN cents END) AS lo_cents,
                 min(CASE WHEN rn = (99 * n + 99) // 100 THEN cents END) AS hi_cents
          FROM r)
    SELECT count(*) AS n_orders,
           CAST(b.lo_cents AS BIGINT) AS lo_cents,
           CAST(b.hi_cents AS BIGINT) AS hi_cents,
           CAST(sum(r.cents) AS BIGINT) AS sum_cents_raw,
           CAST(sum(least(greatest(r.cents, b.lo_cents), b.hi_cents)) AS BIGINT)
               AS sum_cents_winsorized
    FROM r CROSS JOIN b
    GROUP BY b.lo_cents, b.hi_cents
    """,
)
def winsorized_price_stats(spark, sf_dir):
    """Winsorized totals (clamp at exact P01/P99 before summing — the
    robust-mean treatment for fat-tailed monetary columns, cf.
    robust_stats_mad's median/MAD tier): the P01/P99 cut values come from
    the distributed global rank (two-phase, never one-task), everything
    after is a 1-row broadcast of the two bounds + a clamped sum. The
    winsorized-vs-raw sum pair is the drift signal dashboards track.

    Eager note: CONSTRUCTING this query runs Spark jobs (the two-phase
    rank's offset collect and localCheckpoint execute at build time), so
    registry functions in this family are not lazy plan builders —
    plan-dump/sweep tooling must reuse _PLAN_CACHE rather than rebuild
    per inspection.
    """
    from etl_mssql_to_postgres_dailysync_spark.operators.cumsum import global_row_number

    orders = _t(spark, sf_dir, "orders")
    ranked, total = global_row_number(
        orders.select("o_totalprice", "o_orderkey"),
        ["o_totalprice", "o_orderkey"],
        "rn",
    )
    cents = ranked.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"), "rn"
    )
    r01 = (total + 99) // 100
    r99 = (99 * total + 99) // 100
    b = cents.filter(F.col("rn").isin(r01, r99)).agg(
        F.min(F.when(F.col("rn") == r01, F.col("cents"))).alias("lo_cents"),
        F.min(F.when(F.col("rn") == r99, F.col("cents"))).alias("hi_cents"),
    )
    return (
        cents.crossJoin(F.broadcast(b))
        .groupBy("lo_cents", "hi_cents")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").cast("long").alias("sum_cents_raw"),
            F.sum(
                F.least(F.greatest(F.col("cents"), F.col("lo_cents")), F.col("hi_cents"))
            ).cast("long").alias("sum_cents_winsorized"),
        )
        .select(
            "n_orders", "lo_cents", "hi_cents",
            "sum_cents_raw", "sum_cents_winsorized",
        )
    )


@register(
    "dedup_jaccard_prefix_filter",
    f"""
    WITH {_SHINGLES_CTE},
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    tf AS (SELECT sh AS tok, count(*) AS df FROM sh GROUP BY sh),
    r AS (SELECT s.doc_id, s.sh,
                 row_number() OVER (PARTITION BY s.doc_id
                                    ORDER BY tf.df ASC, s.sh ASC) AS pos,
                 sz.n
          FROM sh s JOIN tf ON s.sh = tf.tok JOIN sz ON s.doc_id = sz.doc_id),
    pre AS (SELECT doc_id, sh FROM r WHERE pos <= n - (500 * n + 999) // 1000 + 1),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM pre a JOIN pre b ON a.sh = b.sh AND a.doc_id < b.doc_id),
    inter AS (SELECT c.id_a, c.id_b, count(*) AS inter
              FROM cand c
              JOIN sh x ON x.doc_id = c.id_a
              JOIN sh y ON y.doc_id = c.id_b AND y.sh = x.sh
              GROUP BY 1, 2)
    SELECT i.id_a, i.id_b,
           i.inter / (sa.n + sb.n - i.inter) AS jaccard,
           (i.inter * 1000000) // (sa.n + sb.n - i.inter) AS jaccard_ppm
    FROM inter i JOIN sz sa ON sa.doc_id = i.id_a JOIN sz sb ON sb.doc_id = i.id_b
    WHERE (i.inter * 1000000) // (sa.n + sb.n - i.inter) >= 500000
    """,
)
def dedup_jaccard_prefix_filter(spark, sf_dir):
    """Exact 3-gram Jaccard pairs >= 0.5 via PREFIX FILTERING (Bayardo et
    al., WWW'07): a qualifying pair must share a token among each side's
    rarest-first prefix of length |X| - ceil(0.5|X|) + 1, so the inverted
    index holds only prefix postings — the candidate mass that
    dedup_ngram_jaccard_capped bounds HEURISTICALLY (stop-shingle cap,
    conservative underestimate) is here restricted PROVABLY with zero
    missed pairs. tests/test_functions.py asserts result equality with the
    full-index ngram_jaccard_pairs at the same threshold; the oracle
    replays the prefix selection token-for-token (integer ceil, (df, hash)
    order)."""
    return dedup.jaccard_prefix_filter_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        k=3, threshold_milli=500,
    )


@register(
    "grouped_percentiles",
    """
    WITH r AS (SELECT o_orderpriority AS label,
                      CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                      row_number() OVER (PARTITION BY o_orderpriority
                                         ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
                      count(*) OVER (PARTITION BY o_orderpriority) AS n
               FROM orders),
    p AS (SELECT unnest([50, 90]) AS pct)
    SELECT r.label, CAST(p.pct AS INT) AS pct, CAST(r.rn AS BIGINT) AS at_rank,
           r.cents AS value_cents
    FROM r JOIN p ON r.rn = (p.pct * r.n + 99) // 100
    """,
)
def grouped_percentiles(spark, sf_dir):
    """Exact per-group percentiles (P50/P90 order value per priority class)
    as KEY-PARTITIONED windows — the grouped complement of
    exact_percentiles: partitioning by the group key keeps every window
    task at group-size rows (parallel across groups, no global sort, no
    single-task window), which is the scalable shape whenever the group
    count is large and no single group dominates; skewed groups would fall
    back to the two-phase global rank per group.

    Eager note: CONSTRUCTING this query runs Spark jobs (the two-phase
    rank's offset collect and localCheckpoint execute at build time), so
    registry functions in this family are not lazy plan builders —
    plan-dump/sweep tooling must reuse _PLAN_CACHE rather than rebuild
    per inspection.
    """
    orders = _t(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    r = orders.select(
        F.col("o_orderpriority").alias("label"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.row_number().over(wp).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("o_orderpriority")).alias("n"),
    )
    p = F.explode(F.array(F.lit(50), F.lit(90))).alias("pct")
    rp = r.select("label", "cents", "rn", "n", p)
    return rp.filter(
        F.col("rn") == F.expr("(pct * n + 99) div 100")
    ).select(
        "label",
        F.col("pct").cast("int").alias("pct"),
        F.col("rn").cast("long").alias("at_rank"),
        F.col("cents").alias("value_cents"),
    )


def _drift_col_sql(col: str) -> str:
    return f"""
    SELECT '{col}' AS column_name,
           count(*) FILTER (WHERE o_orderdate < DATE '1995-01-01') AS rows_a,
           count(*) FILTER (WHERE o_orderdate >= DATE '1995-01-01') AS rows_b,
           CAST(count(DISTINCT {col}) FILTER (WHERE o_orderdate < DATE '1995-01-01') AS BIGINT) AS ndv_a,
           CAST(count(DISTINCT {col}) FILTER (WHERE o_orderdate >= DATE '1995-01-01') AS BIGINT) AS ndv_b,
           CAST(count(*) FILTER (WHERE {col} IS NULL AND o_orderdate < DATE '1995-01-01') AS BIGINT) AS nulls_a,
           CAST(count(*) FILTER (WHERE {col} IS NULL AND o_orderdate >= DATE '1995-01-01') AS BIGINT) AS nulls_b
    FROM orders
    """


@register(
    "column_drift_audit",
    " UNION ALL ".join(
        [_drift_col_sql(c) for c in ("o_orderstatus", "o_orderpriority", "o_custkey")]
    ),
)
def column_drift_audit(spark, sf_dir):
    """Schema/content drift audit between two ingest periods (pre/post
    1995): per column, row counts, EXACT distinct counts, and null counts
    for each period side by side — the data-contract check a daily sync
    runs before loading (a priority enum gaining a value or a key column
    going sparse is caught here, not in the warehouse). One pass per
    column; conditional countDistinct keeps both periods in a single scan
    of each."""
    orders = _t(spark, sf_dir, "orders")
    a = F.col("o_orderdate") < F.lit("1995-01-01").cast("date")
    b = ~a

    def audit(col):
        return orders.agg(
            F.lit(col).alias("column_name"),
            F.count_if(a).alias("rows_a"),
            F.count_if(b).alias("rows_b"),
            F.countDistinct(F.when(a, F.col(col))).cast("long").alias("ndv_a"),
            F.countDistinct(F.when(b, F.col(col))).cast("long").alias("ndv_b"),
            F.count_if(a & F.col(col).isNull()).cast("long").alias("nulls_a"),
            F.count_if(b & F.col(col).isNull()).cast("long").alias("nulls_b"),
        )

    return (
        audit("o_orderstatus")
        .unionAll(audit("o_orderpriority"))
        .unionAll(audit("o_custkey"))
    )


_SIMHASH_SQL = """
    t1 AS (SELECT doc_id, {toks} AS tk FROM documents),
    tkx AS (SELECT DISTINCT doc_id, unnest(tk) AS t FROM t1),
    th AS (SELECT doc_id, {h15} AS h FROM tkx),
    bits AS (SELECT unnest(range(0, 60)) AS j),
    votes AS (
        SELECT doc_id, j, sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS cnt
        FROM th CROSS JOIN bits GROUP BY doc_id, j
    ),
    shv AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN cnt > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
        FROM votes GROUP BY doc_id
    )
"""


@register(
    "dedup_simhash_neardup",
    f"""
    WITH {_SIMHASH_SQL.format(toks=_TOKS_SQL, h15=_HASH15.format(x='t'))},
    bands AS (
        SELECT doc_id, simhash, b AS band_id,
               (simhash >> (15 * b)) & 32767 AS band_val
        FROM shv CROSS JOIN (SELECT unnest(range(0, 4)) AS b) t
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.simhash AS sa, b.simhash AS sb
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 3
    """,
)
def dedup_simhash_neardup(spark, sf_dir):
    """SimHash near-duplicate PAIRS at Hamming <= 3 via band blocking
    (Manku et al., WWW'07 — the production web near-dup design): the 60-bit
    fingerprint splits into 4 bands of 15 bits; by pigeonhole any pair
    within Hamming 3 agrees EXACTLY on at least one band, so candidates
    come from 4 equi-joins on (band_id, band_val) — never an all-pairs
    Hamming scan — and the bit_count(xor) verify runs only on candidates.
    Completes the text-simhash tier (dedup_simhash emits fingerprints; the
    image analog is multimodal_dhash_neardup)."""
    sh = _t(spark, sf_dir, "documents").select(
        "doc_id", dedup.simhash(F.col("text")).alias("simhash")
    )
    bands = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[F.lit(b) for b in range(4)])).alias("band_id"),
    ).withColumn(
        "band_val", F.expr("(simhash >> (band_id * 15)) & 32767")
    )
    a = bands.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"),
        "band_id", "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"),
        "band_id", "band_val",
    )
    cand = (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sa", "sb")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int")
        )
        .filter(F.col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Corpus language-model statistics: surprisal / LM scoring / OOV / KL
# (the perplexity-style quality-filter family of a pretraining pipeline,
#  with the LM trained on the corpus itself — no external model needed)
# ---------------------------------------------------------------------------

# shared CTE: per-doc token arrays, token stream, unigram counts, token mass.
# Parity note on ln(): both engines evaluate ln over BIGINT-valued doubles;
# verified bit-equal after round(x*1e6) across 1..2e6 (and the ln(a)-ln(b)
# difference form) between Spark's Math.log and DuckDB's libm log — the
# micro-nat convention rides on that, with round() killing residual ulps.
_LM_CTE = f"""
    t1 AS (SELECT doc_id, source, {_TOKS_SQL} AS tk
           FROM documents WHERE length(trim(text)) > 0),
    tok AS (SELECT doc_id, source, unnest(tk) AS tok FROM t1),
    u AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
    nu AS (SELECT CAST(sum(c) AS BIGINT) AS nu FROM u)
"""


def _lm_parts(spark, sf_dir):
    """Shared Spark side of _LM_CTE: (t1, tok, u, nu)."""
    t1 = (
        _t(spark, sf_dir, "documents")
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", "source", text.tokens(text.normalize(F.col("text"))).alias("tk"))
    )
    tok = t1.select("doc_id", "source", F.explode("tk").alias("tok"))
    u = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    nu = u.agg(F.sum("c").cast("long").alias("nu"))
    return t1, tok, u, nu


@register(
    "text_unigram_surprisal",
    f"""
    WITH {_LM_CTE},
    su AS (SELECT tok, CAST(round((ln(CAST(nu AS DOUBLE)) - ln(CAST(c AS DOUBLE)))
                               * 1000000) AS BIGINT) AS s_unat
           FROM u CROSS JOIN nu),
    d AS (SELECT t.doc_id, count(*) AS n_tokens, sum(s.s_unat) AS s_sum
          FROM tok t JOIN su s USING (tok) GROUP BY 1)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(s_sum // n_tokens AS BIGINT) AS mean_surprisal_unat
    FROM d
    """,
)
def text_unigram_surprisal(spark, sf_dir):
    """Per-document mean token surprisal -ln p(w) in integer MICRO-NATS,
    with the unigram LM trained on the corpus itself — the cheapest
    perplexity-proxy quality signal (gibberish/boilerplate scores high/low
    without any external model). Surprisal ln(Nu)-ln(c) is rounded to an
    int per VOCAB ENTRY (vocab-sized table, one ln pair per type), then
    per-doc aggregation is exact BIGINT sums — partial-aggregable and
    engine-parity-exact (ln parity verified; see _LM_CTE note). Both
    operands are non-negative so Spark's truncating `div` and DuckDB's
    flooring `//` agree. Plan: token-keyed equi-join of the token stream
    against the vocab table (8-byte-hashable shuffle keys), one scalar
    crossJoin (1-row token mass). At 100 TB the vocab table is ~1e8 rows —
    still an ordinary shuffle join; nothing is collected."""
    _t1, tok, u, nu = _lm_parts(spark, sf_dir)
    su = u.crossJoin(F.broadcast(nu)).select(
        "tok",
        F.round(
            (F.log(F.col("nu").cast("double")) - F.log(F.col("c").cast("double")))
            * 1000000
        ).cast("long").alias("s_unat"),
    )
    d = tok.join(su, "tok").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"), F.sum("s_unat").alias("s_sum")
    )
    return d.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.expr("s_sum div n_tokens").alias("mean_surprisal_unat"),
    )


@register(
    "text_bigram_lm_score",
    f"""
    WITH {_LM_CTE},
    vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM u),
    bp AS (SELECT doc_id, tk, unnest(range(2, len(tk) + 1)) AS i
           FROM t1 WHERE len(tk) >= 2),
    b AS (SELECT doc_id, tk[i-1] AS w1, tk[i] AS w2 FROM bp),
    bg AS (SELECT w1, w2, count(*) AS cxy FROM b GROUP BY 1, 2),
    sc AS (SELECT bg.w1, bg.w2,
                  CAST(round((ln(CAST(u.c + vs.v AS DOUBLE))
                              - ln(CAST(bg.cxy + 1 AS DOUBLE))) * 1000000) AS BIGINT)
                      AS nlp_unat
           FROM bg JOIN u ON bg.w1 = u.tok CROSS JOIN vs),
    d AS (SELECT b.doc_id, count(*) AS n_bigrams, sum(sc.nlp_unat) AS nlp_sum
          FROM b JOIN sc ON b.w1 = sc.w1 AND b.w2 = sc.w2 GROUP BY 1)
    SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CAST(nlp_sum // n_bigrams AS BIGINT) AS mean_nlp_unat,
           CAST(CASE WHEN nlp_sum // n_bigrams >= 9000000 THEN 1 ELSE 0 END AS INT)
               AS low_quality
    FROM d
    """,
)
def text_bigram_lm_score(spark, sf_dir):
    """Per-document add-one-smoothed bigram LM negative log-likelihood —
    the KenLM-style perplexity filter of CCNet/RefinedWeb, self-trained:
    p(w2|w1) = (c12+1)/(c1+V), doc score = mean -ln p over bigram
    positions, in integer micro-nats (ln(c1+V) >= ln(c12+1), so every term
    is non-negative and trunc-vs-floor division agrees cross-engine).
    `low_quality` flags score >= 9 nats (~e^9 perplexity) — the
    deterministic keep/drop gate a curation pipeline applies. Plan shape:
    bigram positions come from an index transform over the per-doc token
    array (no self-join), the model table bg is (w1,w2)-keyed with
    map-side combine, scoring is one equi-join of positions against the
    model plus a 1-row vocab-size scalar. All state is corpus-derived and
    shuffle-joined — a 100 TB corpus trains and applies its own LM in two
    passes, nothing driver-side."""
    t1, _tok, u, _nu = _lm_parts(spark, sf_dir)
    b = (
        t1.filter(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1), "
                    "i -> struct(tk[i-1] AS w1, tk[i] AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    bg = b.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cxy"))
    vs = u.agg(F.count(F.lit(1)).cast("long").alias("v"))
    sc = (
        bg.join(u.select(F.col("tok").alias("w1"), "c"), "w1")
        .crossJoin(F.broadcast(vs))
        .select(
            "w1", "w2",
            F.round(
                (F.log((F.col("c") + F.col("v")).cast("double"))
                 - F.log((F.col("cxy") + F.lit(1)).cast("double"))) * 1000000
            ).cast("long").alias("nlp_unat"),
        )
    )
    d = b.join(sc, ["w1", "w2"]).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("nlp_unat").alias("nlp_sum")
    )
    return d.select(
        "doc_id",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.expr("nlp_sum div n_bigrams").alias("mean_nlp_unat"),
        F.when(F.expr("nlp_sum div n_bigrams") >= 9000000, F.lit(1))
        .otherwise(F.lit(0)).cast("int").alias("low_quality"),
    )


@register(
    "text_oov_rate",
    f"""
    WITH {_LM_CTE},
    d AS (SELECT t.doc_id, count(*) AS n_tokens,
                 sum(CASE WHEN u.c <= 2 THEN 1 ELSE 0 END) AS n_rare
          FROM tok t JOIN u USING (tok) GROUP BY 1)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_rare AS BIGINT) AS n_rare,
           CAST(n_rare * 1000000 // n_tokens AS BIGINT) AS rare_ppm
    FROM d
    """,
)
def text_oov_rate(spark, sf_dir):
    """Per-document rare-token rate: share of token POSITIONS whose corpus
    frequency is <= 2 (hapax/dis legomena — the OOV-proxy used to catch
    mojibake, hash-spam, and OCR noise without a reference vocabulary).
    Fully integer (ppm via non-negative floor division), so bit-exact
    cross-engine. Same two-pass plan as text_unigram_surprisal: build the
    vocab-count table, equi-join the token stream back against it — both
    shuffles are token-keyed with map-side combine, no driver state."""
    _t1, tok, u, _nu = _lm_parts(spark, sf_dir)
    d = tok.join(u, "tok").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("c") <= 2, 1).otherwise(0)).alias("n_rare"),
    )
    return d.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_rare").cast("long").alias("n_rare"),
        F.expr("n_rare * 1000000 div n_tokens").alias("rare_ppm"),
    )


@register(
    "source_kl_divergence",
    f"""
    WITH {_LM_CTE},
    s AS (SELECT source, tok, count(*) AS cs FROM tok GROUP BY 1, 2),
    ns AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ns FROM s GROUP BY 1),
    term AS (SELECT s.source,
                    s.cs * CAST(round((ln(CAST(s.cs AS DOUBLE)) + ln(CAST(nu.nu AS DOUBLE))
                                       - ln(CAST(ns.ns AS DOUBLE)) - ln(CAST(u.c AS DOUBLE)))
                                      * 1000000) AS BIGINT) AS kt
             FROM s JOIN ns USING (source) JOIN u USING (tok) CROSS JOIN nu),
    agg AS (SELECT source, sum(kt) AS ks FROM term GROUP BY 1),
    tv AS (SELECT source, CAST(count(*) AS BIGINT) AS n_types FROM s GROUP BY 1)
    SELECT a.source, ns.ns AS n_tokens, tv.n_types,
           CAST(greatest(a.ks, 0) // ns.ns AS BIGINT) AS kl_unat
    FROM agg a JOIN ns USING (source) JOIN tv USING (source)
    """,
)
def source_kl_divergence(spark, sf_dir):
    """KL(source || corpus) over unigram distributions, in micro-nats —
    the domain-shift measure behind mixture reweighting (how far each
    source's token distribution sits from the blend it feeds). Per
    (source, type): cs * round((ln cs + ln Nu - ln Ns - ln c) * 1e6),
    summed as exact BIGINTs; individual terms may be negative but the
    total is >= -rounding-mass, clamped at 0 on BOTH sides before the
    final non-negative division so trunc-vs-floor never diverges.
    Int64 bound: |term| <= cs * ~2e7, so the per-source sum stays in
    int64 while source token mass < ~4e11 (document-scale corpora; widen
    to DECIMAL(38,0) past that, as gini_impurity_profile does). Plan:
    (source, tok)-keyed count, two equi-joins (ns broadcastable — one row
    per source; u is the vocab-sized shuffle side), one 1-row scalar
    crossJoin. Output is source-grain — tiny at any corpus size."""
    _t1, tok, u, nu = _lm_parts(spark, sf_dir)
    s = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("cs"))
    ns = s.groupBy("source").agg(F.sum("cs").cast("long").alias("ns"))
    term = (
        s.join(F.broadcast(ns), "source")
        .join(u, "tok")
        .crossJoin(F.broadcast(nu))
        .select(
            "source",
            (
                F.col("cs")
                * F.round(
                    (F.log(F.col("cs").cast("double")) + F.log(F.col("nu").cast("double"))
                     - F.log(F.col("ns").cast("double")) - F.log(F.col("c").cast("double")))
                    * 1000000
                ).cast("long")
            ).alias("kt"),
        )
    )
    agg = term.groupBy("source").agg(F.sum("kt").alias("ks"))
    tv = s.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    return (
        agg.join(F.broadcast(ns), "source")
        .join(F.broadcast(tv), "source")
        .select(
            "source",
            F.col("ns").alias("n_tokens"),
            "n_types",
            F.expr("greatest(ks, 0L) div ns").alias("kl_unat"),
        )
    )


@register(
    "dedup_lsh_audit",
    f"""
    WITH {_SHINGLES_CTE},
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    truth AS (
        SELECT id_a, id_b
        FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        WHERE (inter * 1000000) // (sa.n + sb.n - inter) >= 500000
    ),
    cand AS (SELECT id_a, id_b FROM ({ORACLES["dedup_minhash_lsh"]})),
    hits AS (SELECT t.id_a, t.id_b FROM truth t
             JOIN cand c ON t.id_a = c.id_a AND t.id_b = c.id_b)
    SELECT nc.n_candidates, nt.n_truth, nh.n_hits,
           CAST(nh.n_hits * 1000000 // greatest(nc.n_candidates, 1) AS BIGINT)
               AS precision_ppm,
           CAST(nh.n_hits * 1000000 // greatest(nt.n_truth, 1) AS BIGINT)
               AS recall_ppm
    FROM (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM cand) nc
    CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth) nt
    CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n_hits FROM hits) nh
    """,
)
def dedup_lsh_audit(spark, sf_dir):
    """Measured precision/recall of the MinHash(16)+LSH(4x4) candidate
    generator against EXACT 3-shingle Jaccard >= 0.5 truth — the empirical
    S-curve check that tells you whether the banding geometry fits the
    corpus before a full dedup run trusts it (complements minhash_band_stats'
    structural diagnostics and RECALL.md's ANN numbers with an
    oracle-twinned in-registry metric). The truth side is the unblocked
    inverted-index Jaccard join (candidate-pair-mass-bound); at 100 TB this
    audit runs on a deterministic hash sample of the corpus (cf.
    deterministic_sample) — the registry fixture IS that sample here. All
    outputs are integer counts/ppm; the three 1-row tallies cross-join into
    a single driver-safe audit row."""
    docs = _t(spark, sf_dir, "documents")
    cand = dedup.minhash_lsh_pairs(
        docs, "text", "doc_id", num_hashes=16, bands=4, k=3
    ).select("id_a", "id_b")
    truth = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", k=3, threshold=0.5
    ).select("id_a", "id_b")
    hits = truth.join(cand, ["id_a", "id_b"])
    nc = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    nt = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    nh = hits.agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    return (
        nc.crossJoin(nt)
        .crossJoin(nh)
        .select(
            "n_candidates", "n_truth", "n_hits",
            F.expr("n_hits * 1000000 div greatest(n_candidates, 1)")
            .cast("long").alias("precision_ppm"),
            F.expr("n_hits * 1000000 div greatest(n_truth, 1)")
            .cast("long").alias("recall_ppm"),
        )
    )


@register(
    "dedup_lsh_audit_wide",
    # identical audit against the SAME exact-Jaccard truth, but candidates
    # from the high-recall 8-bands x 2-rows geometry: only the band grouping
    # (seed // rows_per_band) changes in the oracle
    ORACLES["dedup_lsh_audit"].replace("seed // 4", "seed // 2"),
)
def dedup_lsh_audit_wide(spark, sf_dir):
    """The same precision/recall audit as dedup_lsh_audit, at the
    high-recall banding geometry: 16 MinHashes as 8 bands x 2 rows.
    P(candidate) = 1-(1-J^2)^8 — at J=0.5 that's ~0.90 vs ~0.23 for the
    4x4 split, at the cost of far more sub-threshold candidates (the
    2-row band agreement is weak evidence). Running both audits against
    the identical exact-Jaccard truth maps the banding S-curve frontier
    EMPIRICALLY on the corpus at hand — the measurement that picks (b, r)
    before a 100 TB dedup run commits to a geometry. Same plan shape and
    scale story as dedup_lsh_audit."""
    docs = _t(spark, sf_dir, "documents")
    cand = dedup.minhash_lsh_pairs(
        docs, "text", "doc_id", num_hashes=16, bands=8, k=3
    ).select("id_a", "id_b")
    truth = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", k=3, threshold=0.5
    ).select("id_a", "id_b")
    hits = truth.join(cand, ["id_a", "id_b"])
    nc = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    nt = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    nh = hits.agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    return (
        nc.crossJoin(nt)
        .crossJoin(nh)
        .select(
            "n_candidates", "n_truth", "n_hits",
            F.expr("n_hits * 1000000 div greatest(n_candidates, 1)")
            .cast("long").alias("precision_ppm"),
            F.expr("n_hits * 1000000 div greatest(n_truth, 1)")
            .cast("long").alias("recall_ppm"),
        )
    )


@register(
    "text_zipf_fit",
    f"""
    WITH {_LM_CTE},
    r AS (SELECT tok, c, row_number() OVER (ORDER BY c DESC, tok ASC) AS rnk FROM u),
    p AS (SELECT CAST(round(ln(CAST(rnk AS DOUBLE)) * 1000) AS BIGINT) AS x,
                 CAST(round(ln(CAST(c AS DOUBLE)) * 1000) AS BIGINT) AS y
          FROM r),
    s AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy
          FROM p)
    SELECT CAST(n AS BIGINT) AS n_types,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
                 (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6) AS zipf_slope,
           round((CAST(sy AS DOUBLE) -
                  ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
                   (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                  * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) / 1000, 6)
               AS intercept_lnfreq
    FROM s
    """,
)
def text_zipf_fit(spark, sf_dir):
    """Zipf-law fit over the corpus token-frequency distribution: OLS slope
    of ln(freq) vs ln(rank) (healthy natural-language corpora sit near -1;
    template/spam-heavy crawls flatten or steepen it — a one-number corpus
    health gauge). Frequency rank comes from operators/cumsum.
    global_row_number — the vocab table can be ~1e8 rows at 100 TB, so the
    rank is two-phase range-exchange, never a single-task window (the SQL
    oracle may use the window; DuckDB is the small-scale referee). (x, y)
    are MILLI-nat integers (x*y <= ~4e8, so the int64 sufficient stats
    survive vocab ~2e10); the slope/intercept are the same
    fixed-IEEE-on-exact-int-sums expression as manual_corr_stats, rounded
    to 6 dp on both sides. Output is one row — driver-safe anywhere.

    Eager note: CONSTRUCTING this query runs Spark jobs (the two-phase
    rank's offset collect and localCheckpoint execute at build time), so
    registry functions in this family are not lazy plan builders —
    plan-dump/sweep tooling must reuse _PLAN_CACHE rather than rebuild
    per inspection.
    """
    from etl_mssql_to_postgres_dailysync_spark.operators.cumsum import global_row_number

    _t1, _tok, u, _nu = _lm_parts(spark, sf_dir)
    ranked, _total = global_row_number(
        u.withColumn("negc", -F.col("c")), ["negc", "tok"], out_col="rnk"
    )
    p = ranked.select(
        F.round(F.log(F.col("rnk").cast("double")) * 1000).cast("long").alias("x"),
        F.round(F.log(F.col("c").cast("double")) * 1000).cast("long").alias("y"),
    )
    s = p.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    slope = (nd * F.col("sxy") - sxd * F.col("sy")) / (
        nd * F.col("sxx") - sxd * F.col("sx")
    )
    return s.select(
        F.col("n").cast("long").alias("n_types"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((syd - slope * sxd) / nd / 1000, 6).alias("intercept_lnfreq"),
    )


@register(
    "event_transition_entropy",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    c AS (SELECT event_type, next_type, count(*) AS c
          FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
    a AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS n_next_states,
                 CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT))
                     AS BIGINT) AS sclnc
          FROM c GROUP BY 1)
    SELECT event_type, n AS n_transitions, n_next_states,
           CAST(greatest(n * CAST(round(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
                         - sclnc, 0) // n AS BIGINT) AS entropy_unat
    FROM a
    """,
)
def event_transition_entropy(spark, sf_dir):
    """Conditional next-event entropy H(next | state) per event type in
    micro-nats — the information-theoretic summary of the Markov matrix
    (event_transition_matrix gives the counts; this says which states are
    deterministic funnels vs diverse hubs — bot traffic and broken flows
    show up as near-zero entropy). H = ln(n) - (1/n) * sum c*ln(c),
    computed from per-count rounded micro-nat integers (ln parity note in
    _LM_CTE) with exact BIGINT sums; the numerator is clamped at 0 on both
    sides before the non-negative division (rounding can push an exactly-
    zero-entropy state epsilon-negative, and trunc-vs-floor differ there).
    Int64 bound: n * ln(n)*1e6 overflows past n ~ 4.6e11 transitions per
    state — DECIMAL(38,0) escape hatch as gini_impurity_profile. Plan:
    user-keyed lead window (parallel across users), then an event-type^2
    aggregate — constant-size output."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    c = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a = c.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_next_states"),
        F.sum(
            F.col("c")
            * F.round(F.log(F.col("c").cast("double")) * 1000000).cast("long")
        ).cast("long").alias("sclnc"),
    )
    return a.select(
        "event_type",
        F.col("n").alias("n_transitions"),
        "n_next_states",
        F.expr(
            "greatest(n * CAST(round(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)"
            " - sclnc, 0L) div n"
        ).alias("entropy_unat"),
    )


@register(
    "mixture_alpha_weights",
    f"""
    WITH {_LM_CTE},
    ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_toks FROM tok GROUP BY 1),
    r AS (SELECT source, n_toks,
                 CAST(round(sqrt(CAST(n_toks AS DOUBLE)) * 1000) AS BIGINT) AS r_milli
          FROM ns),
    tot AS (SELECT CAST(sum(n_toks) AS BIGINT) AS nt,
                   CAST(sum(r_milli) AS BIGINT) AS rt FROM r)
    SELECT source, n_toks,
           CAST(n_toks * 1000000 // tot.nt AS BIGINT) AS raw_ppm,
           CAST(r_milli * 1000000 // tot.rt AS BIGINT) AS alpha_ppm
    FROM r CROSS JOIN tot
    """,
)
def mixture_alpha_weights(spark, sf_dir):
    """Temperature-smoothed source sampling weights at alpha = 0.5: the
    p^alpha / sum p^alpha rule (mBERT/XLM multilingual sampling) that
    up-weights low-resource sources without letting any source dominate —
    the knob a 100 TB mixture schedule turns. alpha = 0.5 means
    p^alpha = sqrt(p), and IEEE-754 guarantees sqrt is CORRECTLY rounded
    (unlike pow/exp/ln's 1-ulp license), so round(sqrt(bigint)*1e3) is
    bit-equal cross-engine by spec, not by measurement; the normalization
    is then pure non-negative integer arithmetic. Contrast raw_ppm
    (proportional sampling) vs alpha_ppm in one source-grain row set. One
    aggregate + a 1-row totals scalar — trivially scale-safe."""
    _t1, tok, _u, _nu = _lm_parts(spark, sf_dir)
    ns = tok.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_toks"))
    r = ns.select(
        "source", "n_toks",
        F.round(F.sqrt(F.col("n_toks").cast("double")) * 1000)
        .cast("long").alias("r_milli"),
    )
    tot = r.agg(
        F.sum("n_toks").cast("long").alias("nt"),
        F.sum("r_milli").cast("long").alias("rt"),
    )
    return r.crossJoin(F.broadcast(tot)).select(
        "source", "n_toks",
        F.expr("n_toks * 1000000 div nt").alias("raw_ppm"),
        F.expr("r_milli * 1000000 div rt").alias("alpha_ppm"),
    )


@register(
    "lang_id_confusion",
    f"""
    WITH pred AS ({_lang_id_oracle()}),
    j AS (SELECT d.lang AS lang_true, p.lang_pred
          FROM documents d JOIN pred p ON d.doc_id = p.doc_id)
    SELECT lang_true, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
    FROM j GROUP BY 1, 2
    """,
)
def lang_id_confusion(spark, sf_dir):
    """Confusion matrix of the heuristic language-ID against the labeled
    `lang` column — the QA loop every classifier-driven curation filter
    needs (per-(true, predicted) document counts expose exactly which
    languages the marker lexicons confuse, and the `und` row sizes the
    coverage gap). Doc-keyed equi-join of predictions onto labels, then a
    bounded-cardinality (|langs|^2) aggregate — trivially 100 TB-safe."""
    pred = text_lang_id(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("lang_true")
    )
    return docs.join(pred, "doc_id").groupBy("lang_true", "lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "knn_label_agreement",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
               FROM embeddings WHERE vec_id < 50),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS cl
          FROM embeddings),
    scored AS (
        SELECT q.query_id, q.ql, c.neighbor_id, c.cl, {_COS_SQL} AS sim
        FROM c CROSS JOIN q WHERE c.neighbor_id <> q.query_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id ASC) AS rank
        FROM scored
    ),
    top AS (SELECT * FROM ranked WHERE rank <= 5)
    SELECT query_id, CAST(max(ql) AS INT) AS label,
           CAST(sum(CASE WHEN cl = ql THEN 1 ELSE 0 END) AS BIGINT) AS n_same_label,
           CAST(CASE WHEN sum(CASE WHEN cl = ql THEN 1 ELSE 0 END) * 2 > 5
                THEN 1 ELSE 0 END AS INT) AS knn_majority_match
    FROM top GROUP BY 1
    """,
)
def knn_label_agreement(spark, sf_dir):
    """Embedding-space quality audit: does each query vector's exact
    top-5 cosine neighborhood share its label? (kNN label agreement — the
    standard probe for whether an embedding column is usable for
    label-propagation / SemDeDup-style curation before spending a
    clustering run on it.) Reuses the broadcast-queries brute-force top-k
    (corpus scan stays shuffle-free; candidate set is k x |queries| rows),
    then joins the 250-row top-k result to the label column (broadcast
    side = the top-k rows, never the corpus) and aggregates per query.
    Label agreement is pure integer counting — bit-exact cross-engine."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 50)
    topk = similarity.brute_force_topk(qs, emb, k=5)
    ql = qs.select(F.col("vec_id").alias("query_id"), F.col("label").alias("ql"))
    cl = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("cl"))
    j = cl.join(
        F.broadcast(topk.join(F.broadcast(ql), "query_id")), "neighbor_id"
    )
    return j.groupBy("query_id").agg(
        F.max("ql").cast("int").alias("label"),
        F.sum(F.when(F.col("cl") == F.col("ql"), 1).otherwise(0))
        .cast("long")
        .alias("n_same_label"),
        F.when(
            F.sum(F.when(F.col("cl") == F.col("ql"), 1).otherwise(0)) * 2 > 5,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("knn_majority_match"),
    )


@register(
    "label_centroid_separation",
    """
    WITH u AS (SELECT label, CAST(generate_subscripts(embedding, 1) AS INT) AS dim,
                      CAST(round(unnest(embedding)::DOUBLE * 1000000) AS BIGINT) AS micro
               FROM embeddings),
    c AS (SELECT label, dim,
                 CAST((sum(micro) + count(*) * 10000000) // count(*) AS BIGINT) AS cent
          FROM u GROUP BY 1, 2)
    SELECT a.label AS label_a, b.label AS label_b,
           CAST(sum((a.cent - b.cent) * (a.cent - b.cent)) AS BIGINT) AS dist_micro2
    FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
    GROUP BY 1, 2
    """,
)
def label_centroid_separation(spark, sf_dir):
    """Pairwise squared distance between per-label centroids in integer
    micro-units — the class-separation matrix that says whether an
    embedding column carries enough signal for label-propagation /
    cluster-based curation (complements knn_label_agreement's local view
    with the global geometry). Centroid components are floor-mean micros
    computed as (sum + n*OFFSET) div n with OFFSET=1e7 so the dividend is
    always positive: Spark's truncating `div` and DuckDB's flooring `//`
    agree only on non-negative operands, and the offset cancels exactly in
    the centroid difference. Plan: one (label, dim) aggregate over the
    posexploded corpus (partial-aggregable), then a dim-keyed self-join of
    the |labels|*|dims| centroid table — metadata-sized at any corpus
    scale."""
    emb = _t(spark, sf_dir, "embeddings")
    u = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "v")
    ).select(
        "label",
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.round(F.col("v").cast("double") * 1_000_000).cast("long").alias("micro"),
    )
    c = u.groupBy("label", "dim").agg(
        F.expr("(sum(micro) + count(1) * 10000000L) div count(1)").alias("cent")
    )
    a = c.select(F.col("label").alias("label_a"), "dim", F.col("cent").alias("ca"))
    b = c.select(F.col("label").alias("label_b"), "dim", F.col("cent").alias("cb"))
    return (
        a.join(b, "dim")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")))
            .cast("long")
            .alias("dist_micro2")
        )
    )


# ---------------------------------------------------------------------------
# r5 tranche: mergeable-sketch set overlap, join-cardinality pre-flight,
# exact distributed weighted order statistics, and embedding redundancy.
# ---------------------------------------------------------------------------

_KMVJ_K = 64
# 13 hex chars = 52 bits, matching kmv_distinct_sketch's estimate formula
_KMVJ_HASH = "CAST('0x' || substr(md5(tok), 1, 13) AS BIGINT)"


@register(
    "kmv_cross_source_jaccard",
    f"""
    WITH t1 AS (SELECT source, {_TOKS_SQL} AS tk
                FROM documents WHERE length(trim(text)) > 0),
    toks AS (SELECT DISTINCT source, unnest(tk) AS tok FROM t1),
    h AS (SELECT source, {_KMVJ_HASH} AS h FROM toks),
    r AS (SELECT source, h,
                 row_number() OVER (PARTITION BY source ORDER BY h ASC) AS rn
          FROM h),
    sk AS (SELECT source, h FROM r WHERE rn <= {_KMVJ_K}),
    srcs AS (SELECT DISTINCT source FROM sk),
    pairs AS (SELECT a.source AS source_a, b.source AS source_b
              FROM srcs a JOIN srcs b ON a.source < b.source),
    merged AS (SELECT p.source_a, p.source_b, s.h,
                      max(CASE WHEN s.source = p.source_a THEN 1 ELSE 0 END) AS in_a,
                      max(CASE WHEN s.source = p.source_b THEN 1 ELSE 0 END) AS in_b
               FROM pairs p
               JOIN sk s ON s.source IN (p.source_a, p.source_b)
               GROUP BY 1, 2, 3),
    rk AS (SELECT *, row_number() OVER (PARTITION BY source_a, source_b
                                        ORDER BY h ASC) AS rn
           FROM merged),
    est AS (SELECT source_a, source_b,
                   count(*) AS k_eff, max(h) AS kth,
                   sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS n_both
            FROM rk WHERE rn <= {_KMVJ_K} GROUP BY 1, 2),
    exacts AS (SELECT source, count(*) AS nd FROM toks GROUP BY 1),
    inter AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS ni
              FROM toks a JOIN toks b ON a.tok = b.tok AND a.source < b.source
              GROUP BY 1, 2)
    SELECT e.source_a, e.source_b,
           CAST(e.n_both * 1000000 // e.k_eff AS BIGINT) AS jaccard_est_ppm,
           CAST(CASE WHEN e.k_eff < {_KMVJ_K} THEN e.k_eff
                     ELSE ({_KMVJ_K} - 1) * (CAST(1 AS BIGINT) << 52) // e.kth
                END AS BIGINT) AS union_est,
           CAST(coalesce(i.ni, 0) * 1000000
                // (xa.nd + xb.nd - coalesce(i.ni, 0)) AS BIGINT) AS jaccard_exact_ppm,
           CAST(xa.nd + xb.nd - coalesce(i.ni, 0) AS BIGINT) AS union_exact
    FROM est e
    JOIN exacts xa ON xa.source = e.source_a
    JOIN exacts xb ON xb.source = e.source_b
    LEFT JOIN inter i ON i.source_a = e.source_a AND i.source_b = e.source_b
    """,
)
def kmv_cross_source_jaccard(spark, sf_dir):
    """Pairwise token-set overlap between sources from MERGEABLE KMV
    sketches (Beyer et al. 2007 / the theta-sketch set-operation pattern):
    keep the k=64 smallest 52-bit hashes per source, estimate a pair's
    Jaccard as the fraction of the k smallest MERGED hashes present in
    both sketches, and the union size with the standard (k-1)*2^52/kth
    estimator. The audit columns put the EXACT Jaccard/union next to the
    estimates — at fixture scale the oracle affords the exact self-join;
    at 100 TB only the sketch path runs (per-source state is k rows, pair
    comparison is sketch-x-sketch, never corpus-x-corpus) and this query
    is the calibration that says what k buys. All integer (ppm floor
    division on non-negative operands), so bit-exact cross-engine.
    Plan: one distinct (source, token) shuffle, a per-source-partitioned
    rank (parallel across sources), then all pair logic runs on <= k rows
    per source — driver-scale metadata."""
    t1 = (
        _t(spark, sf_dir, "documents")
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .select("source", text.tokens(text.normalize(F.col("text"))).alias("tk"))
    )
    toks = t1.select("source", F.explode("tk").alias("tok")).distinct()
    h = toks.select(
        "source",
        F.conv(F.substring(F.md5(F.col("tok")), 1, 13), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    w = Window.partitionBy("source").orderBy(F.col("h").asc())
    sk = h.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _KMVJ_K
    ).select("source", "h")
    srcs = sk.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("source_a"))
        .join(
            srcs.select(F.col("source").alias("source_b")),
            F.col("source_a") < F.col("source_b"),
        )
    )
    merged = (
        pairs.join(
            F.broadcast(sk),
            (F.col("source") == F.col("source_a"))
            | (F.col("source") == F.col("source_b")),
        )
        .groupBy("source_a", "source_b", "h")
        .agg(
            F.max(F.when(F.col("source") == F.col("source_a"), 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("source") == F.col("source_b"), 1).otherwise(0)).alias("in_b"),
        )
    )
    wm = Window.partitionBy("source_a", "source_b").orderBy(F.col("h").asc())
    est = (
        merged.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") <= _KMVJ_K)
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("k_eff"),
            F.max("h").alias("kth"),
            F.sum(F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)).alias("n_both"),
        )
    )
    exacts = toks.groupBy("source").agg(F.count(F.lit(1)).alias("nd"))
    ta = toks.select(F.col("source").alias("source_a"), "tok")
    tb = toks.select(F.col("source").alias("source_b"), "tok")
    inter = (
        ta.join(tb, (ta["tok"] == tb["tok"]) & (F.col("source_a") < F.col("source_b")))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    return (
        est.join(
            F.broadcast(exacts.select(F.col("source").alias("source_a"), F.col("nd").alias("nda"))),
            "source_a",
        )
        .join(
            F.broadcast(exacts.select(F.col("source").alias("source_b"), F.col("nd").alias("ndb"))),
            "source_b",
        )
        .join(F.broadcast(inter), ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.expr(f"n_both * 1000000 div k_eff").alias("jaccard_est_ppm"),
            F.when(F.col("k_eff") < _KMVJ_K, F.col("k_eff"))
            .otherwise(F.expr(f"({_KMVJ_K} - 1) * (CAST(1 AS BIGINT) << 52) div kth"))
            .cast("long")
            .alias("union_est"),
            F.expr(
                "coalesce(ni, 0) * 1000000 div (nda + ndb - coalesce(ni, 0))"
            ).alias("jaccard_exact_ppm"),
            F.expr("nda + ndb - coalesce(ni, 0)").cast("long").alias("union_exact"),
        )
    )


def _cms_selfjoin_sql(table: str, key: str, label: str) -> str:
    """Oracle arm: CMS inner-product estimate vs exact for a self-join on
    ``key`` — sum over buckets of counter^2, min over the d seeds."""
    return f"""
    SELECT '{label}' AS join_name,
           (SELECT CAST(sum(n * n) AS BIGINT)
            FROM (SELECT count(*) AS n FROM {table} GROUP BY {key})) AS exact_pairs,
           (SELECT CAST(min(s) AS BIGINT) FROM (
               SELECT seed, sum(c * c) AS s FROM (
                   SELECT seed, bucket, count(*) AS c
                   FROM ({sketches.cms_oracle_pairs_sql(table, f"CAST({key} AS VARCHAR)")})
                   GROUP BY 1, 2) GROUP BY seed)) AS cms_est_pairs
    """


@register(
    "join_size_estimate_cms",
    f"""
    WITH arms AS (
        {_cms_selfjoin_sql("orders", "o_custkey", "orders_self_custkey")}
        UNION ALL
        {_cms_selfjoin_sql("lineitem", "l_suppkey", "lineitem_self_suppkey")}
        UNION ALL
        SELECT 'lineitem_orders_orderkey' AS join_name,
               (SELECT CAST(sum(a.n * b.n) AS BIGINT) FROM
                  (SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY 1) a
                  JOIN (SELECT o_orderkey AS k, count(*) AS n FROM orders GROUP BY 1) b
                  USING (k)) AS exact_pairs,
               (SELECT CAST(min(s) AS BIGINT) FROM (
                   SELECT seed, sum(ca.c * cb.c) AS s FROM
                     (SELECT seed, bucket, count(*) AS c
                      FROM ({sketches.cms_oracle_pairs_sql("lineitem", "CAST(l_orderkey AS VARCHAR)")})
                      GROUP BY 1, 2) ca
                   JOIN
                     (SELECT seed, bucket, count(*) AS c
                      FROM ({sketches.cms_oracle_pairs_sql("orders", "CAST(o_orderkey AS VARCHAR)")})
                      GROUP BY 1, 2) cb
                   USING (seed, bucket) GROUP BY seed)) AS cms_est_pairs
    )
    SELECT join_name, exact_pairs, cms_est_pairs,
           CAST((cms_est_pairs - exact_pairs) * 1000000 // exact_pairs AS BIGINT)
               AS overest_ppm
    FROM arms
    """,
)
def join_size_estimate_cms(spark, sf_dir):
    """Join-cardinality pre-flight from CountMin sketches (the AGMS/
    sketch-join-size estimator: |A JOIN B on k| = sum_key a_k*b_k, upper-
    bounded by min over seeds of the bucket-wise counter inner product).
    The planner-shaped question at 100 TB is "how many rows will this join
    EMIT?" — skew audits (join_skew_audit) find the hot keys, this
    estimates the output mass BEFORE shuffling either side, from two
    d*w-bounded sketches that each build in one scan with map-side
    combine. Probes the two self-joins that model fan-out risk
    (orders/custkey, lineitem/suppkey) plus the real fact-fact
    lineitem-orders join; the exact side (computable at fixture scale)
    sits next to the estimate with the CMS >= exact overestimate
    guarantee as integer ppm. Int64 bound: sum of counter products <=
    (rows_a * rows_b) / width, fine to ~6e12 rows per side at w=1024;
    DECIMAL(38) beyond, per the gini convention. The oracle replays the
    sketches bit-for-bit."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")

    def self_pairs(df, key, label):
        sk = sketches.cms_build(df, key)
        est = sk.groupBy("seed").agg(F.sum(F.col("counter") * F.col("counter")).alias("s"))
        est1 = est.agg(F.min("s").cast("long").alias("cms_est_pairs"))
        exact = (
            df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum(F.col("n") * F.col("n")).cast("long").alias("exact_pairs"))
        )
        return exact.crossJoin(est1).select(
            F.lit(label).alias("join_name"), "exact_pairs", "cms_est_pairs"
        )

    def cross_pairs(dfa, ka, dfb, kb, label):
        ska = sketches.cms_build(dfa, ka)
        skb = sketches.cms_build(dfb, kb)
        est = (
            ska.join(skb.withColumnRenamed("counter", "cb"), ["seed", "bucket"])
            .groupBy("seed")
            .agg(F.sum(F.col("counter") * F.col("cb")).alias("s"))
            .agg(F.min("s").cast("long").alias("cms_est_pairs"))
        )
        a = dfa.groupBy(F.col(ka).alias("k")).agg(F.count(F.lit(1)).alias("na"))
        b = dfb.groupBy(F.col(kb).alias("k")).agg(F.count(F.lit(1)).alias("nb"))
        exact = (
            a.join(b, "k")
            .agg(F.sum(F.col("na") * F.col("nb")).cast("long").alias("exact_pairs"))
        )
        return exact.crossJoin(est).select(
            F.lit(label).alias("join_name"), "exact_pairs", "cms_est_pairs"
        )

    arms = (
        self_pairs(orders, "o_custkey", "orders_self_custkey")
        .unionAll(self_pairs(lineitem, "l_suppkey", "lineitem_self_suppkey"))
        .unionAll(
            cross_pairs(lineitem, "l_orderkey", orders, "o_orderkey",
                        "lineitem_orders_orderkey")
        )
    )
    return arms.select(
        "join_name",
        "exact_pairs",
        "cms_est_pairs",
        F.expr("(cms_est_pairs - exact_pairs) * 1000000 div exact_pairs").alias(
            "overest_ppm"
        ),
    )


@register(
    "grouped_weighted_median",
    """
    WITH g AS (SELECT l_returnflag AS grp,
                      CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                      CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wsum
               FROM lineitem GROUP BY 1, 2),
    c AS (SELECT *,
                 sum(wsum) OVER (PARTITION BY grp ORDER BY cents
                                 ROWS UNBOUNDED PRECEDING) AS cw,
                 sum(wsum) OVER (PARTITION BY grp) AS tot
          FROM g)
    SELECT grp, CAST(min(tot) AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN 2 * cw >= tot THEN cents END) AS BIGINT)
               AS wmedian_cents
    FROM c GROUP BY grp
    """,
)
def grouped_weighted_median(spark, sf_dir):
    """EXACT weighted median per group (lowest value whose cumulative
    weight reaches half the group's total — here: the quantity-weighted
    median line price per return flag, the 'typical unit's price' that an
    unweighted median misstates when cheap lines carry big quantities).

    Scale shape — low-cardinality groups are the trap: a window
    PARTITIONed by a 3-value key over raw rows is 3 tasks each seeing a
    third of the data (the same one-task pathology the global-window gate
    forbids, merely split 3 ways). So weight is first aggregated by
    (group, VALUE) — map-side combine collapses data-grain rows to
    value-domain-grain (distinct prices per flag), the cumulative window
    then runs over that aggregate, and the median definition is unchanged
    (cum weight over ascending distinct values; no row-level tie-break
    needed once weights are merged per value). For value domains too big
    for one partition, the same prefix sum goes through
    operators/cumsum.global_cumsum per group."""
    g = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_returnflag").alias("grp"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
            F.col("l_quantity").cast("long").alias("w"),
        )
        .groupBy("grp", "cents")
        .agg(F.sum("w").cast("long").alias("wsum"))
    )
    wc = (
        Window.partitionBy("grp")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("grp")
    c = g.withColumn("cw", F.sum("wsum").over(wc)).withColumn(
        "tot", F.sum("wsum").over(wt)
    )
    return c.groupBy("grp").agg(
        F.min("tot").cast("long").alias("total_weight"),
        F.min(F.when(2 * F.col("cw") >= F.col("tot"), F.col("cents")))
        .cast("long")
        .alias("wmedian_cents"),
    )


_COV_OFFSET = 1_000_000_000_000  # 1e12 micro^2: |x| <= ~1 -> |cov| < 1e12


@register(
    "embedding_covariance_topk",
    f"""
    WITH e AS (SELECT vec_id, embedding, unnest(range(1, len(embedding) + 1)) AS i
               FROM embeddings),
    u AS (SELECT vec_id, CAST(i AS INT) AS i,
                 CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS m
          FROM e),
    n AS (SELECT count(DISTINCT vec_id) AS n FROM u),
    dimsum AS (SELECT i, sum(m) AS sx FROM u GROUP BY 1),
    pairsum AS (SELECT a.i AS di, b.i AS dj, sum(a.m * b.m) AS sxy
                FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i < b.i
                GROUP BY 1, 2),
    cov AS (SELECT di, dj,
                   CAST((n.n * p.sxy - da.sx * db.sx + {_COV_OFFSET} * n.n * n.n)
                        // (n.n * n.n) - {_COV_OFFSET} AS BIGINT) AS cov_unit
            FROM pairsum p
            JOIN dimsum da ON da.i = p.di
            JOIN dimsum db ON db.i = p.dj
            CROSS JOIN n),
    rk AS (SELECT *, row_number() OVER (ORDER BY abs(cov_unit) DESC, di, dj) AS rnk
           FROM cov)
    SELECT CAST(di AS INT) AS dim_i, CAST(dj AS INT) AS dim_j, cov_unit,
           CAST(rnk AS INT) AS rnk
    FROM rk WHERE rnk <= 20
    """,
)
def embedding_covariance_topk(spark, sf_dir):
    """Embedding-redundancy audit: the 20 most-correlated dimension PAIRS
    by |covariance| (embedding_dim_stats profiles each dimension alone;
    redundant/duplicated dimensions — a projection bug, a stuck encoder
    channel — only show up cross-dim). Exact integer micro^2 covariance:
    cov_ij = floor((N*Sxy - Sx_i*Sx_j) / N^2) with the +OFFSET trick so
    the floor runs on non-negative operands (Spark div truncates, DuckDB
    // floors; they agree only there). Numerator on DECIMAL(38,0) —
    N*Sxy ~ 4e20 already at sf0.1, past int64.

    Scale shape: the d^2/2 pair products are generated JVM-side per row
    (flatten/transform over the vector, no self-join, no UDF) and
    partial-aggregated before the one shuffle, whose width is d^2/2 rows
    per task — corpus size never appears in shuffle or state (d=64 ->
    2080 cells; d=4096 -> 8.4M cells/task is the practical explode-factor
    ceiling, past which the mapInPandas outer-product accumulator takes
    over). The top-k window runs over the 2016-row aggregate (gate-
    sanctioned bounded input). The oracle cross-checks via the naive
    per-vector self-join form of the same integer sums."""
    emb = _t(spark, sf_dir, "embeddings")
    m = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000000) as bigint))"
        ).alias("m"),
    )
    n = m.agg(F.count(F.lit(1)).alias("n"))
    dimsum = (
        m.select(F.posexplode("m").alias("pos", "v"))
        .groupBy((F.col("pos") + 1).cast("int").alias("i"))
        .agg(F.sum("v").alias("sx"))
    )
    pairs = m.select(
        F.explode(
            F.expr(
                # i stops at size-1: sequence(a, b) with a > b yields a
                # DESCENDING sequence (not empty), which would fabricate
                # (size, size+1) and diagonal pairs
                "flatten(transform(sequence(1, size(m) - 1), i ->"
                " transform(sequence(i + 1, size(m)), j ->"
                " struct(i, j, element_at(m, i) * element_at(m, j) as xy))))"
            )
        ).alias("p")
    ).select(
        F.col("p.i").cast("int").alias("di"),
        F.col("p.j").cast("int").alias("dj"),
        F.col("p.xy").alias("xy"),
    )
    pairsum = pairs.groupBy("di", "dj").agg(F.sum("xy").alias("sxy"))
    da = dimsum.select(F.col("i").alias("di"), F.col("sx").alias("sxa"))
    db = dimsum.select(F.col("i").alias("dj"), F.col("sx").alias("sxb"))
    cov = (
        pairsum.join(F.broadcast(da), "di")
        .join(F.broadcast(db), "dj")
        .crossJoin(F.broadcast(n))
        .select(
            "di",
            "dj",
            F.expr(
                "cast((cast(n as decimal(38,0)) * sxy"
                " - cast(sxa as decimal(38,0)) * sxb"
                f" + cast({_COV_OFFSET} as decimal(38,0)) * n * n)"
                " div (cast(n as decimal(38,0)) * n)"
                f" - {_COV_OFFSET} as bigint)"
            ).alias("cov_unit"),
        )
    )
    wr = Window.orderBy(F.abs(F.col("cov_unit")).desc(), "di", "dj")
    return (
        cov.withColumn("rnk", F.row_number().over(wr).cast("int"))
        .filter(F.col("rnk") <= 20)
        .select(
            F.col("di").alias("dim_i"),
            F.col("dj").alias("dim_j"),
            "cov_unit",
            "rnk",
        )
    )


@register(
    "ngram_novelty_curve",
    f"""
    WITH {_SHINGLES_CTE},
    first AS (SELECT sh, min(doc_id) AS fd FROM sh GROUP BY 1),
    per AS (SELECT s.doc_id, count(*) AS n_sh,
                   sum(CASE WHEN s.doc_id = f.fd THEN 1 ELSE 0 END) AS n_novel
            FROM sh s JOIN first f ON s.sh = f.sh GROUP BY 1),
    nt AS (SELECT doc_id, n_sh, n_novel,
                  ntile(10) OVER (ORDER BY doc_id) AS decile
           FROM per)
    SELECT CAST(decile AS INT) AS decile, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_sh) AS BIGINT) AS n_shingles,
           CAST(sum(n_novel) AS BIGINT) AS n_novel,
           CAST(sum(n_novel) * 1000000 // sum(n_sh) AS BIGINT) AS novelty_ppm
    FROM nt GROUP BY 1
    """,
)
def ngram_novelty_curve(spark, sf_dir):
    """Marginal-data-value curve: per corpus decile (docs in doc_id =
    arrival order), what fraction of its distinct 3-gram shingles was never
    seen in ANY earlier document — the diminishing-returns instrument that
    tells a collection pipeline when another crawl slice stops buying new
    content (novelty_ppm falls as the corpus grows; a flat curve means the
    source isn't saturating). A shingle instance is novel iff its doc is
    the shingle's global min(doc_id): one shingle-keyed min-aggregate, one
    shingle-keyed join back (both O(postings), text never shuffles, keys
    are 8-byte longs), then the decile assignment runs through the
    distributed global_ntile (two-phase range exchange) over the PER-DOC
    table — never a one-task data-grain window.

    Eager note: CONSTRUCTING this query runs Spark jobs (global_ntile's
    offset collect executes at build time), like the other
    global_row_number-backed queries — plan tooling must reuse _PLAN_CACHE.
    """
    from etl_mssql_to_postgres_dailysync_spark.operators.cumsum import global_ntile

    docs = _t(spark, sf_dir, "documents")
    sh = docs.select(
        F.col("doc_id"),
        F.explode(dedup.shingle_hashes_arrow(F.col("text"), 3)).alias("sh"),
    )
    first = sh.groupBy("sh").agg(F.min("doc_id").alias("fd"))
    per = (
        sh.join(first, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(F.when(F.col("doc_id") == F.col("fd"), 1).otherwise(0)).alias(
                "n_novel"
            ),
        )
    )
    nt = global_ntile(per, ["doc_id"], 10, "decile")
    return (
        nt.groupBy(F.col("decile").cast("int").alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_sh").cast("long").alias("n_shingles"),
            F.sum("n_novel").cast("long").alias("n_novel"),
            F.expr("sum(n_novel) * 1000000 div sum(n_sh)").alias("novelty_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# r5b: data-selection / tokenizer-audit / batching instruments
# (DSIR importance weights, fertility by language, char entropy,
#  padding-waste audit, quality-vs-dup calibration)
# ---------------------------------------------------------------------------

_DSIR_B = 4096  # hashed-feature buckets: model state is B rows, never corpus


@register(
    "dsir_importance_weights",
    f"""
    WITH t1 AS (SELECT doc_id, lang, {_TOKS_SQL} AS tk
                FROM documents WHERE length(trim(text)) > 0),
    tok AS (SELECT doc_id, lang, unnest(tk) AS tok FROM t1),
    tb AS (SELECT doc_id, lang,
                  {_HASH15.format(x='tok')} % {_DSIR_B} AS b FROM tok),
    g AS (SELECT b, count(*) AS cr,
                 sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
          FROM tb GROUP BY 1),
    m AS (SELECT b,
                 CAST(round((ln(CAST(ct + 1 AS DOUBLE))
                             - ln(CAST(cr + 1 AS DOUBLE))) * 1000000) AS BIGINT)
                     AS delta_unat
          FROM g),
    c AS (SELECT CAST(round((ln(CAST(sum(cr) + {_DSIR_B} AS DOUBLE))
                             - ln(CAST(sum(ct) + {_DSIR_B} AS DOUBLE))) * 1000000)
                      AS BIGINT) AS const_unat
          FROM g),
    d AS (SELECT tb.doc_id, count(*) AS n_tokens, sum(m.delta_unat) AS dsum
          FROM tb JOIN m USING (b) GROUP BY 1)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(dsum + n_tokens * c.const_unat AS BIGINT) AS logw_unat
    FROM d CROSS JOIN c
    """,
)
def dsir_importance_weights(spark, sf_dir):
    """DSIR-style data selection (Xie et al. 2023, public): per-document
    log importance weight ln p_target(x) - ln p_raw(x) under two
    bag-of-hashed-unigram models with add-one smoothing, target = the
    labeled-English slice, raw = the whole corpus — the importance-
    resampling signal that tilts a 100 TB crawl toward a target domain
    without a trained classifier.

    Integer convention: per hashed bucket (model state = B=4096 rows
    REGARDLESS of corpus size) the count-ratio term
    ln(ct+1) - ln(cr+1) is rounded once to micro-nats (ln parity note at
    _LM_CTE); the normalizer term ln(Nr+B) - ln(Nt+B) is a 1-row scalar
    rounded once and multiplied by the exact per-doc token count. Per-doc
    aggregation is exact BIGINT sums. Plan: exactly TWO passes over the
    token stream — one groupBy builds BOTH models' bucket counts (cr, ct)
    in a single aggregate (target mass is a conditional sum, so no second
    scan for the target slice; the normalizers come from re-aggregating
    the 4096-row model table, not the corpus), then the stream equi-joins
    the B-row model on the bucket key (8-byte) with a 1-row scalar
    crossJoin for the normalizer. The corpus never self-joins, the model
    never grows."""
    docs = _t(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    tb = docs.select(
        "doc_id",
        "lang",
        F.explode(text.tokens(text.normalize(F.col("text")))).alias("tok"),
    ).select(
        "doc_id", "lang", (md5_long(F.col("tok")) % _DSIR_B).alias("b")
    )
    g = tb.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("ct"),
    )
    m = g.select(
        "b",
        F.round(
            (
                F.log((F.col("ct") + 1).cast("double"))
                - F.log((F.col("cr") + 1).cast("double"))
            )
            * 1000000
        ).cast("long").alias("delta_unat"),
    )
    c = g.agg(
        F.round(
            (
                F.log((F.sum("cr") + _DSIR_B).cast("double"))
                - F.log((F.sum("ct") + _DSIR_B).cast("double"))
            )
            * 1000000
        ).cast("long").alias("const_unat")
    )
    d = tb.join(m, "b").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"), F.sum("delta_unat").alias("dsum")
    )
    return d.crossJoin(F.broadcast(c)).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (F.col("dsum") + F.col("n_tokens") * F.col("const_unat"))
        .cast("long")
        .alias("logw_unat"),
    )


@register(
    "tokenizer_fertility_by_lang",
    r"""
    WITH t AS (SELECT lang, length(text) AS nc,
                      CASE WHEN trim(text) = '' THEN 0
                           ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS nw,
                      len(regexp_extract_all(text,
                          '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]')) AS nb
               FROM documents)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nc) AS BIGINT) AS n_chars,
           CAST(sum(nw) AS BIGINT) AS n_words,
           CAST(sum(nb) AS BIGINT) AS n_bpe_tokens,
           CAST(CASE WHEN sum(nc) = 0 THEN 0
                     ELSE sum(nw) * 1000000 // sum(nc) END AS BIGINT)
               AS word_fertility_ppm,
           CAST(CASE WHEN sum(nc) = 0 THEN 0
                     ELSE sum(nb) * 1000000 // sum(nc) END AS BIGINT)
               AS bpe_fertility_ppm
    FROM t GROUP BY 1
    """,
)
def tokenizer_fertility_by_lang(spark, sf_dir):
    """Tokenizer-equity audit: tokens produced per character, by labeled
    language — the fertility disparity instrument of a multilingual
    pipeline (a language whose BPE fertility is 2-3x English's gets
    proportionally less content per context window; this table is what
    motivates retraining the tokenizer or re-weighting the mixture).
    Counts words (whitespace) and BPE-ish segments per doc as pure column
    expressions (zero joins, zero UDFs), aggregates per language with
    map-side combine, and emits integer ppm ratios (floor-div, operands
    non-negative -> div/`//` parity)."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        F.length(F.col("text")).alias("nc"),
        text.token_count(F.col("text")).alias("nw"),
        text.bpe_ish_token_count(F.col("text")).alias("nb"),
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nc").cast("long").alias("n_chars"),
        F.sum("nw").cast("long").alias("n_words"),
        F.sum("nb").cast("long").alias("n_bpe_tokens"),
        F.expr(
            "cast(case when sum(nc) = 0 then 0"
            " else sum(nw) * 1000000 div sum(nc) end as bigint)"
        ).alias("word_fertility_ppm"),
        F.expr(
            "cast(case when sum(nc) = 0 then 0"
            " else sum(nb) * 1000000 div sum(nc) end as bigint)"
        ).alias("bpe_fertility_ppm"),
    )


@register(
    "char_entropy_profile",
    f"""
    WITH n AS (SELECT doc_id, {_NORM_SQL} AS nt FROM documents),
    ch AS (SELECT doc_id, unnest(regexp_extract_all(nt, '[a-z0-9 ]')) AS ch
           FROM n),
    cc AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
    d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000)
                                   AS BIGINT)) AS BIGINT) AS slc
          FROM cc GROUP BY 1)
    SELECT doc_id, n AS n_chars,
           CAST(CAST(round(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
                - slc // n AS BIGINT) AS entropy_unat,
           CAST(CASE WHEN CAST(round(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
                          - slc // n < 2500000
                     THEN 1 ELSE 0 END AS INT) AS low_entropy
    FROM d
    """,
)
def char_entropy_profile(spark, sf_dir):
    """Character-level Shannon entropy per document over the normalized
    [a-z0-9 ] alphabet, in integer micro-nats — the cheapest gibberish /
    mojibake / key-mash detector (natural English sits near 2.9-3.1 nats;
    a repeated-character or single-token spam doc collapses toward 0, and
    low_entropy flags below 2.5 nats). H = ln n - (1/n) * sum c*ln c with
    the registry's exact-integer convention: ln is rounded to micro-nats
    once per DISTINCT per-doc count (ln parity note at _LM_CTE), scaled by
    exact BIGINT multiply/sums, floor-div by n (operands non-negative ->
    div parity). Plan: chars explode to (doc, char)-keyed partial
    aggregation — the shuffle carries the 37-symbol histogram per doc, not
    text; at 100 TB this is one map-side-combined exchange at
    37x-doc-count grain."""
    docs = _t(spark, sf_dir, "documents")
    cc = (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(
                    text.normalize(F.col("text")), F.lit("[a-z0-9 ]"), 0
                )
            ).alias("ch"),
        )
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    d = cc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(
            F.col("c")
            * F.round(F.log(F.col("c").cast("double")) * 1000000).cast("long")
        ).cast("long").alias("slc"),
    )
    ent = (
        F.round(F.log(F.col("n").cast("double")) * 1000000).cast("long")
        - F.expr("slc div n")
    )
    return d.select(
        "doc_id",
        F.col("n").alias("n_chars"),
        ent.cast("long").alias("entropy_unat"),
        F.when(ent < 2500000, 1).otherwise(0).cast("int").alias("low_entropy"),
    )


@register(
    "padding_waste_audit",
    r"""
    WITH t AS (SELECT doc_id, len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]')) AS n FROM documents),
    b AS (SELECT doc_id, least(n, 2048) AS n_eff,
                 CASE WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
                      WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
                      WHEN n <= 1024 THEN 1024 ELSE 2048 END AS cap
          FROM t)
    SELECT CAST(cap AS BIGINT) AS seq_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_eff) AS BIGINT) AS n_tokens,
           CAST(sum(cap) AS BIGINT) AS n_slots,
           CAST((sum(cap) - sum(n_eff)) * 1000000 // sum(cap) AS BIGINT)
               AS waste_ppm
    FROM b GROUP BY 1
    """,
)
def padding_waste_audit(spark, sf_dir):
    """Sequence-length bucketing audit: assign each document's BPE-ish
    token count to the next power-of-two batch bucket (64..2048, longer
    docs truncated to the 2048 cap, as a fixed-max-seq-len trainer would)
    and measure the padding waste per bucket — the fraction of batch slots
    a length-bucketed loader burns on pad tokens (waste_ppm). Read next to
    training_pack_bins (greedy packing), this is the bucketing-vs-packing
    trade quantified. Bucket ladder is an integer CASE (no float log2 ->
    no rounding-parity surface); pure column exprs + one map-side-combined
    aggregate at 6-bucket grain."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", text.bpe_ish_token_count(F.col("text")).alias("n")
    )
    b = t.select(
        F.least(F.col("n"), F.lit(2048)).alias("n_eff"),
        F.when(F.col("n") <= 64, 64)
        .when(F.col("n") <= 128, 128)
        .when(F.col("n") <= 256, 256)
        .when(F.col("n") <= 512, 512)
        .when(F.col("n") <= 1024, 1024)
        .otherwise(2048)
        .alias("cap"),
    )
    return b.groupBy(F.col("cap").cast("long").alias("seq_bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_eff").cast("long").alias("n_tokens"),
        F.sum("cap").cast("long").alias("n_slots"),
        F.expr(
            "cast((sum(cap) - sum(n_eff)) * 1000000 div sum(cap) as bigint)"
        ).alias("waste_ppm"),
    )


@register(
    "quality_dup_calibration",
    rf"""
    WITH q AS (
        SELECT doc_id,
               length(text) AS nc,
               length(text) - length(regexp_replace(text, '[!-/:-@\[-`{{-~]', '', 'g')) AS np,
               CASE WHEN trim(lower(text)) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END AS nt,
               len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                   x -> list_contains(['the','a','an','and','or','of','to','in','is','it'], x))) AS sw,
               {_HASH15.format(x=_NORM_SQL)} AS fp
        FROM documents
    ),
    s AS (SELECT doc_id, fp,
                 800 * least(nc, 500)
                 + CASE WHEN nt = 0 THEN 0
                        ELSE least(2000000 * sw // nt, 400000) END
                 + CASE WHEN nc = 0 THEN 200000
                        ELSE 200000 - least(800000 * np // nc, 200000) END
                     AS s_int
          FROM q),
    dup AS (SELECT fp FROM s GROUP BY fp HAVING count(*) >= 2),
    fl AS (SELECT s.doc_id, s.s_int,
                  CASE WHEN dup.fp IS NOT NULL THEN 1 ELSE 0 END AS is_dup
           FROM s LEFT JOIN dup ON s.fp = dup.fp),
    nt2 AS (SELECT doc_id, s_int, is_dup,
                   ntile(10) OVER (ORDER BY s_int, doc_id) AS decile
            FROM fl)
    SELECT CAST(decile AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(is_dup) AS BIGINT) AS n_dup,
           CAST(sum(is_dup) * 1000000 // count(*) AS BIGINT) AS dup_ppm,
           CAST(sum(s_int) // count(*) AS BIGINT) AS mean_score_micro
    FROM nt2 GROUP BY 1
    """,
)
def quality_dup_calibration(spark, sf_dir):
    """Calibration of the heuristic quality score against exact
    duplication: docs binned into quality deciles, per-decile exact-dup
    rate — the audit that tells a curation pipeline whether its quality
    filter is ALSO buying dedup (falling dup_ppm with rising decile) or is
    orthogonal to it, i.e. whether filter-then-dedup ordering matters.
    The quality score is re-derived in EXACT INTEGER arithmetic (micro
    units, floor-div ladder mirroring text_quality's 0.4/0.4/0.2 blend) so
    the decile boundary is bit-identical cross-engine with no double
    rounding surface; dup flag = normalized-content fingerprint seen >= 2
    times (hash-groupBy, only 8-byte hashes shuffle); decile via the
    distributed global_ntile (two-phase range exchange — never a one-task
    data-grain window; the ntile in the ORACLE string is DuckDB-side
    only).

    Eager note: global_ntile's offset collect runs at plan-build time;
    plan tooling must reuse _PLAN_CACHE."""
    from etl_mssql_to_postgres_dailysync_spark.operators.cumsum import global_ntile

    docs = _t(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        F.length(F.col("text")).alias("nc"),
        (
            F.length(F.col("text"))
            - F.length(F.regexp_replace(F.col("text"), r"[!-/:-@\[-`{-~]", ""))
        ).alias("np"),
        text.token_count(F.lower(F.col("text"))).alias("nt"),
        F.size(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda x: x.isin(
                    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it"
                ),
            )
        ).alias("sw"),
        md5_long(text.normalize(F.col("text"))).alias("fp"),
    )
    s = q.select(
        "doc_id",
        "fp",
        (
            800 * F.least(F.col("nc"), F.lit(500))
            + F.when(F.col("nt") == 0, 0).otherwise(
                F.least(
                    F.expr("2000000 * cast(sw as bigint) div nt"), F.lit(400000)
                )
            )
            + F.when(F.col("nc") == 0, 200000).otherwise(
                200000
                - F.least(
                    F.expr("800000 * cast(np as bigint) div nc"), F.lit(200000)
                )
            )
        ).alias("s_int"),
    )
    dup = s.groupBy("fp").agg(F.count(F.lit(1)).alias("nfp")).filter(
        F.col("nfp") >= 2
    )
    fl = s.join(dup.select("fp", "nfp"), "fp", "left").select(
        "doc_id",
        "s_int",
        F.when(F.col("nfp").isNotNull(), 1).otherwise(0).alias("is_dup"),
    )
    nt2 = global_ntile(fl, ["s_int", "doc_id"], 10, "decile")
    return nt2.groupBy(F.col("decile").cast("int").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_dup").cast("long").alias("n_dup"),
        F.expr("cast(sum(is_dup) * 1000000 div count(*) as bigint)").alias(
            "dup_ppm"
        ),
        F.expr("cast(sum(s_int) div count(*) as bigint)").alias(
            "mean_score_micro"
        ),
    )


@register(
    "bloom_semijoin_reduction",
    f"""
    WITH sel AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'),
    bpos AS (SELECT DISTINCT unnest({sketches.bloom_positions_sql("CAST(o_orderkey AS VARCHAR)")}) AS pos
             FROM sel),
    probe AS (SELECT DISTINCT l_orderkey FROM lineitem),
    pk AS (SELECT l_orderkey,
                  unnest({sketches.bloom_positions_sql("CAST(l_orderkey AS VARCHAR)")}) AS pos
           FROM probe),
    ok AS (SELECT l_orderkey FROM pk JOIN bpos USING (pos)
           GROUP BY 1 HAVING count(*) = {sketches.BLOOM_K}),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n_fact,
                 CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM sel s
                                            WHERE s.o_orderkey = l.l_orderkey)
                               THEN 1 ELSE 0 END) AS BIGINT) AS exact_pass,
                 CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM ok o
                                            WHERE o.l_orderkey = l.l_orderkey)
                               THEN 1 ELSE 0 END) AS BIGINT) AS bloom_pass
          FROM lineitem l)
    SELECT n_fact, exact_pass, bloom_pass,
           CAST(CASE WHEN bloom_pass = 0 THEN 0
                     ELSE (bloom_pass - exact_pass) * 1000000 // bloom_pass END
               AS BIGINT) AS fp_ppm,
           CAST((n_fact - bloom_pass) * 1000000 // n_fact AS BIGINT)
               AS reduction_ppm
    FROM m
    """,
)
def bloom_semijoin_reduction(spark, sf_dir):
    """Semi-join reduction pre-flight: how many fact rows does a Bloom
    filter on the selected dimension keys eliminate BEFORE the join
    shuffle, and at what false-positive cost — the decision instrument for
    runtime-filter pushdown at 100 TB (ship an m-bit filter to the fact
    scan instead of shuffling the fact table; worthwhile when
    reduction_ppm is high and fp_ppm bounds the wasted pass-through).
    Build side: urgent orders' keys -> <= m_bits-row position set
    (broadcastable at ANY corpus size — state is O(m), not O(keys)).
    Probe side: DISTINCT fact keys hash k positions each and keep keys
    with all k set; the fact table is counted against exact semi-join
    membership vs bloom membership. All counts integer, fp/reduction in
    ppm with non-negative floor-div. The oracle replays the filter
    BIT-FOR-BIT (same md5 positions), so the measured fp_ppm itself is
    cross-engine-verified, not just bounded. Bloom guarantee pytest: every
    exact member passes the filter (zero false negatives)."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    sel = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    bloom = sketches.bloom_build(sel, "o_orderkey")
    passed = (
        sketches.bloom_probe(lineitem.select("l_orderkey"), "l_orderkey", bloom)
        .filter(F.col("might_contain") == 1)
        .select("l_orderkey")
    )
    flags = (
        lineitem.select("l_orderkey")
        .join(sel.withColumn("__e__", F.lit(1)).withColumnRenamed("o_orderkey", "l_orderkey"),
              "l_orderkey", "left")
        .join(passed.withColumn("__b__", F.lit(1)), "l_orderkey", "left")
    )
    m = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_fact"),
        F.sum(F.coalesce(F.col("__e__"), F.lit(0))).cast("long").alias("exact_pass"),
        F.sum(F.coalesce(F.col("__b__"), F.lit(0))).cast("long").alias("bloom_pass"),
    )
    return m.select(
        "n_fact",
        "exact_pass",
        "bloom_pass",
        F.expr(
            "cast(case when bloom_pass = 0 then 0"
            " else (bloom_pass - exact_pass) * 1000000 div bloom_pass end as bigint)"
        ).alias("fp_ppm"),
        F.expr(
            "cast((n_fact - bloom_pass) * 1000000 div n_fact as bigint)"
        ).alias("reduction_ppm"),
    )


# ---------------------------------------------------------------------------
# Engine-portable HyperLogLog (Flajolet et al. 2007): m=1024 registers from
# md5 bits, so the oracle replays the REGISTERS bit-for-bit — unlike
# approx_count_distinct, whose HLL++ internals have no DuckDB twin.
# ---------------------------------------------------------------------------

_HLL_M = 1024  # registers (p=10); bucket = low 10 bits of the 60-bit hash
_HLL_VBITS = 50  # remaining value bits; rho in [1, 51]
# alpha_m * m^2 scaled exactly: 0.721 * 2^20 * 2^51 (alpha for m>=128 is
# 0.7213/(1+1.079/m) ~ 0.7205; the standard 0.721 milli approximation keeps
# the arithmetic integer-exact and engine-identical)
_HLL_NUM = 721 * (1 << 71)  # = alpha_milli * m^2 * 2^51, 25 digits
_HLL_LN_M_UNAT = 6931472  # round(ln(1024) * 1e6), pinned by test vs math.log

_HLL_REG_SQL = f"""
    h AS (SELECT event_type, CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                                  AS BIGINT) AS h
          FROM events),
    r AS (SELECT event_type, h % {_HLL_M} AS bucket,
                 CASE WHEN h // {_HLL_M} = 0 THEN {_HLL_VBITS + 1}
                      ELSE {_HLL_VBITS + 1} - length(bin(h // {_HLL_M})) END AS rho
          FROM h),
    reg AS (SELECT event_type, bucket, max(rho) AS mj FROM r GROUP BY 1, 2)
"""


def _hll_est_sql(raw: str, vz: str) -> str:
    """The estimate with linear-counting small-range correction, all
    integer: raw below 2.5m with empty registers -> m * ln(m / V)."""
    return f"""CAST(CASE WHEN {vz} > 0 AND {raw} < {5 * _HLL_M // 2}
                 THEN {_HLL_M} * ({_HLL_LN_M_UNAT}
                      - CAST(round(ln(CAST({vz} AS DOUBLE)) * 1000000) AS BIGINT))
                      // 1000000
                 ELSE {raw} END AS BIGINT)"""


@register(
    "hll_distinct_by_source",
    f"""
    WITH {_HLL_REG_SQL},
    agg AS (SELECT event_type, count(*) AS n_present,
                   {_HLL_M} - count(*) AS v_zero,
                   CAST(sum(CAST(1 AS BIGINT) << ({_HLL_VBITS + 1} - mj))
                        AS BIGINT) AS s_present
            FROM reg GROUP BY 1),
    s AS (SELECT event_type, n_present, v_zero,
                 s_present + v_zero * (CAST(1 AS BIGINT) << {_HLL_VBITS + 1})
                     AS s_sum
          FROM agg),
    e AS (SELECT event_type, n_present, v_zero, s_sum,
                 CAST(CAST('{_HLL_NUM}' AS DECIMAL(38,0))
                      // (CAST(1000 AS DECIMAL(38,0)) * s_sum) AS BIGINT)
                     AS raw_est
          FROM s),
    x AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
          FROM events GROUP BY 1),
    f AS (SELECT e.event_type, e.n_present, e.v_zero, e.s_sum,
                 {_hll_est_sql("e.raw_est", "e.v_zero")} AS hll_est,
                 CAST(x.exact_distinct AS BIGINT) AS exact_distinct
          FROM e JOIN x USING (event_type))
    SELECT event_type, CAST(n_present AS BIGINT) AS n_present,
           CAST(v_zero AS BIGINT) AS v_zero, s_sum, hll_est, exact_distinct,
           CAST(abs(hll_est - exact_distinct) * 1000000 // exact_distinct
                AS BIGINT) AS err_ppm
    FROM f
    """,
)
def hll_distinct_by_source(spark, sf_dir):
    """HyperLogLog distinct-user estimate per event type, built from
    engine-portable md5 bits (bucket = low 10 hash bits, rho = leading-zero
    rank of the remaining 50 bits via length(bin(v)) — identical string
    semantics in Spark and DuckDB), so the oracle replays the REGISTER FILE
    bit-for-bit, not just an error bound: n_present / v_zero / s_sum pin
    every register. The estimator is exact integer arithmetic end-to-end:
    alpha*m^2*2^51 is a 25-digit DECIMAL(38) literal over the exact
    harmonic sum s_sum (int64-safe: <= m * 2^51 = 2^61), and the
    linear-counting small-range branch uses the micro-nat ln convention.
    Sketch state is m=1024 rows per group at ANY corpus size; merging
    day/partition sketches is register-wise MAX (hll_union_merge proves
    it); standard error ~ 1.04/sqrt(m) = 3.3%, pytest-asserted at 5 sigma."""
    events = _t(spark, sf_dir, "events")
    h = events.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    r = h.select(
        "event_type",
        (F.col("h") % _HLL_M).alias("bucket"),
        F.when(F.expr(f"h div {_HLL_M}") == 0, _HLL_VBITS + 1)
        .otherwise(
            F.lit(_HLL_VBITS + 1)
            - F.length(F.bin(F.expr(f"h div {_HLL_M}")))
        )
        .alias("rho"),
    )
    reg = r.groupBy("event_type", "bucket").agg(F.max("rho").alias("mj"))
    s = reg.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_present"),
        (F.lit(_HLL_M) - F.count(F.lit(1))).alias("v_zero"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_VBITS + 1} - mj)"))
        .cast("long")
        .alias("s_present"),
    ).withColumn(
        "s_sum",
        F.col("s_present")
        + F.col("v_zero") * F.lit(1 << (_HLL_VBITS + 1)).cast("long"),
    )
    e = s.withColumn(
        "raw_est",
        F.expr(
            f"cast(cast('{_HLL_NUM}' as decimal(38,0))"
            f" div (cast(1000 as decimal(38,0)) * s_sum) as bigint)"
        ),
    )
    x = events.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    est = F.expr(
        f"cast(case when v_zero > 0 and raw_est < {5 * _HLL_M // 2}"
        f" then {_HLL_M} * ({_HLL_LN_M_UNAT}"
        f" - cast(round(ln(cast(v_zero as double)) * 1000000) as bigint))"
        f" div 1000000"
        f" else raw_est end as bigint)"
    )
    return (
        e.join(x, "event_type")
        .withColumn("hll_est", est)
        .select(
            "event_type",
            F.col("n_present").cast("long").alias("n_present"),
            F.col("v_zero").cast("long").alias("v_zero"),
            "s_sum",
            "hll_est",
            "exact_distinct",
            F.expr(
                "cast(abs(hll_est - exact_distinct) * 1000000"
                " div exact_distinct as bigint)"
            ).alias("err_ppm"),
        )
    )


@register(
    "hll_union_merge",
    f"""
    WITH {_HLL_REG_SQL},
    merged AS (SELECT bucket, max(mj) AS mj FROM reg GROUP BY 1),
    agg AS (SELECT count(*) AS n_present, {_HLL_M} - count(*) AS v_zero,
                   CAST(sum(CAST(1 AS BIGINT) << ({_HLL_VBITS + 1} - mj))
                        AS BIGINT) AS s_present
            FROM merged),
    s AS (SELECT n_present, v_zero,
                 s_present + v_zero * (CAST(1 AS BIGINT) << {_HLL_VBITS + 1})
                     AS s_sum
          FROM agg),
    e AS (SELECT n_present, v_zero, s_sum,
                 CAST(CAST('{_HLL_NUM}' AS DECIMAL(38,0))
                      // (CAST(1000 AS DECIMAL(38,0)) * s_sum) AS BIGINT)
                     AS raw_est
          FROM s),
    parts AS (SELECT CAST(sum(pt) AS BIGINT) AS sum_of_parts
              FROM (SELECT count(DISTINCT user_id) AS pt
                    FROM events GROUP BY event_type) q),
    tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_union
            FROM events),
    x AS (SELECT tot.exact_union, parts.sum_of_parts
          FROM parts CROSS JOIN tot),
    f AS (SELECT e.n_present, e.v_zero, e.s_sum,
                 {_hll_est_sql("e.raw_est", "e.v_zero")} AS hll_union_est,
                 CAST(x.exact_union AS BIGINT) AS exact_union, x.sum_of_parts
          FROM e CROSS JOIN x)
    SELECT n_present, v_zero, s_sum, hll_union_est, exact_union, sum_of_parts,
           CAST(abs(hll_union_est - exact_union) * 1000000 // exact_union
                AS BIGINT) AS err_ppm
    FROM f
    """,
)
def hll_union_merge(spark, sf_dir):
    """The property that makes HLL the 100 TB distinct-counter: merging
    per-source (or per-day, per-partition, per-executor) sketches is a
    REGISTER-WISE MAX — this query merges the per-event-type register
    files of hll_distinct_by_source into one union sketch and checks the
    estimate against the exact distinct-user union (which sum_of_parts
    overcounts whenever users span event types — the sketch handles the
    overlap for free, a sum of exact per-partition counts cannot).
    Identical register/estimator conventions to hll_distinct_by_source;
    the merged register file is again pinned bit-for-bit by
    (n_present, v_zero, s_sum)."""
    events = _t(spark, sf_dir, "events")
    h = events.select(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
        "event_type",
    )
    r = h.select(
        "event_type",
        (F.col("h") % _HLL_M).alias("bucket"),
        F.when(F.expr(f"h div {_HLL_M}") == 0, _HLL_VBITS + 1)
        .otherwise(
            F.lit(_HLL_VBITS + 1)
            - F.length(F.bin(F.expr(f"h div {_HLL_M}")))
        )
        .alias("rho"),
    )
    # per-(type, bucket) registers first, then register-wise MAX across
    # types: literally the merge path a per-partition rollup would take
    reg = r.groupBy("event_type", "bucket").agg(F.max("rho").alias("mj"))
    merged = reg.groupBy("bucket").agg(F.max("mj").alias("mj"))
    s = merged.agg(
        F.count(F.lit(1)).alias("n_present"),
        (F.lit(_HLL_M) - F.count(F.lit(1))).alias("v_zero"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_VBITS + 1} - mj)"))
        .cast("long")
        .alias("s_present"),
    ).withColumn(
        "s_sum",
        F.col("s_present")
        + F.col("v_zero") * F.lit(1 << (_HLL_VBITS + 1)).cast("long"),
    )
    e = s.withColumn(
        "raw_est",
        F.expr(
            f"cast(cast('{_HLL_NUM}' as decimal(38,0))"
            f" div (cast(1000 as decimal(38,0)) * s_sum) as bigint)"
        ),
    )
    x = (
        events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("pt"))
        .agg(F.sum("pt").cast("long").alias("sum_of_parts"))
        .crossJoin(
            F.broadcast(
                events.agg(
                    F.countDistinct("user_id").cast("long").alias("exact_union")
                )
            )
        )
    )
    est = F.expr(
        f"cast(case when v_zero > 0 and raw_est < {5 * _HLL_M // 2}"
        f" then {_HLL_M} * ({_HLL_LN_M_UNAT}"
        f" - cast(round(ln(cast(v_zero as double)) * 1000000) as bigint))"
        f" div 1000000"
        f" else raw_est end as bigint)"
    )
    return (
        e.crossJoin(F.broadcast(x))
        .withColumn("hll_union_est", est)
        .select(
            F.col("n_present").cast("long").alias("n_present"),
            F.col("v_zero").cast("long").alias("v_zero"),
            "s_sum",
            "hll_union_est",
            "exact_union",
            "sum_of_parts",
            F.expr(
                "cast(abs(hll_union_est - exact_union) * 1000000"
                " div exact_union as bigint)"
            ).alias("err_ppm"),
        )
    )


@register(
    "cms_heavy_hitters_twopass",
    f"""
    WITH pairs AS ({sketches.cms_oracle_pairs_sql("events", "CAST(user_id AS VARCHAR)")}),
    sketch AS (SELECT seed, bucket, count(*) AS counter FROM pairs GROUP BY 1, 2),
    keys AS (SELECT DISTINCT user_id FROM events),
    coords AS (SELECT user_id, seed,
                      CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                          1 + 3 * seed, 3) AS BIGINT)
                          % {sketches.CMS_WIDTH} AS bucket
               FROM keys CROSS JOIN (SELECT unnest(range({sketches.CMS_DEPTH})) AS seed)),
    est AS (SELECT user_id, CAST(min(counter) AS BIGINT) AS cms_est
            FROM coords JOIN sketch USING (seed, bucket) GROUP BY 1),
    thr AS (SELECT CAST(5 * count(*) // (4 * count(DISTINCT user_id)) AS BIGINT) AS t
            FROM events),
    cand AS (SELECT user_id, cms_est, thr.t FROM est CROSS JOIN thr
             WHERE cms_est >= thr.t),
    exact AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
              FROM events WHERE user_id IN (SELECT user_id FROM cand)
              GROUP BY 1)
    SELECT c.user_id, c.cms_est, e.exact_cnt, c.t AS threshold,
           CAST(CASE WHEN e.exact_cnt >= c.t THEN 1 ELSE 0 END AS INT)
               AS is_true_hh
    FROM cand c JOIN exact e USING (user_id)
    """,
)
def cms_heavy_hitters_twopass(spark, sf_dir):
    """Exact heavy hitters at sketch cost: the sketch->verify two-pass
    pattern. Pass 1 probes every distinct key against the CMS; because CMS
    only ever OVERcounts, every key with exact count >= T has cms_est >= T
    — the candidate set provably misses NO true heavy hitter (pytest
    asserts this against ground truth). Pass 2 exactly counts ONLY the
    candidate keys (a semi-join-reduced aggregation; candidate mass is
    |true HH| + the sketch's additive-collision false positives, tiny next
    to the key domain). At 100 TB this replaces a full-key-domain count
    with one d*w sketch + one filtered count — the same two-pass shape
    production heavy-hitter systems use. is_true_hh marks which candidates
    survive exact verification; every emitted column is an exact integer,
    and the oracle replays the sketch bit-for-bit.

    Resolution note (the honest 100 TB knob): CMS error is ADDITIVE
    (~N/w per seed), so at fixed w the candidate set widens as N grows
    past w * threshold — correctness never degrades (supersets only),
    but pass-2 cost does; at cluster scale you size w ~ N/(eps * T),
    which keeps the sketch a few MB for any realistic N."""
    events = _t(spark, sf_dir, "events")
    sketch = sketches.cms_build(events, "user_id")
    keys = events.select("user_id").distinct()
    est = sketches.cms_estimate(sketch, keys, "user_id").withColumnRenamed(
        "cms_est", "cms_est_raw"
    )
    # scale-relative threshold: 1.25x the mean per-key count, a 1-row
    # scalar (the fixture's per-user counts are near-uniform, so the HH
    # band sits just above the mean)
    thr = events.agg(
        F.expr("cast(5 * count(*) div (4 * count(distinct user_id)) as bigint)")
        .alias("t")
    )
    cand = (
        est.crossJoin(F.broadcast(thr))
        .filter(F.col("cms_est_raw") >= F.col("t"))
        .select("user_id", F.col("cms_est_raw").alias("cms_est"), "t")
    )
    exact = (
        events.join(F.broadcast(cand.select("user_id")), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    )
    return (
        cand.join(exact, "user_id")
        .select(
            "user_id",
            "cms_est",
            "exact_cnt",
            F.col("t").alias("threshold"),
            F.when(F.col("exact_cnt") >= F.col("t"), 1).otherwise(0)
            .cast("int")
            .alias("is_true_hh"),
        )
    )


@register(
    "quality_selection_frontier",
    rf"""
    WITH q AS (
        SELECT doc_id,
               length(text) AS nc,
               length(text) - length(regexp_replace(text, '[!-/:-@\[-`{{-~]', '', 'g')) AS np,
               CASE WHEN trim(lower(text)) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END AS nt,
               len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                   x -> list_contains(['the','a','an','and','or','of','to','in','is','it'], x))) AS sw
        FROM documents
    ),
    s AS (SELECT doc_id, nt AS n_tokens,
                 800 * least(nc, 500)
                 + CASE WHEN nt = 0 THEN 0
                        ELSE least(2000000 * sw // nt, 400000) END
                 + CASE WHEN nc = 0 THEN 200000
                        ELSE 200000 - least(800000 * np // nc, 200000) END
                     AS s_int
          FROM q),
    nt2 AS (SELECT doc_id, n_tokens, s_int,
                   ntile(10) OVER (ORDER BY s_int, doc_id) AS decile
            FROM s),
    d AS (SELECT decile, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                 CAST(min(s_int) AS BIGINT) AS score_floor
          FROM nt2 GROUP BY 1),
    c AS (SELECT decile, n_docs, n_tokens, score_floor,
                 sum(n_docs) OVER (ORDER BY decile DESC
                                   ROWS UNBOUNDED PRECEDING) AS docs_kept,
                 sum(n_tokens) OVER (ORDER BY decile DESC
                                     ROWS UNBOUNDED PRECEDING) AS tokens_kept
          FROM d),
    t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td,
                 CAST(sum(n_tokens) AS BIGINT) AS tt FROM d)
    SELECT CAST(decile AS INT) AS decile, CAST(n_docs AS BIGINT) AS n_docs,
           n_tokens, score_floor,
           CAST(docs_kept AS BIGINT) AS docs_kept,
           CAST(tokens_kept AS BIGINT) AS tokens_kept,
           CAST(docs_kept * 1000000 // t.td AS BIGINT) AS docs_kept_ppm,
           CAST(tokens_kept * 1000000 // t.tt AS BIGINT) AS tokens_kept_ppm
    FROM c CROSS JOIN t
    """,
)
def quality_selection_frontier(spark, sf_dir):
    """The filter-threshold frontier: if the pipeline keeps only documents
    at or above each quality decile's score floor, how many docs and how
    much token mass survive — the curve a curation run reads to pick its
    threshold (token budget vs quality floor; the complement of
    quality_dup_calibration, which tells you what duplication each stratum
    carries). Same exact-integer quality score and distributed global_ntile
    decile as the calibration query; the cumulative kept-mass window runs
    over the 10-ROW decile aggregate in descending-quality order (windows
    above aggregates are the sanctioned global-window shape), and the
    1-row total is a scalar crossJoin. All outputs exact integers / ppm.

    Eager note: global_ntile's offset collect runs at plan-build time;
    plan tooling must reuse _PLAN_CACHE."""
    from etl_mssql_to_postgres_dailysync_spark.operators.cumsum import global_ntile

    docs = _t(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        F.length(F.col("text")).alias("nc"),
        (
            F.length(F.col("text"))
            - F.length(F.regexp_replace(F.col("text"), r"[!-/:-@\[-`{-~]", ""))
        ).alias("np"),
        text.token_count(F.lower(F.col("text"))).alias("nt"),
        F.size(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda x: x.isin(
                    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it"
                ),
            )
        ).alias("sw"),
    )
    s = q.select(
        "doc_id",
        F.col("nt").alias("n_tokens"),
        (
            800 * F.least(F.col("nc"), F.lit(500))
            + F.when(F.col("nt") == 0, 0).otherwise(
                F.least(
                    F.expr("2000000 * cast(sw as bigint) div nt"), F.lit(400000)
                )
            )
            + F.when(F.col("nc") == 0, 200000).otherwise(
                200000
                - F.least(
                    F.expr("800000 * cast(np as bigint) div nc"), F.lit(200000)
                )
            )
        ).alias("s_int"),
    )
    nt2 = global_ntile(s, ["s_int", "doc_id"], 10, "decile")
    d = nt2.groupBy(F.col("decile").cast("int").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.min("s_int").cast("long").alias("score_floor"),
    )
    w = (
        Window.orderBy(F.col("decile").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn("docs_kept", F.sum("n_docs").over(w)).withColumn(
        "tokens_kept", F.sum("n_tokens").over(w)
    )
    t = d.agg(
        F.sum("n_docs").cast("long").alias("td"),
        F.sum("n_tokens").cast("long").alias("tt"),
    )
    return c.crossJoin(F.broadcast(t)).select(
        "decile",
        F.col("n_docs").cast("long").alias("n_docs"),
        "n_tokens",
        "score_floor",
        F.col("docs_kept").cast("long").alias("docs_kept"),
        F.col("tokens_kept").cast("long").alias("tokens_kept"),
        F.expr("cast(docs_kept * 1000000 div td as bigint)").alias(
            "docs_kept_ppm"
        ),
        F.expr("cast(tokens_kept * 1000000 div tt as bigint)").alias(
            "tokens_kept_ppm"
        ),
    )


@register(
    "lsh_scurve_theory",
    """
    WITH g AS (SELECT unnest(range(0, 21)) AS i),
    j AS (SELECT i, i / 20.0 AS jc FROM g),
    p AS (SELECT i, jc,
                 (jc * jc) * (jc * jc) AS j4,
                 jc * jc AS j2
          FROM j)
    SELECT CAST(i AS BIGINT) AS grid_i, jc AS jaccard,
           1.0 - ((1.0 - j4) * (1.0 - j4)) * ((1.0 - j4) * (1.0 - j4))
               AS p_cand_4x4,
           1.0 - (((1.0 - j2) * (1.0 - j2)) * ((1.0 - j2) * (1.0 - j2)))
               * (((1.0 - j2) * (1.0 - j2)) * ((1.0 - j2) * (1.0 - j2)))
               AS p_cand_8x2
    FROM p
    """,
)
def lsh_scurve_theory(spark, sf_dir):
    """The analytic MinHash-LSH S-curve P(candidate | J) = 1-(1-J^r)^b for
    BOTH audited banding geometries (b=4,r=4 and b=8,r=2 over 16 hashes) on
    a 21-point Jaccard grid — the theory table a 100 TB run reads NEXT TO
    the measured dedup_lsh_audit precision/recall to pick (b, r) before
    committing the shuffle: 4x4 suppresses low-J noise (steep knee near
    J~0.7), 8x2 trades precision for recall (knee near J~0.35). Every
    probability is computed by REPEATED IEEE MULTIPLICATION of exactly
    representable grid points (i/20 is a correctly-rounded division, *, -
    are single IEEE ops) — no pow(), no exp/ln — so both engines produce
    bit-identical doubles and the oracle hash-matches floating point
    without any rounding convention. Driver-literal 21-row spine; no data
    scanned."""
    j = spark.range(0, 21).select(
        F.col("id").cast("long").alias("grid_i"),
        (F.col("id") / F.lit(20.0)).alias("jc"),
    )
    p = j.withColumn("j2", F.col("jc") * F.col("jc")).withColumn(
        "j4", (F.col("jc") * F.col("jc")) * (F.col("jc") * F.col("jc"))
    )
    q14 = (1.0 - F.col("j4")) * (1.0 - F.col("j4"))
    q12 = (1.0 - F.col("j2")) * (1.0 - F.col("j2"))
    return p.select(
        "grid_i",
        F.col("jc").alias("jaccard"),
        (F.lit(1.0) - q14 * q14).alias("p_cand_4x4"),
        (F.lit(1.0) - (q12 * q12) * (q12 * q12)).alias("p_cand_8x2"),
    )


@register(
    "hll_incremental_daily",
    f"""
    WITH h AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                      CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                           AS BIGINT) AS h
               FROM events),
    r AS (SELECT day, h % {_HLL_M} AS bucket,
                 CASE WHEN h // {_HLL_M} = 0 THEN {_HLL_VBITS + 1}
                      ELSE {_HLL_VBITS + 1} - length(bin(h // {_HLL_M})) END AS rho
          FROM h),
    reg AS (SELECT day, bucket, max(rho) AS mj FROM r GROUP BY 1, 2),
    days AS (SELECT DISTINCT day FROM h),
    grid AS (SELECT d.day, b.bucket FROM days d
             CROSS JOIN (SELECT unnest(range({_HLL_M})) AS bucket) b),
    g AS (SELECT grid.day, grid.bucket, coalesce(reg.mj, 0) AS mj
          FROM grid LEFT JOIN reg
            ON reg.day = grid.day AND reg.bucket = grid.bucket),
    cum AS (SELECT day, bucket,
                   max(mj) OVER (PARTITION BY bucket ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS mj
            FROM g),
    s AS (SELECT day,
                 CAST(sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS v_zero,
                 CAST(sum(CAST(1 AS BIGINT) << ({_HLL_VBITS + 1} - mj))
                      AS BIGINT) AS s_sum
          FROM cum GROUP BY 1),
    e AS (SELECT day, v_zero, s_sum,
                 CAST(CAST('{_HLL_NUM}' AS DECIMAL(38,0))
                      // (CAST(1000 AS DECIMAL(38,0)) * s_sum) AS BIGINT)
                     AS raw_est
          FROM s),
    x AS (SELECT CAST(a.d AS VARCHAR) AS day,
                 CAST(count(DISTINCT b.user_id) AS BIGINT) AS exact_cum
          FROM (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events) a
          JOIN events b ON CAST(b.ts AS DATE) <= a.d
          GROUP BY 1),
    f AS (SELECT e.day, e.v_zero, e.s_sum,
                 {_hll_est_sql("e.raw_est", "e.v_zero")} AS hll_cum_est,
                 x.exact_cum
          FROM e JOIN x USING (day))
    SELECT day, CAST(v_zero AS BIGINT) AS v_zero, s_sum, hll_cum_est,
           exact_cum,
           CAST(abs(hll_cum_est - exact_cum) * 1000000 // exact_cum AS BIGINT)
               AS err_ppm
    FROM f
    """,
)
def hll_incremental_daily(spark, sf_dir):
    """The incremental-maintenance path of the portable HLL: one register
    file PER DAY (the shape a daily micro-batch checkpoint persists —
    m=1024 rows/day regardless of volume), then the running
    distinct-users-to-date curve falls out of a register-wise cumulative
    MAX window partitioned by bucket (1024 independent day-length series —
    never a data-grain window) with the estimator evaluated per day. This
    is what replaces cumulative_distinct_users' exact O(days x users)
    recount at 100 TB: arriving data only touches today's sketch; history
    is re-aggregated from m-row checkpoints. Exact cumulative distinct
    sits alongside for the audit (fixture-scale only — the quadratic
    day-join is the thing the sketch deletes). Same register/estimator
    conventions as hll_distinct_by_source, oracle replays every register.

    Day key is formatted as VARCHAR per the DATE-output parity convention."""
    events = _t(spark, sf_dir, "events")
    h = events.select(
        F.col("ts").cast("date").cast("string").alias("day"),
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    r = h.select(
        "day",
        (F.col("h") % _HLL_M).alias("bucket"),
        F.when(F.expr(f"h div {_HLL_M}") == 0, _HLL_VBITS + 1)
        .otherwise(
            F.lit(_HLL_VBITS + 1) - F.length(F.bin(F.expr(f"h div {_HLL_M}")))
        )
        .alias("rho"),
    )
    reg = r.groupBy("day", "bucket").agg(F.max("rho").alias("mj"))
    # dense day x register grid (sketch-state-sized: days * m rows no
    # matter the data volume) so a bucket set on day d persists through
    # every later day's register file; unset registers carry mj = 0
    days = h.select("day").distinct()
    buckets = spark.range(_HLL_M).select(F.col("id").cast("long").alias("bucket"))
    g = (
        days.crossJoin(F.broadcast(buckets))
        .join(reg, ["day", "bucket"], "left")
        .select("day", "bucket", F.coalesce(F.col("mj"), F.lit(0)).alias("mj"))
    )
    wcum = (
        Window.partitionBy("bucket")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = g.select("day", "bucket", F.max("mj").over(wcum).alias("mj"))
    s = cum.groupBy("day").agg(
        F.sum(F.when(F.col("mj") == 0, 1).otherwise(0))
        .cast("long")
        .alias("v_zero"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_VBITS + 1} - mj)"))
        .cast("long")
        .alias("s_sum"),
    )
    e = s.withColumn(
        "raw_est",
        F.expr(
            f"cast(cast('{_HLL_NUM}' as decimal(38,0))"
            f" div (cast(1000 as decimal(38,0)) * s_sum) as bigint)"
        ),
    )
    exact_days = events.select(F.col("ts").cast("date").alias("d")).distinct()
    x = (
        exact_days.join(events, F.col("ts").cast("date") <= F.col("d"))
        .groupBy(F.col("d").cast("string").alias("day"))
        .agg(F.countDistinct("user_id").cast("long").alias("exact_cum"))
    )
    est = F.expr(
        f"cast(case when v_zero > 0 and raw_est < {5 * _HLL_M // 2}"
        f" then {_HLL_M} * ({_HLL_LN_M_UNAT}"
        f" - cast(round(ln(cast(v_zero as double)) * 1000000) as bigint))"
        f" div 1000000"
        f" else raw_est end as bigint)"
    )
    return (
        e.join(x, "day")
        .withColumn("hll_cum_est", est)
        .select(
            "day",
            F.col("v_zero").cast("long").alias("v_zero"),
            "s_sum",
            "hll_cum_est",
            "exact_cum",
            F.expr(
                "cast(abs(hll_cum_est - exact_cum) * 1000000"
                " div exact_cum as bigint)"
            ).alias("err_ppm"),
        )
    )


@register(
    "dedup_survivorship_by_source",
    f"""
    WITH f AS (SELECT doc_id, source, {_HASH15.format(x=_NORM_SQL)} AS fp
               FROM documents),
    keep AS (SELECT fp, min(doc_id) AS keep_id FROM f GROUP BY 1)
    SELECT f.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN f.doc_id = k.keep_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN f.doc_id = k.keep_id THEN 0 ELSE 1 END)
                AS BIGINT) AS n_dropped,
           CAST(sum(CASE WHEN f.doc_id = k.keep_id THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS kept_ppm
    FROM f JOIN keep k USING (fp)
    GROUP BY 1
    """,
)
def dedup_survivorship_by_source(spark, sf_dir):
    """Curation-equity audit: after exact dedup (min-doc_id-keeps per
    normalized-content fingerprint), which SOURCES lost what — the
    instrument that catches a dedup pass silently gutting one corpus slice
    (a mirror site or syndicated feed loses everything to whichever copy
    sorts first; per-source kept_ppm makes that visible before training
    mixes go wrong, and pairs with dedup_cross_source_matrix which
    attributes WHERE the duplicates point). One fingerprint groupBy + one
    fingerprint-keyed join-back — only (hash, id) pairs shuffle, text
    never moves; survivorship conservation (sum kept = distinct
    fingerprints; kept + dropped = docs) pytest-asserted."""
    docs = _t(spark, sf_dir, "documents")
    f = docs.select(
        "doc_id", "source", md5_long(text.normalize(F.col("text"))).alias("fp")
    )
    keep = f.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    kept_flag = F.when(F.col("doc_id") == F.col("keep_id"), 1).otherwise(0)
    return (
        f.join(keep, "fp")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(kept_flag).cast("long").alias("n_kept"),
            F.sum(1 - kept_flag).cast("long").alias("n_dropped"),
            F.expr(
                "cast(sum(case when doc_id = keep_id then 1 else 0 end)"
                " * 1000000 div count(*) as bigint)"
            ).alias("kept_ppm"),
        )
    )


@register(
    "sessionize_gap_sensitivity",
    """
    WITH e AS (SELECT g.gap_s, user_id, ts, event_id
               FROM events CROSS JOIN (SELECT unnest([900, 1800, 3600]) AS gap_s) g),
    l AS (SELECT *, lag(ts) OVER (PARTITION BY gap_s, user_id
                                  ORDER BY ts, event_id) AS prev
          FROM e),
    f AS (SELECT *, CASE WHEN prev IS NULL
                              OR epoch_us(ts) - epoch_us(prev) > CAST(gap_s AS BIGINT) * 1000000
                         THEN 1 ELSE 0 END AS new_s
          FROM l),
    s AS (SELECT *, sum(new_s) OVER (PARTITION BY gap_s, user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM f),
    per AS (SELECT gap_s, user_id, sid, count(*) AS n_ev,
                   CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000
                        AS BIGINT) AS dur_s
            FROM s GROUP BY 1, 2, 3)
    SELECT CAST(gap_s AS BIGINT) AS gap_s,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_singletons,
           CAST(sum(n_ev) AS BIGINT) AS n_events,
           CAST(sum(n_ev) * 1000 // count(*) AS BIGINT)
               AS events_per_session_milli,
           CAST(sum(dur_s) // count(*) AS BIGINT) AS mean_duration_s
    FROM per GROUP BY 1
    """,
)
def sessionize_gap_sensitivity(spark, sf_dir):
    """Session-gap parameter sweep: sessionization statistics at 15/30/60
    minute inactivity gaps in ONE pass — the sensitivity table that tells
    an events pipeline whether its session definition is stable (session
    count and singleton rate barely move across gaps) or sits on a cliff
    (halving the gap doubles sessions -> the metric is an artifact of the
    parameter, not the behavior). The gap triple rides the stream as an
    exploded literal (3x the rows, gap in the window partition key — one
    window pass, one shuffle keyed by (gap, user), parallel across both),
    never three separate jobs; all times are integer epoch MICROSECONDS
    (unix_micros / epoch_us — identical integer semantics, no double
    epoch()), durations floor-divided to seconds, ratios in milli units.
    Reference anchor: the 30-min arm is exactly the `sessionize` query's
    definition (same lag/flag/cumsum construction, filters.py:22 cites)."""
    events = _t(spark, sf_dir, "events")
    e = events.select(
        F.explode(F.array(F.lit(900), F.lit(1800), F.lit(3600))).alias("gap_s"),
        "user_id",
        "ts",
        "event_id",
    )
    w = Window.partitionBy("gap_s", "user_id").orderBy("ts", "event_id")
    l = e.withColumn("prev", F.lag("ts").over(w))
    f = l.withColumn(
        "new_s",
        F.when(
            F.col("prev").isNull()
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev"))
                > F.col("gap_s").cast("long") * 1000000
            ),
            1,
        ).otherwise(0),
    )
    s = f.withColumn(
        "sid",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per = s.groupBy("gap_s", "user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.expr(
            "cast((unix_micros(max(ts)) - unix_micros(min(ts)))"
            " div 1000000 as bigint)"
        ).alias("dur_s"),
    )
    return per.groupBy(F.col("gap_s").cast("long").alias("gap_s")).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_ev") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_singletons"),
        F.sum("n_ev").cast("long").alias("n_events"),
        F.expr("cast(sum(n_ev) * 1000 div count(*) as bigint)").alias(
            "events_per_session_milli"
        ),
        F.expr("cast(sum(dur_s) div count(*) as bigint)").alias(
            "mean_duration_s"
        ),
    )


# ---------------------------------------------------------------------------
# Z-order layout audit: 14-bit x 2 Morton interleave, generated as explicit
# shift/mask sums so BOTH engines evaluate the identical integer expression
# ---------------------------------------------------------------------------

_Z_BITS = 14
_Z_FILES = 32
_Z_BOX = (2, 7, 10, 19)  # user in [2,7], day-index in [10,19]


def _z_interleave_duck(x: str, y: str) -> str:
    terms = [f"((({x} >> {i}) & 1) << {2 * i})" for i in range(_Z_BITS)]
    terms += [f"((({y} >> {i}) & 1) << {2 * i + 1})" for i in range(_Z_BITS)]
    return "(" + " + ".join(terms) + ")"


def _z_interleave_spark(x: str, y: str) -> str:
    terms = [
        f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})" for i in range(_Z_BITS)
    ]
    terms += [
        f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})"
        for i in range(_Z_BITS)
    ]
    return "(" + " + ".join(terms) + ")"


@register(
    "zorder_pruning_audit",
    f"""
    WITH e AS (SELECT event_id, ts, CAST(user_id AS BIGINT) AS u,
                      CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                           AS BIGINT) AS d
               FROM events),
    z AS (SELECT *, {_z_interleave_duck('u', 'd')} AS zv FROM e),
    lt AS (SELECT u, d, ntile({_Z_FILES}) OVER (ORDER BY ts, event_id) AS f
           FROM z),
    lz AS (SELECT u, d, ntile({_Z_FILES}) OVER (ORDER BY zv, event_id) AS f
           FROM z),
    both_l AS (SELECT 'time_ordered' AS layout, u, d, f FROM lt
               UNION ALL
               SELECT 'z_ordered' AS layout, u, d, f FROM lz),
    files AS (SELECT layout, f, count(*) AS n_rows,
                     min(u) AS min_u, max(u) AS max_u,
                     min(d) AS min_d, max(d) AS max_d
              FROM both_l GROUP BY 1, 2),
    scan AS (SELECT layout,
                    count(*) AS n_files,
                    sum(CASE WHEN max_u >= {_Z_BOX[0]} AND min_u <= {_Z_BOX[1]}
                              AND max_d >= {_Z_BOX[2]} AND min_d <= {_Z_BOX[3]}
                             THEN 1 ELSE 0 END) AS files_scanned,
                    sum(CASE WHEN max_u >= {_Z_BOX[0]} AND min_u <= {_Z_BOX[1]}
                              AND max_d >= {_Z_BOX[2]} AND min_d <= {_Z_BOX[3]}
                             THEN n_rows ELSE 0 END) AS rows_scanned
             FROM files GROUP BY 1),
    hit AS (SELECT CAST(count(*) AS BIGINT) AS rows_matched FROM e
            WHERE u BETWEEN {_Z_BOX[0]} AND {_Z_BOX[1]}
              AND d BETWEEN {_Z_BOX[2]} AND {_Z_BOX[3]}),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS rows_total FROM e)
    SELECT s.layout, CAST(s.n_files AS BIGINT) AS n_files,
           CAST(s.files_scanned AS BIGINT) AS files_scanned,
           CAST(s.rows_scanned AS BIGINT) AS rows_scanned,
           h.rows_matched, t.rows_total,
           CAST(s.rows_scanned * 1000000 // t.rows_total AS BIGINT)
               AS scan_ppm
    FROM scan s CROSS JOIN hit h CROSS JOIN tot t
    """,
)
def zorder_pruning_audit(spark, sf_dir):
    """The lakehouse layout decision, measured: the same events written as
    32 files in arrival (time) order vs Z-order (14-bit Morton
    interleave of user x day, generated as an explicit shift/mask sum both
    engines evaluate identically), then a 2-D box predicate (user range x
    day range) is answered from per-file min/max zone maps alone —
    files_scanned / rows_scanned per layout is exactly the scan cost a
    TxnTable-style reader (sources/txn_table.py zone-map pruning) would
    pay. Time-ordered files are tight on day and useless on user, so the
    box hits almost every file; Z-ordered files bound BOTH dimensions, so
    pruning multiplies. File assignment uses the distributed global_ntile
    (two-phase, never a one-task window); everything downstream of it is
    file-grain (32 rows per layout). The exact box count sits
    alongside as rows_matched: zone maps are a superset guarantee
    (rows_scanned >= rows_matched, pytest-asserted), never a filter.

    Eager note: global_ntile's offset collect runs at plan-build time;
    plan tooling must reuse _PLAN_CACHE."""
    from etl_mssql_to_postgres_dailysync_spark.operators.cumsum import global_ntile

    events = _t(spark, sf_dir, "events")
    e = events.select(
        "event_id",
        "ts",
        F.col("user_id").cast("long").alias("u"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    )
    z = e.withColumn("zv", F.expr(_z_interleave_spark("u", "d")))
    lt = global_ntile(z, ["ts", "event_id"], _Z_FILES, "f").select(
        F.lit("time_ordered").alias("layout"), "u", "d", "f"
    )
    lz = global_ntile(z, ["zv", "event_id"], _Z_FILES, "f").select(
        F.lit("z_ordered").alias("layout"), "u", "d", "f"
    )
    files = (
        lt.unionByName(lz)
        .groupBy("layout", "f")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("u").alias("min_u"),
            F.max("u").alias("max_u"),
            F.min("d").alias("min_d"),
            F.max("d").alias("max_d"),
        )
    )
    u0, u1, d0, d1 = _Z_BOX
    overlaps = (
        (F.col("max_u") >= u0)
        & (F.col("min_u") <= u1)
        & (F.col("max_d") >= d0)
        & (F.col("min_d") <= d1)
    )
    scan = files.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(F.when(overlaps, 1).otherwise(0)).cast("long").alias("files_scanned"),
        F.sum(F.when(overlaps, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_scanned"),
    )
    hit = e.filter(
        F.col("u").between(u0, u1) & F.col("d").between(d0, d1)
    ).agg(F.count(F.lit(1)).cast("long").alias("rows_matched"))
    tot = e.agg(F.count(F.lit(1)).cast("long").alias("rows_total"))
    return (
        scan.crossJoin(F.broadcast(hit))
        .crossJoin(F.broadcast(tot))
        .select(
            "layout",
            "n_files",
            "files_scanned",
            "rows_scanned",
            "rows_matched",
            "rows_total",
            F.expr(
                "cast(rows_scanned * 1000000 div rows_total as bigint)"
            ).alias("scan_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# r6: SCD Type-2 dimension maintenance — the historical counterpart of the
# reference's Type-1 overwrite sync (dags/mssql_to_postgresql_orders_daily.py
# destroys the previous attribute value on every upsert; SCD2 keeps it as a
# [valid_from, valid_to) interval). operators/scd.py.
# ---------------------------------------------------------------------------

_SCD2_DIM_SQL = """
    ev AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
               arg_max(o_orderpriority, o_orderkey) AS priority
        FROM orders GROUP BY 1, 2),
    chg AS (
        SELECT o_custkey, d, priority,
               lag(priority) OVER w AS prev,
               lag(d) OVER w AS prev_d
        FROM ev WINDOW w AS (PARTITION BY o_custkey ORDER BY d ASC)),
    cp AS (SELECT o_custkey, d, priority FROM chg
           WHERE prev_d IS NULL OR priority <> prev),
    iv AS (
        SELECT o_custkey, priority, d,
               lead(d) OVER w2 AS vt,
               row_number() OVER w2 AS version
        FROM cp WINDOW w2 AS (PARTITION BY o_custkey ORDER BY d ASC))
"""


@register(
    "scd2_priority_history",
    f"""
    WITH {_SCD2_DIM_SQL}
    SELECT o_custkey, priority,
           CAST(d AS VARCHAR) AS valid_from,
           CAST(vt AS VARCHAR) AS valid_to,
           CAST(version AS INT) AS version,
           vt IS NULL AS is_current
    FROM iv
    """,
)
def scd2_priority_history(spark, sf_dir):
    """SCD Type-2 dimension build: each customer's o_orderpriority history
    as [valid_from, valid_to) intervals with version ordinals and an
    is_current flag — the warehouse pattern the reference's Type-1 daily
    overwrite (ON CONFLICT DO UPDATE, dags/mssql_to_postgresql_orders_daily.py:296)
    cannot answer point-in-time questions with. Last-writer-wins inside one
    (customer, day) cell is a max-struct AGGREGATE pick (map-side
    combinable, mirroring the conditional-upsert version guard in
    operators/merge.py), then change-point detection and interval closing
    are lag/lead windows partitioned BY CUSTOMER — millions of independent
    short series at 100 TB, never a global window; one key shuffle reused
    by all three steps."""
    from etl_mssql_to_postgres_dailysync_spark.operators.scd import scd2_from_events

    orders = _t(spark, sf_dir, "orders")
    ev = orders.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        "o_orderpriority",
        "o_orderkey",
    )
    dim = scd2_from_events(
        ev, keys=["o_custkey"], ts_col="d",
        attr_cols=["o_orderpriority"], pick_col="o_orderkey",
    )
    return dim.select(
        "o_custkey",
        F.col("o_orderpriority").alias("priority"),
        F.col("valid_from").cast("string").alias("valid_from"),
        F.col("valid_to").cast("string").alias("valid_to"),
        F.col("version").cast("int").alias("version"),
        "is_current",
    )


@register(
    "scd2_point_in_time",
    f"""
    WITH {_SCD2_DIM_SQL},
    f AS (SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS fd,
                 o_orderpriority
          FROM orders)
    SELECT f.o_orderkey,
           CAST(iv.version AS INT) AS version,
           iv.priority AS dim_priority,
           f.o_orderpriority = iv.priority AS matches_event
    FROM f JOIN iv ON f.o_custkey = iv.o_custkey
       AND iv.d <= f.fd AND (iv.vt IS NULL OR f.fd < iv.vt)
    """,
)
def scd2_point_in_time(spark, sf_dir):
    """Point-in-time join against the SCD2 dimension: every order row
    retrieves the priority interval that was valid ON ITS OWN DATE
    (valid_from <= ts < valid_to) — the query SCD2 exists for. Planned as a
    key equi-join (hash/sort-merge on o_custkey) with the interval
    predicate as a post-match residual: each fact matches exactly one
    interval, so cost is O(facts), never a nested loop (plan-sweep gated).
    matches_event is FALSE exactly where a later same-day order won the
    last-writer pick — the Type-1-vs-Type-2 divergence made visible."""
    from etl_mssql_to_postgres_dailysync_spark.operators.scd import (
        point_in_time_join,
        scd2_from_events,
    )

    orders = _t(spark, sf_dir, "orders")
    ev = orders.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        "o_orderpriority",
        "o_orderkey",
    )
    dim = scd2_from_events(
        ev, keys=["o_custkey"], ts_col="d",
        attr_cols=["o_orderpriority"], pick_col="o_orderkey",
    ).select(
        "o_custkey",
        F.col("o_orderpriority").alias("dim_priority"),
        "valid_from", "valid_to", "version",
    )
    facts = orders.select(
        "o_orderkey", "o_custkey",
        F.col("o_orderdate").cast("date").alias("fd"),
        "o_orderpriority",
    )
    joined = point_in_time_join(facts, dim, keys=["o_custkey"], fact_ts="fd")
    return joined.select(
        "o_orderkey",
        F.col("version").cast("int").alias("version"),
        "dim_priority",
        (F.col("o_orderpriority") == F.col("dim_priority")).alias("matches_event"),
    )


# ---------------------------------------------------------------------------
# BPE tokenizer-training merges (round 6)
# ---------------------------------------------------------------------------

_BPE_MERGES = 8


def _bpe_oracle(k: int) -> str:
    """Unrolled K-stage DuckDB twin of functions/bpe.train_merges: each
    stage re-derives pair counts from the previous symbol table, picks the
    (cnt DESC, 'x y' ASC) argmax, and applies the same fenced replace. The
    unrolled CTE chain IS the loop — stage i's vocab references stage i-1."""
    stages = [
        f"""wc AS (
  SELECT tok AS word, CAST(count(*) AS BIGINT) AS wc
  FROM (SELECT unnest({_TOKS_SQL}) AS tok
        FROM documents WHERE length(trim(text)) > 0)
  WHERE tok <> '' GROUP BY 1),
v0 AS (SELECT word, wc,
              '||' || regexp_replace(word, '(.)', '\\1||', 'g') AS seq
       FROM wc)"""
    ]
    prev = "v0"
    for i in range(1, k + 1):
        stages.append(
            f"""p{i} AS (
  SELECT pair, CAST(sum(wc) AS BIGINT) AS cnt
  FROM (SELECT wc,
               unnest(list_transform(range(1, len(toks)),
                                     j -> toks[j] || ' ' || toks[j + 1])) AS pair
        FROM (SELECT wc, list_filter(string_split(seq, '||'), t -> t <> '') AS toks
              FROM {prev}))
  GROUP BY 1),
b{i} AS (
  SELECT {i} AS step, split_part(pair, ' ', 1) AS x,
         split_part(pair, ' ', 2) AS y, cnt
  FROM p{i} ORDER BY cnt DESC, pair ASC LIMIT 1),
v{i} AS (
  SELECT word, wc,
         replace(seq, '|' || b.x || '||' || b.y || '|',
                 '|' || b.x || b.y || '|') AS seq
  FROM {prev}, b{i} b)"""
        )
        prev = f"v{i}"
    union = "\n    UNION ALL ".join(
        f"SELECT step, x, y, x || y AS merged, cnt FROM b{i}" for i in range(1, k + 1)
    )
    return "WITH " + ",\n".join(stages) + "\nSELECT * FROM (" + union + ")"


@register("bpe_train_merges", _bpe_oracle(_BPE_MERGES))
def bpe_train_merges(spark, sf_dir):
    """BPE tokenizer training: the ordered merge table (step, x, y, merged,
    cnt) for the first 8 merges over the documents corpus, greedy
    left-to-right pair fusion weighted by word frequency (Sennrich 2016).

    Scale posture (see functions/bpe.py): the corpus scan and every
    per-round pair-count aggregate are distributed over the word-frequency
    table (which may hold billions of distinct words at 100 TB — the part
    in-memory trainers like HF tokenizers cannot do); only the 1-row argmax
    pair crosses to the driver each round, the bounded-collect pattern
    sanctioned for similarity_ann_ivf_trained. Ties on pair count break on
    the ascending 'x y' pair string on both engines (space sorts below all
    symbol bytes, so combined-string order == (x, y) tuple order).
    EXECUTES_AT_BUILD: the training loop collects per iteration."""
    from etl_mssql_to_postgres_dailysync_spark.functions import bpe

    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim(F.col("text"))) > 0)
    wc = (
        docs.select(F.explode(text.tokens(text.normalize(F.col("text")))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
    )
    return bpe.train_merges(spark, wc, _BPE_MERGES)


# ---------------------------------------------------------------------------
# CountSketch: the signed, UNBIASED frequency sketch (functions/sketches.py)
# ---------------------------------------------------------------------------

_CS_PROBE_ARMS = sketches.cs_oracle_triples_sql(
    "probes", "CAST(user_id AS VARCHAR)"
).replace("SELECT CAST(user_id AS VARCHAR) AS k,",
          "SELECT user_id, exact_cnt,")


@register(
    "countsketch_unbiased_freq",
    f"""
    WITH triples AS ({sketches.cs_oracle_triples_sql("events", "CAST(user_id AS VARCHAR)")}),
    sketch AS (SELECT seed, bucket, CAST(sum(sign) AS BIGINT) AS counter
               FROM triples GROUP BY 1, 2),
    probes AS (SELECT user_id, count(*) AS exact_cnt FROM events GROUP BY 1
               ORDER BY exact_cnt DESC, user_id ASC LIMIT 10),
    coords AS ({_CS_PROBE_ARMS}),
    vals AS (SELECT user_id, exact_cnt,
                    sign * coalesce(counter, 0) AS v
             FROM coords LEFT JOIN sketch USING (seed, bucket)),
    est AS (SELECT user_id, exact_cnt,
                   CAST(list_sort(list(v))[{sketches.CS_DEPTH // 2 + 1}] AS BIGINT)
                       AS cs_est,
                   CAST(min(v) AS BIGINT) AS cs_min,
                   CAST(max(v) AS BIGINT) AS cs_max
            FROM vals GROUP BY 1, 2)
    SELECT user_id, CAST(exact_cnt AS BIGINT) AS exact_cnt, cs_est,
           cs_est - CAST(exact_cnt AS BIGINT) AS bias_diff, cs_min, cs_max
    FROM est
    """,
)
def countsketch_unbiased_freq(spark, sf_dir):
    """CountSketch (Charikar et al. 2002) over event user_ids, probed at
    the exact top-10 heavy hitters — the signed, UNBIASED counterpart of
    cms_frequency_sketch on the same key domain, so the two sketches'
    error characters are directly comparable: CMS only over-counts
    (collisions inflate), CountSketch's random +-1 signs cancel colliding
    keys in expectation and the median-of-5 bounds the variance.  The
    oracle rebuilds THE SKETCH ITSELF (same single-md5-digest bucket
    slices + parity sign bits, integer counters, exact middle order
    statistic) bit-for-bit.  bias_diff = cs_est - exact is emitted raw
    (signed, no division) — under CMS this column would be >= 0 by
    construction; here it straddles zero.  Sketch state: 5 x 1024
    counters at ANY input scale; build is one scan + one map-side-combined
    shuffle of <= d*w groups; estimation broadcasts the sketch."""
    events = _t(spark, sf_dir, "events")
    sketch = sketches.cs_build(events, "user_id")
    exact = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("user_id").asc())
        .limit(10)
    )
    est = sketches.cs_estimate(sketch, exact.select("user_id"), "user_id")
    return (
        exact.join(F.broadcast(est), ["user_id"])
        .select(
            "user_id",
            F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
            "cs_est",
            (F.col("cs_est") - F.col("exact_cnt")).cast("bigint").alias("bias_diff"),
            "cs_min",
            "cs_max",
        )
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprint overlap (functions/dedup.py winnow_fingerprints)
# ---------------------------------------------------------------------------

_WINNOW_MAX_POSTING = 50


@register(
    "dedup_winnowing_overlap",
    f"""
    WITH {dedup.winnow_fingerprints_sql("documents", "doc_id", _NORM_SQL)},
    perdoc AS (SELECT id, count(*) AS nfp FROM sel GROUP BY 1),
    posting AS (SELECT fph, count(*) AS nd FROM sel GROUP BY 1),
    kept AS (SELECT fph FROM posting
             WHERE nd BETWEEN 2 AND {_WINNOW_MAX_POSTING}),
    pairs AS (SELECT a.id AS doc_a, b.id AS doc_b, count(*) AS shared_fp
              FROM sel a JOIN kept USING (fph) JOIN sel b USING (fph)
              WHERE a.id < b.id GROUP BY 1, 2),
    out AS (SELECT p.doc_a, p.doc_b, CAST(p.shared_fp AS BIGINT) AS shared_fp,
                   CAST(da.nfp AS BIGINT) AS fp_a, CAST(db.nfp AS BIGINT) AS fp_b,
                   CAST(p.shared_fp * 1000000
                        // least(da.nfp, db.nfp) AS BIGINT) AS containment_ppm
            FROM pairs p
            JOIN perdoc da ON da.id = p.doc_a
            JOIN perdoc db ON db.id = p.doc_b)
    SELECT * FROM out
    ORDER BY shared_fp DESC, containment_ppm DESC, doc_a ASC, doc_b ASC
    LIMIT 20
    """,
)
def dedup_winnowing_overlap(spark, sf_dir):
    """Winnowing (MOSS) fingerprint overlap: the top-20 document pairs by
    shared window-min fingerprints, with per-doc fingerprint counts and
    containment ppm.  Winnowing sparsifies the 3-gram hash stream to
    ~2/(w+1) density while GUARANTEEING any shared run of >= w+k-1 = 6
    tokens yields a shared fingerprint — the deterministic counterpart to
    the probabilistic MinHash recall curve (dedup_lsh_audit), used where
    missed plagiarism/contamination is not acceptable.  The oracle replays
    the full selection (same gram hashes, combined rightmost-tie min,
    partial leading windows).  Scale: window min is per-document; the pair
    join runs on fingerprint postings capped at {_WINNOW_MAX_POSTING} docs
    (stop-fingerprints dropped, same convention as dedup_ngram_jaccard's
    max_posting), so candidate pairs stay O(sum of capped posting^2) and
    only (fph, id) pairs ever shuffle."""
    docs = _t(spark, sf_dir, "documents")
    sel = dedup.winnow_fingerprints(docs, "doc_id", "text").withColumnRenamed(
        "doc_id", "id"
    )
    perdoc = sel.groupBy("id").agg(F.count(F.lit(1)).alias("nfp"))
    kept = (
        sel.groupBy("fph")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter((F.col("nd") >= 2) & (F.col("nd") <= _WINNOW_MAX_POSTING))
        .select("fph")
    )
    sk = sel.join(kept, "fph")
    pairs = (
        sk.alias("a")
        .join(sk.alias("b"), "fph")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(
            F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fp"))
    )
    out = (
        pairs.join(perdoc.select(F.col("id").alias("doc_a"),
                                 F.col("nfp").alias("fp_a")), "doc_a")
        .join(perdoc.select(F.col("id").alias("doc_b"),
                            F.col("nfp").alias("fp_b")), "doc_b")
        .select(
            "doc_a", "doc_b", "shared_fp",
            F.col("fp_a").cast("bigint").alias("fp_a"),
            F.col("fp_b").cast("bigint").alias("fp_b"),
            F.expr("cast(shared_fp * 1000000 div least(fp_a, fp_b) as bigint)")
            .alias("containment_ppm"),
        )
    )
    return out.orderBy(
        F.col("shared_fp").desc(), F.col("containment_ppm").desc(),
        F.col("doc_a").asc(), F.col("doc_b").asc()
    ).limit(20)


# ---------------------------------------------------------------------------
# Hybrid retrieval: dense cosine + sparse keyword arms fused by RRF
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_ARM_TOPK = 20
_LN_UNAT = "CAST(round(ln(CAST({x} AS DOUBLE)) * 1000000) AS BIGINT)"


@register(
    "hybrid_search_rrf",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    dscored AS (
        SELECT q.query_id, c.neighbor_id, {_COS_SQL} AS sim
        FROM c CROSS JOIN q WHERE c.neighbor_id <> q.query_id
    ),
    dense AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id ASC) AS dr
        FROM dscored QUALIFY dr <= {_RRF_ARM_TOPK}
    ),
    dt AS (SELECT doc_id, unnest(list_distinct(
                     list_filter(regexp_split_to_array({_NORM_SQL}, ' '),
                                 t -> t <> ''))) AS tok
           FROM documents),
    n AS (SELECT count(DISTINCT doc_id) AS nd FROM dt),
    idf AS (SELECT tok, {_LN_UNAT.format(x="(SELECT nd FROM n)")}
                        - {_LN_UNAT.format(x="count(*)")} AS idf_unat
            FROM dt GROUP BY tok),
    qt AS (SELECT doc_id AS query_id, tok FROM dt WHERE doc_id < 5),
    sscore AS (SELECT qt.query_id, dt.doc_id AS neighbor_id,
                      CAST(sum(idf.idf_unat) AS BIGINT) AS score_unat
               FROM qt JOIN dt ON dt.tok = qt.tok AND dt.doc_id <> qt.query_id
               JOIN idf ON idf.tok = qt.tok
               GROUP BY 1, 2),
    sparse AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score_unat DESC, neighbor_id ASC) AS sr
        FROM sscore QUALIFY sr <= {_RRF_ARM_TOPK}
    ),
    fused AS (
        SELECT coalesce(d.query_id, s.query_id) AS query_id,
               coalesce(d.neighbor_id, s.neighbor_id) AS neighbor_id,
               coalesce(d.dr, 0) AS dense_rank,
               coalesce(s.sr, 0) AS sparse_rank,
               (CASE WHEN d.dr IS NULL THEN 0
                     ELSE 1000000 // ({_RRF_K} + d.dr) END)
             + (CASE WHEN s.sr IS NULL THEN 0
                     ELSE 1000000 // ({_RRF_K} + s.sr) END) AS rrf_ppm
        FROM dense d FULL OUTER JOIN sparse s
          ON d.query_id = s.query_id AND d.neighbor_id = s.neighbor_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rrf_ppm DESC, neighbor_id ASC)
                      AS fused_rank
        FROM fused QUALIFY fused_rank <= 10
    )
    SELECT query_id, neighbor_id, CAST(dense_rank AS INT) AS dense_rank,
           CAST(sparse_rank AS INT) AS sparse_rank,
           CAST(rrf_ppm AS BIGINT) AS rrf_ppm,
           CAST(fused_rank AS INT) AS fused_rank
    FROM ranked
    """,
)
def hybrid_search_rrf(spark, sf_dir):
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al. 2009):
    a dense arm (exact cosine top-20 per query embedding, broadcast
    queries — similarity.brute_force_topk's plan) and a sparse arm
    (idf-weighted distinct-term overlap in micro-nats, per the ln-unat
    parity convention) fused by RRF_ppm = sum over arms of
    1e6 div (60 + rank), absent arm contributing 0 — the standard
    RAG-retrieval combiner where neither embedding nor keyword recall
    alone suffices.  vec_id aligns with doc_id in the fixture corpus, so
    both arms retrieve over the same identity space.

    Scale: dense arm = broadcast 5 queries x corpus scan (shuffle-free
    score, per-query top-k window); sparse arm joins the 5 queries'
    term set against the corpus posting lists keyed by token (the idf
    table is token-grain, built with one map-side-combined groupBy), so
    the fact side shuffles once on token; fusion is a full-outer join of
    two <= 5 x 20-row arms.  Pure integer output end to end."""
    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents")

    dense = (
        similarity.brute_force_topk(emb.filter(F.col("vec_id") < 5), emb,
                                    k=_RRF_ARM_TOPK)
        .select("query_id", "neighbor_id", F.col("rank").alias("dr"))
    )

    dt = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(text.tokens(text.normalize(F.col("text"))),
                         lambda t: t != F.lit(""))
            )
        ).alias("tok"),
    )
    nd = dt.select(F.countDistinct("doc_id").alias("nd"))
    ln = lambda c: F.expr(f"cast(round(ln(cast({c} as double)) * 1000000) as bigint)")
    idf = (
        dt.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(nd))
        .select("tok", (ln("nd") - ln("df")).alias("idf_unat"))
    )
    qt = dt.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"), "tok"
    )
    sscore = (
        dt.join(F.broadcast(qt.join(idf, "tok")), "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", F.col("doc_id").alias("neighbor_id"))
        .agg(F.sum("idf_unat").cast("bigint").alias("score_unat"))
    )
    wsr = Window.partitionBy("query_id").orderBy(
        F.col("score_unat").desc(), F.col("neighbor_id").asc()
    )
    sparse = (
        sscore.withColumn("sr", F.row_number().over(wsr))
        .filter(F.col("sr") <= _RRF_ARM_TOPK)
        .select("query_id", "neighbor_id", "sr")
    )

    fused = (
        dense.join(sparse, ["query_id", "neighbor_id"], "full_outer")
        .select(
            "query_id", "neighbor_id",
            F.coalesce(F.col("dr"), F.lit(0)).alias("dense_rank"),
            F.coalesce(F.col("sr"), F.lit(0)).alias("sparse_rank"),
            (
                F.when(F.col("dr").isNull(), F.lit(0))
                .otherwise(F.expr(f"1000000 div ({_RRF_K} + dr)"))
                + F.when(F.col("sr").isNull(), F.lit(0))
                .otherwise(F.expr(f"1000000 div ({_RRF_K} + sr)"))
            ).cast("bigint").alias("rrf_ppm"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf_ppm").desc(), F.col("neighbor_id").asc()
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf))
        .filter(F.col("fused_rank") <= 10)
        .select(
            "query_id", "neighbor_id",
            F.col("dense_rank").cast("int").alias("dense_rank"),
            F.col("sparse_rank").cast("int").alias("sparse_rank"),
            "rrf_ppm",
            F.col("fused_rank").cast("int").alias("fused_rank"),
        )
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection distortion audit
# ---------------------------------------------------------------------------

_JL_D = 64     # source dimensionality
_JL_K = 16     # projected dimensionality
_JL_NPAIRS_IDS = 32   # audit pair population: vec_id < 32 -> 496 pairs


@register(
    "jl_projection_distortion",
    f"""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding,
                          x -> CAST(round(x::DOUBLE * {similarity.QUANT_SCALE})
                                    AS BIGINT)) AS q
               FROM embeddings WHERE vec_id < {_JL_NPAIRS_IDS}),
    m AS (SELECT i.i, j.j,
                 CAST(1 - 2 * (CAST('0x' || substr(md5('jl_' || i.i || '_' || j.j), 1, 1)
                               AS BIGINT) % 2) AS BIGINT) AS s
          FROM (SELECT unnest(range({_JL_D})) AS i) i
          CROSS JOIN (SELECT unnest(range({_JL_K})) AS j) j),
    x AS (SELECT vec_id, u.i AS i, q[u.i + 1] AS xi
          FROM e, unnest(range({_JL_D})) AS u(i)),
    proj AS (SELECT x.vec_id, m.j, CAST(sum(m.s * x.xi) AS BIGINT) AS pj
             FROM x JOIN m ON m.i = x.i GROUP BY 1, 2),
    dfull AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                     CAST(list_sum(list_transform(range({_JL_D}),
                          k -> (a.q[k + 1] - b.q[k + 1]) * (a.q[k + 1] - b.q[k + 1])))
                          AS BIGINT) AS d2_full
              FROM e a JOIN e b ON a.vec_id < b.vec_id),
    dproj AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                     CAST(sum((a.pj - b.pj) * (a.pj - b.pj)) AS BIGINT) AS d2_proj
              FROM proj a JOIN proj b ON a.j = b.j AND a.vec_id < b.vec_id
              GROUP BY 1, 2)
    SELECT f.vec_a, f.vec_b, f.d2_full, p.d2_proj,
           CAST(CAST(p.d2_proj AS HUGEINT) * 1000000
                // ({_JL_K} * CAST(f.d2_full AS HUGEINT)) AS BIGINT) AS ratio_ppm
    FROM dfull f JOIN dproj p ON p.vec_a = f.vec_a AND p.vec_b = f.vec_b
    """,
)
def jl_projection_distortion(spark, sf_dir):
    """Johnson-Lindenstrauss dimension reduction audit: project the 64-dim
    embeddings to 16 dims with a deterministic Rademacher (+-1) matrix
    whose signs come from md5('jl_i_j') hex parity, then measure the
    squared-distance distortion ratio d2_proj / (k * d2_full) in ppm over
    all 496 pairs of the first 32 vectors.  E[|Rx|^2] = k * |x|^2 for +-1
    entries, so the ratio concentrates at 1e6 — the decision table for
    running ANN on 4x-smaller vectors at 100 TB (store cost and cosine
    fold both shrink by d/k).  All arithmetic is exact integers after the
    QUANT_SCALE micro-quantization (sign-weighted sums are order-free), so
    the oracle replays projection, distances and ratios bit-for-bit; the
    wide product d2_proj * 1e6 goes through DECIMAL(38,0) per the gini
    convention (DuckDB sums are HUGEINT natively).

    Scale: the projection is a broadcast join against the 1024-row (i,j)
    sign matrix + a (vec, j)-grain integer sum — one shuffle of k rows per
    vector, never a driver loop; at 100 TB the pair audit runs on a
    bounded sample exactly as here (496 pairs), while the projection
    itself is embarrassingly parallel."""
    emb = _t(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _JL_NPAIRS_IDS
    ).select("vec_id", similarity.quantize_vec(F.col("embedding")).alias("q"))

    iidx = spark.range(_JL_D).select(F.col("id").cast("long").alias("i"))
    jidx = spark.range(_JL_K).select(F.col("id").cast("long").alias("j"))
    m = iidx.crossJoin(jidx).select(
        "i", "j",
        (F.lit(1) - F.lit(2) * (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("jl_"), F.col("i").cast("string"),
                                   F.lit("_"), F.col("j").cast("string"))),
                    1, 1),
                16, 10).cast("bigint") % F.lit(2)
        )).cast("bigint").alias("s"),
    )
    x = emb.select(
        "vec_id", F.posexplode("q").alias("i", "xi")
    ).select("vec_id", F.col("i").cast("long").alias("i"), "xi")
    proj = (
        x.join(F.broadcast(m), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("s") * F.col("xi")).cast("bigint").alias("pj"))
    )

    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("q").alias("qa"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("q").alias("qb"))
    dfull = (
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b",
            F.expr(
                f"cast(aggregate(sequence(0, {_JL_D - 1}), cast(0 as bigint),"
                f" (acc, k) -> acc + (qa[k] - qb[k]) * (qa[k] - qb[k]))"
                f" as bigint)"
            ).alias("d2_full"),
        )
    )
    pa = proj.select(F.col("vec_id").alias("vec_a"), "j", F.col("pj").alias("pa"))
    pb = proj.select(F.col("vec_id").alias("vec_b"), "j", F.col("pj").alias("pb"))
    dproj = (
        pa.join(pb, "j")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .groupBy("vec_a", "vec_b")
        .agg(
            F.sum((F.col("pa") - F.col("pb")) * (F.col("pa") - F.col("pb")))
            .cast("bigint")
            .alias("d2_proj")
        )
    )
    return dfull.join(dproj, ["vec_a", "vec_b"]).select(
        "vec_a", "vec_b", "d2_full", "d2_proj",
        F.expr(
            f"cast(cast(d2_proj as decimal(38,0)) * 1000000"
            f" div ({_JL_K} * cast(d2_full as decimal(38,0))) as bigint)"
        ).alias("ratio_ppm"),
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend (median of pairwise slopes) vs OLS
# ---------------------------------------------------------------------------

_TS_OFF = 10**12   # offset making every integer division non-negative


@register(
    "theil_sen_trend",
    f"""
    WITH daily AS (
        SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS x,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
        GROUP BY 1),
    pairs AS (
        SELECT a.x AS xa, b.x AS xb,
               CAST(((b.cents - a.cents) * 1000 + {_TS_OFF} * (b.x - a.x))
                    // (b.x - a.x) - {_TS_OFF} AS BIGINT) AS slope_milli
        FROM daily a JOIN daily b ON b.x > a.x),
    np AS (SELECT count(*) AS n_pairs FROM pairs),
    ranked AS (
        SELECT slope_milli,
               row_number() OVER (ORDER BY slope_milli ASC, xa ASC, xb ASC) AS rn
        FROM pairs),
    ts AS (SELECT slope_milli AS ts_slope_milli FROM ranked, np
           WHERE rn = (n_pairs + 1) // 2),
    resid AS (
        SELECT d.cents * 1000 - t.ts_slope_milli * d.x AS r_milli, d.x
        FROM daily d, ts t),
    nd AS (SELECT count(*) AS n_days FROM daily),
    rranked AS (
        SELECT r_milli, row_number() OVER (ORDER BY r_milli ASC, x ASC) AS rn
        FROM resid),
    icept AS (SELECT r_milli AS ts_intercept_milli FROM rranked, nd
              WHERE rn = (n_days + 1) // 2),
    ols AS (
        SELECT CAST((
                 (CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * cents)
                  - CAST(sum(x) AS HUGEINT) * sum(cents)) * 1000
                 + CAST({_TS_OFF} AS HUGEINT)
                   * (CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * x)
                      - CAST(sum(x) AS HUGEINT) * sum(x))
               ) // (CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * x)
                     - CAST(sum(x) AS HUGEINT) * sum(x))
               - {_TS_OFF} AS BIGINT) AS ols_slope_milli
        FROM daily)
    SELECT CAST(nd.n_days AS BIGINT) AS n_days,
           CAST(np.n_pairs AS BIGINT) AS n_pairs,
           ts.ts_slope_milli, icept.ts_intercept_milli, ols.ols_slope_milli
    FROM nd, np, ts, icept, ols
    """,
)
def theil_sen_trend(spark, sf_dir):
    """Theil-Sen robust trend over Q1-1995 daily revenue: the median of all
    pairwise slopes (milli-cents/day) with its median-residual intercept,
    next to the OLS slope it robustifies — the estimator that shrugs off
    the outlier days that drag least-squares (29% breakdown point).  The
    pair population is DAY-grain (n*(n-1)/2 over ~90 aggregated days), so
    its size is fixed by the calendar window, not data volume — at 100 TB
    the only data-sized work is the one groupBy(day) scan.  Median =
    exact lower-middle order statistic; every division is made
    non-negative by the {_TS_OFF} offset trick (Spark div truncates,
    DuckDB // floors — they agree only on non-negative operands), and the
    OLS normal-equation products run in DECIMAL(38,0)/HUGEINT."""
    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.filter(
            filters.date_range_partition("o_orderdate", "1995-01-01", "1995-03-31")
        )
        .groupBy(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
            .cast("long")
            .alias("x")
        )
        .agg(
            F.sum(F.expr("cast(round(o_totalprice * 100) as bigint)"))
            .cast("bigint")
            .alias("cents")
        )
    )
    a = daily.select(F.col("x").alias("xa"), F.col("cents").alias("ca"))
    b = daily.select(F.col("x").alias("xb"), F.col("cents").alias("cb"))
    pairs = (
        a.join(F.broadcast(b), F.col("xb") > F.col("xa"))
        .select(
            "xa", "xb",
            F.expr(
                f"cast(((cb - ca) * 1000 + cast({_TS_OFF} as bigint) * (xb - xa))"
                f" div (xb - xa) - cast({_TS_OFF} as bigint) as bigint)"
            ).alias("slope_milli"),
        )
    )
    np_ = pairs.agg(F.count(F.lit(1)).alias("n_pairs"))
    wslope = Window.orderBy(F.col("slope_milli").asc(), F.col("xa").asc(), F.col("xb").asc())
    ts = (
        pairs.withColumn("rn", F.row_number().over(wslope))
        .crossJoin(F.broadcast(np_))
        .filter(F.col("rn") == F.expr("(n_pairs + 1) div 2"))
        .select(F.col("slope_milli").alias("ts_slope_milli"))
    )
    resid = daily.crossJoin(F.broadcast(ts)).select(
        (F.col("cents") * 1000 - F.col("ts_slope_milli") * F.col("x")).alias("r_milli"),
        "x",
    )
    nd_ = daily.agg(F.count(F.lit(1)).alias("n_days"))
    wr = Window.orderBy(F.col("r_milli").asc(), F.col("x").asc())
    icept = (
        resid.withColumn("rn", F.row_number().over(wr))
        .crossJoin(F.broadcast(nd_))
        .filter(F.col("rn") == F.expr("(n_days + 1) div 2"))
        .select(F.col("r_milli").alias("ts_intercept_milli"))
    )
    ols = daily.agg(
        F.expr(
            f"cast(((cast(count(*) as decimal(38,0)) * sum(cast(x as decimal(38,0)) * cents)"
            f" - cast(sum(x) as decimal(38,0)) * sum(cents)) * 1000"
            f" + cast({_TS_OFF} as decimal(38,0))"
            f" * (cast(count(*) as decimal(38,0)) * sum(cast(x as decimal(38,0)) * x)"
            f" - cast(sum(x) as decimal(38,0)) * sum(x)))"
            f" div (cast(count(*) as decimal(38,0)) * sum(cast(x as decimal(38,0)) * x)"
            f" - cast(sum(x) as decimal(38,0)) * sum(x))"
            f" - {_TS_OFF} as bigint)"
        ).alias("ols_slope_milli")
    )
    return (
        nd_.crossJoin(np_).crossJoin(ts).crossJoin(icept).crossJoin(ols)
        .select(
            F.col("n_days").cast("bigint").alias("n_days"),
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            "ts_slope_milli", "ts_intercept_milli", "ols_slope_milli",
        )
    )


# ---------------------------------------------------------------------------
# MMR diversified retrieval (functions/similarity.mmr_select)
# ---------------------------------------------------------------------------

_MMR_K = 5
_MMR_NCAND = 20


def _mmr_oracle(k: int) -> str:
    """Unrolled greedy-selection oracle (same pattern as _bpe_oracle): one
    CTE stage per MMR pick; stage i scores every unselected candidate by
    7*rel - 3*max(sim to the i-1 already-selected) and takes the
    (key DESC, cand ASC) winner per query."""
    cos = "round(list_cosine_similarity(q.qv::DOUBLE[], c.cv::DOUBLE[]), 6)"
    pcos = "round(list_cosine_similarity(x.va::DOUBLE[], y.va::DOUBLE[]), 6)"
    stages = [f"""
    q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {_MMR_K}),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (SELECT q.query_id, c.neighbor_id, {cos} AS sim
               FROM c CROSS JOIN q WHERE c.neighbor_id <> q.query_id),
    cands AS (SELECT query_id, neighbor_id,
                     CAST(round(sim * 1000000) AS BIGINT) AS rel,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, neighbor_id ASC) AS rn
              FROM scored QUALIFY rn <= {_MMR_NCAND}),
    cv AS (SELECT ca.query_id, ca.neighbor_id AS a, ca.rel, e.embedding AS va
           FROM cands ca JOIN embeddings e ON e.vec_id = ca.neighbor_id),
    ps AS (SELECT x.query_id, x.a, y.a AS b,
                  CAST(round({pcos} * 1000000) AS BIGINT) AS s
           FROM cv x JOIN cv y ON x.query_id = y.query_id AND x.a <> y.a),
    rel AS (SELECT query_id, a, rel FROM cv),
    s1 AS (SELECT query_id, a AS cand, CAST(7 * rel AS BIGINT) AS key, 1 AS step
           FROM (SELECT query_id, a, rel,
                        row_number() OVER (PARTITION BY query_id
                                           ORDER BY 7 * rel DESC, a ASC) AS rn
                 FROM rel) WHERE rn = 1)"""]
    prev_sels = ["s1"]
    for i in range(2, k + 1):
        sel_union = " UNION ALL ".join(f"SELECT * FROM {s}" for s in prev_sels)
        stages.append(f"""
    sel{i} AS ({sel_union}),
    m{i} AS (SELECT r.query_id, r.a,
                    CAST(7 * r.rel - 3 * max(p.s) AS BIGINT) AS key
             FROM rel r
             JOIN sel{i} sl ON sl.query_id = r.query_id
             JOIN ps p ON p.query_id = r.query_id AND p.a = r.a
                       AND p.b = sl.cand
             WHERE NOT EXISTS (SELECT 1 FROM sel{i} z
                               WHERE z.query_id = r.query_id AND z.cand = r.a)
             GROUP BY r.query_id, r.a, r.rel),
    s{i} AS (SELECT query_id, a AS cand, key, {i} AS step
             FROM (SELECT query_id, a, key,
                          row_number() OVER (PARTITION BY query_id
                                             ORDER BY key DESC, a ASC) AS rn
                   FROM m{i}) WHERE rn = 1)""")
        prev_sels.append(f"s{i}")
    final_union = " UNION ALL ".join(f"SELECT * FROM {s}" for s in prev_sels)
    return ("WITH " + ",".join(stages)
            + f"""
    SELECT query_id, cand AS vec_id, CAST(step AS INT) AS mmr_rank,
           key AS score_x10micro
    FROM ({final_union})""")


@register("mmr_diversified_topk", _mmr_oracle(_MMR_K))
def mmr_diversified_topk(spark, sf_dir):
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    from each query's exact cosine top-20, greedily select 5 results
    maximizing 0.7*relevance - 0.3*max-similarity-to-already-picked — the
    diversity-aware second stage of a retrieval pipeline (dedupes
    near-identical hits that a pure top-k returns).  Greedy selection is
    inherently sequential IN k but embarrassingly parallel ACROSS queries,
    so it runs as an Arrow-batched applyInPandas over per-query candidate
    groups (<= 20 rows each; the only data-sized work is the first-stage
    retriever) with pure integer score keys (7*rel - 3*maxsim in
    tenths-of-micro — lambda=0.7 with no division, no float, no
    trunc-vs-floor hazard).  The oracle unrolls the same greedy loop as
    5 chained CTE stages (the _bpe_oracle pattern), replaying every pick
    and tie-break bit-for-bit."""
    from etl_mssql_to_postgres_dailysync_spark.functions import vectors

    emb = _t(spark, sf_dir, "embeddings")
    cands = similarity.brute_force_topk(
        emb.filter(F.col("vec_id") < _MMR_K), emb, k=_MMR_NCAND
    ).select(
        "query_id", "neighbor_id",
        F.expr("cast(round(sim * 1000000) as bigint)").alias("rel"),
    )
    cv = cands.join(
        emb.select(F.col("vec_id"), F.col("embedding").alias("va")),
        F.col("neighbor_id") == F.col("vec_id"),
    ).select(
        "query_id", F.col("neighbor_id").alias("a"), "rel", "va",
        vectors.norm(F.col("va")).alias("na"),
    )
    x = cv.select("query_id", "a", "rel", "va", "na")
    y = cv.select(
        F.col("query_id").alias("qy"), F.col("a").alias("b"),
        F.col("va").alias("vb"), F.col("na").alias("nb"),
    )
    pf = (
        x.join(y, (F.col("query_id") == F.col("qy")) & (F.col("a") != F.col("b")))
        .select(
            "query_id", "a", "rel", "b",
            F.round(
                vectors.cosine_prenormed(
                    F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
                ) * 1_000_000
            ).cast("long").alias("s"),
        )
    )
    return similarity.mmr_select(pf, _MMR_K)


# ---------------------------------------------------------------------------
# Multi-touch conversion attribution (first / last / linear / U-shaped)
# ---------------------------------------------------------------------------


@register(
    "attribution_multi_touch",
    """
    WITH conv AS (SELECT user_id, ts AS cts, event_id AS conv_id
                  FROM events WHERE event_type = 'purchase'),
    touch AS (SELECT user_id, ts, event_id, event_type
              FROM events WHERE event_type IN ('view', 'click', 'signup')),
    j AS (SELECT c.conv_id, t.event_id, t.event_type,
                 row_number() OVER (PARTITION BY c.conv_id
                                    ORDER BY t.ts ASC, t.event_id ASC) AS rn_a,
                 row_number() OVER (PARTITION BY c.conv_id
                                    ORDER BY t.ts DESC, t.event_id DESC) AS rn_d,
                 count(*) OVER (PARTITION BY c.conv_id) AS n
          FROM conv c JOIN touch t
            ON t.user_id = c.user_id
           AND t.ts < c.cts AND t.ts >= c.cts - INTERVAL 24 HOURS),
    w AS (SELECT conv_id, event_type,
                 CASE WHEN rn_a = 1 THEN 1000000 ELSE 0 END AS first_ppm,
                 CASE WHEN rn_d = 1 THEN 1000000 ELSE 0 END AS last_ppm,
                 1000000 // n AS linear_ppm,
                 CASE WHEN n = 1 THEN 1000000
                      WHEN n = 2 THEN 500000
                      WHEN rn_a = 1 OR rn_d = 1 THEN 400000
                      ELSE 200000 // (n - 2) END AS ushape_ppm
          FROM j)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions,
           CAST(sum(first_ppm) AS BIGINT) AS first_touch_ppm,
           CAST(sum(last_ppm) AS BIGINT) AS last_touch_ppm,
           CAST(sum(linear_ppm) AS BIGINT) AS linear_ppm,
           CAST(sum(ushape_ppm) AS BIGINT) AS ushape_ppm
    FROM w GROUP BY 1
    """,
)
def attribution_multi_touch(spark, sf_dir):
    """Multi-touch conversion attribution over a 24-hour lookback: every
    purchase credits the user's preceding view/click/signup touches under
    four standard models at once — first-touch, last-touch, linear, and
    U-shaped (position-based 40/40/20; n=1 -> 100%, n=2 -> 50/50) — all
    in exact integer ppm (every division non-negative, so Spark div ==
    DuckDB //), aggregated to credit totals per touch channel.

    Scale: the conversion-touch pairing is an equi-join on user_id with a
    sargable time-range predicate (24h lookback bounds the per-conversion
    fan-out); the per-conversion windows partition by conv_id (never
    data-grain global).  At 100 TB the join co-locates by bucketing both
    sides on user_id — same posture as operators/joins.range_join — and
    skewed power-users are bounded by the lookback window itself."""
    events = _t(spark, sf_dir, "events")
    conv = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"),
        F.col("event_id").alias("conv_id"),
    )
    touch = events.filter(
        F.col("event_type").isin("view", "click", "signup")
    ).select("user_id", "ts", "event_id", "event_type")
    j = conv.join(
        touch,
        (F.col("user_id") == F.col("cu"))
        & (F.col("ts") < F.col("cts"))
        & (F.col("ts") >= F.col("cts") - F.expr("INTERVAL 24 HOURS")),
    )
    wa = Window.partitionBy("conv_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wd = Window.partitionBy("conv_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    wn = Window.partitionBy("conv_id")
    scored = j.select(
        "conv_id", "event_type",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
        F.count(F.lit(1)).over(wn).alias("n"),
    ).select(
        "conv_id", "event_type",
        F.when(F.col("rn_a") == 1, 1000000).otherwise(0).alias("first_ppm"),
        F.when(F.col("rn_d") == 1, 1000000).otherwise(0).alias("last_ppm"),
        F.expr("1000000 div n").alias("linear_ppm"),
        F.when(F.col("n") == 1, 1000000)
        .when(F.col("n") == 2, 500000)
        .when((F.col("rn_a") == 1) | (F.col("rn_d") == 1), 400000)
        .otherwise(F.expr("200000 div (n - 2)"))
        .alias("ushape_ppm"),
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.countDistinct("conv_id").cast("bigint").alias("n_conversions"),
        F.sum("first_ppm").cast("bigint").alias("first_touch_ppm"),
        F.sum("last_ppm").cast("bigint").alias("last_touch_ppm"),
        F.sum("linear_ppm").cast("bigint").alias("linear_ppm"),
        F.sum("ushape_ppm").cast("bigint").alias("ushape_ppm"),
    )


# ---------------------------------------------------------------------------
# Kneser-Ney smoothed bigram probabilities
# ---------------------------------------------------------------------------

_KN_D_MILLI = 750   # absolute discount D = 0.75 in milli


@register(
    "text_kneser_ney_bigram",
    f"""
    WITH nt AS (SELECT doc_id, regexp_split_to_array({_NORM_SQL}, ' ') AS toks
                FROM documents WHERE length(trim(text)) > 0),
    bg AS (SELECT toks[i] AS x, toks[i + 1] AS y
           FROM nt, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS u(i)),
    c12 AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT x, CAST(sum(c12) AS BIGINT) AS c1,
                  CAST(count(*) AS BIGINT) AS n1fw
           FROM c12 GROUP BY 1),
    cbw AS (SELECT y, CAST(count(*) AS BIGINT) AS n1bw FROM c12 GROUP BY 1),
    nbt AS (SELECT CAST(count(*) AS BIGINT) AS nbt FROM c12),
    top AS (SELECT x, y, c12,
                   row_number() OVER (ORDER BY c12 DESC, x ASC, y ASC) AS rn
            FROM c12 QUALIFY rn <= 30)
    SELECT t.x, t.y, t.c12, c1.c1, c1.n1fw, cbw.n1bw, nbt.nbt,
           CAST((greatest(t.c12 * 1000 - {_KN_D_MILLI}, 0) * 1000000)
                // (c1.c1 * 1000)
                + ({_KN_D_MILLI} * cbw.n1bw * 1000000 // nbt.nbt) * c1.n1fw
                  // (c1.c1 * 1000) AS BIGINT) AS pkn_ppm,
           CAST(t.c12 * 1000000 // c1.c1 AS BIGINT) AS pml_ppm
    FROM top t
    JOIN c1 ON c1.x = t.x
    JOIN cbw ON cbw.y = t.y
    CROSS JOIN nbt
    """,
)
def text_kneser_ney_bigram(spark, sf_dir):
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney 1995;
    Chen & Goodman 1998) for the corpus's top-30 bigrams, next to the
    unsmoothed ML estimate: P_KN(y|x) = max(c12 - D, 0)/c1 +
    (D * N1+(x,.) / c1) * N1+(.,y) / N1+(.,.) with absolute discount
    D = 0.75 — the continuation-count smoother that fixes ML's zero mass
    on unseen pairs (the "san francisco" pathology: frequent y only after
    few x gets LOW continuation probability).  All arithmetic is staged
    integer ppm with the SAME truncation order on both engines (inner
    continuation term first, then the n1fw scaling, then the c1
    division), every operand non-negative.

    Scale: three count tables (bigram / left / right marginals) from one
    bigram explode with map-side combine; model state is vocab-grain, not
    corpus-grain, and merging shards = summing counts.  The top-30 window
    is global but sits above the bigram-type aggregate (never data
    grain)."""
    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim(F.col("text"))) > 0)
    nt = docs.select(text.tokens(text.normalize(F.col("text"))).alias("toks"))
    bg = nt.select(
        F.posexplode(
            F.expr(
                "case when size(toks) >= 2 then"
                " transform(sequence(1, size(toks) - 1),"
                "           i -> struct(toks[i - 1] as x, toks[i] as y))"
                " else array() end"
            )
        ).alias("p0", "b")
    ).select(F.col("b.x").alias("x"), F.col("b.y").alias("y"))
    c12 = bg.groupBy("x", "y").agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    c1 = c12.groupBy("x").agg(
        F.sum("c12").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n1fw"),
    )
    cbw = c12.groupBy("y").agg(F.count(F.lit(1)).cast("bigint").alias("n1bw"))
    nbt = c12.agg(F.count(F.lit(1)).cast("bigint").alias("nbt"))
    wtop = Window.orderBy(F.col("c12").desc(), F.col("x").asc(), F.col("y").asc())
    top = (
        c12.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= 30)
        .drop("rn")
    )
    return (
        top.join(c1, "x")
        .join(cbw, "y")
        .crossJoin(F.broadcast(nbt))
        .select(
            "x", "y", "c12", "c1", "n1fw", "n1bw", "nbt",
            F.expr(
                f"cast((greatest(c12 * 1000 - {_KN_D_MILLI}, 0) * 1000000)"
                f" div (c1 * 1000)"
                f" + ({_KN_D_MILLI} * n1bw * 1000000 div nbt) * n1fw"
                f" div (c1 * 1000) as bigint)"
            ).alias("pkn_ppm"),
            F.expr("cast(c12 * 1000000 div c1 as bigint)").alias("pml_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# HLL sliding 28-day active users (register-file windowing)
# ---------------------------------------------------------------------------


@register(
    "hll_sliding_28d_users",
    f"""
    WITH h AS (SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
                      CAST(CAST(CAST(ts AS DATE) AS VARCHAR) AS VARCHAR) AS day,
                      CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                           AS BIGINT) AS h
               FROM events),
    r AS (SELECT x, day, h % {_HLL_M} AS bucket,
                 CASE WHEN h // {_HLL_M} = 0 THEN {_HLL_VBITS + 1}
                      ELSE {_HLL_VBITS + 1} - length(bin(h // {_HLL_M})) END AS rho
          FROM h),
    reg AS (SELECT x, day, bucket, max(rho) AS mj FROM r GROUP BY 1, 2, 3),
    days AS (SELECT DISTINCT x, day FROM h),
    grid AS (SELECT d.x, d.day, b.bucket FROM days d
             CROSS JOIN (SELECT unnest(range({_HLL_M})) AS bucket) b),
    g AS (SELECT grid.x, grid.day, grid.bucket, coalesce(reg.mj, 0) AS mj
          FROM grid LEFT JOIN reg
            ON reg.x = grid.x AND reg.bucket = grid.bucket),
    win AS (SELECT x, day, bucket,
                   max(mj) OVER (PARTITION BY bucket ORDER BY x
                                 RANGE BETWEEN 27 PRECEDING AND CURRENT ROW) AS mj
            FROM g),
    s AS (SELECT x, day,
                 CAST(sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero,
                 CAST(sum(CAST(1 AS BIGINT) << ({_HLL_VBITS + 1} - mj)) AS BIGINT)
                     AS s_sum
          FROM win GROUP BY 1, 2),
    e AS (SELECT x, day, v_zero, s_sum,
                 CAST(CAST('{_HLL_NUM}' AS DECIMAL(38,0))
                      // (CAST(1000 AS DECIMAL(38,0)) * s_sum) AS BIGINT) AS raw_est
          FROM s),
    xact AS (SELECT d.x, CAST(count(DISTINCT ev.user_id) AS BIGINT) AS exact_28d
             FROM (SELECT DISTINCT date_diff('day', DATE '2024-01-01',
                                             CAST(ts AS DATE)) AS x FROM events) d
             JOIN events ev
               ON date_diff('day', DATE '2024-01-01', CAST(ev.ts AS DATE))
                  BETWEEN d.x - 27 AND d.x
             GROUP BY 1)
    SELECT e.day, e.v_zero, e.s_sum,
           {_hll_est_sql("e.raw_est", "e.v_zero")} AS hll_28d_est,
           xact.exact_28d,
           CAST(abs({_hll_est_sql("e.raw_est", "e.v_zero")} - xact.exact_28d)
                * 1000000 // xact.exact_28d AS BIGINT) AS err_ppm
    FROM e JOIN xact ON xact.x = e.x
    """,
)
def hll_sliding_28d_users(spark, sf_dir):
    """Sliding 28-day active users from DAILY HLL register files: one m-row
    register checkpoint per day, then a per-bucket windowed MAX over an
    integer-day RANGE frame (27 preceding) replays the union of the last
    28 sketches — turning rolling_28d_active_users' exact O(days x events)
    recount into O(days x m) register arithmetic.  Unlike the cumulative
    variant (hll_incremental_daily), the sliding union genuinely needs the
    per-day files (a running max cannot expire old days; the window re-max
    over 28 bounded rows per bucket can).  The RANGE frame on the day
    index keeps the 28-day semantics correct across calendar gaps.  Exact
    rolling distinct rides along as the fixture-scale audit arm, same
    register/estimator conventions as the rest of the HLL family.

    Day key formatted VARCHAR per the DATE-output parity convention."""
    events = _t(spark, sf_dir, "events")
    h = events.select(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        F.col("ts").cast("date").cast("string").alias("day"),
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    r = h.select(
        "x", "day",
        (F.col("h") % _HLL_M).alias("bucket"),
        F.when(F.expr(f"h div {_HLL_M}") == 0, _HLL_VBITS + 1)
        .otherwise(
            F.lit(_HLL_VBITS + 1) - F.length(F.bin(F.expr(f"h div {_HLL_M}")))
        )
        .alias("rho"),
    )
    reg = r.groupBy("x", "day", "bucket").agg(F.max("rho").alias("mj"))
    days = h.select("x", "day").distinct()
    buckets = spark.range(_HLL_M).select(F.col("id").cast("long").alias("bucket"))
    g = (
        days.crossJoin(F.broadcast(buckets))
        .join(reg, ["x", "bucket"], "left")
        .select(
            days["x"].alias("x"), days["day"].alias("day"), "bucket",
            F.coalesce(F.col("mj"), F.lit(0)).alias("mj"),
        )
    )
    wslide = (
        Window.partitionBy("bucket").orderBy("x").rangeBetween(-27, 0)
    )
    win = g.select("x", "day", "bucket", F.max("mj").over(wslide).alias("mj"))
    s = win.groupBy("x", "day").agg(
        F.sum(F.when(F.col("mj") == 0, 1).otherwise(0)).cast("long").alias("v_zero"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_VBITS + 1} - mj)"))
        .cast("long")
        .alias("s_sum"),
    )
    e = s.withColumn(
        "raw_est",
        F.expr(
            f"cast(cast('{_HLL_NUM}' as decimal(38,0))"
            f" div (cast(1000 as decimal(38,0)) * s_sum) as bigint)"
        ),
    )
    est = F.expr(
        f"cast(case when v_zero > 0 and raw_est < {5 * _HLL_M // 2}"
        f" then {_HLL_M} * ({_HLL_LN_M_UNAT}"
        f" - cast(round(ln(cast(v_zero as double)) * 1000000) as bigint))"
        f" div 1000000"
        f" else raw_est end as bigint)"
    )
    dspine = h.select("x").distinct()
    xact = (
        dspine.join(
            events.select(
                F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
                .cast("long")
                .alias("ex"),
                "user_id",
            ),
            (F.col("ex") >= F.col("x") - 27) & (F.col("ex") <= F.col("x")),
        )
        .groupBy("x")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_28d"))
    )
    return (
        e.join(xact, "x")
        .withColumn("hll_28d_est", est)
        .select(
            "day", "v_zero", "s_sum", "hll_28d_est", "exact_28d",
            F.expr(
                "cast(abs(hll_28d_est - exact_28d) * 1000000"
                " div exact_28d as bigint)"
            ).alias("err_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-validation near-duplicate leakage audit
# ---------------------------------------------------------------------------


@register(
    "cv_leakage_neardup",
    f"""
    WITH {_SHINGLES_CTE},
    hs AS (SELECT doc_id, sh AS h FROM sh),
    seeds AS (SELECT * FROM (VALUES {_MH_SEED_VALUES}) AS t(seed, a, b)),
    sig AS (
        SELECT doc_id, seed, min((a * h + b) % {dedup.MINHASH_P}) AS sig
        FROM hs CROSS JOIN seeds GROUP BY doc_id, seed
    ),
    bands AS (
        SELECT doc_id, seed // 4 AS band,
               string_agg(CAST(sig AS VARCHAR), '|' ORDER BY seed) AS sigstr
        FROM sig GROUP BY doc_id, seed // 4
    ),
    bh AS (
        SELECT doc_id, band,
               CAST('0x' || substr(md5(sigstr || '#' || (1000 + band)), 1, 15) AS BIGINT) AS band_hash
        FROM bands
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bh a JOIN bh b
          ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    ),
    pf AS (
        SELECT least(fa, fb) AS fold_lo, greatest(fa, fb) AS fold_hi
        FROM (SELECT {md5_long_sql("CAST(id_a AS VARCHAR)", 42)} % 5 AS fa,
                     {md5_long_sql("CAST(id_b AS VARCHAR)", 42)} % 5 AS fb
              FROM pairs)
    ),
    g AS (SELECT fold_lo, fold_hi, count(*) AS n_pairs FROM pf GROUP BY 1, 2),
    t AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS total FROM g)
    SELECT CAST(fold_lo AS INT) AS fold_lo, CAST(fold_hi AS INT) AS fold_hi,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(CASE WHEN fold_lo <> fold_hi THEN 1 ELSE 0 END AS INT) AS leak,
           CAST(n_pairs * 1000000 // t.total AS BIGINT) AS share_ppm
    FROM g CROSS JOIN t
    """,
)
def cv_leakage_neardup(spark, sf_dir):
    """Train/eval contamination audit: how many MinHash-LSH near-duplicate
    candidate pairs STRADDLE the deterministic 5-fold split — i.e. one copy
    would train while its twin evaluates.  Composes two registered
    primitives verbatim (dedup_minhash_lsh's 16-hash/4-band pair generation
    and cv_fold_assignment's md5(doc_id,seed=42)%5 fold rule) into the
    audit a split designer actually reads: the fold x fold pair-count
    matrix with a leak flag and the share of total pair mass per cell.
    Under a uniform hash split ~80% of near-dup mass leaks cross-fold
    (1 - 1/k), which is exactly why dedup-then-split (or cluster-aware
    folds via dedup_cluster_components) is the recommended order at 100 TB.
    Scale: fold ids derive from the pair ids by hashing — no join back to
    the documents table; everything after pair generation shuffles a
    2-int-column frame, and the output is at most k*(k+1)/2 = 15 rows."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs, "text", "doc_id", num_hashes=16, bands=4, k=3
    )
    pf = pairs.select(
        (md5_long(F.col("id_a"), 42) % 5).alias("fa"),
        (md5_long(F.col("id_b"), 42) % 5).alias("fb"),
    ).select(
        F.least("fa", "fb").cast("int").alias("fold_lo"),
        F.greatest("fa", "fb").cast("int").alias("fold_hi"),
    )
    g = pf.groupBy("fold_lo", "fold_hi").agg(F.count(F.lit(1)).alias("n_pairs"))
    t = g.agg(F.sum("n_pairs").cast("long").alias("total"))
    return g.crossJoin(F.broadcast(t)).select(
        "fold_lo", "fold_hi",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.when(F.col("fold_lo") != F.col("fold_hi"), 1).otherwise(0)
        .cast("int")
        .alias("leak"),
        F.expr("n_pairs * 1000000 div total").alias("share_ppm"),
    )


# ---------------------------------------------------------------------------
# HLL intersection via inclusion-exclusion
# ---------------------------------------------------------------------------


@register(
    "hll_intersection_ie",
    f"""
    WITH {_HLL_REG_SQL},
    agg1 AS (SELECT event_type, count(*) AS n_present,
                    {_HLL_M} - count(*) AS v_zero,
                    CAST(sum(CAST(1 AS BIGINT) << ({_HLL_VBITS + 1} - mj))
                         AS BIGINT) AS s_present
             FROM reg GROUP BY 1),
    e1 AS (SELECT event_type, v_zero,
                  s_present + v_zero * (CAST(1 AS BIGINT) << {_HLL_VBITS + 1})
                      AS s_sum
           FROM agg1),
    r1 AS (SELECT event_type, v_zero,
                  CAST(CAST('{_HLL_NUM}' AS DECIMAL(38,0))
                       // (CAST(1000 AS DECIMAL(38,0)) * s_sum) AS BIGINT)
                      AS raw_est
           FROM e1),
    est1 AS (SELECT event_type,
                    {_hll_est_sql("raw_est", "v_zero")} AS hll_est
             FROM r1),
    pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b
              FROM (SELECT DISTINCT event_type FROM events) a
              JOIN (SELECT DISTINCT event_type FROM events) b
                ON a.event_type < b.event_type),
    ureg AS (SELECT p.type_a, p.type_b, r.bucket, max(r.mj) AS mj
             FROM pairs p JOIN reg r
               ON r.event_type = p.type_a OR r.event_type = p.type_b
             GROUP BY 1, 2, 3),
    uagg AS (SELECT type_a, type_b, {_HLL_M} - count(*) AS v_zero,
                    CAST(sum(CAST(1 AS BIGINT) << ({_HLL_VBITS + 1} - mj))
                         AS BIGINT) AS s_present
             FROM ureg GROUP BY 1, 2),
    ue AS (SELECT type_a, type_b, v_zero,
                  s_present + v_zero * (CAST(1 AS BIGINT) << {_HLL_VBITS + 1})
                      AS s_sum
           FROM uagg),
    ur AS (SELECT type_a, type_b, v_zero,
                  CAST(CAST('{_HLL_NUM}' AS DECIMAL(38,0))
                       // (CAST(1000 AS DECIMAL(38,0)) * s_sum) AS BIGINT)
                      AS raw_est
           FROM ue),
    uest AS (SELECT type_a, type_b,
                    {_hll_est_sql("raw_est", "v_zero")} AS est_union
             FROM ur),
    eu AS (SELECT DISTINCT event_type, user_id FROM events),
    xact AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                    CAST(count(*) AS BIGINT) AS exact_inter
             FROM eu a JOIN eu b
               ON a.user_id = b.user_id AND a.event_type < b.event_type
             GROUP BY 1, 2),
    f AS (SELECT u.type_a, u.type_b,
                 ea.hll_est AS est_a, eb.hll_est AS est_b, u.est_union,
                 ea.hll_est + eb.hll_est - u.est_union AS est_inter,
                 coalesce(x.exact_inter, 0) AS exact_inter
          FROM uest u
          JOIN est1 ea ON ea.event_type = u.type_a
          JOIN est1 eb ON eb.event_type = u.type_b
          LEFT JOIN xact x ON x.type_a = u.type_a AND x.type_b = u.type_b)
    SELECT type_a, type_b, est_a, est_b, est_union,
           CAST(est_inter AS BIGINT) AS est_inter, exact_inter,
           CAST(abs(est_inter - exact_inter) * 1000000
                // greatest(exact_inter, 1) AS BIGINT) AS err_ppm
    FROM f
    """,
)
def hll_intersection_ie(spark, sf_dir):
    """Pairwise audience-overlap estimate |A∩B| = est(A)+est(B)-est(A∪B)
    from the SAME m=1024 HLL register files hll_distinct_by_source builds:
    the union arm is register-wise MAX (the only exact operation HLL
    supports), so the whole overlap matrix for k sets costs k register
    files + C(k,2) register merges of m rows each — never a re-scan of the
    raw events.  Inclusion-exclusion is the textbook HLL intersection
    (Flajolet et al. 2007 have no direct intersection estimator); its
    error is relative to the UNION cardinality, so small overlaps carry
    large relative error — exactly what err_ppm vs the exact
    distinct-(user,type) self-join audit arm makes visible.  est_inter is
    intentionally signed: a negative value is the sketch saying 'overlap
    below noise floor', and clamping it would hide that.
    Scale: register files are m rows per set regardless of volume; the
    exact audit arm is fixture-only truth."""
    events = _t(spark, sf_dir, "events")
    h = events.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    r = h.select(
        "event_type",
        (F.col("h") % _HLL_M).alias("bucket"),
        F.when(F.expr(f"h div {_HLL_M}") == 0, _HLL_VBITS + 1)
        .otherwise(
            F.lit(_HLL_VBITS + 1) - F.length(F.bin(F.expr(f"h div {_HLL_M}")))
        )
        .alias("rho"),
    )
    reg = r.groupBy("event_type", "bucket").agg(F.max("rho").alias("mj"))

    def estimate(stats, out_col):
        e = stats.withColumn(
            "s_sum",
            F.col("s_present")
            + F.col("v_zero") * F.lit(1 << (_HLL_VBITS + 1)).cast("long"),
        ).withColumn(
            "raw_est",
            F.expr(
                f"cast(cast('{_HLL_NUM}' as decimal(38,0))"
                f" div (cast(1000 as decimal(38,0)) * s_sum) as bigint)"
            ),
        )
        return e.withColumn(
            out_col,
            F.expr(
                f"cast(case when v_zero > 0 and raw_est < {5 * _HLL_M // 2}"
                f" then {_HLL_M} * ({_HLL_LN_M_UNAT}"
                f" - cast(round(ln(cast(v_zero as double)) * 1000000) as bigint))"
                f" div 1000000"
                f" else raw_est end as bigint)"
            ),
        )

    s1 = reg.groupBy("event_type").agg(
        (F.lit(_HLL_M) - F.count(F.lit(1))).alias("v_zero"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_VBITS + 1} - mj)"))
        .cast("long")
        .alias("s_present"),
    )
    est1 = estimate(s1, "hll_est").select("event_type", "hll_est")

    types = events.select("event_type").distinct()
    pairs = (
        types.alias("a")
        .join(
            types.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
    )
    ureg = (
        F.broadcast(pairs)
        .join(
            reg,
            (reg["event_type"] == F.col("type_a"))
            | (reg["event_type"] == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "bucket")
        .agg(F.max("mj").alias("mj"))
    )
    us = ureg.groupBy("type_a", "type_b").agg(
        (F.lit(_HLL_M) - F.count(F.lit(1))).alias("v_zero"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_VBITS + 1} - mj)"))
        .cast("long")
        .alias("s_present"),
    )
    uest = estimate(us, "est_union").select("type_a", "type_b", "est_union")

    eu = events.select("event_type", "user_id").distinct()
    xact = (
        eu.alias("a")
        .join(
            eu.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("exact_inter"))
    )
    f = (
        uest.join(est1.withColumnRenamed("event_type", "type_a")
                  .withColumnRenamed("hll_est", "est_a"), "type_a")
        .join(est1.withColumnRenamed("event_type", "type_b")
              .withColumnRenamed("hll_est", "est_b"), "type_b")
        .join(xact, ["type_a", "type_b"], "left")
        .withColumn("exact_inter", F.coalesce("exact_inter", F.lit(0).cast("long")))
        .withColumn("est_inter", F.col("est_a") + F.col("est_b") - F.col("est_union"))
    )
    return f.select(
        "type_a", "type_b", "est_a", "est_b", "est_union",
        F.col("est_inter").cast("long").alias("est_inter"),
        "exact_inter",
        F.expr(
            "cast(abs(est_inter - exact_inter) * 1000000"
            " div greatest(exact_inter, 1) as bigint)"
        ).alias("err_ppm"),
    )


# ---------------------------------------------------------------------------
# Hard-negative mining for contrastive training
# ---------------------------------------------------------------------------


@register(
    "hard_negative_mining",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS clabel
          FROM embeddings),
    scored AS (
        SELECT q.query_id, q.qlabel, c.neighbor_id, c.clabel, {_COS_SQL} AS sim
        FROM c CROSS JOIN q WHERE c.neighbor_id <> q.query_id
    ),
    pos AS (
        SELECT query_id, neighbor_id AS pos_id, sim AS pos_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id ASC) AS pr
        FROM scored WHERE clabel = qlabel QUALIFY pr = 1
    ),
    neg AS (
        SELECT query_id, neighbor_id AS neg_id, sim AS neg_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id ASC) AS rank
        FROM scored WHERE clabel <> qlabel QUALIFY rank <= 3
    )
    SELECT n.query_id, CAST(n.rank AS INT) AS rank, n.neg_id, n.neg_sim,
           p.pos_id, p.pos_sim, n.neg_sim - p.pos_sim AS margin
    FROM neg n JOIN pos p USING (query_id)
    """,
)
def hard_negative_mining(spark, sf_dir):
    """Contrastive-training hard negatives: for each anchor vector, the 3
    most-similar DIFFERENT-label neighbors (the negatives a triplet/InfoNCE
    loss learns most from) alongside the single most-similar SAME-label
    neighbor (the positive), and the signed margin neg_sim - pos_sim — a
    positive margin flags a negative that currently outranks the positive,
    i.e. an active constraint.  Label-aware mining is the piece the plain
    similarity_brute_topk family lacks; the scoring arm reuses its exact
    broadcast-queries plan (one fold per pair via pre-hoisted norms), then
    splits into two windows over the k*|anchors| candidate rows.  The
    margin subtraction is identical-IEEE on identically rounded doubles,
    so it carries no re-rounding.  Scale: the corpus scan is shuffle-free
    (anchors broadcast); at 100 TB the scored arm swaps for one of the ANN
    tiers (similarity_ann_lsh / _ivf) with the same window tail — mining
    quality degrades gracefully with ANN recall, the plan does not change
    shape."""
    from etl_mssql_to_postgres_dailysync_spark.functions.vectors import (
        cosine_prenormed,
        norm,
    )

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
        norm(F.col("embedding")).alias("qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.col("label").alias("clabel"),
        norm(F.col("embedding")).alias("cn"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "qlabel", "neighbor_id", "clabel",
            cosine_prenormed(
                F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    pos = (
        scored.filter(F.col("clabel") == F.col("qlabel"))
        .withColumn("pr", F.row_number().over(w))
        .filter(F.col("pr") == 1)
        .select(
            "query_id",
            F.col("neighbor_id").alias("pos_id"),
            F.col("sim").alias("pos_sim"),
        )
    )
    neg = (
        scored.filter(F.col("clabel") != F.col("qlabel"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("neighbor_id").alias("neg_id"),
            F.col("sim").alias("neg_sim"),
        )
    )
    return neg.join(pos, "query_id").select(
        "query_id", "rank", "neg_id", "neg_sim", "pos_id", "pos_sim",
        (F.col("neg_sim") - F.col("pos_sim")).alias("margin"),
    )


# ---------------------------------------------------------------------------
# Sparse TF-IDF cosine pairs (weighted inverted-index join)
# ---------------------------------------------------------------------------

_TFIDF_DF_CAP = 50  # postings cap: pairs per term <= cap^2


@register(
    "tfidf_cosine_pairs",
    rf"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    kept AS (SELECT term, df FROM dfreq WHERE df BETWEEN 2 AND {_TFIDF_DF_CAP}),
    w AS (SELECT tf.doc_id, tf.term,
                 tf.tf * CAST(round(ln(CAST(n.n_docs AS DOUBLE) / kept.df) * 1000)
                              AS BIGINT) AS w
          FROM tf JOIN kept USING (term) CROSS JOIN n),
    norms AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS n2 FROM w GROUP BY 1),
    dots AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(sum(a.w * b.w) AS BIGINT) AS dot,
               CAST(count(*) AS BIGINT) AS n_common
        FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, dot, n_common,
           round(dot / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 6)
               AS cos_sim
    FROM dots JOIN norms na ON na.doc_id = id_a JOIN norms nb ON nb.doc_id = id_b
    WHERE round(dot / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 6)
          >= 0.25
    """,
)
def tfidf_cosine_pairs(spark, sf_dir):
    """Weighted near-duplicate detection: document-pair cosine over sparse
    TF-IDF vectors, computed as a SPARSE MATRIX PRODUCT through the
    inverted index — postings self-join on term, partial products summed
    per pair — never a dense pairwise loop.  Complements the unweighted
    Jaccard family (dedup_ngram_jaccard): TF-IDF cosine keys on RARE
    shared vocabulary, so it catches topically-identical rewrites that
    share few exact shingles.  The vector space is restricted to terms
    with df in [2, {_TFIDF_DF_CAP}] (the standard stop-term cut): df=1
    terms cannot produce a pair, and high-df terms would blow the postings
    self-join up by df^2 while contributing ~zero idf weight — the cap is
    what bounds join fan-out at 100 TB (pairs per term <= cap^2), the
    sparse analogue of dedup_ngram_jaccard_capped's shingle cap.  Integer
    weights (tf x milli-nat idf) keep dot/norm sums exact int64
    (w <= 2e7 per posting -> norm^2 <= ~1e18 at 2k-term docs; DECIMAL(38)
    beyond); the only doubles are the final rounded cosine, identical IEEE
    on both engines."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(text.tokens(F.lower(F.col("text")))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    kept = dfreq.filter(F.col("df").between(2, _TFIDF_DF_CAP))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (
        tf.join(kept, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "term",
            (
                F.col("tf")
                * F.expr(
                    "cast(round(ln(cast(n_docs as double) / df) * 1000) as bigint)"
                )
            ).alias("w"),
        )
    )
    norms = w.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).cast("long").alias("n2"))
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(
            F.sum(F.col("a.w") * F.col("b.w")).cast("long").alias("dot"),
            F.count(F.lit(1)).cast("long").alias("n_common"),
        )
    )
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("n2").alias("nb2"))
    out = (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "cos_sim",
            F.round(
                F.col("dot")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                ),
                6,
            ),
        )
        .filter(F.col("cos_sim") >= 0.25)
    )
    return out.select("id_a", "id_b", "dot", "n_common", "cos_sim")


# ---------------------------------------------------------------------------
# PCA top component via staged-integer power iteration
# ---------------------------------------------------------------------------

_PCA_ITERS = 4
_PCA_SCALE = 1_000_000  # eigvec components held at 1e6 fixed point
_PCA_OFF = 2_000_000    # offset making every rescale operand non-negative


def _pca_oracle_sql() -> str:
    """Unrolled power-iteration CTE chain, one it{t} per iteration, each a
    matvec over the full second-moment matrix followed by a max-abs integer
    rescale (the +OFF trick keeps Spark div == DuckDB // on negatives)."""
    its = ["v0 AS (SELECT unnest(range(1, 65)) AS j, CAST(1000000 AS BIGINT) AS v)"]
    prev = "v0"
    for t in range(1, _PCA_ITERS + 1):
        its.append(f"""
    w{t} AS (SELECT s.i AS j, sum(CAST(s.s_unit AS HUGEINT) * v.v) AS w
             FROM smat s JOIN {prev} v ON v.j = s.j GROUP BY 1),
    m{t} AS (SELECT max(abs(w)) AS mx FROM w{t}),
    v{t} AS (SELECT w{t}.j,
                    CAST((w{t}.w * {_PCA_SCALE} + CAST({_PCA_OFF} AS HUGEINT) * m{t}.mx)
                         // m{t}.mx - {_PCA_OFF} AS BIGINT) AS v
             FROM w{t} CROSS JOIN m{t})""")
        prev = f"v{t}"
    return f"""
    WITH e AS (SELECT vec_id, embedding, unnest(range(1, len(embedding) + 1)) AS i
               FROM embeddings),
    u AS (SELECT vec_id, CAST(i AS INT) AS i,
                 CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS m
          FROM e),
    n AS (SELECT count(DISTINCT vec_id) AS n FROM u),
    up AS (SELECT a.i AS i, b.i AS j, sum(a.m * b.m) AS sxy
           FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
           GROUP BY 1, 2),
    fullm AS (SELECT i, j, sxy FROM up
              UNION ALL
              SELECT j AS i, i AS j, sxy FROM up WHERE i < j),
    smat AS (SELECT i, j,
                    CAST((sxy + CAST({_COV_OFFSET} AS HUGEINT) * n.n) // n.n
                         - {_COV_OFFSET} AS BIGINT) AS s_unit
             FROM fullm CROSS JOIN n),
    {",".join(its)},
    sgn AS (SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS sg
            FROM {prev} ORDER BY abs(v) DESC, j ASC LIMIT 1),
    vf AS (SELECT j, v * sgn.sg AS v FROM {prev} CROSS JOIN sgn),
    num AS (SELECT sum(CAST(s.s_unit AS HUGEINT) * a.v * b.v) AS vsv
            FROM smat s JOIN vf a ON a.j = s.i JOIN vf b ON b.j = s.j),
    den AS (SELECT CAST(sum(v * v) AS BIGINT) AS vv FROM vf),
    tr AS (SELECT CAST(sum(s_unit) AS BIGINT) AS trace_unit FROM smat WHERE i = j),
    lam AS (SELECT CAST(num.vsv // den.vv AS BIGINT) AS lambda_unit
            FROM num CROSS JOIN den)
    SELECT CAST(vf.j AS INT) AS dim_i, CAST(vf.v AS BIGINT) AS v_unit,
           lam.lambda_unit, tr.trace_unit,
           CAST(lam.lambda_unit * 1000000 // tr.trace_unit AS BIGINT) AS share_ppm
    FROM vf CROSS JOIN lam CROSS JOIN tr
    """


@register("pca_power_iteration", _pca_oracle_sql())
def pca_power_iteration(spark, sf_dir):
    """Dominant principal direction of the embedding corpus by POWER
    ITERATION on the d x d second-moment matrix S = (1/n) sum(m m^T) —
    the spectral audit behind anisotropy checks (a corpus whose top
    component eats most of the trace collapses cosine geometry; see
    share_ppm).  Everything runs distributed and integer-exact: S is the
    same micro^2 one-shuffle build as embedding_covariance_topk (per-row
    upper-triangle products, mirrored to full), and each of the
    {_PCA_ITERS} matvecs is a 64-row broadcast join against the 4096-cell
    matrix followed by a max-abs rescale to 1e6 fixed point with the +OFF
    floor-alignment trick — a staged-integer iteration both engines replay
    bit-for-bit (the DuckDB twin is the unrolled CTE chain), sidestepping
    IEEE summation-order divergence entirely.  The corpus appears ONLY in
    the S build; iteration state is d rows, so 100x more vectors changes
    nothing after the first shuffle.  Sign is normalized so the
    largest-|component| entry is positive; lambda (Rayleigh quotient
    v^T S v / v^T v, integer) over trace(S) gives the top component's
    variance share in ppm.  lambda is a LOWER bound on the true top
    eigenvalue, tightening as (lambda2/lambda1)^2t — on a near-isotropic
    corpus the gap is small and 4 iterations land ~85% of lambda_1, which
    is fine for the audit: a small share_ppm IS the isotropy verdict, and
    an anisotropic corpus (large gap) is exactly where the iteration
    converges fast.  The oracle's big-integer arithmetic rides HUGEINT,
    not DECIMAL(38): DuckDB's ``//`` on DECIMAL silently degrades to
    DOUBLE division (observed: off-by-30 at 1e16 operands), HUGEINT stays
    exact.  Uncentered by design: on unit-normalized
    embedding batches the mean-shift is a rank-1 update the iteration
    absorbs, and keeping S as a pure sum makes per-partition matrices
    mergeable by addition (the streaming path)."""
    emb = _t(spark, sf_dir, "embeddings")
    m = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000000) as bigint))"
        ).alias("m"),
    )
    n = m.agg(F.count(F.lit(1)).alias("n"))
    up = m.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, size(m)), i ->"
                " transform(sequence(i, size(m)), j ->"
                " struct(i, j, element_at(m, i) * element_at(m, j) as xy))))"
            )
        ).alias("p")
    ).select(
        F.col("p.i").cast("int").alias("i"),
        F.col("p.j").cast("int").alias("j"),
        F.col("p.xy").alias("xy"),
    )
    upsum = up.groupBy("i", "j").agg(F.sum("xy").alias("sxy"))
    fullm = upsum.unionByName(
        upsum.filter(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "sxy"
        )
    )
    smat = fullm.crossJoin(F.broadcast(n)).select(
        "i", "j",
        F.expr(
            f"cast((sxy + cast({_COV_OFFSET} as decimal(38,0)) * n) div n"
            f" - {_COV_OFFSET} as bigint)"
        ).alias("s_unit"),
    )
    smat = smat.localCheckpoint()  # S is 4096 rows; pin it so the 4 matvecs
    # and the Rayleigh arm reuse one materialization instead of re-running
    # the corpus shuffle per iteration
    v = spark.range(1, 65).select(
        F.col("id").cast("int").alias("j"),
        F.lit(_PCA_SCALE).cast("long").alias("v"),
    )
    for _ in range(_PCA_ITERS):
        w = (
            smat.join(F.broadcast(v), smat["j"] == v["j"])
            .groupBy(smat["i"].alias("wj"))
            .agg(
                F.sum(F.expr("cast(s_unit as decimal(38,0)) * v")).alias("w")
            )
        )
        mx = w.agg(F.max(F.abs(F.col("w"))).alias("mx"))
        v = (
            w.crossJoin(F.broadcast(mx))
            .select(
                F.col("wj").alias("j"),
                F.expr(
                    f"cast((w * {_PCA_SCALE} + cast({_PCA_OFF} as decimal(38,0)) * mx)"
                    f" div mx - {_PCA_OFF} as bigint)"
                ).alias("v"),
            )
        )
    sgn = (
        v.orderBy(F.abs(F.col("v")).desc(), F.col("j").asc())
        .limit(1)
        .select(F.when(F.col("v") < 0, -1).otherwise(1).alias("sg"))
    )
    vf = v.crossJoin(F.broadcast(sgn)).select(
        "j", (F.col("v") * F.col("sg")).alias("v")
    )
    vf = vf.localCheckpoint()  # consumed by num, den, and the output spine
    va = vf.select(F.col("j").alias("ja"), F.col("v").alias("va"))
    vb = vf.select(F.col("j").alias("jb"), F.col("v").alias("vb"))
    num = (
        smat.join(F.broadcast(va), smat["i"] == va["ja"])
        .join(F.broadcast(vb), smat["j"] == vb["jb"])
        .agg(F.sum(F.expr("cast(s_unit as decimal(38,0)) * va * vb")).alias("vsv"))
    )
    den = vf.agg(F.sum(F.col("v") * F.col("v")).cast("long").alias("vv"))
    tr = smat.filter(F.col("i") == F.col("j")).agg(
        F.sum("s_unit").cast("long").alias("trace_unit")
    )
    lam = num.crossJoin(F.broadcast(den)).select(
        F.expr("cast(vsv div vv as bigint)").alias("lambda_unit")
    )
    return (
        vf.crossJoin(F.broadcast(lam))
        .crossJoin(F.broadcast(tr))
        .select(
            F.col("j").cast("int").alias("dim_i"),
            F.col("v").cast("long").alias("v_unit"),
            "lambda_unit",
            "trace_unit",
            F.expr("cast(lambda_unit * 1000000 div trace_unit as bigint)").alias(
                "share_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# HDR-style log-linear quantile sketch
# ---------------------------------------------------------------------------

_HDR_B = 7  # sub-bucket bits: relative error <= 1/2^7 = 0.78%
_HDR_PCTS = [50, 90, 95, 99]


@register(
    "hdr_quantile_sketch",
    f"""
    WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
    b AS (SELECT cents, length(bin(cents)) - 1 AS msb FROM c),
    i AS (SELECT CASE WHEN cents < 128 THEN cents
                      ELSE msb * 128 + (cents >> (msb - 7)) - 128 END AS idx
          FROM b),
    g AS (SELECT idx, count(*) AS n_rows FROM i GROUP BY 1),
    cum AS (SELECT idx, n_rows, sum(n_rows) OVER (ORDER BY idx) AS cum,
                   (SELECT count(*) FROM c) AS n
            FROM g),
    p AS (SELECT unnest([{", ".join(map(str, _HDR_PCTS))}]) AS pct),
    chosen AS (SELECT p.pct, min(cum.idx) AS idx
               FROM p JOIN cum ON cum.cum >= (p.pct * cum.n + 99) // 100
               GROUP BY 1),
    bounds AS (SELECT pct, idx,
                      CASE WHEN idx < 128 THEN idx
                           ELSE (128 + idx % 128) << (idx // 128 - 7) END AS lo_cents,
                      CASE WHEN idx < 128 THEN idx
                           ELSE ((128 + idx % 128) << (idx // 128 - 7))
                                + (CAST(1 AS BIGINT) << (idx // 128 - 7)) - 1
                      END AS hi_cents
               FROM chosen),
    r AS (SELECT cents, row_number() OVER (ORDER BY cents ASC) AS rn,
                 count(*) OVER () AS n
          FROM c),
    x AS (SELECT p.pct, r.cents AS exact_cents
          FROM r JOIN p ON r.rn = (p.pct * r.n + 99) // 100)
    SELECT CAST(b.pct AS INT) AS pct, CAST(b.idx AS BIGINT) AS bucket_idx,
           CAST(b.lo_cents AS BIGINT) AS lo_cents,
           CAST(b.hi_cents AS BIGINT) AS hi_cents,
           CAST((b.lo_cents + b.hi_cents) // 2 AS BIGINT) AS est_cents,
           x.exact_cents,
           CAST(abs((b.lo_cents + b.hi_cents) // 2 - x.exact_cents) * 1000000
                // x.exact_cents AS BIGINT) AS rel_err_ppm
    FROM bounds b JOIN x ON x.pct = b.pct
    """,
)
def hdr_quantile_sketch(spark, sf_dir):
    """One-pass mergeable quantiles with a GUARANTEED relative-error bound,
    HdrHistogram-style: values bucket into log-linear cells — exact below
    2^{_HDR_B}, else (msb << {_HDR_B}) | top-{_HDR_B}-bits-after-leading-1 —
    so every cell spans < 1/2^{_HDR_B} = 0.78% of its lower bound.  The
    bucketing uses ONLY bit arithmetic on exact cents (msb via the same
    length(bin(x)) trick as the HLL rho), never ln(): no float boundary can
    ever disagree between engines, unlike log-gamma DDSketch bucketing.
    The sketch state is the (idx, count) frame — bounded by ~128 cells per
    octave regardless of data volume, mergeable across partitions/days by
    plain count addition, and quantile lookup is a cumulative sum over
    bucket grain.  The chosen cell provably CONTAINS the exact
    ceil-rank percentile value (same rank rule on both arms), so
    exact_cents in [lo_cents, hi_cents] always, and rel_err_ppm of the
    midpoint estimate is bounded by ~3906 ppm — pytest pins both.  The
    exact arm rides the distributed two-phase rank (exact_percentiles'
    plan) as the fixture-scale truth column; at 100 TB only the sketch arm
    runs."""
    from etl_mssql_to_postgres_dailysync_spark.operators.cumsum import (
        global_row_number,
    )

    orders = _t(spark, sf_dir, "orders")
    c = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    i = c.select(
        F.expr(
            "case when cents < 128 then cents"
            " else (length(bin(cents)) - 1) * 128"
            "      + shiftright(cents, length(bin(cents)) - 1 - 7) - 128 end"
        ).alias("idx")
    )
    g = i.groupBy("idx").agg(F.count(F.lit(1)).alias("n_rows"))
    wcum = Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
    n_total = c.agg(F.count(F.lit(1)).alias("n"))
    cum = (
        g.withColumn("cum", F.sum("n_rows").over(wcum))
        .crossJoin(F.broadcast(n_total))
    )
    pts = spark.createDataFrame([(p,) for p in _HDR_PCTS], "pct int")
    chosen = (
        cum.join(
            F.broadcast(pts),
            F.col("cum") >= F.expr("(pct * n + 99) div 100"),
        )
        .groupBy("pct")
        .agg(F.min("idx").alias("idx"))
    )
    bounds = chosen.select(
        "pct", "idx",
        F.expr(
            "case when idx < 128 then idx"
            " else shiftleft(128 + idx % 128, idx div 128 - 7) end"
        ).alias("lo_cents"),
        F.expr(
            "case when idx < 128 then idx"
            " else shiftleft(128 + idx % 128, idx div 128 - 7)"
            "      + shiftleft(cast(1 as bigint), idx div 128 - 7) - 1 end"
        ).alias("hi_cents"),
    )
    ranked, total = global_row_number(c, ["cents"], "rn")
    spine = spark.createDataFrame(
        [(p, (p * total + 99) // 100) for p in _HDR_PCTS], "pct int, at_rank long"
    )
    x = (
        ranked.join(F.broadcast(spine), ranked["rn"] == spine["at_rank"])
        .select("pct", F.col("cents").alias("exact_cents"))
    )
    return (
        bounds.join(x, "pct")
        .select(
            F.col("pct").cast("int").alias("pct"),
            F.col("idx").cast("long").alias("bucket_idx"),
            F.col("lo_cents").cast("long").alias("lo_cents"),
            F.col("hi_cents").cast("long").alias("hi_cents"),
            F.expr("cast((lo_cents + hi_cents) div 2 as bigint)").alias("est_cents"),
            "exact_cents",
            F.expr(
                "cast(abs((lo_cents + hi_cents) div 2 - exact_cents) * 1000000"
                " div exact_cents as bigint)"
            ).alias("rel_err_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Rank statistics: Mann-Whitney AUC (label separability of a score column)
# ---------------------------------------------------------------------------

@register(
    "mann_whitney_auc",
    """
    WITH v AS (
      SELECT o_orderpriority AS priority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
      FROM orders),
    g AS (
      SELECT priority, cents, count(*) AS cnt, sum(pos) AS n_pos
      FROM v GROUP BY 1, 2),
    r AS (
      SELECT priority, cents, cnt, n_pos,
             sum(cnt) OVER (PARTITION BY priority ORDER BY cents
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - cnt AS cum_less
      FROM g),
    s AS (
      SELECT priority,
             CAST(sum(n_pos * (2 * cum_less + cnt + 1)) AS BIGINT) AS s2,
             CAST(sum(n_pos) AS BIGINT) AS n1,
             CAST(sum(cnt) - sum(n_pos) AS BIGINT) AS n0
      FROM r GROUP BY 1)
    SELECT priority, n1 AS n_pos, n0 AS n_neg,
           CAST(s2 - n1 * (n1 + 1) AS BIGINT) AS u2_stat,
           CAST((s2 - n1 * (n1 + 1)) * 500000 // (n1 * n0) AS BIGINT) AS auc_ppm
    FROM s
    """,
)
def mann_whitney_auc(spark, sf_dir):
    """Mann-Whitney U / ROC-AUC of a score column against a binary label,
    per segment — the standard "does this quality score actually separate
    the classes" eval for any classifier-driven curation filter (quality
    model, dup predictor, lang-id confidence).

    Rank-free distributed shape: instead of ranking N rows, aggregate to
    (segment, score)-grain counts (the score domain is integer cents —
    bounded by the price domain, NOT by data volume), then one partitioned
    cumulative window over that value grain yields each distinct score's
    tie-averaged rank in closed form: avg_rank = cum_less + (cnt+1)/2,
    carried as the integer 2*avg_rank = 2*cum_less + cnt + 1 so ties never
    produce a fraction. U = R1 - n1(n1+1)/2 follows from the rank-sum
    identity; auc_ppm = U/(n1*n0) in ppm via the integer-staged
    (s2 - n1(n1+1)) * 500000 div (n1*n0) — identical floor-div arithmetic
    on both engines, no doubles anywhere.

    Scale: the only shuffles are the value-grain groupBy (map-side
    combined) and a window partitioned by segment over the bounded score
    domain. At 100 TB the window input is |segments| x |distinct cents|
    rows regardless of row count. AUC = P(score_pos > score_neg) +
    0.5*P(tie) — pytest pins this against brute-force pair counting.
    Reference surface: extends the validate.py count reconciliation
    (dags/mssql_to_postgresql_orders_daily.py:530-584) to a ranked metric."""
    orders = _t(spark, sf_dir, "orders")
    v = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.when(F.col("o_orderstatus") == "F", F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("pos"),
    )
    g = v.groupBy("priority", "cents").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("pos").alias("n_pos")
    )
    w = (
        Window.partitionBy("priority")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = g.withColumn("cum_less", F.sum("cnt").over(w) - F.col("cnt"))
    s = r.groupBy("priority").agg(
        F.sum(
            F.col("n_pos") * (2 * F.col("cum_less") + F.col("cnt") + 1)
        ).alias("s2"),
        F.sum("n_pos").alias("n1"),
        (F.sum("cnt") - F.sum("n_pos")).alias("n0"),
    )
    return s.select(
        "priority",
        F.col("n1").cast("long").alias("n_pos"),
        F.col("n0").cast("long").alias("n_neg"),
        F.expr("cast(s2 - n1 * (n1 + 1) as bigint)").alias("u2_stat"),
        F.expr(
            "cast((s2 - n1 * (n1 + 1)) * 500000 div (n1 * n0) as bigint)"
        ).alias("auc_ppm"),
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov distribution-drift test
# ---------------------------------------------------------------------------

@register(
    "ks_two_sample",
    """
    WITH v AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END
               AS grp
      FROM orders),
    g AS (
      SELECT cents,
             CAST(sum(grp) AS BIGINT) AS c1,
             CAST(count(*) - sum(grp) AS BIGINT) AS c0
      FROM v GROUP BY 1),
    cum AS (
      SELECT cents,
             sum(c1) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum1,
             sum(c0) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum0,
             (SELECT CAST(sum(grp) AS BIGINT) FROM v) AS n1,
             (SELECT CAST(count(*) - sum(grp) AS BIGINT) FROM v) AS n0
      FROM g),
    d AS (
      SELECT cents, abs(cum1 * n0 - cum0 * n1) AS cross_gap, n1, n0 FROM cum),
    best AS (
      SELECT CAST(max(cross_gap) AS BIGINT) AS max_gap,
             CAST(min(CASE WHEN cross_gap = (SELECT max(cross_gap) FROM d)
                           THEN cents END) AS BIGINT) AS at_cents,
             CAST(max(n1) AS BIGINT) AS n1, CAST(max(n0) AS BIGINT) AS n0
      FROM d),
    scored AS (
      SELECT n1, n0, at_cents,
             CAST(max_gap * 1000000 // (n1 * n0) AS BIGINT) AS ks_ppm,
             CAST(CAST(1844200000000 AS BIGINT) * (n1 + n0) // (n1 * n0)
                  AS BIGINT) AS thr_ppm2
      FROM best)
    SELECT n1 AS n_a, n0 AS n_b, ks_ppm, at_cents,
           CAST(CASE WHEN ks_ppm * ks_ppm > thr_ppm2 THEN 1 ELSE 0 END AS INT)
             AS reject_95
    FROM scored
    """,
)
def ks_two_sample(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov statistic between the price
    distributions of two order segments — the canonical nonparametric
    drift detector for "did this source's distribution shift" checks on a
    training corpus (complements drift_psi's binned form and
    source_kl_divergence's parametric form with the sup-norm ECDF test).

    Distributed shape: aggregate to score-grain counts per group (bounded
    by the integer cents domain, not row count), one global cumulative
    window over that aggregated grain (sits above a HashAggregate, so the
    plan-sweep bounding proof applies), then
    D = max |F1(x) - F2(x)| = max |cum1*n0 - cum0*n1| / (n1*n0) held as an
    exact integer cross product until the final ppm division. at_cents
    reports the argmax location (min cents among ties — deterministic).

    reject_95: the large-sample KS critical value c(0.05)=1.358*sqrt((n1+n0)
    /(n1*n0)) is applied with NO sqrt by comparing squares in ppm^2 space:
    reject iff ks_ppm^2 > 1.8442e12*(n1+n0)/(n1*n0), the right side staged
    as the exact integer 1844200000000*(n1+n0) div (n1*n0) (fits bigint for
    any realistic n; the floor loses <1 ppm^2 and floors identically on
    both engines).

    At 100 TB: two shuffles (value-grain groupBy with map-side combine,
    then the single-partition window over <=|price domain| aggregated
    rows); nothing scales with raw row count."""
    orders = _t(spark, sf_dir, "orders")
    v = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("grp"),
    )
    g = v.groupBy("cents").agg(
        F.sum("grp").alias("c1"),
        (F.count(F.lit(1)) - F.sum("grp")).alias("c0"),
    )
    totals = v.agg(
        F.sum("grp").cast("bigint").alias("n1"),
        (F.count(F.lit(1)) - F.sum("grp")).cast("bigint").alias("n0"),
    )
    wcum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        g.withColumn("cum1", F.sum("c1").over(wcum))
        .withColumn("cum0", F.sum("c0").over(wcum))
        .crossJoin(F.broadcast(totals))
    )
    d = cum.select(
        "cents",
        F.expr("abs(cum1 * n0 - cum0 * n1)").alias("cross_gap"),
        "n1",
        "n0",
    )
    best = d.agg(
        F.max(F.struct(F.col("cross_gap"), (-F.col("cents")).alias("neg_cents")))
        .alias("top"),
        F.max("n1").cast("bigint").alias("n1"),
        F.max("n0").cast("bigint").alias("n0"),
    ).select(
        F.col("top.cross_gap").cast("bigint").alias("max_gap"),
        (-F.col("top.neg_cents")).cast("bigint").alias("at_cents"),
        "n1",
        "n0",
    )
    scored = best.select(
        "n1",
        "n0",
        "at_cents",
        F.expr("cast(max_gap * 1000000 div (n1 * n0) as bigint)").alias("ks_ppm"),
        F.expr(
            "cast(cast(1844200000000 as bigint) * (n1 + n0) div (n1 * n0) as bigint)"
        ).alias("thr_ppm2"),
    )
    return scored.select(
        F.col("n1").alias("n_a"),
        F.col("n0").alias("n_b"),
        "ks_ppm",
        "at_cents",
        F.expr(
            "cast(case when ks_ppm * ks_ppm > thr_ppm2 then 1 else 0 end as int)"
        ).alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation (tie-averaged ranks, exact integer statistics)
# ---------------------------------------------------------------------------

@register(
    "spearman_rank_corr",
    """
    WITH base AS (
      SELECT o.o_orderkey,
             CAST(count(*) AS BIGINT) AS x,
             CAST(round(max(o.o_totalprice) * 100) AS BIGINT) AS y,
             CAST(round(max(o.o_totalprice)) AS BIGINT) AS yd
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey),
    n_t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
    xg AS (SELECT x, count(*) AS cnt FROM base GROUP BY 1),
    xr AS (SELECT x, 2 * sum(cnt) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) - cnt + 1 AS r2x
           FROM xg),
    yg AS (SELECT y, count(*) AS cnt FROM base GROUP BY 1),
    yr AS (SELECT y, 2 * sum(cnt) OVER (ORDER BY y ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) - cnt + 1 AS r2y
           FROM yg),
    c AS (
      SELECT CAST(xr.r2x - (n_t.n + 1) AS BIGINT) AS cx,
             CAST(yr.r2y - (n_t.n + 1) AS BIGINT) AS cy,
             base.x, base.yd
      FROM base JOIN xr USING (x) JOIN yr USING (y) CROSS JOIN n_t),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cx * cy) AS BIGINT) AS sxy,
             CAST(sum(cx * cx) AS BIGINT) AS sxx,
             CAST(sum(cy * cy) AS BIGINT) AS syy,
             CAST(sum(x) AS BIGINT) AS rsx, CAST(sum(yd) AS BIGINT) AS rsy,
             CAST(sum(x * x) AS BIGINT) AS rsxx,
             CAST(sum(yd * yd) AS BIGINT) AS rsyy,
             CAST(sum(x * yd) AS BIGINT) AS rsxy
      FROM c)
    SELECT n,
           round(CAST(sxy AS DOUBLE) /
                 (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE))), 6)
             AS spearman_rho,
           round((CAST(n AS DOUBLE) * rsxy - CAST(rsx AS DOUBLE) * rsy) /
                 (sqrt(CAST(n AS DOUBLE) * rsxx - CAST(rsx AS DOUBLE) * rsx) *
                  sqrt(CAST(n AS DOUBLE) * rsyy - CAST(rsy AS DOUBLE) * rsy)), 6)
             AS pearson_r
    FROM s
    """,
)
def spearman_rank_corr(spark, sf_dir):
    """Spearman rank correlation between order size (line count) and order
    value — the robust monotone-association measure for heavy-tailed
    pipeline signals (doc length vs quality, dup count vs perplexity)
    where Pearson is dominated by outliers; emitted next to Pearson on the
    raw values so the rank-vs-linear gap is visible in one row.

    With ties, rho = Pearson on tie-averaged ranks. Rank assignment is
    rank-free at data grain: each DISTINCT value's tie-averaged rank comes
    from one cumulative window over the value-grain aggregate (bounded by
    the domain, not the row count), carried as the integer
    2*avg_rank = 2*cum - cnt + 1, then joined back. Centering by the known
    mean rank (n+1 in doubled units) keeps every sufficient statistic an
    EXACT bigint (|c| <= n so sums bound by n^3 — fine to sf~1-scale; the
    mergeable-sums form is what a 100 TB rollup would keep); the final
    rho = sxy/(sqrt(sxx)*sqrt(syy)) is one fixed IEEE expression rounded
    to 6dp on both engines, same convention as manual_corr_stats. The raw
    Pearson arm uses whole-dollar values (Pearson is scale-invariant;
    cents^2 sums would overflow int64 — caught by the oracle's HUGEINT
    promotion, exactly the divergence class the staging conventions
    exist to prevent).

    Shuffles: the orders-lineitem groupBy, two value-grain aggs + two
    broadcast-sized rank joins, one scalar agg. No data-grain windows."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    base = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("x"),
            F.round(F.max("o_totalprice") * 100).cast("bigint").alias("y"),
            F.round(F.max("o_totalprice")).cast("bigint").alias("yd"),
        )
    )
    n_t = base.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wx = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    xr = (
        base.groupBy("x")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("x", (2 * F.sum("cnt").over(wx) - F.col("cnt") + 1).alias("r2x"))
    )
    wy = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, 0)
    yr = (
        base.groupBy("y")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("y", (2 * F.sum("cnt").over(wy) - F.col("cnt") + 1).alias("r2y"))
    )
    c = (
        base.join(xr, "x")
        .join(yr, "y")
        .crossJoin(F.broadcast(n_t))
        .select(
            (F.col("r2x") - (F.col("n") + 1)).cast("bigint").alias("cx"),
            (F.col("r2y") - (F.col("n") + 1)).cast("bigint").alias("cy"),
            "x",
            "yd",
        )
    )
    s = c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("cx") * F.col("cy")).cast("bigint").alias("sxy"),
        F.sum(F.col("cx") * F.col("cx")).cast("bigint").alias("sxx"),
        F.sum(F.col("cy") * F.col("cy")).cast("bigint").alias("syy"),
        F.sum("x").cast("bigint").alias("rsx"),
        F.sum("yd").cast("bigint").alias("rsy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("rsxx"),
        F.sum(F.col("yd") * F.col("yd")).cast("bigint").alias("rsyy"),
        F.sum(F.col("x") * F.col("yd")).cast("bigint").alias("rsxy"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        "n",
        F.round(
            F.col("sxy").cast("double")
            / (F.sqrt(F.col("sxx").cast("double")) * F.sqrt(F.col("syy").cast("double"))),
            6,
        ).alias("spearman_rho"),
        F.round(
            (nd * F.col("rsxy") - F.col("rsx").cast("double") * F.col("rsy"))
            / (
                F.sqrt(nd * F.col("rsxx") - F.col("rsx").cast("double") * F.col("rsx"))
                * F.sqrt(nd * F.col("rsyy") - F.col("rsy").cast("double") * F.col("rsy"))
            ),
            6,
        ).alias("pearson_r"),
    )

# ---------------------------------------------------------------------------
# Market-basket association rules (frequent pairs: support/confidence/lift)
# ---------------------------------------------------------------------------

@register(
    "frequent_itemset_pairs",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem),
    n_b AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n FROM items),
    cnt AS (SELECT item, CAST(count(*) AS BIGINT) AS c FROM items GROUP BY 1),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b,
             CAST(count(*) AS BIGINT) AS pair_baskets
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= 2),
    scored AS (
      SELECT p.item_a, p.item_b, p.pair_baskets,
             ca.c AS n_a, cb.c AS n_b,
             CAST(p.pair_baskets * 1000000 // n_t.n AS BIGINT) AS support_ppm,
             CAST(p.pair_baskets * 1000000 // ca.c AS BIGINT) AS conf_ab_ppm,
             CAST(p.pair_baskets * n_t.n * 1000000 // (ca.c * cb.c) AS BIGINT)
               AS lift_ppm
      FROM pairs p
      JOIN cnt ca ON ca.item = p.item_a
      JOIN cnt cb ON cb.item = p.item_b
      CROSS JOIN n_b n_t)
    SELECT * FROM scored
    ORDER BY lift_ppm DESC, pair_baskets DESC, item_a ASC, item_b ASC
    LIMIT 100
    """,
)
def frequent_itemset_pairs(spark, sf_dir):
    """Frequent-pair association rules over order baskets (the map-side
    half of distributed Apriori/FP-growth): per-pair support, directional
    confidence, and lift, all exact integer ppm. The pipeline analogue is
    co-occurrence mining over tag/domain/token baskets when curating a
    training mixture.

    Scale shape: baskets are DISTINCT (orderkey, partkey) pairs; pair
    generation is a self-equi-join ON basket, so candidates are bounded by
    sum(basket_size^2) with TPC-H basket size <= 7 — per-basket quadratic,
    never corpus-quadratic (the standard basket-bounded market-basket
    design; skewed mega-baskets would be capped upstream the way
    dedup_ngram_jaccard_capped caps posting lists). Item counts join back
    at pair grain (item-dimension-sized; AQE broadcasts them when they
    fit and shuffles when the catalog is huge — not forced); the basket
    total is a one-row broadcast. min-support HAVING prunes the long tail before
    the scoring joins. Top-100 by lift is a TakeOrdered, no global sort.
    (lift_ppm's pair*n*1e6 product overflows int64 only past ~9e18 — i.e.
    pair_baskets*n > 9e12, ~3e6 baskets with a 3e6-basket pair; switch the
    lift numerator to DECIMAL(38) beyond that.)"""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    n_b = items.agg(F.countDistinct("basket").cast("bigint").alias("n"))
    cnt = items.groupBy("item").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(b, (F.col("a.basket") == F.col("b.basket"))
               & (F.col("a.item") < F.col("b.item")))
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_baskets"))
        .filter(F.col("pair_baskets") >= 2)
    )
    scored = (
        # item counts are item-dimension-sized: small enough for AQE to
        # broadcast at any realistic catalog, but not FORCED — at extreme
        # item cardinality these degrade gracefully to shuffle joins
        pairs.join(cnt.withColumnRenamed("item", "item_a")
                   .withColumnRenamed("c", "n_a"), "item_a")
        .join(cnt.withColumnRenamed("item", "item_b")
              .withColumnRenamed("c", "n_b"), "item_b")
        .crossJoin(F.broadcast(n_b))
        .select(
            "item_a", "item_b", "pair_baskets", "n_a", "n_b",
            F.expr("pair_baskets * 1000000 div n").alias("support_ppm"),
            F.expr("pair_baskets * 1000000 div n_a").alias("conf_ab_ppm"),
            F.expr("pair_baskets * n * 1000000 div (n_a * n_b)").alias("lift_ppm"),
        )
    )
    return scored.orderBy(
        F.col("lift_ppm").desc(), F.col("pair_baskets").desc(),
        F.col("item_a").asc(), F.col("item_b").asc(),
    ).limit(100)


# ---------------------------------------------------------------------------
# Lag-k autocorrelation + Durbin-Watson over the daily revenue series
# ---------------------------------------------------------------------------

_ACF_EXPR = (
    "round((CAST(ck AS DOUBLE) - CAST(s AS DOUBLE) / n * (pk + qk)"
    " + (CAST(n AS DOUBLE) - lag) * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))"
    " / (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n), 6)"
)
_DW_EXPR = (
    "round(CAST(dk AS DOUBLE)"
    " / (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n), 6)"
)


@register(
    "acf_durbin_watson",
    f"""
    WITH day_rev AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100 AS BIGINT)
               AS x
      FROM orders GROUP BY 1),
    series AS (SELECT row_number() OVER (ORDER BY d) AS t, x FROM day_rev),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
                   CAST(sum(x * x) AS BIGINT) AS ss
            FROM series),
    ks AS (SELECT unnest(generate_series(1, 7)) AS lag),
    lagged AS (
      SELECT k.lag, a.x AS xa, b.x AS xb
      FROM series a JOIN ks k ON true
      JOIN series b ON b.t = a.t + k.lag),
    per AS (
      SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(xa * xb) AS BIGINT) AS ck,
             CAST(sum(xa) AS BIGINT) AS pk, CAST(sum(xb) AS BIGINT) AS qk,
             CAST(sum((xb - xa) * (xb - xa)) AS BIGINT) AS dk
      FROM lagged GROUP BY 1)
    SELECT CAST(lag AS INT) AS lag, n_pairs,
           {_ACF_EXPR} AS acf,
           {_DW_EXPR} AS dw
    FROM per CROSS JOIN tot
    ORDER BY lag
    """,
)
def acf_durbin_watson(spark, sf_dir):
    """Lag-1..7 autocorrelation of the daily-revenue series plus the
    Durbin-Watson-style ratio d_k = sum(diff_k^2)/sum((x-mean)^2) — dw at
    lag 1 IS the classic Durbin-Watson statistic (centering leaves
    differences unchanged), lags 2..7 are the normalized variogram. The
    drift screen for any daily pipeline metric (token volume, dup rate,
    quality score) before trusting a trend.

    Series grain is DAY: one groupBy(day) aggregate (map-side combined)
    collapses data grain before anything else, so the row_number window and
    the lag self-join both run on a domain-bounded series (~2.4k rows at
    any sf — the sweep's bounded-window rule by construction). Lag pairs
    come from one 7-row exploded literal joined on t+lag (equi-join, no
    per-lag passes); sufficient statistics are EXACT bigints in whole
    dollars (x<=1e7/day at sf~1 -> sum(x*x) <= 2.4e17, inside int64), and
    the two final ratios are single shared-text IEEE expressions rounded
    to 6dp on both engines (manual_corr_stats convention)."""
    orders = _t(spark, sf_dir, "orders")
    day_rev = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.expr("cast(sum(cast(round(o_totalprice * 100) as bigint)) div 100 as bigint)").alias("x"))
    )
    series = day_rev.select(
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("t"), "x"
    )
    tot = series.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("ss"),
    )
    ks = spark.range(1, 8).select(F.col("id").alias("lag"))
    probe = (
        series.crossJoin(F.broadcast(ks))
        .select("lag", F.col("x").alias("xa"), (F.col("t") + F.col("lag")).alias("t2"))
    )
    lagged = probe.join(series, probe["t2"] == series["t"]).select(
        "lag", "xa", F.col("x").alias("xb")
    )
    per = lagged.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.col("xa") * F.col("xb")).cast("bigint").alias("ck"),
        F.sum("xa").cast("bigint").alias("pk"),
        F.sum("xb").cast("bigint").alias("qk"),
        F.sum((F.col("xb") - F.col("xa")) * (F.col("xb") - F.col("xa")))
        .cast("bigint").alias("dk"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("lag").cast("int").alias("lag"), "n_pairs",
            F.expr(_ACF_EXPR).alias("acf"),
            F.expr(_DW_EXPR).alias("dw"),
        )
        .orderBy("lag")
    )


# ---------------------------------------------------------------------------
# Cramér's V association strength (priority x status contingency)
# ---------------------------------------------------------------------------

_CRAMERS_V_EXPR = (
    "round(sqrt(CAST(chi2_milli AS DOUBLE) / 1000"
    " / (CAST(n AS DOUBLE) * (least(n_r, n_c) - 1))), 6)"
)


@register(
    "cramers_v_association",
    f"""
    WITH o AS (SELECT o_orderpriority AS priority, o_orderstatus AS status,
                      count(*) AS obs
               FROM orders GROUP BY 1, 2),
    r AS (SELECT priority, sum(obs) AS rt FROM o GROUP BY 1),
    c AS (SELECT status, sum(obs) AS ct FROM o GROUP BY 1),
    t AS (SELECT sum(obs) AS tt,
                 CAST(count(DISTINCT priority) AS BIGINT) AS n_r,
                 CAST(count(DISTINCT status) AS BIGINT) AS n_c
          FROM o),
    cells AS (
      SELECT o.obs, (r.rt * c.ct * 1000) // t.tt AS em
      FROM o JOIN r USING (priority) JOIN c USING (status) CROSS JOIN t),
    agg AS (
      SELECT CAST(sum(((obs * 1000 - em) * (obs * 1000 - em)) // greatest(em, 1))
                  AS BIGINT) AS chi2_milli
      FROM cells)
    SELECT CAST(t.tt AS BIGINT) AS n, CAST(t.n_r AS INT) AS n_r,
           CAST(t.n_c AS INT) AS n_c, agg.chi2_milli,
           {_CRAMERS_V_EXPR} AS cramers_v
    FROM agg CROSS JOIN t
    """,
)
def cramers_v_association(spark, sf_dir):
    """Cramér's V — the [0,1]-normalized effect size for the priority x
    status contingency: V = sqrt(chi2 / (n * (min(r,c)-1))). The
    scale-free companion to chi_square_priority_status (whose statistic
    grows with n even for a fixed weak association); the pipeline use is
    ranking which metadata pairs (lang x source, dup-tier x quality-decile)
    actually co-vary.

    chi2 is summed from the SAME exact integer milli-unit contributions as
    chi_square_priority_status (floored expected counts, identical on both
    engines, order-independent integer sum — no float-summation-order
    hazard across the 15 cells); only the final V is a double, one shared
    IEEE expression rounded to 6dp. Marginals and the cell grid are all
    contingency-sized (15 rows) after one map-side-combined aggregate."""
    orders = _t(spark, sf_dir, "orders")
    o = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count(F.lit(1)).alias("obs"))
    r = o.groupBy("priority").agg(F.sum("obs").alias("rt"))
    c = o.groupBy("status").agg(F.sum("obs").alias("ct"))
    t = o.agg(
        F.sum("obs").alias("tt"),
        F.countDistinct("priority").cast("bigint").alias("n_r"),
        F.countDistinct("status").cast("bigint").alias("n_c"),
    )
    cells = (
        o.join(F.broadcast(r), "priority")
        .join(F.broadcast(c), "status")
        .crossJoin(F.broadcast(t.select("tt")))
        .select("obs", F.expr("rt * ct * 1000 div tt").alias("em"))
    )
    agg = cells.agg(
        F.expr(
            "cast(sum(((obs * 1000 - em) * (obs * 1000 - em)) div greatest(em, 1))"
            " as bigint)"
        ).alias("chi2_milli")
    )
    return agg.crossJoin(F.broadcast(t)).select(
        F.col("tt").cast("bigint").alias("n"),
        F.col("n_r").cast("int").alias("n_r"),
        F.col("n_c").cast("int").alias("n_c"),
        "chi2_milli",
        F.expr(_CRAMERS_V_EXPR).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# ARI readability profile per source (integer centi-units)
# ---------------------------------------------------------------------------

@register(
    "text_readability_ari",
    r"""
    WITH per AS (
      SELECT source,
             CAST(len(regexp_extract_all(text, '[A-Za-z0-9]')) AS BIGINT) AS chars,
             CAST(CASE WHEN trim(text) = '' THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                  AS BIGINT) AS words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
               AS sents
      FROM documents),
    scored AS (
      SELECT source,
             471 * chars // words + 50 * words // sents - 2143 AS ari_centi
      FROM per WHERE words > 0),
    g AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(ari_centi) // count(*) AS BIGINT) AS mean_ari_centi,
             CAST(min(ari_centi) AS BIGINT) AS min_ari_centi,
             CAST(max(ari_centi) AS BIGINT) AS max_ari_centi,
             CAST(count(*) FILTER (ari_centi >= 1400) AS BIGINT) AS n_college
      FROM scored GROUP BY 1)
    SELECT source, n_docs, mean_ari_centi, min_ari_centi, max_ari_centi,
           CAST(n_college * 1000000 // n_docs AS BIGINT) AS college_ppm
    FROM g
    """,
)
def text_readability_ari(spark, sf_dir):
    """Automated Readability Index per document, profiled per source:
    ARI = 4.71*(chars/words) + 0.5*(words/sentences) - 21.43, staged
    entirely in integer centi-units (471*chars div words + 50*words div
    sents - 2143) so both engines agree to the unit — ARI is the
    readability formula with NO syllable heuristic, which is what makes it
    cross-engine exact (alphanumeric chars, whitespace words, [.!?]+
    sentence runs are all plain regex counts; the same reason it's the
    cheap quality gate in large-scale corpus filtering). Empty-word docs
    are excluded; sentence count floors at 1 so headline-ish fragments
    don't divide by zero.

    Per-doc scoring is pure column expressions (no UDF, whole-stage
    codegen); the profile is one map-side-combined groupBy(source). Shares
    the token regex with text_token_stats (functions/text.py:27)."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.select(
        "source",
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z0-9]"), 0))
        .cast("bigint").alias("chars"),
        text.token_count(F.col("text")).cast("bigint").alias("words"),
        F.greatest(
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0)), F.lit(1)
        ).cast("bigint").alias("sents"),
    )
    scored = per.filter(F.col("words") > 0).select(
        "source",
        F.expr("471 * chars div words + 50 * words div sents - 2143")
        .alias("ari_centi"),
    )
    g = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("cast(sum(ari_centi) div count(*) as bigint)").alias("mean_ari_centi"),
        F.min("ari_centi").cast("bigint").alias("min_ari_centi"),
        F.max("ari_centi").cast("bigint").alias("max_ari_centi"),
        F.count_if(F.col("ari_centi") >= 1400).cast("bigint").alias("n_college"),
    )
    return g.select(
        "source", "n_docs", "mean_ari_centi", "min_ari_centi", "max_ari_centi",
        F.expr("n_college * 1000000 div n_docs").alias("college_ppm"),
    )


# ---------------------------------------------------------------------------
# Dyadic EWMA (alpha=1/2) anomaly flags over the daily revenue series
# ---------------------------------------------------------------------------

_EWMA_L = 30  # lookback days; weight for offset i is 2^(L-1-i), exactly dyadic


@register(
    "ewma_anomaly",
    f"""
    WITH day_rev AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100 AS BIGINT)
               AS x
      FROM orders GROUP BY 1),
    series AS (SELECT row_number() OVER (ORDER BY d) AS t, d, x FROM day_rev),
    offs AS (SELECT unnest(generate_series(0, {_EWMA_L - 1})) AS i),
    terms AS (
      SELECT a.t, a.d, a.x, o.i, b.x AS xl,
             (CAST(1 AS BIGINT) << ({_EWMA_L - 1} - o.i)) AS w
      FROM series a JOIN offs o ON true
      JOIN series b ON b.t = a.t - o.i),
    agg AS (
      SELECT t, d, max(x) AS x,
             CAST(sum(xl * w) AS BIGINT) AS num_inc,
             CAST(sum(w) AS BIGINT) AS wsum_inc,
             CAST(coalesce(sum(xl * w) FILTER (i >= 1), 0) AS BIGINT) AS num_prev,
             CAST(coalesce(sum(w) FILTER (i >= 1), 0) AS BIGINT) AS wsum_prev
      FROM terms GROUP BY 1, 2)
    SELECT CAST(t AS BIGINT) AS t, CAST(d AS VARCHAR) AS day, x,
           round(CAST(num_inc AS DOUBLE) / wsum_inc, 6) AS ewma,
           CAST(CASE WHEN wsum_prev > 0 AND x * wsum_prev > 2 * num_prev
                     THEN 1 ELSE 0 END AS INT) AS spike,
           CAST(CASE WHEN wsum_prev > 0 AND 2 * x * wsum_prev < num_prev
                     THEN 1 ELSE 0 END AS INT) AS drop_
    FROM agg ORDER BY t
    """,
)
def ewma_anomaly(spark, sf_dir):
    """Exponentially-weighted moving average of daily revenue with
    spike/drop anomaly flags — the standard smoothed-baseline drift monitor
    for any daily pipeline metric. alpha = 1/2 with a {_EWMA_L}-day
    truncated window makes every weight an exact power of two, so the
    weighted numerator and the weight sum are EXACT bigints on both
    engines (term bound x*2^29 <= 5.4e15 at sf~1; the only double is the
    final ewma = num/wsum, one shared expression rounded to 6dp — the
    truncated-EWMA renormalization num / (2^L - 2^(L-m)) falls out of
    summing only the available weights). Anomaly tests cross-multiply
    INTEGERS (x*wsum_prev vs 2*num_prev), so the flags are float-free:
    spike = today's value above 2x the prior-days-only EWMA, drop = below
    half.

    Scale shape: data grain collapses at groupBy(day) first; the weighted
    window rides ONE equi-join of the day-grain series against a
    {_EWMA_L}-row exploded offset literal (the sessionize_gap_sensitivity
    pattern) — no per-offset passes, no data-grain windows, and a plain
    window-sum could not express position-dependent weights."""
    orders = _t(spark, sf_dir, "orders")
    day_rev = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.expr("cast(sum(cast(round(o_totalprice * 100) as bigint)) div 100 as bigint)").alias("x"))
    )
    series = day_rev.select(
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("t"), "d", "x"
    )
    offs = spark.range(0, _EWMA_L).select(F.col("id").alias("i"))
    probe = series.crossJoin(F.broadcast(offs)).select(
        "t", "d", "x", "i", (F.col("t") - F.col("i")).alias("tl"),
        F.expr(
            f"cast(shiftleft(cast(1 as bigint), cast({_EWMA_L - 1} - i as int))"
            " as bigint)"
        ).alias("w"),
    )
    lagged = series.select(F.col("t").alias("tl"), F.col("x").alias("xl"))
    terms = probe.join(lagged, "tl")
    agg = terms.groupBy("t", "d").agg(
        F.max("x").alias("x"),
        F.sum(F.col("xl") * F.col("w")).cast("bigint").alias("num_inc"),
        F.sum("w").cast("bigint").alias("wsum_inc"),
        F.coalesce(F.sum(F.when(F.col("i") >= 1, F.col("xl") * F.col("w"))), F.lit(0))
        .cast("bigint").alias("num_prev"),
        F.coalesce(F.sum(F.when(F.col("i") >= 1, F.col("w"))), F.lit(0))
        .cast("bigint").alias("wsum_prev"),
    )
    return agg.select(
        F.col("t").cast("bigint").alias("t"),
        F.col("d").cast("string").alias("day"), "x",
        F.round(F.col("num_inc").cast("double") / F.col("wsum_inc"), 6).alias("ewma"),
        F.expr(
            "cast(case when wsum_prev > 0 and x * wsum_prev > 2 * num_prev"
            " then 1 else 0 end as int)"
        ).alias("spike"),
        F.expr(
            "cast(case when wsum_prev > 0 and 2 * x * wsum_prev < num_prev"
            " then 1 else 0 end as int)"
        ).alias("drop_"),
    ).orderBy("t")


# ---------------------------------------------------------------------------
# Temperature-scaled mixture sampling (alpha = 0.5 via exact micro-sqrt)
# ---------------------------------------------------------------------------

@register(
    "temperature_sampling_mix",
    r"""
    WITH tok AS (
        SELECT source,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
        FROM documents),
    per AS (SELECT source, count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS tokens
            FROM tok GROUP BY 1),
    w AS (SELECT *,
                 CAST(round(sqrt(CAST(tokens AS DOUBLE)) * 1000000) AS BIGINT)
                   AS msqrt
          FROM per),
    t AS (SELECT sum(tokens) AS tt, sum(msqrt) AS st FROM w)
    SELECT source, n_docs, tokens,
           CAST(tokens * 1000000 // t.tt AS BIGINT) AS weight_ppm,
           CAST(msqrt * 1000000 // t.st AS BIGINT) AS temp_mix_ppm,
           CAST(msqrt * 1000000 // t.st - tokens * 1000000 // t.tt AS BIGINT)
             AS flatten_ppm
    FROM w CROSS JOIN t
    """,
)
def temperature_sampling_mix(spark, sf_dir):
    """Temperature-scaled sampling weights per source (the multilingual /
    multi-domain mixture trick: p_i ~ tokens_i^alpha with alpha = 0.5,
    which up-samples low-resource domains relative to raw token share).
    The companion to domain_mixing_weights' cap-and-renormalize policy.

    alpha = 1/2 is chosen deliberately: tokens^0.5 is IEEE sqrt — correctly
    rounded on both JVMs and C runtimes, unlike pow(x, 0.7) which is only
    1-ulp-accurate and a cross-engine hazard. The sqrt is immediately
    staged to an exact bigint in micro-units (round-half-up, identical
    double in, identical bigint out), so the shares themselves are pure
    integer floor-divisions — the two totals are one broadcast row, per
    source grain throughout after one map-side token count. flatten_ppm > 0
    marks the domains temperature sampling up-weights."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.select(
        "source", text.token_count(F.col("text")).cast("long").alias("n_tokens")
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("tokens")
    )
    w = per.withColumn(
        "msqrt",
        F.round(F.sqrt(F.col("tokens").cast("double")) * 1000000).cast("bigint"),
    )
    t = w.agg(F.sum("tokens").alias("tt"), F.sum("msqrt").alias("st"))
    return w.crossJoin(F.broadcast(t)).select(
        "source", "n_docs", "tokens",
        F.expr("tokens * 1000000 div tt").alias("weight_ppm"),
        F.expr("msqrt * 1000000 div st").alias("temp_mix_ppm"),
        F.expr("msqrt * 1000000 div st - tokens * 1000000 div tt")
        .alias("flatten_ppm"),
    )


# ---------------------------------------------------------------------------
# STREAMING sessionization: native session_window over an availableNow stream
# ---------------------------------------------------------------------------

@register(
    "streaming_sessionize",
    """
    WITH l AS (
        SELECT user_id, ts, event_id,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ),
    f AS (
        SELECT *, CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS new_s
        FROM l
    ),
    s AS (
        SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM f
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def streaming_sessionize(spark, sf_dir):
    """STREAMING sessionization via Spark's native ``session_window`` — the
    stateful merging-interval operator itself, not the batch
    gaps-and-islands rewrite (that twin is the ``sessionize`` query). An
    availableNow file stream replays the events fixture through a real
    StreamingQuery; complete-mode memory sink captures every closed-and-open
    session, and the result is the sink table.

    Boundary semantics differ from the batch twin BY DESIGN and the oracle
    encodes them: session_window assigns each event the interval
    [ts, ts+gap) and merges overlapping intervals, so a successor at
    exactly ts+gap starts a NEW session (break on diff >= gap), whereas
    LAG-based islands typically break on diff > gap. session_end here is
    max(ts) (last event), not the window's exclusive end.

    Scale shape: session state is per-user merging intervals, sized by
    OPEN sessions only once a watermark is attached (production runs
    append mode + withWatermark for eviction; complete+memory here is the
    fixture-scale harness the same way streaming_cdc_rollup stages /tmp).
    The shuffle is one hash exchange on user_id — identical to the batch
    plan — and the file source splits the parquet into ordinary tasks."""
    import os
    import uuid

    from pyspark.sql.types import LongType, TimestampNTZType

    # the file stream source requires a DIRECTORY; stage one holding a
    # symlink to the fixture file (testdata itself is read-only)
    stage = f"/tmp/spark_graft_ssess_{sf_dir.strip('/').replace('/', '_')}"
    os.makedirs(stage, exist_ok=True)
    link = f"{stage}/events.parquet"
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(stage)
        .select("user_id", "ts", "event_id")
    )
    if isinstance(batch.schema["ts"].dataType, LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(batch.schema["ts"].dataType, TimestampNTZType):
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    sessions = (
        stream.groupBy(F.session_window(F.col("ts"), "30 minutes"), F.col("user_id"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    sink = f"streaming_sessionize_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).select(
        "user_id", "session_start", "session_end", "n_events"
    )


# ---------------------------------------------------------------------------
# Skip-gram training pairs with frequency subsampling (word2vec data prep)
# ---------------------------------------------------------------------------

_SG_T_INV = 1000  # Mikolov subsample threshold t = 1/1000
_SG_KEEP_PPM = (
    "least(cast(1000000 as bigint), cast(round((sqrt(cast(tt as double) / ({t} * c))"
    " + cast(tt as double) / ({t} * c)) * 1000000) as bigint))"
).format(t=_SG_T_INV)


@register(
    "skipgram_pairs_subsampled",
    rf"""
    WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
                WHERE trim(text) <> ''),
    ex AS (SELECT doc_id, unnest(tk) AS t, generate_subscripts(tk, 1) AS i FROM tk),
    cnt AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM ex GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM ex),
    kept AS (
      SELECT e.doc_id, e.i, e.t
      FROM ex e JOIN cnt USING (t) CROSS JOIN tot
      WHERE {md5_long_sql("e.doc_id || '_' || e.i", seed=77)} % 1000000
            < {_SG_KEEP_PPM}),
    pairs AS (
      SELECT a.t AS center, b.t AS context, CAST(count(*) AS BIGINT) AS n_pairs
      FROM kept a JOIN kept b
        ON b.doc_id = a.doc_id AND (b.i = a.i + 1 OR b.i = a.i + 2)
      GROUP BY 1, 2)
    SELECT center, context, n_pairs FROM pairs
    ORDER BY n_pairs DESC, center ASC, context ASC LIMIT 100
    """,
)
def skipgram_pairs_subsampled(spark, sf_dir):
    """Skip-gram (center, context) training-pair generation with Mikolov
    frequency subsampling — the word2vec/fastText data-prep step: frequent
    words are dropped with probability 1 - (sqrt(t/f) + t/f), t = 1e-3,
    BEFORE windowing, which both shrinks the pair stream and re-balances
    it toward informative co-occurrences.

    The drop decision is a deterministic hash-uniform per token POSITION
    (md5 of doc_id_position, the engine's F.rand replacement) compared in
    integer ppm against the keep probability — the probability itself is
    staged through one shared-text IEEE expression rounded to a bigint, so
    both engines keep exactly the same positions. Window pairs come from a
    self-equi-join of kept positions on BOTH keys (doc_id, i+offset) with
    the offsets {1,2} riding a 2-row exploded literal (forward only;
    reverse directions are the mirror image) — candidate count is exactly
    2x kept positions, never per-doc quadratic (an OR-of-offsets join
    condition would equi-join on doc_id alone and square each doc's kept
    set). Corpus frequencies join at token-type grain;
    the token total is a one-row broadcast. Top-100 pairs by count is a
    TakeOrdered."""
    docs = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    ex = docs.select(
        "doc_id",
        F.posexplode(F.split(text.normalize(F.col("text")), " ")).alias("i0", "t"),
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "t")
    cnt = ex.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = ex.agg(F.count(F.lit(1)).cast("bigint").alias("tt"))
    u = md5_long(
        F.concat(F.col("doc_id").cast("string"), F.lit("_"), F.col("i").cast("string")),
        seed=77,
    ) % 1000000
    kept = (
        ex.join(cnt, "t")
        .crossJoin(F.broadcast(tot))
        .filter(u < F.expr(_SG_KEEP_PPM))
        .select("doc_id", "i", "t")
    )
    offs = spark.range(1, 3).select(F.col("id").alias("off"))
    probe = kept.crossJoin(F.broadcast(offs)).select(
        "doc_id", F.col("t").alias("center"), (F.col("i") + F.col("off")).alias("i2")
    )
    ctx = kept.select("doc_id", F.col("i").alias("i2"), F.col("t").alias("context"))
    pairs = (
        probe.join(ctx, ["doc_id", "i2"])
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
    return pairs.orderBy(
        F.col("n_pairs").desc(), F.col("center").asc(), F.col("context").asc()
    ).limit(100)


# ---------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers (privacy/governance screen)
# ---------------------------------------------------------------------------

@register(
    "k_anonymity_audit",
    """
    WITH qi AS (
      SELECT c_nationkey AS nation, c_mktsegment AS segment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             count(*) AS k
      FROM customer GROUP BY 1, 2, 3),
    hist AS (
      SELECT k AS class_size, CAST(count(*) AS BIGINT) AS n_classes,
             CAST(sum(k) AS BIGINT) AS n_records
      FROM qi GROUP BY 1),
    tot AS (SELECT CAST(sum(n_records) AS BIGINT) AS n FROM hist)
    SELECT CAST(class_size AS BIGINT) AS class_size, n_classes, n_records,
           CAST(CASE WHEN class_size < 5 THEN 1 ELSE 0 END AS INT) AS below_k5,
           CAST(n_records * 1000000 // tot.n AS BIGINT) AS record_share_ppm
    FROM hist CROSS JOIN tot
    ORDER BY class_size
    """,
)
def k_anonymity_audit(spark, sf_dir):
    """k-anonymity audit — the governance screen run before releasing or
    training on user-adjacent tables: group records by their
    quasi-identifier tuple (nation, market segment, account-balance band),
    then profile the equivalence-class sizes. Classes with k < 5 are
    re-identifiable; the histogram says how much generalization (coarser
    bands, suppressed columns) the release needs.

    One groupBy at QI grain (map-side combined), then a second aggregate
    at class-size grain — both keyed far below data grain; the record
    total is a one-row broadcast. Same shape at 100 TB: the QI cube is
    bounded by the attribute domains, not the row count."""
    cust = _t(spark, sf_dir, "customer")
    qi = cust.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("k"))
    hist = qi.groupBy(F.col("k").alias("class_size")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("k").cast("bigint").alias("n_records"),
    )
    tot = hist.agg(F.sum("n_records").cast("bigint").alias("n"))
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            F.col("class_size").cast("bigint").alias("class_size"),
            "n_classes", "n_records",
            F.expr("cast(case when class_size < 5 then 1 else 0 end as int)")
            .alias("below_k5"),
            F.expr("n_records * 1000000 div n").alias("record_share_ppm"),
        )
        .orderBy("class_size")
    )


# ---------------------------------------------------------------------------
# Distributed logistic regression via staged-integer Newton-IRLS
# ---------------------------------------------------------------------------

_LR_ITERS = 4
_LR_S = 1_000_000  # fixed-point scale for beta, z, p


def _lr_step_cols(op: str) -> list[tuple[str, str]]:
    """Per-row scored columns as a LATERAL-ALIAS chain (each squaring
    references the previous column by NAME — a textually-nested chain
    would double in size per squaring and blow SQL parsing up to MBs).

    Fixed-point exp(z) ~= (T3(z/32))^32 — a cubic-Taylor base followed by
    5 integer squarings: transcendental-free, so both engines compute the
    SAME sigmoid bit for bit (libm/JVM exp are only 1-ulp-accurate — a
    cross-engine hazard the integer chain removes); rel. error <=
    (z/32)^4/24 * 32 ~ 0.5% at the +-8 clip, far inside IRLS tolerance.
    Both optimizers INLINE alias chains when collapsing projections, so k
    squarings cost 2^k expression copies at plan time — the cubic base
    with 5 squarings replaces a first attempt at (1+z/1024)^1024 whose
    2^10 expansion took whole-stage codegen and DuckDB planning to tens
    of seconds. z is clipped to +-8e6 micro; every intermediate fits
    int64 (max u4^2 ~= 3e15, final u <= e^8*1e6 ~= 3e9)."""
    cols = [
        ("zc", "greatest(least(b0 + b1 * x1 + b2 * x2, 8000000), -8000000)"),
        ("q", f"zc {op} 32"),
        ("q2", f"q * q {op} 2000000"),
        ("u0", f"1000000 + q + q2 + q2 * q {op} 3000000"),
    ]
    for k in range(1, 6):
        cols.append((f"u{k}", f"u{k - 1} * u{k - 1} {op} 1000000"))
    cols += [
        ("p_ppm", f"u5 * 1000000 {op} (1000000 + u5)"),
        ("r_ppm", "y * 1000000 - p_ppm"),
        ("wgt", f"p_ppm * (1000000 - p_ppm) {op} 1000000"),
    ]
    return cols


def _lr_newton_exprs() -> dict[str, str]:
    """Cramer's-rule 3x3 Newton step, shared expression text (doubles built
    only from exact bigint sums, fixed op tree -> identical IEEE on both
    engines). Scales cancel: H_int and g_int are both 1e-6 of the real H, g."""
    h = {k: f"CAST({k} AS DOUBLE)" for k in
         ("h11", "h12", "h13", "h22", "h23", "h33", "g1", "g2", "g3")}
    det = (f"({h['h11']}*({h['h22']}*{h['h33']}-{h['h23']}*{h['h23']})"
           f"-{h['h12']}*({h['h12']}*{h['h33']}-{h['h23']}*{h['h13']})"
           f"+{h['h13']}*({h['h12']}*{h['h23']}-{h['h22']}*{h['h13']}))")
    d1 = (f"({h['g1']}*({h['h22']}*{h['h33']}-{h['h23']}*{h['h23']})"
          f"-{h['h12']}*({h['g2']}*{h['h33']}-{h['h23']}*{h['g3']})"
          f"+{h['h13']}*({h['g2']}*{h['h23']}-{h['h22']}*{h['g3']}))")
    d2 = (f"({h['h11']}*({h['g2']}*{h['h33']}-{h['g3']}*{h['h23']})"
          f"-{h['g1']}*({h['h12']}*{h['h33']}-{h['h23']}*{h['h13']})"
          f"+{h['h13']}*({h['h12']}*{h['g3']}-{h['g2']}*{h['h13']}))")
    d3 = (f"({h['h11']}*({h['h22']}*{h['g3']}-{h['h23']}*{h['g2']})"
          f"-{h['h12']}*({h['h12']}*{h['g3']}-{h['g2']}*{h['h13']})"
          f"+{h['g1']}*({h['h12']}*{h['h23']}-{h['h22']}*{h['h13']}))")
    return {
        "nb0": f"CAST(b0 + round({d1} / {det} * {_LR_S}) AS BIGINT)",
        "nb1": f"CAST(b1 + round({d2} / {det} * {_LR_S}) AS BIGINT)",
        "nb2": f"CAST(b2 + round({d3} / {det} * {_LR_S}) AS BIGINT)",
    }


_LR_AGGS = {
    "g1": "CAST(sum(r_ppm) AS BIGINT)",
    "g2": "CAST(sum(r_ppm * x1) AS BIGINT)",
    "g3": "CAST(sum(r_ppm * x2) AS BIGINT)",
    "h11": "CAST(sum(wgt) AS BIGINT)",
    "h12": "CAST(sum(wgt * x1) AS BIGINT)",
    "h13": "CAST(sum(wgt * x2) AS BIGINT)",
    "h22": "CAST(sum(wgt * x1 * x1) AS BIGINT)",
    "h23": "CAST(sum(wgt * x1 * x2) AS BIGINT)",
    "h33": "CAST(sum(wgt * x2 * x2) AS BIGINT)",
}


def _lr_oracle_sql() -> str:
    step = ", ".join(f"{e} AS {c}" for c, e in _lr_step_cols("//"))
    nb = _lr_newton_exprs()
    aggs = ", ".join(f"{v} AS {k}" for k, v in _LR_AGGS.items())
    ctes = ["b0_cte AS (SELECT CAST(0 AS BIGINT) AS b0, CAST(0 AS BIGINT) AS b1,"
            " CAST(0 AS BIGINT) AS b2)"]
    prev = "b0_cte"
    for t in range(1, _LR_ITERS + 1):
        ctes.append(f"""
    sc{t} AS (SELECT y, x1, x2, {step} FROM feats CROSS JOIN {prev}),
    ag{t} AS (SELECT {aggs} FROM sc{t}),
    b{t}_cte AS MATERIALIZED (
        SELECT {nb['nb0']} AS b0, {nb['nb1']} AS b1, {nb['nb2']} AS b2
        FROM ag{t} CROSS JOIN {prev})""")
        prev = f"b{t}_cte"
    return f"""
    WITH feats AS MATERIALIZED (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y,
             CAST(round(o_totalprice) AS BIGINT) // 1000 AS x1,
             CAST(year(CAST(o_orderdate AS DATE)) - 1992 AS BIGINT) AS x2
      FROM orders),
    {",".join(ctes)},
    final AS (SELECT y, x1, x2, {step} FROM feats CROSS JOIN {prev})
    SELECT CAST(count(*) AS BIGINT) AS n, b0, b1, b2,
           CAST(sum(CASE WHEN (p_ppm >= 500000) = (y = 1) THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS accuracy_ppm,
           CAST(sum(p_ppm) // count(*) AS BIGINT) AS mean_p_ppm,
           CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS base_rate_ppm
    FROM final CROSS JOIN {prev}
    GROUP BY b0, b1, b2
    """


@register("logistic_regression_irls", _lr_oracle_sql())
def logistic_regression_irls(spark, sf_dir):
    """Distributed logistic regression by Newton-IRLS — the classifier-fit
    primitive behind quality-filter calibration (fastText-style quality
    classifiers, contamination detectors) run entirely as DataFrame
    aggregates: each iteration is ONE map-side-combined aggregation of the
    12 sufficient statistics (gradient g = X'(y-p), Hessian H = X'WX,
    both 3-feature-sized) collected as a single bounded 1-row result (the
    bpe_train_merges pattern), then a 3x3 Cramer solve driver-side in
    float64 with the SAME operator tree as the oracle's SQL doubles; the
    new beta re-enters the plan as three literals, so there is no
    data-side join at all. The corpus is scanned once per iteration —
    at 100 TB the shuffle is 12 scalars per partition, nothing else
    moves.

    Cross-engine exactness is the hard part and is engineered, not hoped
    for: the sigmoid is a RATIONAL fixed-point construction
    (cubic-Taylor(z/32))^32 via 5 integer squarings as a lateral-alias
    column chain (exp/libm is only 1-ulp-accurate across runtimes — the
    classic parity hazard), so p(z) is a bigint both engines compute
    identically;
    sufficient sums are exact int64 (wgt*x1^2 <= 9e10/row — DECIMAL(38)
    past ~1e8 rows); the Newton step's doubles are built from exact
    bigints through one shared operator tree. Features: intercept, order
    total (kilodollars), order-year offset; label: urgent/high priority.
    Fixed iteration count (Newton is quadratic; beta moves < 1 micro-unit
    by the last step on this data)."""
    from decimal import ROUND_HALF_UP, Decimal

    orders = _t(spark, sf_dir, "orders")
    feats = orders.select(
        F.expr(
            "cast(case when o_orderpriority in ('1-URGENT', '2-HIGH')"
            " then 1 else 0 end as bigint)"
        ).alias("y"),
        F.expr("cast(round(o_totalprice) as bigint) div 1000").alias("x1"),
        F.expr("cast(year(cast(o_orderdate as date)) - 1992 as bigint)").alias("x2"),
    ).localCheckpoint()  # scanned once per Newton iteration + final scoring
    step_cols = _lr_step_cols("div")

    def scored_from(b):
        sc = (
            feats.withColumn("b0", F.lit(b[0]).cast("bigint"))
            .withColumn("b1", F.lit(b[1]).cast("bigint"))
            .withColumn("b2", F.lit(b[2]).cast("bigint"))
        )
        for c, e in step_cols:
            sc = sc.withColumn(c, F.expr(e))
        return sc

    def rhu(x: float) -> int:
        return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    beta = [0, 0, 0]
    for _ in range(_LR_ITERS):
        # 12 sufficient statistics -> ONE bounded 1-row collect per
        # iteration (the bpe_train_merges pattern); the Newton solve then
        # runs driver-side in float64 with the SAME operator tree the
        # oracle's SQL doubles use (identical IEEE ops -> identical beta)
        a = scored_from(beta).agg(
            *[F.expr(v).alias(k) for k, v in _LR_AGGS.items()]
        ).collect()[0]
        h11, h12, h13 = float(a["h11"]), float(a["h12"]), float(a["h13"])
        h22, h23, h33 = float(a["h22"]), float(a["h23"]), float(a["h33"])
        g1, g2, g3 = float(a["g1"]), float(a["g2"]), float(a["g3"])
        det = (h11 * (h22 * h33 - h23 * h23)
               - h12 * (h12 * h33 - h23 * h13)
               + h13 * (h12 * h23 - h22 * h13))
        d1 = (g1 * (h22 * h33 - h23 * h23)
              - h12 * (g2 * h33 - h23 * g3)
              + h13 * (g2 * h23 - h22 * g3))
        d2 = (h11 * (g2 * h33 - g3 * h23)
              - g1 * (h12 * h33 - h23 * h13)
              + h13 * (h12 * g3 - g2 * h13))
        d3 = (h11 * (h22 * g3 - h23 * g2)
              - h12 * (h12 * g3 - g2 * h13)
              + g1 * (h12 * h23 - h22 * h13))
        beta = [
            beta[0] + rhu(d1 / det * _LR_S),
            beta[1] + rhu(d2 / det * _LR_S),
            beta[2] + rhu(d3 / det * _LR_S),
        ]
    final = scored_from(beta)
    return final.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(
            "cast(sum(case when (p_ppm >= 500000) = (y = 1) then 1 else 0 end)"
            " * 1000000 div count(*) as bigint)"
        ).alias("accuracy_ppm"),
        F.expr("cast(sum(p_ppm) div count(*) as bigint)").alias("mean_p_ppm"),
        F.expr("cast(sum(y) * 1000000 div count(*) as bigint)").alias("base_rate_ppm"),
    ).select(
        "n",
        F.lit(beta[0]).cast("bigint").alias("b0"),
        F.lit(beta[1]).cast("bigint").alias("b1"),
        F.lit(beta[2]).cast("bigint").alias("b2"),
        "accuracy_ppm", "mean_p_ppm", "base_rate_ppm",
    ).select("n", "b0", "b1", "b2", "accuracy_ppm", "mean_p_ppm", "base_rate_ppm")


# ---------------------------------------------------------------------------
# Leave-one-source-out OLS influence (data-valuation screen)
# ---------------------------------------------------------------------------

_LOO_SLOPE = (
    "round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)"
)
_LOO_SLOPE_L = (
    "round((CAST(n_l AS DOUBLE) * sxy_l - CAST(sx_l AS DOUBLE) * sy_l)"
    " / (CAST(n_l AS DOUBLE) * sxx_l - CAST(sx_l AS DOUBLE) * sx_l), 6)"
)


@register(
    "loo_source_influence",
    rf"""
    WITH per AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM (
        SELECT source,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS x,
               CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS y
        FROM documents WHERE trim(text) <> '')
      GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(sx) AS BIGINT) AS sx,
                   CAST(sum(sy) AS BIGINT) AS sy, CAST(sum(sxx) AS BIGINT) AS sxx,
                   CAST(sum(sxy) AS BIGINT) AS sxy
            FROM per),
    loo AS (
      SELECT p.source, p.n AS n_docs,
             t.n - p.n AS n_l, t.sx - p.sx AS sx_l, t.sy - p.sy AS sy_l,
             t.sxx - p.sxx AS sxx_l, t.sxy - p.sxy AS sxy_l,
             t.n AS n, t.sx AS sx, t.sy AS sy, t.sxx AS sxx, t.sxy AS sxy
      FROM per p CROSS JOIN tot t)
    SELECT source, n_docs,
           {_LOO_SLOPE} AS slope_global,
           {_LOO_SLOPE_L} AS slope_loo,
           round({_LOO_SLOPE} - {_LOO_SLOPE_L}, 6) AS influence
    FROM loo
    """,
)
def loo_source_influence(spark, sf_dir):
    """Leave-one-source-out influence on a corpus-level OLS fit — the
    cheap data-valuation screen: how much does each source bend the
    global sentences-per-token regression? Sources with outsized
    |influence| are the ones skewing the corpus-wide relationship (boiler
    plate, tables, spam), flagged WITHOUT refitting per source.

    The trick is that OLS is a function of five mergeable integer sums
    (n, Sx, Sy, Sxx, Sxy): one groupBy(source) computes them per source,
    their total is a one-row broadcast, and every leave-one-out fit is a
    SUBTRACTION — |sources|+1 fits for the cost of one corpus pass.
    Exact bigint sufficient statistics (x = token count, y = sentence
    runs; sum(x*x) <= ~1e13 at sf~1), slopes as one shared-text IEEE
    expression rounded to 6dp (manual_corr_stats convention)."""
    docs = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    per = docs.select(
        "source",
        text.token_count(F.col("text")).cast("bigint").alias("x"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0))
        .cast("bigint").alias("y"),
    ).groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("pn"),
        F.sum("x").cast("bigint").alias("psx"),
        F.sum("y").cast("bigint").alias("psy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("psxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("psxy"),
    )
    tot = per.agg(
        F.sum("pn").cast("bigint").alias("n"),
        F.sum("psx").cast("bigint").alias("sx"),
        F.sum("psy").cast("bigint").alias("sy"),
        F.sum("psxx").cast("bigint").alias("sxx"),
        F.sum("psxy").cast("bigint").alias("sxy"),
    )
    loo = per.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("pn").alias("n_docs"),
        (F.col("n") - F.col("pn")).alias("n_l"),
        (F.col("sx") - F.col("psx")).alias("sx_l"),
        (F.col("sy") - F.col("psy")).alias("sy_l"),
        (F.col("sxx") - F.col("psxx")).alias("sxx_l"),
        (F.col("sxy") - F.col("psxy")).alias("sxy_l"),
        "n", "sx", "sy", "sxx", "sxy",
    )
    return loo.select(
        "source", "n_docs",
        F.expr(_LOO_SLOPE).alias("slope_global"),
        F.expr(_LOO_SLOPE_L).alias("slope_loo"),
        F.expr(f"round({_LOO_SLOPE} - {_LOO_SLOPE_L}, 6)").alias("influence"),
    )


# ---------------------------------------------------------------------------
# Two-proportion z-test (conversion A/B by deterministic user split)
# ---------------------------------------------------------------------------

# degenerate pooled rates (0% or 100% conversion) have zero pooled variance
# and zero rate difference -> z defined as 0 on BOTH engines (a raw 0/0 here
# is NaN-vs-NULL cross-engine territory)
_AB_Z = (
    "round(CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN CAST(0 AS DOUBLE)"
    " ELSE (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)"
    " / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))"
    " * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))"
    " * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)) END, 6)"
)


@register(
    "conversion_ab_ztest",
    f"""
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY 1),
    g AS (
      SELECT CAST(count(*) FILTER (variant = 0) AS BIGINT) AS n_a,
             CAST(count(*) FILTER (variant = 1) AS BIGINT) AS n_b,
             CAST(sum(converted) FILTER (variant = 0) AS BIGINT) AS c_a,
             CAST(sum(converted) FILTER (variant = 1) AS BIGINT) AS c_b
      FROM u)
    SELECT n_a, n_b, c_a, c_b,
           CAST(c_a * 1000000 // n_a AS BIGINT) AS rate_a_ppm,
           CAST(c_b * 1000000 // n_b AS BIGINT) AS rate_b_ppm,
           {_AB_Z} AS z,
           CAST(CASE WHEN abs({_AB_Z}) > 1.959964 THEN 1 ELSE 0 END AS INT)
             AS reject_95
    FROM g
    """,
)
def conversion_ab_ztest(spark, sf_dir):
    """Two-proportion z-test on user-level conversion between the two
    deterministic variant buckets (user_id parity — the engine's stand-in
    for an experiment assignment column): pooled-variance z statistic and
    the 95% two-sided decision. The experimentation primitive next to
    chi_square/ks_two_sample in the drift-and-testing family.

    User-grain conversion collapses first (groupBy user: one shuffle at
    user grain, max() as EXISTS), then the four counts come from ONE
    conditional aggregate (single row). z is one shared-text IEEE
    expression over exact bigint counts, rounded 6dp; the decision
    compares against the exact z_0.975 constant so both engines emit the
    same integer flag."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .alias("converted"),
    ).select(
        (F.col("user_id") % 2).cast("int").alias("variant"), "converted"
    )
    g = u.agg(
        F.count_if(F.col("variant") == 0).cast("bigint").alias("n_a"),
        F.count_if(F.col("variant") == 1).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0))
        .cast("bigint").alias("c_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0))
        .cast("bigint").alias("c_b"),
    )
    return g.select(
        "n_a", "n_b", "c_a", "c_b",
        F.expr("c_a * 1000000 div n_a").alias("rate_a_ppm"),
        F.expr("c_b * 1000000 div n_b").alias("rate_b_ppm"),
        F.expr(_AB_Z).alias("z"),
        F.expr(
            f"cast(case when abs({_AB_Z}) > 1.959964 then 1 else 0 end as int)"
        ).alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# GDPR right-to-be-forgotten erasure audit over the ACID TxnTable
# ---------------------------------------------------------------------------

@register(
    "gdpr_erasure_audit",
    """
    WITH victim AS (SELECT min(user_id) AS v FROM events),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n_before,
             CAST(count(*) FILTER (user_id = victim.v) AS BIGINT) AS n_user_before
      FROM events CROSS JOIN victim)
    SELECT CAST(victim.v AS BIGINT) AS victim_user,
           c.n_before, c.n_user_before,
           c.n_before - c.n_user_before AS n_after,
           CAST(0 AS BIGINT) AS n_user_after,
           c.n_user_before AS timetravel_user_rows
    FROM c CROSS JOIN victim
    """,
)
def gdpr_erasure_audit(spark, sf_dir):
    """GDPR right-to-be-forgotten, end to end on the ACID TxnTable: ingest
    the events table, DELETE one subject's rows (copy-on-write: only files
    containing the subject rewrite, zone-untouched files stay by path),
    then AUDIT all three governance invariants in one row — (a) the head
    snapshot retains every other row (n_after), (b) the subject is gone
    from the head (n_user_after = 0), and (c) time travel to the
    pre-delete version STILL SHOWS the subject's rows
    (timetravel_user_rows) — the documented reason physical erasure needs
    vacuum() after the retention window, exactly like Delta.

    The subject id is a deterministic 1-row bounded collect (min user);
    the delete's rewrite set is found with ONE input_file_name job, never
    a per-file loop (sources/txn_table.py:509). The oracle recomputes the
    same counts relationally from the source table. Ref lineage: the
    reference's TRUNCATE+reload staging (csv_to_mssqldb.py) has no
    row-level erasure story — this is the engine's upgrade of that
    surface."""
    import shutil

    from etl_mssql_to_postgres_dailysync_spark.sources.txn_table import TxnTable

    path = f"/tmp/spark_graft_gdpr_{sf_dir.strip('/').replace('/', '_')}"
    shutil.rmtree(path, ignore_errors=True)
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    t = TxnTable(spark, path, stats_cols=["user_id"])
    t.append(ev, cluster_by=["user_id"])
    v_pre = t.version()
    victim = ev.agg(F.min("user_id")).collect()[0][0]  # 1-row bounded collect
    t.delete(F.col("user_id") == victim, prune_col="user_id")
    head = t.read()
    pre = t.read(version=v_pre)
    counts = (
        head.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_after"),
            F.count_if(F.col("user_id") == victim).cast("bigint")
            .alias("n_user_after"),
        )
        .crossJoin(
            F.broadcast(
                pre.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_before"),
                    F.count_if(F.col("user_id") == victim).cast("bigint")
                    .alias("n_user_before"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                pre.filter(F.col("user_id") == victim).agg(
                    F.count(F.lit(1)).cast("bigint").alias("timetravel_user_rows")
                )
            )
        )
    )
    return counts.select(
        F.lit(victim).cast("bigint").alias("victim_user"),
        "n_before", "n_user_before", "n_after", "n_user_after",
        "timetravel_user_rows",
    )


# ---------------------------------------------------------------------------
# Monthly PSI drift trend vs a frozen baseline year
# ---------------------------------------------------------------------------

_PSI_TERM_E8 = (
    "CAST(round(CASE WHEN nb > 0 AND nc > 0"
    " THEN ((CAST(nb AS DOUBLE) / tb - CAST(nc AS DOUBLE) / tc)"
    " * ln((CAST(nb AS DOUBLE) / tb) / (CAST(nc AS DOUBLE) / tc))) * 100000000"
    " ELSE 0.0 END) AS BIGINT)"
)


@register(
    "psi_monthly_trend",
    f"""
    WITH binned AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             year(CAST(o_orderdate AS DATE)) AS yr,
             least(CAST(round(o_totalprice * 100) AS BIGINT) * {_PSI_BINS}
                   // {_PSI_HI - _PSI_LO}, {_PSI_BINS - 1}) AS bin
      FROM orders),
    base AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS nb FROM binned
      WHERE yr = 1992 GROUP BY 1),
    tb_t AS (SELECT CAST(sum(nb) AS BIGINT) AS tb FROM base),
    cur AS (
      SELECT month, bin, CAST(count(*) AS BIGINT) AS nc FROM binned
      WHERE yr > 1992 GROUP BY 1, 2),
    tc_t AS (SELECT month, CAST(sum(nc) AS BIGINT) AS tc FROM cur GROUP BY 1),
    terms AS (
      SELECT c.month, t.tc, {_PSI_TERM_E8} AS term_e8
      FROM cur c
      JOIN tc_t t USING (month)
      LEFT JOIN base b USING (bin)
      CROSS JOIN tb_t
      -- LEFT JOIN makes missing baseline bins nb NULL -> term 0 via the guard
      ),
    monthly AS (
      SELECT month, max(tc) AS n_orders,
             CAST(sum(term_e8) AS BIGINT) AS psi_e8
      FROM (SELECT month, tc, coalesce(term_e8, 0) AS term_e8 FROM terms)
      GROUP BY 1)
    SELECT month, CAST(n_orders AS BIGINT) AS n_orders, psi_e8,
           CAST(CASE WHEN psi_e8 > 20000000 THEN 1 ELSE 0 END AS INT) AS drift_flag
    FROM monthly ORDER BY month
    """,
)
def psi_monthly_trend(spark, sf_dir):
    """Population-stability-index TREND: PSI of every month's order-value
    distribution against the frozen 1992 baseline — drift_psi turned into
    the monitoring time series a production pipeline actually pages on
    (psi > 0.2 = the standard retrain threshold, emitted as drift_flag).

    The cross-engine hazard specific to a SUMMED PSI is float summation
    order across bins; here each per-bin term is staged to an exact bigint
    (round(term * 1e8) — one shared-text IEEE expression per bin), so the
    per-month sum is an order-independent INTEGER sum. Grain collapses to
    (month x {_PSI_BINS} bins) in the first aggregate; the baseline is a
    {_PSI_BINS}-row broadcast; months ride one groupBy. Missing-bin pairs
    contribute 0 by the standard PSI convention."""
    orders = _t(spark, sf_dir, "orders")
    binned = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.year(F.col("o_orderdate").cast("date")).alias("yr"),
        F.least(
            F.expr(
                f"CAST(round(o_totalprice * 100) AS BIGINT) * {_PSI_BINS} "
                f"div {_PSI_HI - _PSI_LO}"
            ),
            F.lit(_PSI_BINS - 1).cast("bigint"),
        ).alias("bin"),
    )
    base = (
        binned.filter(F.col("yr") == 1992)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nb"))
    )
    tb_t = base.agg(F.sum("nb").cast("bigint").alias("tb"))
    cur = (
        binned.filter(F.col("yr") > 1992)
        .groupBy("month", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nc"))
    )
    tc_t = cur.groupBy("month").agg(F.sum("nc").cast("bigint").alias("tc"))
    terms = (
        cur.join(F.broadcast(tc_t), "month")
        .join(F.broadcast(base), "bin", "left")
        .crossJoin(F.broadcast(tb_t))
        .select("month", "tc", F.coalesce(F.expr(_PSI_TERM_E8), F.lit(0)).alias("term_e8"))
    )
    monthly = terms.groupBy("month").agg(
        F.max("tc").cast("bigint").alias("n_orders"),
        F.sum("term_e8").cast("bigint").alias("psi_e8"),
    )
    return monthly.select(
        "month", "n_orders", "psi_e8",
        F.expr("cast(case when psi_e8 > 20000000 then 1 else 0 end as int)")
        .alias("drift_flag"),
    ).orderBy("month")


# ---------------------------------------------------------------------------
# Neyman-allocation stratified sample (variance-proportional, deterministic)
# ---------------------------------------------------------------------------

_NEYMAN_BUDGET = 500
# population std from exact integer sums, one shared-text IEEE expression;
# stratum weight N_h * S_h staged to an exact milli-unit bigint
_NEYMAN_W = (
    "CAST(round(CAST(n_pop AS DOUBLE)"
    " * sqrt(CAST(sxx AS DOUBLE) / n_pop"
    "        - (CAST(sx AS DOUBLE) / n_pop) * (CAST(sx AS DOUBLE) / n_pop))"
    " * 1000) AS BIGINT)"
)


@register(
    "neyman_allocation_sample",
    f"""
    WITH s AS (
      SELECT o_orderpriority AS stratum,
             CAST(count(*) AS BIGINT) AS n_pop,
             CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS sx,
             CAST(sum(CAST(round(o_totalprice) AS BIGINT)
                      * CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS sxx
      FROM orders GROUP BY 1),
    w AS (SELECT stratum, n_pop, {_NEYMAN_W} AS w_milli FROM s),
    tw AS (SELECT CAST(sum(w_milli) AS BIGINT) AS tot FROM w),
    alloc AS (
      SELECT stratum, n_pop,
             CAST(w_milli * {_NEYMAN_BUDGET} // tw.tot AS BIGINT) AS n_h
      FROM w CROSS JOIN tw),
    ranked AS (
      SELECT o_orderpriority AS stratum, o_orderkey,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                                                || '#53'), 1, 15) AS BIGINT),
                        o_orderkey) AS rk
      FROM orders)
    SELECT r.stratum, a.n_pop, a.n_h, r.o_orderkey, CAST(r.rk AS BIGINT) AS rk
    FROM ranked r JOIN alloc a USING (stratum)
    WHERE r.rk <= a.n_h
    """,
)
def neyman_allocation_sample(spark, sf_dir):
    """Neyman-allocation stratified sampling: the {_NEYMAN_BUDGET}-row
    budget splits across strata proportional to N_h * S_h (population x
    std), the allocation that minimizes the variance of the stratified
    mean — the statistically-correct alternative to proportional
    quota_sample when strata have very different spreads. The data-
    curation use: sample validation docs per source weighted by how
    heterogeneous each source is.

    Stage 1 computes per-stratum (N, sum, sum-of-squares) in ONE map-side
    aggregate (exact bigints in whole dollars — sxx <= N*3.6e9 holds to
    sf~100); the std and weight are one shared-text double staged to a
    milli bigint; allocations are integer floor-divisions of a broadcast
    total. Stage 2 draws the sample by deterministic md5 priority with a
    row_number window PARTITIONED by stratum (data-grain but partitioned —
    at 100 TB this is the standard per-group top-k; a rank-limit pushdown
    via TakeOrdered-per-key would replace it if strata counts were huge).
    The allocation join is stratum-grain, broadcastable."""
    orders = _t(spark, sf_dir, "orders")
    x = F.round(F.col("o_totalprice")).cast("bigint")
    s = orders.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pop"),
        F.sum(x).cast("bigint").alias("sx"),
        F.sum(x * x).cast("bigint").alias("sxx"),
    )
    w = s.select("stratum", "n_pop", F.expr(_NEYMAN_W).alias("w_milli"))
    tw = w.agg(F.sum("w_milli").cast("bigint").alias("tot"))
    alloc = w.crossJoin(F.broadcast(tw)).select(
        "stratum", "n_pop",
        F.expr(f"w_milli * {_NEYMAN_BUDGET} div tot").alias("n_h"),
    )
    ranked = orders.select(
        F.col("o_orderpriority").alias("stratum"),
        "o_orderkey",
        F.row_number().over(
            Window.partitionBy("o_orderpriority").orderBy(
                md5_long(F.col("o_orderkey"), seed=53), F.col("o_orderkey")
            )
        ).cast("bigint").alias("rk"),
    )
    return (
        ranked.join(F.broadcast(alloc), "stratum")
        .filter(F.col("rk") <= F.col("n_h"))
        .select("stratum", "n_pop", "n_h", "o_orderkey", "rk")
    )


# ---------------------------------------------------------------------------
# UCB1 bandit allocation over event-type arms
# ---------------------------------------------------------------------------

_UCB_EXPR = (
    "round(CAST(c AS DOUBLE) / n_i"
    " + sqrt(2 * ln(CAST(n_t AS DOUBLE)) / n_i), 6)"
)


@register(
    "ucb_variant_allocation",
    f"""
    WITH arms AS (
      SELECT event_type AS arm,
             CAST(count(*) AS BIGINT) AS n_i,
             CAST(count(*) FILTER (value > 50.0) AS BIGINT) AS c
      FROM events GROUP BY 1),
    tot AS (SELECT CAST(sum(n_i) AS BIGINT) AS n_t FROM arms),
    scored AS (
      SELECT arm, n_i, c,
             CAST(c * 1000000 // n_i AS BIGINT) AS mean_ppm,
             {_UCB_EXPR} AS ucb
      FROM arms CROSS JOIN tot),
    best AS (SELECT max(ucb) AS mx FROM scored)
    SELECT arm, n_i, c, mean_ppm, ucb,
           CAST(CASE WHEN ucb = best.mx THEN 1 ELSE 0 END AS INT) AS pull_next
    FROM scored CROSS JOIN best
    """,
)
def ucb_variant_allocation(spark, sf_dir):
    """UCB1 bandit scores per arm (event type, binary reward = value over
    50): mean reward + sqrt(2 ln N / n_i), the optimism bonus that decides
    which variant an adaptive experiment pulls next. The pipeline
    analogue: adaptively allocating labeling/eval budget across data
    sources by observed quality yield.

    One conditional aggregate collapses to arm grain; the exploration
    bonus is a shared-text IEEE expression over exact counts rounded to
    6dp (ln over an exact bigint — the weighted_sample_topk precedent);
    the argmax flag compares ROUNDED values so both engines agree at ties.
    N and the best score are 1-row broadcasts."""
    ev = _t(spark, sf_dir, "events")
    arms = ev.groupBy(F.col("event_type").alias("arm")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.count_if(F.col("value") > 50.0).cast("bigint").alias("c"),
    )
    tot = arms.agg(F.sum("n_i").cast("bigint").alias("n_t"))
    scored = arms.crossJoin(F.broadcast(tot)).select(
        "arm", "n_i", "c",
        F.expr("c * 1000000 div n_i").alias("mean_ppm"),
        F.expr(_UCB_EXPR).alias("ucb"),
    )
    best = scored.agg(F.max("ucb").alias("mx"))
    return scored.crossJoin(F.broadcast(best)).select(
        "arm", "n_i", "c", "mean_ppm", "ucb",
        F.expr("cast(case when ucb = mx then 1 else 0 end as int)")
        .alias("pull_next"),
    )


# ---------------------------------------------------------------------------
# STREAMING exact dedup under at-least-once replay (dropDuplicates state)
# ---------------------------------------------------------------------------

@register(
    "streaming_dedup_replay",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events GROUP BY event_type
    """,
)
def streaming_dedup_replay(spark, sf_dir):
    """STREAMING exact dedup under at-least-once delivery: the events
    fixture is replayed TWICE (two files in the stream directory — the
    replayed-partition failure mode the reference's daily re-runs create),
    flows through ``streaming_dedup`` (withWatermark + dropDuplicates on
    event_id — streaming/runner.py:108), and the first-seen rows land in
    an append-mode sink. The rollup over the sink must equal the
    single-copy batch aggregate EXACTLY — duplicates contribute nothing.

    State is keyed by event_id and watermark-evictable in production
    (keys older than the watermark cannot recur and are dropped); append
    mode emits each first arrival immediately, so no aggregate state
    rides the stream — the rollup is a plain batch groupBy over the sink.
    Ref lineage: the reference's idempotent per-partition merge
    (mssql_to_postgresql_orders_daily.py) is the batch twin of this."""
    import os
    import uuid

    from pyspark.sql.types import LongType, TimestampNTZType

    from etl_mssql_to_postgres_dailysync_spark.streaming.runner import streaming_dedup

    stage = f"/tmp/spark_graft_sdre_{sf_dir.strip('/').replace('/', '_')}"
    os.makedirs(stage, exist_ok=True)
    for copy in ("a", "b"):  # the same data twice = at-least-once replay
        link = f"{stage}/events_{copy}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{sf_dir}/events.parquet", link)
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = spark.readStream.schema(batch.schema).parquet(stage).select(
        "event_id", "ts", "event_type", "value"
    )
    if isinstance(batch.schema["ts"].dataType, LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(batch.schema["ts"].dataType, TimestampNTZType):
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    deduped = streaming_dedup(stream, ["event_id"], ts_col="ts", watermark="1 hour")
    sink = f"streaming_dedup_replay_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint")
        .alias("value_cents"),
    )


# ---------------------------------------------------------------------------
# Co-purchase graph degree distribution + log-log power-law fit
# ---------------------------------------------------------------------------

_POWERLAW_SLOPE = (
    "round((CAST(np AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / (CAST(np AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)"
)


@register(
    "copurchase_degree_powerlaw",
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem),
    edges AS (
      SELECT DISTINCT a.item AS u, b.item AS v
      FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item),
    deg AS (
      SELECT u AS item, count(*) AS d FROM (
        SELECT u FROM edges UNION ALL SELECT v FROM edges) AS e(u)
      GROUP BY 1),
    dist AS (SELECT d, CAST(count(*) AS BIGINT) AS n_d FROM deg GROUP BY 1),
    pts AS (
      SELECT CAST(round(ln(CAST(d AS DOUBLE)) * 1000) AS BIGINT) AS x,
             CAST(round(ln(CAST(n_d AS DOUBLE)) * 1000) AS BIGINT) AS y
      FROM dist WHERE d > 0),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS np,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM pts),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n_parts,
                 CAST(max(d) AS BIGINT) AS max_degree,
                 CAST(sum(d) AS BIGINT) AS sum_degree
          FROM deg)
    SELECT g.n_parts, g.max_degree, g.sum_degree // 2 AS n_edges, s.np AS n_points,
           {_POWERLAW_SLOPE} AS slope_loglog
    FROM s CROSS JOIN g
    """,
)
def copurchase_degree_powerlaw(spark, sf_dir):
    """Degree distribution of the part co-purchase graph with a log-log
    OLS slope — the scale-free-ness screen run on any similarity/co-occur
    graph before graph algorithms (a heavy-tailed degree distribution is
    what makes naive pair enumeration blow up; the slope quantifies it).
    Shares the basket-bounded edge generation with frequent_itemset_pairs
    (per-basket quadratic, corpus-linear); degrees come from one UNION ALL
    + groupBy at item grain, the distribution from a second groupBy at
    DEGREE grain (bounded by max degree, not item count).

    The fit stages ln(degree), ln(count) to exact milli-nat bigints
    (shared-text, the text_zipf_fit convention), so the OLS sufficient
    sums are order-independent integers; only the final slope is a
    double, one shared expression rounded 6dp."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(b, (F.col("a.basket") == F.col("b.basket"))
               & (F.col("a.item") < F.col("b.item")))
        .select(F.col("a.item").alias("u"), F.col("b.item").alias("v"))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("item"))
        .unionAll(edges.select(F.col("v").alias("item")))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    dist = deg.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("n_d"))
    pts = dist.filter(F.col("d") > 0).select(
        F.expr("CAST(round(ln(CAST(d AS DOUBLE)) * 1000) AS BIGINT)").alias("x"),
        F.expr("CAST(round(ln(CAST(n_d AS DOUBLE)) * 1000) AS BIGINT)").alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("np"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    g = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.max("d").cast("bigint").alias("max_degree"),
        F.sum("d").cast("bigint").alias("sum_degree"),
    )
    return s.crossJoin(F.broadcast(g)).select(
        "n_parts", "max_degree",
        F.expr("sum_degree div 2").alias("n_edges"),
        F.col("np").alias("n_points"),
        F.expr(_POWERLAW_SLOPE).alias("slope_loglog"),
    )


# ---------------------------------------------------------------------------
# Quantile normalization mapping (per-source deciles -> pooled deciles)
# ---------------------------------------------------------------------------

@register(
    "quantile_normalization_map",
    r"""
    WITH lens AS (
      SELECT source, doc_id,
             CAST(CASE WHEN trim(text) = '' THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                  AS BIGINT) AS x
      FROM documents),
    r AS (SELECT source, x,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY x ASC, doc_id ASC) AS rn,
                 count(*) OVER (PARTITION BY source) AS n
          FROM lens),
    g AS (SELECT x,
                 row_number() OVER (ORDER BY x ASC, source ASC, doc_id ASC) AS rn,
                 count(*) OVER () AS n
          FROM lens),
    p AS (SELECT unnest(generate_series(1, 9)) AS dec),
    src AS (
      SELECT r.source, p.dec, r.x AS src_value
      FROM r JOIN p ON r.rn = (p.dec * r.n + 9) // 10),
    pool AS (
      SELECT p.dec, g.x AS pooled_value
      FROM g JOIN p ON g.rn = (p.dec * g.n + 9) // 10)
    SELECT s.source, CAST(s.dec AS INT) AS decile, s.src_value, o.pooled_value,
           s.src_value - o.pooled_value AS shift
    FROM src s JOIN pool o USING (dec)
    """,
)
def quantile_normalization_map(spark, sf_dir):
    """Quantile-normalization mapping table: each source's doc-length
    deciles next to the POOLED corpus deciles — the batch-effect-removal
    recipe (map a value at source decile d onto the pooled decile-d value)
    used to make per-source length/quality distributions comparable before
    mixing. `shift` localizes WHERE a source's distribution sits above or
    below the corpus.

    Per-source ranks are key-partitioned windows (group-sized tasks, the
    grouped_percentiles shape); the pooled rank uses the engine's
    TWO-PHASE global row_number (operators/cumsum.py:95 — range exchange +
    per-partition local rank + broadcast offsets), never a one-task global
    window; decile targets ride a 9-row exploded literal with
    percentile_disc rank arithmetic ((d*n+9) div 10, ties by doc_id)."""
    docs = _t(spark, sf_dir, "documents")
    lens = docs.select(
        "source", "doc_id",
        text.token_count(F.col("text")).cast("bigint").alias("x"),
    )
    wp = Window.partitionBy("source").orderBy(F.col("x").asc(), F.col("doc_id").asc())
    r = lens.select(
        "source", "x",
        F.row_number().over(wp).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )
    from etl_mssql_to_postgres_dailysync_spark.operators.cumsum import global_row_number

    ranked, n_total = global_row_number(
        lens.select("x", "source", "doc_id"), ["x", "source", "doc_id"],
        out_col="rn",
    )
    g = ranked.select("x", "rn", F.lit(n_total).cast("bigint").alias("n"))
    p = spark.range(1, 10).select(F.col("id").alias("dec"))
    src = (
        r.crossJoin(F.broadcast(p))
        .filter(F.col("rn") == F.expr("(dec * n + 9) div 10"))
        .select("source", "dec", F.col("x").alias("src_value"))
    )
    pool = (
        g.crossJoin(F.broadcast(p))
        .filter(F.col("rn") == F.expr("(dec * n + 9) div 10"))
        .select("dec", F.col("x").alias("pooled_value"))
    )
    return src.join(F.broadcast(pool), "dec").select(
        "source",
        F.col("dec").cast("int").alias("decile"),
        "src_value", "pooled_value",
        (F.col("src_value") - F.col("pooled_value")).alias("shift"),
    )


# ---------------------------------------------------------------------------
# Logistic-model calibration curve + Brier / log-loss (shares the IRLS fit)
# ---------------------------------------------------------------------------

def _lr_cal_oracle_sql() -> str:
    """Reuses the full unrolled IRLS CTE chain, then buckets the final
    scores into probability deciles and emits reliability-diagram rows
    with model-level Brier and log-loss repeated per row (all integer
    staged: per-row squared error in ppm, per-row -ln(p) in micro-nats)."""
    step = ", ".join(f"{e} AS {c}" for c, e in _lr_step_cols("//"))
    nb = _lr_newton_exprs()
    aggs = ", ".join(f"{v} AS {k}" for k, v in _LR_AGGS.items())
    ctes = ["b0_cte AS (SELECT CAST(0 AS BIGINT) AS b0, CAST(0 AS BIGINT) AS b1,"
            " CAST(0 AS BIGINT) AS b2)"]
    prev = "b0_cte"
    for t in range(1, _LR_ITERS + 1):
        ctes.append(f"""
    sc{t} AS (SELECT y, x1, x2, {step} FROM feats CROSS JOIN {prev}),
    ag{t} AS (SELECT {aggs} FROM sc{t}),
    b{t}_cte AS MATERIALIZED (
        SELECT {nb['nb0']} AS b0, {nb['nb1']} AS b1, {nb['nb2']} AS b2
        FROM ag{t} CROSS JOIN {prev})""")
        prev = f"b{t}_cte"
    return f"""
    WITH feats AS MATERIALIZED (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y,
             CAST(round(o_totalprice) AS BIGINT) // 1000 AS x1,
             CAST(year(CAST(o_orderdate AS DATE)) - 1992 AS BIGINT) AS x2
      FROM orders),
    {",".join(ctes)},
    final AS (
      SELECT y, {step},
             least(p_ppm * 10 // 1000000, 9) AS bucket,
             (p_ppm - y * 1000000) * (p_ppm - y * 1000000) // 1000000 AS sqerr_ppm,
             CAST(round(-ln(CAST(CASE WHEN y = 1 THEN p_ppm
                                      ELSE 1000000 - p_ppm END AS DOUBLE)
                            / 1000000) * 1000000) AS BIGINT) AS nll_micro
      FROM feats CROSS JOIN {prev}),
    model AS (
      SELECT CAST(sum(sqerr_ppm) // count(*) AS BIGINT) AS brier_ppm,
             CAST(sum(nll_micro) // count(*) AS BIGINT) AS logloss_micro
      FROM final)
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(p_ppm) // count(*) AS BIGINT) AS mean_p_ppm,
           CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS obs_rate_ppm,
           CAST(sum(p_ppm) // count(*)
                - sum(y) * 1000000 // count(*) AS BIGINT) AS gap_ppm,
           model.brier_ppm, model.logloss_micro
    FROM final CROSS JOIN model
    GROUP BY bucket, model.brier_ppm, model.logloss_micro
    ORDER BY bucket
    """


@register("logistic_calibration_quality", _lr_cal_oracle_sql())
def logistic_calibration_quality(spark, sf_dir):
    """Reliability diagram + proper scoring rules for the IRLS logistic
    model: per probability-decile bucket, mean predicted vs observed rate
    (the calibration gap a quality-classifier gate must audit before its
    threshold means anything), with model-level Brier score and log-loss
    repeated per row (single-query contract; both are INTEGER means —
    per-row squared error staged to ppm, per-row -ln(p) to micro-nats, so
    the sums are order-independent and exact on both engines; p is never
    0 or 1 by the sigmoid's +-8 clip, so ln is total).

    Refits with the same bounded-collect Newton iterations as
    logistic_regression_irls (shared helpers — identical beta by
    construction), then ONE extra scan buckets and scores. The bucket
    aggregate is 10 rows; the model row is a broadcast."""
    from decimal import ROUND_HALF_UP, Decimal

    orders = _t(spark, sf_dir, "orders")
    feats = orders.select(
        F.expr(
            "cast(case when o_orderpriority in ('1-URGENT', '2-HIGH')"
            " then 1 else 0 end as bigint)"
        ).alias("y"),
        F.expr("cast(round(o_totalprice) as bigint) div 1000").alias("x1"),
        F.expr("cast(year(cast(o_orderdate as date)) - 1992 as bigint)").alias("x2"),
    ).localCheckpoint()
    step_cols = _lr_step_cols("div")

    def scored_from(b):
        sc = (
            feats.withColumn("b0", F.lit(b[0]).cast("bigint"))
            .withColumn("b1", F.lit(b[1]).cast("bigint"))
            .withColumn("b2", F.lit(b[2]).cast("bigint"))
        )
        for c, e in step_cols:
            sc = sc.withColumn(c, F.expr(e))
        return sc

    def rhu(x: float) -> int:
        return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    beta = [0, 0, 0]
    for _ in range(_LR_ITERS):
        a = scored_from(beta).agg(
            *[F.expr(v).alias(k) for k, v in _LR_AGGS.items()]
        ).collect()[0]
        h11, h12, h13 = float(a["h11"]), float(a["h12"]), float(a["h13"])
        h22, h23, h33 = float(a["h22"]), float(a["h23"]), float(a["h33"])
        g1, g2, g3 = float(a["g1"]), float(a["g2"]), float(a["g3"])
        det = (h11 * (h22 * h33 - h23 * h23)
               - h12 * (h12 * h33 - h23 * h13)
               + h13 * (h12 * h23 - h22 * h13))
        d1 = (g1 * (h22 * h33 - h23 * h23)
              - h12 * (g2 * h33 - h23 * g3)
              + h13 * (g2 * h23 - h22 * g3))
        d2 = (h11 * (g2 * h33 - g3 * h23)
              - g1 * (h12 * h33 - h23 * h13)
              + h13 * (h12 * g3 - g2 * h13))
        d3 = (h11 * (h22 * g3 - h23 * g2)
              - h12 * (h12 * g3 - g2 * h13)
              + g1 * (h12 * h23 - h22 * h13))
        beta = [
            beta[0] + rhu(d1 / det * _LR_S),
            beta[1] + rhu(d2 / det * _LR_S),
            beta[2] + rhu(d3 / det * _LR_S),
        ]
    final = scored_from(beta).select(
        "y", "p_ppm",
        F.expr("least(p_ppm * 10 div 1000000, 9)").alias("bucket"),
        F.expr(
            "(p_ppm - y * 1000000) * (p_ppm - y * 1000000) div 1000000"
        ).alias("sqerr_ppm"),
        F.expr(
            "cast(round(-ln(cast(case when y = 1 then p_ppm"
            " else 1000000 - p_ppm end as double) / 1000000) * 1000000) as bigint)"
        ).alias("nll_micro"),
    )
    model = final.agg(
        F.expr("cast(sum(sqerr_ppm) div count(*) as bigint)").alias("brier_ppm"),
        F.expr("cast(sum(nll_micro) div count(*) as bigint)").alias("logloss_micro"),
    )
    return (
        final.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.expr("cast(sum(p_ppm) div count(*) as bigint)").alias("mean_p_ppm"),
            F.expr("cast(sum(y) * 1000000 div count(*) as bigint)").alias("obs_rate_ppm"),
            F.expr(
                "cast(sum(p_ppm) div count(*)"
                " - sum(y) * 1000000 div count(*) as bigint)"
            ).alias("gap_ppm"),
        )
        .crossJoin(F.broadcast(model))
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            "n", "mean_p_ppm", "obs_rate_ppm", "gap_ppm",
            "brier_ppm", "logloss_micro",
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (rational integer staging, no float saturation)
# ---------------------------------------------------------------------------

_BM25_DF_LO, _BM25_DF_HI, _BM25_NQ, _BM25_K = 10, 200, 5, 20
# k1 = 6/5, b = 3/4 kept RATIONAL: the per-term score
# idf * tf(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) becomes
# idf_milli * 11 * tf * 1e6 // (5 * tf * 1e6 + 6 * norm_micro), an exact
# integer once norm_micro = 250000 + 750000 * dl * n_docs // total_len
_BM25_TERM = (
    "idf_milli * 11 * tf * 1000000 // (5 * tf * 1000000 + 6 * norm_micro)"
)


@register(
    "bm25_retrieval_topk",
    rf"""
    WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
                WHERE trim(text) <> ''),
    ex AS (SELECT doc_id, unnest(tk) AS t FROM tk),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM ex GROUP BY 1),
    n_t AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(dl) AS BIGINT) AS total_len
            FROM dl),
    tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM ex GROUP BY 1, 2),
    dfreq AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    qterms AS (
      SELECT t, df FROM dfreq
      WHERE df BETWEEN {_BM25_DF_LO} AND {_BM25_DF_HI}
      ORDER BY df DESC, t ASC LIMIT {_BM25_NQ}),
    idf AS (
      SELECT t, CAST(round(ln((CAST(n_docs AS DOUBLE) - df + 0.5)
                              / (CAST(df AS DOUBLE) + 0.5) + 1) * 1000) AS BIGINT)
                  AS idf_milli
      FROM qterms CROSS JOIN n_t),
    scored AS (
      SELECT tf.doc_id,
             CAST(sum({_BM25_TERM}) AS BIGINT) AS score_milli,
             CAST(count(*) AS BIGINT) AS n_terms_hit
      FROM tf
      JOIN idf USING (t)
      JOIN (SELECT doc_id, 250000 + 750000 * dl.dl * n_t.n_docs // n_t.total_len
                     AS norm_micro
            FROM dl CROSS JOIN n_t) nrm USING (doc_id)
      GROUP BY 1)
    SELECT doc_id, score_milli, n_terms_hit FROM scored
    ORDER BY score_milli DESC, doc_id ASC LIMIT {_BM25_K}
    """,
)
def bm25_retrieval_topk(spark, sf_dir):
    """BM25 ranked retrieval — THE sparse-retrieval scoring function —
    over the corpus inverted index, for a deterministic query (the
    {_BM25_NQ} highest-df terms inside the df band
    [{_BM25_DF_LO}, {_BM25_DF_HI}]; a fixed literal query cannot exist on
    synthetic vocab). Okapi parameters stay RATIONAL (k1 = 6/5, b = 3/4),
    so the entire tf-saturation + length-normalization pipeline is exact
    integer arithmetic: norm_micro = (1-b) + b*dl/avgdl in micro units via
    one floor division, the per-term score one integer expression, the
    per-doc score an order-independent integer sum — the only double is
    inside the idf constant, staged to milli-nats at term grain
    ({_BM25_NQ} values). Postings touch ONLY the query terms (the idf
    join prunes the tf table before any scoring); doc-length norms join
    at doc grain; top-{_BM25_K} is a TakeOrdered. At 100 TB the inverted
    index is the precomputed asset and the per-query cost is
    |postings(query terms)| — the same posting-pruned shape as
    tfidf_cosine_pairs."""
    docs = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    ex = docs.select(
        "doc_id", F.explode(F.split(text.normalize(F.col("text")), " ")).alias("t")
    )
    dl = ex.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    n_t = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    )
    tf = ex.groupBy("doc_id", "t").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    qterms = (
        dfreq.filter(F.col("df").between(_BM25_DF_LO, _BM25_DF_HI))
        .orderBy(F.col("df").desc(), F.col("t").asc())
        .limit(_BM25_NQ)
    )
    idf = qterms.crossJoin(F.broadcast(n_t)).select(
        "t",
        F.expr(
            "cast(round(ln((cast(n_docs as double) - df + 0.5)"
            " / (cast(df as double) + 0.5) + 1) * 1000) as bigint)"
        ).alias("idf_milli"),
    )
    nrm = dl.crossJoin(F.broadcast(n_t)).select(
        "doc_id",
        F.expr("250000 + 750000 * dl * n_docs div total_len").alias("norm_micro"),
    )
    scored = (
        tf.join(F.broadcast(idf), "t")
        .join(nrm, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr(_BM25_TERM.replace("//", "div"))).cast("bigint")
            .alias("score_milli"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
        )
    )
    return scored.orderBy(
        F.col("score_milli").desc(), F.col("doc_id").asc()
    ).limit(_BM25_K)


# ---------------------------------------------------------------------------
# Markov removal-effect attribution (truncated absorption, exact integers)
# ---------------------------------------------------------------------------

_MKV_CHANNELS = ["click", "error", "signup", "view"]
_MKV_STEPS = 8


def _mkv_scenario_ctes(tag: str, blocked: str | None) -> str:
    """Unrolled truncated-absorption matvec for one scenario: v starts as
    1e6 on 'start'; each step floors sum(v*p)/1e6 once per target state
    and accumulates the purchase inflow. Blocking a channel removes every
    transition INTO it (the standard removal-effect surgery — entry
    blocked means its outgoing mass never exists)."""
    blk = f" AND p.to_s <> '{blocked}'" if blocked else ""
    ctes = [f"v{tag}_0 AS (SELECT 'start' AS s, CAST(1000000 AS BIGINT) AS v)",
            f"c{tag}_0 AS (SELECT CAST(0 AS BIGINT) AS c)"]
    for k in range(1, _MKV_STEPS + 1):
        ctes.append(f"""
    v{tag}_{k} AS MATERIALIZED (
      SELECT p.to_s AS s, CAST(sum(v.v * p.p_ppm) // 1000000 AS BIGINT) AS v
      FROM v{tag}_{k - 1} v JOIN pmat p ON p.from_s = v.s
      WHERE p.to_s NOT IN ('purchase', 'drop'){blk}
      GROUP BY 1),
    c{tag}_{k} AS MATERIALIZED (
      SELECT c{tag}_{k - 1}.c + coalesce(
        (SELECT CAST(sum(v.v * p.p_ppm) // 1000000 AS BIGINT)
         FROM v{tag}_{k - 1} v JOIN pmat p
           ON p.from_s = v.s AND p.to_s = 'purchase'), 0) AS c
      FROM c{tag}_{k - 1})""")
    return ",".join(ctes)


def _mkv_oracle_sql() -> str:
    scen = [_mkv_scenario_ctes("f", None)]
    for ch in _MKV_CHANNELS:
        scen.append(_mkv_scenario_ctes(ch, ch))
    finals = ", ".join(
        [f"(SELECT c FROM cf_{_MKV_STEPS}) AS conv_full"]
        + [f"(SELECT c FROM c{ch}_{_MKV_STEPS}) AS conv_wo_{ch}"
           for ch in _MKV_CHANNELS]
    )
    chan_rows = ", ".join(f"('{c}')" for c in _MKV_CHANNELS)
    rem = ("CASE WHEN conv_full > 0 THEN greatest(conv_full - conv_wo, 0)"
           " * 1000000 // conv_full ELSE 0 END")
    return f"""
    WITH ord AS (
      SELECT user_id, ts, event_id, event_type,
             lag(ts) OVER w AS pts, lag(event_type) OVER w AS ptype,
             lead(ts) OVER w AS nts, lead(event_type) OVER w AS ntype
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    flag AS (
      SELECT *,
             CASE WHEN pts IS NULL OR ts - pts > INTERVAL 30 MINUTE
                       OR ptype = 'purchase' THEN 1 ELSE 0 END AS new_j,
             CASE WHEN nts IS NULL OR nts - ts > INTERVAL 30 MINUTE
                       OR event_type = 'purchase' THEN 1 ELSE 0 END AS final_j
      FROM ord),
    trans AS (
      SELECT CASE WHEN new_j = 1 THEN 'start' ELSE ptype END AS from_s,
             event_type AS to_s
      FROM flag
      UNION ALL
      SELECT event_type, 'drop' FROM flag
      WHERE final_j = 1 AND event_type <> 'purchase'),
    cnt AS (SELECT from_s, to_s, CAST(count(*) AS BIGINT) AS n
            FROM trans GROUP BY 1, 2),
    ft AS (SELECT from_s, CAST(sum(n) AS BIGINT) AS tot FROM cnt GROUP BY 1),
    pmat AS MATERIALIZED (
      SELECT c.from_s, c.to_s, c.n,
             CAST(c.n * 1000000 // f.tot AS BIGINT) AS p_ppm
      FROM cnt c JOIN ft f USING (from_s)),
    {",".join(scen)},
    finals AS (SELECT {finals}),
    chans AS (
      SELECT ch.channel, f.conv_full,
             CASE ch.channel
               {" ".join(f"WHEN '{c}' THEN f.conv_wo_{c}" for c in _MKV_CHANNELS)}
             END AS conv_wo
      FROM (VALUES {chan_rows}) AS ch(channel) CROSS JOIN finals f),
    scored AS (
      SELECT channel, conv_full, conv_wo, {rem} AS removal_ppm FROM chans),
    tot_rem AS (SELECT CAST(sum(removal_ppm) AS BIGINT) AS tr FROM scored),
    n_in AS (SELECT to_s AS channel, CAST(sum(n) AS BIGINT) AS n_transitions_in
             FROM cnt GROUP BY 1)
    SELECT s.channel, coalesce(i.n_transitions_in, 0) AS n_transitions_in,
           s.conv_full AS conv_full_ppm, s.conv_wo AS conv_without_ppm,
           s.removal_ppm,
           CAST(CASE WHEN t.tr > 0 THEN s.removal_ppm * 1000000 // t.tr
                     ELSE 0 END AS BIGINT) AS attribution_ppm
    FROM scored s
    LEFT JOIN n_in i USING (channel)
    CROSS JOIN tot_rem t
    ORDER BY s.channel
    """


@register("attribution_markov_removal", _mkv_oracle_sql())
def attribution_markov_removal(spark, sf_dir):
    """Markov-chain removal-effect attribution — the principled
    alternative to the heuristic first/last/linear splits in
    attribution_multi_touch: fit the journey transition matrix (state =
    event type, 'start' opens each journey, entering 'purchase' absorbs
    as conversion, inactivity gaps or journey end absorb as 'drop'),
    compute the start->conversion probability by {_MKV_STEPS}-step
    truncated absorption, and attribute each channel by how much that
    probability drops when every transition INTO the channel is removed
    (Shapley-lite; shares normalized over removals).

    Distributed/driver split is the engine's standard: journeys and the
    transition counts are ONE window pass + a groupBy at state-pair
    grain (<= 7x7 rows at ANY data size — at 100 TB that is still 49
    rows); the matrix then comes back as a BOUNDED collect and the five
    matvec scenarios run in exact integer Python (sum-then-floor each
    step, identical to the oracle's unrolled CTE chain), re-entering the
    plan as a literal result spine. Truncated absorption at {_MKV_STEPS}
    steps is the documented estimator: the tail mass still in play after
    {_MKV_STEPS} hops is < (max non-absorbing row-sum)^{_MKV_STEPS},
    negligible for gap-broken journeys."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordx = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.lag("ts").over(w).alias("pts"),
        F.lag("event_type").over(w).alias("ptype"),
        F.lead("ts").over(w).alias("nts"),
        F.lead("event_type").over(w).alias("ntype"),
    )
    gap = F.expr("INTERVAL 30 MINUTES")
    flag = ordx.withColumn(
        "new_j",
        F.when(
            F.col("pts").isNull() | (F.col("ts") - F.col("pts") > gap)
            | (F.col("ptype") == "purchase"), 1
        ).otherwise(0),
    ).withColumn(
        "final_j",
        F.when(
            F.col("nts").isNull() | (F.col("nts") - F.col("ts") > gap)
            | (F.col("event_type") == "purchase"), 1
        ).otherwise(0),
    )
    trans = flag.select(
        F.when(F.col("new_j") == 1, F.lit("start")).otherwise(F.col("ptype"))
        .alias("from_s"),
        F.col("event_type").alias("to_s"),
    ).unionByName(
        flag.filter((F.col("final_j") == 1) & (F.col("event_type") != "purchase"))
        .select(
            F.col("event_type").alias("from_s"), F.lit("drop").alias("to_s")
        )
    )
    cnt = trans.groupBy("from_s", "to_s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # state-pair grain: <= 7x7 rows regardless of volume — bounded collect
    rows = cnt.collect()
    counts = {(r["from_s"], r["to_s"]): r["n"] for r in rows}
    tot = {}
    for (f, _), n in counts.items():
        tot[f] = tot.get(f, 0) + n
    p = {k: n * 1_000_000 // tot[k[0]] for k, n in counts.items()}

    def absorbed(blocked: str | None) -> int:
        v = {"start": 1_000_000}
        conv = 0
        for _ in range(_MKV_STEPS):
            inflow: dict[str, int] = {}
            conv_add = 0
            for (f, t), pp in p.items():
                if f not in v:
                    continue
                if t == "purchase":
                    conv_add += v[f] * pp
                elif t != "drop" and t != blocked:
                    inflow[t] = inflow.get(t, 0) + v[f] * pp
            conv += conv_add // 1_000_000
            v = {t: s // 1_000_000 for t, s in inflow.items() if s // 1_000_000 > 0}
        return conv

    # NOTE: python floors the SUM once per (step, target) exactly like the
    # oracle's sum-then-// — but v entries that floor to 0 are dropped on
    # both sides (a 0 row contributes nothing either way)
    conv_full = absorbed(None)
    rem = {}
    wo = {}
    for ch in _MKV_CHANNELS:
        wo[ch] = absorbed(ch)
        rem[ch] = (
            max(conv_full - wo[ch], 0) * 1_000_000 // conv_full
            if conv_full > 0 else 0
        )
    tr = sum(rem.values())
    n_in = {}
    for (f, t), n in counts.items():
        n_in[t] = n_in.get(t, 0) + n
    out = [
        (
            ch, n_in.get(ch, 0), conv_full, wo[ch], rem[ch],
            rem[ch] * 1_000_000 // tr if tr > 0 else 0,
        )
        for ch in _MKV_CHANNELS
    ]
    return spark.createDataFrame(
        out,
        "channel string, n_transitions_in bigint, conv_full_ppm bigint,"
        " conv_without_ppm bigint, removal_ppm bigint, attribution_ppm bigint",
    ).orderBy("channel")


# ---------------------------------------------------------------------------
# 1-D Wasserstein (earth mover's) distance per source vs the pooled corpus
# ---------------------------------------------------------------------------

_W1_BINS = 20
_W1_BINW = 25  # tokens per bin; bin = least(n_tokens div 25, 19)


@register(
    "wasserstein_source_shift",
    rf"""
    WITH lens AS (
      SELECT source,
             least(CAST(CASE WHEN trim(text) = '' THEN 0
                             ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                        AS BIGINT) // {_W1_BINW}, {_W1_BINS - 1}) AS bin
      FROM documents),
    bins AS (SELECT unnest(generate_series(0, {_W1_BINS - 1})) AS bin),
    srcs AS (SELECT DISTINCT source FROM lens),
    grid AS (SELECT s.source, b.bin FROM srcs s CROSS JOIN bins b),
    per AS (
      SELECT g.source, g.bin, CAST(count(l.bin) AS BIGINT) AS n
      FROM grid g LEFT JOIN lens l ON l.source = g.source AND l.bin = g.bin
      GROUP BY 1, 2),
    ptot AS (SELECT source, CAST(sum(n) AS BIGINT) AS nt FROM per GROUP BY 1),
    pool AS (SELECT bin, CAST(sum(n) AS BIGINT) AS n FROM per GROUP BY 1),
    gtot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM pool),
    cdf_s AS (
      SELECT p.source, p.bin,
             sum(p.n * 1000000 // t.nt) OVER (PARTITION BY p.source
                 ORDER BY p.bin ROWS UNBOUNDED PRECEDING) AS cum_ppm
      FROM per p JOIN ptot t USING (source)),
    cdf_g AS (
      SELECT g.bin,
             sum(g.n * 1000000 // t.nt) OVER (ORDER BY g.bin
                 ROWS UNBOUNDED PRECEDING) AS cum_ppm
      FROM pool g CROSS JOIN gtot t)
    SELECT s.source,
           CAST(max(t.nt) AS BIGINT) AS n_docs,
           CAST(sum(abs(s.cum_ppm - g.cum_ppm)) AS BIGINT) AS w1_ppm_bins,
           CAST(sum(abs(s.cum_ppm - g.cum_ppm)) * {_W1_BINW} // {_W1_BINS}
                AS BIGINT) AS w1_tokens_ppm
    FROM cdf_s s JOIN cdf_g g USING (bin) JOIN ptot t USING (source)
    GROUP BY 1
    """,
)
def wasserstein_source_shift(spark, sf_dir):
    """1-D Wasserstein (earth mover's) distance between each source's
    doc-length distribution and the pooled corpus — the transport-cost
    companion to PSI/KS/KL in the drift family: unlike PSI it respects
    bin ADJACENCY (mass moved two bins costs twice as much as one), so it
    ranks 'shifted' sources above 'noisy' ones. In 1-D optimal transport
    collapses to the closed form W1 = integral |CDF_a - CDF_g| — no
    Sinkhorn iterations, no transcendental functions: per-bin ppm masses
    (floor-div), cumulative sums over the {_W1_BINS}-bin grid
    (bin-grain windows partitioned by source), and one exact integer
    |difference| sum. The dense source x bin grid keeps absent bins at
    mass 0 so every CDF has all {_W1_BINS} steps.

    Scale shape: data grain collapses at the first groupBy; everything
    after lives on source x {_W1_BINS} rows. w1_tokens_ppm re-expresses
    the bin-unit distance in expected tokens moved per document."""
    docs = _t(spark, sf_dir, "documents")
    lens = docs.select(
        "source", text.token_count(F.col("text")).cast("bigint").alias("tk")
    ).select(
        "source",
        F.least(
            F.expr(f"tk div {_W1_BINW}"), F.lit(_W1_BINS - 1).cast("bigint")
        ).alias("bin"),
    )
    cnt = lens.groupBy("source", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    srcs = lens.select("source").distinct()
    grid = srcs.crossJoin(F.broadcast(spark.range(0, _W1_BINS)
                                      .select(F.col("id").alias("bin"))))
    per = grid.join(cnt, ["source", "bin"], "left").select(
        "source", "bin", F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n")
    )
    ptot = per.groupBy("source").agg(F.sum("n").cast("bigint").alias("nt"))
    pool = per.groupBy("bin").agg(F.sum("n").cast("bigint").alias("n"))
    gtot = pool.agg(F.sum("n").cast("bigint").alias("nt"))
    ws = Window.partitionBy("source").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cdf_s = (
        per.join(F.broadcast(ptot), "source")
        .select(
            "source", "bin",
            F.sum(F.expr("n * 1000000 div nt")).over(ws).alias("cum_ppm"),
        )
    )
    wg = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cdf_g = (
        pool.crossJoin(F.broadcast(gtot))
        .select(
            "bin",
            F.sum(F.expr("n * 1000000 div nt")).over(wg).alias("gcum_ppm"),
        )
    )
    return (
        cdf_s.join(F.broadcast(cdf_g), "bin")
        .join(F.broadcast(ptot), "source")
        .groupBy("source")
        .agg(
            F.max("nt").cast("bigint").alias("n_docs"),
            F.sum(F.abs(F.col("cum_ppm") - F.col("gcum_ppm"))).cast("bigint")
            .alias("w1_ppm_bins"),
            F.expr(
                f"cast(sum(abs(cum_ppm - gcum_ppm)) * {_W1_BINW}"
                f" div {_W1_BINS} as bigint)"
            ).alias("w1_tokens_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Next-event prediction accuracy of the argmax transition model
# ---------------------------------------------------------------------------

@register(
    "markov_next_event_accuracy",
    """
    WITH ord AS (
      SELECT user_id, ts, event_id, event_type,
             lead(ts) OVER w AS nts, lead(event_type) OVER w AS ntype
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    pairs AS (
      SELECT event_type AS from_s, ntype AS to_s
      FROM ord
      WHERE nts IS NOT NULL AND nts - ts <= INTERVAL 30 MINUTE),
    cnt AS (SELECT from_s, to_s, CAST(count(*) AS BIGINT) AS n
            FROM pairs GROUP BY 1, 2),
    pred AS (
      SELECT from_s, to_s AS predicted FROM (
        SELECT from_s, to_s,
               row_number() OVER (PARTITION BY from_s
                                  ORDER BY n DESC, to_s ASC) AS rk
        FROM cnt)
      WHERE rk = 1)
    SELECT c.from_s,
           CAST(sum(c.n) AS BIGINT) AS n_pairs,
           max(p.predicted) AS predicted,
           CAST(sum(CASE WHEN c.to_s = p.predicted THEN c.n ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(sum(CASE WHEN c.to_s = p.predicted THEN c.n ELSE 0 END)
                * 1000000 // sum(c.n) AS BIGINT) AS accuracy_ppm
    FROM cnt c JOIN pred p USING (from_s)
    GROUP BY 1
    """,
)
def markov_next_event_accuracy(spark, sf_dir):
    """In-sample accuracy of the order-1 Markov next-event predictor:
    for each current event type, predict the modal successor (within the
    30-min session gap) and report how often it is right — the baseline
    every sequence model must beat, and the quick screen for whether
    event streams carry any sequential signal at all (accuracy at the
    majority-class rate means none; see event_transition_entropy for the
    information-theoretic view).

    One window pass makes successor pairs; everything after lives at
    state-pair grain (<= 25 rows). The argmax is deterministic
    (count DESC, label ASC) on both engines; accuracy is an exact
    integer ratio. In-sample by design — the train/test split variant is
    cv_fold_assignment composed upstream."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordx = ev.select(
        "event_type", "ts",
        F.lead("ts").over(w).alias("nts"),
        F.lead("event_type").over(w).alias("ntype"),
    )
    pairs = ordx.filter(
        F.col("nts").isNotNull()
        & (F.col("nts") - F.col("ts") <= F.expr("INTERVAL 30 MINUTES"))
    ).select(F.col("event_type").alias("from_s"), F.col("ntype").alias("to_s"))
    cnt = pairs.groupBy("from_s", "to_s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wp = Window.partitionBy("from_s").orderBy(F.col("n").desc(), F.col("to_s").asc())
    pred = (
        cnt.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") == 1)
        .select("from_s", F.col("to_s").alias("predicted"))
    )
    return (
        cnt.join(F.broadcast(pred), "from_s")
        .groupBy("from_s")
        .agg(
            F.sum("n").cast("bigint").alias("n_pairs"),
            F.max("predicted").alias("predicted"),
            F.sum(F.when(F.col("to_s") == F.col("predicted"), F.col("n")).otherwise(0))
            .cast("bigint").alias("n_correct"),
            F.expr(
                "cast(sum(case when to_s = predicted then n else 0 end)"
                " * 1000000 div sum(n) as bigint)"
            ).alias("accuracy_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (rolling-hash boundaries, insertion-stable)
# ---------------------------------------------------------------------------

_CDC_W = 16   # boundary window (chars)
_CDC_DIV = 64  # boundary when window-hash % DIV == 0 -> ~64-char avg chunks


@register(
    "content_defined_chunking",
    rf"""
    WITH d AS (SELECT doc_id, source, {_NORM_SQL} AS norm FROM documents
               WHERE len(trim(text)) > 0),
    pos AS (
      SELECT doc_id, source, norm,
             unnest(range(1, greatest(len(norm) - {_CDC_W} + 2, 1))) AS i
      FROM d),
    cuts AS (
      SELECT doc_id, source, norm, i + {_CDC_W} - 1 AS cut
      FROM pos
      WHERE {_HASH15.format(x=f"substr(norm, CAST(i AS INT), {_CDC_W})")}
            % {_CDC_DIV} = 0),
    spans AS (
      SELECT doc_id, source, norm, cut,
             coalesce(lag(cut) OVER (PARTITION BY doc_id ORDER BY cut), 0) + 1
               AS start
      FROM cuts
      UNION ALL
      SELECT d.doc_id, d.source, d.norm, len(d.norm) AS cut,
             coalesce((SELECT max(c.cut) FROM cuts c
                       WHERE c.doc_id = d.doc_id), 0) + 1 AS start
      FROM d),
    chunks AS (
      SELECT doc_id, source, cut - start + 1 AS n_chars,
             {_HASH15.format(x="substr(norm, CAST(start AS INT), CAST(cut - start + 1 AS INT))")}
               AS chunk_hash
      FROM spans WHERE cut >= start)
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(n_chars) // count(*) AS BIGINT) AS mean_chunk_chars,
           CAST(count(DISTINCT chunk_hash) * 1000000 // count(*) AS BIGINT)
             AS distinct_chunk_ppm
    FROM chunks GROUP BY 1
    """,
)
def content_defined_chunking(spark, sf_dir):
    """Content-defined chunking — boundaries where the rolling
    {_CDC_W}-char window hash ≡ 0 (mod {_CDC_DIV}), the rsync/LBFS
    technique storage dedup is built on: unlike doc_chunking's fixed
    windows, inserting one character shifts only the chunks AROUND the
    edit (boundaries are content-anchored), so near-identical documents
    share almost all chunk hashes. distinct_chunk_ppm per source IS the
    storage-dedup ratio the chunker would achieve.

    Per-position window hashes ride one explode over char positions —
    pure JVM md5 expressions at ~n_chars grain (the shingling family's
    scale shape: embarrassingly parallel, no shuffle until the chunk
    aggregate). Chunk spans come from a lag window PARTITIONED by doc
    (boundary-grain, tiny per doc) plus a per-doc tail span; the final
    rollup is one groupBy(source). A production CDC imposes min/max
    chunk sizes; the plain divisor rule is kept here so both engines
    replay the textbook construction exactly."""
    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim(F.col("text"))) > 0)
    d = docs.select("doc_id", "source", text.normalize(F.col("text")).alias("norm"))
    pos = d.select(
        "doc_id", "source", "norm",
        F.explode(
            # inclusive upper bound: last window start is n - W + 1 (DuckDB's
            # range(1, n - W + 2) is exclusive — same position set)
            F.sequence(F.lit(1), F.greatest(F.length("norm") - (_CDC_W - 1), F.lit(1)))
        ).alias("i"),
    )
    cuts = pos.filter(
        md5_long(F.expr(f"substring(norm, cast(i as int), {_CDC_W})")) % _CDC_DIV == 0
    ).select("doc_id", "source", "norm", (F.col("i") + (_CDC_W - 1)).alias("cut"))
    wdoc = Window.partitionBy("doc_id").orderBy("cut")
    body = cuts.select(
        "doc_id", "source", "norm", "cut",
        (F.coalesce(F.lag("cut").over(wdoc), F.lit(0)) + 1).alias("start"),
    )
    last_cut = cuts.groupBy("doc_id").agg(F.max("cut").alias("mc"))
    tail = (
        d.join(last_cut, "doc_id", "left")
        .select(
            "doc_id", "source", "norm",
            F.length("norm").alias("cut"),
            (F.coalesce(F.col("mc"), F.lit(0)) + 1).alias("start"),
        )
    )
    spans = body.unionByName(tail)
    chunks = spans.filter(F.col("cut") >= F.col("start")).select(
        "doc_id", "source",
        (F.col("cut") - F.col("start") + 1).alias("n_chars"),
        md5_long(
            F.expr("substring(norm, cast(start as int), cast(cut - start + 1 as int))")
        ).alias("chunk_hash"),
    )
    return chunks.groupBy("source").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.expr("cast(sum(n_chars) div count(*) as bigint)").alias("mean_chunk_chars"),
        F.expr(
            "cast(count(distinct chunk_hash) * 1000000 div count(*) as bigint)"
        ).alias("distinct_chunk_ppm"),
    )


# ---------------------------------------------------------------------------
# ECDF with the DKW nonparametric 95% confidence band
# ---------------------------------------------------------------------------

# eps_n = sqrt(ln(2/alpha) / (2n)) at alpha = 0.05; ln(40) is a shared
# constant so the only runtime double is one sqrt over the exact count
_DKW_EPS_PPM = "CAST(round(sqrt(3.688879454113936 / (2 * n)) * 1000000) AS BIGINT)"
_DKW_POINTS = [5000, 20000, 50000, 100000, 200000, 350000]


@register(
    "ecdf_dkw_band",
    f"""
    WITH agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             {", ".join(f"CAST(count(*) FILTER (CAST(round(o_totalprice) AS BIGINT)"
                        f" <= {t}) AS BIGINT) AS le_{t}" for t in _DKW_POINTS)}
      FROM orders),
    n_t AS (SELECT n FROM agg),
    f AS (
      SELECT p.t, {" ".join(f"CASE WHEN p.t = {t} THEN agg.le_{t} ELSE 0 END +"
                            for t in _DKW_POINTS)} 0 AS n_le
      FROM agg CROSS JOIN (SELECT unnest(ARRAY{_DKW_POINTS}) AS t) p)
    SELECT CAST(f.t AS BIGINT) AS threshold,
           CAST(f.n_le * 1000000 // n_t.n AS BIGINT) AS ecdf_ppm,
           greatest(f.n_le * 1000000 // n_t.n - {_DKW_EPS_PPM}, 0) AS lo_ppm,
           least(f.n_le * 1000000 // n_t.n + {_DKW_EPS_PPM}, 1000000) AS hi_ppm,
           {_DKW_EPS_PPM} AS eps_ppm
    FROM f CROSS JOIN n_t
    ORDER BY threshold
    """,
)
def ecdf_dkw_band(spark, sf_dir):
    """Empirical CDF of order value at fixed thresholds with the
    Dvoretzky-Kiefer-Wolfowitz 95% band: eps = sqrt(ln(2/a)/(2n)) bounds
    the WHOLE curve simultaneously — the distribution-free answer to
    'how much can this ECDF be trusted', and the right error bar for any
    threshold-based data-quality gate (compare: the per-point z-interval
    understates simultaneous coverage). As n grows 100x the band
    tightens 10x with zero extra work — the count is the only input.

    ONE scan computes every threshold's count as conditional aggregates
    (single row out — no fact-table expansion against the threshold
    spine; a crossJoin formulation would process each row once per
    threshold), then the literal spine unstacks the row. ln(2/a) is a
    shared literal constant, so the only runtime double is one sqrt over
    the exact bigint count, staged to ppm."""
    orders = _t(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            F.count_if(F.expr(f"cast(round(o_totalprice) as bigint) <= {t}"))
            .cast("bigint").alias(f"le_{t}")
            for t in _DKW_POINTS
        ],
    )
    pts = spark.createDataFrame([(t,) for t in _DKW_POINTS], "t long")
    f = agg.crossJoin(F.broadcast(pts)).select(
        "t", "n",
        F.expr(
            " + ".join(f"case when t = {t} then le_{t} else 0 end"
                       for t in _DKW_POINTS)
        ).alias("n_le"),
    )
    return (
        f
        .select(
            F.col("t").cast("bigint").alias("threshold"),
            F.expr("n_le * 1000000 div n").alias("ecdf_ppm"),
            F.expr(f"greatest(n_le * 1000000 div n - {_DKW_EPS_PPM}, 0)").alias("lo_ppm"),
            F.expr(f"least(n_le * 1000000 div n + {_DKW_EPS_PPM}, 1000000)").alias("hi_ppm"),
            F.expr(_DKW_EPS_PPM).alias("eps_ppm"),
        )
        .orderBy("threshold")
    )


# ---------------------------------------------------------------------------
# Multiplicative seasonal decomposition of the daily revenue series
# ---------------------------------------------------------------------------

@register(
    "seasonal_decompose_daily",
    """
    WITH day_rev AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100 AS BIGINT)
               AS x
      FROM orders GROUP BY 1),
    ma AS (
      SELECT d, x, dayofweek(d) AS dow,
             CASE WHEN count(*) OVER w7 = 7
                  THEN CAST(sum(x) OVER w7 // 7 AS BIGINT) END AS trend
      FROM day_rev
      WINDOW w7 AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    ratio AS (
      SELECT *, CAST(x * 1000000 // trend AS BIGINT) AS ratio_ppm
      FROM ma WHERE trend IS NOT NULL AND trend > 0),
    idx AS (
      SELECT dow, CAST(sum(ratio_ppm) // count(*) AS BIGINT) AS dow_index_ppm
      FROM ratio GROUP BY 1)
    SELECT CAST(r.d AS VARCHAR) AS day, r.x, r.trend,
           CAST(r.dow AS INT) AS dow, i.dow_index_ppm, r.ratio_ppm,
           CAST(r.ratio_ppm * 1000000 // i.dow_index_ppm AS BIGINT)
             AS residual_ppm,
           CAST(CASE WHEN abs(r.ratio_ppm * 1000000 // i.dow_index_ppm - 1000000)
                          > 300000 THEN 1 ELSE 0 END AS INT) AS anomaly
    FROM ratio r JOIN idx i USING (dow)
    ORDER BY day
    """,
)
def seasonal_decompose_daily(spark, sf_dir):
    """Classical multiplicative seasonal decomposition of daily revenue:
    trend = centered 7-day moving average (full windows only), weekday
    index = mean detrended ratio per day-of-week, residual = ratio over
    its weekday index — the decomposition behind 'is Monday low because
    Mondays are low, or is something wrong'. residual_ppm far from 1e6
    flags genuinely anomalous days AFTER seasonality is explained
    (cf. zscore_anomaly, which conflates the two).

    Exact integer staging end to end (whole-dollar series, floor-div MA,
    ppm ratios — no doubles at all); all windows ride the day-grain
    aggregate (domain-bounded), the weekday index is a 7-row broadcast
    join. Day numbering pinned to DuckDB dayofweek (0=Sunday) via
    Spark's dayofweek()-1, the weekday_seasonality convention."""
    orders = _t(spark, sf_dir, "orders")
    day_rev = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.expr(
            "cast(sum(cast(round(o_totalprice * 100) as bigint)) div 100 as bigint)"
        ).alias("x"))
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    ma = day_rev.select(
        "d", "x",
        (F.dayofweek(F.col("d")) - 1).alias("dow"),
        F.when(
            F.count(F.lit(1)).over(w7) == 7,
            F.expr("cast(0 as bigint)") + (F.sum("x").over(w7) / 7).cast("bigint"),
        ).alias("trend_raw"),
    ).withColumn("trend", F.expr("cast(trend_raw as bigint)")).drop("trend_raw")
    ratio = ma.filter(F.col("trend").isNotNull() & (F.col("trend") > 0)).withColumn(
        "ratio_ppm", F.expr("cast(x * 1000000 div trend as bigint)")
    )
    idx = ratio.groupBy("dow").agg(
        F.expr("cast(sum(ratio_ppm) div count(*) as bigint)").alias("dow_index_ppm")
    )
    return (
        ratio.join(F.broadcast(idx), "dow")
        .select(
            F.col("d").cast("string").alias("day"), "x", "trend",
            F.col("dow").cast("int").alias("dow"),
            "dow_index_ppm", "ratio_ppm",
            F.expr("cast(ratio_ppm * 1000000 div dow_index_ppm as bigint)")
            .alias("residual_ppm"),
            F.expr(
                "cast(case when abs(ratio_ppm * 1000000 div dow_index_ppm - 1000000)"
                " > 300000 then 1 else 0 end as int)"
            ).alias("anomaly"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Order-2 vs order-1 Markov predictability gain
# ---------------------------------------------------------------------------

@register(
    "markov_order2_gain",
    """
    WITH ord AS (
      SELECT user_id, ts, event_id, event_type,
             lag(ts) OVER w AS pts, lag(event_type) OVER w AS ptype,
             lead(ts) OVER w AS nts, lead(event_type) OVER w AS ntype
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    trip AS (
      SELECT ptype AS s2, event_type AS s1, ntype AS y
      FROM ord
      WHERE nts IS NOT NULL AND nts - ts <= INTERVAL 30 MINUTE
        AND pts IS NOT NULL AND ts - pts <= INTERVAL 30 MINUTE),
    c1 AS (SELECT s1, y, CAST(count(*) AS BIGINT) AS n FROM trip GROUP BY 1, 2),
    p1 AS (SELECT s1, y AS pred1 FROM (
             SELECT s1, y, row_number() OVER (PARTITION BY s1
                                              ORDER BY n DESC, y ASC) AS rk
             FROM c1) WHERE rk = 1),
    c2 AS (SELECT s2, s1, y, CAST(count(*) AS BIGINT) AS n
           FROM trip GROUP BY 1, 2, 3),
    p2 AS (SELECT s2, s1, y AS pred2 FROM (
             SELECT s2, s1, y, row_number() OVER (PARTITION BY s2, s1
                                                  ORDER BY n DESC, y ASC) AS rk
             FROM c2) WHERE rk = 1),
    scored AS (
      SELECT t.s2, t.s1, t.y, a.pred1, b.pred2
      FROM trip t JOIN p1 a USING (s1) JOIN p2 b ON b.s2 = t.s2 AND b.s1 = t.s1)
    SELECT CAST(count(*) AS BIGINT) AS n_triples,
           CAST(sum(CASE WHEN y = pred1 THEN 1 ELSE 0 END) * 1000000 // count(*)
                AS BIGINT) AS acc1_ppm,
           CAST(sum(CASE WHEN y = pred2 THEN 1 ELSE 0 END) * 1000000 // count(*)
                AS BIGINT) AS acc2_ppm,
           CAST((sum(CASE WHEN y = pred2 THEN 1 ELSE 0 END)
                 - sum(CASE WHEN y = pred1 THEN 1 ELSE 0 END)) * 1000000
                // count(*) AS BIGINT) AS gain_ppm
    FROM scored
    """,
)
def markov_order2_gain(spark, sf_dir):
    """How much does a second event of history buy? In-sample accuracy of
    the order-2 Markov next-event predictor (modal successor of the last
    TWO event types) against order-1 on the SAME within-gap triples — the
    memory-depth screen run before paying for sequence models: gain_ppm
    near zero says the stream is order-1 (no point training attention
    over it), large gain says real sequential structure.

    One window pass makes (prev, cur, next) triples; both models live at
    state-pair/-triple grain (<= 125 rows), argmaxes are deterministic
    (count DESC, label ASC), and the scoring join re-touches triples once
    — the conditioning-set pattern of text_kneser_ney_bigram applied to
    event streams. All ratios exact integers."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordx = ev.select(
        "event_type", "ts",
        F.lag("ts").over(w).alias("pts"),
        F.lag("event_type").over(w).alias("ptype"),
        F.lead("ts").over(w).alias("nts"),
        F.lead("event_type").over(w).alias("ntype"),
    )
    gap = F.expr("INTERVAL 30 MINUTES")
    trip = ordx.filter(
        F.col("nts").isNotNull() & (F.col("nts") - F.col("ts") <= gap)
        & F.col("pts").isNotNull() & (F.col("ts") - F.col("pts") <= gap)
    ).select(
        F.col("ptype").alias("s2"), F.col("event_type").alias("s1"),
        F.col("ntype").alias("y"),
    )
    c1 = trip.groupBy("s1", "y").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w1 = Window.partitionBy("s1").orderBy(F.col("n").desc(), F.col("y").asc())
    p1 = (
        c1.withColumn("rk", F.row_number().over(w1)).filter(F.col("rk") == 1)
        .select("s1", F.col("y").alias("pred1"))
    )
    c2 = trip.groupBy("s2", "s1", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w2 = Window.partitionBy("s2", "s1").orderBy(F.col("n").desc(), F.col("y").asc())
    p2 = (
        c2.withColumn("rk", F.row_number().over(w2)).filter(F.col("rk") == 1)
        .select("s2", "s1", F.col("y").alias("pred2"))
    )
    scored = trip.join(F.broadcast(p1), "s1").join(F.broadcast(p2), ["s2", "s1"])
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triples"),
        F.expr(
            "cast(sum(case when y = pred1 then 1 else 0 end) * 1000000"
            " div count(*) as bigint)"
        ).alias("acc1_ppm"),
        F.expr(
            "cast(sum(case when y = pred2 then 1 else 0 end) * 1000000"
            " div count(*) as bigint)"
        ).alias("acc2_ppm"),
        F.expr(
            "cast((sum(case when y = pred2 then 1 else 0 end)"
            " - sum(case when y = pred1 then 1 else 0 end)) * 1000000"
            " div count(*) as bigint)"
        ).alias("gain_ppm"),
    )


# ---------------------------------------------------------------------------
# Windowed co-occurrence PMI (symmetric, offset-literal join)
# ---------------------------------------------------------------------------

_PMI_WIN = 4     # co-occurrence window: positions i, i+1 .. i+4
_PMI_MIN = 5     # min pair count before PMI is meaningful
_PMI_EXPR = (
    "CAST(round(ln(CAST(n_xy AS DOUBLE) * t_pairs"
    " / (CAST(cx AS DOUBLE) * cy)) * 1000) AS BIGINT)"
)


@register(
    "cooccurrence_pmi_window",
    rf"""
    WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
                WHERE trim(text) <> ''),
    ex AS (SELECT doc_id, unnest(tk) AS t, generate_subscripts(tk, 1) AS i FROM tk),
    offs AS (SELECT unnest(generate_series(1, {_PMI_WIN})) AS off),
    pairs AS (
      SELECT least(a.t, b.t) AS x, greatest(a.t, b.t) AS y
      FROM ex a JOIN offs o ON true
      JOIN ex b ON b.doc_id = a.doc_id AND b.i = a.i + o.off),
    pc AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n_xy
           FROM pairs GROUP BY 1, 2 HAVING count(*) >= {_PMI_MIN}),
    marg AS (
      SELECT t, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT x AS t FROM pairs UNION ALL SELECT y FROM pairs)
      GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS t_pairs FROM pairs),
    scored AS (
      SELECT p.x, p.y, p.n_xy, mx.c AS cx, my.c AS cy,
             {_PMI_EXPR} AS pmi_milli
      FROM pc p
      JOIN marg mx ON mx.t = p.x
      JOIN marg my ON my.t = p.y
      CROSS JOIN tot)
    SELECT x, y, n_xy, cx, cy, pmi_milli FROM scored
    ORDER BY pmi_milli DESC, x ASC, y ASC LIMIT 100
    """,
)
def cooccurrence_pmi_window(spark, sf_dir):
    """Windowed co-occurrence PMI — collocation mining beyond adjacency
    (text_bigram_lift sees only i,i+1; real collocations like
    'new ... york times' span gaps): symmetric token pairs within a
    {_PMI_WIN}-position window, scored by
    ln(n_xy * T / (c_x * c_y)) over pair-occurrence marginals, min count
    {_PMI_MIN}. The feature-engineering front end of PMI-factorized
    embeddings (word2vec's implicit matrix).

    Pair generation rides the {_PMI_WIN}-row offset-literal equi-join on
    (doc, i+off) — candidates exactly {_PMI_WIN}x positions, never
    per-doc quadratic (the skipgram_pairs_subsampled shape). Marginals
    and the total are pair-grain aggregates; PMI is one shared-text
    double over exact bigints staged to milli-nats. Top-100 is a
    TakeOrdered."""
    docs = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    ex = docs.select(
        "doc_id",
        F.posexplode(F.split(text.normalize(F.col("text")), " ")).alias("i0", "t"),
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "t")
    offs = spark.range(1, _PMI_WIN + 1).select(F.col("id").alias("off"))
    probe = ex.crossJoin(F.broadcast(offs)).select(
        "doc_id", F.col("t").alias("ta"), (F.col("i") + F.col("off")).alias("i2")
    )
    ctx = ex.select("doc_id", F.col("i").alias("i2"), F.col("t").alias("tb"))
    pairs = probe.join(ctx, ["doc_id", "i2"]).select(
        F.least("ta", "tb").alias("x"), F.greatest("ta", "tb").alias("y")
    )
    pc = pairs.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_xy")
    ).filter(F.col("n_xy") >= _PMI_MIN)
    marg = (
        pairs.select(F.col("x").alias("t"))
        .unionAll(pairs.select(F.col("y").alias("t")))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("t_pairs"))
    scored = (
        pc.join(marg.select(F.col("t").alias("x"), F.col("c").alias("cx")), "x")
        .join(marg.select(F.col("t").alias("y"), F.col("c").alias("cy")), "y")
        .crossJoin(F.broadcast(tot))
        .select("x", "y", "n_xy", "cx", "cy", F.expr(_PMI_EXPR).alias("pmi_milli"))
    )
    return scored.orderBy(
        F.col("pmi_milli").desc(), F.col("x").asc(), F.col("y").asc()
    ).limit(100)


# ---------------------------------------------------------------------------
# CUPED variance-reduced A/B comparison (pre-period covariate adjustment)
# ---------------------------------------------------------------------------

_CUPED_CUT = "2024-01-16"  # pre-period: Jan 1-15; experiment: Jan 16-30
_CUPED_THETA = (
    "((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))"
)
_CUPED_RHO2 = (
    "round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    " * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)"
)
# adjusted diff = (Ybar_a - Ybar_b) - theta * (Xbar_a - Xbar_b)
_CUPED_DIFF_RAW = (
    "round(CAST(sy_a AS DOUBLE) / n_a - CAST(sy_b AS DOUBLE) / n_b, 6)"
)
_CUPED_DIFF_ADJ = (
    "round(CAST(sy_a AS DOUBLE) / n_a - CAST(sy_b AS DOUBLE) / n_b"
    f" - {_CUPED_THETA} * (CAST(sx_a AS DOUBLE) / n_a"
    " - CAST(sx_b AS DOUBLE) / n_b), 6)"
)


@register(
    "cuped_adjusted_ab",
    f"""
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
             CAST(sum(CASE WHEN ts < TIMESTAMP '{_CUPED_CUT}'
                           THEN CAST(round(value) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUT}'
                           THEN CAST(round(value) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY 1),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(count(*) FILTER (variant = 0) AS BIGINT) AS n_a,
             CAST(count(*) FILTER (variant = 1) AS BIGINT) AS n_b,
             CAST(sum(x) FILTER (variant = 0) AS BIGINT) AS sx_a,
             CAST(sum(x) FILTER (variant = 1) AS BIGINT) AS sx_b,
             CAST(sum(y) FILTER (variant = 0) AS BIGINT) AS sy_a,
             CAST(sum(y) FILTER (variant = 1) AS BIGINT) AS sy_b
      FROM u)
    SELECT n, n_a, n_b,
           round({_CUPED_THETA}, 6) AS theta,
           {_CUPED_DIFF_RAW} AS diff_raw,
           {_CUPED_DIFF_ADJ} AS diff_cuped,
           {_CUPED_RHO2} AS rho2
    FROM s
    """,
)
def cuped_adjusted_ab(spark, sf_dir):
    """CUPED — controlled-experiment variance reduction using pre-period
    behavior: theta = cov(X,Y)/var(X) over users (X = pre-period value,
    Y = experiment-period value), adjusted effect = raw mean difference
    minus theta times the pre-period imbalance. rho^2 IS the variance
    reduction: the experiment reads as if it had n/(1-rho^2) users. The
    companion to conversion_ab_ztest for continuous metrics — on a
    deterministic user_id-parity assignment the raw and adjusted
    effects should agree up to the pre-period imbalance, which is
    exactly what diff_raw - diff_cuped exposes.

    One user-grain aggregate builds X and Y in a single pass (conditional
    sums around the cutoff); ALL sufficient statistics land in one
    12-column conditional aggregate (exact bigints in whole dollars —
    sum(x*x) <= n*1e10, safe past sf~10); theta/rho^2/diffs are
    shared-text doubles over those exact sums, rounded 6dp."""
    ev = _t(spark, sf_dir, "events")
    cut = F.lit(_CUPED_CUT).cast("timestamp")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, F.round("value").cast("bigint")).otherwise(0))
        .cast("bigint").alias("x"),
        F.sum(F.when(F.col("ts") >= cut, F.round("value").cast("bigint")).otherwise(0))
        .cast("bigint").alias("y"),
    ).select((F.col("user_id") % 2).cast("int").alias("variant"), "x", "y")
    s = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.count_if(F.col("variant") == 0).cast("bigint").alias("n_a"),
        F.count_if(F.col("variant") == 1).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("x")).otherwise(0))
        .cast("bigint").alias("sx_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("x")).otherwise(0))
        .cast("bigint").alias("sx_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("y")).otherwise(0))
        .cast("bigint").alias("sy_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("y")).otherwise(0))
        .cast("bigint").alias("sy_b"),
    )
    return s.select(
        "n", "n_a", "n_b",
        F.expr(f"round({_CUPED_THETA}, 6)").alias("theta"),
        F.expr(_CUPED_DIFF_RAW).alias("diff_raw"),
        F.expr(_CUPED_DIFF_ADJ).alias("diff_cuped"),
        F.expr(_CUPED_RHO2).alias("rho2"),
    )


# ---------------------------------------------------------------------------
# Log-odds with informative Dirichlet prior ("fightin' words", Monroe et al.)
# ---------------------------------------------------------------------------

_FW_A0 = 1000  # total prior mass, spread over tokens by corpus rate
_FW_MIN = 20   # min corpus count for a token to be scored
_FW_Z = (
    "round((ln((ys + CAST({a0} AS DOUBLE) * cw / ct)"
    " / (ns + {a0} - ys - CAST({a0} AS DOUBLE) * cw / ct))"
    " - ln((yr + CAST({a0} AS DOUBLE) * cw / ct)"
    " / (nr + {a0} - yr - CAST({a0} AS DOUBLE) * cw / ct)))"
    " / sqrt(1.0 / (ys + CAST({a0} AS DOUBLE) * cw / ct)"
    " + 1.0 / (yr + CAST({a0} AS DOUBLE) * cw / ct)), 6)"
).format(a0=_FW_A0)


@register(
    "logodds_fightin_words",
    rf"""
    WITH ex AS (
      SELECT source, unnest({_TOKS_SQL}) AS t FROM documents
      WHERE trim(text) <> ''),
    st AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM ex GROUP BY 1),
    big AS (SELECT source FROM st ORDER BY n DESC, source ASC LIMIT 1),
    cw_t AS (SELECT t, CAST(count(*) AS BIGINT) AS cw FROM ex GROUP BY 1),
    ct_t AS (SELECT CAST(sum(cw) AS BIGINT) AS ct FROM cw_t),
    grp AS (
      SELECT e.t,
             CAST(count(*) FILTER (e.source = b.source) AS BIGINT) AS ys,
             CAST(count(*) FILTER (e.source <> b.source) AS BIGINT) AS yr
      FROM ex e CROSS JOIN big b GROUP BY 1),
    nn AS (
      SELECT CAST(sum(ys) AS BIGINT) AS ns, CAST(sum(yr) AS BIGINT) AS nr
      FROM grp),
    scored AS (
      SELECT g.t AS token, g.ys, g.yr, c.cw, {_FW_Z} AS z
      FROM grp g
      JOIN cw_t c ON c.t = g.t
      CROSS JOIN ct_t CROSS JOIN nn
      WHERE c.cw >= {_FW_MIN}),
    up AS (SELECT token, ys, yr, z, CAST(1 AS INT) AS side FROM scored
           ORDER BY z DESC, token ASC LIMIT 15),
    down AS (SELECT token, ys, yr, z, CAST(-1 AS INT) AS side FROM scored
             ORDER BY z ASC, token ASC LIMIT 15)
    SELECT * FROM up UNION ALL SELECT * FROM down
    """,
)
def logodds_fightin_words(spark, sf_dir):
    """Monroe et al.'s 'fightin' words' — log-odds-ratio with an
    informative Dirichlet prior — for the LARGEST source against the rest
    of the corpus: the statistically-grounded 'what vocabulary makes this
    source different' screen (raw log-odds overweights rare tokens,
    plain frequency differences overweight common ones; the
    corpus-rate prior a_w = a0*c_w/C and the per-token variance
    1/(y_s+a_w) + 1/(y_r+a_w) fix both). Top/bottom 15 by z = the two
    distinctive vocabularies.

    Group counts land in ONE conditional aggregate at token grain (the
    largest source is a 1-row TakeOrdered broadcast); corpus marginals
    and totals are token-grain/1-row broadcasts; z is one shared-text
    IEEE expression over exact bigints, rounded 6dp; each output arm is
    a TakeOrdered."""
    docs = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    ex = docs.select(
        "source", F.explode(F.split(text.normalize(F.col("text")), " ")).alias("t")
    )
    st = ex.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    big = st.orderBy(F.col("n").desc(), F.col("source").asc()).limit(1).select("source")
    cw_t = ex.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("cw"))
    ct_t = cw_t.agg(F.sum("cw").cast("bigint").alias("ct"))
    grp = (
        ex.crossJoin(F.broadcast(big.withColumnRenamed("source", "bsrc")))
        .groupBy("t")
        .agg(
            F.count_if(F.col("source") == F.col("bsrc")).cast("bigint").alias("ys"),
            F.count_if(F.col("source") != F.col("bsrc")).cast("bigint").alias("yr"),
        )
    )
    nn = grp.agg(
        F.sum("ys").cast("bigint").alias("ns"),
        F.sum("yr").cast("bigint").alias("nr"),
    )
    scored = (
        grp.join(cw_t, "t")
        .filter(F.col("cw") >= _FW_MIN)
        .crossJoin(F.broadcast(ct_t))
        .crossJoin(F.broadcast(nn))
        .select(F.col("t").alias("token"), "ys", "yr", "cw", F.expr(_FW_Z).alias("z"))
    )
    up = (
        scored.orderBy(F.col("z").desc(), F.col("token").asc()).limit(15)
        .select("token", "ys", "yr", "z", F.lit(1).cast("int").alias("side"))
    )
    down = (
        scored.orderBy(F.col("z").asc(), F.col("token").asc()).limit(15)
        .select("token", "ys", "yr", "z", F.lit(-1).cast("int").alias("side"))
    )
    return up.unionAll(down)


# ---------------------------------------------------------------------------
# Laplace-mechanism noisy counts (DP plumbing; deterministic hash noise)
# ---------------------------------------------------------------------------

_DP_EPS_MILLI = 1000  # epsilon = 1.0; count sensitivity 1 -> scale b = 1/eps
# inverse-CDF Laplace from a (0,1) uniform: -b * sign(u-.5) * ln(1 - 2|u-.5|)
_DP_NOISE = (
    "round(-(1000.0 / {eps}) * CASE WHEN u_ppm >= 500000 THEN 1.0 ELSE -1.0 END"
    " * ln(1.0 - 2.0 * abs(u_ppm / 1000000.0 - 0.5)), 6)"
).format(eps=_DP_EPS_MILLI)


@register(
    "dp_laplace_counts",
    f"""
    WITH g AS (
      SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS true_n
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
      GROUP BY 1),
    u AS (
      SELECT nation, true_n,
             {md5_long_sql("nation", seed=11)} % 999999 + 1 AS u_ppm
      FROM g)
    SELECT nation, true_n,
           {_DP_NOISE} AS noise,
           round(true_n + {_DP_NOISE}, 6) AS noisy_n,
           round(abs({_DP_NOISE}), 6) AS abs_err
    FROM u
    """,
)
def dp_laplace_counts(spark, sf_dir):
    """Laplace-mechanism noisy per-nation order counts at epsilon = 1 —
    the differential-privacy RELEASE step's plumbing (sensitivity-1 count
    + Laplace(1/eps) noise via the inverse CDF), the publication-side
    companion to k_anonymity_audit's risk screen. The uniform driving the
    noise is the engine's deterministic hash (seeded md5 per group key)
    so both engines replay the identical draw — REAL DP requires fresh
    cryptographic randomness per release; this operator is the
    shape/accounting harness (true_n is emitted precisely because this
    fixture-grade variant is an audit, not a private release).

    One star-join aggregate at nation grain; the noise is one shared-text
    IEEE expression (ln of an exact ppm ratio) rounded 6dp. Expected
    |noise| = 1/eps = 1; at 100 TB group counts dwarf it — the mechanism
    costs nothing at scale, which is the point of the demo."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    g = (
        # customer scales with the fact data — AQE decides its join; only
        # the 25-row nation dim is force-broadcast
        orders.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_n"))
    )
    u = g.withColumn("u_ppm", md5_long(F.col("nation"), seed=11) % 999999 + 1)
    return u.select(
        "nation", "true_n",
        F.expr(_DP_NOISE).alias("noise"),
        F.expr(f"round(true_n + {_DP_NOISE}, 6)").alias("noisy_n"),
        F.expr(f"round(abs({_DP_NOISE}), 6)").alias("abs_err"),
    )


# ---------------------------------------------------------------------------
# Good-Turing frequency smoothing (frequency-of-frequencies LM estimator)
# ---------------------------------------------------------------------------

@register(
    "good_turing_smoothing",
    f"""
    WITH {_SHINGLES_CTE},
    f AS (SELECT sh, count(*) AS c FROM sh GROUP BY 1),
    nr AS (SELECT CAST(c AS BIGINT) AS r, CAST(count(*) AS BIGINT) AS n_r
           FROM f GROUP BY 1)
    SELECT a.r, a.n_r,
           CAST(coalesce(b.n_r, 0) AS BIGINT) AS n_r1,
           CAST((a.r + 1) * coalesce(b.n_r, 0) * 1000000 // a.n_r AS BIGINT)
               AS r_star_micro,
           CAST((a.r + 1) * coalesce(b.n_r, 0) * 1000000 // (a.n_r * a.r)
               AS BIGINT) AS discount_ppm
    FROM nr a LEFT JOIN nr b ON b.r = a.r + 1
    WHERE a.r <= 20
    """,
)
def good_turing_smoothing(spark, sf_dir):
    """Good-Turing adjusted counts r* = (r+1) * N_{{r+1}} / N_r over the
    corpus's trigram-shingle document frequencies — the classic
    frequency-of-frequencies smoothing / unseen-mass estimator (Gale &
    Sampson's raw GT, before any fit), the companion to
    text_kneser_ney_bigram's absolute discounting. The species here are
    the dedup pipeline's 3-gram shingles (the fixture's word vocabulary is
    31 types, all high-count — no GT tail; the shingle spectrum has the
    N_1 >> N_2 >> ... shape GT exists for). r with N_{{r+1}} = 0 keeps the
    estimator's raw 0 (exactly why smoothed-fit variants exist).

    Plan: shingle explode -> shingle-grain aggregate (one shuffle,
    partial-aggregable) -> a SECOND aggregate at count grain (r), which is
    metadata-sized at any corpus scale, then an aggregate-grain self-join
    on r+1. All arithmetic exact BIGINT (micro units, truncating div ==
    DuckDB // on non-negatives)."""
    docs = _t(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id", F.explode(dedup.shingle_hashes_arrow(F.col("text"))).alias("sh")
    )
    f = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("c"))
    nr = f.groupBy(F.col("c").cast("long").alias("r")).agg(
        F.count(F.lit(1)).cast("long").alias("n_r")
    )
    b = nr.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1_raw"))
    return (
        nr.filter(F.col("r") <= 20)
        .join(b, "r", "left")
        .select(
            "r", "n_r",
            F.coalesce(F.col("n_r1_raw"), F.lit(0)).cast("long").alias("n_r1"),
            F.expr(
                "(r + 1) * coalesce(n_r1_raw, 0) * 1000000 div n_r"
            ).cast("long").alias("r_star_micro"),
            F.expr(
                "(r + 1) * coalesce(n_r1_raw, 0) * 1000000 div (n_r * r)"
            ).cast("long").alias("discount_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Exact distinct via fixed-width bitmap words (roaring-style, mergeable)
# ---------------------------------------------------------------------------

@register(
    "bitmap_exact_distinct",
    """
    WITH b AS (
      SELECT event_type, user_id // 63 AS w,
             bit_or(1::BIGINT << CAST(user_id % 63 AS INT)) AS bm
      FROM events GROUP BY 1, 2),
    d AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_words,
                 CAST(sum(bit_count(bm)) AS BIGINT) AS n_distinct_bitmap
          FROM b GROUP BY 1),
    e AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
                 AS n_distinct_exact
          FROM events GROUP BY 1)
    SELECT d.event_type, n_words, n_distinct_bitmap, n_distinct_exact
    FROM d JOIN e USING (event_type)
    """,
)
def bitmap_exact_distinct(spark, sf_dir):
    """EXACT distinct users per event type via 63-bit bitmap words — the
    roaring-bitmap-shaped alternative that sits between count(DISTINCT)
    (full id shuffle) and HLL (approximate): map user_id to (word = id div
    63, bit = id mod 63), bit_or the masks per (group, word), popcount-sum
    the words. State is mergeable and fixed-width (one BIGINT per occupied
    63-id block), the aggregate is partial-aggregable map-side (bit_or
    combines in the partial), and dense id spaces compress 63:1 vs raw ids
    — at 100 TB this is the standard exact-distinct layout for dashboard
    cubes (one bitmap column per group, OR-merge across days). Bits stay
    in 0..62 so the mask never touches the sign bit in either engine.

    The exact count(DISTINCT) arm is the fixture-scale audit twin (the
    query both DEMONSTRATES the identity and would drop the arm at scale);
    both arms shuffle the same grain, so the comparison is honest."""
    ev = _t(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type", F.expr("user_id div 63").alias("w")
    ).agg(
        F.expr(
            "bit_or(shiftleft(cast(1 as bigint), cast(user_id % 63 as int)))"
        ).alias("bm")
    )
    d = b.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.bit_count("bm")).cast("long").alias("n_distinct_bitmap"),
    )
    e = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_distinct_exact")
    )
    return d.join(e, "event_type")


# ---------------------------------------------------------------------------
# Isotonic (PAV) calibration via the exact minimax formula on bounded bins
# ---------------------------------------------------------------------------

@register(
    "isotonic_calibration",
    """
    WITH base AS (
      SELECT least(CAST(floor(o_totalprice / 25000) AS INT), 19) AS b,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders),
    bins AS (SELECT b, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(y) AS BIGINT) AS s
             FROM base GROUP BY 1),
    cum AS (SELECT b, n, s,
                   CAST(sum(n) OVER (ORDER BY b) AS BIGINT) AS cn,
                   CAST(sum(s) OVER (ORDER BY b) AS BIGINT) AS cs
            FROM bins),
    pairs AS (
      SELECT j.b AS j, k.b AS k,
             (k.cs - (j.cs - j.s)) * 1000000 // (k.cn - (j.cn - j.n))
                 AS mean_ppm
      FROM cum j JOIN cum k ON j.b <= k.b),
    mn AS (SELECT i.b AS b, p.j, CAST(min(p.mean_ppm) AS BIGINT) AS mn
           FROM bins i JOIN pairs p ON p.j <= i.b AND p.k >= i.b
           GROUP BY 1, 2),
    iso AS (SELECT b, CAST(max(mn) AS BIGINT) AS iso_ppm FROM mn GROUP BY 1)
    SELECT bins.b, bins.n,
           CAST(bins.s * 1000000 // bins.n AS BIGINT) AS raw_ppm,
           iso.iso_ppm
    FROM bins JOIN iso USING (b)
    """,
)
def isotonic_calibration(spark, sf_dir):
    """Isotonic regression (pool-adjacent-violators) calibrating the
    urgent-priority rate against 20 fixed price bins — the standard
    monotone probability-calibration step next to
    logistic_calibration_quality's Platt-style sigmoid. Computed via the
    EXACT minimax characterization iso(i) = max_{j<=i} min_{k>=i}
    mean(y over bins j..k) instead of the sequential stack algorithm:
    after one data-grain aggregate to <= 20 (n, sum_y) bins, the j<=k pair
    grid is at most 210 rows, so the O(B^2) formula is metadata-sized at
    ANY corpus scale while staying fully declarative (the sequential PAV
    stack is unparallelizable by construction). Pair means are exact
    BIGINT ppm (floor commutes with min/max, so the result is exactly
    floor(1e6 * true PAV fit)); the theta joins sit entirely above the
    bin aggregate, which the plan gate proves bounded."""
    orders = _t(spark, sf_dir, "orders")
    base = orders.select(
        F.least(F.floor(F.col("o_totalprice") / 25000).cast("int"), F.lit(19)).alias("b"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0).alias("y"),
    )
    bins = base.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    )
    w = Window.orderBy("b")
    cum = bins.select(
        "b", "n", "s",
        F.sum("n").over(w).cast("long").alias("cn"),
        F.sum("s").over(w).cast("long").alias("cs"),
    )
    j = cum.select(
        F.col("b").alias("j"),
        (F.col("cn") - F.col("n")).alias("cn0"),
        (F.col("cs") - F.col("s")).alias("cs0"),
    )
    k = cum.select(F.col("b").alias("k"), "cn", "cs")
    pairs = j.join(k, F.col("j") <= F.col("k")).select(
        "j", "k",
        F.expr("(cs - cs0) * 1000000 div (cn - cn0)").alias("mean_ppm"),
    )
    spine = bins.select(F.col("b").alias("i"))
    mn = (
        spine.join(pairs, (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("i", "j")
        .agg(F.min("mean_ppm").cast("long").alias("mn"))
    )
    iso = (
        mn.groupBy("i").agg(F.max("mn").cast("long").alias("iso_ppm"))
        .withColumnRenamed("i", "b")
    )
    return bins.join(iso, "b").select(
        "b", "n",
        F.expr("s * 1000000 div n").cast("long").alias("raw_ppm"),
        "iso_ppm",
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap (hash-deterministic replicate weights, md5-slice uniforms)
# ---------------------------------------------------------------------------

# Poisson(1) inverse CDF over a 16-bit uniform: floor(65536 * CDF) thresholds
_BOOT_W = (
    "CASE WHEN u16 < 24109 THEN 0 WHEN u16 < 48218 THEN 1"
    " WHEN u16 < 60273 THEN 2 WHEN u16 < 64291 THEN 3"
    " WHEN u16 < 65296 THEN 4 WHEN u16 < 65497 THEN 5"
    " WHEN u16 < 65530 THEN 6 WHEN u16 < 65535 THEN 7 ELSE 8 END"
)
_BOOT_R = 32  # replicates: 4 md5 digests x 8 16-bit slices


@register(
    "poisson_bootstrap_replicates",
    f"""
    WITH base AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             [md5(CAST(o_orderkey AS VARCHAR) || '#b0'),
              md5(CAST(o_orderkey AS VARCHAR) || '#b1'),
              md5(CAST(o_orderkey AS VARCHAR) || '#b2'),
              md5(CAST(o_orderkey AS VARCHAR) || '#b3')] AS dg
      FROM orders),
    r AS (SELECT cents, dg, unnest(range(0, {_BOOT_R})) AS rep FROM base),
    u AS (SELECT CAST(rep AS INT) AS rep, cents,
                 CAST('0x' || substr(dg[CAST(rep // 8 AS INT) + 1],
                                     CAST((rep % 8) * 4 + 1 AS INT), 4)
                      AS BIGINT) AS u16
          FROM r),
    w AS (SELECT rep, cents, {_BOOT_W} AS w FROM u),
    m AS (SELECT rep, CAST(sum(w) AS BIGINT) AS n_eff,
                 CAST(sum(w * cents) AS BIGINT) // CAST(sum(w) AS BIGINT)
                     AS boot_mean_cents
          FROM w GROUP BY 1),
    s AS (SELECT CAST(min(boot_mean_cents) AS BIGINT) AS boot_lo_cents,
                 CAST(max(boot_mean_cents) AS BIGINT) AS boot_hi_cents,
                 CAST(sum(boot_mean_cents) AS BIGINT) AS sm,
                 CAST(sum(boot_mean_cents * boot_mean_cents) AS BIGINT) AS smm
          FROM m),
    p AS (SELECT CAST(sum(cents) AS BIGINT) // CAST(count(*) AS BIGINT)
                 AS point_cents
          FROM base)
    SELECT rep, n_eff, boot_mean_cents, point_cents,
           boot_lo_cents, boot_hi_cents,
           round(sqrt((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * sm / {_BOOT_R}.0)
                      / {_BOOT_R - 1}.0), 6) AS boot_se_cents
    FROM m CROSS JOIN s CROSS JOIN p
    """,
)
def poisson_bootstrap_replicates(spark, sf_dir):
    """Poisson bootstrap of the mean order value: {_BOOT_R} replicates where
    each row's multiplicity in replicate r is Poisson(1), drawn
    deterministically from an md5-slice uniform — the distributed bootstrap
    (resampling-without-coordination: no global n needed, weights computed
    row-locally, so it runs in ONE pass at any scale; the classic
    alternative, exact multinomial resampling, needs the global count up
    front). Four digests per row sliced into eight 16-bit uniforms each
    (the md5-slice trick from the CMS rebuild) keeps hashing at 4 md5/row
    instead of 32; the inverse CDF is a shared-text integer CASE over
    floor(65536*CDF) thresholds, so both engines draw bit-identical
    weights.

    Plan: explode x32 (map-side only), partial-aggregated groupBy rep (32
    groups — the shuffle carries 32 rows/partition), then 1-row summary
    cross-joins (plan-gate bounded). Replicate means are exact BIGINT
    cents; only the final SE is a double (exact-sum variance identity,
    shared text, round 6)."""
    orders = _t(spark, sf_dir, "orders")
    dg = F.array(*[
        F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(f"#b{s}")))
        for s in range(4)
    ])
    base = orders.select(
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
        dg.alias("dg"),
    )
    r = base.select(
        "cents", "dg",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias("rep"),
    )
    u = r.select(
        F.col("rep").cast("int").alias("rep"), "cents",
        F.expr(
            "cast(conv(substring(element_at(dg, cast(rep div 8 as int) + 1),"
            " cast((rep % 8) * 4 + 1 as int), 4), 16, 10) as bigint)"
        ).alias("u16"),
    )
    w = u.select("rep", "cents", F.expr(_BOOT_W).alias("w"))
    m = w.groupBy("rep").agg(
        F.sum("w").cast("long").alias("n_eff"),
        F.expr("cast(sum(w * cents) as bigint) div cast(sum(w) as bigint)")
        .alias("boot_mean_cents"),
    )
    s = m.agg(
        F.min("boot_mean_cents").cast("long").alias("boot_lo_cents"),
        F.max("boot_mean_cents").cast("long").alias("boot_hi_cents"),
        F.sum("boot_mean_cents").cast("long").alias("sm"),
        F.sum(F.col("boot_mean_cents") * F.col("boot_mean_cents"))
        .cast("long").alias("smm"),
    )
    p = base.agg(
        F.expr("cast(sum(cents) as bigint) div cast(count(*) as bigint)")
        .alias("point_cents")
    )
    return (
        m.crossJoin(F.broadcast(s)).crossJoin(F.broadcast(p))
        .select(
            "rep", "n_eff", "boot_mean_cents", "point_cents",
            "boot_lo_cents", "boot_hi_cents",
            F.expr(
                f"round(sqrt((cast(smm as double) - cast(sm as double) * sm"
                f" / {_BOOT_R}.0) / {_BOOT_R - 1}.0), 6)"
            ).alias("boot_se_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Adamic-Adar link scoring over the order-part co-purchase bipartite graph
# ---------------------------------------------------------------------------

@register(
    "adamic_adar_copurchase",
    """
    WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    deg AS (SELECT o, CAST(count(*) AS BIGINT) AS d FROM li GROUP BY 1),
    pr AS (SELECT a.p AS part_a, b.p AS part_b, deg.d
           FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
           JOIN deg ON deg.o = a.o),
    aa AS (SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_common,
                  CAST(sum(CAST(round(1000000.0 / ln(CAST(d AS DOUBLE)))
                                AS BIGINT)) AS BIGINT) AS aa_micro
           FROM pr GROUP BY 1, 2)
    SELECT part_a, part_b, n_common, aa_micro
    FROM aa ORDER BY aa_micro DESC, part_a ASC, part_b ASC LIMIT 50
    """,
)
def adamic_adar_copurchase(spark, sf_dir):
    """Adamic-Adar link prediction over the order-part bipartite graph:
    score(a, b) = sum over shared orders o of 1/ln(|o|) — co-purchase
    weighted by how UNSELECTIVE the shared neighbor is (a 2-item order is
    strong evidence, a 7-item basket weak), the degree-discounted upgrade
    of frequent_itemset_pairs' raw support counts and the standard
    common-neighbor baseline in link prediction.

    Plan: per-order pair generation via an equi-self-join on orderkey
    (pairs per order bounded by basket size squared — TPC-H baskets are
    <= 7 lines, so candidate volume is O(orders), never O(parts^2)), a
    broadcast-or-shuffle join to the order-degree table on the same key,
    one partial-aggregable pair-grain groupBy, then distributed top-50
    (TakeOrdered). Each 1/ln(d) term rounds to integer micro BEFORE the
    sum, so the aggregate is order-independent exact BIGINT."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    deg = li.groupBy("o").agg(F.count(F.lit(1)).cast("long").alias("d"))
    a = li.select("o", F.col("p").alias("part_a"))
    b = li.select(F.col("o").alias("o2"), F.col("p").alias("part_b"))
    pr = (
        a.join(b, (F.col("o") == F.col("o2")) & (F.col("part_a") < F.col("part_b")))
        .join(deg, "o")
    )
    aa = pr.groupBy("part_a", "part_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.sum(
            F.expr("cast(round(1000000.0 / ln(cast(d as double))) as bigint)")
        ).cast("long").alias("aa_micro"),
    )
    return aa.orderBy(
        F.col("aa_micro").desc(), F.col("part_a").asc(), F.col("part_b").asc()
    ).limit(50)


# ---------------------------------------------------------------------------
# l-diversity audit (the sensitive-attribute companion to k_anonymity_audit)
# ---------------------------------------------------------------------------

_LDIV_TERM = (
    "round((ln(CAST(k AS DOUBLE)) - ln(CAST(c AS DOUBLE)))"
    " * CAST(c AS DOUBLE) * 1000000.0 / CAST(k AS DOUBLE))"
)


@register(
    "l_diversity_audit",
    f"""
    WITH rec AS (
      SELECT c_nationkey AS nation, c_mktsegment AS segment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             o_orderpriority AS sens
      FROM orders JOIN customer ON c_custkey = o_custkey),
    cv AS (SELECT nation, segment, bal_band, sens, CAST(count(*) AS BIGINT) AS c
           FROM rec GROUP BY 1, 2, 3, 4),
    tot AS (SELECT nation, segment, bal_band, CAST(sum(c) AS BIGINT) AS k
            FROM cv GROUP BY 1, 2, 3),
    ent AS (SELECT cv.nation, cv.segment, cv.bal_band, tot.k,
                   CAST({_LDIV_TERM} AS BIGINT) AS term
            FROM cv JOIN tot USING (nation, segment, bal_band)),
    cls AS (SELECT nation, segment, bal_band,
                   CAST(max(k) AS BIGINT) AS k,
                   CAST(count(*) AS BIGINT) AS l_distinct,
                   CAST(sum(term) AS BIGINT) AS entropy_unat
            FROM ent GROUP BY 1, 2, 3)
    SELECT l_distinct, CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(k) AS BIGINT) AS n_records,
           CAST(min(entropy_unat) AS BIGINT) AS min_entropy_unat,
           CAST(max(entropy_unat) AS BIGINT) AS max_entropy_unat,
           CAST(CASE WHEN l_distinct < 3 THEN 1 ELSE 0 END AS INT) AS below_l3
    FROM cls GROUP BY 1
    """,
)
def l_diversity_audit(spark, sf_dir):
    """l-diversity audit over the SAME quasi-identifier classes as
    k_anonymity_audit (nation x segment x account-balance band), with
    order priority as the sensitive attribute: per-class distinct-l and
    entropy l-diversity, histogrammed by l. k-anonymity alone leaves the
    homogeneity attack open (a class where every record shares one
    sensitive value discloses it at any k) — this is the governance screen
    that catches it.

    Plan: one fact-side join, two stacked partial-aggregable groupBys
    (class x value grain, then class grain), then a metadata-sized
    histogram aggregate. Entropy terms c/k*ln(k/c) round to integer
    micro-nats PER VALUE before summing (order-independent exact BIGINT;
    ln parity per the _LM_CTE note)."""
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    rec = orders.join(cust, F.col("c_custkey") == F.col("o_custkey")).select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
        F.col("o_orderpriority").alias("sens"),
    )
    cv = rec.groupBy("nation", "segment", "bal_band", "sens").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = cv.groupBy("nation", "segment", "bal_band").agg(
        F.sum("c").cast("long").alias("k")
    )
    ent = cv.join(tot, ["nation", "segment", "bal_band"]).select(
        "nation", "segment", "bal_band", "k",
        F.expr(_LDIV_TERM).cast("long").alias("term"),
    )
    cls = ent.groupBy("nation", "segment", "bal_band").agg(
        F.max("k").cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("l_distinct"),
        F.sum("term").cast("long").alias("entropy_unat"),
    )
    return cls.groupBy("l_distinct").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("k").cast("long").alias("n_records"),
        F.min("entropy_unat").cast("long").alias("min_entropy_unat"),
        F.max("entropy_unat").cast("long").alias("max_entropy_unat"),
    ).select(
        "l_distinct", "n_classes", "n_records",
        "min_entropy_unat", "max_entropy_unat",
        F.expr("cast(case when l_distinct < 3 then 1 else 0 end as int)")
        .alias("below_l3"),
    )


# ---------------------------------------------------------------------------
# Graded retrieval evaluation: NDCG@10 / MRR / P@10 over dense retrieval
# ---------------------------------------------------------------------------

_NDCG_K = 10
_NDCG_NQ = 8
# round(1e6 / log2(i+1)) for rank i = 1..10, and its prefix sums: the DCG
# discount ladder as exact integer literals (no cross-engine log2 at runtime)
_NDCG_DISC = [1000000, 630930, 500000, 430677, 386853,
              356207, 333333, 315465, 301030, 289065]
_NDCG_CUM = [1000000, 1630930, 2130930, 2561607, 2948460,
             3304667, 3638000, 3953465, 4254495, 4543560]


def _disc_case(rank_col: str) -> str:
    whens = " ".join(
        f"WHEN {i + 1} THEN {d}" for i, d in enumerate(_NDCG_DISC)
    )
    return f"(CASE {rank_col} {whens} ELSE 0 END)"


def _cumdisc_case(x: str) -> str:
    """Sum of the first min(10, x) discounts as a literal CASE."""
    whens = " ".join(
        f"WHEN ({x}) = {i} THEN {c}"
        for i, c in enumerate([0] + _NDCG_CUM[:-1])
    )
    return f"(CASE {whens} ELSE {_NDCG_CUM[-1]} END)"


_NDCG_REL = (
    "(CASE WHEN nlabel = qlabel THEN 2"
    " WHEN nlabel % 3 = qlabel % 3 THEN 1 ELSE 0 END)"
)
_NDCG_GAIN = f"(CASE {_NDCG_REL} WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END)"
_NDCG_IDCG = (
    f"3 * {_cumdisc_case('least(10, n2)')}"
    f" + ({_cumdisc_case('least(10, n2 + n1)')}"
    f" - {_cumdisc_case('least(10, n2)')})"
)


@register(
    "retrieval_eval_ndcg",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
               FROM embeddings WHERE vec_id < {_NDCG_NQ}),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS nlabel
          FROM embeddings),
    scored AS (
        SELECT q.query_id, q.qlabel, c.neighbor_id, c.nlabel, {_COS_SQL} AS sim
        FROM c CROSS JOIN q WHERE c.neighbor_id <> q.query_id),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id ASC) AS rank
        FROM scored),
    top AS (SELECT * FROM ranked WHERE rank <= {_NDCG_K}),
    per_q AS (
        SELECT query_id,
               CAST(sum({_NDCG_GAIN} * {_disc_case('rank')}) AS BIGINT)
                   AS dcg_micro,
               CAST(coalesce(min(CASE WHEN {_NDCG_REL} = 2 THEN rank END), 0)
                   AS BIGINT) AS first_rel_rank,
               CAST(sum(CASE WHEN {_NDCG_REL} >= 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_hits
        FROM top GROUP BY 1),
    labcnt AS (SELECT label, CAST(count(*) AS BIGINT) AS cl
               FROM embeddings GROUP BY 1),
    modcnt AS (SELECT label % 3 AS m3, CAST(count(*) AS BIGINT) AS cm
               FROM embeddings GROUP BY 1),
    ideal AS (
        SELECT q2.query_id, labcnt.cl - 1 AS n2, modcnt.cm - labcnt.cl AS n1
        FROM (SELECT vec_id AS query_id, label AS qlabel FROM embeddings
              WHERE vec_id < {_NDCG_NQ}) q2
        JOIN labcnt ON labcnt.label = q2.qlabel
        JOIN modcnt ON modcnt.m3 = q2.qlabel % 3)
    SELECT per_q.query_id, n2, n1, dcg_micro,
           CAST({_NDCG_IDCG} AS BIGINT) AS idcg_micro,
           CAST(dcg_micro * 1000000 // greatest({_NDCG_IDCG}, 1) AS BIGINT)
               AS ndcg_ppm,
           CAST(CASE WHEN first_rel_rank = 0 THEN 0
                     ELSE 1000000 // first_rel_rank END AS BIGINT) AS rr_ppm,
           CAST(n_hits * 100000 AS BIGINT) AS p_at_10_ppm
    FROM per_q JOIN ideal USING (query_id)
    """,
)
def retrieval_eval_ndcg(spark, sf_dir):
    """Graded retrieval evaluation — NDCG@10, MRR, and P@10 — for the dense
    cosine retriever, with label-derived graded relevance (same label =
    grade 2, same label mod 3 = grade 1): the metric layer that every
    retrieval op (brute/ANN/BM25/hybrid) plugs into when judging index
    quality. The DCG discount ladder 1/log2(i+1) and its prefix sums are
    EXACT INTEGER LITERALS (no runtime transcendental), so DCG is a
    bigint sum; IDCG comes CLOSED-FORM from the per-label corpus counts
    (slots filled grade-2-first), never from ranking the corpus by
    relevance — at scale the ideal ranking is a count lookup, not a sort.

    Plan: corpus x broadcast(8 queries) scoring (the sanctioned brute-topk
    shape), per-query top-10 window over candidate rows, then label-grain
    aggregate joins for the ideal counts. All outputs exact integers."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _NDCG_NQ)
    topk = similarity.brute_force_topk(q, emb, k=_NDCG_K)
    nl = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel"))
    ql = emb.filter(F.col("vec_id") < _NDCG_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    top = topk.join(nl, "neighbor_id").join(F.broadcast(ql), "query_id")
    per_q = top.groupBy("query_id").agg(
        F.sum(F.expr(f"{_NDCG_GAIN} * {_disc_case('rank')}"))
        .cast("long").alias("dcg_micro"),
        F.coalesce(
            F.min(F.expr(f"CASE WHEN {_NDCG_REL} = 2 THEN rank END")), F.lit(0)
        ).cast("long").alias("first_rel_rank"),
        F.sum(F.expr(f"CASE WHEN {_NDCG_REL} >= 1 THEN 1 ELSE 0 END"))
        .cast("long").alias("n_hits"),
    )
    labcnt = emb.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("cl"))
    modcnt = emb.groupBy((F.col("label") % 3).alias("m3")).agg(
        F.count(F.lit(1)).cast("long").alias("cm")
    )
    ideal = (
        ql.join(labcnt, F.col("label") == F.col("qlabel"))
        .join(modcnt, F.col("m3") == F.col("qlabel") % 3)
        .select(
            "query_id",
            (F.col("cl") - 1).alias("n2"),
            (F.col("cm") - F.col("cl")).alias("n1"),
        )
    )
    return per_q.join(ideal, "query_id").select(
        "query_id", "n2", "n1", "dcg_micro",
        F.expr(_NDCG_IDCG).cast("long").alias("idcg_micro"),
        F.expr(f"dcg_micro * 1000000 div greatest({_NDCG_IDCG}, 1)")
        .cast("long").alias("ndcg_ppm"),
        F.expr(
            "CASE WHEN first_rel_rank = 0 THEN 0"
            " ELSE 1000000 div first_rel_rank END"
        ).cast("long").alias("rr_ppm"),
        F.expr("n_hits * 100000").cast("long").alias("p_at_10_ppm"),
    )


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR correction over per-nation proportion z-tests
# ---------------------------------------------------------------------------

_FDR_ALPHA_MICRO = 50000  # alpha = 0.05


def _erfc_cols(op: str) -> list[tuple[str, str]]:
    """Two-sided normal p-value p = erfc(|z|/sqrt(2)) as a staged-INTEGER
    alias chain from z_micro — Abramowitz-Stegun 7.1.26 with the Horner
    polynomial in micro fixed-point and exp(-x^2) via the same cubic-Taylor
    + 5-squarings chain as the logistic IRLS sigmoid (_lr_step_cols):
    transcendental-free, so both engines produce the SAME p bit for bit.
    |z| clips at 4 (p ~ 6e-5 there, far below every BH threshold at
    alpha/m >= 0.002, so decisions are unaffected). Max relative error
    ~0.5% from the exp chain — fine for threshold tests, identical on
    both sides."""
    cols = [
        ("az", "least(abs(z_micro), 4000000)"),
        # x = |z|/sqrt(2) in micro (707107/1e6 ~ 1/sqrt(2))
        ("x", f"az * 707107 {op} 1000000"),
        # t = 1/(1 + 0.3275911 x) in micro
        ("tt", f"1000000000000 {op} (1000000 + ((327591 * x) {op} 1000000))"),
        # Horner in micro: a5..a1 = 1.061405429, -1.453152027, 1.421413741,
        # -0.284496736, 0.254829592
        ("h1", f"-1453152 + ((1061405 * tt) {op} 1000000)"),
        ("h2", f"1421414 + ((h1 * tt) {op} 1000000)"),
        ("h3", f"-284497 + ((h2 * tt) {op} 1000000)"),
        ("h4", f"254830 + ((h3 * tt) {op} 1000000)"),
        ("poly", f"(h4 * tt) {op} 1000000"),
        # exp(x^2) in micro via (T3(y/32))^32, y = x^2 <= 8e6 micro
        ("yx", f"(x * x) {op} 1000000"),
        ("eq", f"yx {op} 32"),
        ("eq2", f"(eq * eq) {op} 2000000"),
        ("u0", f"1000000 + eq + eq2 + ((eq2 * eq) {op} 3000000)"),
        ("u1", f"(u0 * u0) {op} 1000000"),
        ("u2", f"(u1 * u1) {op} 1000000"),
        ("u3", f"(u2 * u2) {op} 1000000"),
        ("u4", f"(u3 * u3) {op} 1000000"),
        ("u5", f"(u4 * u4) {op} 1000000"),
        # p = poly * exp(-x^2)
        ("p_micro", f"(poly * 1000000) {op} u5"),
    ]
    return cols


_FDR_Z = (
    "(cast(c as double) - cast(n as double) * cast(cc as double)"
    " / cast(nn as double))"
    " / sqrt(cast(n as double) * (cast(cc as double) / cast(nn as double))"
    " * (1.0 - cast(cc as double) / cast(nn as double)))"
)


def _fdr_oracle() -> str:
    chain = ",\n             ".join(
        f"{expr} AS {name}" for name, expr in _erfc_cols("//")
    )
    return f"""
    WITH g AS (
      SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
      GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(c) AS BIGINT) AS cc,
                   CAST(count(*) AS BIGINT) AS m
            FROM g),
    z AS (SELECT nation, n, c,
                 CAST(round({_FDR_Z} * 1000000) AS BIGINT) AS z_micro, m
          FROM g CROSS JOIN tot),
    p AS (SELECT nation, n, c, z_micro, m,
             {chain}
          FROM z),
    r AS (SELECT nation, n, c, z_micro, p_micro, m,
                 CAST(row_number() OVER (ORDER BY p_micro ASC, nation ASC)
                      AS BIGINT) AS bh_rank
          FROM p),
    k AS (SELECT max(CASE WHEN p_micro * m <= bh_rank * {_FDR_ALPHA_MICRO}
                          THEN bh_rank END) AS kstar
          FROM r)
    SELECT nation, n, c, z_micro, p_micro, bh_rank,
           CAST(CASE WHEN kstar IS NOT NULL AND bh_rank <= kstar
                     THEN 1 ELSE 0 END AS INT) AS reject_bh,
           CAST(CASE WHEN p_micro <= {_FDR_ALPHA_MICRO} THEN 1 ELSE 0 END
                AS INT) AS reject_naive
    FROM r CROSS JOIN k
    """


@register("fdr_bh_correction", _fdr_oracle())
def fdr_bh_correction(spark, sf_dir):
    """Benjamini-Hochberg FDR step-up over 25 per-nation one-sample
    proportion z-tests (urgent-order share vs the pooled rate) — the
    multiple-testing control every per-segment metric sweep needs (25
    naive alpha=.05 tests expect ~1.25 false positives; BH caps the
    expected false-discovery RATE at alpha). The two-sided p-value is a
    staged-INTEGER erfc (A-S 7.1.26 Horner + the IRLS cubic-Taylor exp
    chain — see _erfc_cols), so both engines compute identical micro-p's
    with zero transcendental-parity risk; the step-up (rank p ascending,
    k* = max{{i: p_i <= i*alpha/m}}, reject ranks <= k*) is pure integer
    comparison over the nation-grain aggregate.

    Plan: one star-join aggregate to 25 rows, a 1-row total cross-join,
    the alias chain as stacked projections (whole-stage codegen), a
    25-row global window (above the aggregate — gate-sanctioned), and a
    1-row k* cross-join."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    g = (
        orders.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).cast("long").alias("c"),
        )
    )
    tot = g.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("c").cast("long").alias("cc"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    z = g.crossJoin(F.broadcast(tot)).select(
        "nation", "n", "c", "m",
        F.expr(f"cast(round({_FDR_Z} * 1000000) as bigint)").alias("z_micro"),
    )
    p = z
    for name, expr in _erfc_cols("div"):
        p = p.withColumn(name, F.expr(expr))
    w = Window.orderBy(F.col("p_micro").asc(), F.col("nation").asc())
    r = p.select(
        "nation", "n", "c", "z_micro", "p_micro", "m",
        F.row_number().over(w).cast("long").alias("bh_rank"),
    )
    k = r.agg(
        F.max(
            F.expr(
                f"CASE WHEN p_micro * m <= bh_rank * {_FDR_ALPHA_MICRO}"
                " THEN bh_rank END"
            )
        ).alias("kstar")
    )
    return r.crossJoin(F.broadcast(k)).select(
        "nation", "n", "c", "z_micro", "p_micro", "bh_rank",
        F.expr(
            "cast(CASE WHEN kstar IS NOT NULL AND bh_rank <= kstar"
            " THEN 1 ELSE 0 END as int)"
        ).alias("reject_bh"),
        F.expr(
            f"cast(CASE WHEN p_micro <= {_FDR_ALPHA_MICRO} THEN 1 ELSE 0 END"
            " as int)"
        ).alias("reject_naive"),
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction interval (distribution-free coverage)
# ---------------------------------------------------------------------------

_CONF_KEY = "CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)"
_CONF_OLS_B1 = (
    "(cast(n as double) * sxy - cast(sx as double) * sy)"
    " / (cast(n as double) * sxx - cast(sx as double) * sx)"
)


def _conformal_oracle() -> str:
    h = md5_long_sql(_CONF_KEY, seed=17)
    return f"""
    WITH base AS (
      SELECT CAST(l_quantity AS INT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
             {h} % 10 AS fold
      FROM lineitem),
    fit AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM base WHERE fold <= 5),
    beta AS (
      SELECT CAST(round({_CONF_OLS_B1} * 1000000) AS BIGINT) AS b1_micro,
             CAST(round((cast(sy as double) - {_CONF_OLS_B1} * sx)
                        / cast(n as double) * 1000000) AS BIGINT) AS b0_micro,
             n AS n_train
      FROM fit),
    resid AS (
      SELECT fold, abs(y - ((b0_micro + b1_micro * x) // 1000000)) AS a
      FROM base CROSS JOIN beta),
    calib AS (SELECT a FROM resid WHERE fold IN (6, 7)),
    nc AS (SELECT CAST(count(*) AS BIGINT) AS n_calib FROM calib),
    q AS (SELECT a AS q_cents FROM calib CROSS JOIN nc
          ORDER BY a ASC
          LIMIT 1 OFFSET (SELECT least((9 * (n_calib + 1) + 9) // 10,
                                       n_calib) - 1 FROM nc)),
    test AS (
      SELECT CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(CASE WHEN a <= q.q_cents THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_cov
      FROM resid CROSS JOIN q WHERE fold >= 8)
    SELECT beta.b0_micro, beta.b1_micro, beta.n_train, nc.n_calib,
           test.n_test, CAST(q.q_cents AS BIGINT) AS q_cents,
           CAST(n_cov * 1000000 // n_test AS BIGINT) AS coverage_ppm
    FROM beta CROSS JOIN nc CROSS JOIN q CROSS JOIN test
    """


@register("conformal_interval", _conformal_oracle())
def conformal_interval(spark, sf_dir):
    """Split-conformal prediction interval around an OLS fit of line price
    on quantity: hash-deterministic 60/20/20 train/calibration/test folds,
    interval half-width q = the ceil(0.9*(n_c+1))-th smallest calibration
    |residual| (the finite-sample distribution-free >= 90% coverage
    guarantee of split conformal — Vovk/Papadopoulos), then EMPIRICAL
    coverage measured on the held-out test fold. The distribution-free
    uncertainty layer under every point-prediction op
    (linear_regression_stats, revenue_forecast).

    Plan: one scan builds folds + integer-staged features; the OLS fit is
    a 1-row exact-bigint-sums aggregate (broadcast back); the calibration
    order statistic runs through operators/cumsum.global_row_number (two-
    phase range-exchange rank — never a single-task global sort; the
    offsets collect is the documented EXECUTES_AT_BUILD pattern); coverage
    is one more aggregate. Every cross-join side is a 1-row aggregate."""
    from etl_mssql_to_postgres_dailysync_spark.operators.cumsum import global_row_number

    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_quantity").cast("int").alias("x"),
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("y"),
        (
            md5_long(
                F.concat(
                    F.col("l_orderkey").cast("string"), F.lit("-"),
                    F.col("l_linenumber").cast("string"),
                ),
                seed=17,
            ) % 10
        ).alias("fold"),
    )
    fit = base.filter(F.col("fold") <= 5).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("x * x")).cast("long").alias("sxx"),
        F.sum(F.expr("x * y")).cast("long").alias("sxy"),
    )
    beta = fit.select(
        F.expr(f"cast(round({_CONF_OLS_B1} * 1000000) as bigint)").alias("b1_micro"),
        F.expr(
            f"cast(round((cast(sy as double) - {_CONF_OLS_B1} * sx)"
            " / cast(n as double) * 1000000) as bigint)"
        ).alias("b0_micro"),
        F.col("n").alias("n_train"),
    )
    resid = base.crossJoin(F.broadcast(beta)).select(
        "fold",
        F.expr("abs(y - ((b0_micro + b1_micro * x) div 1000000))").alias("a"),
        "b0_micro", "b1_micro", "n_train",
    )
    calib = resid.filter(F.col("fold").isin(6, 7)).select("a")
    ranked, n_calib = global_row_number(calib, ["a"], out_col="rk")
    # clamp: ceil(0.9*(n+1)) exceeds n for n < 9, which would leave the
    # quantile row empty (and the oracle's n_test path dividing by zero) on
    # tiny calibration folds — fall back to the max calibration residual
    # (same clamp text in the oracle SQL)
    k = min((9 * (n_calib + 1) + 9) // 10, n_calib)
    # exactly one row matches rk == k; the limit(1) is a no-op that makes
    # the 1-row bound PROVABLE to the plan gate (GlobalLimit is a bounding
    # node; a Filter over the checkpointed rank RDD is not)
    q = (
        ranked.filter(F.col("rk") == k)
        .limit(1)
        .select(F.col("a").cast("long").alias("q_cents"))
    )
    test = resid.filter(F.col("fold") >= 8).crossJoin(F.broadcast(q)).agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(F.expr("CASE WHEN a <= q_cents THEN 1 ELSE 0 END"))
        .cast("long").alias("n_cov"),
        F.max("q_cents").alias("q_cents"),
    )
    summary = beta.crossJoin(F.broadcast(test)).withColumn(
        "n_calib", F.lit(n_calib).cast("long")
    )
    return summary.select(
        "b0_micro", "b1_micro", "n_train", "n_calib", "n_test", "q_cents",
        F.expr("cast(n_cov * 1000000 div n_test as bigint)").alias("coverage_ppm"),
    )


# ---------------------------------------------------------------------------
# Page-Hinkley mean-shift drift detector over the daily revenue series
# ---------------------------------------------------------------------------

_PH_DELTA_CENTS = 1000        # insensitivity margin delta
_PH_LAMBDA_CENTS = 50_000_000  # alarm threshold lambda


@register(
    "page_hinkley_drift",
    f"""
    WITH d AS (
      SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS x_cents
      FROM orders GROUP BY 1),
    c AS (SELECT day, x_cents,
                 CAST(sum(x_cents) OVER (ORDER BY day) AS BIGINT) AS cum,
                 CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
          FROM d),
    t AS (SELECT day, x_cents, cum // rn AS mean_to_date_cents,
                 x_cents - (cum // rn) - {_PH_DELTA_CENTS} AS term
          FROM c),
    m AS (SELECT day, x_cents, mean_to_date_cents,
                 CAST(sum(term) OVER (ORDER BY day) AS BIGINT) AS m_t
          FROM t),
    p AS (SELECT day, x_cents, mean_to_date_cents, m_t,
                 CAST(min(m_t) OVER (ORDER BY day) AS BIGINT) AS m_min
          FROM m)
    SELECT day, x_cents, mean_to_date_cents,
           CAST(m_t - m_min AS BIGINT) AS ph_cents,
           CAST(CASE WHEN m_t - m_min > {_PH_LAMBDA_CENTS} THEN 1 ELSE 0 END
                AS INT) AS alarm
    FROM p
    """,
)
def page_hinkley_drift(spark, sf_dir):
    """Page-Hinkley mean-INCREASE drift detector over daily revenue — the
    sequential change-point test next to event_rate_cusum (CUSUM tests a
    known null rate; PH tracks the RUNNING mean, so it needs no baseline):
    m_t = sum_s (x_s - mean_to_date_s - delta), alarm when m_t rises more
    than lambda above its running minimum. The standard streaming-drift
    monitor for ingest-volume / data-quality feeds.

    Plan: one data-grain aggregate to day grain, then three stacked
    day-grain windows (each above the aggregate — gate-sanctioned; the day
    spine is calendar-bounded at any volume). All arithmetic exact BIGINT
    cents; truncating div == DuckDB // on the non-negative running sums."""
    orders = _t(spark, sf_dir, "orders")
    d = orders.groupBy(
        F.col("o_orderdate").cast("date").cast("string").alias("day")
    ).agg(
        F.sum(F.expr("cast(round(o_totalprice * 100) as bigint)"))
        .cast("long").alias("x_cents")
    )
    w = Window.orderBy("day")
    c = d.select(
        "day", "x_cents",
        F.sum("x_cents").over(w).cast("long").alias("cum"),
        F.row_number().over(w).cast("long").alias("rn"),
    )
    t = c.select(
        "day", "x_cents",
        F.expr("cum div rn").alias("mean_to_date_cents"),
        F.expr(f"x_cents - (cum div rn) - {_PH_DELTA_CENTS}").alias("term"),
    )
    m = t.select(
        "day", "x_cents", "mean_to_date_cents",
        F.sum("term").over(w).cast("long").alias("m_t"),
    )
    p = m.select(
        "day", "x_cents", "mean_to_date_cents", "m_t",
        F.min("m_t").over(w).cast("long").alias("m_min"),
    )
    return p.select(
        "day", "x_cents", "mean_to_date_cents",
        (F.col("m_t") - F.col("m_min")).cast("long").alias("ph_cents"),
        F.expr(
            f"cast(case when m_t - m_min > {_PH_LAMBDA_CENTS} then 1 else 0 end"
            " as int)"
        ).alias("alarm"),
    )


# ---------------------------------------------------------------------------
# word2vec-style unigram^0.75 negative-sampling table (+ hash-draw audit)
# ---------------------------------------------------------------------------

_NS_DRAWS = 1000
# c^0.75 as sqrt(c * sqrt(c)): IEEE sqrt is correctly rounded in BOTH
# engines, so the weight is bit-identical without any pow/exp/ln call
_NS_W = "CAST(round(sqrt(CAST(c AS DOUBLE) * sqrt(CAST(c AS DOUBLE))) * 1000000) AS BIGINT)"


@register(
    "negative_sampling_unigram",
    f"""
    WITH {_LM_CTE},
    w AS (SELECT tok, CAST(c AS BIGINT) AS c, {_NS_W} AS w_micro FROM u),
    cw AS (SELECT tok, c, w_micro,
                  CAST(sum(w_micro) OVER (ORDER BY tok) - w_micro AS BIGINT) AS lo,
                  CAST(sum(w_micro) OVER (ORDER BY tok) AS BIGINT) AS hi
           FROM w),
    tot AS (SELECT CAST(sum(w_micro) AS BIGINT) AS tw FROM w),
    draws AS (SELECT {md5_long_sql("'ns-' || CAST(i AS VARCHAR)", seed=23)} AS h
              FROM (SELECT unnest(range(0, {_NS_DRAWS})) AS i)),
    du AS (SELECT h % tot.tw AS u FROM draws CROSS JOIN tot),
    hit AS (SELECT cw.tok, CAST(count(*) AS BIGINT) AS n_sampled
            FROM du JOIN cw ON du.u >= cw.lo AND du.u < cw.hi
            GROUP BY 1)
    SELECT cw.tok, cw.c, cw.w_micro,
           CAST(cw.w_micro * 1000000 // tot.tw AS BIGINT) AS p_ppm,
           CAST(coalesce(hit.n_sampled, 0) AS BIGINT) AS n_sampled
    FROM cw LEFT JOIN hit ON hit.tok = cw.tok CROSS JOIN tot
    """,
)
def negative_sampling_unigram(spark, sf_dir):
    """word2vec negative-sampling distribution p(w) proportional to
    count^0.75 over the corpus vocabulary, plus a {_NS_DRAWS}-draw
    inverse-CDF sampling audit (hash-deterministic draws range-joined to
    the cumulative-weight buckets). The 0.75 power is computed as
    sqrt(c * sqrt(c)) — IEEE sqrt is CORRECTLY ROUNDED in both engines, so
    the weights are bit-identical with no pow/exp/ln parity risk. This is
    the sampling table skip-gram training (skipgram_pairs_subsampled)
    consumes for its negatives.

    Plan: vocab aggregate -> vocab-grain cumulative window (bounded by
    vocab size, above the aggregate); the draw spine is a literal range
    (map-side hash only); the range join is literal-spine x vocab-grain —
    both sides plan-gate bounded. At 100 TB the vocab table is the only
    thing that grows, and the cumulative-bucket layout is exactly how
    production samplers ship it (alias tables are built FROM this)."""
    _t1, _tok, u, _nu = _lm_parts(spark, sf_dir)
    w_tbl = u.select(
        "tok", F.col("c").cast("long").alias("c"), F.expr(_NS_W).alias("w_micro")
    )
    win = Window.orderBy("tok")
    cw = w_tbl.select(
        "tok", "c", "w_micro",
        (F.sum("w_micro").over(win) - F.col("w_micro")).cast("long").alias("lo"),
        F.sum("w_micro").over(win).cast("long").alias("hi"),
    )
    tot = w_tbl.agg(F.sum("w_micro").cast("long").alias("tw"))
    draws = spark.range(_NS_DRAWS).select(
        md5_long(F.concat(F.lit("ns-"), F.col("id").cast("string")), seed=23)
        .alias("h")
    )
    du = draws.crossJoin(F.broadcast(tot)).select(
        (F.col("h") % F.col("tw")).alias("u")
    )
    hit = (
        du.join(F.broadcast(cw), (F.col("u") >= F.col("lo")) & (F.col("u") < F.col("hi")))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sampled"))
    )
    return (
        cw.join(hit, "tok", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "tok", "c", "w_micro",
            F.expr("cast(w_micro * 1000000 div tw as bigint)").alias("p_ppm"),
            F.coalesce(F.col("n_sampled"), F.lit(0)).cast("long").alias("n_sampled"),
        )
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival estimator (time to first purchase, right-censored)
# ---------------------------------------------------------------------------

_KM_LN_TERM = (
    "CAST(CASE WHEN d >= n_risk THEN -8000000 ELSE"
    " round((ln(CAST(n_risk - d AS DOUBLE)) - ln(CAST(n_risk AS DOUBLE)))"
    " * 1000000) END AS BIGINT)"
)
def _km_exp_cols(op: str) -> list[tuple[str, str]]:
    cols = [
        ("lc", "least(-ln_surv_unat, 8000000)"),
        ("eq", f"lc {op} 32"),
        ("eq2", f"(eq * eq) {op} 2000000"),
        ("v0", f"1000000 + eq + eq2 + ((eq2 * eq) {op} 3000000)"),
        ("v1", f"(v0 * v0) {op} 1000000"),
        ("v2", f"(v1 * v1) {op} 1000000"),
        ("v3", f"(v2 * v2) {op} 1000000"),
        ("v4", f"(v3 * v3) {op} 1000000"),
        ("v5", f"(v4 * v4) {op} 1000000"),
        ("surv_ppm", f"1000000000000 {op} v5"),
    ]
    return cols


def _km_oracle() -> str:
    chain = ",\n           ".join(
        f"{expr} AS {name}" for name, expr in _km_exp_cols("//")
    )
    return f"""
    WITH ue AS (
      SELECT user_id,
             CAST(min(epoch_us(ts)) AS BIGINT) AS t_first,
             CAST(min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
                  AS BIGINT) AS t_purch
      FROM events GROUP BY 1),
    mx AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS t_max FROM events),
    durs AS (
      SELECT CASE WHEN t_purch IS NOT NULL
                  THEN (t_purch - t_first) // 3600000000
                  ELSE (t_max - t_first) // 3600000000 END AS t_hours,
             CASE WHEN t_purch IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM ue CROSS JOIN mx),
    tg AS (SELECT t_hours, CAST(sum(ev) AS BIGINT) AS d,
                  CAST(count(*) AS BIGINT) AS leave_n
           FROM durs GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM durs),
    risk AS (
      SELECT t_hours, d,
             n_users - (CAST(sum(leave_n) OVER (ORDER BY t_hours) AS BIGINT)
                        - leave_n) AS n_risk
      FROM tg CROSS JOIN tot),
    ev_t AS (SELECT t_hours, d, n_risk, {_KM_LN_TERM} AS ln_term
             FROM risk WHERE d > 0),
    km AS (SELECT t_hours, d, n_risk,
                  CAST(sum(ln_term) OVER (ORDER BY t_hours) AS BIGINT)
                      AS ln_surv_unat
           FROM ev_t),
    fin AS (SELECT t_hours, d, n_risk, ln_surv_unat,
           {chain}
    FROM km)
    SELECT t_hours, d, n_risk, ln_surv_unat, surv_ppm FROM fin
    """


@register("kaplan_meier_survival", _km_oracle())
def kaplan_meier_survival(spark, sf_dir):
    """Kaplan-Meier survival curve for time-to-first-purchase (hours since
    a user's first event), right-censored at the observation horizon for
    users who never purchase — the canonical censoring-aware funnel/churn
    estimator (conversion_lag_stats without the survivorship bias). Each
    factor ln(1 - d/n) rounds to integer micro-nats per EVENT TIME before
    the cumulative sum (exact BIGINT, order-independent); survival in ppm
    comes from the staged-integer exp chain (same cubic-Taylor +
    5-squarings as the IRLS sigmoid — no cross-engine exp), clipped at
    ln S = -8 (S ~ 3e-4) where the curve is already pinned to zero.

    Plan: user-grain aggregate, 1-row horizon cross-join, duration-grain
    aggregate (bounded by the observation window in hours at ANY user
    count), then two duration-grain windows above it. The risk set is the
    suffix count computed from the prefix sum — no self-join."""
    ev = _t(spark, sf_dir, "events")
    ue = ev.groupBy("user_id").agg(
        F.min(F.unix_micros(F.col("ts"))).cast("long").alias("t_first"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros(F.col("ts")))
        ).cast("long").alias("t_purch"),
    )
    mx = ev.agg(F.max(F.unix_micros(F.col("ts"))).cast("long").alias("t_max"))
    durs = ue.crossJoin(F.broadcast(mx)).select(
        F.expr(
            "CASE WHEN t_purch IS NOT NULL"
            " THEN (t_purch - t_first) div 3600000000"
            " ELSE (t_max - t_first) div 3600000000 END"
        ).alias("t_hours"),
        F.expr("CASE WHEN t_purch IS NOT NULL THEN 1 ELSE 0 END").alias("ev"),
    )
    tg = durs.groupBy("t_hours").agg(
        F.sum("ev").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("leave_n"),
    )
    tot = durs.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    w = Window.orderBy("t_hours")
    risk = tg.crossJoin(F.broadcast(tot)).select(
        "t_hours", "d",
        (
            F.col("n_users")
            - (F.sum("leave_n").over(w) - F.col("leave_n"))
        ).cast("long").alias("n_risk"),
    )
    ev_t = risk.filter(F.col("d") > 0).select(
        "t_hours", "d", "n_risk", F.expr(_KM_LN_TERM).alias("ln_term")
    )
    km = ev_t.select(
        "t_hours", "d", "n_risk",
        F.sum("ln_term").over(w).cast("long").alias("ln_surv_unat"),
    )
    out = km
    for name, expr in _km_exp_cols("div"):
        out = out.withColumn(name, F.expr(expr))
    return out.select("t_hours", "d", "n_risk", "ln_surv_unat", "surv_ppm")


# ---------------------------------------------------------------------------
# Exact Shapley-value channel attribution over exposure coalitions
# ---------------------------------------------------------------------------

# |S|!(c-|S|-1)!/c! for c = 3 channels, in SIXTHS: |S| = 0 -> 2/6,
# |S| = 1 -> 1/6, |S| = 2 -> 2/6
_SHAP_W6 = "(CASE WHEN ssize = 0 THEN 2 WHEN ssize = 1 THEN 1 ELSE 2 END)"
_SHAP_FAST_US = 3 * 86400 * 1000000  # 72h conversion window


def _shapley_oracle() -> str:
    return f"""
    WITH f AS (
      SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS t0,
             CAST(min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
                  AS BIGINT) AS tp
      FROM events GROUP BY 1),
    u AS (
      SELECT e.user_id,
             max(CASE WHEN event_type = 'view'
                       AND epoch_us(e.ts) < coalesce(tp, t0 + {_SHAP_FAST_US})
                      THEN 1 ELSE 0 END)
             + 2 * max(CASE WHEN event_type = 'click'
                             AND epoch_us(e.ts) < coalesce(tp, t0 + {_SHAP_FAST_US})
                            THEN 1 ELSE 0 END)
             + 4 * max(CASE WHEN event_type = 'signup'
                             AND epoch_us(e.ts) < coalesce(tp, t0 + {_SHAP_FAST_US})
                            THEN 1 ELSE 0 END) AS mask,
             max(CASE WHEN tp IS NOT NULL AND tp - t0 < {_SHAP_FAST_US}
                      THEN 1 ELSE 0 END) AS y
      FROM events e JOIN f ON f.user_id = e.user_id
      GROUP BY 1),
    spine AS (SELECT unnest(range(0, 8)) AS mask),
    v AS (
      SELECT spine.mask,
             CAST(coalesce(count(u.user_id), 0) AS BIGINT) AS n,
             CAST(coalesce(sum(u.y), 0) AS BIGINT) AS conv,
             CAST(CASE WHEN count(u.user_id) = 0 THEN 0
                       ELSE coalesce(sum(u.y), 0) * 1000000 // count(u.user_id)
                  END AS BIGINT) AS v_ppm
      FROM spine LEFT JOIN u ON u.mask = spine.mask
      GROUP BY 1),
    ch AS (SELECT unnest(['view', 'click', 'signup']) AS channel,
                  unnest([1, 2, 4]) AS bit),
    pairs AS (
      SELECT ch.channel,
             CAST(bit_count(a.mask) AS INT) AS ssize,
             a.v_ppm AS v_without, b.v_ppm AS v_with
      FROM ch
      JOIN v a ON (a.mask & ch.bit) = 0
      JOIN v b ON b.mask = (a.mask | ch.bit))
    SELECT channel,
           CAST(sum({_SHAP_W6} * (v_with - v_without)) // 6 AS BIGINT)
               AS shapley_ppm,
           CAST(sum(CASE WHEN v_with > v_without THEN 1 ELSE 0 END) AS BIGINT)
               AS n_positive_margins
    FROM pairs GROUP BY 1
    """


@register("shapley_attribution", _shapley_oracle())
def shapley_attribution(spark, sf_dir):
    """EXACT Shapley-value attribution over the three pre-conversion
    marketing channels (view/click/signup), with v(S) = fast-conversion
    rate (purchase within 72h of first touch) among users exposed to
    EXACTLY coalition S before converting — the game-theoretic
    completion of the attribution family (multi-touch heuristics, Markov
    removal effects, and now Shapley, the only allocation satisfying
    efficiency/symmetry/dummy). With c = 3 channels the coalition lattice
    is 8 masks, so the EXACT factorial-weighted sum is computable — no
    sampling: weights |S|!(c-|S|-1)!/c! live in sixths and the whole
    allocation is integer ppm (one //6 at the end, after the exact
    weighted sum).

    Plan: user-grain aggregate to (mask, y), 8-row coalition aggregate
    (left-joined to a literal 8-mask spine so empty coalitions exist with
    v = 0), then literal-grain channel x coalition joins. Beyond the user
    aggregate everything is metadata-sized at any event volume."""
    ev = _t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.unix_micros(F.col("ts"))).cast("long").alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros(F.col("ts")))
        ).cast("long").alias("tp"),
    )
    cutoff = F.expr(f"coalesce(tp, t0 + {_SHAP_FAST_US})")
    def _touch(et, mult):
        return (
            F.max(
                F.when(
                    (F.col("event_type") == et)
                    & (F.unix_micros(F.col("ts")) < cutoff),
                    1,
                ).otherwise(0)
            ) * mult
        )
    u = ev.join(f, "user_id").groupBy("user_id").agg(
        (_touch("view", 1) + _touch("click", 2) + _touch("signup", 4)).alias("mask"),
        F.max(
            F.expr(
                f"CASE WHEN tp IS NOT NULL AND tp - t0 < {_SHAP_FAST_US}"
                " THEN 1 ELSE 0 END"
            )
        ).alias("y"),
    )
    spine = spark.range(8).select(F.col("id").cast("int").alias("mask"))
    v = (
        spine.join(u, spine.mask == u.mask, "left")
        .groupBy(spine.mask.alias("mask"))
        .agg(
            F.count("user_id").cast("long").alias("n"),
            F.coalesce(F.sum("y"), F.lit(0)).cast("long").alias("conv"),
        )
        .select(
            "mask", "n", "conv",
            F.expr(
                "cast(CASE WHEN n = 0 THEN 0 ELSE conv * 1000000 div n END"
                " as bigint)"
            ).alias("v_ppm"),
        )
    )
    ch = spark.createDataFrame(
        [("view", 1), ("click", 2), ("signup", 4)], ["channel", "bit"]
    )
    a = v.select(F.col("mask").alias("m0"), F.col("v_ppm").alias("v_without"))
    b = v.select(F.col("mask").alias("m1"), F.col("v_ppm").alias("v_with"))
    pairs = (
        ch.join(a, F.expr("(m0 & bit) = 0"))
        .join(b, F.expr("m1 = (m0 | bit)"))
        .select(
            "channel",
            F.expr("cast(bit_count(m0) as int)").alias("ssize"),
            "v_without", "v_with",
        )
    )
    return pairs.groupBy("channel").agg(
        F.expr(f"cast(sum({_SHAP_W6} * (v_with - v_without)) div 6 as bigint)")
        .alias("shapley_ppm"),
        F.sum(F.expr("CASE WHEN v_with > v_without THEN 1 ELSE 0 END"))
        .cast("long").alias("n_positive_margins"),
    )


# ---------------------------------------------------------------------------
# Qini uplift curve (cumulative incremental conversions by score bin)
# ---------------------------------------------------------------------------

@register(
    "uplift_qini_curve",
    f"""
    WITH f AS (
      SELECT user_id,
             CAST(min(epoch_us(ts)) AS BIGINT) AS t0,
             CAST(min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
                  AS BIGINT) AS tp,
             CAST(least(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END),
                        15) AS BIGINT) AS score
      FROM events GROUP BY 1),
    u AS (
      SELECT score, CAST(user_id % 2 AS INT) AS t,
             CASE WHEN tp IS NOT NULL AND tp - t0 < {_SHAP_FAST_US}
                  THEN 1 ELSE 0 END AS y
      FROM f),
    b AS (
      SELECT score,
             CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS c_t,
             CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS c_c
      FROM u GROUP BY 1),
    cum AS (
      SELECT score, n_t, c_t, n_c, c_c,
             CAST(sum(n_t) OVER (ORDER BY score DESC) AS BIGINT) AS cn_t,
             CAST(sum(c_t) OVER (ORDER BY score DESC) AS BIGINT) AS cc_t,
             CAST(sum(n_c) OVER (ORDER BY score DESC) AS BIGINT) AS cn_c,
             CAST(sum(c_c) OVER (ORDER BY score DESC) AS BIGINT) AS cc_c
      FROM b),
    tot AS (SELECT CAST(sum(n_t) AS BIGINT) AS tn_t,
                   CAST(sum(c_t) AS BIGINT) AS tc_t,
                   CAST(sum(n_c) AS BIGINT) AS tn_c,
                   CAST(sum(c_c) AS BIGINT) AS tc_c
            FROM b)
    SELECT score, n_t, c_t, n_c, c_c,
           CAST(cc_t * 1000000 - (cc_c * cn_t * 1000000) // greatest(cn_c, 1)
                AS BIGINT) AS qini_cum_micro,
           CAST(((tc_t * 1000000 - (tc_c * tn_t * 1000000) // greatest(tn_c, 1))
                 * (cn_t + cn_c)) // (tn_t + tn_c) AS BIGINT)
               AS random_cum_micro
    FROM cum CROSS JOIN tot
    """,
)
def uplift_qini_curve(spark, sf_dir):
    """Qini uplift curve: rank users by a targeting score (capped click
    count), and at each score cutoff compare cumulative incremental
    conversions Q(k) = C_t(k) - C_c(k) * N_t(k)/N_c(k) against the
    random-targeting diagonal — the standard evaluation for
    uplift/heterogeneous-treatment models (the causal sibling of the
    qini-free conversion_ab_ztest: WHO to treat, not whether treatment
    works). Treatment is the deterministic user-parity split; conversion
    is the 72h fast-purchase flag shared with shapley_attribution.

    Plan: user-grain aggregate, score-bin aggregate (<= 16 bins), one
    bin-grain descending cumulative window above it, one 1-row totals
    cross-join. Everything after the user aggregate is metadata-sized;
    all staging exact integer micro (floor-div by the control count,
    guarded for empty cells)."""
    ev = _t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.unix_micros(F.col("ts"))).cast("long").alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros(F.col("ts")))
        ).cast("long").alias("tp"),
        F.least(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)),
            F.lit(15),
        ).cast("long").alias("score"),
    )
    u = f.select(
        "score",
        (F.col("user_id") % 2).cast("int").alias("t"),
        F.expr(
            f"CASE WHEN tp IS NOT NULL AND tp - t0 < {_SHAP_FAST_US}"
            " THEN 1 ELSE 0 END"
        ).alias("y"),
    )
    b = u.groupBy("score").agg(
        F.sum(F.expr("CASE WHEN t = 1 THEN 1 ELSE 0 END")).cast("long").alias("n_t"),
        F.sum(F.expr("CASE WHEN t = 1 THEN y ELSE 0 END")).cast("long").alias("c_t"),
        F.sum(F.expr("CASE WHEN t = 0 THEN 1 ELSE 0 END")).cast("long").alias("n_c"),
        F.sum(F.expr("CASE WHEN t = 0 THEN y ELSE 0 END")).cast("long").alias("c_c"),
    )
    w = Window.orderBy(F.col("score").desc())
    cum = b.select(
        "score", "n_t", "c_t", "n_c", "c_c",
        F.sum("n_t").over(w).cast("long").alias("cn_t"),
        F.sum("c_t").over(w).cast("long").alias("cc_t"),
        F.sum("n_c").over(w).cast("long").alias("cn_c"),
        F.sum("c_c").over(w).cast("long").alias("cc_c"),
    )
    tot = b.agg(
        F.sum("n_t").cast("long").alias("tn_t"),
        F.sum("c_t").cast("long").alias("tc_t"),
        F.sum("n_c").cast("long").alias("tn_c"),
        F.sum("c_c").cast("long").alias("tc_c"),
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        "score", "n_t", "c_t", "n_c", "c_c",
        F.expr(
            "cast(cc_t * 1000000 - (cc_c * cn_t * 1000000)"
            " div greatest(cn_c, 1) as bigint)"
        ).alias("qini_cum_micro"),
        F.expr(
            "cast(((tc_t * 1000000 - (tc_c * tn_t * 1000000)"
            " div greatest(tn_c, 1)) * (cn_t + cn_c)) div (tn_t + tn_c)"
            " as bigint)"
        ).alias("random_cum_micro"),
    )


# ---------------------------------------------------------------------------
# Histogram-based gradient split finding (the XGBoost/LightGBM inner loop)
# ---------------------------------------------------------------------------

_SPLIT_LAMBDA = 1  # L2 regularizer on leaf weights
_SPLIT_GAIN = (
    "round((cast(gl as double) * gl / (cast(hl as double) + 1.0)"
    " + cast(gr as double) * gr / (cast(hr as double) + 1.0)"
    " - cast(gt as double) * gt / (cast(ht as double) + 1.0)) / 1000000.0)"
)


@register(
    "histogram_split_finding",
    f"""
    WITH base AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
             CAST(l_quantity AS INT) AS qty,
             CAST(round(l_discount * 100) AS INT) AS disc
      FROM lineitem),
    mu AS (SELECT CAST(sum(y) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_y
           FROM base),
    g AS (SELECT y - mean_y AS grad, qty, disc FROM base CROSS JOIN mu),
    hist AS (
      SELECT feature, bin, CAST(sum(grad) AS BIGINT) AS gb,
             CAST(count(*) AS BIGINT) AS hb
      FROM (SELECT 'quantity' AS feature, qty AS bin, grad FROM g
            UNION ALL
            SELECT 'discount' AS feature, disc AS bin, grad FROM g)
      GROUP BY 1, 2),
    cum AS (
      SELECT feature, bin, gb, hb,
             CAST(sum(gb) OVER (PARTITION BY feature ORDER BY bin) AS BIGINT)
                 AS gl,
             CAST(sum(hb) OVER (PARTITION BY feature ORDER BY bin) AS BIGINT)
                 AS hl,
             CAST(sum(gb) OVER (PARTITION BY feature) AS BIGINT) AS gt,
             CAST(sum(hb) OVER (PARTITION BY feature) AS BIGINT) AS ht
      FROM hist),
    gain AS (
      SELECT feature, bin, gl, hl, gt - gl AS gr, ht - hl AS hr,
             gt, ht,
             CAST({_SPLIT_GAIN} AS BIGINT) AS gain_scaled
      FROM cum WHERE hl > 0 AND ht - hl > 0),
    ranked AS (
      SELECT feature, bin AS split_bin, gl, hl, gr, hr, gain_scaled,
             CAST(row_number() OVER (PARTITION BY feature
                                     ORDER BY gain_scaled DESC, bin ASC)
                  AS INT) AS feature_rank
      FROM gain),
    best AS (SELECT max(gain_scaled) AS best_gain FROM ranked
             WHERE feature_rank = 1)
    SELECT feature, split_bin, gl, hl, gr, hr, gain_scaled, feature_rank,
           CAST(CASE WHEN feature_rank = 1 AND gain_scaled = best.best_gain
                     THEN 1 ELSE 0 END AS INT) AS is_global_best
    FROM ranked CROSS JOIN best
    WHERE feature_rank <= 5
    """,
)
def histogram_split_finding(spark, sf_dir):
    """Histogram-based greedy split finding — the inner loop of every
    gradient-boosted-tree trainer (XGBoost's 'approx'/LightGBM's
    histogram algorithm): bin each feature, accumulate per-bin gradient
    and hessian sums in ONE pass, and score every threshold with the
    structure gain GL^2/(HL+l) + GR^2/(HR+l) - G^2/(H+l). Squared-loss
    root node: grad = y - mean(y) exact integer cents, hessian = 1, so
    the histogram is exact BIGINT and only the final gain is a double
    (shared text from exact sums, scaled down 1e6 and rounded).

    Plan: one data-grain scan melted to (feature, bin) grain (the
    UNION ALL is two projections of the same scan), a <= 66-row histogram
    aggregate, prefix windows PARTITIONED BY feature above it, and a
    1-row best cross-join. This is exactly the layout that scales: at
    100 TB the histogram is still 66 rows per node, the melt is map-side,
    and the shuffle carries bins, not rows."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("y"),
        F.col("l_quantity").cast("int").alias("qty"),
        F.expr("cast(round(l_discount * 100) as int)").alias("disc"),
    )
    mu = base.agg(
        F.expr("cast(sum(y) as bigint) div cast(count(*) as bigint)")
        .alias("mean_y")
    )
    g = base.crossJoin(F.broadcast(mu)).select(
        (F.col("y") - F.col("mean_y")).alias("grad"), "qty", "disc"
    )
    melted = g.select(
        F.lit("quantity").alias("feature"), F.col("qty").alias("bin"), "grad"
    ).unionAll(
        g.select(
            F.lit("discount").alias("feature"), F.col("disc").alias("bin"), "grad"
        )
    )
    hist = melted.groupBy("feature", "bin").agg(
        F.sum("grad").cast("long").alias("gb"),
        F.count(F.lit(1)).cast("long").alias("hb"),
    )
    wp = Window.partitionBy("feature").orderBy("bin")
    wf = Window.partitionBy("feature")
    cum = hist.select(
        "feature", "bin", "gb", "hb",
        F.sum("gb").over(wp).cast("long").alias("gl"),
        F.sum("hb").over(wp).cast("long").alias("hl"),
        F.sum("gb").over(wf).cast("long").alias("gt"),
        F.sum("hb").over(wf).cast("long").alias("ht"),
    )
    gain = cum.filter((F.col("hl") > 0) & (F.col("ht") - F.col("hl") > 0)).select(
        "feature", "bin", "gl", "hl",
        (F.col("gt") - F.col("gl")).alias("gr"),
        (F.col("ht") - F.col("hl")).alias("hr"),
        "gt", "ht",
        F.expr(f"cast({_SPLIT_GAIN} as bigint)").alias("gain_scaled"),
    )
    wr = Window.partitionBy("feature").orderBy(
        F.col("gain_scaled").desc(), F.col("bin").asc()
    )
    ranked = gain.select(
        "feature", F.col("bin").alias("split_bin"), "gl", "hl", "gr", "hr",
        "gain_scaled",
        F.row_number().over(wr).cast("int").alias("feature_rank"),
    )
    best = ranked.filter(F.col("feature_rank") == 1).agg(
        F.max("gain_scaled").alias("best_gain")
    )
    return (
        ranked.filter(F.col("feature_rank") <= 5)
        .crossJoin(F.broadcast(best))
        .select(
            "feature", "split_bin", "gl", "hl", "gr", "hr", "gain_scaled",
            "feature_rank",
            F.expr(
                "cast(CASE WHEN feature_rank = 1 AND gain_scaled = best_gain"
                " THEN 1 ELSE 0 END as int)"
            ).alias("is_global_best"),
        )
    )


# ---------------------------------------------------------------------------
# Pairwise mutual information between categorical columns
# ---------------------------------------------------------------------------

# per-cell MI term n_xy/N * ln(N*n_xy/(n_x*n_y)), rounded to integer
# micro-nats PER CELL before summing (order-independent exact BIGINT)
_MI_TERM = (
    "CAST(round((ln(CAST(n AS DOUBLE)) + ln(CAST(n_xy AS DOUBLE))"
    " - ln(CAST(n_x AS DOUBLE)) - ln(CAST(n_y AS DOUBLE)))"
    " * CAST(n_xy AS DOUBLE) * 1000000.0 / CAST(n AS DOUBLE)) AS BIGINT)"
)
_H_TERM = (
    "CAST(round((ln(CAST(n AS DOUBLE)) - ln(CAST(c AS DOUBLE)))"
    " * CAST(c AS DOUBLE) * 1000000.0 / CAST(n AS DOUBLE)) AS BIGINT)"
)


def _mi_oracle() -> str:
    return f"""
    WITH rec AS (
      SELECT o_orderpriority AS priority, o_orderstatus AS status,
             c_mktsegment AS segment
      FROM orders JOIN customer ON c_custkey = o_custkey),
    m AS (SELECT 'priority_x_status' AS pair, priority AS x, status AS y FROM rec
          UNION ALL
          SELECT 'segment_x_priority', segment, priority FROM rec
          UNION ALL
          SELECT 'segment_x_status', segment, status FROM rec),
    jt AS (SELECT pair, x, y, CAST(count(*) AS BIGINT) AS n_xy
           FROM m GROUP BY 1, 2, 3),
    mx AS (SELECT pair, x, CAST(sum(n_xy) AS BIGINT) AS n_x FROM jt GROUP BY 1, 2),
    my AS (SELECT pair, y, CAST(sum(n_xy) AS BIGINT) AS n_y FROM jt GROUP BY 1, 2),
    nn AS (SELECT pair, CAST(sum(n_xy) AS BIGINT) AS n FROM jt GROUP BY 1),
    mi AS (
      SELECT jt.pair, CAST(count(*) AS BIGINT) AS n_cells,
             CAST(sum({_MI_TERM}) AS BIGINT) AS mi_unat
      FROM jt JOIN mx USING (pair, x) JOIN my USING (pair, y) JOIN nn USING (pair)
      GROUP BY 1),
    hx AS (SELECT mx.pair,
                  CAST(sum({_H_TERM.replace('c AS DOUBLE', 'n_x AS DOUBLE').replace('(c)', '(n_x)').replace('CAST(c', 'CAST(n_x')}) AS BIGINT) AS h_x_unat
           FROM mx JOIN nn USING (pair) GROUP BY 1),
    hy AS (SELECT my.pair,
                  CAST(sum({_H_TERM.replace('c AS DOUBLE', 'n_y AS DOUBLE').replace('(c)', '(n_y)').replace('CAST(c', 'CAST(n_y')}) AS BIGINT) AS h_y_unat
           FROM my JOIN nn USING (pair) GROUP BY 1)
    SELECT mi.pair, n_cells, mi_unat, h_x_unat, h_y_unat,
           CAST(round(CAST(mi_unat AS DOUBLE) * 1000000.0
                      / sqrt(CAST(h_x_unat AS DOUBLE) * CAST(h_y_unat AS DOUBLE)))
                AS BIGINT) AS nmi_ppm
    FROM mi JOIN hx USING (pair) JOIN hy USING (pair)
    """


@register("mutual_information_matrix", _mi_oracle())
def mutual_information_matrix(spark, sf_dir):
    """Pairwise mutual information (and sqrt-normalized NMI) between the
    categorical columns priority/status/segment — the feature-selection /
    redundancy screen next to cramers_v_association (chi-square measures
    deviation-from-independence; MI measures it in NATS, comparable
    across pairs via NMI). Each joint cell's term n_xy/N ln(N n_xy /
    (n_x n_y)) rounds to integer micro-nats per CELL before the sum, so
    the aggregate is exact BIGINT and order-independent; marginals come
    from re-aggregating the joint table (one data-grain pass total).

    Plan: one fact join melted to three (pair, x, y) streams map-side,
    a joint-cell aggregate (<= 25 cells per pair) that is
    localCheckpoint-ed — six downstream branches (mx/my/nn/mi/hx/hy)
    reference it, and without the barrier each branch re-executes the
    data-grain melt (48-scan plan, r6 verdict #3) — then marginal
    re-aggregates of the MATERIALIZED cell table (metadata-sized),
    equi-joins back. NMI's sqrt is the only double (shared text,
    correctly-rounded IEEE sqrt). EXECUTES_AT_BUILD: the eager
    checkpoint runs the joint-cell aggregate at plan-build time."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderstatus"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rec = orders.join(cust, F.col("c_custkey") == F.col("o_custkey")).select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
        F.col("c_mktsegment").alias("segment"),
    )
    m = (
        rec.select(F.lit("priority_x_status").alias("pair"),
                   F.col("priority").alias("x"), F.col("status").alias("y"))
        .unionAll(rec.select(F.lit("segment_x_priority").alias("pair"),
                             F.col("segment").alias("x"),
                             F.col("priority").alias("y")))
        .unionAll(rec.select(F.lit("segment_x_status").alias("pair"),
                             F.col("segment").alias("x"),
                             F.col("status").alias("y")))
    )
    jt = m.groupBy("pair", "x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("n_xy")
    )
    # <= 75-cell joint table consumed by SIX branches below — materialize
    # once so the data-grain melt never re-executes per branch
    jt = jt.localCheckpoint(eager=True)
    mx = jt.groupBy("pair", "x").agg(F.sum("n_xy").cast("long").alias("n_x"))
    my = jt.groupBy("pair", "y").agg(F.sum("n_xy").cast("long").alias("n_y"))
    nn = jt.groupBy("pair").agg(F.sum("n_xy").cast("long").alias("n"))
    mi = (
        jt.join(mx, ["pair", "x"]).join(my, ["pair", "y"]).join(nn, "pair")
        .groupBy("pair")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum(F.expr(_MI_TERM)).cast("long").alias("mi_unat"),
        )
    )
    hterm_x = _H_TERM.replace("CAST(c AS DOUBLE", "CAST(n_x AS DOUBLE")
    hterm_y = _H_TERM.replace("CAST(c AS DOUBLE", "CAST(n_y AS DOUBLE")
    hx = mx.join(nn, "pair").groupBy("pair").agg(
        F.sum(F.expr(hterm_x)).cast("long").alias("h_x_unat")
    )
    hy = my.join(nn, "pair").groupBy("pair").agg(
        F.sum(F.expr(hterm_y)).cast("long").alias("h_y_unat")
    )
    return mi.join(hx, "pair").join(hy, "pair").select(
        "pair", "n_cells", "mi_unat", "h_x_unat", "h_y_unat",
        F.expr(
            "cast(round(cast(mi_unat as double) * 1000000.0"
            " / sqrt(cast(h_x_unat as double) * cast(h_y_unat as double)))"
            " as bigint)"
        ).alias("nmi_ppm"),
    )


# ---------------------------------------------------------------------------
# Off-policy evaluation: IPS / self-normalized IPS over a logged bandit
# ---------------------------------------------------------------------------

# logging policy: action from the hash uniform with propensities
# 1/2, 3/10, 1/5 -> importance weights 1/p staged in THIRTIETHS (exact):
# w30 = 60, 100, 150
_IPS_ACTION = (
    "(CASE WHEN u < 500000 THEN 0 WHEN u < 800000 THEN 1 ELSE 2 END)"
)
_IPS_W30 = "(CASE WHEN a = 0 THEN 60 WHEN a = 1 THEN 100 ELSE 150 END)"
# target policy: deterministic rule on the user's click volume
_IPS_PI = "(CASE WHEN score >= 12 THEN 2 WHEN score >= 8 THEN 1 ELSE 0 END)"


@register(
    "ips_policy_evaluation",
    f"""
    WITH f AS (
      SELECT user_id,
             CAST(min(epoch_us(ts)) AS BIGINT) AS t0,
             CAST(min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
                  AS BIGINT) AS tp,
             CAST(least(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END),
                        15) AS BIGINT) AS score
      FROM events GROUP BY 1),
    log_t AS (
      SELECT user_id, score,
             {md5_long_sql("CAST(user_id AS VARCHAR)", seed=31)} % 1000000 AS u,
             CASE WHEN tp IS NOT NULL AND tp - t0 < {_SHAP_FAST_US}
                  THEN 1 ELSE 0 END AS r
      FROM f),
    act AS (SELECT user_id, score, r, {_IPS_ACTION} AS a FROM log_t),
    sc AS (
      SELECT r, a, {_IPS_W30} AS w30,
             CASE WHEN {_IPS_PI} = a THEN 1 ELSE 0 END AS match
      FROM act),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r) AS BIGINT) AS r_sum,
             CAST(sum(match * w30 * r) AS BIGINT) AS wr30,
             CAST(sum(match * w30) AS BIGINT) AS w30_sum,
             CAST(sum(match * w30 * w30) AS BIGINT) AS w30_sq
      FROM sc)
    SELECT n,
           CAST(r_sum * 1000000 // n AS BIGINT) AS v_direct_ppm,
           CAST(wr30 * 1000000 // (30 * n) AS BIGINT) AS v_ips_ppm,
           CAST(CASE WHEN w30_sum = 0 THEN 0
                     ELSE wr30 * 1000000 // w30_sum END AS BIGINT)
               AS v_snips_ppm,
           CAST(CASE WHEN w30_sq = 0 THEN 0
                     ELSE w30_sum * w30_sum * 1000 // w30_sq END AS BIGINT)
               AS ess_milli
    FROM agg
    """,
)
def ips_policy_evaluation(spark, sf_dir):
    """Off-policy evaluation of a deterministic targeting rule from logged
    bandit data: IPS (inverse-propensity scoring) and SNIPS
    (self-normalized) estimates of the target policy's conversion value,
    plus the effective sample size (sum w)^2 / sum w^2 — the
    counterfactual-evaluation primitive behind every
    recommendation/promo-policy change that ships WITHOUT an A/B test
    (the observational sibling of ucb_variant_allocation). The logging
    policy draws one of 3 actions from the seeded hash uniform with
    known propensities (1/2, 3/10, 1/5); importance weights 1/p are
    staged exactly in thirtieths, so IPS/SNIPS are exact integer ppm.
    Because the synthetic reward is action-independent, v_ips should
    concentrate on v_direct — the property test asserts exactly that
    unbiasedness check.

    Plan: user-grain aggregate, map-side action/weight CASEs, ONE 1-row
    aggregate. Nothing but the user shuffle at any scale."""
    ev = _t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.unix_micros(F.col("ts"))).cast("long").alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros(F.col("ts")))
        ).cast("long").alias("tp"),
        F.least(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)),
            F.lit(15),
        ).cast("long").alias("score"),
    )
    log_t = f.select(
        "user_id", "score",
        (md5_long(F.col("user_id"), seed=31) % 1000000).alias("u"),
        F.expr(
            f"CASE WHEN tp IS NOT NULL AND tp - t0 < {_SHAP_FAST_US}"
            " THEN 1 ELSE 0 END"
        ).alias("r"),
    )
    act = log_t.select("user_id", "score", "r", F.expr(_IPS_ACTION).alias("a"))
    sc = act.select(
        "r", "a",
        F.expr(_IPS_W30).alias("w30"),
        F.expr(f"CASE WHEN {_IPS_PI} = a THEN 1 ELSE 0 END").alias("match"),
    )
    agg = sc.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r").cast("long").alias("r_sum"),
        F.sum(F.expr("match * w30 * r")).cast("long").alias("wr30"),
        F.sum(F.expr("match * w30")).cast("long").alias("w30_sum"),
        F.sum(F.expr("match * w30 * w30")).cast("long").alias("w30_sq"),
    )
    return agg.select(
        "n",
        F.expr("cast(r_sum * 1000000 div n as bigint)").alias("v_direct_ppm"),
        F.expr("cast(wr30 * 1000000 div (30 * n) as bigint)").alias("v_ips_ppm"),
        F.expr(
            "cast(CASE WHEN w30_sum = 0 THEN 0"
            " ELSE wr30 * 1000000 div w30_sum END as bigint)"
        ).alias("v_snips_ppm"),
        F.expr(
            "cast(CASE WHEN w30_sq = 0 THEN 0"
            " ELSE w30_sum * w30_sum * 1000 div w30_sq END as bigint)"
        ).alias("ess_milli"),
    )


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman market-concentration index per part-type market
# ---------------------------------------------------------------------------

@register(
    "herfindahl_concentration",
    """
    WITH mkt AS (
      SELECT p_type AS market, l_suppkey AS supplier,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS rev_cents
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY 1, 2),
    tot AS (SELECT market, CAST(sum(rev_cents) AS BIGINT) AS mkt_cents,
                   CAST(count(*) AS BIGINT) AS n_suppliers
            FROM mkt GROUP BY 1),
    sh AS (SELECT mkt.market,
                  CAST(rev_cents * 10000 // mkt_cents AS BIGINT) AS share_bp
           FROM mkt JOIN tot USING (market)),
    hhi AS (SELECT market, CAST(sum(share_bp * share_bp) AS BIGINT) AS hhi
            FROM sh GROUP BY 1)
    SELECT hhi.market, tot.n_suppliers, tot.mkt_cents, hhi.hhi,
           CAST(CASE WHEN hhi.hhi >= 25000000 THEN 2
                     WHEN hhi.hhi >= 15000000 THEN 1
                     ELSE 0 END AS INT) AS concentration_class
    FROM hhi JOIN tot USING (market)
    ORDER BY hhi.hhi DESC, hhi.market ASC LIMIT 25
    """,
)
def herfindahl_concentration(spark, sf_dir):
    """Herfindahl-Hirschman concentration index per part-type market:
    HHI = sum over suppliers of (revenue share in basis points)^2 —
    the antitrust/market-structure metric completing the concentration
    family (nation_market_share gives shares, source_pareto_classes the
    80/20 cut; HHI is the single-number index regulators threshold at
    1500/2500). Shares stage in exact integer basis points (floor), so
    HHI is an exact BIGINT in [0, 1e8]; top-25 most concentrated markets
    via distributed TakeOrdered.

    Plan: fact join -> (market, supplier) aggregate -> market-grain
    re-aggregate -> equi-join back for shares -> market-grain HHI sum.
    Two shuffles at supplier-pair-free grain; no windows, no NLJ."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("cents"),
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    mkt = (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("p_type").alias("market"), F.col("l_suppkey").alias("supplier"))
        .agg(F.sum("cents").cast("long").alias("rev_cents"))
    )
    tot = mkt.groupBy("market").agg(
        F.sum("rev_cents").cast("long").alias("mkt_cents"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    sh = mkt.join(tot, "market").select(
        "market",
        F.expr("cast(rev_cents * 10000 div mkt_cents as bigint)").alias("share_bp"),
    )
    hhi = sh.groupBy("market").agg(
        F.sum(F.expr("share_bp * share_bp")).cast("long").alias("hhi")
    )
    return (
        hhi.join(tot, "market")
        .select(
            "market", "n_suppliers", "mkt_cents", "hhi",
            F.expr(
                # DOJ thresholds 1500/2500 on the 0..10000 share^2 scale map
                # to 15e6/25e6 on the basis-point^2 scale (x10000)
                "cast(CASE WHEN hhi >= 25000000 THEN 2"
                " WHEN hhi >= 15000000 THEN 1"
                " ELSE 0 END as int)"
            ).alias("concentration_class"),
        )
        .orderBy(F.col("hhi").desc(), F.col("market").asc())
        .limit(25)
    )


# ---------------------------------------------------------------------------
# KNN-Shapley data valuation (Jia et al. exact recursion, top-M truncated)
# ---------------------------------------------------------------------------

_KSV_K = 5    # KNN classifier size
_KSV_M = 25   # truncation: neighbors past rank M contribute <= 1/M each
_KSV_NQ = 8   # validation queries (vec_id < 8)


def _ksv_oracle() -> str:
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
               FROM embeddings WHERE vec_id < {_KSV_NQ}),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS nlabel
          FROM embeddings),
    scored AS (
        SELECT q.query_id, q.qlabel, c.neighbor_id, c.nlabel, {_COS_SQL} AS sim
        FROM c CROSS JOIN q WHERE c.neighbor_id <> q.query_id),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id ASC) AS rank
        FROM scored),
    top AS (SELECT query_id, neighbor_id,
                   CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END AS e, rank
            FROM ranked WHERE rank <= {_KSV_M}),
    delta AS (
        SELECT query_id, neighbor_id, rank, e,
               (e - coalesce(lead(e) OVER (PARTITION BY query_id
                                           ORDER BY rank), 0))
               * 1000000 // greatest({_KSV_K}, rank) AS d_micro
        FROM top),
    s AS (
        SELECT query_id, neighbor_id, e,
               CAST(sum(d_micro) OVER (PARTITION BY query_id ORDER BY rank DESC)
                    AS BIGINT) AS shap_micro
        FROM delta),
    agg AS (
        SELECT neighbor_id,
               CAST(count(*) AS BIGINT) AS n_queries_touched,
               CAST(sum(shap_micro) AS BIGINT) AS shap_micro_sum,
               CAST(sum(e) AS BIGINT) AS n_label_agree
        FROM s GROUP BY 1)
    SELECT neighbor_id, n_queries_touched, shap_micro_sum, n_label_agree
    FROM agg
    ORDER BY abs(shap_micro_sum) DESC, neighbor_id ASC LIMIT 20
    """


@register("knn_shapley_valuation", _ksv_oracle())
def knn_shapley_valuation(spark, sf_dir):
    """KNN-Shapley data valuation (Jia et al., VLDB'19): the EXACT Shapley
    value of each training embedding for a K-NN classifier admits a
    closed-form recursion over the distance ranking — s_j = s_(j+1) +
    (1[y_j = y] - 1[y_(j+1) = y]) / max(K, j) — so per-point influence on
    validation accuracy is computable without retraining anything. This
    is the data-curation lens on the similarity stack: which corpus
    points HELP (positive value) or HURT (label noise: negative value)
    the downstream classifier; the per-example companion to
    loo_source_influence's source-level jackknife. Truncated at the
    top-{_KSV_M} ranks (the tail terms are bounded by 1/rank <= 1/{_KSV_M}
    each — the standard truncation).

    Plan: the sanctioned corpus x broadcast({_KSV_NQ} queries) scoring arm
    (same as similarity_brute_topk), per-query top-{_KSV_M} window, then a
    lead + suffix-sum window PAIR over the {_KSV_M}-row-per-query spine
    (post-limit, bounded), a neighbor-grain aggregate, distributed top-20.
    Each recursion term floors to integer micro BEFORE the suffix sum, so
    both engines walk the identical recursion."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _KSV_NQ)
    topk = similarity.brute_force_topk(q, emb, k=_KSV_M)
    nl = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel"))
    ql = emb.filter(F.col("vec_id") < _KSV_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    top = (
        topk.join(nl, "neighbor_id")
        .join(F.broadcast(ql), "query_id")
        .select(
            "query_id", "neighbor_id", "rank",
            F.expr("CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END").alias("e"),
        )
    )
    wlead = Window.partitionBy("query_id").orderBy("rank")
    delta = top.select(
        "query_id", "neighbor_id", "rank", "e",
        F.expr(
            f"(e - coalesce(lead(e) OVER (PARTITION BY query_id ORDER BY rank), 0))"
            f" * 1000000 div greatest({_KSV_K}, rank)"
        ).alias("d_micro"),
    )
    wsuf = Window.partitionBy("query_id").orderBy(F.col("rank").desc())
    s = delta.select(
        "query_id", "neighbor_id", "e",
        F.sum("d_micro").over(wsuf).cast("long").alias("shap_micro"),
    )
    agg = s.groupBy("neighbor_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_queries_touched"),
        F.sum("shap_micro").cast("long").alias("shap_micro_sum"),
        F.sum("e").cast("long").alias("n_label_agree"),
    )
    return agg.orderBy(
        F.abs(F.col("shap_micro_sum")).desc(), F.col("neighbor_id").asc()
    ).limit(20)


# ---------------------------------------------------------------------------
# Token burstiness (Fano factor) — topical vs function words
# ---------------------------------------------------------------------------

@register(
    "text_burstiness_fano",
    f"""
    WITH t1 AS (SELECT doc_id, {_TOKS_SQL} AS tk
                FROM documents WHERE length(trim(text)) > 0),
    tok AS (SELECT doc_id, unnest(tk) AS tok FROM t1),
    dc AS (SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
    st AS (SELECT tok, CAST(count(*) AS BIGINT) AS df,
                  CAST(sum(c) AS BIGINT) AS total_c,
                  CAST(sum(c * c) AS BIGINT) AS sum_c2
           FROM dc GROUP BY 1),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM t1)
    SELECT tok, df, total_c,
           CAST((n_docs * sum_c2 - total_c * total_c) * 1000000
                // (n_docs * total_c) AS BIGINT) AS fano_ppm,
           CAST(CASE WHEN (n_docs * sum_c2 - total_c * total_c) * 1000000
                          // (n_docs * total_c) > 1100000
                     THEN 1 ELSE 0 END AS INT) AS bursty
    FROM st CROSS JOIN nd
    """,
)
def text_burstiness_fano(spark, sf_dir):
    """Per-token burstiness via the Fano factor F = var/mean of the
    per-document count (zeros included) — Church & Gale's dispersion
    test: F ~ 1 means Poisson scatter (function words), F >> 1 means the
    token CLUMPS into few documents (topical/bursty words — the terms
    worth indexing, boosting, or treating as keywords). Computable from
    three exact sums per token: with D docs, F = (D*sum(c^2) -
    (sum c)^2) / (D * sum c) — the zero-count docs enter through D alone,
    so the sparse (token, doc) table never materializes zeros. Flagged
    bursty above 1.1 (margin over Poisson).

    Plan: explode -> (tok, doc) aggregate -> token-grain aggregate -> one
    1-row doc-count cross-join. Exact BIGINT rational staging (single
    floor-div at the end); sum_c2 <= (max c)^2 * df stays far inside
    int64 at any corpus scale that fits a vocab table."""
    docs = _t(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    t1 = docs.select("doc_id", text.tokens(text.normalize(F.col("text"))).alias("tk"))
    tok = t1.select("doc_id", F.explode("tk").alias("tok"))
    dc = tok.groupBy("tok", "doc_id").agg(F.count(F.lit(1)).cast("long").alias("c"))
    st = dc.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("total_c"),
        F.sum(F.expr("c * c")).cast("long").alias("sum_c2"),
    )
    nd = t1.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    fano = "(n_docs * sum_c2 - total_c * total_c) * 1000000 div (n_docs * total_c)"
    return st.crossJoin(F.broadcast(nd)).select(
        "tok", "df", "total_c",
        F.expr(f"cast({fano} as bigint)").alias("fano_ppm"),
        F.expr(
            f"cast(CASE WHEN {fano} > 1100000 THEN 1 ELSE 0 END as int)"
        ).alias("bursty"),
    )


# ---------------------------------------------------------------------------
# Simpson's-paradox stratification audit
# ---------------------------------------------------------------------------

@register(
    "simpson_paradox_audit",
    """
    WITH rec AS (
      SELECT n_name AS nation, CAST(o_custkey % 2 AS INT) AS variant,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey),
    s AS (SELECT nation,
                 CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
                 CAST(sum(CASE WHEN variant = 0 THEN y ELSE 0 END) AS BIGINT) AS c0,
                 CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(sum(CASE WHEN variant = 1 THEN y ELSE 0 END) AS BIGINT) AS c1
          FROM rec GROUP BY 1),
    pool AS (SELECT CAST(sum(c1) * 1000000 // greatest(sum(n1), 1)
                         - sum(c0) * 1000000 // greatest(sum(n0), 1) AS BIGINT)
                 AS pooled_diff_ppm
             FROM s)
    SELECT nation, n0, c0, n1, c1,
           CAST(c1 * 1000000 // greatest(n1, 1)
                - c0 * 1000000 // greatest(n0, 1) AS BIGINT) AS diff_ppm,
           pooled_diff_ppm,
           CAST(CASE WHEN (c1 * 1000000 // greatest(n1, 1)
                           - c0 * 1000000 // greatest(n0, 1) > 0)
                          <> (pooled_diff_ppm > 0)
                      AND c1 * 1000000 // greatest(n1, 1)
                          - c0 * 1000000 // greatest(n0, 1) <> 0
                     THEN 1 ELSE 0 END AS INT) AS sign_reversed
    FROM s CROSS JOIN pool
    """,
)
def simpson_paradox_audit(spark, sf_dir):
    """Simpson's-paradox screen: compare the POOLED variant effect on the
    urgent-order rate against every per-nation stratum effect and flag
    strata whose sign REVERSES the pooled conclusion — the aggregation
    audit that must run before any segment-level readout of an A/B test
    (pooled positives driven by stratum mix, not treatment, are the
    textbook trap). Strata with zero diff are not flagged (no reversal).

    Plan: one star-join aggregate to nation grain, a 1-row pooled
    cross-join. All effects exact integer ppm (per-arm floor-div, shared
    expression text on both engines)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rec = (
        orders.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            (F.col("o_custkey") % 2).cast("int").alias("variant"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            .alias("y"),
        )
    )
    s = rec.groupBy("nation").agg(
        F.sum(F.expr("CASE WHEN variant = 0 THEN 1 ELSE 0 END")).cast("long").alias("n0"),
        F.sum(F.expr("CASE WHEN variant = 0 THEN y ELSE 0 END")).cast("long").alias("c0"),
        F.sum(F.expr("CASE WHEN variant = 1 THEN 1 ELSE 0 END")).cast("long").alias("n1"),
        F.sum(F.expr("CASE WHEN variant = 1 THEN y ELSE 0 END")).cast("long").alias("c1"),
    )
    pool = s.agg(
        F.expr(
            "cast(sum(c1) * 1000000 div greatest(sum(n1), 1)"
            " - sum(c0) * 1000000 div greatest(sum(n0), 1) as bigint)"
        ).alias("pooled_diff_ppm")
    )
    diff = ("c1 * 1000000 div greatest(n1, 1)"
            " - c0 * 1000000 div greatest(n0, 1)")
    return s.crossJoin(F.broadcast(pool)).select(
        "nation", "n0", "c0", "n1", "c1",
        F.expr(f"cast({diff} as bigint)").alias("diff_ppm"),
        "pooled_diff_ppm",
        F.expr(
            f"cast(CASE WHEN ({diff} > 0) <> (pooled_diff_ppm > 0)"
            f" AND {diff} <> 0 THEN 1 ELSE 0 END as int)"
        ).alias("sign_reversed"),
    )


# ---------------------------------------------------------------------------
# AdaBoost with depth-1 stumps, fully declarative (no driver-side loop)
# ---------------------------------------------------------------------------

_ADA_ROUNDS = 3
# per-round weight factor sqrt((W-E)/E) in micro, clamped to [1, 10] x 1e6:
# the cap bounds weight growth (w <= 1e6 * 10^rounds) and both engines
# apply the identical clamp text
_ADA_F = (
    "least(CAST(round(sqrt(CAST(w_tot - e_best AS DOUBLE)"
    " / CAST(greatest(e_best, 1) AS DOUBLE)) * 1000000) AS BIGINT),"
    " 10000000)"
)
_ADA_ALPHA = (
    "CAST(round(ln(CAST(f_micro AS DOUBLE) / 1000000.0) * 1000000) AS BIGINT)"
)
# stump prediction from the broadcast best-split row
_ADA_H = (
    "(CASE WHEN (CASE WHEN feature = 'quantity' THEN qty ELSE disc END)"
    " <= split_bin THEN polarity ELSE -polarity END)"
)


def _ada_round_sql(t: int) -> str:
    """One unrolled boosting round as CTEs: weighted stump errors from the
    prefix-summed weight histogram, argmin split, weight update."""
    w = f"w{t}"
    carry = "".join(
        f"\n             h{s_}, alpha{s_}_micro," for s_ in range(1, t)
    )
    return f"""
    hist{t} AS (
      SELECT feature, bin,
             CAST(sum(CASE WHEN y = 1 THEN {w} ELSE 0 END) AS BIGINT) AS wp,
             CAST(sum(CASE WHEN y = -1 THEN {w} ELSE 0 END) AS BIGINT) AS wn
      FROM rows{t}
      CROSS JOIN (SELECT 1) dummy{t}
      , LATERAL (SELECT unnest(['quantity', 'discount']) AS feature) feat{t}
      , LATERAL (SELECT CASE WHEN feature = 'quantity' THEN qty ELSE disc END
                 AS bin) bincol{t}
      GROUP BY 1, 2),
    cum{t} AS (
      SELECT feature, bin,
             CAST(sum(wp) OVER (PARTITION BY feature ORDER BY bin) AS BIGINT)
                 AS cwp,
             CAST(sum(wn) OVER (PARTITION BY feature ORDER BY bin) AS BIGINT)
                 AS cwn,
             CAST(sum(wp) OVER (PARTITION BY feature) AS BIGINT) AS twp,
             CAST(sum(wn) OVER (PARTITION BY feature) AS BIGINT) AS twn
      FROM hist{t}),
    cand{t} AS (
      SELECT feature, bin, 1 AS polarity, cwn + (twp - cwp) AS err,
             twp + twn AS w_tot
      FROM cum{t}
      UNION ALL
      SELECT feature, bin, -1, cwp + (twn - cwn), twp + twn FROM cum{t}),
    best{t} AS (
      SELECT feature, bin AS split_bin, polarity,
             CAST(err AS BIGINT) AS e_best, CAST(w_tot AS BIGINT) AS w_tot,
             {_ADA_F} AS f_micro
      FROM cand{t}
      ORDER BY err ASC, feature ASC, bin ASC, polarity DESC LIMIT 1),
    rows{t + 1} AS (
      SELECT y, qty, disc,{carry}
             CASE WHEN {_ADA_H} <> y THEN {w} * f_micro // 1000000
                  ELSE {w} * 1000000 // f_micro END AS w{t + 1},
             {_ADA_H} AS h{t}, f_micro AS f{t}_micro,
             {_ADA_ALPHA} AS alpha{t}_micro
      FROM rows{t} CROSS JOIN best{t})
    """


def _ada_oracle() -> str:
    rounds = ",".join(_ada_round_sql(t) for t in range(1, _ADA_ROUNDS + 1))
    score = " + ".join(f"alpha{t}_micro * h{t}" for t in range(1, _ADA_ROUNDS + 1))
    bests = "\nUNION ALL\n".join(
        f"""SELECT {t} AS round, feature, split_bin, polarity,
            CAST(e_best * 1000000 // w_tot AS BIGINT) AS eps_ppm,
            {_ADA_ALPHA} AS alpha_micro
            FROM best{t}"""
        for t in range(1, _ADA_ROUNDS + 1)
    )
    return f"""
    WITH rows1 AS (
      SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END AS y,
             CAST(l_quantity AS INT) AS qty,
             CAST(round(l_discount * 100) AS INT) AS disc,
             CAST(1000000 AS BIGINT) AS w1
      FROM lineitem),
    {rounds},
    acc AS (
      SELECT CAST(sum(CASE WHEN (CASE WHEN {score} > 0 THEN 1 ELSE -1 END) = y
                           THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
                 AS ensemble_acc_ppm
      FROM rows{_ADA_ROUNDS + 1}),
    b AS ({bests})
    SELECT b.round, b.feature, b.split_bin, b.polarity, b.eps_ppm,
           b.alpha_micro, acc.ensemble_acc_ppm
    FROM b CROSS JOIN acc
    """


@register("adaboost_stumps", _ada_oracle())
def adaboost_stumps(spark, sf_dir):
    """AdaBoost with {_ADA_ROUNDS} depth-1 stumps over the binned
    quantity/discount features, predicting returned lineitems. Each
    round's best stump is a 1-row aggregate (weighted-error argmin over
    the prefix-summed weight histogram, the same layout as
    histogram_split_finding) COLLECTED into literals — the sanctioned
    bounded-collect pattern (same as bpe_train_merges) — so the
    reweighting is a pure literal projection and the unrolled ensemble
    plan stays LINEAR in the round count. (The r6 build cross-joined the
    un-materialized 1-row best back instead; the diamond lineage
    re-executed the histogram pass per branch — 249-scan plan, ~6x slower
    for identical output; r6 verdict #2.) The weight factor sqrt((W-E)/E)
    uses correctly-rounded IEEE sqrt, rounds to micro, and is clamped to
    <= 10x per round — weights stay exact BIGINT and both engines replay
    the identical reweighting; alpha = ln(f) is derived from the
    ALREADY-ROUNDED factor (shared rounding semantics on the same
    f_micro), and the final row set scores the ensemble sign for train
    accuracy.

    Plan, per round: data-grain melt -> <= 66-row weighted histogram ->
    prefix windows above it -> 1-row TakeOrdered argmin -> 1-row collect.
    The shuffle per round carries bins, not rows; at 100 TB this is
    {_ADA_ROUNDS} histogram passes over the fact table plus one scoring
    pass, which is exactly how distributed boosting frameworks structure
    it. EXECUTES_AT_BUILD: the per-round 1-row argmin collects run at
    plan-build time."""
    li = _t(spark, sf_dir, "lineitem")
    rows = li.select(
        F.expr("CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END").alias("y"),
        F.col("l_quantity").cast("int").alias("qty"),
        F.expr("cast(round(l_discount * 100) as int)").alias("disc"),
        F.lit(1000000).cast("long").alias("w1"),
    )
    best_rows = []
    for t in range(1, _ADA_ROUNDS + 1):
        w = f"w{t}"
        melted = rows.select(
            "y", F.lit("quantity").alias("feature"), F.col("qty").alias("bin"), F.col(w).alias("wgt")
        ).unionAll(rows.select(
            "y", F.lit("discount").alias("feature"), F.col("disc").alias("bin"), F.col(w).alias("wgt")
        ))
        hist = melted.groupBy("feature", "bin").agg(
            F.sum(F.expr("CASE WHEN y = 1 THEN wgt ELSE 0 END")).cast("long").alias("wp"),
            F.sum(F.expr("CASE WHEN y = -1 THEN wgt ELSE 0 END")).cast("long").alias("wn"),
        )
        wp_ = Window.partitionBy("feature").orderBy("bin")
        wf_ = Window.partitionBy("feature")
        cum = hist.select(
            "feature", "bin",
            F.sum("wp").over(wp_).cast("long").alias("cwp"),
            F.sum("wn").over(wp_).cast("long").alias("cwn"),
            F.sum("wp").over(wf_).cast("long").alias("twp"),
            F.sum("wn").over(wf_).cast("long").alias("twn"),
        )
        cand = cum.select(
            "feature", "bin", F.lit(1).alias("polarity"),
            (F.col("cwn") + F.col("twp") - F.col("cwp")).alias("err"),
            (F.col("twp") + F.col("twn")).alias("w_tot"),
        ).unionAll(cum.select(
            "feature", "bin", F.lit(-1).alias("polarity"),
            (F.col("cwp") + F.col("twn") - F.col("cwn")).alias("err"),
            (F.col("twp") + F.col("twn")).alias("w_tot"),
        ))
        best = (
            cand.orderBy(
                F.col("err").asc(), F.col("feature").asc(),
                F.col("bin").asc(), F.col("polarity").desc(),
            )
            .limit(1)
            .select(
                "feature", F.col("bin").alias("split_bin"), "polarity",
                F.col("err").cast("long").alias("e_best"),
                F.col("w_tot").cast("long").alias("w_tot"),
                F.expr(_ADA_F).alias("f_micro"),
            )
        )
        b = best.collect()[0]  # 1-row bounded collect per round
        best_rows.append(b)
        f_micro = int(b["f_micro"])
        # _ADA_H / _ADA_ALPHA with the broadcast-row columns replaced by the
        # collected literals — identical expression text modulo literals, so
        # the per-row arithmetic (and the oracle parity) is unchanged
        h_lit = (
            f"(CASE WHEN (CASE WHEN '{b['feature']}' = 'quantity' THEN qty"
            f" ELSE disc END) <= {int(b['split_bin'])}"
            f" THEN {int(b['polarity'])} ELSE {-int(b['polarity'])} END)"
        )
        alpha_lit = (
            f"CAST(round(ln(CAST({f_micro} AS DOUBLE) / 1000000.0)"
            " * 1000000) AS BIGINT)"
        )
        rows = rows.select(
            "y", "qty", "disc",
            *[F.col(f"h{s}") for s in range(1, t)],
            *[F.col(f"alpha{s}_micro") for s in range(1, t)],
            F.expr(
                f"CASE WHEN {h_lit} <> y THEN {w} * {f_micro} div 1000000"
                f" ELSE {w} * 1000000 div {f_micro} END"
            ).cast("long").alias(f"w{t + 1}"),
            F.expr(h_lit).alias(f"h{t}"),
            F.expr(alpha_lit).alias(f"alpha{t}_micro"),
        )
    score = " + ".join(f"alpha{t}_micro * h{t}" for t in range(1, _ADA_ROUNDS + 1))
    acc = rows.agg(
        F.expr(
            f"cast(sum(CASE WHEN (CASE WHEN {score} > 0 THEN 1 ELSE -1 END) = y"
            " THEN 1 ELSE 0 END) * 1000000 div count(*) as bigint)"
        ).alias("ensemble_acc_ppm")
    )
    out = None
    for t, b in enumerate(best_rows, start=1):
        row = spark.range(1).select(
            F.lit(t).cast("int").alias("round"),
            F.lit(b["feature"]).alias("feature"),
            F.lit(int(b["split_bin"])).cast("int").alias("split_bin"),
            F.lit(int(b["polarity"])).cast("int").alias("polarity"),
            # L suffixes: a literal that happens to fit in INT32 would
            # otherwise make the multiply 32-bit and silently wrap
            # (non-ANSI session) — data-dependent, invisible at larger sfs
            F.expr(
                f"cast({int(b['e_best'])}L * 1000000L"
                f" div {int(b['w_tot'])}L as bigint)"
            ).alias("eps_ppm"),
            F.expr(
                f"CAST(round(ln(CAST({int(b['f_micro'])} AS DOUBLE)"
                " / 1000000.0) * 1000000) AS BIGINT)"
            ).alias("alpha_micro"),
        )
        out = row if out is None else out.unionAll(row)
    return out.crossJoin(F.broadcast(acc))


# ---------------------------------------------------------------------------
# SPRT — Wald's sequential probability ratio test over the daily feed
# ---------------------------------------------------------------------------

# H0: urgent-share p0 = 0.18, H1: p1 = 0.22, alpha = beta = 0.05.
# Per-order LLR increments in micro-nats (literals, no runtime ln):
#   success: ln(p1/p0)           = 200671
#   failure: ln((1-p1)/(1-p0))   = -50010
# Boundaries +-ln((1-b)/a) = ln 19 = 2944439.
_SPRT_K1, _SPRT_K0, _SPRT_A = 200671, -50010, 2944439


@register(
    "sprt_sequential_test",
    f"""
    WITH d AS (
      SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
      FROM orders GROUP BY 1),
    llr AS (
      SELECT day, n, c,
             CAST(sum(c * {_SPRT_K1} + (n - c) * {_SPRT_K0})
                  OVER (ORDER BY day) AS BIGINT) AS llr_micro
      FROM d),
    dec AS (
      SELECT day, n, c, llr_micro,
             CAST(CASE WHEN llr_micro >= {_SPRT_A} THEN 1
                       WHEN llr_micro <= -{_SPRT_A} THEN -1
                       ELSE 0 END AS INT) AS decision
      FROM llr),
    firstd AS (
      SELECT min(day) AS first_day FROM dec WHERE decision <> 0)
    SELECT day, n, c, llr_micro, decision,
           CAST(CASE WHEN firstd.first_day IS NOT NULL AND day = firstd.first_day
                     THEN 1 ELSE 0 END AS INT) AS is_first_decision
    FROM dec CROSS JOIN firstd
    """,
)
def sprt_sequential_test(spark, sf_dir):
    """Wald's SPRT monitoring the urgent-order share day by day — the
    always-valid sequential test that lets an experiment STOP at the first
    decisive day instead of a fixed horizon (the sequential sibling of
    conversion_ab_ztest; alpha/beta are controlled at 5% by the +-ln 19
    boundaries regardless of when you peek). Per-order log-likelihood
    increments ln(p1/p0) and ln(q1/q0) are precomputed micro-nat LITERALS
    (H0: 18% vs H1: 22%), so the entire statistic is an exact BIGINT
    prefix sum — no runtime transcendental at any scale.

    Plan: one data-grain aggregate to day grain, one day-grain cumulative
    window above it, a 1-row first-crossing cross-join."""
    orders = _t(spark, sf_dir, "orders")
    d = orders.groupBy(
        F.col("o_orderdate").cast("date").cast("string").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).cast("long").alias("c"),
    )
    w = Window.orderBy("day")
    llr = d.select(
        "day", "n", "c",
        F.sum(
            F.expr(f"c * {_SPRT_K1} + (n - c) * {_SPRT_K0}")
        ).over(w).cast("long").alias("llr_micro"),
    )
    dec = llr.select(
        "day", "n", "c", "llr_micro",
        F.expr(
            f"cast(CASE WHEN llr_micro >= {_SPRT_A} THEN 1"
            f" WHEN llr_micro <= -{_SPRT_A} THEN -1 ELSE 0 END as int)"
        ).alias("decision"),
    )
    firstd = dec.filter(F.col("decision") != 0).agg(
        F.min("day").alias("first_day")
    )
    return dec.crossJoin(F.broadcast(firstd)).select(
        "day", "n", "c", "llr_micro", "decision",
        F.expr(
            "cast(CASE WHEN first_day IS NOT NULL AND day = first_day"
            " THEN 1 ELSE 0 END as int)"
        ).alias("is_first_decision"),
    )


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes language classifier (train/test split, confusion)
# ---------------------------------------------------------------------------

_NB_V = 64  # Laplace smoothing denominator add (vocabulary size bound)


def _nb_oracle() -> str:
    h = md5_long_sql("CAST(doc_id AS VARCHAR)", seed=41)
    return f"""
    WITH docs AS (
      SELECT doc_id, lang, {_TOKS_SQL} AS tk, {h} % 5 AS fold
      FROM documents WHERE length(trim(text)) > 0),
    tok AS (SELECT doc_id, lang, fold, unnest(tk) AS tok FROM docs),
    cls AS (SELECT lang AS c_lang, CAST(count(*) AS BIGINT) AS n_tok
            FROM tok WHERE fold < 4 GROUP BY 1),
    ct AS (SELECT lang AS c_lang, tok, CAST(count(*) AS BIGINT) AS c
           FROM tok WHERE fold < 4 GROUP BY 1, 2),
    prior AS (
      SELECT lang AS c_lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM docs WHERE fold < 4 GROUP BY 1),
    ptot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS d FROM prior),
    -- per (class, token) log-prob ln((c+1)/(n_tok+V)) in micro-nats,
    -- rounded per vocab entry (exact bigint sums downstream)
    lp AS (
      SELECT ct.c_lang, ct.tok,
             CAST(round((ln(CAST(c + 1 AS DOUBLE))
                         - ln(CAST(n_tok + {_NB_V} AS DOUBLE))) * 1000000)
                  AS BIGINT) AS lp_unat
      FROM ct JOIN cls USING (c_lang)),
    -- unseen-token fallback per class: ln(1/(n_tok+V))
    lp0 AS (
      SELECT c_lang,
             CAST(round(-ln(CAST(n_tok + {_NB_V} AS DOUBLE)) * 1000000)
                  AS BIGINT) AS lp0_unat
      FROM cls),
    lprior AS (
      SELECT prior.c_lang,
             CAST(round((ln(CAST(n_docs AS DOUBLE)) - ln(CAST(d AS DOUBLE)))
                        * 1000000) AS BIGINT) AS lprior_unat
      FROM prior CROSS JOIN ptot),
    test_tok AS (SELECT doc_id, lang, tok FROM tok WHERE fold = 4),
    scored AS (
      SELECT tt.doc_id, tt.lang AS true_lang, lp0.c_lang,
             CAST(sum(coalesce(lp.lp_unat, lp0.lp0_unat)) AS BIGINT) AS s_tok
      FROM test_tok tt
      CROSS JOIN lp0
      LEFT JOIN lp ON lp.c_lang = lp0.c_lang AND lp.tok = tt.tok
      GROUP BY 1, 2, 3),
    total AS (
      SELECT scored.doc_id, true_lang, scored.c_lang,
             s_tok + lprior.lprior_unat AS score
      FROM scored JOIN lprior ON lprior.c_lang = scored.c_lang),
    pred AS (
      SELECT doc_id, true_lang, c_lang AS pred_lang,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, c_lang ASC) AS rk
      FROM total)
    SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred WHERE rk = 1
    GROUP BY 1, 2
    """


@register("naive_bayes_lang_confusion", _nb_oracle())
def naive_bayes_lang_confusion(spark, sf_dir):
    """Multinomial Naive Bayes language classifier trained on an 80/20
    hash split of the corpus and evaluated as a test-fold confusion
    matrix — the LEARNED counterpart of text_lang_id's fixed marker
    lexicon (lang_id_confusion audits the heuristic; this trains the
    classic generative baseline from data). Token log-probabilities
    ln((c+1)/(n_class + V)) round to integer micro-nats per VOCAB ENTRY
    (Laplace smoothing, unseen tokens fall back to the per-class floor),
    so every document score is an exact BIGINT sum and argmax ties break
    deterministically by class name.

    Plan: token explode -> (class, token) aggregate (the model — vocab x
    classes sized, broadcastable at any corpus scale) -> test-token
    stream joined against the model per class (class count is the small
    fan-out), doc-grain aggregate, per-doc argmax window over class-count
    rows. No driver loop, no collect; 'training' is one shuffle."""
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id", "lang",
            text.tokens(text.normalize(F.col("text"))).alias("tk"),
            (md5_long(F.col("doc_id"), seed=41) % 5).alias("fold"),
        )
    )
    tok = docs.select("doc_id", "lang", "fold", F.explode("tk").alias("tok"))
    train = tok.filter(F.col("fold") < 4)
    cls = train.groupBy(F.col("lang").alias("c_lang")).agg(
        F.count(F.lit(1)).cast("long").alias("n_tok")
    )
    ct = train.groupBy(F.col("lang").alias("c_lang"), "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    prior = docs.filter(F.col("fold") < 4).groupBy(
        F.col("lang").alias("c_lang")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    ptot = prior.agg(F.sum("n_docs").cast("long").alias("d"))
    lp = ct.join(cls, "c_lang").select(
        "c_lang", "tok",
        F.expr(
            f"cast(round((ln(cast(c + 1 as double))"
            f" - ln(cast(n_tok + {_NB_V} as double))) * 1000000) as bigint)"
        ).alias("lp_unat"),
    )
    lp0 = cls.select(
        "c_lang",
        F.expr(
            f"cast(round(-ln(cast(n_tok + {_NB_V} as double)) * 1000000)"
            " as bigint)"
        ).alias("lp0_unat"),
    )
    lprior = prior.crossJoin(F.broadcast(ptot)).select(
        "c_lang",
        F.expr(
            "cast(round((ln(cast(n_docs as double)) - ln(cast(d as double)))"
            " * 1000000) as bigint)"
        ).alias("lprior_unat"),
    )
    test_tok = tok.filter(F.col("fold") == 4).select(
        "doc_id", F.col("lang").alias("true_lang"), "tok"
    )
    scored = (
        test_tok.crossJoin(F.broadcast(lp0))
        .join(F.broadcast(lp), ["c_lang", "tok"], "left")
        .groupBy("doc_id", "true_lang", "c_lang")
        .agg(
            F.sum(F.coalesce(F.col("lp_unat"), F.col("lp0_unat")))
            .cast("long").alias("s_tok")
        )
    )
    total = scored.join(F.broadcast(lprior), "c_lang").select(
        "doc_id", "true_lang", "c_lang",
        (F.col("s_tok") + F.col("lprior_unat")).alias("score"),
    )
    wd = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("c_lang").asc()
    )
    pred = total.select(
        "doc_id", "true_lang", F.col("c_lang").alias("pred_lang"),
        F.row_number().over(wd).alias("rk"),
    )
    return (
        pred.filter(F.col("rk") == 1)
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Sample-ratio-mismatch (SRM) chi-square guardrail
# ---------------------------------------------------------------------------

@register(
    "srm_guardrail_check",
    """
    WITH rec AS (
      SELECT n_name AS scope, CAST(o_custkey % 2 AS INT) AS variant
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey),
    both_scopes AS (
      SELECT scope, variant FROM rec
      UNION ALL
      SELECT 'ALL', variant FROM rec),
    s AS (SELECT scope,
                 CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n0,
                 CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n1
          FROM both_scopes GROUP BY 1)
    SELECT scope, n0, n1,
           CAST((n0 - n1) * (n0 - n1) * 1000 // (n0 + n1) AS BIGINT)
               AS chi2_milli,
           CAST(CASE WHEN (n0 - n1) * (n0 - n1) * 1000 // (n0 + n1) > 3841
                     THEN 1 ELSE 0 END AS INT) AS srm_flag
    FROM s
    """,
)
def srm_guardrail_check(spark, sf_dir):
    """Sample-ratio-mismatch guardrail: chi-square test of the 50/50
    variant split, overall and per nation — the FIRST check any A/B
    readout must pass (a biased assignment invalidates every downstream
    metric; SRM is the canonical symptom of bucketing bugs, bot filtering
    asymmetry, or redirect loss). For two equal-expectation cells the
    statistic collapses to (n0-n1)^2/N, so it stages as ONE exact integer
    milli value against the df=1 critical value 3.841.

    Plan: one star-join projection duplicated map-side into per-nation
    and pooled scopes, one aggregate at scope grain. Exact integers
    throughout."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rec = (
        orders.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            F.col("n_name").alias("scope"),
            (F.col("o_custkey") % 2).cast("int").alias("variant"),
        )
    )
    both = rec.unionAll(rec.select(F.lit("ALL").alias("scope"), "variant"))
    s = both.groupBy("scope").agg(
        F.sum(F.expr("CASE WHEN variant = 0 THEN 1 ELSE 0 END")).cast("long").alias("n0"),
        F.sum(F.expr("CASE WHEN variant = 1 THEN 1 ELSE 0 END")).cast("long").alias("n1"),
    )
    chi = "(n0 - n1) * (n0 - n1) * 1000 div (n0 + n1)"
    return s.select(
        "scope", "n0", "n1",
        F.expr(f"cast({chi} as bigint)").alias("chi2_milli"),
        F.expr(
            f"cast(CASE WHEN {chi} > 3841 THEN 1 ELSE 0 END as int)"
        ).alias("srm_flag"),
    )


# ---------------------------------------------------------------------------
# IPF raking: calibrate order-sample weights to customer-population margins
# ---------------------------------------------------------------------------

_IPF_ITERS = 3


def _ipf_round_sql(t: int) -> str:
    """One raking iteration: row-factor step (nation margins) then
    col-factor step (segment margins), weights in integer micro."""
    w = f"w{t}"
    return f"""
    rm{t} AS (
      SELECT nation, CAST(sum(n * {w}) AS BIGINT) AS mass
      FROM cells{t} GROUP BY 1),
    rstep{t} AS (
      SELECT c.nation, c.segment, c.n,
             CAST(c.{w} * rt.target_micro // greatest(rm{t}.mass, 1) AS BIGINT)
                 AS wr
      FROM cells{t} c JOIN rm{t} USING (nation)
      JOIN rtarget rt USING (nation)),
    cm{t} AS (
      SELECT segment, CAST(sum(n * wr) AS BIGINT) AS mass
      FROM rstep{t} GROUP BY 1),
    cells{t + 1} AS (
      SELECT r.nation, r.segment, r.n,
             CAST(r.wr * ct.target_micro // greatest(cm{t}.mass, 1) AS BIGINT)
                 AS w{t + 1}
      FROM rstep{t} r JOIN cm{t} USING (segment)
      JOIN ctarget ct USING (segment))
    """


def _ipf_oracle() -> str:
    rounds = ",".join(_ipf_round_sql(t) for t in range(1, _IPF_ITERS + 1))
    wf = f"w{_IPF_ITERS + 1}"
    return f"""
    WITH joined AS (
      SELECT n_name AS nation, c_mktsegment AS segment
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey),
    cells1 AS (
      SELECT nation, segment, CAST(count(*) AS BIGINT) AS n,
             CAST(1000000 AS BIGINT) AS w1
      FROM joined GROUP BY 1, 2),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_orders FROM cells1),
    -- population margins: the CUSTOMER distribution scaled to order mass,
    -- in micro (sum n * w should converge to these)
    cpop AS (
      SELECT n_name AS nation, c_mktsegment AS segment
      FROM customer JOIN nation ON n_nationkey = c_nationkey),
    ctot AS (SELECT CAST(count(*) AS BIGINT) AS n_cust FROM cpop),
    rtarget AS (
      SELECT nation,
             CAST(count(*) * n_orders * 1000000 // n_cust AS BIGINT)
                 AS target_micro
      FROM cpop CROSS JOIN ctot CROSS JOIN tot GROUP BY 1, n_orders, n_cust),
    ctarget AS (
      SELECT segment,
             CAST(count(*) * n_orders * 1000000 // n_cust AS BIGINT)
                 AS target_micro
      FROM cpop CROSS JOIN ctot CROSS JOIN tot GROUP BY 1, n_orders, n_cust),
    {rounds},
    final_rm AS (
      SELECT nation, CAST(sum(n * {wf}) AS BIGINT) AS mass
      FROM cells{_IPF_ITERS + 1} GROUP BY 1)
    SELECT c.nation, c.segment, c.n, c.{wf} AS w_micro,
           CAST(abs(final_rm.mass - rt.target_micro) * 1000000
                // greatest(rt.target_micro, 1) AS BIGINT)
               AS row_margin_err_ppm
    FROM cells{_IPF_ITERS + 1} c
    JOIN final_rm USING (nation)
    JOIN rtarget rt USING (nation)
    """


@register("ipf_raking_weights", _ipf_oracle())
def ipf_raking_weights(spark, sf_dir):
    """Survey raking (iterative proportional fitting): calibrate per-cell
    order weights so the weighted nation x segment table matches the
    CUSTOMER population margins — the standard post-stratification
    weighting step when a sample (orders) is demographically skewed
    against the population it should represent (neyman_allocation_sample
    designs the draw; raking repairs one after the fact). {_IPF_ITERS}
    unrolled IPF iterations, each a row-margin then column-margin
    rescale; weights stay exact integer micro (floor per step — the
    documented drift is <= 1 micro per cell per step, and the emitted
    row_margin_err_ppm column MEASURES the residual miss).

    Plan: one data-grain aggregate to the 125-cell table, which is
    localCheckpoint-ed (eager) — as are the two margin-target tables —
    so every iteration is metadata-sized re-aggregation + equi-join over
    MATERIALIZED 125-row state, exactly the graph_k_core_peel pattern.
    Without the materialization the diamond lineage (cells and rstep are
    each referenced from multiple branches per iteration) re-executes the
    orders x customer data-grain aggregate once per branch: the r6 plan
    carried 1,273 scans / 890 shuffles and ran 8x slower for identical
    output (r6 verdict #1). At 100 TB only the first aggregate grows.
    EXECUTES_AT_BUILD: the eager checkpoints run the bounded aggregates
    at plan-build time."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        orders.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment"))
    )
    cells = joined.groupBy("nation", "segment").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).withColumn("w1", F.lit(1000000).cast("long"))
    # Materialize the 125-cell table ONCE: every iteration below references
    # it from multiple branches, and without this barrier the data-grain
    # orders x customer aggregate re-executes per branch (1,273-scan plan).
    cells = cells.localCheckpoint(eager=True)
    tot = cells.agg(F.sum("n").cast("long").alias("n_orders"))
    cpop = cust.join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey")).select(
        F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment")
    )
    ctot = cpop.agg(F.count(F.lit(1)).cast("long").alias("n_cust"))
    rtarget = (
        cpop.groupBy("nation").agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(ctot)).crossJoin(F.broadcast(tot))
        .select(
            "nation",
            F.expr("cast(cnt * n_orders * 1000000 div n_cust as bigint)")
            .alias("target_micro"),
        )
    )
    ctarget = (
        cpop.groupBy("segment").agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(ctot)).crossJoin(F.broadcast(tot))
        .select(
            "segment",
            F.expr("cast(cnt * n_orders * 1000000 div n_cust as bigint)")
            .alias("target_micro"),
        )
    )
    # 25-row / 5-row margin targets, each consumed once per iteration plus
    # the final output join — pin them so the customer scan runs once each.
    rtarget = rtarget.localCheckpoint(eager=True)
    ctarget = ctarget.localCheckpoint(eager=True)
    w = "w1"
    for t in range(1, _IPF_ITERS + 1):
        rm = cells.groupBy("nation").agg(
            F.sum(F.expr(f"n * {w}")).cast("long").alias("mass")
        )
        rstep = (
            cells.join(rm, "nation")
            .join(rtarget.withColumnRenamed("target_micro", "rt_micro"), "nation")
            .select(
                "nation", "segment", "n",
                F.expr(f"cast({w} * rt_micro div greatest(mass, 1) as bigint)")
                .alias("wr"),
            )
        )
        cm = rstep.groupBy("segment").agg(
            F.sum(F.expr("n * wr")).cast("long").alias("mass")
        )
        w = f"w{t + 1}"
        cells = (
            rstep.join(cm, "segment")
            .join(ctarget.withColumnRenamed("target_micro", "ct_micro"), "segment")
            .select(
                "nation", "segment", "n",
                F.expr("cast(wr * ct_micro div greatest(mass, 1) as bigint)")
                .alias(w),
            )
        )
        # per-iteration barrier: the next round (and the final output)
        # reference this 125-row state from 3+ branches
        cells = cells.localCheckpoint(eager=True)
    final_rm = cells.groupBy("nation").agg(
        F.sum(F.expr(f"n * {w}")).cast("long").alias("mass")
    )
    return (
        cells.join(final_rm, "nation")
        .join(rtarget, "nation")
        .select(
            "nation", "segment", "n", F.col(w).alias("w_micro"),
            F.expr(
                "cast(abs(mass - target_micro) * 1000000"
                " div greatest(target_micro, 1) as bigint)"
            ).alias("row_margin_err_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Tukey median polish of the nation x month revenue matrix
# ---------------------------------------------------------------------------

@register(
    "median_polish_revenue",
    """
    WITH m AS (
      SELECT n_name AS nation,
             CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS mon,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) AS v
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
      WHERE year(CAST(o_orderdate AS DATE)) = 1995
      GROUP BY 1, 2),
    r1 AS (SELECT nation, median(v) AS rm FROM m GROUP BY 1),
    s1 AS (SELECT m.nation, mon, v - rm AS v, rm AS row_eff
           FROM m JOIN r1 USING (nation)),
    c1 AS (SELECT mon, median(v) AS cm FROM s1 GROUP BY 1),
    s2 AS (SELECT nation, s1.mon, v - cm AS v, row_eff, cm AS col_eff
           FROM s1 JOIN c1 USING (mon)),
    r2 AS (SELECT nation, median(v) AS rm FROM s2 GROUP BY 1),
    s3 AS (SELECT s2.nation, mon, v - rm AS v, row_eff + rm AS row_eff,
                  col_eff
           FROM s2 JOIN r2 USING (nation)),
    c2 AS (SELECT mon, median(v) AS cm FROM s3 GROUP BY 1)
    SELECT s3.nation, s3.mon AS month, v - cm AS resid, row_eff,
           col_eff + cm AS col_eff
    FROM s3 JOIN c2 USING (mon)
    """,
)
def median_polish_revenue(spark, sf_dir):
    """Tukey median polish of the 1995 nation x month revenue matrix —
    the robust two-way decomposition value = row effect + column effect +
    residual, fit by alternating MEDIAN sweeps instead of means (so one
    crazy nation-month cell perturbs nothing else; the robust-EDA sibling
    of seasonal_decompose_daily's mean-based fit). Two unrolled
    iterations of row-then-column sweeps; every value stays a dyadic
    rational (cents halved at most once per median), which doubles
    represent EXACTLY, so both engines' interpolated medians and
    subtractions are bit-identical with no rounding convention at all.

    Plan: one data-grain aggregate to the <= 300-cell matrix, which is
    localCheckpoint-ed — each sweep references its input twice (median
    aggregate + join-back), so the un-materialized lineage doubles per
    sweep and re-executes the orders x customer aggregate 16x (48-scan
    plan, r6 verdict #3); with the barrier the sweeps re-derive only the
    MATERIALIZED 300-row table. Every sweep is a <= 25-group exact-median
    aggregate plus an equi-join back; metadata-sized after the first
    shuffle at any volume. EXECUTES_AT_BUILD: the eager checkpoint runs
    the cell aggregate at plan-build time."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    m = (
        orders.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .filter(F.year(F.col("o_orderdate").cast("date")) == 1995)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.month(F.col("o_orderdate").cast("date")).cast("int").alias("mon"),
        )
        .agg(
            F.sum(F.expr("cast(round(o_totalprice * 100) as bigint)"))
            .cast("double").alias("v")
        )
    )
    # <= 300-cell matrix; the four alternating sweeps below each reference
    # their input twice — materialize once so the lineage doubling never
    # reaches the data-grain aggregate
    m = m.localCheckpoint(eager=True)
    r1 = m.groupBy("nation").agg(F.expr("percentile(v, 0.5)").alias("rm"))
    s1 = m.join(r1, "nation").select(
        "nation", "mon", (F.col("v") - F.col("rm")).alias("v"),
        F.col("rm").alias("row_eff"),
    )
    c1 = s1.groupBy("mon").agg(F.expr("percentile(v, 0.5)").alias("cm"))
    s2 = s1.join(c1, "mon").select(
        "nation", "mon", (F.col("v") - F.col("cm")).alias("v"),
        "row_eff", F.col("cm").alias("col_eff"),
    )
    r2 = s2.groupBy("nation").agg(F.expr("percentile(v, 0.5)").alias("rm"))
    s3 = s2.join(r2, "nation").select(
        "nation", "mon", (F.col("v") - F.col("rm")).alias("v"),
        (F.col("row_eff") + F.col("rm")).alias("row_eff"), "col_eff",
    )
    c2 = s3.groupBy("mon").agg(F.expr("percentile(v, 0.5)").alias("cm"))
    return s3.join(c2, "mon").select(
        "nation", F.col("mon").alias("month"),
        (F.col("v") - F.col("cm")).alias("resid"),
        "row_eff",
        (F.col("col_eff") + F.col("cm")).alias("col_eff"),
    )


# ---------------------------------------------------------------------------
# Mann-Kendall nonparametric trend test over the daily revenue series
# ---------------------------------------------------------------------------

_MK_Z = (
    "(CAST(s_stat AS DOUBLE) - CAST(sign(s_stat) AS DOUBLE))"
    " / sqrt(CAST(var_s AS DOUBLE))"
)


@register(
    "mann_kendall_trend",
    f"""
    WITH d AS (
      SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS x
      FROM orders GROUP BY 1),
    s AS (
      SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
                 AS s_stat
      FROM d a JOIN d b ON b.day > a.day),
    n_t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    ties AS (
      SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
                 AS tie_term
      FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM d GROUP BY x)
      WHERE t > 1),
    v AS (
      SELECT s_stat, n,
             CAST((n * (n - 1) * (2 * n + 5) - tie_term) // 18 AS BIGINT)
                 AS var_s
      FROM s CROSS JOIN n_t CROSS JOIN ties)
    SELECT n, s_stat, var_s,
           round({_MK_Z}, 6) AS z,
           CAST(sign(s_stat) AS INT) AS trend,
           CAST(CASE WHEN abs({_MK_Z}) > 1.959964 THEN 1 ELSE 0 END AS INT)
               AS reject_95
    FROM v
    """,
)
def mann_kendall_trend(spark, sf_dir):
    """Mann-Kendall nonparametric trend test on daily revenue: S = sum of
    sign(x_j - x_i) over all ordered day pairs, tie-corrected variance,
    and the continuity-corrected z decision — the rank-based trend test
    that pairs with theil_sen_trend's slope estimate (same pair grain;
    MK answers IS there a monotone trend, Theil-Sen answers how steep).
    S and Var(S) are exact BIGINTs (the 18-divisor is exact for the
    integer formula); only the final z is a double (shared text over
    exact ints, rounded 6dp).

    Plan: one data-grain aggregate to the calendar-bounded day grain,
    then a day x day self-join ABOVE the aggregate (pairs of a
    calendar-bounded spine — ~2.9M comparisons at 2400 days regardless
    of fact volume; the plan gate proves both sides bounded), plus 1-row
    cross-joins. Never touches fact-grain pairs."""
    orders = _t(spark, sf_dir, "orders")
    d = orders.groupBy(
        F.col("o_orderdate").cast("date").cast("string").alias("day")
    ).agg(
        F.sum(F.expr("cast(round(o_totalprice * 100) as bigint)"))
        .cast("long").alias("x")
    )
    a = d.select(F.col("day").alias("day_a"), F.col("x").alias("xa"))
    b = d.select(F.col("day").alias("day_b"), F.col("x").alias("xb"))
    s = (
        a.join(b, F.col("day_b") > F.col("day_a"))
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN xb > xa THEN 1 WHEN xb < xa THEN -1 ELSE 0 END"
                )
            ).cast("long").alias("s_stat")
        )
    )
    n_t = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        d.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.expr("t * (t - 1) * (2 * t + 5)")), F.lit(0)
            ).cast("long").alias("tie_term")
        )
    )
    v = s.crossJoin(F.broadcast(n_t)).crossJoin(F.broadcast(ties)).select(
        "s_stat", "n",
        F.expr("cast((n * (n - 1) * (2 * n + 5) - tie_term) div 18 as bigint)")
        .alias("var_s"),
    )
    return v.select(
        "n", "s_stat", "var_s",
        F.expr(f"round({_MK_Z}, 6)").alias("z"),
        F.expr("cast(sign(s_stat) as int)").alias("trend"),
        F.expr(
            f"cast(CASE WHEN abs({_MK_Z}) > 1.959964 THEN 1 ELSE 0 END as int)"
        ).alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# Two-proportion power analysis / required-sample-size design table
# ---------------------------------------------------------------------------

_PW_DELTAS_PPM = [5000, 10000, 20000, 30000, 50000]
_PW_ZA = 1.959964  # z_{alpha/2}, alpha = 0.05 two-sided
_PW_ZB = 0.841621  # z_beta, 80% power
# required n per arm (classic two-proportion formula), double from exact ints
_PW_NREQ = (
    f"(({_PW_ZA} * sqrt(2.0 * p0 * (1.0 - p0))"
    f" + {_PW_ZB} * sqrt(p0 * (1.0 - p0) + p1 * (1.0 - p1)))"
    f" * ({_PW_ZA} * sqrt(2.0 * p0 * (1.0 - p0))"
    f" + {_PW_ZB} * sqrt(p0 * (1.0 - p0) + p1 * (1.0 - p1))))"
    " / (delta * delta)"
)


def _power_oracle() -> str:
    chain = ",\n             ".join(
        f"{expr} AS {name}" for name, expr in _erfc_cols("//")
    )
    deltas = ", ".join(str(x) for x in _PW_DELTAS_PPM)
    return f"""
    WITH f0 AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
             CAST(min(epoch_us(ts)) AS BIGINT) AS t0,
             CAST(min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
                  AS BIGINT) AS tp
      FROM events GROUP BY 1, 2),
    u AS (
      SELECT user_id, variant,
             CASE WHEN tp IS NOT NULL AND tp - t0 < {_SHAP_FAST_US}
                  THEN 1 ELSE 0 END AS conv
      FROM f0),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
                 CAST(sum(conv) AS BIGINT) AS n_conv,
                 CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_arm
          FROM u),
    spine AS (SELECT unnest([{deltas}]) AS delta_ppm),
    calc AS (
      SELECT delta_ppm,
             CAST(n_conv AS DOUBLE) / n_users AS p0,
             least(CAST(n_conv AS DOUBLE) / n_users + delta_ppm / 1000000.0,
                   0.999) AS p1,
             delta_ppm / 1000000.0 AS delta,
             n_arm
      FROM spine CROSS JOIN g),
    req AS (
      SELECT delta_ppm, n_arm,
             CAST(ceil({_PW_NREQ}) AS BIGINT) AS n_required_per_arm,
             -- achieved-power argument u = delta/se - z_a; se on current n
             CAST(round((delta / sqrt((p0 * (1.0 - p0) + p1 * (1.0 - p1))
                                      / n_arm) - {_PW_ZA}) * 1000000)
                  AS BIGINT) AS z_micro
      FROM calc),
    pw AS (SELECT delta_ppm, n_arm, n_required_per_arm, z_micro,
             {chain}
           FROM req)
    SELECT delta_ppm, n_arm AS current_n_per_arm, n_required_per_arm,
           CAST(CASE WHEN z_micro >= 0 THEN 1000000 - p_micro // 2
                     ELSE p_micro // 2 END AS BIGINT) AS achieved_power_ppm
    FROM pw
    """


@register("power_analysis_design", _power_oracle())
def power_analysis_design(spark, sf_dir):
    """Two-proportion power analysis: for each candidate effect size the
    required per-arm sample size at alpha = .05 / 80% power, plus the
    ACHIEVED power of the current experiment size — the design table
    every A/B readout (conversion_ab_ztest, srm_guardrail_check,
    sprt_sequential_test) should be read against (an underpowered
    'no effect' is not evidence of absence). Required-n uses the classic
    closed form with IEEE sqrt only (correctly rounded, bit-identical);
    achieved power Phi(delta/se - z_alpha) runs the staged-integer erfc
    chain shared with fdr_bh_correction — no transcendental parity risk.

    Plan: one user-grain aggregate to a 1-row summary, a 5-row literal
    effect spine cross-join, then pure expressions. Metadata-sized."""
    ev = _t(spark, sf_dir, "events")
    f0 = ev.groupBy(
        "user_id", (F.col("user_id") % 2).cast("int").alias("variant")
    ).agg(
        F.min(F.unix_micros(F.col("ts"))).cast("long").alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros(F.col("ts")))
        ).cast("long").alias("tp"),
    )
    u = f0.select(
        "user_id", "variant",
        F.expr(
            f"CASE WHEN tp IS NOT NULL AND tp - t0 < {_SHAP_FAST_US}"
            " THEN 1 ELSE 0 END"
        ).alias("conv"),
    )
    g = u.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("conv").cast("long").alias("n_conv"),
        F.sum(F.expr("CASE WHEN variant = 1 THEN 1 ELSE 0 END"))
        .cast("long").alias("n_arm"),
    )
    spine = spark.createDataFrame(
        [(x,) for x in _PW_DELTAS_PPM], ["delta_ppm"]
    )
    calc = spine.crossJoin(F.broadcast(g)).select(
        "delta_ppm",
        F.expr("cast(n_conv as double) / n_users").alias("p0"),
        F.expr(
            "least(cast(n_conv as double) / n_users + delta_ppm / 1000000.0,"
            " 0.999)"
        ).alias("p1"),
        F.expr("delta_ppm / 1000000.0").alias("delta"),
        "n_arm",
    )
    req = calc.select(
        "delta_ppm", "n_arm",
        F.expr(f"cast(ceil({_PW_NREQ}) as bigint)").alias("n_required_per_arm"),
        F.expr(
            f"cast(round((delta / sqrt((p0 * (1.0 - p0) + p1 * (1.0 - p1))"
            f" / n_arm) - {_PW_ZA}) * 1000000) as bigint)"
        ).alias("z_micro"),
    )
    pw = req
    for name, expr in _erfc_cols("div"):
        pw = pw.withColumn(name, F.expr(expr))
    return pw.select(
        "delta_ppm",
        F.col("n_arm").alias("current_n_per_arm"),
        "n_required_per_arm",
        F.expr(
            "cast(CASE WHEN z_micro >= 0 THEN 1000000 - p_micro div 2"
            " ELSE p_micro div 2 END as bigint)"
        ).alias("achieved_power_ppm"),
    )


# ---------------------------------------------------------------------------
# Offline changepoint localization: best single mean-shift split
# ---------------------------------------------------------------------------

_CP_B = (
    "CAST(round((CAST(cs AS DOUBLE) * n_total - CAST(cn AS DOUBLE) * s_total)"
    " * (CAST(cs AS DOUBLE) * n_total - CAST(cn AS DOUBLE) * s_total)"
    " / (CAST(n_total AS DOUBLE) * n_total * cn * (n_total - cn))"
    " / 1000000.0) AS BIGINT)"
)


@register(
    "changepoint_single_split",
    f"""
    WITH d AS (
      SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS x
      FROM orders GROUP BY 1),
    c AS (SELECT day, x,
                 CAST(sum(x) OVER (ORDER BY day) AS BIGINT) AS cs,
                 CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS cn
          FROM d),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
                   CAST(sum(x) AS BIGINT) AS s_total
            FROM d),
    scored AS (
      SELECT day, cn, cs, n_total, s_total, {_CP_B} AS between_ss_scaled,
             cs * 1000000 // cn AS mean_left_micro,
             (s_total - cs) * 1000000 // (n_total - cn) AS mean_right_micro
      FROM c CROSS JOIN tot WHERE cn < n_total)
    SELECT day AS split_day, CAST(cn AS BIGINT) AS n_left,
           CAST(mean_left_micro AS BIGINT) AS mean_left_micro,
           CAST(mean_right_micro AS BIGINT) AS mean_right_micro,
           between_ss_scaled
    FROM scored
    ORDER BY between_ss_scaled DESC, day ASC LIMIT 5
    """,
)
def changepoint_single_split(spark, sf_dir):
    """Offline changepoint LOCALIZATION: the single split of the daily
    revenue series that maximizes the between-segment sum of squares
    B(k) = n_l*n_r/n * (mean_l - mean_r)^2 — the first step of binary
    segmentation, and the offline complement to the ONLINE detectors
    (event_rate_cusum flags drift as it happens, page_hinkley_drift
    tracks the running mean; this answers WHERE the shift happened once
    you have the whole series). B is computed from exact prefix sums in
    one shared-text double (scaled 1e-6, rounded), means in exact
    integer micro; top-5 candidate splits via TakeOrdered with a
    deterministic day tie-break.

    Plan: data-grain aggregate to calendar-bounded day grain, one
    cumulative window above it, a 1-row totals cross-join, distributed
    top-5. O(days) after the aggregate."""
    orders = _t(spark, sf_dir, "orders")
    d = orders.groupBy(
        F.col("o_orderdate").cast("date").cast("string").alias("day")
    ).agg(
        F.sum(F.expr("cast(round(o_totalprice * 100) as bigint)"))
        .cast("long").alias("x")
    )
    w = Window.orderBy("day")
    c = d.select(
        "day", "x",
        F.sum("x").over(w).cast("long").alias("cs"),
        F.row_number().over(w).cast("long").alias("cn"),
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum("x").cast("long").alias("s_total"),
    )
    scored = (
        c.crossJoin(F.broadcast(tot))
        .filter(F.col("cn") < F.col("n_total"))
        .select(
            "day", "cn",
            F.expr(_CP_B).alias("between_ss_scaled"),
            F.expr("cs * 1000000 div cn").alias("mean_left_micro"),
            F.expr("(s_total - cs) * 1000000 div (n_total - cn)")
            .alias("mean_right_micro"),
        )
    )
    return scored.select(
        F.col("day").alias("split_day"),
        F.col("cn").cast("long").alias("n_left"),
        F.col("mean_left_micro").cast("long").alias("mean_left_micro"),
        F.col("mean_right_micro").cast("long").alias("mean_right_micro"),
        "between_ss_scaled",
    ).orderBy(F.col("between_ss_scaled").desc(), F.col("split_day").asc()).limit(5)


# ---------------------------------------------------------------------------
# k-core decomposition (3 unrolled peel rounds) on the co-purchase graph
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 3


def _kcore_oracle() -> str:
    rounds = []
    for t in range(1, _KCORE_ROUNDS + 1):
        rounds.append(f"""
    deg{t} AS MATERIALIZED (
      SELECT node, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT a AS node FROM e{t} UNION ALL SELECT b FROM e{t})
      GROUP BY 1),
    keep{t} AS MATERIALIZED (SELECT node FROM deg{t} WHERE d >= {_KCORE_K}),
    e{t + 1} AS MATERIALIZED (
      SELECT e{t}.a, e{t}.b FROM e{t}
      JOIN keep{t} ka ON ka.node = e{t}.a
      JOIN keep{t} kb ON kb.node = e{t}.b),
    stat{t} AS (
      SELECT {t} AS round,
             CAST((SELECT count(*) FROM keep{t}) AS BIGINT) AS nodes_kept,
             CAST((SELECT count(*) FROM e{t + 1}) AS BIGINT) AS edges_kept,
             CAST((SELECT count(*) FROM deg{t}) -
                  (SELECT count(*) FROM keep{t}) AS BIGINT) AS nodes_removed)
""")
    stats = " UNION ALL ".join(
        f"SELECT * FROM stat{t}" for t in range(1, _KCORE_ROUNDS + 1)
    )
    return f"""
    WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    pr AS (SELECT a.p AS a, b.p AS b
           FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
    e1 AS MATERIALIZED (SELECT a, b FROM pr GROUP BY a, b HAVING count(*) >= 2),
    {",".join(rounds)}
    SELECT round, nodes_kept, edges_kept, nodes_removed,
           CAST(CASE WHEN nodes_removed = 0 THEN 1 ELSE 0 END AS INT)
               AS converged
    FROM ({stats})
    """


@register("graph_k_core_peel", _kcore_oracle())
def graph_k_core_peel(spark, sf_dir):
    """k-core decomposition ({_KCORE_K}-core) of the co-purchase graph by
    iterative peeling — {_KCORE_ROUNDS} unrolled rounds of 'drop nodes
    with degree < k, drop their edges' — the graph-mining density screen
    next to triangle_count/pagerank (the k-core is where community
    structure and recommendation signal live; peeling also bounds
    degeneracy). A converged flag reports whether the LAST round removed
    nothing (fixpoint reached within the unrolled budget); full
    decomposition iterates to fixpoint, which the declarative unroll
    bounds deliberately — the same bounded-iteration contract as
    pagerank_neardup_graph.

    Plan: edges are support->=2 co-purchase pairs (per-order pair
    generation, bounded by basket size); each round is one degree
    aggregate + two semijoins back to the edge list — all equi-joins at
    edge grain, no windows, no NLJ."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a = li.select("o", F.col("p").alias("a"))
    b = li.select(F.col("o").alias("o2"), F.col("p").alias("b"))
    e = (
        a.join(b, (F.col("o") == F.col("o2")) & (F.col("a") < F.col("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
        .select("a", "b")
        # checkpoint the edge list once and after every peel: each round
        # computes three counts AND feeds the next round — without the
        # barrier the declarative unroll recomputes the pair join
        # O(rounds^2) times (measured: sf0.1 went from minutes to seconds)
        .localCheckpoint(eager=True)
    )
    stats = []
    for t in range(1, _KCORE_ROUNDS + 1):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
        )
        keep = deg.filter(F.col("d") >= _KCORE_K).select("node")
        e_next = (
            e.join(keep.withColumnRenamed("node", "a"), "a")
            .join(keep.withColumnRenamed("node", "b"), "b")
            .select("a", "b")
        )
        n_deg = deg.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
        n_keep = keep.agg(F.count(F.lit(1)).cast("long").alias("nodes_kept"))
        n_edge = e_next.agg(F.count(F.lit(1)).cast("long").alias("edges_kept"))
        stat = (
            n_keep.crossJoin(F.broadcast(n_edge)).crossJoin(F.broadcast(n_deg))
            .select(
                F.lit(t).cast("int").alias("round"),
                "nodes_kept", "edges_kept",
                (F.col("n_all") - F.col("nodes_kept")).cast("long")
                .alias("nodes_removed"),
            )
        )
        stats.append(stat)
        e = e_next.localCheckpoint(eager=True)
    out = stats[0]
    for s_ in stats[1:]:
        out = out.unionAll(s_)
    return out.select(
        "round", "nodes_kept", "edges_kept", "nodes_removed",
        F.expr(
            "cast(CASE WHEN nodes_removed = 0 THEN 1 ELSE 0 END as int)"
        ).alias("converged"),
    )


# ---------------------------------------------------------------------------
# Strict-order windowed funnel (ClickHouse windowFunnel semantics)
# ---------------------------------------------------------------------------

_FUNNEL_WINDOW_US = 3 * 86400 * 1000000  # 72h from the first step


@register(
    "funnel_strict_windowed",
    f"""
    WITH s1 AS (SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS t1
                FROM events WHERE event_type = 'signup' GROUP BY 1),
    s2 AS (SELECT e.user_id, CAST(min(epoch_us(e.ts)) AS BIGINT) AS t2
           FROM events e JOIN s1 ON s1.user_id = e.user_id
           WHERE e.event_type = 'view' AND epoch_us(e.ts) > s1.t1
             AND epoch_us(e.ts) < s1.t1 + {_FUNNEL_WINDOW_US}
           GROUP BY 1),
    s3 AS (SELECT e.user_id, CAST(min(epoch_us(e.ts)) AS BIGINT) AS t3
           FROM events e JOIN s2 ON s2.user_id = e.user_id
           JOIN s1 ON s1.user_id = e.user_id
           WHERE e.event_type = 'click' AND epoch_us(e.ts) > s2.t2
             AND epoch_us(e.ts) < s1.t1 + {_FUNNEL_WINDOW_US}
           GROUP BY 1),
    s4 AS (SELECT e.user_id, CAST(min(epoch_us(e.ts)) AS BIGINT) AS t4
           FROM events e JOIN s3 ON s3.user_id = e.user_id
           JOIN s1 ON s1.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s3.t3
             AND epoch_us(e.ts) < s1.t1 + {_FUNNEL_WINDOW_US}
           GROUP BY 1),
    c AS (SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n1,
                 CAST((SELECT count(*) FROM s2) AS BIGINT) AS n2,
                 CAST((SELECT count(*) FROM s3) AS BIGINT) AS n3,
                 CAST((SELECT count(*) FROM s4) AS BIGINT) AS n4)
    SELECT step, n_users,
           CAST(n_users * 1000000 // greatest(n1, 1) AS BIGINT)
               AS conv_from_start_ppm,
           CAST(n_users * 1000000 // greatest(n_prev, 1) AS BIGINT)
               AS conv_from_prev_ppm
    FROM (
      SELECT 1 AS step, n1 AS n_users, n1 AS n_prev, n1 FROM c
      UNION ALL SELECT 2, n2, n1, n1 FROM c
      UNION ALL SELECT 3, n3, n2, n1 FROM c
      UNION ALL SELECT 4, n4, n3, n1 FROM c)
    """,
)
def funnel_strict_windowed(spark, sf_dir):
    """Strict-order windowed funnel (the ClickHouse windowFunnel
    semantics): signup -> view -> click -> purchase where each step must
    happen strictly AFTER the previous step's first occurrence AND within
    72h of the funnel start — the deadline makes it a true activation
    funnel (event_funnel is the unbounded-order-only variant). Emits
    per-step user counts with conversion from start and from the
    previous step.

    Plan: four chained user-grain aggregate+join passes (each pass is an
    equi-join on user_id against the previous step's first-timestamp
    table — at 100 TB these are ordinary hash joins at user grain), then
    a 4-row literal summary. Each step table is localCheckpoint-ed:
    every s_k is referenced twice (next step's join + its own count) and
    the 4-row summary references the count row-set four times, so the
    un-materialized lineage re-executed the events scan ~40x (r6 verdict
    #3); with the barriers events is scanned once per step. The
    checkpoint materializes user-grain state — linear, executor-local,
    the same footprint the chained shuffle joins already carry. Exact
    integers throughout. EXECUTES_AT_BUILD: the eager checkpoints run
    the step aggregates at plan-build time."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("us")
    )
    s1 = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("us").cast("long").alias("t1")
    ).localCheckpoint(eager=True)  # each s_k has 2 consumers: next step + count
    def _step(prev, prev_t, et, out_t):
        return (
            ev.filter(F.col("event_type") == et)
            .join(prev, "user_id")
            .filter(
                (F.col("us") > F.col(prev_t))
                & (F.col("us") < F.col("t1") + F.lit(_FUNNEL_WINDOW_US))
            )
            .groupBy("user_id", "t1")
            .agg(F.min("us").cast("long").alias(out_t))
        )
    s2 = _step(s1, "t1", "view", "t2").localCheckpoint(eager=True)
    s3 = _step(s2, "t2", "click", "t3").localCheckpoint(eager=True)
    # s4 too: the 4-row summary below references the count row-set 4x
    s4 = _step(s3, "t3", "purchase", "t4").localCheckpoint(eager=True)
    n1 = s1.agg(F.count(F.lit(1)).cast("long").alias("n1"))
    n2 = s2.agg(F.count(F.lit(1)).cast("long").alias("n2"))
    n3 = s3.agg(F.count(F.lit(1)).cast("long").alias("n3"))
    n4 = s4.agg(F.count(F.lit(1)).cast("long").alias("n4"))
    c = (
        n1.crossJoin(F.broadcast(n2)).crossJoin(F.broadcast(n3))
        .crossJoin(F.broadcast(n4))
    )
    steps = None
    for step, ncol, pcol in ((1, "n1", "n1"), (2, "n2", "n1"),
                             (3, "n3", "n2"), (4, "n4", "n3")):
        row = c.select(
            F.lit(step).cast("int").alias("step"),
            F.col(ncol).alias("n_users"),
            F.col(pcol).alias("n_prev"),
            F.col("n1").alias("n_start"),
        )
        steps = row if steps is None else steps.unionAll(row)
    return steps.select(
        "step", "n_users",
        F.expr("cast(n_users * 1000000 div greatest(n_start, 1) as bigint)")
        .alias("conv_from_start_ppm"),
        F.expr("cast(n_users * 1000000 div greatest(n_prev, 1) as bigint)")
        .alias("conv_from_prev_ppm"),
    )


# ---------------------------------------------------------------------------
# Gumbel (EV-I) return levels for daily revenue maxima
# ---------------------------------------------------------------------------

_GUMBEL_TS = [30, 90, 365]
_EULER_GAMMA = 0.5772156649
_SQRT6_OVER_PI = 0.7796968012  # sqrt(6)/pi


@register(
    "gumbel_return_levels",
    f"""
    WITH d AS (
      SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
             CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS mx
      FROM orders GROUP BY 1),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(mx) AS BIGINT) AS sm,
                 CAST(sum(mx * mx) AS BIGINT) AS smm,
                 CAST(max(mx) AS BIGINT) AS observed_max
          FROM d),
    fit AS (
      SELECT n, observed_max,
             CAST(sm AS DOUBLE) / n AS mean_mx,
             sqrt((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * sm / n)
                  / (n - 1)) AS sd_mx
      FROM s),
    params AS (
      SELECT n, observed_max,
             sd_mx * {_SQRT6_OVER_PI} AS beta,
             mean_mx - {_EULER_GAMMA} * sd_mx * {_SQRT6_OVER_PI} AS mu
      FROM fit),
    spine AS (SELECT unnest([{", ".join(str(t) for t in _GUMBEL_TS)}])
                  AS t_days)
    SELECT t_days, n AS n_days, observed_max,
           CAST(round(mu) AS BIGINT) AS mu_cents,
           CAST(round(beta) AS BIGINT) AS beta_cents,
           CAST(round(mu - beta * ln(-ln(1.0 - 1.0 / t_days))) AS BIGINT)
               AS return_level_cents
    FROM params CROSS JOIN spine
    """,
)
def gumbel_return_levels(spark, sf_dir):
    """Extreme-value (Gumbel/EV-I) return levels for the daily MAXIMUM
    order value, fit by method of moments (beta = sd*sqrt(6)/pi, mu =
    mean - gamma*beta) and inverted at T = 30/90/365 days — the
    capacity-planning question 'what spike do we expect once a quarter /
    once a year?' answered from block maxima, the tail-risk counterpart
    of the central-tendency stats (winsorized_price_stats trims the
    tail; EVT MODELS it). Moments come from exact BIGINT sums; the only
    transcendentals are ln on literal-derived ratios (ln parity per the
    _LM_CTE note) and correctly-rounded sqrt, shared text on both sides.

    Plan: data-grain aggregate to calendar-bounded day maxima, a 1-row
    moment aggregate, a 3-row literal spine cross-join."""
    orders = _t(spark, sf_dir, "orders")
    d = orders.groupBy(
        F.col("o_orderdate").cast("date").cast("string").alias("day")
    ).agg(
        F.max(F.expr("cast(round(o_totalprice * 100) as bigint)"))
        .cast("long").alias("mx")
    )
    s = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("mx").cast("long").alias("sm"),
        F.sum(F.expr("mx * mx")).cast("long").alias("smm"),
        F.max("mx").cast("long").alias("observed_max"),
    )
    params = s.select(
        "n", "observed_max",
        F.expr(
            f"sqrt((cast(smm as double) - cast(sm as double) * sm / n)"
            f" / (n - 1)) * {_SQRT6_OVER_PI}"
        ).alias("beta"),
        F.expr(
            f"cast(sm as double) / n - {_EULER_GAMMA} *"
            f" sqrt((cast(smm as double) - cast(sm as double) * sm / n)"
            f" / (n - 1)) * {_SQRT6_OVER_PI}"
        ).alias("mu"),
    )
    spine = spark.createDataFrame([(t,) for t in _GUMBEL_TS], ["t_days"])
    return params.crossJoin(F.broadcast(spine)).select(
        "t_days", F.col("n").alias("n_days"), "observed_max",
        F.expr("cast(round(mu) as bigint)").alias("mu_cents"),
        F.expr("cast(round(beta) as bigint)").alias("beta_cents"),
        F.expr(
            "cast(round(mu - beta * ln(-ln(1.0 - 1.0 / t_days))) as bigint)"
        ).alias("return_level_cents"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA F-test (revenue by nation)
# ---------------------------------------------------------------------------

_ANOVA_F_CRIT = 1.52  # F(0.95; df1=24, df2=inf)
_ANOVA_F = (
    "((ssb / (k - 1)) / (ssw / (n - k)))"
)


@register(
    "one_way_anova_f",
    f"""
    WITH base AS (
      SELECT n_name AS nation,
             CAST(round(o_totalprice) AS BIGINT) AS x
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey),
    g AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_g,
                 CAST(sum(x) AS BIGINT) AS s_g
          FROM base GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS s,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST((SELECT count(*) FROM g) AS BIGINT) AS k
            FROM base),
    -- per-group term rounded to BIGINT before the sum: a sum of DOUBLES
    -- across groups is summation-order-dependent (caught by the snapshot
    -- runs: ulp-level ss drift); identical per-row doubles -> identical
    -- rounded ints -> order-free exact sum
    sb AS (SELECT CAST(sum(CAST(round(CAST(s_g AS DOUBLE) * s_g / n_g)
                               AS BIGINT)) AS DOUBLE) AS sum_sg2
           FROM g),
    ss AS (
      SELECT n, k,
             sum_sg2 - CAST(s AS DOUBLE) * s / n AS ssb,
             CAST(sxx AS DOUBLE) - sum_sg2 AS ssw
      FROM tot CROSS JOIN sb)
    SELECT n, k,
           -- BIGINT, not round(x, 3): DuckDB's fractional round computes
           -- x*1000 which overflows double precision at this magnitude
           CAST(round(ssb) AS BIGINT) AS ss_between,
           CAST(round(ssw) AS BIGINT) AS ss_within,
           round({_ANOVA_F}, 6) AS f_stat,
           CAST(CASE WHEN {_ANOVA_F} > {_ANOVA_F_CRIT} THEN 1 ELSE 0 END
                AS INT) AS reject_95
    FROM ss
    """,
)
def one_way_anova_f(spark, sf_dir):
    """One-way ANOVA: does mean order value differ across nations? —
    the k-group generalization of conversion_ab_ztest's two-group
    comparison (k = 25 here; the F statistic is the variance-explained
    ratio). All sums of squares derive from THREE exact BIGINT sums
    (n, S, S^2-per-group, sum x^2 — staged in whole dollars so sum(x^2)
    stays inside int64 at any plausible scale), combined in one
    shared-text double; decision against the literal F(24, inf) critical
    value.

    Plan: one star-join projection, a nation-grain aggregate + a 1-row
    total aggregate (one pass each), two 1-row cross-joins. The group
    re-aggregation of S_g^2/n_g is metadata-sized."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = (
        orders.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.expr("cast(round(o_totalprice) as bigint)").alias("x"),
        )
    )
    g = base.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("x").cast("long").alias("s_g"),
    )
    k_ = g.agg(F.count(F.lit(1)).cast("long").alias("k"))
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.expr("x * x")).cast("long").alias("sxx"),
    )
    sb = g.agg(
        F.sum(
            F.expr("cast(round(cast(s_g as double) * s_g / n_g) as bigint)")
        ).cast("double").alias("sum_sg2")
    )
    ss = (
        tot.crossJoin(F.broadcast(k_)).crossJoin(F.broadcast(sb))
        .select(
            "n", "k",
            F.expr("sum_sg2 - cast(s as double) * s / n").alias("ssb"),
            F.expr("cast(sxx as double) - sum_sg2").alias("ssw"),
        )
    )
    return ss.select(
        "n", "k",
        F.expr("cast(round(ssb) as bigint)").alias("ss_between"),
        F.expr("cast(round(ssw) as bigint)").alias("ss_within"),
        F.expr(f"round({_ANOVA_F}, 6)").alias("f_stat"),
        F.expr(
            f"cast(CASE WHEN {_ANOVA_F} > {_ANOVA_F_CRIT} THEN 1 ELSE 0 END"
            " as int)"
        ).alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# Brown-Forsythe (median-based Levene) variance-homogeneity test
# ---------------------------------------------------------------------------

@register(
    "levene_brown_forsythe",
    f"""
    WITH base AS (
      SELECT n_name AS nation,
             CAST(round(o_totalprice) AS BIGINT) AS x
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey),
    med AS (SELECT nation, median(x) AS med FROM base GROUP BY 1),
    z AS (SELECT base.nation,
                 CAST(round(abs(x - med) * 2) AS BIGINT) AS z2
          FROM base JOIN med USING (nation)),
    g AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_g,
                 CAST(sum(z2) AS BIGINT) AS s_g
          FROM z GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(z2) AS BIGINT) AS s,
                   CAST(sum(z2 * z2) AS BIGINT) AS sxx,
                   CAST((SELECT count(*) FROM g) AS BIGINT) AS k
            FROM z),
    -- per-group term rounded to BIGINT before the sum: a sum of DOUBLES
    -- across groups is summation-order-dependent (caught by the snapshot
    -- runs: ulp-level ss drift); identical per-row doubles -> identical
    -- rounded ints -> order-free exact sum
    sb AS (SELECT CAST(sum(CAST(round(CAST(s_g AS DOUBLE) * s_g / n_g)
                               AS BIGINT)) AS DOUBLE) AS sum_sg2
           FROM g),
    ss AS (
      SELECT n, k,
             sum_sg2 - CAST(s AS DOUBLE) * s / n AS ssb,
             CAST(sxx AS DOUBLE) - sum_sg2 AS ssw
      FROM tot CROSS JOIN sb)
    SELECT n, k, round({_ANOVA_F}, 6) AS w_stat,
           CAST(CASE WHEN {_ANOVA_F} > {_ANOVA_F_CRIT} THEN 1 ELSE 0 END
                AS INT) AS reject_95
    FROM ss
    """,
)
def levene_brown_forsythe(spark, sf_dir):
    """Brown-Forsythe test (median-based Levene) for variance
    HOMOGENEITY across nations — the assumption check that must pass
    before one_way_anova_f's pooled-variance F is trustworthy, and a
    useful dispersion-difference detector in its own right (same mean,
    different spread = different customer mix). Deviations |x - median|
    double to exact integers (group medians of integer dollars are
    halves, so 2*|x - med| is an exact BIGINT), then the statistic is
    literally one_way_anova_f applied to those deviations.

    Plan: star-join projection, a nation-grain exact-median aggregate
    joined back (the only second pass), then the same three-sum ANOVA
    staging. The 25-row median table and the 25-row per-group sum table
    are localCheckpoint-ed, and the grand totals re-aggregate the GROUP
    table instead of the deviation rows (sums of BIGINTs are associative,
    so the values are identical) — without the barriers the diamond
    lineage (med/z/g each feeding 2-3 branches) re-executed the
    data-grain star join per branch (18-scan plan, r6 verdict #3). Two
    data passes total at any volume. All sums exact BIGINT; one
    shared-text double at the end. EXECUTES_AT_BUILD: the eager
    checkpoints run the two bounded aggregates at plan-build time."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = (
        orders.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.expr("cast(round(o_totalprice) as bigint)").alias("x"),
        )
    )
    med = base.groupBy("nation").agg(
        F.expr("percentile(x, 0.5)").alias("med")
    ).localCheckpoint(eager=True)  # 25 rows; pins the first data pass
    z = base.join(F.broadcast(med), "nation").select(
        "nation",
        F.expr("cast(round(abs(x - med) * 2) as bigint)").alias("z2"),
    )
    g = z.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("z2").cast("long").alias("s_g"),
        F.sum(F.expr("z2 * z2")).cast("long").alias("sxx_g"),
    ).localCheckpoint(eager=True)  # 25 rows; consumed by k_/tot/sb below
    k_ = g.agg(F.count(F.lit(1)).cast("long").alias("k"))
    # grand totals from the GROUP table (associative BIGINT sums — values
    # identical to summing the deviation rows, zero extra data passes)
    tot = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s"),
        F.sum("sxx_g").cast("long").alias("sxx"),
    )
    sb = g.agg(
        F.sum(
            F.expr("cast(round(cast(s_g as double) * s_g / n_g) as bigint)")
        ).cast("double").alias("sum_sg2")
    )
    ss = (
        tot.crossJoin(F.broadcast(k_)).crossJoin(F.broadcast(sb))
        .select(
            "n", "k",
            F.expr("sum_sg2 - cast(s as double) * s / n").alias("ssb"),
            F.expr("cast(sxx as double) - sum_sg2").alias("ssw"),
        )
    )
    return ss.select(
        "n", "k",
        F.expr(f"round({_ANOVA_F}, 6)").alias("w_stat"),
        F.expr(
            f"cast(CASE WHEN {_ANOVA_F} > {_ANOVA_F_CRIT} THEN 1 ELSE 0 END"
            " as int)"
        ).alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# BM25 pseudo-relevance feedback (RM/RSJ-style query expansion)
# ---------------------------------------------------------------------------

_PRF_R = 10      # feedback depth: top-R docs from the first pass
_PRF_MIN_R = 3   # expansion term must hit >= this many feedback docs
_PRF_NEXP = 3    # expansion terms added


def _prf_oracle() -> str:
    return f"""
    WITH tk AS MATERIALIZED (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
                WHERE trim(text) <> ''),
    ex AS MATERIALIZED (SELECT doc_id, unnest(tk) AS t FROM tk),
    dl AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
                        FROM ex GROUP BY 1),
    n_t AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                                CAST(sum(dl) AS BIGINT) AS total_len
                         FROM dl),
    tf AS MATERIALIZED (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
                        FROM ex GROUP BY 1, 2),
    dfreq AS MATERIALIZED (SELECT t, CAST(count(*) AS BIGINT) AS df
                           FROM tf GROUP BY 1),
    qterms AS MATERIALIZED (
      SELECT t, df FROM dfreq
      WHERE df BETWEEN {_BM25_DF_LO} AND {_BM25_DF_HI}
      ORDER BY df DESC, t ASC LIMIT {_BM25_NQ}),
    nrm AS MATERIALIZED (
      SELECT doc_id, 250000 + 750000 * dl.dl * n_t.n_docs // n_t.total_len
                 AS norm_micro
      FROM dl CROSS JOIN n_t),
    idf0 AS MATERIALIZED (
      SELECT t, CAST(round(ln((CAST(n_docs AS DOUBLE) - df + 0.5)
                              / (CAST(df AS DOUBLE) + 0.5) + 1) * 1000)
                     AS BIGINT) AS idf_milli
      FROM qterms CROSS JOIN n_t),
    before_s AS MATERIALIZED (
      SELECT tf.doc_id, CAST(sum({_BM25_TERM}) AS BIGINT) AS score_before_milli
      FROM tf JOIN idf0 USING (t) JOIN nrm USING (doc_id)
      GROUP BY 1),
    fb AS MATERIALIZED (
      SELECT doc_id FROM before_s
      ORDER BY score_before_milli DESC, doc_id ASC LIMIT {_PRF_R}),
    cand AS MATERIALIZED (
      SELECT tf.t, CAST(count(*) AS BIGINT) AS r, dfreq.df
      FROM tf JOIN fb USING (doc_id) JOIN dfreq USING (t)
      CROSS JOIN n_t
      WHERE tf.t NOT IN (SELECT t FROM qterms)
        AND dfreq.df <= n_t.n_docs * 9 // 10
      GROUP BY 1, 3
      HAVING count(*) >= {_PRF_MIN_R}),
    expn AS MATERIALIZED (
      SELECT t, df FROM cand
      ORDER BY r DESC, df ASC, t ASC LIMIT {_PRF_NEXP}),
    allq AS MATERIALIZED (
      SELECT t, df FROM qterms UNION ALL SELECT t, df FROM expn),
    idf1 AS MATERIALIZED (
      SELECT t, CAST(round(ln((CAST(n_docs AS DOUBLE) - df + 0.5)
                              / (CAST(df AS DOUBLE) + 0.5) + 1) * 1000)
                     AS BIGINT) AS idf_milli
      FROM allq CROSS JOIN n_t),
    after_s AS MATERIALIZED (
      SELECT tf.doc_id, CAST(sum({_BM25_TERM}) AS BIGINT) AS score_after_milli
      FROM tf JOIN idf1 USING (t) JOIN nrm USING (doc_id)
      GROUP BY 1),
    top_after AS MATERIALIZED (
      SELECT doc_id, score_after_milli,
             CAST(row_number() OVER (ORDER BY score_after_milli DESC,
                                     doc_id ASC) AS INT) AS rank_after
      FROM after_s
      ORDER BY score_after_milli DESC, doc_id ASC LIMIT {_BM25_K})
    SELECT ta.doc_id, ta.rank_after, ta.score_after_milli,
           CAST(coalesce(b.score_before_milli, 0) AS BIGINT)
               AS score_before_milli,
           CAST(CASE WHEN fb2.doc_id IS NOT NULL THEN 1 ELSE 0 END AS INT)
               AS in_feedback_set
    FROM top_after ta
    LEFT JOIN before_s b ON b.doc_id = ta.doc_id
    LEFT JOIN fb fb2 ON fb2.doc_id = ta.doc_id
    """


@register("bm25_prf_expansion", _prf_oracle())
def bm25_prf_expansion(spark, sf_dir):
    """Pseudo-relevance feedback on top of BM25: run the base query, take
    the top-{_PRF_R} documents as assumed-relevant feedback, promote the
    {_PRF_NEXP} strongest co-occurring terms (RSJ-style: present in >=
    {_PRF_MIN_R} feedback docs, rarest-first, never stop-shingle-banded
    terms) into the query, and re-rank — the classic two-pass retrieval
    upgrade (Rocchio/RM1 family) that lifts recall with zero training.
    Output is the AFTER top-{_BM25_K} with both scores and a flag for
    docs that were already feedback — the before/after delta IS the PRF
    effect.

    Plan: ONE tokenize pass builds the (doc, term, tf) postings index,
    which is localCheckpoint-ed — the materialize-the-index step every
    real search engine does — and BOTH retrieval passes, the doc-length
    and df side tables, and the expansion selection all read the
    materialized postings (doc lengths re-aggregate the index: sum of
    per-term tf per doc == token count, identical values). Without the
    barrier the diamond lineage (tf feeds 4 branches, dl/qterms/
    before_s 2-3 each) re-executed the tokenize+explode data pass per
    branch (24-scan plan, r6 verdict #3). The 1-row corpus stats are
    collected into literals (so the idf staging, the length norm, and
    the stop cap constant-fold instead of cross-joining); the bounded
    query-term set and the before-scores (<= one row per doc holding a
    query term) are pinned. Same exact rational Okapi
    staging as bm25_retrieval_topk; everything integer except the idf
    milli constants. EXECUTES_AT_BUILD: the eager checkpoints run the
    index build at plan-build time."""
    docs = _t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    ex = docs.select(
        "doc_id", F.explode(F.split(text.normalize(F.col("text")), " ")).alias("t")
    )
    tf = ex.groupBy("doc_id", "t").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    # the postings index: ONE tokenize pass, materialized; the df table,
    # both retrieval passes, the expansion candidates, and the doc-length
    # side all read this instead of re-tokenizing the corpus per branch
    tf = tf.localCheckpoint(eager=True)
    # doc length from the index: sum of per-term tf per doc == token count
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    # 1-row corpus stats COLLECTED into literals (sanctioned bounded
    # collect): the four former 1-row cross-joins become constant folding,
    # and the 90%-of-docs stop cap below becomes a pushable literal filter
    nt_row = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    ).collect()[0]
    nd, tl = int(nt_row["n_docs"]), int(nt_row["total_len"])
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    qterms = (
        dfreq.filter(F.col("df").between(_BM25_DF_LO, _BM25_DF_HI))
        .orderBy(F.col("df").desc(), F.col("t").asc())
        .limit(_BM25_NQ)
    ).localCheckpoint(eager=True)  # <= NQ rows, 3 consumers
    idf_expr = (
        f"cast(round(ln((cast({nd} as double) - df + 0.5)"
        " / (cast(df as double) + 0.5) + 1) * 1000) as bigint)"
    )
    nrm = dl.select(
        "doc_id",
        F.expr(f"250000 + 750000 * dl * {nd} div {tl}").alias("norm_micro"),
    )
    term_expr = _BM25_TERM.replace("//", "div")
    idf0 = qterms.select("t", F.expr(idf_expr).alias("idf_milli"))
    before_s = (
        tf.join(F.broadcast(idf0), "t")
        .join(nrm, "doc_id")
        .groupBy("doc_id")
        .agg(F.sum(F.expr(term_expr)).cast("bigint").alias("score_before_milli"))
    ).localCheckpoint(eager=True)  # <= one row per query-term doc; 2 consumers
    fb = before_s.orderBy(
        F.col("score_before_milli").desc(), F.col("doc_id").asc()
    ).limit(_PRF_R).select("doc_id")
    qset = qterms.select(F.col("t").alias("qt"))
    cand = (
        tf.join(F.broadcast(fb), "doc_id")
        .join(F.broadcast(qset), F.col("t") == F.col("qt"), "left_anti")
        .join(dfreq, "t")
        # relative cap: the absolute stop-band (df <= 200) empties on any
        # corpus whose common terms exceed it; <= 90% of docs keeps true
        # every-doc stopwords out while staying scale-proportional
        .filter(F.col("df") <= F.expr(f"{nd} * 9 div 10"))
        .groupBy("t", "df")
        .agg(F.count(F.lit(1)).cast("bigint").alias("r"))
        .filter(F.col("r") >= _PRF_MIN_R)
    )
    expn = cand.orderBy(
        F.col("r").desc(), F.col("df").asc(), F.col("t").asc()
    ).limit(_PRF_NEXP).select("t", "df")
    allq = qterms.select("t", "df").unionAll(expn)
    idf1 = allq.select("t", F.expr(idf_expr).alias("idf_milli"))
    after_s = (
        tf.join(F.broadcast(idf1), "t")
        .join(nrm, "doc_id")
        .groupBy("doc_id")
        .agg(F.sum(F.expr(term_expr)).cast("bigint").alias("score_after_milli"))
    )
    top_after = after_s.orderBy(
        F.col("score_after_milli").desc(), F.col("doc_id").asc()
    ).limit(_BM25_K)
    w = Window.orderBy(F.col("score_after_milli").desc(), F.col("doc_id").asc())
    top_after = top_after.select(
        "doc_id", "score_after_milli",
        F.row_number().over(w).cast("int").alias("rank_after"),
    )
    return (
        top_after
        .join(before_s, "doc_id", "left")
        .join(
            fb.withColumn("in_fb", F.lit(1)), "doc_id", "left"
        )
        .select(
            "doc_id", "rank_after", "score_after_milli",
            F.coalesce(F.col("score_before_milli"), F.lit(0)).cast("long")
            .alias("score_before_milli"),
            F.coalesce(F.col("in_fb"), F.lit(0)).cast("int")
            .alias("in_feedback_set"),
        )
    )


# ---------------------------------------------------------------------------
# Permutation test via md5-slice label reshuffles
# ---------------------------------------------------------------------------

_PERM_R = 32  # permutations: 4 digests x 8 16-bit slices per user


@register(
    "permutation_test_diff",
    f"""
    WITH f AS (
      SELECT user_id,
             CAST(min(epoch_us(ts)) AS BIGINT) AS t0,
             CAST(min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
                  AS BIGINT) AS tp
      FROM events GROUP BY 1),
    u AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS v,
             CASE WHEN tp IS NOT NULL AND tp - t0 < {_SHAP_FAST_US}
                  THEN 1 ELSE 0 END AS y,
             [md5(CAST(user_id AS VARCHAR) || '#p0'),
              md5(CAST(user_id AS VARCHAR) || '#p1'),
              md5(CAST(user_id AS VARCHAR) || '#p2'),
              md5(CAST(user_id AS VARCHAR) || '#p3')] AS dg
      FROM f),
    obs AS (
      SELECT CAST(sum(CASE WHEN v = 1 THEN y ELSE 0 END) * 1000000
                  // greatest(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END), 1)
                - sum(CASE WHEN v = 0 THEN y ELSE 0 END) * 1000000
                  // greatest(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END), 1)
                AS BIGINT) AS obs_diff_ppm,
             CAST(count(*) AS BIGINT) AS n_users
      FROM u),
    r AS (SELECT y, dg, unnest(range(0, {_PERM_R})) AS rep FROM u),
    pv AS (SELECT CAST(rep AS INT) AS rep, y,
                  CAST('0x' || substr(dg[CAST(rep // 8 AS INT) + 1],
                                      CAST((rep % 8) * 4 + 1 AS INT), 4)
                       AS BIGINT) % 2 AS v
           FROM r),
    nd AS (
      SELECT rep,
             CAST(sum(CASE WHEN v = 1 THEN y ELSE 0 END) * 1000000
                  // greatest(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END), 1)
                - sum(CASE WHEN v = 0 THEN y ELSE 0 END) * 1000000
                  // greatest(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END), 1)
                AS BIGINT) AS null_diff_ppm
      FROM pv GROUP BY 1),
    summ AS (
      SELECT CAST(count(*) AS BIGINT) AS n_perms,
             CAST(max(abs(null_diff_ppm)) AS BIGINT) AS null_max_abs_ppm,
             CAST(sum(CASE WHEN abs(null_diff_ppm) >= abs(obs.obs_diff_ppm)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
      FROM nd CROSS JOIN obs)
    SELECT obs.n_users, obs.obs_diff_ppm, summ.n_perms, summ.n_extreme,
           summ.null_max_abs_ppm,
           CAST((summ.n_extreme + 1) * 1000000 // (summ.n_perms + 1)
                AS BIGINT) AS p_value_ppm
    FROM obs CROSS JOIN summ
    """,
)
def permutation_test_diff(spark, sf_dir):
    """Permutation test of the variant conversion difference: reshuffle
    the treatment label {_PERM_R} times with md5-slice 16-bit draws (the
    same 4-digests-per-row trick as the Poisson bootstrap) and locate the
    observed difference in the null distribution — the assumption-free
    inference companion to conversion_ab_ztest (no normality, no pooled
    variance; the add-one p-value (b+1)/(m+1) is the standard exact-test
    form). Every permutation replays bit-identically on both engines.

    Plan: user-grain aggregate, map-side explode x{_PERM_R}, a
    {_PERM_R}-group partial-aggregable groupBy (shuffle carries
    {_PERM_R} rows per partition), 1-row summary cross-joins. Exact
    integer ppm throughout."""
    ev = _t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.unix_micros(F.col("ts"))).cast("long").alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros(F.col("ts")))
        ).cast("long").alias("tp"),
    )
    dg = F.array(*[
        F.md5(F.concat(F.col("user_id").cast("string"), F.lit(f"#p{s}")))
        for s in range(4)
    ])
    u = f.select(
        "user_id",
        (F.col("user_id") % 2).cast("int").alias("v"),
        F.expr(
            f"CASE WHEN tp IS NOT NULL AND tp - t0 < {_SHAP_FAST_US}"
            " THEN 1 ELSE 0 END"
        ).alias("y"),
        dg.alias("dg"),
    )
    diff_expr = (
        "cast(sum(CASE WHEN v = 1 THEN y ELSE 0 END) * 1000000"
        " div greatest(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END), 1)"
        " - sum(CASE WHEN v = 0 THEN y ELSE 0 END) * 1000000"
        " div greatest(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END), 1) as bigint)"
    )
    obs = u.agg(
        F.expr(diff_expr).alias("obs_diff_ppm"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )
    r = u.select(
        "y", "dg", F.explode(F.sequence(F.lit(0), F.lit(_PERM_R - 1))).alias("rep")
    )
    pv = r.select(
        F.col("rep").cast("int").alias("rep"), "y",
        (
            F.expr(
                "cast(conv(substring(element_at(dg, cast(rep div 8 as int) + 1),"
                " cast((rep % 8) * 4 + 1 as int), 4), 16, 10) as bigint)"
            ) % 2
        ).cast("int").alias("v"),
    )
    nd = pv.groupBy("rep").agg(F.expr(diff_expr).alias("null_diff_ppm"))
    summ = nd.crossJoin(F.broadcast(obs.select("obs_diff_ppm"))).agg(
        F.count(F.lit(1)).cast("long").alias("n_perms"),
        F.max(F.abs(F.col("null_diff_ppm"))).cast("long").alias("null_max_abs_ppm"),
        F.sum(
            F.expr(
                "CASE WHEN abs(null_diff_ppm) >= abs(obs_diff_ppm)"
                " THEN 1 ELSE 0 END"
            )
        ).cast("long").alias("n_extreme"),
    )
    return obs.crossJoin(F.broadcast(summ)).select(
        "n_users", "obs_diff_ppm", "n_perms", "n_extreme", "null_max_abs_ppm",
        F.expr(
            "cast((n_extreme + 1) * 1000000 div (n_perms + 1) as bigint)"
        ).alias("p_value_ppm"),
    )


# ---------------------------------------------------------------------------
# Geometric median of the embedding cloud (3 unrolled Weiszfeld steps)
# ---------------------------------------------------------------------------

_GM_DIMS = 64
_GM_ITERS = 3


def _gm_round_sql(t: int) -> str:
    """One Weiszfeld step: distances to the current estimate, then the
    inverse-distance-weighted coordinate update, all in integer micro."""
    return f"""
    d{t} AS MATERIALIZED (
      SELECT p.vec_id,
             greatest(CAST(round(sqrt(CAST((
               SELECT sum((p.xm[s.i] - m.c[s.i]) * (p.xm[s.i] - m.c[s.i]))
               FROM (SELECT unnest(range(1, {_GM_DIMS + 1})) AS i) s
             ) AS DOUBLE))) AS BIGINT), 1) AS d_micro
      FROM pts p CROSS JOIN m{t} m),
    nm{t} AS MATERIALIZED (
      SELECT s.i AS dim,
             CAST(sum(p.xm[s.i] * 1000000 // d{t}.d_micro) AS BIGINT) AS num,
             CAST(sum(1000000000000 // d{t}.d_micro) AS BIGINT) AS den
      FROM pts p
      JOIN d{t} ON d{t}.vec_id = p.vec_id
      CROSS JOIN (SELECT unnest(range(1, {_GM_DIMS + 1})) AS i) s
      GROUP BY 1),
    m{t + 1} AS MATERIALIZED (
      SELECT list(num * 1000000 // den ORDER BY dim) AS c FROM nm{t})
    """


def _gm_oracle() -> str:
    rounds = ",".join(_gm_round_sql(t) for t in range(1, _GM_ITERS + 1))
    return f"""
    WITH pts AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
                            v -> CAST(round(v * 1000000) AS BIGINT)) AS xm
      FROM embeddings),
    m1 AS MATERIALIZED (
      SELECT list(mu ORDER BY dim) AS c
      FROM (
        SELECT s.i AS dim,
               CAST(sum(xm[s.i]) // count(*) AS BIGINT) AS mu
        FROM pts CROSS JOIN (SELECT unnest(range(1, {_GM_DIMS + 1})) AS i) s
        GROUP BY 1)),
    {rounds}
    SELECT s.i AS dim,
           CAST(m1.c[s.i] AS BIGINT) AS mean_micro,
           CAST(mf.c[s.i] AS BIGINT) AS gmedian_micro,
           CAST(mf.c[s.i] - m1.c[s.i] AS BIGINT) AS shift_micro
    FROM m1 CROSS JOIN m{_GM_ITERS + 1} mf
    CROSS JOIN (SELECT unnest(range(1, {_GM_DIMS + 1})) AS i) s
    """


@register("geometric_median_embeddings", _gm_oracle())
def geometric_median_embeddings(spark, sf_dir):
    """Geometric median of the embedding cloud via {_GM_ITERS} unrolled
    Weiszfeld iterations — the ROBUST centroid (minimizes summed L2
    distance, not squared distance, so a few corrupt/outlier vectors
    cannot drag it the way the mean used by k-means/IVF training drifts);
    the high-dimensional sibling of robust_stats_mad. Coordinates stage
    to integer micro up front; each step's distances round to integer
    micro (identical doubles -> identical ints on both engines) and the
    inverse-distance-weighted update is exact integer arithmetic, so the
    whole iteration replays bit-identically.

    Plan, per step: one corpus x 1-row-estimate cross-join for distances
    (plan-gate bounded), one dim-grain aggregate over the literal
    64-dim spine (the explode is map-side, the shuffle carries 64 rows),
    then a 1-row array rebuild. O(n * dims) work per step, no windows."""
    emb = _t(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, v -> cast(round(v * 1000000) as bigint))"
        ).alias("xm"),
    )
    spine = spark.range(1, _GM_DIMS + 1).select(F.col("id").cast("int").alias("dim"))
    m = (
        pts.crossJoin(F.broadcast(spine))
        .groupBy("dim")
        .agg(
            F.expr("cast(sum(element_at(xm, dim)) div count(*) as bigint)")
            .alias("mu")
        )
        .agg(F.expr("sort_array(collect_list(struct(dim, mu)))").alias("sm"))
        .select(F.expr("transform(sm, s -> s.mu)").alias("c"))
    )
    for t in range(1, _GM_ITERS + 1):
        d = pts.crossJoin(F.broadcast(m)).select(
            "vec_id", "xm",
            F.expr(
                "greatest(cast(round(sqrt(cast(aggregate("
                "zip_with(xm, c, (a, b) -> (a - b) * (a - b)),"
                " cast(0 as bigint), (acc, x) -> acc + x) as double)))"
                " as bigint), 1)"
            ).alias("d_micro"),
        )
        nm = (
            d.crossJoin(F.broadcast(spine))
            .groupBy("dim")
            .agg(
                F.expr(
                    "cast(sum(element_at(xm, dim) * 1000000 div d_micro)"
                    " as bigint)"
                ).alias("num"),
                F.expr(
                    "cast(sum(1000000000000 div d_micro) as bigint)"
                ).alias("den"),
            )
        )
        m = (
            nm.select("dim", F.expr("num * 1000000 div den").alias("mu"))
            .agg(F.expr("sort_array(collect_list(struct(dim, mu)))").alias("sm"))
            .select(F.expr("transform(sm, s -> s.mu)").alias("c"))
        )
    mean_m = (
        pts.crossJoin(F.broadcast(spine))
        .groupBy("dim")
        .agg(
            F.expr("cast(sum(element_at(xm, dim)) div count(*) as bigint)")
            .alias("mean_micro")
        )
    )
    final = (
        mean_m.crossJoin(F.broadcast(m))
        .select(
            "dim", "mean_micro",
            F.expr("element_at(c, dim)").cast("long").alias("gmedian_micro"),
        )
    )
    return final.select(
        "dim", "mean_micro", "gmedian_micro",
        (F.col("gmedian_micro") - F.col("mean_micro")).cast("long")
        .alias("shift_micro"),
    )


# ---------------------------------------------------------------------------
# SLO error-budget burn rate (1d / 7d / 28d multi-window, SRE-style)
# ---------------------------------------------------------------------------

_SLO_PPM = 250000  # SLO: <= 25% error events (fixture-calibrated)


@register(
    "error_budget_burn_rate",
    f"""
    WITH d AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS ordd,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS e
      FROM events GROUP BY 1, 2),
    w AS (
      SELECT day, n, e,
             CAST(sum(n) OVER (ORDER BY ordd RANGE BETWEEN 6 PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS n7,
             CAST(sum(e) OVER (ORDER BY ordd RANGE BETWEEN 6 PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS e7,
             CAST(sum(n) OVER (ORDER BY ordd RANGE BETWEEN 27 PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS n28,
             CAST(sum(e) OVER (ORDER BY ordd RANGE BETWEEN 27 PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS e28
      FROM d)
    SELECT day, n, e,
           CAST(e * 1000000000 // (n * {_SLO_PPM}) AS BIGINT) AS burn_1d_milli,
           CAST(e7 * 1000000000 // (n7 * {_SLO_PPM}) AS BIGINT)
               AS burn_7d_milli,
           CAST(e28 * 1000000000 // (n28 * {_SLO_PPM}) AS BIGINT)
               AS burn_28d_milli,
           CAST(CASE WHEN e * 1000000000 // (n * {_SLO_PPM}) > 14400
                      AND e7 * 1000000000 // (n7 * {_SLO_PPM}) > 14400
                     THEN 2
                     WHEN e7 * 1000000000 // (n7 * {_SLO_PPM}) > 6000
                      AND e28 * 1000000000 // (n28 * {_SLO_PPM}) > 6000
                     THEN 1 ELSE 0 END AS INT) AS page_severity
    FROM w
    """,
)
def error_budget_burn_rate(spark, sf_dir):
    """SLO error-budget burn rate with multi-window alerting (the Google
    SRE-workbook pattern): burn = error_rate / SLO_budget per 1d / 7d /
    28d trailing windows, paging only when BOTH a fast and a slow window
    burn hot (14.4x fast+slow = budget gone in 2 days; 6x = gone in ~5) —
    the production-alerting layer on top of event_error_rate_daily's raw
    series (single-window alerts flap; the dual-window AND is the
    standard fix). Burn rates stage as exact integer milli (one floor
    div per window against the literal SLO). The trailing windows are
    RANGE frames over the day ordinal (days since epoch), so "7d" means
    7 CALENDAR days even when the series has missing days — a
    ROWS-BETWEEN frame would silently span more calendar time on a gappy
    series (r6 advice); days with zero events contribute zero to the
    sums either way, so no spine densification is needed.

    Plan: one data-grain aggregate to day grain, three RANGE-frame
    windows above it (calendar-bounded), pure integer expressions."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        F.col("ts").cast("date").cast("string").alias("day"),
        F.expr("cast(datediff(cast(ts as date), date'1970-01-01') as bigint)")
        .alias("ordd"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).cast("long").alias("e"),
    )
    w7 = Window.orderBy("ordd").rangeBetween(-6, 0)
    w28 = Window.orderBy("ordd").rangeBetween(-27, 0)
    w = d.select(
        "day", "n", "e",
        F.sum("n").over(w7).cast("long").alias("n7"),
        F.sum("e").over(w7).cast("long").alias("e7"),
        F.sum("n").over(w28).cast("long").alias("n28"),
        F.sum("e").over(w28).cast("long").alias("e28"),
    )
    b1 = f"e * 1000000000 div (n * {_SLO_PPM})"
    b7 = f"e7 * 1000000000 div (n7 * {_SLO_PPM})"
    b28 = f"e28 * 1000000000 div (n28 * {_SLO_PPM})"
    return w.select(
        "day", "n", "e",
        F.expr(f"cast({b1} as bigint)").alias("burn_1d_milli"),
        F.expr(f"cast({b7} as bigint)").alias("burn_7d_milli"),
        F.expr(f"cast({b28} as bigint)").alias("burn_28d_milli"),
        F.expr(
            f"cast(CASE WHEN {b1} > 14400 AND {b7} > 14400 THEN 2"
            f" WHEN {b7} > 6000 AND {b28} > 6000 THEN 1 ELSE 0 END as int)"
        ).alias("page_severity"),
    )


# ---------------------------------------------------------------------------
# Log-rank test: two-group survival comparison (completes kaplan_meier)
# ---------------------------------------------------------------------------

_LOGRANK_CHI2_CRIT = 3.84  # chi2(0.95; df=1)
# per-event-time expected events and hypergeometric variance for group 1,
# staged to integer micro PER TIME before summing (ANOVA convention: sums
# of doubles are order-dependent; identical per-row doubles -> identical
# rounded ints -> order-free exact sums). The leading CAST makes the whole
# chain double so the bigint products can never overflow.
_LR_E1 = (
    "CAST(round(CAST(d AS DOUBLE) * n1_risk * 1000000 / n_risk) AS BIGINT)"
)
_LR_V = (
    "CAST(CASE WHEN n_risk <= 1 THEN 0 ELSE"
    " round(CAST(d AS DOUBLE) * n1_risk * (n_risk - n1_risk)"
    " * (n_risk - d) * 1000000"
    " / (CAST(n_risk AS DOUBLE) * n_risk * (n_risk - 1))) END AS BIGINT)"
)
_LR_CHI2 = (
    "((CAST(o1 AS DOUBLE) * 1000000 - e1_micro)"
    " * (CAST(o1 AS DOUBLE) * 1000000 - e1_micro)"
    " / (CAST(v_micro AS DOUBLE) * 1000000))"
)


def _logrank_oracle() -> str:
    return f"""
    WITH ue AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS grp,
             CAST(min(epoch_us(ts)) AS BIGINT) AS t_first,
             CAST(min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
                  AS BIGINT) AS t_purch
      FROM events GROUP BY 1, 2),
    mx AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS t_max FROM events),
    durs AS (
      SELECT grp,
             CASE WHEN t_purch IS NOT NULL
                  THEN (t_purch - t_first) // 3600000000
                  ELSE (t_max - t_first) // 3600000000 END AS t_hours,
             CASE WHEN t_purch IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM ue CROSS JOIN mx),
    tg AS (SELECT t_hours,
                  CAST(sum(ev) AS BIGINT) AS d,
                  CAST(sum(ev * grp) AS BIGINT) AS d1,
                  CAST(count(*) AS BIGINT) AS leave_n,
                  CAST(sum(grp) AS BIGINT) AS leave1
           FROM durs GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(grp) AS BIGINT) AS n1_users
            FROM durs),
    risk AS (
      SELECT t_hours, d, d1,
             n_users - (CAST(sum(leave_n) OVER (ORDER BY t_hours) AS BIGINT)
                        - leave_n) AS n_risk,
             n1_users - (CAST(sum(leave1) OVER (ORDER BY t_hours) AS BIGINT)
                         - leave1) AS n1_risk
      FROM tg CROSS JOIN tot),
    terms AS (
      SELECT d1, {_LR_E1} AS e1_t, {_LR_V} AS v_t
      FROM risk WHERE d > 0),
    s AS (SELECT CAST(sum(d1) AS BIGINT) AS o1,
                 CAST(sum(e1_t) AS BIGINT) AS e1_micro,
                 CAST(sum(v_t) AS BIGINT) AS v_micro
          FROM terms)
    SELECT o1, e1_micro, v_micro,
           round({_LR_CHI2}, 6) AS chi2_stat,
           CAST(CASE WHEN {_LR_CHI2} > {_LOGRANK_CHI2_CRIT} THEN 1 ELSE 0 END
                AS INT) AS reject_95
    FROM s
    """


@register("logrank_test_survival", _logrank_oracle())
def logrank_test_survival(spark, sf_dir):
    """Log-rank (Mantel-Cox) test: do the two experiment arms (user-parity
    buckets, the same assignment as conversion_ab_ztest) differ in
    time-to-first-purchase survival? — the hypothesis-test companion to
    kaplan_meier_survival (KM draws the curves; log-rank says whether the
    gap is real under censoring, which a naive conversion-rate comparison
    gets wrong when arms are observed for different spans). At each event
    time the observed group-1 events are compared against the
    hypergeometric expectation d*n1/n with variance
    d*(n1/n)(1-n1/n)(n-d)/(n-1); chi2 = (O-E)^2/V against the literal
    chi2(1) critical value.

    Per-time E and V round to integer micro BEFORE the sum (order-free
    exact BIGINT sums, the ANOVA convention); O is exact. The only
    unrounded doubles are inside the shared-text per-time expressions and
    the final 1-row chi2.

    Plan: user-grain aggregate, 1-row horizon cross-join, duration-grain
    aggregate (bounded by the observation window in hours at ANY user
    count), two cumulative windows over that bounded grain (risk sets as
    suffix counts from prefix sums — no self-join), a 1-row sum. Same
    scale shape as kaplan_meier_survival."""
    ev = _t(spark, sf_dir, "events")
    ue = ev.groupBy(
        "user_id", F.expr("cast(user_id % 2 as bigint)").alias("grp")
    ).agg(
        F.min(F.unix_micros(F.col("ts"))).cast("long").alias("t_first"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros(F.col("ts")))
        ).cast("long").alias("t_purch"),
    )
    mx = ev.agg(F.max(F.unix_micros(F.col("ts"))).cast("long").alias("t_max"))
    durs = ue.crossJoin(F.broadcast(mx)).select(
        "grp",
        F.expr(
            "CASE WHEN t_purch IS NOT NULL"
            " THEN (t_purch - t_first) div 3600000000"
            " ELSE (t_max - t_first) div 3600000000 END"
        ).alias("t_hours"),
        F.expr("CASE WHEN t_purch IS NOT NULL THEN 1 ELSE 0 END").alias("ev"),
    )
    tg = durs.groupBy("t_hours").agg(
        F.sum("ev").cast("long").alias("d"),
        F.sum(F.expr("ev * grp")).cast("long").alias("d1"),
        F.count(F.lit(1)).cast("long").alias("leave_n"),
        F.sum("grp").cast("long").alias("leave1"),
    )
    tot = durs.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("grp").cast("long").alias("n1_users"),
    )
    w = Window.orderBy("t_hours")
    risk = tg.crossJoin(F.broadcast(tot)).select(
        "t_hours", "d", "d1",
        (
            F.col("n_users") - (F.sum("leave_n").over(w) - F.col("leave_n"))
        ).cast("long").alias("n_risk"),
        (
            F.col("n1_users") - (F.sum("leave1").over(w) - F.col("leave1"))
        ).cast("long").alias("n1_risk"),
    )
    terms = risk.filter(F.col("d") > 0).select(
        "d1", F.expr(_LR_E1).alias("e1_t"), F.expr(_LR_V).alias("v_t")
    )
    s = terms.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum("e1_t").cast("long").alias("e1_micro"),
        F.sum("v_t").cast("long").alias("v_micro"),
    )
    return s.select(
        "o1", "e1_micro", "v_micro",
        F.expr(f"round({_LR_CHI2}, 6)").alias("chi2_stat"),
        F.expr(
            f"cast(CASE WHEN {_LR_CHI2} > {_LOGRANK_CHI2_CRIT} THEN 1 ELSE 0"
            " END as int)"
        ).alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard (the integral KM exponentiates)
# ---------------------------------------------------------------------------

def _nelson_aalen_oracle() -> str:
    return """
    WITH ue AS (
      SELECT user_id,
             CAST(min(epoch_us(ts)) AS BIGINT) AS t_first,
             CAST(min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
                  AS BIGINT) AS t_purch
      FROM events GROUP BY 1),
    mx AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS t_max FROM events),
    durs AS (
      SELECT CASE WHEN t_purch IS NOT NULL
                  THEN (t_purch - t_first) // 3600000000
                  ELSE (t_max - t_first) // 3600000000 END AS t_hours,
             CASE WHEN t_purch IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM ue CROSS JOIN mx),
    tg AS (SELECT t_hours, CAST(sum(ev) AS BIGINT) AS d,
                  CAST(count(*) AS BIGINT) AS leave_n
           FROM durs GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM durs),
    risk AS (
      SELECT t_hours, d,
             n_users - (CAST(sum(leave_n) OVER (ORDER BY t_hours) AS BIGINT)
                        - leave_n) AS n_risk
      FROM tg CROSS JOIN tot),
    ev_t AS (
      SELECT t_hours, d, n_risk,
             CAST(d * 1000000 // n_risk AS BIGINT) AS h_step_micro,
             CAST(d * 1000000000000 // (n_risk * n_risk) AS BIGINT)
                 AS var_step_pico
      FROM risk WHERE d > 0)
    SELECT t_hours, d, n_risk,
           CAST(sum(h_step_micro) OVER (ORDER BY t_hours) AS BIGINT)
               AS cumhaz_micro,
           CAST(sum(var_step_pico) OVER (ORDER BY t_hours) AS BIGINT)
               AS var_pico
    FROM ev_t
    """


@register("nelson_aalen_hazard", _nelson_aalen_oracle())
def nelson_aalen_hazard(spark, sf_dir):
    """Nelson-Aalen cumulative-hazard estimator H(t) = sum d_i/n_i for
    time-to-first-purchase, with its Poisson-type variance sum d_i/n_i^2
    — the additive counterpart of kaplan_meier_survival (KM multiplies
    survival factors; NA sums hazard increments, is less biased in small
    risk sets, and exp(-H) gives the Fleming-Harrington survival
    estimate). Every increment is an exact integer floor-div (micro for
    H, pico for the variance: d <= users and n_risk^2 products stay far
    inside int64), so the cumulative sums are exact BIGINT on both
    engines — no doubles anywhere.

    Plan: identical bounded shape to kaplan_meier_survival — user-grain
    aggregate, duration-grain aggregate (bounded by the observation
    window in hours), two cumulative windows over that grain."""
    ev = _t(spark, sf_dir, "events")
    ue = ev.groupBy("user_id").agg(
        F.min(F.unix_micros(F.col("ts"))).cast("long").alias("t_first"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros(F.col("ts")))
        ).cast("long").alias("t_purch"),
    )
    mx = ev.agg(F.max(F.unix_micros(F.col("ts"))).cast("long").alias("t_max"))
    durs = ue.crossJoin(F.broadcast(mx)).select(
        F.expr(
            "CASE WHEN t_purch IS NOT NULL"
            " THEN (t_purch - t_first) div 3600000000"
            " ELSE (t_max - t_first) div 3600000000 END"
        ).alias("t_hours"),
        F.expr("CASE WHEN t_purch IS NOT NULL THEN 1 ELSE 0 END").alias("ev"),
    )
    tg = durs.groupBy("t_hours").agg(
        F.sum("ev").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("leave_n"),
    )
    tot = durs.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    w = Window.orderBy("t_hours")
    risk = tg.crossJoin(F.broadcast(tot)).select(
        "t_hours", "d",
        (
            F.col("n_users") - (F.sum("leave_n").over(w) - F.col("leave_n"))
        ).cast("long").alias("n_risk"),
    )
    ev_t = risk.filter(F.col("d") > 0).select(
        "t_hours", "d", "n_risk",
        F.expr("cast(d * 1000000 div n_risk as bigint)").alias("h_step_micro"),
        F.expr(
            "cast(d * 1000000000000 div (n_risk * n_risk) as bigint)"
        ).alias("var_step_pico"),
    )
    return ev_t.select(
        "t_hours", "d", "n_risk",
        F.sum("h_step_micro").over(w).cast("long").alias("cumhaz_micro"),
        F.sum("var_step_pico").over(w).cast("long").alias("var_pico"),
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis H: rank-based k-group test (the nonparametric ANOVA)
# ---------------------------------------------------------------------------

_KW_CHI2_CRIT = 36.42  # chi2(0.95; df=24) -- k=25 nations
_KW_H = (
    "((12.0 * sum_term / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1))"
    " / (1.0 - CAST(tie3 AS DOUBLE)"
    " / (CAST(n AS DOUBLE) * n * n - n)))"
)


def _kruskal_oracle() -> str:
    return f"""
    WITH base AS (
      SELECT n_name AS nation,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey),
    vg AS (SELECT cents, CAST(count(*) AS BIGINT) AS cnt
           FROM base GROUP BY 1),
    r AS (SELECT cents, cnt,
                 CAST(sum(cnt) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED
                                     PRECEDING AND CURRENT ROW) AS BIGINT)
                   - cnt AS cum_less
          FROM vg),
    gg AS (SELECT nation, cents, CAST(count(*) AS BIGINT) AS n_gc
           FROM base GROUP BY 1, 2),
    rs AS (
      SELECT nation,
             CAST(sum(n_gc) AS BIGINT) AS n_g,
             CAST(sum(n_gc * (2 * cum_less + cnt + 1)) AS BIGINT) AS r2_g
      FROM gg JOIN r USING (cents) GROUP BY 1),
    terms AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(round(CAST(r2_g AS DOUBLE) * r2_g / (4 * n_g))
                           AS BIGINT)) AS BIGINT) AS sum_term
      FROM rs),
    ties AS (SELECT CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie3,
                    CAST(sum(cnt) AS BIGINT) AS n
             FROM vg)
    SELECT n, k, tie3,
           round({_KW_H}, 6) AS h_stat,
           CAST(CASE WHEN {_KW_H} > {_KW_CHI2_CRIT} THEN 1 ELSE 0 END AS INT)
               AS reject_95
    FROM terms CROSS JOIN ties
    """


@register("kruskal_wallis_h", _kruskal_oracle())
def kruskal_wallis_h(spark, sf_dir):
    """Kruskal-Wallis H: does the order-value DISTRIBUTION differ across
    nations? — the rank-based (distribution-free) counterpart of
    one_way_anova_f, immune to the heavy price tail that inflates the
    F-test's variance terms, with the standard tie correction
    C = 1 - sum(t^3 - t)/(N^3 - N).

    Rank-free distributed shape (the mann_whitney_auc trick generalized
    to k groups): aggregate to value grain (bounded by the integer-cents
    price domain, not data volume), one cumulative window gives every
    distinct value's tie-averaged rank in closed form as the INTEGER
    2*avg_rank = 2*cum_less + cnt + 1, then per-group doubled rank sums
    R2_g land by an equi-join of the (nation, cents) grain against the
    value grain. Per-group R_g^2/n_g rounds to BIGINT before summing
    (order-free exact sum, the ANOVA convention); H and the tie
    correction are one shared-text double over exact BIGINTs (N^3 stays
    in double space; tie3 = sum(cnt^3) is exact int64 up to ~2M rows per
    value, far above any per-value tie mass here).

    Plan: star-join projection, two bounded aggregates (value grain +
    (nation, value) grain), one window over the bounded value grain, a
    broadcast-size equi-join, two 1-row aggregates. At 100 TB every
    post-projection row set is domain-bounded."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = (
        orders.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
        )
    )
    vg = base.groupBy("cents").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    r = vg.select(
        "cents", "cnt",
        (F.sum("cnt").over(w) - F.col("cnt")).cast("long").alias("cum_less"),
    )
    gg = base.groupBy("nation", "cents").agg(
        F.count(F.lit(1)).cast("long").alias("n_gc")
    )
    rs = gg.join(r, "cents").groupBy("nation").agg(
        F.sum("n_gc").cast("long").alias("n_g"),
        F.sum(
            F.expr("n_gc * (2 * cum_less + cnt + 1)")
        ).cast("long").alias("r2_g"),
    )
    terms = rs.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            F.expr("cast(round(cast(r2_g as double) * r2_g / (4 * n_g)) as bigint)")
        ).cast("long").alias("sum_term"),
    )
    ties = vg.agg(
        F.sum(F.expr("cnt * cnt * cnt - cnt")).cast("long").alias("tie3"),
        F.sum("cnt").cast("long").alias("n"),
    )
    return terms.crossJoin(F.broadcast(ties)).select(
        "n", "k", "tie3",
        F.expr(f"round({_KW_H}, 6)").alias("h_stat"),
        F.expr(
            f"cast(CASE WHEN {_KW_H} > {_KW_CHI2_CRIT} THEN 1 ELSE 0 END"
            " as int)"
        ).alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# Welch's unequal-variance t-test (completes the A/B family)
# ---------------------------------------------------------------------------

_WELCH_T_CRIT = 1.96  # two-sided 95%, df large
_WELCH_VAR = {
    0: "((sxx0 - CAST(s0 AS DOUBLE) * s0 / n0) / (n0 - 1) / n0)",
    1: "((sxx1 - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / n1)",
}
_WELCH_T = (
    f"((CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)"
    f" / sqrt({_WELCH_VAR[0]} + {_WELCH_VAR[1]}))"
)
_WELCH_DF = (
    f"(({_WELCH_VAR[0]} + {_WELCH_VAR[1]}) * ({_WELCH_VAR[0]} + {_WELCH_VAR[1]})"
    f" / ({_WELCH_VAR[0]} * {_WELCH_VAR[0]} / (n0 - 1)"
    f" + {_WELCH_VAR[1]} * {_WELCH_VAR[1]} / (n1 - 1)))"
)


@register(
    "welch_ttest_spend",
    f"""
    WITH u AS (
      SELECT o_custkey % 2 AS grp,
             CAST(round(o_totalprice) AS BIGINT) AS x
      FROM orders),
    s AS (
      SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN grp = 0 THEN x ELSE 0 END) AS BIGINT) AS s0,
             CAST(sum(CASE WHEN grp = 1 THEN x ELSE 0 END) AS BIGINT) AS s1,
             CAST(sum(CASE WHEN grp = 0 THEN x * x ELSE 0 END) AS BIGINT)
                 AS sxx0i,
             CAST(sum(CASE WHEN grp = 1 THEN x * x ELSE 0 END) AS BIGINT)
                 AS sxx1i
      FROM u),
    sd AS (SELECT n0, n1, s0, s1,
                  CAST(sxx0i AS DOUBLE) AS sxx0, CAST(sxx1i AS DOUBLE) AS sxx1
           FROM s)
    SELECT n0, n1, s0, s1,
           CAST(s0 * 1 // n0 AS BIGINT) AS mean0_dollars,
           CAST(s1 * 1 // n1 AS BIGINT) AS mean1_dollars,
           round({_WELCH_T}, 6) AS t_stat,
           CAST(round({_WELCH_DF}) AS BIGINT) AS df_welch,
           CAST(CASE WHEN abs({_WELCH_T}) > {_WELCH_T_CRIT} THEN 1 ELSE 0 END
                AS INT) AS reject_95
    FROM sd
    """,
)
def welch_ttest_spend(spark, sf_dir):
    """Welch's unequal-variance t-test on order value between the two
    deterministic experiment arms (customer-key parity) — the continuous-
    metric companion to conversion_ab_ztest (proportions) that does NOT
    assume equal variances (the levene_brown_forsythe failure mode:
    pooled-variance t is anticonservative when the bigger arm has the
    smaller variance). Satterthwaite effective df reported alongside.

    All six moments (n, S, S^2 per arm) come from ONE conditional
    aggregate producing exact BIGINTs — x staged in WHOLE DOLLARS (the
    one_way_anova_f convention) so sum(x^2) stays inside int64 at any
    plausible scale (cents would overflow Spark's wrapping int64 sum at
    ~10^4 orders while DuckDB's hugeint kept going: a silent cross-engine
    divergence, not a crash); t, df, and the decision are shared-text
    doubles over the exact sums.

    Plan: one projection + one conditional aggregate = one shuffle of one
    row at any scale."""
    orders = _t(spark, sf_dir, "orders")
    u = orders.select(
        F.expr("o_custkey % 2").alias("grp"),
        F.expr("cast(round(o_totalprice) as bigint)").alias("x"),
    )
    s = u.agg(
        F.sum(F.expr("CASE WHEN grp = 0 THEN 1 ELSE 0 END")).cast("long").alias("n0"),
        F.sum(F.expr("CASE WHEN grp = 1 THEN 1 ELSE 0 END")).cast("long").alias("n1"),
        F.sum(F.expr("CASE WHEN grp = 0 THEN x ELSE 0 END")).cast("long").alias("s0"),
        F.sum(F.expr("CASE WHEN grp = 1 THEN x ELSE 0 END")).cast("long").alias("s1"),
        F.sum(F.expr("CASE WHEN grp = 0 THEN x * x ELSE 0 END")).cast("long").alias("sxx0i"),
        F.sum(F.expr("CASE WHEN grp = 1 THEN x * x ELSE 0 END")).cast("long").alias("sxx1i"),
    ).select(
        "n0", "n1", "s0", "s1",
        F.expr("cast(sxx0i as double)").alias("sxx0"),
        F.expr("cast(sxx1i as double)").alias("sxx1"),
    )
    return s.select(
        "n0", "n1", "s0", "s1",
        F.expr("cast(s0 * 1 div n0 as bigint)").alias("mean0_dollars"),
        F.expr("cast(s1 * 1 div n1 as bigint)").alias("mean1_dollars"),
        F.expr(f"round({_WELCH_T}, 6)").alias("t_stat"),
        F.expr(f"cast(round({_WELCH_DF}) as bigint)").alias("df_welch"),
        F.expr(
            f"cast(CASE WHEN abs({_WELCH_T}) > {_WELCH_T_CRIT} THEN 1 ELSE 0"
            " END as int)"
        ).alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence per source vs the corpus mixture
# ---------------------------------------------------------------------------

_JSD_LN2_MICRO = 693147  # round(ln(2) * 1e6): the JSD upper bound
# P-side / Q-side per-token terms, rounded to integer micro-nats per token
# (order-free exact sums, the source_kl_divergence convention). c = source
# count (may be 0), cg = global count (> 0 for every vocab token),
# ns = source total, nu = corpus total. P/M = 2*c*nu/(c*nu + cg*ns),
# Q/M = 2*cg*ns/(c*nu + cg*ns) -- all-integer ln arguments, no smoothing.
_JSD_TERM_P = (
    "CASE WHEN c = 0 THEN 0 ELSE"
    " c * CAST(round((ln(2.0 * c * nu)"
    " - ln(CAST(c * nu + cg * ns AS DOUBLE))) * 1000000) AS BIGINT) END"
)
_JSD_TERM_Q = (
    "cg * CAST(round((ln(2.0 * cg * ns)"
    " - ln(CAST(c * nu + cg * ns AS DOUBLE))) * 1000000) AS BIGINT)"
)


@register(
    "js_divergence_sources",
    f"""
    WITH {_LM_CTE},
    s AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cs
          FROM tok GROUP BY 1, 2),
    ns AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ns FROM s GROUP BY 1),
    grid AS (
      SELECT ns.source, ns.ns, u.tok, CAST(u.c AS BIGINT) AS cg,
             CAST(coalesce(s.cs, 0) AS BIGINT) AS c, nu.nu
      FROM ns CROSS JOIN u CROSS JOIN nu
      LEFT JOIN s ON s.source = ns.source AND s.tok = u.tok),
    term AS (
      SELECT source, ns, nu,
             {_JSD_TERM_P} AS tp,
             {_JSD_TERM_Q} AS tq
      FROM grid),
    agg AS (SELECT source,
                   CAST(greatest(sum(tp), 0) // max(ns) AS BIGINT) AS kl_p,
                   CAST(greatest(sum(tq), 0) // max(nu) AS BIGINT) AS kl_q,
                   CAST(max(ns) AS BIGINT) AS n_tokens
            FROM term GROUP BY 1)
    SELECT source, n_tokens,
           CAST((kl_p + kl_q) // 2 AS BIGINT) AS jsd_unat,
           CAST(((kl_p + kl_q) // 2) * 1000000 // {_JSD_LN2_MICRO} AS BIGINT)
               AS distance_ppm
    FROM agg
    """,
)
def js_divergence_sources(spark, sf_dir):
    """Jensen-Shannon divergence of each source's unigram distribution
    against the corpus-wide mixture M = (P_s + Q)/2 — the SYMMETRIC,
    [0, ln 2]-bounded companion to source_kl_divergence (KL blows up on
    tokens the corpus has but the source lacks; JSD is finite with NO
    smoothing because both ratio arguments 2*c*NU/(c*NU + C*ns) and
    2*C*ns/(c*NU + C*ns) are ratios of positive integers even at c = 0).
    The sqrt of JSD is a metric, so these per-source distances can drive
    source-mixture rebalancing the way domain_mixing_weights does.

    Per-token terms round to integer micro-nats before summing (order-free
    exact BIGINT sums); the only doubles are inside the shared-text ln
    calls on integer products (c*NU <= token-mass^2 stays far inside
    int64 and exactly representable in double up to 2^53).

    Plan: ONE tokenize pass to the (source, tok) count table, which is
    localCheckpoint-ed (model-sized: |vocab| x |sources|) — the vocab
    table u, the per-source totals ns, and the corpus total nu are all
    re-aggregations of that MATERIALIZED table (sums of counts are
    associative, so the values equal the direct tok-grain aggregates the
    oracle's CTEs compute), and the grid's four consumers never re-run
    the tokenize (the r6-verdict diamond-lineage rule). The grid LEFT
    join is vocab-grain, NOT corpus-grain — the same fixed-model-state
    posture as text_unigram_surprisal. EXECUTES_AT_BUILD: the eager
    checkpoint runs the tokenize at plan-build time."""
    t1, tok, _u_unused, _nu_unused = _lm_parts(spark, sf_dir)
    s = tok.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("cs")
    ).localCheckpoint(eager=True)
    u = s.groupBy("tok").agg(F.sum("cs").alias("c"))
    nu = u.agg(F.sum("c").cast("long").alias("nu"))
    ns = s.groupBy("source").agg(F.sum("cs").cast("long").alias("ns"))
    grid = (
        ns.crossJoin(u.select("tok", F.col("c").cast("long").alias("cg")))
        .crossJoin(F.broadcast(nu))
        .join(
            s.withColumnsRenamed({"source": "s_source", "tok": "s_tok"}),
            (F.col("source") == F.col("s_source")) & (F.col("tok") == F.col("s_tok")),
            "left",
        )
        .select(
            "source", "ns", "tok", "cg", "nu",
            F.coalesce(F.col("cs"), F.lit(0)).cast("long").alias("c"),
        )
    )
    term = grid.select(
        "source", "ns", "nu",
        F.expr(_JSD_TERM_P).alias("tp"),
        F.expr(_JSD_TERM_Q).alias("tq"),
    )
    agg = term.groupBy("source").agg(
        F.expr("cast(greatest(sum(tp), 0) div max(ns) as bigint)").alias("kl_p"),
        F.expr("cast(greatest(sum(tq), 0) div max(nu) as bigint)").alias("kl_q"),
        F.max("ns").cast("long").alias("n_tokens"),
    )
    return agg.select(
        "source", "n_tokens",
        F.expr("cast((kl_p + kl_q) div 2 as bigint)").alias("jsd_unat"),
        F.expr(
            f"cast(((kl_p + kl_q) div 2) * 1000000 div {_JSD_LN2_MICRO}"
            " as bigint)"
        ).alias("distance_ppm"),
    )


# ---------------------------------------------------------------------------
# Cochran-Mantel-Haenszel stratified 2x2 test + MH pooled odds ratio
# ---------------------------------------------------------------------------

_CMH_CHI2_CRIT = 3.84  # chi2(0.95; df=1)
# per-stratum expectation and hypergeometric variance of the exposed-urgent
# cell, rounded to integer micro per stratum (leading CAST keeps the whole
# product chain in double -- no int64 overflow at any stratum size)
_CMH_E = "CAST(round(CAST(n1 AS DOUBLE) * m1 * 1000000 / t) AS BIGINT)"
_CMH_V = (
    "CAST(CASE WHEN t <= 1 THEN 0 ELSE"
    " round(CAST(n1 AS DOUBLE) * n0 * m1 * (t - m1) * 1000000"
    " / (CAST(t AS DOUBLE) * t * (t - 1))) END AS BIGINT)"
)
# Mantel-Haenszel pooled odds ratio: sum(a*d/T) / sum(b*c/T), per-stratum
# terms in micro
_CMH_AD = "CAST(round(CAST(a AS DOUBLE) * d * 1000000 / t) AS BIGINT)"
_CMH_BC = "CAST(round(CAST(b AS DOUBLE) * c * 1000000 / t) AS BIGINT)"
_CMH_CHI2 = (
    "((CAST(o AS DOUBLE) * 1000000 - e_micro)"
    " * (CAST(o AS DOUBLE) * 1000000 - e_micro)"
    " / (CAST(v_micro AS DOUBLE) * 1000000))"
)


@register(
    "cmh_stratified_test",
    f"""
    WITH rec AS (
      SELECT n_name AS nation,
             CAST(c_custkey % 2 AS BIGINT) AS exposed,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS urgent
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey),
    strat AS (
      SELECT nation,
             CAST(sum(exposed * urgent) AS BIGINT) AS a,
             CAST(sum(exposed * (1 - urgent)) AS BIGINT) AS b,
             CAST(sum((1 - exposed) * urgent) AS BIGINT) AS c,
             CAST(sum((1 - exposed) * (1 - urgent)) AS BIGINT) AS d,
             CAST(sum(exposed) AS BIGINT) AS n1,
             CAST(count(*) - sum(exposed) AS BIGINT) AS n0,
             CAST(sum(urgent) AS BIGINT) AS m1,
             CAST(count(*) AS BIGINT) AS t
      FROM rec GROUP BY 1),
    terms AS (
      SELECT a, {_CMH_E} AS e_t, {_CMH_V} AS v_t,
             {_CMH_AD} AS ad_t, {_CMH_BC} AS bc_t
      FROM strat),
    s AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(a) AS BIGINT) AS o,
                 CAST(sum(e_t) AS BIGINT) AS e_micro,
                 CAST(sum(v_t) AS BIGINT) AS v_micro,
                 CAST(sum(ad_t) AS BIGINT) AS ad_micro,
                 CAST(sum(bc_t) AS BIGINT) AS bc_micro
          FROM terms)
    SELECT k, o, e_micro, v_micro,
           round({_CMH_CHI2}, 6) AS chi2_stat,
           CAST(ad_micro * 1000000 // greatest(bc_micro, 1) AS BIGINT)
               AS or_mh_ppm,
           CAST(CASE WHEN {_CMH_CHI2} > {_CMH_CHI2_CRIT} THEN 1 ELSE 0 END
                AS INT) AS reject_95
    FROM s
    """,
)
def cmh_stratified_test(spark, sf_dir):
    """Cochran-Mantel-Haenszel test: is the exposure (customer-parity
    arm) associated with urgent orders AFTER controlling for nation
    strata? — the formal inference step behind simpson_paradox_audit
    (the audit flags sign reversals; CMH tests the common-odds-ratio
    hypothesis that remains valid when the pooled 2x2 is confounded by
    stratum mix), reported with the Mantel-Haenszel pooled odds ratio.

    Per-stratum E = n1*m1/T and hypergeometric V = n1*n0*m1*m0/(T^2(T-1))
    round to integer micro before summing (order-free exact sums, the
    log-rank convention; the leading CAST keeps the product chains in
    double so nothing overflows); O = sum(a) is exact. chi2 and the
    decision are one shared-text double; OR_MH is a pure integer
    floor-div ratio of the summed micro terms.

    Plan: one star-join projection, ONE nation-grain conditional
    aggregate (the whole 2x2xK table in a single pass), a 1-row sum.
    Stratum count bounds every post-aggregate row set at any volume."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rec = (
        orders.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.expr("cast(c_custkey % 2 as bigint)").alias("exposed"),
            F.expr(
                "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
                " THEN 1 ELSE 0 END"
            ).alias("urgent"),
        )
    )
    strat = rec.groupBy("nation").agg(
        F.sum(F.expr("exposed * urgent")).cast("long").alias("a"),
        F.sum(F.expr("exposed * (1 - urgent)")).cast("long").alias("b"),
        F.sum(F.expr("(1 - exposed) * urgent")).cast("long").alias("c"),
        F.sum(F.expr("(1 - exposed) * (1 - urgent)")).cast("long").alias("d"),
        F.sum("exposed").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("exposed")).cast("long").alias("n0"),
        F.sum("urgent").cast("long").alias("m1"),
        F.count(F.lit(1)).cast("long").alias("t"),
    )
    terms = strat.select(
        "a",
        F.expr(_CMH_E).alias("e_t"), F.expr(_CMH_V).alias("v_t"),
        F.expr(_CMH_AD).alias("ad_t"), F.expr(_CMH_BC).alias("bc_t"),
    )
    s = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("a").cast("long").alias("o"),
        F.sum("e_t").cast("long").alias("e_micro"),
        F.sum("v_t").cast("long").alias("v_micro"),
        F.sum("ad_t").cast("long").alias("ad_micro"),
        F.sum("bc_t").cast("long").alias("bc_micro"),
    )
    return s.select(
        "k", "o", "e_micro", "v_micro",
        F.expr(f"round({_CMH_CHI2}, 6)").alias("chi2_stat"),
        F.expr(
            "cast(ad_micro * 1000000 div greatest(bc_micro, 1) as bigint)"
        ).alias("or_mh_ppm"),
        F.expr(
            f"cast(CASE WHEN {_CMH_CHI2} > {_CMH_CHI2_CRIT} THEN 1 ELSE 0 END"
            " as int)"
        ).alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# t-closeness audit (ordered-EMD) -- completes the k-anon / l-div trio
# ---------------------------------------------------------------------------

_TCLOSE_T_PPM = 200000  # t = 0.20: flag classes whose EMD exceeds it
_TCLOSE_PRIOS = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]


def _tcloseness_oracle() -> str:
    spine = ", ".join(f"'{p}'" for p in _TCLOSE_PRIOS)
    return f"""
    WITH rec AS (
      SELECT c_nationkey AS nation, c_mktsegment AS segment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             o_orderpriority AS sens
      FROM orders JOIN customer ON c_custkey = o_custkey),
    cv AS (SELECT nation, segment, bal_band, sens,
                  CAST(count(*) AS BIGINT) AS c
           FROM rec GROUP BY 1, 2, 3, 4),
    cls AS (SELECT nation, segment, bal_band, CAST(sum(c) AS BIGINT) AS k
            FROM cv GROUP BY 1, 2, 3),
    gl AS (SELECT sens, CAST(count(*) AS BIGINT) AS cg FROM rec GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rec),
    spine AS (SELECT unnest([{spine}]) AS sens),
    grid AS (
      SELECT cls.nation, cls.segment, cls.bal_band, cls.k, spine.sens,
             CAST(coalesce(cv.c, 0) AS BIGINT) AS c,
             CAST(coalesce(gl.cg, 0) AS BIGINT) AS cg, tot.n
      FROM cls CROSS JOIN spine CROSS JOIN tot
      LEFT JOIN cv USING (nation, segment, bal_band, sens)
      LEFT JOIN gl USING (sens)),
    cum AS (
      SELECT nation, segment, bal_band, k, n, sens,
             CAST(sum(c) OVER (PARTITION BY nation, segment, bal_band
                               ORDER BY sens ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum_c,
             CAST(sum(cg) OVER (PARTITION BY nation, segment, bal_band
                                ORDER BY sens ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS cum_g
      FROM grid),
    emd AS (
      SELECT nation, segment, bal_band, k,
             CAST(sum(abs(cum_c * n - cum_g * k)) * 1000000
                  // (k * n * {len(_TCLOSE_PRIOS) - 1}) AS BIGINT) AS emd_ppm
      FROM cum GROUP BY nation, segment, bal_band, k, n)
    SELECT nation, segment, bal_band, k, emd_ppm,
           CAST(CASE WHEN emd_ppm > {_TCLOSE_T_PPM} THEN 1 ELSE 0 END AS INT)
               AS above_t
    FROM emd
    """


@register("t_closeness_audit", _tcloseness_oracle())
def t_closeness_audit(spark, sf_dir):
    """t-closeness audit over the same (nation, segment, balance-band)
    quasi-identifier classes as k_anonymity_audit / l_diversity_audit —
    the third rung of the anonymization-audit ladder (k-anonymity bounds
    re-identification, l-diversity bounds attribute disclosure by
    VARIETY, t-closeness bounds it by DISTRIBUTION: a class can hold 3
    distinct priorities yet still leak if 95% of its mass sits on
    1-URGENT while the corpus is uniform). Distance is the ordered-domain
    EMD over the 5-level priority scale: EMD = sum_j |cumP_j - cumQ_j| /
    (m - 1), computed as the all-integer |cum_c*N - cum_g*k| staged to
    ppm by one floor div — exact on both engines, no doubles anywhere
    (cum_c <= k and cum_g <= N keep the cross products inside int64 at
    any plausible scale).

    Plan: one join projection, a class x sensitive-value aggregate, a
    class-grain aggregate, a 5-value global aggregate, then a bounded
    class x 5-row literal-spine grid with two partitioned cumulative
    windows over it. Every post-aggregate row set is class-count-bounded
    (|nations| x |segments| x |bands| x 5)."""
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    rec = orders.join(cust, F.col("c_custkey") == F.col("o_custkey")).select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.expr("cast(floor(c_acctbal / 1000) as bigint)").alias("bal_band"),
        F.col("o_orderpriority").alias("sens"),
    )
    cv = rec.groupBy("nation", "segment", "bal_band", "sens").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # class x sensitive counts: the single data-grain aggregate every other
    # table below re-derives (associative count sums), materialized once
    cv = cv.localCheckpoint(eager=True)
    cls = cv.groupBy("nation", "segment", "bal_band").agg(
        F.sum("c").cast("long").alias("k")
    )
    gl = cv.groupBy("sens").agg(F.sum("c").cast("long").alias("cg"))
    tot = cv.agg(F.sum("c").cast("long").alias("n"))
    spine = spark.createDataFrame([(p,) for p in _TCLOSE_PRIOS], ["sens"])
    grid = (
        cls.crossJoin(F.broadcast(spine))
        .crossJoin(F.broadcast(tot))
        .join(cv, ["nation", "segment", "bal_band", "sens"], "left")
        .join(F.broadcast(gl), "sens", "left")
        .select(
            "nation", "segment", "bal_band", "k", "n", "sens",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c"),
            F.coalesce(F.col("cg"), F.lit(0)).cast("long").alias("cg"),
        )
    )
    w = (
        Window.partitionBy("nation", "segment", "bal_band")
        .orderBy("sens")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "nation", "segment", "bal_band", "k", "n", "sens",
        F.sum("c").over(w).cast("long").alias("cum_c"),
        F.sum("cg").over(w).cast("long").alias("cum_g"),
    )
    emd = cum.groupBy("nation", "segment", "bal_band", "k", "n").agg(
        F.expr(
            f"cast(sum(abs(cum_c * n - cum_g * k)) * 1000000"
            f" div (k * n * {len(_TCLOSE_PRIOS) - 1}) as bigint)"
        ).alias("emd_ppm")
    )
    return emd.select(
        "nation", "segment", "bal_band", "k", "emd_ppm",
        F.expr(
            f"cast(CASE WHEN emd_ppm > {_TCLOSE_T_PPM} THEN 1 ELSE 0 END"
            " as int)"
        ).alias("above_t"),
    )


# ---------------------------------------------------------------------------
# Cohen's kappa: chance-corrected agreement between two quality raters
# ---------------------------------------------------------------------------

# rater A: lexical quality -- stopword ratio >= 0.2 with at least 10 tokens
# rater B: surface quality -- punct ratio <= 5% with at least 200 chars
# (both pure integer-count comparisons: no ratio doubles anywhere)
_KAPPA_SW = "['the','a','an','and','or','of','to','in','is','it']"


def _kappa_oracle() -> str:
    return rf"""
    WITH q AS (
      SELECT length(text) AS nc,
             length(text) - length(regexp_replace(text,
                 '[!-/:-@\[-`{{-~]', '', 'g')) AS np,
             len(regexp_split_to_array(trim(lower(text)), '\s+')) AS nt,
             len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                 x -> list_contains({_KAPPA_SW}, x))) AS sw
      FROM documents WHERE length(trim(text)) > 0),
    r AS (
      SELECT CASE WHEN sw * 10 >= nt * 2 AND nt >= 10 THEN 1 ELSE 0 END AS ra,
             CASE WHEN np * 20 <= nc AND nc >= 200 THEN 1 ELSE 0 END AS rb
      FROM q),
    cm AS (
      SELECT CAST(sum(ra * rb) AS BIGINT) AS a,
             CAST(sum(ra * (1 - rb)) AS BIGINT) AS b,
             CAST(sum((1 - ra) * rb) AS BIGINT) AS c,
             CAST(sum((1 - ra) * (1 - rb)) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM r)
    SELECT a, b, c, d, n,
           CAST((a + d) * 1000000 // n AS BIGINT) AS po_ppm,
           CAST(((a + b) * (a + c) + (c + d) * (b + d)) * 1000000 // (n * n)
                AS BIGINT) AS pe_ppm,
           CAST((n * (a + d) - ((a + b) * (a + c) + (c + d) * (b + d)))
                * 1000000
                // (n * n - ((a + b) * (a + c) + (c + d) * (b + d)))
                AS BIGINT) AS kappa_ppm
    FROM cm
    """


@register("cohens_kappa_raters", _kappa_oracle())
def cohens_kappa_raters(spark, sf_dir):
    """Cohen's kappa between two independent document-quality raters (a
    lexical stopword-ratio gate and a surface punct/length gate) — the
    chance-corrected agreement metric every labeling/curation pipeline
    reports before trusting a cheap heuristic as a stand-in for an
    expensive one (raw percent agreement is inflated when both raters
    say 'pass' to almost everything; kappa subtracts the marginal-rate
    chance agreement). knn_label_agreement measures neighborhood label
    consistency; this measures RATER consistency on the same items.

    Both raters are pure integer-count threshold comparisons (sw*10 >=
    nt*2 etc. — ratios never materialize as doubles), the confusion
    matrix is ONE conditional aggregate, and po/pe/kappa are exact
    integer ppm floor-divs of its four cells: no doubles anywhere.
    kappa = (n(a+d) - ((a+b)(a+c)+(c+d)(b+d))) / (n^2 - (...)) in the
    all-integer cross-multiplied form.

    Plan: one projection with per-row token/char counts, one 1-row
    conditional aggregate. Map-side combine does all the work; one
    shuffle of one row at any corpus size."""
    docs = _t(spark, sf_dir, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    )
    sw_arr = _KAPPA_SW.replace("[", "array(").replace("]", ")")
    q = docs.select(
        F.length("text").alias("nc"),
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), r"[!-/:-@\[-`{-~]", ""))
        ).alias("np"),
        F.expr("size(split(trim(lower(text)), '\\\\s+'))").alias("nt"),
        F.expr(
            "size(filter(split(trim(lower(text)), '\\\\s+'),"
            f" x -> array_contains({sw_arr}, x)))"
        ).alias("sw"),
    )
    r = q.select(
        F.expr(
            "CASE WHEN sw * 10 >= nt * 2 AND nt >= 10 THEN 1 ELSE 0 END"
        ).alias("ra"),
        F.expr(
            "CASE WHEN np * 20 <= nc AND nc >= 200 THEN 1 ELSE 0 END"
        ).alias("rb"),
    )
    cm = r.agg(
        F.sum(F.expr("ra * rb")).cast("long").alias("a"),
        F.sum(F.expr("ra * (1 - rb)")).cast("long").alias("b"),
        F.sum(F.expr("(1 - ra) * rb")).cast("long").alias("c"),
        F.sum(F.expr("(1 - ra) * (1 - rb)")).cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    pe_expr = "((a + b) * (a + c) + (c + d) * (b + d))"
    return cm.select(
        "a", "b", "c", "d", "n",
        F.expr("cast((a + d) * 1000000 div n as bigint)").alias("po_ppm"),
        F.expr(f"cast({pe_expr} * 1000000 div (n * n) as bigint)").alias("pe_ppm"),
        F.expr(
            f"cast((n * (a + d) - {pe_expr}) * 1000000"
            f" div (n * n - {pe_expr}) as bigint)"
        ).alias("kappa_ppm"),
    )
