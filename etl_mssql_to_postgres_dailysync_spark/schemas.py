"""StructType registry.

Reference DDLs (SURVEY.md §1):
  - source ``dbo.orders``: mssql_init/mssql_init.sql:24-32
  - target ``orders`` / ``incomplete_orders``: postgres_init/init.sql:2-24
  - wide ``transactions`` schema: dags/__pycache__/deneme_3_case (bytecode)

Plus the driver testdata tables (/root/testdata/sf*/ — TPC-H-ish star schema).
Explicit schemas everywhere: never infer in production paths (inference is a
full extra scan and non-deterministic under dirty data).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference: orders (mssql_init/mssql_init.sql:24-32) -------------------
# Money is DecimalType(18,4) per source DDL (not double): exact arithmetic.
ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("OrderID", T.LongType()),
        T.StructField("UserID", T.LongType()),
        T.StructField("AddedToCartAt", T.TimestampNTZType()),
        T.StructField("OrderCreatedAt", T.TimestampNTZType()),
        T.StructField("Amount", T.DecimalType(18, 4)),
        T.StructField("Product", T.StringType()),
        T.StructField("IsDelivered", T.BooleanType()),
    ]
)

# Raw-CSV variant: all strings, for the coercion layer (csv_to_mssqldb.py:241-326).
ORDERS_RAW_SCHEMA = T.StructType(
    [T.StructField(f.name, T.StringType()) for f in ORDERS_SCHEMA.fields]
)

# incomplete_orders = orders + audit column (postgres_init/init.sql:15-24)
INCOMPLETE_ORDERS_SCHEMA = T.StructType(
    list(ORDERS_SCHEMA.fields)
    + [T.StructField("loaded_at_timestamp", T.TimestampNTZType())]
)

# --- reference: wide transactions schema (deneme_3_case / sync variants) ----
TRANSACTIONS_SCHEMA = T.StructType(
    [
        T.StructField("TxCorrelationId", T.StringType()),
        T.StructField("TenantId", T.LongType()),
        T.StructField("TxGroupCorrelationId", T.StringType()),
        T.StructField("TxRefCorrelationId", T.StringType()),
        T.StructField("WalletId", T.LongType()),
        T.StructField("ToWalletId", T.LongType()),
        T.StructField("FromAccountId", T.LongType()),
        T.StructField("ToAccountId", T.LongType()),
        T.StructField("TxBaseAmount", T.DecimalType(18, 4)),
        T.StructField("TxAdditionalFee", T.DecimalType(18, 4)),
        T.StructField("TxAmountWithAdditionalFee", T.DecimalType(18, 4)),
        T.StructField("ToAccountTxBaseAmount", T.DecimalType(18, 4)),
        T.StructField("ToAccountTxAdditionalFee", T.DecimalType(18, 4)),
        T.StructField("ToAccountTxAmountWithAdditionalFee", T.DecimalType(18, 4)),
        T.StructField("CreatedDateUtc", T.TimestampNTZType()),
        T.StructField("UpdatedDateUtc", T.TimestampNTZType()),
        T.StructField("CompletedDateUtc", T.TimestampNTZType()),
        T.StructField("FinancialProcessCompletedDateUtc", T.TimestampNTZType()),
        T.StructField("SummaryCreatedDateUtc", T.TimestampNTZType()),
        T.StructField("IsFinancialProcessCompleted", T.BooleanType()),
        T.StructField("IsNeedSettlement", T.BooleanType()),
        T.StructField("IsAdjustLimitSuccessProcessed", T.BooleanType()),
        T.StructField("IsAdjustLimitCancelProcessed", T.BooleanType()),
        T.StructField("IsHidden", T.BooleanType()),
        T.StructField("IsHiddenForReceiver", T.BooleanType()),
        T.StructField("IsHiddenForSender", T.BooleanType()),
        T.StructField("TransactionTypeCode", T.IntegerType()),
        T.StructField("TransactionStatusCode", T.IntegerType()),
        T.StructField("ResultCode", T.StringType()),
        T.StructField("SettlementDay", T.IntegerType()),
        T.StructField("SettlementTypeId", T.IntegerType()),
    ]
)

# Composite conflict key of the sync variant (mssql_to_postgres_sync pyc).
TRANSACTIONS_SYNC_KEYS = [
    "TxCorrelationId",
    "TenantId",
    "TxGroupCorrelationId",
    "TxRefCorrelationId",
]

# --- driver testdata (/root/testdata/sf*/, TESTDATA.md) ---------------------
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_testdata(spark, sf_dir: str, names: list[str] | None = None):
    """Read testdata parquet tables -> dict[name, DataFrame].

    Parquet keeps its own schema; Catalyst prunes columns + pushes filters
    into the scan, so a plain read here is the scale-correct choice.
    """
    return {
        name: spark.read.parquet(f"{sf_dir}/{name}.parquet")
        for name in (names or TESTDATA_TABLES)
    }


def register_views(spark, sf_dir: str, names: list[str] | None = None) -> None:
    """Register the testdata tables as temp views so the whole engine surface
    is reachable from plain ``spark.sql(...)`` — a user of the reference who
    works in SQL keeps working in SQL. Views are lazy scans: Catalyst still
    prunes columns and pushes filters per query; events.ts is normalized the
    same way the DataFrame entry points do (plans/driver_queries._t)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    for name in names or TESTDATA_TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            t = df.schema["ts"].dataType
            if isinstance(t, LongType):
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            elif isinstance(t, TimestampNTZType):
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        df.createOrReplaceTempView(name)
