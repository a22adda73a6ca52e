"""SparkSession factory.

The reference engine's coercion semantics are pandas ``errors='coerce'``
(malformed -> NULL, csv_to_mssqldb.py:241-326), i.e. Spark's *non-ANSI* cast
mode; its timestamps are timezone-less (tz explicitly stripped,
dags/mssql_to_postgresql_orders_daily.py:271-275), i.e. a pinned-UTC session.

Scale posture: AQE on (runtime re-plan, skew-join splitting, partition
coalescing) so the same declarative plans survive a 1000-executor cluster;
shuffle partitions default to local core count and are expected to be raised
to ~2-3x total cluster cores in a real deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl-mssql-to-postgres-dailysync-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults are chosen for oracle-comparable semantics and scale:
      - ``spark.sql.ansi.enabled=false``: casts null-out instead of raising,
        matching the reference's ``errors='coerce'`` paths.
      - ``spark.sql.session.timeZone=UTC``: tz-naive timestamp semantics.
      - AQE + skew join handling on: runtime shuffle-partition coalescing and
        skew splitting replace hand-tuned chunk sizes
        (MSSQL_EXTRACT_CHUNKSIZE etc. in the reference).
      - Arrow on: any Pandas-UDF path is batch-vectorized.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark only reads
        # nanos as long — sources.readers.read_parquet converts back to micros
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
