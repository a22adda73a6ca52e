"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship daily-sync merge at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator inventory of
SURVEY.md §2 plus the training-data-pipeline extensions, each with a DuckDB
oracle twin (implementations in
etl_mssql_to_postgres_dailysync_spark/plans/driver_queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _configure(spark: SparkSession) -> SparkSession:
    """Pin the oracle-parity semantics on a driver-provided session."""
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # events.parquet has shipped as TIMESTAMP(NANOS) in some fixture
    # generations (read as long with this conf, converted in _t) and as
    # TIMESTAMP(MICROS)/NTZ in others (conf is then inert; _t casts to LTZ)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the daily-sync merge (upsert of a modified orders slice into
    an orders target) at sf0.001."""
    from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

    return QUERIES["merge_upsert"](_configure(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

    return {
        name: (lambda spark, sf_dir, _fn=fn: _fn(_configure(spark), sf_dir))
        for name, fn in QUERIES.items()
    }


def oracle_sql() -> dict[str, str]:
    from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import ORACLES

    return dict(ORACLES)
