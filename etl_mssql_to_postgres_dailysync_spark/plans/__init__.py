from etl_mssql_to_postgres_dailysync_spark.plans.daily_sync import (
    backfill,
    daily_sync,
    DailySyncResult,
)

__all__ = ["backfill", "daily_sync", "DailySyncResult"]
