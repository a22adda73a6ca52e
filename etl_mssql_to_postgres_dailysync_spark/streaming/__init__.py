from etl_mssql_to_postgres_dailysync_spark.streaming import runner

__all__ = ["runner"]
