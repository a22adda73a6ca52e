from etl_mssql_to_postgres_dailysync_spark.sources import readers, writers, fake_data

__all__ = ["readers", "writers", "fake_data"]
