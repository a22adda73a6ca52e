from etl_mssql_to_postgres_dailysync_spark.operators.merge import merge, MergeResult
from etl_mssql_to_postgres_dailysync_spark.operators import coerce, filters, project, validate

__all__ = ["merge", "MergeResult", "coerce", "filters", "project", "validate"]
