from etl_mssql_to_postgres_dailysync_spark.functions import (
    dedup,
    hashing,
    multimodal,
    similarity,
    text,
    vectors,
)

__all__ = ["dedup", "hashing", "multimodal", "similarity", "text", "vectors"]
