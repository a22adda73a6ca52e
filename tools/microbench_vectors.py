"""Measure JVM fold vs Arrow pandas_udf for pairwise cosine scoring.

functions/similarity.py keeps cosine scoring in JVM expressions
(zip_with + aggregate) instead of a vectorized numpy pandas_udf. This tool
re-checks that decision on the actual workload shape (brute-force top-k:
|corpus| x |queries| score rows) so the choice is measured, not assumed.

Usage: python tools/microbench_vectors.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from etl_mssql_to_postgres_dailysync_spark.functions import similarity
from etl_mssql_to_postgres_dailysync_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark(app_name="microbench-vectors")
    spark.sparkContext.setLogLevel("ERROR")
    @pandas_udf("double")
    def cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        av = np.stack(a.values)
        bv = np.stack(b.values)
        num = (av * bv).sum(axis=1)
        den = np.sqrt((av * av).sum(axis=1)) * np.sqrt((bv * bv).sum(axis=1))
        return pd.Series(num / den)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(32).cache()
    emb.count()
    queries = emb.filter(F.col("vec_id") < n_q)

    def jvm():
        similarity.brute_force_topk(queries, emb, k=5).count()

    def arrow():
        q = queries.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
        c = emb.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("cv"))
        scored = c.join(F.broadcast(q)).filter("nid != qid").select(
            "qid", "nid", cosine_pandas(F.col("qv"), F.col("cv")).alias("sim")
        )
        from pyspark.sql import Window

        w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid").asc())
        scored.withColumn("r", F.row_number().over(w)).filter("r <= 5").count()

    for tag, fn in [("jvm_fold", jvm), ("pandas_udf", arrow)]:
        fn()  # warm
        t0 = time.time()
        for _ in range(3):
            fn()
        print(f"{tag}: {round((time.time() - t0) / 3, 3)} s/run")


if __name__ == "__main__":
    main()
