"""Similarity search over embedding columns (``array<float>``).

Two tiers:
  * ``brute_force_topk`` — exact cosine top-k. Queries broadcast against the
    corpus (map-side), so the big side never shuffles; per-query top-k via a
    window. Baseline and oracle-comparable.
  * ``lsh_bucketed_topk`` — the scale path: sign-bucket LSH (one bucket id
    per vector from the signs of the leading dimensions), equi-join on
    bucket, top-k within bucket. Shuffle is (bucket, vector) instead of a
    full cross join; recall trades off with bucket bits. Deterministic and
    SQL-expressible, unlike a trained IVF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_mssql_to_postgres_dailysync_spark.functions.vectors import cosine_rounded


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (excluding self).

    ``broadcast(queries)`` keeps the corpus scan shuffle-free; the only
    shuffle is the per-query top-k window over k*|queries| candidate rows
    (tiny). Ties break by neighbor id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_rounded(F.col("qv"), F.col("cv")).alias("sim"),
        )
    )
    return _topk_per_query(scored, k)


def sign_bucket(vec, bits: int = 6):
    """LSH bucket id from the signs of the first ``bits`` dimensions:
    bucket = sum_j 2^j * [v[j] > 0]. Cheap, deterministic, oracle-friendly.
    Statically unrolled (bit positions are Python ints)."""
    terms = [
        F.when(F.element_at(vec, j + 1) > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for j in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-bucket.

    At 100 TB the corpus is hash-partitioned (or bucketed on disk) by the
    bucket id, so each query touches one partition's worth of candidates —
    the cross join collapses to an equi-join on bucket.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_rounded(F.col("qv"), F.col("cv")).alias("sim"),
        )
    )
    return _topk_per_query(scored, k)
