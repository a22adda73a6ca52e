"""Bucketed-table co-located join: the storage-level shuffle eliminator.

At 100 TB, a fact-fact join (orders ⋈ lineitem on orderkey) shuffles both
tables every query unless they are stored bucketed on the join key — then
each bucket pair joins in place with NO exchange. This test writes both
sides bucketed and asserts the join plan is exchange-free on the bucketed
sides.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def warehouse(spark):
    d = tempfile.mkdtemp(prefix="spark_bucket_test_")
    yield d
    for t in ("orders_b", "lineitem_b"):
        try:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        except Exception:
            pass
    shutil.rmtree(d, ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, warehouse):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", f"{warehouse}/orders_b").saveAsTable("orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", f"{warehouse}/lineitem_b").saveAsTable("lineitem_b")
    )
    ob = spark.table("orders_b")
    lb = spark.table("lineitem_b")
    joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).groupBy("o_orderpriority").agg(
        F.sum("l_quantity").alias("q")
    )
    # at sf0.001 Spark would broadcast instead; disable it so the test shows
    # the bucketed sort-merge path a fact-fact join takes at scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined.collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join reads bucketed data in place: no exchange on either join key
    # (the one remaining exchange is the group-by on o_orderpriority)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
    assert "Bucketed: true" in plan, plan

    # same result as the unbucketed join
    expected = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderpriority").agg(F.sum("l_quantity").alias("q"))
    )
    got = {r["o_orderpriority"]: r["q"] for r in joined.collect()}
    want = {r["o_orderpriority"]: r["q"] for r in expected.collect()}
    assert got == want
