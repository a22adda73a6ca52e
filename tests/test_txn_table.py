"""TxnTable (sources/txn_table.py): ACID commit log over parquet.

Covers the guarantees the reference delegates to its target databases
(transaction + rollback, csv_to_mssqldb.py:447-466): atomic visibility,
optimistic concurrency, snapshot isolation / time travel, stats pruning,
compaction and vacuum."""

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_mssql_to_postgres_dailysync_spark.sources.txn_table import (
    ConcurrentWriteError,
    TxnTable,
    _version_path,
)


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


class TestCommitProtocol:
    def test_append_read_roundtrip(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        a = _orders(spark, sf_dir).filter(F.col("o_orderkey") % 2 == 0)
        b = _orders(spark, sf_dir).filter(F.col("o_orderkey") % 2 == 1)
        assert t.append(a) == 0
        assert t.append(b) == 1
        assert t.read().count() == _orders(spark, sf_dir).count()

    def test_overwrite_replaces(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        t.append(_orders(spark, sf_dir))
        small = _orders(spark, sf_dir).limit(10)
        t.overwrite(small)
        assert t.read().count() == 10

    def test_time_travel_and_history(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        t.append(_orders(spark, sf_dir).limit(5))
        t.append(_orders(spark, sf_dir).limit(7))
        t.overwrite(_orders(spark, sf_dir).limit(3))
        assert t.read(version=0).count() == 5
        assert t.read(version=1).count() == 12
        assert t.read().count() == 3
        assert [h["op"] for h in t.history()] == ["append", "append", "overwrite"]

    def test_append_retries_past_conflict(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        t.append(_orders(spark, sf_dir).limit(5))
        # another writer takes version 1 out from under us
        with open(_version_path(t.log, 1), "w") as f:
            json.dump({"version": 1, "op": "append", "actions": [], "schema": None,
                       "meta": {}}, f)
        v = t.append(_orders(spark, sf_dir).limit(5))
        assert v == 2 and t.read().count() == 10

    def test_read_modify_write_conflict_raises(self, spark, sf_dir, tdir):
        t1 = TxnTable(spark, tdir)
        t1.append(_orders(spark, sf_dir).limit(5))
        t2 = TxnTable(spark, tdir)
        snapshot_head = t2.version()
        t1.append(_orders(spark, sf_dir).limit(5))  # intervening commit
        live, _ = t2._snapshot(snapshot_head)
        actions = [{"remove": {"path": p}} for p in live]
        with pytest.raises(ConcurrentWriteError):
            t2._commit("overwrite", actions, snapshot_head + 1, None)


class TestMerge:
    def test_merge_upsert_semantics(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        base = _orders(spark, sf_dir).filter(F.col("o_orderkey") < 1000)
        t.append(base)
        src = (
            _orders(spark, sf_dir)
            .filter((F.col("o_orderkey") >= 500) & (F.col("o_orderkey") < 1500))
            .withColumn("o_orderstatus", F.lit("U"))
        )
        t.merge(src, ["o_orderkey"])
        out = t.read()
        expected = base.filter(F.col("o_orderkey") < 500).count() + src.count()
        assert out.count() == expected
        assert out.filter(F.col("o_orderkey") >= 500).filter(
            F.col("o_orderstatus") != "U"
        ).count() == 0


class TestPruningCompactVacuum:
    def test_stats_pruning_skips_files(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir, stats_cols=["o_orderkey"])
        df = _orders(spark, sf_dir).repartition(8)
        t.append(df, cluster_by=["o_orderkey"])
        all_files = t.files()
        pruned = t.files(prune=("o_orderkey", 0, 10))
        assert len(pruned) < len(all_files)
        assert t.read(prune=("o_orderkey", 0, 10)).filter(
            F.col("o_orderkey") <= 10
        ).count() == df.filter(F.col("o_orderkey") <= 10).count()

    def test_compact_preserves_data_and_history(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        t.append(_orders(spark, sf_dir).limit(20).repartition(4))
        t.append(_orders(spark, sf_dir).limit(40).repartition(4))
        n_before = t.read().count()
        files_before = len(t.files())
        t.compact()
        assert t.read().count() == n_before
        assert len(t.files()) < files_before
        assert t.read(version=1).count() == n_before  # time travel intact

    def test_vacuum_deletes_dead_files_only(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        t.append(_orders(spark, sf_dir).limit(20))
        t.overwrite(_orders(spark, sf_dir).limit(5))
        deleted = t.vacuum(retain_versions=0)
        assert deleted  # version-0 files are dead at head
        assert t.read().count() == 5
        for f in t.files():
            assert os.path.exists(os.path.join(t.path, f.path))

    def test_checkpoint_used_for_snapshot(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir, checkpoint_interval=3)
        for i in range(5):
            t.append(_orders(spark, sf_dir).limit(2))
        assert os.path.exists(_version_path(t.log, 3, checkpoint=True))
        assert t.read().count() == 10
        assert t.read(version=2).count() == 6


class TestChanges:
    def test_cdc_insert_update_delete(self, spark, sf_dir, tdir):
        from etl_mssql_to_postgres_dailysync_spark.sources.txn_table import table_changes

        t = TxnTable(spark, tdir)
        base = _orders(spark, sf_dir).filter(F.col("o_orderkey") < 100)
        t.append(base)  # v0
        src = (
            _orders(spark, sf_dir)
            .filter((F.col("o_orderkey") >= 50) & (F.col("o_orderkey") < 150))
            .withColumn("o_orderstatus", F.lit("U"))
        )
        t.merge(src, ["o_orderkey"])  # v1: updates 50-99, inserts 100-149
        t.overwrite(t.read().filter(F.col("o_orderkey") >= 25))  # v2: deletes < 25
        c01 = table_changes(t, 0, 1, ["o_orderkey"])
        by_type = {r["_change_type"]: r["n"] for r in
                   c01.groupBy("_change_type").agg(F.count(F.lit(1)).alias("n")).collect()}
        n_upd = base.filter((F.col("o_orderkey") >= 50) & (F.col("o_orderstatus") != "U")).count()
        assert by_type.get("insert", 0) == src.filter(F.col("o_orderkey") >= 100).count()
        assert by_type.get("update_postimage", 0) == n_upd
        assert "delete" not in by_type
        c12 = table_changes(t, 1, 2, ["o_orderkey"])
        assert {r["_change_type"] for r in c12.select("_change_type").distinct().collect()} == {"delete"}
        assert c12.count() == 25


class TestZOrder:
    def test_zorder_prunes_on_both_dimensions(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir, stats_cols=["o_orderkey", "o_custkey"])
        df = _orders(spark, sf_dir).repartition(16)
        t.append(df, zorder_by=["o_orderkey", "o_custkey"])
        n_all = len(t.files())
        lo_k = df.agg(F.min("o_orderkey")).first()[0]
        lo_c = df.agg(F.min("o_custkey")).first()[0]
        pruned_k = t.files(prune=("o_orderkey", lo_k, lo_k + 20))
        pruned_c = t.files(prune=("o_custkey", lo_c, lo_c + 20))
        # z-order keeps BOTH columns' per-file ranges tight: pruning works on each
        assert len(pruned_k) < n_all
        assert len(pruned_c) < n_all
        # and reads stay correct
        n = t.read(prune=("o_custkey", lo_c, lo_c + 20)).filter(
            (F.col("o_custkey") >= lo_c) & (F.col("o_custkey") <= lo_c + 20)
        ).count()
        assert n == df.filter(
            (F.col("o_custkey") >= lo_c) & (F.col("o_custkey") <= lo_c + 20)
        ).count()

    def test_cdc_preimage_rows(self, spark, sf_dir, tdir):
        from etl_mssql_to_postgres_dailysync_spark.sources.txn_table import table_changes

        t = TxnTable(spark, tdir)
        base = _orders(spark, sf_dir).filter(F.col("o_orderkey") < 50)
        t.append(base)
        t.merge(base.withColumn("o_orderstatus", F.lit("U")), ["o_orderkey"])
        ch = table_changes(t, 0, 1, ["o_orderkey"], include_preimage=True)
        n_changed = base.filter(F.col("o_orderstatus") != "U").count()
        pre = ch.filter(F.col("_change_type") == "update_preimage")
        post = ch.filter(F.col("_change_type") == "update_postimage")
        assert pre.count() == n_changed and post.count() == n_changed
        # pre-images carry the OLD values, post-images the new
        assert pre.filter(F.col("o_orderstatus") == "U").count() == 0
        assert post.filter(F.col("o_orderstatus") != "U").count() == 0


class TestFileGranularMerge:
    def test_merge_rewrites_only_overlapping_files(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir, stats_cols=["o_orderkey"])
        df = _orders(spark, sf_dir).repartition(8)
        t.append(df, cluster_by=["o_orderkey"])
        files_before = {f.path for f in t.files()}
        lo = df.agg(F.min("o_orderkey")).first()[0]
        src = (
            df.filter(F.col("o_orderkey").between(lo, lo + 30))
            .withColumn("o_orderstatus", F.lit("U"))
        )
        t.merge(src, ["o_orderkey"], cluster_by=["o_orderkey"], prune_col="o_orderkey")
        files_after = {f.path for f in t.files()}
        kept = files_before & files_after
        # most files survive byte-identical (still referenced, never rewritten)
        assert kept, "no files kept — merge rewrote everything"
        assert files_before - files_after, "no files rewritten"
        meta = t.history()[-1]["meta"]
        assert meta["files_kept"] == len(kept)
        # and the merged state is correct: updates applied, row count unchanged
        out = t.read()
        assert out.count() == df.count()
        assert out.filter(F.col("o_orderkey").between(lo, lo + 30)).filter(
            F.col("o_orderstatus") != "U"
        ).count() == 0

    def test_pruned_merge_into_untouched_range_inserts(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir, stats_cols=["o_orderkey"])
        base = _orders(spark, sf_dir).filter(F.col("o_orderkey") < 500).repartition(4)
        t.append(base, cluster_by=["o_orderkey"])
        newrows = _orders(spark, sf_dir).filter(
            (F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 1100)
        )
        t.merge(newrows, ["o_orderkey"], prune_col="o_orderkey")
        assert t.read().count() == base.count() + newrows.count()


class TestSchemaEvolution:
    def test_merge_schema_widens_and_backfills_null(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        base = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice").limit(10)
        t.append(base)
        widened = (
            _orders(spark, sf_dir)
            .select("o_orderkey", "o_totalprice")
            .filter(F.col("o_orderkey") >= 1000)
            .limit(5)
            .withColumn("channel", F.lit("web"))
        )
        with pytest.raises(ValueError, match="merge_schema"):
            t.append(widened)
        t.append(widened, merge_schema=True)
        out = t.read()
        assert out.columns == ["o_orderkey", "o_totalprice", "channel"]
        assert out.count() == 15
        assert out.filter(F.col("channel").isNull()).count() == 10
        # time travel sees the OLD schema
        assert t.read(version=0).columns == ["o_orderkey", "o_totalprice"]

    def test_column_removal_always_rejected(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        t.append(_orders(spark, sf_dir).select("o_orderkey", "o_totalprice").limit(5))
        with pytest.raises(ValueError, match="removes"):
            t.append(_orders(spark, sf_dir).select("o_orderkey").limit(5),
                     merge_schema=True)


class TestPartitionLayout:
    def test_partitioned_append_records_values_and_roundtrips(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        orders = _orders(spark, sf_dir).limit(200).withColumn(
            "status", F.col("o_orderstatus")
        )
        t.append(orders, partition_by=["status"])
        assert t.partition_spec() == ["status"]
        fs = t.files()
        assert all(f.partition_values and "status" in f.partition_values for f in fs)
        got = t.read()
        # partition column is re-attached from log metadata with its type
        assert got.schema["status"].dataType.simpleString() == "string"
        assert got.count() == 200
        assert (
            got.groupBy("status").count().orderBy("status").collect()
            == orders.groupBy("status").count().orderBy("status").collect()
        )

    def test_partition_pruning_exact(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        orders = _orders(spark, sf_dir).limit(500).withColumn(
            "status", F.col("o_orderstatus")
        )
        t.append(orders, partition_by=["status"])
        all_files = t.files()
        pruned = t.files(prune=("status", "F", "F"))
        assert 0 < len(pruned) < len(all_files)
        assert all(f.partition_values["status"] == "F" for f in pruned)
        got = t.read(prune=("status", "F", "F"))
        assert got.count() == orders.filter(F.col("status") == "F").count()

    def test_partition_spec_evolution_mixed_read(self, spark, sf_dir, tdir):
        """Iceberg-style spec evolution: commit 0 unpartitioned, commit 1
        partitioned; old files keep their layout, reads union both, and the
        implicit spec applies to later appends that don't re-declare it."""
        t = TxnTable(spark, tdir)
        orders = _orders(spark, sf_dir).limit(300).withColumn(
            "status", F.col("o_orderstatus")
        )
        a = orders.filter(F.col("o_orderkey") % 3 == 0)
        b = orders.filter(F.col("o_orderkey") % 3 == 1)
        c = orders.filter(F.col("o_orderkey") % 3 == 2)
        t.append(a)                                 # unpartitioned
        assert t.partition_spec() == []
        t.append(b, partition_by=["status"])        # evolve
        t.append(c)                                 # inherits evolved spec
        assert t.partition_spec() == ["status"]
        spec_of = {f.path: f.partition_values for f in t.files()}
        assert any(v is None for v in spec_of.values())        # old layout
        assert any(v is not None for v in spec_of.values())    # new layout
        assert t.read().count() == 300
        # pruning still prunes new-layout files and keeps old (no metadata)
        pruned = {f.path for f in t.files(prune=("status", "F", "F"))}
        for path, pv in spec_of.items():
            if pv is None:
                assert path in pruned  # unprunable -> must read
            elif pv["status"] != "F":
                assert path not in pruned

    def test_partitioned_merge_preserves_layout(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        orders = _orders(spark, sf_dir).limit(100).withColumn(
            "status", F.col("o_orderstatus")
        )
        t.append(orders, partition_by=["status"])
        delta = orders.limit(10).withColumn("o_totalprice", F.lit(0.0))
        t.merge(delta, keys=["o_orderkey"])
        assert t.read().count() == 100
        assert t.read().filter(F.col("o_totalprice") == 0.0).count() == 10
        # rewrite kept hive layout: every live file still has partition values
        assert all(f.partition_values is not None for f in t.files())


class TestBucketLayout:
    def test_bucketed_append_records_bucket_ids(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        orders = _orders(spark, sf_dir).limit(400)
        t.append(orders, bucket_by={"col": "o_orderkey", "n": 8})
        assert t.bucket_spec() == {"col": "o_orderkey", "n": 8}
        fs = t.files()
        assert {f.bucket for f in fs} <= set(range(8))
        assert len(fs) > 1
        assert t.read().count() == 400

    def test_bucket_ids_match_spark_hash_partitioning(self, spark, sf_dir, tdir):
        """File bucket id == pmod(murmur3(key), n) for every row it holds —
        the invariant bucket-pruned merge relies on."""
        t = TxnTable(spark, tdir)
        orders = _orders(spark, sf_dir).limit(400)
        n = 8
        t.append(orders, bucket_by={"col": "o_orderkey", "n": n})
        for f in t.files():
            df = spark.read.parquet(os.path.join(t.path, f.path))
            ids = {
                r[0]
                for r in df.select(
                    F.pmod(F.hash(F.col("o_orderkey")), F.lit(n))
                ).distinct().collect()
            }
            assert ids <= {f.bucket}

    def test_bucket_pruned_merge_rewrites_only_touched_buckets(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        orders = _orders(spark, sf_dir).limit(1000)
        t.append(orders, bucket_by={"col": "o_orderkey", "n": 8})
        n_files = len(t.files())
        keys = [r[0] for r in orders.select("o_orderkey").limit(3).collect()]
        delta = orders.filter(F.col("o_orderkey").isin(keys)).withColumn(
            "o_totalprice", F.lit(-1.0)
        )
        t.merge(delta, keys=["o_orderkey"])
        meta = t.history()[-1]["meta"]
        assert meta["files_rewritten"] < n_files
        assert meta["files_kept"] > 0
        got = t.read()
        assert got.count() == 1000
        assert got.filter(F.col("o_totalprice") == -1.0).count() == 3
        # result identical to an unpruned merge on a twin table
        assert t.read().filter(F.col("o_orderkey").isin(keys)).count() == 3

    def test_pre_bucket_files_always_rewritten(self, spark, sf_dir, tdir):
        """Files from before the bucket spec have no bucket metadata and must
        be included in every bucket-pruned merge."""
        t = TxnTable(spark, tdir)
        orders = _orders(spark, sf_dir).limit(200)
        a = orders.filter(F.col("o_orderkey") % 2 == 0)
        b = orders.filter(F.col("o_orderkey") % 2 == 1)
        t.append(a)                                        # unbucketed
        t.append(b, bucket_by={"col": "o_orderkey", "n": 4})
        one = orders.limit(1).withColumn("o_totalprice", F.lit(-2.0))
        t.merge(one, keys=["o_orderkey"])
        got = t.read()
        assert got.count() == 200
        assert got.filter(F.col("o_totalprice") == -2.0).count() == 1

    def test_compact_preserves_bucket_layout(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        orders = _orders(spark, sf_dir).limit(300)
        t.append(orders, bucket_by={"col": "o_orderkey", "n": 4})
        t.append(orders.limit(0), bucket_by={"col": "o_orderkey", "n": 4})
        t.compact()
        fs = t.files()
        assert all(f.bucket is not None for f in fs)
        assert t.read().count() == 300
        assert t.bucket_spec() == {"col": "o_orderkey", "n": 4}


class TestMetadataViews:
    def test_files_df_and_history_df(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir, stats_cols=["o_orderkey"])
        orders = _orders(spark, sf_dir).limit(100)
        t.append(orders, bucket_by={"col": "o_orderkey", "n": 4})
        t.merge(orders.limit(5).withColumn("o_totalprice", F.lit(0.0)), ["o_orderkey"])
        fdf = t.files_df()
        assert fdf.agg(F.sum("rows")).first()[0] == 100
        assert fdf.filter(F.col("bucket").isNull()).count() == 0
        assert fdf.filter(F.col("stats").contains("o_orderkey")).count() == fdf.count()
        hdf = t.history_df()
        assert [r["op"] for r in hdf.orderBy("version").collect()] == ["append", "merge"]
        # time travel on the manifest too
        assert t.files_df(version=0).count() >= 1

    def test_compact_by_target_size_uses_manifest_bytes(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        for i in range(4):
            t.append(_orders(spark, sf_dir).limit(200))
        live_bytes = sum(
            os.path.getsize(os.path.join(t.path, f.path)) for f in t.files()
        )
        # tiny target -> several output files; huge target -> one file
        t.compact(target_mb=max(1, live_bytes // (1024 * 1024)) if live_bytes > 2**20 else 1)
        assert t.read().count() == 800
        t.compact(target_mb=10_000)
        assert len(t.files()) == 1
        assert t.read().count() == 800

    def test_specs_survive_log_checkpoint(self, spark, sf_dir, tdir):
        """Partition/bucket specs live in commit props; snapshot replay that
        starts from a checkpoint must still see them."""
        t = TxnTable(spark, tdir, checkpoint_interval=5)
        orders = _orders(spark, sf_dir).limit(40).withColumn(
            "status", F.col("o_orderstatus")
        )
        t.append(orders, partition_by=["status"])
        for _ in range(7):  # crosses the interval-5 checkpoint
            t.append(orders.limit(5))
        assert os.path.exists(_version_path(t.log, 5, checkpoint=True))
        assert t.partition_spec() == ["status"]
        assert t.read().count() == 40 + 35
        # partition column still reconstructed for checkpoint-era files
        assert t.read().filter(F.col("status").isNull()).count() == 0


class TestTimestampTravel:
    def test_read_as_of_timestamp(self, spark, sf_dir, tdir):
        import time

        t = TxnTable(spark, tdir)
        t.append(_orders(spark, sf_dir).limit(5))
        t1 = time.time()
        time.sleep(0.02)
        t.append(_orders(spark, sf_dir).limit(7))
        t2 = time.time()
        assert t.version_at(t1) == 0
        assert t.version_at(t2) == 1
        assert t.read_as_of(t1).count() == 5
        assert t.read_as_of(t2).count() == 12
        with pytest.raises(ValueError):
            t.read_as_of(t1 - 3600)


class TestDelete:
    def test_delete_is_file_granular_and_time_travels(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir, stats_cols=["o_orderkey"])
        orders = _orders(spark, sf_dir).limit(1000)
        # cluster so the delete range concentrates in few files
        t.append(orders, cluster_by=["o_orderkey"])
        n_files = len(t.files())
        keys = [r[0] for r in orders.orderBy("o_orderkey").limit(5).collect()]
        v = t.delete(F.col("o_orderkey").isin(keys))
        meta = t.history()[-1]["meta"]
        assert meta["files_rewritten"] < n_files and meta["files_kept"] > 0
        assert t.read().count() == 1000 - 5
        assert t.read().filter(F.col("o_orderkey").isin(keys)).count() == 0
        # time travel still sees the deleted rows
        assert t.read(version=v - 1).count() == 1000
        # physical erasure at vacuum
        deleted = t.vacuum()
        assert len(deleted) > 0

    def test_delete_no_match_is_noop(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        t.append(_orders(spark, sf_dir).limit(50))
        v = t.version()
        assert t.delete(F.col("o_orderkey") < 0) == v
        assert t.version() == v

    def test_delete_preserves_partition_layout(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        orders = _orders(spark, sf_dir).limit(200).withColumn(
            "status", F.col("o_orderstatus")
        )
        t.append(orders, partition_by=["status"])
        t.delete(F.col("status") == "F")
        got = t.read()
        assert got.filter(F.col("status") == "F").count() == 0
        assert got.count() == orders.filter(F.col("status") != "F").count()
        assert all(f.partition_values is not None for f in t.files())


class TestUpdate:
    def test_update_is_file_granular_and_type_stable(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        orders = _orders(spark, sf_dir).limit(1000)
        t.append(orders, cluster_by=["o_orderkey"])
        n_files = len(t.files())
        keys = [r[0] for r in orders.orderBy("o_orderkey").limit(5).collect()]
        t.update(F.col("o_orderkey").isin(keys),
                 {"o_orderpriority": F.lit("REDACTED"), "o_totalprice": 0})
        meta = t.history()[-1]["meta"]
        assert meta["files_rewritten"] < n_files and meta["files_kept"] > 0
        got = t.read()
        assert got.count() == 1000  # UPDATE never changes cardinality
        hit = got.filter(F.col("o_orderkey").isin(keys))
        assert hit.filter((F.col("o_orderpriority") == "REDACTED")
                          & (F.col("o_totalprice") == 0)).count() == 5
        # untouched rows keep their values, schema is invariant
        assert got.filter(F.col("o_orderpriority") == "REDACTED").count() == 5
        assert dict(got.dtypes) == dict(orders.dtypes)

    def test_update_unknown_column_raises(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        t.append(_orders(spark, sf_dir).limit(10))
        with pytest.raises(ValueError, match="unknown columns"):
            t.update(F.lit(True), {"nope": 1})

    def test_update_no_match_is_noop(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        t.append(_orders(spark, sf_dir).limit(50))
        v = t.version()
        assert t.update(F.col("o_orderkey") < 0, {"o_orderpriority": "x"}) == v


class TestRestore:
    def test_restore_is_metadata_only_and_travelable(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        orders = _orders(spark, sf_dir)
        t.append(orders.limit(100))            # v0
        t.append(orders.limit(150).subtract(orders.limit(100)))  # v1
        t.delete(F.lit(True))                  # v2: empty table
        assert t.read().count() == 0
        n_data_files = len(t.files(version=1))
        v = t.restore(1)                       # v3
        assert t.read().count() == 150
        # pure metadata: restored snapshot reuses v1's physical files
        assert {f.path for f in t.files()} == {f.path for f in t.files(version=1)}
        assert len(t.files()) == n_data_files
        # the restore is itself a commit: travel back to the empty state
        assert t.read(version=v - 1).count() == 0
        # restoring a restore works
        t.restore(2)
        assert t.read().count() == 0

    def test_restore_resets_partition_spec(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        orders = _orders(spark, sf_dir).limit(200).withColumn(
            "status", F.col("o_orderstatus"))
        t.append(orders, partition_by=["status"])   # v0: partitioned
        t.overwrite(orders.drop("status"), partition_by=[])  # v1: spec dropped
        assert t.partition_spec() == []
        t.restore(0)
        assert t.partition_spec() == ["status"]
        assert t.read().count() == 200

    def test_restore_after_vacuum_raises(self, spark, sf_dir, tdir):
        t = TxnTable(spark, tdir)
        orders = _orders(spark, sf_dir)
        t.append(orders.limit(100))   # v0
        t.overwrite(orders.limit(20)) # v1 orphans v0's files
        t.vacuum()
        with pytest.raises(ValueError, match="vacuumed"):
            t.restore(0)


class TestCheckConstraints:
    def test_check_blocks_bad_append_atomically(self, spark, sf_dir, tdir):
        from etl_mssql_to_postgres_dailysync_spark.sources.txn_table import (
            ConstraintViolation,
        )
        t = TxnTable(spark, tdir)
        t.append(_orders(spark, sf_dir).limit(100))
        t.set_check("price_pos", "o_totalprice > 0")
        assert t.checks() == {"price_pos": "o_totalprice > 0"}
        v = t.version()
        bad = _orders(spark, sf_dir).limit(10).withColumn(
            "o_totalprice", F.lit(-1.0))
        with pytest.raises(ConstraintViolation, match="price_pos"):
            t.append(bad)
        # nothing committed, nothing visible
        assert t.version() == v
        assert t.read().filter(F.col("o_totalprice") < 0).count() == 0
        # good data still lands; NULL predicate passes (standard SQL CHECK)
        t.append(_orders(spark, sf_dir).limit(10).withColumn(
            "o_totalprice", F.lit(None).cast("double")))
        assert t.read().count() == 110

    def test_set_check_validates_existing_data(self, spark, sf_dir, tdir):
        from etl_mssql_to_postgres_dailysync_spark.sources.txn_table import (
            ConstraintViolation,
        )
        t = TxnTable(spark, tdir)
        t.append(_orders(spark, sf_dir).limit(100))
        with pytest.raises(ConstraintViolation):
            t.set_check("impossible", "o_orderkey < 0")
        assert t.checks() == {}

    def test_check_enforced_on_update_and_merge_and_droppable(
            self, spark, sf_dir, tdir):
        from etl_mssql_to_postgres_dailysync_spark.sources.txn_table import (
            ConstraintViolation,
        )
        t = TxnTable(spark, tdir)
        t.append(_orders(spark, sf_dir).limit(100))
        t.set_check("price_pos", "o_totalprice > 0")
        with pytest.raises(ConstraintViolation):
            t.update(F.col("o_orderkey") >= 0, {"o_totalprice": -5.0})
        src = _orders(spark, sf_dir).limit(5).withColumn(
            "o_totalprice", F.lit(-2.0))
        with pytest.raises(ConstraintViolation):
            t.merge(src, ["o_orderkey"])
        t.drop_check("price_pos")
        t.merge(src, ["o_orderkey"])  # now allowed
        assert t.read().filter(F.col("o_totalprice") == -2.0).count() == 5
