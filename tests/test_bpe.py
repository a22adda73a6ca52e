"""BPE merge-training contracts (functions/bpe.py).

Oracle hash-parity cannot catch a semantics bug implemented identically on
both engines (the r5 HLL lesson), so the distributed trainer is pinned to
an independent pure-Python greedy-BPE replication, plus mathematical
contracts: greedy left-to-right non-overlap, and non-increasing winning
pair counts (any pair created by a merge has count <= the fused pair's).
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_mssql_to_postgres_dailysync_spark.functions import bpe, text


def _vocab(spark, word_counts: dict[str, int]):
    return spark.createDataFrame(
        [(w, c) for w, c in word_counts.items()], "word string, wc long"
    )


def test_greedy_left_to_right_non_overlap(spark):
    # 'aaa' holds pairs (a,a) twice but greedy fuses only the leftmost:
    # first merge count is 2, and the survivor sequence is 'aa a', so the
    # second round's winner is (aa, a) with count 1.
    merges = bpe.train_merges(spark, _vocab(spark, {"aaa": 1}), 2).collect()
    assert [(r.step, r.x, r.y, r.cnt) for r in merges] == [
        (1, "a", "a", 2),
        (2, "aa", "a", 1),
    ]


def test_chain_merge_fences(spark):
    # 'abab' -> (a,b) twice; the shared-fence replace must fuse BOTH
    # occurrences even though they are separated by a single fence.
    merges = bpe.train_merges(spark, _vocab(spark, {"abab": 1}), 2).collect()
    assert (merges[0].x, merges[0].y, merges[0].cnt) == ("a", "b", 2)
    assert (merges[1].x, merges[1].y, merges[1].cnt) == ("ab", "ab", 1)


def test_tiebreak_is_pair_string_ascending(spark):
    # cd and ce tie at count 2; 'c d' < 'c e' so (c,d) must win round 1.
    merges = bpe.train_merges(
        spark, _vocab(spark, {"cd": 2, "ce": 2}), 1
    ).collect()
    assert (merges[0].x, merges[0].y) == ("c", "d")


def test_early_stop_when_no_pairs(spark):
    merges = bpe.train_merges(spark, _vocab(spark, {"a": 5, "b": 3}), 4).collect()
    assert merges == []


def test_matches_pure_python_on_fixture(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.length(F.trim(F.col("text"))) > 0)
    )
    wc_rows = (
        docs.select(F.explode(text.tokens(text.normalize(F.col("text")))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
        .collect()
    )
    word_counts = {r["w"]: r["count"] for r in wc_rows}
    expected = bpe.train_merges_py(word_counts, 8)
    got = [
        (r.step, r.x, r.y, r.merged, r.cnt)
        for r in bpe.train_merges(spark, _vocab(spark, word_counts), 8).collect()
    ]
    assert got == expected
    # mathematical contract: winning counts never increase (a merge can
    # only create pairs whose count is bounded by the fused pair's count)
    cnts = [c for *_, c in got]
    assert cnts == sorted(cnts, reverse=True)
    assert len(got) == 8
