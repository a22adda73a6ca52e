"""SCD Type-2 interval builder: semantics + invariants (operators/scd.py).

The reference's daily sync is Type-1 (overwrite); SCD2 is the historical
counterpart a warehouse consumer builds on top of the same change feed.
Invariants pinned here:
  - consecutive equal attribute values collapse into one interval
  - intervals per key tile [first_ts, inf): no gaps, no overlaps
  - exactly one open (is_current) interval per key, version ordinals dense
  - last-writer-wins pick inside one (key, ts) cell is deterministic
  - point-in-time join retrieves exactly the covering interval
"""

from datetime import date

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_mssql_to_postgres_dailysync_spark.operators.scd import (
    point_in_time_join,
    scd2_from_events,
)


@pytest.fixture(scope="module")
def feed(spark):
    rows = [
        # key A: P1 -> P1 (no change) -> P2 -> P1
        Row(k="A", d=date(2024, 1, 1), attr="P1", seq=1),
        Row(k="A", d=date(2024, 1, 5), attr="P1", seq=2),
        Row(k="A", d=date(2024, 2, 1), attr="P2", seq=3),
        Row(k="A", d=date(2024, 3, 1), attr="P1", seq=4),
        # key B: duplicate events on one day — seq=11 must win the cell
        Row(k="B", d=date(2024, 1, 2), attr="X", seq=10),
        Row(k="B", d=date(2024, 1, 2), attr="Y", seq=11),
        # key C: single event, stays open
        Row(k="C", d=date(2024, 6, 1), attr="Z", seq=20),
    ]
    return rows


def _dim(spark, feed):
    df = spark.createDataFrame(feed)
    return scd2_from_events(
        df, keys=["k"], ts_col="d", attr_cols=["attr"], pick_col="seq"
    )


def test_consecutive_equal_values_collapse(spark, feed):
    out = {(r["k"], r["version"]): r for r in _dim(spark, feed).collect()}
    a = [out[("A", v)] for v in (1, 2, 3)]
    assert [r["attr"] for r in a] == ["P1", "P2", "P1"]
    # the no-change Jan 5 event must NOT open a new interval
    assert a[0]["valid_from"] == date(2024, 1, 1)
    assert a[0]["valid_to"] == date(2024, 2, 1)
    assert ("A", 4) not in out


def test_intervals_tile_without_gaps_or_overlaps(spark, feed):
    rows = sorted(
        _dim(spark, feed).collect(), key=lambda r: (r["k"], r["version"])
    )
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)
    for k, ivs in by_key.items():
        assert [r["version"] for r in ivs] == list(range(1, len(ivs) + 1))
        opens = [r for r in ivs if r["is_current"]]
        assert len(opens) == 1 and opens[0] is ivs[-1]
        assert ivs[-1]["valid_to"] is None
        for prev, nxt in zip(ivs, ivs[1:]):
            assert prev["valid_to"] == nxt["valid_from"]  # no gap, no overlap


def test_last_writer_wins_is_deterministic(spark, feed):
    out = [r for r in _dim(spark, feed).collect() if r["k"] == "B"]
    assert len(out) == 1
    assert out[0]["attr"] == "Y"  # seq=11 beats seq=10 in the same cell


def test_point_in_time_join_covers(spark, feed):
    dim = _dim(spark, feed)
    facts = spark.createDataFrame(
        [
            Row(k="A", ft=date(2024, 1, 20)),   # inside v1
            Row(k="A", ft=date(2024, 2, 1)),    # boundary: v2 starts (closed left)
            Row(k="A", ft=date(2025, 1, 1)),    # open interval v3
            Row(k="C", ft=date(2024, 1, 1)),    # before first interval -> no match
        ]
    )
    out = {
        (r["k"], r["ft"]): r
        for r in point_in_time_join(facts, dim, keys=["k"], fact_ts="ft").collect()
    }
    assert out[("A", date(2024, 1, 20))]["version"] == 1
    assert out[("A", date(2024, 2, 1))]["version"] == 2
    assert out[("A", date(2025, 1, 1))]["version"] == 3
    assert out[("C", date(2024, 1, 1))]["version"] is None


def test_multi_attribute_change_detection(spark):
    df = spark.createDataFrame(
        [
            Row(k="A", d=date(2024, 1, 1), a1="x", a2=1),
            Row(k="A", d=date(2024, 1, 2), a1="x", a2=2),  # a2 changed
            Row(k="A", d=date(2024, 1, 3), a1="y", a2=2),  # a1 changed
            Row(k="A", d=date(2024, 1, 4), a1="y", a2=2),  # nothing changed
        ]
    )
    out = scd2_from_events(df, keys=["k"], ts_col="d", attr_cols=["a1", "a2"])
    assert out.count() == 3


def test_null_attribute_transitions_are_null_safe(spark):
    df = spark.createDataFrame(
        [
            Row(k="A", d=date(2024, 1, 1), attr=None),
            Row(k="A", d=date(2024, 1, 2), attr=None),   # NULL==NULL: no change
            Row(k="A", d=date(2024, 1, 3), attr="v"),    # NULL->v: change
            Row(k="A", d=date(2024, 1, 4), attr=None),   # v->NULL: change
        ],
        "k string, d date, attr string",
    )
    out = scd2_from_events(df, keys=["k"], ts_col="d", attr_cols=["attr"])
    assert out.count() == 3


def test_windows_partition_by_key_never_global(spark, feed):
    """Scale posture: every window in the SCD2 plan partitions by the
    dimension key — a data-grain global window here would serialize the
    whole feed through one task at 100 TB."""
    plan = _dim(spark, feed)._jdf.queryExecution().executedPlan().toString()
    for line in plan.split("\n"):
        if "Window" in line and "windowspecdefinition" in line.lower():
            assert "k#" in line  # partition spec includes the key
