"""Property-based checks of the MERGE family against a pure-Python model.

The merge operator is the engine's core (S6-S8); these properties hold for
ANY input, not just the fixtures: hypothesis generates adversarial batches
(duplicate keys, conflicting versions, disjoint/overlapping key sets) and the
Spark result must equal an obviously-correct dict-based reference model.
Examples are kept small (Spark job per example) but unconstrained in shape.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from etl_mssql_to_postgres_dailysync_spark.operators.merge import merge

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),    # key (small domain -> collisions)
        st.integers(min_value=-100, max_value=100),  # val
        st.integers(min_value=0, max_value=9),    # ver
    ),
    max_size=12,
)


def model_merge(target, source, guard_ver=False):
    """Reference semantics: source deduped last-wins by (ver, then arbitrary
    but deterministic order — we sort), matched rows updated (optionally only
    when src.ver > tgt.ver), unmatched inserted."""
    dedup = {}
    for k, v, ver in source:
        if k not in dedup or ver >= dedup[k][2]:
            if k in dedup and ver == dedup[k][2]:
                # last-wins tie: highest (ver, val) deterministic pick
                dedup[k] = max(dedup[k], (k, v, ver), key=lambda r: (r[2], r[1]))
            else:
                dedup[k] = (k, v, ver)
    out = {}
    for k, v, ver in target:
        out[k] = (k, v, ver)
    for k, row in dedup.items():
        if k in out:
            if not guard_ver or row[2] > out[k][2]:
                out[k] = row
        else:
            out[k] = row
    return sorted(out.values())


def spark_rows(spark, rows):
    if not rows:
        return spark.createDataFrame([], "k int, v int, ver int")
    return spark.createDataFrame(rows, "k int, v int, ver int")


@pytest.mark.parametrize("guard", [False, True])
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(target=ROWS, source=ROWS)
def test_merge_matches_model(spark, guard, target, source):
    # target must be key-unique (it's a merged table by invariant)
    target = list({k: (k, v, r) for k, v, r in target}.values())
    t = spark_rows(spark, target)
    s = spark_rows(spark, source)
    kwargs = {"source_order_col": "ver"}
    if guard:
        kwargs["matched_condition"] = lambda src, tgt: src("ver") > tgt("ver")
    got = sorted(
        tuple(r) for r in merge(t, s, ["k"], **kwargs).df.select("k", "v", "ver").collect()
    )
    # model's last-wins tie-break must match dedupe_last_wins (desc by ver,
    # then remaining cols desc) — both pick max (ver, val)
    assert got == model_merge(target, source, guard_ver=guard)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(target=ROWS, source=ROWS)
def test_merge_idempotent_replay(spark, target, source):
    target = list({k: (k, v, r) for k, v, r in target}.values())
    t = spark_rows(spark, target)
    s = spark_rows(spark, source)
    once = merge(t, s, ["k"], source_order_col="ver").df
    twice = merge(once, s, ["k"], source_order_col="ver").df
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
