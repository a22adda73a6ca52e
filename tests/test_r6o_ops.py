"""Property tests for the r6o operator tranche (one-way ANOVA,
Brown-Forsythe, BM25 pseudo-relevance feedback)."""

from __future__ import annotations

import statistics
from collections import defaultdict

import duckdb

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _nation_values():
    con = duckdb.connect()
    for t in ("orders", "customer", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    raw = con.execute(
        """SELECT n_name, CAST(round(o_totalprice) AS BIGINT)
           FROM orders JOIN customer ON c_custkey = o_custkey
           JOIN nation ON n_nationkey = c_nationkey"""
    ).fetchall()
    groups = defaultdict(list)
    for nat, x in raw:
        groups[nat].append(x)
    return groups


def _anova_f(groups):
    n = sum(len(v) for v in groups.values())
    k = len(groups)
    s = sum(sum(v) for v in groups.values())
    sxx = sum(x * x for v in groups.values() for x in v)
    sum_sg2 = sum((sum(v)) ** 2 / len(v) for v in groups.values())
    ssb = sum_sg2 - s * s / n
    ssw = sxx - sum_sg2
    f = (ssb / (k - 1)) / (ssw / (n - k))
    return n, k, ssb, ssw, f


# ---------------------------------------------------------------------------
# one_way_anova_f
# ---------------------------------------------------------------------------

def test_anova_matches_replica_and_decomposition(spark):
    groups = _nation_values()
    n, k, ssb, ssw, f = _anova_f(groups)
    row = QUERIES["one_way_anova_f"](spark, SF_DIR).collect()[0]
    assert row["n"] == n and row["k"] == k
    assert abs(row["ss_between"] - ssb) <= max(1e-6 * abs(ssb), 1.0)
    assert abs(row["ss_within"] - ssw) <= max(1e-6 * abs(ssw), 1.0)
    assert abs(row["f_stat"] - f) < 1e-4
    assert row["reject_95"] == (1 if f > 1.52 else 0)
    assert row["ss_between"] >= 0 and row["ss_within"] > 0


# ---------------------------------------------------------------------------
# levene_brown_forsythe
# ---------------------------------------------------------------------------

def test_levene_matches_deviation_anova_replica(spark):
    groups = _nation_values()
    zgroups = {}
    for nat, xs in groups.items():
        med = statistics.median(xs)
        zgroups[nat] = [round(abs(x - med) * 2) for x in xs]
    n, k, _, _, w = _anova_f(zgroups)
    row = QUERIES["levene_brown_forsythe"](spark, SF_DIR).collect()[0]
    assert row["n"] == n and row["k"] == k
    assert abs(row["w_stat"] - w) < 1e-4
    assert row["reject_95"] == (1 if w > 1.52 else 0)


def test_levene_is_scale_sensitive_unit():
    """Semantics: equal-spread groups give W ~ 0-ish; one group with 10x
    spread inflates W far past the critical value."""
    import random
    rng = random.Random(7)
    same = {g: [rng.randint(-50, 50) for _ in range(200)] for g in "abcd"}
    zsame = {g: [abs(x - statistics.median(v)) for x in v] for g, v in same.items()}
    _, _, _, _, w_same = _anova_f(zsame)
    diff = dict(same)
    diff["d"] = [x * 10 for x in same["d"]]
    zdiff = {g: [abs(x - statistics.median(v)) for x in v] for g, v in diff.items()}
    _, _, _, _, w_diff = _anova_f(zdiff)
    assert w_diff > 10 * max(w_same, 0.1)


# ---------------------------------------------------------------------------
# bm25_prf_expansion
# ---------------------------------------------------------------------------

def test_prf_expansion_properties(spark):
    rows = sorted(
        QUERIES["bm25_prf_expansion"](spark, SF_DIR).collect(),
        key=lambda r: r["rank_after"],
    )
    assert len(rows) == 20
    assert [r["rank_after"] for r in rows] == list(range(1, 21))
    scores = [r["score_after_milli"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        # the expanded query is a superset of the base terms, every BM25
        # term is non-negative, so scores can only go up
        assert r["score_after_milli"] >= r["score_before_milli"]
        assert r["in_feedback_set"] in (0, 1)
    # expansion actually fired: somebody gained score
    assert any(r["score_after_milli"] > r["score_before_milli"] for r in rows)
    # feedback docs were the before-top-10, so some should persist
    assert sum(r["in_feedback_set"] for r in rows) >= 1


def test_prf_before_scores_match_base_bm25(spark):
    """Docs shared between the base top-20 and the PRF output must carry
    identical base scores (the first pass IS bm25_retrieval_topk)."""
    base = {r["doc_id"]: r["score_milli"] for r in
            QUERIES["bm25_retrieval_topk"](spark, SF_DIR).collect()}
    rows = QUERIES["bm25_prf_expansion"](spark, SF_DIR).collect()
    shared = [r for r in rows if r["doc_id"] in base]
    assert shared
    for r in shared:
        assert r["score_before_milli"] == base[r["doc_id"]]
