"""Property tests for the r6n operator tranche (k-core peel, strict
windowed funnel, Gumbel return levels)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import pandas as pd

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"
WINDOW_US = 3 * 86400 * 1_000_000


# ---------------------------------------------------------------------------
# graph_k_core_peel
# ---------------------------------------------------------------------------

def _copurchase_edges():
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    per_order = defaultdict(set)
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        per_order[o].add(p)
    support = Counter()
    for parts in per_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                support[(ps[i], ps[j])] += 1
    return {e for e, c in support.items() if c >= 2}


def test_k_core_matches_peel_replica(spark):
    edges = _copurchase_edges()
    rows = sorted(
        QUERIES["graph_k_core_peel"](spark, SF_DIR).collect(),
        key=lambda r: r["round"],
    )
    assert len(rows) == 3
    e = set(edges)
    for r in rows:
        deg = Counter()
        for a, b in e:
            deg[a] += 1
            deg[b] += 1
        keep = {n for n, d in deg.items() if d >= 3}
        e = {(a, b) for a, b in e if a in keep and b in keep}
        assert r["nodes_kept"] == len(keep)
        assert r["edges_kept"] == len(e)
        assert r["nodes_removed"] == len(deg) - len(keep)
        assert r["converged"] == (1 if r["nodes_removed"] == 0 else 0)


def test_k_core_is_monotone_shrinking(spark):
    rows = sorted(
        QUERIES["graph_k_core_peel"](spark, SF_DIR).collect(),
        key=lambda r: r["round"],
    )
    nodes = [r["nodes_kept"] for r in rows]
    edges = [r["edges_kept"] for r in rows]
    assert nodes == sorted(nodes, reverse=True)
    assert edges == sorted(edges, reverse=True)


# ---------------------------------------------------------------------------
# funnel_strict_windowed
# ---------------------------------------------------------------------------

def test_funnel_matches_sequential_replica(spark):
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    expected = [0, 0, 0, 0]
    for uid, grp in ev.groupby("user_id"):
        def first_after(et, lo, deadline):
            ts = grp[(grp["event_type"] == et) & (grp["us"] > lo)
                     & (grp["us"] < deadline)]["us"]
            return ts.min() if len(ts) else None
        sign = grp[grp["event_type"] == "signup"]["us"]
        if not len(sign):
            continue
        t1 = sign.min()
        expected[0] += 1
        deadline = t1 + WINDOW_US
        t2 = first_after("view", t1, deadline)
        if t2 is None:
            continue
        expected[1] += 1
        t3 = first_after("click", t2, deadline)
        if t3 is None:
            continue
        expected[2] += 1
        t4 = first_after("purchase", t3, deadline)
        if t4 is None:
            continue
        expected[3] += 1
    rows = sorted(
        QUERIES["funnel_strict_windowed"](spark, SF_DIR).collect(),
        key=lambda r: r["step"],
    )
    assert [r["n_users"] for r in rows] == expected
    # funnel is monotone and ratios are exact floors
    for i, r in enumerate(rows):
        assert r["conv_from_start_ppm"] == r["n_users"] * 1_000_000 // max(expected[0], 1)
        prev = expected[i - 1] if i else expected[0]
        assert r["conv_from_prev_ppm"] == r["n_users"] * 1_000_000 // max(prev, 1)
    ns = [r["n_users"] for r in rows]
    assert ns == sorted(ns, reverse=True)


# ---------------------------------------------------------------------------
# gumbel_return_levels
# ---------------------------------------------------------------------------

def test_gumbel_matches_moment_replica(spark):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'")
    maxima = [m for (m,) in con.execute(
        """SELECT max(CAST(round(o_totalprice*100) AS BIGINT))
           FROM orders GROUP BY CAST(o_orderdate AS DATE)"""
    ).fetchall()]
    n = len(maxima)
    mean = sum(maxima) / n
    sd = math.sqrt((sum(m * m for m in maxima) - sum(maxima) ** 2 / n) / (n - 1))
    beta = sd * 0.7796968012
    mu = mean - 0.5772156649 * beta
    rows = {r["t_days"]: r for r in
            QUERIES["gumbel_return_levels"](spark, SF_DIR).collect()}
    assert sorted(rows) == [30, 90, 365]
    for t, r in rows.items():
        assert r["n_days"] == n
        assert r["observed_max"] == max(maxima)
        assert abs(r["mu_cents"] - round(mu)) <= 1
        assert abs(r["beta_cents"] - round(beta)) <= 1
        rl = mu - beta * math.log(-math.log(1 - 1 / t))
        assert abs(r["return_level_cents"] - round(rl)) <= 1
    # longer horizons -> higher return levels (Gumbel is monotone in T)
    assert (rows[30]["return_level_cents"] < rows[90]["return_level_cents"]
            < rows[365]["return_level_cents"])
