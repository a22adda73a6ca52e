"""Property tests for the r6e operator tranche (UCB1 allocation, streaming
dedup under replay, co-purchase degree power-law, quantile normalization),
beyond oracle parity."""

from __future__ import annotations

import math
import re

import pandas as pd

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# ucb_variant_allocation
# ---------------------------------------------------------------------------

def test_ucb_matches_textbook_formula(spark):
    """UCB score per arm must equal mean + sqrt(2 ln N / n_i) from
    independently recomputed counts; exactly one arm is flagged unless the
    rounded max ties."""
    rows = QUERIES["ucb_variant_allocation"](spark, SF_DIR).collect()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    n_t = len(ev)
    for r in rows:
        sub = ev[ev["event_type"] == r["arm"]]
        n_i, c = len(sub), int((sub["value"] > 50.0).sum())
        assert (r["n_i"], r["c"]) == (n_i, c)
        assert r["mean_ppm"] == c * 1_000_000 // n_i
        ucb = c / n_i + math.sqrt(2 * math.log(n_t) / n_i)
        assert abs(r["ucb"] - ucb) < 2e-6
    best = max(r["ucb"] for r in rows)
    flagged = [r for r in rows if r["pull_next"] == 1]
    assert flagged and all(r["ucb"] == best for r in flagged)


def test_ucb_bonus_decreases_with_pulls():
    """The exploration bonus must shrink as an arm is pulled more —
    the defining property of UCB."""
    n_t = 10_000
    bonuses = [math.sqrt(2 * math.log(n_t) / n) for n in (10, 100, 1000)]
    assert bonuses == sorted(bonuses, reverse=True)


# ---------------------------------------------------------------------------
# streaming_dedup_replay
# ---------------------------------------------------------------------------

def test_streaming_dedup_removes_full_replay(spark):
    """Twice-replayed input must aggregate to exactly the single-copy
    truth — per type AND in total."""
    rows = QUERIES["streaming_dedup_replay"](spark, SF_DIR).collect()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    truth = ev.groupby("event_type").agg(
        n=("event_id", "size"),
        cents=("value", lambda v: int(round(v * 100).astype(int).sum())),
    )
    assert len(rows) == len(truth)
    for r in rows:
        t = truth.loc[r["event_type"]]
        assert r["n_events"] == t["n"]
        assert r["value_cents"] == t["cents"]
    assert sum(r["n_events"] for r in rows) == len(ev)  # not 2x


# ---------------------------------------------------------------------------
# copurchase_degree_powerlaw
# ---------------------------------------------------------------------------

def test_degree_powerlaw_matches_networkx_free_replica(spark):
    """Graph stats and the log-log slope must equal a pure-Python replica
    built from the same distinct basket-item pairs."""
    row = QUERIES["copurchase_degree_powerlaw"](spark, SF_DIR).collect()[0]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    items = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    edges = set()
    for _, grp in items.groupby("l_orderkey"):
        ps = sorted(grp["l_partkey"].tolist())
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    deg: dict[int, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    assert row["n_parts"] == len(deg)
    assert row["n_edges"] == len(edges)
    assert row["max_degree"] == max(deg.values())
    dist: dict[int, int] = {}
    for d in deg.values():
        dist[d] = dist.get(d, 0) + 1
    pts = [(round(math.log(d) * 1000), round(math.log(n) * 1000))
           for d, n in dist.items()]
    np_, sx = len(pts), sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    slope = (float(np_) * sxy - float(sx) * sy) / (float(np_) * sxx - float(sx) * sx)
    assert abs(row["slope_loglog"] - slope) < 2e-6
    assert row["n_points"] == np_


# ---------------------------------------------------------------------------
# quantile_normalization_map
# ---------------------------------------------------------------------------

def test_quantile_map_matches_percentile_disc_replica(spark):
    """Every (source, decile) cell must equal percentile_disc semantics
    (value at rank ceil(d*n/10), ties by doc_id) computed in pure Python,
    and the pooled column must be constant per decile."""
    got = QUERIES["quantile_normalization_map"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    lens = []
    for _, d in docs.iterrows():
        x = 0 if d["text"].strip() == "" else len(re.split(r"\s+", d["text"].strip()))
        lens.append((d["source"], d["doc_id"], x))

    def decile_value(rows, dec):
        # rows sorted by (x, tiebreak...) -> value at rank ceil(d*n/10)
        n = len(rows)
        return rows[(dec * n + 9) // 10 - 1]

    pooled_sorted = [x for _, _, x in sorted(lens, key=lambda r: (r[2], r[0], r[1]))]
    for (src, dec), sub in got.groupby(["source", "decile"]):
        r = sub.iloc[0]
        mine = sorted(
            (x for s, _, x in lens if s == src),
        )
        src_rows = sorted(
            [(x, did) for s, did, x in lens if s == src])
        assert r["src_value"] == decile_value([x for x, _ in src_rows], dec)
        assert r["pooled_value"] == decile_value(pooled_sorted, dec)
        assert r["shift"] == r["src_value"] - r["pooled_value"]
    # pooled decile values identical across sources
    for dec, sub in got.groupby("decile"):
        assert sub["pooled_value"].nunique() == 1
