"""Property tests for the r6p operator tranche (permutation test,
geometric median)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"
FAST_US = 3 * 86400 * 1_000_000


# ---------------------------------------------------------------------------
# permutation_test_diff
# ---------------------------------------------------------------------------

def test_permutation_matches_md5_replica(spark):
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    users = []
    for uid, grp in ev.groupby("user_id"):
        t0 = grp["us"].min()
        purch = grp[grp["event_type"] == "purchase"]["us"]
        tp = purch.min() if len(purch) else None
        y = 1 if (tp is not None and tp - t0 < FAST_US) else 0
        users.append((int(uid), y))

    def diff(assign):
        n1 = sum(1 for v in assign if v == 1)
        c1 = sum(y for v, y in zip(assign, ys) if v == 1)
        n0 = len(assign) - n1
        c0 = sum(ys) - c1
        return (c1 * 1_000_000 // max(n1, 1)) - (c0 * 1_000_000 // max(n0, 1))

    ys = [y for _, y in users]
    obs = diff([uid % 2 for uid, _ in users])
    nulls = []
    for rep in range(32):
        seed, off = rep // 8, (rep % 8) * 4
        assign = []
        for uid, _ in users:
            hx = hashlib.md5(f"{uid}#p{seed}".encode()).hexdigest()
            assign.append(int(hx[off:off + 4], 16) % 2)
        nulls.append(diff(assign))
    n_extreme = sum(1 for d in nulls if abs(d) >= abs(obs))
    row = QUERIES["permutation_test_diff"](spark, SF_DIR).collect()[0]
    assert row["n_users"] == len(users)
    assert row["obs_diff_ppm"] == obs
    assert row["n_perms"] == 32
    assert row["n_extreme"] == n_extreme
    assert row["null_max_abs_ppm"] == max(abs(d) for d in nulls)
    assert row["p_value_ppm"] == (n_extreme + 1) * 1_000_000 // 33
    # p-value bounds of the add-one form
    assert 1_000_000 // 33 <= row["p_value_ppm"] <= 1_000_000


# ---------------------------------------------------------------------------
# geometric_median_embeddings
# ---------------------------------------------------------------------------

def _weiszfeld_replica():
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    def hround(x):  # engines round half AWAY from zero; python round() banks
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    # engines keep the FLOAT input in single precision through the
    # multiply (float32 * literal) before round — replicate exactly
    xm = np.array(
        [[hround(float(np.float32(v) * np.float32(1_000_000))) for v in e]
         for e in emb["embedding"]],
        dtype=object)
    n, dims = xm.shape

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    mean = [tdiv(int(sum(int(x) for x in xm[:, d])), n) for d in range(dims)]
    m = list(mean)
    for _ in range(3):
        dmic = []
        for j in range(n):
            ss = sum((int(xm[j, d]) - m[d]) ** 2 for d in range(dims))
            dmic.append(max(int(math.floor(math.sqrt(float(ss)) + 0.5)), 1))
        num = [sum(tdiv(int(xm[j, d]) * 1_000_000, dmic[j]) for j in range(n))
               for d in range(dims)]
        den = sum(10 ** 12 // dj for dj in dmic)
        m = [tdiv(num[d] * 1_000_000, den) for d in range(dims)]
    return mean, m


def test_geometric_median_matches_weiszfeld_replica(spark):
    mean, gmed = _weiszfeld_replica()
    rows = sorted(
        QUERIES["geometric_median_embeddings"](spark, SF_DIR).collect(),
        key=lambda r: r["dim"],
    )
    assert len(rows) == 64
    for r in rows:
        d = r["dim"] - 1
        assert r["mean_micro"] == mean[d]
        assert r["gmedian_micro"] == gmed[d]
        assert r["shift_micro"] == gmed[d] - mean[d]


def test_geometric_median_is_robust_unit():
    """Unit semantics: one far outlier drags the mean much further than
    the geometric median."""
    pts = [np.zeros(4) for _ in range(20)] + [np.full(4, 1000.0)]
    mean = np.mean(pts, axis=0)
    m = mean.copy()
    for _ in range(50):
        d = np.array([max(np.linalg.norm(p - m), 1e-9) for p in pts])
        w = 1 / d
        m = (np.array(pts).T @ w) / w.sum()
    assert np.linalg.norm(mean) > 80
    assert np.linalg.norm(m) < 5


# ---------------------------------------------------------------------------
# error_budget_burn_rate
# ---------------------------------------------------------------------------

def test_burn_rate_matches_window_replica(spark):
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["day"] = ev["ts"].dt.strftime("%Y-%m-%d")
    days = sorted(ev["day"].unique())
    n = {d: int((ev["day"] == d).sum()) for d in days}
    e = {d: int(((ev["day"] == d) & (ev["event_type"] == "error")).sum())
         for d in days}
    rows = {r["day"]: r for r in
            QUERIES["error_budget_burn_rate"](spark, SF_DIR).collect()}
    assert sorted(rows) == days
    for i, d in enumerate(days):
        r = rows[d]
        assert (r["n"], r["e"]) == (n[d], e[d])
        w7 = days[max(0, i - 6):i + 1]
        w28 = days[max(0, i - 27):i + 1]
        b1 = e[d] * 10**9 // (n[d] * 250000)
        b7 = sum(e[x] for x in w7) * 10**9 // (sum(n[x] for x in w7) * 250000)
        b28 = (sum(e[x] for x in w28) * 10**9
               // (sum(n[x] for x in w28) * 250000))
        assert r["burn_1d_milli"] == b1
        assert r["burn_7d_milli"] == b7
        assert r["burn_28d_milli"] == b28
        sev = 2 if (b1 > 14400 and b7 > 14400) else (
            1 if (b7 > 6000 and b28 > 6000) else 0)
        assert r["page_severity"] == sev


def test_burn_rate_semantics_unit():
    """burn = 1000 milli means exactly on budget; the dual-window AND
    suppresses a one-day spike that the 7d window has not confirmed."""
    # on-budget: 25% errors at SLO 25% -> burn exactly 1000 milli
    assert 250 * 10**9 // (1000 * 250000) == 1000
    # a single hot day (50% errors) with a calm week does not page at sev 2
    b1, b7 = 2000, 900
    assert not (b1 > 14400 and b7 > 14400)
