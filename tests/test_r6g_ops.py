"""Property tests for the r6g operator tranche (seasonal decomposition,
order-2 Markov gain, windowed PMI, CUPED), beyond oracle parity."""

from __future__ import annotations

import math
import re

import duckdb
import pandas as pd

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# seasonal_decompose_daily
# ---------------------------------------------------------------------------

def test_seasonal_matches_pure_python(spark):
    """Trend, weekday index, and residual must equal the integer-staged
    classical decomposition computed in pure Python."""
    rows = {r["day"]: r for r in
            QUERIES["seasonal_decompose_daily"](spark, SF_DIR).collect()}
    con = duckdb.connect()
    series = con.execute(
        f"""SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR),
                   CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) // 100 AS BIGINT),
                   dayofweek(CAST(o_orderdate AS DATE))
            FROM read_parquet('{SF_DIR}/orders.parquet')
            GROUP BY CAST(o_orderdate AS DATE) ORDER BY 1"""
    ).fetchall()
    xs = [x for _, x, _ in series]
    ratio = {}
    for k in range(len(series)):
        if k < 3 or k >= len(series) - 3:
            continue
        trend = sum(xs[k - 3:k + 4]) // 7
        if trend > 0:
            d, x, dow = series[k]
            ratio[d] = (x, trend, dow, x * 1_000_000 // trend)
    idx: dict[int, list[int]] = {}
    for _, (_, _, dow, rp) in ratio.items():
        idx.setdefault(dow, []).append(rp)
    dow_index = {d: sum(v) // len(v) for d, v in idx.items()}
    assert set(rows) == set(ratio)
    for d, (x, trend, dow, rp) in ratio.items():
        r = rows[d]
        assert (r["x"], r["trend"], r["dow"], r["ratio_ppm"]) == (x, trend, dow, rp)
        assert r["dow_index_ppm"] == dow_index[dow]
        res = rp * 1_000_000 // dow_index[dow]
        assert r["residual_ppm"] == res
        assert r["anomaly"] == int(abs(res - 1_000_000) > 300_000)


def test_seasonal_constant_series_identity():
    """A constant series decomposes trivially: trend == x, every ratio and
    index and residual == 1e6, no anomalies."""
    x = 777
    trend = (x * 7) // 7
    assert trend == x
    ratio = x * 1_000_000 // trend
    assert ratio == 1_000_000
    assert ratio * 1_000_000 // ratio == 1_000_000


# ---------------------------------------------------------------------------
# markov_order2_gain
# ---------------------------------------------------------------------------

def test_order2_gain_matches_replica_and_dominates(spark):
    """acc1/acc2 must equal pure-pandas replicas on the same triples;
    in-sample, the order-2 modal predictor can never be less accurate
    than order-1 on the SAME conditioning population... per (s2,s1) cell
    it predicts the cell mode, which is optimal — so acc2 >= acc1."""
    row = QUERIES["markov_order2_gain"](spark, SF_DIR).collect()[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet") \
        .sort_values(["user_id", "ts", "event_id"])
    gap = pd.Timedelta(minutes=30)
    trips = []
    for _, grp in ev.groupby("user_id"):
        rows_ = list(grp[["ts", "event_type"]].itertuples(index=False))
        for i in range(1, len(rows_) - 1):
            if (rows_[i + 1][0] - rows_[i][0] <= gap
                    and rows_[i][0] - rows_[i - 1][0] <= gap):
                trips.append((rows_[i - 1][1], rows_[i][1], rows_[i + 1][1]))
    c1: dict[tuple[str, str], int] = {}
    c2: dict[tuple[str, str, str], int] = {}
    for s2, s1, y in trips:
        c1[(s1, y)] = c1.get((s1, y), 0) + 1
        c2[(s2, s1, y)] = c2.get((s2, s1, y), 0) + 1

    def mode1(s1):
        outs = {y: n for (s, y), n in c1.items() if s == s1}
        return sorted(outs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]

    def mode2(s2, s1):
        outs = {y: n for (a, b, y), n in c2.items() if (a, b) == (s2, s1)}
        return sorted(outs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]

    n = len(trips)
    a1 = sum(1 for s2, s1, y in trips if y == mode1(s1))
    a2 = sum(1 for s2, s1, y in trips if y == mode2(s2, s1))
    assert row["n_triples"] == n
    assert row["acc1_ppm"] == a1 * 1_000_000 // n
    assert row["acc2_ppm"] == a2 * 1_000_000 // n
    assert row["gain_ppm"] == (a2 - a1) * 1_000_000 // n
    assert a2 >= a1  # finer conditioning can't lose in-sample


# ---------------------------------------------------------------------------
# cooccurrence_pmi_window
# ---------------------------------------------------------------------------

def test_pmi_window_matches_replica(spark):
    """Top pairs and milli-nat PMI must equal the pure-Python replica with
    identical window, marginals, and staging."""
    got = QUERIES["cooccurrence_pmi_window"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    pairs: dict[tuple[str, str], int] = {}
    marg: dict[str, int] = {}
    total = 0
    for _, d in docs.iterrows():
        txt = re.sub(r"\s+", " ", d["text"].lower()).strip()
        if txt == "":
            continue
        ts = txt.split(" ")
        for i in range(len(ts)):
            for off in (1, 2, 3, 4):
                if i + off < len(ts):
                    x, y = sorted((ts[i], ts[i + off]))
                    pairs[(x, y)] = pairs.get((x, y), 0) + 1
                    marg[x] = marg.get(x, 0) + 1
                    marg[y] = marg.get(y, 0) + 1
                    total += 1
    from decimal import ROUND_HALF_UP, Decimal
    scored = {}
    for (x, y), n in pairs.items():
        if n >= 5:
            pmi = math.log(n * total / (marg[x] * marg[y])) * 1000
            scored[(x, y)] = (n, int(Decimal(pmi).quantize(
                Decimal(1), rounding=ROUND_HALF_UP)))
    want = sorted(scored.items(), key=lambda kv: (-kv[1][1], kv[0]))[:100]
    assert len(got) == min(100, len(scored))
    assert [(x, y) for (x, y), _ in want] == list(zip(got["x"], got["y"]))
    assert [p for _, (_, p) in want] == got["pmi_milli"].tolist()


# ---------------------------------------------------------------------------
# cuped_adjusted_ab
# ---------------------------------------------------------------------------

def test_cuped_matches_replica_and_reduces_variance(spark):
    """theta / rho^2 / diffs must equal the textbook formulas on
    independently recomputed per-user (X, Y); the adjusted per-user
    variance must actually shrink by ~rho^2."""
    row = QUERIES["cuped_adjusted_ab"](spark, SF_DIR).collect()[0]
    from decimal import ROUND_HALF_UP, Decimal

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    # engines round HALF_UP (Spark F.round / DuckDB round); Python's round()
    # is banker's and diverges on exact .5 values
    ev["v"] = ev["value"].apply(
        lambda x: int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))
    )
    cut = pd.Timestamp("2024-01-16")
    g = ev.groupby("user_id").apply(
        lambda grp: pd.Series({
            "x": int(grp.loc[grp["ts"] < cut, "v"].sum()),
            "y": int(grp.loc[grp["ts"] >= cut, "v"].sum()),
        }), include_groups=False,
    )
    g["variant"] = (g.index % 2).astype(int)
    n = len(g)
    sx, sy = g["x"].sum(), g["y"].sum()
    sxx = (g["x"] * g["x"]).sum()
    sxy = (g["x"] * g["y"]).sum()
    syy = (g["y"] * g["y"]).sum()
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    rho2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    a, b = g[g["variant"] == 0], g[g["variant"] == 1]
    diff_raw = a["y"].mean() - b["y"].mean()
    diff_adj = diff_raw - theta * (a["x"].mean() - b["x"].mean())
    assert row["n"] == n and row["n_a"] == len(a) and row["n_b"] == len(b)
    assert abs(row["theta"] - theta) < 2e-6
    assert abs(row["rho2"] - rho2) < 2e-6
    assert abs(row["diff_raw"] - diff_raw) < 2e-6
    assert abs(row["diff_cuped"] - diff_adj) < 2e-6
    # CUPED residual variance = (1 - rho^2) * var(Y), up to fp slack
    yadj = g["y"] - theta * g["x"]
    assert yadj.var() <= g["y"].var() * (1 - rho2) * 1.0001


# ---------------------------------------------------------------------------
# logodds_fightin_words
# ---------------------------------------------------------------------------

def test_fightin_words_matches_replica(spark):
    """z-scores and the top/bottom token sets must equal a pure-Python
    replica of Monroe et al.'s prior-smoothed log-odds."""
    got = QUERIES["logodds_fightin_words"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    per: dict[str, dict[str, int]] = {}
    for _, d in docs.iterrows():
        txt = re.sub(r"\s+", " ", d["text"].lower()).strip()
        if txt == "":
            continue
        bag = per.setdefault(d["source"], {})
        for t in txt.split(" "):
            bag[t] = bag.get(t, 0) + 1
    totals = {s: sum(b.values()) for s, b in per.items()}
    big = sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    cw: dict[str, int] = {}
    for b in per.values():
        for t, n in b.items():
            cw[t] = cw.get(t, 0) + n
    ct = sum(cw.values())
    ns = totals[big]
    nr = ct - ns
    A0 = 1000
    from decimal import ROUND_HALF_UP, Decimal
    scored = {}
    for t, c in cw.items():
        if c < 20:
            continue
        ys = per[big].get(t, 0)
        yr = c - ys
        aw = A0 * c / ct
        delta = (math.log((ys + aw) / (ns + A0 - ys - aw))
                 - math.log((yr + aw) / (nr + A0 - yr - aw)))
        z = delta / math.sqrt(1.0 / (ys + aw) + 1.0 / (yr + aw))
        scored[t] = (ys, yr, float(Decimal(z * 10**6).quantize(
            Decimal(1), rounding=ROUND_HALF_UP)) / 10**6)
    up = sorted(scored.items(), key=lambda kv: (-kv[1][2], kv[0]))[:15]
    down = sorted(scored.items(), key=lambda kv: (kv[1][2], kv[0]))[:15]
    got_up = got[got["side"] == 1]
    got_down = got[got["side"] == -1]
    assert list(got_up["token"]) == [t for t, _ in up]
    assert list(got_down["token"]) == [t for t, _ in down]
    for sub, want in ((got_up, up), (got_down, down)):
        for (_, r), (t, (ys, yr, z)) in zip(sub.iterrows(), want):
            assert (r["ys"], r["yr"]) == (ys, yr)
            assert abs(r["z"] - z) < 2e-6


def test_fightin_words_prior_shrinks_rare_tokens():
    """The defining fix over raw log-odds: a rare token with a lopsided
    split must score a SMALLER |z| than a common token with the same
    ratio (the prior + variance term shrink low-evidence claims)."""
    A0, ct = 1000, 1_000_000
    ns = nr = 500_000

    def z(ys, yr):
        c = ys + yr
        aw = A0 * c / ct
        delta = (math.log((ys + aw) / (ns + A0 - ys - aw))
                 - math.log((yr + aw) / (nr + A0 - yr - aw)))
        return delta / math.sqrt(1 / (ys + aw) + 1 / (yr + aw))

    assert abs(z(30, 10)) < abs(z(3000, 1000))


# ---------------------------------------------------------------------------
# dp_laplace_counts
# ---------------------------------------------------------------------------

def test_dp_laplace_matches_inverse_cdf_replica(spark):
    """Noise must equal the inverse-CDF Laplace draw from the seeded hash
    uniform, and noisy_n must reconcile with true_n."""
    import hashlib
    rows = QUERIES["dp_laplace_counts"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        u_ppm = (int(hashlib.md5(f"{r['nation']}#11".encode())
                     .hexdigest()[:15], 16) % 999_999) + 1
        u = u_ppm / 1_000_000
        sign = 1.0 if u_ppm >= 500_000 else -1.0
        noise = -1.0 * sign * math.log(1.0 - 2.0 * abs(u - 0.5))
        assert abs(r["noise"] - noise) < 2e-6
        assert abs(r["noisy_n"] - (r["true_n"] + r["noise"])) < 2e-6
        assert abs(r["abs_err"] - abs(r["noise"])) < 2e-6


def test_dp_laplace_noise_distribution_shape():
    """Inverse-CDF construction sanity: u=0.5 -> 0 noise; |noise| grows
    without bound toward the tails; symmetric in u around 0.5."""
    def lap(u):
        s = 1.0 if u >= 0.5 else -1.0
        return -s * math.log(1.0 - 2.0 * abs(u - 0.5))
    assert lap(0.5) == 0.0
    assert lap(0.9999) > lap(0.99) > lap(0.6) > 0
    assert abs(lap(0.3) + lap(0.7)) < 1e-12
