"""Property tests for the r6c operator tranche (association rules, ACF /
Durbin-Watson, Cramér's V, ARI readability, dyadic EWMA, temperature
sampling), beyond oracle parity.

Oracle twins pin cross-engine equality; these pin the MATHEMATICAL
contracts against independent brute-force/pure-Python replicas of the
textbook definitions."""

from __future__ import annotations

import math
import re

import duckdb
import pandas as pd

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _daily_dollars() -> list[int]:
    """The shared day-grain revenue series (whole dollars) both time-series
    operators are defined over, computed independently via DuckDB."""
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) // 100 AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet')
            GROUP BY CAST(o_orderdate AS DATE)
            ORDER BY CAST(o_orderdate AS DATE)"""
    ).fetchall()
    return [r[0] for r in rows]


# ---------------------------------------------------------------------------
# frequent_itemset_pairs
# ---------------------------------------------------------------------------

def test_itemset_pairs_match_brute_force(spark):
    """Every emitted pair's support/confidence/lift must equal the
    brute-force pandas computation over the distinct basket-item pairs,
    and the output must be the true lift-descending top slice."""
    got = QUERIES["frequent_itemset_pairs"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    items = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    n_baskets = items["l_orderkey"].nunique()
    cnt = items.groupby("l_partkey").size().to_dict()
    pairs: dict[tuple[int, int], int] = {}
    for _, grp in items.groupby("l_orderkey"):
        ps = sorted(grp["l_partkey"].tolist())
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pairs[(ps[i], ps[j])] = pairs.get((ps[i], ps[j]), 0) + 1
    expect = {k: v for k, v in pairs.items() if v >= 2}
    assert len(got) == min(100, len(expect))
    for _, r in got.iterrows():
        key = (r["item_a"], r["item_b"])
        pb = expect[key]
        assert r["pair_baskets"] == pb
        assert r["n_a"] == cnt[key[0]] and r["n_b"] == cnt[key[1]]
        assert r["support_ppm"] == pb * 1_000_000 // n_baskets
        assert r["conf_ab_ppm"] == pb * 1_000_000 // cnt[key[0]]
        assert r["lift_ppm"] == pb * n_baskets * 1_000_000 // (cnt[key[0]] * cnt[key[1]])
    # top slice by (lift desc, pair desc, keys asc), verified against ALL pairs
    def sort_key(kv):
        (a, b), pb = kv
        lift = pb * n_baskets * 1_000_000 // (cnt[a] * cnt[b])
        return (-lift, -pb, a, b)
    want_order = sorted(expect.items(), key=sort_key)[: len(got)]
    assert [k for k, _ in want_order] == list(zip(got["item_a"], got["item_b"]))


def test_itemset_independent_items_lift_near_unity():
    """Lift of statistically independent items is 1 by construction: a
    synthetic basket set where item B co-occurs with A at exactly A's
    marginal rate must score lift_ppm == 1_000_000."""
    # 100 baskets; A in 50 (even ids), B in 100 (all) -> pair = 50
    n, pair, ca, cb = 100, 50, 50, 100
    assert pair * n * 1_000_000 // (ca * cb) == 1_000_000


# ---------------------------------------------------------------------------
# acf_durbin_watson
# ---------------------------------------------------------------------------

def test_acf_matches_pure_python(spark):
    """acf/dw per lag must equal the textbook definitions computed in pure
    Python on the independently-derived daily series."""
    got = {r["lag"]: r for r in QUERIES["acf_durbin_watson"](spark, SF_DIR).collect()}
    xs = _daily_dollars()
    n = len(xs)
    mean = sum(xs) / n
    den = sum((x - mean) ** 2 for x in xs)
    for k in range(1, 8):
        num = sum((xs[t] - mean) * (xs[t + k] - mean) for t in range(n - k))
        dsq = sum((xs[t + k] - xs[t]) ** 2 for t in range(n - k))
        r = got[k]
        assert r["n_pairs"] == n - k
        assert abs(r["acf"] - num / den) < 2e-6, (k, r["acf"], num / den)
        assert abs(r["dw"] - dsq / den) < 2e-6


def test_acf_of_constant_like_and_alternating_series():
    """Sanity on closed forms: a strongly alternating series has lag-1
    ACF near -1 and DW near 4; a linear ramp has lag-1 ACF near +1 and
    DW near 0 (pure-Python replica of the operator's formulas)."""
    def acf_dw(xs, k=1):
        n = len(xs)
        mean = sum(xs) / n
        den = sum((x - mean) ** 2 for x in xs)
        num = sum((xs[t] - mean) * (xs[t + k] - mean) for t in range(n - k))
        dsq = sum((xs[t + k] - xs[t]) ** 2 for t in range(n - k))
        return num / den, dsq / den

    alt = [1000 if i % 2 else -1000 for i in range(200)]
    a, d = acf_dw(alt)
    assert a < -0.98 and d > 3.9
    ramp = list(range(200))
    a, d = acf_dw(ramp)
    assert a > 0.97 and d < 0.01


# ---------------------------------------------------------------------------
# cramers_v_association
# ---------------------------------------------------------------------------

def test_cramers_v_consistent_with_chi_square_contributions(spark):
    """chi2_milli must equal the sum of chi_square_priority_status's
    per-cell contributions, and V must be the closed form over it."""
    cells = QUERIES["chi_square_priority_status"](spark, SF_DIR).collect()
    row = QUERIES["cramers_v_association"](spark, SF_DIR).collect()[0]
    assert row["chi2_milli"] == sum(c["contribution_milli"] for c in cells)
    n = sum(c["observed"] for c in cells)
    n_r = len({c["priority"] for c in cells})
    n_c = len({c["status"] for c in cells})
    assert (row["n"], row["n_r"], row["n_c"]) == (n, n_r, n_c)
    v = math.sqrt(row["chi2_milli"] / 1000 / (n * (min(n_r, n_c) - 1)))
    assert abs(row["cramers_v"] - v) < 2e-6
    assert 0.0 <= row["cramers_v"] <= 1.0


# ---------------------------------------------------------------------------
# text_readability_ari
# ---------------------------------------------------------------------------

def test_ari_matches_pure_python(spark):
    """Per-source mean/min/max/college-share must equal a pure-Python
    replica of the integer-staged ARI over the raw documents."""
    got = {r["source"]: r for r in QUERIES["text_readability_ari"](spark, SF_DIR).collect()}
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    per: dict[str, list[int]] = {}
    for _, d in docs.iterrows():
        chars = len(re.findall(r"[A-Za-z0-9]", d["text"]))
        words = 0 if d["text"].strip() == "" else len(re.split(r"\s+", d["text"].strip()))
        sents = max(len(re.findall(r"[.!?]+", d["text"])), 1)
        if words == 0:
            continue
        ari = 471 * chars // words + 50 * words // sents - 2143
        per.setdefault(d["source"], []).append(ari)
    assert set(got) == set(per)
    for src, vals in per.items():
        r = got[src]
        assert r["n_docs"] == len(vals)
        assert r["min_ari_centi"] == min(vals)
        assert r["max_ari_centi"] == max(vals)
        s = sum(vals)
        # truncating div (both engines): trunc toward zero
        q = abs(s) // len(vals)
        assert r["mean_ari_centi"] == (q if s >= 0 else -q)
        n_col = sum(1 for v in vals if v >= 1400)
        assert r["college_ppm"] == n_col * 1_000_000 // len(vals)


# ---------------------------------------------------------------------------
# ewma_anomaly
# ---------------------------------------------------------------------------

def test_ewma_matches_recursive_definition(spark):
    """The dyadic weighted form must equal the recursive truncated EWMA
    s_t = sum(x_{t-i} * 2^(L-1-i)) / sum(weights) computed in pure Python,
    and flags must fire exactly on the integer cross-multiplication rule."""
    rows = QUERIES["ewma_anomaly"](spark, SF_DIR).collect()
    xs = _daily_dollars()
    L = 30
    assert len(rows) == len(xs)
    for idx, r in enumerate(sorted(rows, key=lambda r: r["t"])):
        lo = max(0, idx - L + 1)
        window = xs[lo : idx + 1]  # x_{t-m+1} .. x_t
        num = sum(x << (L - 1 - (idx - j)) for j, x in zip(range(lo, idx + 1), window))
        wsum = sum(1 << (L - 1 - (idx - j)) for j in range(lo, idx + 1))
        assert abs(r["ewma"] - num / wsum) < 2e-6
        num_prev = num - (xs[idx] << (L - 1))
        wsum_prev = wsum - (1 << (L - 1))
        assert r["spike"] == int(wsum_prev > 0 and xs[idx] * wsum_prev > 2 * num_prev)
        assert r["drop_"] == int(wsum_prev > 0 and 2 * xs[idx] * wsum_prev < num_prev)


def test_ewma_constant_series_is_identity():
    """On a constant series the renormalized truncated EWMA equals the
    constant at every t (weights cancel exactly in the dyadic form)."""
    L, c = 30, 12345
    for t in range(1, 40):
        m = min(L, t)
        num = sum(c * (1 << (L - 1 - i)) for i in range(m))
        wsum = sum(1 << (L - 1 - i) for i in range(m))
        assert num / wsum == c


# ---------------------------------------------------------------------------
# temperature_sampling_mix
# ---------------------------------------------------------------------------

def test_temperature_mix_flattens_and_conserves(spark):
    """alpha=0.5 must (a) keep shares a near-partition of 1e6, (b) strictly
    shrink the spread between the largest and smallest domain relative to
    raw token share, and (c) match sqrt-staged integer math exactly."""
    rows = QUERIES["temperature_sampling_mix"](spark, SF_DIR).collect()
    st = sum(round(math.sqrt(r["tokens"]) * 1_000_000) for r in rows)
    tt = sum(r["tokens"] for r in rows)
    for r in rows:
        ms = round(math.sqrt(r["tokens"]) * 1_000_000)
        assert r["temp_mix_ppm"] == ms * 1_000_000 // st
        assert r["weight_ppm"] == r["tokens"] * 1_000_000 // tt
        assert r["flatten_ppm"] == r["temp_mix_ppm"] - r["weight_ppm"]
    # floor-division partitions sum to <= 1e6 and within n_sources of it
    for col in ("weight_ppm", "temp_mix_ppm"):
        s = sum(r[col] for r in rows)
        assert 1_000_000 - len(rows) <= s <= 1_000_000
    big_raw = max(rows, key=lambda r: r["weight_ppm"])
    small_raw = min(rows, key=lambda r: r["weight_ppm"])
    raw_spread = big_raw["weight_ppm"] - small_raw["weight_ppm"]
    temp_spread = big_raw["temp_mix_ppm"] - small_raw["temp_mix_ppm"]
    if raw_spread > 1000:  # meaningful imbalance in the fixture
        assert temp_spread < raw_spread
