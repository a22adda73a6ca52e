"""Property tests for the r6d operator tranche (streaming sessionization,
skip-gram pair generation, k-anonymity audit, logistic-regression IRLS),
beyond oracle parity.

Oracle twins pin cross-engine equality; these pin the MATHEMATICAL
contracts against independent pure-Python replicas and the operators'
defining invariants."""

from __future__ import annotations

import hashlib
import math
import re

import duckdb
import pandas as pd

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# streaming_sessionize
# ---------------------------------------------------------------------------

def test_streaming_sessions_match_batch_islands_with_ge_gap(spark):
    """The streaming session_window result must equal a pure-pandas
    gaps-and-islands pass with the >= 30min break rule (session_window
    intervals are [ts, ts+gap), so an event at exactly ts+gap does NOT
    merge), and differ from the batch `sessionize` query ONLY on exact-gap
    boundaries (none in this fixture -> n_sessions within 1%)."""
    rows = QUERIES["streaming_sessionize"](spark, SF_DIR).collect()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")[["user_id", "ts"]]
    ev["ts"] = pd.to_datetime(ev["ts"])
    gap = pd.Timedelta(minutes=30)
    expect = []
    for uid, grp in ev.sort_values(["user_id", "ts"]).groupby("user_id"):
        start = end = None
        n = 0
        for ts in grp["ts"]:
            if start is None:
                start, end, n = ts, ts, 1
            elif ts - end >= gap:
                expect.append((uid, start, end, n))
                start, end, n = ts, ts, 1
            else:
                end, n = ts, n + 1
        expect.append((uid, start, end, n))
    got = sorted(
        (r["user_id"], pd.Timestamp(r["session_start"]),
         pd.Timestamp(r["session_end"]), r["n_events"])
        for r in rows
    )
    assert got == sorted(expect)


def test_streaming_session_event_conservation(spark):
    """Every event lands in exactly one session: sum(n_events) == n_rows."""
    rows = QUERIES["streaming_sessionize"](spark, SF_DIR).collect()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    assert sum(r["n_events"] for r in rows) == len(ev)


# ---------------------------------------------------------------------------
# skipgram_pairs_subsampled
# ---------------------------------------------------------------------------

def _md5_long(s: str, seed: int) -> int:
    return int(hashlib.md5(f"{s}#{seed}".encode()).hexdigest()[:15], 16)


def test_skipgram_matches_pure_python(spark):
    """Top-100 pairs must equal a single-process replica: identical
    normalization, identical hash-ppm keep rule, identical offsets."""
    got = QUERIES["skipgram_pairs_subsampled"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    positions = []  # (doc_id, i, token) 1-based
    cnt: dict[str, int] = {}
    for _, d in docs.iterrows():
        txt = re.sub(r"\s+", " ", d["text"].lower()).strip()
        if txt == "":
            continue
        for i, t in enumerate(txt.split(" "), start=1):
            positions.append((d["doc_id"], i, t))
            cnt[t] = cnt.get(t, 0) + 1
    tt = len(positions)
    kept = set()
    kept_tok = {}
    for doc_id, i, t in positions:
        r = tt / (1000 * cnt[t])
        p_ppm = min(1_000_000, round((math.sqrt(r) + r) * 1_000_000))
        if _md5_long(f"{doc_id}_{i}", 77) % 1_000_000 < p_ppm:
            kept.add((doc_id, i))
            kept_tok[(doc_id, i)] = t
    pairs: dict[tuple[str, str], int] = {}
    for (doc_id, i) in kept:
        for off in (1, 2):
            if (doc_id, i + off) in kept:
                key = (kept_tok[(doc_id, i)], kept_tok[(doc_id, i + off)])
                pairs[key] = pairs.get(key, 0) + 1
    want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:100]
    assert len(got) == min(100, len(pairs))
    assert [(c, x) for (c, x), _ in want] == list(zip(got["center"], got["context"]))
    assert [n for _, n in want] == got["n_pairs"].tolist()


def test_skipgram_subsampling_tilts_against_frequent_tokens(spark):
    """The subsample keep-rate must be ~1 for rare tokens and < 1 for the
    most frequent token (the whole point of Mikolov subsampling)."""
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    cnt: dict[str, int] = {}
    tt = 0
    for _, d in docs.iterrows():
        txt = re.sub(r"\s+", " ", d["text"].lower()).strip()
        if txt == "":
            continue
        for t in txt.split(" "):
            cnt[t] = cnt.get(t, 0) + 1
            tt += 1
    top = max(cnt.values())
    r_top = tt / (1000 * top)
    p_top = min(1.0, math.sqrt(r_top) + r_top)
    assert p_top < 1.0  # the most frequent token IS subsampled
    # a token occurring once is always kept
    r_rare = tt / 1000
    assert math.sqrt(r_rare) + r_rare >= 1.0


# ---------------------------------------------------------------------------
# k_anonymity_audit
# ---------------------------------------------------------------------------

def test_k_anonymity_matches_pure_pandas(spark):
    """Class-size histogram must equal the pandas groupby replica and
    conserve the record count."""
    got = {r["class_size"]: r for r in QUERIES["k_anonymity_audit"](spark, SF_DIR).collect()}
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    cust["bal_band"] = (cust["c_acctbal"] / 1000).apply(math.floor)
    ks = cust.groupby(["c_nationkey", "c_mktsegment", "bal_band"]).size()
    hist = ks.value_counts().sort_index()
    assert set(got) == set(hist.index)
    n_total = len(cust)
    for size, n_classes in hist.items():
        r = got[size]
        assert r["n_classes"] == n_classes
        assert r["n_records"] == size * n_classes
        assert r["below_k5"] == int(size < 5)
        assert r["record_share_ppm"] == size * n_classes * 1_000_000 // n_total
    assert sum(r["n_records"] for r in got.values()) == n_total


# ---------------------------------------------------------------------------
# logistic_regression_irls
# ---------------------------------------------------------------------------

def _fp_sigmoid_ppm(z: int) -> int:
    """Pure-Python replica of the fixed-point sigmoid (trunc-div ints)."""
    def tdiv(a: int, b: int) -> int:
        q = abs(a) // b
        return q if a >= 0 else -q
    zc = max(min(z, 8_000_000), -8_000_000)
    q = tdiv(zc, 32)
    q2 = tdiv(q * q, 2_000_000)
    u = 1_000_000 + q + q2 + tdiv(q2 * q, 3_000_000)
    for _ in range(5):
        u = tdiv(u * u, 1_000_000)
    return tdiv(u * 1_000_000, 1_000_000 + u)


def test_fp_sigmoid_close_to_true_sigmoid():
    """The integer sigmoid must track 1/(1+e^-z) within 0.7% over the
    clip range (the documented cubic-Taylor + 5-squarings error bound)."""
    for z_micro in range(-8_000_000, 8_000_001, 250_000):
        p = _fp_sigmoid_ppm(z_micro) / 1e6
        true = 1.0 / (1.0 + math.exp(-z_micro / 1e6))
        assert abs(p - true) < 0.007, (z_micro, p, true)


def test_fp_sigmoid_symmetry_and_monotonicity():
    """p(-z) + p(z) ~ 1e6 (rational construction is reciprocal-symmetric up
    to stacked truncation; measured worst deviation 24 ppm over the clip
    range) and p is nondecreasing in z."""
    prev = -1
    for z in range(-8_000_000, 8_000_001, 100_000):
        p = _fp_sigmoid_ppm(z)
        assert p >= prev
        prev = p
        assert abs(p + _fp_sigmoid_ppm(-z) - 1_000_000) <= 30


def test_irls_matches_scipy_free_reference(spark):
    """The distributed fit must equal a pure-Python Newton-IRLS using the
    SAME fixed-point sigmoid and trunc-div staging (independent replica of
    every stage, including the Cramer solve in float64)."""
    row = QUERIES["logistic_regression_irls"](spark, SF_DIR).collect()[0]
    con = duckdb.connect()
    feats = con.execute(
        f"""SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END,
                   CAST(round(o_totalprice) AS BIGINT) // 1000,
                   year(CAST(o_orderdate AS DATE)) - 1992
            FROM read_parquet('{SF_DIR}/orders.parquet')"""
    ).fetchall()

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // b
        return q if a >= 0 else -q

    b = [0, 0, 0]
    for _ in range(4):
        g = [0, 0, 0]
        H = [[0] * 3 for _ in range(3)]
        for y, x1, x2 in feats:
            z = b[0] + b[1] * x1 + b[2] * x2
            p = _fp_sigmoid_ppm(z)
            r = y * 1_000_000 - p
            w = tdiv(p * (1_000_000 - p), 1_000_000)
            xs = (1, x1, x2)
            for i in range(3):
                g[i] += r * xs[i]
                for j in range(3):
                    H[i][j] += w * xs[i] * xs[j]
        Hf = [[float(v) for v in rw] for rw in H]
        gf = [float(v) for v in g]
        det = (Hf[0][0] * (Hf[1][1] * Hf[2][2] - Hf[1][2] * Hf[1][2])
               - Hf[0][1] * (Hf[0][1] * Hf[2][2] - Hf[1][2] * Hf[0][2])
               + Hf[0][2] * (Hf[0][1] * Hf[1][2] - Hf[1][1] * Hf[0][2]))
        d1 = (gf[0] * (Hf[1][1] * Hf[2][2] - Hf[1][2] * Hf[1][2])
              - Hf[0][1] * (gf[1] * Hf[2][2] - Hf[1][2] * gf[2])
              + Hf[0][2] * (gf[1] * Hf[1][2] - Hf[1][1] * gf[2]))
        d2 = (Hf[0][0] * (gf[1] * Hf[2][2] - gf[2] * Hf[1][2])
              - gf[0] * (Hf[0][1] * Hf[2][2] - Hf[1][2] * Hf[0][2])
              + Hf[0][2] * (Hf[0][1] * gf[2] - gf[1] * Hf[0][2]))
        d3 = (Hf[0][0] * (Hf[1][1] * gf[2] - Hf[1][2] * gf[1])
              - Hf[0][1] * (Hf[0][1] * gf[2] - gf[1] * Hf[0][2])
              + gf[0] * (Hf[0][1] * Hf[1][2] - Hf[1][1] * Hf[0][2]))
        # round-half-up like both engines' round() on these magnitudes
        from decimal import ROUND_HALF_UP, Decimal
        b = [
            b[k] + int(Decimal(d / det * 1_000_000).quantize(
                Decimal(1), rounding=ROUND_HALF_UP))
            for k, d in enumerate((d1, d2, d3))
        ]
    assert (row["b0"], row["b1"], row["b2"]) == tuple(b)
    n = len(feats)
    acc = sum(
        1 for y, x1, x2 in feats
        if (_fp_sigmoid_ppm(b[0] + b[1] * x1 + b[2] * x2) >= 500_000) == (y == 1)
    )
    assert row["accuracy_ppm"] == acc * 1_000_000 // n
    assert row["n"] == n


# ---------------------------------------------------------------------------
# loo_source_influence
# ---------------------------------------------------------------------------

def test_loo_influence_matches_refit_from_scratch(spark):
    """slope_loo for each source must equal an OLS fit on the corpus WITH
    THAT SOURCE REMOVED, computed independently in pure Python — the
    subtraction-of-sufficient-stats shortcut must be exact."""
    rows = QUERIES["loo_source_influence"](spark, SF_DIR).collect()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    pts = []
    for _, d in docs.iterrows():
        if d["text"].strip() == "":
            continue
        x = len(re.split(r"\s+", d["text"].strip()))
        y = len(re.findall(r"[.!?]+", d["text"]))
        pts.append((d["source"], x, y))

    def slope(data):
        n = len(data)
        sx = sum(x for _, x, _ in data)
        sy = sum(y for _, _, y in data)
        sxx = sum(x * x for _, x, _ in data)
        sxy = sum(x * y for _, x, _ in data)
        return (float(n) * sxy - float(sx) * sy) / (float(n) * sxx - float(sx) * sx)

    g = slope(pts)
    for r in rows:
        loo = slope([p for p in pts if p[0] != r["source"]])
        assert abs(r["slope_loo"] - loo) < 2e-6
        assert abs(r["slope_global"] - g) < 2e-6
        assert abs(r["influence"] - (r["slope_global"] - r["slope_loo"])) < 2e-6


# ---------------------------------------------------------------------------
# conversion_ab_ztest
# ---------------------------------------------------------------------------

def test_ab_ztest_matches_textbook_pooled_z(spark):
    """z must equal the pooled two-proportion formula on independently
    recomputed user-grain conversions; extremes sanity: equal rates -> z=0."""
    row = QUERIES["conversion_ab_ztest"](spark, SF_DIR).collect()[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    conv = ev.assign(c=(ev["event_type"] == "purchase").astype(int)) \
        .groupby("user_id")["c"].max()
    va = conv[conv.index % 2 == 0]
    vb = conv[conv.index % 2 == 1]
    n_a, n_b, c_a, c_b = len(va), len(vb), int(va.sum()), int(vb.sum())
    assert (row["n_a"], row["n_b"], row["c_a"], row["c_b"]) == (n_a, n_b, c_a, c_b)
    p_pool = (c_a + c_b) / (n_a + n_b)
    if p_pool in (0.0, 1.0):  # degenerate: query defines z = 0
        z = 0.0
    else:
        z = (c_a / n_a - c_b / n_b) / math.sqrt(
            p_pool * (1 - p_pool) * (1 / n_a + 1 / n_b))
    assert abs(row["z"] - z) < 2e-6
    assert row["reject_95"] == int(abs(row["z"]) > 1.959964)


# ---------------------------------------------------------------------------
# gdpr_erasure_audit
# ---------------------------------------------------------------------------

def test_gdpr_erasure_invariants(spark):
    """Head snapshot must conserve non-subject rows exactly, contain zero
    subject rows, and the pre-delete version must still expose the subject
    (the vacuum-needed invariant)."""
    row = QUERIES["gdpr_erasure_audit"](spark, SF_DIR).collect()[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    victim = ev["user_id"].min()
    n_user = int((ev["user_id"] == victim).sum())
    assert row["victim_user"] == victim
    assert row["n_before"] == len(ev)
    assert row["n_user_before"] == n_user
    assert row["n_after"] == len(ev) - n_user
    assert row["n_user_after"] == 0
    assert row["timetravel_user_rows"] == n_user
    assert n_user > 0  # fixture must actually exercise the erasure


# ---------------------------------------------------------------------------
# psi_monthly_trend
# ---------------------------------------------------------------------------

def test_psi_trend_matches_pure_python(spark):
    """Each month's psi_e8 must equal the textbook PSI computed in pure
    Python with the same integer-staged per-bin terms."""
    rows = {r["month"]: r for r in QUERIES["psi_monthly_trend"](spark, SF_DIR).collect()}
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    orders["month"] = pd.to_datetime(orders["o_orderdate"]).dt.strftime("%Y-%m")
    orders["yr"] = pd.to_datetime(orders["o_orderdate"]).dt.year
    orders["bin"] = (round(orders["o_totalprice"] * 100).astype(int) * 10
                     // 6_000_000).clip(upper=9)
    base = orders[orders["yr"] == 1992].groupby("bin").size()
    tb = int(base.sum())
    from decimal import ROUND_HALF_UP, Decimal
    for month, grp in orders[orders["yr"] > 1992].groupby("month"):
        cur = grp.groupby("bin").size()
        tc = int(cur.sum())
        psi = 0
        for b, nc in cur.items():
            nb = int(base.get(b, 0))
            if nb > 0 and nc > 0:
                term = (nb / tb - nc / tc) * math.log((nb / tb) / (nc / tc))
                psi += int(Decimal(term * 1e8).quantize(
                    Decimal(1), rounding=ROUND_HALF_UP))
        r = rows[month]
        assert r["psi_e8"] == psi, (month, r["psi_e8"], psi)
        assert r["n_orders"] == tc
        assert r["drift_flag"] == int(psi > 20_000_000)


def test_psi_identical_distribution_is_zero():
    """PSI of a distribution against itself is exactly 0 (every term has
    nb/tb == nc/tc -> log(1) = 0)."""
    counts = [5, 10, 20, 30]
    t = sum(counts)
    psi = sum((n / t - n / t) * math.log((n / t) / (n / t)) for n in counts)
    assert psi == 0.0


# ---------------------------------------------------------------------------
# neyman_allocation_sample
# ---------------------------------------------------------------------------

def test_neyman_allocation_and_sample_match_replica(spark):
    """Allocations must equal the N_h*S_h-proportional formula from exact
    sums, the drawn ids must be the hash-priority prefix per stratum, and
    the total drawn must be within one rounding unit per stratum of the
    budget."""
    got = QUERIES["neyman_allocation_sample"](spark, SF_DIR).toPandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    xs = round(orders["o_totalprice"]).astype(int)
    strata = {}
    for pr, grp in xs.groupby(orders["o_orderpriority"]):
        n = len(grp)
        sx, sxx = int(grp.sum()), int((grp * grp).sum())
        sd = math.sqrt(sxx / n - (sx / n) * (sx / n))
        strata[pr] = (n, round(n * sd * 1000))
    tot = sum(w for _, w in strata.values())
    for pr, (n, w) in strata.items():
        n_h = w * 500 // tot
        sub = got[got["stratum"] == pr]
        assert len(sub) == n_h
        assert (sub["n_h"] == n_h).all() and (sub["n_pop"] == n).all()
        # the drawn set is the md5-priority prefix
        keys = orders[orders["o_orderpriority"] == pr]["o_orderkey"]
        pri = sorted(keys, key=lambda k: (_md5_long(str(k), 53), k))[:n_h]
        assert sorted(sub["o_orderkey"]) == sorted(pri)
    assert 500 - len(strata) <= len(got) <= 500
