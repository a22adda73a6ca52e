"""Property tests for the r6i operator tranche (NDCG retrieval eval,
Benjamini-Hochberg FDR, split-conformal interval), beyond oracle parity."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import (
    _NDCG_CUM,
    _NDCG_DISC,
    QUERIES,
)

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# retrieval_eval_ndcg
# ---------------------------------------------------------------------------

def test_ndcg_discount_ladder_matches_log2():
    for i, (d, c) in enumerate(zip(_NDCG_DISC, _NDCG_CUM), start=1):
        assert d == round(1_000_000 / math.log2(i + 1))
    assert _NDCG_CUM == [sum(_NDCG_DISC[: i + 1]) for i in range(10)]


def test_ndcg_idcg_matches_counting_replica(spark):
    """IDCG must equal the greedy ideal: min(10, n2) grade-2 slots first,
    then grade-1 slots — computed straight from the label counts."""
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    lab = emb["label"].value_counts().to_dict()
    mod = (emb["label"] % 3).value_counts().to_dict()
    rows = QUERIES["retrieval_eval_ndcg"](spark, SF_DIR).collect()
    assert len(rows) == 8
    qlabel = dict(zip(emb["vec_id"], emb["label"]))
    for r in rows:
        ql = qlabel[r["query_id"]]
        n2, n1 = lab[ql] - 1, mod[ql % 3] - lab[ql]
        assert r["n2"] == n2 and r["n1"] == n1
        k2, k21 = min(10, n2), min(10, n2 + n1)
        d = lambda x: 0 if x == 0 else _NDCG_CUM[x - 1]
        assert r["idcg_micro"] == 3 * d(k2) + (d(k21) - d(k2))
        assert 0 <= r["dcg_micro"] <= r["idcg_micro"]
        assert 0 <= r["ndcg_ppm"] <= 1_000_000
        assert r["ndcg_ppm"] == r["dcg_micro"] * 1_000_000 // max(r["idcg_micro"], 1)


def test_ndcg_metric_layer_matches_independent_ranking(spark):
    """Recompute the top-10 ranking independently (DuckDB) and rebuild DCG,
    MRR, and P@10 from it in Python — the metric layer must agree."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    top = con.execute(
        """
        WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS ql
                   FROM embeddings WHERE vec_id < 8),
        c AS (SELECT vec_id AS nid, embedding AS cv, label AS nl FROM embeddings),
        s AS (SELECT qid, ql, nid, nl,
                     round(list_cosine_similarity(q.qv::DOUBLE[], c.cv::DOUBLE[]), 6) AS sim
              FROM c CROSS JOIN q WHERE nid <> qid),
        r AS (SELECT *, row_number() OVER (PARTITION BY qid
                                           ORDER BY sim DESC, nid ASC) AS rk
              FROM s)
        SELECT qid, ql, nl, rk FROM r WHERE rk <= 10
        """
    ).fetchdf()
    rows = {r["query_id"]: r for r in QUERIES["retrieval_eval_ndcg"](spark, SF_DIR).collect()}
    for qid, grp in top.groupby("qid"):
        dcg = rr = hits = 0
        first = None
        for _, t in grp.iterrows():
            rel = 2 if t["nl"] == t["ql"] else (1 if t["nl"] % 3 == t["ql"] % 3 else 0)
            gain = {2: 3, 1: 1, 0: 0}[rel]
            dcg += gain * _NDCG_DISC[int(t["rk"]) - 1]
            if rel == 2 and first is None:
                first = int(t["rk"])
            if rel >= 1:
                hits += 1
        r = rows[qid]
        assert r["dcg_micro"] == dcg
        assert r["rr_ppm"] == (0 if first is None else 1_000_000 // first)
        assert r["p_at_10_ppm"] == hits * 100_000


# ---------------------------------------------------------------------------
# fdr_bh_correction
# ---------------------------------------------------------------------------

def test_fdr_staged_erfc_tracks_libm(spark):
    """The staged-integer p must track math.erfc within the documented
    ~0.5% chain error (plus micro rounding) wherever |z| <= 4."""
    rows = QUERIES["fdr_bh_correction"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        z = min(abs(r["z_micro"]) / 1e6, 4.0)
        true_p = math.erfc(z / math.sqrt(2))
        assert abs(r["p_micro"] / 1e6 - true_p) <= 0.01 * true_p + 2e-4


def test_fdr_bh_stepup_matches_replica_and_is_conservative(spark):
    rows = sorted(
        QUERIES["fdr_bh_correction"](spark, SF_DIR).collect(),
        key=lambda r: r["bh_rank"],
    )
    m = len(rows)
    kstar = max(
        (r["bh_rank"] for r in rows if r["p_micro"] * m <= r["bh_rank"] * 50000),
        default=None,
    )
    for r in rows:
        expect = 1 if (kstar is not None and r["bh_rank"] <= kstar) else 0
        assert r["reject_bh"] == expect
        assert r["reject_naive"] == (1 if r["p_micro"] <= 50000 else 0)
        # BH never rejects what the naive test accepts (thresholds i*a/m <= a)
        assert r["reject_bh"] <= r["reject_naive"]
    # p-values are sorted by bh_rank
    ps = [r["p_micro"] for r in rows]
    assert ps == sorted(ps)


# ---------------------------------------------------------------------------
# conformal_interval
# ---------------------------------------------------------------------------

def _fold(okey, lnum):
    h = int(hashlib.md5(f"{okey}-{lnum}#17".encode()).hexdigest()[:15], 16)
    return h % 10


def test_conformal_matches_pure_python_replica(spark):
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    x = li["l_quantity"].astype(int).tolist()
    y = [int(round(p * 100)) for p in li["l_extendedprice"]]
    folds = [_fold(o, l) for o, l in zip(li["l_orderkey"], li["l_linenumber"])]
    tr = [(a, b) for a, b, f in zip(x, y, folds) if f <= 5]
    n = len(tr)
    sx = sum(a for a, _ in tr)
    sy = sum(b for _, b in tr)
    sxx = sum(a * a for a, _ in tr)
    sxy = sum(a * b for a, b in tr)
    b1 = (float(n) * sxy - float(sx) * sy) / (float(n) * sxx - float(sx) * sx)
    b1_micro = round(b1 * 1e6)
    b0_micro = round((float(sy) - b1 * sx) / float(n) * 1e6)
    resid = [abs(b - (b0_micro + b1_micro * a) // 10**6) for a, b in zip(x, y)]
    calib = sorted(r for r, f in zip(resid, folds) if f in (6, 7))
    k = (9 * (len(calib) + 1) + 9) // 10
    q = calib[k - 1]
    test = [r for r, f in zip(resid, folds) if f >= 8]
    cov = sum(1 for r in test if r <= q) * 1_000_000 // len(test)

    row = QUERIES["conformal_interval"](spark, SF_DIR).collect()[0]
    assert row["b1_micro"] == b1_micro
    assert row["b0_micro"] == b0_micro
    assert row["n_train"] == n
    assert row["n_calib"] == len(calib)
    assert row["n_test"] == len(test)
    assert row["q_cents"] == q
    assert row["coverage_ppm"] == cov


def test_conformal_coverage_near_guarantee(spark):
    """Split conformal guarantees >= 90% coverage in expectation on
    exchangeable folds; allow fixture-scale sampling noise downward."""
    row = QUERIES["conformal_interval"](spark, SF_DIR).collect()[0]
    assert 850_000 <= row["coverage_ppm"] <= 1_000_000


# ---------------------------------------------------------------------------
# page_hinkley_drift
# ---------------------------------------------------------------------------

def test_page_hinkley_matches_sequential_replica(spark):
    """PH statistic must equal the textbook sequential recursion."""
    rows = sorted(
        QUERIES["page_hinkley_drift"](spark, SF_DIR).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    cum = 0
    m_t = 0
    m_min_seen = []
    for i, r in enumerate(rows, start=1):
        cum += r["x_cents"]
        mean = cum // i
        assert r["mean_to_date_cents"] == mean
        m_t += r["x_cents"] - mean - 1000
        m_min_seen.append(m_t)
        ph = m_t - min(m_min_seen)
        assert r["ph_cents"] == ph
        assert r["alarm"] == (1 if ph > 50_000_000 else 0)
        assert ph >= 0


def test_page_hinkley_detects_injected_shift():
    """Pure-python check of the detector's semantics: a mean jump makes
    the PH statistic cross any fixed lambda while a flat series doesn't."""
    def ph_series(xs, delta=0):
        cum = m = 0
        mn = float("inf")
        out = []
        for i, x in enumerate(xs, start=1):
            cum += x
            m += x - cum // i - delta
            mn = min(mn, m)
            out.append(m - mn)
        return out
    flat = ph_series([100] * 50)
    shifted = ph_series([100] * 25 + [200] * 25)
    assert max(flat) == 0
    assert max(shifted) > 1000


# ---------------------------------------------------------------------------
# negative_sampling_unigram
# ---------------------------------------------------------------------------

def test_negative_sampling_weights_and_draws(spark):
    """Weights must equal round(1e6*c^0.75) computed via nested sqrt, the
    distribution must sum to ~1, and the 1000 hash draws must land in each
    token's cumulative bucket exactly as the python replica says."""
    import hashlib

    rows = sorted(
        QUERIES["negative_sampling_unigram"](spark, SF_DIR).collect(),
        key=lambda r: r["tok"],
    )
    assert rows
    for r in rows:
        w = round(math.sqrt(r["c"] * math.sqrt(r["c"])) * 1_000_000)
        assert r["w_micro"] == w
    tw = sum(r["w_micro"] for r in rows)
    assert abs(sum(r["p_ppm"] for r in rows) - 1_000_000) <= len(rows)
    # replica draws
    lo = 0
    buckets = []
    for r in rows:
        buckets.append((lo, lo + r["w_micro"], r["tok"]))
        lo += r["w_micro"]
    from collections import Counter
    cnt = Counter()
    for i in range(1000):
        h = int(hashlib.md5(f"ns-{i}#23".encode()).hexdigest()[:15], 16) % tw
        for b_lo, b_hi, tok in buckets:
            if b_lo <= h < b_hi:
                cnt[tok] += 1
                break
    for r in rows:
        assert r["n_sampled"] == cnt.get(r["tok"], 0)
    assert sum(r["n_sampled"] for r in rows) == 1000


# ---------------------------------------------------------------------------
# kaplan_meier_survival
# ---------------------------------------------------------------------------

def test_kaplan_meier_matches_lifelines_style_replica(spark):
    """ln-survival must equal the from-scratch KM product over the same
    durations; survival must be non-increasing and inside (0, 1e6]."""
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    t_max = ev["us"].max()
    g = ev.groupby("user_id")
    t_first = g["us"].min()
    purch = ev[ev["event_type"] == "purchase"].groupby("user_id")["us"].min()
    durs = []
    for uid, tf in t_first.items():
        if uid in purch.index:
            durs.append(((purch[uid] - tf) // 3_600_000_000, 1))
        else:
            durs.append(((t_max - tf) // 3_600_000_000, 0))
    from collections import Counter
    leave = Counter(t for t, _ in durs)
    events = Counter(t for t, e in durs if e == 1)
    n_users = len(durs)
    rows = sorted(
        QUERIES["kaplan_meier_survival"](spark, SF_DIR).collect(),
        key=lambda r: r["t_hours"],
    )
    assert [r["t_hours"] for r in rows] == sorted(events)
    seen = 0
    ln_s = 0
    prev_ppm = 1_000_000
    for r in rows:
        t = r["t_hours"]
        # risk set: users whose duration >= t
        n_risk = n_users - sum(c for tt, c in leave.items() if tt < t)
        assert r["n_risk"] == n_risk
        assert r["d"] == events[t]
        if r["d"] >= n_risk:
            term = -8_000_000
        else:
            term = round((math.log(n_risk - r["d"]) - math.log(n_risk)) * 1e6)
        ln_s += term
        assert r["ln_surv_unat"] == ln_s
        assert 0 <= r["surv_ppm"] <= prev_ppm
        prev_ppm = r["surv_ppm"]
        # the staged exp tracks libm within ~1%
        if ln_s > -8_000_000:
            assert abs(r["surv_ppm"] / 1e6 - math.exp(ln_s / 1e6)) <= 0.01 * math.exp(ln_s / 1e6) + 2e-4
