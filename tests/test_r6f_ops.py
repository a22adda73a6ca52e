"""Property tests for the r6f operator tranche (logistic calibration /
proper scoring rules, BM25 retrieval), beyond oracle parity."""

from __future__ import annotations

import math
import re

import duckdb
import pandas as pd

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES
from tests.test_r6d_ops import _fp_sigmoid_ppm

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# logistic_calibration_quality
# ---------------------------------------------------------------------------

def _feats():
    con = duckdb.connect()
    return con.execute(
        f"""SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END,
                   CAST(round(o_totalprice) AS BIGINT) // 1000,
                   year(CAST(o_orderdate AS DATE)) - 1992
            FROM read_parquet('{SF_DIR}/orders.parquet')"""
    ).fetchall()


def test_calibration_consistent_with_fit_and_scoring_rules(spark):
    """Buckets must partition the population; per-bucket means, Brier and
    log-loss must equal a pure-Python rescore using the beta the IRLS
    query itself reports (the two queries share the fit by construction)."""
    fit = QUERIES["logistic_regression_irls"](spark, SF_DIR).collect()[0]
    b = (fit["b0"], fit["b1"], fit["b2"])
    rows = {r["bucket"]: r for r in
            QUERIES["logistic_calibration_quality"](spark, SF_DIR).collect()}
    feats = _feats()

    def tdiv(a_, b_):
        q = abs(a_) // b_
        return q if a_ >= 0 else -q

    buckets: dict[int, list[tuple[int, int]]] = {}
    sq_sum = 0
    nll_sum = 0
    from decimal import ROUND_HALF_UP, Decimal
    for y, x1, x2 in feats:
        p = _fp_sigmoid_ppm(b[0] + b[1] * x1 + b[2] * x2)
        buckets.setdefault(min(p * 10 // 1_000_000, 9), []).append((y, p))
        sq_sum += (p - y * 1_000_000) ** 2 // 1_000_000
        q = p if y == 1 else 1_000_000 - p
        nll_sum += int(Decimal(-math.log(q / 1_000_000) * 1_000_000)
                       .quantize(Decimal(1), rounding=ROUND_HALF_UP))
    n = len(feats)
    assert set(rows) == set(buckets)
    assert sum(r["n"] for r in rows.values()) == n
    for bk, pts in buckets.items():
        r = rows[bk]
        assert r["n"] == len(pts)
        assert r["mean_p_ppm"] == tdiv(sum(p for _, p in pts), len(pts))
        assert r["obs_rate_ppm"] == sum(y for y, _ in pts) * 1_000_000 // len(pts)
        assert r["gap_ppm"] == r["mean_p_ppm"] - r["obs_rate_ppm"]
        assert r["brier_ppm"] == tdiv(sq_sum, n)
        assert r["logloss_micro"] == tdiv(nll_sum, n)


def test_brier_bounds_sanity():
    """Brier in ppm is bounded by [0, 1e6]; a perfect predictor scores 0
    and an always-wrong certain predictor scores ~1e6 (replica math)."""
    perfect = (1_000_000 - 1 * 1_000_000) ** 2 // 1_000_000
    assert perfect == 0
    worst = (0 - 1 * 1_000_000) ** 2 // 1_000_000
    assert worst == 1_000_000


# ---------------------------------------------------------------------------
# bm25_retrieval_topk
# ---------------------------------------------------------------------------

def test_bm25_matches_pure_python(spark):
    """Top-k docs and integer scores must equal a from-scratch replica of
    the rational-staged Okapi formula (k1=6/5, b=3/4)."""
    got = QUERIES["bm25_retrieval_topk"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    toks = {}
    for _, d in docs.iterrows():
        txt = re.sub(r"\s+", " ", d["text"].lower()).strip()
        if txt == "":
            continue
        toks[d["doc_id"]] = txt.split(" ")
    n_docs = len(toks)
    total_len = sum(len(t) for t in toks.values())
    tf: dict[tuple[int, str], int] = {}
    for did, ts in toks.items():
        for t in ts:
            tf[(did, t)] = tf.get((did, t), 0) + 1
    df: dict[str, int] = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    band = [(t, d) for t, d in df.items() if 10 <= d <= 200]
    qterms = sorted(band, key=lambda td: (-td[1], td[0]))[:5]
    idf = {t: round(math.log((n_docs - d + 0.5) / (d + 0.5) + 1) * 1000)
           for t, d in qterms}
    scores: dict[int, tuple[int, int]] = {}
    for did, ts in toks.items():
        norm = 250_000 + 750_000 * len(ts) * n_docs // total_len
        s, hits = 0, 0
        for t, im in idf.items():
            f = tf.get((did, t), 0)
            if f:
                s += im * 11 * f * 1_000_000 // (5 * f * 1_000_000 + 6 * norm)
                hits += 1
        if hits:
            scores[did] = (s, hits)
    want = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    assert list(got["doc_id"]) == [d for d, _ in want]
    assert list(got["score_milli"]) == [s for _, (s, _) in want]
    assert list(got["n_terms_hit"]) == [h for _, (_, h) in want]


def test_bm25_tf_saturation_monotone_capped():
    """The rational tf-saturation must be increasing in tf and bounded by
    idf*(k1+1): the defining Okapi property."""
    idf_m, norm = 3000, 1_000_000  # dl == avgdl
    prev = -1
    for f in range(1, 60):
        s = idf_m * 11 * f * 1_000_000 // (5 * f * 1_000_000 + 6 * norm)
        assert s >= prev
        prev = s
    assert prev <= idf_m * 11 // 5  # asymptote idf*(k1+1)
