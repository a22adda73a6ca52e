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


# ---------------------------------------------------------------------------
# attribution_markov_removal
# ---------------------------------------------------------------------------

def test_markov_removal_matches_pure_python(spark):
    """Transition extraction, truncated absorption, and removal shares
    must equal a from-scratch pure-Python replica over the raw events."""
    got = {r["channel"]: r for r in
           QUERIES["attribution_markov_removal"](spark, SF_DIR).collect()}
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet") \
        .sort_values(["user_id", "ts", "event_id"])
    gap = pd.Timedelta(minutes=30)
    counts: dict[tuple[str, str], int] = {}

    def bump(f, t):
        counts[(f, t)] = counts.get((f, t), 0) + 1

    for _, grp in ev.groupby("user_id"):
        rows = list(grp[["ts", "event_type"]].itertuples(index=False))
        prev_ts = prev_ty = None
        for i, (ts, ty) in enumerate(rows):
            new_j = prev_ts is None or ts - prev_ts > gap or prev_ty == "purchase"
            bump("start" if new_j else prev_ty, ty)
            nxt = rows[i + 1] if i + 1 < len(rows) else None
            final = nxt is None or nxt[0] - ts > gap or ty == "purchase"
            if final and ty != "purchase":
                bump(ty, "drop")
            prev_ts, prev_ty = ts, ty
    tot: dict[str, int] = {}
    for (f, _), n in counts.items():
        tot[f] = tot.get(f, 0) + n
    p = {k: n * 1_000_000 // tot[k[0]] for k, n in counts.items()}

    def absorbed(blocked):
        v = {"start": 1_000_000}
        conv = 0
        for _ in range(8):
            inflow: dict[str, int] = {}
            add = 0
            for (f, t), pp in p.items():
                if f in v:
                    if t == "purchase":
                        add += v[f] * pp
                    elif t not in ("drop", blocked):
                        inflow[t] = inflow.get(t, 0) + v[f] * pp
            conv += add // 1_000_000
            v = {t: s // 1_000_000 for t, s in inflow.items() if s >= 1_000_000}
        return conv

    conv_full = absorbed(None)
    rem = {}
    for ch in ("click", "error", "signup", "view"):
        wo = absorbed(ch)
        rem[ch] = (max(conv_full - wo, 0) * 1_000_000 // conv_full
                   if conv_full else 0)
        r = got[ch]
        assert r["conv_full_ppm"] == conv_full
        assert r["conv_without_ppm"] == wo
        assert r["removal_ppm"] == rem[ch]
        n_in = sum(n for (f, t), n in counts.items() if t == ch)
        assert r["n_transitions_in"] == n_in
    tr = sum(rem.values())
    for ch, r in got.items():
        assert r["attribution_ppm"] == (rem[ch] * 1_000_000 // tr if tr else 0)


def test_markov_removal_ordering_invariant(spark):
    """Removing a channel can only reduce (or keep) the conversion
    probability, and attribution shares sum to <= 1e6 (floor division)."""
    rows = QUERIES["attribution_markov_removal"](spark, SF_DIR).collect()
    for r in rows:
        assert r["conv_without_ppm"] <= r["conv_full_ppm"]
        assert 0 <= r["removal_ppm"] <= 1_000_000
    s = sum(r["attribution_ppm"] for r in rows)
    assert s <= 1_000_000


# ---------------------------------------------------------------------------
# wasserstein_source_shift
# ---------------------------------------------------------------------------

def test_w1_matches_pure_python_cdf_form(spark):
    """W1 per source must equal the closed-form sum of |CDF differences|
    over the fixed bin grid, computed in pure Python with identical
    integer staging."""
    got = {r["source"]: r for r in
           QUERIES["wasserstein_source_shift"](spark, SF_DIR).collect()}
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    BINS, BW = 20, 25
    per: dict[str, list[int]] = {}
    for _, d in docs.iterrows():
        tk = 0 if d["text"].strip() == "" else len(re.split(r"\s+", d["text"].strip()))
        b = min(tk // BW, BINS - 1)
        per.setdefault(d["source"], [0] * BINS)[b] += 1
    pooled = [sum(per[s][b] for s in per) for b in range(BINS)]
    gt = sum(pooled)
    gcum, acc = [], 0
    for b in range(BINS):
        acc += pooled[b] * 1_000_000 // gt
        gcum.append(acc)
    for src, hist in per.items():
        nt = sum(hist)
        w1, acc = 0, 0
        for b in range(BINS):
            acc += hist[b] * 1_000_000 // nt
            w1 += abs(acc - gcum[b])
        r = got[src]
        assert r["n_docs"] == nt
        assert r["w1_ppm_bins"] == w1
        assert r["w1_tokens_ppm"] == w1 * BW // BINS


def test_w1_identity_and_shift_sensitivity():
    """W1 of a distribution vs itself is 0; a one-bin shift of all mass
    costs exactly 1e6 ppm-bins (the adjacency property PSI lacks)."""
    a = [0, 1_000_000, 0]
    b = [0, 0, 1_000_000]
    # cdf_a = [0, 1e6, 1e6]; cdf_b = [0, 0, 1e6]
    assert sum(abs(x - y) for x, y in zip(
        [0, 1_000_000, 1_000_000], [0, 0, 1_000_000])) == 1_000_000
    assert sum(abs(x - x) for x in a) == 0


# ---------------------------------------------------------------------------
# markov_next_event_accuracy
# ---------------------------------------------------------------------------

def test_next_event_accuracy_matches_replica(spark):
    """Pair extraction, modal prediction, and accuracy must equal a
    pure-pandas replica with the same 30-min gap and tie rules."""
    got = {r["from_s"]: r for r in
           QUERIES["markov_next_event_accuracy"](spark, SF_DIR).collect()}
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet") \
        .sort_values(["user_id", "ts", "event_id"])
    gap = pd.Timedelta(minutes=30)
    cnt: dict[tuple[str, str], int] = {}
    for _, grp in ev.groupby("user_id"):
        rows = list(grp[["ts", "event_type"]].itertuples(index=False))
        for i in range(len(rows) - 1):
            if rows[i + 1][0] - rows[i][0] <= gap:
                k = (rows[i][1], rows[i + 1][1])
                cnt[k] = cnt.get(k, 0) + 1
    froms = {f for f, _ in cnt}
    assert set(got) == froms
    for f in froms:
        outs = {t: n for (ff, t), n in cnt.items() if ff == f}
        pred = sorted(outs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        n_pairs = sum(outs.values())
        n_corr = outs.get(pred, 0)
        r = got[f]
        assert r["predicted"] == pred
        assert r["n_pairs"] == n_pairs
        assert r["n_correct"] == n_corr
        assert r["accuracy_ppm"] == n_corr * 1_000_000 // n_pairs


# ---------------------------------------------------------------------------
# content_defined_chunking
# ---------------------------------------------------------------------------

def _cdc_chunks(norm: str, w: int = 16, div: int = 64) -> list[str]:
    """Pure-Python replica of the operator's boundary rule."""
    import hashlib

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    cuts = [i + w - 1 for i in range(1, max(len(norm) - w + 1, 0) + 1)
            if h(norm[i - 1:i - 1 + w]) % div == 0]
    chunks, prev = [], 0
    for c in cuts:
        chunks.append(norm[prev:c])
        prev = c
    if prev < len(norm):
        chunks.append(norm[prev:])
    return chunks


def test_cdc_matches_pure_python_stats(spark):
    """Per-source chunk counts / mean length / distinct ratio must equal
    the pure-Python replica over the same normalized text."""
    got = {r["source"]: r for r in
           QUERIES["content_defined_chunking"](spark, SF_DIR).collect()}
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    per: dict[str, list[str]] = {}
    ndocs: dict[str, int] = {}
    for _, d in docs.iterrows():
        if d["text"].strip() == "":
            continue
        norm = re.sub(r"\s+", " ", d["text"].lower()).strip()
        per.setdefault(d["source"], []).extend(_cdc_chunks(norm))
        ndocs[d["source"]] = ndocs.get(d["source"], 0) + 1
    assert set(got) == set(per)
    for src, chunks in per.items():
        r = got[src]
        assert r["n_docs"] == ndocs[src]
        assert r["n_chunks"] == len(chunks)
        assert r["mean_chunk_chars"] == sum(len(c) for c in chunks) // len(chunks)
        assert r["distinct_chunk_ppm"] == \
            len(set(chunks)) * 1_000_000 // len(chunks)


def test_cdc_boundaries_are_insertion_stable():
    """THE content-defined property: prepending text to a document leaves
    the chunk set after the first boundary untouched (fixed windows would
    shift every chunk). Verified on a deterministic synthetic doc."""
    import hashlib
    base = " ".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(80)
    )
    edited = "zzz inserted prefix " + base
    c1 = _cdc_chunks(base)
    c2 = _cdc_chunks(edited)
    assert len(c1) > 3  # the doc actually chunks
    shared = set(c1) & set(c2)
    # everything except the first chunk of each survives the edit
    assert len(shared) >= len(c1) - 1 - 1
    # and a FIXED-window chunker would share (almost) nothing: offsets moved
    fixed1 = {base[i:i + 64] for i in range(0, len(base), 64)}
    fixed2 = {edited[i:i + 64] for i in range(0, len(edited), 64)}
    assert len(fixed1 & fixed2) <= 1


# ---------------------------------------------------------------------------
# ecdf_dkw_band
# ---------------------------------------------------------------------------

def test_dkw_band_matches_replica_and_tightens_with_n(spark):
    """ECDF values and band must equal the replica; the DKW epsilon must
    shrink ~10x for 100x the sample (sqrt law)."""
    rows = {r["threshold"]: r for r in QUERIES["ecdf_dkw_band"](spark, SF_DIR).collect()}
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    vals = round(orders["o_totalprice"]).astype(int)
    n = len(vals)
    from decimal import ROUND_HALF_UP, Decimal
    eps = int(Decimal(math.sqrt(math.log(40) / (2 * n)) * 1_000_000)
              .quantize(Decimal(1), rounding=ROUND_HALF_UP))
    for t, r in rows.items():
        n_le = int((vals <= t).sum())
        ecdf = n_le * 1_000_000 // n
        assert r["ecdf_ppm"] == ecdf
        assert r["eps_ppm"] == eps
        assert r["lo_ppm"] == max(ecdf - eps, 0)
        assert r["hi_ppm"] == min(ecdf + eps, 1_000_000)
    # sqrt law
    e_small = math.sqrt(math.log(40) / (2 * n))
    e_big = math.sqrt(math.log(40) / (2 * 100 * n))
    assert abs(e_small / e_big - 10) < 1e-9
