"""Property tests for the r6 operator tranche, beyond oracle parity.

Oracle twins pin cross-engine equality; these pin the MATHEMATICAL
contracts — exact agreement with an independent pure-Python replication,
the mergeability law, the bounded-state guarantee, and the deterministic
error bound the sketch's analysis promises.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_mssql_to_postgres_dailysync_spark.functions import sketches


def _cs_coords(key: str, depth: int = sketches.CS_DEPTH,
               width: int = sketches.CS_WIDTH) -> list[tuple[int, int, int]]:
    """Pure-Python replica of cs_hash_triples for one key."""
    hx = hashlib.md5(key.encode()).hexdigest()
    out = []
    for s in range(depth):
        bucket = int(hx[3 * s:3 * s + 3], 16) % width
        sign = 1 - 2 * (int(hx[3 * depth + s], 16) % 2)
        out.append((s, bucket, sign))
    return out


def _py_sketch(counts: dict[str, int]) -> dict[tuple[int, int], int]:
    sk: dict[tuple[int, int], int] = {}
    for k, c in counts.items():
        for s, b, g in _cs_coords(k):
            sk[(s, b)] = sk.get((s, b), 0) + g * c
    return sk


def _py_estimate(sk: dict[tuple[int, int], int], key: str) -> int:
    vals = sorted(g * sk.get((s, b), 0) for s, b, g in _cs_coords(key))
    return vals[len(vals) // 2]


def _df_from_counts(spark, counts: dict[str, int]):
    rows = [(k,) for k, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows, "k string")


COUNTS_A = {f"user_{i}": (i * 7) % 13 + 1 for i in range(40)}
COUNTS_B = {f"user_{i}": (i * 3) % 5 + 1 for i in range(20, 60)}


def test_countsketch_matches_pure_python_replica(spark):
    """Every (seed, bucket, counter) of the distributed build and every
    median estimate agree EXACTLY with an independent single-process
    implementation of the same scheme."""
    df = _df_from_counts(spark, COUNTS_A)
    got = {
        (r["seed"], r["bucket"]): r["counter"]
        for r in sketches.cs_build(df, "k").collect()
    }
    want_full = _py_sketch(COUNTS_A)
    want = {kb: c for kb, c in want_full.items() if c != 0}
    # the distributed build emits a row per touched (seed,bucket) even when
    # signs cancel to 0; the python replica keeps them too — compare on the
    # union with 0-defaults
    for kb in set(got) | set(want_full):
        assert got.get(kb, 0) == want_full.get(kb, 0), kb

    probes = spark.createDataFrame([(k,) for k in list(COUNTS_A)[:10]], "k string")
    est = {
        r["k"]: r["cs_est"]
        for r in sketches.cs_estimate(
            sketches.cs_build(df, "k"), probes, "k"
        ).collect()
    }
    for k in list(COUNTS_A)[:10]:
        assert est[k] == _py_estimate(want_full, k), k


def test_countsketch_merge_equals_whole(spark):
    """Mergeability: cs_merge(build(A), build(B)) == build(A ++ B) exactly,
    counter for counter — the law that makes per-day / per-partition
    sketches composable at 100 TB."""
    da = _df_from_counts(spark, COUNTS_A)
    db = _df_from_counts(spark, COUNTS_B)
    merged = {
        (r["seed"], r["bucket"]): r["counter"]
        for r in sketches.cs_merge(
            sketches.cs_build(da, "k"), sketches.cs_build(db, "k")
        ).collect()
    }
    whole = {
        (r["seed"], r["bucket"]): r["counter"]
        for r in sketches.cs_build(da.unionByName(db), "k").collect()
    }
    for kb in set(merged) | set(whole):
        assert merged.get(kb, 0) == whole.get(kb, 0), kb


def test_countsketch_state_bound_and_error_bound(spark):
    """(1) Sketch state never exceeds depth*width rows and each |counter|
    <= total input rows.  (2) Deterministic error bound: with one heavy key
    (1000 rows) and 10 singletons, every colliding singleton moves any
    bucket by at most +-1, so |median_est - 1000| <= 10 REGARDLESS of where
    the hashes land."""
    counts = {"heavy": 1000, **{f"light_{i}": 1 for i in range(10)}}
    df = _df_from_counts(spark, counts)
    sk = sketches.cs_build(df, "k")
    rows = sk.collect()
    assert len(rows) <= sketches.CS_DEPTH * sketches.CS_WIDTH
    n_total = sum(counts.values())
    assert all(abs(r["counter"]) <= n_total for r in rows)

    probes = spark.createDataFrame([("heavy",)], "k string")
    est = sketches.cs_estimate(sk, probes, "k").collect()[0]
    assert abs(est["cs_est"] - 1000) <= 10
    assert est["cs_min"] <= est["cs_est"] <= est["cs_max"]


def test_countsketch_estimate_missing_key_bounded(spark):
    """A key absent from the build side estimates near zero: each of its
    buckets holds only collision noise, bounded by the colliders' total
    count."""
    df = _df_from_counts(spark, {"only": 5})
    sk = sketches.cs_build(df, "k")
    probes = spark.createDataFrame([("never_seen",)], "k string")
    est = sketches.cs_estimate(sk, probes, "k").collect()[0]
    assert abs(est["cs_est"]) <= 5


# ---------------------------------------------------------------------------
# Winnowing fingerprints (dedup.winnow_fingerprints)
# ---------------------------------------------------------------------------

import re as _re

from etl_mssql_to_postgres_dailysync_spark.functions import dedup as _dedup


def _py_winnow(text: str, k: int = 3, w: int = 4) -> set[int]:
    """Independent pure-Python replica of the winnowing selection."""
    toks = _re.sub(r"\s+", " ", text.lower()).strip().split(" ")
    if len(toks) < k:
        return set()
    grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    M = 1 << 20
    combined = [
        int(hashlib.md5(g.encode()).hexdigest()[:10], 16) * M
        + (M - 1 - min(p + 1, M - 1))
        for p, g in enumerate(grams)
    ]
    out = set()
    for p in range(len(combined)):
        lo = max(0, p - (w - 1))
        out.add(min(combined[lo:p + 1]) // M)
    return out


def test_winnowing_matches_pure_python_replica(spark):
    """Distributed selection == independent single-process winnowing,
    fingerprint set for fingerprint set, including the partial-leading-
    window and rightmost-tie conventions."""
    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
        (3, "one two"),          # below k tokens -> no fingerprints
        (4, "a b c"),            # exactly k tokens -> single gram
        (5, "  Mixed   CASE   and    spacing   text   here   ok  "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict[int, set[int]] = {}
    for r in _dedup.winnow_fingerprints(df, "doc_id", "text").collect():
        got.setdefault(r["doc_id"], set()).add(r["fph"])
    for doc_id, text in docs:
        assert got.get(doc_id, set()) == _py_winnow(text), doc_id


def test_winnowing_detection_guarantee(spark):
    """The Schleimer guarantee: two documents sharing a token run of
    length >= w + k - 1 = 6 MUST share at least one fingerprint, wherever
    the run sits in either document."""
    shared_run = "alpha beta gamma delta epsilon zeta"
    cases = [
        (10, f"{shared_run} completely different tail words here"),
        (11, f"unrelated leading words before {shared_run}"),
        (12, f"start padding {shared_run} end padding bits"),
    ]
    base = (9, f"prefix junk tokens {shared_run} suffix junk tokens")
    df = spark.createDataFrame([base] + cases, "doc_id long, text string")
    fps: dict[int, set[int]] = {}
    for r in _dedup.winnow_fingerprints(df, "doc_id", "text").collect():
        fps.setdefault(r["doc_id"], set()).add(r["fph"])
    for doc_id, _ in cases:
        assert fps[9] & fps[doc_id], f"run of 6 tokens missed for doc {doc_id}"


def test_winnowing_density_and_coverage(spark):
    """Selection density: for a long random-ish document the fingerprint
    count is a small fraction of the gram count (expected ~2/(w+1)), and
    every window contributed (gap between consecutive selected positions
    can never exceed w) — checked via the python replica's position set."""
    toks = [f"tok{(i * 37) % 211}" for i in range(400)]
    text = " ".join(toks)
    n_grams = len(toks) - 2
    fps = _py_winnow(text)
    assert len(fps) <= n_grams
    # ~2/(w+1) = 0.4 expected; allow generous slack but reject no-op
    # sparsification (density 1.0) and over-sparsification (< 1/w density
    # would violate window coverage)
    assert n_grams * 0.1 <= len(fps) <= n_grams * 0.8


# ---------------------------------------------------------------------------
# Hybrid search RRF (plans/driver_queries.hybrid_search_rrf)
# ---------------------------------------------------------------------------

import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _round6(x: float) -> float:
    """Spark F.round semantics on DOUBLE: exact BigDecimal(double), HALF_UP."""
    return float(Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def test_hybrid_rrf_matches_pure_python_replica(spark):
    """Full independent replication at sf0.001: dense arm (sequential IEEE
    cosine fold + HALF_UP round-6, ties by id), sparse arm (micro-nat idf
    overlap), RRF fusion with 1e6 // (60 + rank) and 0 for absent — the
    top-10 per query must agree row for row."""
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")

    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb.itertuples()}
    norms = {}
    for vid, v in vecs.items():
        acc = 0.0
        for x in v:
            acc = acc + x * x
        norms[vid] = math.sqrt(acc)

    def cos(a, b):
        acc = 0.0
        for x, y in zip(vecs[a], vecs[b]):
            acc = acc + x * y
        return _round6(acc / (norms[a] * norms[b]))

    qids = [q for q in sorted(vecs) if q < 5]
    dense = {}
    for q in qids:
        scored = sorted(
            ((cos(q, c), c) for c in vecs if c != q),
            key=lambda t: (-t[0], t[1]),
        )[:20]
        dense[q] = {c: r + 1 for r, (_, c) in enumerate(scored)}

    toks = {
        r.doc_id: set(_re.sub(r"\s+", " ", r.text.lower()).strip().split(" ")) - {""}
        for r in docs.itertuples()
    }
    df_cnt: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            df_cnt[t] = df_cnt.get(t, 0) + 1
    nd = sum(1 for ts in toks.values() if ts)
    ln_u = lambda x: int(Decimal(math.log(x) * 1e6).quantize(
        Decimal(1), rounding=ROUND_HALF_UP))
    sparse = {}
    for q in qids:
        scores = {}
        for c, ts in toks.items():
            if c == q:
                continue
            shared = toks[q] & ts
            if shared:
                scores[c] = sum(ln_u(nd) - ln_u(df_cnt[t]) for t in shared)
        ranked = sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:20]
        sparse[q] = {c: r + 1 for r, (c, _) in enumerate(ranked)}

    want = {}
    for q in qids:
        fused = {}
        for c in set(dense[q]) | set(sparse[q]):
            dr, sr = dense[q].get(c, 0), sparse[q].get(c, 0)
            ppm = (1000000 // (60 + dr) if dr else 0) + (
                1000000 // (60 + sr) if sr else 0)
            fused[c] = (dr, sr, ppm)
        top = sorted(fused.items(), key=lambda t: (-t[1][2], t[0]))[:10]
        for fr, (c, (dr, sr, ppm)) in enumerate(top):
            want[(q, c)] = (dr, sr, ppm, fr + 1)

    got = {
        (r["query_id"], r["neighbor_id"]): (
            r["dense_rank"], r["sparse_rank"], r["rrf_ppm"], r["fused_rank"])
        for r in QUERIES["hybrid_search_rrf"](spark, SF_DIR).collect()
    }
    assert got == want


def test_hybrid_rrf_both_arms_dominate(spark):
    """RRF contract: any result present in BOTH arms outranks any result
    of the same query present in only one arm at equal-or-worse arm rank
    (its ppm strictly exceeds either single contribution)."""
    rows = QUERIES["hybrid_search_rrf"](spark, SF_DIR).collect()
    for r in rows:
        if r["dense_rank"] > 0 and r["sparse_rank"] > 0:
            both = 1000000 // (60 + r["dense_rank"]) + 1000000 // (
                60 + r["sparse_rank"])
            assert r["rrf_ppm"] == both
            assert r["rrf_ppm"] > 1000000 // (60 + r["dense_rank"])
        else:
            arm = max(r["dense_rank"], r["sparse_rank"])
            assert r["rrf_ppm"] == 1000000 // (60 + arm)


# ---------------------------------------------------------------------------
# JL projection distortion (plans/driver_queries.jl_projection_distortion)
# ---------------------------------------------------------------------------


def _jl_sign(i: int, j: int) -> int:
    return 1 - 2 * (int(hashlib.md5(f"jl_{i}_{j}".encode()).hexdigest()[0], 16) % 2)


def test_jl_matches_pure_python_replica(spark):
    """Exact integer agreement with an independent replication of the
    quantization, Rademacher projection, both distance arms and the
    HUGEINT ratio at sf0.001."""
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    emb = emb[emb.vec_id < 32]
    q = {
        r.vec_id: [_round_q(float(x)) for x in r.embedding]
        for r in emb.itertuples()
    }
    proj = {
        vid: [sum(_jl_sign(i, j) * xi for i, xi in enumerate(qs))
              for j in range(16)]
        for vid, qs in q.items()
    }
    want = {}
    ids = sorted(q)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            d2f = sum((x - y) ** 2 for x, y in zip(q[a], q[b]))
            d2p = sum((x - y) ** 2 for x, y in zip(proj[a], proj[b]))
            want[(a, b)] = (d2f, d2p, d2p * 1000000 // (16 * d2f))
    got = {
        (r["vec_a"], r["vec_b"]): (r["d2_full"], r["d2_proj"], r["ratio_ppm"])
        for r in QUERIES["jl_projection_distortion"](spark, SF_DIR).collect()
    }
    assert got == want


def _round_q(x: float) -> int:
    """QUANT_SCALE micro-quantization with Spark F.round HALF_UP."""
    return int(Decimal(x * 1000000.0).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def test_jl_concentration_law(spark):
    """E[d2_proj] = k * d2_full for Rademacher projections: the measured
    ratio distribution must center near 1e6 ppm and not collapse — the
    property that makes the 4x-cheaper projected space usable at all."""
    rows = QUERIES["jl_projection_distortion"](spark, SF_DIR).collect()
    ratios = [r["ratio_ppm"] for r in rows]
    assert len(ratios) == 32 * 31 // 2
    mean = sum(ratios) / len(ratios)
    assert 700_000 < mean < 1_300_000
    inside = sum(1 for r in ratios if 300_000 < r < 2_200_000)
    assert inside >= len(ratios) * 0.8
    assert all(r["d2_proj"] >= 0 and r["d2_full"] > 0 for r in rows)


# ---------------------------------------------------------------------------
# Theil-Sen trend (plans/driver_queries.theil_sen_trend)
# ---------------------------------------------------------------------------

import datetime as _dt


def test_theil_sen_matches_pure_python_replica(spark):
    """Independent replication at sf0.001: daily cents, all pairwise
    floor-division slopes, lower-middle medians, HUGEINT OLS — every
    output integer must match exactly."""
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    d = orders.copy()
    d["day"] = pd.to_datetime(d["o_orderdate"]).dt.date
    lo, hi = _dt.date(1995, 1, 1), _dt.date(1995, 3, 31)
    d = d[(d.day >= lo) & (d.day <= hi)]
    d["cents"] = d["o_totalprice"].map(_round_cents)
    daily = d.groupby("day")["cents"].sum()
    epoch = _dt.date(1992, 1, 1)
    xs = [( (day - epoch).days, int(c)) for day, c in sorted(daily.items())]

    slopes = []
    for ai in range(len(xs)):
        for bi in range(ai + 1, len(xs)):
            (xa, ca), (xb, cb) = xs[ai], xs[bi]
            # floor division == the offset-trick expression on both engines
            slopes.append(((cb - ca) * 1000) // (xb - xa))
    slopes.sort()
    n_pairs = len(slopes)
    ts_slope = slopes[(n_pairs + 1) // 2 - 1]
    resid = sorted(c * 1000 - ts_slope * x for x, c in xs)
    n_days = len(xs)
    ts_icept = resid[(n_days + 1) // 2 - 1]

    n = len(xs)
    sx = sum(x for x, _ in xs)
    sy = sum(c for _, c in xs)
    sxy = sum(x * c for x, c in xs)
    sxx = sum(x * x for x, _ in xs)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    ols = (num * 1000) // den  # floor division, den > 0

    row = QUERIES["theil_sen_trend"](spark, SF_DIR).collect()[0]
    assert row["n_days"] == n_days
    assert row["n_pairs"] == n_pairs
    assert row["ts_slope_milli"] == ts_slope
    assert row["ts_intercept_milli"] == ts_icept
    assert row["ols_slope_milli"] == ols
    assert min(slopes) <= row["ts_slope_milli"] <= max(slopes)


def _round_cents(x: float) -> int:
    return int(Decimal(x * 100.0).quantize(Decimal(1), rounding=ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# MMR diversified retrieval (similarity.mmr_select)
# ---------------------------------------------------------------------------

from etl_mssql_to_postgres_dailysync_spark.functions import similarity as _sim


def test_mmr_greedy_matches_pure_python(spark):
    """The applyInPandas greedy loop on a hand-built candidate matrix must
    reproduce the textbook MMR trace exactly — including the first pick
    (pure relevance), the penalty switch-on, and ascending-id tie-breaks."""
    # candidates: 1 (rel 90), 2 (rel 89, near-dup of 1), 3 (rel 50), 4 (rel 50)
    rel = {1: 90, 2: 89, 3: 50, 4: 50}
    sim = {(1, 2): 95, (2, 1): 95, (1, 3): 10, (3, 1): 10,
           (1, 4): 10, (4, 1): 10, (2, 3): 10, (3, 2): 10,
           (2, 4): 10, (4, 2): 10, (3, 4): 0, (4, 3): 0}
    rows = [
        (0, a, rel[a], b, sim[(a, b)])
        for a in rel for b in rel if a != b
    ]
    pf = spark.createDataFrame(
        rows, "query_id long, a long, rel long, b long, s long")
    got = [
        (r["vec_id"], r["mmr_rank"], r["score_x10micro"])
        for r in _sim.mmr_select(pf, 3).orderBy("mmr_rank").collect()
    ]
    # pick 1: argmax 7*rel -> cand 1 (630)
    # pick 2: cand 2 key 7*89-3*95=338; cand 3/4 key 7*50-3*10=320 -> cand 2
    # pick 3: cand 3 key 320, cand 4 key 320 -> tie -> lower id 3
    assert got == [(1, 1, 630), (2, 2, 338), (3, 3, 320)]


def test_mmr_registered_query_diversifies(spark):
    """On the real corpus the MMR top-5 must (a) start from the cosine
    argmax, (b) never repeat a candidate, (c) produce non-increasing
    greedy score keys per query, and (d) come from the top-20 candidate
    pool of the first stage."""
    from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES as Q

    mmr = Q["mmr_diversified_topk"](spark, SF_DIR).collect()
    brute = Q["similarity_brute_topk"](spark, SF_DIR).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in brute if r["rank"] == 1}
    by_q: dict[int, list] = {}
    for r in sorted(mmr, key=lambda r: (r["query_id"], r["mmr_rank"])):
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 5
    for q, rows in by_q.items():
        ids = [r["vec_id"] for r in rows]
        assert len(ids) == len(set(ids)) == 5
        assert ids[0] == top1[q], "first MMR pick must be the cosine argmax"
        keys = [r["score_x10micro"] for r in rows]
        # greedy keys can only fall once the penalty is active (rank >= 2)
        assert all(keys[i] >= keys[i + 1] for i in range(1, len(keys) - 1))


# ---------------------------------------------------------------------------
# Multi-touch attribution (plans/driver_queries.attribution_multi_touch)
# ---------------------------------------------------------------------------


def test_attribution_conservation_laws(spark):
    """Credit conservation: summed over channels, (a) first-touch and
    last-touch credit each equal exactly 1e6 per attributed conversion,
    (b) linear credit equals 1e6 per conversion minus only truncation
    remainders (< n_touches per conversion), (c) U-shaped likewise.
    Checked against an independent pandas replication of the 24h-lookback
    pairing."""
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["ts"] = pd.to_datetime(ev["ts"])
    conv = ev[ev.event_type == "purchase"]
    touch = ev[ev.event_type.isin(["view", "click", "signup"])]
    per_conv = {}
    for c in conv.itertuples():
        t = touch[(touch.user_id == c.user_id)
                  & (touch.ts < c.ts)
                  & (touch.ts >= c.ts - pd.Timedelta(hours=24))]
        if len(t):
            per_conv[c.event_id] = t.sort_values(["ts", "event_id"])
    n_attr = len(per_conv)

    rows = QUERIES["attribution_multi_touch"](spark, SF_DIR).collect()
    tot_first = sum(r["first_touch_ppm"] for r in rows)
    tot_last = sum(r["last_touch_ppm"] for r in rows)
    tot_linear = sum(r["linear_ppm"] for r in rows)
    tot_ushape = sum(r["ushape_ppm"] for r in rows)
    tot_touches = sum(r["n_touches"] for r in rows)

    assert tot_first == n_attr * 1000000
    assert tot_last == n_attr * 1000000
    assert tot_touches == sum(len(t) for t in per_conv.values())
    # linear: each conversion contributes n * (1e6 // n) in [1e6-n+1, 1e6]
    lin_exact = sum(len(t) * (1000000 // len(t)) for t in per_conv.values())
    assert tot_linear == lin_exact
    # u-shape replication
    def ush(n):
        if n == 1:
            return 1000000
        if n == 2:
            return 1000000
        return 800000 + (n - 2) * (200000 // (n - 2))
    assert tot_ushape == sum(ush(len(t)) for t in per_conv.values())


# ---------------------------------------------------------------------------
# Kneser-Ney bigram (plans/driver_queries.text_kneser_ney_bigram)
# ---------------------------------------------------------------------------


def test_kneser_ney_matches_pure_python_replica(spark):
    """Exact integer agreement with an independent replication of the
    count tables and the staged-truncation KN formula at sf0.001; plus
    the probability-mass law: for every context x in the result, the KN
    mass summed over ALL observed successors stays <= 1e6 ppm (unseen
    continuation mass is non-negative; truncation only lowers sums)."""
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    c12: dict[tuple[str, str], int] = {}
    for t in docs.itertuples():
        txt = _re.sub(r"\s+", " ", t.text.lower()).strip()
        if not txt:
            continue
        toks = txt.split(" ")
        for i in range(len(toks) - 1):
            c12[(toks[i], toks[i + 1])] = c12.get((toks[i], toks[i + 1]), 0) + 1
    c1: dict[str, int] = {}
    n1fw: dict[str, int] = {}
    n1bw: dict[str, int] = {}
    for (x, y), c in c12.items():
        c1[x] = c1.get(x, 0) + c
        n1fw[x] = n1fw.get(x, 0) + 1
        n1bw[y] = n1bw.get(y, 0) + 1
    nbt = len(c12)

    def pkn(x, y):
        t1 = (max(c12[(x, y)] * 1000 - 750, 0) * 1000000) // (c1[x] * 1000)
        t2 = (750 * n1bw[y] * 1000000 // nbt) * n1fw[x] // (c1[x] * 1000)
        return t1 + t2

    top = sorted(c12.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    want = {
        (x, y): (c, c1[x], n1fw[x], n1bw[y], nbt, pkn(x, y),
                 c * 1000000 // c1[x])
        for (x, y), c in top
    }
    got = {
        (r["x"], r["y"]): (r["c12"], r["c1"], r["n1fw"], r["n1bw"], r["nbt"],
                           r["pkn_ppm"], r["pml_ppm"])
        for r in QUERIES["text_kneser_ney_bigram"](spark, SF_DIR).collect()
    }
    assert got == want

    for x in {x for (x, _) in got}:
        mass = sum(pkn(x, y) for (xx, y) in c12 if xx == x)
        assert mass <= 1000000, x


# ---------------------------------------------------------------------------
# HLL sliding 28d (plans/driver_queries.hll_sliding_28d_users)
# ---------------------------------------------------------------------------


def _hll_regs(user_ids) -> dict[int, int]:
    regs: dict[int, int] = {}
    for u in user_ids:
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
        b, v = h % 1024, h // 1024
        rho = 51 if v == 0 else 51 - v.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def test_hll_sliding_registers_expire_old_days(spark):
    """The register file at each day must equal an HLL built from ONLY the
    trailing 28 days' users (pure-python replication) — i.e. the window
    genuinely expires old days, which the cumulative variant cannot.
    Checked via v_zero/s_sum on the last day (whose window drops the first
    two fixture days) and on an early day (prefix regime)."""
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    rows = {r["day"]: r for r in
            QUERIES["hll_sliding_28d_users"](spark, SF_DIR).collect()}
    epoch = _dt.date(2024, 1, 1)
    for probe_day in [max(rows), min(rows)]:
        d = _dt.date.fromisoformat(probe_day)
        x = (d - epoch).days
        sel = ev[((pd.to_datetime(ev.ts).dt.date.map(lambda v: (v - epoch).days))
                  .between(x - 27, x))]
        regs = _hll_regs(sel["user_id"])
        v_zero = 1024 - len(regs)
        s_sum = sum(1 << (51 - regs.get(b, 0)) for b in range(1024))
        assert rows[probe_day]["v_zero"] == v_zero, probe_day
        assert rows[probe_day]["s_sum"] == s_sum, probe_day
        exact = sel["user_id"].nunique()
        assert rows[probe_day]["exact_28d"] == exact


def test_hll_sliding_prefix_equals_cumulative(spark):
    """Consistency law between two registered queries: within the first 28
    days the sliding window covers the whole history, so its estimate must
    equal hll_incremental_daily's cumulative estimate day for day."""
    slide = {r["day"]: r for r in
             QUERIES["hll_sliding_28d_users"](spark, SF_DIR).collect()}
    cum = {r["day"]: r for r in
           QUERIES["hll_incremental_daily"](spark, SF_DIR).collect()}
    epoch = _dt.date(2024, 1, 1)
    checked = 0
    for day, r in slide.items():
        if (_dt.date.fromisoformat(day) - epoch).days <= 27:
            assert r["s_sum"] == cum[day]["s_sum"], day
            assert r["hll_28d_est"] == cum[day]["hll_cum_est"], day
            checked += 1
    assert checked >= 20


# ---------------------------------------------------------------------------
# CV near-dup leakage (plans/driver_queries.cv_leakage_neardup)
# ---------------------------------------------------------------------------


def test_cv_leakage_conserves_pair_mass_and_flags(spark):
    """The fold x fold matrix must partition the exact pair set produced by
    dedup_minhash_lsh (conservation), each cell's leak flag must equal
    fold_lo != fold_hi, and every pair's fold ids must replay the
    cv_fold_assignment hash rule (pure-python md5 replica)."""
    rows = QUERIES["cv_leakage_neardup"](spark, SF_DIR).collect()
    pairs = QUERIES["dedup_minhash_lsh"](spark, SF_DIR).collect()
    assert sum(r["n_pairs"] for r in rows) == len(pairs)
    for r in rows:
        assert r["leak"] == (1 if r["fold_lo"] != r["fold_hi"] else 0)
        assert 0 <= r["fold_lo"] <= r["fold_hi"] <= 4

    def fold(doc_id):
        h = int(hashlib.md5(f"{doc_id}#42".encode()).hexdigest()[:15], 16)
        return h % 5

    from collections import Counter

    expect = Counter()
    for p in pairs:
        fa, fb = fold(p["id_a"]), fold(p["id_b"])
        expect[(min(fa, fb), max(fa, fb))] += 1
    got = {(r["fold_lo"], r["fold_hi"]): r["n_pairs"] for r in rows}
    assert got == dict(expect)
    total = len(pairs)
    for r in rows:
        assert r["share_ppm"] == r["n_pairs"] * 1000000 // total


# ---------------------------------------------------------------------------
# HLL intersection (plans/driver_queries.hll_intersection_ie)
# ---------------------------------------------------------------------------


def test_hll_intersection_inclusion_exclusion_law(spark):
    """est_inter must be exactly est_a + est_b - est_union on every row,
    the per-type arms must agree with hll_distinct_by_source, and the
    exact_inter audit column must equal a pandas recount of the pairwise
    user-set overlap."""
    rows = QUERIES["hll_intersection_ie"](spark, SF_DIR).collect()
    assert rows
    per_type = {r["event_type"]: r["hll_est"]
                for r in QUERIES["hll_distinct_by_source"](spark, SF_DIR).collect()}
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    sets = {t: set(g["user_id"]) for t, g in ev.groupby("event_type")}
    for r in rows:
        assert r["est_inter"] == r["est_a"] + r["est_b"] - r["est_union"]
        assert r["est_a"] == per_type[r["type_a"]]
        assert r["est_b"] == per_type[r["type_b"]]
        assert r["exact_inter"] == len(sets[r["type_a"]] & sets[r["type_b"]])


def test_hll_intersection_union_register_merge(spark):
    """For one probe pair, the union estimate must equal the estimate of an
    HLL register file built from scratch over A ∪ B's users (pure-python) —
    i.e. the register-wise MAX merge is lossless."""
    rows = QUERIES["hll_intersection_ie"](spark, SF_DIR).collect()
    r0 = rows[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    users = set(ev[ev.event_type.isin([r0["type_a"], r0["type_b"]])]["user_id"])
    regs = _hll_regs(users)
    v_zero = 1024 - len(regs)
    s_sum = sum(1 << (51 - regs.get(b, 0)) for b in range(1024))
    raw = (721 * (1 << 71)) // (1000 * s_sum)
    if v_zero > 0 and raw < 2560:
        import math
        est = 1024 * (6931472 - round(math.log(v_zero) * 1000000)) // 1000000
    else:
        est = raw
    assert r0["est_union"] == est


# ---------------------------------------------------------------------------
# Hard-negative mining (plans/driver_queries.hard_negative_mining)
# ---------------------------------------------------------------------------


def test_hard_negatives_match_numpy_replica(spark):
    """Ranks, ids, sims, and margins must agree with an independent numpy
    recomputation of rounded cosine over the full fixture — negatives are
    the top-3 different-label, the positive is the top-1 same-label, ties
    break to lower id."""
    import numpy as np

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    V = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    n = V / np.linalg.norm(V, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    rows = QUERIES["hard_negative_mining"](spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(ids[ids < 10])
    for qid, rs in by_q.items():
        qi = int(np.where(ids == qid)[0][0])
        sims = np.round(n @ n[qi], 6)
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != qid),
            key=lambda i: (-sims[i], ids[i]),
        )
        negs = [i for i in order if labels[i] != labels[qi]][:3]
        pos = next(i for i in order if labels[i] == labels[qi])
        rs.sort(key=lambda r: r["rank"])
        assert [r["neg_id"] for r in rs] == [ids[i] for i in negs]
        for r, i in zip(rs, negs):
            assert r["neg_sim"] == pytest.approx(sims[i], abs=2e-6)
            assert r["pos_id"] == ids[pos]
            assert r["margin"] == pytest.approx(r["neg_sim"] - r["pos_sim"])


def test_hard_negatives_exclude_same_label_and_self(spark):
    """No negative may share the anchor's label or be the anchor itself;
    every positive must share it."""
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    lab = dict(zip(emb["vec_id"], emb["label"]))
    for r in QUERIES["hard_negative_mining"](spark, SF_DIR).collect():
        assert r["neg_id"] != r["query_id"]
        assert lab[r["neg_id"]] != lab[r["query_id"]]
        assert lab[r["pos_id"]] == lab[r["query_id"]]


# ---------------------------------------------------------------------------
# TF-IDF cosine pairs (plans/driver_queries.tfidf_cosine_pairs)
# ---------------------------------------------------------------------------


def test_tfidf_cosine_matches_pandas_replica(spark):
    """Pair set, integer dots, common-term counts, and rounded cosines must
    agree exactly with an independent pandas/numpy replication of the
    df-capped TF-IDF scheme (HALF_UP milli-nat idf, int64 weights)."""
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    n_docs = len(docs)
    tf: dict[tuple[int, str], int] = {}
    for doc_id, txt in zip(docs["doc_id"], docs["text"]):
        for t in _re.sub(r"\s+", " ", txt.lower()).strip().split(" "):
            tf[(doc_id, t)] = tf.get((doc_id, t), 0) + 1
    df: dict[str, int] = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    kept = {t for t, d in df.items() if 2 <= d <= 50}
    idf = {
        t: int(Decimal(math.log(n_docs / df[t]) * 1000)
               .quantize(Decimal(1), rounding=ROUND_HALF_UP))
        for t in kept
    }
    w: dict[int, dict[str, int]] = {}
    for (doc_id, t), c in tf.items():
        if t in kept:
            w.setdefault(doc_id, {})[t] = c * idf[t]
    n2 = {d: sum(v * v for v in ws.values()) for d, ws in w.items()}
    expect = {}
    ids = sorted(w)
    for i, da in enumerate(ids):
        for db in ids[i + 1:]:
            common = set(w[da]) & set(w[db])
            if not common:
                continue
            dot = sum(w[da][t] * w[db][t] for t in common)
            sim = round(dot / (math.sqrt(n2[da]) * math.sqrt(n2[db])), 6)
            if sim >= 0.25:
                expect[(da, db)] = (dot, len(common), sim)
    got = {
        (r["id_a"], r["id_b"]): (r["dot"], r["n_common"], r["cos_sim"])
        for r in QUERIES["tfidf_cosine_pairs"](spark, SF_DIR).collect()
    }
    assert set(got) == set(expect)
    for k in got:
        assert got[k][0] == expect[k][0], k
        assert got[k][1] == expect[k][1], k
        assert got[k][2] == pytest.approx(expect[k][2], abs=1e-9), k


def test_tfidf_pairs_need_rare_shared_vocabulary(spark):
    """Every reported pair must share at least one kept-df term and its
    cosine must sit in (0, 1] — the df cap guarantees no pair rides on
    ubiquitous stop-terms alone."""
    rows = QUERIES["tfidf_cosine_pairs"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_common"] >= 1
        assert 0 < r["cos_sim"] <= 1.0
        assert r["dot"] > 0


# ---------------------------------------------------------------------------
# PCA power iteration (plans/driver_queries.pca_power_iteration)
# ---------------------------------------------------------------------------


def _py_pca_reference(sf_dir):
    """Pure-Python staged-integer replica of the registered scheme."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = [
        [int(Decimal(float(x) * 1000000).quantize(Decimal(1), rounding=ROUND_HALF_UP))
         for x in v]
        for v in emb["embedding"]
    ]
    d = len(vecs[0])
    n = len(vecs)
    OFF = 1_000_000_000_000
    S = [[0] * d for _ in range(d)]
    for v in vecs:
        for i in range(d):
            for j in range(d):
                S[i][j] += v[i] * v[j]
    S = [[(S[i][j] + OFF * n) // n - OFF for j in range(d)] for i in range(d)]
    v = [1_000_000] * d
    for _ in range(4):
        w = [sum(S[i][j] * v[j] for j in range(d)) for i in range(d)]
        mx = max(abs(x) for x in w)
        v = [(w[i] * 1_000_000 + 2_000_000 * mx) // mx - 2_000_000 for i in range(d)]
    top = max(range(d), key=lambda i: (abs(v[i]), -i))
    if v[top] < 0:
        v = [-x for x in v]
    vsv = sum(S[i][j] * v[i] * v[j] for i in range(d) for j in range(d))
    vv = sum(x * x for x in v)
    lam = vsv // vv
    trace = sum(S[i][i] for i in range(d))
    return v, lam, trace, S


def test_pca_power_iteration_matches_python_replica(spark):
    """Distributed staged-integer iteration == single-process replica,
    component for component, including lambda, trace, and share."""
    v, lam, trace, _ = _py_pca_reference(SF_DIR)
    rows = sorted(QUERIES["pca_power_iteration"](spark, SF_DIR).collect(),
                  key=lambda r: r["dim_i"])
    assert [r["v_unit"] for r in rows] == v
    for r in rows:
        assert r["lambda_unit"] == lam
        assert r["trace_unit"] == trace
        assert r["share_ppm"] == lam * 1000000 // trace


def test_pca_direction_rayleigh_properties(spark):
    """Spectral contract: the reported lambda is a RAYLEIGH LOWER BOUND on
    the true top eigenvalue (numpy eigendecomposition as the truth arm),
    the per-iteration Rayleigh sequence is monotone nondecreasing (PSD
    power-iteration law), and on this near-isotropic fixture 4 iterations
    must still capture >= 80% of the top eigenvalue.  Exact convergence is
    GAP-LIMITED ((lambda2/lambda1)^2t); random embeddings have a tiny gap,
    which is precisely what a small share_ppm reports."""
    import numpy as np

    _, lam, _, S = _py_pca_reference(SF_DIR)
    Sa = np.array(S, dtype=np.float64)
    true_top = float(np.linalg.eigvalsh(Sa)[-1])
    assert lam <= true_top * (1 + 1e-9) + 1
    assert lam >= 0.8 * true_top
    d = len(S)
    v = [1_000_000] * d
    prev = None
    for _ in range(4):
        w = [sum(S[i][j] * v[j] for j in range(d)) for i in range(d)]
        mx = max(abs(x) for x in w)
        v = [(w[i] * 1_000_000 + 2_000_000 * mx) // mx - 2_000_000
             for i in range(d)]
        ray = (sum(S[i][j] * v[i] * v[j] for i in range(d) for j in range(d))
               // sum(x * x for x in v))
        if prev is not None:
            assert ray >= prev - 1  # integer-floor jitter tolerance
        prev = ray
    assert prev == lam


# ---------------------------------------------------------------------------
# HDR quantile sketch (plans/driver_queries.hdr_quantile_sketch)
# ---------------------------------------------------------------------------


def _hdr_idx(cents: int) -> int:
    if cents < 128:
        return cents
    msb = cents.bit_length() - 1
    return msb * 128 + (cents >> (msb - 7)) - 128


def test_hdr_sketch_containment_and_error_bound(spark):
    """The relative-error CONTRACT: for every percentile the exact value
    must lie inside the chosen cell, the cell width must be < 1/128 of its
    lower bound, rel_err_ppm must stay under the ~3907 ppm midpoint bound,
    and the chosen cell must replay a pure-python bucketing of the
    fixture."""
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = sorted(
        int(Decimal(float(p) * 100).quantize(Decimal(1), rounding=ROUND_HALF_UP))
        for p in orders["o_totalprice"]
    )
    n = len(cents)
    rows = QUERIES["hdr_quantile_sketch"](spark, SF_DIR).collect()
    assert {r["pct"] for r in rows} == {50, 90, 95, 99}
    for r in rows:
        assert r["lo_cents"] <= r["exact_cents"] <= r["hi_cents"]
        assert (r["hi_cents"] - r["lo_cents"]) * 128 < r["lo_cents"] + 128
        assert r["rel_err_ppm"] <= 3907
        exact = cents[(r["pct"] * n + 99) // 100 - 1]
        assert r["exact_cents"] == exact
        assert r["bucket_idx"] == _hdr_idx(exact)
        assert r["est_cents"] == (r["lo_cents"] + r["hi_cents"]) // 2


def test_hdr_bucketing_is_monotone_and_mergeable():
    """Structural laws of the cell function itself: monotone nondecreasing
    in the value (so cumulative counts give exact rank bounds) and exactly
    reconstructible bounds — checked over every value up to 2^14 and a
    log-spread of larger probes."""
    probes = list(range(1, 1 << 14)) + [
        (1 << s) + d for s in range(14, 40) for d in (0, 1, (1 << s) - 1)
    ]
    prev = -1
    for v in sorted(probes):
        idx = _hdr_idx(v)
        assert idx >= prev
        prev = idx
        if idx < 128:
            lo = hi = idx
        else:
            lo = (128 + idx % 128) << (idx // 128 - 7)
            hi = lo + (1 << (idx // 128 - 7)) - 1
        assert lo <= v <= hi, v
        assert (hi - lo) * 128 < lo + 128
