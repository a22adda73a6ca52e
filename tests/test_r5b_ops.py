"""Property tests for the r5b operator tranche (DSIR importance weights,
tokenizer fertility, char entropy, padding-waste audit, quality-vs-dup
calibration), beyond oracle parity.

The DuckDB twins pin cross-engine equality; these pin the MATHEMATICAL
contracts — agreement with an independent pure-Python implementation,
conservation laws, and the discrimination property the operator exists to
provide (DSIR must actually tilt toward the target slice)."""

from __future__ import annotations

import hashlib
import math
import re
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"
DSIR_B = 4096


def _round_half_up(x: float) -> int:
    """Spark F.round semantics on DOUBLE: exact BigDecimal(double), HALF_UP."""
    return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.lower()).strip()


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def test_dsir_matches_pure_python_reference(spark):
    """Exact agreement (to the integer) between the distributed DSIR query
    and an independent single-process implementation of the same math:
    hashed-unigram counts, add-one smoothing, per-bucket micro-nat
    rounding, exact integer doc sums."""
    rows = {
        r["doc_id"]: r
        for r in QUERIES["dsir_importance_weights"](spark, SF_DIR).collect()
    }
    docs = _docs()
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    doc_buckets: dict[int, list[int]] = {}
    for _, d in docs.iterrows():
        txt = _norm(d["text"])
        if not txt:
            continue
        bs = [_md5_long(t) % DSIR_B for t in txt.split(" ")]
        doc_buckets[d["doc_id"]] = bs
        for b in bs:
            cr[b] = cr.get(b, 0) + 1
            if d["lang"] == "en":
                ct[b] = ct.get(b, 0) + 1
    nr, nt = sum(cr.values()), sum(ct.values())
    delta = {
        b: _round_half_up((math.log(ct.get(b, 0) + 1) - math.log(c + 1)) * 1e6)
        for b, c in cr.items()
    }
    const = _round_half_up((math.log(nr + DSIR_B) - math.log(nt + DSIR_B)) * 1e6)
    assert set(rows) == set(doc_buckets)
    for doc_id, bs in doc_buckets.items():
        expect = sum(delta[b] for b in bs) + len(bs) * const
        got = rows[doc_id]
        assert got["n_tokens"] == len(bs), doc_id
        assert got["logw_unat"] == expect, doc_id


def test_dsir_discriminates_target_slice(spark):
    """The reason DSIR exists: mean log importance weight of the target
    (English-labeled) slice must exceed the non-target mean — otherwise
    resampling by w would not tilt the corpus toward the target."""
    w = QUERIES["dsir_importance_weights"](spark, SF_DIR).collect()
    lang = _docs().set_index("doc_id")["lang"]
    en = [r["logw_unat"] for r in w if lang[r["doc_id"]] == "en"]
    other = [r["logw_unat"] for r in w if lang[r["doc_id"]] != "en"]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other) + 100000, (
        "target slice not separated by at least 0.1 nats/doc"
    )


def test_char_entropy_matches_pure_python(spark):
    """Exact agreement with an independent implementation of the integer
    entropy convention: H_unat = round(ln n * 1e6) - (sum c*round(ln c *
    1e6)) // n over the [a-z0-9 ] alphabet of normalized text."""
    rows = {
        r["doc_id"]: r
        for r in QUERIES["char_entropy_profile"](spark, SF_DIR).collect()
    }
    for _, d in _docs().iterrows():
        chars = re.findall(r"[a-z0-9 ]", _norm(d["text"]))
        if not chars:
            assert d["doc_id"] not in rows
            continue
        counts: dict[str, int] = {}
        for ch in chars:
            counts[ch] = counts.get(ch, 0) + 1
        n = len(chars)
        slc = sum(c * _round_half_up(math.log(c) * 1e6) for c in counts.values())
        expect = _round_half_up(math.log(n) * 1e6) - slc // n
        got = rows[d["doc_id"]]
        assert got["n_chars"] == n
        assert got["entropy_unat"] == expect, d["doc_id"]
        assert got["low_entropy"] == (1 if expect < 2500000 else 0)
        # entropy of a 37-symbol alphabet is bounded by ln 37
        assert 0 <= expect <= int(math.log(37) * 1e6) + 1


def test_padding_waste_conservation(spark):
    """Slots >= tokens in every bucket, waste in [0, 1e6), bucket ladder is
    powers of two, and doc counts sum to the corpus size."""
    rows = QUERIES["padding_waste_audit"](spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in rows) == len(_docs())
    for r in rows:
        assert r["seq_bucket"] in (64, 128, 256, 512, 1024, 2048)
        assert r["n_slots"] == r["n_docs"] * r["seq_bucket"]
        assert 0 <= r["n_tokens"] <= r["n_slots"]
        assert 0 <= r["waste_ppm"] < 1000000
        # every doc in a pow2 bucket uses more than half its slot (else it
        # would be in the lower bucket) -> aggregate waste < 50% + pad from
        # the <=64 floor bucket; sanity-bound at 60%
        if r["seq_bucket"] > 64:
            assert r["waste_ppm"] < 500000


def test_fertility_accounting(spark):
    """Per-language doc counts sum to the corpus; BPE-ish segments are
    never fewer than whitespace words (every word holds >= 1 segment);
    ppm ratios reproduce from the emitted numerators/denominators."""
    rows = QUERIES["tokenizer_fertility_by_lang"](spark, SF_DIR).collect()
    docs = _docs()
    assert sum(r["n_docs"] for r in rows) == len(docs)
    assert {r["lang"] for r in rows} == set(docs["lang"].unique())
    for r in rows:
        assert r["n_bpe_tokens"] >= r["n_words"], r["lang"]
        assert r["word_fertility_ppm"] == r["n_words"] * 1000000 // r["n_chars"]
        assert r["bpe_fertility_ppm"] == r["n_bpe_tokens"] * 1000000 // r["n_chars"]


def test_quality_dup_calibration_consistency(spark):
    """Deciles are balanced (sizes differ by <= 1 and sum to the corpus),
    dup accounting reconciles EXACTLY with dedup_exact's copy counts
    (cross-instrument conservation: sum of per-decile dups == total docs
    sitting in fingerprint groups of size >= 2), and dup_ppm reproduces
    from the emitted integers."""
    rows = QUERIES["quality_dup_calibration"](spark, SF_DIR).collect()
    assert len(rows) == 10
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    assert sum(sizes) == len(_docs())
    dup_total = sum(
        r["n_copies"]
        for r in QUERIES["dedup_exact"](spark, SF_DIR).collect()
        if r["n_copies"] >= 2
    )
    assert sum(r["n_dup"] for r in rows) == dup_total
    for r in rows:
        assert r["dup_ppm"] == r["n_dup"] * 1000000 // r["n_docs"]
        assert 0 <= r["n_dup"] <= r["n_docs"]


def test_bloom_semijoin_zero_false_negatives(spark):
    """The Bloom guarantee: no exact member is ever filtered out
    (bloom_pass >= exact_pass), the filter only ever reduces the fact side
    (bloom_pass <= n_fact), and the emitted ppm ratios reproduce from the
    emitted integer counts."""
    r = QUERIES["bloom_semijoin_reduction"](spark, SF_DIR).collect()[0]
    assert r["exact_pass"] <= r["bloom_pass"] <= r["n_fact"]
    assert r["fp_ppm"] == (
        0
        if r["bloom_pass"] == 0
        else (r["bloom_pass"] - r["exact_pass"]) * 1000000 // r["bloom_pass"]
    )
    assert r["reduction_ppm"] == (
        (r["n_fact"] - r["bloom_pass"]) * 1000000 // r["n_fact"]
    )
    # the probed predicate (~20% of orders) must actually reduce the fact
    # side for the instrument to be meaningful
    assert r["bloom_pass"] < r["n_fact"]


def _hll_registers(user_ids) -> dict[int, int]:
    """Pure-Python replica of the HLL register file: bucket = low 10 bits
    of the 60-bit md5 hash, rho = 51 - bitlength(top 50 bits)."""
    regs: dict[int, int] = {}
    for u in user_ids:
        h = _md5_long(str(u))
        b, v = h % 1024, h // 1024
        rho = 51 if v == 0 else 51 - v.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def test_hll_registers_match_pure_python(spark):
    """The sketch itself (n_present, v_zero, s_sum) must equal an
    independent Python construction of the registers — bit-for-bit, per
    event type — and the emitted estimate must sit within 5 sigma
    (sigma = 1.04/sqrt(1024) ~ 3.3%) of the exact distinct count."""
    events = pd.read_parquet(f"{SF_DIR}/events.parquet")
    rows = QUERIES["hll_distinct_by_source"](spark, SF_DIR).collect()
    assert len(rows) == events["event_type"].nunique()
    for r in rows:
        users = events.loc[
            events["event_type"] == r["event_type"], "user_id"
        ].unique()
        regs = _hll_registers(users)
        assert r["n_present"] == len(regs)
        assert r["v_zero"] == 1024 - len(regs)
        s = sum(1 << (51 - m) for m in regs.values()) + r["v_zero"] * (1 << 51)
        assert r["s_sum"] == s
        exact = len(users)
        assert r["exact_distinct"] == exact
        assert abs(r["hll_est"] - exact) <= max(0.165 * exact, 3), (
            r["event_type"],
            r["hll_est"],
            exact,
        )
        assert r["err_ppm"] == abs(r["hll_est"] - exact) * 1000000 // exact


def test_hll_union_is_registerwise_max(spark):
    """Merging = register-wise MAX: the union sketch must equal the merge
    of the per-type Python register files, and the union estimate must be
    within 5 sigma of the exact union (which sum_of_parts can only
    overcount)."""
    events = pd.read_parquet(f"{SF_DIR}/events.parquet")
    r = QUERIES["hll_union_merge"](spark, SF_DIR).collect()[0]
    merged: dict[int, int] = {}
    for et in events["event_type"].unique():
        for b, m in _hll_registers(
            events.loc[events["event_type"] == et, "user_id"].unique()
        ).items():
            merged[b] = max(merged.get(b, 0), m)
    assert r["n_present"] == len(merged)
    s = sum(1 << (51 - m) for m in merged.values()) + r["v_zero"] * (1 << 51)
    assert r["s_sum"] == s
    exact = events["user_id"].nunique()
    assert r["exact_union"] == exact
    assert r["sum_of_parts"] >= r["exact_union"]
    assert abs(r["hll_union_est"] - exact) <= max(0.165 * exact, 3)


def test_hll_ln_m_constant_pinned():
    """The linear-counting branch hardcodes round(ln(1024)*1e6); pin it."""
    from etl_mssql_to_postgres_dailysync_spark.plans import driver_queries as dq

    assert dq._HLL_LN_M_UNAT == _round_half_up(math.log(1024) * 1e6)
    assert dq._HLL_NUM == 721 * (1 << 71)


def test_cms_heavy_hitters_no_misses(spark):
    """The two-pass guarantee: every key whose EXACT count clears the
    threshold appears in the candidate output with is_true_hh = 1 (CMS
    only overcounts, so candidates are a superset of true heavy hitters),
    and every candidate's cms_est >= its exact count."""
    events = pd.read_parquet(f"{SF_DIR}/events.parquet")
    counts = events.groupby("user_id").size()
    t = 5 * len(events) // (4 * events["user_id"].nunique())
    true_hh = {int(u) for u, n in counts.items() if n >= t}
    rows = QUERIES["cms_heavy_hitters_twopass"](spark, SF_DIR).collect()
    got = {r["user_id"]: r for r in rows}
    assert true_hh <= set(got), f"missed heavy hitters: {true_hh - set(got)}"
    for r in rows:
        assert r["threshold"] == t
        assert r["cms_est"] >= r["exact_cnt"]
        assert r["exact_cnt"] == counts[r["user_id"]]
        assert r["is_true_hh"] == (1 if r["user_id"] in true_hh else 0)


def test_quality_selection_frontier_monotone(spark):
    """Kept mass is cumulative from the top decile down: docs_kept /
    tokens_kept strictly increase as the threshold drops, the bottom
    decile keeps everything (ppm = 1e6), score floors are non-decreasing
    in decile, and every ppm reproduces from the emitted integers."""
    rows = sorted(
        QUERIES["quality_selection_frontier"](spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    assert len(rows) == 10
    td = sum(r["n_docs"] for r in rows)
    tt = sum(r["n_tokens"] for r in rows)
    assert rows[0]["docs_kept"] == td and rows[0]["docs_kept_ppm"] == 1000000
    assert rows[0]["tokens_kept"] == tt and rows[0]["tokens_kept_ppm"] == 1000000
    for lo, hi in zip(rows, rows[1:]):
        assert lo["score_floor"] <= hi["score_floor"]
        assert lo["docs_kept"] > hi["docs_kept"]
        assert lo["docs_kept"] - lo["n_docs"] == hi["docs_kept"]
        assert lo["tokens_kept"] - lo["n_tokens"] == hi["tokens_kept"]
    for r in rows:
        assert r["docs_kept_ppm"] == r["docs_kept"] * 1000000 // td
        assert r["tokens_kept_ppm"] == r["tokens_kept"] * 1000000 // tt


def test_lsh_scurve_theory_shape(spark):
    """Endpoints exact (P=0 at J=0, P=1 at J=1), both curves strictly
    increasing, the high-recall 8x2 geometry dominates 4x4 everywhere in
    (0,1), and values agree with an independent Python evaluation of
    1-(1-J^r)^b to strict float tolerance."""
    rows = sorted(
        QUERIES["lsh_scurve_theory"](spark, SF_DIR).collect(),
        key=lambda r: r["grid_i"],
    )
    assert len(rows) == 21
    assert rows[0]["p_cand_4x4"] == 0.0 and rows[0]["p_cand_8x2"] == 0.0
    assert rows[-1]["p_cand_4x4"] == 1.0 and rows[-1]["p_cand_8x2"] == 1.0
    for lo, hi in zip(rows, rows[1:]):
        assert hi["p_cand_4x4"] > lo["p_cand_4x4"]
        assert hi["p_cand_8x2"] > lo["p_cand_8x2"]
    for r in rows[1:-1]:
        j = r["grid_i"] / 20.0
        assert r["p_cand_8x2"] > r["p_cand_4x4"]
        assert abs(r["p_cand_4x4"] - (1 - (1 - j**4) ** 4)) < 1e-12
        assert abs(r["p_cand_8x2"] - (1 - (1 - j**2) ** 8)) < 1e-12


def test_hll_incremental_monotone_registers(spark):
    """The cumulative sketch can only grow: v_zero and s_sum are
    non-increasing day over day (register-wise MAX is monotone), the
    estimate tracks the exact cumulative distinct within 5 sigma every
    day, and exact_cum matches an independent pandas recount."""
    events = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    events["day"] = events["ts"].dt.date.astype(str)
    rows = sorted(
        QUERIES["hll_incremental_daily"](spark, SF_DIR).collect(),
        key=lambda r: r["day"],
    )
    assert len(rows) == events["day"].nunique()
    seen: set = set()
    prev = None
    for r in rows:
        seen |= set(events.loc[events["day"] <= r["day"], "user_id"])
        assert r["exact_cum"] == len(seen)
        assert abs(r["hll_cum_est"] - r["exact_cum"]) <= max(
            0.165 * r["exact_cum"], 3
        ), r["day"]
        if prev is not None:
            assert r["v_zero"] <= prev["v_zero"]
            assert r["s_sum"] <= prev["s_sum"]
        prev = r


def test_dedup_survivorship_conservation(spark):
    """kept + dropped = docs per source; total kept across sources equals
    the number of distinct fingerprints (exactly one survivor per content
    cluster — reconciled against dedup_exact's group count); kept_ppm
    reproduces from the integers."""
    rows = QUERIES["dedup_survivorship_by_source"](spark, SF_DIR).collect()
    docs = _docs()
    assert sum(r["n_docs"] for r in rows) == len(docs)
    n_clusters = len(QUERIES["dedup_exact"](spark, SF_DIR).collect())
    assert sum(r["n_kept"] for r in rows) == n_clusters
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_docs"]
        assert r["kept_ppm"] == r["n_kept"] * 1000000 // r["n_docs"]


def test_sessionize_gap_sensitivity_monotone(spark):
    """Widening the gap can only merge sessions: n_sessions and
    n_singletons are non-increasing in gap_s, total events are conserved
    at every gap, the 30-min arm reconciles exactly with the standalone
    sessionize query, and ratios reproduce from the integers."""
    rows = sorted(
        QUERIES["sessionize_gap_sensitivity"](spark, SF_DIR).collect(),
        key=lambda r: r["gap_s"],
    )
    assert [r["gap_s"] for r in rows] == [900, 1800, 3600]
    n_events = rows[0]["n_events"]
    for r in rows:
        assert r["n_events"] == n_events
        assert 0 <= r["n_singletons"] <= r["n_sessions"] <= n_events
        assert r["events_per_session_milli"] == r["n_events"] * 1000 // r["n_sessions"]
    for wide, narrow in zip(rows[1:], rows):
        assert wide["n_sessions"] <= narrow["n_sessions"]
        assert wide["mean_duration_s"] >= narrow["mean_duration_s"]
    sess30 = QUERIES["sessionize"](spark, SF_DIR).count()
    assert rows[1]["n_sessions"] == sess30


def test_zorder_prunes_at_least_as_well_as_time_layout(spark):
    """Zone maps are a superset guarantee (scanned >= matched, identical
    matched/total across layouts, scanned <= total), and the Z-ordered
    layout never scans more files than the time-ordered one for the 2-D
    box — the property the layout exists to provide."""
    rows = {r["layout"]: r for r in QUERIES["zorder_pruning_audit"](spark, SF_DIR).collect()}
    assert set(rows) == {"time_ordered", "z_ordered"}
    t, z = rows["time_ordered"], rows["z_ordered"]
    assert t["rows_matched"] == z["rows_matched"]
    assert t["rows_total"] == z["rows_total"]
    for r in (t, z):
        assert r["n_files"] == 32
        assert r["rows_matched"] <= r["rows_scanned"] <= r["rows_total"]
        assert r["scan_ppm"] == r["rows_scanned"] * 1000000 // r["rows_total"]
    assert z["files_scanned"] <= t["files_scanned"]
    assert z["rows_scanned"] <= t["rows_scanned"]
