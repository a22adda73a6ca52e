"""Independent mathematical-invariant pins over the r5/r6 statistical tranche
(r7 verdict ask #1 — the friedman_test_blocks lesson applied retroactively).

Oracle twins pin CROSS-ENGINE equality, but both sides are authored by the
same builder: a shared formula error is invisible to hash parity
(friedman_test_blocks shipped oracle-green with Q = 3.0 instead of
12/(nk(k+1)) until a non-negativity pin caught it — commit 995affb). Every
test here asserts a property the query's MATHEMATICS guarantees, derived
from the published definition of the statistic, not from the
implementation: range bounds (KS/AUC/rho in their domains), exact internal
identities (inclusion-exclusion, gap = predicted - observed, n_pairs =
n(n-1)/2), monotonicity contracts (KM survival nonincreasing, isotonic fit
nondecreasing, BH rejections form a rank prefix), and cross-arm equalities
(bitmap distinct == exact distinct, streaming replay == batch aggregate).

Every test runs at TWO deterministic fixtures (r7 verdict ask #2): the
driver's seed-42 sf0.001 testdata and a derived seed-43 subsample
(tools/gen_fixture.py — ~90% of rows kept by an md5 bucket on each table's
FK-root key, so orders/lineitem referential integrity is preserved while
every group count, median, rank, and incomplete-block pattern changes).
Oracle parity at one dataset is a single point in input space; the second
fixture is where invariant pins get their power.
"""

from __future__ import annotations

import importlib.util
import math
import os
import sys

import pytest

from etl_mssql_to_postgres_dailysync_spark.plans import driver_queries as dq
import coverage_manifest

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# base fixture for the "seed42" param; override with
# SPARK_GRAFT_REPLAY_BASE to replay the whole suite at ANY fixture dir
# (e.g. a tools/gen_fixture.py derived seed) — engine-vs-pure-Python
# parity at new data is the strongest check against shared
# engine/oracle staging errors
_SEED42 = os.environ.get("SPARK_GRAFT_REPLAY_BASE",
                         "/root/testdata/sf0.001")


def _gen_seed43() -> str:
    spec = importlib.util.spec_from_file_location(
        "gen_fixture", os.path.join(_REPO, "tools", "gen_fixture.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.generate(43)


@pytest.fixture(scope="module", params=["seed42", "seed43"])
def sfd(request):
    return _SEED42 if request.param == "seed42" else _gen_seed43()


_CACHE: dict[tuple[str, str], list] = {}


def _rows(spark, name: str, sfd: str):
    coverage_manifest.record(name)
    key = (name, sfd)
    if key not in _CACHE:
        _CACHE[key] = QUERIES[name](spark, sfd).collect()
    return _CACHE[key]


_VAC_CACHE: dict = {}

_FACT_ID = {"orders": "o_orderkey", "lineitem": "l_orderkey",
            "events": "event_id", "documents": "doc_id",
            "embeddings": "vec_id"}


def _vacuous(sfd: str, *requires) -> bool:
    """True when a REQUIRED input of the query is empty under SQL
    semantics: count(col) over the fixture table is zero — either no rows
    at all (the empty_facts degenerate fixture) or an all-NULL join/
    grouping key (null_keys, where a NULL key joins or groups into nothing
    downstream). Invariant pins reduce to the engines' documented
    degenerate contract in that case; an EMPTY ENGINE RESULT ON A
    NON-VACUOUS FIXTURE STAYS A HARD FAILURE — that is the regression the
    original `assert rows` existed to catch."""
    import duckdb

    for table, col in requires:
        key = (sfd, table, col)
        if key not in _VAC_CACHE:
            con = duckdb.connect()
            _VAC_CACHE[key] = bool(con.sql(
                f"SELECT count({col}) = 0 FROM '{sfd}/{table}.parquet'"
            ).fetchone()[0])
        if _VAC_CACHE[key]:
            return True
    return False


def _single_content_corpus(sfd: str) -> bool:
    """True when every (non-blank) document carries the same text — the
    alldup_docs adversarial corpus. With one distinct content there are no
    discriminative terms: every term's df equals N (idf <= 0, so BM25/tf-idf
    retrieval legitimately returns nothing) and no token sits in the
    Good-Turing low-count spectrum."""
    import duckdb

    key = (sfd, "__single_content__")
    if key not in _VAC_CACHE:
        con = duckdb.connect()
        _VAC_CACHE[key] = bool(con.sql(
            "SELECT count(DISTINCT lower(trim(text))) <= 1 FROM "
            f"'{sfd}/documents.parquet' WHERE length(trim(text)) > 0"
        ).fetchone()[0])
    return _VAC_CACHE[key]


def _single_day(sfd: str) -> bool:
    """True when every order carries the same date (skew_onecust_oneday):
    a one-point daily series has no pairs, lags, splits, or seasonal
    structure, and a constant year feature is collinear with the
    intercept."""
    return _zero_variance(sfd, "orders", "o_orderdate")


def _degenerate_grain(sfd: str, sql: str, tag: str) -> bool:
    """Cached boolean probe for a grain-degeneracy condition (the
    onerow_groups fixture: one row per natural group kills every pairwise
    structure — transitions, co-purchases, within-group variance)."""
    import duckdb

    key = (sfd, tag)
    if key not in _VAC_CACHE:
        con = duckdb.connect()
        _VAC_CACHE[key] = bool(con.sql(sql.format(sfd=sfd)).fetchone()[0])
    return _VAC_CACHE[key]


def _one_event_per_user(sfd: str) -> bool:
    return _degenerate_grain(sfd, (
        "SELECT coalesce(max(c), 0) <= 1 FROM (SELECT count(*) c FROM "
        "'{sfd}/events.parquet' GROUP BY user_id)"), "__one_event__")


def _single_line_baskets(sfd: str) -> bool:
    return _degenerate_grain(sfd, (
        "SELECT coalesce(max(c), 0) <= 1 FROM (SELECT count(*) c FROM "
        "'{sfd}/lineitem.parquet' GROUP BY l_orderkey)"), "__one_line__")


def _one_order_per_customer(sfd: str) -> bool:
    return _degenerate_grain(sfd, (
        "SELECT coalesce(max(c), 0) <= 1 FROM (SELECT count(*) c FROM "
        "'{sfd}/orders.parquet' GROUP BY o_custkey)"), "__one_order__")


def _one_vec_per_label(sfd: str) -> bool:
    return _degenerate_grain(sfd, (
        "SELECT coalesce(max(c), 0) <= 1 FROM (SELECT count(*) c FROM "
        "'{sfd}/embeddings.parquet' GROUP BY label)"), "__one_vec__")


def _zero_variance(sfd: str, table: str, col: str) -> bool:
    """True when a measure column is constant over the fixture (the
    constant_values degenerate fixture): sample variances, correlations,
    OLS slopes, and split gains computed from it are undefined/zero by
    mathematics, and the engines pin them to NULL/0."""
    import duckdb

    key = (sfd, table, col, "__zvar__")
    if key not in _VAC_CACHE:
        con = duckdb.connect()
        _VAC_CACHE[key] = bool(con.sql(
            f"SELECT count(DISTINCT {col}) <= 1 FROM '{sfd}/{table}.parquet'"
        ).fetchone()[0])
    return _VAC_CACHE[key]


# ---------------------------------------------------------------------------
# Robust trend / rank statistics
# ---------------------------------------------------------------------------


def test_theil_sen_trend(spark, sfd):
    """Pair population is exactly n(n-1)/2 over the aggregated days."""
    out = _rows(spark, "theil_sen_trend", sfd)
    if not out:
        # degenerate-population contract: empty orders, or a one-day
        # series with no slope pairs (skew fixture)
        assert _vacuous(sfd, ("orders", "o_orderkey")) or _single_day(sfd)
        return
    (r,) = out
    assert r["n_days"] >= 2
    assert r["n_pairs"] == r["n_days"] * (r["n_days"] - 1) // 2


def test_mann_kendall_trend(spark, sfd):
    """|S| <= n(n-1)/2, Var(S) > 0, trend flag == sign(S), z sign == sign(S)."""
    (r,) = _rows(spark, "mann_kendall_trend", sfd)
    n, s = r["n"], r["s_stat"]
    if n <= 1:
        # empty or one-point series (empty_facts / skew): no pairs exist,
        # S/z/trend are NULL and the tie-corrected variance is exactly 0
        assert (s, r["var_s"], r["z"], r["trend"],
                r["reject_95"]) == (None, 0, None, None, 0)
        return
    assert abs(s) <= n * (n - 1) // 2
    assert r["var_s"] > 0
    sign = 0 if s == 0 else (1 if s > 0 else -1)
    assert r["trend"] == sign
    if s != 0:
        assert (r["z"] > 0) == (s > 0)
    if abs(abs(r["z"]) - 1.96) > 0.02:  # away from the critical edge
        assert r["reject_95"] == int(abs(r["z"]) > 1.959964)


def test_spearman_rank_corr(spark, sfd):
    """Correlations live in [-1, 1]."""
    (r,) = _rows(spark, "spearman_rank_corr", sfd)
    if r["n"] == 0:
        # empty joined population: correlations are NULL on both engines
        assert (r["spearman_rho"], r["pearson_r"]) == (None, None)
        return
    if r["spearman_rho"] is None:
        # a zero-variance side: constant prices (constant_values) or a
        # constant per-order line count (onerow_groups: 1 line per order)
        assert r["pearson_r"] is None
        assert (_zero_variance(sfd, "orders", "o_totalprice")
                or _single_line_baskets(sfd))
        return
    assert r["n"] > 0
    assert abs(r["spearman_rho"]) <= 1.0 + 1e-9
    assert abs(r["pearson_r"]) <= 1.0 + 1e-9


def test_mann_whitney_auc(spark, sfd):
    """U in [0, 2*n1*n0] (doubled form) and auc == U2 * 0.5e6 div (n1*n0)."""
    rows = _rows(spark, "mann_whitney_auc", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("orders", "o_orderkey"))
        return
    assert rows
    for r in rows:
        n1, n0 = r["n_pos"], r["n_neg"]
        assert 0 <= r["u2_stat"] <= 2 * n1 * n0
        assert r["auc_ppm"] == r["u2_stat"] * 500000 // (n1 * n0)
        assert 0 <= r["auc_ppm"] <= 1_000_000


def test_ks_two_sample(spark, sfd):
    """D in [0,1]; the sqrt-free rejection rule replayed independently:
    reject iff D_ppm^2 > 1.8442e12 (n1+n0)/(n1 n0) with the same floor."""
    (r,) = _rows(spark, "ks_two_sample", sfd)
    na, nb, ks = r["n_a"], r["n_b"], r["ks_ppm"]
    if na is None or nb is None:
        # an empty arm (empty_facts): D undefined -> NULL; never rejects
        assert (ks, r["reject_95"]) == (None, 0)
        return
    assert 0 <= ks <= 1_000_000
    rhs = 1_844_200_000_000 * (na + nb) // (na * nb)
    assert r["reject_95"] == int(ks * ks > rhs)


def test_acf_durbin_watson(spark, sfd):
    """|acf_k| <= 1 (Cauchy-Schwarz on the full-denominator form),
    d_k in [0, 4], and the lag-1 identity d1 ~ 2(1 - acf1) up to edge
    terms (O(1/n) on a ~1000-day series)."""
    rows = _rows(spark, "acf_durbin_watson", sfd)
    if not rows:
        # empty orders, or a one-day series shorter than every lag
        assert _vacuous(sfd, ("orders", "o_orderkey")) or _single_day(sfd)
        return
    assert {r["lag"] for r in rows} == set(range(1, 8))
    for r in rows:
        assert abs(r["acf"]) <= 1.0 + 1e-9
        assert 0.0 <= r["dw"] <= 4.0 + 1e-9
    (r1,) = [r for r in rows if r["lag"] == 1]
    assert abs(r1["dw"] - 2.0 * (1.0 - r1["acf"])) < 0.1


# ---------------------------------------------------------------------------
# Contingency / association
# ---------------------------------------------------------------------------


def test_cramers_v_association(spark, sfd):
    """V = sqrt(chi2 / (n (min(r,c)-1))) recomputed; V in [0,1], chi2 >= 0."""
    (r,) = _rows(spark, "cramers_v_association", sfd)
    if r["n"] is None:
        # empty orders: no contingency table -> chi2/V NULL, 0x0 cells
        assert (r["n_r"], r["n_c"], r["chi2_milli"],
                r["cramers_v"]) == (0, 0, None, None)
        return
    assert r["chi2_milli"] >= 0
    assert 0.0 <= r["cramers_v"] <= 1.0
    want = math.sqrt(
        (r["chi2_milli"] / 1000.0) / (r["n"] * (min(r["n_r"], r["n_c"]) - 1))
    )
    assert abs(r["cramers_v"] - want) < 1e-3


def test_mutual_information_matrix(spark, sfd):
    """MI >= 0, MI <= min(H_x, H_y) (+ per-cell micro-rounding slack), and
    NMI == MI / sqrt(H_x H_y) replayed on the emitted integers."""
    rows = _rows(spark, "mutual_information_matrix", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("orders", "o_custkey"))
        return
    assert len(rows) == 3
    for r in rows:
        assert r["mi_unat"] >= 0
        slack = r["n_cells"]  # each cell term rounds to +-0.5 micro-nat
        assert r["mi_unat"] <= min(r["h_x_unat"], r["h_y_unat"]) + slack
        if r["h_x_unat"] == 0 or r["h_y_unat"] == 0:
            # a one-value marginal (skew: single customer segment) has
            # zero entropy — NMI is 0/0-undefined -> NULL
            assert r["nmi_ppm"] is None
            continue
        want = r["mi_unat"] * 1_000_000 // int(
            math.sqrt(r["h_x_unat"] * r["h_y_unat"])
        )
        assert abs(r["nmi_ppm"] - want) <= 2


def test_srm_guardrail_check(spark, sfd):
    """chi2 for two equal-expectation cells == (n0-n1)^2 * 1000 div N,
    replayed exactly; flag at the 3.841 critical value."""
    rows = _rows(spark, "srm_guardrail_check", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("orders", "o_custkey"))
        return
    assert any(r["scope"] == "pooled" for r in rows) or len(rows) >= 1
    for r in rows:
        n0, n1 = r["n0"], r["n1"]
        want = (n0 - n1) ** 2 * 1000 // (n0 + n1)
        assert r["chi2_milli"] == want
        if abs(want - 3841) > 2:
            assert r["srm_flag"] == int(want > 3841)


def test_simpson_paradox_audit(spark, sfd):
    """Reversal flag fires iff the stratum effect is nonzero and disagrees
    in sign with the pooled effect; pooled effect constant across strata."""
    rows = _rows(spark, "simpson_paradox_audit", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("orders", "o_custkey"))
        return
    pooled = {r["pooled_diff_ppm"] for r in rows}
    assert len(pooled) == 1
    p = pooled.pop()
    for r in rows:
        assert r["c0"] <= r["n0"] and r["c1"] <= r["n1"]
        d = r["diff_ppm"]
        want = int(d != 0 and ((d > 0) != (p > 0)))
        assert r["sign_reversed"] == want


# ---------------------------------------------------------------------------
# A/B testing / experimentation
# ---------------------------------------------------------------------------


def test_conversion_ab_ztest(spark, sfd):
    """Rates replayed from counts; equal rates force z == 0; the 95%
    decision matches |z| vs 1.959964 away from the edge."""
    (r,) = _rows(spark, "conversion_ab_ztest", sfd)
    assert r["c_a"] <= r["n_a"] and r["c_b"] <= r["n_b"]
    if r["n_a"] == 0 or r["n_b"] == 0:
        # an empty arm (empty_facts; null_keys; skew — one customer lands
        # in one arm): that arm's rate is NULL, z pins to 0, never rejects
        for arm in ("a", "b"):
            n, c, rate = r[f"n_{arm}"], r[f"c_{arm}"], r[f"rate_{arm}_ppm"]
            assert rate == (None if n == 0 else c * 1_000_000 // n)
        assert (r["z"], r["reject_95"]) == (0.0, 0)
        return
    assert r["rate_a_ppm"] == r["c_a"] * 1_000_000 // r["n_a"]
    assert r["rate_b_ppm"] == r["c_b"] * 1_000_000 // r["n_b"]
    if r["rate_a_ppm"] == r["rate_b_ppm"]:
        assert r["z"] == 0.0
    if abs(abs(r["z"]) - 1.96) > 0.02:
        assert r["reject_95"] == int(abs(r["z"]) > 1.959964)


def test_cuped_adjusted_ab(spark, sfd):
    """rho^2 (squared correlation) in [0, 1); arm sizes partition n."""
    (r,) = _rows(spark, "cuped_adjusted_ab", sfd)
    if r["n_a"] == 0 and r["n_b"] == 0:
        # no assignable units (empty_facts; null_keys — the arm hash of a
        # NULL custkey is NULL): every adjusted quantity is NULL
        assert (r["theta"], r["diff_raw"], r["diff_cuped"],
                r["rho2"]) == (None, None, None, None)
        return
    # the NULL custkey forms ONE extra unit outside both arms (GROUP BY
    # keeps it; the arm hash of NULL is NULL) — mixed/null fixtures
    assert r["n"] - (r["n_a"] + r["n_b"]) in (0, 1)
    if r["rho2"] is None:
        # zero-variance covariate: constant prices (constant_values), a
        # degenerate arm (skew), or no pre-period spread (onerow_groups:
        # one order per customer). theta is NULL, or exactly 0 when the
        # covariance term alone collapses — then the adjustment is a
        # no-op and diff_cuped equals diff_raw.
        if r["theta"] is None:
            assert r["diff_cuped"] is None
        else:
            assert r["theta"] == 0.0
            assert r["diff_cuped"] == r["diff_raw"]
        assert (_zero_variance(sfd, "orders", "o_totalprice")
                or r["n_a"] < 2 or r["n_b"] < 2
                or _one_order_per_customer(sfd))
        return
    assert 0.0 <= r["rho2"] < 1.0


def test_sprt_sequential_test(spark, sfd):
    """The LLR is an exact linear prefix sum: increments are c*up +
    (n-c)*down for two constant micro-nat literals (solved from the data,
    then verified on every day); at most one first-decision flag, on the
    earliest decided day."""
    rows = _rows(spark, "sprt_sequential_test", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("events", "event_id"))
        return
    rows = sorted(rows, key=lambda r: r["day"])
    incs = []
    prev = 0
    for r in rows:
        incs.append((r["n"], r["c"], r["llr_micro"] - prev))
        prev = r["llr_micro"]
    # solve for (down, up) from two independent days
    down = up = None
    for n, c, inc in incs:
        if c == 0 and n > 0:
            down = inc // n if inc % n == 0 else None
            if down is not None:
                break
    if down is None:
        # no all-failure day exists (skew: ONE day, with conversions) —
        # the two literals cannot be separated from a single increment;
        # the decision-flag invariants below still hold
        firsts = [r for r in rows if r["is_first_decision"] == 1]
        assert len(firsts) <= 1
        decided = [r for r in rows if r["decision"] != 0]
        if firsts:
            assert decided and firsts[0]["day"] == decided[0]["day"]
        return
    for n, c, inc in incs:
        if c > 0:
            up = (inc - (n - c) * down) // c
            break
    assert up is not None
    for n, c, inc in incs:
        assert inc == c * up + (n - c) * down
    firsts = [r for r in rows if r["is_first_decision"] == 1]
    assert len(firsts) <= 1
    decided = [r for r in rows if r["decision"] != 0]
    if firsts:
        assert decided and firsts[0]["day"] == decided[0]["day"]


def test_permutation_test_diff(spark, sfd):
    """Add-one p-value == (b+1)/(m+1) replayed in ppm; p >= 1/(m+1)."""
    (r,) = _rows(spark, "permutation_test_diff", sfd)
    if r["n_users"] == 0:
        # empty population: the permutation grid never materializes
        assert (r["n_perms"], r["n_extreme"], r["obs_diff_ppm"],
                r["p_value_ppm"]) == (0, None, None, None)
        return
    assert r["n_perms"] == dq._PERM_R
    assert 0 <= r["n_extreme"] <= r["n_perms"]
    want = (r["n_extreme"] + 1) * 1_000_000 // (r["n_perms"] + 1)
    assert r["p_value_ppm"] == want
    assert r["p_value_ppm"] >= 1_000_000 // (r["n_perms"] + 1)


def test_power_analysis_design(spark, sfd):
    """Required n strictly decreases and achieved power increases in the
    effect size; power lives in [0, 1e6]."""
    rows = sorted(_rows(spark, "power_analysis_design", sfd),
                  key=lambda r: r["delta_ppm"])
    assert len(rows) == 5
    if rows[0]["n_required_per_arm"] is None:
        # no variance estimate (empty_facts): the design column is NULL
        # across the whole grid
        for r in rows:
            assert r["n_required_per_arm"] is None
        return
    for a, b in zip(rows, rows[1:]):
        # strict decrease saturates at the n>=1 floor (null_keys: a
        # 1-unit population drives every requirement to the floor)
        assert (a["n_required_per_arm"] > b["n_required_per_arm"]
                or a["n_required_per_arm"] == b["n_required_per_arm"] == 1)
        assert a["achieved_power_ppm"] <= b["achieved_power_ppm"]
    for r in rows:
        assert 0 <= r["achieved_power_ppm"] <= 1_000_000
        assert r["n_required_per_arm"] >= 1


def test_fdr_bh_correction(spark, sfd):
    """BH rejections form a PREFIX of the p-value ranking; every BH
    rejection is also a naive rejection (i*alpha/m <= alpha); ranks are a
    permutation of 1..m; p ascending in rank."""
    rows = sorted(_rows(spark, "fdr_bh_correction", sfd),
                  key=lambda r: r["bh_rank"])
    m = len(rows)
    assert [r["bh_rank"] for r in rows] == list(range(1, m + 1))
    for a, b in zip(rows, rows[1:]):
        assert a["p_micro"] <= b["p_micro"]
    seen_nonreject = False
    for r in rows:
        assert 0 <= r["p_micro"] <= 1_000_000
        assert r["reject_bh"] <= r["reject_naive"]
        if r["reject_bh"] == 0:
            seen_nonreject = True
        else:
            assert not seen_nonreject, "BH rejections must be a rank prefix"


def test_uplift_qini_curve(spark, sfd):
    """Scores strictly descend; per-bin conversions bounded by arms; at the
    FULL population the Qini curve meets the random-targeting diagonal
    (Q(N) == random(N), the Qini endpoint identity) up to floor slack."""
    rows = sorted(_rows(spark, "uplift_qini_curve", sfd),
                  key=lambda r: -r["score"])
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("orders", "o_custkey"))
        return
    for a, b in zip(rows, rows[1:]):
        assert a["score"] > b["score"]
    for r in rows:
        assert r["c_t"] <= r["n_t"] and r["c_c"] <= r["n_c"]
    last = rows[-1]
    if last["random_cum_micro"] is None:
        # both arms empty at full depth (null_keys: units need an id):
        # the random-targeting diagonal is NULL and the curve is flat 0
        assert last["qini_cum_micro"] == 0
        return
    assert abs(last["qini_cum_micro"] - last["random_cum_micro"]) <= 2


def test_ips_policy_evaluation(spark, sfd):
    """ESS <= n (Cauchy-Schwarz), estimates nonnegative, SNIPS <= 1."""
    (r,) = _rows(spark, "ips_policy_evaluation", sfd)
    if r["n"] == 0:
        # empty logged population: every estimate is NULL
        assert (r["v_direct_ppm"], r["v_ips_ppm"], r["v_snips_ppm"],
                r["ess_milli"]) == (None, None, None, None)
        return
    # integer staging can floor a single-sample ESS to 0 (skew fixture);
    # with n > 1 the Cauchy-Schwarz lower bound keeps it positive
    assert 0 <= r["ess_milli"] <= r["n"] * 1000
    if r["n"] > 1:
        assert r["ess_milli"] > 0
    assert 0 <= r["v_direct_ppm"] <= 1_000_000
    assert r["v_ips_ppm"] >= 0
    assert 0 <= r["v_snips_ppm"] <= 1_000_000


def test_ucb_variant_allocation(spark, sfd):
    """Exactly one arm is pulled and it maximizes the (rounded) UCB score;
    the optimism bonus keeps ucb >= mean."""
    rows = _rows(spark, "ucb_variant_allocation", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("events", "event_id"))
        return
    pulls = [r for r in rows if r["pull_next"] == 1]
    assert len(pulls) == 1
    best = max(r["ucb"] for r in rows)
    assert pulls[0]["ucb"] == best
    for r in rows:
        assert r["c"] <= r["n_i"]
        assert r["ucb"] >= r["mean_ppm"] / 1e6 - 1e-9


# ---------------------------------------------------------------------------
# Distribution distance / drift
# ---------------------------------------------------------------------------


def test_psi_monthly_trend(spark, sfd):
    """PSI >= 0 (sum of (a-b)ln(a/b) terms, each nonnegative); the retrain
    flag fires at the 0.2 threshold."""
    rows = _rows(spark, "psi_monthly_trend", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("orders", "o_orderkey"))
        return
    assert rows
    for r in rows:
        assert r["psi_e8"] >= 0
        assert r["drift_flag"] == int(r["psi_e8"] > 20_000_000)


def test_wasserstein_source_shift(spark, sfd):
    """W1 >= 0 and bounded by the bin-grid diameter; the token-unit
    re-expression is one constant rescale across all sources."""
    rows = _rows(spark, "wasserstein_source_shift", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("documents", "doc_id"))
        return
    assert rows
    base = next((r for r in rows if r["w1_ppm_bins"] > 0), None)
    for r in rows:
        assert 0 <= r["w1_ppm_bins"]
        if base is not None and r["w1_ppm_bins"] > 0:
            # cross-multiplied constant-ratio check (exact integers)
            lhs = r["w1_tokens_ppm"] * base["w1_ppm_bins"]
            rhs = base["w1_tokens_ppm"] * r["w1_ppm_bins"]
            assert abs(lhs - rhs) <= base["w1_ppm_bins"] + r["w1_ppm_bins"]


def test_ecdf_dkw_band(spark, sfd):
    """ECDF monotone in the threshold; the DKW band is ecdf +- eps with a
    single eps for the whole curve (simultaneous coverage) and a floor at
    0."""
    rows = sorted(_rows(spark, "ecdf_dkw_band", sfd),
                  key=lambda r: r["threshold"])
    eps = {r["eps_ppm"] for r in rows}
    assert len(eps) == 1
    e = eps.pop()
    if e is None:
        # empty sample (empty_facts): the ECDF is NULL at every threshold
        # and the band degenerates to the trivial [0, 1e6] envelope
        for r in rows:
            assert (r["ecdf_ppm"], r["lo_ppm"], r["hi_ppm"]) == (None, 0,
                                                                 1_000_000)
        return
    prev = -1
    for r in rows:
        assert 0 <= r["ecdf_ppm"] <= 1_000_000
        assert r["ecdf_ppm"] >= prev
        prev = r["ecdf_ppm"]
        assert r["lo_ppm"] == max(r["ecdf_ppm"] - e, 0)
        assert r["hi_ppm"] == min(r["ecdf_ppm"] + e, 1_000_000) or (
            r["hi_ppm"] == r["ecdf_ppm"] + e
        )


def test_page_hinkley_drift(spark, sfd):
    """PH statistic is (running sum - running min) >= 0 by construction;
    day 1 mean-to-date equals day 1's value."""
    rows = sorted(_rows(spark, "page_hinkley_drift", sfd),
                  key=lambda r: r["day"])
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("orders", "o_orderkey"))
        return
    assert rows[0]["mean_to_date_cents"] == rows[0]["x_cents"]
    for r in rows:
        assert r["ph_cents"] >= 0
        if r["alarm"]:
            assert r["ph_cents"] > 0


def test_changepoint_single_split(spark, sfd):
    """Top-5 candidate splits in descending between-segment SS; split
    leaves both segments nonempty."""
    rows = _rows(spark, "changepoint_single_split", sfd)
    if not rows:
        # empty orders, or a one-day series with no split candidates
        assert _vacuous(sfd, ("orders", "o_orderkey")) or _single_day(sfd)
        return
    assert 1 <= len(rows) <= 5
    for a, b in zip(rows, rows[1:]):
        assert a["between_ss_scaled"] >= b["between_ss_scaled"]
    for r in rows:
        assert r["n_left"] >= 1
        assert r["between_ss_scaled"] >= 0


def test_ewma_anomaly(spark, sfd):
    """Day index t is the complete sequence 1..N; a day is never both a
    spike and a drop; the first day's EWMA is its own value."""
    rows = sorted(_rows(spark, "ewma_anomaly", sfd), key=lambda r: r["t"])
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("orders", "o_orderkey"))
        return
    assert [r["t"] for r in rows] == list(range(1, len(rows) + 1))
    assert rows[0]["ewma"] == pytest.approx(float(rows[0]["x"]))
    for r in rows:
        assert not (r["spike"] == 1 and r["drop_"] == 1)
        assert r["ewma"] > 0


def test_seasonal_decompose_daily(spark, sfd):
    """residual == ratio * 1e6 div dow_index replayed exactly; trend and
    the weekday index are positive; dow in 0..6."""
    rows = _rows(spark, "seasonal_decompose_daily", sfd)
    if not rows:
        # empty orders, or a one-day series: no trend window exists
        assert _vacuous(sfd, ("orders", "o_orderkey")) or _single_day(sfd)
        return
    assert rows
    for r in rows:
        assert 0 <= r["dow"] <= 6
        assert r["trend"] > 0 and r["dow_index_ppm"] > 0
        assert r["residual_ppm"] == r["ratio_ppm"] * 1_000_000 // r["dow_index_ppm"]


def test_error_budget_burn_rate(spark, sfd):
    """Errors bounded by events; on the first day all three trailing
    windows agree (the window contains only that day); severity in
    {0,1,2}."""
    rows = sorted(_rows(spark, "error_budget_burn_rate", sfd),
                  key=lambda r: r["day"])
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("events", "event_id"))
        return
    first = rows[0]
    assert first["burn_1d_milli"] == first["burn_7d_milli"] == first["burn_28d_milli"]
    for r in rows:
        assert 0 <= r["e"] <= r["n"]
        assert r["burn_1d_milli"] >= 0
        assert r["page_severity"] in (0, 1, 2)


# ---------------------------------------------------------------------------
# Survival / extreme values
# ---------------------------------------------------------------------------


def test_kaplan_meier_survival(spark, sfd):
    """KM curve monotone nonincreasing, survival in [0, 1], deaths bounded
    by the risk set, and the risk set strictly shrinking in time."""
    rows = sorted(_rows(spark, "kaplan_meier_survival", sfd),
                  key=lambda r: r["t_hours"])
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("events", "event_id"))
        return
    assert rows
    prev_s, prev_n = 1_000_001, None
    for r in rows:
        assert 1 <= r["d"] <= r["n_risk"]
        assert 0 <= r["surv_ppm"] <= 1_000_000
        assert r["surv_ppm"] < prev_s or r["surv_ppm"] == prev_s == 0
        prev_s = r["surv_ppm"]
        assert r["ln_surv_unat"] <= 0
        if prev_n is not None:
            assert r["n_risk"] < prev_n
        prev_n = r["n_risk"]


def test_gumbel_return_levels(spark, sfd):
    """Return levels strictly increase with the return period and sit above
    the location parameter for T >= 30 (where -ln(-ln(1-1/T)) > 1); the
    scale beta > 0."""
    rows = sorted(_rows(spark, "gumbel_return_levels", sfd),
                  key=lambda r: r["t_days"])
    assert [r["t_days"] for r in rows] == [30, 90, 365]
    if rows[0]["n_days"] < 2:
        # empty or one-day series (empty_facts / skew): no sample sd, the
        # whole fit is NULL (observed_max survives when one day exists)
        for r in rows:
            if rows[0]["n_days"] == 0:
                assert r["observed_max"] is None
            else:
                assert r["observed_max"] is not None
            assert (r["mu_cents"], r["beta_cents"],
                    r["return_level_cents"]) == (None, None, None)
        return
    if rows[0]["beta_cents"] == 0:
        # zero-variance maxima (constant_values): the scale collapses and
        # every return level sits exactly at the (degenerate) location
        assert _zero_variance(sfd, "orders", "o_totalprice")
        for r in rows:
            assert (r["mu_cents"] == r["observed_max"]
                    == r["return_level_cents"])
        return
    assert rows[0]["beta_cents"] > 0
    for a, b in zip(rows, rows[1:]):
        assert a["return_level_cents"] < b["return_level_cents"]
    for r in rows:
        assert r["return_level_cents"] > r["mu_cents"]


# ---------------------------------------------------------------------------
# ANOVA family
# ---------------------------------------------------------------------------


def test_one_way_anova_f(spark, sfd):
    """Sums of squares nonnegative; F == (SSB/(k-1))/(SSW/(n-k)) replayed
    from the emitted integers."""
    (r,) = _rows(spark, "one_way_anova_f", sfd)
    if r["n"] == 0:
        # empty joined population (empty_facts; null_keys — NULL custkey
        # joins nothing): sums of squares and F are NULL, k counts 0
        assert (r["k"], r["ss_between"], r["ss_within"], r["f_stat"],
                r["reject_95"]) == (0, None, None, None, 0)
        return
    if r["k"] < 2:
        # a single group (skew: one customer -> one nation): no between-
        # group dof, F undefined -> NULL
        assert (r["f_stat"], r["reject_95"]) == (None, 0)
        return
    if r["ss_within"] == 0 and r["ss_between"] == 0:
        # zero-variance measure (constant_values): F is 0/0 -> NULL
        assert (r["f_stat"], r["reject_95"]) == (None, 0)
        assert _zero_variance(sfd, "orders", "o_totalprice")
        return
    assert r["ss_between"] >= 0 and r["ss_within"] > 0
    want = (r["ss_between"] / (r["k"] - 1)) / (r["ss_within"] / (r["n"] - r["k"]))
    assert r["f_stat"] == pytest.approx(want, rel=1e-4)


def test_levene_brown_forsythe(spark, sfd):
    """The Brown-Forsythe W is an F statistic on |x - median| deviations:
    nonnegative, with k in [2, 25] groups."""
    out = _rows(spark, "levene_brown_forsythe", sfd)
    if not out:
        # degenerate-population contract (see _vacuous)
        assert _vacuous(sfd, ("orders", "o_custkey"))
        return
    (r,) = out
    if r["w_stat"] is None:
        # zero-variance deviations (constant_values) or a single group
        # (skew): W is undefined -> NULL
        assert r["reject_95"] == 0
        assert (_zero_variance(sfd, "orders", "o_totalprice")
                or r["k"] < 2)
        return
    assert r["w_stat"] >= 0
    assert 2 <= r["k"] <= 25
    assert r["n"] > r["k"]


def test_median_polish_revenue(spark, sfd):
    """After the final column sweep the per-month median of residuals is
    exactly zero (dyadic rationals, no rounding)."""
    rows = _rows(spark, "median_polish_revenue", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("orders", "o_custkey"))
        return
    by_month: dict[int, list[float]] = {}
    for r in rows:
        by_month.setdefault(r["month"], []).append(r["resid"])
    assert by_month
    for month, vals in by_month.items():
        vals.sort()
        n = len(vals)
        med = vals[n // 2] if n % 2 else (vals[n // 2 - 1] + vals[n // 2]) / 2
        assert med == pytest.approx(0.0, abs=1e-6), f"month {month}"


def test_ipf_raking_weights(spark, sfd):
    """Raking weights positive; the emitted row-margin residual is small
    after the unrolled IPF iterations (the property raking exists for) and
    constant within each nation row-group."""
    rows = _rows(spark, "ipf_raking_weights", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("orders", "o_custkey"))
        return
    assert rows
    per_nation: dict[str, set] = {}
    # a single surviving cell (skew: one customer) makes the two margin
    # constraints incompatible — IPF oscillates and the residual bound
    # does not apply; weights stay positive and per-nation constant
    single_cell = len(rows) == 1
    for r in rows:
        assert r["w_micro"] > 0
        if not single_cell:
            assert 0 <= r["row_margin_err_ppm"] <= 50_000
        per_nation.setdefault(r["nation"], set()).add(r["row_margin_err_ppm"])
    for nation, errs in per_nation.items():
        assert len(errs) == 1, f"{nation} has non-constant row margin error"


# ---------------------------------------------------------------------------
# Regression / calibration
# ---------------------------------------------------------------------------


def test_logistic_regression_irls(spark, sfd):
    """At the IRLS optimum with an intercept, the mean fitted probability
    equals the base rate (score equation g_0 = sum(y - p) = 0); accuracy
    in [0, 1e6]."""
    out = _rows(spark, "logistic_regression_irls", sfd)
    if not out:
        # degenerate-population contract (see _vacuous)
        assert _vacuous(sfd, ("orders", "o_orderkey"))
        return
    (r,) = out
    assert 0 <= r["accuracy_ppm"] <= 1_000_000
    if (r["b0"], r["b1"], r["b2"]) == (0, 0, 0):
        # singular design (constant_values): the det==0 guard never steps,
        # so the fit stays at beta=0 and p=0.5 — the score equation does
        # not apply to an un-stepped optimizer
        assert r["mean_p_ppm"] == 500_000
        # constant price (constant_values) or constant year (skew: one
        # date, collinear with the intercept) both make the Hessian
        # singular on the first step
        assert (_zero_variance(sfd, "orders", "o_totalprice")
                or _single_day(sfd))
        return
    assert abs(r["mean_p_ppm"] - r["base_rate_ppm"]) <= 5000


def test_logistic_calibration_quality(spark, sfd):
    """gap == mean_p - obs_rate per bucket; the model-level Brier score and
    log-loss are single values repeated per row; Brier in [0, 1e6]."""
    rows = _rows(spark, "logistic_calibration_quality", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("orders", "o_orderkey"))
        return
    assert rows
    assert len({r["brier_ppm"] for r in rows}) == 1
    assert len({r["logloss_micro"] for r in rows}) == 1
    for r in rows:
        assert r["gap_ppm"] == r["mean_p_ppm"] - r["obs_rate_ppm"]
        assert 0 <= r["brier_ppm"] <= 1_000_000
        assert r["logloss_micro"] >= 0
        assert 0 <= r["obs_rate_ppm"] <= 1_000_000


def test_isotonic_calibration(spark, sfd):
    """The PAV fit is monotone nondecreasing and lives inside the range of
    the raw bin rates (+-1 ppm floor slack)."""
    rows = sorted(_rows(spark, "isotonic_calibration", sfd), key=lambda r: r["b"])
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("orders", "o_orderkey"))
        return
    assert rows
    raws = [r["raw_ppm"] for r in rows]
    prev = -1
    for r in rows:
        assert r["iso_ppm"] >= prev
        prev = r["iso_ppm"]
        assert min(raws) - 1 <= r["iso_ppm"] <= max(raws) + 1


def test_loo_source_influence(spark, sfd):
    """influence == slope_global - slope_loo, replayed per source."""
    rows = _rows(spark, "loo_source_influence", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("documents", "doc_id"))
        return
    assert rows
    assert len({r["slope_global"] for r in rows}) == 1
    if rows[0]["slope_global"] is None:
        # zero-variance regression design (alldup_docs: every doc has the
        # same length): the OLS slope is undefined -> NULL everywhere
        for r in rows:
            assert (r["slope_loo"], r["influence"]) == (None, None)
        return
    for r in rows:
        assert r["influence"] == pytest.approx(
            r["slope_global"] - r["slope_loo"], abs=1e-5
        )


def test_conformal_interval(spark, sfd):
    """Split-conformal finite-sample guarantee: empirical test coverage
    close to the 90% target (slack = 4 binomial sigmas at the test-fold
    size); the half-width is positive."""
    out = _rows(spark, "conformal_interval", sfd)
    if not out:
        # degenerate-population contract (see _vacuous)
        assert _vacuous(sfd, ("orders", "o_orderkey"))
        return
    (r,) = out
    if r["q_cents"] is None:
        # singular calibration fit (constant_values): no interval exists,
        # coverage of a NULL band is 0 on both engines
        assert r["coverage_ppm"] == 0
        assert _zero_variance(sfd, "orders", "o_totalprice")
        return
    assert r["q_cents"] > 0
    assert r["n_train"] > 0 and r["n_calib"] > 0 and r["n_test"] > 0
    sigma = math.sqrt(0.9 * 0.1 / r["n_test"])
    assert r["coverage_ppm"] >= int((0.9 - 4 * sigma) * 1_000_000)
    assert r["coverage_ppm"] <= 1_000_000


def test_conformal_interval_sketch_dominates_exact(spark, sfd):
    """The HDR-sketch half-width is the chosen bucket's UPPER bound, and
    the exact order statistic lies inside that bucket — so q_sketch >=
    q_exact, conservatively widened by at most the 2^-7 cell span, and
    test coverage can only go UP (the guarantee-preservation contract the
    sketch variant documents)."""
    ex_out = _rows(spark, "conformal_interval", sfd)
    sk_out = _rows(spark, "conformal_interval_sketch", sfd)
    if not ex_out or not sk_out:
        # degenerate-population contract: BOTH tiers must agree on
        # emptiness (a one-sided empty result is a real divergence)
        assert ex_out == sk_out == []
        assert _vacuous(sfd, ("orders", "o_orderkey"))
        return
    (ex,) = ex_out
    (sk,) = sk_out
    if ex["q_cents"] is None:
        # singular fit (constant_values): BOTH tiers must degenerate
        # together — a one-sided NULL interval is a real divergence
        assert sk["q_cents"] is None
        assert sk["coverage_ppm"] == ex["coverage_ppm"] == 0
        return
    assert sk["n_train"] == ex["n_train"]
    assert sk["n_calib"] == ex["n_calib"]
    assert sk["n_test"] == ex["n_test"]
    assert sk["q_cents"] >= ex["q_cents"]
    # cell span < 2^-7 of the lower bound (exact cells below 128 span 0)
    assert sk["q_cents"] - ex["q_cents"] <= max(ex["q_cents"] // 128, 0) + 1
    assert sk["coverage_ppm"] >= ex["coverage_ppm"]


def test_histogram_split_finding(spark, sfd):
    """Conservation: GL+GR and HL+HR are the same (root-node totals) for
    every candidate split; per-feature ranks are 1..5 with gains
    descending; exactly one global best and it is a rank-1 row with the
    maximum gain."""
    rows = _rows(spark, "histogram_split_finding", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert (_vacuous(sfd, ("orders", "o_orderkey"))
                or _zero_variance(sfd, "orders", "o_totalprice"))
        return
    assert rows
    gtot = {r["gl"] + r["gr"] for r in rows}
    htot = {r["hl"] + r["hr"] for r in rows}
    assert len(gtot) == 1 and len(htot) == 1
    by_feat: dict[str, list] = {}
    for r in rows:
        by_feat.setdefault(r["feature"], []).append(r)
    for feat, rs in by_feat.items():
        rs.sort(key=lambda r: r["feature_rank"])
        assert [r["feature_rank"] for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a["gain_scaled"] >= b["gain_scaled"]
    best = [r for r in rows if r["is_global_best"] == 1]
    assert len(best) == 1
    assert best[0]["feature_rank"] == 1
    assert best[0]["gain_scaled"] == max(r["gain_scaled"] for r in rows)


def test_adaboost_stumps(spark, sfd):
    """Each round's best stump beats random (eps <= 0.5 after polarity
    choice), alpha >= 0 follows, and the final ensemble accuracy is one
    value repeated."""
    rows = sorted(_rows(spark, "adaboost_stumps", sfd), key=lambda r: r["round"])
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("orders", "o_orderkey"))
        return
    assert [r["round"] for r in rows] == list(range(1, len(rows) + 1))
    assert len({r["ensemble_acc_ppm"] for r in rows}) == 1
    for r in rows:
        assert r["eps_ppm"] <= 500_000
        assert r["alpha_micro"] >= 0
        assert r["polarity"] in (-1, 1)
        assert 0 <= r["ensemble_acc_ppm"] <= 1_000_000


# ---------------------------------------------------------------------------
# Resampling
# ---------------------------------------------------------------------------


def test_poisson_bootstrap_replicates(spark, sfd):
    """The reported CI endpoints are the min/max replicate means; replicate
    effective sizes positive; SE one repeated value, positive."""
    rows = _rows(spark, "poisson_bootstrap_replicates", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("orders", "o_orderkey"))
        return
    assert len(rows) == dq._BOOT_R
    means = [r["boot_mean_cents"] for r in rows]
    assert len({r["boot_lo_cents"] for r in rows}) == 1
    assert rows[0]["boot_lo_cents"] == min(means)
    assert rows[0]["boot_hi_cents"] == max(means)
    zv = _zero_variance(sfd, "orders", "o_totalprice")
    for r in rows:
        assert r["n_eff"] > 0
        # a constant measure (constant_values) has exactly zero bootstrap
        # spread; anywhere else the SE must be strictly positive
        assert r["boot_se_cents"] > 0 or (zv and r["boot_se_cents"] == 0)


# ---------------------------------------------------------------------------
# Frequency estimation / smoothing / privacy
# ---------------------------------------------------------------------------


def test_good_turing_smoothing(spark, sfd):
    """r* == (r+1) N_{r+1} / N_r replayed (floor, +-1 for the rounding
    boundary) and discount == r* div r; the frequency spectrum is strictly
    decreasing in the GT regime N_1 > N_2."""
    rows = {r["r"]: r for r in _rows(spark, "good_turing_smoothing", sfd)}
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert (_vacuous(sfd, ("documents", "doc_id"))
                or _single_content_corpus(sfd))
        return
    assert 1 in rows and 2 in rows
    assert rows[1]["n_r"] > rows[2]["n_r"]
    for r, row in rows.items():
        want = (r + 1) * row["n_r1"] * 1_000_000 // row["n_r"]
        assert abs(row["r_star_micro"] - want) <= 1
        assert abs(row["discount_ppm"] - row["r_star_micro"] // r) <= 1


def test_dp_laplace_counts(spark, sfd):
    """noisy == true + noise and abs_err == |noise| replayed exactly."""
    rows = _rows(spark, "dp_laplace_counts", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("events", "user_id"))
        return
    assert rows
    for r in rows:
        assert r["true_n"] >= 0
        assert r["noisy_n"] == pytest.approx(r["true_n"] + r["noise"], abs=1e-9)
        assert r["abs_err"] == pytest.approx(abs(r["noise"]), abs=1e-9)


def test_k_anonymity_audit(spark, sfd):
    """Records == class_size x classes per histogram row; the k<5 flag; the
    record shares replay against the emitted total."""
    rows = _rows(spark, "k_anonymity_audit", sfd)
    total = sum(r["n_records"] for r in rows)
    for r in rows:
        assert r["n_records"] == r["class_size"] * r["n_classes"]
        assert r["below_k5"] == int(r["class_size"] < 5)
        assert r["record_share_ppm"] == r["n_records"] * 1_000_000 // total


def test_l_diversity_audit(spark, sfd):
    """A class with l distinct sensitive values has >= l records; entropy
    l-diversity is bounded by ln(l) (+ per-term rounding slack); the l<3
    flag."""
    rows = _rows(spark, "l_diversity_audit", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("events", "user_id"))
        return
    assert rows
    for r in rows:
        l = r["l_distinct"]
        assert r["n_records"] >= l * r["n_classes"]
        assert r["min_entropy_unat"] <= r["max_entropy_unat"]
        assert r["max_entropy_unat"] <= int(math.log(l) * 1_000_000) + l + 1
        assert r["below_l3"] == int(l < 3)


def test_bitmap_exact_distinct(spark, sfd):
    """The bitmap popcount-sum equals count(DISTINCT) exactly — the whole
    contract of the operator."""
    rows = _rows(spark, "bitmap_exact_distinct", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("events", "event_id"))
        return
    assert rows
    for r in rows:
        if r["n_distinct_bitmap"] is None:
            # all-NULL keys (null_keys): the NULL bucket contributes a
            # NULL word, poisoning the popcount sum; exact counts 0
            assert r["n_distinct_exact"] == 0
            assert r["n_words"] >= 1
            continue
        assert r["n_distinct_bitmap"] == r["n_distinct_exact"]
        assert r["n_words"] >= 1


def test_herfindahl_concentration(spark, sfd):
    """HHI in [(10000-n)^2/n, 1e8] (equal-share lower bound with bps floor
    slack); the regulator class thresholds at 1500/2500 points replayed."""
    rows = _rows(spark, "herfindahl_concentration", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("lineitem", "l_orderkey"))
        return
    assert rows
    for r in rows:
        n = r["n_suppliers"]
        assert (10_000 - n) ** 2 // n <= r["hhi"] <= 100_000_000
        want = 0 if r["hhi"] < 15_000_000 else (1 if r["hhi"] < 25_000_000 else 2)
        assert r["concentration_class"] == want


# ---------------------------------------------------------------------------
# Markov / attribution / funnel
# ---------------------------------------------------------------------------


def test_attribution_multi_touch(spark, sfd):
    """First- and last-touch credit the same total mass (1e6 per converted
    journey); linear and U-shaped totals agree with that mass up to
    per-touch floor truncation; position credits are whole conversions."""
    rows = _rows(spark, "attribution_multi_touch", sfd)
    if not rows:
        # no countable journeys: NULL/empty user ids, or single-event
        # users with no touch->conversion sequence (onerow_groups)
        assert (_vacuous(sfd, ("events", "user_id"))
                or _one_event_per_user(sfd))
        return
    assert rows
    tot_first = sum(r["first_touch_ppm"] for r in rows)
    tot_last = sum(r["last_touch_ppm"] for r in rows)
    tot_linear = sum(r["linear_ppm"] for r in rows)
    tot_ushape = sum(r["ushape_ppm"] for r in rows)
    n_touch = sum(r["n_touches"] for r in rows)
    assert tot_first == tot_last
    assert tot_first % 1_000_000 == 0
    assert tot_first - n_touch <= tot_linear <= tot_first
    assert tot_first - n_touch <= tot_ushape <= tot_first


def test_attribution_markov_removal(spark, sfd):
    """Removal effects: removing a channel's inbound transitions cannot
    INCREASE absorption probability; removal == full - without; the
    normalized attribution shares sum to ~1e6."""
    rows = _rows(spark, "attribution_markov_removal", sfd)
    assert rows
    full = {r["conv_full_ppm"] for r in rows}
    assert len(full) == 1
    for r in rows:
        assert r["conv_without_ppm"] <= r["conv_full_ppm"]
        assert r["removal_ppm"] >= 0
    if full == {0}:
        # no transitions at all (empty_facts): the chain absorbs nothing
        # and the normalized shares are all zero by the div-guard
        for r in rows:
            assert (r["n_transitions_in"], r["attribution_ppm"]) == (0, 0)
        return
    if all(r["removal_ppm"] == 0 for r in rows):
        # every removal effect is zero (onerow_groups: single-event
        # journeys absorb identically with or without any channel) — the
        # share normalizer is 0 and the div-guard pins every share to 0
        for r in rows:
            assert r["attribution_ppm"] == 0
        return
    share_sum = sum(r["attribution_ppm"] for r in rows)
    assert abs(share_sum - 1_000_000) <= len(rows) + 1


def test_markov_next_event_accuracy(spark, sfd):
    """The modal successor is right at least 1/k of the time (k <= 5 event
    types); accuracy replays from the counts."""
    rows = _rows(spark, "markov_next_event_accuracy", sfd)
    if not rows:
        # no transition pairs: empty events, or one event per user
        assert (_vacuous(sfd, ("events", "event_id"))
                or _one_event_per_user(sfd))
        return
    assert rows
    for r in rows:
        assert 0 < r["n_correct"] <= r["n_pairs"]
        assert r["n_correct"] * 5 >= r["n_pairs"]
        assert r["accuracy_ppm"] == r["n_correct"] * 1_000_000 // r["n_pairs"]


def test_markov_order2_gain(spark, sfd):
    """In-sample, the finer conditioning cannot predict worse: acc2 >= acc1
    (max over a refinement dominates); gain == acc2 - acc1."""
    (r,) = _rows(spark, "markov_order2_gain", sfd)
    if r["n_triples"] == 0:
        # no triples (empty_facts): accuracies and the gain are NULL
        assert (r["acc1_ppm"], r["acc2_ppm"], r["gain_ppm"]) == (None,
                                                                 None, None)
        return
    assert 0 <= r["acc1_ppm"] <= r["acc2_ppm"] <= 1_000_000
    assert r["gain_ppm"] == r["acc2_ppm"] - r["acc1_ppm"]


def test_shapley_attribution(spark, sfd):
    """The three channels each get one allocation bounded by total value
    mass; margin counts bounded by the 4 coalitions a channel can join."""
    rows = _rows(spark, "shapley_attribution", sfd)
    assert {r["channel"] for r in rows} == {"view", "click", "signup"}
    for r in rows:
        assert abs(r["shapley_ppm"]) <= 1_000_000
        assert 0 <= r["n_positive_margins"] <= 4


def test_funnel_strict_windowed(spark, sfd):
    """Strict funnels only shrink: step counts nonincreasing; conversion
    ratios replay exactly from the counts; step 1 is 100% by definition."""
    rows = sorted(_rows(spark, "funnel_strict_windowed", sfd),
                  key=lambda r: r["step"])
    assert [r["step"] for r in rows] == [1, 2, 3, 4]
    s1 = rows[0]["n_users"]
    if s1 == 0:
        # nobody enters the funnel (empty_facts): the div-guard pins every
        # ratio to 0 instead of 100%
        for r in rows:
            assert (r["n_users"], r["conv_from_start_ppm"],
                    r["conv_from_prev_ppm"]) == (0, 0, 0)
        return
    assert rows[0]["conv_from_start_ppm"] == 1_000_000
    prev = None
    for r in rows:
        if prev is not None:
            assert r["n_users"] <= prev["n_users"]
            if prev["n_users"]:
                assert r["conv_from_prev_ppm"] == (
                    r["n_users"] * 1_000_000 // prev["n_users"]
                )
        if s1:
            assert r["conv_from_start_ppm"] == r["n_users"] * 1_000_000 // s1
        prev = r


# ---------------------------------------------------------------------------
# Graphs
# ---------------------------------------------------------------------------


def test_graph_k_core_peel(spark, sfd):
    """Peeling is monotone: nodes and edges nonincreasing per round;
    converged flags exactly the rounds that removed nothing."""
    rows = sorted(_rows(spark, "graph_k_core_peel", sfd), key=lambda r: r["round"])
    assert rows
    prev = None
    for r in rows:
        assert r["converged"] == int(r["nodes_removed"] == 0)
        if prev is not None:
            assert r["nodes_kept"] <= prev["nodes_kept"]
            assert r["edges_kept"] <= prev["edges_kept"]
        prev = r


def test_copurchase_degree_powerlaw(spark, sfd):
    """Degrees bounded by the node count; the log-log fit is finite."""
    (r,) = _rows(spark, "copurchase_degree_powerlaw", sfd)
    if r["n_parts"] == 0:
        # empty graph (empty_facts): degree stats and the fit are NULL
        assert (r["max_degree"], r["n_edges"], r["n_points"],
                r["slope_loglog"]) == (None, None, 0, None)
        return
    assert 1 <= r["max_degree"] <= r["n_parts"] - 1
    assert r["n_edges"] >= r["max_degree"]
    assert math.isfinite(r["slope_loglog"])


def test_adamic_adar_copurchase(spark, sfd):
    """Each shared-basket term is 1/ln(d) for a basket of size d in
    [2, max_basket], so the score is bracketed by n_common/ln(max_basket)
    and n_common/ln(2). max_basket is derived from the fixture itself —
    the seed-43 run exposed that the synthetic baskets reach 11 parts, not
    TPC-H's 7 (exactly the fixed-point-blindness the second seed exists
    to break)."""
    from pyspark.sql import functions as F

    rows = _rows(spark, "adamic_adar_copurchase", sfd)
    if not rows:
        # no co-purchase pairs: empty lineitem, or single-line baskets
        assert (_vacuous(sfd, ("lineitem", "l_orderkey"))
                or _single_line_baskets(sfd))
        return
    assert rows
    max_basket = (
        dq._t(spark, sfd, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c"))
        .collect()[0][0]
    )
    lo = int(1e6 / math.log(max_basket)) - 1
    hi = int(1e6 / math.log(2)) + 1
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert r["n_common"] >= 1
        assert r["n_common"] * lo <= r["aa_micro"] <= r["n_common"] * hi


# ---------------------------------------------------------------------------
# Retrieval / text statistics
# ---------------------------------------------------------------------------


def test_bm25_retrieval_topk(spark, sfd):
    """Top-k scores are positive (idf of df-banded terms is positive) and
    at most k rows come back."""
    rows = _rows(spark, "bm25_retrieval_topk", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert (_vacuous(sfd, ("documents", "doc_id"))
                or _single_content_corpus(sfd))
        return
    assert 1 <= len(rows) <= 20
    for r in rows:
        assert r["score_milli"] > 0
        assert r["n_terms_hit"] >= 1


def test_bm25_prf_expansion(spark, sfd):
    """Expansion only ADDS nonnegative term contributions: the re-ranked
    score dominates the base score per doc; ranks are the contiguous
    prefix 1..k ordered by the after-score."""
    rows = sorted(_rows(spark, "bm25_prf_expansion", sfd),
                  key=lambda r: r["rank_after"])
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert (_vacuous(sfd, ("documents", "doc_id"))
                or _single_content_corpus(sfd))
        return
    assert rows
    assert [r["rank_after"] for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert a["score_after_milli"] >= b["score_after_milli"]
    for r in rows:
        assert r["score_after_milli"] >= r["score_before_milli"]
        assert r["in_feedback_set"] in (0, 1)


def test_retrieval_eval_ndcg(spark, sfd):
    """DCG <= IDCG (ideal ranking dominates), NDCG replays as the integer
    ratio, P@10 is a multiple of 1/10, and MRR is 0 or 1e6//rank."""
    rows = _rows(spark, "retrieval_eval_ndcg", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("documents", "doc_id"))
        return
    assert rows
    rr_legal = {0} | {1_000_000 // i for i in range(1, 11)}
    for r in rows:
        assert 0 <= r["dcg_micro"] <= r["idcg_micro"]
        assert r["ndcg_ppm"] == r["dcg_micro"] * 1_000_000 // r["idcg_micro"]
        assert r["p_at_10_ppm"] % 100_000 == 0
        assert r["rr_ppm"] in rr_legal


def test_text_kneser_ney_bigram(spark, sfd):
    """P_KN is a probability (0 < p <= 1); bigram counts bounded by the
    left marginal; continuation counts positive."""
    rows = _rows(spark, "text_kneser_ney_bigram", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("documents", "doc_id"))
        return
    assert rows
    for r in rows:
        assert 0 < r["pkn_ppm"] <= 1_000_000
        assert 0 < r["pml_ppm"] <= 1_000_000
        assert 1 <= r["c12"] <= r["c1"]
        assert r["n1fw"] >= 1 and r["n1bw"] >= 1 and r["nbt"] >= r["n1bw"]


def test_cooccurrence_pmi_window(spark, sfd):
    """Pair counts bounded by both marginals and by the min-support
    threshold."""
    rows = _rows(spark, "cooccurrence_pmi_window", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("documents", "doc_id"))
        return
    assert rows
    for r in rows:
        assert r["n_xy"] >= dq._PMI_MIN
        assert r["n_xy"] <= min(r["cx"], r["cy"])


def test_logodds_fightin_words(spark, sfd):
    """The two emitted vocabularies are separated in z: every top-side
    token outranks every bottom-side token."""
    rows = _rows(spark, "logodds_fightin_words", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("documents", "doc_id"))
        return
    top = [r["z"] for r in rows if r["side"] == 1]
    bot = [r["z"] for r in rows if r["side"] == -1]
    assert top and bot
    assert min(top) >= max(bot)


def test_text_burstiness_fano(spark, sfd):
    """Fano factor nonnegative; the bursty flag fires above the 1.1
    margin; document frequency bounded by occurrences."""
    rows = _rows(spark, "text_burstiness_fano", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("documents", "doc_id"))
        return
    assert rows
    for r in rows:
        assert r["fano_ppm"] >= 0
        assert r["df"] <= r["total_c"]
        assert r["bursty"] == int(r["fano_ppm"] > 1_100_000)


def test_text_readability_ari(spark, sfd):
    """Per-source min <= mean <= max; the college share is a proportion."""
    rows = _rows(spark, "text_readability_ari", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("documents", "doc_id"))
        return
    assert rows
    for r in rows:
        assert r["min_ari_centi"] <= r["mean_ari_centi"] <= r["max_ari_centi"]
        assert 0 <= r["college_ppm"] <= 1_000_000
        assert r["n_docs"] >= 1


def test_content_defined_chunking(spark, sfd):
    """Every doc yields at least one chunk (the tail span); the dedup ratio
    is a proportion; chunks have positive mean length."""
    rows = _rows(spark, "content_defined_chunking", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("documents", "doc_id"))
        return
    assert rows
    for r in rows:
        assert r["n_chunks"] >= r["n_docs"]
        assert 0 < r["distinct_chunk_ppm"] <= 1_000_000
        assert r["mean_chunk_chars"] > 0


def test_skipgram_pairs_subsampled(spark, sfd):
    """Top-100 window pairs with positive counts."""
    rows = _rows(spark, "skipgram_pairs_subsampled", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("documents", "doc_id"))
        return
    assert 1 <= len(rows) <= 100
    assert all(r["n_pairs"] >= 1 for r in rows)


def test_negative_sampling_unigram(spark, sfd):
    """The c^0.75 weights are monotone in the raw counts; probabilities sum
    to 1e6 up to per-type floor; the inverse-CDF audit assigns EVERY draw
    to exactly one bucket."""
    rows = sorted(_rows(spark, "negative_sampling_unigram", sfd),
                  key=lambda r: r["c"])
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("documents", "doc_id"))
        return
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert a["w_micro"] <= b["w_micro"]
    psum = sum(r["p_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= psum <= 1_000_000
    assert sum(r["n_sampled"] for r in rows) == dq._NS_DRAWS


def test_naive_bayes_lang_confusion(spark, sfd):
    """Confusion-matrix cells are positive counts over the known language
    set; the test fold is smaller than the corpus."""
    rows = _rows(spark, "naive_bayes_lang_confusion", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("documents", "lang"))
        return
    assert rows
    langs = {"en", "es", "fr", "de", "zh"}
    n_test = sum(r["n_docs"] for r in rows)
    assert 0 < n_test < 500
    for r in rows:
        # a NULL label survives as its own true-class row (GROUP BY keeps
        # the NULL group — mixed_null_keys); predictions argmax over the
        # TRAINED classes, which are always real languages
        assert r["true_lang"] in langs or r["true_lang"] is None
        assert r["pred_lang"] in langs
        assert r["n_docs"] >= 1


def test_temperature_sampling_mix(spark, sfd):
    """Both weight vectors are distributions (sum 1e6 up to per-source
    floor); flatten == temp - raw; temperature sampling up-weights the
    smallest source and down-weights the largest."""
    rows = _rows(spark, "temperature_sampling_mix", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("documents", "doc_id"))
        return
    assert rows
    k = len(rows)
    for tot in (sum(r["weight_ppm"] for r in rows),
                sum(r["temp_mix_ppm"] for r in rows)):
        assert 1_000_000 - k <= tot <= 1_000_000
    for r in rows:
        assert r["flatten_ppm"] == r["temp_mix_ppm"] - r["weight_ppm"]
    big = max(rows, key=lambda r: r["tokens"])
    small = min(rows, key=lambda r: r["tokens"])
    assert big["flatten_ppm"] <= 0 + 1  # floor slack
    assert small["flatten_ppm"] >= 0 - 1


# ---------------------------------------------------------------------------
# Sketch families
# ---------------------------------------------------------------------------


def test_hll_intersection_ie(spark, sfd):
    """Inclusion-exclusion identity est_inter == est_a + est_b - est_union
    replayed exactly; the register-wise-max union dominates both arms."""
    rows = _rows(spark, "hll_intersection_ie", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("events", "event_id"))
        return
    assert rows
    for r in rows:
        if r["est_a"] is None:
            # all-NULL user ids (null_keys): the NULL register poisons
            # every per-arm estimate; the exact intersection counts 0
            assert (r["est_b"], r["est_union"], r["est_inter"],
                    r["err_ppm"]) == (None, None, None, None)
            assert r["exact_inter"] == 0
            continue
        assert r["est_inter"] == r["est_a"] + r["est_b"] - r["est_union"]
        assert r["est_union"] >= max(r["est_a"], r["est_b"])
        assert r["exact_inter"] >= 0


def test_hll_sliding_28d_users(spark, sfd):
    """The emitted sketch error replays as |est - exact| in ppm of exact;
    both arms positive."""
    rows = _rows(spark, "hll_sliding_28d_users", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("events", "event_id"))
        return
    assert rows
    for r in rows:
        if r["exact_28d"] == 0:
            # a window with zero countable users (null_keys): the linear-
            # counting estimate is exactly 0 and the relative error NULL
            assert (r["hll_28d_est"], r["err_ppm"]) == (0, None)
            continue
        assert r["hll_28d_est"] >= 1 and r["exact_28d"] >= 1
        want = abs(r["hll_28d_est"] - r["exact_28d"]) * 1_000_000 // r["exact_28d"]
        assert r["err_ppm"] == want


def test_hdr_quantile_sketch(spark, sfd):
    """The guaranteed-containment contract: the chosen cell contains the
    exact order statistic (lo <= exact <= hi), the midpoint error respects
    the 2^-7 cell-width bound, and quantile estimates are monotone in the
    percentile."""
    rows = sorted(_rows(spark, "hdr_quantile_sketch", sfd), key=lambda r: r["pct"])
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("orders", "o_orderkey"))
        return
    assert [r["pct"] for r in rows] == [50, 90, 95, 99]
    prev = None
    for r in rows:
        assert r["lo_cents"] <= r["est_cents"] <= r["hi_cents"]
        assert r["lo_cents"] <= r["exact_cents"] <= r["hi_cents"]
        assert r["rel_err_ppm"] <= 3906
        if prev is not None:
            assert r["est_cents"] >= prev["est_cents"]
            assert r["exact_cents"] >= prev["exact_cents"]
        prev = r


# ---------------------------------------------------------------------------
# Embedding / similarity family
# ---------------------------------------------------------------------------


def test_mmr_diversified_topk(spark, sfd):
    """Each query gets exactly k=5 distinct picks at ranks 1..5, never
    itself."""
    rows = _rows(spark, "mmr_diversified_topk", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("embeddings", "vec_id"))
        return
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert by_q
    for q, rs in by_q.items():
        assert sorted(r["mmr_rank"] for r in rs) == [1, 2, 3, 4, 5]
        picks = [r["vec_id"] for r in rs]
        assert len(set(picks)) == 5
        assert q not in picks


def test_hard_negative_mining(spark, sfd):
    """Per anchor: 3 negatives ranked by similarity descending, the margin
    replays as neg_sim - pos_sim, and neither side is the anchor itself."""
    rows = _rows(spark, "hard_negative_mining", sfd)
    if not rows:
        # no mineable anchors: empty embeddings, or one vector per label
        # (onerow_groups: no same-label positive exists)
        assert (_vacuous(sfd, ("embeddings", "vec_id"))
                or _one_vec_per_label(sfd))
        return
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert by_q
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2, 3]
        assert rs[0]["neg_sim"] >= rs[1]["neg_sim"] >= rs[2]["neg_sim"]
        for r in rs:
            assert r["neg_id"] != q and r["pos_id"] != q
            assert r["margin"] == pytest.approx(
                r["neg_sim"] - r["pos_sim"], abs=1e-9
            )


def test_tfidf_cosine_pairs(spark, sfd):
    """Cosine lives in (0, 1] for nonnegative tf-idf weights; pairs are
    canonically ordered with at least one shared term."""
    rows = _rows(spark, "tfidf_cosine_pairs", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert (_vacuous(sfd, ("documents", "doc_id"))
                or _single_content_corpus(sfd))
        return
    assert rows
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert r["n_common"] >= 1
        assert r["dot"] > 0
        assert 0.0 < r["cos_sim"] <= 1.0 + 1e-9


def test_pca_power_iteration(spark, sfd):
    """Sign normalization pins the largest-|component| entry positive; the
    Rayleigh quotient is a valid eigenvalue bound (0 < lambda <= trace);
    the share replays as the integer ratio."""
    rows = _rows(spark, "pca_power_iteration", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("embeddings", "vec_id"))
        return
    assert len(rows) == 64
    lam = {r["lambda_unit"] for r in rows}
    tr = {r["trace_unit"] for r in rows}
    assert len(lam) == 1 and len(tr) == 1
    lam, tr = lam.pop(), tr.pop()
    assert 0 < lam <= tr
    top = max(rows, key=lambda r: abs(r["v_unit"]))
    assert top["v_unit"] > 0
    for r in rows:
        assert abs(r["v_unit"]) <= 1_000_000
        assert r["share_ppm"] == lam * 1_000_000 // tr


def test_geometric_median_embeddings(spark, sfd):
    """All 64 dims present (1-based spine); shift replays as
    gmedian - mean."""
    rows = _rows(spark, "geometric_median_embeddings", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("embeddings", "vec_id"))
        return
    assert sorted(r["dim"] for r in rows) == list(range(1, 65))
    for r in rows:
        assert r["shift_micro"] == r["gmedian_micro"] - r["mean_micro"]


def test_knn_shapley_valuation(spark, sfd):
    """Label agreements bounded by query touches; each per-query truncated
    Shapley value is bounded by 1, so the sum is bounded by the touch
    count."""
    rows = _rows(spark, "knn_shapley_valuation", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("embeddings", "vec_id"))
        return
    assert 1 <= len(rows) <= 20
    for r in rows:
        assert 0 <= r["n_label_agree"] <= r["n_queries_touched"]
        assert abs(r["shap_micro_sum"]) <= r["n_queries_touched"] * 1_000_000


def test_cv_leakage_neardup(spark, sfd):
    """Fold pairs are canonical 0..4 cells; leak flags exactly the
    cross-fold cells; shares replay against the pair total."""
    rows = _rows(spark, "cv_leakage_neardup", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("documents", "doc_id"))
        return
    assert rows
    total = sum(r["n_pairs"] for r in rows)
    for r in rows:
        assert 0 <= r["fold_lo"] <= r["fold_hi"] <= 4
        assert r["leak"] == int(r["fold_lo"] != r["fold_hi"])
        assert r["share_ppm"] == r["n_pairs"] * 1_000_000 // total


# ---------------------------------------------------------------------------
# Market-basket
# ---------------------------------------------------------------------------


def test_frequent_itemset_pairs(spark, sfd):
    """Pair support bounded by both item marginals; directional confidence
    replays from the counts; lift positive."""
    rows = _rows(spark, "frequent_itemset_pairs", sfd)
    if not rows:
        # no item pairs: empty lineitem, or single-line baskets
        assert (_vacuous(sfd, ("lineitem", "l_orderkey"))
                or _single_line_baskets(sfd))
        return
    assert rows
    for r in rows:
        assert r["item_a"] < r["item_b"]
        assert 1 <= r["pair_baskets"] <= min(r["n_a"], r["n_b"])
        assert r["conf_ab_ppm"] == r["pair_baskets"] * 1_000_000 // r["n_a"]
        assert r["lift_ppm"] > 0


# ---------------------------------------------------------------------------
# Sampling / allocation
# ---------------------------------------------------------------------------


def test_neyman_allocation_sample(spark, sfd):
    """Per-stratum draws are ranked 1..min(allocation, population); the
    allocations never exceed the budget in total."""
    rows = _rows(spark, "neyman_allocation_sample", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert (_vacuous(sfd, ("orders", "o_orderkey"))
                or _zero_variance(sfd, "orders", "o_totalprice"))
        return
    assert rows
    by_s: dict[str, list] = {}
    for r in rows:
        by_s.setdefault(r["stratum"], []).append(r)
    alloc_total = 0
    for s, rs in by_s.items():
        n_h = {r["n_h"] for r in rs}
        n_pop = {r["n_pop"] for r in rs}
        assert len(n_h) == 1 and len(n_pop) == 1
        n_h, n_pop = n_h.pop(), n_pop.pop()
        alloc_total += n_h
        assert len(rs) == min(n_h, n_pop)
        assert sorted(r["rk"] for r in rs) == list(range(1, len(rs) + 1))
    assert alloc_total <= dq._NEYMAN_BUDGET


def test_quantile_normalization_map(spark, sfd):
    """Per-source decile values are monotone in the decile (they are order
    statistics); shift replays as src - pooled; the pooled targets are one
    shared monotone vector."""
    rows = _rows(spark, "quantile_normalization_map", sfd)
    if not rows:
        # degenerate-population contract: an empty result is correct
        # ONLY when a required input is empty/all-NULL (see _vacuous)
        assert _vacuous(sfd, ("documents", "doc_id"))
        return
    assert rows
    pooled: dict[int, int] = {}
    by_s: dict[str, list] = {}
    for r in rows:
        assert r["shift"] == r["src_value"] - r["pooled_value"]
        pooled.setdefault(r["decile"], r["pooled_value"])
        assert pooled[r["decile"]] == r["pooled_value"]
        by_s.setdefault(r["source"], []).append(r)
    pv = [pooled[d] for d in sorted(pooled)]
    assert pv == sorted(pv)
    for s, rs in by_s.items():
        rs.sort(key=lambda r: r["decile"])
        assert [r["decile"] for r in rs] == list(range(1, 10))
        vals = [r["src_value"] for r in rs]
        assert vals == sorted(vals)


# ---------------------------------------------------------------------------
# Streaming / governed twins (cross-arm equalities)
# ---------------------------------------------------------------------------


def test_streaming_dedup_replay(spark, sfd):
    """The at-least-once replayed stream equals the single-copy batch
    aggregate EXACTLY — duplicates contribute nothing. The batch twin is
    recomputed here, independently of the oracle."""
    from pyspark.sql import functions as F

    rows = _rows(spark, "streaming_dedup_replay", sfd)
    ev = dq._t(spark, sfd, "events")
    batch = {
        r["event_type"]: (r["n"], r["cents"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("cents"),
        )
        .collect()
    }
    got = {r["event_type"]: (r["n_events"], r["value_cents"]) for r in rows}
    assert got == batch


def test_streaming_sessionize(spark, sfd):
    """Every event lands in exactly one session (counts partition the
    stream); session intervals are well-formed and non-overlapping per
    user."""
    rows = _rows(spark, "streaming_sessionize", sfd)
    total = dq._t(spark, sfd, "events").count()
    assert sum(r["n_events"] for r in rows) == total
    by_u: dict[int, list] = {}
    for r in rows:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1
        by_u.setdefault(r["user_id"], []).append(r)
    for u, rs in by_u.items():
        rs.sort(key=lambda r: r["session_start"])
        for a, b in zip(rs, rs[1:]):
            assert b["session_start"] > a["session_end"]


def test_gdpr_erasure_audit(spark, sfd):
    """The three governance identities: head == before - subject rows,
    subject gone from head, time travel still shows every subject row."""
    (r,) = _rows(spark, "gdpr_erasure_audit", sfd)
    assert r["n_after"] == r["n_before"] - r["n_user_before"]
    assert r["n_user_after"] == 0
    assert r["timetravel_user_rows"] == r["n_user_before"]
    if r["victim_user"] is None:
        # no erasure subject exists (empty_facts / null_keys: NULL user
        # ids cannot be chosen) — the identities above still pin to 0
        assert r["n_user_before"] == 0
        return
    assert r["n_user_before"] > 0
