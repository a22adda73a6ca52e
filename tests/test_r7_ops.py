"""Property tests for the r7 operator tranche, beyond oracle parity.

Oracle twins pin cross-engine equality; these pin the MATHEMATICAL
contracts the docstrings claim: Misra-Gries' partitioning-independence
(the whole point of the candidate-superset + exact-recount design),
Dunn's comparison count and decision consistency, t-closeness' EMD
bounds, PR-AUC's unit-square bound vs its prevalence baseline, kappa's
range and its exact relation to raw agreement, and the MMD kernel's
[0, 1e6] ppm range with the diagonal at the cap.
"""

from __future__ import annotations

import pytest

import coverage_manifest

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

SF = "/root/testdata/sf0.001"


def _gen_seed43():
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_fixture", os.path.join(repo, "tools", "gen_fixture.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.generate(43)


# r8: the whole r7 property suite now runs at BOTH deterministic fixtures
# (the friedman incomplete-block bug was a data-shape bug — a second seed
# with different month/priority holes is exactly what exercises it)
@pytest.fixture(scope="module", params=["seed42", "seed43"])
def sfd(request):
    return SF if request.param == "seed42" else _gen_seed43()


_CACHE: dict = {}


def _rows(spark, name, sf):
    coverage_manifest.record(name)
    if (name, sf) not in _CACHE:
        _CACHE[(name, sf)] = QUERIES[name](spark, sf).collect()
    return _CACHE[(name, sf)]


# ---------------------------------------------------------------------------
# Misra-Gries: output independent of physical partitioning
# ---------------------------------------------------------------------------

def test_misra_gries_partitioning_independent(spark, sfd):
    """The MG candidate set varies with partitioning; the exact-recount
    output must NOT (the guarantee argument in the docstring). Re-run the
    same logic over a deliberately different partition layout by changing
    the session default parallelism effect: rebuild the stream with
    repartition(1) vs repartition(16) and compare final outputs."""
    from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import (
        _MG_K, _lm_parts,
    )
    from pyspark.sql import functions as F

    _t1, tok, _u, _nu = _lm_parts(spark, sfd)

    def run(npart: int):
        stream = tok.select("tok").repartition(npart)

        def mg_partition(batches):
            counters: dict[str, int] = {}
            for pdf in batches:
                for t_ in pdf["tok"]:
                    if t_ in counters:
                        counters[t_] += 1
                    elif len(counters) < 2 * _MG_K:
                        counters[t_] = 1
                    else:
                        dec = min(counters.values())
                        counters = {
                            kk: vv - dec
                            for kk, vv in counters.items() if vv > dec
                        }
                        counters[t_] = 1
            import pandas as pd
            yield pd.DataFrame(
                {"tok": list(counters.keys()),
                 "cnt_lb": [int(v) for v in counters.values()]}
            )

        cand = (
            stream.mapInPandas(mg_partition, "tok string, cnt_lb long")
            .select("tok").distinct()
        )
        n = stream.agg(F.count(F.lit(1)).cast("long").alias("n"))
        hh = (
            stream.join(F.broadcast(cand), "tok", "left_semi")
            .groupBy("tok")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        out = (
            hh.crossJoin(F.broadcast(n))
            .filter(F.expr(f"cnt * {_MG_K} > n"))
            .select("tok", "cnt")
        )
        return sorted((r["tok"], r["cnt"]) for r in out.collect())

    assert run(1) == run(16)


def test_misra_gries_matches_exact_groupby(spark, sfd):
    """Output == the plain exact GROUP BY ... HAVING filter (the oracle's
    definition), computed independently here via DataFrame ops."""
    from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import (
        _MG_K, _lm_parts,
    )
    from pyspark.sql import functions as F

    got = sorted(
        (r["token"], r["cnt"])
        for r in _rows(spark, "misra_gries_heavy_hitters", sfd)
    )
    _t1, tok, _u, _nu = _lm_parts(spark, sfd)
    n = tok.count()
    exact = sorted(
        (r["tok"], r["cnt"])
        for r in tok.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.expr(f"cnt * {_MG_K} > {n}"))
        .collect()
    )
    assert got == exact and len(got) > 0


# ---------------------------------------------------------------------------
# Dunn post-hoc: comparison count + decision consistency
# ---------------------------------------------------------------------------

def test_dunn_pair_count_and_decisions(spark, sfd):
    rows = _rows(spark, "dunn_posthoc_nations", sfd)
    k = len({r["nation_a"] for r in rows} | {r["nation_b"] for r in rows})
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        flag = abs(r["z_milli"]) > 3660  # crit 3.66 in milli
        # z_milli is rounded, so only assert consistency away from the edge
        if abs(abs(r["z_milli"]) - 3660) > 2:
            assert bool(r["signif_bonf"]) == flag, r


# ---------------------------------------------------------------------------
# t-closeness: EMD in [0, 1e6] ppm and class mass positive
# ---------------------------------------------------------------------------

def test_t_closeness_emd_bounds(spark, sfd):
    rows = _rows(spark, "t_closeness_audit", sfd)
    assert rows
    for r in rows:
        assert 0 <= r["emd_ppm"] <= 1_000_000
        assert r["k"] >= 1
        assert r["above_t"] == (1 if r["emd_ppm"] > 200_000 else 0)


# ---------------------------------------------------------------------------
# PR-AUC: inside the unit square, above-baseline for the F-status signal
# ---------------------------------------------------------------------------

def test_pr_auc_bounds(spark, sfd):
    (r,) = _rows(spark, "pr_auc_average_precision", sfd)
    assert 0 <= r["pr_auc_micro"] <= 1_000_000
    assert 0 < r["baseline_micro"] < 1_000_000


# ---------------------------------------------------------------------------
# Cohen's kappa / McNemar: range + exact po relation
# ---------------------------------------------------------------------------

def test_kappa_range_and_po(spark, sfd):
    (r,) = _rows(spark, "cohens_kappa_raters", sfd)
    a, b, c, d, n = r["a"], r["b"], r["c"], r["d"], r["n"]
    assert a + b + c + d == n
    assert r["po_ppm"] == (a + d) * 1_000_000 // n
    assert -1_000_000 <= r["kappa_ppm"] <= 1_000_000


def test_mcnemar_uses_same_confusion(spark, sfd):
    (kap,) = _rows(spark, "cohens_kappa_raters", sfd)
    (mc,) = _rows(spark, "mcnemar_paired_raters", sfd)
    assert (mc["b"], mc["c"], mc["n"]) == (kap["b"], kap["c"], kap["n"])


# ---------------------------------------------------------------------------
# MMD: kernel means in (0, 1e6], MMD^2 consistent with its three means
# ---------------------------------------------------------------------------

def test_mmd_kernel_means_consistent(spark, sfd):
    (r,) = _rows(spark, "mmd_rbf_two_sample", sfd)
    for col in ("mean_kxx_ppm", "mean_kyy_ppm", "mean_kxy_ppm"):
        assert 0 < r[col] <= 1_000_000
    assert r["mmd2_ppm"] == (
        r["mean_kxx_ppm"] + r["mean_kyy_ppm"] - 2 * r["mean_kxy_ppm"]
    )
    assert r["nx"] + r["ny"] == 128


# ---------------------------------------------------------------------------
# Survival pair: Nelson-Aalen vs Kaplan-Meier ordering H(t) >= -ln S(t)
# ---------------------------------------------------------------------------

def test_nelson_aalen_dominates_km_log_survival(spark, sfd):
    """For the same event table, sum d/n >= sum -ln(1-d/n) is FALSE —
    the inequality runs the other way: -ln(1-x) >= x, so KM's -ln S(t)
    >= NA's H(t) at every event time (both in micro-nats, same grain).
    This cross-checks the two estimators against each other."""
    na = {r["t_hours"]: r for r in _rows(spark, "nelson_aalen_hazard", sfd)}
    km = {r["t_hours"]: r for r in _rows(spark, "kaplan_meier_survival", sfd)}
    assert set(na) == set(km) and na
    for t, rna in na.items():
        rkm = km[t]
        assert rna["n_risk"] == rkm["n_risk"] and rna["d"] == rkm["d"]
        # -ln S in micro-nats (clipped at 8e6 in KM); NA is unclipped, so
        # compare only below the clip, with 1-micro-per-step rounding slack
        if -rkm["ln_surv_unat"] < 8_000_000:
            steps = len([u for u in na if u <= t])
            assert -rkm["ln_surv_unat"] >= rna["cumhaz_micro"] - steps


# ---------------------------------------------------------------------------
# Log-rank / Welch / CMH / KW / Friedman / Page: statistic sanity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "name,stat_col",
    [
        ("logrank_test_survival", "chi2_stat"),
        ("cmh_stratified_test", "chi2_stat"),
        ("kruskal_wallis_h", "h_stat"),
        ("friedman_test_blocks", "q_stat"),
    ],
)
def test_nonnegative_statistics(spark, name, stat_col, sfd):
    (r,) = _rows(spark, name, sfd)
    assert r[stat_col] >= 0, (name, r)


def test_item_item_knn_shape(spark, sfd):
    rows = _rows(spark, "item_item_cosine_knn", sfd)
    assert rows
    per_item: dict = {}
    for r in rows:
        assert 0 < r["cos_ppm"] <= 1_000_000
        assert r["co_baskets"] >= 2
        per_item.setdefault(r["item"], []).append(r["rnk"])
    for item, rnks in per_item.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), item


def test_textrank_scores_positive_and_topk(spark, sfd):
    rows = _rows(spark, "textrank_keywords", sfd)
    assert len(rows) == 20
    assert [r["rnk"] for r in rows] == list(range(1, 21))
    micro = [r["rank_micro"] for r in rows]
    assert micro == sorted(micro, reverse=True)
    assert all(m > 0 for m in micro)
