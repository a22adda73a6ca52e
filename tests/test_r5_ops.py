"""Property tests for the r5 operator tranche, beyond oracle parity.

The DuckDB twins pin cross-engine equality; these pin the MATHEMATICAL
contracts the operators advertise (estimator guarantees, conservation
laws, agreement with an independent numpy implementation) — the kind of
invariant that survives a refactor of both sides at once.
"""

from __future__ import annotations

import numpy as np
import pytest

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_cms_join_size_overestimates_exact(spark):
    """CountMin inner products only ever collide UP: for every probed join,
    cms_est_pairs >= exact_pairs (the sketch's one-sided guarantee). The
    excess is ADDITIVE, not multiplicative — expected collision mass per
    seed is rows_a * rows_b / w, so a sparse join (tiny exact output) can
    legitimately show a large RELATIVE overestimate; the per-seed Markov
    bound P(excess > 3E) < 1/3 makes min-over-4-seeds exceed 3E with
    probability < (1/3)^4, which is what we assert."""
    rows = QUERIES["join_size_estimate_cms"](spark, SF_DIR).collect()
    assert len(rows) == 3
    sizes = {
        t: spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
        for t in ("orders", "lineitem")
    }
    mass = {
        "orders_self_custkey": sizes["orders"] * sizes["orders"],
        "lineitem_self_suppkey": sizes["lineitem"] * sizes["lineitem"],
        "lineitem_orders_orderkey": sizes["lineitem"] * sizes["orders"],
    }
    for r in rows:
        assert r["cms_est_pairs"] >= r["exact_pairs"], r["join_name"]
        assert r["overest_ppm"] >= 0
        bound = r["exact_pairs"] + 3 * mass[r["join_name"]] // 1024
        assert r["cms_est_pairs"] <= bound, (
            f"{r['join_name']}: est {r['cms_est_pairs']} above the "
            f"3x-expected-collision-mass bound {bound}"
        )


def test_kmv_jaccard_estimates_track_exact(spark):
    """KMV k=64 pairwise Jaccard estimates sit near the exact values the
    same query emits: mean absolute error within the ~1/sqrt(k) sketch
    noise band (|J_est - J| ~ 0.125 at k=64)."""
    rows = QUERIES["kmv_cross_source_jaccard"](spark, SF_DIR).collect()
    assert rows, "no source pairs"
    errs = [
        abs(r["jaccard_est_ppm"] - r["jaccard_exact_ppm"]) / 1e6 for r in rows
    ]
    assert sum(errs) / len(errs) <= 0.13, f"mean |est-exact| = {sum(errs)/len(errs):.3f}"
    # union estimator: within 3x on every pair (52-bit KMV, k=64) and exact
    # by construction whenever the merged sketch is under-full
    for r in rows:
        assert 0 < r["union_est"] <= 3 * r["union_exact"] + 64
        assert r["union_est"] >= r["union_exact"] // 3


def test_grouped_weighted_median_matches_numpy(spark):
    """The distributed weighted median equals the textbook definition
    computed serially: smallest value whose cumulative weight reaches half
    the total (ties broken identically by the same sort keys)."""
    got = {
        r["grp"]: (r["total_weight"], r["wmedian_cents"])
        for r in QUERIES["grouped_weighted_median"](spark, SF_DIR).collect()
    }
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .selectExpr(
            "l_returnflag AS grp",
            "cast(round(l_extendedprice * 100) as long) AS cents",
            "cast(l_quantity as long) AS w",
            "l_orderkey",
            "l_linenumber",
        )
        .collect()
    )
    by_grp: dict = {}
    for r in li:
        by_grp.setdefault(r["grp"], []).append(
            (r["cents"], r["l_orderkey"], r["l_linenumber"], r["w"])
        )
    for grp, rows in by_grp.items():
        rows.sort()
        tot = sum(w for *_, w in rows)
        cum = 0
        med = None
        for cents, _, _, w in rows:
            cum += w
            if 2 * cum >= tot:
                med = cents
                break
        assert got[grp] == (tot, med), grp


def test_embedding_covariance_matches_numpy(spark):
    """Top-|cov| dimension pairs agree with an independent numpy
    computation of the SAME integer convention (micro units, floor-div
    via the offset trick), pair-for-pair and value-for-value."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    m = np.array(
        [[round(float(x) * 1_000_000) for x in r["embedding"]] for r in emb],
        dtype=object,  # python ints: exact, overflow-free like DECIMAL(38)
    )
    n, d = m.shape
    off = 1_000_000_000_000
    sx = m.sum(axis=0)
    expected = {}
    for i in range(d):
        for j in range(i + 1, d):
            sxy = int((m[:, i] * m[:, j]).sum())
            num = n * sxy - int(sx[i]) * int(sx[j]) + off * n * n
            expected[(i + 1, j + 1)] = num // (n * n) - off
    top = sorted(
        expected.items(), key=lambda kv: (-abs(kv[1]), kv[0][0], kv[0][1])
    )[:20]
    got = QUERIES["embedding_covariance_topk"](spark, SF_DIR).collect()
    assert len(got) == 20
    for r, ((ei, ej), ev) in zip(sorted(got, key=lambda r: r["rnk"]), top):
        assert (r["dim_i"], r["dim_j"], r["cov_unit"]) == (ei, ej, ev), r["rnk"]


def test_novelty_conserves_distinct_shingles(spark):
    """Conservation law: summed n_novel across deciles equals the number
    of DISTINCT shingles in the corpus (every distinct shingle is novel in
    exactly one document — its first), and novelty never exceeds the
    shingle count in any decile."""
    from pyspark.sql import functions as F

    from etl_mssql_to_postgres_dailysync_spark.functions import dedup

    rows = QUERIES["ngram_novelty_curve"](spark, SF_DIR).collect()
    assert len(rows) == 10
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_distinct = (
        docs.select(F.explode(dedup.shingle_hashes_arrow(F.col("text"), 3)).alias("sh"))
        .agg(F.countDistinct("sh"))
        .first()[0]
    )
    assert sum(r["n_novel"] for r in rows) == n_distinct
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_shingles"]
