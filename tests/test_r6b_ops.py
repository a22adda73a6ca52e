"""Property tests for the r6b operator tranche (rank statistics, drift
tests, association rules, bootstrap CIs), beyond oracle parity.

Oracle twins pin cross-engine equality; these pin the MATHEMATICAL
contracts against independent brute-force/pure-Python replicas of the
textbook definitions.
"""

from __future__ import annotations

import duckdb

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Mann-Whitney AUC (plans/driver_queries.mann_whitney_auc)
# ---------------------------------------------------------------------------

def test_auc_equals_brute_force_pair_probability(spark):
    """The rank-sum formula must equal the probabilistic definition
    AUC = [#(pos>neg) + 0.5*#(pos==neg)] / (n_pos*n_neg), computed here by
    brute-force O(n^2) pair counting per segment on the small fixture."""
    got = {r["priority"]: r for r in QUERIES["mann_whitney_auc"](spark, SF_DIR).collect()}
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT o_orderpriority, CAST(round(o_totalprice*100) AS BIGINT),
                   CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END
            FROM '{SF_DIR}/orders.parquet'"""
    ).fetchall()
    by_seg: dict[str, tuple[list[int], list[int]]] = {}
    for seg, cents, pos in rows:
        by_seg.setdefault(seg, ([], []))[0 if pos else 1].append(cents)
    assert set(got) == set(by_seg)
    for seg, (ps, ns) in by_seg.items():
        wins = sum(1 for p in ps for q in ns if p > q)
        ties = sum(1 for p in ps for q in ns if p == q)
        u2 = 2 * wins + ties  # 2*U to stay integer with half-credit ties
        r = got[seg]
        assert (r["n_pos"], r["n_neg"]) == (len(ps), len(ns))
        assert r["u2_stat"] == u2
        assert r["auc_ppm"] == u2 * 500000 // (len(ps) * len(ns))


def test_auc_extremes_and_symmetry(spark):
    """Perfect separation -> 1e6 ppm; reversed -> 0; all-tied -> 500000."""
    df = spark.createDataFrame(
        [("a", 10, 1), ("a", 11, 1), ("a", 1, 0), ("a", 2, 0),
         ("b", 1, 1), ("b", 2, 1), ("b", 10, 0), ("b", 11, 0),
         ("c", 5, 1), ("c", 5, 0), ("c", 5, 1), ("c", 5, 0)],
        "priority string, cents long, pos long",
    )
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    g = df.groupBy("priority", "cents").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("pos").alias("n_pos")
    )
    w = Window.partitionBy("priority").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    r = g.withColumn("cum_less", F.sum("cnt").over(w) - F.col("cnt"))
    s = r.groupBy("priority").agg(
        F.sum(F.col("n_pos") * (2 * F.col("cum_less") + F.col("cnt") + 1)).alias("s2"),
        F.sum("n_pos").alias("n1"),
        (F.sum("cnt") - F.sum("n_pos")).alias("n0"),
    )
    out = {
        x["priority"]: x["auc"]
        for x in s.select(
            "priority",
            F.expr("(s2 - n1*(n1+1)) * 500000 div (n1*n0)").alias("auc"),
        ).collect()
    }
    assert out == {"a": 1000000, "b": 0, "c": 500000}


# ---------------------------------------------------------------------------
# Two-sample KS (plans/driver_queries.ks_two_sample)
# ---------------------------------------------------------------------------

def test_ks_matches_brute_force_ecdf_sup(spark):
    """D must equal the sup-norm ECDF gap computed by a pure-Python sweep
    over the pooled sample, with the same floor-div ppm staging, and the
    reject bit must match the 1.358*sqrt((n1+n0)/(n1 n0)) rule."""
    row = QUERIES["ks_two_sample"](spark, SF_DIR).collect()[0]
    con = duckdb.connect()
    vals = con.execute(
        f"""SELECT CAST(round(o_totalprice*100) AS BIGINT),
                   CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END
            FROM '{SF_DIR}/orders.parquet'"""
    ).fetchall()
    a = sorted(c for c, g in vals if g == 1)
    b = sorted(c for c, g in vals if g == 0)
    n1, n0 = len(a), len(b)
    support = sorted(set(a) | set(b))
    import bisect

    best, at = -1, None
    for x in support:
        gap = abs(bisect.bisect_right(a, x) * n0 - bisect.bisect_right(b, x) * n1)
        if gap > best:
            best, at = gap, x
    assert (row["n_a"], row["n_b"]) == (n1, n0)
    assert row["ks_ppm"] == best * 1000000 // (n1 * n0)
    assert row["at_cents"] == at
    thr = 1844200000000 * (n1 + n0) // (n1 * n0)
    assert row["reject_95"] == int(row["ks_ppm"] ** 2 > thr)


def test_ks_extremes():
    """Disjoint supports give D=1 (always reject at any sane n); identical
    samples give D=0 (never reject) — checked on the integer staging
    directly (no Spark needed, the formula is shared)."""
    # disjoint: F1 jumps to 1 before F2 leaves 0 -> max gap = n1*n0
    n1 = n0 = 50
    assert (n1 * n0) * 1000000 // (n1 * n0) == 1000000
    thr = 1844200000000 * (n1 + n0) // (n1 * n0)
    assert 1000000**2 > thr  # reject
    assert 0**2 <= thr  # identical -> never reject


# ---------------------------------------------------------------------------
# Spearman rank correlation (plans/driver_queries.spearman_rank_corr)
# ---------------------------------------------------------------------------

def test_spearman_matches_pure_python_tie_averaged(spark):
    """rho must equal Pearson-on-tie-averaged-ranks computed by a pure
    Python replica (explicit average ranks, float arithmetic) to 6dp."""
    row = QUERIES["spearman_rank_corr"](spark, SF_DIR).collect()[0]
    con = duckdb.connect()
    pairs = con.execute(
        f"""SELECT CAST(count(*) AS BIGINT),
                   CAST(round(max(o.o_totalprice) * 100) AS BIGINT)
            FROM '{SF_DIR}/orders.parquet' o
            JOIN '{SF_DIR}/lineitem.parquet' l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey"""
    ).fetchall()

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            r = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = r
            i = j + 1
        return ranks

    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(pairs)
    mx = sum(rx) / n
    my = sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)) ** 0.5
    assert row["n"] == n
    assert abs(row["spearman_rho"] - num / den) < 1e-6


def test_spearman_perfect_monotone_and_antitone():
    """The centered-2r staging gives exactly +-1 for strict monotone data
    (pure Python check of the shared integer formulas)."""
    for flip, want in ((1, 1.0), (-1, -1.0)):
        xs = list(range(1, 21))
        ys = [flip * (x * x) for x in xs]  # strictly monotone, nonlinear
        n = len(xs)
        r2 = {v: 2 * (i + 1) for i, v in enumerate(sorted(xs))}
        r2y = {v: 2 * (i + 1) for i, v in enumerate(sorted(ys))}
        cx = [r2[x] - (n + 1) for x in xs]
        cy = [r2y[y] - (n + 1) for y in ys]
        sxy = sum(a * b for a, b in zip(cx, cy))
        sxx = sum(a * a for a in cx)
        syy = sum(b * b for b in cy)
        assert round(sxy / (sxx**0.5 * syy**0.5), 6) == want
