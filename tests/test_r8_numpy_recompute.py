"""Third-implementation recomputes of the highest formula-risk statistics.

The invariant suite (test_r5r6_invariants.py) pins properties the math
guarantees; this suite goes one step further for the statistics where a
formula error is most plausible and hardest to see: it recomputes each
statistic END TO END in numpy from the raw parquet rows (population
assembled with plain DuckDB SQL, statistic computed with the textbook
float formula — rank ties via averaging, chi-square via float expected
counts, Welch via sample variances), and compares against the engine's
integer-staged output within the staging's documented rounding tolerance.

This is a genuinely different code path from BOTH engines: the Spark and
DuckDB oracle twins share their integer staging (per-term micro rounding,
offset floor-division tricks) by construction, so a staging-level formula
error is invisible to hash parity — the friedman_test_blocks Q-coefficient
bug shipped exactly that way. A float textbook recompute cannot share that
error class.

Runs at both deterministic fixtures (seed-42 testdata, derived seed-43
subsample), like the invariant suite.
"""

from __future__ import annotations

import importlib.util
import math
import os

import duckdb
import numpy as np
import pytest

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SEED42 = "/root/testdata/sf0.001"


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
    key = (name, sfd)
    if key not in _CACHE:
        _CACHE[key] = QUERIES[name](spark, sfd).collect()
    return _CACHE[key]


def _duck(sfd: str, sql: str) -> list[tuple]:
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "nation", "events", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfd}/{t}.parquet'")
    return con.sql(sql).fetchall()


def _rankdata(a: np.ndarray) -> np.ndarray:
    """Tie-averaged ranks (1-based), scipy.stats.rankdata('average') twin."""
    order = np.argsort(a, kind="mergesort")
    ranks = np.empty(len(a), dtype=float)
    sa = a[order]
    i = 0
    while i < len(sa):
        j = i
        while j + 1 < len(sa) and sa[j + 1] == sa[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


# ---------------------------------------------------------------------------


def test_ks_two_sample_numpy(spark, sfd):
    """D = sup|F1 - F2| recomputed from raw cents with float ECDFs."""
    (r,) = _rows(spark, "ks_two_sample", sfd)
    rows = _duck(sfd, """
        SELECT CAST(round(o_totalprice * 100) AS BIGINT),
               CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END
        FROM orders""")
    cents = np.array([x[0] for x in rows], dtype=np.int64)
    grp = np.array([x[1] for x in rows], dtype=np.int64)
    a, b = np.sort(cents[grp == 1]), np.sort(cents[grp == 0])
    pts = np.unique(cents)
    f1 = np.searchsorted(a, pts, side="right") / len(a)
    f0 = np.searchsorted(b, pts, side="right") / len(b)
    d = float(np.max(np.abs(f1 - f0)))
    assert r["n_a"] == len(a) and r["n_b"] == len(b)
    assert abs(r["ks_ppm"] / 1e6 - d) < 2e-6


def test_spearman_pearson_numpy(spark, sfd):
    """rho on tie-averaged ranks and Pearson on raw values, textbook."""
    (r,) = _rows(spark, "spearman_rank_corr", sfd)
    rows = _duck(sfd, """
        SELECT CAST(count(*) AS BIGINT),
               CAST(round(max(o.o_totalprice) * 100) AS BIGINT),
               CAST(round(max(o.o_totalprice)) AS BIGINT)
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey""")
    x = np.array([t[0] for t in rows], dtype=float)
    y = np.array([t[1] for t in rows], dtype=float)
    yd = np.array([t[2] for t in rows], dtype=float)
    rx, ry = _rankdata(x), _rankdata(y)
    rho = float(np.corrcoef(rx, ry)[0, 1])
    pear = float(np.corrcoef(x, yd)[0, 1])
    assert r["n"] == len(rows)
    assert abs(r["spearman_rho"] - rho) < 1e-5
    assert abs(r["pearson_r"] - pear) < 1e-5


def test_one_way_anova_numpy(spark, sfd):
    """F from per-group float means (textbook between/within SS)."""
    (r,) = _rows(spark, "one_way_anova_f", sfd)
    rows = _duck(sfd, """
        SELECT n_name, CAST(round(o_totalprice) AS BIGINT)
        FROM orders JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey""")
    by_g: dict[str, list[float]] = {}
    for g, x in rows:
        by_g.setdefault(g, []).append(float(x))
    all_x = np.array([x for xs in by_g.values() for x in xs])
    gm = all_x.mean()
    ssb = sum(len(xs) * (np.mean(xs) - gm) ** 2 for xs in by_g.values())
    ssw = sum(((np.array(xs) - np.mean(xs)) ** 2).sum() for xs in by_g.values())
    k, n = len(by_g), len(all_x)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r["n"] == n and r["k"] == k
    assert r["f_stat"] == pytest.approx(f, rel=1e-4)


def test_welch_ttest_numpy(spark, sfd):
    """Welch t and Satterthwaite df from float sample variances."""
    (r,) = _rows(spark, "welch_ttest_spend", sfd)
    rows = _duck(sfd, """
        SELECT o_custkey % 2, CAST(round(o_totalprice) AS BIGINT)
        FROM orders""")
    x0 = np.array([float(x) for g, x in rows if g == 0])
    x1 = np.array([float(x) for g, x in rows if g == 1])
    v0, v1 = x0.var(ddof=1) / len(x0), x1.var(ddof=1) / len(x1)
    t = (x1.mean() - x0.mean()) / math.sqrt(v0 + v1)
    df = (v0 + v1) ** 2 / (v0**2 / (len(x0) - 1) + v1**2 / (len(x1) - 1))
    assert r["n0"] == len(x0) and r["n1"] == len(x1)
    assert r["t_stat"] == pytest.approx(t, rel=1e-4, abs=1e-5)
    assert abs(r["df_welch"] - df) <= 1.0


def test_kruskal_wallis_numpy(spark, sfd):
    """Tie-corrected H from tie-averaged ranks, textbook."""
    (r,) = _rows(spark, "kruskal_wallis_h", sfd)
    rows = _duck(sfd, """
        SELECT n_name, CAST(round(o_totalprice * 100) AS BIGINT)
        FROM orders JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey""")
    groups = [g for g, _ in rows]
    cents = np.array([c for _, c in rows], dtype=np.int64)
    ranks = _rankdata(cents.astype(float))
    n = len(cents)
    by_g: dict[str, list[float]] = {}
    for g, rk in zip(groups, ranks):
        by_g.setdefault(g, []).append(rk)
    h = 12.0 / (n * (n + 1)) * sum(
        (np.sum(rs)) ** 2 / len(rs) for rs in by_g.values()
    ) - 3 * (n + 1)
    _, counts = np.unique(cents, return_counts=True)
    tie = 1.0 - float(np.sum(counts**3 - counts)) / (n**3 - n)
    h /= tie
    assert r["n"] == n and r["k"] == len(by_g)
    assert r["h_stat"] == pytest.approx(h, rel=1e-4, abs=1e-4)


def test_cohens_kappa_numpy(spark, sfd):
    """kappa = (po - pe)/(1 - pe) recomputed in float from the emitted
    confusion matrix (the formula layer, independent of the ppm staging)."""
    (r,) = _rows(spark, "cohens_kappa_raters", sfd)
    a, b, c, d, n = r["a"], r["b"], r["c"], r["d"], r["n"]
    assert a + b + c + d == n
    po = (a + d) / n
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert abs(r["kappa_ppm"] / 1e6 - kappa) < 3e-6
    assert abs(r["po_ppm"] / 1e6 - po) < 2e-6
    assert abs(r["pe_ppm"] / 1e6 - pe) < 2e-6


def test_friedman_q_numpy(spark, sfd):
    """Q = 12/(nk(k+1)) sum R_j^2 - 3n(k+1) over complete blocks with
    tie-averaged within-block ranks — the r7 bug class, recomputed."""
    (r,) = _rows(spark, "friedman_test_blocks", sfd)
    rows = _duck(sfd, """
        SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m'),
               o_orderpriority,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        FROM orders GROUP BY 1, 2""")
    cells: dict[str, dict[str, int]] = {}
    for blk, trt, x in rows:
        cells.setdefault(blk, {})[trt] = int(x)
    k = max(len(v) for v in cells.values())
    complete = {b: v for b, v in cells.items() if len(v) == k}
    trts = sorted(next(iter(complete.values())).keys())
    rsum = {t: 0.0 for t in trts}
    for _, v in complete.items():
        xs = np.array([v[t] for t in trts], dtype=float)
        rks = _rankdata(xs)
        for t, rk in zip(trts, rks):
            rsum[t] += rk
    n = len(complete)
    q = 12.0 / (n * k * (k + 1)) * sum(s * s for s in rsum.values()) - 3 * n * (k + 1)
    assert r["n"] == n and r["k"] == k
    assert r["q_stat"] == pytest.approx(q, rel=1e-4, abs=1e-3)
    assert q >= -1e-9  # the non-negativity pin that caught the r7 bug


def test_logrank_numpy(spark, sfd):
    """Log-rank chi2 recomputed with float hypergeometric moments."""
    (r,) = _rows(spark, "logrank_test_survival", sfd)
    rows = _duck(sfd, """
        WITH ue AS (
          SELECT user_id, CAST(user_id % 2 AS BIGINT) AS grp,
                 CAST(min(epoch_us(ts)) AS BIGINT) AS t_first,
                 CAST(min(CASE WHEN event_type = 'purchase'
                          THEN epoch_us(ts) END) AS BIGINT) AS t_purch
          FROM events GROUP BY 1, 2),
        mx AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS t_max FROM events)
        SELECT grp,
               CASE WHEN t_purch IS NOT NULL
                    THEN (t_purch - t_first) // 3600000000
                    ELSE (t_max - t_first) // 3600000000 END,
               CASE WHEN t_purch IS NOT NULL THEN 1 ELSE 0 END
        FROM ue CROSS JOIN mx""")
    grp = np.array([x[0] for x in rows], dtype=np.int64)
    t = np.array([x[1] for x in rows], dtype=np.int64)
    ev = np.array([x[2] for x in rows], dtype=np.int64)
    o1 = e1 = v = 0.0
    for tt in np.unique(t[ev == 1]):
        at = t >= tt
        n_risk, n1_risk = int(at.sum()), int((at & (grp == 1)).sum())
        d = int(((t == tt) & (ev == 1)).sum())
        d1 = int(((t == tt) & (ev == 1) & (grp == 1)).sum())
        o1 += d1
        e1 += d * n1_risk / n_risk
        if n_risk > 1:
            v += (d * n1_risk * (n_risk - n1_risk) * (n_risk - d)
                  / (n_risk**2 * (n_risk - 1)))
    chi2 = (o1 - e1) ** 2 / v
    assert r["o1"] == int(o1)
    assert r["chi2_stat"] == pytest.approx(chi2, rel=5e-3, abs=1e-3)


def test_mann_whitney_auc_numpy(spark, sfd):
    """AUC = P(pos > neg) + 0.5 P(tie) by brute-force pair counting."""
    rows_out = {r["priority"]: r for r in _rows(spark, "mann_whitney_auc", sfd)}
    raw = _duck(sfd, """
        SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT),
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
        FROM orders""")
    by_p: dict[str, tuple[list, list]] = {}
    for p, c, pos in raw:
        by_p.setdefault(p, ([], []))[0 if pos else 1].append(c)
    for p, (pos, neg) in by_p.items():
        pos_a = np.array(sorted(pos), dtype=np.int64)
        neg_a = np.array(sorted(neg), dtype=np.int64)
        gt = np.searchsorted(neg_a, pos_a, side="left").sum()
        eq = (np.searchsorted(neg_a, pos_a, side="right")
              - np.searchsorted(neg_a, pos_a, side="left")).sum()
        auc = (gt + 0.5 * eq) / (len(pos_a) * len(neg_a))
        r = rows_out[p]
        assert r["n_pos"] == len(pos_a) and r["n_neg"] == len(neg_a)
        assert abs(r["auc_ppm"] / 1e6 - auc) < 2e-6, p


def test_cramers_v_numpy(spark, sfd):
    """V from float chi-square over the contingency table (the staged
    version floors expected counts at milli grain — tolerance covers it)."""
    (r,) = _rows(spark, "cramers_v_association", sfd)
    rows = _duck(sfd, """
        SELECT o_orderpriority, o_orderstatus, count(*)
        FROM orders GROUP BY 1, 2""")
    ps = sorted({x[0] for x in rows})
    ss = sorted({x[1] for x in rows})
    m = np.zeros((len(ps), len(ss)))
    for p, s, c in rows:
        m[ps.index(p), ss.index(s)] = c
    n = m.sum()
    exp = np.outer(m.sum(axis=1), m.sum(axis=0)) / n
    chi2 = float(((m - exp) ** 2 / exp).sum())
    v = math.sqrt(chi2 / (n * (min(len(ps), len(ss)) - 1)))
    assert r["n"] == int(n)
    assert abs(r["cramers_v"] - v) < 5e-3
    assert abs(r["chi2_milli"] / 1000 - chi2) < max(0.02 * chi2, 0.5)


def test_mann_kendall_numpy(spark, sfd):
    """S, tie-corrected Var(S), and z recomputed from the daily series."""
    (r,) = _rows(spark, "mann_kendall_trend", sfd)
    rows = _duck(sfd, """
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        FROM orders GROUP BY 1 ORDER BY 1""")
    x = np.array([v for _, v in rows], dtype=np.int64)
    n = len(x)
    s = int(np.sign(x[None, :] - x[:, None])[np.triu_indices(n, 1)].sum())
    _, counts = np.unique(x, return_counts=True)
    var = (n * (n - 1) * (2 * n + 5)
           - np.sum(counts * (counts - 1) * (2 * counts + 5))) / 18.0
    z = ((s - 1) / math.sqrt(var) if s > 0
         else (s + 1) / math.sqrt(var) if s < 0 else 0.0)
    assert r["n"] == n
    assert r["s_stat"] == s
    assert r["var_s"] == pytest.approx(var, rel=1e-9, abs=1.0)
    assert r["z"] == pytest.approx(z, abs=1e-4)


def test_theil_sen_numpy(spark, sfd):
    """The median pairwise slope recomputed in float (lower-middle order
    statistic, the engine's convention) within 1 milli of the staged
    integer value."""
    (r,) = _rows(spark, "theil_sen_trend", sfd)
    rows = _duck(sfd, """
        SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)),
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        FROM orders
        WHERE CAST(o_orderdate AS DATE)
              BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
        GROUP BY 1 ORDER BY 1""")
    xs = np.array([a for a, _ in rows], dtype=np.int64)
    ys = np.array([b for _, b in rows], dtype=np.int64)
    slopes = []
    for i in range(len(xs)):
        for j in range(i + 1, len(xs)):
            slopes.append(1000.0 * (ys[j] - ys[i]) / (xs[j] - xs[i]))
    slopes.sort()
    med = slopes[(len(slopes) + 1) // 2 - 1]
    assert r["n_pairs"] == len(slopes)
    # the engine floors each pairwise slope to integer milli BEFORE the
    # order statistic, which can move the median across adjacent floats —
    # bound by the gap to the true float order statistic plus 1 milli
    assert abs(r["ts_slope_milli"] - med) <= max(abs(med) * 1e-6, 1.5)
