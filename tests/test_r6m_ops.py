"""Property tests for the r6m operator tranche (SRM guardrail, IPF raking,
median polish)."""

from __future__ import annotations

import statistics
from collections import Counter, defaultdict

import duckdb
import pandas as pd

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _joined(con_views=("orders", "customer", "nation")):
    con = duckdb.connect()
    for t in con_views:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


# ---------------------------------------------------------------------------
# srm_guardrail_check
# ---------------------------------------------------------------------------

def test_srm_matches_replica_and_flag_semantics(spark):
    con = _joined()
    raw = con.execute(
        """SELECT n_name, CAST(o_custkey % 2 AS INT)
           FROM orders JOIN customer ON c_custkey = o_custkey
           JOIN nation ON n_nationkey = c_nationkey"""
    ).fetchall()
    counts = defaultdict(lambda: [0, 0])
    for nation, v in raw:
        counts[nation][v] += 1
        counts["ALL"][v] += 1
    rows = {r["scope"]: r for r in
            QUERIES["srm_guardrail_check"](spark, SF_DIR).collect()}
    assert set(rows) == set(counts)
    for scope, (n0, n1) in counts.items():
        r = rows[scope]
        chi = (n0 - n1) ** 2 * 1000 // (n0 + n1)
        assert (r["n0"], r["n1"], r["chi2_milli"]) == (n0, n1, chi)
        assert r["srm_flag"] == (1 if chi > 3841 else 0)


def test_srm_statistic_is_the_two_cell_chi_square():
    """(n0-n1)^2/N == sum (ni - N/2)^2 / (N/2) for two cells."""
    for n0, n1 in [(50, 50), (60, 40), (1000, 900)]:
        n = n0 + n1
        classic = sum((x - n / 2) ** 2 / (n / 2) for x in (n0, n1))
        assert abs(classic - (n0 - n1) ** 2 / n) < 1e-9


# ---------------------------------------------------------------------------
# ipf_raking_weights
# ---------------------------------------------------------------------------

def test_ipf_matches_replica_and_converges(spark):
    con = _joined()
    cells = Counter(
        tuple(r) for r in con.execute(
            """SELECT n_name, c_mktsegment
               FROM orders JOIN customer ON c_custkey = o_custkey
               JOIN nation ON n_nationkey = c_nationkey"""
        ).fetchall()
    )
    cpop = Counter(
        tuple(r) for r in con.execute(
            """SELECT n_name, c_mktsegment
               FROM customer JOIN nation ON n_nationkey = c_nationkey"""
        ).fetchall()
    )
    n_orders = sum(cells.values())
    n_cust = sum(cpop.values())
    rtarget = {}
    ctarget = {}
    for (nat, seg), c in cpop.items():
        rtarget[nat] = rtarget.get(nat, 0) + c
        ctarget[seg] = ctarget.get(seg, 0) + c
    rtarget = {k: v * n_orders * 1_000_000 // n_cust for k, v in rtarget.items()}
    ctarget = {k: v * n_orders * 1_000_000 // n_cust for k, v in ctarget.items()}
    w = {k: 1_000_000 for k in cells}
    for _ in range(3):
        rm = defaultdict(int)
        for (nat, seg), n in cells.items():
            rm[nat] += n * w[(nat, seg)]
        w = {
            (nat, seg): w[(nat, seg)] * rtarget[nat] // max(rm[nat], 1)
            for (nat, seg) in cells
        }
        cm = defaultdict(int)
        for (nat, seg), n in cells.items():
            cm[seg] += n * w[(nat, seg)]
        w = {
            (nat, seg): w[(nat, seg)] * ctarget[seg] // max(cm[seg], 1)
            for (nat, seg) in cells
        }
    rows = QUERIES["ipf_raking_weights"](spark, SF_DIR).collect()
    assert len(rows) == len(cells)
    final_rm = defaultdict(int)
    for (nat, seg), n in cells.items():
        final_rm[nat] += n * w[(nat, seg)]
    for r in rows:
        key = (r["nation"], r["segment"])
        assert r["n"] == cells[key]
        assert r["w_micro"] == w[key]
        err = (abs(final_rm[r["nation"]] - rtarget[r["nation"]]) * 1_000_000
               // max(rtarget[r["nation"]], 1))
        assert r["row_margin_err_ppm"] == err
        # after 3 iterations the row margins should be within 2% of target
        assert r["row_margin_err_ppm"] < 20_000


# ---------------------------------------------------------------------------
# median_polish_revenue
# ---------------------------------------------------------------------------

def test_median_polish_matches_replica_and_decomposes(spark):
    con = _joined()
    cells = {
        (nat, mon): float(v) for nat, mon, v in con.execute(
            """SELECT n_name, CAST(month(CAST(o_orderdate AS DATE)) AS INT),
                      CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)
               FROM orders JOIN customer ON c_custkey = o_custkey
               JOIN nation ON n_nationkey = c_nationkey
               WHERE year(CAST(o_orderdate AS DATE)) = 1995
               GROUP BY 1, 2"""
        ).fetchall()
    }
    v = dict(cells)
    row_eff = defaultdict(float)
    col_eff = defaultdict(float)
    for _ in range(2):
        by_row = defaultdict(list)
        for (nat, mon), val in v.items():
            by_row[nat].append(val)
        rm = {nat: statistics.median(vals) for nat, vals in by_row.items()}
        v = {(nat, mon): val - rm[nat] for (nat, mon), val in v.items()}
        for nat, m_ in rm.items():
            row_eff[nat] += m_
        by_col = defaultdict(list)
        for (nat, mon), val in v.items():
            by_col[mon].append(val)
        cm = {mon: statistics.median(vals) for mon, vals in by_col.items()}
        v = {(nat, mon): val - cm[mon] for (nat, mon), val in v.items()}
        for mon, m_ in cm.items():
            col_eff[mon] += m_
    rows = QUERIES["median_polish_revenue"](spark, SF_DIR).collect()
    assert len(rows) == len(cells)
    for r in rows:
        key = (r["nation"], r["month"])
        assert r["resid"] == v[key]
        assert r["row_eff"] == row_eff[r["nation"]]
        assert r["col_eff"] == col_eff[r["month"]]
        # decomposition identity: value = row + col + resid (exact dyadic)
        assert cells[key] == r["row_eff"] + r["col_eff"] + r["resid"]


def test_median_polish_is_robust_to_one_outlier():
    """Unit check of the robustness claim: polishing a matrix with one
    huge cell leaves the OTHER cells' residuals small."""
    import itertools

    base = {(r, c): 10.0 * r + c for r, c in itertools.product(range(5), range(5))}
    base[(2, 2)] += 1e9
    v = dict(base)
    for _ in range(2):
        rm = {r: statistics.median([v[(r, c)] for c in range(5)]) for r in range(5)}
        v = {(r, c): val - rm[r] for (r, c), val in v.items()}
        cm = {c: statistics.median([v[(r, c)] for r in range(5)]) for c in range(5)}
        v = {(r, c): val - cm[c] for (r, c), val in v.items()}
    small = [abs(val) for k, val in v.items() if k != (2, 2)]
    assert max(small) < 10  # outlier did not leak into other residuals
    assert abs(v[(2, 2)]) > 1e8


# ---------------------------------------------------------------------------
# mann_kendall_trend
# ---------------------------------------------------------------------------

def test_mann_kendall_matches_pair_replica(spark):
    import math

    con = _joined(("orders",))
    days = con.execute(
        """SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR),
                  sum(CAST(round(o_totalprice*100) AS BIGINT))
           FROM orders GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    xs = [x for _, x in days]
    n = len(xs)
    s_stat = sum(
        (1 if xs[j] > xs[i] else (-1 if xs[j] < xs[i] else 0))
        for i in range(n) for j in range(i + 1, n)
    )
    ties = Counter(xs)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) // 18
    row = QUERIES["mann_kendall_trend"](spark, SF_DIR).collect()[0]
    assert row["n"] == n
    assert row["s_stat"] == s_stat
    assert row["var_s"] == var_s
    z = (s_stat - (1 if s_stat > 0 else (-1 if s_stat < 0 else 0))) / math.sqrt(var_s)
    assert abs(row["z"] - z) < 1e-5
    assert row["reject_95"] == (1 if abs(z) > 1.959964 else 0)


def test_mann_kendall_detects_monotone_series():
    """Pure-python semantics check: strictly increasing series maxes S."""
    xs = list(range(30))
    s = sum(1 for i in range(30) for j in range(i + 1, 30) if xs[j] > xs[i])
    assert s == 30 * 29 // 2  # every pair concordant


# ---------------------------------------------------------------------------
# power_analysis_design
# ---------------------------------------------------------------------------

def test_power_analysis_monotonicity_and_formula(spark):
    """Bigger effects need fewer samples and yield more achieved power;
    required n matches the closed form."""
    import math

    rows = sorted(
        QUERIES["power_analysis_design"](spark, SF_DIR).collect(),
        key=lambda r: r["delta_ppm"],
    )
    assert [r["delta_ppm"] for r in rows] == [5000, 10000, 20000, 30000, 50000]
    ns = [r["n_required_per_arm"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    pw = [r["achieved_power_ppm"] for r in rows]
    assert pw == sorted(pw)
    for r in rows:
        assert 0 <= r["achieved_power_ppm"] <= 1_000_000
    # replicate required-n for one row from the fixture aggregates
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    n_users = conv = 0
    for uid, grp in ev.groupby("user_id"):
        t0 = grp["us"].min()
        purch = grp[grp["event_type"] == "purchase"]["us"]
        tp = purch.min() if len(purch) else None
        n_users += 1
        conv += 1 if (tp is not None and tp - t0 < 3 * 86400 * 1_000_000) else 0
    p0 = conv / n_users
    for r in rows:
        delta = r["delta_ppm"] / 1e6
        p1 = min(p0 + delta, 0.999)
        za, zb = 1.959964, 0.841621
        nreq = math.ceil(
            (za * math.sqrt(2 * p0 * (1 - p0))
             + zb * math.sqrt(p0 * (1 - p0) + p1 * (1 - p1))) ** 2 / delta ** 2
        )
        assert r["n_required_per_arm"] == nreq


# ---------------------------------------------------------------------------
# changepoint_single_split
# ---------------------------------------------------------------------------

def test_changepoint_matches_between_ss_replica(spark):
    con = _joined(("orders",))
    days = con.execute(
        """SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR),
                  sum(CAST(round(o_totalprice*100) AS BIGINT))
           FROM orders GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    xs = [x for _, x in days]
    labels = [d for d, _ in days]
    n = len(xs)
    s_tot = sum(xs)
    best = []
    cs = 0
    for k in range(n - 1):
        cs += xs[k]
        cn = k + 1
        b = round(
            (cs * n - cn * s_tot) ** 2 / (n * n * cn * (n - cn)) / 1e6
        )
        best.append((b, labels[k], cn, cs))
    best.sort(key=lambda t: (-t[0], t[1]))
    rows = QUERIES["changepoint_single_split"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r, (b, day, cn, cs_) in zip(rows, best[:5]):
        assert r["split_day"] == day
        assert r["between_ss_scaled"] == b
        assert r["n_left"] == cn
        assert r["mean_left_micro"] == cs_ * 1_000_000 // cn
        assert r["mean_right_micro"] == (s_tot - cs_) * 1_000_000 // (n - cn)


def test_changepoint_finds_injected_shift():
    """Semantics: a clean mean shift maximizes B exactly at the shift."""
    xs = [100] * 40 + [200] * 40
    n = len(xs)
    s_tot = sum(xs)
    cs = 0
    bs = []
    for k in range(n - 1):
        cs += xs[k]
        cn = k + 1
        bs.append((cs * n - cn * s_tot) ** 2 / (n * n * cn * (n - cn)))
    assert bs.index(max(bs)) == 39
