"""Property tests for the r6m operator tranche (SRM guardrail, IPF raking,
median polish)."""

from __future__ import annotations

import statistics
from collections import Counter, defaultdict

import duckdb

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
