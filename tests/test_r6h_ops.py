"""Property tests for the r6h operator tranche (Good-Turing smoothing,
bitmap exact distinct, isotonic/PAV calibration), beyond oracle parity."""

from __future__ import annotations

from fractions import Fraction

import duckdb
import pandas as pd

from etl_mssql_to_postgres_dailysync_spark.functions.dedup import _shingle_hashes_py
from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# good_turing_smoothing
# ---------------------------------------------------------------------------

def test_good_turing_matches_pure_python_spectrum(spark):
    """The (r, N_r) spectrum and every derived column must equal the
    from-scratch Python computation over the same shingle species."""
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    from collections import Counter

    df_counts = Counter()
    for t in docs["text"]:
        for sh in set(_shingle_hashes_py(t, 3)):
            df_counts[sh] += 1
    spectrum = Counter(df_counts.values())

    rows = {r["r"]: r for r in QUERIES["good_turing_smoothing"](spark, SF_DIR).collect()}
    expected_rs = sorted(r for r in spectrum if r <= 20)
    assert sorted(rows) == expected_rs
    for r in expected_rs:
        n_r, n_r1 = spectrum[r], spectrum.get(r + 1, 0)
        row = rows[r]
        assert row["n_r"] == n_r
        assert row["n_r1"] == n_r1
        assert row["r_star_micro"] == (r + 1) * n_r1 * 1_000_000 // n_r
        assert row["discount_ppm"] == (r + 1) * n_r1 * 1_000_000 // (n_r * r)


def test_good_turing_spectrum_has_a_tail(spark):
    """The operator is only meaningful if the species spectrum actually has
    singletons (guards against a fixture regression back to the 31-type
    word vocabulary where every count is ~900)."""
    rows = {r["r"]: r for r in QUERIES["good_turing_smoothing"](spark, SF_DIR).collect()}
    assert 1 in rows and rows[1]["n_r"] > 100
    # classic GT shape: singletons dominate doubletons
    assert rows[1]["n_r"] > rows[2]["n_r"]


# ---------------------------------------------------------------------------
# bitmap_exact_distinct
# ---------------------------------------------------------------------------

def test_bitmap_popcount_equals_exact_distinct(spark):
    """The 63-bit word bitmap popcount must reproduce count(DISTINCT)
    exactly for every group — the identity the operator demonstrates."""
    rows = QUERIES["bitmap_exact_distinct"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_distinct_bitmap"] == r["n_distinct_exact"]
        # each occupied word holds between 1 and 63 distinct ids
        assert r["n_words"] <= r["n_distinct_exact"] <= 63 * r["n_words"]


def test_bitmap_words_merge_like_checkpoints():
    """bit_or of per-day word masks == word mask of the union — the
    mergeability property that makes the layout a cube/checkpoint state."""
    day1 = {10, 75, 140}
    day2 = {75, 141, 9}
    def words(ids):
        m: dict[int, int] = {}
        for i in ids:
            m[i // 63] = m.get(i // 63, 0) | (1 << (i % 63))
        return m
    w1, w2 = words(day1), words(day2)
    merged = {w: w1.get(w, 0) | w2.get(w, 0) for w in set(w1) | set(w2)}
    assert merged == words(day1 | day2)
    assert sum(bin(v).count("1") for v in merged.values()) == len(day1 | day2)


# ---------------------------------------------------------------------------
# isotonic_calibration
# ---------------------------------------------------------------------------

def _stack_pav(bins):
    """Classic sequential pool-adjacent-violators on [(b, n, s)] with exact
    Fraction means; returns {b: fitted_rate_fraction}."""
    pools = []  # [b_list, n, s]
    for b, n, s in bins:
        pools.append([[b], n, s])
        while len(pools) >= 2 and Fraction(pools[-2][2], pools[-2][1]) > Fraction(
            pools[-1][2], pools[-1][1]
        ):
            bs, n2, s2 = pools.pop()
            pools[-1][0].extend(bs)
            pools[-1][1] += n2
            pools[-1][2] += s2
    out = {}
    for bs, n, s in pools:
        for b in bs:
            out[b] = Fraction(s, n)
    return out


def test_isotonic_equals_stack_pav(spark):
    """The minimax formula must equal the sequential PAV fit exactly:
    iso_ppm == floor(1e6 * PAV rate) (floor commutes with min/max)."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'"
    )
    bins = con.execute(
        """
        SELECT least(CAST(floor(o_totalprice / 25000) AS INT), 19) AS b,
               count(*) AS n,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END) AS s
        FROM orders GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    fit = _stack_pav(bins)
    rows = {r["b"]: r for r in QUERIES["isotonic_calibration"](spark, SF_DIR).collect()}
    assert sorted(rows) == sorted(fit)
    for b, rate in fit.items():
        assert rows[b]["iso_ppm"] == (rate.numerator * 1_000_000) // rate.denominator


def test_isotonic_output_is_monotone_and_pool_preserving(spark):
    rows = sorted(
        QUERIES["isotonic_calibration"](spark, SF_DIR).collect(),
        key=lambda r: r["b"],
    )
    iso = [r["iso_ppm"] for r in rows]
    assert iso == sorted(iso)
    # PAV preserves the global weighted mean (up to the 1-ppm floor per bin)
    w_raw = sum(r["n"] * r["raw_ppm"] for r in rows)
    w_iso = sum(r["n"] * r["iso_ppm"] for r in rows)
    assert abs(w_raw - w_iso) <= sum(r["n"] for r in rows)


# ---------------------------------------------------------------------------
# poisson_bootstrap_replicates
# ---------------------------------------------------------------------------

def _boot_weight(u16: int) -> int:
    for w, th in enumerate([24109, 48218, 60273, 64291, 65296, 65497, 65530, 65535]):
        if u16 < th:
            return w
    return 8


def test_poisson_bootstrap_matches_md5_replica(spark):
    """Replicate means must equal the from-scratch Python md5-slice draw."""
    import hashlib

    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = [int(round(p * 100)) for p in orders["o_totalprice"]]
    keys = list(orders["o_orderkey"])
    rows = {r["rep"]: r for r in
            QUERIES["poisson_bootstrap_replicates"](spark, SF_DIR).collect()}
    assert sorted(rows) == list(range(32))
    for rep in (0, 7, 8, 31):  # cover all digest/slice corners
        seed, off = rep // 8, (rep % 8) * 4
        n_eff = wsum = 0
        for k, c in zip(keys, cents):
            hx = hashlib.md5(f"{k}#b{seed}".encode()).hexdigest()
            w = _boot_weight(int(hx[off:off + 4], 16))
            n_eff += w
            wsum += w * c
        assert rows[rep]["n_eff"] == n_eff
        assert rows[rep]["boot_mean_cents"] == wsum // n_eff


def test_poisson_bootstrap_summary_is_consistent(spark):
    rows = QUERIES["poisson_bootstrap_replicates"](spark, SF_DIR).collect()
    means = [r["boot_mean_cents"] for r in rows]
    r0 = rows[0]
    assert r0["boot_lo_cents"] == min(means)
    assert r0["boot_hi_cents"] == max(means)
    # the point estimate sits inside the replicate envelope
    assert r0["boot_lo_cents"] <= r0["point_cents"] <= r0["boot_hi_cents"]
    assert r0["boot_se_cents"] > 0
    # Poisson(1) weights: total effective n across replicates ~ 32 * n
    n = len(pd.read_parquet(f"{SF_DIR}/orders.parquet"))
    total_w = sum(r["n_eff"] for r in rows)
    assert abs(total_w - 32 * n) < 32 * n * 0.05


def test_poisson_thresholds_match_pmf():
    """The 16-bit CASE thresholds must reproduce the Poisson(1) pmf."""
    import math
    for k in range(8):
        lo = 0 if k == 0 else [24109, 48218, 60273, 64291, 65296, 65497, 65530][k - 1]
        hi = [24109, 48218, 60273, 64291, 65296, 65497, 65530, 65535][k]
        assert abs((hi - lo) / 65536 - math.exp(-1) / math.factorial(k)) < 1e-4


# ---------------------------------------------------------------------------
# adamic_adar_copurchase
# ---------------------------------------------------------------------------

def test_adamic_adar_term_bounds(spark):
    """Every pair's score is n_common terms each in [1/ln(max_basket),
    1/ln(2)] micro — the degree-discount envelope."""
    import math

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    max_basket = li.groupby("l_orderkey")["l_partkey"].nunique().max()
    lo = round(1_000_000 / math.log(max_basket))
    hi = round(1_000_000 / math.log(2))
    rows = QUERIES["adamic_adar_copurchase"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert lo * r["n_common"] <= r["aa_micro"] <= hi * r["n_common"]


def test_adamic_adar_prefers_small_baskets():
    """Sanity on the scoring semantics: one shared 2-item order outranks
    one shared 7-item order."""
    import math
    assert 1 / math.log(2) > 1 / math.log(7)


# ---------------------------------------------------------------------------
# l_diversity_audit
# ---------------------------------------------------------------------------

def test_l_diversity_entropy_bounds(spark):
    """0 <= entropy <= ln(l) (up to 1-unat-per-term rounding), and l=1
    classes have exactly zero entropy."""
    import math

    rows = QUERIES["l_diversity_audit"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        l = r["l_distinct"]
        cap = round(math.log(l) * 1_000_000) + l  # + rounding slack
        assert 0 <= r["min_entropy_unat"] <= r["max_entropy_unat"] <= cap
        if l == 1:
            assert r["max_entropy_unat"] == 0


def test_l_diversity_record_conservation(spark):
    """Histogram record mass must equal the joined fact-row count."""
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'")
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{SF_DIR}/customer.parquet'")
    n = con.execute(
        "SELECT count(*) FROM orders JOIN customer ON c_custkey = o_custkey"
    ).fetchone()[0]
    rows = QUERIES["l_diversity_audit"](spark, SF_DIR).collect()
    assert sum(r["n_records"] for r in rows) == n
