"""Regression guard for the bench output protocol.

The round driver keeps only a fixed-size (~2000 char) tail of bench.py's
stdout and json-parses the LAST line. r4's artifact came back
``"parsed": null`` because the single output line (metric + 39 medians +
39 spreads + runs_per_query) overflowed that window. The protocol fix
(diagnostics on earlier lines, compact headline line LAST) only stays
fixed if the final line stays comfortably under the window — this test
recomputes the final line's worst-case length from the CURRENT headline
list, so adding queries to HEADLINE (instead of TRANCHE) trips it before
the driver loses another round's bench number.
"""

from __future__ import annotations

import json

import bench


def test_final_line_fits_driver_tail_window():
    # worst-case value widths: totals "9999.999", per-query "999.999"
    worst = {
        "metric": "headline_queries_total",
        "value": 9999.999,
        "unit": "sec",
        "queries": {name: 999.999 for name in bench.HEADLINE},
        "sf": 0.1,
        "noise_floor": 9999.999,
    }
    line = json.dumps(worst)
    assert len(line) < 1800, (
        f"headline metric line would be {len(line)} chars; the driver tail "
        "window is ~2000 — move queries to TRANCHE, don't grow HEADLINE"
    )


def test_headline_set_is_frozen():
    """The 39-query headline set is the round-over-round comparable; it
    must not grow or shrink (new queries belong in TRANCHE)."""
    assert len(bench.HEADLINE) == 39
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_all_bench_queries_registered():
    """Every benched name must exist in the registry — a renamed query
    would otherwise silently drop out of the bench (run_set filters)."""
    from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

    missing = [n for n in bench.HEADLINE + bench.TRANCHE if n not in QUERIES]
    assert not missing, missing
