"""Median-of-N timing for a subset of registry queries, bench.py-style
(warm-up pass, then N round-robin runs, report per-query median).

Usage: python tools/minibench.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from etl_mssql_to_postgres_dailysync_spark.session import get_spark


def median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    spark = get_spark(app_name="minibench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    names = [n for n in names if n in qs]
    for name in names:
        qs[name](spark, sf_dir).count()  # warm-up
    samples = {n: [] for n in names}
    for _ in range(n_runs):
        for name in names:
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            samples[name].append(time.time() - t0)
    out = {n: round(median(ts), 3) for n, ts in samples.items()}
    out["_total"] = round(sum(v for k, v in out.items() if not k.startswith("_")), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
