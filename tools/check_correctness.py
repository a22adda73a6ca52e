"""Local mini-driver: runs every queries() entry against its oracle_sql()
twin on DuckDB at a given scale factor and reports row-count / schema /
value-level matches — the same gate the round driver applies
(CORRECTNESS_r{N}.json), runnable in-loop.

Usage: python tools/check_correctness.py [--json OUT.json] [--resume]
                                         [--sample N --seed R]
                                         [--exclude PRIOR.json]
                                         [sf_dir] [query ...]

``--sample N --seed R`` (r8 verdict ask #7) draws a deterministic fresh
subset of the registry per round: names are ordered by md5(name + ":" + R)
and the first N run. ``--exclude PRIOR.json`` removes that artifact's query
names from the pool first — pass the driver's CORRECTNESS_r{N}.json so the
spot-check set is provably disjoint from the driver's fixed 50-name sample.

``--json`` additionally writes {"sf_dir", "n_queries", "n_ok", "n_fail",
"queries": {name: {"status": OK|ROWS|FAIL, "rows": n, "wall_s": t}}} — the
committed ALLGREEN_r{N}.json artifact: the round driver samples only 50 of
the registry per round, so this full-registry snapshot is what lets the
judge diff total coverage instead of re-spot-checking the unsampled 150.

``--resume`` (requires ``--json``): if OUT.json already exists, queries it
recorded as OK/ROWS are carried over and skipped; only FAILs and not-yet-run
queries execute. The merged file counts its ``invocations`` so the artifact
itself says whether it came from one clean run (invocations=1) or a resumed
sequence — r5's sf0.1 snapshot was honest but hand-merged from four runs,
which made the audit trail murky (r5 verdict ask #7).
"""

from __future__ import annotations

import json
import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from etl_mssql_to_postgres_dailysync_spark.schemas import TESTDATA_TABLES
from etl_mssql_to_postgres_dailysync_spark.session import get_spark


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> tuple[pd.DataFrame, list[str]]:
    """Sort columns + rows like the round driver does. Returns (canonical_df,
    hazards): the driver's canonicalizer crashes on array-typed cells
    (unhashable) and hash-mismatches int-vs-float dtype drift, so we surface
    both as hazards instead of silently tolerating them."""
    import numpy as np

    hazards = []
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            has_seq = df[c].map(lambda v: isinstance(v, (list, tuple, np.ndarray))).any()
            if has_seq:
                hazards.append(
                    f"col {c}: array-typed cells (driver canonicalizer would crash; "
                    "emit a scalar encoding e.g. concat_ws)"
                )
                df[c] = df[c].map(
                    lambda v: tuple(v) if isinstance(v, (list, tuple, np.ndarray)) else v
                )
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True), hazards


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name: str, spark_df, oracle_df) -> list[str]:
    problems = []
    a, hz_a = canon(spark_df)
    b, hz_b = canon(oracle_df)
    problems += [f"spark {h}" for h in hz_a] + [f"oracle {h}" for h in hz_b]
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"]
    if len(a) != len(b):
        return [f"row count differs: spark={len(a)} oracle={len(b)}"]
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if {ka, kb} == {"i", "f"} or {ka, kb} == {"u", "f"}:
            problems.append(
                f"col {c}: dtype drift spark={a[c].dtype} oracle={b[c].dtype} "
                "(driver hash-mismatches 9 vs 9.0; CAST the oracle side to BIGINT)"
            )
            continue
        av, bv = a[c].tolist(), b[c].tolist()
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if not values_equal(x, y)]
        if bad:
            i, x, y = bad[0]
            problems.append(f"col {c}: {len(bad)} mismatches; first at row {i}: spark={x!r} oracle={y!r}")
    return problems


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: check_correctness.py [--json OUT.json] [--resume] [SF_DIR] [query ...]")
            return 2
        json_out = argv[i + 1]
        del argv[i : i + 2]
    resume = "--resume" in argv
    if resume:
        argv.remove("--resume")
        if not json_out:
            print("--resume requires --json OUT.json")
            return 2
    sample_n = sample_seed = None
    exclude_file = None
    for flag in ("--sample", "--seed", "--exclude"):
        if flag in argv:
            i = argv.index(flag)
            if i + 1 >= len(argv):
                print(f"{flag} requires a value")
                return 2
            val = argv[i + 1]
            if flag == "--sample":
                sample_n = int(val)
            elif flag == "--seed":
                sample_seed = int(val)
            else:
                exclude_file = val
            del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if sample_n is not None:
        import hashlib

        if sample_seed is None:
            print("--sample requires --seed for a reproducible draw")
            return 2
        pool = sorted(entry_mod.queries())
        if exclude_file:
            with open(exclude_file) as f:
                prev = json.load(f)
            # driver CORRECTNESS_r{N}.json is {name: {...}} flat; our own
            # --json artifacts nest under "queries" — accept both
            excluded = set(prev.get("queries", prev))
            pool = [n for n in pool if n not in excluded]
        pool.sort(key=lambda n: hashlib.md5(f"{n}:{sample_seed}".encode()).hexdigest())
        only = set(pool[:sample_n])
        print(f"sampled {len(only)}/{len(pool)} queries (seed {sample_seed}"
              + (f", excluding {exclude_file}" if exclude_file else "") + ")")
    invocations = 1
    prior: dict[str, dict] = {}
    if resume and json_out:
        try:
            with open(json_out) as f:
                prev = json.load(f)
            if prev.get("sf_dir") != sf_dir:
                print(f"--resume: {json_out} was for {prev.get('sf_dir')}, not {sf_dir}")
                return 2
            prior = {
                n: r
                for n, r in prev.get("queries", {}).items()
                if r.get("status") in ("OK", "ROWS")
            }
            invocations = int(prev.get("invocations", 1)) + 1
            print(f"resuming: {len(prior)} green queries carried over")
        except FileNotFoundError:
            pass
    spark = get_spark(app_name="check-correctness")
    con = duck_con(sf_dir)
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = 0
    results: dict[str, dict] = dict(prior)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in prior:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            results[name] = {"status": "FAIL", "rows": None,
                             "wall_s": round(time.time() - t0, 1),
                             "err": f"spark: {e}"[:300]}
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle, rows-only check) [{time.time()-t0:.1f}s]")
            results[name] = {"status": "ROWS", "rows": len(sdf),
                             "wall_s": round(time.time() - t0, 1)}
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            results[name] = {"status": "FAIL", "rows": len(sdf),
                             "wall_s": round(time.time() - t0, 1),
                             "err": f"oracle: {e}"[:300]}
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
            results[name] = {"status": "FAIL", "rows": len(sdf),
                             "wall_s": round(time.time() - t0, 1),
                             "err": "; ".join(problems)[:300]}
        else:
            print(f"OK    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            results[name] = {"status": "OK", "rows": len(sdf),
                             "wall_s": round(time.time() - t0, 1)}
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(results),
                    "n_ok": sum(1 for r in results.values() if r["status"] in ("OK", "ROWS")),
                    "n_fail": failures,
                    "invocations": invocations,
                    "queries": results,
                },
                f,
                indent=1,
            )
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
