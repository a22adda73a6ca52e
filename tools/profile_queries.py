"""Per-query profiling harness (optimization rounds, guide §1).

For each registry query: build the DataFrame (counting the Spark jobs the
BUILD itself runs — the EXECUTES_AT_BUILD collects/localCheckpoints), then
run the bench action (``.count()``) under a job group and report wall time
plus job / stage / task counts for each phase. High job counts at near-zero
data volume are the local-mode signature of sequential mini-job overhead;
high stage counts per job are shuffle chains.

Usage: python tools/profile_queries.py [sf_dir] [query ...]
       (default sf_dir /root/testdata/sf0.1; no names = full registry)
Output: one JSON line per query + a sorted summary table on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from etl_mssql_to_postgres_dailysync_spark.session import get_spark


def job_stats(sc, group: str) -> tuple[int, int, int]:
    tracker = sc.statusTracker()
    job_ids = tracker.getJobIdsForGroup(group)
    n_stages = 0
    n_tasks = 0
    for jid in job_ids:
        ji = tracker.getJobInfo(jid)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = tracker.getStageInfo(sid)
            if si is not None:
                n_stages += 1
                n_tasks += si.numTasks
    return len(job_ids), n_stages, n_tasks


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:]
    spark = get_spark(app_name="profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = entry_mod.queries()
    if not names:
        names = list(qs)
    rows = []
    for name in names:
        if name not in qs:
            print(f"unknown query: {name}", file=sys.stderr)
            continue
        # warm-up once (JIT, page cache) so phases measure steady state
        try:
            qs[name](spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"query": name, "error": repr(e)[:300]}))
            continue
        gb = f"profile-build-{name}"
        sc.setJobGroup(gb, f"build {name}")
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t_build = time.time() - t0
        b_jobs, b_stages, b_tasks = job_stats(sc, gb)
        ga = f"profile-act-{name}"
        sc.setJobGroup(ga, f"count {name}")
        t0 = time.time()
        df.count()
        t_act = time.time() - t0
        a_jobs, a_stages, a_tasks = job_stats(sc, ga)
        sc.setJobGroup(None, None)
        rec = {
            "query": name,
            "total_s": round(t_build + t_act, 3),
            "build_s": round(t_build, 3),
            "act_s": round(t_act, 3),
            "build_jobs": b_jobs,
            "build_stages": b_stages,
            "build_tasks": b_tasks,
            "act_jobs": a_jobs,
            "act_stages": a_stages,
            "act_tasks": a_tasks,
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    rows.sort(key=lambda r: -r["total_s"])
    print(
        f"{'query':42s} {'total':>7s} {'build':>7s} {'act':>7s} "
        f"{'bJ':>3s} {'bS':>4s} {'bT':>5s} {'aJ':>3s} {'aS':>4s} {'aT':>5s}",
        file=sys.stderr,
    )
    for r in rows:
        print(
            f"{r['query']:42s} {r['total_s']:7.3f} {r['build_s']:7.3f} "
            f"{r['act_s']:7.3f} {r['build_jobs']:3d} {r['build_stages']:4d} "
            f"{r['build_tasks']:5d} {r['act_jobs']:3d} {r['act_stages']:4d} "
            f"{r['act_tasks']:5d}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
