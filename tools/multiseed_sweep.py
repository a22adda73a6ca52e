"""Multi-seed oracle-parity campaign (round 8).

Oracle parity at one dataset is a single point in input space; the r7
friedman_test_blocks and r8 basket-size lessons both came from a SECOND
fixture. This tool turns that lesson into a campaign: for each seed it
derives a deterministic fixture with tools/gen_fixture.py (seed-keyed ~90%
FK-consistent subsample of /root/testdata/sf0.001) and runs the FULL
registry through tools/check_correctness.py against the DuckDB oracle,
then writes one combined artifact summarizing every seed.

Usage:
    python tools/multiseed_sweep.py [--out ALLGREEN_multiseed_r8.json]
                                    [--src /root/testdata/sf0.01] [seed ...]

Seeds default to 44-48; --src changes the source the fixtures are derived
from (default sf0.001 — use sf0.01 for a 10x-larger derived point; its
snapshots are suffixed with the source sf). Per-seed detail snapshots live at
.fixtures/allgreen_seed{N}.json (gitignored); a per-seed snapshot that
already exists, covers the current registry size, and is all-OK is reused
instead of re-run (delete it to force a fresh sweep). The combined artifact
keeps per-seed summaries plus any per-query failures verbatim, so an
all-green file stays small while a red one carries the evidence.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gen_fixture import generate  # noqa: E402


def _registry_size() -> int:
    from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES
    return len(QUERIES)


def sweep_seed(seed: int, n_queries: int, src: str | None = None) -> dict:
    tag = "" if src is None else "_" + os.path.basename(src.rstrip("/"))
    snap = os.path.join(_REPO, ".fixtures", f"allgreen_seed{seed}{tag}.json")
    if os.path.exists(snap):
        with open(snap) as f:
            prior = json.load(f)
        if prior.get("n_queries") == n_queries and prior.get("n_fail") == 0:
            return prior
        os.remove(snap)  # stale/red: never let it masquerade as a fresh run
    if src is None:
        sf_dir = generate(seed)
    else:
        dst = os.path.join(_REPO, ".fixtures",
                           f"seed{seed}_{os.path.basename(src.rstrip('/'))}")
        sf_dir = generate(seed, src=src, dst=dst)
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "check_correctness.py"),
         "--json", snap, sf_dir],
        cwd=_REPO, check=False,
    )
    if not os.path.exists(snap):
        raise RuntimeError(
            f"check_correctness for seed {seed} exited {proc.returncode} "
            f"without writing {snap} — see its output above"
        )
    with open(snap) as f:
        return json.load(f)


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    out = "ALLGREEN_multiseed_r8.json"
    src = None
    for flag in ("--out", "--src"):
        if flag in argv:
            i = argv.index(flag)
            if i + 1 >= len(argv):
                print(__doc__)
                return 2
            if flag == "--out":
                out = argv[i + 1]
            else:
                src = argv[i + 1]
            del argv[i:i + 2]
    seeds = [int(a) for a in argv] or [44, 45, 46, 47, 48]
    n_queries = _registry_size()
    combined = {"n_queries": n_queries, "seeds": {}, "n_seeds": len(seeds)}
    all_ok = True
    if src is not None:
        combined["src"] = src
    for seed in seeds:
        r = sweep_seed(seed, n_queries, src)
        # check_correctness counts both OK (oracle parity) and ROWS
        # (rows-only, no-oracle check) as green in n_ok — mirror that here
        fails = {k: v for k, v in r.get("queries", {}).items()
                 if v.get("status") not in ("OK", "ROWS")}
        combined["seeds"][str(seed)] = {
            "sf_dir": r.get("sf_dir"),
            "n_ok": r.get("n_ok"),
            "n_fail": r.get("n_fail"),
            "invocations": r.get("invocations"),
            "wall_s": round(sum(q.get("wall_s", 0)
                                for q in r.get("queries", {}).values()), 1),
            **({"failures": fails} if fails else {}),
        }
        ok = r.get("n_fail") == 0 and r.get("n_ok") == n_queries
        all_ok = all_ok and ok
        print(f"seed {seed}: {r.get('n_ok')}/{n_queries} OK"
              + ("" if ok else "  <-- FAIL"))
    combined["all_ok"] = all_ok
    with open(os.path.join(_REPO, out), "w") as f:
        json.dump(combined, f, indent=1, sort_keys=True)
    print(("ALL SEEDS GREEN" if all_ok else "FAILURES PRESENT"), "->", out)
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
