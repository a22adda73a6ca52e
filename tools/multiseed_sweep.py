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
.fixtures/allgreen_seed{N}.json (gitignored); a per-seed snapshot is reused
only when it covers the current registry size, is all-OK, AND carries the
current engine/registry content hash (r8 ADVICE: a pre-change green snapshot
must never masquerade as evidence for changed code). The combined artifact
keeps per-seed summaries plus any per-query failures verbatim, so an
all-green file stays small while a red one carries the evidence.
"""

from __future__ import annotations

import argparse
import hashlib
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


def code_hash() -> str:
    """Content hash over every engine/registry source file. Snapshot reuse is
    keyed on this (r8 ADVICE): after ANY engine or oracle change the hash
    moves, so a pre-change green snapshot can never masquerade as evidence
    for the current code. A content hash beats git HEAD here because sweeps
    legitimately run with uncommitted changes mid-round."""
    h = hashlib.md5()
    pkg = os.path.join(_REPO, "etl_mssql_to_postgres_dailysync_spark")
    paths = [os.path.join(_REPO, "__spark_entry__.py")]
    for root, _dirs, files in os.walk(pkg):
        paths += [os.path.join(root, f) for f in files if f.endswith(".py")]
    for p in sorted(paths):
        h.update(p.encode())
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def sweep_seed(seed: int, n_queries: int, src: str | None = None,
               chash: str | None = None) -> dict:
    chash = chash or code_hash()
    tag = "" if src is None else "_" + os.path.basename(src.rstrip("/"))
    snap = os.path.join(_REPO, ".fixtures", f"allgreen_seed{seed}{tag}.json")
    if os.path.exists(snap):
        with open(snap) as f:
            prior = json.load(f)
        if (prior.get("n_queries") == n_queries and prior.get("n_fail") == 0
                and prior.get("code_hash") == chash):
            return prior
        os.remove(snap)  # stale/red/other-code: never masquerade as fresh
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
        result = json.load(f)
    result["code_hash"] = chash  # stamp so a later sweep can key reuse on it
    with open(snap, "w") as f:
        json.dump(result, f, indent=1)
    return result


def main() -> int:
    ap = argparse.ArgumentParser(
        description="Multi-seed oracle-parity campaign over derived fixtures."
    )
    ap.add_argument("seeds", nargs="*", type=int, default=[44, 45, 46, 47, 48],
                    help="fixture seeds (default: 44-48)")
    ap.add_argument("--out", default="ALLGREEN_multiseed_r8.json",
                    help="combined artifact filename (written at repo root)")
    ap.add_argument("--src", default=None,
                    help="source dir fixtures are derived from "
                         "(default /root/testdata/sf0.001)")
    args = ap.parse_args()
    seeds, out, src = args.seeds or [44, 45, 46, 47, 48], args.out, args.src
    n_queries = _registry_size()
    chash = code_hash()
    combined = {"n_queries": n_queries, "seeds": {}, "n_seeds": len(seeds),
                "code_hash": chash}
    all_ok = True
    if src is not None:
        combined["src"] = src
    for seed in seeds:
        r = sweep_seed(seed, n_queries, src, chash)
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
