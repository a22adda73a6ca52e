"""Degenerate-fixture oracle-parity campaign (round 9, r8 verdict ask #1).

Seed-48 (an empty CDC window) found a real oracle bug; this campaign builds
that bug class deliberately: for each degenerate kind in
tools/gen_fixture.DEGENERATE_KINDS (empty fact tables, single-row groups,
all-NULL keys, zero-variance constants, one-customer/one-day skew,
100%-duplicate corpus) it derives a schema-preserving fixture from the
seed-42 source and runs the FULL registry through tools/check_correctness.py
against the DuckDB oracle, then writes one combined artifact
(ALLGREEN_degenerate_r9.json) summarizing every kind.

Usage:
    python tools/degenerate_sweep.py [--out ALLGREEN_degenerate_r9.json]
                                     [kind ...]

Per-kind detail snapshots live at .fixtures/allgreen_degenerate_{kind}.json
(gitignored); a snapshot is reused only when it covers the current registry
size, is all-OK, AND carries the current engine/registry content hash (the
multiseed_sweep reuse rule). Failures are carried verbatim into the combined
artifact so a red file holds its own evidence.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gen_fixture import DEGENERATE_KINDS, generate_degenerate  # noqa: E402
from multiseed_sweep import _registry_size, code_hash  # noqa: E402


def sweep_kind(kind: str, n_queries: int, chash: str) -> dict:
    snap = os.path.join(_REPO, ".fixtures", f"allgreen_degenerate_{kind}.json")
    if os.path.exists(snap):
        with open(snap) as f:
            prior = json.load(f)
        if (prior.get("n_queries") == n_queries and prior.get("n_fail") == 0
                and prior.get("code_hash") == chash):
            return prior
        os.remove(snap)
    sf_dir = generate_degenerate(kind)
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "check_correctness.py"),
         "--json", snap, sf_dir],
        cwd=_REPO, check=False,
    )
    if not os.path.exists(snap):
        raise RuntimeError(
            f"check_correctness for kind {kind} exited {proc.returncode} "
            f"without writing {snap}"
        )
    with open(snap) as f:
        result = json.load(f)
    result["code_hash"] = chash
    with open(snap, "w") as f:
        json.dump(result, f, indent=1)
    return result


def main() -> int:
    ap = argparse.ArgumentParser(
        description="Full-registry oracle parity over degenerate fixtures."
    )
    ap.add_argument("kinds", nargs="*", default=list(DEGENERATE_KINDS),
                    help=f"fixture kinds (default: all of {DEGENERATE_KINDS})")
    ap.add_argument("--out", default="ALLGREEN_degenerate_r9.json",
                    help="combined artifact filename (written at repo root)")
    args = ap.parse_args()
    kinds = args.kinds or list(DEGENERATE_KINDS)
    unknown = [k for k in kinds if k not in DEGENERATE_KINDS]
    if unknown:
        ap.error(f"unknown kinds {unknown}; choose from {DEGENERATE_KINDS}")
    n_queries = _registry_size()
    chash = code_hash()
    combined = {"n_queries": n_queries, "kinds": {}, "n_kinds": len(kinds),
                "code_hash": chash}
    all_ok = True
    for kind in kinds:
        r = sweep_kind(kind, n_queries, chash)
        fails = {k: v for k, v in r.get("queries", {}).items()
                 if v.get("status") not in ("OK", "ROWS")}
        combined["kinds"][kind] = {
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
        print(f"kind {kind}: {r.get('n_ok')}/{n_queries} OK"
              + ("" if ok else "  <-- FAIL"))
    combined["all_ok"] = all_ok
    with open(os.path.join(_REPO, args.out), "w") as f:
        json.dump(combined, f, indent=1, sort_keys=True)
    print(("ALL KINDS GREEN" if all_ok else "FAILURES PRESENT"),
          "->", args.out)
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
