"""Single-query oracle parity at a degenerate fixture — the mutation-smoke
detector arm of the standing degenerate gate (tests/test_degenerate_gate.py).

The full gate sweeps all registry queries per kind; a mutation detector only
needs the queries the seeded bug can move, so this wrapper regenerates (or
reuses — the marker is content-stamped) the requested kind's fixture and
runs tools/check_correctness.py on just those queries there. Exit codes
follow check_correctness: 0 green, 1 mismatch, 2 usage/infra error.

Usage:
    python tools/degenerate_check.py <kind> <query> [query ...]
"""

from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gen_fixture import DEGENERATE_KINDS, generate_degenerate  # noqa: E402


def main() -> int:
    if len(sys.argv) < 3 or sys.argv[1] not in DEGENERATE_KINDS:
        print(__doc__)
        print(f"kinds: {DEGENERATE_KINDS}")
        return 2
    kind, queries = sys.argv[1], sys.argv[2:]
    sf_dir = generate_degenerate(kind)
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "check_correctness.py"),
         sf_dir, *queries],
        cwd=_REPO,
    )
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
