"""Structural gate: every registry query must carry an INDEPENDENT check
beyond oracle parity, or appear on the justified allowlist below.

Oracle parity alone cannot catch a shared-author formula error (the r7
friedman_test_blocks lesson; the r8 dist_moments catch). The repo therefore
keeps four independent-check suites — invariant pins, numpy recomputes,
pure-Python pipeline replays, and the r7 property tests — and this gate
makes their coverage a one-way ratchet: adding a registry query without an
independent check (or a conscious allowlist entry with a written reason)
goes red here, exactly like the NLJ / global-window / file-scan / shuffle
gates in test_plan_sweep.py.

Detection is by query-name string literal in the suite sources; that is
the same convention every suite uses to address queries (via QUERIES[...]
or the per-suite _rows helper), so a mention implies a test touches it.
"""

from __future__ import annotations

import os
import re

from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

_TESTS = os.path.dirname(os.path.abspath(__file__))

_INDEPENDENT_SUITES = [
    "test_r5r6_invariants.py",   # one mathematical invariant per stats query
    "test_r7_ops.py",            # r7 property pins
    "test_r8_numpy_recompute.py",  # textbook numpy/pure-Python recomputes
    "test_r8_replay_pipelines.py",  # full-pipeline pure-Python replays
    "test_r8_replay_remaining.py",  # merge/roundtrip/ACID/streaming replays
]

# Queries allowed to have NO third implementation, each with the reason the
# existing verification already constitutes an independent check.  Adding a
# registry query without an independent test requires a conscious entry here.
# Empty since test_r8_replay_remaining.py closed the last 16 entries (the
# merge family, interchange round trips, and ACID/streaming pipelines).
ALLOWED_WITHOUT_THIRD_IMPL: set[str] = set()


def test_every_query_has_independent_check():
    names = set(QUERIES)
    covered: set[str] = set()
    for fname in _INDEPENDENT_SUITES:
        with open(os.path.join(_TESTS, fname)) as f:
            txt = f.read()
        for m in re.findall(r"[\"']([a-z0-9_]+)[\"']", txt):
            if m in names:
                covered.add(m)
    missing = sorted(names - covered - ALLOWED_WITHOUT_THIRD_IMPL)
    assert not missing, (
        f"{len(missing)} registry queries have neither an independent-check "
        f"test nor an allowlist entry: {missing}"
    )
    # the allowlist is a ratchet too: entries that gained coverage should be
    # removed so the list only ever shrinks
    stale = sorted(ALLOWED_WITHOUT_THIRD_IMPL & covered)
    assert not stale, f"allowlist entries now covered — remove them: {stale}"
    # and it must not drift to unknown names
    unknown = sorted(ALLOWED_WITHOUT_THIRD_IMPL - names)
    assert not unknown, f"allowlist names not in registry: {unknown}"
