"""Runtime coverage manifest for the independent-check suites (r8 verdict
ask #2: make the coverage ratchet structural).

Every independent suite's ``_rows`` helper calls :func:`record` with the
registry query name it is about to EXECUTE, so coverage is evidence of
execution, not of a string appearing somewhere in a test source (the old
grep could be satisfied by a comment). The set lives in-process (the whole
pytest session is one interpreter); ``SPARK_GRAFT_COVERAGE_MANIFEST=path``
additionally appends names to a file so out-of-process tooling can audit a
run after the fact.

Enforcement: ``conftest.pytest_sessionfinish`` — when
``SPARK_GRAFT_COVERAGE_STRICT=1`` (set on full-suite runs), a session that
finishes without having executed every registry query through an
independent suite exits red with the missing names listed.
"""

from __future__ import annotations

import os

_seen: set[str] = set()


def record(name: str) -> None:
    _seen.add(name)
    path = os.environ.get("SPARK_GRAFT_COVERAGE_MANIFEST")
    if path:
        with open(path, "a") as f:
            f.write(name + "\n")


def seen() -> set[str]:
    return set(_seen)
