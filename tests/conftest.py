import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_mssql_to_postgres_dailysync_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def pytest_sessionfinish(session, exitstatus):
    """Structural coverage ratchet (r8 verdict ask #2): on full-suite runs
    (SPARK_GRAFT_COVERAGE_STRICT=1) every registry query must have been
    EXECUTED through an independent-check suite's _rows helper during this
    session — evidence of execution, not a grep for a string literal. A
    partial run (single file, -k filter) leaves the flag unset and skips."""
    if os.environ.get("SPARK_GRAFT_COVERAGE_STRICT") != "1":
        return
    if exitstatus != 0:  # don't mask the real failure signal
        return
    import coverage_manifest
    from etl_mssql_to_postgres_dailysync_spark.plans.driver_queries import QUERIES

    missing = sorted(set(QUERIES) - coverage_manifest.seen())
    if missing:
        tr = session.config.pluginmanager.get_plugin("terminalreporter")
        msg = (
            f"COVERAGE-STRICT: {len(missing)} registry queries were never "
            f"executed by an independent-check suite this session: {missing}"
        )
        if tr:
            tr.write_line(msg, red=True)
        else:
            print(msg)
        session.exitstatus = 1
