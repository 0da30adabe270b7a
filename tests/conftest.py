from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arrow_datafusion_spark.session import build_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

# Two test tiers (r13 verdict item 2: the driver's time-budgeted
# `pytest tests/ -x -q` run was truncated at ~53% once the suite grew to
# ~34 min). DEFAULT = fast tier: @pytest.mark.slow batteries are skipped
# and the Hypothesis fuzzers run a reduced, derandomized example prefix.
# FULL tier (everything, full example counts): SPARK_GRAFT_FULL_TESTS=1,
# or select the slow batteries alone with `-m slow`.
FULL_TESTS = bool(os.environ.get("SPARK_GRAFT_FULL_TESTS"))


def pytest_collection_modifyitems(config, items):
    if FULL_TESTS or config.option.markexpr:
        return  # an explicit -m selection (or the full tier) wins
    skip = pytest.mark.skip(
        reason="slow tier (set SPARK_GRAFT_FULL_TESTS=1 or -m slow)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    # Per-process catalog isolation (opt-in via SPARK_GRAFT_TEST_ISOLATE=1):
    # managed tables live in spark-warehouse + a Derby metastore lock, so
    # two concurrent pytest shards on the same repo dir would collide.
    # Pointing both at a process-private tmp dir makes shards independent.
    if os.environ.get("SPARK_GRAFT_TEST_ISOLATE"):
        import tempfile

        iso = tempfile.mkdtemp(prefix=f"adfspark-test-{os.getpid()}-")
        os.environ["SPARK_GRAFT_EXTRA_CONFS"] = (
            f"spark.sql.warehouse.dir={iso}/warehouse;"
            f"spark.driver.extraJavaOptions=-Duser.timezone=UTC "
            f"-Dderby.system.home={iso}/derby"
        )
    s = build_spark(app="adf-spark-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
