from __future__ import annotations

import pytest

from olaf_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        parallelism=8,
        app_name="olaf_spark_tests",
        shuffle_partitions=8,
        # Several tests assert job-count deltas via statusTracker. The
        # app-status store evicts old jobs past spark.ui.retainedJobs
        # (default 1000); the suite runs >1000 jobs, and an eviction
        # landing between a test's before/after reads makes the delta
        # negative. Retain enough for the whole suite.
        extra_conf={"spark.ui.retainedJobs": "100000"},
    )
    yield s
    s.stop()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: spawns extra JVMs (job-script e2e)")
