from __future__ import annotations

import pytest

from olaf_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(parallelism=8, app_name="olaf_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: spawns extra JVMs (job-script e2e)")
