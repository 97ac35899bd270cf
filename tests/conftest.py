from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("WCS_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from wal_consumer_spark.session import get_spark

    s = get_spark(app_name="wcs-tests", master="local[8]")
    yield s
    s.stop()
