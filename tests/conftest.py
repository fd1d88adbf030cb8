from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from vnavc_spark.session import get_spark

    s = get_spark(app_name="vnavc-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
