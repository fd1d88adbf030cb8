from __future__ import annotations

import os
import sys

import pytest

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(_TESTS_DIR)
sys.path.insert(0, _REPO_ROOT)

# Executor python workers must be able to import test modules:
# cloudpickle serializes module-level functions (fake transports etc.)
# by reference, and pytest loads tests as top-level modules from the
# tests dir. Must be set before the JVM/session starts.
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (_REPO_ROOT, _TESTS_DIR, os.environ.get("PYTHONPATH")) if p
)

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from vnavc_spark.session import get_spark

    s = get_spark(app_name="vnavc-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
