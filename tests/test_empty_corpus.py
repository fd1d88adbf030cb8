"""Robustness: every registered query must run (returning zero rows,
not raising) on a schema-identical EMPTY corpus — the state every
incremental/backfill pipeline passes through on its first run."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from vnavc_spark.io import TESTDATA_TABLES, table
from vnavc_spark.queries import all_queries


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_empty")
    for t in TESTDATA_TABLES:
        table(spark, SF_SMALL, t).limit(0).write.mode("overwrite").parquet(
            str(dst / f"{t}.parquet")
        )
    return str(dst)


def test_every_query_survives_empty_corpus(spark, empty_dir):
    fails = []
    for name, fn in all_queries().items():
        try:
            fn(spark, empty_dir).count()
        except Exception as e:  # noqa: BLE001
            fails.append((name, str(e).splitlines()[0][:120]))
    assert not fails, fails
