"""Every registered query hash-matches its DuckDB oracle at sf0.001
(the driver re-runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.oracle_harness import compare, duckdb_connect
from vnavc_spark.queries import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connect(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, duck, name):
    res = compare(spark, duck, QUERIES[name], ORACLES[name], SF_SMALL)
    assert res["ok"], {k: v for k, v in res.items() if not str(k).startswith("hash")} | {
        "hash_match": res["hash_match"]
    }


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_no_oracle_runs(spark, name):
    from vnavc_spark.oracle import assert_canonicalizable

    df = QUERIES[name](spark, SF_SMALL)
    assert_canonicalizable(df, name)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) >= 1
