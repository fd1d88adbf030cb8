"""Spark SQL surface: every table registers as a view and the
DataFrame-built operators have equivalent spark.sql formulations
(SURVEY §7 step 2: the F3 query as both API and SQL)."""

from __future__ import annotations

from tests.conftest import SF_SMALL
from vnavc_spark.io import TESTDATA_TABLES, register_views
from vnavc_spark.queries import all_queries


def _norm(rows):
    # SQL literals type as DECIMAL in Spark SQL (API floats are
    # DOUBLE) — compare numerics by value
    return sorted(
        tuple(float(v) if hasattr(v, "as_tuple") else v for v in r)
        for r in rows
    )


class TestSqlSurface:
    def test_register_views_all_tables(self, spark):
        register_views(spark, SF_SMALL)
        for t in TESTDATA_TABLES:
            assert spark.sql(f"SELECT count(*) AS n FROM {t}").first().n > 0

    def test_substring_query_sql_equals_dataframe(self, spark):
        register_views(spark, SF_SMALL)
        api = all_queries()["q02_substring_query"](spark, SF_SMALL)
        sql = spark.sql(
            """
            SELECT p_partkey, p_name, p_type, p_retailprice
            FROM part
            WHERE lower(p_name) LIKE '%red%' AND lower(p_type) LIKE '%o%'
            """
        )
        assert sorted(map(tuple, api.collect())) == sorted(
            map(tuple, sql.collect())
        )

    def test_flagship_sql_equals_dataframe(self, spark):
        register_views(spark, SF_SMALL)
        api = all_queries()["q01_region_revenue"](spark, SF_SMALL)
        sql = spark.sql(
            """
            SELECT r_name,
                   sum(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)) / 100.0 AS revenue,
                   count(*) AS n_items,
                   sum(floor(l_quantity * 100.0 + 0.5)) / 100.0 AS sum_qty
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
            """
        )
        assert _norm(api.collect()) == _norm(sql.collect())
