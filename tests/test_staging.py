"""Staging-layout tests: partition pruning and shuffle-free bucketed
joins — the plan properties staging exists to buy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vnavc_spark import staging
from vnavc_spark.io import table
from vnavc_spark.plans.audit import explain_string, plan_facts


class TestPartitioned:
    def test_partition_pruning(self, spark, tmp_path):
        df = table(spark, SF_SMALL, "customer").withColumn(
            "qualified", F.col("c_acctbal") > 0
        )
        path = str(tmp_path / "staged")
        staging.stage_partitioned(df, path, ["qualified"])
        # partition values round-trip as strings (Spark infers int/date
        # partition types but not boolean)
        back = staging.read_stage(spark, path).filter(F.col("qualified") == "true")
        # pruned read: the physical scan lists only qualified=true dirs
        txt = explain_string(back, "formatted")
        assert "PartitionFilters" in txt and "qualified" in txt
        assert back.count() == df.filter("c_acctbal > 0").count()


class TestBucketed:
    @pytest.fixture(scope="class", autouse=True)
    def warehouse(self, spark, tmp_path_factory):
        yield
        for t in ("seg_stage", "audio_stage"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    def test_bucketed_join_has_no_shuffle(self, spark):
        li = table(spark, SF_SMALL, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        o = table(spark, SF_SMALL, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        staging.stage_bucketed(li, "seg_stage", ["l_orderkey"], n_buckets=8)
        staging.stage_bucketed(
            o.withColumnRenamed("o_orderkey", "l_orderkey"),
            "audio_stage",
            ["l_orderkey"],
            n_buckets=8,
        )
        a = staging.read_stage(spark, "seg_stage")
        b = staging.read_stage(spark, "audio_stage")
        joined = a.join(b, on="l_orderkey")
        # disable broadcast so the co-location is what avoids the
        # shuffle, not a small-table fallback
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            f = plan_facts(joined)
            assert f.exchanges == 0, explain_string(joined, "simple")
            assert f.sortmerge_joins >= 1
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        # and the join is still correct
        n = joined.count()
        assert n == li.join(
            o, li.l_orderkey == o.o_orderkey
        ).count()


class TestStageFormats:
    def test_orc_and_jsonl_roundtrip(self, spark, tmp_path):
        from vnavc_spark import staging

        df = spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", None)], "id long, s string, v double"
        )
        for fmt in ("orc", "json"):
            p = str(tmp_path / fmt)
            staging.stage_format(df, p, fmt=fmt)
            back = staging.read_stage_format(spark, p, fmt=fmt)
            if fmt == "json":  # row format: no schema in footer
                back = back.select("id", "s", "v")
            assert sorted(
                (r.id, r.s, r.v) for r in back.collect()
            ) == [(1, "a", 1.5), (2, "b", None)]

    def test_orc_pushdown_reaches_scan(self, spark, tmp_path):
        from vnavc_spark import staging
        from vnavc_spark.plans.audit import plan_facts
        from pyspark.sql import functions as F

        df = spark.range(1000).withColumn("k", F.col("id") % 10)
        p = str(tmp_path / "orc_push")
        staging.stage_format(df, p, fmt="orc")
        f = plan_facts(
            staging.read_stage_format(spark, p, fmt="orc").filter(
                F.col("k") == 3
            )
        )
        assert any("k" in s for s in f.pushed_filters)
