"""Salting rewrites must be result-identical to the unsalted plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vnavc_spark.io import table
from vnavc_spark.operators import skew


class TestSaltedAgg:
    def test_equals_plain_agg(self, spark):
        li = table(spark, SF_SMALL, "lineitem")
        plain = {
            r.l_returnflag: (r.n, r.s)
            for r in li.groupBy("l_returnflag")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.floor(F.col("l_quantity") * 100 + F.lit(0.5))).alias("s"),
            )
            .collect()
        }
        salted = {
            r.l_returnflag: (r.n, r.s)
            for r in skew.salted_agg(
                li,
                "l_returnflag",
                aggs={
                    "n_p": F.count("*"),
                    "s_p": F.sum(F.floor(F.col("l_quantity") * 100 + F.lit(0.5))),
                },
                finals={"n": F.sum("n_p"), "s": F.sum("s_p")},
                n_salts=8,
            ).collect()
        }
        assert salted == plain

    def test_salt_is_deterministic(self, spark):
        df = table(spark, SF_SMALL, "orders")
        a = skew.with_salt(df, 16, ["o_orderkey"]).select("o_orderkey", "_salt")
        b = skew.with_salt(df, 16, ["o_orderkey"]).select("o_orderkey", "_salt")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
        # salts actually spread
        n_distinct = a.select("_salt").distinct().count()
        assert n_distinct == 16


class TestSaltedJoin:
    def test_equals_plain_join(self, spark):
        li = table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
        o = table(spark, SF_SMALL, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
        )
        plain = li.join(o, on="l_orderkey").agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("l_quantity") + F.col("o_totalprice"))).alias("s"),
        ).first()
        salted = skew.salted_broadcast_skew_join(li, o, on="l_orderkey", n_salts=8).agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("l_quantity") + F.col("o_totalprice"))).alias("s"),
        ).first()
        assert (salted.n, salted.s) == (plain.n, plain.s)
        assert plain.n == 6000  # every lineitem matched exactly once


class TestPostingShards:
    def test_universal_token_postings_are_bounded(self, spark):
        # degenerate corpus: one token in EVERY doc. Without sharding
        # this is one row holding every doc_id; with ceil(n/1000)
        # shards no row may exceed ~1000 ids (md5-balanced).
        from vnavc_spark.operators.retrieval import inverted_index

        n = 3000
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"), F.lit("common").alias("tok")
        )
        n_docs = docs.agg(F.count("*").alias("n_docs"))
        idx = inverted_index(
            docs, n_docs, postings_per_shard=1000, df_high_pct=100
        )
        rows = idx.select(
            "tok", "shard", "doc_freq", F.size("postings").alias("sz")
        ).collect()
        # K = ceil(3000/1000) = 3 shards, all present
        assert len(rows) == 3
        assert {r.shard for r in rows} == {0, 1, 2}
        assert all(r.doc_freq == n for r in rows)
        assert sum(r.sz for r in rows) == n
        # md5 spreads uniformly: no shard beyond 1.5x the target
        assert max(r.sz for r in rows) < 1500
