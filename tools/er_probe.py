#!/usr/bin/env python
"""Stage-by-stage wall decomposition of the radius-2 ER blocking
chain (the q207/q208/q209 shared prefix) plus A/B variants — the
round-13 optimization probe. Run in a QUIET container; noop sink.

Usage: python tools/er_probe.py [--sf-dir /root/testdata/sf0.1] [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _med(fn, reps: int) -> float:
    runs = sorted(fn() for _ in range(reps))
    return runs[len(runs) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from vnavc_spark.io import table
    from vnavc_spark.operators import dedup
    from vnavc_spark.operators.dedup import deletion_neighborhood
    from vnavc_spark.session import get_spark

    spark = get_spark(app_name="er-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    c = table(spark, args.sf_dir, "customer").filter(
        F.col("c_name").isNotNull()
    )
    names = c.groupBy(F.col("c_name").alias("nm")).agg(
        F.count("*").cast("long").alias("n_recs")
    )
    names = names.persist()
    n_names = names.count()
    print(f"distinct names: {n_names}")

    variants = names.select(
        "nm", F.explode(deletion_neighborhood("nm", 2)).alias("v")
    ).select("nm", F.xxhash64("v").alias("hv"))

    # warmup: full chain once
    sc.setJobDescription("warmup full chain")
    _noop(dedup.name_linkage_pairs(names, radius=2))

    # stage decomposition
    sc.setJobDescription("stage: variants")
    t_var = _med(lambda: _noop(variants), args.reps)
    n_var = variants.count()

    joined = (
        variants.select(F.col("nm").alias("name_a"), "hv")
        .join(variants.select(F.col("nm").alias("name_b"), "hv"), "hv")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
    )
    sc.setJobDescription("stage: +self-join")
    t_join = _med(lambda: _noop(joined), args.reps)
    n_join = joined.count()

    cands = joined.distinct()
    sc.setJobDescription("stage: +distinct")
    t_dist = _med(lambda: _noop(cands), args.reps)
    n_dist = cands.count()

    verified = cands.withColumn(
        "dist", F.levenshtein("name_a", "name_b", 2).cast("long")
    ).filter(F.col("dist") >= 0)
    sc.setJobDescription("stage: +bounded lev")
    t_lev = _med(lambda: _noop(verified), args.reps)
    n_lev = verified.count()

    sc.setJobDescription("full name_linkage_pairs")
    t_full = _med(
        lambda: _noop(dedup.name_linkage_pairs(names, radius=2)), args.reps
    )

    # hv bucket occupancy: how much would a singleton-bucket
    # prefilter remove before the self-join?
    occ = (
        variants.groupBy("hv")
        .agg(F.count("*").alias("n"))
        .groupBy((F.col("n") >= 2).alias("multi"))
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("n").alias("n_rows"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs"),
        )
    )
    print("hv bucket occupancy (multi, n_buckets, n_rows, pairs):")
    for r in occ.collect():
        print("   ", r)

    # variant A: prefilter variants to multi-occupancy buckets first
    hot = (
        variants.groupBy("hv")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .select("hv")
    )
    v2 = variants.join(hot, "hv")
    joined2 = (
        v2.select(F.col("nm").alias("name_a"), "hv")
        .join(v2.select(F.col("nm").alias("name_b"), "hv"), "hv")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
    )
    chain2 = (
        joined2.distinct()
        .withColumn(
            "dist", F.levenshtein("name_a", "name_b", 2).cast("long")
        )
        .filter(F.col("dist") >= 0)
    )
    sc.setJobDescription("variant A: singleton-bucket prefilter chain")
    _noop(chain2)  # warm
    t_pref = _med(lambda: _noop(chain2), args.reps)

    # variant B: semi-join form of the prefilter
    v3 = variants.join(hot, "hv", "left_semi")
    joined3 = (
        v3.select(F.col("nm").alias("name_a"), "hv")
        .join(v3.select(F.col("nm").alias("name_b"), "hv"), "hv")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
    )
    chain3 = (
        joined3.distinct()
        .withColumn(
            "dist", F.levenshtein("name_a", "name_b", 2).cast("long")
        )
        .filter(F.col("dist") >= 0)
    )
    sc.setJobDescription("variant B: semi-join prefilter chain")
    _noop(chain3)  # warm
    t_semi = _med(lambda: _noop(chain3), args.reps)

    print(f"variants            {t_var:6.2f} s  ({n_var} rows)")
    print(f"+ self-join (a<b)   {t_join:6.2f} s  ({n_join} rows)")
    print(f"+ distinct          {t_dist:6.2f} s  ({n_dist} rows)")
    print(f"+ bounded lev       {t_lev:6.2f} s  ({n_lev} rows)")
    print(f"full operator       {t_full:6.2f} s")
    print(f"A prefilter chain   {t_pref:6.2f} s")
    print(f"B semi-join chain   {t_semi:6.2f} s")
    spark.stop()


if __name__ == "__main__":
    main()
