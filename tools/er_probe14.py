#!/usr/bin/env python
"""Round-14 ER probe: A/B of the current string-pair radius-2 chain
(q207/q208/q209 shared prefix) against the id-pair proxy variant
(guide §2.3 "shuffle keys instead of payloads" / §8): every shuffle
before the levenshtein verify carries an 8-byte xxhash64(nm) id
instead of the name strings; names re-attach via the (tiny) entity
table right before the verify. Exactness does NOT assume the hash is
collision-free — a collision merges id pairs whose re-attach join
re-expands to every original name pair exactly once, and the verify
filters spurious ones (see name_linkage_pairs docstring).

Run in a QUIET container; noop sink; fresh session.

Usage: python tools/er_probe14.py [--sf-dir /root/testdata/sf0.1] [--reps 3]
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


def id_pair_chain(names, radius: int = 2):
    """The candidate id-pair variant, built inline so the probe can
    A/B it against the committed operator without editing it."""
    from vnavc_spark.operators.dedup import deletion_neighborhood

    ids = names.select(F.xxhash64("nm").alias("id"), "nm", "n_recs")
    variants = ids.select(
        "id", F.explode(deletion_neighborhood("nm", radius)).alias("v")
    ).select("id", F.xxhash64("v").alias("hv"))
    cand_ids = (
        variants.select(F.col("id").alias("id_a"), "hv")
        .join(variants.select(F.col("id").alias("id_b"), "hv"), "hv")
        .filter(F.col("id_a") <= F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a_side = ids.select(
        F.col("id").alias("id_a"),
        F.col("nm").alias("_nm_a"),
        F.col("n_recs").alias("_nr_a"),
    )
    b_side = ids.select(
        F.col("id").alias("id_b"),
        F.col("nm").alias("_nm_b"),
        F.col("n_recs").alias("_nr_b"),
    )
    attached = (
        cand_ids.join(a_side, "id_a")
        .join(b_side, "id_b")
        .filter(
            (F.col("id_a") != F.col("id_b"))
            | (F.col("_nm_a") < F.col("_nm_b"))
        )
        .withColumn(
            "dist", F.levenshtein("_nm_a", "_nm_b", radius).cast("long")
        )
        .filter(F.col("dist") >= 0)
    )
    swap = F.col("_nm_a") > F.col("_nm_b")
    return attached.select(
        F.when(swap, F.col("_nm_b")).otherwise(F.col("_nm_a")).alias("name_a"),
        F.when(swap, F.col("_nm_a")).otherwise(F.col("_nm_b")).alias("name_b"),
        F.when(swap, F.col("_nr_b")).otherwise(F.col("_nr_a")).alias("n_recs_a"),
        F.when(swap, F.col("_nr_a")).otherwise(F.col("_nr_b")).alias("n_recs_b"),
        "dist",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from vnavc_spark.io import table
    from vnavc_spark.operators import dedup
    from vnavc_spark.session import get_spark

    spark = get_spark(app_name="er-probe14")
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

    # warmup both shapes once
    sc.setJobDescription("warmup: current operator")
    _noop(dedup.name_linkage_pairs(names, radius=2))
    sc.setJobDescription("warmup: id-pair variant")
    _noop(id_pair_chain(names, radius=2))

    sc.setJobDescription("current operator (string pairs)")
    t_cur = _med(
        lambda: _noop(dedup.name_linkage_pairs(names, radius=2)), args.reps
    )
    sc.setJobDescription("id-pair variant")
    t_new = _med(lambda: _noop(id_pair_chain(names, radius=2)), args.reps)

    # equality proof on this corpus: full anti-join both directions
    cur = dedup.name_linkage_pairs(names, radius=2)
    new = id_pair_chain(names, radius=2)
    extra = new.exceptAll(cur).count()
    missing = cur.exceptAll(new).count()
    print(f"current (string pairs)  {t_cur:6.2f} s")
    print(f"id-pair variant         {t_new:6.2f} s")
    print(f"rows new-not-cur: {extra}   cur-not-new: {missing}")

    # stage decomposition of the id variant
    from vnavc_spark.operators.dedup import deletion_neighborhood

    ids = names.select(F.xxhash64("nm").alias("id"), "nm", "n_recs")
    variants = ids.select(
        "id", F.explode(deletion_neighborhood("nm", 2)).alias("v")
    ).select("id", F.xxhash64("v").alias("hv"))
    joined = (
        variants.select(F.col("id").alias("id_a"), "hv")
        .join(variants.select(F.col("id").alias("id_b"), "hv"), "hv")
        .filter(F.col("id_a") <= F.col("id_b"))
        .select("id_a", "id_b")
    )
    sc.setJobDescription("id stage: +self-join")
    t_join = _med(lambda: _noop(joined), args.reps)
    n_join = joined.count()
    cands = joined.distinct()
    sc.setJobDescription("id stage: +distinct")
    t_dist = _med(lambda: _noop(cands), args.reps)
    n_dist = cands.count()
    print(f"id join (a<=b)      {t_join:6.2f} s  ({n_join} rows)")
    print(f"id + distinct       {t_dist:6.2f} s  ({n_dist} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
