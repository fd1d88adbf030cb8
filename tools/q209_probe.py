#!/usr/bin/env python
"""Stage decomposition of q209_entity_clusters at sf0.1 — where do
the ~10 s beyond the shared blocking chain go? Quiet container."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from vnavc_spark.operators import dedup
    from vnavc_spark.pipeline.er import customer_entities
    from vnavc_spark.session import get_spark

    spark = get_spark(app_name="q209-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm: full query once
    from vnavc_spark.cache import clear_tracked
    from vnavc_spark.queries import all_queries

    q = all_queries()["q209_entity_clusters"]
    t0 = time.perf_counter()
    noop(q(spark, sf_dir))
    print(f"full q209 (cold): {time.perf_counter()-t0:.2f} s")
    clear_tracked()
    spark.catalog.clearCache()

    t0 = time.perf_counter()
    noop(q(spark, sf_dir))
    t_full = time.perf_counter() - t0
    print(f"full q209 (warm): {t_full:.2f} s")
    clear_tracked()
    spark.catalog.clearCache()

    # stages
    ent = customer_entities(spark, sf_dir)
    t0 = time.perf_counter()
    pairs = dedup.name_linkage_pairs(ent.select("nm", "n_recs"), radius=2)
    sc.setJobDescription("pairs")
    noop(pairs)
    t1 = time.perf_counter()
    print(f"pairs: {t1-t0:.2f} s")

    scored = dedup.fellegi_sunter_customer_scores(pairs, ent)
    sc.setJobDescription("scored")
    noop(scored)
    t2 = time.perf_counter()
    print(f"+scored: {t2-t1:.2f} s")

    matches = scored.filter(F.col("decision") == "match").select(
        F.col("name_a").alias("doc_a"), F.col("name_b").alias("doc_b")
    )
    sc.setJobDescription("checkpoint matches")
    matches = matches.localCheckpoint()
    t3 = time.perf_counter()
    print(f"+checkpoint matches: {t3-t2:.2f} s  ({matches.count()} edges)")

    sc.setJobDescription("CC")
    clusters = dedup.dedup_clusters(matches).select(
        F.col("doc_id").alias("nm"), F.col("cluster_id").alias("entity_id")
    )
    noop(clusters)
    t4 = time.perf_counter()
    print(f"+CC: {t4-t3:.2f} s")

    sc.setJobDescription("final join")
    out = clusters.join(ent.select("nm", "n_recs"), "nm").select(
        "nm", "entity_id", "n_recs"
    )
    noop(out)
    t5 = time.perf_counter()
    print(f"+final join: {t5-t4:.2f} s")
    print(f"stage total: {t5-t0:.2f} s  (vs full {t_full:.2f})")
    spark.stop()


if __name__ == "__main__":
    main()
