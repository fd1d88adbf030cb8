#!/usr/bin/env python
"""Round-9 adjudication probe for the narrowing-family warm latency
(VERDICT r08 item #1): times the exact-rank consumers at sf0.1 with
the bench.py warmup protocol and dumps per-call NARROWING_STATS —
round counts, walk/exec path, per-round wall — so driver-round
scheduling cost is separated from compute by artifact, not guess.

Usage: python tools/narrowing_probe.py [q121_exact_mad_scalable ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "q42_percentiles",
    "q113_exact_median_scalable",
    "q121_exact_mad_scalable",
    "q123_weighted_median",
    "q126_rfm_segments",
    "q138_decile_lift",
]


def main() -> None:
    if any(a.startswith("-") for a in sys.argv[1:]):
        # flag-shaped args (incl. --help) must not silently start a
        # 5-minute Spark measurement run
        print(__doc__.strip(), file=sys.stderr)
        raise SystemExit(0 if "--help" in sys.argv[1:] else 2)
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    from pyspark.sql import functions as F

    from vnavc_spark.operators import aggregates
    from vnavc_spark.queries import all_queries
    from vnavc_spark.session import get_spark

    spark = get_spark(
        app_name="narrowing-probe", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    for t in ("lineitem", "orders", "documents"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    aggregates.exact_rank_select(
        spark.range(256).select(
            (F.col("id") % 4).cast("string").alias("g"),
            (F.col("id") * 7.03).alias("x"),
        ),
        ["g"],
        "x",
        n_buckets=4096,
    ).count()
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for name in names:
        queries[name](spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    out = {}
    for name in names:
        runs, stats = [], []
        for _ in range(reps):
            aggregates.NARROWING_STATS.clear()
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
            stats.append(list(aggregates.NARROWING_STATS))
        med = sorted(runs)[len(runs) // 2]
        out[name] = {
            "first": runs[0],
            "median": med,
            "spread": round(max(runs) - min(runs), 3),
            "calls": stats[-1],
        }
        narrow_s = sum(
            c["first_agg_s"] + sum(r["s"] for r in c["rounds"])
            for c in stats[-1]
        )
        print(
            f"# {name}: first {runs[0]:.3f}s median {med:.3f}s "
            f"(narrowing {narrow_s:.3f}s in {len(stats[-1])} calls, "
            f"rounds {[len(c['rounds']) for c in stats[-1]]}, "
            f"paths {[[r['path'] for r in c['rounds']] for c in stats[-1]]})",
            file=sys.stderr,
        )
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
