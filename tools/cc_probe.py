#!/usr/bin/env python
"""Round-10 adjudication probe for the connected-components loop
(VERDICT r09 item #3): times dedup_clusters' consumers at sf0.1 with
the bench.py warmup protocol and dumps per-call CC_STATS — rounds,
checkpoint batches (= expensive driver syncs), per-batch wall — so
the batched-convergence rewrite's sync savings are adjudicated by
artifact, not guess.

Usage: python tools/cc_probe.py [q152_copurchase_communities ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "q56_dedup_clusters",
    "q106_dedup_apply",
    "q152_copurchase_communities",
    "q158_split_leakage",
]


def main() -> None:
    if any(a.startswith("-") for a in sys.argv[1:]):
        print(__doc__.strip(), file=sys.stderr)
        raise SystemExit(0 if "--help" in sys.argv[1:] else 2)
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    from vnavc_spark.operators import dedup
    from vnavc_spark.queries import all_queries
    from vnavc_spark.session import get_spark

    spark = get_spark(
        app_name="cc-probe", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    for t in ("lineitem", "orders", "documents"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for name in names:
        queries[name](spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    out = {}
    for name in names:
        runs, stats = [], []
        for _ in range(reps):
            getattr(dedup, 'CC_STATS', []).clear()
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
            stats.append(list(getattr(dedup, 'CC_STATS', [])))
        med = sorted(runs)[len(runs) // 2]
        out[name] = {
            "first": runs[0],
            "median": med,
            "spread": round(max(runs) - min(runs), 3),
            "cc_calls": stats[-1],
        }
        print(
            f"# {name}: first {runs[0]:.3f}s median {med:.3f}s "
            f"cc {stats[-1]}",
            file=sys.stderr,
        )
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
