"""Graph analytics over aggregated relational data.

Complements ``dedup.dedup_clusters`` (connected components): here the
iterative fixed-point is PageRank over a weighted digraph that is
SMALL BY AGGREGATION (e.g. the event-type transition graph — nodes
are types, not events), while the heavy work — building the edge
list — is a distributed window + aggregation.

Integer-arithmetic power iteration: ranks are carried as scaled
BIGINTs and every step uses integer multiply / integer (``div``)
division, so the result is bit-exact on any engine, partitioning, or
summation order — a float PageRank cannot be hash-certified because
per-node contribution sums are order-dependent. Precision: 1/scale
per iteration of rounding, far below ranking differences for any
graph this is meant for.

Overflow bound: pr ≤ scale and contributions multiply pr·cnt, so the
caller needs scale · max(cnt) < 2^63 — with the default scale 10^6
edge counts up to ~9·10^12 are safe (a 100 TB event log clears it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_integer(
    edges: DataFrame,
    *,
    iters: int = 10,
    scale: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
    cnt: str = "cnt",
) -> DataFrame:
    """Weighted PageRank (damping 0.85) over an aggregated edge list
    (src, dst, cnt). Returns (node, pr) with pr in units of 1/scale.

    Plan shape: the edge table is tiny by contract (post-aggregation)
    and is persisted once; every iteration broadcasts the current
    rank vector onto it — no shuffle of anything corpus-sized ever
    happens here (that already happened building ``edges``). Nodes
    with no incoming edges keep the teleport term; mass on dangling
    nodes is dropped identically on both engines.
    """
    from vnavc_spark.cache import tracked_persist

    deg = edges.groupBy(src).agg(F.sum(cnt).alias("deg"))
    # tracked: repeated calls in one session would otherwise leak one
    # cached edge table + node list per call (see cache.py)
    e = tracked_persist(edges.join(deg, on=src), "pagerank_edges")
    nodes = tracked_persist(
        e.select(F.col(src).alias("node"))
        .union(e.select(F.col(dst).alias("node")))
        .distinct(),
        "pagerank_nodes",
    )
    ncnt = nodes.agg(F.count("*").alias("n"))
    pr = nodes.crossJoin(F.broadcast(ncnt)).selectExpr(
        "node", f"{scale} div n AS pr"
    )
    for _ in range(iters):
        contrib = e.join(
            F.broadcast(pr), F.col(src) == F.col("node")
        ).select(
            F.col(dst).alias("_d"),
            F.expr(f"(pr * {cnt}) div deg").alias("c"),
        )
        s = contrib.groupBy("_d").agg(F.sum("c").alias("s"))
        pr = (
            nodes.crossJoin(F.broadcast(ncnt))
            .join(s, F.col("node") == F.col("_d"), "left")
            .selectExpr(
                "node",
                f"(15 * {scale}) div (100 * n)"
                " + (85 * coalesce(s, 0)) div 100 AS pr",
            )
        )
    return pr
