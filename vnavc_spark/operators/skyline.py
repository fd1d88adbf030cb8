"""Distributed 2-D skyline (Pareto-optimal set) — an operator Spark
has no native form for (no reference analog either; standard OLAP
surface, Börzsönyi et al. ICDE'01 "The Skyline Operator").

Semantics: over points (maximize ``max_col``, minimize ``min_col``),
keep every point NOT dominated by another — b dominates a iff
b.max ≥ a.max AND b.min ≤ a.min with strict inequality in at least
one dimension. Duplicated points are mutually non-dominating and all
survive.

Scale shape: the skyline of a union is the skyline of the per-part
skylines, so stage 1 computes a LOCAL skyline per partition (one
Arrow pass, sort + sweep — no pairwise work) and stage 2 merges the
tiny survivors on a single partition. Local skylines are small in
practice (anti-correlated dims) but worst-case corpus-sized
(perfectly sorted anti-chain), so stage 2 fail-fasts above
``max_candidates`` instead of silently funnelling a corpus through
one task.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def _sweep(df: pd.DataFrame, max_col: str, min_col: str) -> pd.DataFrame:
    """Exact 2-D skyline of one pandas frame: sort by max_col desc
    then min_col asc; walking down, a point is dominated iff some
    STRICTLY-higher-max point has min ≤ its min (H), or a same-max
    point has a strictly smaller min (group minimum). Equal
    duplicates all survive."""
    if df.empty:
        return df
    df = df.sort_values(
        [max_col, min_col], ascending=[False, True], kind="mergesort"
    )
    out = []
    h = None  # min(min_col) over strictly-higher max groups
    for _, grp in df.groupby(max_col, sort=False):
        gmin = grp[min_col].iloc[0]
        if h is None or gmin < h:
            out.append(grp[grp[min_col] == gmin])
        h = gmin if h is None else min(h, gmin)
    return pd.concat(out) if out else df.iloc[0:0]


def skyline2d(
    points: DataFrame,
    max_col: str,
    min_col: str,
    max_candidates: int = 10_000_000,
) -> DataFrame:
    """Pareto front of ``points`` maximizing ``max_col`` and
    minimizing ``min_col``; all columns pass through. Two Arrow
    stages: per-partition sweep, then a one-partition merge sweep
    over the local survivors (guarded by ``max_candidates``)."""
    schema = points.schema

    def local(batches):
        acc = [b for b in batches]
        if not acc:
            return
        yield _sweep(pd.concat(acc), max_col, min_col)

    def merge(batches):
        acc = [b for b in batches]
        if not acc:
            return
        allp = pd.concat(acc)
        if len(allp) > max_candidates:
            raise ValueError(
                f"skyline2d: {len(allp)} local-skyline candidates exceed "
                f"max_candidates={max_candidates} — the dimensions are "
                "near-perfectly anti-correlated, so the merge stage would "
                "funnel a corpus-sized anti-chain through one task. Raise "
                "the cap explicitly or pre-aggregate the points."
            )
        yield _sweep(allp, max_col, min_col)

    local_sky = points.mapInPandas(local, schema)
    return local_sky.coalesce(1).mapInPandas(merge, schema)
