"""Deterministic sampling operators (SURVEY.md G11 / F4).

The reference samples with ``random.sample`` (``whisper_qc.py:230-242``,
``crawler/utils.py:61-65``) — irreproducible across runs. We replace
randomness with a cryptographic-hash order: rank rows per group by
``md5(salt || key)`` and keep the first k. Deterministic, seedable
via the salt, engine-portable (the DuckDB oracle computes the same
digests), and — unlike ``DataFrame.sampleBy`` — gives *exact* k per
group in one window pass, no collect.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_order(key_cols: list[str], salt: str):
    concat = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    return F.md5(F.concat(F.lit(salt), concat))


def exact_k_per_group(
    df: DataFrame,
    group: str | list[str],
    key: str | list[str],
    pct: float = 0.05,
    min_k: int = 1,
    salt: str = "vnavc",
    keep_rank: bool = False,
) -> DataFrame:
    """G11: per-group exact-k sample, k = max(min_k, ceil(pct·n)) —
    the reference's per-book 5% WER sample (floor 1). One window over
    the group partition; at scale this is a single shuffle on the
    group key (usually already the partition key upstream)."""
    groups = [group] if isinstance(group, str) else list(group)
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*groups).orderBy(_hash_order(keys, salt), *keys)
    k = F.greatest(
        F.lit(min_k).cast("long"),
        F.ceil(F.count("*").over(Window.partitionBy(*groups)) * F.lit(pct)),
    )
    out = df.withColumn("_rn", F.row_number().over(w)).withColumn("_k", k)
    out = out.filter(F.col("_rn") <= F.col("_k"))
    return out if keep_rank else out.drop("_rn", "_k")


def exact_k_global(
    df: DataFrame,
    key: str | list[str],
    k: int,
    salt: str = "vnavc",
) -> DataFrame:
    """F4: exact-k global sample (reference ``random.sample(urls, k)``).
    Hash-order + limit: a TakeOrderedAndProject, no full sort
    materialization."""
    keys = [key] if isinstance(key, str) else list(key)
    return (
        df.withColumn("_h", _hash_order(keys, salt))
        .orderBy("_h", *keys)
        .limit(k)
        .drop("_h")
    )


def ceil_pct(n: int, pct: float, min_k: int = 1) -> int:
    """Driver-side helper mirroring the sample-size rule."""
    return max(min_k, math.ceil(n * pct))


def temperature_mixture(
    df: DataFrame,
    domain: str,
    weight_col: str,
    key: str | list[str],
    total: int,
    salt: str = "vnavc",
    places: int = 6,
) -> DataFrame:
    """Temperature-based domain mixture resampling (the multilingual /
    multi-source rebalancing rule: sample domain i proportionally to
    ``vol_i^α`` with α = 0.5, so low-resource domains are up-weighted
    relative to their raw share).

    α is fixed at 0.5 because ``sqrt`` is IEEE exact-rounded — the
    one power that hash-certifies across engines (``pow``/``exp`` are
    transcendental and differ in the last ulp between JVM and libm);
    for other temperatures swap the weight expression and accept a
    rows-only check.

    Shape: per-domain volume agg (map-side partial, integer sum) →
    sqrt-weights as scaled integers (order-independent total) →
    quota = floor(total·w/Σw) broadcast back → one window per domain
    ranks rows by deterministic md5 hash order and keeps ``quota``.
    The corpus shuffles ONCE on the domain key; quotas ride a
    broadcast. Appends (quota, rk) columns.
    """
    keys = [key] if isinstance(key, str) else list(key)
    scale = float(10**places)
    stats = df.groupBy(domain).agg(F.sum(weight_col).alias("_vol"))
    weights = stats.select(
        domain,
        F.floor(
            F.sqrt(F.col("_vol").cast("double")) * scale + F.lit(0.5)
        ).alias("_w"),
    )
    tot = weights.agg(F.sum("_w").alias("_tot"))
    quotas = weights.crossJoin(F.broadcast(tot)).select(
        domain,
        F.floor(
            (F.lit(total) * F.col("_w")).cast("double")
            / F.col("_tot").cast("double")
        ).alias("quota"),
    )
    w = Window.partitionBy(domain).orderBy(_hash_order(keys, salt), *keys)
    return (
        df.withColumn("rk", F.row_number().over(w).cast("long"))
        .join(F.broadcast(quotas), on=domain)
        .filter(F.col("rk") <= F.col("quota"))
    )


def stratified_split(
    df: DataFrame,
    strata: str,
    key: str | list[str],
    fractions: tuple[float, float] = (0.8, 0.9),
    salt: str = "split",
) -> DataFrame:
    """Deterministic stratified train/val/test split: within each
    stratum rows are ranked by md5 hash order and cut at
    ``floor(n·f)`` boundaries — exact per-stratum proportions, fully
    reproducible (same salt → same split on any cluster layout), and
    one window pass: a single shuffle on the stratum key, no
    sampling retries. Appends a ``split`` column."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(strata).orderBy(_hash_order(keys, salt), *keys)
    n = F.count("*").over(Window.partitionBy(strata))
    rn = F.row_number().over(w)
    lo, hi = fractions
    return df.withColumn(
        "split",
        F.when(rn <= F.floor(n.cast("double") * F.lit(lo)), "train")
        .when(rn <= F.floor(n.cast("double") * F.lit(hi)), "val")
        .otherwise("test"),
    )
