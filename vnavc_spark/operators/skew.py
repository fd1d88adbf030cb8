"""Skew-mitigation operators: salting for hot keys.

The reference corpus is heavily skewed (one 20+ hour book per ~50
2-hour books — BASELINE.md duration range); at 100 TB a hot book_id
(or a hot shingle/band key) turns one reducer into the straggler.
AQE's skew-join splitting covers sort-merge joins automatically; these
helpers cover the cases AQE does not:

- ``salted_agg``: two-phase aggregation for algebraic aggregates over
  a hot group key — partial agg on (key, salt), final agg on key. The
  shuffle fans a hot key over ``n_salts`` reducers.
- ``salted_broadcast_skew_join``: replicate the small side per salt
  so a hot fact key spreads over ``n_salts`` tasks while the dim side
  stays broadcast (no extra shuffle of the big side).

Both are *plan* rewrites — results are identical to the unsalted
form (asserted in tests/test_skew.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, cols: Sequence[str], out: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, n_salts): hash of the full row key
    set — stable across retries (no rand(), so task re-execution
    produces identical data)."""
    h = F.xxhash64(*[F.col(c) for c in cols])
    return df.withColumn(out, F.pmod(h, F.lit(n_salts)).cast("int"))


def salted_agg(
    df: DataFrame,
    group: str | Sequence[str],
    aggs: dict[str, Column],
    finals: dict[str, Column],
    n_salts: int = 16,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation: groupBy(key, salt).agg(aggs) →
    groupBy(key).agg(finals over the partial columns).

    ``aggs`` produce partial columns; ``finals`` combine them (e.g.
    partial ``sum(x) as s`` then final ``sum(s) as s``). Only valid
    for algebraic aggregates (sum/count/min/max and compositions).
    NOTE: Spark's map-side partial aggregation already handles most
    skew for these — reach for this when the *reduce* side still
    hot-spots (e.g. high-cardinality payloads per key)."""
    groups = [group] if isinstance(group, str) else list(group)
    salted = with_salt(df, n_salts, list(salt_cols or df.columns))
    partial = salted.groupBy(*groups, "_salt").agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return partial.groupBy(*groups).agg(
        *[c.alias(n) for n, c in finals.items()]
    )


def salted_broadcast_skew_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the big side on its whole row, explode
    the small side × n_salts, join on (key, salt). The hot key's rows
    land on n_salts tasks instead of one. Small side must tolerate
    ×n_salts replication (it is broadcast anyway)."""
    b = with_salt(big, n_salts, [c for c in big.columns])
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = b.join(F.broadcast(s), on=[on, "_salt"], how=how)
    return out.drop("_salt")
