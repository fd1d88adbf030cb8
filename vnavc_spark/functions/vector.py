"""Vector math over ``array<float>`` embedding columns — pure
Catalyst higher-order functions (``zip_with`` + ``aggregate``), no
UDFs, so similarity scans stay JVM-side and codegen'd.

Extension surface (BASELINE.json: similarity search); no analogue in
the reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length float arrays."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    """L2 norm."""
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either norm is 0."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def simhash_plane_sign(a: Column | str, seed: int, dim: int) -> Column:
    """Sign bit of a deterministic pseudo-random hyperplane projection:
    plane component i = hash-derived value in [-1, 1). Used by the LSH
    bucketing path in operators/similarity.py. Deterministic across
    runs and engines that share the same derivation."""
    arr = _c(a)
    # plane_i = (crc-ish value from (seed, i)) scaled; use xxhash64 for
    # a cheap JVM-side derivation
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    plane = F.transform(
        idx,
        lambda i: (F.xxhash64(F.lit(seed), i) % 1000003).cast("double") / 1000003.0
        - 0.5,
    )
    proj = F.aggregate(
        F.zip_with(arr, plane, lambda x, p: x.cast("double") * p),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (proj >= 0).cast("int")
