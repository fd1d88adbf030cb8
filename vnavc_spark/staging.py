"""Parquet staging between pipeline stages (SURVEY §1.3: the
reference's per-stage CSV rewrites become columnar staging tables).

Two layouts, chosen by how the next stage reads:

- ``stage_partitioned``: directory-partitioned by a low-cardinality
  filter column (``qualified``, ``speaker_id``) so downstream reads
  PRUNE — the QC stage never lists unqualified books' files (SURVEY
  §4 partition-pruning note).
- ``stage_bucketed``: hash-bucketed + sorted by a join key
  (``book_id``) so stage-to-stage joins are CO-LOCATED — both sides
  read pre-shuffled buckets and the join plan has NO Exchange. At
  100 TB this removes the dominant shuffle of every per-book join
  (segments ⋈ audio, utterances ⋈ metrics). Bucketed tables require
  the session catalog (``saveAsTable``); plain-path writes cannot
  carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def stage_partitioned(
    df: DataFrame, path: str, partition_by: list[str], mode: str = "overwrite"
) -> None:
    """Write a stage table partitioned for downstream pruning."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def stage_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Write a catalog table bucketed+sorted on the join key. Joins
    between tables bucketed the same way need no shuffle (verify:
    plan has zero Exchange nodes — tests/test_staging.py pins this).

    ``n_buckets`` sizing rule: total stage bytes / target partition
    size (128-256 MB); must match across tables intended to co-join.
    """
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def read_stage(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Read a staged table (path → parquet read; bare name → catalog
    table with bucket metadata intact)."""
    if "/" in path_or_table:
        return spark.read.parquet(path_or_table)
    return spark.table(path_or_table)


#: formats with a native JVM-side vectorized reader in this build —
#: staging accepts any of them; parquet stays the default for its
#: footer stats + dictionary encoding, ORC is the drop-in alternative
#: (both columnar, splittable, predicate-pushdown capable), JSON-lines
#: is the interchange escape hatch (row-oriented: no pushdown, no
#: column pruning — boundary use only, never between hot stages).
STAGE_FORMATS = ("parquet", "orc", "json")


def stage_format(
    df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite"
) -> None:
    """Write a stage table in any supported interchange format."""
    if fmt not in STAGE_FORMATS:
        raise ValueError(f"unsupported stage format: {fmt}")
    df.write.mode(mode).format(fmt).save(path)


def read_stage_format(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    if fmt not in STAGE_FORMATS:
        raise ValueError(f"unsupported stage format: {fmt}")
    return spark.read.format(fmt).load(path)
