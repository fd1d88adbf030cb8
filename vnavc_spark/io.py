"""Table loaders for the driver testdata and Parquet staging areas.

The synthetic testdata (TESTDATA.md) is a TPC-H-ish star schema plus
``events`` / ``documents`` / ``embeddings``; the correctness oracle
(DuckDB) reads the same files, so readers here never mutate schema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: All driver-generated tables, one parquet file each.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimensions small enough to broadcast at any scale factor the
#: reference corpus could reach (region=5 rows, nation=25; narrator
#: roster is a few hundred rows in the reference —
#: /root/reference/data/metadata).
BROADCAST_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table as a DataFrame (columnar parquet scan;
    Catalyst prunes columns and pushes filters into the scan).

    ``events.parquet`` has shipped as TIMESTAMP(NANOS) in some driver
    generations (Spark's parquet reader rejects nanos by default) and
    TIMESTAMP(MICROS) in others. Handle both: read nanos as long and
    truncate to microsecond timestamps (exactly what DuckDB's reader
    does, so the correctness oracle sees identical values); pass
    native micros through untouched.
    """
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, LongType):
            # integer div keeps full precision (nanos exceed 2^53)
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(path)


def dim(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a dimension table with a broadcast hint applied when it is
    known-small (BROADCAST_TABLES). Joins against the result skip the
    shuffle regardless of statistics availability."""
    from pyspark.sql.functions import broadcast

    df = table(spark, sf_dir, name)
    return broadcast(df) if name in BROADCAST_TABLES else df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TESTDATA_TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
