"""SparkSession factory tuned for the VNAVC-on-Spark engine.

Defaults are chosen for the 100 TB posture (SURVEY.md §7):

- AQE on (coalesce post-shuffle partitions, skew-join splitting) —
  the reference corpus is heavily skewed (2.5 h vs 20+ h books;
  BASELINE.md "Book duration range"), so per-book groups skew hard.
- Arrow on — every pandas-UDF island (Vietnamese NLP, DSP) transfers
  via Arrow batches instead of pickled rows.
- UTC session timezone — deterministic timestamp semantics that match
  the DuckDB correctness oracle.
- shuffle partitions default to the local core count; on a real
  cluster this is overridden via env/conf (rule of thumb: 2-3× total
  executor cores, or rely on AQE coalescing from a high initial
  count).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Tuned defaults; every entry can be overridden by the caller or by
#: ``spark-defaults.conf`` on a real cluster.
DEFAULT_CONF: dict[str, str] = {
    # Local-mode heap: the JVM default (1g) starves 32 concurrent
    # tasks' shuffle-spill merges on candidate-heavy aggregations
    # (q207's radius-2 blocking OOM'd in the spill READERS at sf0.1 —
    # each merge opens a 1 MB ReadAheadInputStream per spill file).
    # r11 set 8g; r13 measured the ER-chain aggregates GC-bound at
    # 0.25 g per concurrent task (ER trio 18.0 -> 16.9 s at 16g,
    # fresh-session 3-rep medians) and raised the default to 16g =
    # 0.5 g/thread — still LEAN against production sizing (clusters
    # run 8-64g executors at >=2 g/core; this box is 128 GiB), so
    # the faithful-posture argument holds at either value. Only
    # effective when the builder launches the JVM (a pre-existing
    # gateway keeps its heap); override via $SPARK_GRAFT_DRIVER_MEM.
    "spark.driver.memory": os.environ.get(
        "SPARK_GRAFT_DRIVER_MEM", "16g"
    ),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Keep pandas-UDF batches bounded so audio blobs never blow the
    # executor heap (path-not-payload is the primary defense; this is
    # the backstop).
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
    # Parquet staging between stages.
    "spark.sql.parquet.compression.codec": "snappy",
    "spark.sql.parquet.filterPushdown": "true",
    # local mode: silence the progress bar in test output
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(
    app_name: str = "vnavc-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or
    ``local[*]``) so the same entry points run in driver tests and on
    a cluster (where ``master`` is supplied by spark-submit).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master("local[*]")

    conf = dict(DEFAULT_CONF)
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)
        )
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
