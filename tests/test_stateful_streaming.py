"""applyInPandasWithState: running totals survive micro-batches and
query restarts (checkpointed state)."""

from __future__ import annotations

import json

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from vnavc_spark.streaming.stateful import running_user_totals

SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
        StructField("ts", TimestampType()),
    ]
)


def _write(d, name, rows):
    (d / name).write_text("\n".join(json.dumps(r) for r in rows))


def _run_once(spark, src, ckpt, out_dir):
    """foreachBatch parquet sink: unlike the memory sink it supports
    checkpoint recovery, which is the point of this test."""
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .json(str(src))
    )

    def sink(batch_df, batch_id):
        batch_df.withColumn("batch_id", __import__("pyspark").sql.functions.lit(batch_id)).write.mode(
            "append"
        ).parquet(str(out_dir))

    q = (
        running_user_totals(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(str(out_dir)).collect()
    latest = {}
    for r in rows:
        cur = latest.get(r.user_id)
        if cur is None or r.n_events > cur[0]:
            latest[r.user_id] = (r.n_events, r.total_cents)
    return latest


class TestStatefulTotals:
    def test_state_across_batches_and_restarts(self, spark, tmp_path):
        src = tmp_path / "in"
        src.mkdir()
        _write(src, "b1.json", [
            {"user_id": 1, "value": 1.5, "ts": "2024-01-01T00:00:00"},
            {"user_id": 2, "value": 2.0, "ts": "2024-01-01T00:00:01"},
        ])
        _write(src, "b2.json", [
            {"user_id": 1, "value": 0.25, "ts": "2024-01-01T00:01:00"},
        ])
        ckpt = tmp_path / "ckpt"
        got = _run_once(spark, src, ckpt, tmp_path / "totals_run1")
        # state accumulated ACROSS the two micro-batches
        assert got[1] == (2, 175) and got[2] == (1, 200)

        # restart with new data on the same checkpoint: state resumes
        _write(src, "b3.json", [
            {"user_id": 1, "value": 10.0, "ts": "2024-01-01T00:02:00"},
            {"user_id": 3, "value": 0.5, "ts": "2024-01-01T00:02:01"},
        ])
        got2 = _run_once(spark, src, ckpt, tmp_path / "totals_run2")
        assert got2[1] == (3, 1175)  # resumed from (2, 175)
        assert got2[3] == (1, 50)
