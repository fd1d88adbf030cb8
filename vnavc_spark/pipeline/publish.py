"""Dataset publish stage (SURVEY.md K7/K8, G5, T7, A10 seam; §3.3
step 4): utterances → final training dataset + prompt corpus.

The reference builds a HuggingFace ``Dataset`` in driver memory and
pushes it (``push_to_hf.py:16-24``) — unusable beyond RAM. Here the
final dataset IS partitioned Parquet (HF ``datasets`` reads Parquet
natively), written partitioned by ``speaker_id`` so per-speaker reads
prune; the Hub push is a thin driver-side step outside the engine.

``class_encode_column(speaker_id)`` becomes an explicit label
dimension built with a window over distinct speakers — deterministic,
joinable, and stable across appends (alphabetical order, matching HF
ClassLabel name sorting).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vnavc_spark.pipeline.vietnamese import process_transcript_udf


def speaker_labels(utterances: DataFrame, speaker_col: str = "speaker_id") -> DataFrame:
    """K8 class-encode: (speaker_id, label) dimension; labels are
    0-based ranks in sorted speaker order (HF ClassLabel semantics).
    Distinct-then-window over a tiny dimension — the window runs on
    |speakers| rows, not the corpus."""
    w = Window.orderBy(speaker_col)
    return (
        utterances.select(speaker_col)
        .distinct()
        .withColumn("label", (F.row_number().over(w) - 1).cast("int"))
    )


def publish_dataset(
    utterances: DataFrame,
    out_path: str,
    speaker_col: str = "speaker_id",
    text_col: str = "text",
) -> DataFrame:
    """K8: final dataset rows (audio path + cleaned text + encoded
    speaker label), written as Parquet partitioned by speaker. Returns
    the DataFrame it wrote."""
    labels = speaker_labels(utterances, speaker_col)
    cleaned = utterances.withColumn(
        text_col, process_transcript_udf()(F.col(text_col))
    )
    out = cleaned.join(F.broadcast(labels), on=speaker_col)
    out.write.mode("overwrite").partitionBy(speaker_col).parquet(out_path)
    return out


def corpus_stats(
    utterances: DataFrame,
    speaker_col: str = "speaker_id",
    duration_col: str = "duration",
) -> DataFrame:
    """G5 + cube extension: corpus totals with per-speaker × per-
    sample-rate subtotals (SURVEY §2.4 notes cube/rollup are free
    capabilities the reference lacks)."""
    return (
        utterances.cube(speaker_col, "sample_rate")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("n_utts"),
            (F.sum(duration_col) / 3600.0).alias("total_hours"),
        )
    )


# ---------------------------------------------------------------------------
# A10 — prompt corpus (BiCodec tokenizer seam)
# ---------------------------------------------------------------------------

#: tokenizer contract: waveform path → (global_ids, semantic_ids)
AudioTokenizer = Callable[[str], tuple[list[int], list[int]]]


def fake_tokenizer(path: str) -> tuple[list[int], list[int]]:
    """DETERMINISTIC FAKE (stub): derives token ids from the path
    hash — stands in for the GPU BiCodec model (reference
    ``prepare_prompt_for_vnavc.py:29-64``) so the prompt-building
    plumbing is testable. Swap via ``tokenizer=``."""
    import hashlib

    h = hashlib.md5(path.encode()).digest()
    return [h[0] % 64, h[1] % 64], [b % 1024 for b in h[2:10]]


def build_prompts(
    utterances: DataFrame,
    tokenizer: AudioTokenizer = fake_tokenizer,
    text_col: str = "text",
    path_col: str = "audio_path",
) -> DataFrame:
    """A10 + K7: per utterance, tokenize audio (GPU pandas-UDF seam —
    per-executor model singleton in production, batched via Arrow)
    and format the TTS prompt string. The reference's 500-row subset
    chunking (O5) is obsolete: partitions bound memory naturally."""

    def _prompts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, prompts = [], []
            for txt, path in zip(pdf[text_col], pdf[path_col]):
                g, s = tokenizer(path)
                gl = "".join(f"<|bicodec_global_{i}|>" for i in g)
                se = "".join(f"<|bicodec_semantic_{i}|>" for i in s)
                prompts.append(
                    "<|task_tts|><|start_content|>"
                    + (txt or "")
                    + "<|end_content|><|start_global_token|>"
                    + gl
                    + "<|end_global_token|><|start_semantic_token|>"
                    + se
                    + "<|end_semantic_token|><|im_end|>"
                )
                texts.append(txt)
            yield pd.DataFrame({"text": prompts})

    return utterances.select(text_col, path_col).mapInPandas(
        _prompts, schema="text string"
    )


def write_prompts_jsonl(prompts: DataFrame, out_path: str) -> None:
    """K7: ``{"text": …}`` JSONL corpus — ``df.write.json`` IS the
    operator (the reference appends lines in a Python loop)."""
    prompts.select("text").write.mode("overwrite").json(out_path)
