"""Explicit StructTypes for every pipeline table (SURVEY.md §1.3).

The reference keeps its data model implicit — pandas infers CSV
schemas and nested values round-trip as Python-repr strings parsed
with ``ast.literal_eval`` (reference ``tts_data_pipeline/__init__.py:291``,
``crawler/download.py:225``). Here every table has one canonical
StructType with real nested types: narrators are
``array<struct<...>>``, part URLs ``array<string>``, durations
``double`` hours — no stringified lists anywhere.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


#: Narrator entity (reference ``__init__.py:76-191``): voice metadata
#: for a speaker; equality/join key is ``id``.
NARRATOR = StructType(
    [
        _f("id", StringType()),
        _f("name", StringType()),
        _f("url", StringType()),
        _f("age", IntegerType()),
        _f("gender", StringType()),
        _f("dialect", StringType()),
        _f("speed", StringType()),
        _f("stress", StringType()),
        _f("volume", StringType()),
        _f("pitch", StringType()),
        _f("tone", StringType()),
    ]
)

#: Book entity (reference ``__init__.py:194-403``), the central row of
#: ``metadata_book.csv`` — but with typed nesting instead of repr
#: strings: ``narrator`` is a real array-of-struct (the reference
#: stores "a Narrator or list of Narrator"), ``audio_download_url`` a
#: real array (one URL per mp3 part).
BOOKS = StructType(
    [
        _f("id", StringType(), False),
        _f("name", StringType()),
        _f("text_path", StringType()),
        _f("audio_path", StringType()),
        _f("alignment_path", StringType()),
        _f("narrator", ArrayType(NARRATOR)),
        _f("duration_raw", StringType()),
        _f("duration_hours", DoubleType()),
        _f("author", StringType()),
        _f("text_url", StringType()),
        _f("audio_url", StringType()),
        _f("source", StringType()),
        _f("text_download_url", StringType()),
        _f("audio_download_url", ArrayType(StringType())),
        _f("sample_rate", IntegerType()),
        _f("quality", StringType()),
        _f("word_count", IntegerType()),
        _f("num_sentences", IntegerType()),
        _f("audio_size", LongType()),
        _f("text_size", LongType()),
    ]
)

#: Narrator roster dimension (Google-Sheet CSV source,
#: ``crawler/metadata.py:303-332``).
NARRATORS = StructType(
    [
        _f("narrator_id", StringType(), False),
        _f("name", StringType()),
        _f("url", StringType()),
        _f("gender", StringType()),
        _f("age", IntegerType()),
        _f("dialect", StringType()),
        _f("speed", StringType()),
        _f("stress", StringType()),
        _f("volume", StringType()),
        _f("pitch", StringType()),
    ]
)

#: ``valid_book_urls.txt`` rows + URL-validation results
#: (``crawler/metadata.py:402-407``, ``crawler/utils.py:245-301``).
URLS = StructType(
    [
        _f("audio_url", StringType()),
        _f("text_url", StringType()),
        _f("source", StringType()),
        _f("status_code", IntegerType()),
        _f("valid", BooleanType()),
    ]
)

#: Post-normalization sentence table (text pipeline output; replaces
#: the reference's sentence-per-line txt files,
#: ``pre_processing/process_all.py:351-356``).
SENTENCES = StructType(
    [
        _f("book_id", StringType(), False),
        _f("line_no", IntegerType(), False),
        _f("raw", StringType()),
        _f("norm", StringType()),
        _f("n_words", IntegerType()),
    ]
)

#: Alignment table (reference per-book TSV + outlier.txt,
#: ``aeneas_batch_align.py:215-248``) — outliers become a boolean
#: column instead of a side file, seg_id one consistent 0-based key
#: (fixes SURVEY §2.11 off-by-one).
SEGMENTS = StructType(
    [
        _f("book_id", StringType(), False),
        _f("seg_id", IntegerType(), False),
        _f("start", DoubleType()),
        _f("end", DoubleType()),
        _f("duration", DoubleType()),
        _f("is_outlier", BooleanType()),
    ]
)

#: Final utterance dataset rows (``push_to_hf.py:139-141`` shape).
#: ``audio_path`` is the 100 TB posture: audio rides as a path +
#: typed metadata; waveform bytes only enter executors inside
#: pandas-UDF islands that read them on demand.
UTTERANCES = StructType(
    [
        _f("speaker_id", StringType(), False),
        _f("book_id", StringType(), False),
        _f("seg_id", IntegerType(), False),
        _f("text", StringType()),
        _f("audio_path", StringType()),
        _f("duration", DoubleType()),
        _f("sample_rate", IntegerType()),
        _f("ref_words", IntegerType()),
        _f("word_errors", IntegerType()),
    ]
)

#: ASR transcription output (whisper_qc.py hypothesis rows).
QC_TRANSCRIPTS = StructType(
    [
        _f("speaker_id", StringType(), False),
        _f("book_id", StringType(), False),
        _f("seg_id", IntegerType(), False),
        _f("hypothesis", StringType()),
    ]
)

#: Multimodal blob row: opaque binary + typed metadata (SURVEY §7
#: north-star; the decode itself is a gated pandas UDF).
MEDIA_BLOBS = StructType(
    [
        _f("path", StringType(), False),
        _f("modality", StringType()),  # audio | image | video
        _f("content", BinaryType()),
        _f("sample_rate", IntegerType()),
        _f("n_channels", IntegerType()),
        _f("duration", DoubleType()),
        _f("width", IntegerType()),
        _f("height", IntegerType()),
    ]
)

#: In-memory waveform rows used inside DSP pandas-UDF islands only —
#: never shuffled at scale (path-not-payload rule).
WAVEFORMS = StructType(
    [
        _f("book_id", StringType(), False),
        _f("part_idx", IntegerType(), False),
        _f("samples", ArrayType(FloatType())),
        _f("sample_rate", IntegerType()),
    ]
)
