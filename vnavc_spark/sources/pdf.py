"""PDF text extraction source (SURVEY.md S10).

The reference extracts per-page text with pymupdf
(``pre_processing/process_all.py:265-279``). pymupdf is not in this
container, so the extractor is an injectable callable: production
passes a pymupdf-backed function; tests pass a fake. The Spark
plumbing — binaryFile scan with glob pushdown, Arrow-batched
``mapInPandas``, path-derived book ids — is real and tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vnavc_spark.functions.text import file_stem

#: extractor contract: raw PDF bytes → extracted text
PdfExtractor = Callable[[bytes], str]


def default_pdf_extractor(data: bytes) -> str:
    """STUB: real extraction needs pymupdf (absent here). Raises so
    misuse is loud; inject a real extractor or a test fake."""
    try:  # pragma: no cover — not installed in this container
        import fitz  # type: ignore  # pymupdf

        with fitz.open(stream=data, filetype="pdf") as doc:
            return "\n".join(page.get_text() for page in doc)
    except ImportError as e:
        raise NotImplementedError(
            "PDF extraction requires pymupdf; inject extractor=..."
        ) from e


EXTRACT_SCHEMA = "book_id string, path string, raw_text string, n_pdf_bytes long"


def scan_pdfs(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """S12: binaryFile scan with pushed glob filter; book id from the
    filename stem."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            file_stem(F.regexp_replace("path", r"^file:", "")).alias("book_id"),
            F.regexp_replace("path", r"^file:", "").alias("path"),
            F.col("content"),
            F.col("length").alias("n_pdf_bytes"),
        )
    )


def extract_text(
    pdfs: DataFrame, extractor: PdfExtractor = default_pdf_extractor
) -> DataFrame:
    """S10: bytes → raw_text via Arrow-batched mapInPandas. Input
    rows carry the binary content column from ``scan_pdfs``; output
    drops it immediately so text, not blobs, flows downstream."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "book_id": list(pdf["book_id"]),
                    "path": list(pdf["path"]),
                    "raw_text": [extractor(bytes(b)) for b in pdf["content"]],
                    "n_pdf_bytes": list(pdf["n_pdf_bytes"]),
                }
            )

    return pdfs.mapInPandas(_extract, schema=EXTRACT_SCHEMA)
