"""Multimodal binary columns (BASELINE.json north-star): image/audio/
video ride as opaque ``binary`` + typed metadata; decode / feature
extraction / resize / frame sampling are Arrow-batched ``mapInPandas``
operators.

Decoder availability: WAV decodes natively (pipeline/audio.py). Image
and video codecs (PIL/ffmpeg) are NOT in this container — those
decode fns are clearly-marked seams: the default raises
``NotImplementedError`` unless the library imports, and every
operator accepts an injected decoder so the Spark plumbing (schema,
batching, partitioning) is real and tested with deterministic fakes.

Scale: blobs enter execution ONLY via the binaryFile scan that
produced them (no shuffle of content); every operator here outputs
features/metadata and drops the bytes immediately. Re-partition by
path BEFORE heavy decode so AQE balances decode cost, not file count.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vnavc_spark.pipeline.audio import decode_wav

#: decoder contracts
ImageDecoder = Callable[[bytes], np.ndarray]  # → HxWxC uint8
FrameSampler = Callable[[bytes, int], list[np.ndarray]]  # video → n frames


def default_image_decoder(data: bytes) -> np.ndarray:
    """PIL when importable (wide format coverage); else the pure-
    Python PNG codec (``pipeline/png.py``) — PNG blobs decode with
    no external dependency. Other formats need an injected decoder."""
    try:  # pragma: no cover — not installed in this container
        import io as _io

        from PIL import Image  # type: ignore

        return np.asarray(Image.open(_io.BytesIO(data)).convert("RGB"))
    except ImportError:
        from vnavc_spark.pipeline.png import PngError, decode_png

        try:
            return decode_png(data)
        except PngError as e:
            raise NotImplementedError(
                f"non-PNG image decode requires PIL/opencv ({e}); "
                "inject decoder=..."
            ) from e


def default_frame_sampler(data: bytes, n: int) -> list[np.ndarray]:
    """STUB: real sampling needs ffmpeg/av (absent here)."""
    raise NotImplementedError("video frame sampling requires ffmpeg/av; inject sampler=...")


# ---------------------------------------------------------------------------
# scans
# ---------------------------------------------------------------------------

def scan_blobs(
    spark: SparkSession, path: str, glob: str, modality: str
) -> DataFrame:
    """binaryFile scan → MEDIA_BLOBS-shaped rows (schemas.MEDIA_BLOBS
    prefix). Glob pushdown prunes at the listing, not after read."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.regexp_replace("path", r"^file:", "").alias("path"),
            F.lit(modality).alias("modality"),
            F.col("content"),
            F.col("length").alias("nbytes"),
        )
    )


# ---------------------------------------------------------------------------
# audio features (real — WAV native)
# ---------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = (
    "path string, sample_rate int, duration double, n_samples long, "
    "rms double, peak double"
)


def audio_features(blobs: DataFrame) -> DataFrame:
    """Decode WAV blobs → per-file acoustic features. Bytes die inside
    the UDF; only features come out."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                y, sr = decode_wav(bytes(content))
                rows.append(
                    {
                        "path": path,
                        "sample_rate": sr,
                        "duration": len(y) / sr if sr else 0.0,
                        "n_samples": len(y),
                        "rms": float(np.sqrt(np.mean(y**2))) if len(y) else 0.0,
                        "peak": float(np.max(np.abs(y))) if len(y) else 0.0,
                    }
                )
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(_feat, schema=AUDIO_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# image features / resize (decoder-injected)
# ---------------------------------------------------------------------------

IMAGE_FEATURES_SCHEMA = (
    "path string, width int, height int, n_channels int, mean_luma double"
)


def image_features(
    blobs: DataFrame, decoder: ImageDecoder = default_image_decoder
) -> DataFrame:
    """Decode image blobs → shape + luminance features."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                img = decoder(bytes(content))
                h, w = img.shape[:2]
                c = img.shape[2] if img.ndim == 3 else 1
                rows.append(
                    {
                        "path": path,
                        "width": int(w),
                        "height": int(h),
                        "n_channels": int(c),
                        "mean_luma": float(img.mean()),
                    }
                )
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(_feat, schema=IMAGE_FEATURES_SCHEMA)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (pure numpy) — the
    byte-exact-reproducible default; ``resize_bilinear`` is the
    filtered variant."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[yi][:, xi]


def resize_bilinear(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Filtered resize: bilinear interpolation with half-pixel-center
    sampling (the OpenCV/PIL convention), fully vectorized numpy —
    deterministic, no per-pixel Python."""
    h, w = img.shape[:2]
    x = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    x0 = np.clip(np.floor(x).astype(int), 0, w - 1)
    y0 = np.clip(np.floor(y).astype(int), 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    fx = np.clip(x - x0, 0.0, 1.0)
    fy = np.clip(y - y0, 0.0, 1.0)
    im = img.astype(np.float64)
    if im.ndim == 2:
        im = im[:, :, None]
    top = im[y0][:, x0] * (1 - fx)[None, :, None] + im[y0][:, x1] * fx[None, :, None]
    bot = im[y1][:, x0] * (1 - fx)[None, :, None] + im[y1][:, x1] * fx[None, :, None]
    out = top * (1 - fy)[:, None, None] + bot * fy[:, None, None]
    out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out[:, :, 0] if img.ndim == 2 else out


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n×n), pure numpy."""
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    d = np.cos(np.pi * (2 * m + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    d[0] /= np.sqrt(2.0)
    return d


def phash64(img: np.ndarray, hash_size: int = 8, highfreq_factor: int = 4) -> int:
    """64-bit perceptual hash (pHash): grayscale → bilinear resize to
    32×32 → 2-D DCT-II → top-left ``hash_size``² low-frequency block
    → bit i = coefficient > median. Robust to resizing, small edits,
    and re-encoding — the image analog of SimHash; near-dup images
    land within a small Hamming distance. Deterministic pure numpy
    (matrix-multiply DCT), no scipy. Returned as a SIGNED int64 (two's
    complement) so it round-trips a Spark ``long`` column."""
    if img.ndim == 3:
        g = img[..., :3].astype(np.float64).mean(axis=2)
    else:
        g = img.astype(np.float64)
    size = hash_size * highfreq_factor
    small = resize_bilinear(g.astype(np.uint8), size, size).astype(np.float64)
    d = _dct_matrix(size)
    low = (d @ small @ d.T)[:hash_size, :hash_size]
    med = np.median(low)
    bits = (low > med).flatten()
    val = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            val |= np.uint64(1) << np.uint64(i)
    return int(val.astype(np.int64))


PHASH_SCHEMA = "path string, phash long"


def image_phash(
    blobs: DataFrame, decoder: ImageDecoder = default_image_decoder
) -> DataFrame:
    """Decode image blobs → 64-bit perceptual hash per path. One
    Arrow pass; downstream near-dup pairing is
    ``operators.dedup.hamming_near_dups`` (Manku block join — never
    an image×image cross join)."""

    def _ph(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {"path": path, "phash": phash64(decoder(bytes(content)))}
                for path, content in zip(pdf["path"], pdf["content"])
            ]
            yield pd.DataFrame(rows, columns=["path", "phash"])

    return blobs.mapInPandas(_ph, schema=PHASH_SCHEMA)


RESIZED_SCHEMA = "path string, content binary, width int, height int"


def resize_images(
    blobs: DataFrame,
    out_w: int,
    out_h: int,
    decoder: ImageDecoder = default_image_decoder,
    method: str = "nearest",
) -> DataFrame:
    """Decode → resize (``nearest`` or ``bilinear``) → re-emit raw
    RGB bytes with typed dimensions (binary stays a column here
    because resize IS the payload transform; downstream writers
    partition it out)."""
    rs = {"nearest": resize_nearest, "bilinear": resize_bilinear}[method]

    def _rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                img = rs(decoder(bytes(content)), out_w, out_h)
                rows.append(
                    {
                        "path": path,
                        "content": img.astype(np.uint8).tobytes(),
                        "width": out_w,
                        "height": out_h,
                    }
                )
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(_rs, schema=RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# video frame sampling (sampler-injected)
# ---------------------------------------------------------------------------

FRAMES_SCHEMA = "path string, frame_idx int, width int, height int, mean_luma double"


def sample_frames(
    blobs: DataFrame,
    n_frames: int = 4,
    sampler: FrameSampler = default_frame_sampler,
) -> DataFrame:
    """UDTF-shaped: one video blob → n frame-feature rows."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for i, frame in enumerate(sampler(bytes(content), n_frames)):
                    h, w = frame.shape[:2]
                    rows.append(
                        {
                            "path": path,
                            "frame_idx": i,
                            "width": int(w),
                            "height": int(h),
                            "mean_luma": float(frame.mean()),
                        }
                    )
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(_frames, schema=FRAMES_SCHEMA)
