"""Pure-Python PNG codec (stdlib zlib + numpy) — makes the image
modality REAL in-container: the multimodal image operators
(``pipeline/multimodal.py``) decode PNG blobs with no PIL/opencv.

Scope (documented, not hidden): bit depth 8, color types gray /
RGB / RGBA / palette, no interlacing — the machine-generated common
case. PIL remains the wide-format path when importable
(``multimodal.default_image_decoder`` tries it first).

Filters: NONE and UP reconstruct vectorized; SUB is a per-lane
cumulative sum (mod-256 distributes over cumsum); AVG/PAETH have a
true sequential dependency through the previous pixel, so they run
as a per-row loop — rows are width-bounded, and feature extraction
batches many files per Arrow task, so the loop is not a hot path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}


class PngError(ValueError):
    """Raised for non-PNG input or unsupported PNG variants."""


def _chunks(data: bytes):
    pos = len(_SIG)
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        yield ctype, data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W) or (H, W, C) uint8 array."""
    if data[: len(_SIG)] != _SIG:
        raise PngError("not a PNG (bad signature)")
    width = height = None
    color_type = None
    palette = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth} (only 8)")
            if color_type not in _CHANNELS:
                raise PngError(f"unsupported color type {color_type}")
            if interlace:
                raise PngError("interlaced PNG unsupported")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
    if width is None:
        raise PngError("missing IHDR")
    nch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise PngError("IDAT size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters, rows = rows[:, 0], rows[:, 1:].astype(np.int64)
    out = np.zeros((height, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(height):
        f, line = int(filters[r]), rows[r]
        if f == 0:  # None
            rec = line
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f == 1:  # Sub: per-lane cumsum, mod-256 distributes
            rec = line.copy()
            for lane in range(nch):
                rec[lane::nch] = np.cumsum(rec[lane::nch]) & 0xFF
        elif f in (3, 4):  # Average / Paeth: sequential through x-bpp
            rec = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = rec[i - nch] if i >= nch else 0
                b = prev[i]
                if f == 3:
                    rec[i] = (line[i] + (a + b) // 2) & 0xFF
                else:
                    c = prev[i - nch] if i >= nch else 0
                    rec[i] = (line[i] + _paeth(int(a), int(b), int(c))) & 0xFF
        else:
            raise PngError(f"unknown filter {f}")
        out[r] = rec
        prev = out[r]
    img = out.astype(np.uint8).reshape(height, width, nch)
    if color_type == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        img = palette[img[:, :, 0]]
    if img.shape[2] == 1:
        return img[:, :, 0]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """(H, W[, C]) uint8 array → PNG bytes (filter NONE rows, one
    zlib stream) — gray / RGB / RGBA."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise PngError(f"unsupported channel count {c}")
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
