"""Pure-Python MP3 frame-header probing (S11 metadata path).

The reference's corpus IS mp3 parts (``crawler/download.py:141-145``
streams them; ``pre_processing/process_all.py:382-398`` loads via
librosa just to read sample rate / duration for the F8/G7 gates).
Full mp3 DECODE needs a codec and stays behind the injectable seam in
``pipeline/audio.py``; but the sample rate, channel count, and
duration live in the frame HEADERS, which are trivially parseable —
so the gates (sample-rate gate F8, min-sample-rate aggregate G7,
duration outliers F7) run on real mp3 corpora with zero external
dependencies.

Duration strategy, most-exact first:
1. Xing/Info or VBRI header in the first frame → frame count → exact
   ``frames × samples_per_frame / sr`` (the standard VBR path).
2. Full frame walk (headers only, one 4-byte read per frame) — exact
   for both CBR and VBR; cost is linear in frame count (~26 ms/hour
   of audio), fine for the Arrow-batched probe UDF.

All byte offsets follow the MPEG-1/2/2.5 Layer III framing spec
(public ISO/IEC 11172-3 layout, as implemented by every mp3 tool).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

# bitrate tables (kbps), Layer III; index 0 = "free", 15 = invalid
_BITRATES_V1_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_BITRATES_V2_L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
# sample-rate tables by version bits (11=MPEG1, 10=MPEG2, 00=MPEG2.5)
_SAMPLE_RATES = {
    0b11: (44100, 48000, 32000),
    0b10: (22050, 24000, 16000),
    0b00: (11025, 12000, 8000),
}


class Mp3Error(ValueError):
    """Raised when no valid MPEG Layer III frame can be found."""


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (syncsafe 28-bit size)."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    b = data[6:10]
    if any(x & 0x80 for x in b):
        return 0  # malformed syncsafe int — treat as no tag
    return 10 + ((b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3])


def _parse_frame_header(data: bytes, off: int) -> dict | None:
    """Parse the 4-byte frame header at ``off``; None if invalid."""
    if off + 4 > len(data):
        return None
    b0, b1, b2, b3 = data[off : off + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None  # no frame sync
    version = (b1 >> 3) & 0b11
    layer = (b1 >> 1) & 0b11
    if version == 0b01 or layer != 0b01:  # reserved version / not Layer III
        return None
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0b11
    if br_idx in (0, 15) or sr_idx == 0b11:
        return None  # free-format/invalid bitrate, invalid sample rate
    padding = (b2 >> 1) & 1
    channel_mode = (b3 >> 6) & 0b11
    sr = _SAMPLE_RATES[version][sr_idx]
    if version == 0b11:
        bitrate = _BITRATES_V1_L3[br_idx]
        samples = 1152
        frame_len = (144 * bitrate * 1000) // sr + padding
    else:  # MPEG2 / 2.5
        bitrate = _BITRATES_V2_L3[br_idx]
        samples = 576
        frame_len = (72 * bitrate * 1000) // sr + padding
    return {
        "version": version,
        "sample_rate": sr,
        "bitrate_kbps": bitrate,
        "channels": 1 if channel_mode == 0b11 else 2,
        "samples": samples,
        "frame_len": frame_len,
        "channel_mode": channel_mode,
    }


def _find_first_frame(data: bytes) -> tuple[int, dict]:
    """Locate the first frame whose NEXT frame also parses (guards
    against 0xFFE byte runs inside tag padding / junk)."""
    off = _id3v2_size(data)
    end = len(data)
    while off < end - 4:
        hdr = _parse_frame_header(data, off)
        if hdr is not None:
            nxt = off + hdr["frame_len"]
            if nxt >= end - 4 or _parse_frame_header(data, nxt) is not None:
                return off, hdr
        off += 1
    raise Mp3Error("no valid MPEG Layer III frame found")


def _xing_frame_count(data: bytes, off: int, hdr: dict) -> int | None:
    """Frame count from a Xing/Info (or VBRI) header in frame 1."""
    # Xing lives after the side-info block, whose size depends on
    # version and mono/stereo
    if hdr["version"] == 0b11:
        side = 17 if hdr["channel_mode"] == 0b11 else 32
    else:
        side = 9 if hdr["channel_mode"] == 0b11 else 17
    p = off + 4 + side
    if data[p : p + 4] in (b"Xing", b"Info"):
        flags = int.from_bytes(data[p + 4 : p + 8], "big")
        if flags & 0x1:  # frames field present
            return int.from_bytes(data[p + 8 : p + 12], "big")
        return None
    q = off + 4 + 32  # VBRI sits at a fixed 32-byte offset
    if data[q : q + 4] == b"VBRI":
        return int.from_bytes(data[q + 14 : q + 18], "big")
    return None


def probe_mp3(data: bytes) -> dict:
    """Headers-only probe: sample_rate, channels, n_frames, duration
    (seconds), bitrate_kbps (of the first frame), vbr flag, and the
    byte offset of audio data. Never decodes a single sample."""
    off, first = _find_first_frame(data)
    n_frames = _xing_frame_count(data, off, first)
    vbr = None
    if n_frames is None:
        # exact frame walk — headers only; resyncs over junk bytes
        n_frames, vbr, p = 0, False, off
        end = len(data)
        while p < end - 4:
            hdr = _parse_frame_header(data, p)
            if hdr is None:
                p += 1  # resync (truncated tail / garbage)
                continue
            n_frames += 1
            vbr = vbr or hdr["bitrate_kbps"] != first["bitrate_kbps"]
            p += hdr["frame_len"]
    return {
        "sample_rate": first["sample_rate"],
        "channels": first["channels"],
        "n_frames": n_frames,
        "duration": n_frames * first["samples"] / first["sample_rate"],
        "bitrate_kbps": first["bitrate_kbps"],
        "vbr": bool(vbr) if vbr is not None else True,  # Xing ⇒ assume VBR
        "data_offset": off,
    }


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

#: schema of the probe stage
MP3_INFO_SCHEMA = (
    "sample_rate int, channels int, n_frames long, duration double, "
    "bitrate_kbps int, vbr boolean, probe_error string"
)


def mp3_info_udf():
    """Arrow-batched probe over a BINARY content column → info struct
    (NULL fields + probe_error message on unparseable input). Built
    lazily — pandas UDF type parsing needs an active session."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(f"struct<{MP3_INFO_SCHEMA}>")
    def _udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        cols = [c.split()[0] for c in MP3_INFO_SCHEMA.split(", ")]
        for contents in batches:
            rows = []
            for blob in contents:
                try:
                    info = probe_mp3(bytes(blob))
                    rows.append(
                        {
                            "sample_rate": info["sample_rate"],
                            "channels": info["channels"],
                            "n_frames": info["n_frames"],
                            "duration": info["duration"],
                            "bitrate_kbps": info["bitrate_kbps"],
                            "vbr": info["vbr"],
                            "probe_error": None,
                        }
                    )
                except Exception as e:  # noqa: BLE001 — per-row gate
                    rows.append(dict.fromkeys(cols) | {"probe_error": str(e)})
            yield pd.DataFrame(rows, columns=cols)

    return _udf


def with_mp3_info(df, content_col: str = "content", out_col: str = "info"):
    """Attach the probe struct to a binaryFile DataFrame — the F8/G7
    gates then run on ``info.sample_rate`` / ``info.duration`` as
    plain Catalyst filters, no decoder needed."""
    from pyspark.sql import functions as F

    return df.withColumn(out_col, mp3_info_udf()(F.col(content_col)))
