"""MP3 header-probe tests over constructed fixture streams — real
framing bytes per the MPEG spec, no codec needed."""

from __future__ import annotations

import pytest

from vnavc_spark.pipeline import mp3 as M


def _frame_v1_stereo_128_44100(pad: int = 0, fill: bytes = b"\x00") -> bytes:
    # sync|MPEG1|L3, 128 kbps (idx 9), 44100 (idx 0), stereo
    hdr = bytes([0xFF, 0xFB, 0x90 | (pad << 1), 0x00])
    n = (144 * 128000) // 44100 + pad
    return hdr + fill * (n - 4)


def _frame_v2_mono_64_16000() -> bytes:
    # sync|MPEG2|L3, 64 kbps (idx 8), 16000 (idx 2), mono
    hdr = bytes([0xFF, 0xF3, 0x88, 0xC0])
    n = (72 * 64000) // 16000
    return hdr + b"\x00" * (n - 4)


def _id3v2(size: int = 100) -> bytes:
    return (
        b"ID3\x04\x00\x00"
        + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F])
        + b"\x00" * size
    )


class TestProbe:
    def test_cbr_v1_stereo(self):
        data = _frame_v1_stereo_128_44100() * 50
        info = M.probe_mp3(data)
        assert info["sample_rate"] == 44100
        assert info["channels"] == 2
        assert info["n_frames"] == 50
        assert info["duration"] == pytest.approx(50 * 1152 / 44100)
        assert info["bitrate_kbps"] == 128 and info["vbr"] is False

    def test_cbr_v2_mono(self):
        data = _frame_v2_mono_64_16000() * 40
        info = M.probe_mp3(data)
        assert info["sample_rate"] == 16000
        assert info["channels"] == 1
        assert info["n_frames"] == 40
        assert info["duration"] == pytest.approx(40 * 576 / 16000)

    def test_id3v2_tag_skipped(self):
        data = _id3v2(777) + _frame_v1_stereo_128_44100() * 10
        info = M.probe_mp3(data)
        assert info["n_frames"] == 10 and info["data_offset"] == 787

    def test_padding_bit_changes_frame_len(self):
        data = (_frame_v1_stereo_128_44100(pad=1) + _frame_v1_stereo_128_44100()) * 5
        info = M.probe_mp3(data)
        assert info["n_frames"] == 10

    def test_xing_frame_count_fast_path(self):
        # Xing header in frame 1 (after MPEG1-stereo 32-byte side info)
        frame1 = bytearray(_frame_v1_stereo_128_44100())
        frame1[36:40] = b"Xing"
        frame1[40:44] = (0x1).to_bytes(4, "big")  # frames flag
        frame1[44:48] = (1234).to_bytes(4, "big")
        data = bytes(frame1)  # count comes from Xing, not from walking
        info = M.probe_mp3(data)
        assert info["n_frames"] == 1234
        assert info["duration"] == pytest.approx(1234 * 1152 / 44100)

    def test_junk_prefix_resync(self):
        data = b"\x00junkjunk\xff\xee" + _frame_v1_stereo_128_44100() * 8
        assert M.probe_mp3(data)["n_frames"] == 8

    def test_false_sync_in_payload_ignored(self):
        # a lone 0xFF 0xFB inside payload must not fool the locator:
        # candidate frames are validated by parsing their successor
        data = b"\xff\xfb\x90\x00" + b"\x01" * 50 + _frame_v1_stereo_128_44100() * 6
        info = M.probe_mp3(data)
        assert info["n_frames"] >= 6

    def test_no_frames_raises(self):
        with pytest.raises(M.Mp3Error):
            M.probe_mp3(b"definitely not an mp3 stream at all")


class TestSparkProbe:
    def test_with_mp3_info_gates(self, spark):
        good = _frame_v1_stereo_128_44100() * 30
        low_sr = _frame_v2_mono_64_16000() * 30
        bad = b"not audio"
        df = spark.createDataFrame(
            [("a.mp3", good), ("b.mp3", low_sr), ("c.mp3", bad)],
            "path string, content binary",
        )
        out = {r.path: r.info for r in M.with_mp3_info(df).collect()}
        assert out["a.mp3"].sample_rate == 44100
        assert out["b.mp3"].sample_rate == 16000
        assert out["c.mp3"].sample_rate is None
        assert out["c.mp3"].probe_error
        # F8-style gate as a plain Catalyst filter on the struct
        from pyspark.sql import functions as F

        kept = (
            M.with_mp3_info(df)
            .filter(F.col("info.sample_rate") >= 22050)
            .select("path")
            .collect()
        )
        assert [r.path for r in kept] == ["a.mp3"]


class TestCodecSeamCloseout:
    """S11 close-out: the documented decode seam + the probe-driven
    qualification path (F8/G7) on multi-frame mp3 fixtures — the
    supported no-codec route for mp3 corpora (the reference's parts
    are mp3: crawler/download.py:141-145)."""

    def test_decode_audio_raises_documented_seam_error(self):
        import shutil

        from vnavc_spark.pipeline import audio as A

        mp3 = _frame_v1_stereo_128_44100() * 4
        try:
            A.decode_audio(mp3, "mp3")
        except NotImplementedError as e:
            msg = str(e)
            # the error must point at the supported metadata path
            assert "probe_mp3" in msg or "with_mp3_info" in msg
            assert "soundfile" in msg and "ffmpeg" in msg
        except RuntimeError:
            # ffmpeg present but the synthetic frames aren't decodable
            assert shutil.which("ffmpeg") is not None
        else:  # pragma: no cover — only if a codec appears
            import importlib.util

            assert (
                importlib.util.find_spec("soundfile") is not None
                or shutil.which("ffmpeg") is not None
            )

    @staticmethod
    def _install_fake_ffmpeg(tmp_path, monkeypatch, script_body: str):
        import os
        import stat

        exe = tmp_path / "ffmpeg"
        exe.write_text("#!/usr/bin/env python3\n" + script_body)
        exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv(
            "PATH", str(tmp_path) + os.pathsep + os.environ.get("PATH", "")
        )

    def test_ffmpeg_fallback_decodes_real_samples(self, tmp_path, monkeypatch):
        # the ffmpeg CLI seam end-to-end: stdin mp3 → stdout mono
        # PCM16 WAV → native WAV parse. The fake ffmpeg emits a known
        # 16 kHz ramp whose length is derived from the input bytes,
        # so the test proves the input reached the subprocess and the
        # decoded samples came back through the full path.
        import importlib.util

        import numpy as np

        if importlib.util.find_spec("soundfile") is not None:
            import pytest as _pytest

            _pytest.skip("soundfile present: ffmpeg path not reachable")
        from vnavc_spark.pipeline import audio as A

        self._install_fake_ffmpeg(
            tmp_path,
            monkeypatch,
            (
                "import sys, io, wave, struct\n"
                "data = sys.stdin.buffer.read()\n"
                "assert '-f' in sys.argv and 'mp3' in sys.argv\n"
                "n = len(data)\n"
                "buf = io.BytesIO()\n"
                "w = wave.open(buf, 'wb')\n"
                "w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)\n"
                "w.writeframes(struct.pack('<%dh' % n, *range(n)))\n"
                "w.close()\n"
                "sys.stdout.buffer.write(buf.getvalue())\n"
            ),
        )
        mp3 = _frame_v1_stereo_128_44100() * 4
        y, sr = A.decode_audio(mp3, "mp3")
        assert sr == 16000 and len(y) == len(mp3)
        expect = np.arange(len(mp3), dtype=np.float32) / 32768.0
        assert np.allclose(y, expect, atol=1e-4)

    def test_ffmpeg_fallback_failure_surfaces_stderr(self, tmp_path, monkeypatch):
        import importlib.util

        if importlib.util.find_spec("soundfile") is not None:
            import pytest as _pytest

            _pytest.skip("soundfile present: ffmpeg path not reachable")
        import pytest as _pytest

        from vnavc_spark.pipeline import audio as A

        self._install_fake_ffmpeg(
            tmp_path,
            monkeypatch,
            "import sys\nsys.stderr.write('boom: bad stream')\nsys.exit(1)\n",
        )
        with _pytest.raises(RuntimeError, match="boom"):
            A.decode_audio(b"\xff\xfb\x90\x00" * 32, "mp3")

    def test_f8_g7_end_to_end_on_multiframe_mp3_parts(self, spark):
        # two books, mp3 parts of mixed sample rates: G7 takes the
        # min sr over parts, F8 gates at 22.05 kHz — all driven by
        # the native probe, no codec anywhere
        from pyspark.sql import functions as F

        from vnavc_spark.operators.aggregates import min_sample_rate
        from vnavc_spark.operators.filters import sample_rate_gate

        hi = _frame_v1_stereo_128_44100() * 30   # 44100 Hz
        lo = _frame_v2_mono_64_16000() * 30      # 16000 Hz
        df = spark.createDataFrame(
            [
                ("bk1", "bk1_1.mp3", hi),
                ("bk1", "bk1_2.mp3", hi),
                ("bk2", "bk2_1.mp3", hi),
                ("bk2", "bk2_2.mp3", lo),   # one low-rate part sinks bk2
            ],
            "book_id string, path string, content binary",
        )
        probed = M.with_mp3_info(df).select(
            "book_id", "path", F.col("info.sample_rate").alias("sample_rate")
        )
        per_book = min_sample_rate(probed)  # G7
        gated = sample_rate_gate(per_book, sr_col="min_sr", min_sr=22050)  # F8
        rows = {r.book_id: (r.min_sr, r.qualified) for r in gated.collect()}
        assert rows == {"bk1": (44100, True), "bk2": (16000, False)}
