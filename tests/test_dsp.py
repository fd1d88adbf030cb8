"""Spectral DSP kernel tests (A13 + A11): STFT bin accuracy, mel
mapping goldens, filter frequency response, volume-normalize
semantics, and the Spark features stage."""

from __future__ import annotations

import numpy as np
import pytest

from vnavc_spark.pipeline import dsp


def _tone(freq: float, sr: int, secs: float = 1.0, amp: float = 1.0):
    t = np.arange(int(sr * secs)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestStft:
    def test_peak_at_tone_bin(self):
        sr, fft = 16000, 1024
        freq = 10 * sr / fft  # exactly bin 10
        # amp 0.05 keeps the bin power under the reference's 1e3
        # clamp (a full-scale tone saturates bins 9-11 to the cap)
        mag = dsp.stft_magnitude(_tone(freq, sr, amp=0.05), fft, 256)
        assert mag.shape[1] == fft // 2 + 1
        # every interior frame peaks at bin 10
        peaks = mag[2:-2].argmax(axis=1)
        assert (peaks == 10).all()

    def test_frame_count_matches_torch_convention(self):
        # center=True: n_frames = 1 + floor(T / hop)
        sr = 16000
        y = _tone(440, sr)
        mag = dsp.stft_magnitude(y, 1024, 256)
        assert mag.shape[0] == 1 + len(y) // 256

    def test_clamp_bounds(self):
        mag = dsp.stft_magnitude(np.zeros(4096, dtype=np.float32), 1024, 256)
        assert mag.min() >= np.sqrt(1e-7) * 0.999  # silence floor
        loud = dsp.stft_magnitude(100.0 * _tone(440, 16000), 1024, 256)
        assert loud.max() <= np.sqrt(1e3) * 1.001  # nan/inf guard cap


class TestMel:
    def test_hertz_to_mel_golden(self):
        # the reference formula: 2595*log10(1 + f/700)
        assert dsp.hertz_to_mel(0.0) == 0.0
        assert dsp.hertz_to_mel(700.0) == pytest.approx(2595.0 * np.log10(2.0))
        assert dsp.mel_to_hertz(dsp.hertz_to_mel(1234.5)) == pytest.approx(1234.5)

    def test_filterbank_shape_and_coverage(self):
        fb = dsp.mel_filterbank(16000, 1024, n_mels=40)
        assert fb.shape == (40, 513)
        assert (fb >= 0).all()
        # every filter has support; interior bins are covered
        assert (fb.max(axis=1) > 0).all()
        assert (fb.sum(axis=0)[5:-5] > 0).all()

    def test_tone_lands_in_expected_band(self):
        sr, freq = 16000, 2000.0
        mel = dsp.mel_spectrogram(_tone(freq, sr), sr, n_mels=40, log=False)
        band = mel.mean(axis=0).argmax()
        fb = dsp.mel_filterbank(sr, 1024, 40)
        center_bin = fb[band].argmax()
        center_hz = center_bin * sr / 1024
        assert abs(center_hz - freq) < 300  # within one band width


class TestHighpass:
    def test_blocks_dc_passes_high(self):
        sr = 16000
        low = _tone(50, sr)
        high = _tone(4000, sr)
        out_low = dsp.highpass_filter(low, sr, cutoff=300)
        out_high = dsp.highpass_filter(high, sr, cutoff=300)
        # 50 Hz tone attenuated hard (2nd-order: ~31 dB at cutoff/6),
        # 4 kHz passes at ~unity
        assert np.max(np.abs(out_low[sr // 10 :])) < 0.05
        assert np.max(np.abs(out_high[sr // 10 :])) == pytest.approx(1.0, abs=0.05)

    def test_impulse_response_truncation_is_tight(self):
        b, a = dsp.highpass_biquad_coeffs(16000, 300)
        h = dsp._impulse_response(b, a, tol=1e-10, max_len=10**6)
        assert len(h) < 5000  # decays fast; no runaway
        assert abs(h[-1]) < 1e-9


class TestVolumeNormalize:
    def test_quiet_signal_raised(self):
        y = 0.01 * _tone(440, 8000)
        out = dsp.volume_normalize(y)
        # raised to 0.1 peak first; ≤10 samples above 0.01 afterwards
        # is false (a tone has many), so the quantile gain then applies
        assert np.max(np.abs(out)) > 0.09

    def test_loud_signal_lands_near_coeff(self):
        y = 0.9 * _tone(440, 8000)
        out = dsp.volume_normalize(y, coeff=0.2)
        level = np.mean(np.sort(np.abs(out))[int(0.9 * len(out)) :])
        assert 0.1 < level < 0.35

    def test_never_exceeds_one_and_gain_clamped(self):
        y = 0.011 * _tone(440, 8000)  # tiny but >0.01 significants
        out = dsp.volume_normalize(y, coeff=0.2)
        assert np.max(np.abs(out)) <= 1.0
        # gain clamp: ≤10× on top of the 0.1-peak raise
        assert np.max(np.abs(out)) <= 10.5 * 0.1

    def test_sparse_signal_passthrough(self):
        y = np.zeros(1000, dtype=np.float32)
        y[:5] = 0.5  # only 5 significant samples
        out = dsp.volume_normalize(y)
        assert np.array_equal(out, y)


class TestSparkStage:
    def test_spectral_features(self, spark, tmp_path):
        from vnavc_spark.pipeline.audio import encode_wav

        sr = 16000
        for name, freq in (("low", 500.0), ("high", 6000.0)):
            (tmp_path / f"{name}.wav").write_bytes(
                encode_wav(_tone(freq, sr, 0.5), sr)
            )
        df = spark.createDataFrame(
            [(str(tmp_path / "low.wav"),), (str(tmp_path / "high.wav"),)],
            ["path"],
        )
        rows = {r.path.split("/")[-1]: r for r in dsp.spectral_features_stage(df).collect()}
        assert rows["low.wav"].spectral_centroid < rows["high.wav"].spectral_centroid
        assert len(rows["low.wav"].mel_mean) == 16
        assert rows["low.wav"].n_frames > 0
        assert rows["low.wav"].rms == pytest.approx(1 / np.sqrt(2), abs=0.01)


class TestAudioFingerprint:
    def _noise_clip(self, seed, sr=16000, secs=1.0):
        rng = np.random.default_rng(seed)
        # shaped noise: low-pass-ish random walk → structured spectrum
        y = np.cumsum(rng.standard_normal(int(sr * secs))).astype(np.float64)
        return (y / (np.abs(y).max() or 1.0) * 0.5).astype(np.float32)

    def test_gain_invariance(self):
        from vnavc_spark.pipeline.dsp import audio_fingerprint64

        y = self._noise_clip(1)
        assert audio_fingerprint64(y, 16000) == audio_fingerprint64(
            (y * 0.25).astype(np.float32), 16000
        )

    def test_edit_near_distinct_far(self):
        from vnavc_spark.pipeline.dsp import audio_fingerprint64

        def ham(a, b):
            return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

        y = self._noise_clip(1)
        edited = y.copy()
        edited[:800] = 0.0  # clip a 50 ms chunk
        other = self._noise_clip(2)
        fp = audio_fingerprint64(y, 16000)
        assert ham(fp, audio_fingerprint64(edited, 16000)) <= 6
        assert ham(fp, audio_fingerprint64(other, 16000)) > 6

    def test_spark_near_dup_join(self, spark, tmp_path):
        from vnavc_spark.operators.dedup import hamming_near_dups
        from vnavc_spark.pipeline.audio import encode_wav
        from vnavc_spark.pipeline.dsp import audio_fingerprint_stage

        base = self._noise_clip(1)
        edited = base.copy()
        edited[:800] = 0.0
        clips = {"a.wav": base, "b.wav": edited, "c.wav": self._noise_clip(5)}
        for name, y in clips.items():
            (tmp_path / name).write_bytes(encode_wav(y, 16000))
        paths = spark.createDataFrame(
            [(str(tmp_path / n),) for n in clips], "path string"
        )
        fps = audio_fingerprint_stage(paths)
        pairs = hamming_near_dups(fps, "path", "afp", max_hamming=6).collect()
        names = {
            tuple(sorted((r.id_a.split("/")[-1], r.id_b.split("/")[-1])))
            for r in pairs
        }
        assert names == {("a.wav", "b.wav")}
