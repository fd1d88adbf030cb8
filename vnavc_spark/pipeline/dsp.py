"""Spectral DSP helpers (SURVEY.md A13 + A11): magnitude STFT, mel
scale / filterbank / mel spectrogram, highpass biquad, and
quantile-based volume normalization — numpy-only, deterministic.

Re-expresses the reference's model-side audio utilities
(``finetune/spark_tts/sparktts/utils/audio.py``): ``stft`` (:152,
torch.stft magnitude with clamp [1e-7, 1e3]), ``hertz_to_mel`` (:258,
the 2595·log10(1+f/700) formula), ``audio_highpass_filter`` (:137,
torchaudio's RBJ biquad), ``audio_volume_normalize`` (:33). No torch
in this container — the math is the same, the engine is numpy:

- STFT mirrors torch.stft defaults: center=True with reflect padding,
  Hann window zero-padded to fft_size, one-sided rfft.
- The biquad is applied by convolving with its impulse response,
  truncated when the tail decays below ``tol`` — a biquad's IIR
  recursion cannot be vectorized directly, but its response decays
  geometrically, so a tolerance-truncated FIR convolution is exact to
  ``tol`` and stays BLAS/FFT-vectorized (no per-sample Python loop in
  the hot path).

These are PER-FILE kernels: on Spark they run inside the existing
Arrow islands (``mapInPandas`` over audio paths/bytes), embarrassingly
parallel across files — see ``spectral_features_stage``.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# STFT (A13)
# ---------------------------------------------------------------------------

def stft_magnitude(
    y: np.ndarray,
    fft_size: int = 1024,
    hop_size: int = 256,
    win_length: int | None = None,
    clamp_min: float = 1e-7,
    clamp_max: float = 1e3,
) -> np.ndarray:
    """Magnitude spectrogram (#frames, fft_size//2+1), mirroring the
    reference's torch.stft call: centered reflect padding, Hann
    window, power clamped to [1e-7, 1e3] before the sqrt (the
    reference's nan/inf guard)."""
    win_length = win_length or fft_size
    y = np.asarray(y, dtype=np.float64)
    pad = fft_size // 2
    if len(y) == 0:
        return np.zeros((0, fft_size // 2 + 1), dtype=np.float32)
    ypad = np.pad(y, pad, mode="reflect" if len(y) > 1 else "constant")
    window = np.hanning(win_length + 1)[:-1]  # periodic Hann
    if win_length < fft_size:  # torch zero-pads the window to fft_size
        lpad = (fft_size - win_length) // 2
        window = np.pad(window, (lpad, fft_size - win_length - lpad))
    n_frames = 1 + (len(ypad) - fft_size) // hop_size
    idx = np.arange(fft_size)[None, :] + hop_size * np.arange(n_frames)[:, None]
    frames = ypad[idx] * window[None, :]
    spec = np.fft.rfft(frames, n=fft_size, axis=1)
    power = np.clip(spec.real**2 + spec.imag**2, clamp_min, clamp_max)
    return np.sqrt(power).astype(np.float32)


# ---------------------------------------------------------------------------
# mel scale + filterbank (A13)
# ---------------------------------------------------------------------------

def hertz_to_mel(f):
    """The reference's mel formula (``audio.py:258-271``):
    2595·log10(1 + f/700)."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hertz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    sr: int,
    fft_size: int = 1024,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """(n_mels, fft_size//2+1) triangular filterbank on the mel scale
    — standard construction over mel-spaced breakpoints using the
    reference's hertz↔mel mapping."""
    fmax = fmax or sr / 2.0
    n_bins = fft_size // 2 + 1
    freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(hertz_to_mel(fmin), hertz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hertz(mel_pts)
    lower, center, upper = hz_pts[:-2], hz_pts[1:-1], hz_pts[2:]
    up = (freqs[None, :] - lower[:, None]) / np.maximum(
        center[:, None] - lower[:, None], 1e-10
    )
    down = (upper[:, None] - freqs[None, :]) / np.maximum(
        upper[:, None] - center[:, None], 1e-10
    )
    return np.maximum(0.0, np.minimum(up, down)).astype(np.float32)


def mel_spectrogram(
    y: np.ndarray,
    sr: int,
    fft_size: int = 1024,
    hop_size: int = 256,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = None,
    log: bool = True,
) -> np.ndarray:
    """(#frames, n_mels) mel(-log) spectrogram: magnitude STFT →
    filterbank matmul → optional log with the same 1e-7 floor."""
    mag = stft_magnitude(y, fft_size, hop_size)
    fb = mel_filterbank(sr, fft_size, n_mels, fmin, fmax)
    mel = mag @ fb.T
    if log:
        mel = np.log(np.maximum(mel, 1e-7))
    return mel.astype(np.float32)


# ---------------------------------------------------------------------------
# highpass biquad (reference audio_highpass_filter)
# ---------------------------------------------------------------------------

def highpass_biquad_coeffs(
    sr: int, cutoff: float, q: float = 0.7071067811865476
) -> tuple[np.ndarray, np.ndarray]:
    """RBJ audio-EQ-cookbook highpass coefficients (b, a) — the same
    filter torchaudio.functional.highpass_biquad computes."""
    w0 = 2.0 * np.pi * cutoff / sr
    alpha = np.sin(w0) / (2.0 * q)
    cosw = np.cos(w0)
    b = np.array([(1 + cosw) / 2.0, -(1 + cosw), (1 + cosw) / 2.0])
    a = np.array([1 + alpha, -2.0 * cosw, 1 - alpha])
    return b / a[0], a / a[0]


def _impulse_response(b: np.ndarray, a: np.ndarray, tol: float, max_len: int) -> np.ndarray:
    h = np.zeros(max_len)
    x1 = x2 = y1 = y2 = 0.0
    for n in range(max_len):
        x0 = 1.0 if n == 0 else 0.0
        y0 = b[0] * x0 + b[1] * x1 + b[2] * x2 - a[1] * y1 - a[2] * y2
        h[n] = y0
        x2, x1 = x1, x0
        y2, y1 = y1, y0
        if n > 8 and abs(y0) < tol and abs(y1) < tol:
            return h[: n + 1]
    return h


def highpass_filter(
    y: np.ndarray, sr: int, cutoff: float, q: float = 0.7071067811865476,
    tol: float = 1e-10,
) -> np.ndarray:
    """Highpass the signal (reference ``audio_highpass_filter``).
    Applied as FFT convolution with the tolerance-truncated impulse
    response — exact to ``tol``, vectorized, no per-sample loop over
    the signal (only over the short impulse response)."""
    if len(y) == 0:
        return np.asarray(y, dtype=np.float32)
    b, a = highpass_biquad_coeffs(sr, cutoff, q)
    h = _impulse_response(b, a, tol, max_len=max(64, 16 * int(sr / max(cutoff, 1.0))))
    n = len(y) + len(h) - 1
    nfft = 1 << (n - 1).bit_length()
    out = np.fft.irfft(
        np.fft.rfft(np.asarray(y, dtype=np.float64), nfft) * np.fft.rfft(h, nfft),
        nfft,
    )[: len(y)]
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# volume normalization (A11, reference audio_volume_normalize)
# ---------------------------------------------------------------------------

def volume_normalize(y: np.ndarray, coeff: float = 0.2) -> np.ndarray:
    """Perceptual volume normalization with the reference's exact
    semantics (``audio.py:33-73``): quiet signals are first raised to
    a 0.1 peak; the working level is the mean of the 90th–99th
    percentile band of significant (>0.01) magnitudes; the gain
    toward ``coeff`` is clamped to [0.1, 10]; output never exceeds
    |1|. Signals with ≤10 significant samples pass through after the
    quiet-raise step."""
    y = np.asarray(y, dtype=np.float32)
    if len(y) == 0:
        return y
    mags = np.sort(np.abs(y))
    peak = float(mags[-1])
    if peak < 0.1:
        y = y / max(peak, 1e-3) * 0.1
    loud = mags[mags > 0.01]
    if loud.shape[0] <= 10:
        return y
    level = float(np.mean(loud[int(0.9 * len(loud)) : int(0.99 * len(loud))]))
    y = y * np.clip(coeff / level, 0.1, 10.0)
    peak_out = float(np.max(np.abs(y)))
    if peak_out > 1.0:
        y = y / peak_out
    return y.astype(np.float32)


# ---------------------------------------------------------------------------
# Spark stage
# ---------------------------------------------------------------------------

#: output schema of the spectral-features stage
SPECTRAL_SCHEMA = (
    "path string, n_frames long, spectral_centroid double, "
    "mel_mean array<float>, rms double"
)


def spectral_features_stage(
    df,
    path_col: str = "path",
    sr_hint: int = 24000,
    fft_size: int = 1024,
    hop_size: int = 256,
    n_mels: int = 16,
):
    """Per-file spectral features over a path column (WAV files):
    frame count, spectral centroid (Hz), per-band mel-energy means,
    RMS. One Arrow pass; path-not-payload so only features shuffle."""
    import pandas as pd

    from vnavc_spark.pipeline.audio import decode_wav

    def _features(batches):
        for pdf in batches:
            rows = []
            for p in pdf[path_col]:
                with open(p, "rb") as fh:
                    y, sr = decode_wav(fh.read())
                mag = stft_magnitude(y, fft_size, hop_size)
                fb = mel_filterbank(sr, fft_size, n_mels)
                mel = mag @ fb.T
                freqs = np.linspace(0.0, sr / 2.0, mag.shape[1])
                total = float(mag.sum()) or 1.0
                rows.append(
                    {
                        "path": p,
                        "n_frames": mag.shape[0],
                        "spectral_centroid": float((mag * freqs[None, :]).sum() / total),
                        "mel_mean": mel.mean(axis=0).astype(np.float32),
                        "rms": float(np.sqrt(np.mean(y**2))) if len(y) else 0.0,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(path_col).mapInPandas(_features, schema=SPECTRAL_SCHEMA)


# ---------------------------------------------------------------------------
# audio fingerprint (near-dup across recordings)
# ---------------------------------------------------------------------------

def audio_fingerprint64(y: np.ndarray, sr: int, n_bands: int = 65) -> int:
    """64-bit spectral-shape fingerprint: mean mel-band energies over
    the whole clip, bit i = energy[i] > energy[i+1] (Haitsma-Kalker's
    band-difference sign, collapsed over time). GAIN-INVARIANT (a
    volume change scales every band equally, preserving each
    comparison) and robust to short edits (means move little); clips
    with different spectral content land far in Hamming space. The
    audio analog of ``multimodal.phash64`` — pair with
    ``dedup.hamming_near_dups``. Returned as signed int64."""
    if len(y) == 0:
        return 0
    mag = stft_magnitude(y)
    fb = mel_filterbank(sr, 1024, n_bands)
    band_mean = (mag @ fb.T).mean(axis=0)
    val = np.uint64(0)
    for i in range(n_bands - 1):
        if band_mean[i] > band_mean[i + 1]:
            val |= np.uint64(1) << np.uint64(i)
    return int(val.astype(np.int64))


FINGERPRINT_SCHEMA = "path string, afp long"


def audio_fingerprint_stage(df, path_col: str = "path"):
    """Per-file 64-bit audio fingerprint (path-not-payload: only the
    8-byte hash shuffles; near-dup pairing is the Manku block join)."""
    import pandas as pd

    from vnavc_spark.pipeline.audio import decode_wav

    def _fp(batches):
        for pdf in batches:
            rows = []
            for p in pdf[path_col]:
                with open(p, "rb") as fh:
                    y, sr = decode_wav(fh.read())
                rows.append({"path": p, "afp": audio_fingerprint64(y, sr)})
            yield pd.DataFrame(rows, columns=["path", "afp"])

    return df.select(path_col).mapInPandas(_fp, schema=FINGERPRINT_SCHEMA)
