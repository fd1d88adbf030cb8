"""Pure-Python PNG codec tests: roundtrip, every filter type, palette,
and the multimodal Spark path decoding real PNGs in-container."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from vnavc_spark.pipeline import png as P


def _rand_img(h, w, c, seed=0):
    rng = np.random.RandomState(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    return rng.randint(0, 256, size=shape, dtype=np.uint8)


class TestRoundtrip:
    @pytest.mark.parametrize("c", [1, 3, 4])
    def test_encode_decode_identity(self, c):
        img = _rand_img(13, 17, c, seed=c)
        out = P.decode_png(P.encode_png(img))
        assert out.shape == img.shape
        assert np.array_equal(out, img)

    def test_1x1_and_wide(self):
        for shape in ((1, 1, 3), (1, 200, 3), (200, 1, 3)):
            img = _rand_img(*shape[:2], shape[2], seed=7)
            assert np.array_equal(P.decode_png(P.encode_png(img)), img)


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Encode RGB image applying the given per-row filter types —
    exercises the decoder's reconstruction of SUB/UP/AVG/PAETH."""
    h, w, c = img.shape
    x = img.astype(np.int64)
    raw = bytearray()
    prev = np.zeros((w, c), dtype=np.int64)
    for r in range(h):
        f = filters[r % len(filters)]
        row = x[r]
        if f == 0:
            filt = row
        elif f == 1:  # Sub
            left = np.vstack([np.zeros((1, c), dtype=np.int64), row[:-1]])
            filt = (row - left) & 0xFF
        elif f == 2:  # Up
            filt = (row - prev) & 0xFF
        elif f == 3:  # Average
            left = np.vstack([np.zeros((1, c), dtype=np.int64), row[:-1]])
            filt = (row - (left + prev) // 2) & 0xFF
        else:  # Paeth
            filt = np.zeros_like(row)
            for i in range(w):
                for ch in range(c):
                    a = int(row[i - 1, ch]) if i else 0
                    b = int(prev[i, ch])
                    cc = int(prev[i - 1, ch]) if i else 0
                    filt[i, ch] = (row[i, ch] - P._paeth(a, b, cc)) & 0xFF
        raw.append(f)
        raw += filt.astype(np.uint8).tobytes()
        prev = row

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        P._SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


class TestFilters:
    @pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
    def test_all_filter_types_reconstruct(self, filters):
        img = _rand_img(10, 9, 3, seed=42)
        assert np.array_equal(P.decode_png(_png_with_filters(img, filters)), img)


class TestPalette:
    def test_plte_lookup(self):
        pal = _rand_img(1, 5, 3, seed=9).reshape(5, 3)
        idx = np.array([[0, 1, 2], [4, 3, 0]], dtype=np.uint8)

        def chunk(t, b):
            return struct.pack(">I", len(b)) + t + b + struct.pack(
                ">I", zlib.crc32(t + b) & 0xFFFFFFFF
            )

        raw = b"".join(b"\x00" + idx[r].tobytes() for r in range(2))
        data = (
            P._SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", pal.tobytes())
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        out = P.decode_png(data)
        assert out.shape == (2, 3, 3)
        assert np.array_equal(out, pal[idx])


class TestErrors:
    def test_not_png(self):
        with pytest.raises(P.PngError):
            P.decode_png(b"JFIF not a png")

    def test_unsupported_depth(self):
        def chunk(t, b):
            return struct.pack(">I", len(b)) + t + b + struct.pack(
                ">I", zlib.crc32(t + b) & 0xFFFFFFFF
            )

        data = P._SIG + chunk(
            b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
        )
        with pytest.raises(P.PngError):
            P.decode_png(data)


class TestSparkPath:
    def test_image_features_and_resize_on_real_pngs(self, spark, tmp_path):
        from vnavc_spark.pipeline import multimodal as MM

        for i in range(3):
            img = _rand_img(20 + i, 30 + i, 3, seed=i)
            (tmp_path / f"img{i}.png").write_bytes(P.encode_png(img))
        blobs = MM.scan_blobs(spark, str(tmp_path), "*.png", "image")
        feats = {r.path.split("/")[-1]: r for r in MM.image_features(blobs).collect()}
        assert feats["img0.png"].width == 30 and feats["img0.png"].height == 20
        assert feats["img2.png"].n_channels == 3
        resized = MM.resize_images(blobs, 8, 8).collect()
        assert all(len(r.content) == 8 * 8 * 3 for r in resized)


class TestBilinearResize:
    def test_constant_image_invariant(self):
        from vnavc_spark.pipeline import multimodal as MM

        img = np.full((10, 14, 3), 137, dtype=np.uint8)
        out = MM.resize_bilinear(img, 7, 5)
        assert out.shape == (5, 7, 3)
        assert (out == 137).all()  # interpolation preserves constants

    def test_gradient_smoother_than_nearest(self):
        from vnavc_spark.pipeline import multimodal as MM

        # horizontal ramp: bilinear upsample must be monotone and
        # strictly smoother (smaller max step) than nearest
        ramp = np.tile(np.arange(0, 256, 16, dtype=np.uint8), (4, 1))
        big_b = MM.resize_bilinear(ramp, 64, 4).astype(int)
        big_n = MM.resize_nearest(ramp, 64, 4).astype(int)
        step_b = np.abs(np.diff(big_b[0])).max()
        step_n = np.abs(np.diff(big_n[0])).max()
        assert step_b < step_n
        assert (np.diff(big_b[0]) >= 0).all()


def _natural_img(seed: int, h: int = 48, w: int = 48) -> np.ndarray:
    """Natural-image-like fixture: low-frequency random field (8×8
    noise upsampled) — a decaying DCT spectrum, the regime pHash is
    designed for. (Pure sinusoids are degenerate: most coefficients
    sit AT the median and bits become numerical noise.)"""
    from vnavc_spark.pipeline import multimodal as MM

    rng = np.random.default_rng(seed)
    small = rng.integers(0, 256, (8, 8)).astype(np.uint8)
    return MM.resize_bilinear(small, w, h)[..., None].repeat(3, axis=2)


class TestPhash:
    def test_identical_images_hash_equal(self):
        from vnavc_spark.pipeline import multimodal as MM

        img = _natural_img(1)
        assert MM.phash64(img) == MM.phash64(img.copy())

    def test_resize_invariance(self):
        from vnavc_spark.pipeline import multimodal as MM

        img = _natural_img(3, 64, 64)
        big = MM.resize_bilinear(img, 128, 128)
        h1, h2 = MM.phash64(img), MM.phash64(big)
        assert bin((h1 ^ h2) & 0xFFFFFFFFFFFFFFFF).count("1") <= 6

    def test_small_edit_near_distinct_content_far(self):
        from vnavc_spark.pipeline import multimodal as MM

        base = _natural_img(1)
        edited = base.copy()
        edited[:4, :4] = 255  # small local edit
        other = _natural_img(2)
        d_edit = bin(((MM.phash64(base) ^ MM.phash64(edited)) & 0xFFFFFFFFFFFFFFFF)).count("1")
        d_other = bin(((MM.phash64(base) ^ MM.phash64(other)) & 0xFFFFFFFFFFFFFFFF)).count("1")
        assert d_edit <= 6 < d_other

    def test_spark_phash_near_dup_join(self, spark, tmp_path):
        from vnavc_spark.operators.dedup import hamming_near_dups
        from vnavc_spark.pipeline import multimodal as MM

        base = _natural_img(1, 40, 40)
        edited = base.copy()
        edited[:3, :3] = 0
        other = _natural_img(2, 40, 40)
        for name, img in [("a.png", base), ("b.png", edited), ("c.png", other)]:
            (tmp_path / name).write_bytes(P.encode_png(img))
        blobs = MM.scan_blobs(spark, str(tmp_path), "*.png", "image")
        hashed = MM.image_phash(blobs)
        pairs = hamming_near_dups(
            hashed, id_col="path", hash_col="phash", max_hamming=6
        ).collect()
        names = {
            tuple(sorted((r.id_a.split("/")[-1], r.id_b.split("/")[-1])))
            for r in pairs
        }
        assert names == {("a.png", "b.png")}

    def test_hamming_near_dups_sign_bit(self, spark):
        # hashes differing only in bit 63 (negative longs) must pair
        from vnavc_spark.operators.dedup import hamming_near_dups

        a = -(2**63)        # bit 63 only
        b = -(2**63) + 1    # bits 63 and 0... differs in bit 0
        df = spark.createDataFrame([(1, a), (2, b), (3, 12345)], "id long, h long")
        pairs = hamming_near_dups(df, "id", "h", max_hamming=2).collect()
        got = {(r.id_a, r.id_b, r.hamming) for r in pairs}
        assert (1, 2, 1) in got and all(3 not in (x, y) for x, y, _ in got)
