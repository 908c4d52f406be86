"""Byte-accurate mini image codec (PPM/PGM/BMP) + the real-format
decode/resize pipeline stages."""

from __future__ import annotations

import numpy as np
import pytest

from entity_extractor_linker_ray.functions.imaging import (
    decode_image,
    encode_bmp,
    encode_pgm,
    encode_ppm,
    resize_nearest,
    synth_image,
)


class TestCodecRoundtrip:
    def test_ppm_roundtrip_exact(self):
        img = synth_image(42, 24, 16)
        w, h, back = decode_image(encode_ppm(img))
        assert (w, h) == (24, 16)
        assert np.array_equal(back, img)

    def test_bmp_roundtrip_exact(self):
        """BMP round-trips exactly despite BGR order, bottom-up rows
        and 4-byte row padding (24px width → no pad; odd width → pad)."""
        for width in (24, 7, 5):
            img = synth_image(7, width, 9)
            w, h, back = decode_image(encode_bmp(img))
            assert (w, h) == (width, 9)
            assert np.array_equal(back, img), width

    def test_pgm_expands_to_gray_rgb(self):
        gray = (np.arange(48, dtype=np.uint8).reshape(6, 8) * 5) % 256
        w, h, back = decode_image(encode_pgm(gray))
        assert (w, h) == (8, 6)
        assert np.array_equal(back[:, :, 0], gray)
        assert np.array_equal(back[:, :, 1], back[:, :, 2])

    def test_pnm_comment_and_whitespace_header(self):
        """Netpbm allows comments and arbitrary whitespace between
        header fields."""
        img = synth_image(3, 4, 2)
        raw = encode_ppm(img)
        raster = raw.split(b"255\n", 1)[1]
        tricky = b"P6\n# a comment\n  4\t2 # trailing\n255\n" + raster
        w, h, back = decode_image(tricky)
        assert (w, h) == (4, 2)
        assert np.array_equal(back, img)

    def test_unsupported_formats_raise(self):
        with pytest.raises(ValueError):
            decode_image(b"GIF89a....")
        with pytest.raises(ValueError):
            decode_image(b"P6\n4 2\n65535\n" + b"\x00" * 48)  # 16-bit maxval
        with pytest.raises(ValueError):
            decode_image(encode_ppm(synth_image(1, 4, 2))[:-5])  # truncated


class TestResize:
    def test_identity_resize(self):
        img = synth_image(3, 8, 8)
        assert np.array_equal(resize_nearest(img, 8, 8), img)

    def test_downsample_picks_pixel_centers(self):
        img = synth_image(11, 24, 16)
        small = resize_nearest(img, 8, 8)
        ys = ((np.arange(8) * 2 + 1) * 16) // 16
        xs = ((np.arange(8) * 2 + 1) * 24) // 16
        assert np.array_equal(small, img[ys][:, xs])
        assert small.shape == (8, 8, 3)

    def test_upsample(self):
        img = synth_image(5, 4, 4)
        big = resize_nearest(img, 8, 8)
        assert big.shape == (8, 8, 3)
        # each source pixel appears as a 2x2 block
        assert np.array_equal(big[0:2, 0:2].reshape(-1, 3),
                              np.tile(img[0, 0], (4, 1)))


class TestPipelineStages:
    def test_decode_stats_matches_direct_compute(self, ray_session):
        from entity_extractor_linker_ray.ops.multimodal import (
            image_decode_stats,
        )

        df = (
            image_decode_stats("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(df) == 500
        assert set(df["format"]) == {"ppm", "bmp"}
        row = df[df.doc_id == 3].iloc[0]  # doc 3 → BMP branch
        img = synth_image(3, 24, 16)
        sums = img.astype(np.int64).sum(axis=(0, 1))
        assert row["format"] == "bmp"
        assert (row["sum_r"], row["sum_g"], row["sum_b"]) == tuple(sums)
        assert row["mean_b"] == sums[2] / (24 * 16)

    def test_resize_stats_matches_direct_compute(self, ray_session):
        from entity_extractor_linker_ray.ops.multimodal import (
            image_resize_stats,
        )

        df = (
            image_resize_stats("/root/testdata/sf0.001")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(df) == 500
        row = df[df.doc_id == 8].iloc[0]
        small = resize_nearest(synth_image(8, 24, 16), 8, 8)
        sums = small.astype(np.int64).sum(axis=(0, 1))
        assert (row["sum_r"], row["sum_g"], row["sum_b"]) == tuple(sums)
        assert row["n_bytes"] == 11 + 8 * 8 * 3
