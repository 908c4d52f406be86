"""REAL audio/video format coverage: the RIFF/WAVE PCM16 codec
(`functions/audio.py`) and the concatenated-PPM video stream parser
(`functions/imaging.decode_ppm_stream`) — byte-level round trips, the
spec behaviors a fixed-offset parser would miss (chunk walking, odd
padding, stereo interleave, multi-frame re-parsing), the reject paths,
and DuckDB value parity for the three driver queries."""

from __future__ import annotations

import struct

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(views: dict[str, str], sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name, path in views.items():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if pd.api.types.is_integer_dtype(df[col]):
            df[col] = df[col].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[col]):
            df[col] = df[col].astype(np.float64).round(9)
        else:
            df[col] = df[col].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


class TestWavCodec:
    def test_round_trip_mono(self):
        from entity_extractor_linker_ray.functions.audio import (
            decode_wav,
            encode_wav,
        )

        s = np.array([0, 1, -1, 32767, -32768, 1234], dtype=np.int16)
        rate, ch, back = decode_wav(encode_wav(s, 8000, 1))
        assert rate == 8000 and ch == 1
        np.testing.assert_array_equal(back, s)

    def test_round_trip_stereo_and_junk_chunk(self):
        """A LIST chunk between fmt and data must be SKIPPED, not
        parsed as data — this is what breaks 44-byte-offset parsers."""
        from entity_extractor_linker_ray.functions.audio import (
            decode_wav,
            encode_wav,
        )

        s = np.arange(-8, 8, dtype=np.int16)  # 8 stereo frames
        payload = encode_wav(s, 16000, 2, junk_chunk=True)
        assert b"LIST" in payload
        rate, ch, back = decode_wav(payload)
        assert rate == 16000 and ch == 2
        np.testing.assert_array_equal(back, s)

    def test_canonical_44_byte_header(self):
        """No junk chunk → the canonical layout: 44 header bytes then
        little-endian PCM16 data (the size AUDIO_DOWNSAMPLE's oracle
        pins)."""
        from entity_extractor_linker_ray.functions.audio import encode_wav

        s = np.array([5, -5], dtype=np.int16)
        payload = encode_wav(s, 8000, 1)
        assert len(payload) == 44 + 4
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        assert payload[44:] == struct.pack("<2h", 5, -5)

    def test_odd_chunk_padding_walked(self):
        """RIFF pads odd-sized chunks to even: hand-build a WAV with an
        odd 3-byte junk chunk + pad byte before data and decode it."""
        from entity_extractor_linker_ray.functions.audio import decode_wav

        fmt = struct.pack("<4sI" + "HHIIHH", b"fmt ", 16, 1, 1, 8000,
                          16000, 2, 16)
        junk = struct.pack("<4sI", b"junk", 3) + b"abc" + b"\x00"  # pad
        data = struct.pack("<4sI", b"data", 4) + struct.pack("<2h", 7, -7)
        body = fmt + junk + data
        payload = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
        rate, ch, s = decode_wav(payload)
        assert rate == 8000 and ch == 1 and list(s) == [7, -7]

    def test_rejects(self):
        from entity_extractor_linker_ray.functions.audio import (
            decode_wav,
            encode_wav,
        )

        good = encode_wav(np.array([1, 2], dtype=np.int16), 8000, 1)
        with pytest.raises(ValueError):
            decode_wav(b"OggS" + good[4:])          # wrong magic
        with pytest.raises(ValueError):
            decode_wav(good[:20])                    # truncated container
        bad_fmt = bytearray(good)
        bad_fmt[20] = 3                              # IEEE float format
        with pytest.raises(ValueError):
            decode_wav(bytes(bad_fmt))

    def test_synth_matches_sql_formula(self):
        from entity_extractor_linker_ray.functions.audio import synth_samples

        got = synth_samples(11, 5).astype(np.int64)
        exp = [((11 * 2654435761 + i * 40503) % 65536) - 32768
               for i in range(5)]
        assert list(got) == exp


class TestPpmStream:
    def test_multi_frame_round_trip(self):
        from entity_extractor_linker_ray.functions.imaging import (
            decode_ppm_stream,
            encode_ppm,
            synth_image,
        )

        frames = [synth_image(3 + 7 * f, 8, 6) for f in range(4)]
        stream = b"".join(encode_ppm(f) for f in frames)
        out = decode_ppm_stream(stream)
        assert len(out) == 4
        for (w, h, px), orig in zip(out, frames):
            assert (w, h) == (8, 6)
            np.testing.assert_array_equal(px, orig)

    def test_rejects_trailing_garbage_and_truncation(self):
        from entity_extractor_linker_ray.functions.imaging import (
            decode_ppm_stream,
            encode_ppm,
            synth_image,
        )

        stream = encode_ppm(synth_image(1, 8, 6))
        with pytest.raises(ValueError):
            decode_ppm_stream(stream + b"GARBAGE")
        with pytest.raises(ValueError):
            decode_ppm_stream(stream[:-5])


class TestDriverParity:
    def test_audio_decode_stats(self, ray_session):
        from entity_extractor_linker_ray.ops.multimodal import (
            AUDIO_DECODE_STATS_ORACLE,
            audio_decode_stats,
        )

        got = _canon(audio_decode_stats(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             AUDIO_DECODE_STATS_ORACLE))
        assert len(got) > 0
        # both mono and stereo clips present
        assert set(got["n_channels"].unique()) == {1, 2}
        pd.testing.assert_frame_equal(got, exp)

    def test_audio_downsample_stats(self, ray_session):
        from entity_extractor_linker_ray.ops.multimodal import (
            AUDIO_DOWNSAMPLE_STATS_ORACLE,
            audio_downsample_stats,
        )

        got = _canon(audio_downsample_stats(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             AUDIO_DOWNSAMPLE_STATS_ORACLE))
        pd.testing.assert_frame_equal(got, exp)

    def test_video_frame_stats(self, ray_session):
        from entity_extractor_linker_ray.ops.multimodal import (
            VIDEO_FRAME_STATS_ORACLE,
            video_frame_stats,
        )

        got = _canon(video_frame_stats(SF).to_pandas())
        exp = _canon(_oracle({"documents": f"{SF}/documents.parquet"},
                             VIDEO_FRAME_STATS_ORACLE))
        assert len(got) > 0
        # only even frames sampled
        assert (got["frame_idx"] % 2 == 0).all()
        pd.testing.assert_frame_equal(got, exp)
