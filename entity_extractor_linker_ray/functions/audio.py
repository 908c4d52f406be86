"""Byte-accurate mini audio codec: RIFF/WAVE PCM16.

No audio library exists in this environment, so the multimodal audio
stages would otherwise be hash stand-ins. This is a REAL format
implementation — canonical RIFF container (``RIFF`` size ``WAVE``),
``fmt `` chunk (PCM, mono/stereo, 16-bit little-endian) and ``data``
chunk, with a proper CHUNK-WALKING parser (unknown chunks such as
``LIST`` are skipped with RIFF's odd-size padding rule, exactly the
bytes ffmpeg/libsndfile would accept) — enough for an actual audio
format to exercise the decode actor contract end to end, pytest-gated
byte-for-byte.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(
    samples: np.ndarray,
    sample_rate: int = 8000,
    channels: int = 1,
    junk_chunk: bool = False,
) -> bytes:
    """Interleaved int16 samples → RIFF/WAVE PCM16 bytes.

    ``samples`` is the RAW interleaved stream (length = frames ×
    channels). ``junk_chunk`` inserts a ``LIST``/``INFO`` chunk between
    ``fmt `` and ``data`` — real encoders do this, and it forces
    decoders to walk chunks instead of assuming the 44-byte layout."""
    samples = np.ascontiguousarray(samples, dtype="<i2")
    if samples.ndim != 1:
        raise ValueError(f"encode_wav expects a 1-D stream, got {samples.shape}")
    if len(samples) % channels:
        raise ValueError("sample count not divisible by channel count")
    data = samples.tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    extra = b""
    if junk_chunk:
        # LIST size 6: 'INFO' + 2 payload bytes (even — no pad needed)
        extra = struct.pack("<4sI", b"LIST", 6) + b"INFOxy"
    body = fmt + extra + struct.pack("<4sI", b"data", len(data)) + data
    if len(data) % 2:
        body += b"\x00"  # RIFF pads odd-sized chunks
    return struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """payload → (sample_rate, channels, int16 interleaved stream).

    Walks RIFF chunks (odd sizes padded per spec); requires a PCM16
    ``fmt `` chunk before ``data``. Raises ValueError on anything else
    (the capability check)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE payload (magic {payload[:4]!r})")
    riff_size = struct.unpack_from("<I", payload, 4)[0]
    if 8 + riff_size > len(payload):
        raise ValueError("truncated RIFF container")
    pos, end = 12, 8 + riff_size
    rate = channels = bits = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if pos + size > end:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, pos
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: format={audio_fmt} bits={bits}"
                )
        elif cid == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt chunk")
            raw = payload[pos:pos + size]
            if size % 2:
                raise ValueError("PCM16 data chunk has odd byte length")
            stream = np.frombuffer(raw, dtype="<i2").copy()
            if len(stream) % channels:
                raise ValueError("sample count not divisible by channels")
            return rate, channels, stream
        pos += size + (size % 2)  # odd chunks are padded
    raise ValueError("no data chunk found")


def synth_samples(doc_id: int, n: int) -> np.ndarray:
    """Deterministic interleaved PCM16 stream for ``doc_id``: the
    splitmix-flavored LCG ``((doc_id·2654435761 + i·40503) mod 2^16) −
    2^15`` — pure int64 arithmetic a SQL oracle replays with one
    range() expansion."""
    i = np.arange(n, dtype=np.int64)
    v = (np.int64(doc_id) * 2654435761 + i * 40503) % 65536 - 32768
    return v.astype(np.int16)
