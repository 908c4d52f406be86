"""Byte-accurate mini image codec: PPM (P6) / PGM (P5) / 24-bit BMP.

No image library exists in this environment, so the multimodal decode
actors used deterministic stand-ins. These are REAL format
implementations — binary PPM/PGM per the Netpbm spec (ASCII header with
whitespace/comment handling, maxval 255, raw raster) and uncompressed
24-bit BI_RGB BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows,
BGR byte order, rows padded to 4 bytes) — enough for an actual image
format to exercise the actor contract end to end (decode → pixels →
features/resize → re-encode), pytest-gated byte-for-byte.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_ppm(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 → binary PPM (P6, maxval 255)."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"encode_ppm expects HxWx3, got {pixels.shape}")
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + pixels.tobytes()


def encode_pgm(pixels: np.ndarray) -> bytes:
    """HxW uint8 → binary PGM (P5, maxval 255)."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim != 2:
        raise ValueError(f"encode_pgm expects HxW, got {pixels.shape}")
    h, w = pixels.shape
    return f"P5\n{w} {h}\n255\n".encode("ascii") + pixels.tobytes()


def encode_bmp(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 (RGB) → uncompressed 24-bit BMP (bottom-up, BGR,
    4-byte row padding)."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"encode_bmp expects HxWx3, got {pixels.shape}")
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    raster = bytearray()
    bgr = pixels[:, :, ::-1]  # RGB → BGR
    for row in range(h - 1, -1, -1):  # bottom-up
        raster += bgr[row].tobytes() + b"\x00" * pad
    data_size = len(raster)
    file_size = 14 + 40 + data_size
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                       2835, 2835, 0, 0)
    return header + info + bytes(raster)


def _pnm_header(payload: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse a PNM header (magic, width, height, maxval, data offset)
    with Netpbm whitespace + ``#`` comment handling."""
    magic = payload[:2]
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and comments
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval per spec
    w, h, maxval = fields
    return magic, w, h, maxval, pos


def decode_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    """payload → (width, height, HxWx3 uint8 RGB). Supports P6 PPM,
    P5 PGM (expanded to gray RGB), and 24-bit BI_RGB BMP. Raises
    ValueError for anything else (the capability check)."""
    if payload[:2] in (b"P6", b"P5"):
        magic, w, h, maxval, off = _pnm_header(payload)
        if maxval != 255:
            raise ValueError(f"unsupported PNM maxval {maxval}")
        channels = 3 if magic == b"P6" else 1
        need = w * h * channels
        raster = payload[off:off + need]
        if len(raster) != need:
            raise ValueError(
                f"truncated PNM raster: need {need}, have {len(raster)}"
            )
        arr = np.frombuffer(raster, dtype=np.uint8)
        if channels == 3:
            return w, h, arr.reshape(h, w, 3).copy()
        gray = arr.reshape(h, w)
        return w, h, np.repeat(gray[:, :, None], 3, axis=2)
    if payload[:2] == b"BM":
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        data_off = struct.unpack_from("<I", payload, 10)[0]
        header_size, w, h = struct.unpack_from("<Iii", payload, 14)
        planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
        if bpp != 24 or compression != 0:
            raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
        bottom_up = h > 0
        h = abs(h)
        row_bytes = w * 3
        stride = row_bytes + ((-row_bytes) % 4)
        need = stride * h
        raster = payload[data_off:data_off + need]
        if len(raster) != need:
            raise ValueError(
                f"truncated BMP raster: need {need}, have {len(raster)}"
            )
        rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
        bgr = rows[:, :row_bytes].reshape(h, w, 3)
        if bottom_up:
            bgr = bgr[::-1]
        return w, h, bgr[:, :, ::-1].copy()  # BGR → RGB
    raise ValueError(f"unsupported image format (magic {payload[:2]!r})")


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample (pixel-center convention), HxWx3 →
    out_h x out_w x 3. Pure integer index math — deterministic."""
    h, w = pixels.shape[:2]
    ys = ((np.arange(out_h) * 2 + 1) * h) // (2 * out_h)
    xs = ((np.arange(out_w) * 2 + 1) * w) // (2 * out_w)
    return pixels[ys][:, xs]


def decode_ppm_stream(payload: bytes) -> list[tuple[int, int, np.ndarray]]:
    """Concatenated binary PPM frames → list of (w, h, HxWx3 RGB).

    Back-to-back P6 images are a real video interchange format (what
    ``ffmpeg -f image2pipe -vcodec ppm`` reads/writes); the parser
    loops the single-image decoder over the stream, re-parsing each
    header, and rejects trailing garbage."""
    frames: list[tuple[int, int, np.ndarray]] = []
    pos = 0
    while pos < len(payload):
        chunk = payload[pos:]
        if chunk[:2] != b"P6":
            raise ValueError(
                f"PPM stream: expected P6 at offset {pos}, got {chunk[:2]!r}"
            )
        magic, w, h, maxval, off = _pnm_header(chunk)
        if maxval != 255:
            raise ValueError(f"unsupported PNM maxval {maxval}")
        need = w * h * 3
        raster = chunk[off:off + need]
        if len(raster) != need:
            raise ValueError(
                f"truncated frame at offset {pos}: need {need}, have {len(raster)}"
            )
        frames.append(
            (w, h, np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).copy())
        )
        pos += off + need
    return frames


def synth_image(doc_id: int, width: int = 24, height: int = 16) -> np.ndarray:
    """Deterministic RGB test image for ``doc_id``: gradient base +
    id-mixed stripes (pure integer function — same bytes everywhere)."""
    y = np.arange(height, dtype=np.int64)[:, None]
    x = np.arange(width, dtype=np.int64)[None, :]
    r = (x * 255) // max(width - 1, 1)
    g = (y * 255) // max(height - 1, 1)
    b = ((x + y + doc_id) * 37) % 256
    img = np.stack(
        [np.broadcast_to(r, (height, width)),
         np.broadcast_to(g, (height, width)),
         b],
        axis=2,
    )
    return img.astype(np.uint8)


# ---------------------------------------------------------------------
# PNG (RFC 2083) — stdlib-only encoder/decoder, 8-bit RGB truecolor.
# zlib IS in the stdlib, so a real raster sink needs no matplotlib:
# IHDR/IDAT/IEND chunks with CRC-32, filter type 0 per scanline on
# encode; the decoder reverses filters 0-4 (Sub/Up/Average/Paeth) so
# it reads any baseline non-interlaced RGB PNG, not just ours.
# ---------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import zlib as _z

    crc = _z.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → PNG (8-bit truecolor, filter 0, one IDAT)."""
    import zlib as _z

    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"encode_png expects HxWx3, got {pixels.shape}")
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    # filter byte 0 prepended per scanline
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", _z.compress(raw, 9))
            + _png_chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline non-interlaced 8-bit RGB PNG → (w, h, HxWx3 uint8).
    Verifies the signature and every chunk CRC; reverses scanline
    filters 0-4."""
    import zlib as _z

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        chunk = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if _z.crc32(tag + chunk) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r}: CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", chunk)
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "decode_png supports 8-bit truecolor non-interlaced "
                    f"only, got depth={depth} color={color} "
                    f"interlace={interlace}")
        elif tag == b"IDAT":
            idat += chunk
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = _z.decompress(bytes(idat))
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for i in range(3, stride):
                cur[i] = (cur[i] + cur[i - 3]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - 3] if i >= 3 else 0
                cur[i] = (cur[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                left = cur[i - 3] if i >= 3 else 0
                ul = prev[i - 3] if i >= 3 else 0
                cur[i] = (cur[i] + _paeth(int(left), int(prev[i]), int(ul))) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return w, h, out.reshape(h, w, 3)


def draw_line(pixels: np.ndarray, x1: int, y1: int, x2: int, y2: int,
              color: tuple[int, int, int]) -> None:
    """Bresenham line into an HxWx3 uint8 raster (in place)."""
    h, w, _ = pixels.shape
    dx, dy = abs(x2 - x1), -abs(y2 - y1)
    sx = 1 if x1 < x2 else -1
    sy = 1 if y1 < y2 else -1
    err = dx + dy
    x, y = x1, y1
    while True:
        if 0 <= x < w and 0 <= y < h:
            pixels[y, x] = color
        if x == x2 and y == y2:
            break
        e2 = 2 * err
        if e2 >= dy:
            err += dy
            x += sx
        if e2 <= dx:
            err += dx
            y += sy


def draw_disc(pixels: np.ndarray, cx: int, cy: int, r: int,
              color: tuple[int, int, int]) -> None:
    """Filled circle into an HxWx3 uint8 raster (in place)."""
    h, w, _ = pixels.shape
    y0, y1 = max(0, cy - r), min(h, cy + r + 1)
    x0, x1 = max(0, cx - r), min(w, cx + r + 1)
    yy, xx = np.mgrid[y0:y1, x0:x1]
    mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    pixels[y0:y1, x0:x1][mask] = color
