"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata through actor-pool stages.

The image/audio codec libraries are not available in this environment,
so the *decode kernels* are deterministic stand-ins (clearly marked),
while the Ray-side plumbing — binary Arrow columns, small batch sizes
for large payloads, actor signatures, output schema — is real and
tested. Swap :class:`StubImageDecoder.decode` for a PIL/ffmpeg call and
nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def attach_payload(sf_dir: str):
    """Manufacture a binary payload column from the documents table
    (deterministic; stands in for read_binary_files of a media corpus).
    Output: (doc_id, payload: binary, media_type, n_bytes)."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.readers import read_split

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def kernel(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        payloads = [(t or "").encode("utf-8") for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array(
                    ["image/synthetic"] * len(doc_ids), pa.string()
                ),
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            }
        )

    # binary columns stay in Arrow end to end; small batch_size bounds
    # (payload bytes x batch x concurrency) in worker heaps
    return docs.map_batches(kernel, batch_format="pyarrow", batch_size=256)


class StubImageDecoder:
    """Actor-pool 'decode + feature extract' stage.

    STUB: the decode is a deterministic hash-derived feature vector,
    NOT a real image decode (no codec libs in this environment). The
    actor shape (model handle in ``__init__``, batched decode in
    ``__call__``, feature vector output schema) is the real contract.
    """

    FEATURE_DIM = 16

    def __init__(self):
        self.model = "stub-decoder-v1"  # a real impl loads its model here

    def decode(self, payload: bytes) -> np.ndarray:
        digest = hashlib.sha256(payload).digest()
        raw = np.frombuffer(digest[: self.FEATURE_DIM], dtype=np.uint8)
        return (raw.astype(np.float32) / 255.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = [self.decode(p or b"") for p in payloads]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "media_type": batch.column("media_type"),
                "sha256": pa.array(
                    [hashlib.sha256(p or b"").hexdigest() for p in payloads],
                    pa.string(),
                ),
                "n_bytes": pa.array([len(p or b"") for p in payloads], pa.int64()),
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


def decode_features(sf_dir: str):
    """payload → (sha256, n_bytes, feature vector) via the decoder
    actor pool."""
    return attach_payload(sf_dir).map_batches(
        StubImageDecoder,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=(1, 4),
    )


def multimodal_meta(sf_dir: str):
    """Payload metadata only (oracle-checkable: byte length + sha256
    of the UTF-8 text payload)."""

    def kernel(batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bytes": pa.array([len(p or b"") for p in payloads], pa.int64()),
                "sha256": pa.array(
                    [hashlib.sha256(p or b"").hexdigest() for p in payloads],
                    pa.string(),
                ),
            }
        )

    return attach_payload(sf_dir).map_batches(kernel, batch_format="pyarrow")


MULTIMODAL_META_ORACLE = (
    "SELECT doc_id, octet_length(encode(COALESCE(text,''))) AS n_bytes, "
    "sha256(COALESCE(text,'')) AS sha256 FROM documents"
)


class StubResizer:
    """Resize plumbing: payload -> fixed-budget payload. The kernel is
    a deterministic stand-in (truncate the byte stream to the target
    pixel budget — a real impl calls PIL/cv2 here); the actor shape,
    binary-in/binary-out schema, and the SMALL batch size (payloads
    dominate memory, so batch x concurrency must fit the worker heap)
    are the real contract."""

    def __init__(self, width: int = 64, height: int = 64):
        self.budget = width * height
        self.width = width
        self.height = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        resized = [(p or b"")[: self.budget] for p in payloads]
        n = len(resized)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "payload": pa.array(resized, pa.binary()),
                "width": pa.array([self.width] * n, pa.int64()),
                "height": pa.array([self.height] * n, pa.int64()),
                "n_bytes": pa.array([len(r) for r in resized], pa.int64()),
            }
        )


def resize_images(sf_dir: str, width: int = 64, height: int = 64):
    """payload → resized payload via the resizer actor pool."""
    return attach_payload(sf_dir).map_batches(
        lambda batch, _r=StubResizer(width, height): _r(batch),
        batch_format="pyarrow",
        batch_size=64,
    )


FRAME_BYTES = 256


def sample_frames(sf_dir: str, n_frames: int = 4):
    """Frame sampling plumbing: treat each payload as a stream of
    fixed-size frames and emit ``n_frames`` evenly spaced ones as one
    row per (doc, frame) — the explode direction of multimodal work
    (rows OUT >> rows in), done inside map_batches with a bounded
    batch size so the amplified output never exceeds
    ``batch_size * n_frames * FRAME_BYTES`` per task. The frame
    extraction itself is a deterministic byte-slice stand-in for an
    ffmpeg keyframe pull."""

    def kernel(batch: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        idxs: list[int] = []
        frames: list[bytes] = []
        for doc_id, payload in zip(
            batch.column("doc_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            p = payload or b""
            total = max(len(p) // FRAME_BYTES, 1)
            take = min(n_frames, total)
            for j in range(take):
                # evenly spaced deterministic frame positions
                pos = (j * total) // take
                doc_ids.append(doc_id)
                idxs.append(pos)
                frames.append(p[pos * FRAME_BYTES : (pos + 1) * FRAME_BYTES])
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int64()),
                "frame": pa.array(frames, pa.binary()),
            }
        )

    return attach_payload(sf_dir).map_batches(
        kernel, batch_format="pyarrow", batch_size=64
    )


def media_exact_dedup(sf_dir: str):
    """Exact duplicate detection on the BINARY payload column — the
    multimodal sibling of ``ops/dedupe.exact_dedup``: group payloads by
    their sha256 digest, keep the lowest doc_id as survivor, count
    copies. The digest is computed once per payload inside the scan
    (256-bit key: collisions are cryptographically negligible, no
    within-group byte-compare needed), and the only exchange moves
    (digest, doc_id, 1) partials through the bucketed two-phase
    aggregate — payload BYTES never cross the wire, which is the whole
    point at image/video scale."""
    import ray.data as rd  # noqa: F401  (attach_payload builds the scan)

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    payloads = attach_payload(sf_dir)

    def digest_rows(batch: pa.Table) -> pd.DataFrame:
        ps = batch.column("payload").to_pylist()
        return pd.DataFrame(
            {"sha256": [hashlib.sha256(p or b"").hexdigest() for p in ps],
             "survivor_doc_id": batch.column("doc_id").to_numpy(
                 zero_copy_only=False).astype(np.int64),
             "n_copies": np.ones(len(ps), dtype=np.int64)}
        )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby("sha256", sort=False, as_index=False)
            .agg(survivor_doc_id=("survivor_doc_id", "min"),
                 n_copies=("n_copies", "sum"))
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("sha256", sort=False, as_index=False)
            .agg(survivor_doc_id=("survivor_doc_id", "min"),
                 n_copies=("n_copies", "sum"))
            .astype({"survivor_doc_id": np.int64, "n_copies": np.int64})
        )

    rows = payloads.map_batches(digest_rows, batch_format="pyarrow")
    return grouped_aggregate(rows, ["sha256"], combine, partial=partial)


MEDIA_EXACT_DEDUP_ORACLE = """
SELECT sha256(COALESCE(text, '')) AS sha256,
       CAST(min(doc_id) AS BIGINT) AS survivor_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY 1
"""


SHARD_BYTES = 256


def payload_shards(sf_dir: str, shard_bytes: int = SHARD_BYTES):
    """Fixed-size byte sharding of binary payloads — the chunking step
    before content-defined dedup or ranged upload of large media:
    each payload explodes into ``ceil(len/shard_bytes)`` shards with
    (doc_id, shard_idx, n_bytes, sha256-of-shard). Binary stays Arrow
    end to end; the explode is payload-local (no shuffle) and batch
    size stays small because output bytes ≈ input bytes. Rows-only at
    the driver (BLOB slicing is not portably SQL-replayable); planted
    fixtures pin the boundary arithmetic."""
    payloads = attach_payload(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        ps = batch.column("payload").to_pylist()
        out_doc, out_idx, out_n, out_sha, out_bytes = [], [], [], [], []
        for doc_id, p in zip(doc_ids, ps):
            p = p or b""
            n_shards = max(1, (len(p) + shard_bytes - 1) // shard_bytes)
            for i in range(n_shards):
                chunk = p[i * shard_bytes:(i + 1) * shard_bytes]
                out_doc.append(doc_id)
                out_idx.append(i)
                out_n.append(len(chunk))
                out_sha.append(hashlib.sha256(chunk).hexdigest())
                out_bytes.append(chunk)
        return pa.table(
            {"doc_id": pa.array(out_doc, pa.int64()),
             "shard_idx": pa.array(out_idx, pa.int64()),
             "n_bytes": pa.array(out_n, pa.int64()),
             "sha256": pa.array(out_sha, pa.string()),
             "shard": pa.array(out_bytes, pa.binary())}
        )

    return payloads.map_batches(explode, batch_format="pyarrow",
                                batch_size=128)


# ----------------------------------------------------------------------
# REAL image formats (PPM / BMP) through the actor contract
# ----------------------------------------------------------------------

IMG_W, IMG_H = 24, 16
RESIZE_W, RESIZE_H = 8, 8


def attach_image_payload(sf_dir: str):
    """A REAL image payload column: one deterministic 24x16 RGB image
    per document, encoded as actual binary PPM (P6) or 24-bit BMP
    (doc_id % 3 == 0) bytes — `functions/imaging.py` implements the
    formats byte-accurately, so the decode actors downstream parse
    genuine rasters instead of hash stand-ins."""
    from entity_extractor_linker_ray.functions.imaging import (
        encode_bmp,
        encode_ppm,
        synth_image,
    )
    from entity_extractor_linker_ray.ops.readers import read_split

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def kernel(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        payloads, fmts = [], []
        for doc_id in doc_ids:
            img = synth_image(int(doc_id), IMG_W, IMG_H)
            if doc_id % 3 == 0:
                payloads.append(encode_bmp(img))
                fmts.append("bmp")
            else:
                payloads.append(encode_ppm(img))
                fmts.append("ppm")
        return pa.table(
            {"doc_id": pa.array(doc_ids, pa.int64()),
             "payload": pa.array(payloads, pa.binary()),
             "format": pa.array(fmts, pa.string())}
        )

    return docs.map_batches(kernel, batch_format="pyarrow", batch_size=256)


class RealImageDecoder:
    """Actor-pool decode stage over REAL image bytes: parses the PPM/BMP
    raster (`functions/imaging.decode_image`) and emits exact integer
    channel sums + one closed-form mean — the same
    int-sufficient-statistics discipline the relational oracles use, so
    the whole decode chain is DuckDB-hash-gateable."""

    def __init__(self):
        from entity_extractor_linker_ray.functions.imaging import decode_image

        self.decode = decode_image  # a real impl binds its codec here

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        rows = {k: [] for k in
                ("doc_id", "format", "width", "height", "n_pixels",
                 "sum_r", "sum_g", "sum_b", "mean_b")}
        for doc_id, payload, fmt in zip(
            doc_ids, batch.column("payload").to_pylist(),
            batch.column("format").to_pylist(),
        ):
            w, h, px = self.decode(payload)
            sums = px.astype(np.int64).sum(axis=(0, 1))
            n = w * h
            rows["doc_id"].append(doc_id)
            rows["format"].append(fmt)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["n_pixels"].append(n)
            rows["sum_r"].append(int(sums[0]))
            rows["sum_g"].append(int(sums[1]))
            rows["sum_b"].append(int(sums[2]))
            rows["mean_b"].append(int(sums[2]) / n)
        return pa.table(
            {"doc_id": pa.array(rows["doc_id"], pa.int64()),
             "format": pa.array(rows["format"], pa.string()),
             "width": pa.array(rows["width"], pa.int64()),
             "height": pa.array(rows["height"], pa.int64()),
             "n_pixels": pa.array(rows["n_pixels"], pa.int64()),
             "sum_r": pa.array(rows["sum_r"], pa.int64()),
             "sum_g": pa.array(rows["sum_g"], pa.int64()),
             "sum_b": pa.array(rows["sum_b"], pa.int64()),
             "mean_b": pa.array(rows["mean_b"], pa.float64())}
        )


def image_decode_stats(sf_dir: str):
    """REAL-format decode → per-image channel statistics, through the
    decoder actor pool. Oracle-gated: the synthesized raster is a pure
    integer function of (doc_id, x, y), which DuckDB replays with a
    range() cross join — so a single wrong byte anywhere in the
    encode→decode chain breaks the value hash."""
    return attach_image_payload(sf_dir).map_batches(
        RealImageDecoder,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=(1, 4),
    )


IMAGE_DECODE_STATS_ORACLE = f"""
WITH px AS (
  SELECT d.doc_id, x.range AS x, y.range AS y
  FROM documents d, range({IMG_W}) x, range({IMG_H}) y
), vals AS (
  SELECT doc_id,
         (x * 255) // {IMG_W - 1} AS r,
         (y * 255) // {IMG_H - 1} AS g,
         ((x + y + doc_id) * 37) % 256 AS b
  FROM px
)
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'bmp' ELSE 'ppm' END AS format,
       CAST({IMG_W} AS BIGINT) AS width,
       CAST({IMG_H} AS BIGINT) AS height,
       CAST(count(*) AS BIGINT) AS n_pixels,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(b) AS BIGINT) AS sum_b,
       CAST(SUM(b) AS DOUBLE) / count(*) AS mean_b
FROM vals GROUP BY 1
"""


def image_resize_stats(sf_dir: str):
    """REAL nearest-neighbor resize (24x16 → 8x8) of the decoded
    raster, re-encoded as PPM, with exact channel sums of the RESIZED
    image — oracle-gated because the pixel-center index math
    ``src = ((2*i + 1) * in) // (2 * out)`` replays in SQL."""
    from entity_extractor_linker_ray.functions.imaging import (
        decode_image,
        encode_ppm,
        resize_nearest,
    )

    payloads = attach_image_payload(sf_dir)

    def kernel(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        out = {k: [] for k in ("doc_id", "out_w", "out_h", "n_bytes",
                               "sum_r", "sum_g", "sum_b")}
        for doc_id, payload in zip(doc_ids, batch.column("payload").to_pylist()):
            _, _, px = decode_image(payload)
            small = resize_nearest(px, RESIZE_W, RESIZE_H)
            sums = small.astype(np.int64).sum(axis=(0, 1))
            out["doc_id"].append(doc_id)
            out["out_w"].append(RESIZE_W)
            out["out_h"].append(RESIZE_H)
            out["n_bytes"].append(len(encode_ppm(small)))
            out["sum_r"].append(int(sums[0]))
            out["sum_g"].append(int(sums[1]))
            out["sum_b"].append(int(sums[2]))
        return pa.table(
            {"doc_id": pa.array(out["doc_id"], pa.int64()),
             "out_w": pa.array(out["out_w"], pa.int64()),
             "out_h": pa.array(out["out_h"], pa.int64()),
             "n_bytes": pa.array(out["n_bytes"], pa.int64()),
             "sum_r": pa.array(out["sum_r"], pa.int64()),
             "sum_g": pa.array(out["sum_g"], pa.int64()),
             "sum_b": pa.array(out["sum_b"], pa.int64())}
        )

    return payloads.map_batches(kernel, batch_format="pyarrow", batch_size=128)


IMAGE_RESIZE_STATS_ORACLE = f"""
WITH idx AS (
  SELECT ((2 * i.range + 1) * {IMG_H}) // (2 * {RESIZE_H}) AS y,
         ((2 * j.range + 1) * {IMG_W}) // (2 * {RESIZE_W}) AS x
  FROM range({RESIZE_H}) i, range({RESIZE_W}) j
), vals AS (
  SELECT d.doc_id,
         (idx.x * 255) // {IMG_W - 1} AS r,
         (idx.y * 255) // {IMG_H - 1} AS g,
         ((idx.x + idx.y + d.doc_id) * 37) % 256 AS b
  FROM documents d, idx
)
SELECT doc_id,
       CAST({RESIZE_W} AS BIGINT) AS out_w,
       CAST({RESIZE_H} AS BIGINT) AS out_h,
       -- P6 header "P6\\n8 8\\n255\\n" (11 bytes) + 8*8*3 raster
       CAST(11 + {RESIZE_W} * {RESIZE_H} * 3 AS BIGINT) AS n_bytes,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(b) AS BIGINT) AS sum_b
FROM vals GROUP BY 1
"""


# --- REAL audio format: RIFF/WAVE PCM16 ------------------------------

AUDIO_RATE = 8000


def attach_audio_payload(sf_dir: str):
    """A REAL audio payload column: one deterministic PCM16 WAV clip
    per document — `functions/audio.py` implements the RIFF container
    byte-accurately. Realism knobs that force a spec-correct parser:
    stereo every 5th doc (interleaved frames), and a ``LIST`` junk
    chunk between ``fmt `` and ``data`` every 4th doc (decoders must
    WALK chunks, not assume the 44-byte layout)."""
    from entity_extractor_linker_ray.functions.audio import (
        encode_wav,
        synth_samples,
    )
    from entity_extractor_linker_ray.ops.readers import read_split

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def kernel(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        payloads, chans = [], []
        for doc_id in doc_ids:
            doc_id = int(doc_id)
            channels = 2 if doc_id % 5 == 0 else 1
            frames = 480 + (doc_id % 7) * 160
            stream = synth_samples(doc_id, frames * channels)
            payloads.append(
                encode_wav(stream, AUDIO_RATE, channels,
                           junk_chunk=(doc_id % 4 == 0))
            )
            chans.append(channels)
        return pa.table(
            {"doc_id": pa.array([int(d) for d in doc_ids], pa.int64()),
             "payload": pa.array(payloads, pa.binary()),
             "n_channels": pa.array(chans, pa.int64())}
        )

    return docs.map_batches(kernel, batch_format="pyarrow", batch_size=256)


class RealAudioDecoder:
    """Actor-pool decode stage over REAL WAV bytes: walks the RIFF
    chunks (`functions/audio.decode_wav`) and emits exact integer
    sufficient statistics (Σ|v|, max|v|, Σv²) plus one closed-form
    double — the decode chain is DuckDB-hash-gateable because the
    synthesized stream is a pure integer function of (doc_id, i)."""

    def __init__(self):
        from entity_extractor_linker_ray.functions.audio import decode_wav

        self.decode = decode_wav  # a real impl binds its codec here

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("doc_id", "n_channels", "sample_rate",
                               "n_samples", "sum_abs", "max_abs",
                               "sum_sq", "mean_sq")}
        for doc_id, payload in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            rate, channels, stream = self.decode(payload)
            v = stream.astype(np.int64)
            n = len(v)
            sum_sq = int((v * v).sum())
            out["doc_id"].append(int(doc_id))
            out["n_channels"].append(channels)
            out["sample_rate"].append(rate)
            out["n_samples"].append(n)
            out["sum_abs"].append(int(np.abs(v).sum()))
            out["max_abs"].append(int(np.abs(v).max()))
            out["sum_sq"].append(sum_sq)
            out["mean_sq"].append(sum_sq / n)
        return pa.table(
            {"doc_id": pa.array(out["doc_id"], pa.int64()),
             "n_channels": pa.array(out["n_channels"], pa.int64()),
             "sample_rate": pa.array(out["sample_rate"], pa.int64()),
             "n_samples": pa.array(out["n_samples"], pa.int64()),
             "sum_abs": pa.array(out["sum_abs"], pa.int64()),
             "max_abs": pa.array(out["max_abs"], pa.int64()),
             "sum_sq": pa.array(out["sum_sq"], pa.int64()),
             "mean_sq": pa.array(out["mean_sq"], pa.float64())}
        )


def audio_decode_stats(sf_dir: str):
    """REAL-format audio decode → per-clip sample statistics, through
    the decoder actor pool. Oracle-gated: DuckDB replays the PCM
    synthesis with one range() expansion, so a single wrong byte
    anywhere in the RIFF encode→chunk-walk→decode chain breaks the
    value hash."""
    return attach_audio_payload(sf_dir).map_batches(
        RealAudioDecoder,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=(1, 4),
    )


AUDIO_DECODE_STATS_ORACLE = f"""
WITH params AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN 2 ELSE 1 END AS n_channels,
         (480 + (doc_id % 7) * 160) AS n_frames
  FROM documents
), idx AS (
  SELECT doc_id, n_channels, n_frames * n_channels AS n,
         CAST(unnest(range(0, n_frames * n_channels)) AS BIGINT) AS i
  FROM params
), s AS (
  SELECT doc_id, n_channels, n,
         ((doc_id * 2654435761 + i * 40503) % 65536) - 32768 AS v
  FROM idx
)
SELECT doc_id,
       CAST(max(n_channels) AS BIGINT) AS n_channels,
       CAST({AUDIO_RATE} AS BIGINT) AS sample_rate,
       CAST(max(n) AS BIGINT) AS n_samples,
       CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
       CAST(max(abs(v)) AS BIGINT) AS max_abs,
       CAST(sum(v * v) AS BIGINT) AS sum_sq,
       CAST(sum(v * v) AS DOUBLE) / max(n) AS mean_sq
FROM s GROUP BY 1
"""


def audio_downsample_stats(sf_dir: str):
    """REAL audio decimation: decode the WAV, keep every other FRAME
    (all channels of kept frames — the interleave-aware half of the
    stream), re-encode as a canonical WAV and report exact stats plus
    the re-encoded byte size. The frame-parity keep rule
    ``(i // channels) % 2 == 0`` replays verbatim in SQL."""
    from entity_extractor_linker_ray.functions.audio import decode_wav, encode_wav

    payloads = attach_audio_payload(sf_dir)

    def kernel(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("doc_id", "n_out", "sum_abs_out", "wav_bytes")}
        for doc_id, payload in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            rate, channels, stream = decode_wav(payload)
            i = np.arange(len(stream), dtype=np.int64)
            keep = (i // channels) % 2 == 0
            kept = stream[keep]
            wav = encode_wav(kept, rate // 2, channels)
            out["doc_id"].append(int(doc_id))
            out["n_out"].append(int(keep.sum()))
            out["sum_abs_out"].append(int(np.abs(kept.astype(np.int64)).sum()))
            out["wav_bytes"].append(len(wav))
        return pa.table(
            {"doc_id": pa.array(out["doc_id"], pa.int64()),
             "n_out": pa.array(out["n_out"], pa.int64()),
             "sum_abs_out": pa.array(out["sum_abs_out"], pa.int64()),
             "wav_bytes": pa.array(out["wav_bytes"], pa.int64())}
        )

    return payloads.map_batches(kernel, batch_format="pyarrow", batch_size=128)


AUDIO_DOWNSAMPLE_STATS_ORACLE = """
WITH params AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN 2 ELSE 1 END AS n_channels,
         (480 + (doc_id % 7) * 160) AS n_frames
  FROM documents
), idx AS (
  SELECT doc_id, n_channels,
         CAST(unnest(range(0, n_frames * n_channels)) AS BIGINT) AS i
  FROM params
), s AS (
  SELECT doc_id,
         ((doc_id * 2654435761 + i * 40503) % 65536) - 32768 AS v
  FROM idx WHERE (i // n_channels) % 2 = 0
)
SELECT doc_id,
       count(*) AS n_out,
       CAST(sum(abs(v)) AS BIGINT) AS sum_abs_out,
       -- canonical WAV: 12 RIFF + 24 fmt + 8 data header + 2 bytes/sample
       CAST(44 + 2 * count(*) AS BIGINT) AS wav_bytes
FROM s GROUP BY 1
"""


# --- REAL video format: concatenated-PPM stream (image2pipe) ----------

VID_W, VID_H = 8, 6


def attach_video_payload(sf_dir: str):
    """A REAL video payload column: back-to-back binary PPM frames —
    the ``ffmpeg -f image2pipe -vcodec ppm`` interchange format — with
    3 + doc_id%5 frames per clip, each frame the deterministic
    `synth_image` raster shifted by 7·frame_idx."""
    from entity_extractor_linker_ray.functions.imaging import (
        encode_ppm,
        synth_image,
    )
    from entity_extractor_linker_ray.ops.readers import read_split

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def kernel(batch: pa.Table) -> pa.Table:
        doc_ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        payloads, nframes = [], []
        for doc_id in doc_ids:
            n = 3 + doc_id % 5
            payloads.append(
                b"".join(
                    encode_ppm(synth_image(doc_id + 7 * f, VID_W, VID_H))
                    for f in range(n)
                )
            )
            nframes.append(n)
        return pa.table(
            {"doc_id": pa.array(doc_ids, pa.int64()),
             "payload": pa.array(payloads, pa.binary()),
             "n_frames": pa.array(nframes, pa.int64())}
        )

    return docs.map_batches(kernel, batch_format="pyarrow", batch_size=256)


def video_frame_stats(sf_dir: str):
    """REAL video frame sampling: parse the concatenated-PPM stream
    (`functions/imaging.decode_ppm_stream` re-parses every header —
    a fixed-stride slice would NOT survive a format change), keep the
    even frames, and emit exact per-frame channel sums. Oracle-gated
    via the same range()-replay as the image stages."""
    from entity_extractor_linker_ray.functions.imaging import decode_ppm_stream

    payloads = attach_video_payload(sf_dir)

    def kernel(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("doc_id", "frame_idx", "n_frames",
                               "sum_r", "sum_g", "sum_b")}
        for doc_id, payload in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            frames = decode_ppm_stream(payload)
            for f, (w, h, px) in enumerate(frames):
                if f % 2:
                    continue
                sums = px.astype(np.int64).sum(axis=(0, 1))
                out["doc_id"].append(int(doc_id))
                out["frame_idx"].append(f)
                out["n_frames"].append(len(frames))
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
        return pa.table(
            {"doc_id": pa.array(out["doc_id"], pa.int64()),
             "frame_idx": pa.array(out["frame_idx"], pa.int64()),
             "n_frames": pa.array(out["n_frames"], pa.int64()),
             "sum_r": pa.array(out["sum_r"], pa.int64()),
             "sum_g": pa.array(out["sum_g"], pa.int64()),
             "sum_b": pa.array(out["sum_b"], pa.int64())}
        )

    return payloads.map_batches(kernel, batch_format="pyarrow", batch_size=128)


VIDEO_FRAME_STATS_ORACLE = f"""
WITH params AS (
  SELECT doc_id, 3 + doc_id % 5 AS n_frames FROM documents
), fr AS (
  SELECT doc_id, n_frames,
         CAST(unnest(range(0, n_frames)) AS BIGINT) AS f
  FROM params
), vals AS (
  SELECT fr.doc_id, fr.n_frames, fr.f,
         (x.range * 255) // {VID_W - 1} AS r,
         (y.range * 255) // {VID_H - 1} AS g,
         ((x.range + y.range + fr.doc_id + 7 * fr.f) * 37) % 256 AS b
  FROM fr, range({VID_W}) x, range({VID_H}) y
  WHERE fr.f % 2 = 0
)
SELECT doc_id, f AS frame_idx,
       CAST(max(n_frames) AS BIGINT) AS n_frames,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(b) AS BIGINT) AS sum_b
FROM vals GROUP BY 1, 2
"""


def video_scene_cuts(sf_dir: str, threshold: int = 600):
    """REAL temporal video kernel: scene-cut detection over the
    concatenated-PPM stream — decode every frame (genuine header
    parsing, as `video_frame_stats`), compute the exact summed absolute
    pixel difference between each consecutive frame pair across all
    three channels, and flag pairs whose difference exceeds
    ``threshold`` as cuts. The pair-difference-then-threshold shape is
    the standard shot-boundary baseline; on real footage the same actor
    contract would hold a decoder handle in ``__init__``.

    Oracle-gated: the synthetic raster is closed-form per (x, y,
    doc_id, frame), so DuckDB replays the per-pair difference with
    range() arithmetic — the Ray side still earns it by decoding the
    actual bytes."""
    from entity_extractor_linker_ray.functions.imaging import decode_ppm_stream

    payloads = attach_video_payload(sf_dir)

    def kernel(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("doc_id", "pair_idx", "diff_sum", "is_cut")}
        for doc_id, payload in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            frames = decode_ppm_stream(payload)
            for f in range(len(frames) - 1):
                a = frames[f][2].astype(np.int64)
                b = frames[f + 1][2].astype(np.int64)
                diff = int(np.abs(a - b).sum())
                out["doc_id"].append(int(doc_id))
                out["pair_idx"].append(f)
                out["diff_sum"].append(diff)
                out["is_cut"].append(int(diff > threshold))
        return pa.table(
            {"doc_id": pa.array(out["doc_id"], pa.int64()),
             "pair_idx": pa.array(out["pair_idx"], pa.int64()),
             "diff_sum": pa.array(out["diff_sum"], pa.int64()),
             "is_cut": pa.array(out["is_cut"], pa.int64())}
        )

    return payloads.map_batches(kernel, batch_format="pyarrow", batch_size=128)


def video_scene_cuts_oracle(threshold: int = 600) -> str:
    # only the b channel varies with frame index (r is x-only, g is
    # y-only), so the pair difference is sum |b(f) - b(f+1)| over the
    # raster
    return f"""
WITH params AS (
  SELECT doc_id, 3 + doc_id % 5 AS n_frames FROM documents
), fr AS (
  SELECT doc_id, CAST(unnest(range(0, n_frames - 1)) AS BIGINT) AS f
  FROM params
), vals AS (
  SELECT fr.doc_id, fr.f,
         abs(((x.range + y.range + fr.doc_id + 7 * fr.f) * 37) % 256
             - ((x.range + y.range + fr.doc_id + 7 * fr.f + 7) * 37)
               % 256) AS d
  FROM fr, range({VID_W}) x, range({VID_H}) y
)
SELECT doc_id, f AS pair_idx,
       CAST(SUM(d) AS BIGINT) AS diff_sum,
       CAST(CASE WHEN SUM(d) > {threshold} THEN 1 ELSE 0 END AS BIGINT)
         AS is_cut
FROM vals GROUP BY 1, 2
"""
