"""Deduplication operators for large text corpora.

* exact dedup — content-hash groupby, first(min doc_id) wins;
* MinHash + LSH near-dup — shingle → minhash signature → banded
  bucket groupby → candidate pairs → exact Jaccard verify;
* SimHash — 64-bit token-hash projection per document;
* embedding near-dup — cosine over BANDED sign-LSH buckets of the
  ``embeddings`` table (multi-band = multi-probe recall).

Scale shape: signatures are computed batch-local (vectorized numpy),
the wide steps are bucketed two-phase shuffles on (band, bucket) or the
pair key — pairs are generated inside each bucket group, buckets are
capped to guard against degenerate hot buckets (cap logged, not
silent), and candidate verification joins payloads to pairs through
the bucketed ``_pair_payload_join`` (ids-only shuffles, no driver
collect, no whole-corpus broadcast).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from entity_extractor_linker_ray.ops import memo as _memo

logger = logging.getLogger(__name__)

_MERSENNE = (1 << 61) - 1
N_HASHES = 64
N_BANDS = 16  # 16 bands x 4 rows
ROWS_PER_BAND = N_HASHES // N_BANDS
SHINGLE_K = 3
MAX_BUCKET = 64  # safety cap on pathological buckets
# bound on the transient (n_hashes x shingles) product matrix inside
# MinHasher: 64 x 262144 x 8B = 128 MiB regardless of batch size
MAX_SHINGLE_CHUNK = 262_144


def _read_docs(sf_dir: str):
    """Documents read shared by the dedup family — block count sized
    to the cluster (see ``ops/readers.py``) because every consumer
    runs a CPU-heavy per-doc kernel (shingling, minhashing)."""
    from entity_extractor_linker_ray.ops.readers import read_split

    return read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


# ----------------------------------------------------------------------
# exact dedup
# ----------------------------------------------------------------------

_HASH_KEY_A = "0123456789123456"  # pandas' default SipHash key
_HASH_KEY_B = "fedcba9876543210"  # independent second 64-bit stream


def exact_dedup(sf_dir: str):
    """Survivor per distinct text: min doc_id + duplicate count.

    Hash-first so the shuffle moves 16-byte keys, not documents. The
    key is 128 bits — two independent 64-bit SipHash streams with
    distinct keys — because at the 10^10-doc design scale a single
    64-bit key has a birthday bound of ~3 expected collisions (each a
    silent wrong merge); at 128 bits it is ~1e-18, genuinely ignorable
    as in content-addressed storage generally.

    Both phases are vectorized two-phase hash aggregation
    (`ops/shuffle.grouped_aggregate`): a per-batch partial combine, a
    bucketed shuffle on hash(key), one pandas groupby per bucket — no
    per-group Python even though distinct texts ≈ rows.
    """
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("").to_numpy(dtype=object)
        rows = pd.DataFrame(
            {
                "h_lo": pd.util.hash_array(texts, hash_key=_HASH_KEY_A),
                "h_hi": pd.util.hash_array(texts, hash_key=_HASH_KEY_B),
                "doc_id": batch["doc_id"].to_numpy(),
            }
        )
        return (
            rows.groupby(["h_lo", "h_hi"], sort=False)
            .agg(doc_id=("doc_id", "min"), n_dups=("doc_id", "size"))
            .reset_index()
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["h_lo", "h_hi"], sort=False)
            .agg(doc_id=("doc_id", "min"), n_dups=("n_dups", "sum"))
            .reset_index()[["doc_id", "n_dups"]]
            .astype({"doc_id": np.int64, "n_dups": np.int64})
        )

    return grouped_aggregate(_read_docs(sf_dir), ["h_lo", "h_hi"], combine, partial=partial)


EXACT_DEDUP_ORACLE = (
    "SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, count(*) AS n_dups "
    "FROM documents GROUP BY md5(COALESCE(text,''))"
)


# ----------------------------------------------------------------------
# MinHash + LSH
# ----------------------------------------------------------------------

def _shingles(text: str, k: int = SHINGLE_K) -> np.ndarray:
    """Hashed k-token shingles (unique, sorted uint64).

    Gram hashing is vectorized via ``pd.util.hash_array`` (SipHash with
    a fixed key — deterministic across processes), not per-gram md5 in
    a Python loop."""
    tokens = text.split()
    if len(tokens) < k:
        grams = [" ".join(tokens)] if tokens else []
    else:
        grams = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    if not grams:
        return np.array([], dtype=np.uint64)
    return np.unique(pd.util.hash_array(np.asarray(grams, dtype=object)))


class MinHasher:
    """Stateful signature stage: the (a, b) hash-family coefficients are
    generated ONCE per actor from a fixed seed.

    Hashing is multiply-add over uint64 with natural 2^64 wraparound
    (multiply-shift universal family) — fully vectorized, no bignum
    math. One (n_hashes × total_shingles) product matrix per batch,
    reduced per document with ``np.minimum.reduceat``."""

    def __init__(self, n_hashes: int = N_HASHES, seed: int = 13):
        rng = np.random.default_rng(seed)
        # odd multipliers give a proper multiply-shift family mod 2^64
        self.a = (rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.uint64) << 1) | 1
        self.b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.uint64)
        self.n = n_hashes

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        per_doc = [_shingles(t or "") for t in batch["text"]]
        counts = np.array([s.size for s in per_doc], dtype=np.int64)
        sigs = np.full((len(per_doc), self.n), np.iinfo(np.uint64).max, dtype=np.uint64)
        nonempty_idx = np.flatnonzero(counts > 0)
        # run over docs in chunks whose total shingle count stays under
        # MAX_SHINGLE_CHUNK so the (n_hashes x shingles) product matrix
        # is bounded (~128 MiB) independent of batch size / doc length
        run_start = 0
        while run_start < nonempty_idx.size:
            run_end, total = run_start, 0
            while run_end < nonempty_idx.size and (
                total == 0 or total + counts[nonempty_idx[run_end]] <= MAX_SHINGLE_CHUNK
            ):
                total += counts[nonempty_idx[run_end]]
                run_end += 1
            idx = nonempty_idx[run_start:run_end]
            flat = np.concatenate([per_doc[i] for i in idx])
            with np.errstate(over="ignore"):
                prods = flat[None, :] * self.a[:, None] + self.b[:, None]
            starts = np.concatenate(([0], np.cumsum(counts[idx])[:-1]))
            mins = np.minimum.reduceat(prods, starts, axis=1)  # (n, len(idx))
            sigs[idx] = mins.T
            run_start = run_end
        out = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy()})
        out["signature"] = list(sigs)
        return out


_MINHASHER: MinHasher | None = None


def _minhash_batch(batch: pd.DataFrame) -> pd.DataFrame:
    # the hash family is deterministic from a fixed seed and cheap to
    # build, so cache one per WORKER PROCESS instead of paying actor
    # pool spin-up: a plain task-pool stage scales to every free CPU
    # instantly, which matters because shingling is ~6 ms/doc of
    # Python — the dominant cost of the whole MinHash path
    global _MINHASHER
    if _MINHASHER is None:
        _MINHASHER = MinHasher()
    return _MINHASHER(batch)


def minhash_signatures(sf_dir: str):
    # batch_size bounds the per-call transient alongside
    # MAX_SHINGLE_CHUNK; keep it SMALL so the stage actually fans out
    # (map_batches coalesces blocks up to batch_size — at 1024 a
    # 5k-doc corpus became 5 tasks serialized onto 5 of 32 CPUs)
    return _read_docs(sf_dir).map_batches(
        _minhash_batch, batch_format="pandas", batch_size=128
    )


_BAND_MIX = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def _band_rows(batch: pd.DataFrame) -> pd.DataFrame:
    """Banded bucket keys, fully vectorized: signatures reshape to
    (docs, bands, rows), each band chunk mixes to one uint64 key via
    multiply-add (equal chunks → equal keys; cross-chunk collisions are
    harmless — every candidate pair is Jaccard-verified downstream)."""
    if batch.empty:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype=np.int64),
             "band": pd.Series([], dtype=np.int32),
             "bucket": pd.Series([], dtype=np.uint64)}
        )
    sigs = np.stack([np.asarray(s, dtype=np.uint64) for s in batch["signature"]])
    chunks = sigs.reshape(len(sigs), N_BANDS, ROWS_PER_BAND)
    with np.errstate(over="ignore"):
        keys = (chunks * _BAND_MIX[:ROWS_PER_BAND]).sum(axis=2, dtype=np.uint64)
    doc_ids = np.repeat(batch["doc_id"].to_numpy(dtype=np.int64), N_BANDS)
    bands = np.tile(np.arange(N_BANDS, dtype=np.int32), len(sigs))
    return pd.DataFrame({"doc_id": doc_ids, "band": bands, "bucket": keys.ravel()})


def _pairs_in_partition(part: pd.DataFrame) -> pd.DataFrame:
    """All (doc_a < doc_b) pairs sharing a (band, bucket), vectorized:
    cap each bucket at MAX_BUCKET members (smallest doc_ids, matching
    the prior per-group cap) then one self-merge — no per-group Python
    even when almost every bucket is singleton."""
    g = part.sort_values(["band", "bucket", "doc_id"], kind="stable")
    rank = g.groupby(["band", "bucket"], sort=False).cumcount()
    g = g[rank.to_numpy() < MAX_BUCKET]
    m = g.merge(g, on=["band", "bucket"], suffixes=("_a", "_b"))
    m = m[m["doc_id_a"] < m["doc_id_b"]]
    return pd.DataFrame(
        {"doc_a": m["doc_id_a"].to_numpy(dtype=np.int64),
         "doc_b": m["doc_id_b"].to_numpy(dtype=np.int64)}
    )


def minhash_candidates(sf_dir: str):
    """LSH candidate pairs (deduplicated across bands). Both wide steps
    are bucketed two-phase shuffles (`ops/shuffle.py`): pair generation
    hash-partitions the (band, bucket) key space, pair dedup the
    (doc_a, doc_b) space — bucket and pair cardinality ≈ row count, the
    regime where Ray's native per-group aggregate collapses."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    rows = minhash_signatures(sf_dir).map_batches(_band_rows, batch_format="pandas")
    pairs = grouped_aggregate(rows, ["band", "bucket"], _pairs_in_partition)

    def count_bands(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["doc_a", "doc_b"], sort=False)
            .size()
            .reset_index(name="n_bands")
            .astype({"n_bands": np.int64})
        )

    return grouped_aggregate(pairs, ["doc_a", "doc_b"], count_bands)


# ----------------------------------------------------------------------
# scale-safe pairs <-> items join (shared by jaccard + embedding verify)
# ----------------------------------------------------------------------

def _pair_payload_join(
    pairs_ds, items_ds, verify_wide, output_schema, num_partitions: int = 64
):
    """Attach item payloads to both sides of every (doc_a, doc_b) pair
    with two bucketed shuffles and NO driver materialization — the
    scale-safe replacement for "collect candidates + broadcast texts"
    (a near-dup-heavy corpus makes candidates O(n)).

    ``items_ds`` must have columns (id:int64, payload:binary);
    ``pairs_ds`` columns (doc_a, doc_b). Phase 1 explodes each pair
    into one row per side, unions with the item rows, buckets on
    hash(id), and does ONE vectorized merge per bucket to attach
    payloads. Phase 2 buckets on the pair key and hands ``verify_wide``
    a frame with (doc_a, doc_b, payload_a, payload_b) — it returns the
    verified output rows. Payloads travel as bytes so the union schema
    stays a concrete Arrow binary column (no null-typed blocks).

    ``output_schema`` (a ``pyarrow.Schema``) declares ``verify_wide``'s
    output columns: a typed empty block is unioned onto the result so a
    candidate-free corpus still yields a Dataset with the verified
    schema (Ray drops the schema of the 0-row pandas blocks that
    ``map_groups`` emits when no group reaches the final stage).
    """
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["doc_a"].to_numpy(dtype=np.int64)
        b = batch["doc_b"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "id": np.concatenate([a, b]),
                "a": np.concatenate([a, a]),
                "b": np.concatenate([b, b]),
                "side": np.concatenate(
                    [np.zeros(len(a), dtype=np.int64), np.ones(len(b), dtype=np.int64)]
                ),
                "payload": [b""] * (2 * len(a)),
            }
        )

    def tag_items(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        return pd.DataFrame(
            {
                "id": batch["id"].to_numpy(dtype=np.int64),
                "a": np.full(n, -1, dtype=np.int64),
                "b": np.full(n, -1, dtype=np.int64),
                "side": np.full(n, -1, dtype=np.int64),
                "payload": batch["payload"].to_list(),
            }
        )

    unioned = pairs_ds.map_batches(explode, batch_format="pandas").union(
        items_ds.map_batches(tag_items, batch_format="pandas")
    )

    def attach(bucket: pd.DataFrame) -> pd.DataFrame:
        items = bucket[bucket["side"] < 0][["id", "payload"]]
        prs = bucket[bucket["side"] >= 0][["id", "a", "b", "side"]]
        if prs.empty:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64),
                 "side": pd.Series([], dtype=np.int64), "payload": pd.Series([], dtype=object)}
            )
        m = prs.merge(items, on="id", how="inner")
        return m[["a", "b", "side", "payload"]]

    sided = grouped_aggregate(unioned, ["id"], attach, num_partitions=num_partitions)

    def widen(bucket: pd.DataFrame) -> pd.DataFrame:
        s0 = bucket[bucket["side"] == 0][["a", "b", "payload"]].rename(
            columns={"a": "doc_a", "b": "doc_b", "payload": "payload_a"}
        )
        s1 = bucket[bucket["side"] == 1][["a", "b", "payload"]].rename(
            columns={"a": "doc_a", "b": "doc_b", "payload": "payload_b"}
        )
        wide = s0.merge(s1, on=["doc_a", "doc_b"], how="inner")
        return verify_wide(wide)

    import ray.data as rd

    verified = grouped_aggregate(sided, ["a", "b"], widen, num_partitions=num_partitions)
    return verified.union(rd.from_arrow(output_schema.empty_table()))


def jaccard_verified_pairs(sf_dir: str, threshold: float = 0.8):
    """Verify LSH candidates with exact shingle Jaccard.

    Fully distributed: the candidate pair list stays a Dataset and is
    joined to document texts via the bucketed pairs↔docs join
    (`_pair_payload_join`) — no driver collect, no whole-text broadcast.
    The per-pair set intersection is the verify kernel itself, bounded
    by candidate volume, with a per-bucket shingle cache so each doc is
    shingled once per bucket.
    """
    cand = minhash_candidates(sf_dir)

    def to_items(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "id": batch["doc_id"].to_numpy(dtype=np.int64),
                "payload": [(t or "").encode("utf-8") for t in batch["text"]],
            }
        )

    docs = _read_docs(sf_dir).map_batches(to_items, batch_format="pandas")
    min_pct = int(threshold * 100)

    def verify(wide: pd.DataFrame) -> pd.DataFrame:
        cache: dict[int, np.ndarray] = {}

        def sh(doc_id: int, payload: bytes) -> np.ndarray:
            if doc_id not in cache:
                cache[doc_id] = _shingles(payload.decode("utf-8", "replace"))
            return cache[doc_id]

        rows = []
        for a, b, pa, pb in zip(
            wide["doc_a"], wide["doc_b"], wide["payload_a"], wide["payload_b"]
        ):
            sa, sb = sh(int(a), pa), sh(int(b), pb)
            union = np.union1d(sa, sb).size
            inter = np.intersect1d(sa, sb).size
            pct = (100 * inter) // union if union else 0
            if pct >= min_pct:
                rows.append((int(a), int(b), int(pct)))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard_pct"]).astype(
            {"doc_a": np.int64, "doc_b": np.int64, "jaccard_pct": np.int64}
        )

    import pyarrow as pa

    out_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard_pct", pa.int64())]
    )
    return _pair_payload_join(
        cand.select_columns(["doc_a", "doc_b"]), docs, verify, out_schema
    )


# ----------------------------------------------------------------------
# SimHash
# ----------------------------------------------------------------------

def simhash_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """64-bit SimHash per document, vectorized across the whole batch:
    all tokens hashed at once (SipHash via ``pd.util.hash_array``),
    bits unpacked into a (tokens × 64) ±1 matrix, summed per document
    with ``np.add.reduceat`` over the contiguous token runs."""
    token_lists = [(t or "").split() for t in batch["text"]]
    counts = np.array([len(t) for t in token_lists], dtype=np.int64)
    values = np.zeros(len(token_lists), dtype=np.uint64)
    nonempty = counts > 0
    if nonempty.any():
        flat = np.asarray(
            [tok for toks in token_lists for tok in toks], dtype=object
        )
        hashes = pd.util.hash_array(flat)  # uint64 per token
        bits = (
            np.unpackbits(hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
            .astype(np.int8)
            .astype(np.int16)
        )  # (tokens, 64), bit i = (h >> i) & 1
        signs = bits * 2 - 1
        starts = np.concatenate(([0], np.cumsum(counts[nonempty])[:-1]))
        acc = np.add.reduceat(signs, starts, axis=0)  # (n_nonempty, 64)
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
        values[nonempty] = np.where(acc > 0, weights, np.uint64(0)).sum(
            axis=1, dtype=np.uint64
        )
    return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(), "simhash": values})


def simhash(sf_dir: str):
    return _read_docs(sf_dir).map_batches(simhash_batch, batch_format="pandas")


# ----------------------------------------------------------------------
# embedding near-dup (cosine >= threshold via sign-LSH buckets)
# ----------------------------------------------------------------------

EMB_BANDS = 8
EMB_ROWS = 8  # sign bits per band; 8 bands x 8 planes = 64 planes total
EMB_MAX_BUCKET = 256  # cap per (band, bucket); overflow logged, not silent


def _emb_planes(dim: int, seed: int = 29) -> np.ndarray:
    """Deterministic (dim x EMB_BANDS*EMB_ROWS) hyperplane matrix —
    module-level so tests can reproduce band signatures exactly."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, EMB_BANDS * EMB_ROWS))


def embedding_neardup(sf_dir: str, threshold: float = 0.95, seed: int = 29):
    """Near-identical embedding pairs via BANDED sign-LSH: 64 random
    hyperplanes split into 8 bands of 8 bits; a pair is a candidate if
    ANY band's byte matches (recall ≈ 1-(1-p^8)^8 ≈ 0.99 at cos 0.95,
    vs ~0.43 for the single-8-plane probe that misses boundary pairs).
    Candidates are generated per (band, bucket) with a logged
    EMB_MAX_BUCKET cap (skewed embedding spaces can't blow up a bucket
    to O(n)), deduped across bands, then cosine-verified through the
    bucketed pairs↔vectors join — ids-only shuffles end to end, vectors
    shipped exactly once per verified side, nothing on the driver.
    """
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    from entity_extractor_linker_ray.ops.readers import read_split

    ds = read_split(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    class BandBucketer:
        def __init__(self):
            self.planes = None

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vecs = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
            if self.planes is None:
                self.planes = _emb_planes(vecs.shape[1], seed)
            signs = (vecs @ self.planes) >= 0  # (n, 64)
            bytes_per_band = np.packbits(
                signs.reshape(len(vecs), EMB_BANDS, EMB_ROWS), axis=2
            )[:, :, 0]  # (n, EMB_BANDS)
            return pd.DataFrame(
                {
                    "vec_id": np.repeat(
                        batch["vec_id"].to_numpy(dtype=np.int64), EMB_BANDS
                    ),
                    "band": np.tile(np.arange(EMB_BANDS, dtype=np.int64), len(vecs)),
                    "bucket": bytes_per_band.ravel().astype(np.int64),
                }
            )

    def pairs_in_bucket(part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values(["band", "bucket", "vec_id"], kind="stable")
        rank = g.groupby(["band", "bucket"], sort=False).cumcount()
        over = rank.to_numpy() >= EMB_MAX_BUCKET
        if over.any():
            logger.warning(
                "embedding_neardup: bucket cap dropped %d of %d rows "
                "(hot LSH buckets; raise EMB_MAX_BUCKET or add planes)",
                int(over.sum()), len(g),
            )
        g = g[~over]
        m = g.merge(g, on=["band", "bucket"], suffixes=("_a", "_b"))
        m = m[m["vec_id_a"] < m["vec_id_b"]]
        return pd.DataFrame(
            {
                "doc_a": m["vec_id_a"].to_numpy(dtype=np.int64),
                "doc_b": m["vec_id_b"].to_numpy(dtype=np.int64),
            }
        )

    rows = ds.map_batches(BandBucketer, batch_format="pandas", concurrency=(1, 16))
    cand = grouped_aggregate(rows, ["band", "bucket"], pairs_in_bucket)
    cand = grouped_aggregate(
        cand, ["doc_a", "doc_b"], lambda b: b.drop_duplicates()
    )

    def to_items(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "id": batch["vec_id"].to_numpy(dtype=np.int64),
                "payload": [
                    np.asarray(v, dtype=np.float64).tobytes() for v in batch["embedding"]
                ],
            }
        )

    items = ds.map_batches(to_items, batch_format="pandas")

    def verify(wide: pd.DataFrame) -> pd.DataFrame:
        if wide.empty:
            return pd.DataFrame(
                {"vec_a": pd.Series([], dtype=np.int64),
                 "vec_b": pd.Series([], dtype=np.int64)}
            )
        va = np.stack([np.frombuffer(p, dtype=np.float64) for p in wide["payload_a"]])
        vb = np.stack([np.frombuffer(p, dtype=np.float64) for p in wide["payload_b"]])
        na = np.linalg.norm(va, axis=1)
        nb = np.linalg.norm(vb, axis=1)
        na[na == 0] = 1.0
        nb[nb == 0] = 1.0
        sims = np.einsum("ij,ij->i", va, vb) / (na * nb)
        mask = sims >= threshold
        ids_a = wide["doc_a"].to_numpy(dtype=np.int64)[mask]
        ids_b = wide["doc_b"].to_numpy(dtype=np.int64)[mask]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(ids_a, ids_b),
                "vec_b": np.maximum(ids_a, ids_b),
            }
        )

    import pyarrow as pa

    out_schema = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())])
    return _pair_payload_join(cand, items, verify, out_schema)


# ----------------------------------------------------------------------
# exact n-gram Jaccard (oracle-gated, no LSH approximation)
# ----------------------------------------------------------------------

NGRAM_K = 3
NGRAM_DF_CAP = 64  # drop grams appearing in more docs (skew guard, mirrored in SQL)
_NGRAM_SPLIT = None  # compiled lazily (regex module import kept at use site)


def _word_ngrams(text: str, k: int = NGRAM_K) -> list[str]:
    """Distinct lowercase word k-grams; tokenization is exactly
    DuckDB's ``regexp_split_to_array(lower(text), '[^a-z0-9]+')`` so
    the oracle and the Ray side shingle identically."""
    global _NGRAM_SPLIT
    if _NGRAM_SPLIT is None:
        import re

        _NGRAM_SPLIT = re.compile(r"[^a-z0-9]+")
    toks = [t for t in _NGRAM_SPLIT.split((text or "").lower()) if t]
    if len(toks) < k:
        return []
    return list({" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)})


def _inverted_pair_stats(key_rows, df_lo: int, df_cap: int, finalize,
                         out_schema):
    """Shared inverted-index pair machinery: from (g, doc_id) posting
    rows to per-pair intersection counts with both docs' kept-key
    totals attached — ONE linear stream through four bucketed
    two-phase shuffles (`ops/shuffle.grouped_aggregate`), no branch
    consumed twice, nothing on the driver:

    1. key ``g``: document frequency is exact per key (all rows of a
       key share its bucket); keys with df in [df_lo, df_cap] emit
       intersection-pair partials (bounded self-merge, <= df_cap^2
       rows per key) and per-doc size partials in one pass;
    2. key ``(doc_a, doc_b)``: sum partials -> exact n_common per pair
       and exact kept-key count per doc (size rows ride along tagged
       ``doc_b = -1``);
    3. key ``doc_a``: bucketed hash join attaching n_a;
    4. key ``doc_b``: attach n_b, then ``finalize(pairs_frame)`` maps
       (doc_a, doc_b, n_common, n_a, n_b) to the operator's output —
       all-integer arithmetic keeps the driver's value hash exact.

    Backs both :func:`ngram_jaccard_pairs` (string gram keys, Jaccard)
    and :func:`fp_containment` (int64 fingerprint keys, containment).
    """
    import pyarrow as pa
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def pairs_and_sizes(bucket: pd.DataFrame) -> pd.DataFrame:
        df = bucket.groupby("g", sort=False)["doc_id"].transform("size").to_numpy()
        kept = bucket[(df >= df_lo) & (df <= df_cap)]
        if kept.empty:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype=np.int64),
                 "doc_b": pd.Series([], dtype=np.int64),
                 "cnt": pd.Series([], dtype=np.int64)}
            )
        sizes = kept.groupby("doc_id", sort=False).size().reset_index(name="cnt")
        m = kept.merge(kept, on="g", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        partial = (
            m.groupby(["doc_id_a", "doc_id_b"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(
                    [partial["doc_id_a"].to_numpy(dtype=np.int64),
                     sizes["doc_id"].to_numpy(dtype=np.int64)]
                ),
                "doc_b": np.concatenate(
                    [partial["doc_id_b"].to_numpy(dtype=np.int64),
                     np.full(len(sizes), -1, dtype=np.int64)]
                ),
                "cnt": np.concatenate(
                    [partial["cnt"].to_numpy(dtype=np.int64),
                     sizes["cnt"].to_numpy(dtype=np.int64)]
                ),
            }
        )

    partials = grouped_aggregate(key_rows, ["g"], pairs_and_sizes)

    def sum_cnt(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["doc_a", "doc_b"], sort=False)["cnt"]
            .sum()
            .reset_index()
            .astype({"doc_a": np.int64, "doc_b": np.int64, "cnt": np.int64})
        )

    summed = grouped_aggregate(partials, ["doc_a", "doc_b"], sum_cnt)
    # rows now: pairs (doc_a, doc_b>=0, cnt=n_common) + sizes (doc_b=-1, cnt=n_kept)

    def key_on_a(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["key"] = out["doc_a"].to_numpy(dtype=np.int64)  # sizes: key = doc_id
        out["n_a"] = np.int64(0)
        return out

    def attach_a(bucket: pd.DataFrame) -> pd.DataFrame:
        sizes = bucket[bucket["doc_b"] < 0][["key", "cnt"]].rename(columns={"cnt": "sz"})
        out = bucket.merge(sizes, on="key", how="left")
        pairs = out["doc_b"] >= 0
        out.loc[pairs, "n_a"] = out.loc[pairs, "sz"].fillna(0).astype(np.int64)
        return out[["doc_a", "doc_b", "cnt", "n_a"]]

    with_a = grouped_aggregate(
        summed.map_batches(key_on_a, batch_format="pandas"), ["key"], attach_a
    )

    def key_on_b(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        is_size = out["doc_b"].to_numpy() < 0
        out["key"] = np.where(
            is_size, out["doc_a"].to_numpy(dtype=np.int64), out["doc_b"].to_numpy(dtype=np.int64)
        )
        out["n_b"] = np.int64(0)
        return out

    def attach_b(bucket: pd.DataFrame) -> pd.DataFrame:
        sizes = bucket[bucket["doc_b"] < 0][["key", "cnt"]].rename(columns={"cnt": "sz"})
        pairs = bucket[bucket["doc_b"] >= 0].merge(sizes, on="key", how="left")
        if pairs.empty:
            return pa.Table.from_pylist([], schema=out_schema).to_pandas()
        frame = pd.DataFrame(
            {
                "doc_a": pairs["doc_a"].to_numpy(dtype=np.int64),
                "doc_b": pairs["doc_b"].to_numpy(dtype=np.int64),
                "n_common": pairs["cnt"].to_numpy(dtype=np.int64),
                "n_a": pairs["n_a"].to_numpy(dtype=np.int64),
                "n_b": pairs["sz"].fillna(0).to_numpy(dtype=np.int64),
            }
        )
        return finalize(frame)

    result = grouped_aggregate(
        with_a.map_batches(key_on_b, batch_format="pandas"), ["key"], attach_b
    )
    return result.union(rd.from_arrow(out_schema.empty_table()))


# per-session cache of the materialized verified-pair stream: the
# n-gram pair machinery is the most expensive dedup step, and FIVE
# consumers start from it (dedup_ngram_jaccard, duplicate_clusters →
# survivors/cluster_sizes/curate/leakage_safe_split, dup_rate_by_source).
# The driver runs every query in one process — the pair computation
# should run once per sf_dir, not per consumer. Mirrors
# graph_algos._KG_EDGES_CACHE; the materialized Dataset is bounded by
# pair count (df-cap-bounded), not corpus size.
_NGRAM_PAIRS_CACHE: dict = _memo.register({})


def ngram_pairs_materialized(sf_dir: str):
    """Memoized :func:`ngram_jaccard_pairs` at default parameters
    (bounded keep-last-N, see ops.memo)."""
    return _memo.memoize(
        _NGRAM_PAIRS_CACHE, sf_dir,
        lambda: ngram_jaccard_pairs(sf_dir).materialize(),
    )


def ngram_jaccard_pairs(
    sf_dir: str,
    threshold_pct: int = 60,
    k: int = NGRAM_K,
    df_cap: int = NGRAM_DF_CAP,
):
    """EXACT word-n-gram Jaccard similarity pairs — the deterministic,
    SQL-mirrorable sibling of the MinHash estimate: every doc pair with
    Jaccard >= threshold over its distinct word k-grams, restricted to
    grams whose document frequency is in [2, df_cap] (a gram in only
    one doc can't intersect; a near-ubiquitous gram would generate
    O(df^2) pairs — the cap bounds per-gram pair fan-out and is applied
    identically in the DuckDB oracle, so results still hash-match).
    Pair machinery: :func:`_inverted_pair_stats`."""
    import pyarrow as pa

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        grams: list[str] = []
        for d, t in zip(batch["doc_id"], batch["text"]):
            gs = _word_ngrams(t, k)
            ids.extend([int(d)] * len(gs))
            grams.extend(gs)
        # emit Arrow so the gram column is a typed string column even
        # when a batch yields zero grams (object-dtype empties break
        # Ray's block size estimation)
        return pa.table(
            {"g": pa.array(grams, pa.string()),
             "doc_id": pa.array(ids, pa.int64())}
        )

    gram_rows = _read_docs(sf_dir).map_batches(explode, batch_format="pandas")

    def finalize(pairs: pd.DataFrame) -> pd.DataFrame:
        n_union = pairs["n_a"] + pairs["n_b"] - pairs["n_common"]
        ok = (n_union > 0) & (100 * pairs["n_common"] >= threshold_pct * n_union)
        kept = pairs[ok]
        n_union = n_union[ok].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_a": kept["doc_a"].to_numpy(dtype=np.int64),
                "doc_b": kept["doc_b"].to_numpy(dtype=np.int64),
                "n_common": kept["n_common"].to_numpy(dtype=np.int64),
                "n_union": n_union,
                "jaccard_pct": (100 * kept["n_common"].to_numpy(dtype=np.int64))
                // n_union,
            }
        )

    out_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("n_common", pa.int64()),
         ("n_union", pa.int64()), ("jaccard_pct", pa.int64())]
    )
    return _inverted_pair_stats(gram_rows, 2, df_cap, finalize, out_schema)


FP_DF_CAP = 8  # fingerprint document-frequency cap (skew guard, in SQL too)
FP_MIN_SHARED = 3


def fp_containment(sf_dir: str, min_shared: int = FP_MIN_SHARED,
                   df_cap: int = FP_DF_CAP):
    """Containment pairs over the rolling-hash fingerprint index
    (`textstats.kgram_fingerprints`): doc pairs sharing >= min_shared
    selected k-gram hashes, scored by ``100 * shared // min(n_a, n_b)``
    — the asymmetric copy-detection measure (a small doc fully
    contained in a big one scores 100 where Jaccard would dilute).
    Same four-exchange inverted-index stream as the n-gram op, but the
    postings key is an int64 hash — the shuffle moves 8-byte keys
    instead of gram strings."""
    import pyarrow as pa

    from entity_extractor_linker_ray.ops.textstats import kgram_fingerprints

    def rekey(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"g": batch["fp"].to_numpy(dtype=np.int64),
             "doc_id": batch["doc_id"].to_numpy(dtype=np.int64)}
        )

    fp_rows = kgram_fingerprints(sf_dir).map_batches(rekey, batch_format="pandas")

    def finalize(pairs: pd.DataFrame) -> pd.DataFrame:
        kept = pairs[pairs["n_common"] >= min_shared]
        shared = kept["n_common"].to_numpy(dtype=np.int64)
        smaller = np.minimum(
            kept["n_a"].to_numpy(dtype=np.int64),
            kept["n_b"].to_numpy(dtype=np.int64),
        )
        return pd.DataFrame(
            {
                "doc_a": kept["doc_a"].to_numpy(dtype=np.int64),
                "doc_b": kept["doc_b"].to_numpy(dtype=np.int64),
                "n_shared": shared,
                "containment_pct": (100 * shared) // np.maximum(smaller, 1),
            }
        )

    out_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("n_shared", pa.int64()),
         ("containment_pct", pa.int64())]
    )
    return _inverted_pair_stats(fp_rows, 2, df_cap, finalize, out_schema)


def fp_containment_oracle(min_shared: int = FP_MIN_SHARED,
                          df_cap: int = FP_DF_CAP) -> str:
    from entity_extractor_linker_ray.ops.textstats import kgram_fingerprints_oracle

    return f"""
WITH f AS ({kgram_fingerprints_oracle().strip()}),
df AS (SELECT fp FROM f GROUP BY fp HAVING count(*) BETWEEN 2 AND {df_cap}),
kept AS (SELECT doc_id, fp FROM f JOIN df USING (fp)),
sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM kept a JOIN kept b USING (fp)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared,
       CAST((100 * n_shared) // least(sa.n, sb.n) AS BIGINT) AS containment_pct
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_shared >= {min_shared}
"""


NGRAM_JACCARD_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(COALESCE(text,'')), '[^a-z0-9]+'),
                     x -> x <> '') AS w
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
  FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
), df AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) BETWEEN 2 AND 64
), kept AS (
  SELECT doc_id, g FROM grams JOIN df USING (g)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM kept a JOIN kept b USING (g)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       sa.n + sb.n - n_common AS n_union,
       (100 * n_common) // (sa.n + sb.n - n_common) AS jaccard_pct
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE 100 * n_common >= 60 * (sa.n + sb.n - n_common)
"""


def dup_rate_by_source(sf_dir: str):
    """Near-duplicate contamination rate per source — the curation
    dashboard number that decides which feeds need dedup attention:
    per ``source``, total documents, documents involved in >= 1
    verified n-gram-Jaccard pair, and the share (one double division
    of exact counts). Shape: the pair stream collapses to distinct
    dup doc_ids per batch, meets the (doc_id, source) scan in ONE
    bucketed tagged-union join on hash(doc_id) (no broadcast — the
    dup set is corpus-proportional in the worst case), and each
    bucket emits per-source count partials; the final grid is
    |sources| rows."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    pairs = ngram_pairs_materialized(sf_dir).select_columns(["doc_a", "doc_b"])

    def dup_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(np.concatenate(
            [batch["doc_a"].to_numpy(dtype=np.int64),
             batch["doc_b"].to_numpy(dtype=np.int64)]
        ))
        return pd.DataFrame(
            {"doc_id": ids,
             "source": np.full(len(ids), "", dtype=object),
             "_side": np.ones(len(ids), dtype=np.int64)}
        )

    def doc_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
             "source": batch["source"].astype(str).to_numpy(),
             "_side": np.zeros(len(batch), dtype=np.int64)}
        )

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(doc_rows, batch_format="pandas")
    unioned = docs.union(pairs.map_batches(dup_rows, batch_format="pandas"))

    def count_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket[bucket["_side"] == 0][["doc_id", "source"]]
        dup_ids = np.unique(
            bucket.loc[bucket["_side"] == 1, "doc_id"].to_numpy(dtype=np.int64)
        )
        if d.empty:
            return pd.DataFrame(
                {"source": pd.Series([], dtype=str),
                 "n_docs": pd.Series([], dtype=np.int64),
                 "n_dup_docs": pd.Series([], dtype=np.int64)}
            )
        is_dup = np.isin(d["doc_id"].to_numpy(dtype=np.int64), dup_ids)
        agg = pd.DataFrame(
            {"source": d["source"].to_numpy(),
             "n_docs": np.ones(len(d), dtype=np.int64),
             "n_dup_docs": is_dup.astype(np.int64)}
        )
        return (
            agg.groupby("source", sort=False, as_index=False)[
                ["n_docs", "n_dup_docs"]
            ].sum().astype({"n_docs": np.int64, "n_dup_docs": np.int64})
        )

    partials = grouped_aggregate(unioned, ["doc_id"], count_bucket)
    grid = collect_small(partials, ["source", "n_docs", "n_dup_docs"])
    if grid.empty:
        return pd.DataFrame(
            {"source": pd.Series([], dtype=str),
             "n_docs": pd.Series([], dtype=np.int64),
             "n_dup_docs": pd.Series([], dtype=np.int64),
             "dup_share": pd.Series([], dtype=np.float64)}
        )
    g = (
        grid.groupby("source", sort=False, as_index=False)[
            ["n_docs", "n_dup_docs"]
        ].sum()
    )
    n = g["n_docs"].to_numpy(dtype=np.int64)
    d = g["n_dup_docs"].to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {"source": g["source"].astype(str).to_numpy(),
         "n_docs": n, "n_dup_docs": d,
         "dup_share": d.astype(np.float64) / n}
    )


def dup_rate_by_source_oracle() -> str:
    return f"""
WITH pairs AS ({NGRAM_JACCARD_ORACLE.strip()}),
dup AS (
  SELECT doc_a AS doc_id FROM pairs
  UNION
  SELECT doc_b AS doc_id FROM pairs
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(u.doc_id) AS BIGINT) AS n_dup_docs,
       CAST(count(u.doc_id) AS DOUBLE) / count(*) AS dup_share
FROM documents d LEFT JOIN dup u USING (doc_id)
GROUP BY 1
"""


COPURCHASE_DF_LO = 2
COPURCHASE_DF_CAP = 40  # ~30 buyers/part in this corpus; cap bounds fan-out at cap^2
COPURCHASE_MIN_SHARED = 3


def customer_copurchase_pairs(sf_dir: str, df_lo: int = COPURCHASE_DF_LO,
                              df_cap: int = COPURCHASE_DF_CAP,
                              min_shared: int = COPURCHASE_MIN_SHARED):
    """Set-similarity SELF-JOIN on purchase baskets: customer pairs
    sharing >= ``min_shared`` distinct parts, scored by
    ``100·common // min(|A|, |B|)`` (overlap coefficient) — the
    collaborative-filtering candidate generator, built on the SAME
    inverted-index pair machinery as the text dedup family
    (:func:`_inverted_pair_stats`), proving it is content-agnostic:
    postings here are (partkey, custkey) from ONE bucketed
    lineitem⋈orders exchange, with the usual df window [df_lo,
    df_cap] bounding per-key pair fan-out (a part everyone buys
    generates O(df²) pairs — cap it, mirrored in the SQL so results
    still hash-match)."""
    import pyarrow as pa
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def order_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"okey": batch["o_orderkey"].to_numpy(dtype=np.int64),
             "val": batch["o_custkey"].to_numpy(dtype=np.int64),
             "_side": np.ones(len(batch), dtype=np.int64)}
        )

    def line_rows(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"okey": batch["l_orderkey"].to_numpy(dtype=np.int64),
             "val": batch["l_partkey"].to_numpy(dtype=np.int64)}
        ).drop_duplicates()
        out["_side"] = np.int64(0)
        return out

    unioned = orders.map_batches(order_rows, batch_format="pandas").union(
        lines.map_batches(line_rows, batch_format="pandas")
    )

    def join_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        o = bucket[bucket["_side"] == 1][["okey", "val"]].rename(
            columns={"val": "cust"}
        )
        ln = bucket[bucket["_side"] == 0][["okey", "val"]].rename(
            columns={"val": "part"}
        ).drop_duplicates()
        m = ln.merge(o, on="okey", how="inner")
        if m.empty:
            return pd.DataFrame(
                {"g": pd.Series([], dtype=np.int64),
                 "doc_id": pd.Series([], dtype=np.int64)}
            )
        return (
            m[["part", "cust"]].drop_duplicates()
            .rename(columns={"part": "g", "cust": "doc_id"})
            .astype({"g": np.int64, "doc_id": np.int64})
        )

    postings = grouped_aggregate(unioned, ["okey"], join_bucket,
                                 coalesce=True)

    def post_dedup(bucket: pd.DataFrame) -> pd.DataFrame:
        # (part, cust) pairs from different orderkey buckets can repeat
        return bucket.drop_duplicates(["g", "doc_id"])

    postings = grouped_aggregate(postings, ["g"], post_dedup,
                                 num_partitions=16)

    def finalize(pairs: pd.DataFrame) -> pd.DataFrame:
        kept = pairs[pairs["n_common"] >= min_shared]
        n_min = np.minimum(kept["n_a"].to_numpy(dtype=np.int64),
                           kept["n_b"].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {"cust_a": kept["doc_a"].to_numpy(dtype=np.int64),
             "cust_b": kept["doc_b"].to_numpy(dtype=np.int64),
             "n_common": kept["n_common"].to_numpy(dtype=np.int64),
             "n_a": kept["n_a"].to_numpy(dtype=np.int64),
             "n_b": kept["n_b"].to_numpy(dtype=np.int64),
             "overlap_pct": (100 * kept["n_common"].to_numpy(
                 dtype=np.int64)) // n_min}
        )

    out_schema = pa.schema(
        [("cust_a", pa.int64()), ("cust_b", pa.int64()),
         ("n_common", pa.int64()), ("n_a", pa.int64()), ("n_b", pa.int64()),
         ("overlap_pct", pa.int64())]
    )
    return _inverted_pair_stats(postings, df_lo, df_cap, finalize, out_schema)


def customer_copurchase_oracle(df_lo: int = COPURCHASE_DF_LO,
                               df_cap: int = COPURCHASE_DF_CAP,
                               min_shared: int = COPURCHASE_MIN_SHARED) -> str:
    return f"""
WITH post AS (
  SELECT DISTINCT l.l_partkey AS g, o.o_custkey AS c
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
), df AS (
  SELECT g, count(*) AS df FROM post GROUP BY 1
), kept AS (
  SELECT p.g, p.c FROM post p JOIN df USING (g)
  WHERE df BETWEEN {df_lo} AND {df_cap}
), sizes AS (
  SELECT c, count(*) AS n FROM kept GROUP BY 1
), pairs AS (
  SELECT a.c AS cust_a, b.c AS cust_b, count(*) AS n_common
  FROM kept a JOIN kept b ON a.g = b.g AND a.c < b.c
  GROUP BY 1, 2
)
SELECT cust_a, cust_b, CAST(n_common AS BIGINT) AS n_common,
       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       (100 * n_common) // least(sa.n, sb.n) AS overlap_pct
FROM pairs
JOIN sizes sa ON sa.c = cust_a
JOIN sizes sb ON sb.c = cust_b
WHERE n_common >= {min_shared}
"""
