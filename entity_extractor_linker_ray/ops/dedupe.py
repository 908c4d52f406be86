"""Deduplication operators for large text corpora.

* exact dedup — content-hash groupby, first(min doc_id) wins;
* MinHash + LSH near-dup — shingle → minhash signature → banded
  bucket groupby → candidate pairs → exact Jaccard verify;
* SimHash — 64-bit token-hash projection per document;
* embedding near-dup — cosine over LSH sign-buckets of the
  ``embeddings`` table.

Scale shape: signatures are computed batch-local (vectorized numpy),
the only all-to-all is the groupby on (band, bucket) — pairs are
generated inside each bucket group, and buckets are capped to guard
against degenerate hot buckets (cap logged, not silent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MERSENNE = (1 << 61) - 1
N_HASHES = 64
N_BANDS = 16  # 16 bands x 4 rows
ROWS_PER_BAND = N_HASHES // N_BANDS
SHINGLE_K = 3
MAX_BUCKET = 64  # safety cap on pathological buckets


def _read_docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


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
        nonempty = counts > 0
        if nonempty.any():
            flat = np.concatenate([s for s in per_doc if s.size])
            with np.errstate(over="ignore"):
                prods = flat[None, :] * self.a[:, None] + self.b[:, None]
            starts = np.concatenate(([0], np.cumsum(counts[nonempty])[:-1]))
            mins = np.minimum.reduceat(prods, starts, axis=1)  # (n, n_nonempty)
            sigs[nonempty] = mins.T
        out = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy()})
        out["signature"] = list(sigs)
        return out


def minhash_signatures(sf_dir: str):
    return _read_docs(sf_dir).map_batches(
        MinHasher, batch_format="pandas", concurrency=(1, 8)
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


def jaccard_verified_pairs(sf_dir: str, threshold: float = 0.8):
    """Verify LSH candidates with exact shingle Jaccard.

    The candidate set is small (near-dups only), so documents are
    re-read and joined batch-local against a broadcast of the candidate
    pair list; at larger candidate volumes this becomes a bucketed
    join keyed on doc_id.
    """
    import ray

    cand = minhash_candidates(sf_dir).to_pandas()
    if cand.empty:
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                          "doc_b": pd.Series([], dtype=np.int64),
                          "jaccard_pct": pd.Series([], dtype=np.int64)})
        )
    needed = set(cand["doc_a"]) | set(cand["doc_b"])
    texts_ref = ray.put(
        {
            int(r["doc_id"]): r["text"]
            for r in _read_docs(sf_dir)
            .map_batches(
                lambda b: b[b["doc_id"].isin(needed)], batch_format="pandas"
            )
            .to_pandas()
            .to_dict("records")
        }
    )
    import ray.data as rd

    pairs_ds = rd.from_pandas(cand[["doc_a", "doc_b"]])

    class Verifier:
        def __init__(self):
            self.texts = ray.get(texts_ref)
            self.cache: dict[int, np.ndarray] = {}

        def _sh(self, doc_id: int) -> np.ndarray:
            if doc_id not in self.cache:
                self.cache[doc_id] = _shingles(self.texts.get(doc_id, "") or "")
            return self.cache[doc_id]

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = []
            for a, b in zip(batch["doc_a"], batch["doc_b"]):
                sa, sb = self._sh(int(a)), self._sh(int(b))
                union = np.union1d(sa, sb).size
                inter = np.intersect1d(sa, sb).size
                pct = (100 * inter) // union if union else 0
                out.append((a, b, pct))
            frame = pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard_pct"])
            return frame[frame["jaccard_pct"] >= int(threshold * 100)]

    return pairs_ds.map_batches(Verifier, batch_format="pandas", concurrency=(1, 4))


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

def embedding_neardup(sf_dir: str, threshold: float = 0.95, n_planes: int = 8, seed: int = 29):
    """Near-identical embedding pairs: bucket by random-hyperplane sign
    bits, exact cosine verify within buckets. Deterministic planes."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    class Bucketer:
        def __init__(self):
            self.planes = None

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vecs = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
            if self.planes is None:
                rng = np.random.default_rng(seed)
                self.planes = rng.standard_normal((vecs.shape[1], n_planes))
            signs = (vecs @ self.planes) >= 0
            keys = np.packbits(signs, axis=1)[:, 0].astype(np.int64)
            out = pd.DataFrame({"vec_id": batch["vec_id"].to_numpy(), "bucket": keys})
            out["embedding"] = list(vecs)
            return out

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(group["embedding"].to_list())
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        sims = unit @ unit.T
        ids = group["vec_id"].to_numpy()
        left, right = np.triu_indices(len(ids), k=1)
        mask = sims[left, right] >= threshold
        return pd.DataFrame(
            {
                "vec_a": np.minimum(ids[left][mask], ids[right][mask]).astype(np.int64),
                "vec_b": np.maximum(ids[left][mask], ids[right][mask]).astype(np.int64),
            }
        )

    bucketed = ds.map_batches(Bucketer, batch_format="pandas", concurrency=(1, 4))
    return bucketed.groupby("bucket").map_groups(verify, batch_format="pandas")
