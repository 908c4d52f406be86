"""Similarity search over the ``embeddings`` table.

* :func:`knn_brute` — exact top-k cosine neighbors for a fixed query
  set: the query matrix is broadcast (``ray.put`` once, read per
  actor), each batch does one float64 matmul against it, and the
  partial top-k per batch is merged by a final per-query group — the
  canonical scale path for brute-force ANN (no all-pairs shuffle).
* :func:`knn_lsh` — sign-LSH bucket per vector with multi-probe
  queries; recall trades against the bucket count.
* :func:`knn_ivf` — inverted-file variant (the production ANN scale
  path): deterministic k-means centroids fit on a bounded sample,
  broadcast once; every batch assigns vectors to their nearest list
  and scores only vectors in the ``n_probe`` lists nearest each query.
* :func:`knn_pq` — product-quantization / ADC variant (the memory
  scale path): vectors compress to ``n_sub`` uint8 codes, queries
  score whole batches through a tiny lookup-table gather — at 100 TB
  the code table is ~64× smaller than the float vectors, so the scan
  is object-store-bandwidth-bound instead of matmul-bound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

N_QUERIES = 4
TOP_K = 5


def _read_embeddings(sf_dir: str):
    from entity_extractor_linker_ray.ops.readers import read_split

    return read_split(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _query_matrix(sf_dir: str, n_queries: int = N_QUERIES):
    """Deterministic query set: the embeddings of vec_id 0..n-1.

    Predicate is pushed into the parquet scan (``filters=``) so only the
    row groups containing the query ids are decoded — the driver never
    reads the full embeddings table (at 10^10 vectors that read would be
    a driver OOM; with pushdown it is O(row_group))."""
    import pyarrow.parquet as pq

    table = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )
    frame = table.to_pandas().set_index("vec_id").sort_index()
    missing = [i for i in range(n_queries) if i not in frame.index]
    if missing:
        raise ValueError(
            f"ANN query set requires vec_ids 0..{n_queries - 1}; "
            f"missing {missing[:5]}{'...' if len(missing) > 5 else ''} "
            f"(scan of vec_id < {n_queries} returned {len(frame)} rows)"
        )
    rows = frame.loc[range(n_queries), "embedding"]
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in rows])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def knn_brute(sf_dir: str, n_queries: int = N_QUERIES, k: int = TOP_K):
    """Exact cosine top-k; output (query_id, neighbor_id, rank) with a
    deterministic (-sim, neighbor_id) tiebreak. Self-matches excluded."""
    import ray

    queries_ref = ray.put(_query_matrix(sf_dir, n_queries))

    class PartialTopK:
        def __init__(self):
            self.queries = ray.get(queries_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in batch["embedding"]]
            )
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (vecs / norms) @ self.queries.T  # (batch, n_queries)
            ids = batch["vec_id"].to_numpy()
            out = []
            for q in range(self.queries.shape[0]):
                col = sims[:, q]
                keep = min(k + 1, len(ids))
                top = np.argpartition(-col, keep - 1)[:keep]
                for i in top:
                    out.append((q, int(ids[i]), float(col[i])))
            return pd.DataFrame(out, columns=["query_id", "neighbor_id", "sim"])

    def final(group: pd.DataFrame) -> pd.DataFrame:
        q = int(group["query_id"].iloc[0])
        g = group[group["neighbor_id"] != q]
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "query_id": np.full(len(g), q, dtype=np.int64),
                "neighbor_id": g["neighbor_id"].to_numpy(dtype=np.int64),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    partials = _read_embeddings(sf_dir).map_batches(
        PartialTopK, batch_format="pandas", concurrency=(1, 16)
    )
    return partials.groupby("query_id").map_groups(final, batch_format="pandas")


def knn_brute_oracle(n_queries: int = N_QUERIES, k: int = TOP_K) -> str:
    """DuckDB replay: list_cosine_similarity + rank with the same
    tiebreak."""
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id < {n_queries}),
sims AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                list_cosine_similarity(q.qe, e.embedding) AS sim
         FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id),
ranked AS (SELECT query_id, neighbor_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id ASC) AS rank
           FROM sims)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {k}
"""


def knn_lsh(sf_dir: str, n_queries: int = N_QUERIES, k: int = TOP_K,
            n_planes: int = 4, seed: int = 31, probe_bits: int = 1):
    """Approximate variant: vectors land in ONE sign-LSH bucket; each
    query probes its own bucket plus every bucket within
    ``probe_bits`` Hamming distance (multi-probe LSH — near-boundary
    neighbors whose signature differs by one flipped plane are still
    scored; single-probe misses exactly those). Candidate set still
    shrinks ~2**n_planes / (1+n_planes) fold; recall measured against
    knn_brute in tests."""
    import ray

    import itertools

    queries = _query_matrix(sf_dir, n_queries)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((queries.shape[1], n_planes))
    qbuckets = np.packbits((queries @ planes) >= 0, axis=1)[:, 0]
    # all masks with 1..probe_bits flipped plane bits
    flip_masks = [0] + [
        sum(1 << bit for bit in bits)
        for r in range(1, min(probe_bits, n_planes) + 1)
        for bits in itertools.combinations(range(n_planes), r)
    ]
    probes = [
        np.array(sorted({int(qb) ^ mask for mask in flip_masks}), dtype=np.uint8)
        for qb in qbuckets
    ]
    ctx_ref = ray.put((queries, planes, probes))

    class BucketTopK:
        def __init__(self):
            self.queries, self.planes, self.probes = ray.get(ctx_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in batch["embedding"]]
            )
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            unit = vecs / norms
            buckets = np.packbits((vecs @ self.planes) >= 0, axis=1)[:, 0]
            ids = batch["vec_id"].to_numpy()
            out = []
            for q in range(self.queries.shape[0]):
                mask = np.isin(buckets, self.probes[q])
                if not mask.any():
                    continue
                sims = unit[mask] @ self.queries[q]
                for vid, s in zip(ids[mask], sims):
                    out.append((q, int(vid), float(s)))
            return pd.DataFrame(out, columns=["query_id", "neighbor_id", "sim"])

    def final(group: pd.DataFrame) -> pd.DataFrame:
        q = int(group["query_id"].iloc[0])
        g = group[group["neighbor_id"] != q]
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "query_id": np.full(len(g), q, dtype=np.int64),
                "neighbor_id": g["neighbor_id"].to_numpy(dtype=np.int64),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    partials = _read_embeddings(sf_dir).map_batches(
        BucketTopK, batch_format="pandas", concurrency=(1, 16)
    )
    return partials.groupby("query_id").map_groups(final, batch_format="pandas")


def _fit_centroids(sample: np.ndarray, n_lists: int, iters: int = 10,
                   seed: int = 37) -> np.ndarray:
    """Deterministic mini k-means (cosine space: unit vectors, spherical
    updates) on a bounded driver-side sample — at corpus scale the
    sample stays fixed-size, so centroid fitting is O(sample), not
    O(corpus)."""
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = sample / norms
    rng = np.random.default_rng(seed)
    centroids = unit[rng.choice(len(unit), size=min(n_lists, len(unit)),
                                replace=False)]
    for _ in range(iters):
        assign = np.argmax(unit @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = unit[assign == c]
            if len(members):
                mean = members.mean(axis=0)
                norm = np.linalg.norm(mean)
                if norm > 0:
                    centroids[c] = mean / norm
    return centroids


def _stream_sample(sf_dir: str, sample_rows: int) -> np.ndarray:
    """Bounded streaming training sample: iterate record batches until
    ``sample_rows`` are collected — never materializes the full table
    on the driver (file-ordered data caveat: pass a larger sample_rows
    or pre-shuffle when the file is clustered by similarity)."""
    import pyarrow.parquet as pq

    collected: list[np.ndarray] = []
    n_collected = 0
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    for record_batch in pf.iter_batches(columns=["embedding"], batch_size=1024):
        for vec in record_batch.column("embedding").to_pylist():
            collected.append(np.asarray(vec, dtype=np.float64))
            n_collected += 1
            if n_collected >= sample_rows:
                break
        if n_collected >= sample_rows:
            break
    return np.stack(collected)


def knn_ivf(sf_dir: str, n_queries: int = N_QUERIES, k: int = TOP_K,
            n_lists: int = 16, n_probe: int = 2, seed: int = 37,
            sample_rows: int = 4096):
    """IVF approximate top-k: vectors are binned by nearest centroid;
    each query scores only vectors in its ``n_probe`` nearest lists.
    Centroids fit once on a bounded sample and broadcast via
    ``ray.put``; per batch ONE matmul assigns lists and one masked
    matmul scores — no shuffle at all (the partial-top-k merge is the
    only small exchange, same shape as :func:`knn_brute`)."""
    import ray

    queries = _query_matrix(sf_dir, n_queries)
    sample = _stream_sample(sf_dir, sample_rows)
    centroids = _fit_centroids(sample, n_lists, seed=seed)
    q_lists = np.argsort(-(queries @ centroids.T), axis=1)[:, :n_probe]
    ctx_ref = ray.put((queries, centroids, q_lists))

    class IvfTopK:
        def __init__(self):
            self.queries, self.centroids, self.q_lists = ray.get(ctx_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in batch["embedding"]]
            )
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            unit = vecs / norms
            lists = np.argmax(unit @ self.centroids.T, axis=1)
            ids = batch["vec_id"].to_numpy()
            out = []
            for q in range(self.queries.shape[0]):
                mask = np.isin(lists, self.q_lists[q])
                if not mask.any():
                    continue
                sims = unit[mask] @ self.queries[q]
                keep = min(k + 1, int(mask.sum()))
                top = np.argpartition(-sims, keep - 1)[:keep]
                masked_ids = ids[mask]
                for i in top:
                    out.append((q, int(masked_ids[i]), float(sims[i])))
            return pd.DataFrame(out, columns=["query_id", "neighbor_id", "sim"])

    def final(group: pd.DataFrame) -> pd.DataFrame:
        q = int(group["query_id"].iloc[0])
        g = group[group["neighbor_id"] != q]
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "query_id": np.full(len(g), q, dtype=np.int64),
                "neighbor_id": g["neighbor_id"].to_numpy(dtype=np.int64),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    partials = _read_embeddings(sf_dir).map_batches(
        IvfTopK, batch_format="pandas", concurrency=(1, 16)
    )
    return partials.groupby("query_id").map_groups(final, batch_format="pandas")


def _fit_pq_codebooks(sample: np.ndarray, n_sub: int, n_codes: int,
                      iters: int = 10, seed: int = 41) -> list[np.ndarray]:
    """Deterministic L2 k-means per subspace on unit-normalized
    training vectors (Jégou et al., "Product Quantization for Nearest
    Neighbor Search", TPAMI 2011). Bounded sample ⇒ O(sample) fit,
    independent of corpus size."""
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = sample / norms
    rng = np.random.default_rng(seed)
    books: list[np.ndarray] = []
    for sub in np.array_split(unit, n_sub, axis=1):
        cents = sub[rng.choice(len(sub), size=min(n_codes, len(sub)),
                               replace=False)].copy()
        for _ in range(iters):
            # argmin ||x - c||² == argmax x·c − ||c||²/2
            scores = sub @ cents.T - 0.5 * (cents * cents).sum(axis=1)
            assign = np.argmax(scores, axis=1)
            for c in range(len(cents)):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(cents)
    return books


def knn_pq(sf_dir: str, n_queries: int = N_QUERIES, k: int = TOP_K,
           n_sub: int = 8, n_codes: int = 32, seed: int = 41,
           sample_rows: int = 4096, refine_mult: int = 8):
    """Product-quantization top-k: ADC preselect + exact re-rank —
    the standard two-stage PQ search (Jégou et al. 2011). Stage 1
    scores a whole batch through a LUT GATHER: each vector compresses
    to ``n_sub`` uint8 codes (nearest sub-codebook centroid, L2) and
    ``approx_sim = Σ_m LUT_m[code_m]`` with ``LUT_m = C_m @ q_m``
    built once per query. Stage 2 exact-scores only the per-batch ADC
    top ``refine_mult·(k+1)`` candidates (one small matmul) — without
    it, within-cluster vectors quantize to near-identical codes and
    the final ranking is arbitrary.

    Why this is the memory scale path: at 10^10 vectors the float
    corpus is ~2.5 PB while the code table is ~80 GB + one broadcast
    codebook — the coarse scan is storage-bandwidth-bound (``n_sub``
    table lookups per vector, no dim-wide FMA) and exact math touches
    only the candidate sliver. Here encode+scan fuse into one pass
    over the raw column (production stores the codes as their own
    column); the refine step reads the raw vectors already in the
    batch. Codebooks fit once on a bounded driver-side sample and
    broadcast via ``ray.put``; no shuffle beyond the tiny
    partial-top-k merge (same shape as :func:`knn_brute`). Approximate
    by design — recall vs brute is asserted in pytest, driver check is
    rows-only."""
    import ray

    queries = _query_matrix(sf_dir, n_queries)
    sample = _stream_sample(sf_dir, sample_rows)
    books = _fit_pq_codebooks(sample, n_sub, n_codes, seed=seed)
    # per-query LUTs are query-count × n_sub × n_codes — tiny; build
    # once on the driver and broadcast alongside the codebooks
    bounds = np.cumsum([0] + [b.shape[1] for b in books])
    luts = np.stack([
        np.stack([books[m] @ q[bounds[m]:bounds[m + 1]]
                  for m in range(n_sub)])
        for q in queries
    ])  # (n_queries, n_sub, n_codes)
    ctx_ref = ray.put((queries, books, bounds, luts))

    class PqTopK:
        def __init__(self):
            self.queries, self.books, self.bounds, self.luts = ray.get(ctx_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in batch["embedding"]]
            )
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            unit = vecs / norms
            # encode: nearest centroid per subspace (one matmul each)
            codes = np.empty((len(unit), len(self.books)), dtype=np.int64)
            for m, cents in enumerate(self.books):
                sub = unit[:, self.bounds[m]:self.bounds[m + 1]]
                scores = sub @ cents.T - 0.5 * (cents * cents).sum(axis=1)
                codes[:, m] = np.argmax(scores, axis=1)
            ids = batch["vec_id"].to_numpy()
            n_refine = min(len(ids), refine_mult * (k + 1))
            out = []
            for q in range(self.luts.shape[0]):
                # ADC: gather + sum over subspaces, no matmul
                adc = self.luts[q][np.arange(len(self.books)), codes].sum(axis=1)
                cand = np.argpartition(-adc, n_refine - 1)[:n_refine]
                exact = unit[cand] @ self.queries[q]
                for i, s in zip(cand, exact):
                    out.append((q, int(ids[i]), float(s)))
            return pd.DataFrame(out, columns=["query_id", "neighbor_id", "sim"])

    def final(group: pd.DataFrame) -> pd.DataFrame:
        q = int(group["query_id"].iloc[0])
        g = group[group["neighbor_id"] != q]
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "query_id": np.full(len(g), q, dtype=np.int64),
                "neighbor_id": g["neighbor_id"].to_numpy(dtype=np.int64),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    partials = _read_embeddings(sf_dir).map_batches(
        PqTopK, batch_format="pandas", concurrency=(1, 16)
    )
    return partials.groupby("query_id").map_groups(final, batch_format="pandas")


def label_centroids(sf_dir: str):
    """Per-label embedding centroids as integer-exact partial sums —
    the vector-aggregate building block behind IVF training, class
    prototypes, and dedup-cluster representatives.

    Per batch the Arrow ``list<float>`` column is consumed zero-copy as
    its flat value buffer + offsets (no per-row Python, no ragged
    object arrays): labels repeat via ``np.repeat`` over the list
    lengths, positions come from one arange minus the repeated row
    starts, and a single vectorized groupby collapses the batch to
    (label, pos, sum_milli, n_vecs) rows — at most labels x dim per
    batch, independent of row count. Elements are rounded to milli
    units (half away from zero, matching SQL ``round``) BEFORE summing
    so the result is bit-exact under any accumulation order; the final
    bucketed combine just adds the integer partials. The division into
    an actual mean is left to the consumer — partials keep the operator
    mergeable and oracle-exact."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    embs = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        col = batch.column("embedding").combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0)
        flat = col.values.to_numpy(zero_copy_only=False)
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lengths = np.diff(offsets)
        labels = np.repeat(
            batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64),
            lengths,
        )
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(
            offsets[:-1], lengths
        )
        from entity_extractor_linker_ray.ops.cluster import milli_round

        milli = milli_round(flat)
        df = pd.DataFrame({"label": labels, "pos": pos, "sum_milli": milli})
        out = (
            df.groupby(["label", "pos"], sort=False)
            .agg(sum_milli=("sum_milli", "sum"), n_vecs=("sum_milli", "size"))
            .reset_index()
        )
        return out.astype({c: np.int64 for c in out.columns})

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["label", "pos"], sort=False)
            .agg(sum_milli=("sum_milli", "sum"), n_vecs=("n_vecs", "sum"))
            .reset_index()
            .astype({c: np.int64 for c in ("label", "pos", "sum_milli", "n_vecs")})
        )

    bucketed = embs.map_batches(partial, batch_format="pyarrow")
    return grouped_aggregate(bucketed, ["label", "pos"], combine,
                             num_partitions=16)


LABEL_CENTROIDS_ORACLE = """
SELECT label, pos, SUM(milli) AS sum_milli, COUNT(*) AS n_vecs
FROM (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
         CAST(round(unnest(embedding) * 1000) AS BIGINT) AS milli
  FROM embeddings
) t
GROUP BY 1, 2
"""

def embedding_norms(sf_dir: str):
    """Per-vector squared L2 norm in exact milli²-integer units — the
    magnitude feature a vector pipeline computes before cosine
    normalization or outlier pruning. Row-local, ZERO shuffle: the
    Arrow ``list<float>`` column is consumed zero-copy (flat values +
    offsets, same access pattern as :func:`label_centroids`), elements
    round to milli ints first (so the sum of squares is exact and
    accumulation-order-free), and ``np.add.reduceat`` collapses each
    row's span in one C pass. The oracle replays the identical integer
    arithmetic via unnest + generate_subscripts."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.cluster import milli_round

    embs = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def kernel(batch: pa.Table) -> pd.DataFrame:
        col = batch.column("embedding").combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0)
        flat = col.values.to_numpy(zero_copy_only=False)
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        milli = milli_round(flat)
        sq = milli * milli
        lengths = np.diff(offsets)
        # reduceat traps: a zero-length segment echoes a NEIGHBOR's
        # value (masked below), a start index == len(sq) raises (clamp
        # below), and an all-empty block has nothing to reduce at all —
        # every case resolves through the lengths mask
        if len(sq):
            starts = np.minimum(offsets[:-1], np.int64(len(sq) - 1))
            norm2 = np.add.reduceat(sq, starts)
        else:
            norm2 = np.zeros(len(lengths), dtype=np.int64)
        norm2 = np.where(lengths > 0, norm2, np.int64(0))
        return pd.DataFrame(
            {"vec_id": batch.column("vec_id").to_numpy(zero_copy_only=False)
                 .astype(np.int64),
             "norm2_milli2": norm2.astype(np.int64),
             "dim": lengths.astype(np.int64)}
        )

    return embs.map_batches(kernel, batch_format="pyarrow")


EMBEDDING_NORMS_ORACLE = """
SELECT vec_id,
       CAST(COALESCE(SUM(CAST(round(e * 1000) AS BIGINT)
                         * CAST(round(e * 1000) AS BIGINT)), 0) AS BIGINT)
         AS norm2_milli2,
       CAST(count(e) AS BIGINT) AS dim
FROM (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, unnest(embedding) AS e
  FROM embeddings
) t
GROUP BY 1
"""


RANGE_TAU = 0.25  # cosine threshold (synthetic embeddings peak ~0.37)


def range_search(sf_dir: str, n_queries: int = N_QUERIES,
                 tau: float = RANGE_TAU):
    """RANGE similarity search — every (query, vector) pair with
    cosine >= tau, the epsilon-neighborhood dual of top-k. Same
    broadcast-queries / per-batch-matmul shape as :func:`knn_brute`,
    but output size is data-dependent: each batch emits only its
    qualifying pairs (no partial top-k needed), ranked per query by
    (-sim, neighbor_id) in a final per-query pass so the driver check
    is order-free. Self-matches excluded. The threshold compare
    happens on well-separated random sims (~1e-1 gaps); both engines
    compute cosine in double, so the boundary cannot flip."""
    import ray

    queries_ref = ray.put(_query_matrix(sf_dir, n_queries))

    class RangeFilter:
        def __init__(self):
            self.queries = ray.get(queries_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in batch["embedding"]]
            )
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (vecs / norms) @ self.queries.T
            ids = batch["vec_id"].to_numpy(dtype=np.int64)
            rows, cols = np.nonzero(sims >= tau)
            return pd.DataFrame(
                {"query_id": cols.astype(np.int64),
                 "neighbor_id": ids[rows],
                 "sim": sims[rows, cols]}
            )

    def final(group: pd.DataFrame) -> pd.DataFrame:
        q = int(group["query_id"].iloc[0])
        g = group[group["neighbor_id"] != q]
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True])
        return pd.DataFrame(
            {"query_id": np.full(len(g), q, dtype=np.int64),
             "neighbor_id": g["neighbor_id"].to_numpy(dtype=np.int64),
             "rank": np.arange(1, len(g) + 1, dtype=np.int64)}
        )

    pairs = _read_embeddings(sf_dir).map_batches(
        RangeFilter, batch_format="pandas", concurrency=(1, 16)
    )
    return pairs.groupby("query_id").map_groups(final, batch_format="pandas")


def range_search_oracle(n_queries: int = N_QUERIES,
                        tau: float = RANGE_TAU) -> str:
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id < {n_queries}),
hits AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                list_cosine_similarity(q.qe, e.embedding) AS sim
         FROM q CROSS JOIN embeddings e
         WHERE e.vec_id <> q.query_id
           AND list_cosine_similarity(q.qe, e.embedding) >= {tau})
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id ASC)
            AS BIGINT) AS rank
FROM hits
"""


def knn_mips(sf_dir: str, n_queries: int = N_QUERIES, k: int = TOP_K):
    """Exact MAXIMUM-INNER-PRODUCT top-k — the retrieval metric when
    magnitudes carry signal (recommender scores, unnormalized text
    embeddings): rank by raw <q, v>, data vectors NOT normalized
    (queries are, making the two metrics genuinely differ). Same
    partial-top-k-per-batch -> tiny per-query final shape as
    :func:`knn_brute`; ordering output only (rank, not the score), so
    the driver hash is float-bit-free."""
    import ray

    queries_ref = ray.put(_query_matrix(sf_dir, n_queries))

    class PartialTopK:
        def __init__(self):
            self.queries = ray.get(queries_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in batch["embedding"]]
            )
            sims = vecs @ self.queries.T  # raw inner products
            ids = batch["vec_id"].to_numpy(dtype=np.int64)
            out = []
            for q in range(self.queries.shape[0]):
                col = sims[:, q]
                keep = min(k + 1, len(ids))
                top = np.argpartition(-col, keep - 1)[:keep]
                for i in top:
                    out.append((q, int(ids[i]), float(col[i])))
            return pd.DataFrame(out, columns=["query_id", "neighbor_id", "sim"])

    def final(group: pd.DataFrame) -> pd.DataFrame:
        q = int(group["query_id"].iloc[0])
        g = group[group["neighbor_id"] != q]
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {"query_id": np.full(len(g), q, dtype=np.int64),
             "neighbor_id": g["neighbor_id"].to_numpy(dtype=np.int64),
             "rank": np.arange(1, len(g) + 1, dtype=np.int64)}
        )

    partials = _read_embeddings(sf_dir).map_batches(
        PartialTopK, batch_format="pandas", concurrency=(1, 16)
    )
    return partials.groupby("query_id").map_groups(final, batch_format="pandas")


def knn_mips_oracle(n_queries: int = N_QUERIES, k: int = TOP_K) -> str:
    """list_inner_product against the NORMALIZED query (replayed via
    list_transform / list_sum to normalize q exactly as numpy does:
    q / ||q||, then a plain inner product)."""
    return f"""
WITH q AS (
  SELECT vec_id AS query_id,
         list_transform(embedding,
                        x -> x / sqrt(list_sum(
                               list_transform(embedding, y -> y * y)))) AS qn
  FROM embeddings WHERE vec_id < {n_queries}
),
sims AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                list_inner_product(q.qn, e.embedding) AS sim
         FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id),
ranked AS (SELECT query_id, neighbor_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id ASC) AS rank
           FROM sims)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {k}
"""


COV_DIM = 64  # embeddings table vector length


def embedding_covariance(sf_dir: str, d: int = COV_DIM):
    """Distributed covariance matrix of the embedding columns — the
    statistic behind PCA whitening / drift monitoring, computed the
    mergeable way: each batch contributes the exact int64 second-moment
    matrix X'X of milli-scaled vectors plus first moments and a count
    (d x d + d + 1 numbers per batch, corpus-size-independent); the
    driver sums partials and evaluates the closed form
    ``(Σxy − Σx·Σy/n)/n`` once per (i ≤ j) pair in double — identical
    expression in the SQL twin (which replays the milli scaling via
    list indexing), so even the 2080 covariance doubles hash-match.
    Population covariance, milli² units."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import collect_small

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(
            [np.asarray(v, dtype=np.float64) for v in batch["embedding"]]
        )
        if X.shape[1] != d:
            raise ValueError(f"expected {d}-dim embeddings, got {X.shape[1]}")
        Xm = np.round(X * 1000).astype(np.int64)
        S = Xm.T @ Xm  # (d, d) int64 second moments
        s1 = Xm.sum(axis=0)
        iu, ju = np.triu_indices(d)
        return pd.DataFrame(
            {"i": np.concatenate([iu + 1, np.arange(1, d + 1), [0]]),
             "j": np.concatenate([ju + 1, np.zeros(d, dtype=np.int64), [0]]),
             "v": np.concatenate([S[iu, ju], s1, [np.int64(len(batch))]])}
        ).astype({"i": np.int64, "j": np.int64, "v": np.int64})

    parts = collect_small(
        _read_embeddings(sf_dir).map_batches(partial, batch_format="pandas"),
        ["i", "j", "v"],
    )
    if parts.empty:
        raise ValueError("embedding_covariance requires a non-empty table")
    agg = parts.groupby(["i", "j"], sort=False, as_index=False)["v"].sum()
    n = np.int64(agg.loc[(agg["i"] == 0) & (agg["j"] == 0), "v"].sum())
    firsts = agg[(agg["j"] == 0) & (agg["i"] > 0)].set_index("i")["v"]
    pairs = agg[(agg["i"] > 0) & (agg["j"] > 0)].copy()
    si = firsts.reindex(pairs["i"].to_numpy()).to_numpy(dtype=np.int64)
    sj = firsts.reindex(pairs["j"].to_numpy()).to_numpy(dtype=np.int64)
    sxy = pairs["v"].to_numpy(dtype=np.int64)
    cov = (
        sxy.astype(np.float64) - si.astype(np.float64) * sj / n
    ) / n
    return pd.DataFrame(
        {"i": pairs["i"].to_numpy(dtype=np.int64),
         "j": pairs["j"].to_numpy(dtype=np.int64),
         "n": np.full(len(pairs), n, dtype=np.int64),
         "sxy": sxy, "si": si, "sj": sj,
         "cov_milli2": cov}
    ).sort_values(["i", "j"]).reset_index(drop=True)


def embedding_covariance_oracle(d: int = COV_DIM) -> str:
    return f"""
WITH dims AS (SELECT CAST(unnest(range(1, {d + 1})) AS BIGINT) AS i),
m AS (
  SELECT e.vec_id, dims.i,
         CAST(round(e.embedding[i] * 1000) AS BIGINT) AS x
  FROM embeddings e CROSS JOIN dims
), firsts AS (
  SELECT i, SUM(x) AS s FROM m GROUP BY 1
), tot AS (
  SELECT count(*) AS n FROM embeddings
), pairs AS (
  SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS sxy
  FROM m a JOIN m b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2
)
SELECT p.i, p.j, CAST(n AS BIGINT) AS n,
       CAST(p.sxy AS BIGINT) AS sxy,
       CAST(fi.s AS BIGINT) AS si,
       CAST(fj.s AS BIGINT) AS sj,
       (CAST(p.sxy AS DOUBLE) - CAST(fi.s AS DOUBLE) * fj.s / n) / n
         AS cov_milli2
FROM pairs p
JOIN firsts fi ON fi.i = p.i
JOIN firsts fj ON fj.i = p.j
CROSS JOIN tot
"""


def knn_sq8(sf_dir: str, n_queries: int = N_QUERIES, k: int = TOP_K,
            sample_rows: int = 4096, refine_mult: int = 8):
    """Scalar-quantization (SQ8) top-k: uint8 codes + exact re-rank —
    the simplest ANN memory scale path (4× smaller than float32, 8×
    smaller than float64; unlike PQ the codes keep per-dimension
    resolution, so the approximate scores are already close and a
    small refine multiple suffices). Per-dimension [min, max] ranges
    are fit on the same bounded driver-side sample as the PQ/IVF
    codebooks and broadcast once; each batch then (a) normalizes, (b)
    quantizes every dimension to ``round(255·(x−min)/(max−min))``, (c)
    scores all codes against the pre-quantized query with ONE matmul
    in the code domain (a per-dimension-affine approximation of the
    cosine — close because SQ8 keeps full dimensional resolution), and
    (d) exact-scores only the per-batch top ``refine_mult·(k+1)``
    candidates from the raw vectors already in the batch, which
    repairs any order the affine approximation perturbed. Same tiny
    partial-top-k merge as :func:`knn_brute`; approximate by design —
    recall vs brute is asserted in pytest, rows-only at the driver."""
    import ray

    queries = _query_matrix(sf_dir, n_queries)
    sample = _stream_sample(sf_dir, sample_rows)
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit_sample = sample / norms
    lo = unit_sample.min(axis=0)
    hi = unit_sample.max(axis=0)
    span = np.where(hi - lo <= 0, 1.0, hi - lo)
    ctx_ref = ray.put((queries, lo, span))

    class Sq8TopK:
        def __init__(self):
            self.queries, self.lo, self.span = ray.get(ctx_ref)
            # quantized queries (float retained: q_codes @ codes.T is
            # exact in float64 for values ≤ 255·255·dim ≪ 2^53)
            qn = np.linalg.norm(self.queries, axis=1, keepdims=True)
            qn[qn == 0] = 1.0
            uq = self.queries / qn
            self.q_codes = np.clip(
                np.round(255.0 * (uq - self.lo) / self.span), 0, 255
            )

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in batch["embedding"]]
            )
            nrm = np.linalg.norm(vecs, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            unit = vecs / nrm
            codes = np.clip(
                np.round(255.0 * (unit - self.lo) / self.span), 0, 255
            )
            ids = batch["vec_id"].to_numpy()
            n_refine = min(len(ids), refine_mult * (k + 1))
            approx = codes @ self.q_codes.T  # (n_rows, n_queries)
            out = []
            for q in range(len(self.queries)):
                cand = np.argpartition(-approx[:, q], n_refine - 1)[:n_refine]
                exact = unit[cand] @ (
                    self.queries[q] / max(np.linalg.norm(self.queries[q]), 1e-30)
                )
                for i, s in zip(cand, exact):
                    out.append((q, int(ids[i]), float(s)))
            return pd.DataFrame(out, columns=["query_id", "neighbor_id", "sim"])

    def final(group: pd.DataFrame) -> pd.DataFrame:
        q = int(group["query_id"].iloc[0])
        g = group[group["neighbor_id"] != q]
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "query_id": np.full(len(g), q, dtype=np.int64),
                "neighbor_id": g["neighbor_id"].to_numpy(dtype=np.int64),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    partials = _read_embeddings(sf_dir).map_batches(
        Sq8TopK, batch_format="pandas", concurrency=(1, 16)
    )
    return partials.groupby("query_id").map_groups(final, batch_format="pandas")
