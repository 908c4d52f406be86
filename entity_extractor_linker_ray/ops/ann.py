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
    """Deterministic query set: the embeddings of vec_id 0..n-1."""
    import pyarrow.parquet as pq

    table = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    frame = table.to_pandas().set_index("vec_id").sort_index()
    missing = [i for i in range(n_queries) if i not in frame.index]
    if missing:
        raise ValueError(
            f"ANN query set requires vec_ids 0..{n_queries - 1}; "
            f"missing {missing[:5]}{'...' if len(missing) > 5 else ''} "
            f"(embeddings table has {len(frame)} rows)"
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


def knn_ivf(sf_dir: str, n_queries: int = N_QUERIES, k: int = TOP_K,
            n_lists: int = 16, n_probe: int = 2, seed: int = 37,
            sample_rows: int = 4096):
    """IVF approximate top-k: vectors are binned by nearest centroid;
    each query scores only vectors in its ``n_probe`` nearest lists.
    Centroids fit once on a bounded sample and broadcast via
    ``ray.put``; per batch ONE matmul assigns lists and one masked
    matmul scores — no shuffle at all (the partial-top-k merge is the
    only small exchange, same shape as :func:`knn_brute`)."""
    import pyarrow.parquet as pq

    import ray

    queries = _query_matrix(sf_dir, n_queries)
    # bounded streaming sample: iterate record batches until
    # sample_rows are collected — never materializes the full table on
    # the driver (file-ordered data caveat: pass a larger sample_rows
    # or pre-shuffle when the file is clustered by similarity)
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
    sample = np.stack(collected)
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
