"""Distributed k-means clustering over the ``embeddings`` table.

Lloyd's algorithm in the canonical Ray Data shape: centroids are a
k x dim array shipped per iteration in the task closure (tiny state —
an actor pool would pay spin-up per iteration for nothing), every batch
does ONE vectorized assignment (int64 distance expansion, no Python
per-row work) and collapses itself to k x dim integer partial sums, so
the per-iteration exchange is bounded by ``blocks * k * dim`` rows —
independent of corpus size. The driver only ever touches those partials
(the same bounded-collect pattern as ``kg_linked_counts``); vectors
never leave their blocks.

All arithmetic is integer fixed-point so the result is bit-identical
at any parallelism AND replayable in SQL:

* input elements are rounded to milli units half away from zero
  (matching DuckDB ``round``), as in ``ann.label_centroids``;
* assignment minimizes the exact integer squared L2 distance with ties
  broken toward the lowest cluster id (``np.argmin`` first-occurrence
  == ``row_number() ... ORDER BY d2, cluster``);
* the centroid update is ``floor(sum / n + 0.5)`` (half-up), mirrored
  in SQL as ``CAST(floor(s * 1.0 / n + 0.5) AS BIGINT)`` — sums stay
  far below 2^53 so the float division is exact;
* empty clusters keep their previous centroid (SQL ``LEFT JOIN`` +
  ``CASE``).

That makes the whole iteration SQL-expressible: :func:`kmeans_oracle`
unrolls the fixed iteration count into one CTE pair (assign, update)
per round — the same construction as ``graph_algos.kg_pagerank_oracle``
— so the operator is value-hash-gated by the driver, not rows-only.

Scale notes: each iteration is one streaming pass over the embeddings
(re-read from parquet — at 100 TB you re-scan or pin a milli-encoded
copy; both keep the exchange at k x dim partials). Initialisation is
deterministic: cluster j starts at the embedding of ``vec_id == j``
(k x dim values read driver-side with plain pyarrow — a distributed
read for k rows is pure overhead).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from entity_extractor_linker_ray.ops import memo as _memo

K_CLUSTERS = 8
N_ITERS = 3


def milli_round(x: np.ndarray) -> np.ndarray:
    """float → int64 milli units, half away from zero — THE rounding
    rule every embedding oracle depends on (DuckDB
    ``round(x * 1000)``). One definition, shared with
    ``ann.label_centroids``; keep the two SQL copies in sync with it."""
    return np.copysign(np.floor(np.abs(x) * 1000.0 + 0.5), x).astype(np.int64)


def _milli_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, n x dim int64 milli matrix) from an Arrow batch —
    zero-copy flat values + offsets, reshaped (embeddings are
    fixed-dim, asserted via the offsets)."""
    col = batch.column("embedding").combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0)
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lengths = np.diff(offsets)
    dim = int(lengths[0])
    if not (lengths == dim).all():  # ragged input is a data bug
        raise ValueError("embeddings must be fixed-dimension")
    milli = milli_round(flat)
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    return ids, milli.reshape(len(ids), dim)


def _assign(vecs: np.ndarray, centroids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact integer argmin assignment: ||v-c||^2 expanded as
    vv - 2 v.c + cc, all int64 (elements ≲ 3e3 milli, dim 64 →
    products ≲ 6e8, far from overflow). First-occurrence argmin is the
    lowest-cluster-id tiebreak."""
    vv = np.einsum("ij,ij->i", vecs, vecs)
    cc = np.einsum("ij,ij->i", centroids, centroids)
    d2 = vv[:, None] - 2 * (vecs @ centroids.T) + cc[None, :]
    assign = np.argmin(d2, axis=1)
    return assign, d2[np.arange(len(vecs)), assign]


def _init_centroids(sf_dir: str, k: int) -> np.ndarray:
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    table = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    table = table.filter(pc.less(table.column("vec_id"), k))
    table = table.take(pc.sort_indices(table, sort_keys=[("vec_id", "ascending")]))
    if table.num_rows != k:  # covers the empty table: ValueError, not a
        # shape IndexError from deep inside the matrix builder
        raise ValueError(
            f"k-means seeding requires vec_ids 0..{k - 1} to exist; "
            f"found {table.num_rows} of {k} seed rows"
        )
    ids, milli = _milli_matrix(table)
    # seeds are BY CONTRACT the embeddings of vec_id 0..k-1 (the SQL
    # oracle's c0 does `WHERE vec_id < k`); a sparse or offset id space
    # must fail loudly here, identically on every path — silently
    # seeding from other rows would break distributed ≡ local ≡ SQL
    if len(ids) != k or not (ids == np.arange(k)).all():
        raise ValueError(
            f"k-means seeding requires vec_ids 0..{k - 1} to exist; "
            f"found {ids.tolist()}"
        )
    return milli


_FIT_CACHE: dict = _memo.register({})


def _fit(sf_dir: str, k: int, iters: int):
    """(pinned embeddings Dataset, final centroids) after ``iters``
    Lloyd rounds — shared by :func:`kmeans_clusters`,
    :func:`semantic_dup_pairs` and :func:`knn_join_within_cells`, and
    session-memoized (the `ngram_pairs_materialized` pattern): the
    iteration is deterministic, so every consumer in a session reads
    the same pinned working set + centroid table instead of re-running
    Lloyd rounds."""
    cache_key = (sf_dir, k, iters)
    if cache_key in _FIT_CACHE:
        _FIT_CACHE[cache_key] = _FIT_CACHE.pop(cache_key)  # LRU refresh
        return _FIT_CACHE[cache_key]
    import ray.data as rd

    # One read, pinned for the iteration loop: k-means makes iters+1
    # passes over the SAME data, so the working set is materialized
    # once (the canonical iterative-ML cache, as Spark MLlib does) —
    # re-reading parquet per pass costs a full scan + decode each
    # round. Default block sizing: the assignment kernel is one cheap
    # matmul per batch, so forcing read_split's 2-blocks-per-CPU here
    # just buys scheduling overhead.
    embs = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()
    centroids = _init_centroids(sf_dir, k)
    dim = centroids.shape[1]

    # Plain task functions, NOT actor pools: the per-iteration state is
    # one k x dim int64 array (~4 KB) — closure capture ships it with
    # each task for free, while an actor pool would pay pool spin-up
    # once per iteration (measured: the pools dominated the wall).
    def update_partials(batch: pa.Table, *, c: np.ndarray) -> pd.DataFrame:
        _, vecs = _milli_matrix(batch)
        assign, _ = _assign(vecs, c)
        kk, dd = c.shape
        sums = np.zeros((kk, dd), dtype=np.int64)
        np.add.at(sums, assign, vecs)
        counts = np.bincount(assign, minlength=kk).astype(np.int64)
        return pd.DataFrame(
            {
                "cluster": np.repeat(np.arange(kk, dtype=np.int64), dd),
                "pos": np.tile(np.arange(dd, dtype=np.int64), kk),
                "s": sums.ravel(),
                "n": np.repeat(counts, dd),
            }
        )

    for _ in range(iters):
        parts = embs.map_batches(
            update_partials, batch_format="pyarrow", fn_kwargs={"c": centroids}
        ).to_pandas()  # ≤ blocks * k * dim short integer rows — bounded
        agg = parts.groupby(["cluster", "pos"], sort=True).agg(
            s=("s", "sum"), n=("n", "sum")
        )
        s = agg["s"].to_numpy().reshape(k, dim)
        n = agg["n"].to_numpy().reshape(k, dim)
        new = centroids.copy()
        mask = n > 0
        new[mask] = np.floor(s[mask] / n[mask] + 0.5).astype(np.int64)
        centroids = new

    _FIT_CACHE[cache_key] = (embs, centroids)
    while len(_FIT_CACHE) > _memo.DEFAULT_KEEP:  # bound pinned fits
        _FIT_CACHE.pop(next(iter(_FIT_CACHE)))
    return embs, centroids


def kmeans_clusters(sf_dir: str, k: int = K_CLUSTERS, iters: int = N_ITERS):
    """(vec_id, cluster, dist2) under the final centroids after
    ``iters`` Lloyd iterations. ``dist2`` is the exact integer squared
    L2 distance in milli units."""
    embs, centroids = _fit(sf_dir, k, iters)

    def final_assign(batch: pa.Table, *, c: np.ndarray) -> pd.DataFrame:
        ids, vecs = _milli_matrix(batch)
        assign, d2 = _assign(vecs, c)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": assign.astype(np.int64),
                "dist2": d2.astype(np.int64),
            }
        )

    return embs.map_batches(
        final_assign, batch_format="pyarrow", fn_kwargs={"c": centroids}
    )


SEMANTIC_DUP_THRESHOLD = 1_300_000  # milli^2; vectors are unit-norm (median
# pairwise dist2 ≈ 2e6), so this keeps roughly the closest ~0.2% of pairs


def semantic_dup_pairs(sf_dir: str, k: int = K_CLUSTERS, iters: int = N_ITERS,
                       threshold: int = SEMANTIC_DUP_THRESHOLD,
                       max_cell: int | None = None):
    """Clustering-assisted embedding near-dup: all pairs within the
    SAME k-means cell at squared L2 distance ≤ ``threshold`` — the
    exact-within-cell variant of ``dedupe.embedding_neardup``. The
    k-means cells bound the all-pairs blow-up to Σ|cell|² instead of
    n² (choose k ∝ n/target_cell for a constant per-cell cost), and
    because the fixed-point clustering is SQL-replayable this near-dup
    IS oracle-gated, unlike the LSH variants. Caveat shared with every
    bucketed near-dup (IVF, LSH): a pair straddling a cell boundary is
    missed; the planted-pair test plants INSIDE a cell.

    One extra exchange after the fit: vectors shuffle by final cell,
    each bucket runs one vectorized distance expansion per cell.
    ``max_cell`` (off by default — the oracle has no cap) truncates
    oversized cells defensively at scale, logging what was dropped."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    embs, centroids = _fit(sf_dir, k, iters)

    def tag(batch: pa.Table, *, c: np.ndarray) -> pd.DataFrame:
        ids, vecs = _milli_matrix(batch)
        assign, _ = _assign(vecs, c)
        return pd.DataFrame(
            {
                "cluster": assign.astype(np.int64),
                "vec_id": ids,
                "milli": list(vecs),  # int64 rows; Arrow list column
            }
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_d = [], [], []
        for _, g in bucket.groupby("cluster", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("vec_id")
            if max_cell is not None and len(g) > max_cell:
                import logging

                logging.getLogger(__name__).warning(
                    "semantic_dup_pairs: truncating cell of %d to %d",
                    len(g), max_cell,
                )
                g = g.head(max_cell)
            ids = g["vec_id"].to_numpy(dtype=np.int64)
            m = np.stack(g["milli"].to_numpy())
            vv = np.einsum("ij,ij->i", m, m)
            d2 = vv[:, None] - 2 * (m @ m.T) + vv[None, :]
            ai, bi = np.triu_indices(len(g), 1)
            keep = d2[ai, bi] <= threshold
            out_a.append(ids[ai[keep]])
            out_b.append(ids[bi[keep]])
            out_d.append(d2[ai[keep], bi[keep]])
        if not out_a:
            return pd.DataFrame(
                {"a_id": np.array([], dtype=np.int64),
                 "b_id": np.array([], dtype=np.int64),
                 "dist2": np.array([], dtype=np.int64)}
            )
        return pd.DataFrame(
            {"a_id": np.concatenate(out_a),
             "b_id": np.concatenate(out_b),
             "dist2": np.concatenate(out_d)}
        ).astype({"a_id": np.int64, "b_id": np.int64, "dist2": np.int64})

    tagged = embs.map_batches(tag, batch_format="pyarrow", fn_kwargs={"c": centroids})
    return grouped_aggregate(tagged, ["cluster"], combine, num_partitions=8)


def semantic_dup_oracle(k: int = K_CLUSTERS, iters: int = N_ITERS,
                        threshold: int = SEMANTIC_DUP_THRESHOLD) -> str:
    """The shared kmeans WITH-block, then a same-cell self-join with
    the exact integer pair distance."""
    return (
        _kmeans_with_block(k, iters)
        + f""",
p AS (
  SELECT x.vec_id AS a_id, y.vec_id AS b_id
  FROM fin x JOIN fin y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
)
SELECT p.a_id, p.b_id, CAST(SUM((va.milli - vb.milli) * (va.milli - vb.milli)) AS BIGINT) AS dist2
FROM p
JOIN v va ON va.vec_id = p.a_id
JOIN v vb ON vb.vec_id = p.b_id AND vb.pos = va.pos
GROUP BY 1, 2
HAVING SUM((va.milli - vb.milli) * (va.milli - vb.milli)) <= {threshold}"""
    )


def kmeans_local(sf_dir: str, k: int = K_CLUSTERS, iters: int = N_ITERS) -> pd.DataFrame:
    """Single-machine replica of :func:`kmeans_clusters` (same integer
    rules, no Ray) — the third corner of the distributed ≡ local ≡ SQL
    triangle asserted in tests."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    table = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    table = table.take(pc.sort_indices(table, sort_keys=[("vec_id", "ascending")]))
    ids, vecs = _milli_matrix(table)
    seed_idx = np.searchsorted(ids, np.arange(k))
    if seed_idx.max(initial=0) >= len(ids) or not (
        ids[seed_idx] == np.arange(k)
    ).all():
        raise ValueError(
            f"k-means seeding requires vec_ids 0..{k - 1} to exist"
        )
    centroids = vecs[seed_idx]
    for _ in range(iters):
        assign, _ = _assign(vecs, centroids)
        new = centroids.copy()
        for c in range(k):
            members = vecs[assign == c]
            if len(members):
                new[c] = np.floor(
                    members.sum(axis=0) / len(members) + 0.5
                ).astype(np.int64)
        centroids = new
    assign, d2 = _assign(vecs, centroids)
    return pd.DataFrame(
        {"vec_id": ids, "cluster": assign.astype(np.int64), "dist2": d2.astype(np.int64)}
    )


def _assignment_sql(centroid_cte: str) -> str:
    """The one assignment subquery (exact integer argmin with
    lowest-cluster tiebreak) against a given centroid CTE — the single
    source for the per-iteration a{i} CTEs AND the final assignment
    every derived oracle consumes."""
    return f"""  SELECT vec_id, cluster, d2 FROM (
    SELECT v.vec_id, c.cluster,
           SUM((v.milli - c.milli) * (v.milli - c.milli)) AS d2,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY SUM((v.milli - c.milli) * (v.milli - c.milli)), c.cluster
           ) AS rn
    FROM v JOIN {centroid_cte} c USING (pos)
    GROUP BY v.vec_id, c.cluster
  ) WHERE rn = 1"""


def _kmeans_with_block(k: int, iters: int) -> str:
    """``WITH v, c0, a1, c1, ..., c{iters}, fin`` — the complete
    unrolled fixed-point iteration (one assign/update CTE pair per
    round, as in ``kg_pagerank_oracle``) ending in ``fin`` =
    (vec_id, cluster, d2) under the final centroids. Every kmeans-
    family oracle appends its own final SELECT to this block."""
    parts = [
        f"""v AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
         CAST(round(unnest(embedding) * 1000) AS BIGINT) AS milli
  FROM embeddings
),
c0 AS (SELECT vec_id AS cluster, pos, milli FROM v WHERE vec_id < {k})"""
    ]
    for i in range(1, iters + 1):
        parts.append(f"a{i} AS (\n{_assignment_sql(f'c{i - 1}')}\n)")
        parts.append(
            f"""c{i} AS (
  SELECT p.cluster, p.pos,
         CASE WHEN m.n IS NULL THEN p.milli
              ELSE CAST(floor(m.s * 1.0 / m.n + 0.5) AS BIGINT) END AS milli
  FROM c{i - 1} p LEFT JOIN (
    SELECT a.cluster, v.pos, SUM(v.milli) AS s, COUNT(*) AS n
    FROM a{i} a JOIN v USING (vec_id)
    GROUP BY 1, 2
  ) m ON m.cluster = p.cluster AND m.pos = p.pos
)"""
        )
    parts.append(f"fin AS (\n{_assignment_sql(f'c{iters}')}\n)")
    return "WITH " + ",\n".join(parts)


def kmeans_oracle(k: int = K_CLUSTERS, iters: int = N_ITERS) -> str:
    """Unrolled-CTE DuckDB replay of the fixed-point iteration."""
    return (
        _kmeans_with_block(k, iters)
        + "\nSELECT vec_id, cluster, CAST(d2 AS BIGINT) AS dist2 FROM fin"
    )


def kmeans_exemplars(sf_dir: str, k: int = K_CLUSTERS, iters: int = N_ITERS):
    """One exemplar per cluster: the member closest to its final
    centroid (vec_id tiebreak) plus the cluster size — the
    representative-selection step behind cluster labeling and
    coreset construction. Rides the assignment pass: per batch a
    partial argmin per cluster (≤ k rows leave each batch), then one
    tiny final argmin + size merge — the same partial/final shape as
    the top-k ops, shuffle bounded by k·blocks."""
    import pyarrow as pa

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    assigned = kmeans_clusters(sf_dir, k, iters)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df.sort_values(["cluster", "dist2", "vec_id"], kind="stable")
        best = df.drop_duplicates("cluster", keep="first")
        sizes = df.groupby("cluster", sort=True).size()
        best = best.sort_values("cluster")
        return pd.DataFrame(
            {"cluster": best["cluster"].to_numpy(dtype=np.int64),
             "exemplar_id": best["vec_id"].to_numpy(dtype=np.int64),
             "dist2": best["dist2"].to_numpy(dtype=np.int64),
             "n_members": sizes.to_numpy(dtype=np.int64)}
        )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {"cluster": np.array([], dtype=np.int64),
                 "exemplar_id": np.array([], dtype=np.int64),
                 "dist2": np.array([], dtype=np.int64),
                 "n_members": np.array([], dtype=np.int64)}
            )
        df = bucket.sort_values(["cluster", "dist2", "exemplar_id"], kind="stable")
        sizes = df.groupby("cluster", sort=True)["n_members"].sum()
        best = df.drop_duplicates("cluster", keep="first").sort_values("cluster")
        return pd.DataFrame(
            {"cluster": best["cluster"].to_numpy(dtype=np.int64),
             "exemplar_id": best["exemplar_id"].to_numpy(dtype=np.int64),
             "dist2": best["dist2"].to_numpy(dtype=np.int64),
             "n_members": sizes.to_numpy(dtype=np.int64)}
        )

    parts = assigned.map_batches(partial, batch_format="pyarrow")
    return grouped_aggregate(parts, ["cluster"], final, num_partitions=4)


def kmeans_exemplars_oracle(k: int = K_CLUSTERS, iters: int = N_ITERS) -> str:
    """The shared kmeans WITH-block + one ROW_NUMBER medoid pick."""
    return (
        _kmeans_with_block(k, iters)
        + """
SELECT cluster, vec_id AS exemplar_id, CAST(d2 AS BIGINT) AS dist2,
       CAST(n_members AS BIGINT) AS n_members
FROM (
  SELECT cluster, vec_id, d2,
         row_number() OVER (PARTITION BY cluster ORDER BY d2, vec_id) AS rn,
         count(*) OVER (PARTITION BY cluster) AS n_members
  FROM fin
) WHERE rn = 1"""
    )


def kmeans_separation(sf_dir: str, k: int = K_CLUSTERS, iters: int = N_ITERS):
    """Cluster-quality profile under the final centroids: per cluster,
    member count, summed exact d2 to the OWN centroid (cohesion) and
    summed exact d2 to the SECOND-nearest centroid (separation) — the
    integer-exact core of a silhouette/Davies-Bouldin style diagnostic,
    kept as raw sums so any normalized score derives bit-reproducibly
    downstream. Second-nearest uses the same (d2, cluster) tiebreak as
    the assignment itself, so the oracle's ``row_number() = 2`` pick
    matches exactly.

    Shape: one extra argmin over the SAME n×k distance matrix the
    assignment already computes — per-batch partials collapse to ≤ k
    rows, one tiny cluster-keyed final merge. Per-point d2_own ≤
    d2_second by construction, so intra_d2 ≤ nearest_other_d2 holds per
    cluster (asserted in pytest)."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    embs, centroids = _fit(sf_dir, k, iters)

    def partial(batch: pa.Table, *, c: np.ndarray) -> pd.DataFrame:
        _, vecs = _milli_matrix(batch)
        vv = np.einsum("ij,ij->i", vecs, vecs)
        cc = np.einsum("ij,ij->i", c, c)
        d2 = vv[:, None] - 2 * (vecs @ c.T) + cc[None, :]
        best = np.argmin(d2, axis=1)  # first occurrence = low cluster
        rows = np.arange(len(vecs))
        d2_own = d2[rows, best]
        d2_masked = d2.copy()
        d2_masked[rows, best] = np.iinfo(np.int64).max
        second = np.argmin(d2_masked, axis=1)
        d2_sec = d2[rows, second]
        kk = c.shape[0]
        return pd.DataFrame(
            {
                "cluster": np.arange(kk, dtype=np.int64),
                "n_members": np.bincount(best, minlength=kk).astype(np.int64),
                "intra_d2": np.bincount(
                    best, weights=d2_own, minlength=kk
                ).astype(np.int64),
                "nearest_other_d2": np.bincount(
                    best, weights=d2_sec, minlength=kk
                ).astype(np.int64),
            }
        )

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {"cluster": np.array([], dtype=np.int64),
                 "n_members": np.array([], dtype=np.int64),
                 "intra_d2": np.array([], dtype=np.int64),
                 "nearest_other_d2": np.array([], dtype=np.int64)}
            )
        out = (
            bucket.groupby("cluster", sort=True)
            .agg(n_members=("n_members", "sum"),
                 intra_d2=("intra_d2", "sum"),
                 nearest_other_d2=("nearest_other_d2", "sum"))
            .reset_index()
        )
        # empty clusters contribute zero-rows from every batch; the
        # SQL group over fin never sees them
        out = out[out["n_members"] > 0]
        return out.astype({c: np.int64 for c in out.columns})

    parts = embs.map_batches(partial, batch_format="pyarrow",
                             fn_kwargs={"c": centroids})
    return grouped_aggregate(parts, ["cluster"], final, num_partitions=4)


def kmeans_separation_oracle(k: int = K_CLUSTERS, iters: int = N_ITERS) -> str:
    """Shared kmeans WITH-block + a ``row_number() = 2`` second-nearest
    CTE joined back to the final assignment."""
    return (
        _kmeans_with_block(k, iters)
        + f""",
sec AS (
  SELECT vec_id, d2 FROM (
    SELECT v.vec_id,
           SUM((v.milli - c.milli) * (v.milli - c.milli)) AS d2,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY SUM((v.milli - c.milli) * (v.milli - c.milli)),
                      c.cluster
           ) AS rn
    FROM v JOIN c{iters} c USING (pos)
    GROUP BY v.vec_id, c.cluster
  ) WHERE rn = 2
)
SELECT f.cluster,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(f.d2) AS BIGINT) AS intra_d2,
       CAST(sum(s.d2) AS BIGINT) AS nearest_other_d2
FROM fin f JOIN sec s USING (vec_id)
GROUP BY 1"""
    )


PCA_ITERS = 3
EMB_DIM = 64


def pca_power_component(sf_dir: str, d: int = EMB_DIM,
                        iters: int = PCA_ITERS):
    """Top principal direction of the embeddings via integer
    fixed-point power iteration — the spectral statistic behind PCA
    whitening, drift detection and spectral dedup, computed without
    ever materializing the d×d covariance eigendecomposition: repeat
    ``w = Xᵀ(Xv)`` (uncentered second-moment operator — the top RIGHT
    singular direction of the milli matrix) and rescale.

    Exactness contract (the :func:`kmeans_clusters` discipline —
    bit-identical at any parallelism AND replayable in SQL):

    * vectors are milli-rounded int64 (shared :func:`milli_round`);
    * the start vector is the constant ``v₀ = 1000`` per dimension
      (deterministic; a start orthogonal to the top component is a
      measure-zero accident of the data, not of a seed);
    * the rescale after each application is pure integer arithmetic —
      ``denom = max|w| // 1000 + 1``, ``v = sign(w)·(|w| // denom)``
      (floor division on NON-NEGATIVE operands only, so numpy and
      DuckDB agree; keeps ``|v| ≤ ~1000`` so every later product fits
      int64 up to ~5·10⁶ vectors per application — beyond that,
      re-milli the partials per shard before summing).

    Scale shape: one streaming pass per iteration; each batch collapses
    itself to a d-row partial ``X_bᵀ(X_b v)`` (corpus-size-independent,
    the :func:`~entity_extractor_linker_ray.ops.ann.embedding_covariance`
    bounded-collect pattern), the driver only ever sums d-row frames
    and holds the d-vector between rounds."""
    from entity_extractor_linker_ray.ops.ann import _read_embeddings
    from entity_extractor_linker_ray.ops.shuffle import collect_small

    v = np.full(d, 1000, dtype=np.int64)

    for _ in range(iters):
        v_now = v.copy()

        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            X = np.stack(
                [np.asarray(e, dtype=np.float64) for e in batch["embedding"]]
            )
            if X.shape[1] != d:
                raise ValueError(f"expected {d}-dim embeddings, got {X.shape[1]}")
            Xm = milli_round(X)
            dot = Xm @ v_now  # (n,) int64
            w = Xm.T @ dot  # (d,) int64
            return pd.DataFrame(
                {"i": np.arange(1, d + 1, dtype=np.int64), "w": w}
            )

        parts = collect_small(
            _read_embeddings(sf_dir).map_batches(partial, batch_format="pandas"),
            ["i", "w"],
        )
        if parts.empty:
            raise ValueError("pca_power_component requires a non-empty table")
        w = (
            parts.groupby("i", sort=True)["w"].sum().to_numpy(dtype=np.int64)
        )
        denom = int(np.abs(w).max()) // 1000 + 1
        v = (np.sign(w) * (np.abs(w) // denom)).astype(np.int64)

    return pd.DataFrame(
        {"d": np.arange(1, d + 1, dtype=np.int64), "component": v}
    )


def pca_power_component_oracle(d: int = EMB_DIM,
                               iters: int = PCA_ITERS) -> str:
    """Unrolled-CTE replay of the fixed-point power iteration — one
    (dot, w, v) CTE triple per round, the :func:`kmeans_oracle`
    construction."""
    parts = [f"""
WITH dims AS (SELECT CAST(unnest(range(1, {d + 1})) AS BIGINT) AS i),
m AS (
  SELECT e.vec_id, dims.i,
         CAST(round(e.embedding[i] * 1000) AS BIGINT) AS x
  FROM embeddings e CROSS JOIN dims
),
v0 AS (SELECT i, CAST(1000 AS BIGINT) AS v FROM dims)"""]
    for r in range(1, iters + 1):
        parts.append(f""",
dot{r} AS (
  SELECT m.vec_id, CAST(SUM(m.x * v{r - 1}.v) AS BIGINT) AS s
  FROM m JOIN v{r - 1} USING (i) GROUP BY 1
),
w{r} AS (
  SELECT m.i, CAST(SUM(m.x * dot{r}.s) AS BIGINT) AS w
  FROM m JOIN dot{r} USING (vec_id) GROUP BY 1
),
den{r} AS (SELECT MAX(abs(w)) // 1000 + 1 AS dn FROM w{r}),
v{r} AS (
  SELECT i,
         CAST(CASE WHEN w < 0 THEN -((-w) // dn) ELSE w // dn END
              AS BIGINT) AS v
  FROM w{r} CROSS JOIN den{r}
)""")
    parts.append(f"""
SELECT i AS d, v AS component FROM v{iters}""")
    return "".join(parts)


_SEM_PAIRS_CACHE: dict = _memo.register({})


def semantic_pairs_materialized(sf_dir: str):
    """Memoized :func:`semantic_dup_pairs` at default parameters — the
    `ngram_pairs_materialized` pattern for the embedding-space pair
    stream (clustering + cell scans run once per session; the cluster
    consumer reads the pinned result). Bounded keep-last-N (ops.memo)
    so a multi-sf sweep doesn't accumulate pinned working sets."""
    return _memo.memoize(
        _SEM_PAIRS_CACHE, sf_dir,
        lambda: semantic_dup_pairs(sf_dir).materialize(),
    )


def semantic_dup_clusters(sf_dir: str, max_iters: int = 25):
    """(vec_id, cluster_id) connected components over the SEMANTIC
    near-dup pairs — the embedding-space twin of
    `graph_algos.duplicate_clusters`: two documents whose embeddings
    sit within the same k-means cell at distance ≤ threshold are the
    same content family even when their n-grams differ (paraphrases,
    translations), and survivor selection needs the transitive family,
    not raw pairs. cluster_id = min vec_id of the component.

    Because the underlying pair stream is the fixed-point,
    SQL-replayable :func:`semantic_dup_pairs` (NOT the LSH variant),
    the whole clustering IS oracle-gated: the DuckDB twin wraps the
    pair query in the same recursive min-label CTE as
    `duplicate_clusters_oracle`. Shape: min-label propagation over
    pair-involved vectors only (bounded by 2·|pairs|), two bucketed
    exchanges per round."""
    import pyarrow as pa
    import ray.data as rd

    from entity_extractor_linker_ray.ops.graph_algos import (
        min_label_components,
    )

    pairs = semantic_pairs_materialized(sf_dir).select_columns(
        ["a_id", "b_id"]
    )

    def both_dirs(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["a_id"].to_numpy(dtype=np.int64)
        b = batch["b_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"s": np.concatenate([a, b]), "d": np.concatenate([b, a])}
        )

    labels = min_label_components(
        pairs.map_batches(both_dirs, batch_format="pandas"),
        max_iters=max_iters, num_partitions=16,
    )

    def rename(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"vec_id": batch["node"].to_numpy(dtype=np.int64),
             "cluster_id": batch["label"].to_numpy(dtype=np.int64)}
        )

    out_schema = pa.schema([("vec_id", pa.int64()),
                            ("cluster_id", pa.int64())])
    return labels.map_batches(rename, batch_format="pandas").union(
        rd.from_arrow(out_schema.empty_table())
    )


def semantic_dup_clusters_oracle(k: int = K_CLUSTERS, iters: int = N_ITERS,
                                 threshold: int = SEMANTIC_DUP_THRESHOLD) -> str:
    return f"""
WITH RECURSIVE pairs AS ({semantic_dup_oracle(k, iters, threshold).strip()}),
edges AS (
  SELECT a_id AS s, b_id AS d FROM pairs
  UNION ALL
  SELECT b_id AS s, a_id AS d FROM pairs
),
nodes AS (SELECT DISTINCT s AS node FROM edges),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.d AS node, r.label
  FROM reach r JOIN edges e ON e.s = r.node
  WHERE r.label < e.d
)
SELECT node AS vec_id, min(label) AS cluster_id
FROM reach GROUP BY node
"""


KNN_JOIN_K = 3


def knn_join_within_cells(sf_dir: str, k: int = K_CLUSTERS,
                          iters: int = N_ITERS,
                          n_neighbors: int = KNN_JOIN_K):
    """ALL-pairs k-nearest-neighbor JOIN, cell-bounded: for EVERY
    vector, its ``n_neighbors`` nearest other vectors within the same
    final k-means cell (exact integer squared L2, ties broken toward
    the lower vec_id) — the kNN-graph construction primitive behind
    semantic dedup graphs, kNN classifiers and graph-based ANN
    indexes. Unlike the fixed-query ``knn_*`` family this scores the
    whole corpus against itself; the k-means cells bound the
    quadratic exactly as in :func:`semantic_dup_pairs`, and the same
    caveat applies (a true neighbor straddling a cell boundary is
    missed — the IVF nprobe=1 trade, stated rather than hidden).

    Shape: one exchange after the shared fit — vectors shuffle by
    final cell, each bucket runs one vectorized distance expansion
    per cell and keeps ``lexsort``-ed top rows per vector. Output is
    ≤ n·n_neighbors rows. Oracle: the shared kmeans WITH-block plus a
    same-cell self-join under ``row_number() OVER (PARTITION BY
    vec_id ORDER BY d2, neighbor)``."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    embs, centroids = _fit(sf_dir, k, iters)

    def tag(batch: pa.Table, *, c: np.ndarray) -> pd.DataFrame:
        ids, vecs = _milli_matrix(batch)
        assign, _ = _assign(vecs, c)
        return pd.DataFrame(
            {"cluster": assign.astype(np.int64),
             "vec_id": ids,
             "milli": list(vecs)}
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        out_v, out_n, out_d, out_r = [], [], [], []
        for _, g in bucket.groupby("cluster", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("vec_id")
            ids = g["vec_id"].to_numpy(dtype=np.int64)
            m = np.stack(g["milli"].to_numpy())
            vv = np.einsum("ij,ij->i", m, m)
            d2 = vv[:, None] - 2 * (m @ m.T) + vv[None, :]
            np.fill_diagonal(d2, np.iinfo(np.int64).max)  # no self-match
            take = min(n_neighbors, len(g) - 1)
            # per row: order by (d2, neighbor id); lexsort's last key
            # is primary
            order = np.lexsort((np.broadcast_to(ids, d2.shape), d2), axis=1)
            top = order[:, :take]
            rows = np.repeat(np.arange(len(g)), take)
            cols = top.ravel()
            out_v.append(np.repeat(ids, take))
            out_n.append(ids[cols])
            out_d.append(d2[rows, cols])
            out_r.append(np.tile(np.arange(1, take + 1, dtype=np.int64),
                                 len(g)))
        if not out_v:
            return pd.DataFrame(
                {"vec_id": np.array([], dtype=np.int64),
                 "neighbor_id": np.array([], dtype=np.int64),
                 "dist2": np.array([], dtype=np.int64),
                 "nn_rank": np.array([], dtype=np.int64)}
            )
        return pd.DataFrame(
            {"vec_id": np.concatenate(out_v),
             "neighbor_id": np.concatenate(out_n),
             "dist2": np.concatenate(out_d),
             "nn_rank": np.concatenate(out_r)}
        ).astype({c: np.int64 for c in ("vec_id", "neighbor_id", "dist2",
                                        "nn_rank")})

    tagged = embs.map_batches(tag, batch_format="pyarrow",
                              fn_kwargs={"c": centroids})
    return grouped_aggregate(tagged, ["cluster"], combine, num_partitions=8)


def knn_join_within_cells_oracle(k: int = K_CLUSTERS, iters: int = N_ITERS,
                                 n_neighbors: int = KNN_JOIN_K) -> str:
    return (
        _kmeans_with_block(k, iters)
        + f""",
d AS (
  SELECT x.vec_id AS vec_id, y.vec_id AS neighbor_id,
         CAST(SUM((va.milli - vb.milli) * (va.milli - vb.milli)) AS BIGINT)
           AS dist2
  FROM fin x JOIN fin y ON x.cluster = y.cluster AND x.vec_id <> y.vec_id
  JOIN v va ON va.vec_id = x.vec_id
  JOIN v vb ON vb.vec_id = y.vec_id AND vb.pos = va.pos
  GROUP BY 1, 2
)
SELECT vec_id, neighbor_id, dist2, CAST(rn AS BIGINT) AS nn_rank FROM (
  SELECT vec_id, neighbor_id, dist2,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist2, neighbor_id) AS rn
  FROM d
) WHERE rn <= {n_neighbors}"""
    )


FPS_PICKS = 8


def coreset_fps(sf_dir: str, n_picks: int = FPS_PICKS):
    """Farthest-point sampling (greedy k-center) over the embeddings —
    the diversity-selection primitive behind coreset construction and
    seed picking for annotation/eval: start at ``vec_id 0``, then
    repeatedly add the vector FARTHEST from the chosen set (max over
    vectors of min squared L2 to any chosen, ties toward the lower
    vec_id). The emitted ``radius2`` per pick is the k-center covering
    radius curve — how well ``k`` exemplars cover the corpus.

    Exactness: milli int64 vectors (shared :func:`milli_round`), exact
    integer distances, deterministic tie-break — so the greedy argmax
    unrolls into SQL (one dist/sel CTE pair per pick, the
    :func:`kmeans_oracle` discipline) and the driver hash gates it.

    Scale shape: one streaming pass per pick; the ≤ ``n_picks``
    chosen vectors ride in the task closure (tiny), each batch
    computes min-dist-to-chosen vectorized and surrenders only its
    LOCAL argmax row, so the driver picks the global best from
    ≤ #blocks candidates — the `bpe_train_merges` per-bucket-argmax
    pattern. Driver state is the picks themselves, never data."""
    from entity_extractor_linker_ray.ops.ann import _read_embeddings
    from entity_extractor_linker_ray.ops.shuffle import collect_small

    embs = _read_embeddings(sf_dir).materialize()

    seed = _init_centroids(sf_dir, 1)[0]  # milli vector of vec_id 0
    chosen_ids = [np.int64(0)]
    chosen = [seed]
    radii = [np.int64(0)]

    for _ in range(1, n_picks):
        C = np.stack(chosen)

        def far_partial(batch: pa.Table, *, c: np.ndarray) -> pd.DataFrame:
            ids, vecs = _milli_matrix(batch)
            vv = np.einsum("ij,ij->i", vecs, vecs)
            cc = np.einsum("ij,ij->i", c, c)
            d2 = vv[:, None] - 2 * (vecs @ c.T) + cc[None, :]
            mind = d2.min(axis=1)
            # batch-local argmax by (mind desc, id asc)
            best = np.lexsort((ids, -mind))[0]
            return pd.DataFrame(
                {"vec_id": [np.int64(ids[best])],
                 "mind": [np.int64(mind[best])]}
            )

        cands = collect_small(
            embs.map_batches(far_partial, batch_format="pyarrow",
                             fn_kwargs={"c": C}),
            ["vec_id", "mind"],
        )
        cands = cands.sort_values(["mind", "vec_id"],
                                  ascending=[False, True], kind="stable")
        pick = np.int64(cands.iloc[0]["vec_id"])
        radii.append(np.int64(cands.iloc[0]["mind"]))
        chosen_ids.append(pick)
        # fetch the picked vector (one predicate-pushed row read)
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"],
                          filters=[("vec_id", "=", int(pick))])
        _, m = _milli_matrix(t)
        chosen.append(m[0])

    return pd.DataFrame(
        {"pick_order": np.arange(n_picks, dtype=np.int64),
         "vec_id": np.array(chosen_ids, dtype=np.int64),
         "radius2": np.array(radii, dtype=np.int64)}
    )


def coreset_fps_oracle(n_picks: int = FPS_PICKS) -> str:
    """Unrolled greedy argmax: one (dist, mind, sel, rad) CTE group per
    pick; min-dist-so-far is the LEAST() of the per-pick distances."""
    parts = ["""
WITH v AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
         CAST(round(unnest(embedding) * 1000) AS BIGINT) AS milli
  FROM embeddings
),
sel0 AS (SELECT CAST(0 AS BIGINT) AS vec_id)"""]
    for r in range(n_picks - 1):
        least_args = ", ".join(f"d{i}.d2" for i in range(r + 1))
        least_expr = (f"LEAST({least_args})" if r > 0 else "d0.d2")
        joins = "\n".join(
            f"  JOIN dist{i} d{i} USING (vec_id)" for i in range(1, r + 1)
        )
        parts.append(f""",
dist{r} AS (
  SELECT a.vec_id,
         CAST(SUM((a.milli - b.milli) * (a.milli - b.milli)) AS BIGINT) AS d2
  FROM v a JOIN v b ON b.pos = a.pos
                   AND b.vec_id = (SELECT vec_id FROM sel{r})
  GROUP BY 1
),
mind{r} AS (
  SELECT d0.vec_id, {least_expr} AS md
  FROM dist0 d0
{joins}
),
sel{r + 1} AS (
  SELECT vec_id FROM mind{r} ORDER BY md DESC, vec_id LIMIT 1
),
rad{r + 1} AS (SELECT MAX(md) AS md FROM mind{r})""")
    sel_rows = ["SELECT CAST(0 AS BIGINT) AS pick_order, "
                "(SELECT vec_id FROM sel0) AS vec_id, "
                "CAST(0 AS BIGINT) AS radius2"]
    for r in range(1, n_picks):
        sel_rows.append(
            f"SELECT CAST({r} AS BIGINT), (SELECT vec_id FROM sel{r}), "
            f"CAST((SELECT md FROM rad{r}) AS BIGINT)"
        )
    parts.append("\n" + "\nUNION ALL\n".join(sel_rows))
    return "".join(parts)
