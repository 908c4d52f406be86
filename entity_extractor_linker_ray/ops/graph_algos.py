"""Iterative graph algorithms as Ray Data pipelines.

:func:`duplicate_clusters` — connected components over the verified
near-duplicate pairs (`ops/dedupe.py:ngram_jaccard_pairs`), i.e. the
dedup CLUSTER assignment a curation pipeline actually needs (keep one
doc per component, not one per pair). Hash-min label propagation:
every node starts labelled with itself; each round every node takes
the min of its own label and its neighbors' labels; fixpoint in
O(component diameter) rounds.

Scale shape: the pair list is tiny relative to the corpus (only docs
with a near-dup appear), so the edge set and label frontier are
materialized once and iterated — each round is two bucketed two-phase
shuffles (`ops/shuffle.grouped_aggregate`): a hash join of labels to
edge sources, then a min-combine per node. Convergence is detected
from the SUM of labels: hash-min labels are monotonically
non-increasing, so an unchanged sum is exactly "no label changed" —
one cheap scalar aggregate per round instead of an old-vs-new join.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from entity_extractor_linker_ray.ops import memo as _memo

logger = logging.getLogger(__name__)



def _compact(ds, n_blocks: int):
    """Repartition-then-pin. Iterative pipelines RATCHET block counts:
    union sums its inputs' blocks and the bucketed sort preserves
    them, so after k rounds a loop carries O(k * blocks) mostly-empty
    blocks and per-task scheduling overhead dominates wall (measured:
    5 PageRank rounds over a 64-block edge list ran 300+ s; compacted,
    under 30 s). Every materialized loop input/state is squeezed back
    to a fixed block budget first — repartition of the small state is
    ~0.3 s."""
    return ds.repartition(n_blocks).materialize()


# |E| above which the broadcast wedge filter switches from the exact
# sorted uint64 array (8 B/edge — O(|E|) broadcast growth) to the
# bounded-footprint Bloom filter. Both are false-positive-only filters
# and the downstream edge-marker join restores exactness, so the swap
# never changes output — only the broadcast size and the (harmless)
# extra exchange rows. 8M edges = 64 MB exact array, the point where
# per-task deserialization of the broadcast starts to show.
EDGE_FILTER_BLOOM_THRESHOLD = 8_000_000


class _BloomEdgeFilter:
    """Fixed-footprint Bloom filter over uint64 pair hashes.

    ``k`` bit positions per key via Kirsch–Mitzenmacher double hashing
    (pos_i = h1 + i·h2 mod m, h2 forced odd so it generates the whole
    power-of-two ring). Build and probe are pure numpy over the whole
    hash array — no per-key Python. No false negatives by construction;
    false positives only ever ADD (u, v) exchange rows that the
    edge-marker join drops, the same contract as a 64-bit hash
    collision in the exact array. Sized at ``bits_per_key`` (default 16
    → ~0.05% fpp at k=4) and CAPPED at ``max_bits`` (default 2^30 bits
    = 128 MiB) so the broadcast stops growing with |E|; past the cap
    the fpp degrades gracefully instead of the array growing."""

    __slots__ = ("words", "mask", "k")

    _H2_SALT = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio salt

    @staticmethod
    def _mix64(h: np.ndarray) -> np.ndarray:
        """Murmur3-style 64-bit finalizer (public avalanche constants).
        Without it the k positions are affine functions of the SAME low
        bits of the input hash (power-of-two mask), which correlates
        member and probe positions and inflated the measured fpp ~100×
        over the p^k bound."""
        h = np.asarray(h, dtype=np.uint64).copy()
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)
        return h

    def __init__(self, hashes: np.ndarray, *, bits_per_key: int = 16,
                 k: int = 4, max_bits: int = 1 << 30,
                 m_bits: int | None = None):
        if m_bits is None:
            n = max(1, len(hashes))
            target = min(max(n * bits_per_key, 1 << 10), max_bits)
            m_bits = 1 << int(np.ceil(np.log2(target)))
        assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of 2"
        self.mask = np.uint64(m_bits - 1)
        self.k = int(k)
        self.words = np.zeros(m_bits // 64, dtype=np.uint64)
        h = np.asarray(hashes, dtype=np.uint64)
        if len(h):
            for pos in self._positions(h):
                np.bitwise_or.at(
                    self.words, pos >> np.uint64(6),
                    np.uint64(1) << (pos & np.uint64(63)),
                )

    def _positions(self, h: np.ndarray):
        # Kirsch–Mitzenmacher double hashing over two independently
        # avalanched views of the input hash; h2 forced odd so it
        # generates the whole power-of-two ring
        h = np.asarray(h, dtype=np.uint64)
        h1 = self._mix64(h)
        h2 = self._mix64(h ^ self._H2_SALT) | np.uint64(1)
        for i in range(self.k):
            yield (h1 + np.uint64(i) * h2) & self.mask

    def contains(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership mask (true members always True)."""
        out = np.ones(len(h), dtype=bool)
        h = np.asarray(h, dtype=np.uint64)
        for pos in self._positions(h):
            bits = (self.words[pos >> np.uint64(6)]
                    >> (pos & np.uint64(63))) & np.uint64(1)
            out &= bits.astype(bool)
        return out


_PAIR_C1 = np.uint64(0x9E3779B97F4A7C15)
_PAIR_C2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _string_hashes(s) -> np.ndarray:
    """Per-element uint64 hash of a string Series/array (one pandas C
    pass)."""
    return pd.util.hash_pandas_object(
        pd.Series(s), index=False
    ).to_numpy(dtype=np.uint64)


def _combine_pair(hu: np.ndarray, hv: np.ndarray) -> np.ndarray:
    """Order-sensitive 64-bit combiner of two per-string hash arrays.
    Lets wedge kernels probe the edge filter on INT arrays — each
    neighbor string is hashed once and the Σ deg(m)² candidate pairs
    never materialize as object columns (collisions stay
    exactness-safe via the edge-marker join)."""
    with np.errstate(over="ignore"):
        return (hu * _PAIR_C1) + (hv * _PAIR_C2)


def _pair_hashes(df: pd.DataFrame, cols: tuple[str, str]) -> np.ndarray:
    return _combine_pair(_string_hashes(df[cols[0]]),
                         _string_hashes(df[cols[1]]))


def _segmented_triu(group_codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All ordered position pairs (ix < iy) WITHIN each contiguous
    group of an already-sorted code array — the wedge enumeration as
    pure index arithmetic (repeat + cumsum), no join and no Python
    per-group work. Returns global position arrays into the input."""
    n = len(group_codes)
    if n == 0:
        z = np.array([], dtype=np.int64)
        return z, z
    # exclusive end position of each row's group
    change = np.flatnonzero(group_codes[1:] != group_codes[:-1]) + 1
    bounds = np.concatenate([change, [n]])
    sizes = np.diff(np.concatenate([[0], bounds]))
    ends = np.repeat(bounds, sizes)
    cnt = ends - np.arange(n) - 1  # pairs each row opens to its right
    total = int(cnt.sum())
    if total == 0:
        z = np.array([], dtype=np.int64)
        return z, z
    ix = np.repeat(np.arange(n, dtype=np.int64), cnt)
    offs = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    iy = np.arange(total, dtype=np.int64) - offs[ix] + ix + 1
    return ix, iy


def _probe_hashes(h: np.ndarray, filt) -> np.ndarray:
    """Boolean membership mask of pre-combined pair hashes against
    either filter representation."""
    if isinstance(filt, _BloomEdgeFilter):
        return filt.contains(h)
    if len(filt) == 0 or len(h) == 0:
        return np.zeros(len(h), dtype=bool)
    idx = np.searchsorted(filt, h)
    idx = np.minimum(idx, len(filt) - 1)
    return filt[idx] == h


def _edge_hash_filter(edges, bloom_threshold: int | None = None):
    """Broadcast semi-join filter for wedge kernels whose consumers
    only keep wedge pairs that ARE edges (edge Jaccard's common
    counts, clustering's closed wedges), shipped once via ``ray.put``.

    Two representations behind one probe contract:

    * |E| ≤ threshold — the EXACT sorted uint64 row-hash array of the
      canonical (u, v) edge set; probing is ``searchsorted``.
    * |E| > threshold — a :class:`_BloomEdgeFilter` over the same
      hashes, whose broadcast footprint is capped instead of growing
      O(|E|) (the 10^8-edge regime where a 64-bit-per-edge array would
      be ~1 GB per worker).

    Either way a false positive only lets a non-edge pair through to
    the exchange, and the downstream edge-marker join drops it — the
    filter is EXACT in the final output while cutting the (u, v)
    exchange from all wedge pairs (Σ deg(m)²-ish) down to ~|E|.

    Build-side trade: the BUILD still collects the 8 B/edge hash array
    to the driver once (traffic-optimal — per-block partial Blooms
    would ship m_bits per block, far more than 8 B/edge at any m worth
    having). What the Bloom bounds is the per-task BROADCAST, the term
    paid once per wedge bucket. If |E| ever exceeds driver heap
    (~10^10 edges), switch the build to per-block partial Bloom words
    OR-merged in a tree reduce and accept the one-time build traffic."""
    import ray

    from entity_extractor_linker_ray.ops.shuffle import collect_small

    if bloom_threshold is None:
        bloom_threshold = EDGE_FILTER_BLOOM_THRESHOLD
    parts = collect_small(
        edges.map_batches(
            lambda b: pd.DataFrame({"h": _pair_hashes(b, ("u", "v"))}),
            batch_format="pandas",
        ),
        ["h"],
    )
    hashes = parts["h"].to_numpy(dtype=np.uint64)
    if len(hashes) > bloom_threshold:
        return ray.put(_BloomEdgeFilter(hashes))
    return ray.put(np.sort(hashes))


def _probe_edge_filter(df: pd.DataFrame, filt,
                       cols: tuple[str, str]) -> pd.DataFrame:
    """Keep rows of ``df`` whose (cols) row-hash is in the edge filter
    (plus false positives — exact sorted array: hash collisions only;
    Bloom: bit collisions too). ``filt`` is whatever
    :func:`_edge_hash_filter` produced."""
    if df.empty:
        return df.iloc[0:0]
    if not isinstance(filt, _BloomEdgeFilter) and len(filt) == 0:
        return df.iloc[0:0]
    return df[_probe_hashes(_pair_hashes(df, cols), filt)]


# NOTE on the celebrity-vertex wedge cap used by every Σ deg(m)²
# kernel: each middle keeps only its lexicographically smallest
# ``max_wedge_deg`` distinct neighbors (sort + groupby-head on the
# bucket, which holds ALL of a middle's rows — deterministic at any
# parallelism; None = exact). The toy-KG oracle-gated queries pass
# None; the 10^5-node synthetic graph engages the cap on its planted
# hubs — the documented cap-or-sample production trade.


def _labels_min(bucket: pd.DataFrame) -> pd.DataFrame:
    return (
        bucket.groupby("node", sort=False)["label"]
        .min()
        .reset_index()
        .astype({"node": np.int64, "label": np.int64})
    )


def min_label_components(edges, max_iters: int = 25,
                         num_partitions: int = 16,
                         require_convergence: bool = True):
    """Generic hash-min connected components over a message-edge
    Dataset with int64 columns ``s`` → ``d`` (pass BOTH directions for
    an undirected graph). Returns (node, label) where label = min node
    id of the component. Each round is two bucketed two-phase
    exchanges; convergence is the monotone label-sum check; state is
    `_compact`-pinned so block counts don't ratchet.

    Hash-min propagates ONE hop per round, so a chain whose hop
    distance from its min-id member exceeds ``max_iters`` would exit
    the loop with stale labels — silently wrong clusters. By default
    the function raises RuntimeError instead of returning unconverged
    state (the oracles compute the full transitive closure); pass
    ``require_convergence=False`` only for budgeted approximations."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    edges = _compact(edges, num_partitions)

    def init_labels(batch: pd.DataFrame) -> pd.DataFrame:
        # Seed from BOTH endpoints so a node appearing only as a
        # destination on a one-direction edge set still gets a label
        # row (matches the replicas and the oracle nodes CTEs, which
        # union s and d). Min-dedup in the aggregate collapses the
        # duplicates, so symmetric edge sets are unchanged.
        n = np.concatenate([batch["s"].to_numpy(dtype=np.int64),
                            batch["d"].to_numpy(dtype=np.int64)])
        return pd.DataFrame({"node": n, "label": n})

    labels = grouped_aggregate(
        edges.map_batches(init_labels, batch_format="pandas"), ["node"], _labels_min,
        num_partitions=num_partitions,
    )
    labels = _compact(labels, num_partitions)
    prev_sum = labels.sum("label") or 0

    def tag_labels(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["node"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"key": n, "node": n,
             "label": batch["label"].to_numpy(dtype=np.int64),
             "side": np.zeros(len(n), dtype=np.int64)}
        )

    def tag_edges(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": batch["s"].to_numpy(dtype=np.int64),
             "node": batch["d"].to_numpy(dtype=np.int64),
             "label": np.full(len(batch), -1, dtype=np.int64),
             "side": np.ones(len(batch), dtype=np.int64)}
        )

    tagged_edges = _compact(
        edges.map_batches(tag_edges, batch_format="pandas"), num_partitions
    )

    def send_msgs(bucket: pd.DataFrame) -> pd.DataFrame:
        own = bucket[bucket["side"] == 0][["key", "node", "label"]]
        e = bucket[bucket["side"] == 1][["key", "node"]]
        if e.empty:
            return own[["node", "label"]]
        msgs = e.merge(
            own[["key", "label"]].rename(columns={"label": "src_label"}), on="key"
        )
        out = pd.concat(
            [own[["node", "label"]],
             msgs[["node", "src_label"]].rename(columns={"src_label": "label"})],
            ignore_index=True,
        )
        return out.astype({"node": np.int64, "label": np.int64})

    for it in range(max_iters):
        unioned = labels.map_batches(tag_labels, batch_format="pandas").union(
            tagged_edges
        )
        candidates = grouped_aggregate(
            unioned, ["key"], send_msgs, num_partitions=num_partitions
        )
        labels = _compact(
            grouped_aggregate(
                candidates, ["node"], _labels_min, num_partitions=num_partitions
            ),
            num_partitions,
        )
        new_sum = labels.sum("label") or 0
        if new_sum == prev_sum:
            logger.info("min_label_components converged after %d rounds", it + 1)
            break
        prev_sum = new_sum
    else:
        if require_convergence:
            raise RuntimeError(
                f"min_label_components did not converge in {max_iters} "
                "rounds — labels would be stale (hash-min moves one hop "
                "per round). Raise max_iters or pass "
                "require_convergence=False for a budgeted approximation."
            )
        logger.warning(
            "min_label_components returning UNCONVERGED labels after %d "
            "rounds", max_iters,
        )
    return labels


def duplicate_clusters(sf_dir: str, max_iters: int = 25):
    """(doc_id, cluster_id) for every document in >=1 verified
    near-dup pair; cluster_id = min doc_id of its component."""
    import pyarrow as pa
    import ray.data as rd

    from entity_extractor_linker_ray.ops.dedupe import ngram_pairs_materialized

    pairs = ngram_pairs_materialized(sf_dir).select_columns(["doc_a", "doc_b"])

    def both_dirs(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["doc_a"].to_numpy(dtype=np.int64)
        b = batch["doc_b"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"s": np.concatenate([a, b]), "d": np.concatenate([b, a])}
        )

    # the frontier is pair-involved docs only — small; fewer buckets
    # cut the per-round barrier cost
    labels = min_label_components(
        pairs.map_batches(both_dirs, batch_format="pandas"),
        max_iters=max_iters, num_partitions=16,
    )

    def rename(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": batch["node"].to_numpy(dtype=np.int64),
             "cluster_id": batch["label"].to_numpy(dtype=np.int64)}
        )

    out_schema = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])
    return labels.map_batches(rename, batch_format="pandas").union(
        rd.from_arrow(out_schema.empty_table())
    )


# per-session cache of the materialized duplicate clustering — the
# iterative label propagation runs once per sf_dir; its four consumers
# (dedup_survivors, dedup_cluster_sizes, curate_documents,
# leakage_safe_split) read the pinned result.
_DUP_CLUSTERS_CACHE: dict = _memo.register({})


def duplicate_clusters_cached(sf_dir: str):
    """Memoized :func:`duplicate_clusters` at default parameters
    (bounded keep-last-N, see ops.memo)."""
    return _memo.memoize(
        _DUP_CLUSTERS_CACHE, sf_dir,
        lambda: duplicate_clusters(sf_dir).materialize(),
    )


def dedup_survivors(sf_dir: str):
    """Survivorship policy over the near-dup components: per cluster,
    keep the doc with the MOST tokens (doc_id tiebreak) and report the
    member count — the canonical-record-selection step that turns a
    duplicate clustering into an actual deduped corpus.

    Join shape: cluster rows and per-doc token counts meet in ONE
    bucketed exchange keyed on hash(doc_id) (tagged union, vectorized
    merge per bucket — the `_pair_payload_join` shape, never a driver
    collect or corpus broadcast even though clusters are usually the
    small side), then the per-cluster argmax is a second, tiny
    exchange bounded by pair-involved docs. Token counts use the same
    space-count formula as the ``doc_stats`` oracle."""
    from entity_extractor_linker_ray.ops.readers import read_split
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    clusters = duplicate_clusters_cached(sf_dir)

    def tag_clusters(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
             "cluster_id": batch["cluster_id"].to_numpy(dtype=np.int64),
             "n_tokens": np.full(len(batch), -1, dtype=np.int64)}
        )

    def tag_tokens(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        n = text.str.len().to_numpy(dtype=np.int64)
        spaces = (n - text.str.replace(" ", "", regex=False).str.len().to_numpy(
            dtype=np.int64))
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
             "cluster_id": np.full(len(batch), -1, dtype=np.int64),
             "n_tokens": np.where(n == 0, 0, spaces + 1).astype(np.int64)}
        )

    docs = read_split(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tagged = clusters.map_batches(tag_clusters, batch_format="pandas").union(
        docs.map_batches(tag_tokens, batch_format="pandas")
    )

    def join_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        c = bucket[bucket["cluster_id"] >= 0][["doc_id", "cluster_id"]]
        t = bucket[bucket["cluster_id"] < 0][["doc_id", "n_tokens"]]
        out = c.merge(t, on="doc_id")
        return out.astype(
            {"doc_id": np.int64, "cluster_id": np.int64, "n_tokens": np.int64}
        )

    joined = grouped_aggregate(tagged, ["doc_id"], join_bucket, num_partitions=16)

    def pick(bucket: pd.DataFrame) -> pd.DataFrame:
        if bucket.empty:
            return pd.DataFrame(
                {"cluster_id": np.array([], dtype=np.int64),
                 "survivor_id": np.array([], dtype=np.int64),
                 "survivor_tokens": np.array([], dtype=np.int64),
                 "n_members": np.array([], dtype=np.int64)}
            )
        df = bucket.copy()
        df["neg_tokens"] = -df["n_tokens"].to_numpy(dtype=np.int64)
        df = df.sort_values(["cluster_id", "neg_tokens", "doc_id"], kind="stable")
        sizes = df.groupby("cluster_id", sort=True).size()
        first = df.drop_duplicates("cluster_id", keep="first").sort_values(
            "cluster_id"
        )
        return pd.DataFrame(
            {"cluster_id": first["cluster_id"].to_numpy(dtype=np.int64),
             "survivor_id": first["doc_id"].to_numpy(dtype=np.int64),
             "survivor_tokens": first["n_tokens"].to_numpy(dtype=np.int64),
             "n_members": sizes.to_numpy(dtype=np.int64)}
        )

    return grouped_aggregate(joined, ["cluster_id"], pick, num_partitions=8)


def dedup_survivors_oracle() -> str:
    return f"""
WITH clus AS ({duplicate_clusters_oracle().strip()}),
tok AS (
  SELECT doc_id,
         CASE WHEN length(COALESCE(text, '')) = 0 THEN 0
              ELSE length(text) - length(replace(text, ' ', '')) + 1 END AS n_tokens
  FROM documents
),
j AS (SELECT c.cluster_id, c.doc_id, t.n_tokens FROM clus c JOIN tok t USING (doc_id)),
r AS (
  SELECT cluster_id, doc_id, n_tokens,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_tokens DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM j
)
SELECT cluster_id, doc_id AS survivor_id,
       CAST(n_tokens AS BIGINT) AS survivor_tokens,
       CAST(n_members AS BIGINT) AS n_members
FROM r WHERE rn = 1
"""


def duplicate_clusters_oracle() -> str:
    from entity_extractor_linker_ray.ops.dedupe import NGRAM_JACCARD_ORACLE

    return f"""
WITH RECURSIVE pairs AS ({NGRAM_JACCARD_ORACLE.strip()}),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION ALL
  SELECT doc_b AS s, doc_a AS d FROM pairs
),
nodes AS (SELECT DISTINCT s AS node FROM edges),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.d AS node, r.label
  FROM reach r JOIN edges e ON e.s = r.node
  WHERE r.label < e.d
)
SELECT node AS doc_id, min(label) AS cluster_id
FROM reach GROUP BY node
"""


PR_SCALE = 1_000_000  # rank fixed-point micro-units
PR_DAMP_NUM = 850_000  # damping 0.85 in micro-units
PR_BASE = PR_SCALE - PR_DAMP_NUM  # (1-d), micro-units


def pagerank(edges_ds, iters: int = 10, num_partitions: int = 32,
             source: str | None = None):
    """Weighted PageRank over an edge Dataset (src, dst, weight) in
    deterministic integer fixed-point arithmetic (micro-units, floor
    division) — bit-identical results at any parallelism, so the
    distributed run can be asserted equal to a single-machine replica.

    Per round, each node sends ``rank * w // out_weight`` along every
    out-edge and new ranks are ``(1-d) + d * sum(in-contributions)``.
    Every round is the same two bucketed shuffles as
    :func:`duplicate_clusters` (hash join of ranks to edge sources,
    then a sum-combine per destination) — message-passing as a Ray
    Data pipeline, no driver-side graph state. Dangling nodes (no
    out-edges) keep contributing nothing; nodes with no in-edges decay
    to the (1-d) floor. Fixed ``iters`` rather than a convergence test
    keeps the driver check reproducible.

    ``source`` switches to PERSONALIZED PageRank: the (1-d) teleport
    mass lands only on ``source`` (random-walk-with-restart from one
    node) instead of uniformly — rank becomes proximity to the source.
    Initial mass likewise starts concentrated there. Same exchanges,
    same fixed-point arithmetic, identical unrolled-CTE oracle shape.
    """
    import pyarrow as pa
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def norm(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": batch["src"].astype(str),
             "dst": batch["dst"].astype(str),
             "weight": batch["weight"].to_numpy(dtype=np.int64)}
        )

    edges = _compact(edges_ds.map_batches(norm, batch_format="pandas"), num_partitions)

    # out-weight per source, joined back onto the edges once
    def out_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby("src", sort=False)["weight"]
            .sum()
            .reset_index(name="out_w")
            .astype({"out_w": np.int64})
        )

    def tag_edge(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": batch["src"], "dst": batch["dst"],
             "weight": batch["weight"].to_numpy(dtype=np.int64),
             "out_w": np.full(len(batch), -1, dtype=np.int64)}
        )

    def tag_out(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": batch["src"], "dst": "",
             "weight": np.zeros(len(batch), dtype=np.int64),
             "out_w": batch["out_w"].to_numpy(dtype=np.int64)}
        )

    out_w = grouped_aggregate(
        edges.map_batches(out_partial, batch_format="pandas"), ["src"],
        lambda b: b.groupby("src", sort=False)["out_w"].sum().reset_index()
        .astype({"out_w": np.int64}),
        num_partitions=num_partitions,
    )

    def attach_out(bucket: pd.DataFrame) -> pd.DataFrame:
        ow = bucket[bucket["out_w"] >= 0][["src", "out_w"]]
        e = bucket[bucket["out_w"] < 0][["src", "dst", "weight"]]
        m = e.merge(ow, on="src", how="inner")
        return m.astype({"weight": np.int64, "out_w": np.int64})

    edges_w = grouped_aggregate(
        edges.map_batches(tag_edge, batch_format="pandas").union(
            out_w.map_batches(tag_out, batch_format="pandas")
        ),
        ["src"], attach_out, num_partitions=num_partitions,
    )
    edges_w = _compact(edges_w, num_partitions)

    # node universe = src ∪ dst
    def node_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.concat([batch["src"], batch["dst"]], ignore_index=True)}
        )

    nodes = grouped_aggregate(
        edges.map_batches(node_rows, batch_format="pandas"), ["node"],
        lambda b: b[["node"]].drop_duplicates(),
        num_partitions=num_partitions,
    )
    nodes = _compact(nodes, num_partitions)

    def init_ranks(b: pd.DataFrame) -> pd.DataFrame:
        if source is None:
            r = np.full(len(b), PR_SCALE, dtype=np.int64)
        else:
            r = np.where(b["node"].to_numpy() == source, PR_SCALE, 0).astype(
                np.int64
            )
        return pd.DataFrame({"node": b["node"], "rank": r})

    ranks = nodes.map_batches(
        init_ranks, batch_format="pandas"
    ).materialize()  # already <= num_partitions blocks (from nodes)

    def tag_rank(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": batch["node"], "dst": "",
             "weight": np.zeros(len(batch), dtype=np.int64),
             "out_w": np.zeros(len(batch), dtype=np.int64),
             "rank": batch["rank"].to_numpy(dtype=np.int64),
             "side": np.zeros(len(batch), dtype=np.int64)}
        )

    def tag_ew(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": batch["src"], "dst": batch["dst"],
             "weight": batch["weight"].to_numpy(dtype=np.int64),
             "out_w": batch["out_w"].to_numpy(dtype=np.int64),
             "rank": np.zeros(len(batch), dtype=np.int64),
             "side": np.ones(len(batch), dtype=np.int64)}
        )

    tagged_edges = _compact(edges_w.map_batches(tag_ew, batch_format="pandas"), num_partitions)

    def contribs(bucket: pd.DataFrame) -> pd.DataFrame:
        r = bucket[bucket["side"] == 0][["key", "rank"]]
        e = bucket[bucket["side"] == 1][["key", "dst", "weight", "out_w"]]
        m = e.merge(r, on="key", how="inner")
        if m.empty:
            return pd.DataFrame(
                {"node": pd.Series([], dtype=str),
                 "contrib": pd.Series([], dtype=np.int64)}
            )
        c = (m["rank"].to_numpy(dtype=np.int64) * m["weight"].to_numpy(dtype=np.int64)
             ) // m["out_w"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"node": m["dst"], "contrib": c.astype(np.int64)})

    def tag_node(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": batch["node"], "contrib": np.full(len(batch), -1, dtype=np.int64)}
        )

    def apply_rank(bucket: pd.DataFrame) -> pd.DataFrame:
        base = bucket[bucket["contrib"] < 0][["node"]].drop_duplicates()
        inc = bucket[bucket["contrib"] >= 0].groupby("node", sort=False)["contrib"].sum()
        out = base.merge(inc.reset_index(), on="node", how="left").fillna(0)
        if source is None:
            base_mass = PR_BASE
        else:
            base_mass = np.where(
                out["node"].to_numpy() == source, PR_BASE, 0
            ).astype(np.int64)
        rank = base_mass + (PR_DAMP_NUM * out["contrib"].to_numpy(dtype=np.int64)) // PR_SCALE
        return pd.DataFrame({"node": out["node"], "rank": rank.astype(np.int64)})

    for _ in range(iters):
        msgs = grouped_aggregate(
            ranks.map_batches(tag_rank, batch_format="pandas").union(tagged_edges),
            ["key"], contribs, num_partitions=num_partitions,
        )
        # apply_rank groups + sums per node itself, so the raw per-
        # bucket contribution partials go straight into the final
        # shuffle — two bucketed exchanges per round, not three
        ranks = _compact(
            grouped_aggregate(
                msgs.union(nodes.map_batches(tag_node, batch_format="pandas")),
                ["node"], apply_rank, num_partitions=num_partitions,
            ),
            num_partitions,
        )

    out_schema = pa.schema([("node", pa.string()), ("rank", pa.int64())])
    return ranks.union(rd.from_arrow(out_schema.empty_table()))


def pagerank_reference(edges: pd.DataFrame, iters: int = 10) -> pd.DataFrame:
    """Single-machine replica of :func:`pagerank`'s exact integer
    arithmetic (for tests: distributed == local, bit for bit)."""
    edges = edges.astype({"weight": np.int64})
    edges["src"] = edges["src"].astype(str)
    edges["dst"] = edges["dst"].astype(str)
    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    out_w = edges.groupby("src")["weight"].sum().to_dict()
    rank = {n: PR_SCALE for n in nodes}
    for _ in range(iters):
        inc = {n: 0 for n in nodes}
        for s, d, w in edges[["src", "dst", "weight"]].itertuples(index=False):
            inc[d] += (rank[s] * int(w)) // out_w[s]
        rank = {n: PR_BASE + (PR_DAMP_NUM * inc[n]) // PR_SCALE for n in nodes}
    return pd.DataFrame(
        {"node": nodes, "rank": [rank[n] for n in nodes]}
    ).astype({"rank": np.int64})


# per-session cache of the materialized co-occurrence edge list: both
# iterative graph queries (pagerank, triangles) start from the same
# derived edges, and the driver runs every query in one process — the
# simple-KG derivation (~3 s at sf0.1) should run once, not per query.
# Mirrors __ray_entry__._KG_OUT_CACHE; a materialized Dataset pins its
# blocks in the object store for the session.
_KG_EDGES_CACHE: dict = _memo.register({})


def _kg_edges_materialized(sf_dir: str):
    from entity_extractor_linker_ray.pipelines.simple_kg import kg_edges

    return _memo.memoize(
        _KG_EDGES_CACHE, sf_dir,
        lambda: kg_edges(sf_dir).materialize(),
    )


def kg_pagerank(sf_dir: str, iters: int = 5):
    """PageRank over the co-occurrence KG edge list (predicate-summed
    weights). Rows-only at the driver (no recursive-aggregate SQL);
    distributed-vs-local bit-equality is asserted in pytest.

    ``iters=5`` for the driver check: each round costs two shuffle
    barriers of fixed latency, which dominates wall on a toy graph
    (the rank VALUES converge to well under fixed-point resolution by
    round 5 on the 12-node KG); at real graph scale rounds are
    compute-bound and iters is a knob like any PageRank's."""
    def to_src_dst(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": batch["subject"], "dst": batch["object"],
             "weight": batch["weight"].to_numpy(dtype=np.int64)}
        )

    edges = _kg_edges_materialized(sf_dir).map_batches(
        to_src_dst, batch_format="pandas"
    )
    return pagerank(edges, iters=iters, num_partitions=8)


def kg_pagerank_oracle(iters: int = 5) -> str:
    """Exact SQL mirror of :func:`kg_pagerank` — possible only because
    the distributed PageRank is deterministic INTEGER fixed-point: each
    round is plain joins + integer floor division, so it unrolls into
    one CTE per iteration over the same co-occurrence edge list the
    ``kg_edges`` oracle defines. All operands are non-negative, so
    DuckDB's ``//`` and numpy's floor division agree bit for bit."""
    from entity_extractor_linker_ray.pipelines import simple_kg

    edges_sql = simple_kg.oracle_sql()["kg_edges"]
    parts = [
        f"""WITH edges AS (
  SELECT subject AS src, object AS dst, CAST(weight AS BIGINT) AS weight
  FROM ({edges_sql}) kg_e
),
outw AS (SELECT src, SUM(weight) AS ow FROM edges GROUP BY 1),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) u
),
r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS rank FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
r{i} AS (
  SELECT n.node,
         CAST({PR_BASE} + ({PR_DAMP_NUM} * COALESCE(c.inc, 0)) // {PR_SCALE}
              AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM((r.rank * e.weight) // o.ow) AS inc
    FROM edges e
    JOIN r{i - 1} r ON r.node = e.src
    JOIN outw o ON o.src = e.src
    GROUP BY 1
  ) c ON c.node = n.node
)"""
        )
    parts.append(f"\nSELECT node, rank FROM r{iters}")
    return "".join(parts)


def triangles(canon_edges_ds, num_partitions: int = 8,
              max_wedge_deg: int | None = None):
    """Triangle count over a CANONICAL undirected edge Dataset
    (columns ``u``/``v``, u < v, one row per distinct unordered pair).

    Standard distributed plan, two bucketed equi-joins and no driver
    graph state: JOIN edges⋈edges on the shared middle vertex to build
    wedges (u < v < w ordering makes each triangle counted exactly
    once), then semi-join wedges against the edge set on (u, w). Both
    joins are the tagged-union + ``grouped_aggregate`` shape. Skew
    note: wedge count is Σ deg(v)², so a celebrity vertex explodes the
    intermediate — ``max_wedge_deg`` caps each middle vertex's
    above-neighbor list (the production cap-or-sample trade; the count
    is then exact on the degree-capped graph). None = uncapped (the
    toy KG's degrees are bounded by the vocabulary)."""
    import pyarrow as pa
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    edges = canon_edges_ds

    # wedges: for middle vertex m, all ordered pairs (a, c) of its
    # neighbors with a < c — join edges to edges on the middle vertex.
    # Tag both endpoint roles of every edge into one exchange on the
    # candidate middle vertex.
    def tag_roles(batch: pd.DataFrame) -> pd.DataFrame:
        # role 0: (m=v, other=u)  — edge arrives at its higher end
        # role 1: (m=u, other=v)  — edge arrives at its lower end
        return pd.DataFrame(
            {"m": pd.concat([batch["v"], batch["u"]], ignore_index=True),
             "other": pd.concat([batch["u"], batch["v"]], ignore_index=True)}
        )

    def wedges(bucket: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for m, grp in bucket.groupby("m", sort=False):
            # only neighbors ABOVE the middle: each triangle {x<y<z}
            # then forms a counted wedge ONLY at its smallest vertex x
            # (pair y,z) — the node-iterator ordering that makes the
            # count exactly-once instead of once per middle
            nbrs = np.sort(grp.loc[grp["other"] > m, "other"].unique())
            if max_wedge_deg is not None and len(nbrs) > max_wedge_deg:
                nbrs = nbrs[:max_wedge_deg]
            if len(nbrs) < 2:
                continue
            ia, ic = np.triu_indices(len(nbrs), k=1)
            outs.append(pd.DataFrame({"a": nbrs[ia], "c": nbrs[ic]}))
        if not outs:
            return pd.DataFrame({"a": pd.Series([], dtype=str),
                                 "c": pd.Series([], dtype=str)})
        return pd.concat(outs, ignore_index=True)

    wedge_ds = grouped_aggregate(
        edges.map_batches(tag_roles, batch_format="pandas"),
        ["m"], wedges, num_partitions=num_partitions,
    )

    # close the wedges: count (a, c) pairs that are also edges
    def tag_wedge(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": batch["a"], "v": batch["c"],
                             "n": np.ones(len(batch), dtype=np.int64)})

    def tag_edge(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": batch["u"], "v": batch["v"],
                             "n": np.full(len(batch), -1, dtype=np.int64)})

    def close(bucket: pd.DataFrame) -> pd.DataFrame:
        is_edge = bucket[bucket["n"] < 0][["u", "v"]].drop_duplicates()
        cnt = bucket[bucket["n"] > 0]
        closed = cnt.merge(is_edge, on=["u", "v"], how="inner")
        return pd.DataFrame({"n_triangles": [np.int64(len(closed))]})

    counts = grouped_aggregate(
        wedge_ds.map_batches(tag_wedge, batch_format="pandas").union(
            edges.map_batches(tag_edge, batch_format="pandas")
        ),
        ["u", "v"], close, num_partitions=num_partitions,
    )

    def total(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n_triangles": [np.int64(batch["n_triangles"].sum())]})

    # every bucket emitted exactly one per-bucket count, so the final
    # reduce is one narrow repartition + a single vectorized sum; the
    # typed empty union pins the schema for a zero-edge corpus
    out_schema = pa.schema([("n_triangles", pa.int64())])
    return counts.repartition(1).map_batches(total, batch_format="pandas").union(
        rd.from_arrow(out_schema.empty_table())
    )


def kg_triangles(sf_dir: str, num_partitions: int = 8):
    """Triangle count over the co-occurrence KG: canonicalize the KG
    edge list to distinct undirected (u, v) pairs, then the generic
    :func:`triangles` plan."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def canon(batch: pd.DataFrame) -> pd.DataFrame:
        u = batch["subject"].astype(str)
        v = batch["object"].astype(str)
        lo = np.where(u < v, u, v)
        hi = np.where(u < v, v, u)
        return pd.DataFrame({"u": lo, "v": hi})[lo != hi]

    edges = grouped_aggregate(
        _kg_edges_materialized(sf_dir).map_batches(canon, batch_format="pandas"),
        ["u", "v"],
        lambda b: b[["u", "v"]].drop_duplicates(),
        num_partitions=num_partitions,
    ).materialize()
    return triangles(edges, num_partitions=num_partitions)


def kg_triangles_oracle() -> str:
    """Plain-SQL triangle count over the same canonical edge set."""
    from entity_extractor_linker_ray.pipelines import simple_kg

    edges_sql = simple_kg.oracle_sql()["kg_edges"]
    return f"""
WITH raw AS (
  SELECT subject AS s, object AS o FROM ({edges_sql}) kg_e
),
edges AS (
  SELECT DISTINCT LEAST(s, o) AS u, GREATEST(s, o) AS v
  FROM raw WHERE s <> o
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM edges e1
JOIN edges e2 ON e2.u = e1.u AND e2.v > e1.v
JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v
"""


def kg_two_hop(sf_dir: str, num_partitions: int = 8, edges_ds=None,
               max_wedge_deg: int | None = None):
    """Per-entity neighborhood profile: ``n_direct`` distinct
    neighbors and ``n_two_hop`` STRICT two-hop neighbors (reachable in
    exactly two hops, neither self nor already direct) — the
    friend-of-friend candidate count behind link prediction. One row
    per connected entity; on a dense graph n_two_hop is legitimately 0.

    Three bucketed exchanges, no driver graph state:

    1. key (a, b): the undirected DISTINCT neighbor-pair list (both
       directions of every edge, deduped across predicates);
    2. key mid: the self-join on the shared middle vertex — each
       bucket merges its incoming (ent -> mid) rows with its outgoing
       (mid -> nb) rows in one vectorized merge, emitting deduped
       (ent, nb) two-hop candidates (Σ deg(mid)² wedge-explosion trade
       as in :func:`kg_triangles`);
    3. key ent: candidates and direct pairs meet in one bucket; two
       groupby-nuniques give n_direct and n_within-two, whose
       difference is the strict count — set arithmetic instead of an
       anti join.

    ``edges_ds`` overrides the corpus KG edge list (columns
    subject/object) for testing on planted graphs."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def both_dirs(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["subject"].astype(str).to_numpy()
        o = batch["object"].astype(str).to_numpy()
        keep = s != o
        return pd.DataFrame(
            {"a": np.concatenate([s[keep], o[keep]]),
             "b": np.concatenate([o[keep], s[keep]])}
        ).drop_duplicates()

    def dedup_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates(["a", "b"])[["a", "b"]]

    base_edges = edges_ds if edges_ds is not None else _kg_edges_materialized(sf_dir)
    undirected = grouped_aggregate(
        base_edges.map_batches(both_dirs, batch_format="pandas"),
        ["a", "b"], dedup_pairs, num_partitions=num_partitions,
    )

    def tag_for_mid(batch: pd.DataFrame) -> pd.DataFrame:
        # each undirected pair plays both roles: (ent -> mid) keyed by
        # its b, and (mid -> nb) keyed by its a
        return pd.DataFrame(
            {"key": np.concatenate([batch["b"].to_numpy(), batch["a"].to_numpy()]),
             "node": np.concatenate([batch["a"].to_numpy(), batch["b"].to_numpy()]),
             "side": np.repeat(np.array([0, 1], dtype=np.int64), len(batch))}
        )

    def join_mid(bucket: pd.DataFrame) -> pd.DataFrame:
        """The undirected pair list is symmetric, so the fan-in and
        fan-out sides of a middle carry the SAME neighbor set — the
        self-merge is really the full ordered-pair enumeration over
        each middle's sorted (cap-truncated) neighbor list. Generated
        as index arithmetic (`_segmented_triu` + both orders) and
        deduped on integer codes; strings materialize only for the
        distinct survivors (the string-key merge built Σ deg(mid)²
        object rows per bucket before deduping)."""
        empty = pd.DataFrame({"entity": pd.Series([], dtype=str),
                              "nb": pd.Series([], dtype=str)})
        nb = bucket[bucket["side"] == 0][["key", "node"]].drop_duplicates()
        nb = nb.sort_values(["key", "node"], kind="stable")
        if max_wedge_deg is not None:
            # cap each middle to its lexicographically smallest
            # max_wedge_deg neighbors — bounds the pair set at cap²
            # per hub (identical subset to capping both merge sides)
            nb = nb.groupby("key", sort=False).head(max_wedge_deg)
        if nb.empty:
            return empty
        codes, uniques = pd.factorize(nb["node"])
        codes = codes.astype(np.int64)
        ix, iy = _segmented_triu(pd.factorize(nb["key"])[0])
        if ix.size == 0:
            return empty
        # both orders (the merge emitted (x, y) and (y, x)); nodes are
        # distinct within a middle so the diagonal never appears
        n = np.int64(len(uniques))
        ca, cb = codes[ix], codes[iy]
        packed = np.unique(np.concatenate([ca * n + cb, cb * n + ca]))
        uniq_arr = np.asarray(uniques, dtype=object)
        return pd.DataFrame({"entity": uniq_arr[packed // n],
                             "nb": uniq_arr[packed % n]})

    two_hop = grouped_aggregate(
        undirected.map_batches(tag_for_mid, batch_format="pandas"),
        ["key"], join_mid, num_partitions=num_partitions,
    )

    def tag_two(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"entity": batch["entity"].to_numpy(), "nb": batch["nb"].to_numpy(),
             "direct": np.zeros(len(batch), dtype=np.int64)}
        )

    def tag_direct(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"entity": batch["a"].to_numpy(), "nb": batch["b"].to_numpy(),
             "direct": np.ones(len(batch), dtype=np.int64)}
        )

    tagged = two_hop.map_batches(tag_two, batch_format="pandas").union(
        undirected.map_batches(tag_direct, batch_format="pandas")
    )

    import pyarrow as pa
    import ray.data as rd

    # one row per CONNECTED entity — n_two_hop is 0 (not an absent
    # row) on a graph dense enough that every neighbor-of-neighbor is
    # already direct, so the result never degrades to an empty frame
    out_schema = pa.schema(
        [("entity", pa.string()), ("n_direct", pa.int64()),
         ("n_two_hop", pa.int64())]
    )

    def finalize(bucket: pd.DataFrame) -> pa.Table:
        cand = bucket[bucket["direct"] == 0][["entity", "nb"]]
        direct = bucket[bucket["direct"] == 1][["entity", "nb"]]
        n_direct = direct.groupby("entity", sort=True)["nb"].nunique()
        within = (
            pd.concat([direct, cand], ignore_index=True)
            .groupby("entity", sort=True)["nb"]
            .nunique()
        )
        # every candidate's entity also has >= 1 direct edge (two-hop
        # paths start on an edge), so the indexes align
        counts = pd.DataFrame(
            {"n_direct": n_direct, "n_two_hop": within - n_direct}
        ).reset_index()
        return pa.Table.from_arrays(
            [pa.array(counts["entity"].astype(str), pa.string()),
             pa.array(counts["n_direct"].to_numpy(dtype=np.int64), pa.int64()),
             pa.array(counts["n_two_hop"].to_numpy(dtype=np.int64), pa.int64())],
            schema=out_schema,
        )

    result = grouped_aggregate(tagged, ["entity"], finalize,
                               num_partitions=num_partitions)
    return result.union(rd.from_arrow(out_schema.empty_table()))


def kg_two_hop_oracle() -> str:
    from entity_extractor_linker_ray.pipelines import simple_kg

    edges_sql = simple_kg.oracle_sql()["kg_edges"]
    return f"""
WITH raw AS (SELECT subject AS s, object AS o FROM ({edges_sql}) kg_e),
u AS (
  SELECT DISTINCT s AS a, o AS b FROM raw WHERE s <> o
  UNION
  SELECT DISTINCT o, s FROM raw WHERE s <> o
),
two AS (
  SELECT DISTINCT x.a AS entity, y.b AS nb
  FROM u x JOIN u y ON x.b = y.a
  WHERE y.b <> x.a
),
d AS (SELECT a AS entity, count(DISTINCT b) AS n_direct FROM u GROUP BY 1),
w AS (
  SELECT entity, count(DISTINCT nb) AS n_within FROM (
    SELECT a AS entity, b AS nb FROM u
    UNION
    SELECT entity, nb FROM two
  ) GROUP BY entity
)
SELECT d.entity, CAST(d.n_direct AS BIGINT) AS n_direct,
       CAST(w.n_within - d.n_direct AS BIGINT) AS n_two_hop
FROM d JOIN w USING (entity)
"""


# ----------------------------------------------------------------------
# k-core decomposition (iterative degree pruning)
# ----------------------------------------------------------------------

KCORE_K = 4
KCORE_ROUNDS = 4


def _kcore_degrees(bi, alive, num_partitions: int):
    """Degrees restricted to the alive set: count, per alive node, its
    edges whose OTHER endpoint is also alive, in TWO bucketed
    exchanges (down from three; measured ~1/3 of the k-core wall).

    Key identity: ``bi`` carries BOTH directions of every undirected
    edge, so the copy (s=v, d=u) surviving an s-side aliveness filter
    counts, per d=u, exactly u's alive neighbors v — no second
    edge-side semi-join needed. The alive set rides THROUGH the first
    exchange (each alive node is keyed by its own name, so it lands in
    the same bucket stream) and the second exchange inner-joins the
    summed counts against it, reproducing the previous row set exactly:
    degrees are emitted only for alive nodes with >= 1 alive neighbor.
    No driver-side node set anywhere, so the shape holds when the node
    table itself is sharded."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def tag_alive(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["node"].astype(str).to_numpy()
        return pd.DataFrame(
            {"key": n, "other": np.full(len(n), "", dtype=object),
             "side": np.zeros(len(n), dtype=np.int64)}
        )

    def tag_edge_s(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": batch["s"].astype(str).to_numpy(),
             "other": batch["d"].astype(str).to_numpy(),
             "side": np.ones(len(batch), dtype=np.int64)}
        )

    def count_alive_neighbors(bucket: pd.DataFrame) -> pd.DataFrame:
        """Keep edges whose s is alive; emit partial neighbor counts
        per OTHER endpoint, plus the bucket's alive rows (side=0) so
        the next exchange can restrict its output to alive nodes."""
        alive_rows = bucket[bucket["side"] == 0]
        alive_keys = set(alive_rows["key"])
        e = bucket[bucket["side"] == 1]
        kept = e[e["key"].isin(alive_keys)]
        counts = (
            kept.groupby("other", sort=False)
            .size()
            .reset_index(name="deg")
            .rename(columns={"other": "node"})
        )
        counts["side"] = np.int64(1)
        passthru = pd.DataFrame(
            {"node": alive_rows["key"].to_numpy(),
             "deg": np.zeros(len(alive_rows), dtype=np.int64),
             "side": np.zeros(len(alive_rows), dtype=np.int64)}
        )
        out = pd.concat([counts, passthru], ignore_index=True)
        return out.astype({"deg": np.int64, "side": np.int64})

    def merge_counts(batch: pd.DataFrame) -> pd.DataFrame:
        # per-batch partial: counts for one node may arrive from many
        # buckets; pre-sum per (node, side) so the exchange moves
        # node-bounded partials
        return (
            batch.groupby(["node", "side"], sort=False)["deg"]
            .sum()
            .reset_index()
            .astype({"deg": np.int64, "side": np.int64})
        )

    def sum_deg_alive(bucket: pd.DataFrame) -> pd.DataFrame:
        alive_keys = set(bucket.loc[bucket["side"] == 0, "node"])
        c = bucket[bucket["side"] == 1]
        out = (
            c.groupby("node", sort=False)["deg"]
            .sum()
            .reset_index()
            .astype({"deg": np.int64})
        )
        return out[out["node"].isin(alive_keys)]

    stage1 = grouped_aggregate(
        bi.map_batches(tag_edge_s, batch_format="pandas").union(
            alive.map_batches(tag_alive, batch_format="pandas")
        ),
        ["key"], count_alive_neighbors, num_partitions=num_partitions,
    )
    return grouped_aggregate(stage1, ["node"], sum_deg_alive,
                             partial=merge_counts,
                             num_partitions=num_partitions)


def kcore(edges_ds, k: int, rounds: int, num_partitions: int = 8):
    """k-core decomposition by iterative degree pruning over an
    undirected DISTINCT edge Dataset (columns ``x``/``y``, one row per
    unordered pair): each round drops every node whose degree within
    the surviving subgraph is < ``k``; after ``rounds`` rounds (or a
    provably reached fixpoint — the alive set shrinks monotonically,
    so an unchanged COUNT certifies convergence with one scalar
    aggregate, same trick as :func:`duplicate_clusters`), every
    remaining node is reported with its degree inside the core.

    Exactly mirrors the unrolled-CTE oracle: both run AT MOST
    ``rounds`` pruning rounds, and the early exit fires only when an
    extra round is the identity, so the results agree whether or not
    the fixpoint is reached. Returns (entity, degree)."""
    import pyarrow as pa
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    out_schema = pa.schema([("entity", pa.string()), ("degree", pa.int64())])
    empty = rd.from_arrow(out_schema.empty_table())

    def both_dirs(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch["x"].astype(str).to_numpy()
        y = batch["y"].astype(str).to_numpy()
        return pd.DataFrame(
            {"s": np.concatenate([x, y]), "d": np.concatenate([y, x])}
        )

    bi = _compact(edges_ds.map_batches(both_dirs, batch_format="pandas"),
                  num_partitions)

    def to_nodes(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": batch["s"]}).drop_duplicates()

    def dedup_nodes(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates(["node"])[["node"]]

    alive = _compact(
        grouped_aggregate(
            bi.map_batches(to_nodes, batch_format="pandas"), ["node"],
            dedup_nodes, num_partitions=num_partitions,
        ),
        num_partitions,
    )
    n_alive = alive.count()
    if n_alive == 0:
        return empty

    def survivors(batch: pd.DataFrame):
        kept = batch[batch["deg"].to_numpy(dtype=np.int64) >= k]
        # explicit Arrow string type: an all-pruned batch must not
        # produce a null-typed column (block-unification + size probes)
        return pa.table(
            {"node": pa.array(kept["node"].astype(str), type=pa.string())}
        )

    def rename(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"entity": batch["node"].astype(str).to_numpy(),
             "degree": batch["deg"].to_numpy(dtype=np.int64)}
        )

    def surviving_degrees(batch: pd.DataFrame) -> pd.DataFrame:
        return rename(batch[batch["deg"].to_numpy(dtype=np.int64) >= k])

    for _ in range(rounds):
        # materialized: the round's degrees feed BOTH the survivor
        # filter and (at the fixpoint) the final answer — one
        # execution, not two
        deg = _kcore_degrees(bi, alive, num_partitions).materialize()
        alive = _compact(
            deg.map_batches(survivors, batch_format="pandas"), num_partitions
        )
        n_new = alive.count()
        if n_new == 0:
            return empty
        if n_new == n_alive:
            # monotone-shrinking set + equal count == identical set:
            # this round was the identity, so the surviving nodes'
            # degrees w.r.t. the previous alive set ARE their
            # within-core degrees — no extra degree pass needed
            return deg.map_batches(
                surviving_degrees, batch_format="pandas"
            ).union(empty)
        n_alive = n_new

    # rounds exhausted without a fixpoint: report degrees within the
    # final alive set (nodes below k would be pruned in round R+1 —
    # kept here, exactly as the oracle's unfiltered dfin)
    final_deg = _kcore_degrees(bi, alive, num_partitions)
    return final_deg.map_batches(rename, batch_format="pandas").union(empty)


def kg_kcore(sf_dir: str, k: int = KCORE_K, rounds: int = KCORE_ROUNDS,
             num_partitions: int = 8):
    """k-core of the co-occurrence KG over its STRONG edges: directed
    predicate-summed weights are folded into undirected unordered
    pairs, an edge is strong when its weight reaches the CEILING MEAN
    weight (exact integer arithmetic on both sides — no float
    quantile to disagree over), and the ``k``-core of the strong graph
    is reported as (entity, degree-within-core). The
    dense-subgraph extraction step of KG cleanup: hubs survive,
    weakly-attached entities fall away round by round."""
    def undirected(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["subject"] != batch["object"]]
        s = b["subject"].astype(str).to_numpy()
        o = b["object"].astype(str).to_numpy()
        lo = np.where(s < o, s, o)
        hi = np.where(s < o, o, s)
        return pd.DataFrame(
            {"x": lo, "y": hi, "w": b["weight"].to_numpy(dtype=np.int64)}
        )

    def sum_w(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["x", "y"], sort=False)["w"]
            .sum()
            .reset_index()
            .astype({"w": np.int64})
        )

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    und = grouped_aggregate(
        _kg_edges_materialized(sf_dir).map_batches(
            undirected, batch_format="pandas"
        ),
        ["x", "y"], sum_w, num_partitions=num_partitions,
    ).materialize()

    n_edges = und.count()
    if n_edges == 0:
        import pyarrow as pa
        import ray.data as rd

        return rd.from_arrow(
            pa.schema([("entity", pa.string()), ("degree", pa.int64())])
            .empty_table()
        )
    total_w = int(und.sum("w") or 0)
    thr = (total_w + n_edges - 1) // n_edges  # ceiling mean, exact ints

    def strong(batch: pd.DataFrame) -> pd.DataFrame:
        kept = batch[batch["w"].to_numpy(dtype=np.int64) >= thr]
        return kept[["x", "y"]]

    return kcore(und.map_batches(strong, batch_format="pandas"), k, rounds,
                 num_partitions)


def kcore_reference(edges: pd.DataFrame, k: int, rounds: int) -> pd.DataFrame:
    """Single-machine replica of :func:`kcore` (tests: distributed ==
    local). ``edges``: columns x, y — distinct unordered pairs."""
    pairs = {(str(a), str(b)) for a, b in edges[["x", "y"]].itertuples(index=False)}
    alive = {n for p in pairs for n in p}

    def degrees(nodes):
        deg: dict[str, int] = {}
        for a, b in pairs:
            if a in nodes and b in nodes:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        return deg

    for _ in range(rounds):
        deg = degrees(alive)
        new_alive = {n for n in alive if deg.get(n, 0) >= k}
        if new_alive == alive:
            break
        alive = new_alive
        if not alive:
            break
    deg = degrees(alive)
    rows = sorted((n, d) for n, d in deg.items())
    return pd.DataFrame(
        {"entity": [r[0] for r in rows],
         "degree": np.array([r[1] for r in rows], dtype=np.int64)}
    )


def kg_kcore_oracle(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    """Unrolled-CTE mirror of :func:`kg_kcore` (same scheme as the
    PageRank oracle): one degree-filter CTE pair per pruning round
    over the ceiling-mean-thresholded strong edge set, then the final
    within-core degree. Integer arithmetic throughout."""
    from entity_extractor_linker_ray.pipelines import simple_kg

    edges_sql = simple_kg.oracle_sql()["kg_edges"]
    parts = [
        f"""WITH e AS (
  SELECT subject AS a, object AS b, CAST(weight AS BIGINT) AS w
  FROM ({edges_sql}) q WHERE subject <> object
),
u AS (
  SELECT CASE WHEN a < b THEN a ELSE b END AS x,
         CASE WHEN a < b THEN b ELSE a END AS y,
         CAST(SUM(w) AS BIGINT) AS w
  FROM e GROUP BY 1, 2
),
t AS (SELECT CAST((CAST(SUM(w) AS HUGEINT) + COUNT(*) - 1) // COUNT(*)
              AS BIGINT) AS thr FROM u),
keep AS (SELECT x, y FROM u, t WHERE w >= thr),
bi AS (SELECT x AS s, y AS d FROM keep UNION ALL SELECT y, x FROM keep),
a0 AS (SELECT DISTINCT s AS node FROM bi)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
d{i} AS (SELECT bi.s AS node, CAST(COUNT(*) AS BIGINT) AS deg
         FROM bi JOIN a{i - 1} sa ON bi.s = sa.node
                 JOIN a{i - 1} da ON bi.d = da.node
         GROUP BY 1),
a{i} AS (SELECT node FROM d{i} WHERE deg >= {k})"""
        )
    parts.append(
        f""",
dfin AS (SELECT bi.s AS node, CAST(COUNT(*) AS BIGINT) AS degree
         FROM bi JOIN a{rounds} sa ON bi.s = sa.node
                 JOIN a{rounds} da ON bi.d = da.node
         GROUP BY 1)
SELECT node AS entity, degree FROM dfin"""
    )
    return "".join(parts)

BFS_ROUNDS = 4


def kg_bfs_depths(sf_dir: str, rounds: int = BFS_ROUNDS):
    """Single-source BFS over the UNDIRECTED co-occurrence KG: the hop
    distance from the lexicographically-smallest entity to every node
    it reaches within ``rounds`` hops — the shortest-path/neighborhood
    primitive behind 'how far is X from Y' queries and graph
    visualization layering.

    Iterative frontier expansion, two bucketed exchanges per round
    (the k-core cadence): (1) frontier ⋈ edges on hash(src) emits
    candidate (node, depth k) rows; (2) candidates ⋈ known depths on
    hash(node) keeps first reach only (BFS's min-depth invariant: a
    node reached twice keeps the earlier round). Each round's depth
    table is pinned with :func:`_compact`; a fixed round count unrolls
    into one CTE pair per hop in the oracle, exactly like PageRank's.
    The toy KG's diameter is well under ``rounds``; at real scale
    rounds is the usual BFS knob."""
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def to_undirected(batch: pd.DataFrame) -> pd.DataFrame:
        fwd = batch[["subject", "object"]].rename(
            columns={"subject": "src", "object": "dst"}
        )
        rev = batch[["object", "subject"]].rename(
            columns={"object": "src", "subject": "dst"}
        )
        return pd.concat([fwd, rev], ignore_index=True).drop_duplicates()

    edges = (
        _kg_edges_materialized(sf_dir)
        .map_batches(to_undirected, batch_format="pandas")
        .materialize()
    )

    # deterministic source: the smallest node name (tiny aggregate);
    # an empty edge list loses its schema through to_pandas, so the
    # column check doubles as the empty-graph guard
    src_df = edges.map_batches(
        lambda b: pd.DataFrame({"src": [b["src"].min()]} if len(b) else {"src": []}),
        batch_format="pandas",
    ).to_pandas()
    src_node = src_df["src"].min() if "src" in src_df.columns and len(src_df) else None
    if src_node is None or (isinstance(src_node, float) and np.isnan(src_node)):
        import pyarrow as pa

        return rd.from_arrow(
            pa.schema([("node", pa.string()), ("depth", pa.int64())]).empty_table()
        )

    depths = rd.from_pandas(
        pd.DataFrame({"node": [src_node], "depth": np.int64(0)})
    ).materialize()

    def tag_edge(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["src", "dst"]].copy()
        out["kind"] = np.int64(0)
        out["depth"] = np.int64(-1)
        return out

    tagged_edges = edges.map_batches(tag_edge, batch_format="pandas").materialize()

    for k in range(1, rounds + 1):
        # the frontier filter happens inside tag_frontier (depth == k-1)
        frontier = depths

        def tag_frontier(batch: pd.DataFrame, _k=k) -> pd.DataFrame:
            f = batch[batch["depth"] == _k - 1]
            return pd.DataFrame(
                {"src": f["node"].to_numpy(), "dst": "",
                 "kind": np.int64(1), "depth": np.int64(_k - 1)}
            )

        def expand(bucket: pd.DataFrame, _k=k) -> pd.DataFrame:
            has_frontier = (bucket["kind"] == 1).any()
            if not has_frontier:
                return pd.DataFrame({"node": pd.Series([], dtype=str)})
            e = bucket[bucket["kind"] == 0]
            fr = set(bucket.loc[bucket["kind"] == 1, "src"])
            nxt = e.loc[e["src"].isin(fr), "dst"].drop_duplicates()
            return pd.DataFrame({"node": nxt.to_numpy()})

        candidates = grouped_aggregate(
            tagged_edges.union(
                frontier.map_batches(tag_frontier, batch_format="pandas")
            ),
            ["src"],
            expand,
            coalesce=True,
        )

        def tag_known(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch[["node", "depth"]].copy()
            out["kind"] = np.int64(0)
            return out

        def tag_candidate(batch: pd.DataFrame, _k=k) -> pd.DataFrame:
            return pd.DataFrame(
                {"node": batch["node"].to_numpy(),
                 "depth": np.int64(_k), "kind": np.int64(1)}
            )

        def first_reach(bucket: pd.DataFrame) -> pd.DataFrame:
            # min depth per node = earliest round wins (kind 0 rows
            # carry earlier depths by construction)
            return (
                bucket.groupby("node", sort=False)["depth"]
                .min()
                .reset_index()
                .astype({"depth": np.int64})
            )

        depths = _compact(
            grouped_aggregate(
                depths.map_batches(tag_known, batch_format="pandas").union(
                    candidates.map_batches(tag_candidate, batch_format="pandas")
                ),
                ["node"],
                first_reach,
                coalesce=True,
            ),
            8,
        )

    return depths


def kg_bfs_oracle(rounds: int = BFS_ROUNDS) -> str:
    """Unrolled BFS oracle: one CTE per hop, min-depth per node —
    possible because the round count is fixed, like PageRank's."""
    from entity_extractor_linker_ray.pipelines import simple_kg

    edges_sql = simple_kg.oracle_sql()["kg_edges"]
    parts = [
        f"""WITH base AS (
  SELECT subject AS src, object AS dst FROM ({edges_sql}) kg_e
),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM base UNION ALL SELECT dst AS src, src AS dst FROM base
  ) u
),
d0 AS (SELECT (SELECT MIN(src) FROM edges) AS node, 0 AS depth)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
d{i} AS (
  SELECT node, MIN(depth) AS depth FROM (
    SELECT node, depth FROM d{i - 1}
    UNION ALL
    SELECT e.dst AS node, {i} AS depth
    FROM edges e JOIN d{i - 1} p ON p.node = e.src AND p.depth = {i - 1}
  ) u GROUP BY 1
)"""
        )
    parts.append(
        f"\nSELECT node, CAST(depth AS BIGINT) AS depth FROM d{rounds}"
    )
    return "".join(parts)

def kg_degree_distribution(sf_dir: str):
    """Degree distribution of the co-occurrence KG: how many entities
    have each distinct-neighbor count — the aggregate-of-an-aggregate
    (double groupby) every graph characterization starts with. The
    per-entity degrees come from the existing entity-connections
    operator (itself a bucketed distinct-neighbor aggregate); the
    second groupby's key space is bounded by the max degree, so the
    histogram is one tiny two-phase count."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate
    from entity_extractor_linker_ray.pipelines.simple_kg import (
        kg_entity_connections,
    )

    degrees = kg_entity_connections(sf_dir)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby("n_neighbors", sort=False)
            .size()
            .reset_index(name="n_entities")
            .rename(columns={"n_neighbors": "degree"})
            .astype({"degree": np.int64, "n_entities": np.int64})
        )

    def combine(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("degree", sort=False)["n_entities"]
            .sum()
            .reset_index()
            .astype({"degree": np.int64, "n_entities": np.int64})
        )

    return grouped_aggregate(degrees, ["degree"], combine, partial=partial,
                             num_partitions=4)


def kg_degree_distribution_oracle() -> str:
    from entity_extractor_linker_ray.pipelines import simple_kg

    conn_sql = simple_kg.oracle_sql()["kg_entity_connections"]
    return f"""
SELECT CAST(n_neighbors AS BIGINT) AS degree,
       count(*) AS n_entities
FROM ({conn_sql}) c
GROUP BY 1
"""

def kg_reciprocity(sf_dir: str):
    """Reciprocity of the DIRECTED co-occurrence KG: how many directed
    edges have a reverse edge, and the ratio — the symmetry diagnostic
    that says whether 'A related_to B' is really an undirected
    relation in this corpus. One bucketed exchange: each edge is keyed
    by its UNORDERED pair, the per-bucket kernel marks pairs present
    in both directions, and the two counts collapse to a single row
    with one IEEE division."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    edges = _kg_edges_materialized(sf_dir)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch["subject"] != batch["object"]  # self-loops are
        batch = batch[keep]  # reciprocal by definition; exclude both sides
        s = batch["subject"].to_numpy(dtype=object)
        o = batch["object"].to_numpy(dtype=object)
        lo = np.minimum(s, o)
        hi = np.maximum(s, o)
        return pd.DataFrame(
            {"lo": lo, "hi": hi,
             "fwd": (s == lo).astype(np.int64),
             "rev": (s != lo).astype(np.int64)}
        )

    def per_pair(bucket: pd.DataFrame) -> pd.DataFrame:
        m = (
            bucket.groupby(["lo", "hi"], sort=False)
            .agg(fwd=("fwd", "max"), rev=("rev", "max"))
            .reset_index()
        )
        both = ((m["fwd"] == 1) & (m["rev"] == 1)).astype(np.int64)
        n_edges = m["fwd"].to_numpy(dtype=np.int64) + m["rev"].to_numpy(
            dtype=np.int64
        )
        return pd.DataFrame(
            {"n_edges": [int(n_edges.sum())],
             "n_reciprocal": [int((2 * both).sum())]}
        )

    partials = grouped_aggregate(edges.map_batches(tag, batch_format="pandas"),
                                 ["lo", "hi"], per_pair, num_partitions=4)

    def final(batch: pd.DataFrame) -> pd.DataFrame:
        e = int(batch["n_edges"].sum())
        r = int(batch["n_reciprocal"].sum())
        return pd.DataFrame(
            {"n_edges": np.array([e], dtype=np.int64),
             "n_reciprocal": np.array([r], dtype=np.int64),
             "reciprocity": np.array(
                 [np.float64(r) / np.float64(e) if e else 0.0]
             )}
        )

    return partials.repartition(1).map_batches(final, batch_format="pandas")


def kg_reciprocity_oracle() -> str:
    from entity_extractor_linker_ray.pipelines import simple_kg

    edges_sql = simple_kg.oracle_sql()["kg_edges"]
    return f"""
WITH e AS (
  SELECT DISTINCT subject AS s, object AS o FROM ({edges_sql}) kg_e
  WHERE subject <> object
),
marked AS (
  SELECT a.s, a.o,
         CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END AS has_rev
  FROM e a LEFT JOIN e b ON b.s = a.o AND b.o = a.s
)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(has_rev) AS BIGINT) AS n_reciprocal,
       CAST(sum(has_rev) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS reciprocity
FROM marked
"""

def kg_assortativity(sf_dir: str):
    """Degree assortativity (Newman's r) of the undirected
    co-occurrence KG: the Pearson correlation of (source-degree,
    target-degree) over all 2E directed stubs — positive = hubs link
    hubs; the third graph-characterization number beside the degree
    distribution and reciprocity. Degrees come from the
    distinct-neighbor aggregate; each endpoint's degree is attached by
    a tagged bucketed join (src first, then dst — never a degree
    broadcast), stubs are globally deduplicated inside the src bucket
    (all copies of a stub hash together), and the four integer
    sufficient sums collapse to one closed-form double division.
    Self-loops cannot occur in this KG (consecutive mentions are
    distinct entities)."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate
    from entity_extractor_linker_ray.pipelines.simple_kg import (
        kg_entity_connections,
    )

    degrees = kg_entity_connections(sf_dir).materialize()
    edges = _kg_edges_materialized(sf_dir)

    def both_dirs(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["subject"].to_numpy(dtype=object)
        o = batch["object"].to_numpy(dtype=object)
        return pd.DataFrame(
            {"src": np.concatenate([s, o]), "dst": np.concatenate([o, s])}
        ).drop_duplicates()

    stubs = edges.map_batches(both_dirs, batch_format="pandas")

    def tag_deg_src(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": batch["entity"].to_numpy(dtype=object),
             "dst": "", "deg": batch["n_neighbors"].to_numpy(dtype=np.int64),
             "kind": np.int64(0)}
        )

    def tag_stub(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": batch["src"].to_numpy(dtype=object),
             "dst": batch["dst"].to_numpy(dtype=object),
             "deg": np.int64(-1), "kind": np.int64(1)}
        )

    def attach_src(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket[bucket["kind"] == 0][["src", "deg"]].drop_duplicates()
        # global stub dedup happens HERE: every copy of (src, dst)
        # hashes into this bucket
        e = bucket[bucket["kind"] == 1][["src", "dst"]].drop_duplicates()
        m = e.merge(d, on="src", how="inner")
        return pd.DataFrame(
            {"dst": m["dst"].to_numpy(dtype=object),
             "deg_src": m["deg"].to_numpy(dtype=np.int64)}
        )

    half = grouped_aggregate(
        stubs.map_batches(tag_stub, batch_format="pandas").union(
            degrees.map_batches(tag_deg_src, batch_format="pandas")
        ),
        ["src"], attach_src, coalesce=True,
    )

    def tag_deg_dst(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"dst": batch["entity"].to_numpy(dtype=object),
             "deg_src": np.int64(-1),
             "deg": batch["n_neighbors"].to_numpy(dtype=np.int64),
             "kind": np.int64(0)}
        )

    def tag_half(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["deg"] = np.int64(-1)
        out["kind"] = np.int64(1)
        return out

    def sums(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket[bucket["kind"] == 0][["dst", "deg"]].drop_duplicates()
        e = bucket[bucket["kind"] == 1][["dst", "deg_src"]]
        m = e.merge(d, on="dst", how="inner")
        x = m["deg_src"].to_numpy(dtype=np.int64)
        y = m["deg"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"n": [np.int64(len(m))], "sx": [int(x.sum())],
             "sxx": [int((x * x).sum())], "sxy": [int((x * y).sum())]}
        )

    partials = grouped_aggregate(
        half.map_batches(tag_half, batch_format="pandas").union(
            degrees.map_batches(tag_deg_dst, batch_format="pandas")
        ),
        ["dst"], sums, coalesce=True,
    )

    def final(batch: pd.DataFrame) -> pd.DataFrame:
        m = int(batch["n"].sum())
        sx = int(batch["sx"].sum())
        sxx = int(batch["sxx"].sum())
        sxy = int(batch["sxy"].sum())
        if m == 0:
            r = 0.0
        else:
            num = np.float64(m) * np.float64(sxy) - np.float64(sx) * np.float64(sx)
            den = np.float64(m) * np.float64(sxx) - np.float64(sx) * np.float64(sx)
            r = float(num / den) if den > 0.0 else 0.0
        return pd.DataFrame(
            {"n_stubs": np.array([m], dtype=np.int64),
             "assortativity": np.array([r], dtype=np.float64)}
        )

    return partials.repartition(1).map_batches(final, batch_format="pandas")


def kg_assortativity_oracle() -> str:
    from entity_extractor_linker_ray.pipelines import simple_kg

    oracles = simple_kg.oracle_sql()
    edges_sql = oracles["kg_edges"]
    conn_sql = oracles["kg_entity_connections"]
    return f"""
WITH conn AS (SELECT entity, n_neighbors FROM ({conn_sql}) c),
base AS (SELECT subject AS s, object AS o FROM ({edges_sql}) e),
stubs AS (
  SELECT DISTINCT s, o FROM (
    SELECT s, o FROM base UNION ALL SELECT o AS s, s AS o FROM base
  ) u
),
j AS (
  SELECT cx.n_neighbors AS x, cy.n_neighbors AS y
  FROM stubs JOIN conn cx ON cx.entity = stubs.s
             JOIN conn cy ON cy.entity = stubs.o
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS m, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM j
)
SELECT m AS n_stubs,
       CASE WHEN m = 0 THEN 0.0
            WHEN CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
            THEN (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            ELSE 0.0 END AS assortativity
FROM agg
"""


def kg_edge_jaccard(sf_dir: str, num_partitions: int = 8, edges_ds=None,
                    max_wedge_deg: int | None = None):
    """Neighborhood Jaccard per KG edge — for every canonical
    undirected edge (u < v): the count of common neighbors, the
    neighborhood-union size, and their ratio. The classic
    link-prediction / edge-strength feature (strong ties share
    neighborhoods); also the per-edge form of the clustering
    signal :func:`kg_triangles` totals globally.

    Distributed plan, four bucketed exchanges and no driver graph
    state:

    1. key (u, v): canonicalize + dedup the undirected edge set
       (materialized once — node/edge cardinality, reused by three
       consumers);
    2. key m: WEDGE generation — each middle vertex emits all ordered
       pairs (a < b) of its distinct neighbors, pre-counted per bucket
       (partial combine). Σ deg(m)² explosion trade as in
       :func:`kg_triangles`: production graphs cap celebrity vertices'
       wedge lists;
    3. key (u, v): wedge counts meet edge markers — per-edge common
       count, edges with zero wedges kept (LEFT semantics);
    4. key node (twice): degree rows meet edge rows — attach deg(u)
       then deg(v) with a vectorized map per bucket, never a
       driver-side degree table.

    ``n_union = deg(u) + deg(v) − n_common`` (≥ 2 always: v ∈ N(u) and
    u ∈ N(v)), so the single int/int divide is safe and — being one
    correctly-rounded IEEE op on identical integers — hash-matches the
    oracle bit-exactly. ``edges_ds`` overrides the corpus edge list
    (columns subject/object) for planted-graph tests."""
    import pyarrow as pa
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def canon(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["subject"].astype(str)
        o = batch["object"].astype(str)
        lo = np.where(s < o, s, o)
        hi = np.where(s < o, o, s)
        return pd.DataFrame({"u": lo, "v": hi})[lo != hi]

    base_edges = edges_ds if edges_ds is not None else _kg_edges_materialized(sf_dir)
    edges = grouped_aggregate(
        base_edges.map_batches(canon, batch_format="pandas"),
        ["u", "v"],
        lambda b: b[["u", "v"]].drop_duplicates(),
        num_partitions=num_partitions,
    ).materialize()

    # --- degrees: one exchange over the both-direction neighbor list
    def both_dirs(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.concat([batch["u"], batch["v"]], ignore_index=True)}
        )

    def count_deg(bucket: pd.DataFrame) -> pd.DataFrame:
        out = bucket.groupby("node", sort=False).size().reset_index(name="d")
        return out.astype({"d": np.int64})

    deg = grouped_aggregate(
        edges.map_batches(both_dirs, batch_format="pandas"),
        ["node"], count_deg, num_partitions=num_partitions,
    ).materialize()

    # broadcast semi-join filter: only wedge pairs that ARE edges
    # survive to the (u, v) exchange (collision false positives are
    # dropped by the edge-marker join below — exact output). Cuts the
    # exchange from Sigma deg(m)^2 wedge pairs to ~|E| (measured at
    # n=100k: 30.2M -> ~1.2M rows).
    edge_filter_ref = _edge_hash_filter(edges)

    # --- wedges: all neighbor pairs per middle vertex, pre-counted
    def tag_mid(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"m": pd.concat([batch["u"], batch["v"]], ignore_index=True),
             "other": pd.concat([batch["v"], batch["u"]], ignore_index=True)}
        )

    def wedge_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        """Vectorized wedge generation: dedup + (optional) per-middle
        lexicographic cap via sort/groupby-head, then ONE C-speed
        positional self-merge on the middle — identical pair set to
        the per-middle triu loop, no Python per-group work. Candidate
        pairs exist only as INT position/hash arrays: each neighbor
        string is hashed once, the Σ deg(m)² pairs probe the broadcast
        edge filter as pre-combined uint64s, and only the ~|E|
        survivors materialize string columns (the old string-pair
        merge built 30.2 M object rows per n=100k run just to throw
        96% away at the filter)."""
        empty = pd.DataFrame({"u": pd.Series([], dtype=str),
                              "v": pd.Series([], dtype=str),
                              "cnt": pd.Series([], dtype=np.int64)})
        nb = bucket[["m", "other"]].drop_duplicates()
        nb = nb.sort_values(["m", "other"], kind="stable")
        if max_wedge_deg is not None:
            nb = nb.groupby("m", sort=False).head(max_wedge_deg)
        if nb.empty:
            return empty
        other = nb["other"].to_numpy(dtype=object)
        h = _string_hashes(nb["other"])
        # within a middle the positions are contiguous ascending in
        # lexicographic 'other' order, so ix < iy ⟺ other_x < other_y;
        # pair enumeration is pure index arithmetic (no join)
        ix, iy = _segmented_triu(pd.factorize(nb["m"])[0])
        if ix.size == 0:
            return empty
        import ray

        mask = _probe_hashes(_combine_pair(h[ix], h[iy]),
                             ray.get(edge_filter_ref))
        ix, iy = ix[mask], iy[mask]
        if ix.size == 0:
            return empty
        allp = pd.DataFrame({"u": other[ix], "v": other[iy]})
        out = allp.groupby(["u", "v"], sort=False).size().reset_index(name="cnt")
        return out.astype({"cnt": np.int64})

    wedges = grouped_aggregate(
        edges.map_batches(tag_mid, batch_format="pandas"),
        ["m"], wedge_counts, num_partitions=num_partitions,
    )

    # --- per-edge common count: wedge partials ⋈ edge markers
    def tag_wedge(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": batch["u"], "v": batch["v"],
                             "cnt": batch["cnt"].to_numpy(dtype=np.int64),
                             "is_edge": np.zeros(len(batch), dtype=np.int64)})

    def tag_edge(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": batch["u"], "v": batch["v"],
                             "cnt": np.zeros(len(batch), dtype=np.int64),
                             "is_edge": np.ones(len(batch), dtype=np.int64)})

    def common_per_edge(bucket: pd.DataFrame) -> pd.DataFrame:
        summed = (
            bucket.groupby(["u", "v"], sort=False)
            .agg(n_common=("cnt", "sum"), is_edge=("is_edge", "max"))
            .reset_index()
        )
        out = summed[summed["is_edge"] > 0][["u", "v", "n_common"]]
        return out.astype({"n_common": np.int64})

    common = grouped_aggregate(
        wedges.map_batches(tag_wedge, batch_format="pandas").union(
            edges.map_batches(tag_edge, batch_format="pandas")
        ),
        ["u", "v"], common_per_edge, num_partitions=num_partitions,
        coalesce=True,  # tagged-union join: combine happens in-bucket
    )

    # --- attach deg(u), then deg(v): tag-union joins keyed by node
    def edge_keyed_u(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": batch["u"], "v": batch["v"],
             "n_common": batch["n_common"].to_numpy(dtype=np.int64),
             "d": np.full(len(batch), -1, dtype=np.int64)}
        )

    def deg_row(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": batch["node"], "v": np.full(len(batch), "", dtype=object),
             "n_common": np.zeros(len(batch), dtype=np.int64),
             "d": batch["d"].to_numpy(dtype=np.int64)}
        )

    def attach_du(bucket: pd.DataFrame) -> pd.DataFrame:
        dmap = bucket[bucket["d"] >= 0].set_index("node")["d"]
        e = bucket[bucket["d"] < 0]
        return pd.DataFrame(
            {"u": e["node"].to_numpy(), "v": e["v"].to_numpy(),
             "n_common": e["n_common"].to_numpy(dtype=np.int64),
             "du": e["node"].map(dmap).to_numpy(dtype=np.int64)}
        )

    with_du = grouped_aggregate(
        common.map_batches(edge_keyed_u, batch_format="pandas").union(
            deg.map_batches(deg_row, batch_format="pandas")
        ),
        ["node"], attach_du, num_partitions=num_partitions,
        coalesce=True,  # tagged-union join
    )

    def edge_keyed_v(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": batch["v"], "u": batch["u"],
             "n_common": batch["n_common"].to_numpy(dtype=np.int64),
             "du": batch["du"].to_numpy(dtype=np.int64),
             "d": np.full(len(batch), -1, dtype=np.int64)}
        )

    def deg_row_v(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": batch["node"], "u": np.full(len(batch), "", dtype=object),
             "n_common": np.zeros(len(batch), dtype=np.int64),
             "du": np.zeros(len(batch), dtype=np.int64),
             "d": batch["d"].to_numpy(dtype=np.int64)}
        )

    def finalize(bucket: pd.DataFrame) -> pd.DataFrame:
        dmap = bucket[bucket["d"] >= 0].set_index("node")["d"]
        e = bucket[bucket["d"] < 0]
        nc = e["n_common"].to_numpy(dtype=np.int64)
        du = e["du"].to_numpy(dtype=np.int64)
        dv = e["node"].map(dmap).to_numpy(dtype=np.int64)
        nu = du + dv - nc
        jac = nc.astype(np.float64) / nu.astype(np.float64)
        return pd.DataFrame(
            {"u": e["u"].to_numpy(), "v": e["node"].to_numpy(),
             "n_common": nc, "n_union": nu, "jaccard": jac}
        )

    out = grouped_aggregate(
        with_du.map_batches(edge_keyed_v, batch_format="pandas").union(
            deg.map_batches(deg_row_v, batch_format="pandas")
        ),
        ["node"], finalize, num_partitions=num_partitions,
        coalesce=True,  # tagged-union join
    )
    out_schema = pa.schema(
        [("u", pa.string()), ("v", pa.string()), ("n_common", pa.int64()),
         ("n_union", pa.int64()), ("jaccard", pa.float64())]
    )
    return out.union(rd.from_arrow(out_schema.empty_table()))


def kg_edge_jaccard_oracle() -> str:
    """Plain-SQL mirror over the same canonical edge set: common
    neighbors via the two-step neighbor join, union via
    deg(u)+deg(v)−common, one int/int divide for the ratio."""
    from entity_extractor_linker_ray.pipelines import simple_kg

    edges_sql = simple_kg.oracle_sql()["kg_edges"]
    return f"""
WITH raw AS (
  SELECT subject AS s, object AS o FROM ({edges_sql}) kg_e
),
edges AS (
  SELECT DISTINCT LEAST(s, o) AS u, GREATEST(s, o) AS v
  FROM raw WHERE s <> o
),
nbr AS (
  SELECT u AS node, v AS nb FROM edges
  UNION ALL
  SELECT v AS node, u AS nb FROM edges
),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM nbr GROUP BY 1),
common AS (
  SELECT e.u, e.v, CAST(count(*) AS BIGINT) AS n_common
  FROM edges e
  JOIN nbr n1 ON n1.node = e.u
  JOIN nbr n2 ON n2.node = e.v AND n2.nb = n1.nb
  GROUP BY 1, 2
)
SELECT e.u, e.v,
       CAST(COALESCE(c.n_common, 0) AS BIGINT) AS n_common,
       CAST(du.d + dv.d - COALESCE(c.n_common, 0) AS BIGINT) AS n_union,
       CAST(COALESCE(c.n_common, 0) AS DOUBLE)
         / CAST(du.d + dv.d - COALESCE(c.n_common, 0) AS DOUBLE) AS jaccard
FROM edges e
JOIN deg du ON du.node = e.u
JOIN deg dv ON dv.node = e.v
LEFT JOIN common c ON c.u = e.u AND c.v = e.v
"""


SSSP_ROUNDS = 4


def kg_shortest_paths(sf_dir: str, rounds: int = SSSP_ROUNDS, edges_ds=None):
    """Single-source WEIGHTED shortest paths over the undirected
    co-occurrence KG (cost = integer edge weight): ``rounds`` rounds of
    distributed Bellman-Ford relaxation from the lexicographically
    smallest entity. The weighted sibling of :func:`kg_bfs_depths` —
    BFS's first-reach invariant breaks under weights (a longer-hop
    path can be cheaper), so every round relaxes ALL known distances,
    not just a frontier: min-plus semiring instead of min-depth.

    Same two bucketed exchanges per round as BFS: (1) dists ⋈ edges on
    hash(src) emit ``dist(u) + w(u,v)`` candidates, (2) min per node on
    hash(node). All-integer arithmetic ⇒ the fixed round count unrolls
    into one CTE per relaxation in the oracle, exactly PageRank's
    pattern. ``rounds`` bounds path LENGTH in hops (Bellman-Ford's
    usual truncation knob at scale); nodes unreached within it are
    absent, matching the oracle."""
    import pyarrow as pa
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def to_undirected(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["weight"].to_numpy(dtype=np.int64)
        fwd = pd.DataFrame(
            {"src": batch["subject"].to_numpy(), "dst": batch["object"].to_numpy(),
             "w": w}
        )
        rev = pd.DataFrame(
            {"src": batch["object"].to_numpy(), "dst": batch["subject"].to_numpy(),
             "w": w}
        )
        both = pd.concat([fwd, rev], ignore_index=True)
        # parallel predicate edges may repeat a pair: keep the cheapest
        return both.groupby(["src", "dst"], sort=False)["w"].min().reset_index()

    base_edges = edges_ds if edges_ds is not None else _kg_edges_materialized(sf_dir)
    edges = (
        base_edges
        .map_batches(to_undirected, batch_format="pandas")
        .materialize()
    )

    src_df = edges.map_batches(
        lambda b: pd.DataFrame({"src": [b["src"].min()]} if len(b) else {"src": []}),
        batch_format="pandas",
    ).to_pandas()
    src_node = src_df["src"].min() if "src" in src_df.columns and len(src_df) else None
    if src_node is None or (isinstance(src_node, float) and np.isnan(src_node)):
        return rd.from_arrow(
            pa.schema([("node", pa.string()), ("dist", pa.int64())]).empty_table()
        )

    dists = rd.from_pandas(
        pd.DataFrame({"node": [src_node], "dist": np.int64(0)})
    ).materialize()

    def tag_edge(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["src", "dst", "w"]].copy()
        out["kind"] = np.int64(0)
        out["dist"] = np.int64(-1)
        return out

    tagged_edges = edges.map_batches(tag_edge, batch_format="pandas").materialize()

    for _ in range(rounds):
        def tag_dist(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"src": batch["node"].to_numpy(), "dst": "",
                 "w": np.zeros(len(batch), dtype=np.int64),
                 "kind": np.int64(1),
                 "dist": batch["dist"].to_numpy(dtype=np.int64)}
            )

        def relax(bucket: pd.DataFrame) -> pd.DataFrame:
            d = bucket[bucket["kind"] == 1]
            if not len(d):
                return pd.DataFrame(
                    {"node": pd.Series([], dtype=str),
                     "dist": pd.Series([], dtype=np.int64)}
                )
            e = bucket.loc[bucket["kind"] == 0, ["src", "dst", "w"]]
            m = e.merge(
                d[["src", "dist"]].groupby("src", sort=False).min().reset_index(),
                on="src", how="inner",
            )
            cand = pd.DataFrame(
                {"node": m["dst"].to_numpy(),
                 "dist": (m["dist"] + m["w"]).to_numpy(dtype=np.int64)}
            )
            return cand.groupby("node", sort=False)["dist"].min().reset_index()

        candidates = grouped_aggregate(
            tagged_edges.union(
                dists.map_batches(tag_dist, batch_format="pandas")
            ),
            ["src"], relax, coalesce=True,
        )

        def tag_known(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[["node", "dist"]]

        def min_dist(bucket: pd.DataFrame) -> pd.DataFrame:
            out = (
                bucket.groupby("node", sort=False)["dist"].min().reset_index()
            )
            return out.astype({"dist": np.int64})

        dists = _compact(
            grouped_aggregate(
                dists.map_batches(tag_known, batch_format="pandas").union(
                    candidates
                ),
                ["node"], min_dist, coalesce=True,
            ),
            8,
        )

    return dists


def kg_shortest_paths_oracle(rounds: int = SSSP_ROUNDS) -> str:
    """Unrolled Bellman-Ford: one min-plus CTE per relaxation round —
    all-integer, so the distances hash-match exactly."""
    from entity_extractor_linker_ray.pipelines import simple_kg

    edges_sql = simple_kg.oracle_sql()["kg_edges"]
    parts = [
        f"""WITH base AS (
  SELECT subject AS src, object AS dst, CAST(weight AS BIGINT) AS w
  FROM ({edges_sql}) kg_e
),
edges AS (
  SELECT src, dst, MIN(w) AS w FROM (
    SELECT src, dst, w FROM base
    UNION ALL SELECT dst AS src, src AS dst, w FROM base
  ) u GROUP BY 1, 2
),
d0 AS (SELECT (SELECT MIN(src) FROM edges) AS node, 0 AS dist)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
d{i} AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d{i - 1}
    UNION ALL
    SELECT e.dst AS node, p.dist + e.w AS dist
    FROM edges e JOIN d{i - 1} p ON p.node = e.src
  ) u GROUP BY 1
)"""
        )
    parts.append(
        f"\nSELECT node, CAST(dist AS BIGINT) AS dist FROM d{rounds}"
    )
    return "".join(parts)


LINK_CANDIDATES_K = 20


def kg_link_candidates(sf_dir: str, k: int = LINK_CANDIDATES_K,
                       num_partitions: int = 8, edges_ds=None,
                       max_wedge_deg: int | None = None):
    """Link prediction by common neighbors over the STRONG-TIE graph:
    the top-k pairs NOT connected by an above-average-weight edge,
    ranked by how many strong neighbors they share — the classic
    missing-edge / KG-completion candidate generator (two entities
    that each co-occur strongly with the same third entities but not
    with each other; a weak edge predicted strong is a candidate too).
    The strong-tie restriction matters: a raw co-occurrence graph is a
    union of per-document cliques and quickly saturates complete, at
    which point "non-edge" is the empty set — thresholding at the
    mean keeps ~half the edges at ANY corpus size, and the comparison
    is the integer cross-multiply ``w·n ≥ Σw`` (no float mean), so no
    rounding mode can flip a boundary edge. The complement of
    :func:`kg_edge_jaccard`, built from the same two kernels:

    1. key (u, v): canonicalize to undirected pairs with ``w =
       max(weight)``; the global (n, Σw) total is a two-int
       all-reduce (per-batch partial sums, tiny driver combine) —
       the ONLY driver-side state, O(1) at any scale;
    2. key m: WEDGE generation — every middle vertex emits its
       distinct neighbor pairs, pre-counted per bucket (partial
       combine bounds the wire rows by distinct pairs per bucket);
    3. key (u, v): wedge partial counts meet edge MARKERS — pairs
       carrying a marker are existing strong edges and drop out (the
       anti-join); each bucket keeps only its LOCAL top-k by
       (n_common desc, u, v), so the final merge sorts ≤ buckets·k
       rows on the driver-side single partition.

    The (n_common desc, u, v) tie-break is total and identical in the
    oracle's ORDER BY, so both engines select the same k-set even at a
    tied boundary. All-integer ⇒ hash-exact."""
    import pyarrow as pa
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    def canon(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["subject"].astype(str)
        o = batch["object"].astype(str)
        lo = np.where(s < o, s, o)
        hi = np.where(s < o, o, s)
        out = pd.DataFrame(
            {"u": lo, "v": hi, "w": batch["weight"].to_numpy(dtype=np.int64)}
        )
        return out[lo != hi]

    def max_w(bucket: pd.DataFrame) -> pd.DataFrame:
        out = bucket.groupby(["u", "v"], sort=False)["w"].max().reset_index()
        return out.astype({"w": np.int64})

    base_edges = edges_ds if edges_ds is not None else _kg_edges_materialized(sf_dir)
    pairw = grouped_aggregate(
        base_edges.map_batches(canon, batch_format="pandas"),
        ["u", "v"], max_w, num_partitions=num_partitions,
    ).materialize()

    totals = collect_small(
        pairw.map_batches(
            lambda b: pd.DataFrame(
                {"n": [np.int64(len(b))],
                 "sw": [b["w"].to_numpy(dtype=np.int64).sum()]}
            ),
            batch_format="pandas",
        ),
        ["n", "sw"],
    )
    n_pairs = int(totals["n"].sum())
    sum_w = int(totals["sw"].sum())
    if n_pairs == 0:
        out_schema = pa.schema(
            [("u", pa.string()), ("v", pa.string()), ("n_common", pa.int64())]
        )
        return rd.from_arrow(out_schema.empty_table())

    edges = pairw.map_batches(
        lambda b: b.loc[
            b["w"].to_numpy(dtype=np.int64) * n_pairs >= sum_w, ["u", "v"]
        ],
        batch_format="pandas",
    ).materialize()

    def tag_mid(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"m": pd.concat([batch["u"], batch["v"]], ignore_index=True),
             "other": pd.concat([batch["v"], batch["u"]], ignore_index=True)}
        )

    def wedge_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        """Wedge pair counts as index arithmetic + integer
        unique-with-counts (same `_segmented_triu` shape as the other
        wedge kernels; no edge filter here — every pair is a
        candidate, the count IS the signal)."""
        empty = pd.DataFrame({"u": pd.Series([], dtype=str),
                              "v": pd.Series([], dtype=str),
                              "cnt": pd.Series([], dtype=np.int64)})
        nb = bucket[["m", "other"]].drop_duplicates()
        nb = nb.sort_values(["m", "other"], kind="stable")
        if max_wedge_deg is not None:
            nb = nb.groupby("m", sort=False).head(max_wedge_deg)
        if nb.empty:
            return empty
        codes, uniques = pd.factorize(nb["other"])
        codes = codes.astype(np.int64)
        ix, iy = _segmented_triu(pd.factorize(nb["m"])[0])
        if ix.size == 0:
            return empty
        n = np.int64(len(uniques))
        packed, counts = np.unique(codes[ix] * n + codes[iy],
                                   return_counts=True)
        uniq_arr = np.asarray(uniques, dtype=object)
        return pd.DataFrame({"u": uniq_arr[packed // n],
                             "v": uniq_arr[packed % n],
                             "cnt": counts.astype(np.int64)})

    wedges = grouped_aggregate(
        edges.map_batches(tag_mid, batch_format="pandas"),
        ["m"], wedge_counts, num_partitions=num_partitions,
    )

    def tag_wedge(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": batch["u"], "v": batch["v"],
                             "cnt": batch["cnt"].to_numpy(dtype=np.int64),
                             "is_edge": np.zeros(len(batch), dtype=np.int64)})

    def tag_edge(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": batch["u"], "v": batch["v"],
                             "cnt": np.zeros(len(batch), dtype=np.int64),
                             "is_edge": np.ones(len(batch), dtype=np.int64)})

    def local_topk(bucket: pd.DataFrame) -> pd.DataFrame:
        summed = (
            bucket.groupby(["u", "v"], sort=False)
            .agg(n_common=("cnt", "sum"), is_edge=("is_edge", "max"))
            .reset_index()
        )
        cand = summed[summed["is_edge"] == 0]
        top = cand.sort_values(
            ["n_common", "u", "v"], ascending=[False, True, True],
            kind="stable",
        ).head(k)
        return top[["u", "v", "n_common"]].astype({"n_common": np.int64})

    partials = grouped_aggregate(
        wedges.map_batches(tag_wedge, batch_format="pandas").union(
            edges.map_batches(tag_edge, batch_format="pandas")
        ),
        ["u", "v"], local_topk, num_partitions=num_partitions,
    )

    def final(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(
            ["n_common", "u", "v"], ascending=[False, True, True],
            kind="stable",
        ).head(k)

    out_schema = pa.schema(
        [("u", pa.string()), ("v", pa.string()), ("n_common", pa.int64())]
    )
    return partials.repartition(1).map_batches(
        final, batch_format="pandas"
    ).union(rd.from_arrow(out_schema.empty_table()))


def kg_link_candidates_oracle(k: int = LINK_CANDIDATES_K) -> str:
    """Wedge self-join minus the strong-tie edge set via NOT EXISTS,
    same integer above-mean cutoff (``w·n ≥ Σw``) and the same total
    (n_common desc, u, v) ordering for a deterministic k-set."""
    from entity_extractor_linker_ray.pipelines import simple_kg

    edges_sql = simple_kg.oracle_sql()["kg_edges"]
    return f"""
WITH raw AS (
  SELECT subject AS s, object AS o, weight FROM ({edges_sql}) kg_e
),
pairw AS (
  SELECT LEAST(s, o) AS u, GREATEST(s, o) AS v,
         CAST(MAX(weight) AS BIGINT) AS w
  FROM raw WHERE s <> o GROUP BY 1, 2
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(w) AS BIGINT) AS sw
  FROM pairw
),
edges AS (
  SELECT u, v FROM pairw, tot WHERE w * n >= sw
),
nbr AS (
  SELECT u AS node, v AS nb FROM edges
  UNION ALL
  SELECT v AS node, u AS nb FROM edges
),
wedge AS (
  SELECT n1.nb AS u, n2.nb AS v, CAST(count(*) AS BIGINT) AS n_common
  FROM nbr n1
  JOIN nbr n2 ON n2.node = n1.node AND n1.nb < n2.nb
  GROUP BY 1, 2
)
SELECT w.u, w.v, w.n_common
FROM wedge w
WHERE NOT EXISTS (
  SELECT 1 FROM edges e WHERE e.u = w.u AND e.v = w.v
)
ORDER BY w.n_common DESC, w.u ASC, w.v ASC
LIMIT {k}
"""


def kg_clustering_coefficient(sf_dir: str, num_partitions: int = 8,
                              edges_ds=None,
                              max_wedge_deg: int | None = None):
    """Per-node local clustering coefficient — ``cc(v) = 2·T(v) /
    (deg(v)·(deg(v)−1))`` where T(v) counts triangles through v: how
    close each entity's neighborhood is to a clique, the node-level
    form of the global motif count :func:`kg_triangles` and the
    standard community / role feature.

    Distributed plan (same wedge kernel family as
    :func:`kg_edge_jaccard`, no driver graph state):

    1. key (u, v): canonical undirected edge set (dedup, materialized
       once for three consumers);
    2. key m: wedge generation, CARRYING the middle — each middle
       vertex emits (a, c, m) for every distinct neighbor pair a < c
       (Σ deg(m)² rows, the documented celebrity-vertex trade);
    3. key (a, c): wedges meet edge markers — a wedge whose endpoint
       pair IS an edge closes the triangle {a, m, c} at its middle m;
       the bucket pre-counts closed wedges per middle, so the wire
       rows of the next hop are node-bounded;
    4. key node: T partials and degree rows meet — one vectorized
       final computes the coefficient; nodes on no triangle keep
       T = 0 (LEFT semantics), degree-1 nodes define cc = 0.

    The only float is ONE closed-form division of exact int64s,
    written identically in the oracle — hash-exact."""
    import pyarrow as pa
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def canon(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["subject"].astype(str)
        o = batch["object"].astype(str)
        lo = np.where(s < o, s, o)
        hi = np.where(s < o, o, s)
        return pd.DataFrame({"u": lo, "v": hi})[lo != hi]

    base_edges = edges_ds if edges_ds is not None else _kg_edges_materialized(sf_dir)
    edges = grouped_aggregate(
        base_edges.map_batches(canon, batch_format="pandas"),
        ["u", "v"],
        lambda b: b[["u", "v"]].drop_duplicates(),
        num_partitions=num_partitions,
    ).materialize()

    # broadcast semi-join: only CLOSED wedges (endpoint pair is an
    # edge) contribute to T(v); filter at generation, exact via the
    # edge-marker join below (see kg_edge_jaccard).
    edge_filter_ref = _edge_hash_filter(edges)

    def tag_mid(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"m": pd.concat([batch["u"], batch["v"]], ignore_index=True),
             "other": pd.concat([batch["v"], batch["u"]], ignore_index=True)}
        )

    def wedge_with_mid(bucket: pd.DataFrame) -> pd.DataFrame:
        """Same positional int-array wedge generation as
        :func:`kg_edge_jaccard` (strings hashed once, Σ deg(m)²
        candidates probed as pre-combined uint64s, survivors-only
        string materialization) — here CARRYING the middle, since the
        closed wedge credits its triangle to m. Replaces the former
        per-middle Python triu loop."""
        empty = pd.DataFrame({"a": pd.Series([], dtype=str),
                              "c": pd.Series([], dtype=str),
                              "m": pd.Series([], dtype=str)})
        nb = bucket[["m", "other"]].drop_duplicates()
        nb = nb.sort_values(["m", "other"], kind="stable")
        if max_wedge_deg is not None:
            nb = nb.groupby("m", sort=False).head(max_wedge_deg)
        if nb.empty:
            return empty
        other = nb["other"].to_numpy(dtype=object)
        mids = nb["m"].to_numpy(dtype=object)
        h = _string_hashes(nb["other"])
        # ascending positions ⟺ a < c within a middle (sorted above)
        ia, ic = _segmented_triu(pd.factorize(nb["m"])[0])
        if ia.size == 0:
            return empty
        import ray

        mask = _probe_hashes(_combine_pair(h[ia], h[ic]),
                             ray.get(edge_filter_ref))
        ia, ic = ia[mask], ic[mask]
        if ia.size == 0:
            return empty
        return pd.DataFrame({"a": other[ia], "c": other[ic],
                             "m": mids[ia]})

    wedges = grouped_aggregate(
        edges.map_batches(tag_mid, batch_format="pandas"),
        ["m"], wedge_with_mid, num_partitions=num_partitions,
    )

    def tag_wedge(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": batch["a"], "v": batch["c"],
                             "m": batch["m"],
                             "is_edge": np.zeros(len(batch), dtype=np.int64)})

    def tag_edge(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": batch["u"], "v": batch["v"],
                             "m": np.full(len(batch), "", dtype=object),
                             "is_edge": np.ones(len(batch), dtype=np.int64)})

    def closed_per_mid(bucket: pd.DataFrame) -> pd.DataFrame:
        is_edge = bucket.loc[bucket["is_edge"] == 1, ["u", "v"]].drop_duplicates()
        w = bucket[bucket["is_edge"] == 0]
        closed = w.merge(is_edge, on=["u", "v"], how="inner")
        if not len(closed):
            return pd.DataFrame({"node": pd.Series([], dtype=str),
                                 "t": pd.Series([], dtype=np.int64)})
        out = closed.groupby("m", sort=False).size().reset_index(name="t")
        return pd.DataFrame({"node": out["m"],
                             "t": out["t"].to_numpy(dtype=np.int64)})

    tri = grouped_aggregate(
        wedges.map_batches(tag_wedge, batch_format="pandas").union(
            edges.map_batches(tag_edge, batch_format="pandas")
        ),
        ["u", "v"], closed_per_mid, num_partitions=num_partitions,
        coalesce=True,  # tagged-union join
    )

    def deg_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.concat([batch["u"], batch["v"]], ignore_index=True),
             "t": np.zeros(2 * len(batch), dtype=np.int64),
             "d": np.ones(2 * len(batch), dtype=np.int64)}
        )

    def tri_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": batch["node"],
             "t": batch["t"].to_numpy(dtype=np.int64),
             "d": np.zeros(len(batch), dtype=np.int64)}
        )

    def finalize(bucket: pd.DataFrame) -> pd.DataFrame:
        g = (
            bucket.groupby("node", sort=False)
            .agg(t=("t", "sum"), d=("d", "sum"))
            .reset_index()
        )
        t = g["t"].to_numpy(dtype=np.int64)
        d = g["d"].to_numpy(dtype=np.int64)
        denom = np.where(d >= 2, d * (d - 1), 1)
        cc = np.where(
            d >= 2,
            (2 * t).astype(np.float64) / denom.astype(np.float64),
            0.0,
        )
        return pd.DataFrame(
            {"node": g["node"], "degree": d, "n_triangles": t,
             "local_cc": cc}
        )

    out = grouped_aggregate(
        edges.map_batches(deg_rows, batch_format="pandas").union(
            tri.map_batches(tri_rows, batch_format="pandas")
        ),
        ["node"], finalize, num_partitions=num_partitions,
        coalesce=True,  # tagged-union join
    )
    out_schema = pa.schema(
        [("node", pa.string()), ("degree", pa.int64()),
         ("n_triangles", pa.int64()), ("local_cc", pa.float64())]
    )
    return out.union(rd.from_arrow(out_schema.empty_table()))


def kg_clustering_coefficient_oracle() -> str:
    """Same canonical edge set; triangles-per-middle via the
    wedge/edge join, the coefficient as the identical single int/int
    divide."""
    from entity_extractor_linker_ray.pipelines import simple_kg

    edges_sql = simple_kg.oracle_sql()["kg_edges"]
    return f"""
WITH raw AS (
  SELECT subject AS s, object AS o FROM ({edges_sql}) kg_e
),
edges AS (
  SELECT DISTINCT LEAST(s, o) AS u, GREATEST(s, o) AS v
  FROM raw WHERE s <> o
),
nbr AS (
  SELECT u AS node, v AS nb FROM edges
  UNION ALL
  SELECT v AS node, u AS nb FROM edges
),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM nbr GROUP BY 1),
tri AS (
  SELECT n1.node AS m, CAST(count(*) AS BIGINT) AS t
  FROM nbr n1
  JOIN nbr n2 ON n2.node = n1.node AND n1.nb < n2.nb
  JOIN edges e ON e.u = n1.nb AND e.v = n2.nb
  GROUP BY 1
)
SELECT d.node,
       d.d AS degree,
       CAST(COALESCE(t.t, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d.d >= 2
            THEN CAST(2 * COALESCE(t.t, 0) AS DOUBLE)
                 / CAST(d.d * (d.d - 1) AS DOUBLE)
            ELSE 0.0 END AS local_cc
FROM deg d LEFT JOIN tri t ON t.m = d.node
"""


def kg_personalized_pagerank(sf_dir: str, iters: int = 5):
    """Personalized PageRank (random walk with restart) from the
    lexicographically smallest entity over the co-occurrence KG —
    rank as PROXIMITY to one seed node, the standard
    related-entity / recommendation primitive, versus
    :func:`kg_pagerank`'s global importance. Same deterministic
    integer fixed-point engine (``pagerank(source=...)``), so the
    unrolled-CTE oracle hash-matches exactly; nodes the walk never
    reaches hold rank 0 (no uniform teleport floor)."""
    import pyarrow as pa
    import ray.data as rd

    base = _kg_edges_materialized(sf_dir)
    src_df = base.map_batches(
        lambda b: pd.DataFrame(
            {"node": [min(b["subject"].min(), b["object"].min())]}
            if len(b) else {"node": []}
        ),
        batch_format="pandas",
    ).to_pandas()
    if "node" not in src_df.columns or not len(src_df):
        return rd.from_arrow(
            pa.schema([("node", pa.string()), ("rank", pa.int64())]).empty_table()
        )
    source = src_df["node"].min()

    def to_src_dst(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": batch["subject"], "dst": batch["object"],
             "weight": batch["weight"].to_numpy(dtype=np.int64)}
        )

    edges = base.map_batches(to_src_dst, batch_format="pandas")
    return pagerank(edges, iters=iters, num_partitions=8, source=source)


def kg_personalized_pagerank_oracle(iters: int = 5) -> str:
    """Unrolled fixed-point CTEs with the teleport mass CASE-gated to
    the seed node (the MIN entity), mirroring ``pagerank(source=...)``
    bit for bit."""
    from entity_extractor_linker_ray.pipelines import simple_kg

    edges_sql = simple_kg.oracle_sql()["kg_edges"]
    parts = [
        f"""WITH edges AS (
  SELECT subject AS src, object AS dst, CAST(weight AS BIGINT) AS weight
  FROM ({edges_sql}) kg_e
),
outw AS (SELECT src, SUM(weight) AS ow FROM edges GROUP BY 1),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) u
),
seed AS (SELECT MIN(node) AS s FROM nodes),
r0 AS (
  SELECT node,
         CAST(CASE WHEN node = (SELECT s FROM seed)
              THEN {PR_SCALE} ELSE 0 END AS BIGINT) AS rank
  FROM nodes
)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
r{i} AS (
  SELECT n.node,
         CAST(CASE WHEN n.node = (SELECT s FROM seed)
                   THEN {PR_BASE} ELSE 0 END
              + ({PR_DAMP_NUM} * COALESCE(c.inc, 0)) // {PR_SCALE}
              AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM((r.rank * e.weight) // o.ow) AS inc
    FROM edges e
    JOIN r{i - 1} r ON r.node = e.src
    JOIN outw o ON o.src = e.src
    GROUP BY 1
  ) c ON c.node = n.node
)"""
        )
    parts.append(f"\nSELECT node, rank FROM r{iters}")
    return "".join(parts)


HITS_ROUNDS = 3


def kg_hits(sf_dir: str, rounds: int = HITS_ROUNDS, num_partitions: int = 8,
            edges_ds=None):
    """HITS hubs & authorities over the DIRECTED KG edge list — the
    classic complement to PageRank: an authority is pointed at by
    good hubs, a hub points at good authorities (Kleinberg 1999).
    On a subject→object triple graph, authorities are the entities
    statements are ABOUT; hubs are the entities that make statements.

    Deterministic integer fixed point, like :func:`pagerank`: per
    round ``a_raw(v) = Σ_{u→v} h(u)·w`` then ``h_raw(u) = Σ_{u→v}
    a(v)·w``, each renormalized by PURE integer division ``x // d``
    with ``d = max(max_x // SCALE, 1)`` — a multiply-free stand-in
    for the L∞ normalization real HITS uses (no overflow, no float,
    and the scalar ``max_x`` is an O(1) all-reduce per round). Every
    step is one bucketed message exchange (scores meet edges on the
    sending key; receiver sums pre-combined per bucket), so the plan
    is 2 exchanges + 2 scalar reduces per round plus one final
    universe join that fills sink/source nodes with 0. Unrolls into
    one CTE pair per round — hash-exact vs the oracle."""
    import pyarrow as pa
    import ray.data as rd

    from entity_extractor_linker_ray.ops.shuffle import (
        collect_small,
        grouped_aggregate,
    )

    def norm_edges(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": batch["subject"].astype(str),
             "dst": batch["object"].astype(str),
             "weight": batch["weight"].to_numpy(dtype=np.int64)}
        )

    base = edges_ds if edges_ds is not None else _kg_edges_materialized(sf_dir)
    edges = _compact(
        base.map_batches(norm_edges, batch_format="pandas"), num_partitions
    )

    def node_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.concat([batch["src"], batch["dst"]], ignore_index=True)}
        )

    nodes = grouped_aggregate(
        edges.map_batches(node_rows, batch_format="pandas"), ["node"],
        lambda b: b[["node"]].drop_duplicates(), num_partitions=num_partitions,
    ).materialize()
    if nodes.count() == 0:
        return rd.from_arrow(
            pa.schema([("node", pa.string()), ("hub", pa.int64()),
                       ("auth", pa.int64())]).empty_table()
        )

    hub = nodes.map_batches(
        lambda b: pd.DataFrame(
            {"node": b["node"], "score": np.full(len(b), PR_SCALE, dtype=np.int64)}
        ),
        batch_format="pandas",
    ).materialize()
    auth = None

    def _message_pass(scores, key: str, target: str):
        """scores(node, score) meet edges on ``key``; the ``target``
        end receives score·weight, summed per bucket then globally."""
        def tag_score(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"key": batch["node"], "other": "",
                 "weight": np.zeros(len(batch), dtype=np.int64),
                 "score": batch["score"].to_numpy(dtype=np.int64),
                 "side": np.zeros(len(batch), dtype=np.int64)}
            )

        def tag_edge(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"key": batch[key], "other": batch[target],
                 "weight": batch["weight"].to_numpy(dtype=np.int64),
                 "score": np.zeros(len(batch), dtype=np.int64),
                 "side": np.ones(len(batch), dtype=np.int64)}
            )

        def contribs(bucket: pd.DataFrame) -> pd.DataFrame:
            s = bucket[bucket["side"] == 0][["key", "score"]]
            e = bucket[bucket["side"] == 1][["key", "other", "weight"]]
            m = e.merge(s, on="key", how="inner")
            if m.empty:
                return pd.DataFrame(
                    {"node": pd.Series([], dtype=str),
                     "raw": pd.Series([], dtype=np.int64)}
                )
            raw = m["score"].to_numpy(dtype=np.int64) * m["weight"].to_numpy(
                dtype=np.int64
            )
            out = pd.DataFrame({"node": m["other"], "raw": raw})
            return (
                out.groupby("node", sort=False)["raw"].sum().reset_index()
                .astype({"raw": np.int64})
            )

        msgs = grouped_aggregate(
            scores.map_batches(tag_score, batch_format="pandas").union(
                edges.map_batches(tag_edge, batch_format="pandas")
            ),
            ["key"], contribs, num_partitions=num_partitions,
        )
        summed = grouped_aggregate(
            msgs, ["node"],
            lambda b: b.groupby("node", sort=False)["raw"].sum().reset_index()
            .astype({"raw": np.int64}),
            num_partitions=num_partitions,
        ).materialize()
        mx = collect_small(
            summed.map_batches(
                lambda b: pd.DataFrame(
                    {"m": [b["raw"].to_numpy(dtype=np.int64).max()]}
                    if len(b) else {"m": []}
                ),
                batch_format="pandas",
            ),
            ["m"],
        )
        max_raw = int(mx["m"].max()) if len(mx) else 0
        d = max(max_raw // PR_SCALE, 1)
        return summed.map_batches(
            lambda b, _d=d: pd.DataFrame(
                {"node": b["node"],
                 "score": (b["raw"].to_numpy(dtype=np.int64) // _d)}
            ),
            batch_format="pandas",
        ).materialize()

    for _ in range(rounds):
        auth = _message_pass(hub, "src", "dst")
        hub = _message_pass(auth, "dst", "src")

    def tag(ds, col: str, kind: int):
        return ds.map_batches(
            lambda b, _k=kind: pd.DataFrame(
                {"node": b["node"],
                 "score": b[col].to_numpy(dtype=np.int64)
                 if col in b.columns else np.zeros(len(b), dtype=np.int64),
                 "kind": np.full(len(b), _k, dtype=np.int64)}
            ),
            batch_format="pandas",
        )

    def finalize(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.pivot_table(index="node", columns="kind", values="score",
                               aggfunc="sum", fill_value=0)
        g = g.reindex(columns=[0, 1, 2], fill_value=0)
        base_nodes = bucket.loc[bucket["kind"] == 0, "node"].unique()
        g = g.loc[g.index.isin(base_nodes)]
        return pd.DataFrame(
            {"node": g.index.to_numpy(),
             "hub": g[1].to_numpy(dtype=np.int64),
             "auth": g[2].to_numpy(dtype=np.int64)}
        )

    out = grouped_aggregate(
        tag(nodes.map_batches(
            lambda b: pd.DataFrame(
                {"node": b["node"], "score": np.zeros(len(b), dtype=np.int64)}
            ),
            batch_format="pandas",
        ), "score", 0).union(tag(hub, "score", 1)).union(tag(auth, "score", 2)),
        ["node"], finalize, num_partitions=num_partitions,
        coalesce=True,  # tagged-union join
    )
    out_schema = pa.schema(
        [("node", pa.string()), ("hub", pa.int64()), ("auth", pa.int64())]
    )
    return out.union(rd.from_arrow(out_schema.empty_table()))


def kg_hits_oracle(rounds: int = HITS_ROUNDS) -> str:
    """One (authority, hub) CTE pair per round; normalization is the
    same multiply-free ``x // GREATEST(max_x // SCALE, 1)``."""
    from entity_extractor_linker_ray.pipelines import simple_kg

    edges_sql = simple_kg.oracle_sql()["kg_edges"]
    parts = [
        f"""WITH edges AS (
  SELECT subject AS src, object AS dst, CAST(weight AS BIGINT) AS weight
  FROM ({edges_sql}) kg_e
),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) u
),
h0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS score FROM nodes)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
araw{i} AS (
  SELECT e.dst AS node, SUM(h.score * e.weight) AS raw
  FROM edges e JOIN h{i - 1} h ON h.node = e.src GROUP BY 1
),
a{i} AS (
  SELECT node,
         CAST(raw // GREATEST((SELECT MAX(raw) FROM araw{i}) // {PR_SCALE}, 1)
              AS BIGINT) AS score
  FROM araw{i}
),
hraw{i} AS (
  SELECT e.src AS node, SUM(a.score * e.weight) AS raw
  FROM edges e JOIN a{i} a ON a.node = e.dst GROUP BY 1
),
h{i} AS (
  SELECT node,
         CAST(raw // GREATEST((SELECT MAX(raw) FROM hraw{i}) // {PR_SCALE}, 1)
              AS BIGINT) AS score
  FROM hraw{i}
)"""
        )
    parts.append(
        f"""
SELECT n.node,
       CAST(COALESCE(h.score, 0) AS BIGINT) AS hub,
       CAST(COALESCE(a.score, 0) AS BIGINT) AS auth
FROM nodes n
LEFT JOIN h{rounds} h ON h.node = n.node
LEFT JOIN a{rounds} a ON a.node = n.node"""
    )
    return "".join(parts)


def kg_random_walks(sf_dir: str, steps: int = 3):
    """Deterministic walk corpus over the undirected co-occurrence KG —
    the data-generation step behind DeepWalk/node2vec-style graph
    embeddings, made hash-gateable by replacing the RNG with a
    reproducible selection rule: from node u at step t the walk moves
    to the neighbor at index ``(7·len(u) + 3·t) mod deg(u)`` in u's
    name-sorted adjacency list (pure integer arithmetic both engines
    can compute; walks are diverse enough for a corpus while being
    bit-identical everywhere). One walk starts at every node; each
    step is ONE bucketed exchange joining the frontier to the
    adjacency on hash(current) — adjacency ranks and degrees are
    computed inside the bucket where all of u's edges are co-located,
    so no global sort or driver-side graph state exists. Output:
    (start_node, step, node) path rows, steps 0..``steps``."""
    import ray.data as rd

    from entity_extractor_linker_ray.pipelines import simple_kg
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    base = simple_kg.kg_edges(sf_dir).select_columns(["subject", "object"])

    def both_dirs(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["subject"].astype(str).to_numpy()
        o = batch["object"].astype(str).to_numpy()
        out = pd.DataFrame(
            {"u": np.concatenate([s, o]), "v": np.concatenate([o, s])}
        )
        return out.drop_duplicates()

    edges = _compact(
        base.map_batches(both_dirs, batch_format="pandas"), 8
    ).materialize()

    def init_frontier(batch: pd.DataFrame) -> pd.DataFrame:
        u = pd.unique(batch["u"].astype(str).to_numpy())
        return pd.DataFrame({"key": u, "start": u, "cur": u})

    frontier = _compact(
        grouped_aggregate(
            edges.map_batches(init_frontier, batch_format="pandas"),
            ["key"],
            lambda b: b.drop_duplicates(["start"])[["start", "cur"]].assign(
                key=lambda d: d["cur"]
            ),
            num_partitions=8,
        ),
        8,
    )
    paths = [frontier.map_batches(
        lambda b, s=0: pd.DataFrame(
            {"start_node": b["start"].astype(str).to_numpy(),
             "step": np.zeros(len(b), dtype=np.int64),
             "node": b["cur"].astype(str).to_numpy()}
        ),
        batch_format="pandas",
    )]

    def tag_edges(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": batch["u"].astype(str).to_numpy(),
             "start": np.full(len(batch), "", dtype=object),
             "cur": batch["v"].astype(str).to_numpy(),
             "side": np.ones(len(batch), dtype=np.int64)}
        )

    tagged_edges = edges.map_batches(tag_edges, batch_format="pandas")

    for t in range(steps):
        def tag_frontier(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"key": batch["cur"].astype(str).to_numpy(),
                 "start": batch["start"].astype(str).to_numpy(),
                 "cur": batch["cur"].astype(str).to_numpy(),
                 "side": np.zeros(len(batch), dtype=np.int64)}
            )

        unioned = frontier.map_batches(
            tag_frontier, batch_format="pandas"
        ).union(tagged_edges)

        def advance(bucket: pd.DataFrame, t=t) -> pd.DataFrame:
            fr = bucket[bucket["side"] == 0][["key", "start"]]
            adj = bucket[bucket["side"] == 1][["key", "cur"]].rename(
                columns={"cur": "v"}
            )
            if fr.empty or adj.empty:
                return pd.DataFrame(
                    {"start": pd.Series([], dtype=str),
                     "cur": pd.Series([], dtype=str)}
                )
            # both_dirs dedups per BATCH only; finish the global dedup
            # here where all of u's edges are co-located
            adj = adj.drop_duplicates(["key", "v"])
            adj = adj.sort_values(["key", "v"], kind="stable")
            adj["rn"] = adj.groupby("key", sort=False).cumcount()
            deg = adj.groupby("key", sort=False)["v"].transform("size")
            adj["deg"] = deg.to_numpy(dtype=np.int64)
            klen = fr["key"].str.len().to_numpy(dtype=np.int64)
            fr = fr.assign(want=np.int64(7) * klen + np.int64(3) * t)
            m = fr.merge(adj, on="key", how="inner")
            m = m[m["rn"] == m["want"] % m["deg"]]
            return pd.DataFrame(
                {"start": m["start"].astype(str).to_numpy(),
                 "cur": m["v"].astype(str).to_numpy()}
            )

        # pin per round — a lazy frontier would re-execute every
        # prior round's exchange for each later step AND for each
        # paths[] consumer (O(steps^2) recompute)
        frontier = _compact(
            grouped_aggregate(unioned, ["key"], advance, num_partitions=8),
            8,
        )
        paths.append(frontier.map_batches(
            lambda b, s=t + 1: pd.DataFrame(
                {"start_node": b["start"].astype(str).to_numpy(),
                 "step": np.full(len(b), s, dtype=np.int64),
                 "node": b["cur"].astype(str).to_numpy()}
            ),
            batch_format="pandas",
        ))
        frontier = frontier.map_batches(
            lambda b: b[["start", "cur"]], batch_format="pandas"
        )

    out = paths[0]
    for p in paths[1:]:
        out = out.union(p)
    return out


def kg_random_walks_oracle(steps: int = 3) -> str:
    from entity_extractor_linker_ray.pipelines import simple_kg

    edges_sql = simple_kg.oracle_sql()["kg_edges"]
    parts = [f"""WITH base AS (
  SELECT subject AS u, object AS v FROM ({edges_sql}) kg_e
),
edges AS (
  SELECT DISTINCT u, v FROM (
    SELECT u, v FROM base UNION ALL SELECT v AS u, u AS v FROM base)
),
adj AS (
  SELECT u, v,
         CAST(row_number() OVER (PARTITION BY u ORDER BY v) - 1 AS BIGINT)
           AS rn,
         CAST(count(*) OVER (PARTITION BY u) AS BIGINT) AS deg
  FROM edges
),
nodes AS (SELECT DISTINCT u AS node FROM edges),
s0 AS (SELECT node AS start, node AS cur FROM nodes)"""]
    for t in range(steps):
        parts.append(f""",
s{t + 1} AS (
  SELECT s{t}.start, adj.v AS cur
  FROM s{t} JOIN adj ON adj.u = s{t}.cur
   AND adj.rn = (7 * length(s{t}.cur) + {3 * t}) % adj.deg
)""")
    selects = [
        f"SELECT start AS start_node, CAST({s} AS BIGINT) AS step, "
        f"cur AS node FROM s{s}"
        for s in range(steps + 1)
    ]
    parts.append("\n" + "\nUNION ALL\n".join(selects))
    return "".join(parts)


def dedup_cluster_sizes(sf_dir: str):
    """Duplicate-cluster SIZE distribution — the curation dashboard's
    'how big are our duplicate families' histogram (a few huge
    clusters mean template spam; many pairs mean boilerplate):
    connected components over the verified n-gram-Jaccard pairs
    (:func:`duplicate_clusters`), then two bounded aggregates — member
    count per cluster, cluster count per size. Output is bounded by
    the largest family size, never by corpus size."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    clusters = duplicate_clusters_cached(sf_dir)

    def size_partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"cluster_id": batch["cluster_id"].to_numpy(dtype=np.int64),
             "n": np.ones(len(batch), dtype=np.int64)}
        )
        return out.groupby("cluster_id", sort=False, as_index=False)["n"].sum()

    def per_cluster(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("cluster_id", sort=False, as_index=False)["n"].sum()
        h = g.groupby("n", sort=False).size().reset_index(name="n_clusters")
        return h.rename(columns={"n": "cluster_size"}).astype(
            {"cluster_size": np.int64, "n_clusters": np.int64}
        )

    partials = grouped_aggregate(clusters, ["cluster_id"], per_cluster,
                                 partial=size_partial, num_partitions=8)

    def hist(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("cluster_size", sort=False, as_index=False)[
                "n_clusters"
            ].sum().astype({"cluster_size": np.int64, "n_clusters": np.int64})
        )

    return grouped_aggregate(partials, ["cluster_size"], hist,
                             num_partitions=4)


def dedup_cluster_sizes_oracle() -> str:
    return f"""
WITH clusters AS ({duplicate_clusters_oracle().strip()}),
sizes AS (
  SELECT cluster_id, count(*) AS cluster_size FROM clusters GROUP BY 1
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       count(*) AS n_clusters
FROM sizes GROUP BY 1
"""


def label_propagation(edges, rounds: int = 4, num_partitions: int = 16):
    """Synchronous label-propagation community detection over a
    message-edge Dataset with int64 columns ``s`` → ``d`` (pass BOTH
    directions for an undirected graph) — the Raghavan-Albert-Kumara
    algorithm made deterministic: every node starts labeled with its
    own id, and each round EVERY node simultaneously adopts the most
    frequent label among its in-neighbors, ties broken toward the
    smallest label; an isolated node keeps its own. A fixed round
    budget (synchronous LPA may oscillate on bipartite-ish structures,
    so a convergence check is not a termination proof) makes the
    output a pure function of the edge set — bit-identical at any
    parallelism.

    Shape per round (the :func:`min_label_components` machinery with a
    MODE combine instead of MIN): labels tag themselves onto their
    out-edges in one src-keyed bucket join; the (dst, label) messages
    collapse to per-(node, label) COUNT partials before the node-keyed
    exchange — so wire volume is bounded by distinct (node, incoming
    label) pairs, not message multiplicity — and each bucket picks the
    (count desc, label asc) winner vectorized. State is
    `_compact`-pinned between rounds."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    edges = _compact(edges, num_partitions)

    def init_labels(batch: pd.DataFrame) -> pd.DataFrame:
        # Seed from BOTH endpoints so a node appearing only as a
        # destination on a one-direction edge set still gets a label
        # row (matches the replicas and the oracle nodes CTEs, which
        # union s and d). Min-dedup in the aggregate collapses the
        # duplicates, so symmetric edge sets are unchanged.
        n = np.concatenate([batch["s"].to_numpy(dtype=np.int64),
                            batch["d"].to_numpy(dtype=np.int64)])
        return pd.DataFrame({"node": n, "label": n})

    labels = _compact(
        grouped_aggregate(
            edges.map_batches(init_labels, batch_format="pandas"),
            ["node"], _labels_min, num_partitions=num_partitions,
        ),
        num_partitions,
    )

    def tag_labels(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["node"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"key": n, "node": n,
             "label": batch["label"].to_numpy(dtype=np.int64),
             "side": np.zeros(len(n), dtype=np.int64)}
        )

    def tag_edges(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": batch["s"].to_numpy(dtype=np.int64),
             "node": batch["d"].to_numpy(dtype=np.int64),
             "label": np.full(len(batch), -1, dtype=np.int64),
             "side": np.ones(len(batch), dtype=np.int64)}
        )

    tagged_edges = _compact(
        edges.map_batches(tag_edges, batch_format="pandas"), num_partitions
    )

    def send_msgs(bucket: pd.DataFrame) -> pd.DataFrame:
        """Per src-bucket: own label rides along with weight 0 (keeps
        isolated nodes alive through the mode pick); each out-edge
        carries the src's label to its dst with weight 1. Collapsed to
        (node, label, w) partial counts before leaving the bucket."""
        own = bucket[bucket["side"] == 0][["key", "node", "label"]]
        e = bucket[bucket["side"] == 1][["key", "node"]]
        keep = own[["node", "label"]].copy()
        keep["w"] = np.int64(0)
        if e.empty:
            return keep.astype({"node": np.int64, "label": np.int64,
                                "w": np.int64})
        msgs = e.merge(
            own[["key", "label"]].rename(columns={"label": "src_label"}),
            on="key",
        )[["node", "src_label"]].rename(columns={"src_label": "label"})
        msgs = (
            msgs.groupby(["node", "label"], sort=False)
            .size()
            .reset_index(name="w")
        )
        out = pd.concat([keep, msgs], ignore_index=True)
        return out.astype({"node": np.int64, "label": np.int64,
                           "w": np.int64})

    def mode_pick(bucket: pd.DataFrame) -> pd.DataFrame:
        g = (
            bucket.groupby(["node", "label"], sort=False)["w"]
            .sum()
            .reset_index()
        )
        # all-zero weight (isolated node) → its own w=0 row wins;
        # otherwise the neighbor mode: count desc, label asc
        g = g.sort_values(["node", "w", "label"],
                          ascending=[True, False, True], kind="stable")
        win = g.drop_duplicates("node", keep="first")
        return win[["node", "label"]].astype(
            {"node": np.int64, "label": np.int64}
        )

    for _ in range(rounds):
        unioned = labels.map_batches(tag_labels, batch_format="pandas").union(
            tagged_edges
        )
        candidates = grouped_aggregate(
            unioned, ["key"], send_msgs, num_partitions=num_partitions
        )
        labels = _compact(
            grouped_aggregate(
                candidates, ["node"], mode_pick,
                num_partitions=num_partitions,
            ),
            num_partitions,
        )
    return labels


def label_propagation_replica(edges_df: pd.DataFrame,
                              rounds: int = 4) -> pd.DataFrame:
    """Single-machine synchronous-LPA twin over an (s, d) message-edge
    frame — the correctness reference :func:`label_propagation` is
    pytest-asserted equal to."""
    nodes = np.unique(
        np.concatenate([edges_df["s"].to_numpy(dtype=np.int64),
                        edges_df["d"].to_numpy(dtype=np.int64)])
    )
    labels = {int(n): int(n) for n in nodes}
    adj: dict = {}
    for s, d in zip(edges_df["s"].to_numpy(dtype=np.int64),
                    edges_df["d"].to_numpy(dtype=np.int64)):
        adj.setdefault(int(d), []).append(int(s))
    for _ in range(rounds):
        new = {}
        for n in labels:
            counts: dict = {}
            for nb in adj.get(n, ()):  # incoming neighbors
                lab = labels[nb]
                counts[lab] = counts.get(lab, 0) + 1
            if counts:
                new[n] = min(counts, key=lambda l: (-counts[l], l))
            else:
                new[n] = labels[n]
        labels = new
    return pd.DataFrame(
        {"node": np.array(sorted(labels), dtype=np.int64),
         "label": np.array([labels[n] for n in sorted(labels)],
                           dtype=np.int64)}
    )
