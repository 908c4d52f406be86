"""Deterministic synthetic power-law graph + graph ops at real scale.

The co-occurrence KG derived from the testdata corpora saturates at ~12
nodes (complete K12), so the iterative graph family (`ops/graph_algos`)
only ever showed exchange latency there. This module generates a
NON-TOY graph — 10^5 nodes, heavy-tailed degrees, a planted dense core —
entirely inside ``map_batches`` (no driver-side edge list), and exposes
pagerank / k-core / triangle-count / degree-profile entry points over it
so the compute regime those kernels claim to serve is actually
benchmarked (hot-vertex fan-out, wedge explosion under the documented
degree cap, per-round message volume ≫ exchange latency).

Generator model (a hash-kernel Chung-Lu / preferential-attachment
stand-in): node ``i`` gets out-degree ``deg_i`` from a Pareto-ish map of
a per-node hash (mean ≈ ``avg_deg``, cap ``max_deg``); its k-th edge
points at ``dst = floor(n * u^gamma)`` where ``u`` is a per-(i,k) hash
in [0,1) — the ``u^gamma`` map concentrates mass on low ids, giving an
in-degree power law with planted celebrity vertices. Self-loops are
dropped and per-source duplicates deduped inside the kernel, so the
edge stream needs NO global shuffle to be a simple digraph. Everything
is a pure function of (n_nodes, avg_deg, seed) via splitmix64-style
mixing — byte-identical at any parallelism (asserted in pytest).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from entity_extractor_linker_ray.ops import memo as _memo

N_NODES = 100_000
AVG_DEG = 12
MAX_DEG = 256
GAMMA = 3.0  # dst = floor(n * u^gamma): in-degree tail exponent knob
PR_ITERS = 5
# k=14 is the interesting regime on this graph (probed at n=100k,
# seed 7): the prune CASCADES — 30 rounds to fixpoint, 26k survivors —
# instead of k<=12's near-no-op or k>=16's total collapse. 8 bounded
# rounds of that cascade are the benchmark (the kernel's contract is
# "at most rounds", deterministic either way).
KCORE_K = 14
KCORE_ROUNDS = 6
TRI_WEDGE_CAP = 128


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64 (wrapping modular
    arithmetic is the point — silence numpy's overflow warning)."""
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64, copy=True)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def _hash_u01(key: np.ndarray, salt: int, seed: int) -> np.ndarray:
    """uint64 keys → deterministic doubles in [0, 1)."""
    offset = np.uint64(
        (seed * 0x9E3779B97F4A7C15 + salt * 0xD1B54A32D192ED03) % (1 << 64)
    )
    with np.errstate(over="ignore"):
        h = _mix64(key + offset)
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _edges_for_nodes(ids: np.ndarray, n_nodes: int, avg_deg: int,
                     max_deg: int, seed: int) -> pd.DataFrame:
    """Vectorized per-block edge synthesis (no Python loop over nodes)."""
    ids = ids.astype(np.uint64)
    # Pareto-ish out-degree: deg = min(max_deg, ceil(avg/2 / (1-u)^0.5))
    # → mean ≈ avg_deg with a real tail (the hot-vertex realism the
    # toy KG lacks)
    u_deg = _hash_u01(ids, 1, seed)
    deg = np.minimum(
        max_deg,
        np.ceil((avg_deg / 2.0) / np.sqrt(1.0 - u_deg)).astype(np.int64),
    )
    src = np.repeat(ids.astype(np.int64), deg)
    # k-index of each edge within its source's list
    total = int(deg.sum())
    if total == 0:
        return pd.DataFrame({"src": np.array([], dtype=np.int64),
                             "dst": np.array([], dtype=np.int64)})
    starts = np.concatenate([[0], np.cumsum(deg)[:-1]])
    k = np.arange(total, dtype=np.int64) - np.repeat(starts, deg)
    with np.errstate(over="ignore"):
        key = src.astype(np.uint64) * np.uint64(1_000_003) + k.astype(np.uint64)
    u = _hash_u01(key, 2, seed)
    dst = np.floor(n_nodes * np.power(u, GAMMA)).astype(np.int64)
    keep = src != dst
    pairs = pd.DataFrame({"src": src[keep], "dst": dst[keep]})
    # per-source dedup is local (the generator never emits the same
    # source in two blocks) → simple digraph without any shuffle
    return pairs.drop_duplicates()


def power_law_edges(n_nodes: int = N_NODES, avg_deg: int = AVG_DEG,
                    max_deg: int = MAX_DEG, seed: int = 7,
                    num_blocks: int = 64):
    """Edge Dataset (src, dst, weight=1) of the synthetic graph."""
    import ray.data as rd

    ds = rd.range(n_nodes, override_num_blocks=num_blocks)

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        out = _edges_for_nodes(
            batch["id"].to_numpy(), n_nodes, avg_deg, max_deg, seed
        )
        out["weight"] = np.ones(len(out), dtype=np.int64)
        return out

    return ds.map_batches(kernel, batch_format="pandas")


_BIG_EDGES_CACHE: dict = _memo.register({})


def _edges_materialized(n_nodes: int, avg_deg: int, seed: int):
    return _memo.memoize(
        _BIG_EDGES_CACHE, (n_nodes, avg_deg, seed),
        lambda: power_law_edges(n_nodes, avg_deg, seed=seed).materialize(),
    )


def biggraph_pagerank(sf_dir: str = "", n_nodes: int = N_NODES,
                      avg_deg: int = AVG_DEG, seed: int = 7,
                      iters: int = PR_ITERS):
    """Integer fixed-point PageRank on the synthetic graph
    (``sf_dir`` ignored — the graph is seed-derived, not corpus-derived;
    the parameter keeps the driver's queries() signature). Correctness:
    bit-equality vs the local replica at small n is asserted in pytest;
    the benchmark point is per-round message volume ≈ |E| ≫ the K12
    KG's exchange-latency floor."""
    from entity_extractor_linker_ray.ops.graph_algos import pagerank

    return pagerank(_edges_materialized(n_nodes, avg_deg, seed),
                    iters=iters, num_partitions=32)


def biggraph_kcore(sf_dir: str = "", n_nodes: int = N_NODES,
                   avg_deg: int = AVG_DEG, seed: int = 7,
                   k: int = KCORE_K, rounds: int = KCORE_ROUNDS):
    """k-core decomposition on the synthetic graph (undirected view)."""
    from entity_extractor_linker_ray.ops.graph_algos import kcore

    def canon(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["src"].to_numpy(dtype=np.int64)
        d = batch["dst"].to_numpy(dtype=np.int64)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        return pd.DataFrame({"x": lo, "y": hi}).drop_duplicates()

    # distinct undirected pairs: local dedup per block, then one
    # bucketed global dedup (both (a,b) and (b,a) may exist — emitted
    # by different sources)
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    edges = grouped_aggregate(
        _edges_materialized(n_nodes, avg_deg, seed).map_batches(
            canon, batch_format="pandas"
        ),
        ["x", "y"],
        lambda b: b[["x", "y"]].drop_duplicates(),
        num_partitions=32,
    )
    return kcore(edges, k=k, rounds=rounds, num_partitions=32)


def biggraph_triangles(sf_dir: str = "", n_nodes: int = N_NODES,
                       avg_deg: int = AVG_DEG, seed: int = 7,
                       wedge_cap: int = TRI_WEDGE_CAP):
    """Triangle count on the synthetic graph under the documented
    high-degree wedge cap (count is exact on the degree-capped graph —
    the production cap-or-sample trade actually exercised: the planted
    celebrity vertices would otherwise explode Σ deg² wedges)."""
    from entity_extractor_linker_ray.ops.graph_algos import triangles
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def canon(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["src"].to_numpy(dtype=np.int64)
        d = batch["dst"].to_numpy(dtype=np.int64)
        # zero-padded string labels keep the kernel's lexicographic
        # u < v ordering consistent with numeric order
        lo = np.char.zfill(np.minimum(s, d).astype(str), 7)
        hi = np.char.zfill(np.maximum(s, d).astype(str), 7)
        return pd.DataFrame({"u": lo, "v": hi}).drop_duplicates()

    edges = grouped_aggregate(
        _edges_materialized(n_nodes, avg_deg, seed).map_batches(
            canon, batch_format="pandas"
        ),
        ["u", "v"],
        lambda b: b[["u", "v"]].drop_duplicates(),
        num_partitions=32,
    ).materialize()
    return triangles(edges, num_partitions=32, max_wedge_deg=wedge_cap)


def biggraph_components(sf_dir: str = "", n_nodes: int = N_NODES,
                        avg_deg: int = AVG_DEG, seed: int = 7,
                        max_iters: int = 25):
    """Connected components (undirected view) on the synthetic graph
    via the generic hash-min label propagation
    (`ops/graph_algos.min_label_components`) — per-round message volume
    is 2|E| ≈ 2.5 M, the compute regime the dedup-cluster kernel claims
    to serve. Output is the bounded component-size profile: one row per
    log2-size band with component and node counts (the giant-component
    structure of the power-law graph), never |V| rows at the driver."""
    from entity_extractor_linker_ray.ops.graph_algos import (
        min_label_components,
    )
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def both_dirs(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["src"].to_numpy(dtype=np.int64)
        d = batch["dst"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"s": np.concatenate([s, d]), "d": np.concatenate([d, s])}
        )

    labels = min_label_components(
        _edges_materialized(n_nodes, avg_deg, seed).map_batches(
            both_dirs, batch_format="pandas"
        ),
        max_iters=max_iters, num_partitions=32,
    )

    def size_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("label", sort=False).size().reset_index(name="n")
        return g.astype({"label": np.int64, "n": np.int64})

    sizes = grouped_aggregate(
        labels.map_batches(size_partial, batch_format="pandas"),
        ["label"],
        lambda b: b.groupby("label", sort=False, as_index=False)["n"].sum(),
        num_partitions=32,
    )

    def band_partial(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["n"].to_numpy(dtype=np.int64)
        band = np.floor(np.log2(np.maximum(n, 1))).astype(np.int64)
        out = pd.DataFrame({"size_band": band,
                            "n_components": np.ones(len(band), dtype=np.int64),
                            "n_nodes": n})
        return out.groupby("size_band", sort=False, as_index=False).sum()

    return grouped_aggregate(
        sizes.map_batches(band_partial, batch_format="pandas"),
        ["size_band"],
        lambda b: b.groupby("size_band", sort=False, as_index=False)[
            ["n_components", "n_nodes"]
        ].sum().astype({"size_band": np.int64, "n_components": np.int64,
                        "n_nodes": np.int64}),
        num_partitions=4,
    )


def biggraph_degree_stats(sf_dir: str = "", n_nodes: int = N_NODES,
                          avg_deg: int = AVG_DEG, seed: int = 7):
    """Degree-distribution profile of the synthetic graph: per
    log2-degree band, node count — the power-law sanity surface (the
    tail bands must be populated for the hot-vertex claims to mean
    anything). Two-phase aggregate; output bounded by log2(max degree).
    """
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def out_deg(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("src", sort=False).size().reset_index(name="d")
        return g.rename(columns={"src": "node"}).astype(
            {"node": np.int64, "d": np.int64}
        )

    degs = grouped_aggregate(
        _edges_materialized(n_nodes, avg_deg, seed).map_batches(
            out_deg, batch_format="pandas"
        ),
        ["node"],
        lambda b: b.groupby("node", sort=False, as_index=False)["d"].sum(),
        num_partitions=32,
    )

    def band_partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["d"].to_numpy(dtype=np.int64)
        band = np.floor(np.log2(np.maximum(d, 1))).astype(np.int64)
        out = pd.DataFrame({"degree_band": band,
                            "n_nodes": np.ones(len(band), dtype=np.int64),
                            "sum_degree": d})
        return out.groupby("degree_band", sort=False, as_index=False).sum()

    return grouped_aggregate(
        degs.map_batches(band_partial, batch_format="pandas"),
        ["degree_band"],
        lambda b: b.groupby("degree_band", sort=False, as_index=False)[
            ["n_nodes", "sum_degree"]
        ].sum().astype({"degree_band": np.int64, "n_nodes": np.int64,
                        "sum_degree": np.int64}),
        num_partitions=4,
    )


LPA_ROUNDS = 8  # full planted-block consensus (probed: 4 → 0.60 min purity, 6 → 0.98, 8 → 1.0)


def biggraph_lpa(sf_dir: str = "", n_nodes: int = N_NODES,
                 blocks: int | None = None,
                 avg_deg: int = AVG_DEG, seed: int = 7,
                 rounds: int = LPA_ROUNDS):
    """Label-propagation communities (undirected view) on the planted-
    partition synthetic graph via the generic deterministic synchronous
    kernel (`ops/graph_algos.label_propagation`) — per-round message
    volume is 2|E| ≈ 2.4 M like `biggraph_components`, but the combine
    is a MODE (per-(node, incoming-label) count partials), the other
    half of the iterative-aggregation design space. The graph is
    :func:`planted_partition_edges`, NOT the power-law graph: universal
    hubs make any label cascade collapse into one giant community
    (measured — 1 community at n=3000 after 3 AND 4 rounds), so the
    power-law graph benchmarks nothing here; with 80%-internal planted
    blocks LPA has actual structure to recover, and the recovery is
    pytest-pinned. Output is the bounded community-size profile: one
    row per log2-size band with community and node counts."""
    from entity_extractor_linker_ray.ops.graph_algos import label_propagation
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    if blocks is None:
        blocks = max(2, n_nodes // 200)

    def both_dirs(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["src"].to_numpy(dtype=np.int64)
        d = batch["dst"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"s": np.concatenate([s, d]), "d": np.concatenate([d, s])}
        )

    labels = label_propagation(
        _pp_edges_materialized(n_nodes, blocks, avg_deg, seed).map_batches(
            both_dirs, batch_format="pandas"
        ),
        rounds=rounds, num_partitions=32,
    )

    def size_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("label", sort=False).size().reset_index(name="n")
        return g.astype({"label": np.int64, "n": np.int64})

    sizes = grouped_aggregate(
        labels.map_batches(size_partial, batch_format="pandas"),
        ["label"],
        lambda b: b.groupby("label", sort=False, as_index=False)["n"].sum(),
        num_partitions=32,
    )

    def band_partial(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["n"].to_numpy(dtype=np.int64)
        band = np.floor(np.log2(np.maximum(n, 1))).astype(np.int64)
        out = pd.DataFrame({"size_band": band,
                            "n_communities": np.ones(len(band), dtype=np.int64),
                            "n_nodes": n})
        return out.groupby("size_band", sort=False, as_index=False).sum()

    return grouped_aggregate(
        sizes.map_batches(band_partial, batch_format="pandas"),
        ["size_band"],
        lambda b: b.groupby("size_band", sort=False, as_index=False)[
            ["n_communities", "n_nodes"]
        ].sum().astype({"size_band": np.int64, "n_communities": np.int64,
                        "n_nodes": np.int64}),
        num_partitions=4,
    )


LPA_BLOCKS = 500  # planted communities at n=100k → 200 nodes each
LPA_P_IN_PCT = 80  # % of a node's edges that stay inside its block


def planted_partition_edges(n_nodes: int = N_NODES,
                            blocks: int = LPA_BLOCKS,
                            avg_deg: int = AVG_DEG,
                            p_in_pct: int = LPA_P_IN_PCT,
                            seed: int = 7, num_blocks: int = 64):
    """Deterministic planted-partition (stochastic-block-model-ish)
    graph: node ``i`` lives in block ``i % blocks``; each of its
    ``avg_deg`` out-edges stays inside the block with probability
    ``p_in_pct``% (uniform over the block), else lands uniformly
    anywhere. Same splitmix64 hash kernel as :func:`power_law_edges`
    — a pure function of the parameters, byte-identical at any
    parallelism. The power-law graph's universal hubs make ANY label
    cascade collapse into one giant community; this is the graph with
    actual community structure the LPA benchmark needs."""
    import ray.data as rd

    ds = rd.range(n_nodes, override_num_blocks=num_blocks)

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy().astype(np.int64)
        src = np.repeat(ids, avg_deg)
        k = np.tile(np.arange(avg_deg, dtype=np.int64), len(ids))
        with np.errstate(over="ignore"):
            key = src.astype(np.uint64) * np.uint64(1_000_003) + k.astype(
                np.uint64
            )
        stay = _hash_u01(key, 3, seed) * 100.0 < p_in_pct
        u = _hash_u01(key, 4, seed)
        blk = src % blocks
        # in-block: the j-th member of the block is blk + j*blocks
        block_size = (n_nodes - blk + blocks - 1) // blocks
        dst_in = blk + np.floor(u * block_size).astype(np.int64) * blocks
        dst_out = np.floor(u * n_nodes).astype(np.int64)
        dst = np.where(stay, dst_in, dst_out)
        keep = (src != dst) & (dst < n_nodes)
        pairs = pd.DataFrame({"src": src[keep], "dst": dst[keep]})
        return pairs.drop_duplicates()

    return ds.map_batches(kernel, batch_format="pandas")


_PP_EDGES_CACHE: dict = _memo.register({})


def _pp_edges_materialized(n_nodes: int, blocks: int, avg_deg: int,
                           seed: int):
    return _memo.memoize(
        _PP_EDGES_CACHE, (n_nodes, blocks, avg_deg, seed),
        lambda: planted_partition_edges(
            n_nodes, blocks, avg_deg, seed=seed
        ).materialize(),
    )


# --- KG feature ops on the synthetic graph --------------------------
#
# Round 3 moved pagerank/kcore/triangles/components/LPA off the toy
# K12 KG into the 100k-node compute regime; round 4 does the same for
# the neighborhood-feature family (edge Jaccard, strict two-hop,
# local clustering, HITS, weighted SSSP, link candidates). The
# kernels are the SAME oracle-gated functions from ops/graph_algos —
# fed through a string subject/object/weight view of the synthetic
# edge list — with the celebrity-vertex wedge cap ENGAGED (the toy
# queries run exact with cap=None; the planted hubs here are exactly
# the case the cap exists for). Outputs are bounded profiles
# (band histograms / top-k), never |V| or |E| rows at the driver.

FEATURE_WEDGE_CAP = 64

_KG_VIEW_CACHE: dict = _memo.register({})


def _kg_view_edges_materialized(n_nodes: int, avg_deg: int, seed: int):
    """subject/object/weight string view of the synthetic edges —
    zero-padded ids so the kernels' lexicographic canonicalization
    agrees with numeric order. Memoized separately from the int64
    edge list (both are session working sets)."""
    def to_view(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"subject": np.char.zfill(
                batch["src"].to_numpy(dtype=np.int64).astype(str), 7),
             "object": np.char.zfill(
                batch["dst"].to_numpy(dtype=np.int64).astype(str), 7),
             "weight": batch["weight"].to_numpy(dtype=np.int64)}
        )

    return _memo.memoize(
        _KG_VIEW_CACHE, (n_nodes, avg_deg, seed),
        lambda: _edges_materialized(n_nodes, avg_deg, seed)
        .map_batches(to_view, batch_format="pandas")
        .materialize(),
    )


def _band_profile(ds, value_col: str, band_col: str, count_col: str,
                  sum_col: str, scale: int | None = None,
                  num_partitions: int = 4):
    """Generic bounded two-phase band histogram: band = floor(v *
    scale) for ratio columns (scale=20 → 21 bands) or
    floor(log2(max(v,1))) for counts (scale=None). Output rows are
    bounded by the band domain, never by |V|/|E|."""
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy()
        if scale is not None:
            band = np.floor(v * scale).astype(np.int64)
        else:
            band = np.floor(
                np.log2(np.maximum(v.astype(np.int64), 1))
            ).astype(np.int64)
        out = pd.DataFrame({band_col: band,
                            count_col: np.ones(len(band), dtype=np.int64),
                            sum_col: v.astype(np.float64)})
        return out.groupby(band_col, sort=False, as_index=False).sum()

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        [band_col],
        lambda b: b.groupby(band_col, sort=False, as_index=False)[
            [count_col, sum_col]
        ].sum().astype({band_col: np.int64, count_col: np.int64}),
        num_partitions=num_partitions,
    )


def biggraph_edge_jaccard(sf_dir: str = "", n_nodes: int = N_NODES,
                          avg_deg: int = AVG_DEG, seed: int = 7,
                          wedge_cap: int = FEATURE_WEDGE_CAP):
    """Per-edge neighborhood Jaccard (`ops/graph_algos.kg_edge_jaccard`)
    on the synthetic graph, wedge cap engaged on the planted hubs.
    Output: 21-band Jaccard histogram (band = floor(j*20)) with edge
    count and summed common-neighbor count per band."""
    from entity_extractor_linker_ray.ops.graph_algos import kg_edge_jaccard

    ej = kg_edge_jaccard(
        "", num_partitions=32,
        edges_ds=_kg_view_edges_materialized(n_nodes, avg_deg, seed),
        max_wedge_deg=wedge_cap,
    )
    return _band_profile(ej, "jaccard", "jaccard_band", "n_edges",
                         "sum_jaccard", scale=20)


def biggraph_two_hop(sf_dir: str = "", n_nodes: int = N_NODES,
                     avg_deg: int = AVG_DEG, seed: int = 7,
                     wedge_cap: int = FEATURE_WEDGE_CAP):
    """Strict two-hop neighborhood profile
    (`ops/graph_algos.kg_two_hop`) on the synthetic graph, middle
    fan-in/out capped per hub. Output: log2 band histogram of
    n_two_hop with entity count and summed two-hop count per band."""
    from entity_extractor_linker_ray.ops.graph_algos import kg_two_hop

    th = kg_two_hop(
        "", num_partitions=32,
        edges_ds=_kg_view_edges_materialized(n_nodes, avg_deg, seed),
        max_wedge_deg=wedge_cap,
    )
    return _band_profile(th, "n_two_hop", "two_hop_band", "n_entities",
                         "sum_two_hop", scale=None)


def biggraph_clustering_coefficient(sf_dir: str = "",
                                    n_nodes: int = N_NODES,
                                    avg_deg: int = AVG_DEG, seed: int = 7,
                                    wedge_cap: int = FEATURE_WEDGE_CAP):
    """Local clustering coefficient
    (`ops/graph_algos.kg_clustering_coefficient`) on the synthetic
    graph, wedge cap engaged (T(v) is computed on the capped wedge
    set; degree stays exact — a documented lower-bound approximation
    on hubs, the production trade). Output: 21-band cc histogram."""
    from entity_extractor_linker_ray.ops.graph_algos import (
        kg_clustering_coefficient,
    )

    cc = kg_clustering_coefficient(
        "", num_partitions=32,
        edges_ds=_kg_view_edges_materialized(n_nodes, avg_deg, seed),
        max_wedge_deg=wedge_cap,
    )
    return _band_profile(cc, "local_cc", "cc_band", "n_nodes",
                         "sum_cc", scale=20)


def biggraph_hits(sf_dir: str = "", n_nodes: int = N_NODES,
                  avg_deg: int = AVG_DEG, seed: int = 7,
                  rounds: int = 3, k: int = 20):
    """HITS hubs/authorities (`ops/graph_algos.kg_hits`) on the
    DIRECTED synthetic graph — per-round message volume |E| ≈ 1.2 M.
    Output: top-k authorities by (auth desc, node) via per-block
    partial top-k + one k·blocks final merge, never a full sort."""
    import pyarrow as pa
    import ray.data as rd

    from entity_extractor_linker_ray.ops.graph_algos import kg_hits

    scores = kg_hits(
        "", rounds=rounds, num_partitions=32,
        edges_ds=_kg_view_edges_materialized(n_nodes, avg_deg, seed),
    )

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(
            ["auth", "node"], ascending=[False, True], kind="stable"
        ).head(k)

    out_schema = pa.schema(
        [("node", pa.string()), ("hub", pa.int64()), ("auth", pa.int64())]
    )
    return (
        scores.map_batches(local_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(local_topk, batch_format="pandas")
        .union(rd.from_arrow(out_schema.empty_table()))
    )


def biggraph_shortest_paths(sf_dir: str = "", n_nodes: int = N_NODES,
                            avg_deg: int = AVG_DEG, seed: int = 7,
                            rounds: int = 4):
    """Bounded Bellman-Ford SSSP (`ops/graph_algos.kg_shortest_paths`)
    from node 0000000 on the synthetic graph (unit weights) — per
    round ~2|E| relaxation candidates. Output: distance histogram
    (dist, n_nodes), ≤ rounds+1 rows."""
    from entity_extractor_linker_ray.ops.graph_algos import kg_shortest_paths
    from entity_extractor_linker_ray.ops.shuffle import grouped_aggregate

    sp = kg_shortest_paths(
        "", rounds=rounds,
        edges_ds=_kg_view_edges_materialized(n_nodes, avg_deg, seed),
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"dist": batch["dist"].to_numpy(dtype=np.int64),
                            "n_nodes": np.ones(len(batch), dtype=np.int64)})
        return out.groupby("dist", sort=False, as_index=False).sum()

    return grouped_aggregate(
        sp.map_batches(partial, batch_format="pandas"),
        ["dist"],
        lambda b: b.groupby("dist", sort=False, as_index=False)[
            "n_nodes"
        ].sum().astype({"dist": np.int64, "n_nodes": np.int64}),
        num_partitions=4,
    )


def biggraph_link_candidates(sf_dir: str = "", n_nodes: int = N_NODES,
                             avg_deg: int = AVG_DEG, seed: int = 7,
                             k: int = 20,
                             wedge_cap: int = FEATURE_WEDGE_CAP):
    """Common-neighbor link prediction
    (`ops/graph_algos.kg_link_candidates`) on the synthetic graph's
    strong-tie view, wedge cap engaged. Output already top-k bounded
    by the kernel."""
    from entity_extractor_linker_ray.ops.graph_algos import kg_link_candidates

    return kg_link_candidates(
        "", k=k, num_partitions=32,
        edges_ds=_kg_view_edges_materialized(n_nodes, avg_deg, seed),
        max_wedge_deg=wedge_cap,
    )
