"""Randomized cross-checks for the iterative message-passing ops:
hop-bounded Bellman-Ford, HITS, and personalized PageRank against
tiny pure-Python integer replicas on seeded random graphs — plus
partition-count invariance (the distributed result must be
bit-identical at any num_partitions, the property the integer
fixed-point design exists to guarantee)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SEEDS = [7, 31]


def _random_weighted(seed: int, n_nodes: int = 8, n_edges: int = 12):
    rng = np.random.default_rng(seed)
    names = [f"n{i:02d}" for i in range(n_nodes)]
    pairs = set()
    while len(pairs) < n_edges:
        a, b = rng.integers(0, n_nodes, size=2)
        if a != b:
            pairs.add((int(a), int(b)))  # directed
    rows = [(names[a], names[b], int(rng.integers(1, 20)))
            for a, b in sorted(pairs)]
    return pd.DataFrame(rows, columns=["subject", "object", "weight"])


def _brute_sssp(df: pd.DataFrame, rounds: int) -> dict[str, int]:
    """Hop-bounded Bellman-Ford on the UNDIRECTED min-weight graph
    from the lexicographically smallest node."""
    w: dict[tuple[str, str], int] = {}
    for _, r in df.iterrows():
        for a, b in ((r["subject"], r["object"]), (r["object"], r["subject"])):
            key = (a, b)
            w[key] = min(w.get(key, 1 << 60), int(r["weight"]))
    src = min({a for a, _ in w})
    dist = {src: 0}
    for _ in range(rounds):
        nxt = dict(dist)
        for (a, b), wt in w.items():
            if a in dist and dist[a] + wt < nxt.get(b, 1 << 60):
                nxt[b] = dist[a] + wt
        dist = nxt
    return dist


class TestShortestPathsBrute:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_random_graph(self, ray_session, seed):
        import ray.data as rd

        from entity_extractor_linker_ray.ops.graph_algos import (
            SSSP_ROUNDS,
            kg_shortest_paths,
        )

        df = _random_weighted(seed)
        got = (
            kg_shortest_paths("unused", edges_ds=rd.from_pandas(df))
            .to_pandas().set_index("node")["dist"].to_dict()
        )
        assert got == _brute_sssp(df, SSSP_ROUNDS)


def _brute_hits(df: pd.DataFrame, rounds: int, scale: int = 1_000_000):
    edges = [(r["subject"], r["object"], int(r["weight"]))
             for _, r in df.iterrows()]
    nodes = sorted({a for a, _, _ in edges} | {b for _, b, _ in edges})
    hub = {n: scale for n in nodes}
    auth: dict[str, int] = {}
    for _ in range(rounds):
        araw: dict[str, int] = {}
        for a, b, w in edges:
            if a in hub:
                araw[b] = araw.get(b, 0) + hub[a] * w
        d = max(max(araw.values()) // scale, 1) if araw else 1
        auth = {n: v // d for n, v in araw.items()}
        hraw: dict[str, int] = {}
        for a, b, w in edges:
            if b in auth:
                hraw[a] = hraw.get(a, 0) + auth[b] * w
        d = max(max(hraw.values()) // scale, 1) if hraw else 1
        hub = {n: v // d for n, v in hraw.items()}
    return (
        {n: hub.get(n, 0) for n in nodes},
        {n: auth.get(n, 0) for n in nodes},
    )


class TestHitsBrute:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_random_graph(self, ray_session, seed):
        import ray.data as rd

        from entity_extractor_linker_ray.ops.graph_algos import (
            HITS_ROUNDS,
            kg_hits,
        )

        df = _random_weighted(seed)
        got = (
            kg_hits("unused", edges_ds=rd.from_pandas(df))
            .to_pandas().set_index("node")
        )
        hub, auth = _brute_hits(df, HITS_ROUNDS)
        assert got["hub"].to_dict() == hub
        assert got["auth"].to_dict() == auth

    def test_partition_invariance(self, ray_session):
        """Bit-identical at any partition count — the contract the
        integer fixed-point design guarantees."""
        import ray.data as rd

        from entity_extractor_linker_ray.ops.graph_algos import kg_hits

        df = _random_weighted(97, n_nodes=10, n_edges=18)
        outs = [
            kg_hits("unused", num_partitions=p, edges_ds=rd.from_pandas(df))
            .to_pandas().sort_values("node").reset_index(drop=True)
            for p in (2, 8)
        ]
        pd.testing.assert_frame_equal(outs[0], outs[1])


def _brute_ppr(df: pd.DataFrame, source: str, iters: int,
               scale: int = 1_000_000, damp: int = 850_000):
    edges = [(r["subject"], r["object"], int(r["weight"]))
             for _, r in df.iterrows()]
    nodes = sorted({a for a, _, _ in edges} | {b for _, b, _ in edges})
    outw: dict[str, int] = {}
    for a, _, w in edges:
        outw[a] = outw.get(a, 0) + w
    rank = {n: (scale if n == source else 0) for n in nodes}
    base = scale - damp
    for _ in range(iters):
        inc: dict[str, int] = {}
        for a, b, w in edges:
            inc[b] = inc.get(b, 0) + (rank[a] * w) // outw[a]
        rank = {
            n: (base if n == source else 0) + (damp * inc.get(n, 0)) // scale
            for n in nodes
        }
    return rank


class TestPersonalizedPagerankBrute:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_random_graph(self, ray_session, seed):
        import ray.data as rd

        from entity_extractor_linker_ray.ops.graph_algos import pagerank

        df = _random_weighted(seed)
        source = min(set(df["subject"]) | set(df["object"]))
        got = (
            pagerank(
                rd.from_pandas(
                    df.rename(columns={"subject": "src", "object": "dst"})
                ),
                iters=4, num_partitions=4, source=source,
            )
            .to_pandas().set_index("node")["rank"].to_dict()
        )
        assert got == _brute_ppr(df, source, iters=4)
