"""Randomized cross-checks: the distributed wedge-kernel graph ops
(edge Jaccard, clustering coefficient, link candidates) against tiny
pure-Python brute-force references on seeded random graphs — catches
kernel-boundary bugs (bucket splits, dedup, tie-breaks) that a single
planted fixture can miss."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _random_graph(seed: int, n_nodes: int = 9, n_edges: int = 14):
    """Seeded undirected simple graph as a subject/object/weight frame
    (parallel/reversed duplicates included on purpose — the ops must
    canonicalize them away)."""
    rng = np.random.default_rng(seed)
    names = [f"n{i:02d}" for i in range(n_nodes)]
    pairs = set()
    while len(pairs) < n_edges:
        a, b = rng.integers(0, n_nodes, size=2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    rows = []
    for a, b in sorted(pairs):
        w = int(rng.integers(1, 60))
        rows.append((names[a], names[b], w))
        if rng.random() < 0.4:  # duplicate in reverse direction
            rows.append((names[b], names[a], w))
    df = pd.DataFrame(rows, columns=["subject", "object", "weight"])
    adj: dict[str, set[str]] = {}
    for a, b, _ in rows:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    edges = {(min(a, b), max(a, b)) for a, b, _ in rows}
    return df, adj, edges


SEEDS = [11, 29, 53]


class TestEdgeJaccardBrute:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_random_graph(self, ray_session, seed):
        import ray.data as rd

        from entity_extractor_linker_ray.ops.graph_algos import kg_edge_jaccard

        df, adj, edges = _random_graph(seed)
        got = (
            kg_edge_jaccard("unused", edges_ds=rd.from_pandas(df))
            .to_pandas().set_index(["u", "v"]).sort_index()
        )
        assert len(got) == len(edges)
        for u, v in edges:
            common = len(adj[u] & adj[v])
            union = len(adj[u]) + len(adj[v]) - common
            assert got.loc[(u, v), "n_common"] == common, (u, v)
            assert got.loc[(u, v), "n_union"] == union, (u, v)
            assert got.loc[(u, v), "jaccard"] == common / union, (u, v)


class TestClusteringCoefficientBrute:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_random_graph(self, ray_session, seed):
        import ray.data as rd

        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_clustering_coefficient,
        )

        df, adj, edges = _random_graph(seed)
        got = (
            kg_clustering_coefficient("unused", edges_ds=rd.from_pandas(df))
            .to_pandas().set_index("node").sort_index()
        )
        assert set(got.index) == set(adj)
        for node, nbrs in adj.items():
            d = len(nbrs)
            t = sum(
                1
                for i, a in enumerate(sorted(nbrs))
                for b in sorted(nbrs)[i + 1:]
                if (min(a, b), max(a, b)) in edges
            )
            assert got.loc[node, "degree"] == d, node
            assert got.loc[node, "n_triangles"] == t, node
            expect_cc = (2 * t) / (d * (d - 1)) if d >= 2 else 0.0
            assert got.loc[node, "local_cc"] == expect_cc, node


class TestLinkCandidatesBrute:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_random_graph(self, ray_session, seed):
        import ray.data as rd

        from entity_extractor_linker_ray.ops.graph_algos import (
            kg_link_candidates,
        )

        df, adj, edges = _random_graph(seed)
        # brute-force the strong-tie subgraph with the same above-mean
        # integer cutoff (w = max weight per canonical pair)
        pairw: dict[tuple[str, str], int] = {}
        for _, r in df.iterrows():
            u, v = sorted((r["subject"], r["object"]))
            pairw[(u, v)] = max(pairw.get((u, v), 0), int(r["weight"]))
        n, sw = len(pairw), sum(pairw.values())
        strong = {p for p, w in pairw.items() if w * n >= sw}
        sadj: dict[str, set[str]] = {}
        for u, v in strong:
            sadj.setdefault(u, set()).add(v)
            sadj.setdefault(v, set()).add(u)
        expect = {}
        for m, nbrs in sadj.items():
            ns = sorted(nbrs)
            for i, a in enumerate(ns):
                for b in ns[i + 1:]:
                    if (a, b) not in strong:
                        expect[(a, b)] = expect.get((a, b), 0) + 1
        top = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

        got = kg_link_candidates(
            "unused", edges_ds=rd.from_pandas(df)
        ).to_pandas()
        got_list = [((r["u"], r["v"]), r["n_common"]) for _, r in got.iterrows()]
        assert got_list == [(p, c) for p, c in top]
