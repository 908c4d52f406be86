"""Synthetic power-law graph: generator invariants + kernel
cross-checks at a size where brute force is feasible (the large-graph
benchmark itself runs in bench.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from entity_extractor_linker_ray.ops import synthetic_graph as sg

N_SMALL = 3000


def _edges_df(n, blocks):
    return (
        sg.power_law_edges(n, sg.AVG_DEG, seed=7, num_blocks=blocks)
        .to_pandas()
        .sort_values(["src", "dst"], kind="stable")
        .reset_index(drop=True)
    )


class TestGenerator:
    def test_parallelism_invariance(self, ray_session):
        """Edge set is a pure function of (n, avg_deg, seed) — identical
        at 2 blocks and 32 blocks."""
        a = _edges_df(N_SMALL, 2)
        b = _edges_df(N_SMALL, 32)
        pd.testing.assert_frame_equal(a, b)

    def test_simple_digraph(self, ray_session):
        e = _edges_df(N_SMALL, 8)
        assert (e["src"] != e["dst"]).all()
        assert not e.duplicated(["src", "dst"]).any()
        assert e["dst"].between(0, N_SMALL - 1).all()

    def test_power_law_tail(self, ray_session):
        """Heavy tail both ways: max out-degree ≫ mean (Pareto map) and
        in-degree concentrated on low ids (u^gamma map)."""
        e = _edges_df(N_SMALL, 8)
        out_deg = e.groupby("src").size()
        assert out_deg.max() >= 8 * out_deg.mean()
        in_deg = e.groupby("dst").size()
        hot = in_deg.sort_values(ascending=False)
        # the top-1% of receivers should absorb a large multiple of a
        # uniform share of edges
        top = hot.head(max(1, N_SMALL // 100)).sum()
        assert top >= 5 * len(e) // 100


class TestKernelsOnGeneratedGraph:
    @pytest.fixture(scope="class")
    def edges(self, ray_session):
        return _edges_df(N_SMALL, 8)

    def test_pagerank_matches_local_replica(self, ray_session, edges):
        from entity_extractor_linker_ray.ops.graph_algos import (
            pagerank,
            pagerank_reference,
        )

        got = (
            pagerank(sg.power_law_edges(N_SMALL, sg.AVG_DEG, seed=7,
                                        num_blocks=8), iters=3,
                     num_partitions=8)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        exp = (
            pagerank_reference(edges.assign(weight=1), iters=3)
            .sort_values("node")
            .reset_index(drop=True)
        )
        got["node"] = got["node"].astype(np.int64)
        exp["node"] = exp["node"].astype(np.int64)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_kcore_matches_local_replica(self, ray_session, edges):
        from entity_extractor_linker_ray.ops.graph_algos import kcore_reference

        got = (
            sg.biggraph_kcore(n_nodes=N_SMALL, k=12, rounds=8)
            .to_pandas()
            .sort_values("entity")
            .reset_index(drop=True)
        )
        undirected = pd.DataFrame(
            {"x": np.minimum(edges["src"], edges["dst"]),
             "y": np.maximum(edges["src"], edges["dst"])}
        ).drop_duplicates()
        exp = (
            kcore_reference(undirected.astype(str), k=12, rounds=8)
            .sort_values("entity")
            .reset_index(drop=True)
        )
        got["entity"] = got["entity"].astype(str)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_triangles_match_bruteforce(self, ray_session, edges):
        """Distributed wedge count (uncapped) equals a brute-force
        count over the undirected simple graph."""
        got = int(
            sg.biggraph_triangles(n_nodes=N_SMALL, wedge_cap=10**9)
            .to_pandas()["n_triangles"].iloc[0]
        )
        und = set()
        for s, d in zip(edges["src"], edges["dst"]):
            und.add((min(s, d), max(s, d)))
        nbrs: dict[int, set] = {}
        for a, b in und:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        brute = 0
        for a, b in und:
            brute += len(nbrs[a] & nbrs[b] & {x for x in nbrs[a] if x > b})
        assert got == brute > 0

    def test_wedge_cap_bounds_count(self, ray_session):
        """The capped count is exact on the degree-capped graph, hence
        <= the uncapped count and deterministic."""
        capped = int(
            sg.biggraph_triangles(n_nodes=N_SMALL, wedge_cap=8)
            .to_pandas()["n_triangles"].iloc[0]
        )
        uncapped = int(
            sg.biggraph_triangles(n_nodes=N_SMALL, wedge_cap=10**9)
            .to_pandas()["n_triangles"].iloc[0]
        )
        assert 0 < capped <= uncapped
        again = int(
            sg.biggraph_triangles(n_nodes=N_SMALL, wedge_cap=8)
            .to_pandas()["n_triangles"].iloc[0]
        )
        assert again == capped

    def test_degree_stats_total(self, ray_session, edges):
        df = sg.biggraph_degree_stats(n_nodes=N_SMALL).to_pandas()
        assert int(df["sum_degree"].sum()) == len(edges)
        assert int(df["n_nodes"].sum()) == edges["src"].nunique()
        assert df["degree_band"].max() >= 5  # tail bands populated


def _union_find_labels(pairs: pd.DataFrame) -> dict[int, int]:
    """Local replica: min-id component label per node via union-find."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["src"], pairs["dst"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


class TestComponents:
    def test_planted_components_exact(self, ray_session):
        """min_label_components on a hand-planted multi-component edge
        list returns the exact min-id labeling (chain, triangle-with-
        bridge, isolated pair)."""
        import ray.data as rd

        from entity_extractor_linker_ray.ops.graph_algos import (
            min_label_components,
        )

        pairs = pd.DataFrame(
            {"src": [1, 2, 3, 10, 11, 10, 20, 30, 31],
             "dst": [2, 3, 4, 11, 12, 12, 21, 31, 32]}
        )
        msgs = pd.concat(
            [pairs.rename(columns={"src": "s", "dst": "d"}),
             pairs.rename(columns={"src": "d", "dst": "s"})],
            ignore_index=True,
        )[["s", "d"]].astype(np.int64)
        got = (
            min_label_components(rd.from_pandas(msgs), num_partitions=4)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        exp = _union_find_labels(pairs)
        assert dict(zip(got["node"], got["label"])) == exp

    def test_biggraph_components_matches_union_find(self, ray_session, edges=None):
        """Banded component profile at n=3000 equals the union-find
        replica's band histogram of the same generated edge set."""
        e = _edges_df(N_SMALL, 8)
        labels = _union_find_labels(e)
        sizes = pd.Series(list(labels.values())).value_counts()
        bands = np.floor(np.log2(np.maximum(sizes.to_numpy(), 1))).astype(int)
        exp = (
            pd.DataFrame({"size_band": bands, "n": sizes.to_numpy()})
            .groupby("size_band")
            .agg(n_components=("n", "size"), n_nodes=("n", "sum"))
            .reset_index()
        )
        got = (
            sg.biggraph_components(n_nodes=N_SMALL)
            .to_pandas()
            .sort_values("size_band")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got, exp.astype({"size_band": np.int64, "n_components": np.int64,
                             "n_nodes": np.int64}),
            check_dtype=False,
        )
        # every edge-touching node is accounted for exactly once
        assert int(got["n_nodes"].sum()) == len(labels)
