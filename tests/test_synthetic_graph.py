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
