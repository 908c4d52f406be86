"""Round-4 biggraph feature ops (edge Jaccard, two-hop, clustering,
HITS, SSSP, link candidates) vs local pandas replicas at a size where
brute force is feasible. The kernels themselves are oracle-gated on
the toy KG; these tests pin (a) the string-view plumbing, (b) the
band/top-k profile math, and (c) the wedge-cap semantics the 100k-node
benchmark relies on."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from entity_extractor_linker_ray.ops import synthetic_graph as sg

N = 1200
DEG = 6
SEED = 11
CAP = 8  # engaged: the planted hubs exceed it by orders of magnitude


@pytest.fixture(scope="module")
def edges(ray_session):
    """Canonical undirected distinct pairs of the small graph, plus
    the per-node sorted (zero-padded string) adjacency."""
    e = sg.power_law_edges(N, DEG, seed=SEED).to_pandas()
    s = np.char.zfill(e["src"].to_numpy(dtype=np.int64).astype(str), 7)
    d = np.char.zfill(e["dst"].to_numpy(dtype=np.int64).astype(str), 7)
    lo = np.where(s < d, s, d)
    hi = np.where(s < d, d, s)
    und = pd.DataFrame({"u": lo, "v": hi})
    und = und[und["u"] != und["v"]].drop_duplicates().reset_index(drop=True)
    adj: dict[str, np.ndarray] = {}
    both = pd.concat(
        [und, und.rename(columns={"u": "v", "v": "u"})], ignore_index=True
    )
    for node, grp in both.groupby("u", sort=True):
        adj[node] = np.sort(grp["v"].unique())
    return und, adj


def _capped(nbrs: np.ndarray, cap: int | None) -> np.ndarray:
    return nbrs[:cap] if cap is not None and len(nbrs) > cap else nbrs


def _common_counts(und: pd.DataFrame, adj: dict, cap: int | None):
    """Replica of the wedge kernel: per canonical pair (a < b), the
    number of middles whose (capped) neighbor list holds both."""
    from collections import Counter

    cnt: Counter = Counter()
    for m, nbrs in adj.items():
        nb = _capped(nbrs, cap)
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                cnt[(nb[i], nb[j])] += 1
    return cnt


class TestEdgeJaccard:
    def test_band_profile_matches_replica(self, ray_session, edges):
        und, adj = edges
        cnt = _common_counts(und, adj, CAP)
        deg = {n: len(a) for n, a in adj.items()}
        nc = np.array([cnt.get((u, v), 0) for u, v in
                       zip(und["u"], und["v"])], dtype=np.int64)
        nu = np.array([deg[u] + deg[v] for u, v in
                       zip(und["u"], und["v"])], dtype=np.int64) - nc
        jac = nc.astype(np.float64) / nu.astype(np.float64)
        band = np.floor(jac * 20).astype(np.int64)
        expect = (
            pd.DataFrame({"jaccard_band": band, "n_edges": 1,
                          "sum_jaccard": jac})
            .groupby("jaccard_band", as_index=False).sum()
            .astype({"n_edges": np.int64})
        )
        got = (
            sg.biggraph_edge_jaccard("", n_nodes=N, avg_deg=DEG,
                                     seed=SEED, wedge_cap=CAP)
            .to_pandas()
            .sort_values("jaccard_band").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got, expect.sort_values("jaccard_band").reset_index(drop=True),
            check_exact=False, rtol=1e-12,
        )

    def test_cap_engages_on_hubs(self, ray_session, edges):
        """With the cap the hub-adjacent common counts drop vs exact
        (the planted celebrity vertices exceed CAP), so the band
        profile must differ — the cap is real, not a no-op."""
        und, adj = edges
        assert max(len(a) for a in adj.values()) > CAP
        capped = _common_counts(und, adj, CAP)
        exact = _common_counts(und, adj, None)
        assert sum(capped.values()) < sum(exact.values())


class TestTwoHop:
    def test_band_profile_matches_replica(self, ray_session, edges):
        und, adj = edges
        rows = []
        for ent, nbrs in adj.items():
            nd = len(nbrs)
            within = set()
            for m in nbrs:
                # the kernel caps each middle's fan-in and fan-out to
                # its lexicographically smallest CAP neighbors; a
                # two-hop path ent->m->nb survives iff ent and nb are
                # both inside m's capped list
                mn = _capped(adj[m], CAP)
                if ent in mn:
                    within.update(x for x in mn if x != ent)
            n2 = len(within - set(nbrs))
            rows.append((ent, nd, n2))
        rep = pd.DataFrame(rows, columns=["entity", "n_direct", "n_two_hop"])
        band = np.floor(
            np.log2(np.maximum(rep["n_two_hop"].to_numpy(), 1))
        ).astype(np.int64)
        expect = (
            pd.DataFrame({"two_hop_band": band, "n_entities": 1,
                          "sum_two_hop": rep["n_two_hop"].astype(np.float64)})
            .groupby("two_hop_band", as_index=False).sum()
            .astype({"n_entities": np.int64})
        )
        got = (
            sg.biggraph_two_hop("", n_nodes=N, avg_deg=DEG, seed=SEED,
                                wedge_cap=CAP)
            .to_pandas().sort_values("two_hop_band").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got, expect.sort_values("two_hop_band").reset_index(drop=True),
            check_exact=False, rtol=1e-12,
        )


class TestClusteringCoefficient:
    def test_band_profile_matches_replica(self, ray_session, edges):
        und, adj = edges
        edge_set = set(zip(und["u"], und["v"]))
        tri: dict[str, int] = {}
        for m, nbrs in adj.items():
            nb = _capped(nbrs, CAP)
            t = 0
            for i in range(len(nb)):
                for j in range(i + 1, len(nb)):
                    if (nb[i], nb[j]) in edge_set:
                        t += 1
            tri[m] = t
        rows = []
        for node, nbrs in adj.items():
            d = len(nbrs)
            t = tri.get(node, 0)
            cc = 2.0 * t / (d * (d - 1)) if d >= 2 else 0.0
            rows.append((node, cc))
        cc = np.array([r[1] for r in rows])
        band = np.floor(cc * 20).astype(np.int64)
        expect = (
            pd.DataFrame({"cc_band": band, "n_nodes": 1, "sum_cc": cc})
            .groupby("cc_band", as_index=False).sum()
            .astype({"n_nodes": np.int64})
        )
        got = (
            sg.biggraph_clustering_coefficient(
                "", n_nodes=N, avg_deg=DEG, seed=SEED, wedge_cap=CAP)
            .to_pandas().sort_values("cc_band").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got, expect.sort_values("cc_band").reset_index(drop=True),
            check_exact=False, rtol=1e-12,
        )


class TestHits:
    def test_topk_matches_replica(self, ray_session):
        """Integer fixed-point HITS replica (same renormalization
        x // max(max_x // SCALE, 1)) on the directed edge list."""
        from entity_extractor_linker_ray.ops.graph_algos import PR_SCALE

        e = sg.power_law_edges(N, DEG, seed=SEED).to_pandas()
        s = np.char.zfill(e["src"].to_numpy(dtype=np.int64).astype(str), 7)
        d = np.char.zfill(e["dst"].to_numpy(dtype=np.int64).astype(str), 7)
        df = pd.DataFrame({"src": s, "dst": d, "w": 1}).drop_duplicates(
            ["src", "dst"])
        nodes = np.sort(np.unique(np.concatenate([s, d])))
        idx = {n: i for i, n in enumerate(nodes)}
        si = df["src"].map(idx).to_numpy()
        di = df["dst"].map(idx).to_numpy()
        w = df["w"].to_numpy(dtype=np.int64)
        hub = np.full(len(nodes), PR_SCALE, dtype=np.int64)
        auth = np.zeros(len(nodes), dtype=np.int64)
        for _ in range(3):
            a_raw = np.zeros(len(nodes), dtype=np.int64)
            np.add.at(a_raw, di, hub[si] * w)
            auth = a_raw // max(int(a_raw.max()) // PR_SCALE, 1)
            h_raw = np.zeros(len(nodes), dtype=np.int64)
            np.add.at(h_raw, si, auth[di] * w)
            hub = h_raw // max(int(h_raw.max()) // PR_SCALE, 1)
        rep = pd.DataFrame({"node": nodes, "hub": hub, "auth": auth})
        expect = rep.sort_values(
            ["auth", "node"], ascending=[False, True], kind="stable"
        ).head(20).reset_index(drop=True)
        got = (
            sg.biggraph_hits("", n_nodes=N, avg_deg=DEG, seed=SEED)
            .to_pandas().reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, expect)


class TestShortestPaths:
    def test_histogram_matches_bfs(self, ray_session, edges):
        """Unit weights ⇒ bounded Bellman-Ford ≡ BFS depths ≤ rounds."""
        und, adj = edges
        src = min(adj)
        dist = {src: 0}
        frontier = [src]
        for depth in range(1, 5):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = depth
                        nxt.append(v)
            frontier = nxt
        expect = (
            pd.Series(list(dist.values()), name="dist")
            .value_counts().rename_axis("dist").reset_index(name="n_nodes")
            .astype({"dist": np.int64, "n_nodes": np.int64})
            .sort_values("dist").reset_index(drop=True)
        )
        got = (
            sg.biggraph_shortest_paths("", n_nodes=N, avg_deg=DEG,
                                       seed=SEED, rounds=4)
            .to_pandas().sort_values("dist").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, expect)


class TestLinkCandidates:
    def test_topk_matches_replica(self, ray_session, edges):
        und, adj = edges
        # strong-tie filter: distinct undirected pairs all have w=1 ⇒
        # mean weight 1 ⇒ every edge passes (w*n >= sum_w)
        cnt = _common_counts(und, adj, CAP)
        edge_set = set(zip(und["u"], und["v"]))
        cand = pd.DataFrame(
            [(u, v, c) for (u, v), c in cnt.items()
             if (u, v) not in edge_set],
            columns=["u", "v", "n_common"],
        )
        expect = cand.sort_values(
            ["n_common", "u", "v"], ascending=[False, True, True],
            kind="stable",
        ).head(20).reset_index(drop=True).astype({"n_common": np.int64})
        got = (
            sg.biggraph_link_candidates("", n_nodes=N, avg_deg=DEG,
                                        seed=SEED, k=20, wedge_cap=CAP)
            .to_pandas().reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, expect)
