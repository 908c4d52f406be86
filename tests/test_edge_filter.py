"""Broadcast edge-set semi-join filter (`ops/graph_algos`): probing
must keep every true edge pair (no false negatives — the exactness
contract) and the empty/degenerate shapes must not drop schemas."""

from __future__ import annotations

import numpy as np
import pandas as pd

from entity_extractor_linker_ray.ops.graph_algos import (
    _BloomEdgeFilter,
    _edge_hash_filter,
    _pair_hashes,
    _probe_edge_filter,
)


def _hashes(df: pd.DataFrame) -> np.ndarray:
    from entity_extractor_linker_ray.ops.graph_algos import _pair_hashes

    return np.sort(_pair_hashes(df, ("u", "v")))


class TestProbeEdgeFilter:
    def test_keeps_all_true_pairs(self):
        edges = pd.DataFrame(
            {"u": ["a", "b", "c"], "v": ["x", "y", "z"]}
        )
        probes = pd.DataFrame(
            {"u": ["a", "b", "q", "c", "q"], "v": ["x", "y", "r", "z", "x"]}
        )
        kept = _probe_edge_filter(probes, _hashes(edges), ("u", "v"))
        # every true edge pair survives; the non-edges ("q", ...) drop
        # (hash collisions could keep them — allowed — but with 3
        # 64-bit hashes the probability is negligible)
        assert {("a", "x"), ("b", "y"), ("c", "z")} <= set(
            zip(kept["u"], kept["v"])
        )
        assert ("q", "r") not in set(zip(kept["u"], kept["v"]))

    def test_column_order_matters(self):
        """(u, v) and (v, u) hash differently — the filter is over the
        CANONICAL orientation only, as the wedge kernels require."""
        edges = pd.DataFrame({"u": ["a"], "v": ["b"]})
        flipped = pd.DataFrame({"u": ["b"], "v": ["a"]})
        kept = _probe_edge_filter(flipped, _hashes(edges), ("u", "v"))
        assert len(kept) == 0

    def test_empty_inputs(self):
        edges = pd.DataFrame({"u": ["a"], "v": ["b"]})
        empty = pd.DataFrame({"u": pd.Series([], dtype=str),
                              "v": pd.Series([], dtype=str)})
        out = _probe_edge_filter(empty, _hashes(edges), ("u", "v"))
        assert len(out) == 0 and list(out.columns) == ["u", "v"]
        out = _probe_edge_filter(edges, np.array([], dtype=np.uint64),
                                 ("u", "v"))
        assert len(out) == 0 and list(out.columns) == ["u", "v"]


class TestEdgeHashFilterDataset:
    def test_matches_local_hashes(self, ray_session):
        import ray
        import ray.data as rd

        edges = pd.DataFrame(
            {"u": [f"n{i:03d}" for i in range(40)],
             "v": [f"n{(i * 7) % 40:03d}" for i in range(40)]}
        )
        ref = _edge_hash_filter(rd.from_pandas(edges))
        arr = ray.get(ref)
        assert isinstance(arr, np.ndarray) and arr.dtype == np.uint64
        np.testing.assert_array_equal(arr, _hashes(edges))

    def test_auto_switches_to_bloom_above_threshold(self, ray_session):
        import ray
        import ray.data as rd

        edges = pd.DataFrame(
            {"u": [f"n{i:03d}" for i in range(40)],
             "v": [f"n{(i * 7) % 40:03d}" for i in range(40)]}
        )
        ref = _edge_hash_filter(rd.from_pandas(edges), bloom_threshold=10)
        filt = ray.get(ref)
        assert isinstance(filt, _BloomEdgeFilter)
        # every true edge still passes the probe through the Bloom path
        kept = _probe_edge_filter(edges, filt, ("u", "v"))
        assert len(kept) == len(edges)


class TestBloomEdgeFilter:
    def _rand_hashes(self, n: int, seed: int) -> np.ndarray:
        return np.random.default_rng(seed).integers(
            0, 2**64, size=n, dtype=np.uint64
        )

    def test_no_false_negatives_even_saturated(self):
        """Exactness contract: a member is NEVER rejected, even with a
        deliberately undersized (saturated) bit array."""
        members = self._rand_hashes(5000, seed=1)
        for m_bits in (1 << 10, 1 << 16, 1 << 22):
            bf = _BloomEdgeFilter(members, m_bits=m_bits)
            assert bf.contains(members).all(), m_bits

    def test_forced_false_positive_passes_probe(self):
        """A saturated filter lets non-members through — allowed by the
        contract (the downstream edge-marker join drops them); this
        pins that the probe KEEPS such rows rather than erroring."""
        edges = pd.DataFrame(
            {"u": [f"a{i}" for i in range(4000)],
             "v": [f"b{i}" for i in range(4000)]}
        )
        # 1024-bit array for 4000 keys * 4 probes: every bit is set, so
        # EVERY probe is a (forced) false positive
        bf = _BloomEdgeFilter(_pair_hashes(edges, ("u", "v")), m_bits=1 << 10)
        non_member = pd.DataFrame({"u": ["zz"], "v": ["qq"]})
        assert bool(bf.contains(_pair_hashes(non_member, ("u", "v")))[0])
        kept = _probe_edge_filter(non_member, bf, ("u", "v"))
        assert len(kept) == 1  # false positive flows through, by design

    def test_sized_filter_rejects_most_non_members(self):
        members = self._rand_hashes(10_000, seed=2)
        bf = _BloomEdgeFilter(members)  # 16 bits/key, k=4
        probes = self._rand_hashes(20_000, seed=3)
        fpp = bf.contains(probes).mean()
        assert fpp < 0.01, fpp

    def test_footprint_capped(self):
        """The bit array must stop growing at max_bits — the whole
        point of the Bloom variant at 10^8-edge scale."""
        h = self._rand_hashes(1000, seed=4)
        bf = _BloomEdgeFilter(h, bits_per_key=16, max_bits=1 << 12)
        assert bf.words.nbytes == (1 << 12) // 8

    def test_empty_probe(self):
        bf = _BloomEdgeFilter(self._rand_hashes(10, seed=5))
        empty = pd.DataFrame({"u": pd.Series([], dtype=str),
                              "v": pd.Series([], dtype=str)})
        out = _probe_edge_filter(empty, bf, ("u", "v"))
        assert len(out) == 0 and list(out.columns) == ["u", "v"]


class TestWedgeKernelEquivalence:
    def test_bloom_and_exact_filters_agree(self, ray_session, monkeypatch):
        """End-to-end: kg_edge_jaccard and kg_clustering_coefficient
        produce IDENTICAL output whichever filter representation the
        threshold picks — the edge-marker join is what guarantees
        exactness, the filter only prunes the exchange."""
        import ray.data as rd

        from entity_extractor_linker_ray.ops import graph_algos as G

        rng = np.random.default_rng(11)
        n = 60
        uu = rng.integers(0, n, size=400)
        vv = rng.integers(0, n, size=400)
        keep = uu != vv
        df = pd.DataFrame({"subject": [f"e{u:02d}" for u in uu[keep]],
                           "object": [f"e{v:02d}" for v in vv[keep]]})

        results = {}
        for label, threshold in [("exact", G.EDGE_FILTER_BLOOM_THRESHOLD),
                                 ("bloom", 0)]:
            monkeypatch.setattr(G, "EDGE_FILTER_BLOOM_THRESHOLD", threshold)
            jac = G.kg_edge_jaccard(
                "unused", edges_ds=rd.from_pandas(df)
            ).to_pandas().sort_values(["u", "v"]).reset_index(drop=True)
            cc = G.kg_clustering_coefficient(
                "unused", edges_ds=rd.from_pandas(df)
            ).to_pandas().sort_values("node").reset_index(drop=True)
            results[label] = (jac, cc)
        pd.testing.assert_frame_equal(results["exact"][0], results["bloom"][0])
        pd.testing.assert_frame_equal(results["exact"][1], results["bloom"][1])


class TestSegmentedTriu:
    def test_matches_bruteforce(self):
        from entity_extractor_linker_ray.ops.graph_algos import _segmented_triu

        rng = np.random.default_rng(5)
        for trial in range(20):
            sizes = rng.integers(1, 7, size=rng.integers(1, 9))
            codes = np.repeat(np.arange(len(sizes)), sizes)
            ix, iy = _segmented_triu(codes)
            expect = []
            start = 0
            for s in sizes:
                for i in range(start, start + int(s)):
                    for j in range(i + 1, start + int(s)):
                        expect.append((i, j))
                start += int(s)
            assert list(zip(ix.tolist(), iy.tolist())) == expect, trial

    def test_empty_and_singletons(self):
        from entity_extractor_linker_ray.ops.graph_algos import _segmented_triu

        ix, iy = _segmented_triu(np.array([], dtype=np.int64))
        assert len(ix) == 0 and len(iy) == 0
        ix, iy = _segmented_triu(np.array([0, 1, 2], dtype=np.int64))
        assert len(ix) == 0  # all groups size 1 -> no pairs
