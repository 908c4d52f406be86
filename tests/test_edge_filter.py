"""Broadcast edge-set semi-join filter (`ops/graph_algos`): probing
must keep every true edge pair (no false negatives — the exactness
contract) and the empty/degenerate shapes must not drop schemas."""

from __future__ import annotations

import numpy as np
import pandas as pd

from entity_extractor_linker_ray.ops.graph_algos import (
    _edge_hash_filter,
    _probe_edge_filter,
)


def _hashes(df: pd.DataFrame) -> np.ndarray:
    return np.sort(
        pd.util.hash_pandas_object(df[["u", "v"]], index=False)
        .to_numpy(dtype=np.uint64)
    )


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
