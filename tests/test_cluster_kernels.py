"""Property tests for the new pure integer kernels (no Ray session):
the milli fixed-point rounding, the exact integer k-means assignment,
and the k-gram polynomial hash — each against a naive per-element
reference implementation.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_extractor_linker_ray.ops.cluster import _assign, milli_round
from entity_extractor_linker_ray.ops.textstats import (
    FP_BASE,
    FP_K,
    FP_MOD,
    _FP_POWERS,
)

finite_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


class TestMilliRound:
    @given(st.lists(finite_floats, min_size=1, max_size=50))
    @settings(max_examples=200, deadline=None)
    def test_half_away_from_zero(self, xs):
        got = milli_round(np.asarray(xs, dtype=np.float64))
        for x, g in zip(xs, got):
            scaled = x * 1000.0
            frac = abs(scaled) - np.floor(abs(scaled))
            want = np.floor(abs(scaled)) + (1 if frac >= 0.5 else 0)
            assert g == int(np.copysign(want, scaled)), (x, g)

    def test_exact_halves(self):
        # .0005 * 1000 is the half case: away from zero, both signs
        assert milli_round(np.array([0.0015]))[0] == 2
        assert milli_round(np.array([-0.0015]))[0] == -2
        assert milli_round(np.array([0.0]))[0] == 0


class TestAssign:
    @given(
        st.integers(min_value=1, max_value=20),  # n vectors
        st.integers(min_value=1, max_value=6),   # k centroids
        st.integers(min_value=1, max_value=8),   # dim
        st.integers(min_value=0, max_value=2**31),
    )
    @settings(max_examples=100, deadline=None)
    def test_matches_naive_argmin(self, n, k, dim, seed):
        rng = np.random.default_rng(seed)
        vecs = rng.integers(-3000, 3000, size=(n, dim)).astype(np.int64)
        cents = rng.integers(-3000, 3000, size=(k, dim)).astype(np.int64)
        assign, d2 = _assign(vecs, cents)
        for i in range(n):
            dists = [int(((vecs[i] - cents[c]) ** 2).sum()) for c in range(k)]
            best = min(range(k), key=lambda c: (dists[c], c))
            assert assign[i] == best
            assert d2[i] == dists[best]


class TestKgramHash:
    @given(st.text(alphabet=st.characters(codec="utf-8"), min_size=FP_K,
                   max_size=60))
    @settings(max_examples=150, deadline=None)
    def test_matmul_hash_equals_per_gram_reference(self, text):
        codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
            np.int64
        )
        windows = np.lib.stride_tricks.sliding_window_view(codes, FP_K)
        got = (windows @ _FP_POWERS) % FP_MOD
        for i in range(len(codes) - FP_K + 1):
            want = (
                sum(ord(text[i + j]) * pow(FP_BASE, j, FP_MOD) for j in range(FP_K))
                % FP_MOD
            )
            assert got[i] == want, (i, text)
