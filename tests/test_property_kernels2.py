"""Property tests (hypothesis) for the second wave of module-level
integer kernels — Gini from a histogram, half-open range expansion,
and the interval/segment helpers the newest window ops share. Pure
functions, no Ray session needed."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_extractor_linker_ray.pipelines.relational import (
    expand_ranges,
    gini_from_histogram,
    segment_starts,
)


def _brute_gini(values: list[int]) -> float:
    n = len(values)
    s = sum(values)
    if n == 0 or s == 0:
        return 0.0
    delta = sum(abs(a - b) for a in values for b in values)
    return delta / (2 * n * s)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 500), st.integers(1, 6)),
                min_size=0, max_size=12))
def test_gini_matches_brute_force(pairs):
    # build a sorted distinct-value histogram from (value, count) pairs
    hist: dict[int, int] = {}
    for v, c in pairs:
        hist[v] = hist.get(v, 0) + c
    vs = np.array(sorted(hist), dtype=np.int64)
    cs = np.array([hist[v] for v in sorted(hist)], dtype=np.int64)
    n, g = gini_from_histogram(vs, cs)
    flat = [v for v, c in hist.items() for _ in range(c)]
    assert n == len(flat)
    assert abs(g - _brute_gini(flat)) < 1e-12
    assert 0.0 <= g < 1.0 or (g == 0.0 and len(flat) <= 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=0, max_size=15))
def test_expand_ranges_matches_loops(bounds):
    lo = np.array([min(a, b) for a, b in bounds], dtype=np.int64)
    hi = np.array([max(a, b) for a, b in bounds], dtype=np.int64)
    got = expand_ranges(lo, hi).tolist()
    expected = [j for a, b in zip(lo, hi) for j in range(a, b)]
    assert got == expected


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 5), min_size=0, max_size=40))
def test_segment_starts_reference(keys):
    arr = np.sort(np.array(keys, dtype=np.int64))
    got = segment_starts(arr).tolist()
    expected = []
    for i, k in enumerate(arr):
        if i == 0 or arr[i - 1] != k:
            start = i
        expected.append(start)
    assert got == expected
