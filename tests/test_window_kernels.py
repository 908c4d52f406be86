"""Property-based tests (hypothesis) for the pure window-kernel
primitives behind the Ray window operators: the vectorized integer math
must agree with a naive per-row Python reference on arbitrary inputs —
no Ray session needed, so the search can afford many examples."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_extractor_linker_ray.pipelines.relational import (
    ntile_assign,
    segment_starts,
    windowed_sum,
)

# sorted key arrays with repeated segments of arbitrary lengths
segments = st.lists(
    st.tuples(st.integers(0, 5), st.integers(1, 9)), min_size=0, max_size=8
).map(
    lambda runs: np.array(
        [k for i, (_, size) in enumerate(runs) for k in [i] * size],
        dtype=np.int64,
    )
)


def naive_segment_starts(keys: np.ndarray) -> list[int]:
    out, start = [], 0
    for i, k in enumerate(keys):
        if i > 0 and k != keys[i - 1]:
            start = i
        out.append(start)
    return out


class TestSegmentStarts:
    @given(segments)
    @settings(max_examples=200, deadline=None)
    def test_matches_naive(self, keys):
        assert segment_starts(keys).tolist() == naive_segment_starts(keys)


class TestWindowedSum:
    @given(segments, st.integers(1, 6), st.data())
    @settings(max_examples=200, deadline=None)
    def test_matches_naive(self, keys, frame, data):
        values = np.array(
            data.draw(
                st.lists(
                    st.integers(-1000, 1000),
                    min_size=len(keys),
                    max_size=len(keys),
                )
            ),
            dtype=np.int64,
        )
        got = windowed_sum(keys, values, frame).tolist()
        starts = naive_segment_starts(keys)
        exp = [
            int(values[max(i - frame + 1, starts[i]): i + 1].sum())
            for i in range(len(keys))
        ]
        assert got == exp


class TestNtileAssign:
    @given(segments, st.integers(1, 6))
    @settings(max_examples=200, deadline=None)
    def test_matches_sql_semantics(self, keys, tiles):
        got = ntile_assign(keys, tiles).tolist()
        starts = naive_segment_starts(keys)
        exp = []
        for i, s in enumerate(starts):
            # segment size: scan forward from start
            size = sum(1 for k in keys[s:] if k == keys[s])
            pos = i - s
            big, n_big = size // tiles + 1, size % tiles
            if pos < n_big * big:
                exp.append(pos // big + 1)
            else:
                exp.append(n_big + (pos - n_big * big) // (size // tiles) + 1)
        assert got == exp

    @given(segments, st.integers(1, 6))
    @settings(max_examples=100, deadline=None)
    def test_tile_counts_balanced(self, keys, tiles):
        """Within each segment: tile sizes differ by at most 1 and are
        non-increasing (SQL NTILE's defining property)."""
        got = ntile_assign(keys, tiles)
        for s in set(naive_segment_starts(keys)):
            seg = got[np.array(naive_segment_starts(keys)) == s]
            if len(seg) == 0:
                continue
            counts = [int((seg == t).sum()) for t in range(1, tiles + 1)]
            nonzero = [c for c in counts if c > 0]
            assert max(nonzero) - min(nonzero) <= 1
            assert counts == sorted(counts, reverse=True)


class TestIntervalUnionSweep:
    """Property test for the vectorized sweep behind
    ``user_active_span``: for any multiset of per-user intervals, the
    covered length and island count must equal a brute-force union."""

    intervals = st.lists(
        st.tuples(
            st.integers(0, 4),        # user
            st.integers(0, 50),       # start
            st.integers(1, 20),       # length
        ),
        min_size=0,
        max_size=40,
    )

    @given(intervals)
    @settings(max_examples=200, deadline=None)
    def test_matches_bruteforce(self, rows):
        from entity_extractor_linker_ray.pipelines.relational import (
            interval_union_sweep,
        )

        rows = sorted((u, s, s + ln) for u, s, ln in rows)
        users = np.array([r[0] for r in rows], dtype=np.int64)
        start = np.array([r[1] for r in rows], dtype=np.int64)
        end = np.array([r[2] for r in rows], dtype=np.int64)
        got = (
            interval_union_sweep(users, start, end)
            .set_index("user_id")
            .sort_index()
        )

        # brute force: per user, mark covered integer points [s, e)
        exp: dict[int, tuple[int, int]] = {}
        for u in sorted(set(users.tolist())):
            pts = set()
            for uu, s, e in rows:
                if uu == u:
                    pts.update(range(s, e))
            # islands = maximal runs of consecutive covered points
            islands = 0
            prev = None
            for p in sorted(pts):
                if prev is None or p > prev + 1:
                    islands += 1
                prev = p
            exp[u] = (len(pts), islands)

        assert len(got) == len(exp)
        for u, (cov, isl) in exp.items():
            assert got.loc[u, "active_us"] == cov, (u, rows)
            assert got.loc[u, "n_islands"] == isl, (u, rows)
