"""ops/memo: bounded LRU semantics for the materialized-Dataset
session caches (round-3 advice — unbounded caches pinned object-store
memory for the process lifetime)."""

from __future__ import annotations

from entity_extractor_linker_ray.ops import memo


def test_memoize_hits_and_evicts_lru():
    cache: dict = {}
    calls = []

    def make(k):
        def thunk():
            calls.append(k)
            return f"v{k}"
        return thunk

    for k in range(5):
        assert memo.memoize(cache, k, make(k), keep=3) == f"v{k}"
    # keep-last-3: 0 and 1 evicted
    assert set(cache) == {2, 3, 4}
    # hit refreshes recency without recompute
    assert memo.memoize(cache, 2, make(2), keep=3) == "v2"
    assert calls == [0, 1, 2, 3, 4]
    # inserting one more evicts the least-recently-used (3, not 2)
    memo.memoize(cache, 5, make(5), keep=3)
    assert set(cache) == {4, 2, 5} and 3 not in cache


def test_clear_caches_empties_registered():
    cache = memo.register({})
    memo.memoize(cache, "k", lambda: 1)
    assert cache
    memo.clear_caches()
    assert not cache


def test_default_keep_bounds_real_caches():
    """Every registered cache in the library modules is a plain dict
    the helpers can bound; importing the modules must register them."""
    import entity_extractor_linker_ray.ops.cluster  # noqa: F401
    import entity_extractor_linker_ray.ops.dedupe  # noqa: F401
    import entity_extractor_linker_ray.ops.graph_algos  # noqa: F401
    import entity_extractor_linker_ray.ops.synthetic_graph  # noqa: F401
    import entity_extractor_linker_ray.ops.textstats  # noqa: F401

    assert len(memo._REGISTERED) >= 8
    assert all(isinstance(c, dict) for c in memo._REGISTERED)
