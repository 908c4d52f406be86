"""Bounded per-session memoization for materialized Ray Datasets.

Several iterative/pair-generating ops pin their materialized working
set per (sf_dir, params) key so a session's many consumers share one
computation (``ngram_pairs_materialized``, k-means ``_fit``, the KG
edge table, the synthetic big-graph generators). An UNBOUNDED dict of
materialized Datasets pins object-store memory for the process
lifetime — a long driver session sweeping multiple sf dirs or k
values accumulates every fit's working set. ``memoize`` keeps the
last ``keep`` entries per cache in insertion order (re-inserting on
hit makes it LRU); evicted Datasets drop their object references so
Ray can release the blocks. ``clear_caches`` empties every registered
cache — bench harnesses call it between scale points.
"""

from __future__ import annotations

from typing import Callable, TypeVar

T = TypeVar("T")

# Default retained entries per cache. The sandbox sweeps at most a
# couple of sf dirs / k values concurrently; at 100 TB a single key's
# working set is the budget, so keep-last-4 bounds the pinned bytes to
# ~4 working sets without defeating the within-session sharing.
DEFAULT_KEEP = 4

_REGISTERED: list[dict] = []


def register(cache: dict) -> dict:
    """Register a cache dict for :func:`clear_caches`; returns it."""
    _REGISTERED.append(cache)
    return cache


def memoize(cache: dict, key, thunk: Callable[[], T],
            keep: int = DEFAULT_KEEP) -> T:
    """Return ``cache[key]``, computing it via ``thunk`` on miss, and
    evict the least-recently-used entries beyond ``keep``."""
    if key in cache:
        cache[key] = cache.pop(key)  # refresh recency
        return cache[key]
    value = thunk()
    cache[key] = value
    while len(cache) > keep:
        cache.pop(next(iter(cache)))
    return value


def clear_caches() -> None:
    """Drop every registered memoized Dataset (used between bench
    scale points so pinned working sets don't accumulate)."""
    for cache in _REGISTERED:
        cache.clear()
