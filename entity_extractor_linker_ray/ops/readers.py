"""Shared parquet readers with cluster-proportional block sizing.

Ray's read planner targets ~128 MB blocks, which is right for IO-bound
scans but leaves a small corpus in a handful of blocks — and
``map_batches`` parallelism is per BLOCK, so any stage whose per-row
cost is Python-level (tokenizing, shingling, per-doc string kernels)
gets serialized onto as many CPUs as there are blocks. These helpers
override to ≥2 blocks per cluster CPU; at production scale the file /
row-group count dominates and the override is a no-op floor.
"""

from __future__ import annotations


def _target_blocks() -> int:
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(16, 2 * cpus)


def read_split(path: str, columns: list[str] | None = None):
    """``read_parquet`` for tables feeding CPU-heavy per-row kernels."""
    import ray.data as rd

    return rd.read_parquet(path, columns=columns, override_num_blocks=_target_blocks())
