"""Size-step scale evidence for the synthetic-biggraph family.

Every other op family has ×16/×64 replication evidence
(`tools/scale_bench{,_conv,_emb,_rel}.py`); the graph family had
single-size walls at n=100k only. This tool runs the cheapest
`biggraph_*` kernels at n=100k and n=400k (the generator scales edges
≈ linearly with nodes, so the step is ~4× edges) in ONE Ray session
and reports wall ratios: linear machinery ≈ edge ratio; a hidden
quadratic ≈ ratio² (the wedge kernels' documented cap-regime exception
would show there, which is why the wedge family is benched separately
in `bench.py`'s timed set and not here).

Usage: python tools/scale_bench_graph.py [n_lo n_hi]  (default 100000 400000)
Writes one JSON line; record results in BASELINE.md →
BENCH_scale_graph_r5.json.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# the five cheapest kernels by the round-4 walls (degree_stats first —
# it warms the memoized edge list the others reuse) plus pagerank,
# the canonical iterative representative
OPS = [
    "biggraph_degree_stats",
    "biggraph_components",
    "biggraph_shortest_paths",
    "biggraph_triangles",
    "biggraph_lpa",
    "biggraph_pagerank",
]


def main(n_lo: int, n_hi: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.use_polars_sort = True
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from entity_extractor_linker_ray.ops import memo
    from entity_extractor_linker_ray.ops import synthetic_graph as SG

    sizes = [n_lo, n_hi]
    walls: dict[str, dict[str, float]] = {op: {} for op in OPS}
    edge_counts: dict[int, int] = {}
    for n in sizes:
        memo.clear_caches()  # each size pays its own edge materialize
        edge_counts[n] = SG._edges_materialized(n, SG.AVG_DEG, 7).count()
        for op in OPS:
            fn = getattr(SG, op)
            start = time.time()
            result = fn(n_nodes=n)
            if hasattr(result, "to_pandas"):
                result.to_pandas()
            walls[op][str(n)] = round(time.time() - start, 3)
    ray.shutdown()

    edge_ratio = edge_counts[n_hi] / edge_counts[n_lo]
    out = {
        "metric": "graph_size_step",
        "n_lo": n_lo,
        "n_hi": n_hi,
        "edges_lo": edge_counts[n_lo],
        "edges_hi": edge_counts[n_hi],
        "edge_ratio": round(edge_ratio, 3),
        "num_cpus": NUM_CPUS,
        "walls": walls,
        "wall_ratios": {
            op: round(w[str(n_hi)] / w[str(n_lo)], 3) for op, w in walls.items()
        },
    }
    return out


if __name__ == "__main__":
    n_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_hi = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    print(json.dumps(main(n_lo, n_hi)))
