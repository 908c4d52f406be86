"""Scale-bench the transcript/conversation op family on a replicated
corpus — the same ×R hash-perturbed documents builder as
`tools/scale_bench.py` (conversations derive deterministically from
documents, so replica structure carries straight through the turn
synthesis). Times the conversation rollup, the two cross-conversation
dedup attributions, preference-pair mining, the windowed SFT export,
and intra-document repetition localization; reports walls, docs/sec,
and the wall ratio between the extremes (linear machinery ≈ size
ratio; a hidden all-pairs reads ≈ size_ratio²).

Usage: python tools/scale_bench_conv.py [R ...]   (default: 16 64)
Writes one JSON line; record results in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def main() -> int:
    repeats = [int(x) for x in sys.argv[1:]] or [16, 64]

    import logging

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import scale_bench

    from entity_extractor_linker_ray.ops import textstats
    from entity_extractor_linker_ray.pipelines import conversations as convs

    OPS = [
        ("conv_stats", convs.conv_stats),
        ("conv_stale_turns", convs.conv_stale_turns),
        ("conv_preference_pairs", convs.conv_preference_pairs),
        ("conv_sft_windows", convs.conv_sft_windows),
        ("conv_context_budget", convs.conv_context_budget),
        ("intra_doc_repeats", textstats.intra_doc_repeats),
    ]

    results = {}
    for repeat in repeats:
        out_dir = f"/tmp/scale_sf_x{repeat}"
        t0 = time.time()
        n_docs = scale_bench.build_corpus(repeat, out_dir)
        build_s = round(time.time() - t0, 2)
        entry = {"n_docs": n_docs, "build_sec": build_s}
        for name, fn in OPS:
            t0 = time.time()
            out = fn(out_dir)
            n_rows = len(out.to_pandas()) if hasattr(out, "to_pandas") else len(out)
            wall = round(time.time() - t0, 2)
            entry[name] = {
                "wall_sec": wall,
                "rows": n_rows,
                "docs_per_sec": round(n_docs / wall, 1),
            }
        results[f"x{repeat}"] = entry
    if len(repeats) >= 2:
        lo, hi = f"x{repeats[0]}", f"x{repeats[-1]}"
        for name, _ in OPS:
            ratio = results[hi][name]["wall_sec"] / max(
                results[lo][name]["wall_sec"], 1e-9
            )
            results[f"{name}_wall_ratio_{lo}_to_{hi}"] = round(ratio, 2)
        results["size_ratio"] = repeats[-1] / repeats[0]
    print(json.dumps({"scale_bench_conv": results, "num_cpus": NUM_CPUS,
                      "src": scale_bench.SRC_SF}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
