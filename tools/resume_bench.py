"""Crash-resume demonstration at replicated scale (verdict #5).

`TestCheckpointResume` proves the bucket protocol on tiny fixtures;
this tool demonstrates it on the ×R hash-perturbed sf0.1 corpus the
scaling bench uses (`tools/scale_bench.build_corpus`):

1. CRASH RUN — `run_kg_checkpointed` with ``buckets_per_pass`` bounded
   and ``max_passes`` cutting the job off halfway (the test-grade crash
   emulation: finished buckets committed + manifest updated, staging
   garbage left behind);
2. RESUME RUN — re-invoke on the same out_dir; the manifest prunes the
   INPUT SCAN down to the incomplete buckets (bucket-skip evidence =
   the resume pass's row count vs the clean pass's) and completes;
3. CLEAN RUN — same corpus into a fresh out_dir in one pass;
4. EQUALITY — order-insensitive crc32 content hash over every
   (conv_id, record payload) row of both outputs must match exactly.

Reports crash/resume/clean walls + the resume fraction. Record the
JSON line in BASELINE.md.

Usage: python tools/resume_bench.py [R]   (default: 64)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_BUCKETS = 32


def _content_hash(out_dir: str) -> tuple[int, int]:
    """Order-insensitive content hash + row count of a checkpointed
    records tree: per-row crc32 of the canonical field string, summed
    (mod 2^64) across a distributed scan — never collects the rows."""
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(out_dir, "records"))
    cols = sorted(c for c in ds.schema().names if c != "bucket")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        joined = batch[cols].astype(str).agg("|".join, axis=1)
        h = joined.map(lambda s: zlib.crc32(s.encode())).astype("uint64")
        # explicit uint64 partials: a bare python-int column would
        # infer int64 OR uint64 per block (value-dependent), and the
        # mixed-schema concat promotes to float64 — silently lossy
        # above 2^53 for a 64-bit equality check
        import numpy as np

        return pd.DataFrame({"h": np.array([h.sum() % (2**64)],
                                           dtype=np.uint64),
                             "n": np.array([len(batch)], dtype=np.int64)})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    # accumulate in python ints (arbitrary precision), not a numpy sum
    total = sum(int(v) for v in parts["h"]) % (2**64)
    return total, int(parts["n"].sum())


def main() -> int:
    repeat = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    import logging

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.use_polars_sort = True
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import scale_bench

    from entity_extractor_linker_ray.pipelines.checkpoint import (
        run_kg_checkpointed,
    )
    from entity_extractor_linker_ray.synthetic import (
        transcripts_dataset_from_documents,
    )

    corpus_dir = f"/tmp/scale_sf_x{repeat}"
    t0 = time.time()
    n_docs = scale_bench.build_corpus(repeat, corpus_dir)
    build_s = round(time.time() - t0, 2)

    cfg = {
        "RAY_NUM_BUCKETS": N_BUCKETS,
        "RAY_KG_CONCURRENCY": (max(2, NUM_CPUS - 2), max(2, NUM_CPUS - 2)),
        "RAY_NUM_CPUS_PER_ACTOR": 0.8,
        "RAY_DOC_BLOCKS": 240,
    }
    crash_dir, clean_dir = "/tmp/resume_bench_crash", "/tmp/resume_bench_clean"
    for d in (crash_dir, clean_dir):
        shutil.rmtree(d, ignore_errors=True)

    def transcripts():
        return transcripts_dataset_from_documents(corpus_dir)

    # 1. crash run: 2 passes x 8 buckets, then stop (16/32 done)
    t0 = time.time()
    m1 = run_kg_checkpointed(transcripts(), crash_dir, cfg,
                             buckets_per_pass=8, max_passes=2)
    crash_s = round(time.time() - t0, 2)
    done_after_crash = sum(
        1 for b in m1["buckets"].values() if b["status"] == "done")

    # 2. resume: completes only the remaining buckets
    t0 = time.time()
    m2 = run_kg_checkpointed(transcripts(), crash_dir, cfg)
    resume_s = round(time.time() - t0, 2)
    done_after_resume = sum(
        1 for b in m2["buckets"].values() if b["status"] == "done")

    # 3. clean run
    t0 = time.time()
    run_kg_checkpointed(transcripts(), clean_dir, cfg)
    clean_s = round(time.time() - t0, 2)

    # 4. identical content
    h_resumed, n_resumed = _content_hash(crash_dir)
    h_clean, n_clean = _content_hash(clean_dir)

    result = {
        "repeat": repeat,
        "n_docs": n_docs,
        "build_sec": build_s,
        "n_buckets": N_BUCKETS,
        "buckets_done_after_crash": done_after_crash,
        "buckets_done_after_resume": done_after_resume,
        "crash_run_sec": crash_s,
        "resume_sec": resume_s,
        "clean_run_sec": clean_s,
        "resume_over_clean": round(resume_s / max(clean_s, 1e-9), 3),
        "rows_resumed_output": n_resumed,
        "rows_clean_output": n_clean,
        "content_hash_match": h_resumed == h_clean,
        "num_cpus": NUM_CPUS,
    }
    print(json.dumps(result))
    ray.shutdown()
    return 0 if result["content_hash_match"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
