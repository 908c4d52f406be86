"""Scale-bench the relational/TPC-H family on replicated fact tables.

The dedup/conversation/embedding families have ×16/×64 scale evidence
(`tools/scale_bench*.py`); the join chains did not. This tool builds
×R replicas of the FACT tables only — orders and lineitem with
orderkeys shifted per replica so the order↔lineitem FK stays intact,
events with shifted event ids — while the dimension tables (customer,
part, supplier, nation, region) stay fixed, the realistic growth
pattern: facts scale, dimensions don't, so per-customer order counts
and per-user event counts grow ×R (hot keys get hotter). Times the
join chains the round-3 verdict singled out (`q3_unshipped_revenue`,
`q18_large_volume_customers`, `trade_matrix_nations`,
`customer_copurchase_pairs`) plus two window/stream shapes, and
reports walls, rows/sec, and the wall ratio between the extremes
(linear machinery ≈ size ratio; a hidden quadratic ≈ size_ratio²).

Usage: python tools/scale_bench_rel.py [R ...]   (default: 16 64)
Writes one JSON line; record results in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import pandas as pd

SRC_SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()
KEY_STRIDE = np.int64(100_000_000)


def _replicate(batch: pd.DataFrame, rep: int, shift_cols: list[str],
               jitter_ts: list[str]) -> pd.DataFrame:
    out = batch.copy()
    for c in shift_cols:
        out[c] = out[c].to_numpy(dtype=np.int64) + KEY_STRIDE * np.int64(rep)
    # deterministic per-replica jitter keeps timestamps distinct across
    # replicas (dedup-by-ts shapes stay realistic): seconds cycle 0-59,
    # the millisecond term disambiguates reps 60+ (full range, no reuse
    # at R>60 — the old rep % 60 aliased replicas 60-63 onto 0-3)
    for c in jitter_ts:
        out[c] = (out[c]
                  + pd.to_timedelta(rep % 60, unit="s")
                  + pd.to_timedelta(rep // 60, unit="ms"))
    return out


def build_corpus(repeat: int, out_dir: str) -> dict:
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    fact_spec = {
        "orders": (["o_orderkey"], ["o_orderdate"]),
        "lineitem": (["l_orderkey"], ["l_shipdate"]),
        "events": (["event_id"], ["ts"]),
    }
    for t in TABLES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if t not in fact_spec:
            if not os.path.exists(dst):
                os.symlink(os.path.join(SRC_SF, f"{t}.parquet"), dst)
            continue
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        shift_cols, ts_cols = fact_spec[t]
        base = rd.read_parquet(os.path.join(SRC_SF, f"{t}.parquet"))

        def kernel(batch: pd.DataFrame, _s=shift_cols, _t=ts_cols) -> pd.DataFrame:
            return pd.concat(
                [_replicate(batch, rep, _s, _t) for rep in range(repeat)],
                ignore_index=True,
            )

        base.map_batches(kernel, batch_format="pandas").repartition(
            max(8, repeat // 2)
        ).write_parquet(dst)
    import pyarrow.parquet as pq

    counts = {}
    for t in fact_spec:
        d = os.path.join(out_dir, f"{t}.parquet")
        counts[t] = sum(
            pq.read_metadata(os.path.join(d, f)).num_rows
            for f in os.listdir(d) if f.endswith(".parquet")
        )
    return counts


def main() -> int:
    repeats = [int(x) for x in sys.argv[1:]] or [16, 64]

    import logging

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from entity_extractor_linker_ray.ops import dedupe, memo
    from entity_extractor_linker_ray.pipelines import relational

    OPS = [
        ("q3_unshipped_revenue", relational.q3_unshipped_revenue),
        ("q18_large_volume_customers", relational.q18_large_volume_customers),
        ("trade_matrix_nations", relational.trade_matrix_nations),
        ("customer_copurchase_pairs", dedupe.customer_copurchase_pairs),
        ("events_sessionize", relational.events_sessionize),
        ("latest_event_per_user", relational.latest_event_per_user),
    ]

    results = {}
    for repeat in repeats:
        memo.clear_caches()  # don't let a prior scale's pinned sets linger
        out_dir = f"/tmp/scale_rel_x{repeat}"
        t0 = time.time()
        counts = build_corpus(repeat, out_dir)
        entry: dict = {"fact_rows": counts,
                       "build_sec": round(time.time() - t0, 2)}
        n_li = counts["lineitem"]
        for name, fn in OPS:
            t0 = time.time()
            out = fn(out_dir)
            n_rows = len(out.to_pandas()) if hasattr(out, "to_pandas") else len(out)
            wall = round(time.time() - t0, 2)
            entry[name] = {
                "wall_sec": wall,
                "rows": n_rows,
                "lineitem_rows_per_sec": round(n_li / wall, 1),
            }
        results[f"x{repeat}"] = entry
    if len(repeats) >= 2:
        lo, hi = f"x{repeats[0]}", f"x{repeats[-1]}"
        size_ratio = repeats[-1] / repeats[0]
        ratios = {}
        for name, _ in OPS:
            ratios[name] = round(
                results[hi][name]["wall_sec"]
                / max(results[lo][name]["wall_sec"], 1e-9), 2)
        results["wall_ratio_hi_over_lo"] = ratios
        results["size_ratio"] = size_ratio
    results["num_cpus"] = NUM_CPUS
    print(json.dumps(results))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
