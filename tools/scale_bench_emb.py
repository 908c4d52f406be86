"""Scale-bench the embedding/ANN family on a replicated vector table.

The sf0.1 embeddings table is 2,000 vectors; the dedup/pretrain and
transcript families have ×16/×64 scale evidence but the embedding
family (k-means, cell-bounded pair scans, kNN join, power-iteration
PCA, brute-force ANN) did not. This tool builds a ×R table with the
SAME geometric shape — each replica is the base set plus deterministic
hash-derived jitter (±5% of the coordinate scale), so cluster
structure persists instead of collapsing into R identical copies —
then times the family at each R.

The cell-bounded quadratics (semantic pairs, kNN join) are run with
``k ∝ n`` (constant ~250-vector target cell), exercising exactly the
documented scale contract ("choose k ∝ n/target_cell for a constant
per-cell cost"); running them at fixed k would measure the stated
Σ|cell|² blow-up instead of the operator.

Usage: python tools/scale_bench_emb.py [R ...]   (default: 16 64)
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
TARGET_CELL = 250


def _mix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64, copy=True)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def build_table(repeat: int, out_dir: str) -> int:
    """×repeat jittered embeddings + symlinks for the other tables."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        if t == "embeddings":
            continue
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC_SF, f"{t}.parquet"), dst)
    dst = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(dst) or os.path.isdir(dst):
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        else:
            os.remove(dst)

    base = pq.read_table(os.path.join(SRC_SF, "embeddings.parquet")).to_pandas()
    n, d = len(base), len(base["embedding"].iloc[0])
    X = np.stack([np.asarray(v, dtype=np.float32) for v in base["embedding"]])
    parts = []
    for rep in range(repeat):
        if rep == 0:
            Xr = X
        else:
            # deterministic jitter keyed on (vec_id, rep, dim)
            key = (
                base["vec_id"].to_numpy(dtype=np.int64)[:, None]
                * np.int64(1_000_003)
                + np.arange(d, dtype=np.int64)[None, :]
                + np.int64(rep) * np.int64(777_767_777)
            )
            u = (_mix64(key) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
            Xr = (X + ((u - 0.5) * 0.1).astype(np.float32)).astype(np.float32)
        parts.append(
            pd.DataFrame(
                {"vec_id": base["vec_id"].to_numpy(dtype=np.int64)
                 + np.int64(rep) * np.int64(10_000_000),
                 "embedding": [row.tolist() for row in Xr],
                 "label": base["label"].to_numpy()}
            )
        )
    out = pd.concat(parts, ignore_index=True)
    out.to_parquet(dst)
    return len(out)


def main() -> int:
    reps = [int(a) for a in sys.argv[1:]] or [16, 64]

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from entity_extractor_linker_ray.ops import ann, cluster, dedupe

    results: dict = {}
    for repeat in reps:
        out_dir = f"/tmp/graft_scale_emb_x{repeat}"
        t0 = time.time()
        n_vecs = build_table(repeat, out_dir)
        build_sec = round(time.time() - t0, 2)
        k = max(8, n_vecs // TARGET_CELL)
        entry: dict = {"n_vecs": n_vecs, "build_sec": build_sec, "k": k}

        def timed(name, fn):
            t = time.time()
            res = fn()
            nrows = len(res.to_pandas()) if hasattr(res, "to_pandas") else len(res)
            wall = round(time.time() - t, 2)
            entry[name] = {
                "wall_sec": wall, "rows": nrows,
                "vecs_per_sec": round(n_vecs / wall, 1) if wall else None,
            }
            print(f"x{repeat} {name}: {wall}s rows={nrows}", flush=True)

        timed("kmeans_clusters", lambda: cluster.kmeans_clusters(out_dir, k=k))
        timed("dedup_semantic_pairs",
              lambda: cluster.semantic_dup_pairs(out_dir, k=k))
        timed("knn_join",
              lambda: cluster.knn_join_within_cells(out_dir, k=k))
        timed("pca_power_component",
              lambda: cluster.pca_power_component(out_dir))
        timed("knn_brute", lambda: ann.knn_brute(out_dir))
        timed("dedup_embedding_neardup",
              lambda: dedupe.embedding_neardup(out_dir))
        results[f"x{repeat}"] = entry

    if len(reps) == 2:
        lo, hi = f"x{reps[0]}", f"x{reps[1]}"
        for op in ("kmeans_clusters", "dedup_semantic_pairs", "knn_join",
                   "pca_power_component", "knn_brute",
                   "dedup_embedding_neardup"):
            results[f"{op}_wall_ratio"] = round(
                results[hi][op]["wall_sec"]
                / max(results[lo][op]["wall_sec"], 1e-9), 2
            )
        results["size_ratio"] = round(reps[1] / reps[0], 2)

    line = json.dumps({"scale_bench_emb": results, "num_cpus": NUM_CPUS,
                       "src": SRC_SF})
    print(line)
    with open(os.path.join(REPO, "BENCH_scale_emb_r3.json"), "w") as fh:
        fh.write(line + "\n")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
