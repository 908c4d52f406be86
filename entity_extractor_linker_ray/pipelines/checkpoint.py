"""Checkpointed, resumable KG runs: partitioned Parquet + per-bucket
lineage/metrics manifest.

Output layout (the "resumable from checkpoint" contract of the north
rule — per-partition lineage + metrics; a failed run skips completed
partitions on restart)::

    out_dir/
      records/bucket=K/*.parquet    # unified KG records, one dir per bucket
      manifest.json                  # per-bucket status, row counts, timings

Bucket = ``crc32(conv_id) % RAY_NUM_BUCKETS`` — a pure function of the
partition key, so the assemble groupby and the output partitioning
agree and a rerun can filter the *input* down to incomplete buckets
before any heavy work happens (the skip is at the scan, not after it).

Write protocol: remaining buckets are written to a staging directory in
ONE streaming pass — the KG actors themselves write ``bucket=K/``
partition files (``stages/kg_stage.py:KGWriterActor``; the record
stream never hops through the object store to a separate partitioned
Write operator) — then each completed bucket directory is atomically
renamed into place and the manifest updated. A crash mid-run leaves
finished buckets valid and staging garbage ignorable.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import zlib

import pyarrow as pa
import pyarrow.compute as pc

from entity_extractor_linker_ray.config import get_config


def bucket_of(conv_id: str, n_buckets: int) -> int:
    return zlib.crc32(conv_id.encode("utf-8")) % n_buckets


def _bucket_array(conv_col, n_buckets: int) -> pa.Array:
    """Vectorized ``bucket_of`` over an Arrow column: crc32 runs once
    per DISTINCT conv_id (dictionary encode + lookup table), not once
    per row — turn-level inputs repeat each conv_id many times."""
    import numpy as np

    if isinstance(conv_col, pa.ChunkedArray):
        conv_col = conv_col.combine_chunks()
    enc = pc.dictionary_encode(conv_col)
    lut = np.array(
        [bucket_of(v, n_buckets) for v in enc.dictionary.to_pylist()], dtype=np.int32
    )
    if len(lut) == 0:
        return pa.array([], pa.int32())
    return pa.array(lut[enc.indices.to_numpy(zero_copy_only=False)], pa.int32())


def _load_manifest(out_dir: str) -> dict:
    path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(path):
        with open(path) as fh:
            return json.load(fh)
    return {"buckets": {}, "n_buckets": None}


def _save_manifest(out_dir: str, manifest: dict) -> None:
    path = os.path.join(out_dir, "manifest.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, path)


def run_kg_checkpointed(
    transcripts_ds,
    out_dir: str,
    cfg: dict | None = None,
    input_desc: str = "",
    buckets_per_pass: int | None = None,
    max_passes: int | None = None,
) -> dict:
    """Run the KG pipeline with per-bucket checkpointing; returns the
    manifest. Safe to re-invoke after a crash: completed buckets are
    pruned from the input scan and left untouched on disk.

    ``buckets_per_pass`` bounds how many buckets one streaming pass
    covers (None = all remaining in a single pass — cheapest; a finite
    value trades extra input scans for finer-grained crash recovery).
    ``max_passes`` stops after that many passes (tests use it to
    emulate a crash mid-job).
    """
    cfg = get_config(cfg)
    n_buckets = int(cfg.get("RAY_NUM_BUCKETS", 32))
    os.makedirs(out_dir, exist_ok=True)
    records_dir = os.path.join(out_dir, "records")
    os.makedirs(records_dir, exist_ok=True)
    manifest = _load_manifest(out_dir)
    if manifest["n_buckets"] not in (None, n_buckets):
        raise ValueError(
            f"existing checkpoint used n_buckets={manifest['n_buckets']}, "
            f"got {n_buckets}"
        )
    manifest["n_buckets"] = n_buckets

    passes = 0
    while True:
        done = {
            int(b)
            for b, info in manifest["buckets"].items()
            if info.get("status") == "done"
        }
        todo = sorted(set(range(n_buckets)) - done)
        if not todo:
            return manifest
        selected = todo if buckets_per_pass is None else todo[:buckets_per_pass]
        sel_arr = pa.array(selected, pa.int32())
        start = time.time()

        def keep_selected(batch: pa.Table) -> pa.Table:
            buckets = _bucket_array(batch.column("conv_id"), n_buckets)
            return batch.filter(pc.is_in(buckets, value_set=sel_arr))

        pruned = transcripts_ds.map_batches(keep_selected, batch_format="pyarrow")

        staging = os.path.join(out_dir, f"_staging-{int(start * 1000)}")
        # actors write their own bucket=K/ partition files (the
        # direct-write path — no object-store hop for the record
        # stream, no separate partitioned Write operator) and return a
        # manifest of (path, n_rows, n_triples) per written file
        import ray

        from entity_extractor_linker_ray.stages.assemble import assemble_documents
        from entity_extractor_linker_ray.stages.kg_stage import (
            kg_records_direct_write,
        )
        from entity_extractor_linker_ray.state.kb import build_kb

        docs = assemble_documents(
            pruned, num_partitions=int(cfg.get("RAY_DOC_BLOCKS") or 64)
        )
        if cfg.get("RAY_DOC_BLOCKS"):
            docs = docs.repartition(int(cfg["RAY_DOC_BLOCKS"]))
        writes = kg_records_direct_write(
            docs, staging, cfg, ray.put(build_kb()), partition_buckets=n_buckets
        )
        writes.to_pandas()  # consume: all bucket files staged
        wall = time.time() - start
        try:
            # per-stage execution metrics (operator wall/cpu/rows) for
            # the lineage record — best-effort, never fails the pass
            manifest["last_pass_stage_stats"] = writes.stats()
        except Exception:
            pass
        for bucket in selected:
            src = os.path.join(staging, f"bucket={bucket}")
            dst = os.path.join(records_dir, f"bucket={bucket}")
            rows_e = rows_t = 0
            if os.path.exists(src):
                import pyarrow.parquet as pq

                kinds = pq.read_table(src, columns=["record_type"]).column(
                    "record_type"
                ).to_pylist()
                rows_e = sum(1 for k in kinds if k == "entity")
                # count triples explicitly: the stream may also carry
                # compendium/training artifact rows
                rows_t = sum(1 for k in kinds if k == "triple")
                if os.path.exists(dst):
                    shutil.rmtree(dst)
                os.replace(src, dst)
            else:
                os.makedirs(dst, exist_ok=True)
            manifest["buckets"][str(bucket)] = {
                "status": "done",
                "rows_entities": rows_e,
                "rows_triples": rows_t,
                "input": input_desc,
                "wall_s_pass": round(wall, 3),
                "completed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            _save_manifest(out_dir, manifest)
        shutil.rmtree(staging, ignore_errors=True)
        passes += 1
        if buckets_per_pass is None or (max_passes is not None and passes >= max_passes):
            return manifest


def read_checkpointed(out_dir: str, record_type: str | None = None):
    """Read back a checkpointed run as a Dataset (optionally one record
    type)."""
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(out_dir, "records"))
    if record_type is not None:
        ds = ds.map_batches(
            lambda t: t.filter(pc.equal(t.column("record_type"), record_type)),
            batch_format="pyarrow",
        )
    return ds
