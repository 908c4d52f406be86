"""File-format sources and sinks (S1/S3): transcripts in Parquet,
JSONL, or CSV, normalized to ``TRANSCRIPTS_SCHEMA``; corpus outputs as
Parquet or JSONL.

The reference CLI (``main.py:19-158``) accepts raw text files; its
pipelines otherwise consume in-memory dicts. At corpus scale the inputs
arrive as files in whatever format the upstream system emits, so the
Ray engine dispatches on extension to the matching distributed reader
(``read_parquet`` / ``read_json`` / ``read_csv`` — all streaming,
block-parallel, with column projection on the Parquet path) and then
applies ONE vectorized normalization ``map_batches`` so every
downstream stage sees identical Arrow types regardless of the source
format (JSON gives int64 turn indices and epoch-us ints or ISO strings
for ``ts``; CSV gives strings for everything).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from entity_extractor_linker_ray.schemas import TRANSCRIPTS_SCHEMA

_EXT_FORMATS = {
    ".parquet": "parquet",
    ".pq": "parquet",
    ".jsonl": "jsonl",
    ".json": "jsonl",
    ".csv": "csv",
}


def detect_format(path: str) -> str:
    """Infer the source format from the file (or directory-entry)
    extension; directories default to parquet (the engine's native
    partitioned layout)."""
    import os

    lower = path.rstrip("/").lower()
    for ext, fmt in _EXT_FORMATS.items():
        if lower.endswith(ext):
            return fmt
    if os.path.isdir(path):
        for entry in sorted(os.listdir(path)):
            for ext, fmt in _EXT_FORMATS.items():
                if entry.lower().endswith(ext):
                    return fmt
    return "parquet"


def _normalize(batch: pa.Table) -> pa.Table:
    """Cast whatever the format reader produced to TRANSCRIPTS_SCHEMA.

    Tolerates: missing ``tool`` (filled with ""), int64/str turn_idx,
    ``ts`` as timestamp, epoch-microsecond ints, or ISO strings. Pure
    Arrow kernels — no Python rows."""
    cols = {}
    names = set(batch.column_names)
    for field in TRANSCRIPTS_SCHEMA:
        if field.name not in names:
            if field.name == "tool":
                cols["tool"] = pa.array([""] * len(batch), type=pa.string())
                continue
            raise ValueError(f"transcripts source missing column {field.name!r}")
        col = batch.column(field.name)
        if pa.types.is_timestamp(field.type) and pa.types.is_integer(col.type):
            # epoch ints: infer the unit from magnitude (s < 1e11 <= ms
            # < 1e14 <= us); JSON writers emit seconds, Arrow ipc often
            # microseconds — both must land on the same wall-clock
            col = col.cast(pa.int64())
            top = pc.max(pc.abs(col)).as_py() or 0
            scale = 1_000_000 if top < 10**11 else (1_000 if top < 10**14 else 1)
            col = pc.multiply(col, pa.scalar(scale, type=pa.int64())).cast(
                pa.timestamp("us")
            )
        elif pa.types.is_timestamp(field.type) and pa.types.is_string(col.type):
            # ISO-8601 strings cast directly (fractional seconds included)
            col = col.cast(pa.timestamp("us"))
        else:
            col = col.cast(field.type)
        # JSON/CSV null -> typed empty string for string columns
        if pa.types.is_string(field.type):
            col = pc.fill_null(col, "")
        cols[field.name] = col
    return pa.Table.from_pydict(cols, schema=TRANSCRIPTS_SCHEMA)


def read_transcripts(path: str, fmt: str | None = None):
    """Distributed read of a transcripts corpus in ``fmt`` (or inferred
    from the extension), normalized to ``TRANSCRIPTS_SCHEMA``."""
    import ray.data as rd

    fmt = fmt or detect_format(path)
    if fmt == "parquet":
        ds = rd.read_parquet(path, columns=[f.name for f in TRANSCRIPTS_SCHEMA])
    elif fmt == "jsonl":
        ds = rd.read_json(path)
    elif fmt == "csv":
        ds = rd.read_csv(path)
    else:
        raise ValueError(f"unsupported transcripts format {fmt!r}")
    return ds.map_batches(_normalize, batch_format="pyarrow")


def write_output(ds, path: str, fmt: str = "parquet") -> None:
    """Corpus sink: partitioned Parquet (resumable, the default) or
    JSONL (for downstream text tooling). Both are Ray-native writers —
    one file per block, no driver materialization."""
    if fmt == "parquet":
        ds.write_parquet(path)
    elif fmt == "jsonl":
        ds.write_json(path)
    else:
        raise ValueError(f"unsupported output format {fmt!r}")


def write_partitioned(ds, path: str, partition_cols: list[str]) -> None:
    """Resumable corpus sink: hive-partitioned Parquet
    (``path/col=value/…``), one directory per partition value — a
    failed run reprocesses only missing partitions, and downstream
    readers prune whole directories instead of row-group-filtering
    every file. Thin wrapper over the Ray-native writer (one file per
    block per partition; no driver materialization) so callers don't
    hand-roll the layout."""
    ds.write_parquet(path, partition_cols=partition_cols)


def read_partition(path: str, columns: list[str] | None = None, **equals):
    """Partition-pruned read: only the matching ``col=value``
    directories are listed and scanned — the complement of
    :func:`write_partitioned`. At 100 TB this is the difference
    between scanning one language's shard and scanning the corpus.

    Pruning happens at the PATH level — matching ``col=value``
    directories are selected before any reader task is scheduled, so
    non-matching partitions are never listed into the scan (Ray's
    fragment-level ``filter`` can't see hive columns; directory
    selection is also what object-store listings make cheap).
    Hive-partition values come back as strings; callers needing typed
    columns cast downstream."""
    import os

    import ray.data as rd
    from ray.data.datasource.partitioning import Partitioning

    def select(base: str) -> list[str]:
        entries = sorted(os.listdir(base))
        subdirs = [e for e in entries if os.path.isdir(os.path.join(base, e))]
        if not subdirs:
            return [base]
        out: list[str] = []
        for entry in subdirs:
            col, _, value = entry.partition("=")
            if col in equals and str(equals[col]) != value:
                continue
            out.extend(select(os.path.join(base, entry)))
        return out

    paths = select(path)
    if not paths:
        raise FileNotFoundError(
            f"no partition of {path!r} matches {equals!r}"
        )
    return rd.read_parquet(
        paths, columns=columns, partitioning=Partitioning("hive", base_dir=path)
    )
