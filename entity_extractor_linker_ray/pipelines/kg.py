"""End-to-end KG pipeline assembly (SURVEY.md §3.4).

::

    read_parquet(transcripts)                       # streaming scan
      → groupby(conv_id).map_groups(assemble)       # SHUFFLE 1
      → map_batches(KGDocumentActor, concurrency=N) # extract+link+relate+KGC
      → filter → entities / triples                 # cheap column splits
      → graph materialize (nodes/edges/stats)       # SHUFFLES 2-4 (stages/graph.py)
"""

from __future__ import annotations

import ray

from entity_extractor_linker_ray.config import get_config
from entity_extractor_linker_ray.stages.assemble import assemble_documents
from entity_extractor_linker_ray.stages.kg_stage import (
    kg_records,
    split_entities,
    split_triples,
)
from entity_extractor_linker_ray.state.kb import build_kb


def _estimated_input_bytes(ds) -> int | None:
    """Best-effort input size from block metadata (for parquet reads
    this is a footer-metadata estimate — no data is scanned)."""
    try:
        size = ds.size_bytes()
        return int(size) if size is not None else None
    except Exception:
        return None


def build_kg_datasets(
    transcripts_ds,
    cfg: dict | None = None,
    kb_records: list[dict] | None = None,
    materialize: bool | None = None,
    checkpoint_dir: str | None = None,
    **ray_opts,
):
    """Wire the full pipeline; returns a dict of Datasets.

    ``materialize`` (default ``None`` = auto):

    * ``True`` — pin the (small relative to input) unified records in
      the object store so the entities/triples splits don't re-execute
      the LLM stage. Right for interactive/test scale only.
    * ``False`` — leave the record stream lazy; each split re-executes
      the actor stage when consumed. Correct but pays the extraction
      cost per consumer.
    * ``None`` — decide from the estimated input size: at most
      ``MATERIALIZE_MAX_INPUT_BYTES`` (default 2 GiB) pins; anything
      larger (the corpus-scale case) routes through the RESUMABLE
      checkpoint path (``pipelines/checkpoint.py``): records stream to
      partitioned Parquet under ``checkpoint_dir`` (or
      ``cfg["KG_CHECKPOINT_DIR"]``, or a fresh ``/tmp`` dir) and every
      returned split reads back from disk — nothing
      corpus-proportional is ever pinned in the object store, and a
      crashed run resumes by bucket. A naive 100-TB caller therefore
      gets the streaming path by default instead of discovering the
      pinned-records OOM the hard way.
    """
    cfg = get_config(cfg)
    if materialize is None:
        limit = int(cfg.get("MATERIALIZE_MAX_INPUT_BYTES") or (2 << 30))
        est = _estimated_input_bytes(transcripts_ds)
        if est is not None and est > limit:
            if kb_records is not None:
                # checkpoint runner builds the snapshot KB itself; with
                # a caller-supplied KB fall back to the lazy stream
                # (still nothing pinned) rather than silently dropping it
                materialize = False
            else:
                return _build_kg_datasets_checkpointed(
                    transcripts_ds, cfg, checkpoint_dir
                )
        else:
            materialize = True
    docs = assemble_documents(
        transcripts_ds, num_partitions=int(cfg.get("RAY_DOC_BLOCKS") or 64)
    )
    n_blocks = cfg.get("RAY_DOC_BLOCKS")
    if n_blocks:
        # re-block the (small) documents stream so the actor pool gets
        # fine-grained tasks: without this the assemble map_groups fuses
        # into the actor stage and the scheduling unit becomes one sort
        # partition (~64 coarse, skewed tasks → half the pool idles in
        # the last wave). Documents are tiny relative to input turns, so
        # this repartition moves little data.
        docs = docs.repartition(int(n_blocks))
    kb_ref = ray.put(kb_records if kb_records is not None else build_kb())
    records = kg_records(docs, cfg, kb_ref, **ray_opts)
    if materialize:
        records = records.materialize()
    out = {
        "documents": docs,
        "records": records,
        "entities": split_entities(records),
        "triples": split_triples(records),
    }
    # flagged artifacts are byproducts of the same actor pass (no
    # re-extraction): expose their decoded table shapes when enabled
    if cfg.get("ENABLE_COMPENDIUM", False):
        from entity_extractor_linker_ray.stages.kg_stage import split_compendium

        out["compendium"] = split_compendium(records)
    if cfg.get("COLLECT_TRAINING_DATA", False):
        from entity_extractor_linker_ray.stages.kg_stage import split_training

        out["training"] = split_training(records)
    return out


def _build_kg_datasets_checkpointed(transcripts_ds, cfg, checkpoint_dir):
    """Corpus-scale path of :func:`build_kg_datasets`: one streaming
    pass writes the record stream to resumable partitioned Parquet
    (``pipelines/checkpoint.py``), then every returned split is a lazy
    read over those files — nothing corpus-proportional is pinned."""
    import tempfile

    from entity_extractor_linker_ray.pipelines.checkpoint import (
        read_checkpointed,
        run_kg_checkpointed,
    )
    from entity_extractor_linker_ray.stages.kg_stage import (
        split_compendium,
        split_entities,
        split_training,
        split_triples,
    )

    out_dir = checkpoint_dir or cfg.get("KG_CHECKPOINT_DIR") or tempfile.mkdtemp(
        prefix="kg-checkpoint-"
    )
    manifest = run_kg_checkpointed(transcripts_ds, out_dir, cfg)
    records = read_checkpointed(out_dir)
    docs = assemble_documents(
        transcripts_ds, num_partitions=int(cfg.get("RAY_DOC_BLOCKS") or 64)
    )
    out = {
        "documents": docs,
        "records": records,
        "entities": split_entities(records),
        "triples": split_triples(records),
        "checkpoint_dir": out_dir,
        "manifest": manifest,
    }
    if cfg.get("ENABLE_COMPENDIUM", False):
        out["compendium"] = split_compendium(records)
    if cfg.get("COLLECT_TRAINING_DATA", False):
        out["training"] = split_training(records)
    return out
