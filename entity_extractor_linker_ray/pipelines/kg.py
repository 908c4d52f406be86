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


def build_kg_datasets(
    transcripts_ds,
    cfg: dict | None = None,
    kb_records: list[dict] | None = None,
    materialize: bool = True,
    **ray_opts,
):
    """Wire the full pipeline; returns a dict of Datasets.

    ``materialize=True`` pins the (small relative to input) unified
    records so the entities/triples splits don't re-execute the LLM
    stage — right for interactive/test scale. At corpus scale use
    ``pipelines/checkpoint.py`` instead, which streams the records to
    partitioned Parquet and reads the splits back (resumable).
    """
    cfg = get_config(cfg)
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
