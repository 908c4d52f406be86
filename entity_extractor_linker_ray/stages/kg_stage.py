"""The stateful KG actor stage: documents → unified KG records.

One actor pool (``map_batches(KGDocumentActor, concurrency=N)``) runs
the whole per-conversation flow — extract, entity inference, KB
linking, relation extraction, per-document dedups, KGC rounds — because
every one of those reference steps is strictly document-local
(``core/orchestrator.py:329-468``); splitting them into separate Ray
stages would only add per-stage shuffles/joins to re-pair documents
with their entities. Cross-document work (corpus dedup, graph
materialize, stats) happens downstream on the emitted records.

Actor state (built ONCE per actor in ``__init__``, the reference's
module-singleton pattern ``services/*.py`` rephrased for actor pools):
the KB snapshot indexes (received via a ``ray.put`` broadcast ref —
shipped once per actor, never per batch), the LLM client, and an LRU
page cache standing in for the reference's JSON file cache
(``utils/cache_utils.py:7-51``).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from entity_extractor_linker_ray.config import get_config
from entity_extractor_linker_ray.core_doc import process_document
from entity_extractor_linker_ray.schemas import KG_RECORD_SCHEMA
from entity_extractor_linker_ray.state.kb import KBSnapshot, build_kb
from entity_extractor_linker_ray.state.llm import StubLLMClient


def make_llm_client(cfg: dict, kb: KBSnapshot):
    """LLM client factory (the reference's swappable
    ``LLM_BASE_URL``/``MODEL`` endpoint, ``settings.py:14-15``, recast
    as a constructor-injected protocol). Only the deterministic stub is
    constructible in this sealed environment; a networked client would
    be registered here.

    A13: when ``RATE_LIMIT_MAX_CALLS`` is set, the client's ``chat`` is
    wrapped in a per-actor sliding-window limiter
    (``state/rate_limiter.py``) holding this actor's share of the
    global budget — ``global / pool_size`` — so a pool of N actors
    stays under the global rate with no cross-actor coordination
    (mirrors ``utils/rate_limiter.py:7-44`` semantics)."""
    model = cfg.get("MODEL", "stub")
    if model == "stub":
        client = StubLLMClient(kb, cfg.get("LANGUAGE", "en"))
    else:
        raise NotImplementedError(
            f"MODEL={model!r}: only the deterministic 'stub' client exists in "
            "this environment; implement LLMClient.chat for networked models."
        )
    global_max = cfg.get("RATE_LIMIT_MAX_CALLS")
    if global_max:
        from entity_extractor_linker_ray.state.rate_limiter import RateLimiter

        pool = cfg.get("RAY_KG_CONCURRENCY", 8)
        pool_size = pool[1] if isinstance(pool, tuple) else int(pool)
        limiter = RateLimiter.for_pool_share(
            int(global_max),
            float(cfg.get("RATE_LIMIT_PERIOD", 1.0)),
            pool_size,
            backoff_max=float(cfg.get("RATE_LIMIT_BACKOFF_MAX", 60.0)),
        )
        client.chat = limiter(client.chat)
    return client


_LIST_COLS = {
    "wikipedia_categories", "wikipedia_see_also", "wikidata_types",
    "wikidata_part_of", "wikidata_has_parts", "wikidata_aliases",
    "wikidata_instance_of", "wikidata_subclass_of", "wikidata_member_of",
    "wikidata_citizenships", "dbpedia_types", "dbpedia_subjects",
    "dbpedia_part_of", "dbpedia_has_parts", "dbpedia_member_of",
    "dbpedia_categories", "dbpedia_current_member", "dbpedia_former_member",
    "dbpedia_dbp_part_of", "dbpedia_dbp_member_of",
}
_INT_COLS = {"ord", "citation_start", "citation_end"}
_FLOAT_COLS = {"wikidata_lat", "wikidata_lon"}  # nullable float64

# Columns each record type actually carries; everything else in the
# unified schema is emitted as a typed null column (pa.nulls — zero
# per-row Python). The per-type split keeps record assembly one list
# comprehension per RELEVANT column instead of a ~70-way branch per
# row — measured ~20% of actor wall before the rewrite.
def _relevant_columns() -> dict[str, set]:
    from entity_extractor_linker_ray.schemas import ENTITY_COLUMNS, TRIPLE_COLUMNS

    return {
        "entity": set(ENTITY_COLUMNS),
        "triple": set(TRIPLE_COLUMNS),
        "compendium": {"conv_id", "ord", "artifact_json"},
        "training": {"conv_id", "ord", "artifact_json"},
    }


class KGDocumentActor:
    def __init__(self, cfg: dict | None = None, kb_ref=None):
        self.cfg = get_config(cfg)
        if kb_ref is not None:
            import ray

            records = ray.get(kb_ref) if not isinstance(kb_ref, list) else kb_ref
        else:
            records = build_kb()
        self.kb = KBSnapshot(records)
        self.llm = make_llm_client(self.cfg, self.kb)

    @staticmethod
    def _rows_table(record_type: str, rows: list[dict], relevant: set) -> pa.Table:
        """Columnar assembly for one record type: one list comprehension
        per relevant column, typed nulls for the rest of the unified
        schema (no per-row per-column branching)."""
        n = len(rows)
        arrays = []
        for field in KG_RECORD_SCHEMA:
            name = field.name
            if name == "record_type":
                arrays.append(pa.array([record_type] * n, field.type))
            elif name not in relevant:
                arrays.append(pa.nulls(n, field.type))
            elif name in _INT_COLS:
                arrays.append(
                    pa.array(
                        np.fromiter(
                            (row.get(name) or 0 for row in rows),
                            dtype=np.int32, count=n,
                        ),
                        field.type,
                    )
                )
            elif name in _LIST_COLS:
                arrays.append(
                    pa.array([row.get(name) or [] for row in rows], field.type)
                )
            elif name in _FLOAT_COLS:
                arrays.append(pa.array([row.get(name) for row in rows], field.type))
            else:
                arrays.append(
                    pa.array([row.get(name) or "" for row in rows], field.type)
                )
        return pa.Table.from_arrays(arrays, schema=KG_RECORD_SCHEMA)

    def __call__(self, batch: pa.Table) -> pa.Table:
        want_artifacts = self.cfg.get("ENABLE_COMPENDIUM", False) or self.cfg.get(
            "COLLECT_TRAINING_DATA", False
        )
        ent_rows: list[dict] = []
        tri_rows: list[dict] = []
        art_rows: dict[str, list[dict]] = {"compendium": [], "training": []}
        conv_ids = batch.column("conv_id").to_pylist()
        doc_texts = batch.column("doc_text").to_pylist()
        for conv_id, doc_text in zip(conv_ids, doc_texts):
            if want_artifacts:
                entities, rels, artifacts = process_document(
                    doc_text or "", self.cfg, self.llm, self.kb, return_artifacts=True
                )
            else:
                entities, rels = process_document(doc_text or "", self.cfg, self.llm, self.kb)
                artifacts = {}
            canonical_by_name: dict[str, str] = {}
            for ordinal, ent in enumerate(entities):
                canonical_by_name.setdefault(ent["entity"], ent["canonical_id"])
                ent["conv_id"] = conv_id
                ent["ord"] = ordinal
                ent_rows.append(ent)
            for ordinal, rel in enumerate(rels):
                rel = dict(rel)
                rel["conv_id"] = conv_id
                rel["ord"] = ordinal
                rel["subject_id"] = canonical_by_name.get(rel["subject"], rel["subject"])
                rel["object_id"] = canonical_by_name.get(rel["object"], rel["object"])
                tri_rows.append(rel)
            # artifact rows ride the same unified stream: the flagged
            # compendium/training outputs are byproducts of THIS pass
            # (no re-extraction per artifact stage)
            if "compendium" in artifacts:
                art_rows["compendium"].append(
                    {"conv_id": conv_id, "ord": 0,
                     "artifact_json": json.dumps(artifacts["compendium"],
                                                 ensure_ascii=False)}
                )
            for ordinal, example in enumerate(artifacts.get("training", [])):
                art_rows["training"].append(
                    {"conv_id": conv_id, "ord": ordinal,
                     "artifact_json": json.dumps(example, ensure_ascii=False)}
                )

        relevant = _relevant_columns()
        tables = []
        if ent_rows:
            tables.append(self._rows_table("entity", ent_rows, relevant["entity"]))
        if tri_rows:
            tables.append(self._rows_table("triple", tri_rows, relevant["triple"]))
        for kind in ("compendium", "training"):
            if art_rows[kind]:
                tables.append(self._rows_table(kind, art_rows[kind], relevant[kind]))
        if not tables:
            return KG_RECORD_SCHEMA.empty_table()
        return pa.concat_tables(tables).combine_chunks()


class KGWriterActor(KGDocumentActor):
    """KG actor that writes its own output parquet and emits a tiny
    manifest row instead of shipping records through the object store.

    At corpus scale the unified record stream is large (~70 columns ×
    every mention); routing it through the object store to a separate
    Write operator costs a serialize + transfer + encode hop whose CPU
    does NOT live in the scaled actor pool (measured: a CPU-invariant
    multi-second tail). Writing inside the actor makes output cost part
    of the parallel stage and leaves only manifest rows downstream —
    the same files-per-task layout ``write_parquet`` produces, still
    one file per task under ``out_dir``."""

    def __init__(
        self,
        cfg: dict | None = None,
        kb_ref=None,
        out_dir: str = "",
        partition_buckets: int = 0,
    ):
        super().__init__(cfg, kb_ref)
        import os

        self.out_dir = out_dir
        # >0: write hive-style bucket=K/ subdirectories keyed on
        # crc32(conv_id) % partition_buckets — the checkpoint layout
        # (pipelines/checkpoint.py), produced without a separate
        # partitioned Write operator
        self.partition_buckets = int(partition_buckets)
        os.makedirs(out_dir, exist_ok=True)

    @staticmethod
    def _batch_tag(batch: pa.Table) -> str:
        """Deterministic per-batch file tag: crc32 over the batch's
        conv_ids. Batches partition the conv space, so tags are unique
        across batches AND stable under Ray task retry — a retried task
        rewrites the SAME filenames instead of leaving the failed
        attempt's duplicates (and possibly a torn file) next to fresh
        ones for the checkpoint commit to count twice."""
        import zlib

        joined = "|".join(batch.column("conv_id").to_pylist())
        return f"{zlib.crc32(joined.encode('utf-8')):08x}-{batch.num_rows}"

    def _write(self, table: pa.Table, tag: str, subdir: str = "") -> str:
        import os

        import pyarrow.parquet as pq

        target = os.path.join(self.out_dir, subdir) if subdir else self.out_dir
        os.makedirs(target, exist_ok=True)
        path = os.path.join(target, f"part-{tag}.parquet")
        pq.write_table(table, path)
        return path

    @staticmethod
    def _count_triples(table: pa.Table) -> int:
        import pyarrow.compute as pc

        return int(
            pc.sum(
                pc.cast(pc.equal(table.column("record_type"), "triple"), pa.int64())
            ).as_py()
            or 0
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        manifest_schema = pa.schema(
            [
                ("path", pa.string()),
                ("n_rows", pa.int64()),
                ("n_triples", pa.int64()),
                ("n_docs", pa.int64()),
            ]
        )
        table = super().__call__(batch)
        if table.num_rows == 0:
            return manifest_schema.empty_table()
        tag = self._batch_tag(batch)
        if self.partition_buckets:
            from entity_extractor_linker_ray.pipelines.checkpoint import _bucket_array

            buckets = _bucket_array(table.column("conv_id"), self.partition_buckets)
            paths, rows, triples = [], [], []
            for bucket in pc.unique(buckets).to_pylist():
                sub = table.filter(pc.equal(buckets, bucket))
                paths.append(self._write(sub, tag, subdir=f"bucket={bucket}"))
                rows.append(sub.num_rows)
                triples.append(self._count_triples(sub))
            n_docs = [batch.num_rows] + [0] * (len(paths) - 1)
        else:
            paths = [self._write(table, tag)]
            rows = [table.num_rows]
            triples = [self._count_triples(table)]
            n_docs = [batch.num_rows]
        return pa.Table.from_pydict(
            {"path": paths, "n_rows": rows, "n_triples": triples, "n_docs": n_docs},
            schema=manifest_schema,
        )


def kg_records_direct_write(
    documents_ds,
    out_dir: str,
    cfg: dict | None = None,
    kb_ref=None,
    partition_buckets: int = 0,
    **ray_opts,
):
    """documents → records parquet written BY the actors; returns the
    manifest Dataset (path, n_rows, n_triples, n_docs per row).
    ``partition_buckets > 0`` writes the checkpoint's hive layout
    (``bucket=K/`` per crc32(conv_id) bucket)."""
    merged = get_config(cfg)
    cap = merged.get("RAY_KG_CONCURRENCY", 8)
    concurrency = cap if isinstance(cap, tuple) else (1, max(1, int(cap)))
    opts = dict(
        batch_format="pyarrow",
        batch_size=merged.get("RAY_KG_BATCH_SIZE", 64),
        concurrency=concurrency,
        num_cpus=merged.get("RAY_NUM_CPUS_PER_ACTOR", 1),
    )
    opts.update(ray_opts)
    return documents_ds.map_batches(
        KGWriterActor,
        fn_constructor_kwargs={
            "cfg": cfg,
            "kb_ref": kb_ref,
            "out_dir": out_dir,
            "partition_buckets": partition_buckets,
        },
        **opts,
    )


def kg_records(documents_ds, cfg: dict | None = None, kb_ref=None, **ray_opts):
    """documents → unified KG records via the actor pool.

    ``RAY_KG_CONCURRENCY`` as an int is the pool *cap*, autoscaling
    from 1 — a pinned minimum can reserve every CPU of a small session
    and starve the upstream read/sort/assemble tasks (deadlock). Jobs
    that know their cluster (bench) pass a ``(min, max)`` tuple to pin
    the pool; an autoscaling pool ramps slowly (measured: ~8 of 30
    actors ever busy on a 1-minute job), so pinning to ~3/4 of the
    node's CPUs is the right call for throughput runs."""
    merged = get_config(cfg)
    cap = merged.get("RAY_KG_CONCURRENCY", 8)
    concurrency = cap if isinstance(cap, tuple) else (1, max(1, int(cap)))
    opts = dict(
        batch_format="pyarrow",
        batch_size=merged.get("RAY_KG_BATCH_SIZE", 64),
        concurrency=concurrency,
        num_cpus=merged.get("RAY_NUM_CPUS_PER_ACTOR", 1),
    )
    opts.update(ray_opts)
    return documents_ds.map_batches(
        KGDocumentActor,
        fn_constructor_kwargs={"cfg": cfg, "kb_ref": kb_ref},
        **opts,
    )


def split_entities(records_ds):
    import pyarrow.compute as pc

    from entity_extractor_linker_ray.schemas import ENTITY_COLUMNS

    return records_ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("record_type"), "entity")).select(ENTITY_COLUMNS),
        batch_format="pyarrow",
    )


def split_triples(records_ds):
    import pyarrow.compute as pc

    from entity_extractor_linker_ray.schemas import TRIPLE_COLUMNS

    return records_ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("record_type"), "triple")).select(TRIPLE_COLUMNS),
        batch_format="pyarrow",
    )


def split_compendium(records_ds):
    """Decode the compendium artifact rows into the COMPENDIUM_SCHEMA
    table shape (conv_id, compendium, references, n_references)."""
    import pyarrow.compute as pc

    def decode(t: pa.Table) -> pa.Table:
        from entity_extractor_linker_ray.stages.artifacts import COMPENDIUM_SCHEMA

        t = t.filter(pc.equal(t.column("record_type"), "compendium"))
        convs, comps, refs, n_refs = [], [], [], []
        for conv_id, payload in zip(
            t.column("conv_id").to_pylist(), t.column("artifact_json").to_pylist()
        ):
            obj = json.loads(payload)
            convs.append(conv_id)
            comps.append(obj["compendium"])
            refs.append(obj["references"])
            n_refs.append(len(obj["references"]))
        return pa.Table.from_arrays(
            [
                pa.array(convs, pa.string()),
                pa.array(comps, pa.string()),
                pa.array(refs, pa.list_(pa.string())),
                pa.array(n_refs, pa.int32()),
            ],
            schema=COMPENDIUM_SCHEMA,
        )

    return records_ds.map_batches(decode, batch_format="pyarrow")


def split_training(records_ds):
    """Decode the training artifact rows into the TRAINING_SCHEMA
    table shape (conv_id, ex_ord, kind, messages_json)."""
    import pyarrow.compute as pc

    def decode(t: pa.Table) -> pa.Table:
        from entity_extractor_linker_ray.stages.artifacts import TRAINING_SCHEMA

        t = t.filter(pc.equal(t.column("record_type"), "training"))
        convs, ords, kinds, payloads = [], [], [], []
        for conv_id, ordn, payload in zip(
            t.column("conv_id").to_pylist(),
            t.column("ord").to_pylist(),
            t.column("artifact_json").to_pylist(),
        ):
            obj = json.loads(payload)
            convs.append(conv_id)
            ords.append(ordn)
            kinds.append(obj["kind"])
            payloads.append(
                json.dumps({"messages": obj["messages"]}, ensure_ascii=False)
            )
        return pa.Table.from_arrays(
            [
                pa.array(convs, pa.string()),
                pa.array(ords, pa.int32()),
                pa.array(kinds, pa.string()),
                pa.array(payloads, pa.string()),
            ],
            schema=TRAINING_SCHEMA,
        )

    return records_ds.map_batches(decode, batch_format="pyarrow")
