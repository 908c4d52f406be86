"""Generate golden-parquet oracles for the stub-LLM flagship pipeline.

The flagship KG pipeline (``pipelines/kg.py`` with the deterministic
stub LLM + snapshot KB) is not SQL-expressible, so its driver gate used
to be rows-only. This tool pins its expected output by running the
REFERENCE code itself (``/root/reference`` via
``tests/reference_harness.py`` — real parsers/dedup/KGC under the same
deterministic stubs) over the transcripts derived from each testdata
``documents`` table, converting the per-conversation results into the
engine's flat output schemas, and writing them as parquet under
``golden/<sf_name>/``. ``oracle_sql()`` then reads these files from
DuckDB (dispatched on a corpus content marker), turning the seven
``kg_pipeline_*`` queries plus the generate/chunked variants into full
value-hash gates.

The conversion maps only reference-native fields (entity/type/inferred/
citations/URLs/ids and relationship rows); the single derived column,
``canonical_id``, uses the reference's own dedup key ``wikipedia_url or
name`` (``orchestrator.py:58``). ``tests/test_golden_files.py``
re-derives the sf0.001 goldens from the reference on every pytest run
and asserts byte-equality with the committed files, so the pinned
parquet cannot silently drift from the reference.

Usage: python tools/make_golden.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

GOLDEN_DIR = os.path.join(REPO, "golden")

DEFAULT_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

# Engine-default semantics keys (config.py DEFAULT_CONFIG) expressed as
# overrides on reference_config — the variant queries run the ENGINE
# defaults plus their own flags, so the reference must too.
ENGINE_DEFAULT_OVERRIDES = {
    "ENABLE_ENTITY_INFERENCE": False,
    "ENABLE_RELATIONS_INFERENCE": False,
    "ENABLE_KGC": False,
    "USE_WIKIDATA": False,
    "USE_DBPEDIA": False,
}

VARIANTS = {
    # flagship: reference_config() defaults == __ray_entry__._kg_full_outputs cfg
    "kg_pipeline": {},
    "kg_generate": {
        **ENGINE_DEFAULT_OVERRIDES,
        "MODE": "generate",
        "RELATION_EXTRACTION": True,
    },
    "kg_chunked": {
        **ENGINE_DEFAULT_OVERRIDES,
        "TEXT_CHUNKING": True,
        "TEXT_CHUNK_SIZE": 300,
        "TEXT_CHUNK_OVERLAP": 50,
        "RELATION_EXTRACTION": True,
    },
}

# artifact variant: engine defaults + the two artifact flags — must
# equal the cfg ``__ray_entry__._kg_artifacts`` hands the actor stages
ARTIFACT_OVERRIDES = {
    **ENGINE_DEFAULT_OVERRIDES,
    "RELATION_EXTRACTION": True,
    "ENABLE_COMPENDIUM": True,
    "COLLECT_TRAINING_DATA": True,
}

TRIPLE_COLS = [
    "conv_id", "ord", "subject", "predicate", "object", "inferred",
    "subject_type", "object_type", "subject_inferred", "object_inferred",
    "subject_id", "object_id",
]
ENTITY_LINK_COLS = [
    "conv_id", "ord", "entity", "type", "inferred", "citation",
    "citation_start", "citation_end", "wikipedia_url", "wikipedia_label",
    "wikidata_id", "dbpedia_uri", "canonical_id",
]


def reference_results(sf_dir: str, overrides: dict):
    from entity_extractor_linker_ray.synthetic import documents_to_transcripts_batch
    from tests import reference_harness as H

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    transcripts = documents_to_transcripts_batch(docs)
    return H.run_reference(transcripts, overrides)


# the 20 list<string> columns of the engine's 70-col entity schema
# (schemas.ENTITY_COLUMNS) — JSON-serialized on BOTH sides so the
# full-entity golden stays flat/hashable
ENTITY_LIST_COLS = [
    "wikipedia_categories", "wikipedia_see_also",
    "wikidata_types", "wikidata_part_of", "wikidata_has_parts",
    "wikidata_aliases", "wikidata_instance_of", "wikidata_subclass_of",
    "wikidata_member_of", "wikidata_citizenships",
    "dbpedia_types", "dbpedia_subjects", "dbpedia_part_of",
    "dbpedia_has_parts", "dbpedia_member_of", "dbpedia_categories",
    "dbpedia_current_member", "dbpedia_former_member",
    "dbpedia_dbp_part_of", "dbpedia_dbp_member_of",
]


def convert_entities_full(golden: dict) -> pd.DataFrame:
    """Reference packaged entities → the engine's full flat entity
    layout (all 70 columns minus the engine-only ``link_status``),
    list columns JSON-serialized.

    Field-by-field mirror of the reference packager's ``sources`` map
    (``orchestrator.py:347-445``): wikipedia base label/url/extract/
    categories, wikidata base id/label/description/types/url, dbpedia
    base resource_uri/label/abstract/types/subjects/language/part_of/
    has_parts/member_of/categories; everything else lives in the
    ADDITIONAL_DETAILS extended key lists and is empty under the
    flagship config."""

    def js(v) -> str:
        return json.dumps(list(v or []), ensure_ascii=False)

    rows: list[dict] = []
    for conv in sorted(golden):
        for ordn, e in enumerate(golden[conv]["entities"]):
            d = e["details"]
            src = e.get("sources", {})
            ws = src.get("wikipedia", {})
            wd = src.get("wikidata", {})
            db = src.get("dbpedia", {})
            coords = wd.get("coordinates") or {}
            rows.append(
                {
                    "conv_id": conv, "ord": ordn, "entity": e["entity"],
                    "type": d["typ"], "inferred": d["inferred"],
                    "citation": d["citation"],
                    "citation_start": d["citation_start"],
                    "citation_end": d["citation_end"],
                    "wikipedia_label": ws.get("label", ""),
                    "wikipedia_url": ws.get("url", ""),
                    "wikipedia_extract": ws.get("extract", "") or "",
                    "wikipedia_categories": js(ws.get("categories")),
                    "wikipedia_infobox_json": (
                        json.dumps(ws["infobox"]) if ws.get("infobox") else ""
                    ),
                    "wikipedia_see_also": js(ws.get("see_also")),
                    "wikipedia_image": ws.get("image", "") or "",
                    "wikidata_id": wd.get("id", ""),
                    "wikidata_label": wd.get("label", ""),
                    "wikidata_description": wd.get("description", ""),
                    "wikidata_types": js(wd.get("types")),
                    "wikidata_part_of": js(wd.get("part_of")),
                    "wikidata_has_parts": js(wd.get("has_parts")),
                    "wikidata_url": wd.get("url", ""),
                    "wikidata_aliases": js(wd.get("aliases")),
                    "wikidata_instance_of": js(wd.get("instance_of")),
                    "wikidata_subclass_of": js(wd.get("subclass_of")),
                    "wikidata_member_of": js(wd.get("member_of")),
                    "wikidata_citizenships": js(wd.get("citizenships")),
                    "wikidata_image_url": wd.get("image_url", "") or "",
                    "wikidata_website": wd.get("website", "") or "",
                    "wikidata_lat": (
                        float(coords["latitude"]) if "latitude" in coords else None
                    ),
                    "wikidata_lon": (
                        float(coords["longitude"]) if "longitude" in coords else None
                    ),
                    "wikidata_foundation_date": wd.get("foundation_date", "") or "",
                    "wikidata_birth_date": wd.get("birth_date", "") or "",
                    "wikidata_death_date": wd.get("death_date", "") or "",
                    "wikidata_birth_place": wd.get("birth_place", "") or "",
                    "wikidata_death_place": wd.get("death_place", "") or "",
                    "wikidata_official_name": wd.get("official_name", "") or "",
                    "wikidata_population": str(wd.get("population", "") or ""),
                    "wikidata_gnd_id": wd.get("gnd_id", "") or "",
                    "wikidata_isni": wd.get("isni", "") or "",
                    "dbpedia_uri": db.get("resource_uri", ""),
                    "dbpedia_label": db.get("label", ""),
                    "dbpedia_abstract": db.get("abstract", ""),
                    "dbpedia_types": js(db.get("types")),
                    "dbpedia_subjects": js(db.get("subjects")),
                    "dbpedia_language": db.get("language", "") or "",
                    "dbpedia_part_of": js(db.get("part_of")),
                    "dbpedia_has_parts": js(db.get("has_parts")),
                    "dbpedia_member_of": js(db.get("member_of")),
                    "dbpedia_categories": js(db.get("categories")),
                    "dbpedia_comment": db.get("comment", "") or "",
                    "dbpedia_homepage": db.get("homepage", "") or "",
                    "dbpedia_thumbnail": db.get("thumbnail", "") or "",
                    "dbpedia_depiction": db.get("depiction", "") or "",
                    "dbpedia_birth_date": db.get("birth_date", "") or "",
                    "dbpedia_death_date": db.get("death_date", "") or "",
                    "dbpedia_birth_place": db.get("birth_place", "") or "",
                    "dbpedia_death_place": db.get("death_place", "") or "",
                    "dbpedia_population": str(db.get("population", "") or ""),
                    "dbpedia_area": str(db.get("area", "") or ""),
                    "dbpedia_country": db.get("country", "") or "",
                    "dbpedia_region": db.get("region", "") or "",
                    "dbpedia_founder": db.get("founder", "") or "",
                    "dbpedia_parent_company": db.get("parent_company", "") or "",
                    "dbpedia_current_member": js(db.get("current_member")),
                    "dbpedia_former_member": js(db.get("former_member")),
                    "dbpedia_dbp_part_of": js(db.get("dbp_part_of")),
                    "dbpedia_dbp_member_of": js(db.get("dbp_member_of")),
                    "canonical_id": ws.get("url") or e["entity"] or "",
                }
            )
    df = pd.DataFrame(rows)
    for c in ("ord", "citation_start", "citation_end"):
        df[c] = df[c].astype("int32")
    for c in ("wikidata_lat", "wikidata_lon"):
        df[c] = df[c].astype("float64")
    return df


def reference_artifacts(sf_dir: str) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Run the reference with compendium + training sinks enabled and
    capture (compendium_flat, compendium_refs, training_labels) frames.

    The reference APPENDS training examples to JSONL files
    (``services/openai_service.py:171-206``), so each conversation gets
    fresh temp paths that are read back and ordered entity-then-relation
    — the append order of the reference's single extract + explicit
    relation calls under the artifact flags."""
    import tempfile

    from entity_extractor_linker_ray.state.kb import KBSnapshot
    from entity_extractor_linker_ray.state.llm import StubLLMClient
    from entity_extractor_linker_ray.synthetic import documents_to_transcripts_batch
    from tests import reference_harness as H

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    transcripts = documents_to_transcripts_batch(docs)
    stub = StubLLMClient(KBSnapshot())
    orch = H.install_reference(stub)
    cfg = H.reference_config(ARTIFACT_OVERRIDES)
    docs_map = H.assemble_docs_python(transcripts)

    comp_rows: list[dict] = []
    ref_rows: list[dict] = []
    lab_rows: list[dict] = []
    tmpdir = tempfile.mkdtemp(prefix="golden_train_")
    for conv in sorted(docs_map):
        ent_path = os.path.join(tmpdir, f"{conv}_ent.jsonl")
        rel_path = os.path.join(tmpdir, f"{conv}_rel.jsonl")
        c = dict(
            cfg,
            OPENAI_TRAINING_DATA_PATH=ent_path,
            OPENAI_RELATIONSHIP_TRAINING_DATA_PATH=rel_path,
            TRAINING_DATA_PATH=os.path.join(tmpdir, f"{conv}_legacy.jsonl"),
        )
        result = orch.process_entities(docs_map[conv], c)
        comp = result.get("compendium", {})
        refs = [r["url"] for r in comp.get("references", [])]
        comp_rows.append(
            {
                "conv_id": conv,
                "compendium": comp.get("text", ""),
                "n_references": len(refs),
            }
        )
        for i, url in enumerate(refs):
            ref_rows.append({"conv_id": conv, "ref_ord": i + 1, "ref_url": url})
        ex_ord = 0
        for path, kind in (
            (ent_path, "entity_extraction"),
            (rel_path, "relationship_extraction"),
        ):
            if not os.path.exists(path):
                continue
            with open(path, encoding="utf-8") as fh:
                for line in fh:
                    ex = json.loads(line)
                    lab_rows.append(
                        {
                            "conv_id": conv,
                            "ex_ord": ex_ord,
                            "kind": kind,
                            "label": ex["messages"][-1]["content"],
                        }
                    )
                    ex_ord += 1
    comp_df = pd.DataFrame(comp_rows, columns=["conv_id", "compendium", "n_references"])
    comp_df["n_references"] = comp_df["n_references"].astype("int32")
    refs_df = pd.DataFrame(ref_rows, columns=["conv_id", "ref_ord", "ref_url"])
    refs_df["ref_ord"] = refs_df["ref_ord"].astype("int32")
    labs_df = pd.DataFrame(lab_rows, columns=["conv_id", "ex_ord", "kind", "label"])
    labs_df["ex_ord"] = labs_df["ex_ord"].astype("int32")
    return comp_df, refs_df, labs_df


def convert(golden: dict) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Per-conv reference results → (triples, entity_links) frames in
    the engine's column layout. Deterministic row order (conv, ord)."""
    tri_rows: list[dict] = []
    ent_rows: list[dict] = []
    for conv in sorted(golden):
        result = golden[conv]
        canonical: dict[str, str] = {}
        for ordn, e in enumerate(result["entities"]):
            src = e.get("sources", {})
            wp = src.get("wikipedia", {})
            cid = wp.get("url") or e["entity"] or ""
            canonical.setdefault(e["entity"], cid)
            d = e["details"]
            ent_rows.append(
                {
                    "conv_id": conv, "ord": ordn, "entity": e["entity"],
                    "type": d["typ"], "inferred": d["inferred"],
                    "citation": d["citation"],
                    "citation_start": d["citation_start"],
                    "citation_end": d["citation_end"],
                    "wikipedia_url": wp.get("url", ""),
                    "wikipedia_label": wp.get("label", ""),
                    "wikidata_id": src.get("wikidata", {}).get("id", ""),
                    "dbpedia_uri": src.get("dbpedia", {}).get("resource_uri", ""),
                    "canonical_id": cid,
                }
            )
        for ordn, r in enumerate(result["relationships"]):
            tri_rows.append(
                {
                    "conv_id": conv, "ord": ordn,
                    "subject": r["subject"], "predicate": r["predicate"],
                    "object": r["object"], "inferred": r.get("inferred", ""),
                    "subject_type": r.get("subject_type", ""),
                    "object_type": r.get("object_type", ""),
                    "subject_inferred": r.get("subject_inferred", ""),
                    "object_inferred": r.get("object_inferred", ""),
                    "subject_id": canonical.get(r["subject"], r["subject"]),
                    "object_id": canonical.get(r["object"], r["object"]),
                }
            )
    tri = pd.DataFrame(tri_rows, columns=TRIPLE_COLS)
    ent = pd.DataFrame(ent_rows, columns=ENTITY_LINK_COLS)
    return tri, ent


def corpus_marker(sf_dir: str) -> int:
    """Content marker used by the oracle SQL to pick the right golden:
    exact sum of the documents table's n_chars column."""
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["n_chars"])
    return int(pd.Series(t.column("n_chars").to_pylist()).sum())


def write_frame(df: pd.DataFrame, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # fixed column order + deterministic rows → stable bytes for git
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def build_sf(sf_dir: str) -> dict:
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(GOLDEN_DIR, sf_name)
    files: dict[str, str] = {}

    t0 = time.time()
    flagship = reference_results(sf_dir, VARIANTS["kg_pipeline"])
    tri, ent = convert(flagship)
    write_frame(tri, os.path.join(out_dir, "kg_pipeline_triples.parquet"))
    write_frame(ent, os.path.join(out_dir, "kg_pipeline_entity_links.parquet"))
    files["kg_pipeline_triples"] = f"{sf_name}/kg_pipeline_triples.parquet"
    files["kg_pipeline_entity_links"] = f"{sf_name}/kg_pipeline_entity_links.parquet"
    full = convert_entities_full(flagship)
    write_frame(full, os.path.join(out_dir, "kg_pipeline_entities_full.parquet"))
    files["kg_pipeline_entities_full"] = f"{sf_name}/kg_pipeline_entities_full.parquet"
    print(f"  flagship: {len(tri)} triples / {len(ent)} entities "
          f"/ {full.shape[1]}-col full ({time.time() - t0:.1f}s)")

    for variant in ("kg_generate", "kg_chunked"):
        t0 = time.time()
        res = reference_results(sf_dir, VARIANTS[variant])
        vtri, _ = convert(res)
        name = f"{variant}_triples"
        write_frame(vtri, os.path.join(out_dir, f"{name}.parquet"))
        files[name] = f"{sf_name}/{name}.parquet"
        print(f"  {variant}: {len(vtri)} triples ({time.time() - t0:.1f}s)")

    t0 = time.time()
    comp_df, refs_df, labs_df = reference_artifacts(sf_dir)
    for name, df in (
        ("kg_compendium_flat", comp_df),
        ("kg_compendium_refs", refs_df),
        ("kg_training_labels", labs_df),
    ):
        write_frame(df, os.path.join(out_dir, f"{name}.parquet"))
        files[name] = f"{sf_name}/{name}.parquet"
    print(f"  artifacts: {len(comp_df)} compendia / {len(refs_df)} refs / "
          f"{len(labs_df)} labels ({time.time() - t0:.1f}s)")

    return {"marker": corpus_marker(sf_dir), "files": files}


def main() -> int:
    sfs = sys.argv[1:] or DEFAULT_SFS
    manifest_path = os.path.join(GOLDEN_DIR, "manifest.json")
    manifest = {"dirs": {}}
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            manifest = json.load(fh)
    for sf_dir in sfs:
        sf_name = os.path.basename(os.path.normpath(sf_dir))
        print(f"golden for {sf_name} ...")
        manifest["dirs"][sf_name] = build_sf(sf_dir)
    with open(manifest_path, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    print(f"wrote {manifest_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
