"""End-to-end golden test: Ray pipeline vs the reference code run with
identical deterministic stubs (BASELINE.json north rule: triple P/R >=
0.95; entity keys exact; per-turn text equality under stable ordering).
"""

from __future__ import annotations

import pytest

from tests import reference_harness as H


@pytest.fixture(scope="module")
def golden(tiny_transcripts):
    return H.run_reference(tiny_transcripts)


@pytest.fixture(scope="module")
def engine_out(ray_session, tiny_transcripts):
    import ray.data as rd

    from entity_extractor_linker_ray.pipelines.kg import build_kg_datasets

    out = build_kg_datasets(
        rd.from_arrow(tiny_transcripts), H.engine_config({"RAY_KG_CONCURRENCY": 2})
    )
    return {
        "entities": out["entities"].to_pandas(),
        "triples": out["triples"].to_pandas(),
        "documents": out["documents"].to_pandas(),
    }


def test_document_assembly_matches_reference(engine_out, tiny_transcripts):
    """Per-turn text equality under stable turn ordering: the Ray
    groupby+sort assembly must reproduce the plain-Python sort+join."""
    expected = H.assemble_docs_python(tiny_transcripts)
    got = dict(zip(engine_out["documents"].conv_id, engine_out["documents"].doc_text))
    assert got == expected


def test_triple_precision_recall(golden, engine_out):
    triples = engine_out["triples"]
    total_tp = total_pred = total_gold = 0
    per_conv = {}
    for conv, result in golden.items():
        gold = H.triple_set(result["relationships"])
        pred = H.triple_set(
            triples[triples.conv_id == conv][["subject", "predicate", "object"]]
            .to_dict("records")
        )
        p, r = H.precision_recall(pred, gold)
        per_conv[conv] = (p, r, len(pred), len(gold))
        total_tp += len(pred & gold)
        total_pred += len(pred)
        total_gold += len(gold)
    micro_p = total_tp / total_pred if total_pred else 1.0
    micro_r = total_tp / total_gold if total_gold else 1.0
    assert total_gold > 0, "golden corpus produced no triples — fixture too weak"
    bad = {c: v for c, v in per_conv.items() if v[0] < 1.0 or v[1] < 1.0}
    assert micro_p >= 0.95 and micro_r >= 0.95, (micro_p, micro_r, bad)


def test_triple_flags_match(golden, engine_out):
    """Beyond (s,p,o): inferred + endpoint types/flags must agree."""
    triples = engine_out["triples"]
    for conv, result in golden.items():
        gold = {
            (
                r["subject"], r["predicate"], r["object"], r.get("inferred"),
                r.get("subject_type"), r.get("object_type"),
                r.get("subject_inferred"), r.get("object_inferred"),
            )
            for r in result["relationships"]
        }
        sub = triples[triples.conv_id == conv]
        pred = {
            tuple(row)
            for row in sub[
                [
                    "subject", "predicate", "object", "inferred",
                    "subject_type", "object_type",
                    "subject_inferred", "object_inferred",
                ]
            ].itertuples(index=False, name=None)
        }
        assert pred == gold, conv


def test_entity_parity(golden, engine_out):
    """Entity rows: name/type/inferred/citation offsets/KB links equal
    the reference's packaged output (orchestrator.py:347-445)."""
    entities = engine_out["entities"]
    for conv, result in golden.items():
        gold = set()
        for e in result["entities"]:
            src = e.get("sources", {})
            gold.add(
                (
                    e["entity"],
                    e["details"]["typ"],
                    e["details"]["inferred"],
                    e["details"]["citation_start"],
                    e["details"]["citation_end"],
                    src.get("wikipedia", {}).get("url", ""),
                    src.get("wikipedia", {}).get("label", ""),
                    src.get("wikidata", {}).get("id", ""),
                    src.get("dbpedia", {}).get("resource_uri", ""),
                )
            )
        sub = entities[entities.conv_id == conv]
        got = {
            tuple(row)
            for row in sub[
                [
                    "entity", "type", "inferred",
                    "citation_start", "citation_end",
                    "wikipedia_url", "wikipedia_label",
                    "wikidata_id", "dbpedia_uri",
                ]
            ].itertuples(index=False, name=None)
        }
        assert got == gold, conv


@pytest.fixture(scope="module")
def golden_details(tiny_transcripts):
    return H.run_reference(tiny_transcripts, {"ADDITIONAL_DETAILS": True})


@pytest.fixture(scope="module")
def engine_details(ray_session, tiny_transcripts):
    import ray.data as rd

    from entity_extractor_linker_ray.pipelines.kg import build_kg_datasets

    out = build_kg_datasets(
        rd.from_arrow(tiny_transcripts),
        H.engine_config({"RAY_KG_CONCURRENCY": 2, "ADDITIONAL_DETAILS": True}),
    )
    return out["entities"].to_pandas()


def test_additional_details_parity(golden_details, engine_details):
    """With ADDITIONAL_DETAILS on, every extended Wikipedia
    (infobox/see-also/image) and Wikidata (claims P18/P856/P625/P571/
    P569/P570/P27/P19/P20/P1448/P1082/P463/P227/P213, aliases,
    instance_of, subclass_of) column equals the value the REFERENCE
    packs into sources.wikipedia / sources.wikidata
    (orchestrator.py:371-395)."""
    import json

    import pandas as pd

    checked = 0
    for conv, result in golden_details.items():
        sub = engine_details[engine_details.conv_id == conv]
        by_key = {(r.entity, r.type, r.inferred): r for r in sub.itertuples()}
        for e in result["entities"]:
            key = (e["entity"], e["details"]["typ"], e["details"]["inferred"])
            assert key in by_key, (conv, key)
            row = by_key[key]
            src = e.get("sources", {})
            ws, wd = src.get("wikipedia", {}), src.get("wikidata", {})
            assert row.wikipedia_image == ws.get("image", "")
            assert list(row.wikipedia_see_also) == list(ws.get("see_also", []))
            got_infobox = (
                json.loads(row.wikipedia_infobox_json)
                if row.wikipedia_infobox_json else {}
            )
            assert got_infobox == ws.get("infobox", {})
            assert list(row.wikidata_aliases) == list(wd.get("aliases", []))
            assert list(row.wikidata_instance_of) == list(wd.get("instance_of", []))
            assert list(row.wikidata_subclass_of) == list(wd.get("subclass_of", []))
            assert list(row.wikidata_member_of) == list(wd.get("member_of", []))
            assert list(row.wikidata_citizenships) == list(wd.get("citizenships", []))
            assert row.wikidata_image_url == wd.get("image_url", "")
            assert row.wikidata_website == wd.get("website", "")
            coords = wd.get("coordinates", {})
            if coords:
                assert row.wikidata_lat == coords["latitude"]
                assert row.wikidata_lon == coords["longitude"]
            else:
                assert pd.isna(row.wikidata_lat) and pd.isna(row.wikidata_lon)
            for col, wd_key in [
                ("wikidata_foundation_date", "foundation_date"),
                ("wikidata_birth_date", "birth_date"),
                ("wikidata_death_date", "death_date"),
                ("wikidata_birth_place", "birth_place"),
                ("wikidata_death_place", "death_place"),
                ("wikidata_official_name", "official_name"),
                ("wikidata_population", "population"),
                ("wikidata_gnd_id", "gnd_id"),
                ("wikidata_isni", "isni"),
            ]:
                assert getattr(row, col) == wd.get(wd_key, ""), (key, col)
            dbp = src.get("dbpedia", {})
            for col, db_key in [
                ("dbpedia_part_of", "part_of"),
                ("dbpedia_has_parts", "has_parts"),
                ("dbpedia_member_of", "member_of"),
                ("dbpedia_categories", "categories"),
                ("dbpedia_current_member", "current_member"),
                ("dbpedia_former_member", "former_member"),
                ("dbpedia_dbp_part_of", "dbp_part_of"),
                ("dbpedia_dbp_member_of", "dbp_member_of"),
            ]:
                assert list(getattr(row, col)) == list(dbp.get(db_key, [])), (key, col)
            for col, db_key in [
                ("dbpedia_comment", "comment"),
                ("dbpedia_homepage", "homepage"),
                ("dbpedia_thumbnail", "thumbnail"),
                ("dbpedia_depiction", "depiction"),
                ("dbpedia_birth_date", "birth_date"),
                ("dbpedia_death_date", "death_date"),
                ("dbpedia_birth_place", "birth_place"),
                ("dbpedia_death_place", "death_place"),
                ("dbpedia_population", "population"),
                ("dbpedia_area", "area"),
                ("dbpedia_country", "country"),
                ("dbpedia_region", "region"),
                ("dbpedia_founder", "founder"),
                ("dbpedia_parent_company", "parent_company"),
            ]:
                assert getattr(row, col) == str(dbp.get(db_key, "")), (key, col)
            checked += 1
    assert checked > 0


def test_wikidata_details_cover_reference_claims(golden_details):
    """The golden corpus must actually exercise the extended claim
    decodes — at least one entity with each non-empty detail family."""
    seen: set[str] = set()
    for result in golden_details.values():
        for e in result["entities"]:
            wd = e.get("sources", {}).get("wikidata", {})
            seen.update(k for k, v in wd.items() if v)
            ws = e.get("sources", {}).get("wikipedia", {})
            seen.update(f"wp_{k}" for k, v in ws.items() if v)
            dbp = e.get("sources", {}).get("dbpedia", {})
            seen.update(f"db_{k}" for k, v in dbp.items() if v)
    for required in [
        "image_url", "website", "coordinates", "foundation_date",
        "official_name", "member_of", "gnd_id", "aliases", "instance_of",
        "subclass_of", "wp_infobox", "wp_see_also", "wp_image",
        "db_comment", "db_homepage", "db_thumbnail", "db_depiction",
        "db_categories", "db_part_of", "db_has_parts", "db_founder",
        "db_region", "db_area", "db_dbp_part_of",
    ]:
        assert required in seen, required


def test_entity_order_preserved(golden, engine_out):
    """The engine's per-conversation `ord` column reproduces the
    reference's entity emission order (first-wins semantics depend on
    it)."""
    entities = engine_out["entities"]
    for conv, result in golden.items():
        gold_order = [e["entity"] for e in result["entities"]]
        sub = entities[entities.conv_id == conv].sort_values("ord")
        assert list(sub.entity) == gold_order, conv
