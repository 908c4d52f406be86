"""Per-document KG construction: extract → infer → link → relate →
dedup → package → KGC, for ONE document (= one assembled conversation).

This is the Ray-free core: a pure function of (document text, config,
LLM client, KB snapshot) reproducing the reference orchestrator's
per-document semantics (``core/orchestrator.py:26-597``) including its
order-sensitive dedup rules, so that distributed execution only has to
guarantee per-conversation ordering to match the reference exactly.
The Ray Data stage (``stages/kg_stage.py``) maps this over batches of
conversations inside an actor pool.

Everything cross-document (corpus dedup, graph materialize, stats,
checkpointing) lives in the Ray pipeline, not here.
"""

from __future__ import annotations

import json

from entity_extractor_linker_ray.functions import prompts
from entity_extractor_linker_ray.functions.dedup import (
    dedup_entities_first_wins,
    dedup_triples_explicit_wins,
    entity_dedup_key,
    fuzzy_dedup_triples,
    triple_key,
)
from entity_extractor_linker_ray.functions.parsing import (
    parse_entity_lines,
    parse_triples,
)
from entity_extractor_linker_ray.functions.text import (
    chunk_text,
    clean_llm_json,
    strip_trailing_ellipsis,
)
from entity_extractor_linker_ray.functions.urls import is_valid_wikipedia_url, parse_wiki_url


# ----------------------------------------------------------------------
# extraction + inference
# ----------------------------------------------------------------------

def extract_entities(text: str, cfg: dict, llm) -> list[dict]:
    """LLM extraction call + semicolon-line parse
    (``services/openai_service.py:24-131``). In generate mode entities
    are marked implicit (``openai_service.py:115``)."""
    mode = cfg.get("MODE", "extract")
    if mode == "generate":
        # generate mode prompts for a TOPIC, not text spans
        # (``core/generator.py:78-190``): its own prompt family, citation
        # pinned to "generated", entities marked implicit
        raw = llm.chat(
            prompts.generation_messages(
                text, cfg.get("MAX_ENTITIES", 15), cfg.get("LANGUAGE", "en"),
                educational=bool(cfg.get("COMPENDIUM_EDUCATIONAL_MODE", False)),
            )
        )
        return parse_entity_lines(raw, inferred="implicit")
    raw = llm.chat(
        prompts.extraction_messages(
            text, cfg.get("MAX_ENTITIES", 15), cfg.get("LANGUAGE", "en"),
            educational=bool(cfg.get("COMPENDIUM_EDUCATIONAL_MODE", False)),
        )
    )
    return parse_entity_lines(raw, inferred="explicit")


def infer_entities(text: str, entities: list[dict], cfg: dict, llm) -> list[dict]:
    """Optional implicit-entity round; merge keyed ``(name, type)`` with
    explicit overwriting implicit (``core/entity_inference.py:27-133``).

    Two reference quirks reproduced deliberately:

    * the merged dict is seeded from the *implicit* list, then explicit
      entries overwrite (``entity_inference.py:130-133``) — output
      order is implicit-first;
    * the explicit remapping (``entity_inference.py:44-51``) keeps only
      ``name/type/wikipedia_url/inferred`` — the extractor's citation is
      DROPPED (even when inference is disabled, since ``extractor.py:39``
      always routes through this function), so packaged explicit
      entities fall back to the whole-input citation
      (``orchestrator.py:350-352``).
    """
    explicit = [
        {
            "name": e.get("name", ""),
            "type": e.get("type", ""),
            "wikipedia_url": e.get("wikipedia_url", ""),
            "inferred": e.get("inferred", "explicit"),
        }
        for e in entities
    ]
    if not cfg.get("ENABLE_ENTITY_INFERENCE", False):
        return explicit
    raw = llm.chat(
        prompts.entity_inference_messages(
            text,
            explicit,
            cfg.get("MAX_ENTITIES", len(explicit) or 15),
            cfg.get("LANGUAGE", "en"),
            educational=bool(cfg.get("COMPENDIUM_EDUCATIONAL_MODE", False)),
        )
    )
    implicit = [
        {**e, "inferred": "implicit"} for e in parse_entity_lines(raw, inferred="implicit")
    ]
    merged = {(e["name"], e["type"]): e for e in implicit}
    for e in explicit:
        merged[(e["name"], e["type"])] = e
    return list(merged.values())


# ----------------------------------------------------------------------
# linking (KB fallback chain)
# ----------------------------------------------------------------------

def _llm_translate(entity_name: str, llm) -> str | None:
    """A8: translate-to-English LLM call (``wikidata_service.py:81-132``)."""
    out = (llm.chat(prompts.translate_messages(entity_name)) or "").strip()
    return out.strip('"').strip("'").strip() or None


def _llm_synonyms(entity_name: str, language: str, llm) -> list[str]:
    """A9: 3-synonym LLM call (``wikidata_service.py:134-196``)."""
    raw = clean_llm_json(llm.chat(prompts.synonym_messages(entity_name, language)))
    try:
        parsed = json.loads(raw)
    except ValueError:
        return []
    return [s for s in parsed if isinstance(s, str)] if isinstance(parsed, list) else []


def _search_with_translate(name: str, language: str, cfg: dict, llm, kb) -> str | None:
    """``search_wikidata_by_entity_name`` topology
    (``wikidata_service.py:20-79``): direct search; on a non-English
    miss, translate the term and retry once in English
    (``try_english=False`` on the retry — no recursion)."""
    qid = kb.search_wikidata(name, language)
    if qid:
        return qid
    if language != "en" and llm is not None:
        english = _llm_translate(name, llm)
        if english and english != name:
            return kb.search_wikidata(english, "en")
    return None


def resolve_wikidata_id(url: str, entity_name: str, cfg: dict, kb, llm=None):
    """The reference's full Wikidata-ID fallback chain
    (``wikidata_service.py:198-302``), returned as ``(qid, step)``:

    1. ``pageprops`` — title → QID lookup on the URL;
    2. ``search`` — name search (with A8 translate-retry inside for
       non-English, ``:69-75``);
    3. ``synonym`` — up to 3 LLM-generated alternative names, each
       searched in turn (``:279-289``);
    4. ``translate`` — German-term final fallback: translate then
       search English (``:291-299``).

    Steps 3-4 need an LLM; with ``llm=None`` the chain stops after 2
    (the conservative degradation for LLM-less callers).
    """
    qid = kb.get_wikidata_id(url, entity_name)
    if qid:
        return qid, "pageprops"
    if not entity_name:
        return None, "miss"
    language = "en" if "en.wikipedia.org" in (url or "") else "de"
    qid = _search_with_translate(entity_name, language, cfg, llm, kb)
    if qid:
        return qid, "search"
    if llm is not None:
        for synonym in _llm_synonyms(entity_name, language, llm)[:3]:
            qid = kb.search_wikidata(synonym, language)
            if qid:
                return qid, "synonym"
        if language == "de":
            english = _llm_translate(entity_name, llm)
            if english:
                qid = kb.search_wikidata(english, "en")
                if qid:
                    return qid, "translate"
    return None, "miss"


def link_entity(entity: dict, cfg: dict, kb, llm=None) -> dict | None:
    """Multi-stage KB resolution for one entity, reproducing the
    fallback chain of ``core/linker.py:56-227``:

    1. valid LLM URL used as-is, else opensearch fallback;
    2. extract fetch; on miss: redirect-follow → re-fetch → opensearch
       retry → re-fetch;
    3. categories only when an extract was found;
    4. Wikidata id (from extract fetch or pageprops fallback) + details;
    5. DBpedia record, else constructed resource-URI fallback.

    Adds a ``link_status`` column naming the step that resolved (an
    upgrade over the reference's silent empty returns, SURVEY.md §4).
    """
    name = entity.get("name", "")
    if not name:
        return None
    lang = cfg.get("LANGUAGE", "en")
    out = dict(entity)
    out["link_status"] = "unlinked"
    llm_url = entity.get("wikipedia_url") or ""
    if llm_url and is_valid_wikipedia_url(llm_url):
        url = llm_url
        out["link_status"] = "llm_url"
    else:
        url = kb.opensearch(name, lang)
        out["link_status"] = "opensearch" if url else "unlinked"
    if not url:
        return out
    out["wikipedia_url"] = url
    entity_name = name
    extract, qid = kb.get_extract(url)
    if extract:
        out["wikipedia_extract"] = strip_trailing_ellipsis(extract)
        if qid:
            out["wikidata_id"] = qid
            out["wikipedia_title"] = entity_name  # linker.py:86-88
    else:
        final_url, page_title = kb.follow_redirect(url, entity_name)
        if final_url and final_url != url:
            out["wikipedia_url"] = final_url
            url = final_url
            out["link_status"] = "redirect"
        if page_title:
            out["wikipedia_title"] = page_title
            entity_name = page_title
        extract, qid = kb.get_extract(url)
        if not extract:
            fb_url = kb.opensearch(entity_name, lang)
            if fb_url and fb_url != url:
                out["wikipedia_url"] = fb_url
                url = fb_url
                out["link_status"] = "opensearch_retry"
                try:
                    fb_title = parse_wiki_url(fb_url)[0]
                    out["wikipedia_title"] = fb_title
                    entity_name = fb_title
                except Exception:
                    pass
                extract, qid = kb.get_extract(url)
        if extract:
            out["wikipedia_extract"] = strip_trailing_ellipsis(extract)
            if qid:
                out["wikidata_id"] = qid
    if out.get("wikipedia_extract"):
        cats = kb.get_categories(out["wikipedia_url"])
        if cats:
            out["wikipedia_categories"] = cats
    if cfg.get("ADDITIONAL_DETAILS", False) and out.get("wikipedia_extract"):
        # infobox / see-also / image, only when an extract was found
        # (``linker.py:130-134``)
        wiki_details = kb.get_wikipedia_details(out["wikipedia_url"])
        if wiki_details:
            out["wikipedia_details"] = wiki_details
    if cfg.get("USE_WIKIDATA", True):
        qid = out.get("wikidata_id")
        if not qid:
            # full fallback topology: pageprops → search(+translate) →
            # synonyms → de→en translate (resolve_wikidata_id)
            qid, _wd_step = resolve_wikidata_id(
                out["wikipedia_url"], entity_name, cfg, kb, llm
            )
        if qid:
            out["wikidata_id"] = qid
            details = kb.get_wikidata_details(qid, lang)
            if details:
                out["wikidata_url"] = f"https://www.wikidata.org/wiki/{qid}"
                out["wikidata_details"] = details
    if cfg.get("USE_DBPEDIA", False):
        info = kb.get_dbpedia(out["wikipedia_url"])
        if info:
            out["dbpedia_info"] = info
        else:
            title = out["wikipedia_url"].rsplit("/", 1)[-1]
            prefix, dlang = (
                ("http://de.dbpedia.org/resource/", "de")
                if cfg.get("DBPEDIA_USE_DE", False)
                else ("http://dbpedia.org/resource/", "en")
            )
            out["dbpedia_info"] = {"resource_uri": prefix + title, "language": dlang}
    return out


def link_entities(entities: list[dict], cfg: dict, kb, llm=None) -> list[dict]:
    return [
        le for le in (link_entity(e, cfg, kb, llm) for e in entities) if le is not None
    ]


def extract_and_link(text: str, cfg: dict, llm, kb, trace: dict | None = None) -> list[dict]:
    """``extract_api.extract_and_link`` equivalent: extract →
    (optional) infer → link (``core/extract_api.py:12-28``,
    ``core/extractor.py:36-39``).

    When ``trace`` is given, the RAW extraction entities (the parsed LLM
    lines, pre-inference and pre-linking — exactly what the reference's
    training sink records, ``services/openai_service.py:125-127``) are
    appended under ``trace["extractions"]``."""
    ents = extract_entities(text, cfg, llm)
    if trace is not None:
        trace.setdefault("extractions", []).append(
            {"text": text, "entities": [dict(e) for e in ents]}
        )
    ents = infer_entities(text, ents, cfg, llm)
    return link_entities(ents, cfg, kb, llm)


# ----------------------------------------------------------------------
# relations
# ----------------------------------------------------------------------

def _entity_info(entities: list[dict]) -> list[dict]:
    """(name, type) pairs for the relation prompts; Wikipedia label
    overrides the name when present in packaged ``sources``
    (``relationship_inference.py:98-133``); internal dicts simply use
    name/type. Entities missing either field are skipped."""
    info = []
    for e in entities:
        name = e.get("entity") or e.get("name", "")
        typ = e.get("type") or (e.get("details", {}) or {}).get("typ", "")
        if isinstance(e.get("sources"), dict):
            label = (e["sources"].get("wikipedia") or {}).get("label")
            if label:
                name = label
        if name and typ:
            info.append({"name": name, "type": typ})
    return info


def _annotate(rel: dict, inferred: str, type_map: dict, inferred_map: dict) -> dict:
    """Stamp inferred/type/entity-inferred fields
    (``relationship_inference.py:243-253``)."""
    rel["inferred"] = inferred
    rel["subject_type"] = type_map.get(rel["subject"], "")
    rel["object_type"] = type_map.get(rel["object"], "")
    rel["subject_inferred"] = inferred_map.get(rel["subject"], "explicit")
    rel["object_inferred"] = inferred_map.get(rel["object"], "explicit")
    return rel


def _case_normalize(rels: list[dict], type_map: dict) -> None:
    """Match LLM casing back to extracted names
    (``relationship_inference.py:233-241``)."""
    lower_to_name = {n.lower(): n for n in type_map}
    for rel in rels:
        for slot in ("subject", "object"):
            canon = lower_to_name.get(rel.get(slot, "").lower())
            if canon:
                rel[slot] = canon


def llm_pair_dedup(rels: list[dict], cfg: dict, llm, directed: bool) -> list[dict]:
    """LLM-assisted predicate dedup per entity pair.

    ``directed=True`` reproduces the inline variant keyed on the
    ordered ``(subject, object)`` tuple
    (``relationship_inference.py:311-362``); ``directed=False`` the
    ``frozenset`` variant (``core/deduplication_utils.py:12-87``).
    Groups of one pass through; on any client error the group is kept
    unchanged (``deduplication_utils.py:83-85``).
    """
    groups: dict[tuple, list[dict]] = {}
    for rel in rels:
        if directed:
            key = (rel["subject"], rel["object"])
        else:
            s, o = rel["subject"], rel["object"]
            key = (s, o) if s <= o else (o, s)
        groups.setdefault(key, []).append(rel)
    out: list[dict] = []
    for (subj, obj), group in groups.items():
        if len(group) == 1:
            out.append(group[0])
            continue
        candidates = [
            {"predicate": r["predicate"], "inferred": r.get("inferred", "explicit")}
            for r in group
        ]
        try:
            raw = llm.chat(prompts.dedup_messages(subj, obj, candidates, cfg.get("LANGUAGE", "en")))
            cleaned = parse_triples(raw)
        except Exception:
            out.extend(group)
            continue
        for c in cleaned:
            match = next(
                (
                    r
                    for r in group
                    if r["predicate"] == c.get("predicate")
                    and r.get("inferred", "explicit") == c.get("inferred", "explicit")
                ),
                None,
            )
            out.append(match if match is not None else {"subject": subj, "object": obj, **c})
    return out


def infer_relationships(
    text: str, entities: list[dict], cfg: dict, llm, trace: dict | None = None
) -> list[dict]:
    """Explicit (+ optional implicit) relation extraction for one
    document (``relationship_inference.py:46-375`` non-KGC path).

    When ``trace`` is given, the validated explicit (and, under
    ``ENABLE_RELATIONS_INFERENCE``, implicit) relation lists are
    appended under ``trace["relations"]`` — the exact pre-dedup lists
    the reference's training sink records
    (``relationship_inference.py:260,367-370``)."""
    if not cfg.get("RELATION_EXTRACTION", False):
        return []
    info = _entity_info(entities)
    type_map = {e["name"]: e["type"] for e in info}
    inferred_map = {
        (e.get("entity") or e.get("name", "")): e.get("inferred", "explizit")
        for e in entities
    }
    mode = cfg.get("MODE", "extract")
    max_rel = cfg.get("MAX_RELATIONS", 15)
    lang = cfg.get("LANGUAGE", "en")
    raw = llm.chat(prompts.explicit_relation_messages(text, info, max_rel, mode, lang))
    explicit = parse_triples(raw)
    _case_normalize(explicit, type_map)
    first_flag = "implicit" if mode == "generate" else "explicit"
    valid_explicit = [
        _annotate(r, first_flag, type_map, inferred_map)
        for r in explicit
        if all(k in r for k in ("subject", "predicate", "object"))
    ]
    valid_explicit = [r for r in valid_explicit if r["subject_type"] and r["object_type"]]
    if trace is not None:
        trace.setdefault("relations", []).append(
            {"text": text, "entities": info, "rels": [dict(r) for r in valid_explicit],
             "kind": "explicit"}
        )
    if not cfg.get("ENABLE_RELATIONS_INFERENCE", False):
        return valid_explicit
    raw_imp = llm.chat(
        prompts.implicit_relation_messages(text, info, valid_explicit, max_rel, lang)
    )
    implicit = parse_triples(raw_imp)
    valid_implicit = [
        _annotate(r, "implicit", type_map, inferred_map)
        for r in implicit
        if all(k in r for k in ("subject", "predicate", "object"))
    ]
    valid_implicit = [r for r in valid_implicit if r["subject_type"] and r["object_type"]]
    if trace is not None:
        trace.setdefault("relations", []).append(
            {"text": text, "entities": info, "rels": [dict(r) for r in valid_implicit],
             "kind": "implicit", "explicit_rels": [dict(r) for r in valid_explicit]}
        )
    merged: dict[tuple, dict] = {triple_key(r): r for r in valid_explicit}
    for rel in valid_implicit:
        merged.setdefault(triple_key(rel), rel)
    return llm_pair_dedup(list(merged.values()), cfg, llm, directed=True)


def kgc_round(text: str, entities: list[dict], existing: list[dict], cfg: dict, llm) -> list[dict]:
    """One knowledge-graph-completion round
    (``relationship_inference.py:144-184``): only triples whose key is
    new and whose endpoints are known entities survive."""
    info = _entity_info(entities)
    type_map = {e["name"]: e["type"] for e in info}
    inferred_map = {
        (e.get("entity") or e.get("name", "")): e.get("inferred", "explizit")
        for e in entities
    }
    allowed = {(e.get("entity") or e.get("name", "")) for e in entities}
    raw = llm.chat(
        prompts.kgc_messages(
            text, info, existing, cfg.get("MAX_RELATIONS", 15), cfg.get("LANGUAGE", "en")
        )
    )
    new_rels = parse_triples(raw)
    existing_keys = {triple_key(r) for r in existing}
    out = []
    for rel in new_rels:
        if not all(k in rel for k in ("subject", "predicate", "object")):
            continue
        if triple_key(rel) in existing_keys:
            continue
        if rel["subject"] in allowed and rel["object"] in allowed:
            out.append(_annotate(rel, "implicit", type_map, inferred_map))
    return out


# ----------------------------------------------------------------------
# packaging
# ----------------------------------------------------------------------

def package_entity(e: dict, input_text: str, cfg: dict) -> dict:
    """Internal linked entity → one flat Arrow-friendly output row.

    Field semantics follow the legacy packager
    (``core/orchestrator.py:347-445``) with the nested ``sources`` map
    flattened into typed columns; the citation offsets use the same
    ``str.find`` fallback (``orchestrator.py:350-352``).
    """
    citation = e.get("citation", input_text)
    start = input_text.find(citation) if citation != input_text else 0
    end = start + len(citation) if start != -1 else len(input_text)
    wd = e.get("wikidata_details") or {}
    db = e.get("dbpedia_info") or {}
    url = e.get("wikipedia_url") or ""
    if url:
        label = e.get("wikipedia_title") or parse_wiki_url(url)[0]
    else:
        label = ""
    use_wikidata = bool(cfg.get("USE_WIKIDATA", False) and wd)
    use_dbpedia = bool(cfg.get("USE_DBPEDIA", False) and (db or e.get("dbpedia_uri")))
    # ADDITIONAL_DETAILS columns mirror the extended key list the
    # legacy packager copies into sources.wikipedia / sources.wikidata
    # (``orchestrator.py:371-395``): present in the schema always,
    # populated only under the flag — same conditional as the reference.
    more = bool(cfg.get("ADDITIONAL_DETAILS", False))
    wp_det = (e.get("wikipedia_details") or {}) if more else {}
    wd_more = wd if (more and use_wikidata) else {}
    coords = wd_more.get("coordinates") or {}
    # NOTE: the reference packager's "same_as"/"foundation_date"/"lat"/
    # "long" keys never match the SPARQL decode's actual keys
    # ("sameAs"/"founding_date"/"coordinates") — those fields are dead
    # in the reference's packaged sources.dbpedia, so they get no
    # columns here either (parity over completeness).
    db_more = db if (more and use_dbpedia) else {}
    return {
        "entity": e.get("name", ""),
        "type": e.get("type", ""),
        "inferred": e.get("inferred", "explicit"),
        "citation": citation,
        "citation_start": start,
        "citation_end": end,
        "wikipedia_label": label,
        "wikipedia_url": url,
        "wikipedia_extract": e.get("wikipedia_extract", "") or "",
        "wikipedia_categories": list(e.get("wikipedia_categories", []) or []),
        "wikipedia_infobox_json": (
            json.dumps(wp_det["infobox"]) if wp_det.get("infobox") else ""
        ),
        "wikipedia_see_also": list(wp_det.get("see_also", []) or []),
        "wikipedia_image": wp_det.get("image", "") or "",
        "wikidata_id": (wd.get("id", "") if use_wikidata else ""),
        "wikidata_label": (wd.get("label", "") if use_wikidata else ""),
        "wikidata_description": (wd.get("description", "") if use_wikidata else ""),
        "wikidata_types": (list(wd.get("types", [])) if use_wikidata else []),
        # part_of / has_parts are in the packager's EXTENDED key list
        # (orchestrator.py:125,394), not the base fields — populated
        # only under ADDITIONAL_DETAILS, like the other wd_more columns
        "wikidata_part_of": list(wd_more.get("part_of", []) or []),
        "wikidata_has_parts": list(wd_more.get("has_parts", []) or []),
        "wikidata_url": (e.get("wikidata_url", "") if use_wikidata else ""),
        "wikidata_aliases": list(wd_more.get("aliases", []) or []),
        "wikidata_instance_of": list(wd_more.get("instance_of", []) or []),
        "wikidata_subclass_of": list(wd_more.get("subclass_of", []) or []),
        "wikidata_member_of": list(wd_more.get("member_of", []) or []),
        "wikidata_citizenships": list(wd_more.get("citizenships", []) or []),
        "wikidata_image_url": wd_more.get("image_url", "") or "",
        "wikidata_website": wd_more.get("website", "") or "",
        "wikidata_lat": (
            float(coords["latitude"]) if "latitude" in coords else None
        ),
        "wikidata_lon": (
            float(coords["longitude"]) if "longitude" in coords else None
        ),
        "wikidata_foundation_date": wd_more.get("foundation_date", "") or "",
        "wikidata_birth_date": wd_more.get("birth_date", "") or "",
        "wikidata_death_date": wd_more.get("death_date", "") or "",
        "wikidata_birth_place": wd_more.get("birth_place", "") or "",
        "wikidata_death_place": wd_more.get("death_place", "") or "",
        "wikidata_official_name": wd_more.get("official_name", "") or "",
        "wikidata_population": wd_more.get("population", "") or "",
        "wikidata_gnd_id": wd_more.get("gnd_id", "") or "",
        "wikidata_isni": wd_more.get("isni", "") or "",
        "dbpedia_uri": (db.get("resource_uri", "") if use_dbpedia else ""),
        "dbpedia_label": (db.get("label", "") if use_dbpedia else ""),
        "dbpedia_abstract": (db.get("abstract", "") if use_dbpedia else ""),
        "dbpedia_types": (list(db.get("types", [])) if use_dbpedia else []),
        "dbpedia_subjects": (list(db.get("subjects", [])) if use_dbpedia else []),
        "dbpedia_language": (db.get("language", "") if use_dbpedia else ""),
        "dbpedia_part_of": (list(db.get("part_of", [])) if use_dbpedia else []),
        "dbpedia_has_parts": (list(db.get("has_parts", [])) if use_dbpedia else []),
        "dbpedia_member_of": (list(db.get("member_of", [])) if use_dbpedia else []),
        "dbpedia_categories": (list(db.get("categories", [])) if use_dbpedia else []),
        "dbpedia_comment": db_more.get("comment", "") or "",
        "dbpedia_homepage": db_more.get("homepage", "") or "",
        "dbpedia_thumbnail": db_more.get("thumbnail", "") or "",
        "dbpedia_depiction": db_more.get("depiction", "") or "",
        "dbpedia_birth_date": db_more.get("birth_date", "") or "",
        "dbpedia_death_date": db_more.get("death_date", "") or "",
        "dbpedia_birth_place": db_more.get("birth_place", "") or "",
        "dbpedia_death_place": db_more.get("death_place", "") or "",
        "dbpedia_population": str(db_more.get("population", "") or ""),
        "dbpedia_area": str(db_more.get("area", "") or ""),
        "dbpedia_country": db_more.get("country", "") or "",
        "dbpedia_region": db_more.get("region", "") or "",
        "dbpedia_founder": db_more.get("founder", "") or "",
        "dbpedia_parent_company": db_more.get("parent_company", "") or "",
        "dbpedia_current_member": list(db_more.get("current_member", []) or []),
        "dbpedia_former_member": list(db_more.get("former_member", []) or []),
        "dbpedia_dbp_part_of": list(db_more.get("dbp_part_of", []) or []),
        "dbpedia_dbp_member_of": list(db_more.get("dbp_member_of", []) or []),
        "canonical_id": entity_dedup_key(e),
        "link_status": e.get("link_status", "unlinked"),
    }


# ----------------------------------------------------------------------
# compendium (A14) + training data (S4/S5)
# ----------------------------------------------------------------------

def collect_references(entities: list[dict]) -> list[str]:
    """Ordered distinct source URLs across all linked entities — G9
    (``services/compendium_service.py:46-63``): ENTITY-major, per
    entity wikipedia → wikidata (url, else constructed /wiki/{id}) →
    dbpedia, deduplicated with first occurrence winning — the same
    numbering the reference's compendium citations use."""
    urls: list[str] = []
    for e in entities:
        wp_url = e.get("wikipedia_url") or ""
        if wp_url:
            urls.append(wp_url)
        wd_url = e.get("wikidata_url") or ""
        if not wd_url and e.get("wikidata_id"):
            wd_url = f"https://www.wikidata.org/wiki/{e['wikidata_id']}"
        if wd_url:
            urls.append(wd_url)
        db_uri = e.get("dbpedia_uri") or (e.get("dbpedia_info") or {}).get(
            "resource_uri", ""
        )
        if db_uri:
            urls.append(db_uri)
    return list(dict.fromkeys(urls))


def build_compendium(topic: str, entities: list[dict], cfg: dict, llm) -> tuple[str, list[str]]:
    """One compendium LLM call from the linked entities' knowledge
    (``services/compendium_service.py:9-89``): entity-major reference
    list + a knowledge block of per-entity, NAME-labeled source lines
    (the reference's ``Wikipedia-Extract für {entity}: ...`` format —
    labels are German in the reference regardless of LANGUAGE) →
    ~COMPENDIUM_LENGTH-char cited text. Returns
    ``(compendium_text, references)``."""
    refs = collect_references(entities)
    knowledge_parts: list[str] = []
    for e in entities:
        name = e.get("entity") or e.get("name", "")
        parts: list[str] = []
        if e.get("wikipedia_extract"):
            parts.append(f"Wikipedia-Extract für {name}: {e['wikipedia_extract']}")
        if e.get("wikipedia_url"):
            parts.append(f"Wikipedia-URL für {name}: {e['wikipedia_url']}")
        if e.get("wikipedia_categories"):
            parts.append(
                f"Kategorien für {name}: {', '.join(e['wikipedia_categories'])}"
            )
        wd = e.get("wikidata_details") or {}
        if wd.get("id"):
            parts.append(f"Wikidata-ID für {name}: {wd['id']}")
        if wd.get("description"):
            parts.append(f"Wikidata-Beschreibung für {name}: {wd['description']}")
        if wd.get("types"):
            parts.append(f"Wikidata-Typen für {name}: {', '.join(wd['types'])}")
        db = e.get("dbpedia_info") or {}
        if db.get("abstract"):
            parts.append(f"DBpedia-Abstract für {name}: {db['abstract']}")
        if db.get("resource_uri"):
            parts.append(f"DBpedia-URI für {name}: {db['resource_uri']}")
        if parts:
            knowledge_parts.append("\n".join(parts))
    knowledge = "\n\n".join(knowledge_parts)
    raw = llm.chat(
        prompts.compendium_messages(
            topic, refs, int(cfg.get("COMPENDIUM_LENGTH", 8000)), knowledge,
            language=cfg.get("LANGUAGE", "en"),
            educational=bool(cfg.get("COMPENDIUM_EDUCATIONAL_MODE", False)),
        )
    )
    return raw, refs


def training_examples(trace: dict, cfg: dict) -> list[dict]:
    """Fine-tune examples mirroring the reference's two JSONL sinks
    (``services/openai_service.py:133-209``): one 3-message chat per
    extraction call (assistant = raw ``name; type; url; citation``
    lines exactly as the LLM returned them, pre-linking — saved inside
    the extraction call, ``openai_service.py:125-127``) and one per
    relation-inference call (assistant = semicolon triple lines of the
    validated pre-dedup list, ``relationship_inference.py:260,367-370``).
    Built from the pass's ``trace`` so chunked mode yields one example
    per chunk, like the reference's per-call appends."""
    max_entities = cfg.get("MAX_ENTITIES", 15)
    max_rel = cfg.get("MAX_RELATIONS", 15)
    mode = cfg.get("MODE", "extract")
    lang = cfg.get("LANGUAGE", "en")
    out: list[dict] = []
    for rec in trace.get("extractions", []):
        ent_msgs = prompts.extraction_messages(rec["text"], max_entities, lang)
        ent_lines = "\n".join(
            f"{e.get('entity') or e.get('name','')}; {e.get('type','')}; "
            f"{e.get('wikipedia_url','')}; {e.get('citation','')}"
            for e in rec["entities"]
        )
        out.append(
            {
                "kind": "entity_extraction",
                "messages": ent_msgs + [{"role": "assistant", "content": ent_lines}],
            }
        )
    for rec in trace.get("relations", []):
        if rec["kind"] == "implicit":
            rel_msgs = prompts.implicit_relation_messages(
                rec["text"], rec["entities"], rec.get("explicit_rels", []), max_rel, lang
            )
        else:
            rel_msgs = prompts.explicit_relation_messages(
                rec["text"], rec["entities"], max_rel, mode, lang
            )
        rel_lines = "\n".join(
            f"{r['subject']}; {r['predicate']}; {r['object']}" for r in rec["rels"]
        )
        out.append(
            {
                "kind": "relationship_extraction",
                "messages": rel_msgs + [{"role": "assistant", "content": rel_lines}],
            }
        )
    return out


# ----------------------------------------------------------------------
# full per-document pipeline
# ----------------------------------------------------------------------

def _gate_sources(e: dict, cfg: dict) -> dict:
    """Flag-gated view of one linked entity for artifact building.

    The reference's compendium reads the PACKAGED ``sources`` map, which
    only carries wikidata/dbpedia sections under the same conditions the
    packager applies (``orchestrator.py:110-111``: ``USE_WIKIDATA and
    wikidata_details``; dbpedia analogously). The raw link dicts here can
    hold a ``wikidata_id`` planted by the extract fetch even when
    ``USE_WIKIDATA`` is off, so artifacts built from raw entities would
    cite sources the packaged output never exposes."""
    wd = e.get("wikidata_details") or {}
    db = e.get("dbpedia_info") or {}
    use_wikidata = bool(cfg.get("USE_WIKIDATA", False) and wd)
    use_dbpedia = bool(cfg.get("USE_DBPEDIA", False) and (db or e.get("dbpedia_uri")))
    if use_wikidata and use_dbpedia:
        return e
    out = dict(e)
    if not use_wikidata:
        for key in ("wikidata_id", "wikidata_url", "wikidata_details"):
            out.pop(key, None)
    if not use_dbpedia:
        for key in ("dbpedia_uri", "dbpedia_info"):
            out.pop(key, None)
    return out


def build_doc_artifacts(
    input_text: str, ents: list[dict], trace: dict, cfg: dict, llm
) -> dict:
    """Feature-flagged per-document artifacts (compendium A14, training
    data S4/S5) derived from the SAME extraction pass — the reference
    derives both from its single ``process_entities`` run
    (``orchestrator.py``), never re-extracting per artifact."""
    artifacts: dict = {}
    if cfg.get("ENABLE_COMPENDIUM", False):
        gated = [_gate_sources(e, cfg) for e in ents]
        compendium, refs = build_compendium(input_text, gated, cfg, llm)
        artifacts["compendium"] = {"compendium": compendium, "references": refs}
    if cfg.get("COLLECT_TRAINING_DATA", False):
        artifacts["training"] = training_examples(trace, cfg)
    return artifacts


def process_document(
    input_text: str, cfg: dict, llm, kb, *, return_artifacts: bool = False
):
    """Full reference flow for one document; returns
    ``(packaged_entities, relationships)`` — or, with
    ``return_artifacts=True``, ``(packaged, rels, artifacts)`` where the
    flagged compendium/training artifacts reuse this pass's entities and
    relations instead of re-extracting.

    Single-pass path: ``orchestrator.py:329-468``; chunked path
    (``TEXT_CHUNKING``): ``orchestrator.py:38-198`` (per-chunk extract +
    relate, then first-wins entity dedup, explicit>implicit triple
    dedup, LLM dedup, fuzzy dedup). KGC rounds run here because the
    reference's KGC state is strictly per-document
    (``orchestrator.py:446-468``).
    """
    trace: dict | None = (
        {} if return_artifacts and cfg.get("COLLECT_TRAINING_DATA", False) else None
    )
    if cfg.get("TEXT_CHUNKING", False):
        chunks = chunk_text(
            input_text, cfg.get("TEXT_CHUNK_SIZE", 1000), cfg.get("TEXT_CHUNK_OVERLAP", 50)
        )
        all_ents: list[dict] = []
        all_rels: list[dict] = []
        for chunk in chunks:
            ents = extract_and_link(chunk, cfg, llm, kb, trace)
            all_ents.extend(ents)
            if cfg.get("RELATION_EXTRACTION", False):
                all_rels.extend(infer_relationships(chunk, ents, cfg, llm, trace))
        ents = dedup_entities_first_wins(all_ents)
        rels = dedup_triples_explicit_wins(all_rels)
        rels = llm_pair_dedup(rels, cfg, llm, directed=False)
        rels = fuzzy_dedup_triples(rels, 0.85)
    else:
        ents = extract_and_link(input_text, cfg, llm, kb, trace)
        rels = []
        if cfg.get("RELATION_EXTRACTION", False):
            if cfg.get("MODE") == "generate" and ents and all(
                e.get("wikipedia_extract") for e in ents
            ):
                rel_context = "\n".join(e["wikipedia_extract"] for e in ents)
            else:
                rel_context = input_text
            rels = infer_relationships(rel_context, ents, cfg, llm, trace)
            rels = llm_pair_dedup(rels, cfg, llm, directed=False)
            rels = fuzzy_dedup_triples(rels, 0.85)

    if cfg.get("ENABLE_KGC", False):
        by_key = {triple_key(r): r for r in rels}
        for _ in range(cfg.get("KGC_ROUNDS", 3)):
            new_rels = kgc_round(input_text, ents, list(by_key.values()), cfg, llm)
            for rel in new_rels:
                by_key.setdefault(triple_key(rel), rel)
        rels = list(by_key.values())
        rels = llm_pair_dedup(rels, cfg, llm, directed=False)
        rels = fuzzy_dedup_triples(rels, 0.85)

    packaged = [package_entity(e, input_text, cfg) for e in ents]
    if not return_artifacts:
        return packaged, rels
    return packaged, rels, build_doc_artifacts(input_text, ents, trace or {}, cfg, llm)
