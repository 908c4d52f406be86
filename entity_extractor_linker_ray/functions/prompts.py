"""Prompt builders for the pluggable LLM client.

Fresh, compact templates that keep the reference's *wire contract* —
the same output formats (semicolon entity/triple lines, JSON dedup
arrays), the same data blocks (text, entity JSON, existing-relationship
JSON), and the same dispatch markers the deterministic stub keys on —
without reproducing the reference's prose. Reference prompt modules:
``prompts/extract_prompts.py``, ``prompts/relationship_prompts.py``,
``prompts/entity_inference_prompts.py``,
``prompts/deduplication_prompts.py``.
"""

from __future__ import annotations

import json

# ----------------------------------------------------------------------
# COMPENDIUM_EDUCATIONAL_MODE
# ----------------------------------------------------------------------
# The reference appends a structuring catalogue of educational knowledge
# aspects to four prompt families when the flag is set
# (``services/openai_service.py:72-74`` extraction,
# ``core/generator.py:131-133`` generation,
# ``core/entity_inference.py:76-82`` entity inference,
# ``services/compendium_service.py:67`` + ``compendium_prompts.py:34``
# compendium). These are the engine-worded equivalents — same aspect
# axes, fresh prose (no-copy rule). Under the deterministic stub the
# extra clause never changes dispatch (markers are matched by
# substring), so flag-off goldens are byte-identical.

_EDU_ASPECTS_EN = (
    "Educational mode: organize the output around the knowledge axes a "
    "learner needs — scope and goals of the topic; core terminology "
    "(with English equivalents), formulas and laws; internal structure "
    "and subfields; everyday and societal relevance; historical "
    "milestones and key figures; notable people, organizations and "
    "networks; occupations and applied practice; standard literature, "
    "journals and open datasets; curricula, standards and teaching "
    "materials; legal, licensing and ethical constraints; ecological "
    "and social impact; neighboring disciplines and transfer links; "
    "current research and open questions; related resource types "
    "(people, places, tools, metadata); and concrete case studies or "
    "worked examples."
)

_EDU_ASPECTS_DE = (
    "Bildungsmodus: strukturieren Sie die Ausgabe entlang der "
    "Wissensachsen, die Lernende benötigen — Umfang und Ziele des "
    "Themas; Kernterminologie (mit englischen Entsprechungen), Formeln "
    "und Gesetze; innere Struktur und Teilgebiete; Alltags- und "
    "Gesellschaftsbezug; historische Meilensteine und Schlüsselfiguren; "
    "bedeutende Personen, Organisationen und Netzwerke; Berufe und "
    "Anwendungspraxis; Standardliteratur, Zeitschriften und offene "
    "Datensätze; Lehrpläne, Standards und Lernmaterialien; rechtliche, "
    "lizenz- und ethikbezogene Rahmen; ökologische und soziale Wirkung; "
    "Nachbardisziplinen und Transferbezüge; aktuelle Forschung und "
    "offene Fragen; verwandte Ressourcentypen (Personen, Orte, "
    "Werkzeuge, Metadaten); sowie konkrete Fallstudien oder "
    "Beispielprojekte."
)


def educational_block(language: str = "en") -> str:
    """Engine-worded educational structuring clause, selected by
    language like the reference's ``get_educational_block_{de,en}``
    (``compendium_prompts.py:6-32``)."""
    return _EDU_ASPECTS_DE if language == "de" else _EDU_ASPECTS_EN


def _with_edu(system: str, educational: bool, language: str) -> str:
    """Append the educational block to a system prompt under the flag —
    the reference's ``f"{system_prompt.strip()}\\n\\n{edu_block}"``
    composition (``core/generator.py:133``)."""
    if not educational:
        return system
    return f"{system.strip()}\n\n{educational_block(language)}"


def extraction_messages(text: str, max_entities: int, language: str = "en",
                        educational: bool = False) -> list[dict]:
    """Entity extraction (``extract_prompts.py:6-56``): semicolon lines
    ``name; type; wikipedia_url; citation``."""
    system = (
        "You are a helpful AI system for recognizing and linking entities. "
        f"Identify up to {max_entities} important entities from the text and "
        "link each to its Wikipedia page. Output one entity per line as "
        "'name; type; wikipedia_url; citation' — citation is an exact text "
        "span of at most 5 words. No JSON, no extra text."
    )
    return [
        {"role": "system", "content": _with_edu(system, educational, language)},
        {"role": "user", "content": f"Text: {text}"},
    ]


def generation_messages(topic: str, max_entities: int, language: str = "en",
                        educational: bool = False) -> list[dict]:
    """Generate-mode entity generation (``generation_prompts.py:6-45``):
    the reference prompts for entities about a TOPIC rather than spans
    from a text; output stays the semicolon wire contract with citation
    pinned to "generated". The marker phrase and the
    ``topic ... .\\n\\nOutput format`` structure match the reference so
    the stub parses the topic identically from both code bases."""
    system = (
        f"Generate exactly {max_entities} implicit, logical entities "
        f"relevant to the topic: {topic}.\n\n"
        "Output format: one semicolon-separated line per entity: "
        "name; type; wikipedia_url; citation. Set citation to "
        '"generated". No JSON, no extra text.'
    )
    user = (
        f"Provide exactly {max_entities} implicit entities as "
        "semicolon-separated lines: name; type; wikipedia_url; citation. "
        "One entity per line. No JSON."
    )
    return [
        {"role": "system", "content": _with_edu(system, educational, language)},
        {"role": "user", "content": user},
    ]


def entity_inference_messages(
    text: str, explicit_entities: list[dict], max_entities: int,
    language: str = "en", educational: bool = False,
) -> list[dict]:
    """Implicit entity inference (``entity_inference_prompts.py:8-55``)."""
    system = _with_edu(
        "You are an AI assistant enriching an existing entity list by adding "
        f"only implicit entities. Generate exactly {max_entities} new entities, "
        "one per line as 'name; type; wikipedia_url; citation' with citation "
        "set to \"generated\". Do not repeat provided entities.",
        educational, language,
    )
    user = (
        f"Topic/Text: {text}\n\n"
        "Existing entities:\n"
        f"{json.dumps(explicit_entities, ensure_ascii=False)}\n"
    )
    return [
        {"role": "system", "content": system},
        {"role": "user", "content": user},
    ]


def _relation_user(text: str, entity_info: list[dict], max_relations: int, extra: str = "") -> str:
    return (
        f"Text: ```{text}```\n\n"
        "Entities:\n"
        f"{json.dumps(entity_info)}\n\n"
        f"{extra}"
        f"Return each relationship as a line 'subject; predicate; object'. "
        f"Limit to at most {max_relations} relationships."
    )


def explicit_relation_messages(
    text: str, entity_info: list[dict], max_relations: int,
    mode: str = "extract", language: str = "en",
) -> list[dict]:
    """Explicit (extract mode) or all-relations (generate mode) prompt
    (``relationship_prompts.py:108-212``)."""
    if mode == "generate":
        task = (
            "Generate ALL possible relationships between the provided "
            "entities based on the text."
        )
    else:
        task = (
            "Extract ONLY explicit relationships directly stated in the text "
            "between the provided entities."
        )
    system = (
        "You are an AI system specializing in knowledge extraction and "
        f"knowledge graph generation. {task} Use only the provided entities "
        "as subject and object. Predicates must be 1-3 words lowercase. "
        "Output one 'subject; predicate; object' line per relationship."
    )
    return [
        {"role": "system", "content": system},
        {"role": "user", "content": _relation_user(text, entity_info, max_relations)},
    ]


def implicit_relation_messages(
    text: str, entity_info: list[dict], explicit_rels: list[dict],
    max_relations: int, language: str = "en",
) -> list[dict]:
    """Implicit relation inference (``relationship_prompts.py:214-245``)."""
    system = (
        "You are an AI system specializing in knowledge graph enrichment. "
        "Add implicit relationships not already covered by the explicit "
        "ones. Use only the provided entities. Predicates 1-3 words "
        "lowercase; one 'subject; predicate; object' line each."
    )
    extra = (
        "Explicit relationships (do NOT repeat):\n"
        f"{json.dumps(_slim_rels(explicit_rels))}\n\n"
        f"Identify up to {max_relations} additional implicit relationships.\n\n"
    )
    return [
        {"role": "system", "content": system},
        {"role": "user", "content": _relation_user(text, entity_info, max_relations, extra)},
    ]


def kgc_messages(
    text: str, entity_info: list[dict], existing_rels: list[dict],
    max_relations: int, language: str = "en",
) -> list[dict]:
    """Knowledge-graph-completion round (``relationship_prompts.py:8-52``)."""
    system = (
        "You are a knowledge graph completion assistant. Generate only new "
        "implicit relationships uncovering missing logical connections "
        "between the provided entities; never duplicate existing ones. "
        "Predicates 1-3 words lowercase; one 'subject; predicate; object' "
        "line each."
    )
    extra = (
        "Existing relationships:\n"
        f"{json.dumps(_slim_rels(existing_rels))}\n\n"
        f"Identify up to {max_relations} additional implicit relationships.\n\n"
    )
    return [
        {"role": "system", "content": system},
        {"role": "user", "content": _relation_user(text, entity_info, max_relations, extra)},
    ]


def dedup_messages(
    subject: str, obj: str, candidates: list[dict], language: str = "en"
) -> list[dict]:
    """Pairwise predicate dedup (``deduplication_prompts.py:9-20``,
    ``relationship_prompts.py:282-292``)."""
    system = (
        "You are a helpful assistant for deduplicating knowledge graph "
        "relationships."
    )
    user = (
        "Remove duplicate or near-duplicate predicates, preferring explicit "
        "over implicit. "
        f"Subject: '{subject}', Object: '{obj}', "
        f"Relationships: {json.dumps(candidates, ensure_ascii=False)}. "
        "Return a JSON array of the kept relationships with predicate and "
        "inferred fields."
    )
    return [
        {"role": "system", "content": system},
        {"role": "user", "content": user},
    ]


def compendium_messages(topic: str, references: list[str], length: int,
                        knowledge: str, language: str = "en",
                        educational: bool = False) -> list[dict]:
    """Compendium generation (``compendium_prompts.py:34-134``). Under
    ``educational`` the structuring clause is embedded mid-prompt before
    the knowledge block, mirroring the reference's ``{edu}`` slot in the
    compendium template (``compendium_prompts.py:54``)."""
    refs = "\n".join(f"({i + 1}) {u}" for i, u in enumerate(references))
    edu = f"{educational_block(language)}\n" if educational else ""
    user = (
        f"Write a compendium of about {length} characters on: {topic}\n"
        f"Cite only these references:\n{refs}\n"
        f"{edu}"
        "### Wissen aus Quellen:\n"
        f"{knowledge}"
    )
    return [{"role": "user", "content": user}]


def _slim_rels(rels: list[dict]) -> list[dict]:
    """Ship only the triple fields into prompts (the reference ships the
    whole rel dicts, ``relationship_inference.py:151``; the stub reads
    only subject/predicate/object/inferred — slimming keeps prompt size
    bounded at scale without changing stub behavior)."""
    return [
        {
            "subject": r.get("subject", ""),
            "predicate": r.get("predicate", ""),
            "object": r.get("object", ""),
            "inferred": r.get("inferred", "explicit"),
        }
        for r in rels
    ]


def translate_messages(term: str) -> list[dict]:
    """A8 translate-to-English prompt (``wikidata_service.py:81-132``).
    The system marker mirrors the reference wording so the stub client
    dispatches on the same text the reference sends."""
    system = (
        "Du bist ein Experte für Übersetzungen wissenschaftlicher Begriffe "
        "und die in Wikidata verwendete Terminologie."
    )
    user = (
        "Übersetze den folgenden Begriff ins Englische, wie er in Wikidata "
        f"verwendet würde. Gib NUR den übersetzten Begriff zurück: '{term}'"
    )
    return [
        {"role": "system", "content": system},
        {"role": "user", "content": user},
    ]


def synonym_messages(entity_name: str, language: str = "en") -> list[dict]:
    """A9 synonym-generation prompt (``wikidata_service.py:134-196``):
    3 alternative Wikidata-convention names as a JSON array."""
    if language == "de":
        system = (
            "Du bist ein Experte für Entitätserkennung und die "
            "Namenskonventionen der Wikidata-Wissensdatenbank."
        )
        user = (
            "Generiere die 3 wahrscheinlichsten alternativen Namen für "
            f"'{entity_name}' nach Wikidata-Konventionen. Gib NUR ein "
            "JSON-Array von Strings zurück."
        )
    else:
        system = (
            "You are an expert in entity recognition and Wikidata "
            "knowledge base conventions."
        )
        user = (
            "Generate the 3 most likely alternative names or synonyms for "
            f"'{entity_name}' matching Wikidata naming conventions. "
            "Return ONLY a JSON array of strings."
        )
    return [
        {"role": "system", "content": system},
        {"role": "user", "content": user},
    ]
