"""Parsers for the LLM wire formats.

The reference speaks two line protocols plus a JSON-array fallback:

* entity lines ``name; type; wikipedia_url; citation``
  (``services/openai_service.py:107-122``; duplicated at
  ``core/generator.py:162-176`` and ``core/entity_inference.py:114-127``
  — implemented once here),
* triple lines ``subject; predicate; object`` with a JSON-array fast
  path (``core/relationship_inference.py:377-398``; the object may
  itself contain ``;``).
"""

from __future__ import annotations

import json

from entity_extractor_linker_ray.functions.text import clean_llm_json


def parse_entity_lines(raw: str, inferred: str = "explicit") -> list[dict]:
    """Parse semicolon entity lines; lines with <4 fields are dropped
    (``openai_service.py:111-122``)."""
    out: list[dict] = []
    for line in raw.splitlines():
        fields = [f.strip() for f in line.split(";")]
        if len(fields) < 4:
            continue
        out.append(
            {
                "name": fields[0],
                "type": fields[1],
                "wikipedia_url": fields[2],
                "citation": fields[3],
                "inferred": inferred,
            }
        )
    return out


def parse_triples(raw: str) -> list[dict]:
    """Parse an LLM relationship response.

    JSON array between the first ``[`` and last ``]`` wins; otherwise
    fall back to ``subject; predicate; object`` lines where everything
    after the second ``;`` belongs to the object
    (``relationship_inference.py:377-398``).
    """
    cleaned = clean_llm_json(raw)
    lo = cleaned.find("[")
    hi = cleaned.rfind("]")
    if 0 <= lo < hi:
        try:
            parsed = json.loads(cleaned[lo : hi + 1])
            if isinstance(parsed, list):
                return [p for p in parsed if isinstance(p, dict)]
        except (ValueError, TypeError):
            pass
    out: list[dict] = []
    for line in cleaned.splitlines():
        line = line.strip()
        if not line:
            continue
        fields = [f.strip() for f in line.split(";")]
        if len(fields) >= 3:
            out.append(
                {
                    "subject": fields[0],
                    "predicate": fields[1],
                    "object": ";".join(fields[2:]),
                }
            )
    return out


def normalize_inferred(value: str | None) -> str:
    """Map ``explizit``/``explicit`` (any case) to ``explicit``, else
    ``implicit`` (``core/response_formatter.py:22-46``)."""
    if value and value.lower() in ("explizit", "explicit"):
        return "explicit"
    return "implicit"
