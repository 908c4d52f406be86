"""Synthetic knowledge-base snapshot + resolver.

Replaces the reference's live Wikipedia/Wikidata/DBpedia HTTP services
(``services/wikipedia_service.py``, ``services/wikidata_service.py``,
``services/dbpedia_service.py``) with a deterministic in-memory
snapshot whose record shapes mirror the reference's recorded cache
JSONs (``/root/reference/entityextractor/cache/wikipedia/*.json`` →
``{"extract", "wikidata_id"}`` etc.). The same snapshot drives BOTH the
new Ray pipeline's linker actors and the reference-code golden harness
(tests monkeypatch the reference's service functions onto
:class:`KBSnapshot` methods), so triple P/R vs the reference is
measured under identical knowledge.

At scale the snapshot is broadcast once via ``ray.put`` and each linker
actor builds its lookup indexes once in ``__init__``; per-batch work is
pure dict lookups (SURVEY.md §2.4 A10-A12 mapping).
"""

from __future__ import annotations

from entity_extractor_linker_ray.functions.urls import build_wikipedia_url, parse_wiki_url

# Closed entity vocabulary. The surface forms are chosen from the token
# vocabulary of the driver-generated ``documents`` test tables (see
# TESTDATA.md) so the same KB powers transcripts synthesized in-repo AND
# pipelines run directly over /root/testdata parquet. No term is a
# prefix of another (whole-word matching stays unambiguous).
_VOCAB: list[tuple[str, str, str, str]] = [
    # (label_en, label_de, type, parent_label)
    ("Spark", "Funke", "Organization", "Data Platform"),
    ("Customer", "Kunde", "Person", "Query Engine"),
    ("Window", "Fenster", "Method", "Query Engine"),
    ("Table", "Tabelle", "Resource", "Data Platform"),
    ("Merge", "Zusammenführung", "Process", "Data Platform"),
    ("Vector", "Vektor", "Tool", "Data Platform"),
    ("Stream", "Datenstrom", "System", "Data Platform"),
    ("Hash", "Streuwert", "Term", "Query Engine"),
    ("Filter", "Filterung", "Tool", "Query Engine"),
    ("Query", "Abfrage", "Task", "Query Engine"),
    ("Column", "Spalte", "Resource", "Data Platform"),
    ("Batch", "Stapel", "Process", "Data Platform"),
]

_PARENTS: list[tuple[str, str, str]] = [
    ("Data Platform", "Datenplattform", "System"),
    ("Query Engine", "Abfragemaschine", "System"),
]

MAINTENANCE_SAMPLE = [
    "Articles with short description",
    "All articles with unsourced statements",
    "Wikipedia articles needing clarification",
]


def build_kb() -> list[dict]:
    """Deterministic KB records (pure function; same output everywhere).

    Planted edge cases, cycling by index, exercise the reference's
    fallback chain (``core/linker.py:63-134``):

    * ``idx % 10 == 3``  → the stub LLM emits NO url for this entity
      (empty field → opensearch fallback path, ``linker.py:71-75``),
    * ``idx % 10 == 7``  → the stub LLM emits a redirect-title url
      (→ redirect-follow path, ``linker.py:90-99``),
    * ``idx % 5 == 4``   → entity has no Wikidata item (partial linking
      for the ``linked.*`` stats, ``orchestrator.py:494-506``),
    * ``idx % 7 == 6``   → entity missing from DBpedia (→ constructed
      resource-URI fallback, ``linker.py:216-225``).
    """
    records: list[dict] = []
    specs = [(lab, de, typ, par) for lab, de, typ, par in _VOCAB]
    specs += [(lab, de, typ, "") for lab, de, typ in _PARENTS]
    for idx, (label, label_de, typ, parent) in enumerate(specs):
        title = label  # canonical Wikipedia title
        url_en = build_wikipedia_url(title, "en")
        url_de = build_wikipedia_url(label_de, "de")
        redirect_from = [f"{label} (disambiguation)", f"The {label}"]
        if idx % 10 == 3:
            llm_url = ""
        elif idx % 10 == 7:
            llm_url = build_wikipedia_url(redirect_from[0], "en")
        else:
            llm_url = url_en
        has_wikidata = idx % 5 != 4
        in_dbpedia = idx % 7 != 6
        categories = [f"{typ} concepts", f"Synthetic {typ.lower()}s"]
        if idx % 3 == 0:
            categories = categories + [MAINTENANCE_SAMPLE[idx % len(MAINTENANCE_SAMPLE)]]
        records.append(
            {
                "label": label,
                "label_de": label_de,
                "type": typ,
                "aliases": sorted({label.lower(), label_de.lower()}),
                "title_en": title,
                "title_de": label_de,
                "url_en": url_en,
                "url_de": url_de,
                "llm_url": llm_url,
                "redirect_from": redirect_from,
                "extract": (
                    f"{label} is a synthetic {typ.lower()} entity used by the "
                    f"deterministic knowledge-base snapshot..."
                ),
                "categories": categories,
                "wikidata_id": f"Q9{idx:04d}" if has_wikidata else "",
                "description": f"synthetic {typ.lower()}",
                "wikidata_types": [typ, "synthetic entity"],
                "part_of": [parent] if parent else [],
                "has_parts": [],
                "dbpedia_uri": (
                    f"http://dbpedia.org/resource/{title.replace(' ', '_')}"
                    if in_dbpedia
                    else ""
                ),
                "dbpedia_types": [f"dbo:{typ}"] if in_dbpedia else [],
                "dbpedia_subjects": (
                    [f"Category:{typ} concepts"] if in_dbpedia else []
                ),
            }
        )
    # fill has_parts from part_of inverses
    by_label = {r["label"]: r for r in records}
    for rec in records:
        for parent in rec["part_of"]:
            if parent in by_label:
                by_label[parent]["has_parts"].append(rec["label"])
    return records


class KBSnapshot:
    """Index + lookup API over the KB records.

    Method-per-service mirroring the reference call sites so the golden
    harness can patch these methods straight over
    ``entityextractor.core.linker``'s imported service functions:

    * :meth:`opensearch`        ↔ ``fallback_wikipedia_url`` (``wikipedia_service.py:139-205``)
    * :meth:`get_extract`       ↔ ``get_wikipedia_extract`` (``wikipedia_service.py:268-466``)
    * :meth:`follow_redirect`   ↔ ``follow_wikipedia_redirect`` (``wikipedia_service.py:207-266``)
    * :meth:`get_categories`    ↔ ``get_wikipedia_categories`` (``wikipedia_service.py:468-512``)
    * :meth:`get_wikidata_id`   ↔ ``get_wikidata_id_from_wikipedia_url`` (``wikidata_service.py:198-305``)
    * :meth:`get_wikidata_details` ↔ ``get_wikidata_details`` (``wikidata_service.py:338-676``)
    * :meth:`get_dbpedia`       ↔ ``get_dbpedia_info_from_wikipedia_url`` (``dbpedia_service.py:30-208``)
    """

    def __init__(self, records: list[dict] | None = None):
        self.records = records if records is not None else build_kb()
        self.by_title: dict[tuple[str, str], dict] = {}
        self.redirects: dict[tuple[str, str], dict] = {}
        self.search: dict[str, dict] = {}
        self.by_qid: dict[str, dict] = {}
        self.by_label: dict[str, dict] = {}
        for rec in self.records:
            self.by_title[("en", rec["title_en"].lower())] = rec
            self.by_title[("de", rec["title_de"].lower())] = rec
            for red in rec["redirect_from"]:
                self.redirects[("en", red.lower())] = rec
            for form in [rec["label"], rec["label_de"], *rec["aliases"], *rec["redirect_from"]]:
                self.search.setdefault(form.lower(), rec)
            if rec["wikidata_id"]:
                self.by_qid[rec["wikidata_id"]] = rec
            self.by_label[rec["label"]] = rec

    # -- resolution helpers -------------------------------------------------
    def _resolve_canonical(self, url: str) -> dict | None:
        title, lang = parse_wiki_url(url)
        return self.by_title.get((lang, title.lower()))

    def url_for(self, rec: dict, lang: str) -> str:
        return rec["url_de"] if lang == "de" else rec["url_en"]

    def title_for(self, rec: dict, lang: str) -> str:
        return rec["title_de"] if lang == "de" else rec["title_en"]

    # -- service-equivalent API --------------------------------------------
    def opensearch(self, name: str, language: str = "en") -> str | None:
        """Name → URL across labels, German labels, aliases and
        redirects. The de/en label and alias forms in the index ARE the
        reference's translator/synonym fallbacks (A8/A9,
        ``wikidata_service.py:81-196``) precomputed into the snapshot:
        a failed exact lookup that the reference would retry via an LLM
        translation/synonym call resolves here through the same
        alternative surface forms, without a per-miss LLM round trip —
        the right trade at 10^10 lookups."""
        rec = self.search.get((name or "").lower())
        return self.url_for(rec, language) if rec else None

    def get_extract(self, url: str) -> tuple[str | None, str | None]:
        rec = self._resolve_canonical(url)
        if rec is None:
            return None, None
        return rec["extract"], (rec["wikidata_id"] or None)

    def follow_redirect(self, url: str, entity_name: str = "") -> tuple[str | None, str | None]:
        title, lang = parse_wiki_url(url)
        rec = self.redirects.get((lang, title.lower()))
        if rec is None:
            rec = self.redirects.get(("en", title.lower()))
        if rec is None:
            return url, None
        return self.url_for(rec, lang), self.title_for(rec, lang)

    def get_categories(self, url: str) -> list[str]:
        rec = self._resolve_canonical(url)
        return list(rec["categories"]) if rec else []

    def get_wikidata_id(self, url: str, entity_name: str = "") -> str | None:
        rec = self._resolve_canonical(url)
        if rec is None or not rec["wikidata_id"]:
            return None
        return rec["wikidata_id"]

    def get_wikidata_details(self, qid: str, language: str = "en") -> dict:
        rec = self.by_qid.get(qid)
        if rec is None:
            return {}
        details = {
            "id": qid,
            "label": rec["label"] if language != "de" else rec["label_de"],
            "description": rec["description"],
            "types": list(rec["wikidata_types"]),
        }
        if rec["part_of"]:
            details["part_of"] = list(rec["part_of"])
        if rec["has_parts"]:
            details["has_parts"] = list(rec["has_parts"])
        return details

    def get_dbpedia(self, url: str) -> dict | None:
        rec = self._resolve_canonical(url)
        if rec is None or not rec["dbpedia_uri"]:
            return None
        return {
            "resource_uri": rec["dbpedia_uri"],
            "label": rec["label"],
            "abstract": rec["extract"],
            "types": list(rec["dbpedia_types"]),
            "subjects": list(rec["dbpedia_subjects"]),
            "language": "en",
        }
