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
# pipelines run directly over /root/testdata parquet.
#
# Round 4 grew the KB from 14 records to O(10^3): the 31-token corpus
# vocabulary yields 31 single-token entities, all 961 ordered token
# bigrams ("Hash Join"), and the 512 trigrams over the 8 most frequent
# tokens — 1506 records total, so the flagship KG has non-trivial
# node/edge cardinality and REAL hot-entity skew (singles occur in
# nearly every document, bigrams in some, trigrams rarely — a natural
# power-law mention distribution). The original 12 entities keep their
# exact labels/translations; the planted fallback-chain edge cases
# (index cycles below) now recur across the whole vocabulary.
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

# The 31-token vocabulary of the driver-generated documents corpus
# (TESTDATA.md; stable across sf0.001/0.01/0.1 — seed 42) with a
# deterministic German gloss per token (distinct glosses so the
# translate/synonym fallbacks stay unambiguous).
_TOKEN_DE: dict[str, str] = {
    "a": "Ein", "agg": "Aggregat", "batch": "Stapel", "big": "Groß",
    "column": "Spalte", "customer": "Kunde", "data": "Daten",
    "dup": "Duplikat", "fast": "Schnell", "filter": "Filterung",
    "group": "Gruppe", "hash": "Streuwert", "join": "Verbund",
    "key": "Schlüssel", "line": "Zeile", "merge": "Zusammenführung",
    "order": "Reihenfolge", "part": "Teil", "query": "Abfrage",
    "row": "Reihe", "scan": "Abtastung", "slow": "Langsam",
    "small": "Klein", "sort": "Sortierung", "spark": "Funke",
    "stream": "Datenstrom", "table": "Tabelle", "the": "Der",
    "value": "Wert", "vector": "Vektor", "window": "Fenster",
}
_CORPUS_TOKENS: list[str] = sorted(_TOKEN_DE)
# the 8 most frequent corpus tokens — the trigram alphabet (8^3 = 512
# planted trigram entities, each expected ~10x at sf0.1)
_CORE8: list[str] = ["scan", "column", "window", "order", "sort",
                     "part", "agg", "value"]

MAINTENANCE_SAMPLE = [
    "Articles with short description",
    "All articles with unsourced statements",
    "Wikipedia articles needing clarification",
]

# Auxiliary claim-target entities (types, occupations, places, ...):
# QID → (label_en, label_de). These stand in for the arbitrary Wikidata
# items an entity-valued claim can point at; ``get_wikidata_details``
# resolves them through a second-level label lookup exactly like the
# reference's recursive ``get_wikidata_description`` calls
# (``wikidata_service.py:419,449,547,564``).
_TYPE_DE = {
    "Organization": "Organisation", "Person": "Person", "Method": "Methode",
    "Resource": "Ressource", "Process": "Prozess", "Tool": "Werkzeug",
    "System": "System", "Term": "Begriff", "Task": "Aufgabe",
}
_AUX_LABELS: dict[str, tuple[str, str]] = {
    "Q8000": ("synthetic entity", "synthetisches Objekt"),
    "Q8300": ("Synthetic Republic", "Synthetische Republik"),
    "Q8400": ("Testville", "Testhausen"),
    "Q8401": ("Mockport", "Attrappenhafen"),
    "Q8500": ("Synthetic Consortium", "Synthetisches Konsortium"),
    "Q8600": ("data engineer", "Dateningenieur"),
    "Q8601": ("analyst", "Analyst"),
}
_TYPE_QIDS = {t: f"Q80{i + 1:02d}" for i, t in enumerate(sorted(_TYPE_DE))}
for _t, _q in _TYPE_QIDS.items():
    _AUX_LABELS[_q] = (_t, _TYPE_DE[_t])


def _cap(token: str) -> str:
    return token[:1].upper() + token[1:]


def _specs() -> list[tuple[str, str, str, str, str]]:
    """(label, label_de, type, parent_label, corpus_surface) for every
    KB record, in a fixed deterministic order: the original 12 + the 2
    multi-word parents, then the 19 remaining corpus singles, all 961
    token bigrams (parent = the first token's single), and the 512
    core-token trigrams (parent = the leading bigram). corpus_surface
    is the lowercase space-joined surface as it occurs in the corpus
    ("" for the parents, which cannot occur in the token stream)."""
    type_cycle = sorted(_TYPE_DE)
    specs: list[tuple[str, str, str, str, str]] = [
        (lab, de, typ, par, lab.lower()) for lab, de, typ, par in _VOCAB
    ]
    specs += [(lab, de, typ, "", "") for lab, de, typ in _PARENTS]
    known = {lab.lower() for lab, _, _, _ in _VOCAB}
    extra_singles = [t for t in _CORPUS_TOKENS if t not in known]
    for i, t in enumerate(extra_singles):
        parent = _PARENTS[i % 2][0]
        specs.append((_cap(t), _TOKEN_DE[t], type_cycle[i % len(type_cycle)],
                      parent, t))
    n0 = len(specs)
    for i, t1 in enumerate(_CORPUS_TOKENS):
        for j, t2 in enumerate(_CORPUS_TOKENS):
            label = f"{_cap(t1)} {_cap(t2)}"
            de = f"{_TOKEN_DE[t1]} {_TOKEN_DE[t2]}"
            specs.append((label, de,
                          type_cycle[(n0 + i * 31 + j) % len(type_cycle)],
                          _cap(t1), f"{t1} {t2}"))
    n1 = len(specs)
    for i, t1 in enumerate(_CORE8):
        for j, t2 in enumerate(_CORE8):
            for k, t3 in enumerate(_CORE8):
                label = f"{_cap(t1)} {_cap(t2)} {_cap(t3)}"
                de = f"{_TOKEN_DE[t1]} {_TOKEN_DE[t2]} {_TOKEN_DE[t3]}"
                idx = n1 + (i * 8 + j) * 8 + k
                specs.append((label, de, type_cycle[idx % len(type_cycle)],
                              f"{_cap(t1)} {_cap(t2)}", f"{t1} {t2} {t3}"))
    return specs


_KB_CACHE: list[dict] | None = None


def build_kb() -> list[dict]:
    """Deterministic KB records (pure function; same output everywhere;
    memoized per process — treat the returned records as immutable).

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
    global _KB_CACHE  # noqa: PLW0603 — single declaration for the fn
    if _KB_CACHE is not None:
        return _KB_CACHE
    records: list[dict] = []
    specs = _specs()
    for idx, (label, label_de, typ, parent, corpus_surface) in enumerate(specs):
        title = label  # canonical Wikipedia title
        url_en = build_wikipedia_url(title, "en")
        url_de = build_wikipedia_url(label_de, "de")
        # "Legacy" is NOT a corpus token, so redirect titles can never
        # collide with a real record's surface (a "The {label}" form
        # would collide with the "The X" bigram entities)
        redirect_from = [f"{label} (disambiguation)", f"Legacy {label}"]
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
        # Raw Wikidata claims, mirroring the claim set the reference
        # decodes (``wikidata_service.py:338-676``): entity-valued
        # claims hold QIDs (resolved to labels via second-level lookup),
        # times hold the raw ``+YYYY-MM-DDT00:00:00Z`` form (trimmed at
        # decode like ``wikidata_service.py:506-536``), quantities the
        # raw ``+N`` amount. Presence varies by index so every
        # conditional decode path gets both branches exercised.
        wd_claims: dict[str, list] = {
            "P31": [_TYPE_QIDS[typ], "Q8000"],  # instance of
        }
        if idx % 2 == 1:
            wd_claims["P279"] = [_TYPE_QIDS[typ]]  # subclass of
        if typ == "Person":
            wd_claims["P569"] = [f"+{1900 + idx}-03-14T00:00:00Z"]  # birth
            if idx % 2 == 1:
                wd_claims["P570"] = [f"+{1970 + idx}-11-02T00:00:00Z"]  # death
            wd_claims["P106"] = ["Q8600", "Q8601"]  # occupations
            wd_claims["P27"] = ["Q8300"]  # citizenship
            wd_claims["P19"] = ["Q8400"]  # birth place
            wd_claims["P20"] = ["Q8401"]  # death place
            wd_claims["P213"] = [f"0000 0001 2345 {idx:03d}X"]  # ISNI
        elif idx % 3 != 1:
            # BCE edge (no leading '+') exercises the non-'+' trim path
            wd_claims["P571"] = (
                ["-0500-01-01T00:00:00Z"] if idx % 11 == 5
                else [f"+{1950 + idx * 3}-06-0{(idx % 9) + 1}T00:00:00Z"]
            )
        if idx % 2 == 0:
            wd_claims["P856"] = [f"https://www.{label.lower().replace(' ', '')}.example.org"]
        if idx % 4 == 0:
            wd_claims["P625"] = [
                {"latitude": round(-60.0 + idx * 9.5, 4),
                 "longitude": round(-150.0 + idx * 23.25, 4)}
            ]
        if idx % 3 == 0:
            wd_claims["P18"] = [f"{label} synthetic image.svg"]  # space → underscore
            wd_claims["P227"] = [f"11{idx:04d}{idx % 10}"]  # GND
        if idx % 4 == 1:
            wd_claims["P1448"] = [f"The Official {label}"]
        if typ == "System":
            wd_claims["P1082"] = [f"+{10000 + idx * 1234}"]
        if idx % 4 == 2:
            wd_claims["P463"] = ["Q8500"]  # member of
        records.append(
            {
                "label": label,
                "label_de": label_de,
                "corpus_surface": corpus_surface,
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
                "wd_claims": wd_claims,
                # DBpedia SPARQL-shaped extras (dbpedia_service.py:
                # 269-327 OPTIONAL clauses / 377-497 result keys);
                # presence varies by index so every conditional decode
                # path is exercised. part_of/has_parts/member_of URIs
                # are filled in the inverse pass below.
                "db_extra": {
                    key: value
                    for key, value in {
                        "comment": (
                            f"Synthetic comment about {label}."
                            if idx % 2 == 0 else ""
                        ),
                        "sameAs": (
                            [f"http://www.wikidata.org/entity/Q9{idx:04d}"]
                            if has_wikidata else []
                        ),
                        "homepage": (
                            f"https://www.{label.lower().replace(' ', '')}.example.org"
                            if idx % 2 == 0 else ""
                        ),
                        "thumbnail": (
                            f"https://commons.wikimedia.org/wiki/Special:FilePath/"
                            f"{title.replace(' ', '_')}_thumb.png?width=300"
                            if idx % 3 == 0 else ""
                        ),
                        "depiction": (
                            f"https://commons.wikimedia.org/wiki/Special:FilePath/"
                            f"{title.replace(' ', '_')}_depiction.png"
                            if idx % 3 == 0 else ""
                        ),
                        "coordinates": (
                            {"latitude": round(-60.0 + idx * 9.5, 4),
                             "longitude": round(-150.0 + idx * 23.25, 4)}
                            if idx % 4 == 0 else {}
                        ),
                        "categories": (
                            [f"Category:{typ} concepts"] if in_dbpedia else []
                        ),
                        "birth_date": (
                            f"{1900 + idx}-03-14" if typ == "Person" else ""
                        ),
                        "death_date": (
                            f"{1970 + idx}-11-02"
                            if typ == "Person" and idx % 2 == 1 else ""
                        ),
                        "birth_place": "Testville" if typ == "Person" else "",
                        "death_place": "Mockport" if typ == "Person" else "",
                        "country": (
                            "Synthetic Republic" if typ == "Person" else ""
                        ),
                        "population": (
                            str(10000 + idx * 1234) if typ == "System" else ""
                        ),
                        "area": (str(500 + idx * 17) if idx % 5 == 0 else ""),
                        "region": ("Test Region" if idx % 5 == 0 else ""),
                        "founding_date": (
                            f"{1950 + idx * 3}-06-0{(idx % 9) + 1}"
                            if typ != "Person" and idx % 3 != 1 else ""
                        ),
                        "founder": (
                            "Ada Synthetic" if typ == "Organization" else ""
                        ),
                        "parent_company": (
                            parent if typ == "Organization" and parent else ""
                        ),
                        "dbp_part_of": [parent] if parent else [],
                        "dbp_member_of": (
                            ["Synthetic Consortium"] if idx % 4 == 2 else []
                        ),
                        "member_of": (
                            ["http://dbpedia.org/resource/Synthetic_Consortium"]
                            if idx % 4 == 2 else []
                        ),
                        "former_member": (
                            ["http://dbpedia.org/resource/Legacy_Component"]
                            if not parent and idx % 2 == 0 else []
                        ),
                    }.items()
                    if value  # only-when-present, like the SPARQL decode
                },
                # Wikipedia ADDITIONAL_DETAILS payloads
                # (``wikipedia_service.py:514-603``: infobox rows,
                # see-also links, main image)
                "infobox": (
                    {"Type": typ, "Part of": parent, "Index": str(idx)}
                    if parent else {}
                ),
                "see_also": [],  # filled below (needs all records)
                "image": (
                    f"https://upload.wikimedia.org/wikipedia/commons/"
                    f"{title.replace(' ', '_')}_synthetic.png"
                    if idx % 2 == 0 else ""
                ),
            }
        )
    # claim-target QID per record: its real wikidata id, or an
    # aux-only id (a record absent from wikidata as an ENTITY can still
    # be the target of another entity's claim)
    for idx, rec in enumerate(records):
        rec["claim_qid"] = rec["wikidata_id"] or f"Q7{idx:04d}"
    # fill has_parts (labels) + P361/P527 (QIDs) + DBpedia part/member
    # URIs from part_of inverses
    by_label = {r["label"]: r for r in records}
    for rec in records:
        for parent in rec["part_of"]:
            if parent in by_label:
                parent_rec = by_label[parent]
                parent_rec["has_parts"].append(rec["label"])
                parent_rec["wd_claims"].setdefault("P527", []).append(rec["claim_qid"])
                rec["wd_claims"].setdefault("P361", []).append(parent_rec["claim_qid"])
                parent_uri = parent_rec["dbpedia_uri"] or (
                    f"http://dbpedia.org/resource/{parent.replace(' ', '_')}"
                )
                child_uri = rec["dbpedia_uri"] or (
                    f"http://dbpedia.org/resource/{rec['label'].replace(' ', '_')}"
                )
                rec["db_extra"].setdefault("part_of", []).append(parent_uri)
                parent_rec["db_extra"].setdefault("has_parts", []).append(child_uri)
                if rec["label"] != parent:
                    parent_rec["db_extra"].setdefault("current_member", []).append(
                        child_uri
                    )
    # see-also: the next two records cyclically (deterministic)
    for idx, rec in enumerate(records):
        rec["see_also"] = [
            records[(idx + k) % len(records)]["url_en"] for k in (1, 2)
        ]
    _KB_CACHE = records
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
    * :meth:`search_wikidata`   ↔ ``search_wikidata_by_entity_name`` (``wikidata_service.py:20-79``)
    * :meth:`get_wikidata_details` ↔ ``get_wikidata_details`` (``wikidata_service.py:338-676``)
    * :meth:`get_wikipedia_details` ↔ ``get_wikipedia_details`` (``wikipedia_service.py:514-603``)
    * :meth:`get_dbpedia`       ↔ ``get_dbpedia_info_from_wikipedia_url`` (``dbpedia_service.py:30-208``)
    """

    def __init__(self, records: list[dict] | None = None):
        self.records = records if records is not None else build_kb()
        # memo caches for the two pure record→dict decoders — they run
        # once per MENTION in the actor hot path (~10k calls per
        # 600-doc batch) and are pure functions of the immutable
        # snapshot; bounded by |KB| × languages. Callers must treat the
        # returned dicts as read-only (they already do: every consumer
        # copies list fields via list(...)).
        self._wd_details_cache: dict[tuple[str, str], dict] = {}
        self._dbpedia_cache: dict[str, dict | None] = {}
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
        # second-level label index for claim-target QIDs (recursive
        # label resolution, ``wikidata_service.py:307-336``): record
        # claim-QIDs first, then the static aux vocabulary
        self.claim_labels: dict[str, tuple[str, str]] = {}
        for rec in self.records:
            qid = rec.get("claim_qid")
            if qid:
                self.claim_labels[qid] = (rec["label"], rec["label_de"])
        self.claim_labels.update(_AUX_LABELS)

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

    def search_wikidata(self, name: str, language: str = "en") -> str | None:
        """Name → QID across labels/aliases/redirects — the snapshot
        form of ``search_wikidata_by_entity_name``
        (``wikidata_service.py:20-79``) minus the per-call HTTP. Misses
        (unknown name, or a known entity with no Wikidata item) return
        None so the caller's fallback chain advances."""
        rec = self.search.get((name or "").lower())
        if rec and rec["wikidata_id"]:
            return rec["wikidata_id"]
        return None

    def _qid_label(self, qid: str, language: str = "en") -> str | None:
        """Second-level label lookup for entity-valued claims — the
        snapshot form of the reference's recursive per-claim
        ``get_wikidata_description`` calls (``wikidata_service.py:307-336``)."""
        pair = self.claim_labels.get(qid)
        if pair is None:
            return None
        return pair[1] if language == "de" else pair[0]

    @staticmethod
    def _trim_time(time_str: str) -> str:
        """``+YYYY-MM-DDT00:00:00Z`` → ``YYYY-MM-DD`` exactly as the
        reference trims claim times (``wikidata_service.py:506-512``:
        strip a leading '+', drop everything from 'T')."""
        if time_str.startswith("+"):
            time_str = time_str[1:]
        if "T" in time_str:
            time_str = time_str.split("T")[0]
        return time_str

    def get_wikidata_details(self, qid: str, language: str = "en") -> dict:
        """Decode the full reference claim set
        (``wikidata_service.py:338-676``): labels/descriptions/aliases,
        P31 instance_of (+ the duplicate ``types`` decode), P279
        subclass_of (+ ``subclasses``), P18 image → Commons FilePath
        URL (space→underscore), P856 website, P625 coordinates,
        P571/P569/P570 dates (trimmed), P106 occupations, P27
        citizenships, P19/P20 places, P1448 official name, P1082
        population (raw amount), P361/P527/P463 relations, P227 GND,
        P213 ISNI. Keys appear only when the claim exists — same
        conditional shape as the reference. Entity-valued claims
        resolve labels via :meth:`_qid_label`. Memoized per (qid,
        language); the returned dict is shared — do not mutate."""
        cached = self._wd_details_cache.get((qid, language))
        if cached is not None:
            return cached
        rec = self.by_qid.get(qid)
        if rec is None:
            return {}
        claims = rec.get("wd_claims", {})
        result: dict = {"id": qid}
        result["description"] = rec["description"]
        result["label"] = rec["label_de"] if language == "de" else rec["label"]
        if rec["aliases"]:
            result["aliases"] = list(rec["aliases"])

        def labels_of(pid: str) -> list[str]:
            out: list[str] = []
            for target in claims.get(pid, []):
                lab = self._qid_label(target, language)
                if lab and lab not in out:
                    out.append(lab)
            return out

        instances = labels_of("P31")
        if instances:
            result["instance_of"] = instances
            result["types"] = list(instances)  # duplicate decode, :439-454
        subclasses = labels_of("P279")
        if subclasses:
            result["subclass_of"] = subclasses
            result["subclasses"] = list(subclasses)
        if claims.get("P18"):
            image_name = claims["P18"][0].replace(" ", "_")
            result["image_url"] = (
                f"https://commons.wikimedia.org/wiki/Special:FilePath/{image_name}"
            )
        if claims.get("P856"):
            result["website"] = claims["P856"][0]
        if claims.get("P625"):
            coord = claims["P625"][0]
            result["coordinates"] = {
                "latitude": coord["latitude"],
                "longitude": coord["longitude"],
            }
        if claims.get("P571"):
            result["foundation_date"] = self._trim_time(claims["P571"][0])
        if claims.get("P569"):
            result["birth_date"] = self._trim_time(claims["P569"][0])
        if claims.get("P570"):
            result["death_date"] = self._trim_time(claims["P570"][0])
        occupations = labels_of("P106")
        if occupations:
            result["occupations"] = occupations
        citizenships = labels_of("P27")
        if citizenships:
            result["citizenships"] = citizenships
        if claims.get("P19"):
            lab = self._qid_label(claims["P19"][0], language)
            if lab:
                result["birth_place"] = lab
        if claims.get("P20"):
            lab = self._qid_label(claims["P20"][0], language)
            if lab:
                result["death_place"] = lab
        if claims.get("P1448"):
            result["official_name"] = claims["P1448"][0]
        if claims.get("P1082"):
            result["population"] = claims["P1082"][0]
        part_of = labels_of("P361")
        if part_of:
            result["part_of"] = part_of
        has_parts = labels_of("P527")
        if has_parts:
            result["has_parts"] = has_parts
        member_of = labels_of("P463")
        if member_of:
            result["member_of"] = member_of
        if claims.get("P227"):
            result["gnd_id"] = claims["P227"][0]
        if claims.get("P213"):
            result["isni"] = claims["P213"][0]
        self._wd_details_cache[(qid, language)] = result
        return result

    def get_wikipedia_details(self, url: str) -> dict:
        """ADDITIONAL_DETAILS payload for a Wikipedia page — infobox
        rows, see-also links, main image — mirroring the keys (and the
        only-when-present shape) of the reference's scrape
        (``wikipedia_service.py:514-603``)."""
        rec = self._resolve_canonical(url)
        if rec is None:
            return {}
        result: dict = {}
        if rec.get("infobox"):
            result["infobox"] = dict(rec["infobox"])
        if rec.get("see_also"):
            result["see_also"] = list(rec["see_also"])
        if rec.get("image"):
            result["image"] = rec["image"]
        return result

    def get_dbpedia(self, url: str) -> dict | None:
        """Full SPARQL-shaped DBpedia record
        (``dbpedia_service.py:377-497``): base fields plus the ~25
        OPTIONAL-clause extras (comment, sameAs, homepage, thumbnail,
        depiction, coordinates, categories, birth/death dates+places,
        population, area, country, region, founding_date, founder,
        parent_company, part_of/has_parts/member_of URIs,
        current/former members, raw infobox dbp:* values) — each key
        present only when the synthetic resource carries it, matching
        the reference's only-when-bound decode. Memoized per url; the
        returned dict is shared — do not mutate."""
        if url in self._dbpedia_cache:
            return self._dbpedia_cache[url]
        rec = self._resolve_canonical(url)
        if rec is None or not rec["dbpedia_uri"]:
            self._dbpedia_cache[url] = None
            return None
        info = {
            "resource_uri": rec["dbpedia_uri"],
            "label": rec["label"],
            "abstract": rec["extract"],
            "types": list(rec["dbpedia_types"]),
            "subjects": list(rec["dbpedia_subjects"]),
            "language": "en",
        }
        for key, value in rec.get("db_extra", {}).items():
            info[key] = list(value) if isinstance(value, list) else (
                dict(value) if isinstance(value, dict) else value
            )
        self._dbpedia_cache[url] = info
        return info
