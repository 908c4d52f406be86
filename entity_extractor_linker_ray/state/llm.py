"""Pluggable LLM client + the deterministic rule-based stub.

The reference makes OpenAI chat calls from six call sites (extraction
``services/openai_service.py:24-131``, entity inference
``core/entity_inference.py:27-133``, explicit/implicit relations + KGC +
inline pair dedup ``core/relationship_inference.py:46-375``, pairwise
dedup ``core/deduplication_utils.py:12-87``, compendium
``services/compendium_service.py:9-89``). This engine talks to a
``LLMClient`` protocol instead; :class:`StubLLMClient` is a
deterministic rule-based implementation of every one of those wire
formats, dispatching on the reference's own prompt markers so the SAME
stub can drive the reference code (via a fake ``openai`` module in the
golden-parity tests) and this engine's actors — making triple P/R vs
the reference exactly measurable (SURVEY.md §5.1).
"""

from __future__ import annotations

import json
import re
import zlib
from typing import Protocol

from entity_extractor_linker_ray.state.kb import KBSnapshot

EXPLICIT_PREDICATES = ["uses", "feeds", "joins", "precedes", "links to"]
IMPLICIT_PREDICATES = ["supports", "relates to", "depends on", "shares context"]
# near-duplicate of each explicit predicate with
# difflib ratio >= 0.85 — planted to exercise the LLM pair dedup
# (deduplication_utils.py:31-45) and the 0.85 fuzzy filter
# (semantic_dedup_utils.py:27-32)
NEAR_DUP = {
    "uses": "use",
    "feeds": "feed",
    "joins": "join",
    "precedes": "precede",
    "links to": "link to",
}
KGC_PREDICATE = "connected to"

_INT_RE = re.compile(r"(?:up to|at most|bis zu|höchstens|exactly|genau) (\d+)")


def stable_hash(*parts: str) -> int:
    return zlib.crc32("|".join(parts).encode("utf-8"))


class LLMClient(Protocol):
    def chat(self, messages: list[dict], **kwargs) -> str: ...


def _find_json_array(text: str, marker: str):
    idx = text.find(marker)
    if idx < 0:
        return None
    start = text.find("[", idx)
    if start < 0:
        return None
    try:
        value, _ = json.JSONDecoder().raw_decode(text, start)
        return value
    except ValueError:
        return None


class StubLLMClient:
    """Deterministic drop-in for every reference LLM call.

    All rules are pure functions of (prompt text, KB snapshot):

    * **extract**: KB surface forms found in the text (whole-word,
      case-insensitive), ordered by first occurrence, capped at the
      prompt's max; one ``name; type; url; citation`` line each, with
      the KB's planted ``llm_url`` (sometimes empty / a redirect — see
      ``state/kb.py``) and the matched text span as citation.
    * **explicit relations**: entities that occur in the text ordered
      by first occurrence; consecutive pairs get a predicate picked by
      a stable hash of (subject, object).
    * **implicit relations**: skip-one pairs, plus a planted
      near-duplicate of the first explicit predicate.
    * **KGC**: every still-unconnected unordered pair (capped) gets
      ``connected to`` — converges after one round.
    * **pair dedup**: prefer explicit, then shortest predicate, then
      lexicographic; return a single-entry JSON array.
    * **entity inference**: each explicit entity's KB parent not already
      present, citation ``generated``.
    * **compendium**: deterministic template text.
    """

    _WORD_RE = re.compile(r"\w+")

    def __init__(self, kb: KBSnapshot | None = None, language: str = "en"):
        self.kb = kb if kb is not None else KBSnapshot()
        self.language = language
        # per-name compiled whole-word patterns for _entity_positions:
        # stdlib re's 512-slot compile cache thrashes at 1506 KB names
        # (re._compile showed up as ~10% of the actor kernel); the dict
        # is bounded by the KB-derived name vocabulary per actor
        self._name_pats: dict[str, re.Pattern] = {}
        # Token-sequence form index: lowercase word-token tuple of each
        # surface form (label / label_de / aliases) → records. One
        # O(tokens) scan per text instead of one regex pass per record
        # — the O(|KB|) regex loop was fine at 14 records but is the
        # hot path at 1506 (flagship bench runs this per document).
        # Whole-word semantics are preserved: \w+ tokenization matches
        # the old (?<!\w)form(?!\w) boundaries on every corpus/template
        # text (forms are pure word-char token sequences).
        self._forms_by_len: dict[int, dict[tuple[str, ...], list[dict]]] = {}
        self._max_form_len = 1
        for rec in self.kb.records:
            for form in {rec["label"], rec["label_de"], *rec["aliases"]}:
                key = tuple(m.group(0).lower()
                            for m in self._WORD_RE.finditer(form))
                if not key:
                    continue
                bucket = self._forms_by_len.setdefault(len(key), {})
                recs = bucket.setdefault(key, [])
                if rec not in recs:
                    recs.append(rec)
                self._max_form_len = max(self._max_form_len, len(key))

    # ------------------------------------------------------------------
    def chat(self, messages: list[dict], **kwargs) -> str:
        system = ""
        user = ""
        for msg in messages:
            if msg.get("role") == "system":
                system = msg.get("content", "")
            elif msg.get("role") == "user":
                user = msg.get("content", "")
        if "Übersetzungen wissenschaftlicher Begriffe" in system:
            return self._translate(user)
        if ("entity recognition and Wikidata" in system
                or "Entitätserkennung" in system):
            return self._synonyms(user)
        if ("entities relevant to the topic" in system
                or "Entitäten zum Thema" in system):
            return self._generate_entities(system)
        if "recognizing and linking entities" in system or "Erkennung und Verlinkung von Entitäten" in system:
            return self._extract_entities(system, user)
        if "enriching an existing entity list" in system or "Entitätenliste anreichert" in system:
            return self._infer_entities(system, user)
        if "deduplicating knowledge graph relationships" in system or "Bereinigung von Knowledge-Graph-Beziehungen" in system:
            return self._dedup_pair(user)
        if "knowledge graph completion" in system.lower() or "Knowledge-Graph-Completion" in system:
            return self._kgc(system, user)
        if "knowledge graph enrichment" in system or "Wissensgraph-Anreicherung" in system:
            return self._implicit_relations(system, user)
        if ("Extract ONLY explicit" in system or "NUR explizite Beziehungen" in system
                or "ALL possible relationships" in system or "ALLE möglichen Beziehungen" in system
                or "knowledge extraction" in system):
            return self._explicit_relations(system, user)
        # compendium or unknown → deterministic filler
        return self._compendium(user)

    # ------------------------------------------------------------------
    def _limit(self, text: str, default: int) -> int:
        m = _INT_RE.search(text)
        return int(m.group(1)) if m else default

    def find_mentions(self, text: str) -> list[dict]:
        """KB entities present in ``text``: (record, first position,
        matched span), ordered by (position, label). One tokenizing
        pass; each record reports its FIRST matching form occurrence
        (min char position over all its forms). Multi-word forms match
        only when consecutive tokens are separated by EXACTLY one
        space — the literal-form semantics of the pre-tokenizer regex
        alternation ('scan. Column' or 'query-engine' must NOT match a
        'Scan Column' bigram)."""
        words = [(m.group(0).lower(), m.start(), m.end())
                 for m in self._WORD_RE.finditer(text)]
        # bad_gaps prefix sum: bad_gaps[j] = #non-single-space
        # separators among the first j inter-token gaps → an n-gram at
        # i is contiguous iff the count over gaps [i, i+n-1) is zero
        bad_gaps = [0]
        for j in range(len(words) - 1):
            single_space = text[words[j][2]:words[j + 1][1]] == " "
            bad_gaps.append(bad_gaps[-1] + (0 if single_space else 1))
        best: dict[int, tuple[int, int, dict]] = {}  # id(rec) -> (pos, end, rec)
        for n, table in self._forms_by_len.items():
            for i in range(len(words) - n + 1):
                if n > 1 and bad_gaps[i + n - 1] != bad_gaps[i]:
                    continue
                key = tuple(w[0] for w in words[i:i + n])
                recs = table.get(key)
                if not recs:
                    continue
                pos, end = words[i][1], words[i + n - 1][2]
                for rec in recs:
                    cur = best.get(id(rec))
                    # min position; longest span on a position tie
                    # (the old length-desc regex alternation behavior)
                    if (cur is None or pos < cur[0]
                            or (pos == cur[0] and end > cur[1])):
                        best[id(rec)] = (pos, end, rec)
        found = [
            {"rec": rec, "pos": pos, "span": text[pos:end]}
            for pos, end, rec in best.values()
        ]
        found.sort(key=lambda f: (f["pos"], f["rec"]["label"]))
        return found

    def _entity_positions(self, text: str, names: list[str]) -> list[tuple[int, str]]:
        """First whole-word occurrence of each name; absent names are
        excluded. Order: (position, name)."""
        out = []
        for name in names:
            pat = self._name_pats.get(name)
            if pat is None:
                pat = re.compile(
                    rf"(?<!\w){re.escape(name)}(?!\w)", re.IGNORECASE
                )
                self._name_pats[name] = pat
            m = pat.search(text)
            if m:
                out.append((m.start(), name))
        out.sort()
        return out

    # -- extraction ----------------------------------------------------
    def _extract_entities(self, system: str, user: str) -> str:
        text = user.split("Text: ", 1)[-1]
        limit = self._limit(system, 15)
        lines = []
        for f in self.find_mentions(text)[:limit]:
            rec = f["rec"]
            lines.append(f"{rec['label']}; {rec['type']}; {rec['llm_url']}; {f['span']}")
        return "\n".join(lines)

    # -- generate mode ---------------------------------------------------
    _TOPIC_RE = re.compile(
        r"(?:relevant to the topic|Entitäten zum Thema): (.*?)\.\n\n"
        r"(?:Output format|Ausgabeformat)",
        re.DOTALL,
    )

    def _generate_entities(self, system: str) -> str:
        """Generate-mode rule (``generation_prompts.py:6-45``): the
        prompt carries a TOPIC, not a text block; the deterministic
        stand-in 'generates' the KB entities mentioned in the topic with
        the prompt-mandated citation \"generated\". Works unchanged for
        the reference's prompt and the engine's (same structural
        markers)."""
        m = self._TOPIC_RE.search(system)
        topic = m.group(1) if m else ""
        limit = self._limit(system, 15)
        lines = []
        for f in self.find_mentions(topic)[:limit]:
            rec = f["rec"]
            lines.append(f"{rec['label']}; {rec['type']}; {rec['llm_url']}; generated")
        return "\n".join(lines)

    # -- entity inference ----------------------------------------------
    def _infer_entities(self, system: str, user: str) -> str:
        explicit = _find_json_array(user, "entities:") or _find_json_array(user, "Entitäten:") or []
        have = {e.get("name", "") for e in explicit}
        lines = []
        for ent in explicit:
            rec = self.kb.by_label.get(ent.get("name", ""))
            if not rec or not rec["part_of"]:
                continue
            parent = self.kb.by_label.get(rec["part_of"][0])
            if not parent or parent["label"] in have:
                continue
            have.add(parent["label"])
            lines.append(
                f"{parent['label']}; {parent['type']}; {parent['url_en']}; generated"
            )
        return "\n".join(lines)

    # -- relations ------------------------------------------------------
    @staticmethod
    def _rel_text(user: str) -> str:
        if "```" in user:
            return user.split("```", 2)[1]
        return user

    def _rel_entities(self, user: str) -> list[str]:
        ents = _find_json_array(user, "Entities:") or _find_json_array(user, "Entitäten:") or []
        return [e.get("name", "") for e in ents if e.get("name")]

    def _explicit_relations(self, system: str, user: str) -> str:
        text = self._rel_text(user)
        ordered = [n for _, n in self._entity_positions(text, self._rel_entities(user))]
        limit = self._limit(user, 15)
        lines = []
        for a, b in zip(ordered, ordered[1:]):
            pred = EXPLICIT_PREDICATES[stable_hash(a, b) % len(EXPLICIT_PREDICATES)]
            lines.append(f"{a}; {pred}; {b}")
        return "\n".join(lines[:limit])

    def _implicit_relations(self, system: str, user: str) -> str:
        text = self._rel_text(user)
        ordered = [n for _, n in self._entity_positions(text, self._rel_entities(user))]
        limit = self._limit(user, 15)
        lines = []
        if len(ordered) >= 2:
            a, b = ordered[0], ordered[1]
            pred = EXPLICIT_PREDICATES[stable_hash(a, b) % len(EXPLICIT_PREDICATES)]
            lines.append(f"{a}; {NEAR_DUP[pred]}; {b}")
        for i in range(len(ordered) - 2):
            a, b = ordered[i], ordered[i + 2]
            pred = IMPLICIT_PREDICATES[stable_hash(a, b) % len(IMPLICIT_PREDICATES)]
            lines.append(f"{a}; {pred}; {b}")
        return "\n".join(lines[:limit])

    def _kgc(self, system: str, user: str) -> str:
        text = self._rel_text(user)
        ordered = [n for _, n in self._entity_positions(text, self._rel_entities(user))]
        existing = (_find_json_array(user, "Existing relationships:")
                    or _find_json_array(user, "Bestehende Beziehungen:") or [])
        connected = set()
        for rel in existing:
            pair = frozenset((rel.get("subject", ""), rel.get("object", "")))
            connected.add(pair)
        limit = self._limit(user, 15)
        lines = []
        for i in range(len(ordered)):
            for j in range(i + 1, len(ordered)):
                a, b = ordered[i], ordered[j]
                if frozenset((a, b)) in connected:
                    continue
                connected.add(frozenset((a, b)))
                lines.append(f"{a}; {KGC_PREDICATE}; {b}")
                if len(lines) >= limit:
                    return "\n".join(lines)
        return "\n".join(lines)

    # -- pair dedup -----------------------------------------------------
    @staticmethod
    def dedup_rule(candidates: list[dict]) -> dict:
        """Pure dedup policy shared with tests: prefer explicit, then
        shortest predicate, then lexicographic."""
        def rank(c):
            return (
                0 if c.get("inferred", "explicit") == "explicit" else 1,
                len(c.get("predicate", "")),
                c.get("predicate", ""),
            )
        return min(candidates, key=rank)

    def _dedup_pair(self, user: str) -> str:
        rels = (_find_json_array(user, "Relationships:")
                or _find_json_array(user, "Beziehungen:") or [])
        if not rels:
            return "[]"
        best = self.dedup_rule(rels)
        return json.dumps(
            [{"predicate": best.get("predicate", ""),
              "inferred": best.get("inferred", "explicit")}]
        )

    # -- A8/A9 translate + synonyms ------------------------------------
    @staticmethod
    def _quoted_term(user: str) -> str:
        m = re.search(r"'([^']+)'", user)
        return m.group(1) if m else ""

    def _translate(self, user: str) -> str:
        """Deterministic translate-to-English: KB surface form → English
        label; unknown terms come back unchanged (the reference's LLM
        would return its best guess — unchanged is the conservative
        deterministic stand-in)."""
        term = self._quoted_term(user)
        rec = self.kb.search.get(term.lower())
        return rec["label"] if rec else term

    def _synonyms(self, user: str) -> str:
        """Deterministic 3-synonym list: the KB record's redirect titles
        and other-language label, JSON-array-encoded like the reference
        expects; unknown names yield []."""
        name = self._quoted_term(user)
        rec = self.kb.search.get(name.lower())
        if not rec:
            return "[]"
        candidates = [*rec["redirect_from"], rec["label_de"], rec["label"]]
        synonyms = [c for c in candidates if c.lower() != name.lower()]
        return json.dumps(synonyms[:3])

    # -- compendium -----------------------------------------------------
    def _compendium(self, user: str) -> str:
        n_refs = user.count("http")
        return (
            "Synthetic compendium. "
            f"Sources referenced: {n_refs}. "
            "This deterministic text stands in for the LLM-generated "
            "compendium (compendium_service.py:74-86)."
        )
