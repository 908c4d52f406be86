"""Order-sensitive dedup rules shared by the per-document KG actor and
the corpus-wide groupby stages.

Reference semantics:

* first-wins entity dedup keyed ``wikipedia_url or name``
  (``core/orchestrator.py:56-61``),
* explicit>implicit triple dedup keyed ``(subject, predicate, object)``
  (``core/orchestrator.py:63-72``),
* explicit-over-implicit entity merge keyed ``(name, type)``
  (``core/entity_inference.py:129-133``),
* greedy fuzzy predicate clustering per undirected entity pair at
  ``SequenceMatcher.ratio() >= 0.85``, keeping the shortest predicate
  per cluster (``core/semantic_dedup_utils.py:3-36``).

All of these depend on input *order*; callers must present rows in the
reference's order (extraction order / chunk order), which the Ray
pipeline guarantees by carrying explicit ordering columns and sorting
inside every group before applying these rules (SURVEY.md §7.4).
"""

from __future__ import annotations

from difflib import SequenceMatcher


def entity_dedup_key(entity: dict) -> str:
    """``wikipedia_url or name`` (``orchestrator.py:58``)."""
    return entity.get("wikipedia_url") or entity.get("name") or ""


def dedup_entities_first_wins(entities: list[dict]) -> list[dict]:
    """Keep the first entity per key, preserving order
    (``orchestrator.py:56-61``). Entities with an empty key are dropped
    (the reference's ``if k and k not in seen``)."""
    seen: set[str] = set()
    out: list[dict] = []
    for ent in entities:
        key = entity_dedup_key(ent)
        if key and key not in seen:
            seen.add(key)
            out.append(ent)
    return out


def merge_entities_explicit_wins(
    implicit: list[dict], explicit: list[dict]
) -> list[dict]:
    """Merge keyed ``(name, type)``; implicit entries first, explicit
    overwrite (``entity_inference.py:129-133``). Order = implicit
    insertion order with overwritten slots keeping their position, then
    new explicit keys."""
    merged: dict[tuple[str, str], dict] = {
        (e.get("name", ""), e.get("type", "")): e for e in implicit
    }
    for e in explicit:
        merged[(e.get("name", ""), e.get("type", ""))] = e
    return list(merged.values())


def triple_key(rel: dict) -> tuple:
    return (rel.get("subject"), rel.get("predicate"), rel.get("object"))


def dedup_triples_explicit_wins(rels: list[dict]) -> list[dict]:
    """First occurrence per ``(s,p,o)`` wins its slot, but an explicit
    later duplicate replaces an implicit earlier one in place
    (``orchestrator.py:63-72``)."""
    by_key: dict[tuple, dict] = {}
    for rel in rels:
        key = triple_key(rel)
        held = by_key.get(key)
        if held is None:
            by_key[key] = rel
        elif held.get("inferred") == "implicit" and rel.get("inferred") == "explicit":
            by_key[key] = rel
    return list(by_key.values())


def predicate_similarity(a: str, b: str) -> float:
    """``difflib.SequenceMatcher.ratio`` as used at
    ``semantic_dedup_utils.py:27``."""
    return SequenceMatcher(None, a, b).ratio()


def fuzzy_dedup_pair_group(rels: list[dict], threshold: float = 0.85) -> list[dict]:
    """Greedy fuzzy clustering of one undirected-pair group: seed each
    cluster at the first unused triple (input order), absorb later
    triples whose predicate ratio >= threshold, keep the cluster's
    shortest predicate (``semantic_dedup_utils.py:17-35``)."""
    used: set[int] = set()
    kept: list[dict] = []
    for i, first in enumerate(rels):
        if i in used:
            continue
        cluster = [first]
        for j in range(i + 1, len(rels)):
            if j in used:
                continue
            if predicate_similarity(first["predicate"], rels[j]["predicate"]) >= threshold:
                cluster.append(rels[j])
                used.add(j)
        used.add(i)
        kept.append(min(cluster, key=lambda r: len(r["predicate"])))
    return kept


def undirected_pair_key(rel: dict) -> tuple[str, str]:
    """Canonical sortable form of ``frozenset({subject, object})``
    (``semantic_dedup_utils.py:14``); a self-relation keeps both slots
    equal."""
    s, o = rel.get("subject", ""), rel.get("object", "")
    return (s, o) if s <= o else (o, s)


def fuzzy_dedup_triples(rels: list[dict], threshold: float = 0.85) -> list[dict]:
    """Full fuzzy dedup: group by undirected pair (insertion order of
    first appearance, as a Python dict iterates), then cluster within
    each group (``semantic_dedup_utils.py:3-36``)."""
    groups: dict[tuple[str, str], list[dict]] = {}
    for rel in rels:
        groups.setdefault(undirected_pair_key(rel), []).append(rel)
    out: list[dict] = []
    for group in groups.values():
        out.extend(fuzzy_dedup_pair_group(group, threshold))
    return out
