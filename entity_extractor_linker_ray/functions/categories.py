"""Maintenance-category filtering for Wikipedia category stats.

Semantics per ``utils/category_utils.py:160-165``: a category is a
maintenance category when it *contains* any keyword (substring match);
such categories are dropped before the top-k category aggregate (G4 in
SURVEY.md §2.6). The keyword list below is a fresh, condensed set of
substring keys chosen so the broad prefixes (``"Articles with"``,
``"Pages with"``, ``"Wikipedia"`` …) subsume the reference's long tail
of specific phrases; any category caught by the reference's list is
caught by one of these supersets (proven both directions by
``tests/test_functions.py::test_maintenance_superset_of_reference``).
Deliberate over-drop: a few broad keys (``"Redirects"``, ``"Infobox"``,
``"stubs"``) also catch maintenance-flavored names the reference's list
misses; legitimate content categories are unaffected (asserted on a
real-ish sample in the same test).
"""

from __future__ import annotations

from collections.abc import Iterable

MAINTENANCE_KEYWORDS: tuple[str, ...] = (
    "Articles with",
    "All articles",
    "Articles containing",
    "Articles needing",
    "Articles lacking",
    "Articles to be",
    "Articles that",
    "Articles using",
    "Articles covered",
    "Articles which",
    "Articles where",
    "Articles without",
    "CS1",
    "Use dmy dates",
    "Use mdy dates",
    "Use British",
    "Use Canadian",
    "Wikipedia",
    "Wikipedians",
    "Short description",
    "Commons category",
    "Weblink offline",
    "Unverständliche Artikel",
    "Wartungskategorie",
    "Maintenance",
    "Cleanup",
    "Disambiguation",
    "Stub",
    "stubs",
    "Orphaned articles",
    "Dead external links",
    "Unsourced statements",
    "Unreferenced",
    "Unreviewed",
    "Uncategorized",
    "Userspace drafts",
    "User-created",
    "Deprecated templates",
    "Pages with",
    "Pages using",
    # long-tail reference phrases not subsumed by the prefixes above
    # (utils/category_utils.py:3-158 — superset proven by
    # tests/test_functions.py::test_maintenance_superset_of_reference)
    "Attempted de-orphan",
    "BLP articles lacking",
    "Categories for discussion",
    "Copied and pasted",
    "Current events",
    "Dead-end pages",
    "Incomplete disambiguation",
    "Incomplete lists",
    "Merge by month",
    "Articles requiring",
    "Articles slanted",
    "Articles sourced",
    "Recently revised",
    "Self-contradictory",
    "Vague or ambiguous",
    "Webarchive template",
    "Biography with signature",
    "Coordinates on Wikidata",
    "Pending changes",
    "Engvar",
    "Infobox",
    "Redirects",
)


def is_maintenance_category(category: str) -> bool:
    return any(kw in category for kw in MAINTENANCE_KEYWORDS)


def filter_maintenance_categories(categories: Iterable[str]) -> list[str]:
    """Drop maintenance categories, preserving order."""
    return [c for c in categories if not is_maintenance_category(c)]


def filter_category_counts(category_counts: dict) -> dict:
    """Dict-level variant matching ``category_utils.py:160-165``."""
    return {
        cat: n
        for cat, n in category_counts.items()
        if not is_maintenance_category(cat)
    }
