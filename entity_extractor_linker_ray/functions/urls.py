"""Wikipedia URL validation / normalization / parsing.

Reference semantics: validator ``utils/text_utils.py:58-69``, sanitizer
``utils/wiki_url_utils.py:3-14``, and the url→(title, lang) split
repeated across the reference (~8 sites, e.g.
``services/wikipedia_service.py:295-314``, ``core/linker.py:110-115``,
``core/orchestrator.py:96-100``) consolidated into one helper.
"""

from __future__ import annotations

import re
import urllib.parse

_WIKI_URL_RE = re.compile(r"^https?://[a-z]{2}\.wikipedia\.org/wiki/[\w\-%]+")
_LANG_RE = re.compile(r"^https?://([a-z]{2})\.wikipedia\.org/")


def is_valid_wikipedia_url(url: str | None) -> bool:
    """True when ``url`` looks like a language Wikipedia article URL
    (``utils/text_utils.py:58-69``)."""
    if not url:
        return False
    return bool(_WIKI_URL_RE.match(url))


def sanitize_wikipedia_url(url: str) -> str:
    """Re-encode the title part after ``/wiki/``: spaces become
    underscores, then percent-quote with ``safe="_()%-"``
    (``utils/wiki_url_utils.py:3-14``)."""
    if "/wiki/" not in url:
        return url
    base, title = url.split("/wiki/", 1)
    title = title.replace(" ", "_")
    return f"{base}/wiki/{urllib.parse.quote(title, safe='_()%-')}"


def parse_wiki_url(url: str) -> tuple[str, str]:
    """Split a Wikipedia URL into ``(title, lang)``.

    Title is the path segment after ``/wiki/`` with any ``#fragment``
    dropped, percent-decoded, underscores to spaces — the label
    fallback used by the packager (``core/orchestrator.py:96-100``).
    Lang is the subdomain, defaulting to ``"en"``.
    """
    raw = url.split("/wiki/")[-1].split("#")[0]
    title = urllib.parse.unquote(raw).replace("_", " ")
    m = _LANG_RE.match(url)
    return title, (m.group(1) if m else "en")


def build_wikipedia_url(title: str, lang: str = "en") -> str:
    """Construct a canonical article URL for ``title``."""
    return sanitize_wikipedia_url(
        f"https://{lang}.wikipedia.org/wiki/{title}"
    )
