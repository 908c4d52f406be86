"""Scalar text utilities (chunking, cleaning, ellipsis stripping).

Semantics match the reference's ``utils/text_utils.py`` (chunker
:89-111, markdown-fence cleaner :9-56, ellipsis stripper :71-86) but
are written fresh for vectorized use inside ``map_batches`` stages.
"""

from __future__ import annotations

import re

_ELLIPSIS_RE = re.compile(r"(?:\.{3,}|…)\s*$")
# control chars (< 0x20) except \b \f \n \r \t → space
_CTRL_TO_SPACE = {
    c: " " for c in range(32) if chr(c) not in "\b\f\n\r\t"
}
_FENCE_OPEN_RE = re.compile(r"^```[^\n]*\n?")


def chunk_text(text: str, size: int, overlap: int = 0) -> list[str]:
    """Split ``text`` into overlapping character windows.

    Matches ``utils/text_utils.py:89-111``: windows of at most ``size``
    chars; the next window starts ``overlap`` chars before the previous
    end; the final window ends exactly at ``len(text)``.
    """
    if size <= 0:
        raise ValueError("chunk size must be positive")
    out: list[str] = []
    pos = 0
    n = len(text)
    while pos < n:
        stop = min(pos + size, n)
        out.append(text[pos:stop])
        if stop >= n:
            break
        pos = max(stop - overlap, 0)
    return out


def num_chunks(n_chars: int, size: int, overlap: int) -> int:
    """Closed-form count of :func:`chunk_text` windows (for the SQL oracle).

    step = size - overlap must be positive for the closed form; the
    loop semantics give 1 window when n_chars <= size, else
    1 + ceil((n_chars - size) / step).
    """
    if n_chars <= 0:
        return 0
    if n_chars <= size:
        return 1
    step = size - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than size")
    return 1 + -((-(n_chars - size)) // step)


def strip_trailing_ellipsis(text: str | None) -> str | None:
    """Drop a trailing ``...``/``…`` plus trailing whitespace
    (``utils/text_utils.py:71-86``)."""
    if not text:
        return text
    return _ELLIPSIS_RE.sub("", text).rstrip()


def clean_llm_json(raw: str) -> str:
    """Strip markdown code fences and invalid JSON control characters
    from an LLM response (``utils/text_utils.py:9-56``).

    Keeps printable characters plus ``\\b \\f \\n \\r \\t``; other
    control characters become spaces.
    """
    raw = raw.strip()
    if raw.startswith("```"):
        raw = _FENCE_OPEN_RE.sub("", raw, count=1)
        lines = raw.splitlines()
        for i in range(len(lines) - 1, -1, -1):
            if lines[i].startswith("```"):
                del lines[i]
                break
        raw = "\n".join(lines)
    # str.translate with a precomputed table: one C pass instead of a
    # per-character generator (this runs on every LLM response in the
    # actor hot path — ~1.2M chars per 600-doc batch)
    return raw.translate(_CTRL_TO_SPACE)
