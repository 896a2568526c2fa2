"""F15 — table-content text exclusion (SURVEY.md §2.2).

Drops flowed text spans whose content already lives in an extracted table:
the reference builds a normalized exclusion set from all table-cell texts
(plus their individual words > 3 chars) and then filters any text that
matches the set or looks like a table-row/code fragment
(/root/reference/annex_processor.py:605-684). Re-expressed here as two pure
functions used as a per-document post-pass inside the PDF normalization
stage — equivalently `array_contains` against collected cell texts, but the
set form keeps the stage zero-shuffle.
"""

from __future__ import annotations

import re
from typing import Iterable, Set

_ROW_RE = re.compile(r"^[- ]*\d+-\d+\s+\d+[.\d]*\s+")
_CODE_RE = re.compile(r"^\d+\.\d+\.?\d*\s*$")
_ITEM_RE = re.compile(r"^\d+-\d+\s*$")
_CODE_FRAG_RE = re.compile(r"\d+\.\d+\.?\d*")


def build_exclusion_set(cell_texts: Iterable[str]) -> Set[str]:
    """Normalized cell texts + their meaningful (>3 char) words."""
    excl: Set[str] = set()
    for cell in cell_texts:
        if not cell:
            continue
        normalized = cell.strip().lower()
        if not normalized:
            continue
        excl.add(normalized)
        words = normalized.split()
        if len(words) > 1:
            for word in words:
                if len(word) > 3:
                    excl.add(word)
    return excl


def is_table_content(text: str, exclusion: Set[str]) -> bool:
    """True when a flowed text span duplicates extracted table content.

    Mirrors the reference's rule order: too-short guard, list/heading marker
    strip, exact set hit, meaningful-word hit, then the code-pattern
    heuristics ('N-M KP Desc' row shape, bare KP codes, bare item numbers,
    ≥2 code fragments)."""
    if not text or len(text.strip()) < 3:
        return False
    cleaned = text.strip()
    if cleaned.startswith("- "):
        cleaned = cleaned[2:].strip()
    if cleaned.startswith("## "):
        cleaned = cleaned[3:].strip()
    normalized = cleaned.lower()

    if normalized in exclusion:
        return True
    for word in normalized.split():
        if len(word) > 3 and word in exclusion:
            return True
    if _ROW_RE.match(normalized):
        return True
    if _CODE_RE.match(normalized):
        return True
    if _ITEM_RE.match(normalized):
        return True
    if len(_CODE_FRAG_RE.findall(normalized)) >= 2:
        return True
    return False
