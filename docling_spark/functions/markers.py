"""Marker-detection predicates (SURVEY.md §2.2 F1–F10).

Semantics match the reference's detection functions
(/root/reference/sequential_parser.py:112-546) — hyperlink-primary where the
reference is hyperlink-primary, identical regex fallbacks, identical
exclusion rules — but the code is original and written to be called from
vectorized pandas batches (precompiled module-level patterns, no per-call
compilation, plain-str in/out).

All functions take *normalized* text (NBSP → space, stripped) unless noted.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

# --- F1: part marker (sequential_parser.py:112-126) ------------------------

_PART_RE = re.compile(
    r"^(PRVÁ|DRUHÁ|TRETIA|ŠTVRTÁ|PIATA|ŠIESTA|SEDMÁ|ÔSMA|DEVÄTÁ|DESIATA)\s+ČASŤ",
    re.IGNORECASE,
)


_PART_FIRST = frozenset("PDTŠSÔpdtšsô")


def detect_part_marker(text: str) -> Optional[str]:
    if not text or text[0] not in _PART_FIRST:  # O(1) guard before regex
        return None
    m = _PART_RE.match(text)
    return m.group(0).upper() if m else None


# --- F2: paragraph (§) marker, hyperlink primary (129-178) ------------------

_PARA_TEXT_RE = re.compile(r"^§\s+(\d+[a-zA-Z]*)")
_PARA_LINK_RE = re.compile(r"^#paragraf-([^.\s]+)")


def detect_paragraph_marker(text: str, hyperlink: Optional[str] = None) -> Optional[str]:
    if hyperlink:
        m = _PARA_LINK_RE.match(str(hyperlink))
        if m:
            return m.group(1)
    if not text.startswith("§ "):
        return None
    m = _PARA_TEXT_RE.match(text)
    return m.group(1) if m else None


# --- F3: odsek marker (181-243) ---------------------------------------------

_ODSEK_LINK_RE = re.compile(r"odsek-(\d+)")
_ODSEK_START_RE = re.compile(r"^\((\d+)\)\s*")
_ODSEK_NBSP_RE = re.compile(r"^\([\s\xa0]*(\d+)[\s\xa0]*\)")


def detect_odsek_marker(text: str, hyperlink: Optional[str] = None) -> Optional[str]:
    if hyperlink:
        m = _ODSEK_LINK_RE.search(str(hyperlink))
        if m:
            return m.group(1)
    if text.startswith("(") and text.endswith(")"):
        inner = text[1:-1].strip()
        if inner.isdigit():
            return inner
    m = _ODSEK_START_RE.match(text)
    if m:
        return m.group(1)
    m = _ODSEK_NBSP_RE.match(text)
    return m.group(1) if m else None


# --- F4: pismeno marker (246-312) -------------------------------------------

_PISMENO_LINK_RE = re.compile(r"pismeno-([a-z]+)", re.IGNORECASE)
_PISMENO_START_RE = re.compile(r"^([a-z]+)\)\s*", re.IGNORECASE)
_PISMENO_SPACED_RE = re.compile(r"^([a-z]+)\s+\)\s*", re.IGNORECASE)


def detect_pismeno_marker(text: str, hyperlink: Optional[str] = None) -> Optional[str]:
    if hyperlink:
        m = _PISMENO_LINK_RE.search(str(hyperlink))
        if m:
            return m.group(1).lower()
    if text.endswith(")") and not text.startswith("("):
        inner = text[:-1].strip()
        if inner and inner.isalpha():
            return inner.lower()
    # O(1) guard for the at-start regex fallbacks: marker letters are 1-2
    # chars + optional space before ')', so ')' must appear early
    if ")" not in text[:5]:
        return None
    m = _PISMENO_START_RE.match(text)
    if m and m.group(1).isalpha():
        return m.group(1).lower()
    m = _PISMENO_SPACED_RE.match(text)
    if m and m.group(1).isalpha():
        return m.group(1).lower()
    return None


# --- F5: subitem marker (315-336) -------------------------------------------

_SUBITEM_START_RE = re.compile(r"^(\d+)\.\s+")


def detect_subitem_marker(text: str) -> Optional[str]:
    if text.endswith(".") and not text.startswith("."):
        inner = text[:-1].strip()
        if inner.isdigit():
            return inner
    m = _SUBITEM_START_RE.match(text)
    return m.group(1) if m else None


# --- F6: law-end marker (339-363) -------------------------------------------


def detect_law_end_marker(text: str) -> bool:
    # One lower() + literal containment IS the fast path: it matches the
    # reference's semantics exactly (the reference lowercases the whole
    # text, so intra-word mixed case like 'účInnosť' must pass) and
    # measures 2.4x faster than a case-insensitive regex guard — Python's
    # re cannot use fast literal search under (?i).
    tl = text.lower()
    if "tento zákon nadobúda účinnosť" in tl:
        return True
    stripped = tl.rstrip()
    return stripped.endswith("v. r.") or stripped.lstrip() == "v. r."


# --- F7: annex marker with exclusions (366-419) ------------------------------

_ANNEX_K_ZAKONU_RE = re.compile(r"príloha\s+č\.\s*(\d+)\s+k\s+zákonu", re.IGNORECASE)
_ANNEX_STANDALONE_RE = re.compile(r"^príloha\s+č\.\s*(\d+)\s*$", re.IGNORECASE)
_ANNEX_PREFIX_RE = re.compile(r"^príloha\s+č\.\s*(\d+)", re.IGNORECASE)
_ANNEX_EN_RE = re.compile(r"^annex\s+(\d+)\s*$", re.IGNORECASE)


def detect_annex_marker(text: str) -> Optional[str]:
    # O(1)-ish guard: all accepted patterns contain 'ríloha'/'riloha' (any
    # case) or 'nnex' — skip the lower()+regex battery for ordinary text
    if (
        "ríloha" not in text
        and "RÍLOHA" not in text
        and "nnex" not in text
        and "NNEX" not in text
    ):
        return None
    normalized = text.lower().strip()
    if "prevziať prílohu" in normalized:
        return None
    if "tabuľka" in normalized or "tabula" in normalized:
        return None
    m = _ANNEX_K_ZAKONU_RE.search(normalized)
    if m:
        return m.group(1)
    m = _ANNEX_STANDALONE_RE.match(normalized)
    if m:
        return m.group(1)
    m = _ANNEX_PREFIX_RE.match(normalized)
    if m and (len(text) < 100 or "k zákonu" in normalized):
        return m.group(1)
    m = _ANNEX_EN_RE.match(normalized)
    return m.group(1) if m else None


# --- F8: footnotes section + footnote definition marker (422-512) ------------

_FOOTNOTE_LINK_RE = re.compile(r"poznamka-(\d+[a-z]*)")
_FOOTNOTE_SIMPLE_RE = re.compile(r"^(\d+)\)\s*$")
_FOOTNOTE_SUFFIX_RE = re.compile(r"^(\d+)([a-z]+)\)\s*$")


def detect_footnotes_section(text: str, hyperlink: Optional[str]) -> bool:
    if not hyperlink:
        return False
    return text.strip().lower() == "poznámky" and str(hyperlink) == "#poznamky"


def detect_footnote_marker(text: str, hyperlink: Optional[str]) -> Optional[str]:
    # A hyperlinked poznamka anchor is a *reference* in running text, never a
    # definition (sequential_parser.py:490-496).
    if hyperlink and "poznamka-" in str(hyperlink):
        return None
    normalized = text.strip()
    m = _FOOTNOTE_SIMPLE_RE.match(normalized)
    if m:
        return m.group(1)
    m = _FOOTNOTE_SUFFIX_RE.match(normalized)
    if m:
        return m.group(1) + m.group(2)
    return None


# --- F9: split leading marker from body text (515-546) -----------------------

_EXTRACT_ODSEK_RE = re.compile(r"^\((\d+)\)\s*(.*)$", re.DOTALL)
_EXTRACT_PISMENO_RE = re.compile(r"^([a-z]+)\)\s*(.*)$", re.IGNORECASE | re.DOTALL)
_EXTRACT_SUBITEM_RE = re.compile(r"^(\d+)\.\s+(.*)$", re.DOTALL)


def extract_marker_from_text(text: str, marker_type: str) -> Optional[Tuple[str, str]]:
    if marker_type == "odsek":
        m = _EXTRACT_ODSEK_RE.match(text)
        if m:
            return (m.group(1), m.group(2))
    elif marker_type == "pismeno":
        m = _EXTRACT_PISMENO_RE.match(text)
        if m and m.group(1).isalpha():
            return (m.group(1).lower(), m.group(2))
    elif marker_type == "subitem":
        m = _EXTRACT_SUBITEM_RE.match(text)
        if m:
            return (m.group(1), m.group(2))
    return None


# --- F10: pure § section marker vs cross-reference (1582-1624) ----------------

_PURE_SECTION_RE = re.compile(r"^§\s+\d+[a-zA-Z]*(\s+\S.*)?$")


def is_pure_section_marker(text: str) -> bool:
    t = text.strip()
    if not t.startswith("§"):
        return False
    if "ods." in t:  # "§ 27 ods. 3" is a reference, not a marker
        return False
    return bool(_PURE_SECTION_RE.match(t))


# --- F11: pismeno marker vs inline reference (549-681, 2793-2818) -------------

_REF_CUE_RE = re.compile(r"(v\s+písmen\w*|písm\.)\s*$", re.IGNORECASE)


def is_pismeno_reference_in_context(prev_texts, prev_links) -> bool:
    """True when the immediately preceding (≤3) spans indicate the pismeno
    token is a cross-reference, not a structural marker: trailing
    'v písmene'/'písm.' cue or a pismeno hyperlink on a recent span."""
    for t in prev_texts:
        if t and _REF_CUE_RE.search(t.strip()):
            return True
    for link in prev_links:
        if link and "pismeno-" in str(link):
            return True
    return False
