"""Furniture / boilerplate predicates (SURVEY.md §2.2 F13).

The reference drops PAGE_FOOTER labels / FURNITURE content-layer items
structurally, with a string-blocklist + phone/email regex fallback
(/root/reference/sequential_parser.py:2484-2573). This module exposes the
same decision as a pure predicate usable from vectorized batches; the Spark
plan applies the structural part (`kind IN ('page_footer','page_header')`)
natively before any UDF.
"""

from __future__ import annotations

import re

FURNITURE_KINDS = {"page_footer", "page_header"}

# Reference blocklist (sequential_parser.py:2548-2556), verbatim strings —
# these are the UI labels of the slov-lex portal, i.e. data not code.
UI_BLOCKLIST = (
    "icon-warning",
    "button-close",
    "button-search",
    "button-download",
    "button-print",
    "button-history",
    "button-content",
    "plus",
    "Ministerstvo spravodlivosti",
    "helpdesk@slov-lex",
    "Infolinka",
    "Sekcia edičných činností",
    "Račianska",
    "Vytvorené v súlade",
    "Jednotným dizajn manuálom",
    "Prevádzkovateľom služby",
    "Email",
)

_PHONE_RE = re.compile(r"^[\d\s\-]+$")
_EMAIL_RE = re.compile(r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$")
# single C-speed alternation instead of 18 Python `in` scans per span
_UI_RE = re.compile("|".join(re.escape(u) for u in UI_BLOCKLIST))


def is_furniture_text(text: str) -> bool:
    """Blocklist/phone/email fallback (structural kind check is separate)."""
    if _UI_RE.search(text):
        return True
    stripped = text.strip()
    if (
        len(stripped) > 5
        and (stripped[0].isdigit() or stripped[0] == "-")
        and _PHONE_RE.match(stripped)
    ):
        return True
    return "@" in stripped and bool(_EMAIL_RE.match(stripped))


def is_furniture_span(kind: str, text: str) -> bool:
    return kind in FURNITURE_KINDS or is_furniture_text(text or "")
