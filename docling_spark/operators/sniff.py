"""Stage 1 — batched format sniffing (north_rule: "batched byte-stream format
sniffing"; SURVEY.md §7 step 3).

Classifies each document by inspecting its first spans: HTML payloads, PDF
text-cell streams (geometry-encoded media_refs and/or /cNNN runs), or
pre-parsed docling streams. Vectorized: operates on a pandas column of span
arrays, cost O(first few spans) per doc.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

HTML = "html"
PDF_LIKE = "pdf_like"
DOCLING = "docling_stream"
UNKNOWN = "unknown"

_HTML_MAGIC_RE = re.compile(r"<\s*(!doctype|html|body|div)\b", re.IGNORECASE)
_GEOM_RE = re.compile(r"^p=\d+;l=")
_CCODE_RE = re.compile(r"/c\d+")


def sniff_doc(spans: List[Tuple[str, str, Optional[str]]], probe: int = 8) -> str:
    """Classify from the first `probe` spans (kind, text, media_ref)."""
    saw_geom = saw_ccode = saw_structural = False
    for kind, text, ref in spans[:probe]:
        if kind == "html_bytes":
            return HTML
        if kind == "pdf_cell":
            return PDF_LIKE
        t = text or ""
        if _HTML_MAGIC_RE.search(t[:4096]):
            # tag-density check: >2 tags per 100 chars of probe text
            tags = t.count("<")
            if tags * 100 >= max(len(t), 1) * 0.5 or tags > 3:
                return HTML
        if ref and _GEOM_RE.match(str(ref)):
            saw_geom = True
        if _CCODE_RE.search(t):
            saw_ccode = True
        if kind in ("text", "section_header", "table_cell", "list_item", "media", "title", "caption"):
            saw_structural = True
    if saw_geom or saw_ccode:
        return PDF_LIKE
    if saw_structural:
        return DOCLING
    return UNKNOWN
