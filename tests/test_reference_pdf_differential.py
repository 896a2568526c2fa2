"""Differential test of the PDF fragment-table reconstruction against the
LIVE reference (`AnnexProcessor._reconstruct_tables_from_fragments`,
/root/reference/annex_processor.py:1031-1209, run unmodified).

Both engines consume the same fragmented PDF-like cells: ours as raw spans
with geometry in media_ref, the reference as DoclingDocument text items
with ProvenanceItem bboxes built from the identical geometry. Assertion:
for every "Odpisová skupina N" section, the reference's reconstructed rows
(item, kp, desc) are a SUBSET of ours, and our extra rows are exactly the
two halves of merged physical rows ("4-15 4-16 …") — the reference's
fragment path drops those entirely (its row regex `^N-\\d+$` cannot match a
merged first cell and its item regex rejects the second item number), while
our A8 split recovers both (mirroring its `_split_merged_rows` which only
runs on docling-native tables, annex_processor.py:853-895).
"""

import contextlib
import io
import re

import pytest

_N_DOCS = 25


@pytest.fixture(scope="module")
def ref_env():
    import sys
    import types

    from tools.bench_reference import REFERENCE, _Any, _install_import_stubs, _stub

    _install_import_stubs()
    _stub("bs4", {"BeautifulSoup": _Any})
    dd = _stub("docling")
    dc = _stub("docling.document_converter", {"DocumentConverter": _Any})
    dd.document_converter = dc
    sys.path.insert(0, f"{REFERENCE}/docling_code/docling-core-main")
    sys.path.insert(0, REFERENCE)
    try:
        from docling_core.types.doc import (
            BoundingBox,
            DoclingDocument,
            ProvenanceItem,
        )

        import annex_processor
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference annex_processor not importable: {exc}")
    return DoclingDocument, BoundingBox, ProvenanceItem, annex_processor


def _annex_raws(n):
    from docling_spark.synth import synth_corpus

    out = []
    for doc_id, spans in synth_corpus(n * 6, seed=42):
        if doc_id.startswith("annex-"):
            out.append((doc_id, [(s["kind"], s["text"], s["media_ref"]) for s in spans]))
            if len(out) >= n:
                break
    return out


def _build_dl_doc(DoclingDocument, BoundingBox, ProvenanceItem, raw):
    from docling_spark.functions.textnorm import parse_geometry

    d = DoclingDocument(name="annex")
    for kind, text, ref in raw:
        if kind == "media":
            continue
        geom = parse_geometry(ref)
        prov = None
        if geom is not None:
            page, left, top = geom
            prov = ProvenanceItem(
                page_no=page,
                bbox=BoundingBox(l=left, t=top, r=left + 40, b=top - 10),
                charspan=(0, len(text or "")),
            )
        d.add_text(label="text", text=text or "", prov=prov)
    return d


def _our_tables(raw):
    """section_num -> set of (item, kp, desc) from normalize_pdf_spans."""
    from docling_spark.operators.pdf_extract import normalize_pdf_spans

    out = normalize_pdf_spans(raw)
    tables = {}
    cur_section = None
    rows = {}
    for kind, text, ref in out:
        if kind == "section_header":
            m = re.search(r"Odpisová\s+skupina\s+(\d+)", text, re.IGNORECASE)
            cur_section = m.group(1) if m else None
        elif kind == "table_cell" and cur_section and ref:
            m = re.match(r"^#/tables/\d+/r(\d+)c(\d+)$", ref)
            if m:
                r, c = int(m.group(1)), int(m.group(2))
                if r >= 1:  # r0 is our header row
                    rows.setdefault((cur_section, r), {})[c] = text
    for (sec, _r), cells in rows.items():
        tables.setdefault(sec, set()).add(
            (cells.get(0, ""), cells.get(1, ""), cells.get(2, ""))
        )
    return tables


def _decoy_rows(raw):
    """Rows the synth preamble plants BEFORE the first group header (the F15
    table-content-duplication decoys). The reference's first pass scans the
    whole document for 'N-M KP Desc' lines, so a flowed duplicate occurring
    before the real cells wins its `items_data` slot — our group-scoped
    reconstruction (and its own real corpus) is not exposed to this."""
    from docling_spark.functions.textnorm import decode_character_codes

    decoys = set()
    for _k, text, _ref in raw:
        t = decode_character_codes(text or "")
        if re.search(r"Odpisová\s+skupina", t, re.IGNORECASE):
            break
        m = re.match(r"^(\d+-\d+)\s+(\d+[\.\d]*)\s+(.+)$", t)
        if m:
            decoys.add((m.group(1), m.group(2), m.group(3)))
    return decoys


def _merged_items(raw):
    """Item numbers that only occur inside merged physical rows."""
    from docling_spark.functions.textnorm import decode_character_codes

    merged = set()
    for _k, text, _ref in raw:
        t = decode_character_codes(text or "")
        m = re.match(r"^(\d+-\d+)\s+(\d+-\d+)\s", t)
        if m:
            merged.add(m.group(1))
            merged.add(m.group(2))
    return merged


def test_fragment_table_reconstruction_matches_reference(ref_env):
    DoclingDocument, BoundingBox, ProvenanceItem, ap = ref_env

    proc = ap.AnnexProcessor()
    checked_rows = 0
    for doc_id, raw in _annex_raws(_N_DOCS):
        dl = _build_dl_doc(DoclingDocument, BoundingBox, ProvenanceItem, raw)
        with contextlib.redirect_stdout(io.StringIO()):  # its print() chatter
            ref_tables_list = proc._reconstruct_tables_from_fragments(dl, [])
        ref_tables = {}
        for t in ref_tables_list:
            m = re.search(r"Odpisová\s+skupina\s+(\d+)", t["title"], re.IGNORECASE)
            assert m, t["title"]
            ref_tables[m.group(1)] = {
                (r[0], r[1], r[2]) for r in t["data"]["rows"]
            }

        ours = _our_tables(raw)
        merged = _merged_items(raw)
        decoys = _decoy_rows(raw)
        decoy_items = {d[0] for d in decoys}
        assert set(ref_tables) == set(ours), (
            f"{doc_id}: section sets differ: {set(ref_tables)} vs {set(ours)}"
        )
        for sec, ref_rows in ref_tables.items():
            our_rows = ours[sec]
            missing = ref_rows - our_rows
            assert missing <= decoys, (
                f"{doc_id} skupina {sec}: ours missing {missing - decoys}"
            )
            extra = our_rows - ref_rows
            for item, _kp, _desc in extra:
                assert item in merged or item in decoy_items, (
                    f"{doc_id} skupina {sec}: unexplained extra row {item}"
                )
            checked_rows += len(ref_rows)
    assert checked_rows > 150, "not enough rows exercised"
