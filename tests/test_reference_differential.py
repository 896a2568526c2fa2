"""Differential test against the LIVE reference implementation.

Runs the reference's own state machine (sequential_parser, unmodified, on
its vendored docling-core — import stubs only for absent optional deps, see
tools/bench_reference.py) and our `reconstruct` on IDENTICAL flattened span
streams, and asserts the extracted hierarchy matches: the full sequence of
(part, paragraph, odsek, pismeno) unit openings, plus pismeno body text.

Input construction: hyperlinks are stripped on both sides. The reference's
modern processing path opens units only for markers WITHOUT hyperlinks
(`para_num and not has_hyperlink`, sequential_parser.py:2735), so text-only
streams are its native gating; with hyperlinks attached, its serializer
renders `[text](#anchor)` markdown that its own detectors do not parse.

Known reference divergence (excluded below, both documented and deliberate):
on hyperlink-free input, its modern path opens a paragraph for
cross-reference fragments like '§ 4 ods. 1' because it does not apply its
own `is_pure_section_marker` guard there (the legacy path at
sequential_parser.py:1704 does, and real converted inputs mask it via
hyperlinks). We exclude exactly the reference paragraph entries whose title
fails the reference's OWN `is_pure_section_marker` — a self-consistent
filter using its guard, not ours.
"""

import re

import pytest

_N_DOCS = 60


@pytest.fixture(scope="module")
def reference():
    import sys

    from tools.bench_reference import REFERENCE, _install_import_stubs

    _install_import_stubs()
    sys.path.insert(0, f"{REFERENCE}/docling_code/docling-core-main")
    sys.path.insert(0, REFERENCE)
    try:
        from docling_core.types.doc import DoclingDocument

        import sequential_parser
    except Exception as exc:  # pragma: no cover — environment-dependent
        pytest.skip(f"reference not importable here: {exc}")
    sequential_parser.log_progress = lambda *a, **k: None
    return DoclingDocument, sequential_parser


def _law_flats(n):
    from docling_spark.operators.html_extract import extract_html_spans
    from docling_spark.synth import synth_corpus

    flats = []
    for doc_id, spans in synth_corpus(n * 3, seed=42):
        # HTML laws AND pre-parsed docling streams (annex/PDF docs have their
        # own differential: tests/test_reference_pdf_differential.py)
        if not (doc_id.startswith("law-") or doc_id.startswith("stream-")):
            continue
        flat = []
        for s in spans:
            if s["kind"] == "html_bytes":
                flat.extend(extract_html_spans(s["text"]))
            else:
                flat.append((s["kind"], s["text"], s["media_ref"]))
        flats.append((doc_id, [(k, t, None) for k, t, _ in flat]))
        if len(flats) >= n:
            break
    return flats


def _build_dl_doc(DoclingDocument, flat):
    d = DoclingDocument(name="law")
    for kind, text, _ in flat:
        if kind == "title":
            d.add_title(text=text)
        elif kind == "section_header":
            d.add_heading(text=text)
        elif kind in ("page_footer", "page_header"):
            # real docling labels portal furniture PAGE_FOOTER/PAGE_HEADER;
            # the reference drops those structurally (F13)
            d.add_text(label=kind, text=text)
        else:
            d.add_text(label="text", text=text)
    return d


_WS = re.compile(r"\s+")


def _norm(t):
    return _WS.sub(" ", t or "").strip()


def _ref_units(structure, is_pure):
    """(markers, pismeno_texts in walk order) from the reference structure,
    with its own F10 guard applied to paragraph entries (module docstring)."""
    markers = []
    pismeno_texts = []   # walk order == marker order (asserted equal first)
    for part in structure["parts"]:
        if part["title"] != "UNNAMED PART":
            markers.append(("part", part["title"]))
        for para in part["paragraphs"]:
            # the reference's cross-ref false positive REOPENS a paragraph
            # (title like '§ 1 ods. 1'); its children are real content that
            # belongs to the true paragraph — skip only the fake marker
            if is_pure(_norm(para.get("title") or para["marker"])):
                markers.append(("paragraph", para["marker"]))
            for o in para["odseks"]:
                markers.append(("odsek", o["marker"]))
                for p in o.get("pismenos", []):
                    markers.append(("pismeno", p["marker"]))
                    pismeno_texts.append(_norm(p.get("text")))
    return markers, pismeno_texts


def _our_units(spans):
    markers = []
    pismeno_texts = []
    in_pismeno = False
    for kind, text, ref in spans:
        if kind == "part":
            markers.append(("part", text))
            in_pismeno = False
        elif kind == "paragraph":
            markers.append(("paragraph", text))
            in_pismeno = False
        elif kind == "odsek":
            markers.append(("odsek", text))
            in_pismeno = False
        elif kind == "pismeno":
            markers.append(("pismeno", text))
            pismeno_texts.append("")
            in_pismeno = True
        elif kind in ("annex", "footnote"):
            in_pismeno = False
        elif (
            kind == "text" and in_pismeno and ref
            and "pismeno" in ref and "bod" not in ref
        ):
            pismeno_texts[-1] = _norm((pismeno_texts[-1] + " " + text).strip())
    return markers, pismeno_texts


def test_hierarchy_matches_live_reference(reference):
    DoclingDocument, sp = reference
    from docling_spark.operators.hierarchy import reconstruct

    chunker = sp.SequentialLawChunker()
    mismatched = []
    text_checked = 0
    text_mismatched = []
    for doc_id, flat in _law_flats(_N_DOCS):
        st = chunker._reconstruct_document_with_docling(
            _build_dl_doc(DoclingDocument, flat)
        )
        ref_markers, ref_texts = _ref_units(st, sp.is_pure_section_marker)
        our_markers, our_texts = _our_units(reconstruct(flat))
        if ref_markers != our_markers:
            mismatched.append((doc_id, ref_markers, our_markers))
            continue
        assert len(ref_texts) == len(our_texts)  # one per pismeno opening
        for idx, rt in enumerate(ref_texts):
                text_checked += 1
                ot = our_texts[idx]
                path = idx
                # compare only the pre-law-end region: past 'Tento zákon
                # nadobúda účinnosť…' the hyperlink-free harness starves the
                # reference of its footnote/footer signals ('#poznamky',
                # PAGE_FOOTER) and the two engines park the trailing matter
                # differently — a harness artifact, not a real divergence
                _cut = "nadobúda účinnosť"
                if _cut in rt:
                    rt = rt[: rt.index(_cut)].strip()
                if _cut in ot:
                    ot = ot[: ot.index(_cut)].strip()
                # exact, OR the reference's text is a prefix of ours: its
                # cross-ref false positive truncates the unit mid-sentence
                # (the '… Postup podľa' / '§ N ods. M' split) and the tail
                # lands in the fake paragraph — ours keeps the full sentence,
                # which is also what the reference produces on its real
                # (hyperlinked) inputs
                if rt == ot or (rt and ot.startswith(rt)):
                    continue
                # OR ours is a prefix of the reference's and the extra tail
                # is (a) portal furniture — the reference's textual blocklist
                # only runs in footnotes mode (sequential_parser.py:2548-2556);
                # in main content it relies on structural FURNITURE labels its
                # real converted inputs carry, while our F13 applies globally
                # — or (b) post-law-end matter (footnote definitions etc.):
                # without the '#poznamky' hyperlink the reference has no
                # signal to leave the last pismeno, whereas our W4 law-end
                # flag is textual. Both are input-starvation artifacts of the
                # hyperlink-free harness, not real-input divergences.
                if ot and rt.startswith(ot):
                    from docling_spark.functions.furniture import is_furniture_text

                    tail = rt[len(ot):].strip()
                    if tail and (
                        is_furniture_text(tail) or "nadobúda účinnosť" in ot
                    ):
                        continue
                text_mismatched.append((doc_id, path, rt, ot))

    assert not mismatched, f"{len(mismatched)} docs diverge; first: {mismatched[0]}"
    assert text_checked > 50, "text comparison did not exercise enough units"
    assert not text_mismatched, (
        f"{len(text_mismatched)}/{text_checked} pismeno texts diverge; "
        f"first: {text_mismatched[0]}"
    )
