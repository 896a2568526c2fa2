"""Head-to-head: the REFERENCE's hierarchy state machine vs ours, on
IDENTICAL flattened span streams.

The reference repo is executed unmodified from /root/reference (its
vendored docling-core provides the data model). Absent optional
dependencies are satisfied with import-time stubs — PIL / tabulate /
tree_sitter* / transformers / semchunk — none of which sit on the timed
code path (the state machine is pure-Python regex/string logic over
TextItems; verified by it producing full structures). Reference logging
(`log_progress`, one print per element) is silenced so the measurement is
algorithmic, not I/O-bound — i.e. the comparison FAVORS the reference.

Both engines consume the same flatten (ours): the reference's own
HTML→items flatten lives in the external IBM `docling` converter package
(layout models, not in its repo, not installable here), so the comparable
slice is flat item stream → hierarchical structure — the reference's core
single-pass algorithm (sequential_parser.py:5-15).

Usage: python tools/bench_reference.py [n_docs]
"""

from __future__ import annotations

import importlib.metadata as md
import sys
import time
import types

REPO = "/root/repo"
REFERENCE = "/root/reference"


def _stub(name: str, attrs=None) -> types.ModuleType:
    import importlib.machinery

    m = types.ModuleType(name)
    # a real ModuleSpec keeps importlib.util.find_spec() working on the stub
    # (pyspark.testing.utils probes tabulate with it and raises on spec None)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in (attrs or {}).items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


class _Any:
    def __getattr__(self, k):
        return _Any()

    def __call__(self, *a, **kw):
        return _Any()


def _install_import_stubs() -> None:
    pil = _stub("PIL")
    for sub in ("Image", "ImageColor", "ImageDraw", "ImageFont"):
        m = _stub(f"PIL.{sub}")
        for attr in ("Image", "ImageDraw", "ImageFont", "FreeTypeFont", "ImageColor"):
            setattr(m, attr, _Any)
        setattr(pil, sub, m)
    for ts in (
        "tree_sitter", "tree_sitter_c", "tree_sitter_java",
        "tree_sitter_javascript", "tree_sitter_python",
        "tree_sitter_typescript", "tree_sitter_cpp", "tree_sitter_c_sharp",
        "tree_sitter_go", "tree_sitter_rust",
    ):
        m = _stub(ts)
        for attr in ("Node", "Parser", "Tree", "Language", "language"):
            setattr(m, attr, _Any)
    _stub("semchunk", {"chunkerify": lambda *a, **k: _Any()})
    tr = _stub("transformers")
    tr.PreTrainedTokenizerBase = _Any
    tr.AutoTokenizer = _Any
    _stub(
        "tabulate",
        {"tabulate": lambda rows, **kw: "\n".join(" | ".join(map(str, r)) for r in rows)},
    )
    # the HTML serializer imports latex2mathml at module level (html.py:14);
    # only the formula path calls it, which our tests never exercise
    l2m = _stub("latex2mathml")
    l2m.converter = _stub("latex2mathml.converter")
    l2m.converter.convert = _Any
    l2m.converter.convert_to_element = _Any
    real_version = md.version
    md.version = lambda n: "2.0.0" if n == "docling-core" else real_version(n)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200

    _install_import_stubs()
    sys.path.insert(0, f"{REFERENCE}/docling_code/docling-core-main")
    sys.path.insert(0, REFERENCE)
    sys.path.insert(0, REPO)

    from docling_core.types.doc import DoclingDocument  # vendored, reference

    import sequential_parser  # the reference, unmodified

    from docling_spark.operators.hierarchy import reconstruct
    from docling_spark.operators.html_extract import extract_html_spans
    from docling_spark.synth import synth_corpus

    sequential_parser.log_progress = lambda *a, **k: None  # silence I/O

    docs = synth_corpus(n_docs * 3, seed=42)
    flats = []
    for doc_id, spans in docs:
        if not doc_id.startswith("law-"):
            continue
        flat = []
        for s in spans:
            if s["kind"] == "html_bytes":
                flat.extend(extract_html_spans(s["text"]))
            else:
                flat.append((s["kind"], s["text"], s["media_ref"]))
        flats.append(flat)
        if len(flats) >= n_docs:
            break
    print(f"{len(flats)} law docs, {sum(len(f) for f in flats)} spans", file=sys.stderr)

    dl_docs = []
    for flat in flats:
        d = DoclingDocument(name="law")
        for kind, text, ref in flat:
            link = ref if ref and ref.startswith("#") else None
            if kind == "title":
                d.add_title(text=text)
            elif kind == "section_header":
                d.add_heading(text=text, hyperlink=link)
            else:
                d.add_text(label="text", text=text, hyperlink=link)
        dl_docs.append(d)

    chunker = sequential_parser.SequentialLawChunker()
    chunker._reconstruct_document_with_docling(dl_docs[0])  # warm-up
    t0 = time.time()
    for d in dl_docs:
        chunker._reconstruct_document_with_docling(d)
    ref_sec = time.time() - t0

    reconstruct(flats[0])  # warm-up
    t0 = time.time()
    for f in flats:
        reconstruct(f)
    our_sec = time.time() - t0

    import json

    print(
        json.dumps(
            {
                "docs": len(flats),
                "reference_docs_per_sec": round(len(flats) / ref_sec, 1),
                "ours_docs_per_sec": round(len(flats) / our_sec, 1),
                "single_core_speedup": round(ref_sec / our_sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
