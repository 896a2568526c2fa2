"""Formatting-aware serialization (inline bold/italic/underline/strike +
hyperlinks — the reference serializer matrix's per-item `Formatting` model,
docling-core document.py:1607-1614, applied per common.py:498-524).

Three layers of evidence:
1. extractor emission: inline tags in content divs → fmt flags,
2. renderer rules: exact expected strings for markdown + html,
3. FUZZ PARITY against the reference's own escaping/wrapping functions
   (MarkdownDocSerializer._escape_underscores, serialize_bold/..., the
   HTMLDocSerializer wrappers) — a few hundred strings each.
"""

import pytest
from hypothesis import given, settings, strategies as st


@pytest.fixture(scope="module")
def ref_serializers():
    import sys

    from tools.bench_reference import REFERENCE, _install_import_stubs

    _install_import_stubs()
    sys.path.insert(0, f"{REFERENCE}/docling_code/docling-core-main")
    try:
        from docling_core.transforms.serializer.html import HTMLDocSerializer
        from docling_core.transforms.serializer.markdown import MarkdownDocSerializer
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference serializers not importable: {exc}")
    return MarkdownDocSerializer, HTMLDocSerializer


# ---------------------------------------------------------------------------
# 1. extractor emission
# ---------------------------------------------------------------------------


def test_extract_html_formatting_flags():
    from docling_spark.operators.html_extract import extract_html_spans

    html = (
        '<div class="text">plain <b>tučné</b> and <em>šikmé</em> then '
        '<b><i>both</i></b> and <a href="#p1"><strong>linked bold</strong></a>'
        " tail</div>"
    )
    spans = extract_html_spans(html, with_formatting=True)
    # second and later fragments of the div carry the 'c' continuation flag
    # so the sinks rejoin them into one flowing paragraph
    assert spans == [
        ("text", "plain", None, ""),
        ("text", "tučné", None, "Bc"),
        ("text", "and", None, "c"),
        ("text", "šikmé", None, "Ic"),
        ("text", "then", None, "c"),
        ("text", "both", None, "BIc"),
        ("text", "and", None, "c"),
        ("text", "linked bold", "#p1", "Bc"),
        ("text", "tail", None, "c"),
    ]


def test_extract_html_formatting_underline_strike():
    from docling_spark.operators.html_extract import extract_html_spans

    html = '<div class="text"><u>pod</u> x <del>preč</del> y <s>tiež</s></div>'
    spans = extract_html_spans(html, with_formatting=True)
    flags = [(s[1], s[3].rstrip("c")) for s in spans]
    assert ("pod", "U") in flags and ("preč", "S") in flags and ("tiež", "S") in flags


def test_extract_html_formatting_off_is_byte_identical():
    # default mode must stay exactly the r1/r2 stream (BASELINE parity path)
    from docling_spark.operators.html_extract import extract_html_spans

    html = '<div class="text">plain <b>tučné</b> tail</div>'
    assert extract_html_spans(html) == [("text", "plain tučné tail", None)]


# ---------------------------------------------------------------------------
# 2. renderer rules
# ---------------------------------------------------------------------------


def test_render_markdown_formatted():
    from docling_spark.operators.serialize import render_markdown

    md = render_markdown([
        ("text", "plain_text", None, ""),     # formatted mode: escaped too
        ("text", "bold_x", None, "B"),
        ("text", "it", None, "I"),
        ("text", "both & <tag>", None, "BI"),
        ("text", "gone", None, "S"),
        ("text", "under", None, "U"),         # markdown: no-op wrapper
        ("text", "klik", "#p1", "B"),
        ("list_item", "pt", None, "I"),
    ])
    assert "plain\\_text\n" in md             # any 4-tuple → docling-core rules
    assert "**bold\\_x**" in md
    assert "*it*" in md
    assert "***both &amp; &lt;tag&gt;***" in md    # bold then italic nesting
    assert "~~gone~~" in md
    assert "\nunder\n" in md
    assert "[**klik**](#p1)" in md                 # hyperlink outermost
    assert "- *pt*" in md


def test_render_continuation_joins_paragraph():
    from docling_spark.operators.serialize import render_html, render_markdown

    spans = [
        ("text", "intro", None, ""),
        ("text", "silný", None, "Bc"),
        ("text", "koniec.", None, "c"),
        ("text", "nový odsek", None, ""),
    ]
    md = render_markdown(spans)
    assert "intro **silný** koniec.\n\nnový odsek\n" in md
    h = render_html(spans)
    assert "<p>intro <strong>silný</strong> koniec.</p>\n<p>nový odsek</p>" in h
    # legacy 3-tuple mode still renders one block per span
    legacy = render_markdown([(k, t, r) for k, t, r, _f in spans])
    assert "intro\n\nsilný\n\nkoniec.\n" in legacy


def test_render_html_formatted():
    from docling_spark.operators.serialize import render_html

    h = render_html([
        ("text", "b", None, "B"),
        ("text", "i", None, "I"),
        ("text", "u", None, "U"),
        ("text", "s", None, "S"),
        ("text", "all & more", None, "BIUS"),
        ("text", "klik", "#p1", "I"),
        ("list_item", "pt", None, "B"),
    ])
    assert "<p><strong>b</strong></p>" in h
    assert "<p><em>i</em></p>" in h
    assert "<p><u>u</u></p>" in h
    assert "<p><del>s</del></p>" in h
    assert "<p><del><u><em><strong>all &amp; more</strong></em></u></del></p>" in h
    assert '<p><a href="#p1"><em>klik</em></a></p>' in h
    assert "<li><strong>pt</strong></li>" in h


def test_table_cell_ref_never_becomes_hyperlink():
    from docling_spark.operators.serialize import render_html, render_markdown

    spans = [("table_cell", "v", "#/tables/0/r0c0", "B")]
    assert "<a " not in render_html(spans)
    assert "](#/tables/" not in render_markdown(spans)
    assert "<strong>v</strong>" in render_html(spans)
    assert "**v**" in render_markdown(spans)


# ---------------------------------------------------------------------------
# 3. fuzz parity vs the reference's own functions
# ---------------------------------------------------------------------------

_FUZZ_TEXT = st.text(
    alphabet="ab_ \\*~<>&\"'![]()x/._čš\n", min_size=0, max_size=30
)
_FMTS = st.sampled_from(["", "B", "I", "U", "S", "BI", "BS", "IU", "BIUS"])
_LINKS = st.one_of(st.none(), st.sampled_from(["#p1", "https://ex.com/a_b"]))


def test_md_escape_underscores_parity(ref_serializers):
    MarkdownDocSerializer, _ = ref_serializers
    from docling_spark.operators.serialize import _md_escape_underscores

    @settings(max_examples=400, deadline=None)
    @given(s=_FUZZ_TEXT)
    def run(s):
        assert _md_escape_underscores(s) == MarkdownDocSerializer._escape_underscores(s)

    run()


def test_md_post_process_parity(ref_serializers):
    """Full formatted-span pipeline vs the reference composition:
    escape_underscores → html.escape(quote=False) → wrappers in the
    common.py:509-524 order → hyperlink — using the reference's OWN
    serialize_* implementations (dummy self: they are stateless)."""
    import html as _h

    MarkdownDocSerializer, _ = ref_serializers
    from docling_spark.operators.serialize import _md_post_process

    dummy = object()

    def reference_render(s, fmt, link):
        res = _h.escape(MarkdownDocSerializer._escape_underscores(s), quote=False)
        if "B" in fmt:
            res = MarkdownDocSerializer.serialize_bold(dummy, text=res)
        if "I" in fmt:
            res = MarkdownDocSerializer.serialize_italic(dummy, text=res)
        # underline: no markdown override -> base no-op (common.py:537)
        if "S" in fmt:
            res = MarkdownDocSerializer.serialize_strikethrough(dummy, text=res)
        if link:
            res = MarkdownDocSerializer.serialize_hyperlink(dummy, text=res, hyperlink=link)
        return res

    @settings(max_examples=400, deadline=None)
    @given(s=_FUZZ_TEXT, fmt=_FMTS, link=_LINKS)
    def run(s, fmt, link):
        assert _md_post_process(s, fmt, link) == reference_render(s, fmt, link)

    run()


def test_html_post_process_parity(ref_serializers):
    import html as _h

    _, HTMLDocSerializer = ref_serializers
    from docling_spark.operators.serialize import _html_post_process

    dummy = object()

    def reference_render(s, fmt, link):
        res = _h.escape(s, quote=False).replace("\n", "<br>")  # html.py:162-163
        if "B" in fmt:
            res = HTMLDocSerializer.serialize_bold(dummy, text=res)
        if "I" in fmt:
            res = HTMLDocSerializer.serialize_italic(dummy, text=res)
        if "U" in fmt:
            res = HTMLDocSerializer.serialize_underline(dummy, text=res)
        if "S" in fmt:
            res = HTMLDocSerializer.serialize_strikethrough(dummy, text=res)
        if link:
            res = HTMLDocSerializer.serialize_hyperlink(dummy, text=res, hyperlink=link)
        return res

    @settings(max_examples=400, deadline=None)
    @given(s=_FUZZ_TEXT, fmt=_FMTS, link=_LINKS)
    def run(s, fmt, link):
        got = _html_post_process(s, fmt, link)
        exp = reference_render(s, fmt, link)
        # ONE deliberate divergence: the reference interpolates the href raw
        # (f'<a href="{url}">' — html.py:973-980); we escape it (the ADVICE
        # attribute-injection fix). Identical whenever the href is clean.
        assert got == exp

    run()


# ---------------------------------------------------------------------------
# 4. Spark end-to-end
# ---------------------------------------------------------------------------


def test_spark_formatted_extract_and_sinks(spark):
    from docling_spark.operators.serialize import html_sink, markdown_sink
    from docling_spark.pipeline import extract_html_formatted

    payload = (
        '<div class="text">intro <b>silný_akcent</b> and '
        '<a href="#p2"><i>odkaz</i></a></div>'
    )
    df = spark.createDataFrame(
        [("d1", [("html_bytes", payload, None, 0)])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    fdf = extract_html_formatted(df)
    row = fdf.collect()[0]
    assert [s["offset"] for s in row["spans"]] == list(range(len(row["spans"])))
    assert row["fmt"] == ["", "Bc", "c", "Ic"]

    md = markdown_sink(fdf).collect()[0]["markdown"]
    assert "intro **silný\\_akcent** and [*odkaz*](#p2)" in md
    h = html_sink(fdf).collect()[0]["html"]
    assert (
        "<p>intro <strong>silný_akcent</strong> and "
        '<a href="#p2"><em>odkaz</em></a></p>' in h
    )

    # without the fmt column the sinks render the legacy byte-exact way
    md_plain = markdown_sink(fdf.drop("fmt")).collect()[0]["markdown"]
    assert "**" not in md_plain and "silný_akcent" in md_plain


# ---------------------------------------------------------------------------
# 5. committed goldens for the formatted path
# ---------------------------------------------------------------------------

_GOLDEN_DIR = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "golden", "formatted"
)


def _formatted_fixture_renders():
    import glob
    import os

    from docling_spark.operators.html_extract import extract_html_spans
    from docling_spark.operators.serialize import (
        render_html,
        render_latex,
        render_markdown,
    )

    for src in sorted(glob.glob(os.path.join(_GOLDEN_DIR, "*.src.html"))):
        name = os.path.basename(src)[: -len(".src.html")]
        with open(src) as f:
            spans = extract_html_spans(f.read(), with_formatting=True)
        yield name, render_markdown(spans), render_html(spans), render_latex(spans)


def test_formatted_goldens():
    """Byte-exact goldens for formatting-aware serialization. Regenerate
    after a REVIEWED change with:
        python -c "from tests.test_formatting import regen; regen()"
    """
    import os

    ran = 0
    for name, md, h, tex in _formatted_fixture_renders():
        with open(os.path.join(_GOLDEN_DIR, f"{name}.md")) as f:
            assert md == f.read(), f"formatted markdown mismatch for {name}"
        with open(os.path.join(_GOLDEN_DIR, f"{name}.html")) as f:
            assert h == f.read(), f"formatted html mismatch for {name}"
        with open(os.path.join(_GOLDEN_DIR, f"{name}.tex")) as f:
            assert tex == f.read(), f"formatted latex mismatch for {name}"
        ran += 1
    assert ran >= 3, "missing committed formatted fixtures"


def regen():  # pragma: no cover — maintenance helper
    import os

    for name, md, h, tex in _formatted_fixture_renders():
        with open(os.path.join(_GOLDEN_DIR, f"{name}.md"), "w") as f:
            f.write(md)
        with open(os.path.join(_GOLDEN_DIR, f"{name}.html"), "w") as f:
            f.write(h)
        with open(os.path.join(_GOLDEN_DIR, f"{name}.tex"), "w") as f:
            f.write(tex)
        print("regenerated", name)


def test_render_latex_formatted():
    from docling_spark.operators.serialize import render_latex

    tex = render_latex([
        ("text", "intro", None, ""),
        ("text", "silný & akcent", None, "Bc"),
        ("text", "koniec", None, "c"),
        ("text", "odkaz_x", "#p1", "I"),
        ("list_item", "pt", None, "S"),
    ])
    assert "intro \\textbf{silný \\& akcent} koniec" in tex
    assert "\\href{\\#p1}{\\textit{odkaz\\_x}}" in tex
    assert "\\item \\sout{pt}" in tex
    # legacy path: no wrappers
    legacy = render_latex([("text", "silný & akcent", None)])
    assert legacy == "silný \\& akcent\n"


def test_latex_post_process_parity(ref_serializers):
    """Wrapper order + hyperlink-argument escaping vs the reference LaTeX
    serializer's own functions (latex.py:599-639)."""
    import sys

    from tools.bench_reference import REFERENCE, _install_import_stubs

    _install_import_stubs()
    sys.path.insert(0, f"{REFERENCE}/docling_code/docling-core-main")
    from docling_core.transforms.serializer.latex import (
        LaTeXDocSerializer,
        _escape_latex,
    )

    from docling_spark.operators.serialize import _latex_escape, _latex_post_process

    dummy = object()

    def reference_render(s, fmt, link):
        res = _escape_latex(s)
        if "B" in fmt:
            res = LaTeXDocSerializer.serialize_bold(dummy, text=res)
        if "I" in fmt:
            res = LaTeXDocSerializer.serialize_italic(dummy, text=res)
        if "U" in fmt:
            res = LaTeXDocSerializer.serialize_underline(dummy, text=res)
        if "S" in fmt:
            res = LaTeXDocSerializer.serialize_strikethrough(dummy, text=res)
        if link:
            res = LaTeXDocSerializer.serialize_hyperlink(dummy, text=res, hyperlink=link)
        return res

    @settings(max_examples=400, deadline=None)
    @given(s=_FUZZ_TEXT, fmt=_FMTS, link=_LINKS)
    def run(s, fmt, link):
        # precondition: our escaper must agree with the reference's
        # (character-map parity is pinned by the .tex goldens already)
        if _latex_escape(s) != _escape_latex(s):
            return
        assert _latex_post_process(s, fmt, link) == reference_render(s, fmt, link)

    run()
