"""Tests for markdown sink (S7/C7) and law-level chunking (K5)."""

import random

from docling_spark.operators.serialize import chunk_document, render_markdown
from docling_spark.pipeline import extract_document
from docling_spark.synth import synth_corpus

_SPANS = [
    ("title", "Zákon č. 1/2020 Z. z.", None),
    ("part", "PRVÁ ČASŤ", "#cast-1"),
    ("paragraph", "§ 1", "#paragraf-1"),
    ("paragraph_title", "Predmet", None),
    ("odsek", "(1)", "#paragraf-1.odsek-1"),
    ("text", "Obsah prvého odseku.", "#paragraf-1.odsek-1"),
    ("odsek", "(2)", "#paragraf-1.odsek-2"),
    ("text", "Obsah druhého odseku.", "#paragraf-1.odsek-2"),
    ("table_cell", "A", "#/tables/0/r0c0"),
    ("table_cell", "B", "#/tables/0/r0c1"),
    ("table_cell", "1", "#/tables/0/r1c0"),
    ("table_cell", "2", "#/tables/0/r1c1"),
    ("media", "obrázok", "img://x.png"),
    ("footnote", "1)", "#poznamky.poznamka-1"),
    ("text", "Poznámka text.", "#poznamky.poznamka-1"),
]


def test_render_markdown():
    md = render_markdown(_SPANS)
    assert "# Zákon č. 1/2020 Z. z." in md
    assert "## § 1" in md
    assert "### Predmet" in md
    assert "**(1)**" in md
    assert "| A | B |" in md
    assert "| --- | --- |" in md
    assert "| 1 | 2 |" in md
    assert "![obrázok](img://x.png)" in md


def test_chunk_document_odsek_level():
    chunks = chunk_document("doc1", _SPANS, level="odsek")
    by_id = {c[1]: c for c in chunks}
    assert "doc1/paragraf-1.odsek-1" in by_id
    c1 = by_id["doc1/paragraf-1.odsek-1"]
    assert c1[2] == "odsek"
    assert "Obsah prvého odseku." in c1[3]
    # heading context: title → part → § → § title (W2 heading-scope tracking)
    assert c1[4] == ["Zákon č. 1/2020 Z. z.", "PRVÁ ČASŤ", "§ 1", "Predmet"]
    # footnote chunks whole
    assert any(c[2] == "footnote" for c in chunks)


def test_chunk_document_paragraph_level():
    chunks = chunk_document("doc1", _SPANS, level="paragraph")
    para = [c for c in chunks if c[2] == "paragraph"]
    assert len(para) == 1
    assert "Obsah prvého odseku." in para[0][3]
    assert "Obsah druhého odseku." in para[0][3]


def test_chunk_and_markdown_over_corpus():
    for doc_id, spans in synth_corpus(20, seed=42):
        out = extract_document(spans)
        md = render_markdown(out)
        assert md.strip()
        chunks = chunk_document(doc_id, out, level="odsek")
        for c in chunks:
            assert c[5] == len(c[3])  # content_length consistent


def test_spark_sinks(spark, corpus_path):
    from docling_spark.operators.serialize import chunk_sink, markdown_sink
    from docling_spark.pipeline import extract

    normalized = extract(spark.read.parquet(corpus_path))
    md = markdown_sink(normalized)
    assert md.filter("markdown is null or markdown = ''").count() == 0
    assert md.count() == 60
    chunks = chunk_sink(normalized, level="odsek")
    assert chunks.filter("content_length != length(content)").count() == 0
    assert chunks.count() > 0
    for df in (md, chunks):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
