"""Table-driven tests for marker predicates F1-F11 (SURVEY.md §5 plan).

Cases mirror the reference's accepted/rejected inputs
(/root/reference/sequential_parser.py:112-681)."""

import pytest

from docling_spark.functions import markers as M


@pytest.mark.parametrize(
    "text,expected",
    [
        ("PRVÁ ČASŤ", "PRVÁ ČASŤ"),
        ("prvá časť všeobecné", "PRVÁ ČASŤ"),
        ("DESIATA ČASŤ", "DESIATA ČASŤ"),
        ("ČASŤ PRVÁ", None),
        ("PRVÁ HLAVA", None),
    ],
)
def test_part_marker(text, expected):
    assert M.detect_part_marker(text) == expected


@pytest.mark.parametrize(
    "text,link,expected",
    [
        ("§ 47", None, "47"),
        ("§ 10a", None, "10a"),
        ("§47", None, None),  # no space → not a marker
        ("podľa § 5", None, None),  # not at start
        ("anything", "#paragraf-47", "47"),
        ("anything", "#paragraf-47.odsek-1", "47"),
        ("anything", "#poznamky", None),
    ],
)
def test_paragraph_marker(text, link, expected):
    assert M.detect_paragraph_marker(text, link) == expected


@pytest.mark.parametrize(
    "text,link,expected",
    [
        ("(1)", None, "1"),
        ("( 2 )", None, "2"),
        ("(3) text content", None, "3"),
        ("(\xa0 4 \xa0)", None, "4"),
        ("(a)", None, None),
        ("1)", None, None),
        ("x", "#paragraf-1.odsek-7", "7"),
    ],
)
def test_odsek_marker(text, link, expected):
    assert M.detect_odsek_marker(text, link) == expected


@pytest.mark.parametrize(
    "text,link,expected",
    [
        ("a)", None, "a"),
        ("aa)", None, "aa"),
        ("b) content here", None, "b"),
        ("c )", None, "c"),
        ("(a)", None, None),
        ("1)", None, None),
        ("x", "#paragraf-1.odsek-1.pismeno-ab", "ab"),
    ],
)
def test_pismeno_marker(text, link, expected):
    assert M.detect_pismeno_marker(text, link) == expected


@pytest.mark.parametrize(
    "text,expected",
    [("1.", "1"), ("12.", "12"), ("3. obsah", "3"), (".5", None), ("a.", None)],
)
def test_subitem_marker(text, expected):
    assert M.detect_subitem_marker(text) == expected


@pytest.mark.parametrize(
    "text,expected",
    [
        ("Tento zákon nadobúda účinnosť 1. januára 2004.", True),
        ("Rudolf Schuster v. r.", True),
        ("v. r.", True),
        ("Zákon o dani", False),
    ],
)
def test_law_end(text, expected):
    assert M.detect_law_end_marker(text) is expected


@pytest.mark.parametrize(
    "text,expected",
    [
        ("Príloha č. 1 k zákonu č. 595/2003 Z. z.", "1"),
        ("Príloha č. 2", "2"),
        ("Prevziať prílohu č. 1", None),  # download link excluded
        ("Príloha č. 1 tabuľka A", None),  # table ref excluded
        ("Annex 3", "3"),
    ],
)
def test_annex_marker(text, expected):
    assert M.detect_annex_marker(text) == expected


def test_footnote_markers():
    assert M.detect_footnotes_section("Poznámky", "#poznamky") is True
    assert M.detect_footnotes_section("Poznámky", None) is False
    assert M.detect_footnote_marker("1)", None) == "1"
    assert M.detect_footnote_marker("37ab)", None) == "37ab"
    # hyperlinked = a reference in text, NOT a definition
    assert M.detect_footnote_marker("1)", "#poznamky.poznamka-1") is None


def test_extract_marker_from_text():
    assert M.extract_marker_from_text("(2) obsah odseku", "odsek") == ("2", "obsah odseku")
    assert M.extract_marker_from_text("b) obsah", "pismeno") == ("b", "obsah")
    assert M.extract_marker_from_text("3. obsah", "subitem") == ("3", "obsah")
    assert M.extract_marker_from_text("obsah", "odsek") is None


def test_pure_section_marker():
    assert M.is_pure_section_marker("§ 27") is True
    assert M.is_pure_section_marker("§ 27a") is True
    assert M.is_pure_section_marker("§ 27 Základ dane") is True
    assert M.is_pure_section_marker("§ 27 ods. 3") is False  # cross-reference
    assert M.is_pure_section_marker("podľa § 27") is False


def test_pismeno_reference_context():
    assert M.is_pismeno_reference_in_context(["uvedené v písmene"], [None]) is True
    assert M.is_pismeno_reference_in_context(["podľa písm."], [None]) is True
    assert (
        M.is_pismeno_reference_in_context(["text"], ["#paragraf-1.odsek-1.pismeno-a"])
        is True
    )
    assert M.is_pismeno_reference_in_context(["plain text"], [None]) is False
