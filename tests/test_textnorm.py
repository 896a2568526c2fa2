"""Unit tests for scalar text functions C1-C6 + join_tokens A2."""

from docling_spark.functions import textnorm as TN


def test_decode_character_codes_win1250_overrides():
    # Windows-1250 high range maps to Slovak diacritics, not chr()
    assert TN.decode_character_codes("/c138") == "Š"
    assert TN.decode_character_codes("/c190") == "ľ"
    assert TN.decode_character_codes("/c232") == "č"
    assert TN.decode_character_codes("Pr/c237loha /c232. 1") == "Príloha č. 1"


def test_decode_character_codes_plain_unicode():
    assert TN.decode_character_codes("/c65/c66") == "AB"
    assert TN.decode_character_codes("no codes") == "no codes"
    assert TN.decode_character_codes("") == ""
    assert TN.decode_character_codes(None) is None


def test_decode_roundtrip_with_synth_encoder():
    import random

    from docling_spark.synth import _encode_win1250

    rng = random.Random(0)
    original = "Odpisová skupina 1 — Šťava z ľadu, čaj"
    encoded = _encode_win1250(original, rng)
    assert TN.decode_character_codes(encoded) == original


def test_normalize_text_for_matching():
    assert TN.normalize_text_for_matching("Príloha  Č.\t1") == "priloha c. 1"
    assert TN.normalize_text_for_matching("ŠŤAVA") == "stava"


def test_normalize_nbsp():
    assert TN.normalize_nbsp("a\xa0b ") == "a b"
    assert TN.normalize_nbsp(None) == ""


def test_join_tokens_punctuation_rules():
    assert TN.join_tokens(["Veta", "pokračuje", "."]) == "Veta pokračuje."
    assert TN.join_tokens(["slovo", ", ďalšie"]) == "slovo, ďalšie"
    # "(" is pure punctuation → attaches with no space on either side
    # (sequential_parser.py:858-866 semantics)
    assert TN.join_tokens(["pred", "(", "zátvorkou", ")"]) == "pred(zátvorkou)"
    assert TN.join_tokens(["", None, "x"]) == "x"
    # legal-text fixups
    assert TN.join_tokens(["podľa bodu 120 )"]) == "podľa bodu 120)"


def test_extract_references():
    refs = TN.extract_references_from_text("podľa § 5 a § 10a odseku 2")
    assert ("paragraph", "5", 6) in refs
    assert ("paragraph", "10a", 12) in refs
    assert any(r[0] == "odsek" and r[1] == "2" for r in refs)


def test_extract_footnote_refs():
    refs = TN.extract_footnotes_from_text("text¹ a [2a] koniec")
    vals = [v for v, _ in refs]
    assert "1" in vals and "2a" in vals


def test_parse_pointer():
    assert TN.parse_pointer("#/tables/5") == ("tables", 5)
    assert TN.parse_pointer("#/pictures/3") == ("pictures", 3)
    assert TN.parse_pointer("#paragraf-1") is None
    assert TN.parse_pointer(None) is None


def test_geometry_codec():
    ref = TN.encode_geometry(2, 50.5, 761.0)
    assert TN.parse_geometry(ref) == (2, 50.5, 761.0)
    assert TN.parse_geometry("img://x.png") is None
