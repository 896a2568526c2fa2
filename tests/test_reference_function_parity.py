"""Function-level differential fuzzing against the reference's own
detectors and normalizers (F1–F10, C1–C2, A2).

The reference's `sequential_parser` imports in this sandbox (see
tools/bench_reference.py for the import-stub mechanism); its detector /
normalizer functions have the same signatures as ours, so every pair is
fuzzed for exact output equality over Slovak-legal-flavored inputs —
the strongest possible form of the SURVEY §2.2/§2.8 parity claims.
"""

import pytest
from hypothesis import given, settings, strategies as st

_ALPHABET = (
    "aábcčdďeéfghiíjklĺľmnňoóôpqrŕsštťuúvwxyýzž"
    "AÁBCČDĎEÉFGHIÍJKLĹĽMNŇOÓÔPQRŔSŠTŤUÚVWXYÝZŽ"
    "0123456789 ()§.,-/cč\xa0\n\t"
)
_texts = st.text(alphabet=_ALPHABET, min_size=0, max_size=40)
_marker_like = st.sampled_from(
    [
        "PRVÁ ČASŤ", "DRUHÁ ČASŤ ZÁKLADNÉ", "prvá časť", "TŘETIA ČASŤ",
        "§ 1", "§ 27a", "§ 27 ods. 3", "§ 1 Predmet", "§1", "§  5",
        "(1)", "(12) text", "( 3 )", "(\xa02)", "(x)",
        "a)", "ab) text", "a )", "z)", "aa)", "1)", "A)",
        "1. text", "12.", "3.14", "1.",
        "Tento zákon nadobúda účinnosť 1. januára 2020.", "Janko Mrkvička v. r.",
        "v. r.", "V. R.", "nadobúda účinnosť",
        "Príloha č. 1 k zákonu č. 595/2003 Z. z.", "Príloha č. 2",
        "Prevziať prílohu č. 1", "Príloha č. 3 tabuľka", "Annex 1",
        "/c138/c232", "text /c65 text", "/c99999", "/c",
    ]
)
_links = st.one_of(
    st.none(),
    st.sampled_from(
        [
            "#paragraf-1", "#paragraf-27a", "#paragraf-1.odsek-2",
            "#paragraf-1.odsek-2.pismeno-a", "#odsek-3", "#pismeno-b",
            "#poznamky", "#poznamka-1", "junk", "",
        ]
    ),
)
_inputs = st.one_of(_texts, _marker_like)


@pytest.fixture(scope="module")
def ref():
    import sys

    from tools.bench_reference import REFERENCE, _install_import_stubs

    _install_import_stubs()
    sys.path.insert(0, f"{REFERENCE}/docling_code/docling-core-main")
    sys.path.insert(0, REFERENCE)
    try:
        import sequential_parser
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference not importable: {exc}")
    sequential_parser.log_progress = lambda *a, **k: None
    return sequential_parser


def _fuzz_eq(ours, theirs, strategy, n=400):
    @settings(max_examples=n, deadline=None)
    @given(args=strategy)
    def run(args):
        assert ours(*args) == theirs(*args), args

    run()


def test_part_marker_parity(ref):
    from docling_spark.functions import markers as M

    _fuzz_eq(M.detect_part_marker, ref.detect_part_marker, st.tuples(_inputs))


def test_paragraph_marker_parity(ref):
    from docling_spark.functions import markers as M

    _fuzz_eq(
        M.detect_paragraph_marker,
        ref.detect_paragraph_marker,
        st.tuples(_inputs, _links),
    )


def test_odsek_marker_parity(ref):
    from docling_spark.functions import markers as M

    _fuzz_eq(
        M.detect_odsek_marker, ref.detect_odsek_marker, st.tuples(_inputs, _links)
    )


def test_pismeno_marker_parity(ref):
    from docling_spark.functions import markers as M

    _fuzz_eq(
        M.detect_pismeno_marker, ref.detect_pismeno_marker, st.tuples(_inputs, _links)
    )


def test_subitem_marker_parity(ref):
    from docling_spark.functions import markers as M

    _fuzz_eq(M.detect_subitem_marker, ref.detect_subitem_marker, st.tuples(_inputs))


def test_law_end_marker_parity(ref):
    from docling_spark.functions import markers as M

    _fuzz_eq(M.detect_law_end_marker, ref.detect_law_end_marker, st.tuples(_inputs))


def test_annex_marker_parity(ref):
    from docling_spark.functions import markers as M

    _fuzz_eq(M.detect_annex_marker, ref.detect_annex_marker, st.tuples(_inputs))


def test_extract_marker_parity(ref):
    from docling_spark.functions import markers as M

    _fuzz_eq(
        M.extract_marker_from_text,
        ref.extract_marker_from_text,
        st.tuples(_inputs, st.sampled_from(["odsek", "pismeno", "subitem"])),
    )


def test_pure_section_marker_parity(ref):
    from docling_spark.functions import markers as M

    _fuzz_eq(M.is_pure_section_marker, ref.is_pure_section_marker, st.tuples(_inputs))


def test_decode_character_codes_parity(ref):
    from docling_spark.functions import textnorm as T

    _fuzz_eq(
        T.decode_character_codes, ref.decode_character_codes, st.tuples(_inputs)
    )


def test_normalize_for_matching_parity(ref):
    from docling_spark.functions import textnorm as T

    _fuzz_eq(
        T.normalize_text_for_matching,
        ref.normalize_text_for_matching,
        st.tuples(_inputs),
    )


def test_join_tokens_parity(ref):
    from docling_spark.functions import textnorm as T

    toks = st.lists(
        st.one_of(_texts, st.sampled_from([".", ",", ";", "(", ")", "»", "«", ""])),
        min_size=0,
        max_size=8,
    )
    _fuzz_eq(T.join_tokens, ref.join_tokens, st.tuples(toks))
