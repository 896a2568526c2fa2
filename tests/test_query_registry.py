"""Pins the driver-window composition (VERDICT r4 task 9).

The driver's CORRECTNESS gate checks the FIRST 50 entries of
`__spark_entry__.queries()` in dict order. Round 2 demonstrated the
failure mode this test kills: a reorder silently demoted operator families
out of the gated window. Every SURVEY §2 family and every LLM-pipeline
operator family must keep an oracle-bearing representative inside the
window, and every registered query must carry a full oracle."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E

# family → window representative. One entry per SURVEY §2 family
# (scan/sink S, filter F, join J, agg A, window W, sort O, set E,
# scalar C, chunker K) and per LLM-pipeline op family. The value must sit
# in the gated window; tail entries may ONLY be queries a window entry
# subsumes (documented in queries()' docstring).
WINDOW_FAMILIES = {
    # §2.1 scans / sources / sinks
    "S1/S2 extraction": "extract_normalized",
    "S7 markdown+formatting sink": "formatted_markdown",
    "S7b html sink": "html_sink",
    "S7d latex sink": "latex_sink",
    "S7f kv/form": "kv_form_sinks",
    "S7h azure sink": "azure_sink",
    "S3b doctags roundtrip": "doctags_roundtrip",
    "S8 chunk sinks": "chunk_export_rag",
    # §2.2 filters
    "F1-F9 markers": "marker_extract",
    "F11 lookbehind": "lookbehind_flags",
    "F13 furniture": "furniture_filter",
    # §2.3 joins
    "J1 as-of": "asof_last_marker",
    "J2 range join": "range_join_bands",
    "J4 enrichment": "extract_full",
    "J5 annex broadcast": "annex_integration",
    "J6 reading order": "reading_order",
    "J8 anti-join": "anti_join_audit",
    # §2.4 aggregations
    "A1 accumulate": "text_accumulate",
    "A3 counters": "level_counters",
    "A4 running offset": "running_offset",
    "A5 pivot": "source_pivot",
    "A10 grid densify": "grid_densify",
    # §2.8 scalars
    "C1 decode": "decode_chars",
    "C2 normalize": "normalize_match",
    "C4 references": "reference_extract",
    "C8 triplets": "render_triplets",
    "A2 join_tokens": "join_tokens",
    # §2.9 chunkers
    "K1/K5 hierarchical/law": "law_chunks",
    "K2-K4 hybrid": "hybrid_chunks",
    "K6 code": "code_chunks",
    "W5 chunk split": "chunk_split",
    # LLM-pipeline operator families
    "exact dedup": "dedup_exact",
    "minhash near-dup curation": "neardup_curation",
    "simhash near-dup": "simhash_neardup",
    "substring dedup": "substring_dedup",
    "ngram jaccard": "ngram_jaccard",
    "C4 cleaning": "c4_clean",
    "repetition": "repetition_stats",
    "decontamination": "decontamination",
    "stratified sampling": "stratified_sample",
    "SemDeDup + assignment reuse": "semdedup_reuse",
    "ANN recall harness": "ann_recall",
    "embedding near-dup": "embedding_neardup",
    "lang id": "lang_id",
    "quality": "quality_score",
    "token count": "token_count",
    "fingerprint": "fingerprint",
    "PII": "pii_scrub",
    "curation e2e": "curation_e2e",
    "multimodal": "multimodal_neardup",
}


def test_every_family_has_window_representative():
    window = list(E.queries())[:50]
    missing = {fam: q for fam, q in WINDOW_FAMILIES.items() if q not in window}
    assert not missing, f"families demoted out of the driver window: {missing}"


def test_window_is_exactly_50_and_all_oracled():
    qs, oracles = E.queries(), E.oracle_sql()
    assert len(qs) >= 50
    assert set(qs) == set(oracles), (
        "every queries() entry needs a full oracle_sql() entry; diff = "
        f"{set(qs) ^ set(oracles)}"
    )


def test_tail_entries_are_documented_as_subsumed():
    """Tail (51+) queries must each be named in the queries() docstring's
    subsumption map — an undocumented tail entry means an operator family
    silently left the gate."""
    qs = E.queries()
    doc = E.queries.__doc__
    for name in list(qs)[50:]:
        assert f"`{name}`" in doc or name in doc, (
            f"tail query {name!r} not documented as subsumed/rotated in the "
            "queries() docstring"
        )
