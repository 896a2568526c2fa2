"""Tests for table association: J1 as-of context (window form ≡ per-doc
form), F12 classifier, J3 fuzzy match, J8 audit."""

import pytest
from pyspark.sql import functions as F

from docling_spark.operators.tables import (
    assign_table_context,
    assign_table_context_perdoc,
    classify_table_cells,
    find_table_by_text_match,
    table_assignment_audit,
)
from docling_spark.pipeline import extract


@pytest.fixture(scope="module")
def normalized(spark, corpus_path):
    return extract(spark.read.parquet(corpus_path)).cache()


def test_asof_context_window_equals_perdoc(spark, normalized):
    """Equivalence of the two J1 forms — mirrors the reference's
    verify_results_identical harness."""
    win = {
        (r["doc_id"], r["table_ref"]): (r["section_marker"], r["subsection_marker"], r["table_offset"])
        for r in assign_table_context(normalized).collect()
    }
    per = {}
    for row in normalized.collect():
        spans = [(s["kind"], s["text"], s["media_ref"]) for s in row["spans"]]
        for t, sec, sub, off in assign_table_context_perdoc(spans):
            per[(row["doc_id"], t)] = (sec, sub, off)
    assert win == per
    assert len(win) > 0


def test_asof_context_semantics(spark):
    spans = [
        {"kind": "paragraph", "text": "§ 1", "media_ref": "#paragraf-1", "offset": 0},
        {"kind": "odsek", "text": "(1)", "media_ref": None, "offset": 1},
        {"kind": "table_cell", "text": "A", "media_ref": "#/tables/0/r0c0", "offset": 2},
        {"kind": "paragraph", "text": "§ 2", "media_ref": "#paragraf-2", "offset": 3},
        {"kind": "table_cell", "text": "B", "media_ref": "#/tables/1/r0c0", "offset": 4},
    ]
    df = spark.createDataFrame(
        [("d1", spans)],
        "doc_id string, spans array<struct<kind string, text string, media_ref string, offset int>>",
    )
    got = {r["table_ref"]: (r["section_marker"], r["subsection_marker"])
           for r in assign_table_context(df).collect()}
    assert got["#/tables/0"] == ("§ 1", "(1)")
    # a new § resets the odsek context (reference excludes stale markers)
    assert got["#/tables/1"] == ("§ 2", None)


def test_classifier():
    assert classify_table_cells(
        ["Dátum", "Číslo predpisu", "595/2003", "Účinnosť od"]
    ) == "metadata"
    assert classify_table_cells(["Položka", "KP", "Názov", "1-1", "29.10.13"]) == "legal"
    assert classify_table_cells(["lorem", "ipsum"]) == "unknown"


def test_fuzzy_match_deterministic():
    tables = [
        (["Položka", "Názov"], ["1-1", "1-2"]),            # idx 0
        (["Položka", "Názov"], ["1-1", "1-2", "1-3"]),     # idx 1 same header score
        (["Iné", "Stĺpce"], ["x"]),                        # idx 2 no match
    ]
    hw = {"položka", "názov"}
    idx = find_table_by_text_match(hw, ["1-1", "1-2"], tables)
    assert idx == 0  # lowest-index tiebreak
    assert find_table_by_text_match({"žiadne"}, [], tables) is None


def test_audit(spark, normalized):
    assigned = assign_table_context(normalized)
    audit = table_assignment_audit(normalized, assigned)
    rows = audit.collect()
    assert all(r["n_tables"] == r["n_assigned"] + r["n_unassigned"] for r in rows)
    # the as-of join assigns every table (context may be null, ref is known)
    assert all(r["n_unassigned"] == 0 for r in rows)


def test_assign_tables_by_range(spark):
    """J2: ±slack window assignment with closest-unit resolution."""
    from docling_spark.operators.tables import assign_tables_by_range

    units = spark.createDataFrame(
        [
            ("d1", "u1", 0, 10),
            ("d1", "u2", 20, 30),
            ("d2", "u1", 0, 100),
        ],
        "doc_id string, unit_id string, start_pos int, end_pos int",
    )
    tables = spark.createDataFrame(
        [
            ("d1", "t_inside", 5),    # inside u1
            ("d1", "t_slack", 13),    # within u1+5 only
            ("d1", "t_between", 16),  # within u1+5? 16>15 no; u2-5=15 → u2
            ("d1", "t_far", 50),      # matches nothing
            ("d2", "t_other", 40),    # inside d2/u1 — doc isolation
        ],
        "doc_id string, table_ref string, pos int",
    )
    got = {
        (r["doc_id"], r["table_ref"]): r["unit_id"]
        for r in assign_tables_by_range(units, tables, slack=5).collect()
    }
    assert got == {
        ("d1", "t_inside"): "u1",
        ("d1", "t_slack"): "u1",
        ("d1", "t_between"): "u2",
        ("d2", "t_other"): "u1",
    }

    # closest=False keeps multi-matches (pos 28 is inside u2 only; pos 25±5
    # overlaps u2 only as well — craft an overlap: slack 20 makes t_inside
    # match both units; the duplicate is exactly what the J8 audit flags)
    multi = assign_tables_by_range(units, tables, slack=20, closest=False)
    n_matches = multi.filter("doc_id = 'd1' AND table_ref = 't_inside'").count()
    assert n_matches == 2
    # and closest resolves it deterministically to the containing unit
    res = assign_tables_by_range(units, tables, slack=20, closest=True)
    row = res.filter("doc_id = 'd1' AND table_ref = 't_inside'").collect()
    assert len(row) == 1 and row[0]["unit_id"] == "u1"
