"""Tests for weight-balanced salting and J4 paragraph enrichment."""

from pyspark.sql import functions as F

from docling_spark.operators.enrich import enrich_document, split_embedded_pismenos
from docling_spark.operators.salting import doc_weights, salt_by_weight, skew_report


def test_split_embedded_pismenos():
    got = split_embedded_pismenos("Intro veta. a) prvé písmeno. b) druhé písmeno.")
    assert got == ("Intro veta.", [("a", "prvé písmeno."), ("b", "druhé písmeno.")])
    # out-of-order or single runs rejected
    assert split_embedded_pismenos("text b) x c) y") is None
    assert split_embedded_pismenos("only a) one item") is None
    assert split_embedded_pismenos("no markers at all") is None


def test_enrich_document_creates_synthetic_odsek():
    long_intro = ("Úvodná veta " * 20).strip()  # > 200 chars
    spans = [
        ("paragraph", "§ 5", "#paragraf-5"),
        ("text", f"{long_intro} a) prvé. b) druhé.", "#paragraf-5"),
    ]
    out = enrich_document(spans)
    kinds = [k for k, _, _ in out]
    assert kinds == ["paragraph", "odsek", "text", "pismeno", "text", "pismeno", "text"]
    assert out[1] == ("odsek", "(1)", "#paragraf-5.odsek-1")
    assert out[3] == ("pismeno", "a)", "#paragraf-5.odsek-1.pismeno-a")
    assert out[4][1] == "prvé."


def test_enrich_skips_paragraph_with_odseks_or_short_intro():
    spans = [
        ("paragraph", "§ 1", "#paragraf-1"),
        ("odsek", "(1)", "#paragraf-1.odsek-1"),
        ("text", "x a) y b) z", "#paragraf-1.odsek-1"),
    ]
    assert enrich_document(spans) == spans
    short = [
        ("paragraph", "§ 2", "#paragraf-2"),
        ("text", "krátke a) x b) y", "#paragraf-2"),
    ]
    assert enrich_document(short) == short


def test_salting_balances_weight(spark, corpus_path):
    df = spark.read.parquet(corpus_path)
    rep = skew_report(df, num_partitions=8)
    assert rep["docs"] == 60 and rep["total_weight"] > 0

    salted = salt_by_weight(df, 8)
    # same rows, no loss
    assert salted.count() == 60
    # partition weights balanced: max/min total weight ratio below 2
    sizes = (
        salted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.sum(F.size("spans")).alias("w"))
        .collect()
    )
    weights = [r["w"] for r in sizes]
    assert len(weights) <= 8
    assert max(weights) <= 2 * max(1, min(weights))


def test_salting_plan_has_no_single_partition_exchange(spark, corpus_path):
    # the two-phase LPT deal must never funnel rows through one partition
    # (the round-1 form used an unpartitioned global window — a scale-killer)
    import contextlib
    import io

    df = spark.read.parquet(corpus_path)
    salted = salt_by_weight(df, 8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        salted.explain(True)
    assert "SinglePartition" not in buf.getvalue()


def test_doc_weights(spark, corpus_path):
    df = spark.read.parquet(corpus_path)
    w = doc_weights(df)
    assert w.filter("weight <= 0").count() == 0


def test_extract_full_end_to_end(spark, corpus_path):
    # flagship composition: extract → enrich stays narrow (no Exchange) and
    # yields the same docs with only enrichment rewrites
    from docling_spark.pipeline import extract, extract_full

    df = spark.read.parquet(corpus_path)
    full = extract_full(df)
    assert full.count() == 60
    plan = full._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # enrichment only ever adds synthetic odsek/pismeno spans — never drops
    base_n = extract(df).selectExpr("sum(size(spans))").collect()[0][0]
    full_n = full.selectExpr("sum(size(spans))").collect()[0][0]
    assert full_n >= base_n


def test_salting_degenerate_uniform_weight_subsalts(spark):
    # ADVICE regression: when (nearly) all docs share one weight the
    # quantile cuts collapse into a single bucket; the dominant bucket must
    # be hash-sub-salted so the widest window partition stays bounded —
    # never an effectively global single-partition sort.
    import contextlib
    import io

    rows = [
        (f"doc{i:04d}", [("text", "x", None, 0)] * 10)  # identical weight
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    salted = salt_by_weight(df, 8, n_buckets=16)
    assert salted.count() == 400
    sizes = [
        r["n"]
        for r in salted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid").agg(F.count("*").alias("n")).collect()
    ]
    assert max(sizes) <= 2 * max(1, min(sizes))  # still balanced
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        salted.explain(True)
    assert "SinglePartition" not in buf.getvalue()
    # the window key must include the sub-salt, and sub-bucketing must be
    # active (window partition spec carries both bucket and sub)
    assert "windowspecdefinition(bucket" in buf.getvalue() and "sub#" in buf.getvalue()
