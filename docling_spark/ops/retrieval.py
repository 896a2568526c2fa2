"""Retrieval scoring over the documents table: BM25 (Robertson et al.,
Okapi; the Lucene idf variant) — the standard lexical ranking a
training-data pipeline uses for retrieval-based decontamination, quality
probes, and dedup triage.

Scale shape: the corpus side is one narrow projection (token counts per
query term via array filters — no explode of the full token stream) plus
ONE row of global stats (N, avgdl) joined back as a broadcast literal.
Query-term document frequencies are a bounded driver-side parameter (a
handful of terms — collected like the k-means/PQ training samples, FAISS
style) so the idf values are injected as LITERALS into both engines: ln()
is not required to be correctly rounded by IEEE 754, so computing it once
on the driver is what makes the Spark/DuckDB outputs bit-identical.
"""

from __future__ import annotations

import math
from typing import Dict, Sequence

from pyspark.sql import DataFrame, functions as F

from docling_spark.ops import portable as P


def term_dfs(docs: DataFrame, terms: Sequence[str], id_col: str = "doc_id",
             text_col: str = "text") -> Dict[str, int]:
    """Document frequency per query term (exact, case-insensitive,
    whitespace tokens). One aggregate row per term — a bounded driver
    collect (|terms| values), the BM25 analog of the bounded k-means
    sample."""
    # terms go through F.lit, never string interpolation — a term with a
    # quote must be a literal, not a syntax error / injection vector
    toks = F.transform(F.expr(P.tokens_spark(text_col)), lambda t: F.lower(t))
    aggs = [
        F.sum(
            F.when(F.array_contains(toks, F.lit(t)), 1).otherwise(0)
        ).cast("long").alias(f"df_{i}")
        for i, t in enumerate(terms)
    ]
    row = docs.agg(*aggs).collect()[0]
    return {t: int(row[f"df_{i}"]) for i, t in enumerate(terms)}


def bm25_idf(n_docs: int, df: int) -> float:
    """Lucene/Okapi idf: ln(1 + (N − df + 0.5)/(df + 0.5))."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_topk(docs: DataFrame, terms: Sequence[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text",
              idf: Dict[str, float] | None = None,
              n_docs: int | None = None,
              avgdl: float | None = None) -> DataFrame:
    """Top-k documents by BM25 against a bag of query terms.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))

    Returns (doc_id, score_e6, rank) with deterministic tie-breaks
    (score desc, doc_id asc). Pass precomputed `idf`/`n_docs`/`avgdl` to
    skip the stats pass (production runs compute them once per corpus and
    store them, like the PQ codebooks); by default they are derived here —
    one aggregate over token counts (exact integer sum → exact double
    division) and the per-term df collect."""
    terms = [t.lower() for t in terms]
    if n_docs is None or avgdl is None:
        stats = docs.agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.size(F.expr(P.tokens_spark(text_col)))).cast("long").alias("lsum"),
        ).collect()[0]
        n_docs = n_docs if n_docs is not None else int(stats["n"])
        avgdl = avgdl if avgdl is not None else (stats["lsum"] / stats["n"] if stats["n"] else 1.0)
    if idf is None:
        idf = {t: bm25_idf(n_docs, d) for t, d in term_dfs(docs, terms, id_col, text_col).items()}

    toks = F.transform(F.expr(P.tokens_spark(text_col)), lambda t: F.lower(t))
    dl = F.size(F.expr(P.tokens_spark(text_col))).cast("double")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(float(avgdl)))
    score = F.lit(0.0)
    def _eq_term(term):
        # term comparison via F.lit — quote-safe (no SQL-string
        # interpolation). NB: must be a 1-arg lambda — a second defaulted
        # param would make F.filter pass the array INDEX into it.
        return lambda x: x == F.lit(term)

    for t in terms:
        tf = F.size(F.filter(toks, _eq_term(t))).cast("double")
        score = score + F.lit(float(idf[t])) * (tf * (k1 + 1.0)) / (tf + norm)
    from pyspark.sql.window import Window

    scored = docs.select(
        F.col(id_col),
        F.floor(F.round(score, 6) * 1_000_000).cast("long").alias("score_e6"),
    ).filter(F.col("score_e6") > 0)
    # orderBy+limit compiles to TakeOrderedAndProject — per-partition heap
    # top-k then a k-row merge on the driver, never a global sort or a
    # single-partition window exchange; the rank window then runs on ≤k rows
    topk = scored.orderBy(F.col("score_e6").desc(), F.col(id_col).asc()).limit(k)
    # constant-valued but NON-FOLDABLE partition key — same single
    # partition (fine: the input is ≤k rows post-limit) but silences
    # Spark's "No Partition Defined for Window" WARN. A plain lit(0) does
    # NOT work: Catalyst prunes foldable partition expressions and the
    # spec reverts to empty (verified — 3 WARNs/run). score_e6 * 0 stays
    # in the spec because multiply-by-zero is not constant-folded
    # (null-propagation makes it unsafe in general).
    w = Window.partitionBy(F.col("score_e6") * F.lit(0)).orderBy(
        F.col("score_e6").desc(), F.col(id_col).asc())
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select(id_col, "score_e6", F.col("rank").cast("long").alias("rank"))
    )
