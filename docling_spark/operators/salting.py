"""Explicit skew handling for pathological document-size distributions
(SURVEY.md §4; north_rule: "explicit salting of skewed large-PDF
partitions").

The default extraction plan is narrow (no shuffle) and absorbs skew through
input-split granularity + Arrow batch caps. When the INPUT LAYOUT itself is
skewed — e.g. one Iceberg file holds all the mega-laws — a one-off
weight-aware redistribution fixes it. AQE cannot help here: the cost lives
inside an opaque Python stage, invisible to the optimizer, which is exactly
why the salting is explicit (SURVEY.md §4).

`salt_by_weight` computes a per-doc weight natively (`size(spans)` — span
count is the state machine's n), then round-robins documents into
weight-balanced partitions: docs are sorted by weight descending and dealt
across partitions (longest-processing-time-first greedy, the classic
makespan heuristic), so every partition gets the same total weight ±1 doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def doc_weights(df: DataFrame) -> DataFrame:
    """(doc_id, weight) — native, one narrow pass."""
    return df.select("doc_id", F.size("spans").alias("weight"))


def salt_by_weight(df: DataFrame, num_partitions: int) -> DataFrame:
    """Redistribute documents into `num_partitions` weight-balanced
    partitions. Costs one global sort + shuffle — opt-in, for bad layouts.

    salt = row_number over weight-desc % num_partitions (LPT deal), then
    repartition on the salt so co-salted docs land together.

    Scale note: the LPT deal needs a global weight sort — exact and worth it
    up to work lists of ~10^8 rows, but at the 10^12-doc design point use
    hash redistribution instead (`pipeline.rebalance`): mega-docs are rare
    and a uniform hash bounds expected partition imbalance at
    mean + O(√mean) without any global ordering; the Arrow batch cap already
    bounds the worst single-doc stall.
    """
    w = Window.orderBy(F.col("weight").desc(), F.col("doc_id"))
    salted = (
        df.withColumn("weight", F.size("spans"))
        .withColumn("salt", ((F.row_number().over(w) - 1) % num_partitions).cast("int"))
        .drop("weight")
    )
    # range partitioning maps the n distinct salts ~1:1 onto n partitions
    # (hash repartition would collide salts and re-skew)
    return salted.repartitionByRange(num_partitions, "salt").drop("salt")


def skew_report(df: DataFrame, num_partitions: int) -> dict:
    """Diagnostic: weight of heaviest doc vs mean partition weight — the
    ratio that decides whether salting is worth a shuffle."""
    stats = df.select(
        F.sum(F.size("spans")).alias("total"),
        F.max(F.size("spans")).alias("max_doc"),
        F.count("*").alias("docs"),
    ).collect()[0]
    mean_part = stats["total"] / num_partitions
    return {
        "docs": stats["docs"],
        "total_weight": stats["total"],
        "max_doc_weight": stats["max_doc"],
        "mean_partition_weight": mean_part,
        "skew_ratio": stats["max_doc"] / mean_part if mean_part else 0.0,
    }
