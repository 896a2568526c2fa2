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


def salt_by_weight(df: DataFrame, num_partitions: int, n_buckets: int = 64) -> DataFrame:
    """Redistribute documents into `num_partitions` weight-balanced
    partitions via a two-phase LPT deal — no single-partition term anywhere.

    Phase 1: weight-range buckets from a distributed quantile sketch
    (`approxQuantile` — partial+final aggregate, tiny driver result), plus a
    per-bucket count (same shape). Phase 2: `row_number` windowed PER BUCKET
    (parallel across buckets), composed with the exclusive bucket offsets
    into a global weight-descending rank; salt = rank % num_partitions is
    the LPT deal. Every partition gets ~equal total weight, and the heaviest
    `num_partitions` docs are guaranteed pairwise-separated.

    Equal to the exact global-sort deal up to tie order at bucket
    boundaries (equal-weight docs are interchangeable for balance). Scales:
    the widest window is one bucket (~1/n_buckets of the data), and both
    driver-side results are O(n_buckets) scalars. For the 10^12-doc design
    point where even this shuffle is unwanted, `pipeline.rebalance` (uniform
    hash) remains the default path.
    """
    import math

    w = df.withColumn("weight", F.size("spans"))
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = sorted(set(w.stat.approxQuantile("weight", probs, 0.001)))
    # bucket 0 = heaviest (weight above every cut); value-disjoint ranges
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + F.when(F.col("weight") <= F.lit(c), 1).otherwise(0)
    w = w.withColumn("bucket", bucket.cast("int"))
    counts = dict(
        (r["bucket"], r["n"])
        for r in w.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    )
    # Degenerate distributions (most docs share one weight) collapse the
    # quantile cuts, dumping nearly all rows into one bucket — which would
    # make the per-bucket window an effectively global single-partition
    # sort. Sub-salt any bucket holding more than ~2× the target share by
    # hash(doc_id): docs inside one weight-range bucket are interchangeable
    # for balance, so hash sub-buckets keep the deal balanced (each
    # sub-bucket is still dealt weight-descending) while the widest window
    # partition stays bounded by ~2·N/n_buckets rows.
    total = sum(counts.values())
    target = max(1, math.ceil(total / n_buckets))
    sub_k = {b: max(1, math.ceil(c / (2 * target))) for b, c in counts.items()}
    sub_col = F.lit(0)
    for b, k in sub_k.items():
        if k > 1:
            sub_col = F.when(
                F.col("bucket") == b, F.pmod(F.xxhash64("doc_id"), F.lit(k))
            ).otherwise(sub_col)
    w = w.withColumn("sub", sub_col.cast("int"))
    # `default=1`: an empty input yields no buckets at all (counts == {});
    # fall through to the no-sub-salt path and return the empty frame.
    if max(sub_k.values(), default=1) > 1:
        pair_counts = dict(
            ((r["bucket"], r["sub"]), r["n"])
            for r in w.groupBy("bucket", "sub").agg(F.count("*").alias("n")).collect()
        )
    else:
        pair_counts = {(b, 0): c for b, c in counts.items()}
    offsets = {}
    acc = 0
    for b in range(len(cuts) + 1):  # ascending bucket id = descending weight
        for s in range(sub_k.get(b, 1)):
            offsets[(b, s)] = acc
            acc += pair_counts.get((b, s), 0)
    off_col = F.lit(0)
    for (b, s), off in offsets.items():
        if off:
            off_col = F.when(
                (F.col("bucket") == b) & (F.col("sub") == s), F.lit(off)
            ).otherwise(off_col)
    per_bucket = Window.partitionBy("bucket", "sub").orderBy(
        F.col("weight").desc(), F.col("doc_id")
    )
    salted = w.withColumn(
        "salt",
        ((off_col + F.row_number().over(per_bucket) - 1) % num_partitions).cast("int"),
    ).drop("weight", "bucket", "sub")
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
