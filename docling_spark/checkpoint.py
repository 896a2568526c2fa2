"""Checkpointed, resumable extraction runs (SURVEY.md §2.1 S5, §4; north_rule:
per-partition checkpointed lineage + metrics, resume without recompute).

Mechanism — the Spark-native version of the reference's per-law conversion
cache (/root/reference/annex_processor.py:377-446, process_law.py:104-131):

- documents are hash-bucketed by `pmod(xxhash64(doc_id), n_buckets)` — a
  deterministic, data-independent partitioning that survives restarts;
- buckets are processed in groups; each completed group appends its output
  (parquet partitioned by bucket) and a metrics row per bucket
  (docs, spans_in/out, wall_ms, status='ok');
- resume = **left anti-join** of the bucket work list against the metrics
  table's ok buckets: completed ranges are never recomputed.

On Iceberg this maps 1:1 (append-commit per group gives atomicity); plain
parquet directories stand in for the sandbox.
"""

from __future__ import annotations

import os
import time
import uuid
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from docling_spark.pipeline import extract
from docling_spark.schema import METRICS_DDL


def _completed_buckets(spark: SparkSession, metrics_path: str, run_scope: str) -> List[int]:
    if not os.path.isdir(metrics_path) or not any(
        f.endswith(".parquet") for f in _walk_files(metrics_path)
    ):
        return []
    m = spark.read.parquet(metrics_path)
    rows = (
        m.filter((F.col("status") == "ok") & (F.col("stage") == run_scope))
        .select("bucket")
        .distinct()
        .collect()
    )
    return sorted(r["bucket"] for r in rows)


def _walk_files(root: str):
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            yield os.path.join(dirpath, f)


def run_extract(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    metrics_path: str,
    n_buckets: int = 16,
    group_size: int = 4,
    run_id: Optional[str] = None,
    fail_after_groups: Optional[int] = None,
) -> dict:
    """Run (or resume) a checkpointed extraction.

    `fail_after_groups` injects a crash after N groups — used by tests to
    prove resume-without-recompute. Returns a summary dict.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    stage = "extract"

    docs = spark.read.parquet(input_path).withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    )

    done = _completed_buckets(spark, metrics_path, stage)
    todo = [b for b in range(n_buckets) if b not in done]
    groups = [todo[i : i + group_size] for i in range(0, len(todo), group_size)]

    processed_groups = 0
    for group in groups:
        t0 = time.time()
        part = docs.filter(F.col("bucket").isin(group))
        out = extract(part, extra_cols=", bucket int")
        out.write.mode("append").partitionBy("bucket").parquet(output_path)

        wall_ms = int((time.time() - t0) * 1000)
        # lineage metrics per bucket (native agg over the freshly written
        # group — reads back only this group's partitions)
        written = spark.read.parquet(output_path).filter(F.col("bucket").isin(group))
        stats_out = written.groupBy("bucket").agg(
            F.count("*").alias("docs"), F.sum(F.size("spans")).alias("spans_out")
        )
        stats_in = part.groupBy("bucket").agg(
            F.sum(F.size("spans")).alias("spans_in")
        )
        metrics = (
            stats_out.join(stats_in, "bucket", "left")
            .select(
                F.lit(run_id).alias("run_id"),
                F.lit(stage).alias("stage"),
                F.col("bucket"),
                F.col("docs"),
                F.col("spans_in"),
                F.col("spans_out"),
                F.lit(0).cast("long").alias("tables_assigned"),
                F.lit(0).cast("long").alias("tables_unassigned"),
                F.lit(0).cast("long").alias("duplicates"),
                F.lit("ok").alias("status"),
                F.lit(wall_ms).cast("long").alias("wall_ms"),
            )
        )
        metrics.write.mode("append").parquet(metrics_path)

        processed_groups += 1
        if fail_after_groups is not None and processed_groups >= fail_after_groups:
            return {
                "run_id": run_id,
                "resumed_from": len(done),
                "groups_run": processed_groups,
                "completed": False,
            }

    return {
        "run_id": run_id,
        "resumed_from": len(done),
        "groups_run": processed_groups,
        "completed": True,
    }
