"""Structured Streaming form of the extraction pipeline.

The reference is a batch CLI (no streaming — SURVEY.md §2.10), and the
north_rule's resumability is met by batch checkpointing (checkpoint.py). This
module additionally re-expresses the same pipeline as a stream for
continuous-ingest deployments: `readStream` over the documents directory →
the identical mapInPandas extraction → `writeStream` with
`Trigger.AvailableNow` (drain-everything-then-stop) or continuous
micro-batches. Spark's streaming checkpoint gives exactly-once file output,
replacing the bucket ledger in this mode.

The transformation is THE SAME function (`pipeline.extract`) — batch/stream
parity by construction.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from docling_spark.pipeline import extract
from docling_spark.schema import DOC_SCHEMA


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Streaming exact dedup: first-seen-wins across micro-batches.

    Custom stateful operator via `applyInPandasWithState`: the stream is
    keyed by content hash; per key a one-bit state records whether the hash
    was already emitted, so re-ingested duplicates are dropped across
    micro-batch (and restart) boundaries — the streaming form of
    ops.dedup.exact_dup_groups. State is O(1) per distinct document, and the
    shuffle key is the hash (never the text), same as the batch operator."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = (
        spark.readStream.schema(DOC_SCHEMA)
        .parquet(input_dir)
        .withColumn("text_hash", F.md5(F.expr("array_join(transform(spans, s -> s.text), '\\n')")))
    )

    def first_seen(key, pdf_iter, state: GroupState):
        if state.exists:
            return  # hash already emitted in an earlier batch — drop all
        first = None
        for pdf in pdf_iter:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]][["text_hash", "doc_id"]]
        if first is not None:
            state.update((True,))
            yield first

    out = (
        src.select("text_hash", "doc_id")
        .groupBy("text_hash")
        .applyInPandasWithState(
            first_seen,
            outputStructType="text_hash string, doc_id string",
            stateStructType="seen boolean",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_metrics(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Watermarked windowed extraction metrics: spans/doc counts per
    1-minute ingest window, tolerating 2 minutes of late arrivals — the
    streaming form of the S9 metrics rollup. Late data beyond the watermark
    is dropped by Spark's state eviction, bounding state size for a forever
    stream."""
    from pyspark.sql import functions as F

    from docling_spark.schema import DOC_DDL

    src = (
        spark.readStream.schema(DOC_DDL + ", ingest_ts timestamp")
        .parquet(input_dir)
    )
    agg = (
        src.withWatermark("ingest_ts", "2 minutes")
        .groupBy(F.window("ingest_ts", "1 minute").alias("w"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size("spans")).alias("n_spans"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_docs",
            "n_spans",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 8,
):
    """Start the streaming extraction; returns the StreamingQuery.

    `available_now=True` processes the current backlog and stops (the batch-
    equivalent mode used in tests); False tails the directory forever.
    """
    src = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    normalized = extract(src)
    writer = (
        normalized.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
