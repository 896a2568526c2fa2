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
