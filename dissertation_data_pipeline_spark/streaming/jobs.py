"""Structured Streaming wiring ([EXT]; SURVEY §2.9 I1-I5 analog).

The reference's incremental batch loop — "list new datasets, skip ones
already processed, process the rest, remember them" — is exactly what a
file-source stream with ``Trigger.AvailableNow`` and a checkpoint
directory does natively: source offsets replace the processed-set JSON
(utils.py:14-53 in the reference), and the checkpoint replaces the
periodic cache flush (legiscan_enricher.py:553-555).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_events_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    fmt: str = "parquet",
    watermark_col: str = "ts",
    watermark_delay: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream with an explicit schema (no inference in
    production paths — SURVEY §1.3) and an event-time watermark bounding
    state for windowed aggregations and stream dedup."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path).withWatermark(watermark_col, watermark_delay)


def run_available_now_to_memory(
    stream_df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    query_name: str,
    checkpoint_dir: str,
    *,
    output_mode: str = "append",
    timeout_sec: int = 120,
) -> DataFrame:
    """Run ``transform(stream)`` over all currently-available input
    (Trigger.AvailableNow — the reference's batch-over-new-files
    semantics), sink to an in-memory table, block until done, and
    return the result as a DataFrame."""
    out = transform(stream_df)
    query = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout_sec)
    if query.isActive:
        query.stop()
    spark = stream_df.sparkSession
    return spark.table(query_name)
