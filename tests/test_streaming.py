"""Structured Streaming tests: the same window builders must produce
identical results under readStream + AvailableNow as under batch."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.streaming import (
    read_events_stream,
    run_available_now_to_memory,
    tumbling_window_agg,
)
from dissertation_data_pipeline_spark.tables import load_table


@pytest.fixture()
def tmpdirs():
    d = tempfile.mkdtemp(prefix="ddp-stream-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_tumbling_equals_batch(spark, sf_dir, tmpdirs):
    events = load_table(spark, sf_dir, "events")
    # stage the events as a 4-file directory (simulates incremental drops)
    src = f"{tmpdirs}/src"
    events.repartition(4).write.parquet(src)

    stream = read_events_stream(
        spark, src, events.schema, watermark_delay="2 hours"
    )
    got = run_available_now_to_memory(
        stream,
        lambda df: tumbling_window_agg(df, "ts", "1 hour", ["event_type"], "value"),
        query_name="t_tumbling",
        checkpoint_dir=f"{tmpdirs}/ckpt",
        output_mode="append",
    )
    want = tumbling_window_agg(events, "ts", "1 hour", ["event_type"], "value")

    # watermark append-mode emits only closed windows; every emitted row
    # must match batch, and all but the last watermark-open windows emit
    got_rows = {tuple(r) for r in got.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows <= want_rows
    assert len(got_rows) >= len(want_rows) - 20  # only tail windows may be held back


def test_streaming_checkpoint_no_reprocess(spark, sf_dir, tmpdirs):
    """AvailableNow + checkpoint = the reference's processed-set skip
    (SURVEY I2): a second run over the same directory emits nothing new."""
    events = load_table(spark, sf_dir, "events").limit(1000)
    src = f"{tmpdirs}/src"
    events.write.parquet(src)

    out_dir = f"{tmpdirs}/out"

    def run():
        stream = read_events_stream(spark, src, events.schema)
        q = (
            stream.select("event_id", "user_id", "ts")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", f"{tmpdirs}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if q.isActive:
            q.stop()
        return spark.read.parquet(out_dir)

    assert run().count() == 1000
    assert run().count() == 1000  # second run: source offsets say done -> no new rows
