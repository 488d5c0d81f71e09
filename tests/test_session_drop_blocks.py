"""Regression test for the round-8 driver-heap leak fix (r8 verdict
What's-missing #5): every streaming gate row drains to a
``format("memory")`` sink, whose rows live in the DRIVER heap behind a
temp view.  Before commit e2c5b77 nothing dropped those views, so a
multi-query harness (bench warmup + 3 timed passes over 5 streaming
rows) accumulated driver memory until legitimate broadcast builds died
with "Not enough memory to build and broadcast" (the sf10 BENCH_SCALE
failure round 8 diagnosed — wrongly, at first — as a planner problem).

``session.drop_blocks`` now sweeps temp views alongside the cache and
persistent-RDD cleanup; this test drains several memory sinks through
it and asserts zero residue, so a future refactor cannot silently
reintroduce the accumulation.  (On pre-e2c5b77 ``drop_blocks`` the
temp-view assertion below fails: ``clearCache()`` alone leaves every
``listTables()`` entry in place.)
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.session import drop_blocks
from dissertation_data_pipeline_spark.streaming import (
    read_events_stream,
    run_available_now_to_memory,
    tumbling_window_agg,
)
from dissertation_data_pipeline_spark.tables import load_table


@pytest.fixture()
def tmpdirs():
    d = tempfile.mkdtemp(prefix="ddp-dropblocks-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _residual_temp_views(spark) -> list[str]:
    return [t.name for t in spark.catalog.listTables() if t.isTemporary]


def _persistent_rdd_count(spark) -> int:
    return int(
        spark.sparkContext._jsc.sc().getPersistentRDDs().size()  # noqa: SLF001
    )


def test_drop_blocks_sweeps_memory_sink_views(spark, sf_dir, tmpdirs):
    events = load_table(spark, sf_dir, "events").limit(500)
    src = f"{tmpdirs}/src"
    events.write.parquet(src)

    # the bench/harness shape: several gate-row drains in one session,
    # each parking its result rows in the driver behind a temp view
    for i in range(3):
        got = run_available_now_to_memory(
            read_events_stream(
                spark, src, events.schema, watermark_delay="2 hours"
            ),
            lambda df: tumbling_window_agg(
                df, "ts", "1 hour", ["event_type"], "value"
            ),
            query_name=f"t_dropblocks_{i}",
            checkpoint_dir=f"{tmpdirs}/ckpt{i}",
            output_mode="append",
        )
        got.count()  # the harness executes each result fully

    # plus a cached relation and a localCheckpoint, the other two
    # residue classes drop_blocks owns
    cached = events.groupBy("event_type").count().cache()
    cached.count()
    ckpt = events.limit(10).localCheckpoint(eager=True)
    ckpt.count()

    names = _residual_temp_views(spark)
    assert [n for n in names if n.startswith("t_dropblocks_")], (
        "memory sinks should have registered temp views — the leak "
        "this test guards never happened, so it guards nothing"
    )

    drop_blocks(spark)

    assert _residual_temp_views(spark) == [], (
        "drop_blocks left temp views behind — memory-sink rows are "
        "accumulating in the driver heap again (round-8 leak)"
    )
    assert _persistent_rdd_count(spark) == 0, (
        "drop_blocks left persistent RDD blocks (cache/localCheckpoint)"
    )


def test_drop_blocks_is_idempotent_on_clean_session(spark):
    drop_blocks(spark)
    drop_blocks(spark)
    assert _residual_temp_views(spark) == []
