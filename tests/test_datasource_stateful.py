"""Spark 4 Python DataSource (partition-per-page REST feed) and the
applyInPandasWithState stateful profile operator."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.sources.datasource import (
    HAVE_DATASOURCE_API,
    RestPagesDataSource,
)
from dissertation_data_pipeline_spark.streaming import read_events_stream
from dissertation_data_pipeline_spark.streaming.stateful import (
    running_user_profile,
)
from dissertation_data_pipeline_spark.tables import load_table


@pytest.fixture()
def tmpdirs():
    d = tempfile.mkdtemp(prefix="ddp-ds-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_pages(root: str, pages: int, per_page: int) -> None:
    os.makedirs(root, exist_ok=True)
    n = 0
    for p in range(1, pages + 1):
        recs = []
        for _ in range(per_page):
            n += 1
            recs.append(
                {
                    "jurisdiction": "Colorado",
                    "session": "2023A",
                    "identifier": f"HB{1000 + n}",
                    "title": f"Bill number {n}",
                    "extra_field_dropped_at_edge": True,
                }
            )
        with open(os.path.join(root, f"page-{p}.json"), "w") as fh:
            json.dump(recs, fh)


@pytest.mark.skipif(not HAVE_DATASOURCE_API, reason="pyspark<4: no DataSource API")
def test_rest_pages_datasource_partition_per_page(spark, tmpdirs):
    _write_pages(f"{tmpdirs}/feed", pages=4, per_page=7)
    spark.dataSource.register(RestPagesDataSource)
    df = (
        spark.read.format("rest_pages")
        .option("endpoint", f"file://{tmpdirs}/feed")
        .option("pages", "4")
        .load()
    )
    # one input partition per page: parallel fetch + per-page retry unit
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 28
    got = df.groupBy("page").count().orderBy("page").collect()
    assert [(r["page"], r["count"]) for r in got] == [(1, 7), (2, 7), (3, 7), (4, 7)]
    # the projection is plannable: only two columns cross into the scan
    ids = df.select("identifier", "page").filter(F.col("page") == 2).collect()
    assert sorted(r["identifier"] for r in ids) == [f"HB{1000 + n}" for n in range(8, 15)]


@pytest.mark.skipif(not HAVE_DATASOURCE_API, reason="pyspark<4: no DataSource API")
def test_rest_pages_datasource_short_feed(spark, tmpdirs):
    """Pages beyond the feed's end read as empty (the generator's
    termination condition), not as task failures."""
    _write_pages(f"{tmpdirs}/feed", pages=2, per_page=3)
    spark.dataSource.register(RestPagesDataSource)
    df = (
        spark.read.format("rest_pages")
        .option("endpoint", f"file://{tmpdirs}/feed")
        .option("pages", "5")
        .load()
    )
    assert df.count() == 6


def test_running_user_profile_accumulates_across_batches(spark, sf_dir, tmpdirs):
    """The stateful operator must carry per-key state across
    micro-batches: totals after N single-file batches equal the batch
    aggregate over the whole input."""
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    src = f"{tmpdirs}/src"
    events.repartition(3).write.parquet(src)  # 3 files -> up to 3 batches

    stream = read_events_stream(spark, src, events.schema, watermark_delay="10 hours")
    # evict=False so the AvailableNow drain self-terminates (with the
    # ProcessingTimeTimeout eviction variant the trigger spins empty
    # state-cleanup batches forever — see running_user_profile's doc).
    q = (
        running_user_profile(stream, evict=False)
        .writeStream.format("memory")
        .queryName("profiles")
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdirs}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(180)
    assert finished, "AvailableNow drain did not terminate"

    # update-mode memory sink: the LAST row per user is the final state
    final = (
        spark.sql("select * from profiles")
        .withColumn("rn", F.monotonically_increasing_id())
        .groupBy("user_id")
        .agg(F.max_by(F.struct("n_events", "value_sum", "n_event_types"), "rn").alias("s"))
        .select("user_id", "s.*")
    )
    want = (
        events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_event_types"),
        )
    )
    got = {r["user_id"]: (r["n_events"], r["n_event_types"]) for r in final.collect()}
    exp = {r["user_id"]: (r["n_events"], r["n_event_types"]) for r in want.collect()}
    assert got == exp


# ------------------------------------------------- streaming data source
def test_rest_pages_stream_picks_up_new_pages(spark, tmp_path):
    """readStream over the paginated feed: run 1 ingests pages 1-2;
    after page 3 appears, run 2 (same checkpoint) emits ONLY page 3 —
    the offset checkpoint replaces the reference's processed-set JSON."""
    import json

    from dissertation_data_pipeline_spark.sources.datasource import (
        RestPagesDataSource,
    )

    feed = tmp_path / "feed"
    feed.mkdir()
    rec = lambda i: {  # noqa: E731
        "jurisdiction": "CO", "session": "2024", "identifier": f"HB{i}",
        "title": f"t{i}",
    }
    (feed / "page-1.json").write_text(json.dumps([rec(1), rec(2)]))
    (feed / "page-2.json").write_text(json.dumps([rec(3)]))

    spark.dataSource.register(RestPagesDataSource)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run():
        # file sink (not memory) — checkpoint recovery is the point
        q = (
            spark.readStream.format("rest_pages")
            .option("endpoint", f"file://{feed}")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        if q.isActive:
            q.stop()
        return spark.read.parquet(out)

    got1 = {r["identifier"] for r in run().collect()}
    assert got1 == {"HB1", "HB2", "HB3"}

    (feed / "page-3.json").write_text(json.dumps([rec(4)]))
    got2 = {r["identifier"] for r in run().collect()}
    assert got2 == {"HB1", "HB2", "HB3", "HB4"}  # appended exactly page 3
    # and page 3's rows were emitted exactly once (offset resumed, no replay)
    from collections import Counter

    counts = Counter(r["identifier"] for r in run().collect())
    assert counts["HB4"] == 1


# --- S7: bulk-dataset batch source with hash-skip ------------------------

def _write_datasets(root: str, datasets: dict[str, tuple[str, int]]) -> None:
    """datasets: {dataset_id: (content_hash, n_records)}"""
    os.makedirs(root, exist_ok=True)
    listing = [
        {"dataset_id": ds, "content_hash": h}
        for ds, (h, _) in sorted(datasets.items())
    ]
    with open(os.path.join(root, "datasets.json"), "w") as fh:
        json.dump(listing, fh)
    for ds, (_, n) in datasets.items():
        recs = [
            {"record_id": f"{ds}-r{i}", "payload": f"payload-{ds}-{i}"}
            for i in range(n)
        ]
        with open(os.path.join(root, f"dataset-{ds}.json"), "w") as fh:
            json.dump(recs, fh)


@pytest.mark.skipif(not HAVE_DATASOURCE_API, reason="needs pyspark>=4")
def test_bulk_datasets_partition_per_dataset(spark, tmpdirs):
    from dissertation_data_pipeline_spark.sources.datasource import (
        BulkDatasetsDataSource,
    )

    _write_datasets(tmpdirs, {"s1": ("h1", 3), "s2": ("h2", 2)})
    spark.dataSource.register(BulkDatasetsDataSource)
    df = (
        spark.read.format("bulk_datasets")
        .option("endpoint", f"file://{tmpdirs}")
        .load()
    )
    assert df.rdd.getNumPartitions() == 2  # one per dataset
    rows = df.collect()
    assert len(rows) == 5
    got = {(r.dataset_id, r.record_id) for r in rows}
    assert ("s1", "s1-r0") in got and ("s2", "s2-r1") in got
    assert {r.content_hash for r in rows} == {"h1", "h2"}


@pytest.mark.skipif(not HAVE_DATASOURCE_API, reason="needs pyspark>=4")
def test_bulk_datasets_hash_skip_and_rerecord(spark, tmpdirs):
    """I1/I3 through the batch source: unchanged datasets plan ZERO
    partitions; a changed hash re-ingests exactly that dataset; after
    record_dataset_hashes a rerun reads nothing."""
    from dissertation_data_pipeline_spark.sources.datasource import (
        BulkDatasetsDataSource,
        fetch_dataset_list,
        record_dataset_hashes,
    )

    feed = os.path.join(tmpdirs, "feed")
    state = os.path.join(tmpdirs, "hashes.json")
    _write_datasets(feed, {"s1": ("h1", 3), "s2": ("h2", 2)})
    spark.dataSource.register(BulkDatasetsDataSource)

    def read():
        return (
            spark.read.format("bulk_datasets")
            .option("endpoint", f"file://{feed}")
            .option("state_path", state)
            .load()
        )

    # first run: everything is new
    assert read().count() == 5
    record_dataset_hashes(state, fetch_dataset_list(f"file://{feed}"))
    # rerun with no upstream change: nothing is scheduled
    assert read().count() == 0
    # s2 publishes a new hash with one more record
    _write_datasets(feed, {"s1": ("h1", 3), "s2": ("h2b", 3)})
    changed = read()
    assert changed.count() == 3
    assert {r.dataset_id for r in changed.collect()} == {"s2"}
    record_dataset_hashes(state, fetch_dataset_list(f"file://{feed}"))
    assert read().count() == 0


def test_running_user_profile_evict_variant_sets_processing_timeout():
    """The continuous-stream variant keeps the state-bounding
    ProcessingTimeTimeout; the drain variant uses NoTimeout (plan-level
    check — the eviction itself needs an hour of idle processing time)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from dissertation_data_pipeline_spark.streaming import stateful

    assert GroupStateTimeout.ProcessingTimeTimeout
    # the factory threads `evict` into both the timeout conf and the
    # per-key update fn's setTimeoutDuration call
    fn_evict = stateful._make_update_profile(True, 3_600_000)
    fn_drain = stateful._make_update_profile(False, 3_600_000)
    cells_evict = {c.cell_contents for c in fn_evict.__closure__}
    cells_drain = {c.cell_contents for c in fn_drain.__closure__}
    assert True in cells_evict and 3_600_000 in cells_evict
    assert False in cells_drain


def test_stateful_profile_identical_under_rocksdb(spark, sf_dir, tmpdirs):
    """Provider independence: the same multi-batch stateful drain under
    the RocksDB state store (the bounded-by-disk 100 TB backend) yields
    exactly the HDFS-backed result — only the storage engine differs."""
    from dissertation_data_pipeline_spark.streaming.jobs import (
        ROCKSDB_PROVIDER,
        rocksdb_state_store,
    )

    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    src = f"{tmpdirs}/src"
    events.repartition(3).write.parquet(src)

    def drain(tag: str):
        stream = read_events_stream(
            spark, src, events.schema, watermark_delay="10 hours"
        )
        q = (
            running_user_profile(stream, evict=False)
            .writeStream.format("memory")
            .queryName(f"profiles_{tag}")
            .outputMode("update")
            .option("checkpointLocation", f"{tmpdirs}/ckpt_{tag}")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)
        return {
            r.user_id: (r.n_events, r.n_event_types)
            for r in spark.table(f"profiles_{tag}")
            .groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max("n_event_types").alias("n_event_types"),
            )
            .collect()
        }

    base = drain("hdfs")
    with rocksdb_state_store(spark) as s:
        assert s.conf.get(
            "spark.sql.streaming.stateStore.providerClass"
        ) == ROCKSDB_PROVIDER
        rocks = drain("rocks")
    assert rocks == base


def test_replay_raises_on_missing_committed_page(tmpdirs):
    """readBetweenOffsets replays a COMMITTED batch: a page that has
    vanished since its offset was committed must raise, not silently
    shrink the batch (previously mapped to an empty page)."""
    from dissertation_data_pipeline_spark.sources.datasource import (
        RestPagesStreamReader,
    )

    _write_pages(tmpdirs, pages=3, per_page=2)
    r = RestPagesStreamReader({"endpoint": f"file://{tmpdirs}"})
    # normal replay of pages [1, 4): all rows come back
    assert len(list(r.readBetweenOffsets({"page": 1}, {"page": 4}))) == 6
    os.remove(os.path.join(tmpdirs, "page-2.json"))
    with pytest.raises(FileNotFoundError, match="strict"):
        list(r.readBetweenOffsets({"page": 1}, {"page": 4}))
    # forward read (termination semantics) still treats missing as end
    rows, off = r.read({"page": 1})
    assert len(list(rows)) == 2 and off == {"page": 2}


def test_stream_read_caps_pages_per_microbatch(tmpdirs):
    """A large backlog is split across microbatches by
    max_pages_per_batch — the offset advances only over pages read."""
    from dissertation_data_pipeline_spark.sources.datasource import (
        RestPagesStreamReader,
    )

    _write_pages(tmpdirs, pages=5, per_page=1)
    r = RestPagesStreamReader(
        {"endpoint": f"file://{tmpdirs}", "max_pages_per_batch": "2"}
    )
    rows, off = r.read({"page": 1})
    assert len(list(rows)) == 2 and off == {"page": 3}
    rows, off = r.read(off)
    assert len(list(rows)) == 2 and off == {"page": 5}
    rows, off = r.read(off)  # last page + termination
    assert len(list(rows)) == 1 and off == {"page": 6}


def test_max_parallel_pages_bounds_partition_count(tmpdirs):
    """max_parallel_pages=N plans at most N partitions with pages
    round-robined; every page is covered exactly once."""
    from dissertation_data_pipeline_spark.sources.datasource import (
        RestPagesReader,
    )

    r = RestPagesReader(
        {"endpoint": f"file://{tmpdirs}", "pages": "7",
         "max_parallel_pages": "3"}
    )
    parts = r.partitions()
    assert len(parts) == 3
    covered = sorted(p for part in parts for p in part.value)
    assert covered == list(range(1, 8))
    # default: one page per partition
    r1 = RestPagesReader({"endpoint": f"file://{tmpdirs}", "pages": "4"})
    assert [p.value for p in r1.partitions()] == [[1], [2], [3], [4]]


def test_record_ingested_hashes_records_exactly_what_was_read(
    spark, tmpdirs
):
    """Hashes recorded from the ingested frame itself — not from a
    second listing fetch that can observe a NEWER publication than
    the one ingested (the plan-vs-record race)."""
    from dissertation_data_pipeline_spark.sources.datasource import (
        load_known_hashes,
        record_ingested_hashes,
    )

    df = spark.createDataFrame(
        [("d1", "h1", "r1", "p"), ("d1", "h1", "r2", "p"),
         ("d2", "h9", "r1", "p")],
        "dataset_id string, content_hash string, record_id string, "
        "payload string",
    )
    state = os.path.join(tmpdirs, "hashes.json")
    record_ingested_hashes(state, df)
    assert load_known_hashes(state) == {"d1": "h1", "d2": "h9"}
