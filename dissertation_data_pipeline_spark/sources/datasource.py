"""Spark 4 Python DataSource for paginated REST-style bill feeds.

The reference consumes the OpenStates API through a driver-side
generator that walks pages sequentially
(src/legal_pipeline/apis/openstates.py:8-34: ``iter_bills`` bumps
``params["page"]`` until a short page). SURVEY §2.1 S6 marks the
Spark-native long-term form: a ``DataSource`` with **one input
partition per page**, so page fetches run in parallel on executors and
the result is a first-class DataFrame (pushdown-able projections,
plannable joins) instead of a driver bottleneck.

Offline-testable by design: the transport is pluggable. The default
``file://`` transport reads ``page-<n>.json`` files from a directory
(the test fixture shape); a real HTTP transport drops in behind the
same ``fetch_page(endpoint, page) -> list[dict]`` contract without
touching the planner-facing classes. Rate limiting lives in the
transport (SURVEY §4.1 O-m7: not an engine concern); bound parallelism
against a fragile API by setting ``max_parallel_pages`` — partitions
beyond it are still planned, Spark's scheduler just runs them as slots
free.

Usage::

    spark.dataSource.register(RestPagesDataSource)
    df = (spark.read.format("rest_pages")
          .option("endpoint", "file:///fixtures/bills")
          .option("pages", "5")
          .load())
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

try:  # Spark >= 4 only; the module degrades to an ImportError marker
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover - pyspark 3.x fallback
    HAVE_DATASOURCE_API = False

    class DataSource:  # type: ignore[no-redef]
        def __init__(self, options):
            self.options = options

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        def __init__(self, value):
            self.value = value

    class SimpleDataSourceStreamReader:  # type: ignore[no-redef]
        pass


#: the bill-feed contract (a flattened OpenStates record shape —
#: openstates.py yields dicts with these keys; extras are dropped at
#: the transport edge, matching the reference's projection-to-contract)
BILL_FEED_SCHEMA = (
    "jurisdiction string, session string, identifier string, "
    "title string, page int"
)
_FIELDS: Sequence[str] = ("jurisdiction", "session", "identifier", "title")


def fetch_page(endpoint: str, page: int, transport=None) -> list[dict]:
    """Transport: return the records of one page.

    ``file://<dir>`` endpoints read ``<dir>/page-<n>.json`` (a JSON
    array), which is both the test fixture format and the cache layout
    a polite HTTP transport writes through (SURVEY §2.9 I1: content
    under a deterministic key enables hash-based change detection).
    A missing page file is an empty page — the paginated-feed
    termination condition.

    ``http(s)://`` endpoints go through a ``PolicyTransport``
    (sources/transport.py): pacing, 429/5xx exponential backoff with
    Retry-After support, bounded retry budget — the reference's client
    politeness (legiscan_enricher.py:50-52,284-287) as an injectable
    layer. Pass ``transport`` to inject a fake in tests; omitted, a
    real paced urllib transport is constructed per call site (executor
    task == one sequential polite client, matching the reference).
    An HTTP 404 is an empty page — same termination condition as a
    missing page file.
    """
    if endpoint.startswith("file://"):
        path = os.path.join(endpoint[len("file://"):], f"page-{page}.json")
        if not os.path.exists(path):
            return []
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)
    if endpoint.startswith(("http://", "https://")):
        from dissertation_data_pipeline_spark.sources.transport import (
            TransportError,
            http_transport,
        )

        t = transport if transport is not None else http_transport()
        sep = "&" if "?" in endpoint else "?"
        try:
            return t.get_json(f"{endpoint}{sep}page={page}")
        except TransportError as e:
            if getattr(e, "last_status", None) == 404 or "HTTP 404" in str(e):
                return []
            raise
    raise NotImplementedError(
        "unsupported endpoint scheme; file:// and http(s):// transports "
        "implement the fetch_page contract"
    )


class RestPagesReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.endpoint = options.get("endpoint", "")
        self.pages = int(options.get("pages", "1"))

    def partitions(self) -> list[InputPartition]:
        # one partition per page: the unit of parallel fetch AND of
        # retry (a failed task refetches one page, not the feed)
        return [InputPartition(p) for p in range(1, self.pages + 1)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        page = partition.value
        for rec in fetch_page(self.endpoint, page):
            yield tuple(rec.get(f) for f in _FIELDS) + (page,)


class RestPagesStreamReader(SimpleDataSourceStreamReader):
    """Streaming side of the paginated feed: offset = next unread page.

    The reference re-polls the API per run and re-skips known pages via
    its processed-set JSON (utils.py:14-53); a streaming source makes
    the offset the engine's checkpointed state instead. Each microbatch
    reads every currently-available page from the offset forward and
    advances to the first missing page (the feed's termination
    condition); recovery replays deterministically via
    ``readBetweenOffsets`` — pages are immutable once published, the
    same property the reference's content-hash cache relies on.

    The Simple stream-reader API reads on the driver — right-sized for
    feed ingestion (rate-limited pages, not data-plane volume); the
    heavy lifting stays in the DataFrame transformations downstream.
    """

    def __init__(self, options: dict) -> None:
        self.endpoint = options.get("endpoint", "")

    def initialOffset(self) -> dict:
        return {"page": 1}

    def _rows(self, page: int) -> list[tuple]:
        return [
            tuple(rec.get(f) for f in _FIELDS) + (page,)
            for rec in fetch_page(self.endpoint, page)
        ]

    def read(self, start: dict):
        page = int(start["page"])
        out: list[tuple] = []
        while True:
            rows = self._rows(page)
            if not rows:
                break
            out.extend(rows)
            page += 1
        return iter(out), {"page": page}

    def readBetweenOffsets(self, start: dict, end: dict):
        out: list[tuple] = []
        for page in range(int(start["page"]), int(end["page"])):
            out.extend(self._rows(page))
        return iter(out)


class RestPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest_pages"

    def schema(self) -> str:
        return BILL_FEED_SCHEMA

    def reader(self, schema) -> RestPagesReader:
        return RestPagesReader(self.options)

    def simpleStreamReader(self, schema) -> RestPagesStreamReader:
        return RestPagesStreamReader(self.options)


# ---------------------------------------------------------------------------
# S7 — bulk-dataset source with hash-incremental skip
# ---------------------------------------------------------------------------

#: bulk-dataset record contract: each dataset unpacks to keyed payload
#: rows, tagged with the dataset id + the listing's content hash (the
#: hash is what downstream state recording persists — I1)
DATASET_FEED_SCHEMA = (
    "dataset_id string, content_hash string, record_id string, payload string"
)


def fetch_dataset_list(endpoint: str, transport=None) -> list[dict]:
    """Transport: the dataset LISTING — ``[{dataset_id, content_hash}]``.

    The reference's ``getDatasetList`` (legiscan_api.py:84-104) returns
    per-session dataset descriptors whose ``dataset_hash`` is the
    change-detection key. ``file://<dir>`` endpoints read
    ``<dir>/datasets.json``; ``http(s)://`` endpoints GET
    ``<endpoint>?op=list`` through the paced transport."""
    if endpoint.startswith("file://"):
        path = os.path.join(endpoint[len("file://"):], "datasets.json")
        if not os.path.exists(path):
            return []
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)
    if endpoint.startswith(("http://", "https://")):
        from dissertation_data_pipeline_spark.sources.transport import (
            http_transport,
        )

        t = transport if transport is not None else http_transport()
        sep = "&" if "?" in endpoint else "?"
        return t.get_json(f"{endpoint}{sep}op=list")
    raise NotImplementedError(
        "unsupported endpoint scheme; file:// and http(s):// transports "
        "implement the fetch_dataset_list contract"
    )


def fetch_dataset(endpoint: str, dataset_id: str, transport=None) -> list[dict]:
    """Transport: ONE dataset's records — ``[{record_id, payload}]``.

    The reference's ``getDataset`` (legiscan_api.py:106-125) downloads
    a per-session archive; the engine's unit of parallelism and of
    retry is the dataset (one executor task re-fetches one dataset,
    never the whole listing). ``file://`` reads
    ``<dir>/dataset-<id>.json``; ``http(s)://`` GETs ``op=dataset``."""
    if endpoint.startswith("file://"):
        path = os.path.join(
            endpoint[len("file://"):], f"dataset-{dataset_id}.json"
        )
        if not os.path.exists(path):
            return []
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)
    if endpoint.startswith(("http://", "https://")):
        from dissertation_data_pipeline_spark.sources.transport import (
            http_transport,
        )

        t = transport if transport is not None else http_transport()
        sep = "&" if "?" in endpoint else "?"
        return t.get_json(f"{endpoint}{sep}op=dataset&id={dataset_id}")
    raise NotImplementedError(
        "unsupported endpoint scheme; file:// and http(s):// transports "
        "implement the fetch_dataset contract"
    )


def load_known_hashes(state_path: str) -> dict[str, str]:
    """``{dataset_id: content_hash}`` recorded by a previous run (the
    engine twin of legiscan_api.py:21-56's hash file). Missing file ==
    first run == everything is new."""
    if not state_path or not os.path.exists(state_path):
        return {}
    with open(state_path, encoding="utf-8") as fh:
        return json.load(fh)


def record_dataset_hashes(state_path: str, listing: list[dict]) -> None:
    """Persist the listing's hashes AFTER a successful ingest —
    write-tmp-then-rename so a crash mid-record never corrupts state
    (same discipline as StateTable.upsert). Deliberately a separate
    caller-driven step, NOT a side effect of the read: a failed
    downstream write must leave the hashes unrecorded so the next run
    re-ingests (at-least-once, converging on exactly-once via the
    idempotent dataset payloads)."""
    known = load_known_hashes(state_path)
    known.update({d["dataset_id"]: d["content_hash"] for d in listing})
    tmp = state_path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(known, fh)
    os.replace(tmp, state_path)


class BulkDatasetsReader(DataSourceReader):
    """Partition-per-CHANGED-dataset batch reader. The listing fetch
    and the hash-skip happen at PLANNING time on the driver (one tiny
    listing call — the reference does the same sequentially); dataset
    payload fetches run in parallel on executors. A dataset whose
    listed hash equals the recorded one produces NO partition at all:
    skipped work is work the cluster never schedules."""

    def __init__(self, options: dict) -> None:
        self.endpoint = options.get("endpoint", "")
        self.state_path = options.get("state_path", "")

    def partitions(self) -> list[InputPartition]:
        known = load_known_hashes(self.state_path)
        parts = [
            InputPartition((d["dataset_id"], d["content_hash"]))
            for d in fetch_dataset_list(self.endpoint)
            if known.get(d["dataset_id"]) != d["content_hash"]
        ]
        # everything up to date: the DataSource API requires >= 1
        # partition (an empty list makes Spark schedule read(None)),
        # so plan one explicit no-op partition
        return parts or [InputPartition(None)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        if partition is None or partition.value is None:
            return
        ds_id, content_hash = partition.value
        for rec in fetch_dataset(self.endpoint, ds_id):
            yield (ds_id, content_hash, rec.get("record_id"), rec.get("payload"))


class BulkDatasetsDataSource(DataSource):
    """S7 as a first-class batch source::

        spark.dataSource.register(BulkDatasetsDataSource)
        df = (spark.read.format("bulk_datasets")
              .option("endpoint", "file:///fixtures/legiscan")
              .option("state_path", "/state/dataset_hashes.json")
              .load())
        ...   # transform + write
        record_dataset_hashes("/state/dataset_hashes.json",
                              fetch_dataset_list(endpoint))
    """

    @classmethod
    def name(cls) -> str:
        return "bulk_datasets"

    def schema(self) -> str:
        return DATASET_FEED_SCHEMA

    def reader(self, schema) -> BulkDatasetsReader:
        return BulkDatasetsReader(self.options)
