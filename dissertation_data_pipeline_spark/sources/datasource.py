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
against a fragile API by setting ``max_parallel_pages`` — pages are
then round-robined into at most that many partitions, each fetching
its pages sequentially through the paced transport, so concurrent
requests can never exceed the bound.

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


#: one paced transport PER PROCESS, not per call: PolicyTransport's
#: min_interval pacing lives in instance state (_last_send), so a
#: fresh instance per fetch would reset the clock and let consecutive
#: pages go out back-to-back — the politeness contract must span
#: calls on the same executor/driver process.
_SHARED_TRANSPORT = None


def _shared_http_transport():
    global _SHARED_TRANSPORT
    if _SHARED_TRANSPORT is None:
        from dissertation_data_pipeline_spark.sources.transport import (
            http_transport,
        )

        _SHARED_TRANSPORT = http_transport()
    return _SHARED_TRANSPORT


def _fetch_json(
    endpoint: str,
    filename: str,
    query: str,
    transport=None,
    *,
    missing_ok: bool,
    contract: str,
):
    """The one scheme dispatch behind all three fetch surfaces.

    ``file://<dir>`` reads ``<dir>/<filename>``; ``http(s)://`` GETs
    ``<endpoint>?<query>`` through the process-shared paced transport
    (or an injected fake).  ``missing_ok=True`` maps a missing file /
    HTTP 404 to an empty result (the paginated-feed termination
    condition); ``missing_ok=False`` raises instead — replay paths use
    this, where a vanished page means data loss, not termination."""
    if endpoint.startswith("file://"):
        path = os.path.join(endpoint[len("file://"):], filename)
        if not os.path.exists(path):
            if missing_ok:
                return []
            raise FileNotFoundError(
                f"{contract}: {path} missing during strict (replay) read"
            )
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)
    if endpoint.startswith(("http://", "https://")):
        from dissertation_data_pipeline_spark.sources.transport import (
            TransportError,
        )

        t = transport if transport is not None else _shared_http_transport()
        sep = "&" if "?" in endpoint else "?"
        try:
            return t.get_json(f"{endpoint}{sep}{query}")
        except TransportError as e:
            is_404 = (
                getattr(e, "last_status", None) == 404
                or "HTTP 404" in str(e)
            )
            if missing_ok and is_404:
                return []
            raise
    raise NotImplementedError(
        f"unsupported endpoint scheme; file:// and http(s):// transports "
        f"implement the {contract} contract"
    )


def fetch_page(
    endpoint: str, page: int, transport=None, *, missing_ok: bool = True
) -> list[dict]:
    """Transport: return the records of one page.

    ``file://<dir>`` endpoints read ``<dir>/page-<n>.json`` (a JSON
    array), which is both the test fixture format and the cache layout
    a polite HTTP transport writes through (SURVEY §2.9 I1: content
    under a deterministic key enables hash-based change detection).

    ``http(s)://`` endpoints go through a ``PolicyTransport``
    (sources/transport.py): pacing, 429/5xx exponential backoff with
    Retry-After support, bounded retry budget — the reference's client
    politeness (legiscan_enricher.py:50-52,284-287) as an injectable
    layer. Pass ``transport`` to inject a fake in tests; omitted, the
    process-shared paced transport is used so pacing spans pages.

    With ``missing_ok=True`` (default) a missing page file / HTTP 404
    is an empty page — the paginated-feed termination condition.
    Replay paths pass ``missing_ok=False``: a page that existed when
    its offset was committed must not silently vanish from a replayed
    batch."""
    return _fetch_json(
        endpoint,
        f"page-{page}.json",
        f"page={page}",
        transport,
        missing_ok=missing_ok,
        contract="fetch_page",
    )


class RestPagesReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.endpoint = options.get("endpoint", "")
        self.pages = int(options.get("pages", "1"))
        mpp = options.get("max_parallel_pages")
        self.max_parallel_pages = int(mpp) if mpp is not None else None

    def partitions(self) -> list[InputPartition]:
        # Default: one partition per page — the unit of parallel fetch
        # AND of retry (a failed task refetches one page, not the
        # feed).  With max_parallel_pages=N, pages are round-robined
        # into at most N partitions, each fetching ITS pages
        # sequentially through the paced transport — a hard
        # concurrency bound against rate-limited APIs (task slots
        # can't exceed the partition count).
        pages = list(range(1, self.pages + 1))
        if self.max_parallel_pages is None:
            return [InputPartition([p]) for p in pages]
        n = max(1, self.max_parallel_pages)
        return [
            InputPartition(pages[i::n]) for i in range(min(n, len(pages)))
        ] or [InputPartition([])]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        for page in partition.value:
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
        # per-microbatch page cap: bounds driver memory AND commit
        # granularity — without it a large backlog (first start,
        # restart after downtime) becomes ONE unbounded microbatch
        # with nothing checkpointed until the whole feed is read
        self.max_pages_per_batch = int(
            options.get("max_pages_per_batch", "100")
        )

    def initialOffset(self) -> dict:
        return {"page": 1}

    def _rows(self, page: int, *, missing_ok: bool = True) -> list[tuple]:
        return [
            tuple(rec.get(f) for f in _FIELDS) + (page,)
            for rec in fetch_page(self.endpoint, page, missing_ok=missing_ok)
        ]

    def read(self, start: dict):
        page = int(start["page"])
        out: list[tuple] = []
        for _ in range(self.max_pages_per_batch):
            rows = self._rows(page)
            if not rows:
                break
            out.extend(rows)
            page += 1
        # backlog beyond the cap stays for the NEXT microbatch — the
        # offset only advances over pages actually read
        return iter(out), {"page": page}

    def readBetweenOffsets(self, start: dict, end: dict):
        # REPLAY of a committed batch: every page in [start, end) was
        # non-empty when the offset was committed, so a missing page
        # now is silent data loss, not feed termination — fail the
        # replay loudly (missing_ok=False) instead of returning a
        # partial batch
        out: list[tuple] = []
        for page in range(int(start["page"]), int(end["page"])):
            out.extend(self._rows(page, missing_ok=False))
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
    return _fetch_json(
        endpoint,
        "datasets.json",
        "op=list",
        transport,
        missing_ok=True,
        contract="fetch_dataset_list",
    )


def fetch_dataset(endpoint: str, dataset_id: str, transport=None) -> list[dict]:
    """Transport: ONE dataset's records — ``[{record_id, payload}]``.

    The reference's ``getDataset`` (legiscan_api.py:106-125) downloads
    a per-session archive; the engine's unit of parallelism and of
    retry is the dataset (one executor task re-fetches one dataset,
    never the whole listing). ``file://`` reads
    ``<dir>/dataset-<id>.json``; ``http(s)://`` GETs ``op=dataset``."""
    from urllib.parse import quote

    return _fetch_json(
        endpoint,
        f"dataset-{dataset_id}.json",
        f"op=dataset&id={quote(str(dataset_id), safe='')}",
        transport,
        missing_ok=True,
        contract="fetch_dataset",
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
    idempotent dataset payloads).

    CAUTION: pass the listing that was actually INGESTED.  Re-fetching
    the listing here records post-ingest hashes: a dataset republished
    between planning and recording would be marked current at its NEW
    hash while only the OLD payload was ingested — permanently
    skipped.  Prefer ``record_ingested_hashes``, which derives the
    hashes from the ingested DataFrame itself and cannot drift."""
    known = load_known_hashes(state_path)
    known.update({d["dataset_id"]: d["content_hash"] for d in listing})
    tmp = state_path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(known, fh)
    os.replace(tmp, state_path)


def record_ingested_hashes(state_path: str, ingested_df) -> None:
    """Record hashes from the ingested DataFrame itself (every row
    carries its dataset's planning-time ``content_hash``), so what is
    recorded is EXACTLY what was ingested — immune to the feed
    republishing between planning and recording.  Unchanged datasets
    produce no rows, and their recorded hashes are already current
    (that is why they were skipped)."""
    listing = [
        {"dataset_id": r["dataset_id"], "content_hash": r["content_hash"]}
        for r in ingested_df.select("dataset_id", "content_hash")
        .distinct()
        .collect()
    ]
    record_dataset_hashes(state_path, listing)


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
        df = df.localCheckpoint()   # one fetch; reused below
        ...   # transform + write
        record_ingested_hashes("/state/dataset_hashes.json", df)

    Record from the INGESTED frame, not a fresh listing fetch — see
    ``record_ingested_hashes`` for the planning-vs-recording race a
    re-fetched listing loses.
    """

    @classmethod
    def name(cls) -> str:
        return "bulk_datasets"

    def schema(self) -> str:
        return DATASET_FEED_SCHEMA

    def reader(self, schema) -> BulkDatasetsReader:
        return BulkDatasetsReader(self.options)
