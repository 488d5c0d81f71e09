"""[EXT] Custom stateful streaming via ``transformWithStateInPandas``
(Spark 4's successor to ``applyInPandasWithState``).

Same operator semantics as ``stateful.running_user_profile`` — a
per-``user_id`` running profile carried across micro-batches — on the
new typed-state API: named state variables (``getValueState`` /
``getListState`` / ``getMapState``) instead of one positional tuple,
lifecycle hooks (``init``/``close``), explicit timers instead of a
timeout conf, and per-state TTL.  Why the engine carries both:

- the OLD API couples eviction to the operator signature
  (``timeoutConf``), which is what forced the ``evict=False`` drain
  workaround documented in ``stateful.py`` — ProcessingTimeTimeout
  makes a finite AvailableNow drain spin forever;
- the NEW API's ``timeMode`` lives at the query level and
  ``timeMode="None"`` drains finitely BY DEFAULT, with eviction moved
  to state TTL (``ttlDurationMs``) — the 100 TB sizing knob survives
  without infecting the operator contract.

Parity between the two implementations is pinned by test: identical
final profiles over the same staged multi-batch drain.  Scale shape
is unchanged — state hash-partitioned by key, O(1) per key, Arrow
batches across the Python boundary.

RUNTIME DEPENDENCY: Spark's TWS state protocol speaks protobuf from
the Python worker (``pyspark.sql.streaming.proto.StateMessage_pb2``
imports ``google.protobuf``), which pyspark declares only as an
optional extra.  Without it the query fails at START with
"TransformWithStateInPySpark driver worker exited unexpectedly"
(reproduced here; the ImportError is buried in the driver-worker
traceback).  This module therefore composes and plans everywhere but
EXECUTES only where protobuf is installed — the parity test probes
the dependency and skips cleanly without it, and the production
operator remains ``stateful.running_user_profile``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from dissertation_data_pipeline_spark.streaming.stateful import (
    PROFILE_SCHEMA,
    STATE_SCHEMA,
)


class _ProfileProcessor(StatefulProcessor):
    """Running (n_events, value_sum, last_ts, distinct event types)
    per key — accumulate logic identical to stateful._make_update_profile
    so the two APIs are interchangeable (pinned by test)."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "profile", STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        cur = self._state.get()
        if cur is not None:
            n, vsum, last_us, type_csv = cur
            types = set(type_csv.split(",")) if type_csv else set()
        else:
            n, vsum, last_us, types = 0, 0.0, 0, set()

        for pdf in rows:
            n += len(pdf)
            vsum += float(pdf["value"].fillna(0.0).sum())
            ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
            last_us = max(last_us, int(ts_us.max()))
            types.update(pdf["event_type"].dropna().unique().tolist())

        self._state.update((n, vsum, last_us, ",".join(sorted(types))))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "value_sum": [vsum],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
                "n_event_types": [len(types)],
            }
        )

    def close(self) -> None:
        pass


def running_user_profile_tws(
    events: DataFrame, *, state_ttl_ms: int | None = None
) -> DataFrame:
    """Attach the profile operator via transformWithStateInPandas.
    ``state_ttl_ms`` bounds the store per key (None = unbounded —
    fine for finite AvailableNow drains, which terminate under
    timeMode='None' regardless, unlike the old API's timeout conf)."""
    return (
        events.select("user_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_ProfileProcessor(state_ttl_ms),
            outputStructType=PROFILE_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
