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
traceback).  ``compat.ensure_protobuf`` — called at this module's
import so every worker gets it while unpickling the processor —
satisfies the dependency on hosts where pip never installed protobuf
by aliasing a publicly-distributed on-disk pure-Python runtime (and
verifying the gencode actually loads).  Where even that fails, this
module still composes and plans; the parity test and the gate-row
registration probe the shim and skip/unregister cleanly, and the
production operator remains ``stateful.running_user_profile``.

Second runtime requirement, found the moment the protobuf wall fell:
TWS stores each named state variable in its own COLUMN FAMILY, which
the default HDFSBackedStateStoreProvider rejects outright
(UNSUPPORTED_FEATURE.STATE_STORE_MULTIPLE_COLUMN_FAMILIES) — every
TWS query must run under ``jobs.rocksdb_state_store``.  On a real
cluster that is the provider you would run stateful queries on
anyway (disk-bounded state, incremental checkpoints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

# Install the protobuf shim at MODULE IMPORT so it is active in every
# Python worker before the first state-protocol call: the worker imports
# this module while unpickling _ProfileProcessor (by-reference pickling),
# which happens strictly before pyspark's first lazy StateMessage_pb2
# import.  See compat.ensure_protobuf's docstring for the full argument.
from dissertation_data_pipeline_spark.compat import ensure_protobuf

ensure_protobuf()

from dissertation_data_pipeline_spark.streaming.stateful import (
    PROFILE_SCHEMA,
    STATE_SCHEMA,
    fold_profile,
)


class _ProfileProcessor(StatefulProcessor):
    """Running (n_events, value_sum, last_ts, distinct event types)
    per key — the accumulate step is ``stateful.fold_profile``, the
    SAME function the applyInPandasWithState operator runs, so the two
    APIs cannot drift (interchangeability pinned by test)."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "profile", STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        new_state, out = fold_profile(user_id, self._state.get(), rows)
        self._state.update(new_state)
        yield out

    def close(self) -> None:
        pass


def running_user_profile_tws(
    events: DataFrame, *, state_ttl_ms: int | None = None
) -> DataFrame:
    """Attach the profile operator via transformWithStateInPandas.

    ``state_ttl_ms`` bounds the store per key.  Spark REQUIRES
    ``timeMode='ProcessingTime'`` for any state with a TTL
    (STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL at query
    start otherwise), so the time mode follows the knob: None (finite
    AvailableNow drains terminate by default) without a TTL,
    ProcessingTime with one — continuous deployments that want
    bounded state accept the timer machinery that implies."""
    time_mode = "ProcessingTime" if state_ttl_ms is not None else "None"
    return (
        events.select("user_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_ProfileProcessor(state_ttl_ms),
            outputStructType=PROFILE_SCHEMA,
            outputMode="Update",
            timeMode=time_mode,
        )
    )
