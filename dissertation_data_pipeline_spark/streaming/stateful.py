"""[EXT] Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming, but its hand-rolled incremental state
(SURVEY §2.9 I1-I5: processed-sets, per-key caches, periodic flush) is
the batch ancestor of a keyed state store. This module provides the
Spark-native form: a per-key running profile maintained across
micro-batches with GroupState — the operator Structured Streaming's
built-in windowed aggregations cannot express (cross-batch,
non-windowed, custom merge logic with timeout-driven eviction).

Operator: ``running_user_profile`` — per ``user_id``, maintain
(event count, value sum, last seen timestamp, distinct event types
seen) across the whole stream, emitting the updated profile each time
the key appears in a micro-batch. State is evicted on processing-time
timeout, which bounds the store exactly like the reference's cache
eviction never did (its JSON caches grow forever — flagged in SURVEY
§2.9).

Scale notes: state is hash-partitioned by key across executors (the
state store shuffles on ``user_id``); per-key state is O(1) (a few
scalars + a bounded type set), so the store size is O(active keys) —
the 100 TB sizing knob is the timeout. Arrow batches amortize the
Python crossing exactly as in the Pandas-UDF operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("last_ts", TimestampType()),
        StructField("n_event_types", IntegerType()),
    ]
)

# state tuple: (n_events, value_sum, last_ts_epoch_us, types_json)
# The distinct-type set is serialized as a JSON array, NOT a bare
# comma-join: a type value containing ',' (or the empty string) would
# corrupt the set on reload across micro-batch boundaries.
STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("last_ts_us", LongType()),
        StructField("types_json", StringType()),
    ]
)


def fold_profile(
    user_id, state_tuple, batches: Iterator[pd.DataFrame]
) -> tuple[tuple, pd.DataFrame]:
    """The profile accumulate step, shared by BOTH stateful APIs
    (``applyInPandasWithState`` here, ``transformWithStateInPandas``
    in tws.py) so the two operators cannot silently drift: fold the
    batches into ``state_tuple`` (None = fresh key) and return
    ``(new_state_tuple, one_row_output_frame)``."""
    import json

    if state_tuple is not None:
        n, vsum, last_us, types_json = state_tuple
        types = set(json.loads(types_json)) if types_json else set()
    else:
        n, vsum, last_us, types = 0, 0.0, 0, set()

    for pdf in batches:
        n += len(pdf)
        vsum += float(pdf["value"].fillna(0.0).sum())
        ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
        last_us = max(last_us, int(ts_us.max()))
        types.update(pdf["event_type"].dropna().unique().tolist())

    new_state = (n, vsum, last_us, json.dumps(sorted(types)))
    out = pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "value_sum": [vsum],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
            "n_event_types": [len(types)],
        }
    )
    return new_state, out


def _make_update_profile(evict: bool, evict_after_ms: int):
    def _update_profile(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        new_state, out = fold_profile(
            user_id, state.get if state.exists else None, batches
        )
        state.update(new_state)
        if evict:
            state.setTimeoutDuration(evict_after_ms)
        yield out

    return _update_profile


def running_user_profile(
    events: DataFrame,
    *,
    evict: bool = True,
    evict_after_ms: int = 3_600_000,
) -> DataFrame:
    """Attach the stateful profile operator to a streaming events frame
    (columns: user_id, ts, event_type, value). Output mode: update.

    ``evict=True`` (continuous streams) bounds the state store with a
    processing-time idle timeout of ``evict_after_ms`` (default 1 h) —
    the 100 TB sizing knob, now actually tunable per deployment. Pass
    ``evict=False`` for finite ``Trigger.AvailableNow`` drains:
    ProcessingTimeTimeout makes ``shouldRunAnotherBatch`` permanently
    true (processing time always advances, so a timeout could always
    fire), and an AvailableNow run then never terminates — it spins
    empty "cleaning up state" micro-batches forever after the data is
    drained. A drain-everything run has no idle keys to evict, so
    NoTimeout loses nothing and lets the trigger actually complete.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_profile(evict, evict_after_ms),
            outputStructType=PROFILE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
