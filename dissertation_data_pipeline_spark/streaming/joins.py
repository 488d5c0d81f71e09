"""Stream-stream joins ([EXT]): watermarked interval equi-joins.

The reference's enrichment step (`legiscan_enricher.py`) joins "rows
needing data" against "API responses as they arrive" in a driver loop.
The streaming-native form is a stream-stream join: both sides carry an
event-time watermark, the join condition adds a time-range bound, and
Spark keeps only the state inside watermark+range — so state size is
O(rate x window), not O(history). Without the time bound the state
would grow forever; asserting it is part of the operator contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner-join two (already watermarked) streams on ``on``, keeping
    right rows with ``left_ts - within <= right_ts <= left_ts`` — e.g.
    each click joined to the same user's purchases from the previous
    hour. Right columns (other than the key) come back prefixed.

    Both inputs MUST have ``withWatermark`` applied (use
    ``read_events_stream``); the range predicate is what lets Spark
    expire join state, so it is mandatory here, not optional.
    """
    r = right.select(
        F.col(on),
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c != on
        ],
    )
    rts = f"{right_prefix}{right_ts}"
    cond = (
        (left[on] == r[on])
        & (F.col(rts) <= left[left_ts])
        & (F.col(rts) >= left[left_ts] - F.expr(f"INTERVAL {within}"))
    )
    return left.join(r, cond, "inner").drop(r[on])
