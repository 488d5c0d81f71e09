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
    how: str = "inner",
) -> DataFrame:
    """Join two (already watermarked) streams on ``on``, keeping right
    rows with ``left_ts - within <= right_ts <= left_ts`` — e.g. each
    click joined to the same user's purchases from the previous hour.
    Right columns (other than the key) come back prefixed.

    Both inputs MUST have ``withWatermark`` applied (use
    ``read_events_stream``); the range predicate is what lets Spark
    expire join state, so it is mandatory here, not optional.

    ``how``: ``inner`` emits matches eagerly; ``left_outer``
    additionally emits a null-padded row for each unmatched left row —
    but only once the GLOBAL watermark (the MINIMUM of the two
    streams' watermarks) passes the left row's event time, i.e. once
    no future right row can still satisfy ``right_ts <= left_ts``.
    Left rows younger than the final watermark that never matched emit
    NOTHING — that is the streaming outer-join contract, not a bug,
    and it is exactly reproducible in batch:
    ``ts < min(max(left ts), max(right ts)) - delay`` (gate row
    ``s_stream_stream_left_outer`` pins it against the SQL oracle).

    ``full_outer`` additionally null-pads unmatched RIGHT rows, whose
    expiry rule is SHIFTED by the interval width: a right row at
    ``r_ts`` can still match a left row as late as ``r_ts + within``,
    so its null row emits only once ``r_ts + within < watermark``
    (gate row ``s_stream_stream_full_outer`` pins the asymmetry).
    """
    assert how in ("inner", "left_outer", "full_outer"), how
    clash = {
        f"{right_prefix}{c}" for c in right.columns if c != on
    } & set(left.columns)
    if clash:
        raise ValueError(
            f"prefixed right columns collide with left columns: "
            f"{sorted(clash)} — pick a different right_prefix"
        )
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
        # r[rts], not F.col(rts): the unqualified name is ambiguous
        # when the left stream itself carries an r_-prefixed column
        # (e.g. the output of an earlier interval join)
        & (r[rts] <= left[left_ts])
        & (r[rts] >= left[left_ts] - F.expr(f"INTERVAL {within}"))
    )
    joined = left.join(r, cond, how)
    # the key survives from WHICHEVER side is non-null: full_outer
    # emits unmatched RIGHT rows whose left[on] is NULL — dropping
    # r[on] there would leave the row unattributable to its key (for
    # inner/left_outer the coalesce is identically left[on])
    return joined.select(
        F.coalesce(left[on], r[on]).alias(on),
        *[left[c] for c in left.columns if c != on],
        *[r[c] for c in r.columns if c != on],
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static join: enrich a stream against a batch dimension.

    The static side is re-read per micro-batch (so dimension updates
    between batches are picked up) and carries NO streaming state at
    all — unlike a stream-stream join there is nothing to watermark,
    which is why this is the right shape for slowly-changing lookups
    (the reference's keyword/state-code tables). ``broadcast_dim``
    pins the physical strategy: a shuffled join would repartition
    every micro-batch.

    Left join keeps stream rows with no dimension match (nulls), the
    same contract as the batch `j1_left_join`.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)
