"""Temporal joins and rollups: as-of join, interval join, hierarchical rollup.

The reference is pandas-based, where these shapes appear as
``pd.merge_asof``-style nearest-key alignment and row-wise interval
scans (e.g. enrichment lookups keyed by "most recent known state",
`scripts/legislation/legiscan_enricher.py`, and date-bucketed report
rollups in `build_corpus.py`). Spark has no built-in as-of join and a
naive inequality join degenerates to a broadcast-nested-loop, so both
operators here are re-expressed as *equi-shuffles*:

- :func:`asof_join` — the union-tag trick: tag both sides, union, one
  window over the key ordered by (ts, side), ``last(payload,
  ignorenulls)`` carries the most recent right row forward into each
  left row. **Zero joins, one shuffle on the key** — at 100 TB this is
  a single exchange co-partitioned by key, no candidate explosion, and
  skew behaves exactly like any window (AQE-splittable sort).
- :func:`interval_join` — time-bucketing: intervals explode into the
  coarse buckets they cover (bounded by interval_len/bucket_len + 1),
  probes hash to one bucket, equi-join on bucket + residual range
  filter. The shuffle is on the bucket key, so candidate pairs are
  bounded per bucket instead of |probe| x |intervals|.

Both come with DuckDB oracles in ``plans/queries_temporal.py`` (DuckDB
has native ASOF JOIN and an IEJoin for inequality joins, so the oracle
states the semantics directly).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.session import pin_spread

_SIDE = "_asof_side"
_TS = "_asof_ts"
_PAYLOAD = "_asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Sequence[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gets the latest right row with
    ``right_ts <= left_ts`` on the same key (inclusive), or NULLs.

    ``right`` must be unique per ``(on, right_ts)`` — pre-aggregate it
    (e.g. ``max_by``) if it is not; ties would otherwise be
    partition-order dependent. ``payload`` columns are carried from the
    matched right row, plus ``{right_ts}`` is surfaced as
    ``asof_{right_ts}``.

    Implementation: union-tag + running ``last(..., ignorenulls)`` —
    no join operator at all. The payload travels as ONE struct so all
    carried fields come atomically from the same right row even when
    individual fields are NULL.

    ``tolerance_seconds`` (like ``pd.merge_asof(tolerance=...)``):
    matches older than the tolerance are nulled out.
    """
    on = list(on)
    lcols = [c for c in left.columns if c not in on and c != left_ts]
    pay_struct = F.struct(
        F.col(right_ts).alias("asof_ts"), *[F.col(c) for c in payload]
    )

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(
            right.select(pay_struct.alias(_PAYLOAD)).schema[_PAYLOAD].dataType
        ).alias(_PAYLOAD),
    )
    # NULL-ts right rows sort NULLS FIRST with a NON-null payload
    # struct, so unfiltered they would be carried as the "most recent"
    # match for every left row — violating the right_ts <= left_ts
    # contract (an ASOF join can never match a NULL timestamp). NULL
    # join keys are dropped for the same reason: Window.partitionBy
    # groups NULLs together where equi-join semantics produce no match.
    r_clean = right.filter(F.col(right_ts).isNotNull())
    for k in on:
        r_clean = r_clean.filter(F.col(k).isNotNull())
    r_tagged = r_clean.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        pay_struct.alias(_PAYLOAD),
    )

    # side=0 sorts before side=1 at equal ts => inclusive (>=) semantics.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(_PAYLOAD, ignorenulls=True).over(w)
    if tolerance_seconds is not None:
        carried = F.when(
            F.unix_micros(F.col(_TS)) - F.unix_micros(carried["asof_ts"])
            <= tolerance_seconds * 1_000_000,
            carried,
        )

    out = (
        l_tagged.unionByName(r_tagged)
        .withColumn(_PAYLOAD, carried)
        .filter(F.col(_SIDE) == 1)
        .select(
            *on,
            F.col(_TS).alias(left_ts),
            *lcols,
            F.col(_PAYLOAD)["asof_ts"].alias(f"asof_{right_ts}"),
            *[F.col(_PAYLOAD)[c].alias(c) for c in payload],
        )
    )
    return out


def interval_join(
    probe: DataFrame,
    intervals: DataFrame,
    *,
    probe_ts: str,
    start: str,
    end: str,
    bucket_seconds: int,
    on: Sequence[str] = (),
) -> DataFrame:
    """Containment join: probe rows with ``start <= probe_ts < end``.

    Scale path: both sides bucket ``ts div bucket_seconds``; an interval
    covers ``ceil(len/bucket)+1`` consecutive buckets (``F.sequence`` +
    ``explode``), the probe hashes to exactly one, and the join becomes
    an equi-join on ``(on..., bucket)`` with the range predicate as a
    residual filter. Pick ``bucket_seconds`` near the typical interval
    length so the duplication factor stays ~2.

    Returns probe columns + interval columns (minus any shared key
    columns, kept once). Non-key column names must be DISJOINT between
    the two frames (rename upstream) — a shared non-key name would
    survive the join twice and make the final by-name projection
    ambiguous; enforced eagerly so the failure is a clear error at
    plan-build time, not an AnalysisException at resolution.
    """
    on = list(on)
    clash = (set(probe.columns) & set(intervals.columns)) - set(on)
    if clash:
        raise ValueError(
            f"interval_join requires disjoint non-key column names; "
            f"rename shared columns {sorted(clash)} on one side"
        )
    # '_bucket' is this operator's working column: withColumn would
    # silently OVERWRITE a caller's column of that name and the final
    # projection would emit the bucket index under it — refuse instead
    taken = {"_bucket"} & (set(probe.columns) | set(intervals.columns))
    if taken:
        raise ValueError(
            "interval_join reserves the column name '_bucket'; rename "
            "it on the input"
        )
    bucket = lambda c: (F.unix_micros(F.col(c)) / F.lit(bucket_seconds * 1_000_000)).cast("bigint")  # noqa: E731

    iv = intervals.withColumn(
        "_bucket", F.explode(F.sequence(bucket(start), bucket(end)))
    )
    pr = probe.withColumn("_bucket", bucket(probe_ts))
    icols = [c for c in intervals.columns if c not in on]
    # Pin the join parallelism: a containment join's OUTPUT is
    # |intervals-per-bucket| x |probes-per-bucket| per bucket — it can
    # be 100x its shuffle INPUT (dense anchors), and AQE would
    # coalesce the join to a handful of tasks (see
    # session.pinned_partitions; measured 479 s -> 2 s at sf1).  The
    # join reuses this distribution, so it costs no extra Exchange.
    pr = pin_spread(pr, *on, "_bucket")
    joined = pr.join(iv, on + ["_bucket"]).filter(
        (F.col(probe_ts) >= F.col(start)) & (F.col(probe_ts) < F.col(end))
    )
    return joined.select(*on, *[c for c in probe.columns if c not in on], *icols)


def time_rollup(
    df: DataFrame,
    ts: str,
    levels: Sequence[str],
    extra: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Hierarchical (hypertable-style) rollup: one pass produces every
    resolution level — (extra..., level1, level2, ...), coarser
    prefixes, and the grand total — tagged by ``grouping_id()``
    (first grouping column = most significant bit, identical to
    ANSI/DuckDB ``GROUPING(...)``).

    Spark computes ROLLUP via a single Expand + one aggregation, so
    partial (map-side) aggregation still applies at every level — at
    100 TB this beats N separate groupBys by ~N× on scan volume.
    """
    out = df
    for lv in levels:
        out = out.withColumn(f"{ts}_{lv}", F.date_trunc(lv, F.col(ts)))
    return out.rollup(*extra, *[f"{ts}_{lv}" for lv in levels]).agg(
        F.grouping_id().alias("gid"), *aggs
    )


def _scd2_order(ts_col: str, tiebreak: str | None) -> list[Column]:
    """The per-key total order both SCD2 entry points share."""
    return [F.col(ts_col).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )


def _emit_intervals(
    changed: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    order: list[Column],
) -> DataFrame:
    """Turn interval-opening rows into (key, attr, effective_from,
    effective_to, is_current) — shared by scd2_history and
    scd2_apply_batch so the two paths cannot drift (the
    ext_cdc_scd2_pipeline gate asserts them bit-identical)."""
    w = Window.partitionBy(key_col).orderBy(*order)
    return changed.withColumn("_next_ts", F.lead(ts_col).over(w)).select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("effective_from"),
        F.col("_next_ts").alias("effective_to"),
        F.when(F.col("_next_ts").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_current"),
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str = "ts",
    *,
    tiebreak: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history: collapse a per-key
    event stream into validity intervals of the tracked attribute.
    A row opens a new interval when the attribute differs from the
    previous event's value (or is the key's first event); the interval
    closes when the next interval opens (open intervals get
    ``is_current = 1`` and a NULL ``effective_to``).  NULL — not a
    far-future sentinel like 9999-12-31 — marks the open interval:
    sentinel timestamps overflow ns-resolution consumers (pandas
    ``datetime64[ns]`` tops out at 2262-04-11) while NULL survives any
    downstream representation; ``is_current`` carries the open flag
    explicitly so consumers never test the sentinel.

    The reference's master-corpus merge keeps only the *latest* row per
    key (build_master_corpus.py:238-258 keep-best); SCD2 is the
    history-preserving generalization warehouses use for the same feed.

    Plan: two windows over one (key, ts) sort — a single shuffle on the
    key, no joins. At 100 TB this partitions by key like any window;
    AQE splits skewed keys at the sort.
    """
    order = _scd2_order(ts_col, tiebreak)
    w = Window.partitionBy(key_col).orderBy(*order)
    # NULL attribute values are legitimate states: "is first event" is
    # detected by row_number (not by lag being NULL, which conflates a
    # NULL-valued predecessor with no predecessor) and "value changed"
    # is null-safe (plain != returns NULL for 'a' -> NULL transitions,
    # silently dropping the NULL interval; NULL -> NULL must NOT open a
    # new interval)
    changed = (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_prev", F.lag(attr_col).over(w))
        .filter(
            (F.col("_rn") == 1)
            | ~F.col("_prev").eqNullSafe(F.col(attr_col))
        )
        .drop("_rn", "_prev")
    )
    return _emit_intervals(changed, key_col, attr_col, ts_col, order)


def scd2_apply_batch(
    hist: DataFrame,
    batch: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str = "ts",
    *,
    tiebreak: str | None = None,
) -> DataFrame:
    """Incrementally maintain a :func:`scd2_history` table under a CDC
    batch of new events — the lakehouse-maintenance composition: change
    detection on the batch, then one MERGE onto the history.

    ``hist`` is a prior :func:`scd2_history` output (open intervals
    carry ``is_current = 1`` / NULL ``effective_to``); ``batch`` holds
    raw events strictly AFTER every event already folded into ``hist``.
    Change detection is *seeded*: each key's first batch event compares
    against that key's open-interval attribute (null-safely), so a
    batch that repeats the current state opens no interval — exactly
    the collapse :func:`scd2_history` performs across the boundary.
    The fold itself is :func:`merge_upsert` on the composite key
    ``(key, effective_from)``: a key's open interval matches its
    closure row (update: effective_to = first new change, is_current
    0), new intervals match nothing and insert, untouched history rows
    keep unchanged. The result is bit-identical to re-running
    :func:`scd2_history` over (old events + batch) — pinned by oracle
    (``ext_cdc_scd2_pipeline``) and property test.

    Plan/scale: one shuffle on the key seeds the batch (left join open
    intervals), one window pass finds changes, one full-outer MERGE
    join applies them — O(|batch|) work plus a single pass over the
    history, never a recompute of the event log. That is the nightly
    100 TB dimension-maintenance shape: the event history can be cold
    storage; only ``hist`` (bounded by distinct keys x change count)
    and the day's batch move.
    """
    from dissertation_data_pipeline_spark.operators.merge import merge_upsert

    order = _scd2_order(ts_col, tiebreak)
    w = Window.partitionBy(key_col).orderBy(*order)

    # the CURRENT slice feeds two legs (seeding + closures); if hist is
    # an unmaterialized plan (the pipeline gate row builds it from a
    # two-window pass over the raw events), each leg would re-run that
    # whole plan — materialize the slice once, it is bounded by
    # |distinct keys|, not history length
    cur = hist.filter(F.col("is_current") == 1).localCheckpoint()
    open_rows = cur.select(
        F.col(key_col),
        F.col(attr_col).alias("_seed"),
        F.lit(1).alias("_has_seed"),  # _seed itself may be a NULL state
    )
    seeded = batch.select(key_col, attr_col, ts_col, *(
        [tiebreak] if tiebreak else []
    )).join(open_rows, key_col, "left")

    # A batch row opens a new interval when its attribute null-safely
    # differs from the previous state: the key's open interval for the
    # first batch row (no open interval -> first-ever event, always a
    # change), the preceding batch row otherwise.
    first = F.col("_rn") == 1
    changed = (
        seeded.withColumn("_rn", F.row_number().over(w))
        .withColumn("_prev", F.lag(attr_col).over(w))
        .filter(
            (first & F.col("_has_seed").isNull())
            | (
                first
                & F.col("_has_seed").isNotNull()
                & ~F.col("_seed").eqNullSafe(F.col(attr_col))
            )
            | (~first & ~F.col("_prev").eqNullSafe(F.col(attr_col)))
        )
    )
    new_iv = _emit_intervals(changed, key_col, attr_col, ts_col, order)

    # Closure rows: a key's first new interval closes its open interval
    # (composite merge key = the open interval's own effective_from).
    first_new = new_iv.groupBy(key_col).agg(
        F.min("effective_from").alias("_close_ts")
    )
    closures = (
        cur
        .join(first_new, key_col)
        .select(
            F.col(key_col),
            F.lit(None).cast(hist.schema[attr_col].dataType).alias(attr_col),
            F.col("effective_from"),
            F.col("_close_ts").alias("effective_to"),
            F.lit(0).alias("is_current"),
        )
    )
    source = closures.unionByName(new_iv)
    return merge_upsert(
        hist,
        source,
        [key_col, "effective_from"],
        update_set={
            "effective_to": F.col("s.effective_to"),
            "is_current": F.col("s.is_current"),
        },
        insert_values={
            key_col: F.col(f"s.{key_col}"),
            attr_col: F.col(f"s.{attr_col}"),
            "effective_from": F.col("s.effective_from"),
            "effective_to": F.col("s.effective_to"),
            "is_current": F.col("s.is_current"),
        },
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    *,
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """Batch sessionization: per key, a new session starts when the gap
    to the previous event exceeds ``gap_seconds``; ``session_idx`` is
    the running count of session starts (0-based). Gaps compare exact
    epoch microseconds so any engine agrees on boundary events.

    The streaming twin is ``streaming/windows.py``'s session window;
    this is the backfill/batch form. One shuffle on the key (both
    windows share the same sort), cumulative-sum framing pinned to
    ROWS so timestamp ties cannot change the frame.

    NULL timestamps are dropped (same convention as the asof family):
    they sort NULLS FIRST and would both start a spurious session and
    force a second start on the first real event (lag(ts) IS NULL is
    the new-session test), shifting every session_idx after them.
    """
    df = df.filter(F.col(ts_col).isNotNull())
    order = _scd2_order(ts_col, tiebreak)
    w = Window.partitionBy(key_col).orderBy(*order)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col(ts_col))
    gap_new = F.when(
        F.lag(F.col(ts_col)).over(w).isNull()
        | ((us - F.unix_micros(F.lag(F.col(ts_col)).over(w))) > gap_seconds * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn("_new_session", gap_new).withColumn(
        "session_idx", (F.sum("_new_session").over(wsum) - 1).cast("long")
    ).drop("_new_session")


def late_event_report(
    events: DataFrame,
    *,
    key: str,
    ts_col: str,
    arrival_col: str,
    allowed_lateness_s: int,
    group_col: str,
) -> DataFrame:
    """Batch watermark accounting: how much data WOULD have been late.

    Structured Streaming drops events older than ``max(event_time) -
    allowed lateness`` (the watermark). This operator replays a batch
    in arrival order (``arrival_col`` — a monotonically-assigned ingest
    id) and classifies each event against the per-key watermark that
    held *when it arrived*: late iff ``ts < max(ts over earlier
    arrivals of the same key) - allowed``. The per-``group_col`` report
    (event count / late count / worst lateness in microseconds) is the
    sizing input for choosing a production watermark delay.

    Scale: the watermark is a running max over a window partitioned by
    ``key`` — one shuffle, parallel across keys (a *global* arrival
    order would serialize; per-key order is what a keyed stream
    guarantees anyway). All time math — including the reported worst
    lateness — stays in exact int64 microseconds: no division, so no
    engine-specific float/rounding behavior can touch the values.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(arrival_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ts_us = F.unix_micros(F.col(ts_col))
    wm_us = F.max(ts_us).over(w) - F.lit(allowed_lateness_s * 1_000_000)
    flagged = events.select(
        F.col(group_col),
        ts_us.alias("_ts_us"),
        wm_us.alias("_wm_us"),
    ).withColumn(
        "_late", F.col("_wm_us").isNotNull() & (F.col("_ts_us") < F.col("_wm_us"))
    )
    return flagged.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("_late").cast("long")).alias("n_late"),
        F.coalesce(
            F.max(F.when(F.col("_late"), F.col("_wm_us") - F.col("_ts_us"))),
            F.lit(0),
        ).alias("max_lateness_us"),
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_id: str,
) -> DataFrame:
    """Nearest as-of join: each left row gets the right row with the
    smallest ABSOLUTE time difference on the same key (pandas
    ``merge_asof(direction='nearest')``) — the alignment batch feature
    stores use when sensor/label streams interleave both ways.

    Tie discipline (total, partition-independent): smaller |delta|
    wins; equal |delta| -> the EARLIER right event; same right
    timestamp -> the smaller ``right_id``. Left rows whose key has no
    right rows are dropped (inner semantics).

    Plan: the union-tag trick run in BOTH directions — two windows over
    one union, ZERO join operators, one shuffle on the key (the same
    100 TB shape as ``asof_join``; a naive nearest via inequality join
    would be a per-key cross product). The backward pass orders right
    rows (ts ASC, id DESC) so ``last`` lands on the max-ts/min-id
    candidate <= t; the forward pass does the mirror over ts DESC.

    Output: key cols, ``left_ts``, left payload cols, ``nearest_id``,
    ``delta_us`` (signed, right - left, exact int64 microseconds).

    NULL timestamps are excluded on both sides up front: a NULL ts has
    no position on the time axis (its unix_micros would sort
    arbitrarily in the union windows and could emit a match with NULL
    delta), so those rows can never be matched — same convention as
    the watermark/interval operators.
    """
    on = list(on)
    left = left.filter(F.col(left_ts).isNotNull())
    right = right.filter(F.col(right_ts).isNotNull())
    lcols = [c for c in left.columns if c not in on and c != left_ts]
    rstruct = F.struct(
        F.col("_ts_us").alias("rt"), F.col("_rid").alias("rid")
    )
    l_tagged = left.select(
        *on,
        F.unix_micros(F.col(left_ts)).alias("_ts_us"),
        F.col(left_ts).alias("_lts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(right.schema[right_id].dataType).alias("_rid"),
    )
    r_tagged = right.select(
        *on,
        F.unix_micros(F.col(right_ts)).alias("_ts_us"),
        F.lit(None).cast(left.schema[left_ts].dataType).alias("_lts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.col(right_id).alias("_rid"),
    )
    u = l_tagged.unionByName(r_tagged)
    # right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
    # same-timestamp right event is visible to both directions
    wb = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("_ts_us").asc(),
            F.col("_side").asc(),
            F.col("_rid").desc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("_ts_us").desc(),
            F.col("_side").asc(),
            F.col("_rid").desc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r_only = F.when(F.col("_side") == 0, rstruct)
    back = F.last(r_only, ignorenulls=True).over(wb)
    fwd = F.last(r_only, ignorenulls=True).over(wf)
    # materialize the two window results FIRST, then choose from the
    # column refs — choosing from the window expressions directly would
    # re-plan (and re-run) each window per reference
    db = F.col("_ts_us") - F.col("_back")["rt"]
    df_ = F.col("_fwd")["rt"] - F.col("_ts_us")
    chosen = (
        F.when(F.col("_back").isNull(), F.col("_fwd"))
        .when(F.col("_fwd").isNull(), F.col("_back"))
        .when(df_ < db, F.col("_fwd"))
        # strictly nearer back, or tie -> the earlier right event (back)
        .otherwise(F.col("_back"))
    )
    return (
        u.withColumn("_back", back)
        .withColumn("_fwd", fwd)
        .filter(F.col("_side") == 1)
        .withColumn("_chosen", chosen)
        .filter(F.col("_chosen").isNotNull())
        .select(
            *on,
            F.col("_lts").alias(left_ts),
            *lcols,
            F.col("_chosen")["rid"].alias("nearest_id"),
            (F.col("_chosen")["rt"] - F.col("_ts_us")).alias("delta_us"),
        )
    )
