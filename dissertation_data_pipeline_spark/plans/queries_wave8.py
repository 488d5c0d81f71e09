"""Wave 8 — two temporal/statistical closers.

- **nearest as-of join** (:func:`operators.temporal.asof_join_nearest`):
  pandas ``merge_asof(direction='nearest')`` semantics as two union-tag
  window passes — zero joins, one shuffle on the key. The oracle is the
  brute-force per-left-row argmin with the identical tie discipline.
- **grouped weighted median**
  (:func:`operators.analytics.grouped_weighted_median`): the weighted
  order statistic Spark lacks natively, exact int64 cumulative weights
  along a documented total order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators.analytics import (
    grouped_weighted_median,
)
from dissertation_data_pipeline_spark.operators.temporal import asof_join_nearest
from dissertation_data_pipeline_spark.plans.registry import register
from dissertation_data_pipeline_spark.tables import load_table


@register(
    "ext_asof_nearest",
    """
    WITH p AS (
      SELECT event_id AS p_id, user_id, epoch_us(ts) AS pt
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id AS c_id, user_id, epoch_us(ts) AS ct
      FROM events WHERE event_type = 'click'
    ),
    pairs AS (
      SELECT p.p_id, p.user_id, c.c_id, c.ct - p.pt AS delta_us,
             row_number() OVER (
               PARTITION BY p.p_id
               ORDER BY abs(c.ct - p.pt), c.ct, c.c_id
             ) AS rn
      FROM p JOIN c USING (user_id)
    )
    SELECT p_id AS event_id, user_id, c_id AS nearest_id,
           CAST(delta_us AS BIGINT) AS delta_us
    FROM pairs WHERE rn = 1
    """,
)
def ext_asof_nearest(spark, sf_dir):
    """[EXT] nearest as-of: every purchase aligned to its temporally
    closest click by the same user (|delta| min; ties -> earlier click,
    then smaller id). The engine runs two window passes over one
    union — zero joins — while the oracle brute-forces the per-purchase
    argmin over all same-user clicks; identical output proves the
    window formulation."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    return asof_join_nearest(
        left, right, ["user_id"], right_id="click_id"
    ).select("event_id", "user_id", "nearest_id", "delta_us")


@register(
    "ext_weighted_median",
    """
    WITH base AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             CAST(1 + user_id % 5 AS BIGINT) AS wgt,
             event_id
      FROM events WHERE value IS NOT NULL
    ),
    scored AS (
      SELECT event_type, cents,
             SUM(wgt) OVER (
               PARTITION BY event_type
               ORDER BY cents ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum,
             SUM(wgt) OVER (PARTITION BY event_type) AS tot
      FROM base
    )
    SELECT event_type,
           MIN(cents) AS weighted_median,
           CAST(MAX(tot) AS BIGINT) AS total_weight
    FROM scored WHERE 2 * cum >= tot
    GROUP BY 1
    """,
)
def ext_weighted_median(spark, sf_dir):
    """[EXT] per-event-type weighted (lower) median of the value in
    exact cents, weighted by a deterministic per-user weight — int64
    cumulative weights along the (value, event_id) total order, so the
    crossing row is engine-independent."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
        (1 + F.col("user_id") % 5).cast("long").alias("wgt"),
        "event_id",
    )
    return grouped_weighted_median(
        base, ["event_type"], "cents", "wgt", tiebreak_col="event_id"
    )
