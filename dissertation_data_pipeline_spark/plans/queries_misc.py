"""Remaining SURVEY §2 coverage queries: W4 preference-ranking,
F-s4 status decode, F-s5 title case, F-s10 safe filename."""

from __future__ import annotations

from pyspark.sql import functions as F

from dissertation_data_pipeline_spark import functions as fx
from dissertation_data_pipeline_spark.plans.registry import register
from dissertation_data_pipeline_spark.tables import load_table


@register(
    "w4_format_preference",
    """
    SELECT l_orderkey,
           best.pref AS pref,
           best.l_linenumber AS l_linenumber,
           best.l_partkey AS l_partkey
    FROM (
      SELECT l_orderkey,
             (list(struct_pack(pref := CASE WHEN l_linestatus = 'O' THEN 0 ELSE 1 END,
                               l_linenumber := l_linenumber,
                               l_partkey := l_partkey)
                   ORDER BY CASE WHEN l_linestatus = 'O' THEN 0 ELSE 1 END,
                            l_linenumber, l_partkey))[1] AS best
      FROM lineitem GROUP BY 1
    )
    """,
)
def w4_format_preference(spark, sf_dir):
    """W4 (legiscan_collector.py:171-177): pick the preferred element of
    a nested list by an explicit preference ladder (mime preference in
    the reference; l_linestatus here), deterministic tiebreaks."""
    li = load_table(spark, sf_dir, "lineitem")
    pref = F.when(F.col("l_linestatus") == "O", 0).otherwise(1)
    entry = F.struct(
        pref.alias("pref"),
        F.col("l_linenumber").alias("l_linenumber"),
        F.col("l_partkey").alias("l_partkey"),
    )
    return (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list(entry)).alias("ranked"))
        .select(
            "l_orderkey",
            F.col("ranked")[0]["pref"].alias("pref"),
            F.col("ranked")[0]["l_linenumber"].alias("l_linenumber"),
            F.col("ranked")[0]["l_partkey"].alias("l_partkey"),
        )
    )


@register(
    "fs4_status_decode",
    """
    SELECT o_orderkey,
           CASE (o_orderkey % 8)
             WHEN 0 THEN 'N/A'
             WHEN 1 THEN 'Introduced' WHEN 2 THEN 'Engrossed'
             WHEN 3 THEN 'Enrolled' WHEN 4 THEN 'Passed'
             WHEN 5 THEN 'Vetoed' WHEN 6 THEN 'Failed'
             ELSE 'Status ' || CAST(o_orderkey % 8 AS VARCHAR)
           END AS status_label
    FROM orders
    """,
)
def fs4_status_decode(spark, sf_dir):
    """F-s4 (legiscan_collector.py:91-100): int status code -> label,
    including the reference's 0 -> 'N/A' default and the
    'Status <n>' rendering for unknown codes (the %8 synthesis
    exercises code 7). The progress-event override is exercised in
    the collect_bills pipeline tests."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        fx.decode_status_code(F.col("o_orderkey") % 8).alias("status_label"),
    )


@register(
    "fs5_title_case",
    """
    SELECT c_custkey,
           array_to_string(
             list_transform(string_split(lower(c_mktsegment || ' ' || c_name), ' '),
                            w -> upper(w[1:1]) || w[2:]),
             ' ') AS titled
    FROM customer
    """,
)
def fs5_title_case(spark, sf_dir):
    """F-s5 (legiscan_normalizer.py:165-169): title case via initcap.
    Documented deviation from Python str.title(): word boundaries are
    whitespace only (initcap semantics), which the oracle mirrors."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        fx.title_case(F.lower(F.concat_ws(" ", "c_mktsegment", "c_name"))).alias("titled"),
    )


@register(
    "fs10_safe_filename",
    r"""
    SELECT p_partkey,
           regexp_replace(p_name || '/' || p_brand, '[/\\ ]', '_', 'g') AS fname
    FROM part
    """,
)
def fs10_safe_filename(spark, sf_dir):
    """F-s10 (text_processor.py:127): slash/backslash/space -> underscore."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        fx.safe_filename(F.concat_ws("/", "p_name", "p_brand")).alias("fname"),
    )


@register(
    "ext_histogram_equiwidth",
    """
    WITH mm AS (
      SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
    )
    SELECT least(CAST(floor((o_totalprice - lo) * 10 / (hi - lo)) AS BIGINT), 9) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders CROSS JOIN mm
    GROUP BY 1
    """,
)
def ext_histogram_equiwidth(spark, sf_dir):
    """[EXT] 10-bin equal-width histogram of order values: global
    min/max attach as a broadcast 1-row aggregate, binning is a codegen
    expression, counts aggregate map-side — two passes over the scan,
    zero driver-side math. Bin edges are the same IEEE doubles in both
    engines, so bucket assignment is identical."""
    o = load_table(spark, sf_dir, "orders")
    mm = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    bucket = F.least(
        F.floor(
            (F.col("o_totalprice") - F.col("lo")) * 10 / (F.col("hi") - F.col("lo"))
        ).cast("long"),
        F.lit(9).cast("long"),
    )
    return (
        o.crossJoin(F.broadcast(mm))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


@register(
    "ext_pct_of_total",
    """
    WITH rev AS (
      SELECT n_name,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1
    )
    SELECT n_name,
           CAST(r AS DOUBLE) AS revenue,
           round(CAST(r AS DOUBLE) / CAST(SUM(r) OVER () AS DOUBLE), 6) AS share
    FROM rev
    """,
)
def ext_pct_of_total(spark, sf_dir):
    """[EXT] ratio-to-report: each nation's revenue share of the
    corpus total via an empty-frame window sum over the (tiny)
    aggregated frame — the denominators never touch fact-table rows.
    Exact decimal sums on both sides of the division."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r"))
    )
    w = Window.partitionBy()
    return rev.select(
        "n_name",
        F.col("r").cast("double").alias("revenue"),
        F.round(
            F.col("r").cast("double") / F.sum("r").over(w).cast("double"), 6
        ).alias("share"),
    )


@register(
    "ext_mad_outliers",
    """
    WITH cents AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events
    ), med AS (
      SELECT event_type, quantile_cont(v, 0.5) AS m FROM cents GROUP BY 1
    ), dev AS (
      SELECT c.event_type, c.v, med.m, abs(c.v - med.m) AS d
      FROM cents c JOIN med USING (event_type)
    ), mad AS (
      SELECT event_type, quantile_cont(d, 0.5) AS mad FROM dev GROUP BY 1
    )
    SELECT dev.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN dev.d > 5 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev JOIN mad USING (event_type)
    GROUP BY 1
    """,
)
def ext_mad_outliers(spark, sf_dir):
    """[EXT] robust outlier screen: median absolute deviation per
    event_type over integer cents (exact percentile interpolation —
    both engines IEEE-agree), outliers = |v - median| > 5*MAD. Two
    grouped percentile passes + one flagging aggregation; the per-type
    medians ride broadcast joins back onto the rows."""
    e = load_table(spark, sf_dir, "events")
    cents = e.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("v"),
    )
    med = cents.groupBy("event_type").agg(
        F.percentile("v", F.lit(0.5)).alias("m")
    )
    dev = cents.join(F.broadcast(med), "event_type").select(
        "event_type", "v", F.abs(F.col("v") - F.col("m")).alias("d")
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("d", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("d") > 5 * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )


@register(
    "ext_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def ext_event_transitions(spark, sf_dir):
    """[EXT] first-order Markov transition counts over per-user event
    sequences: one window shuffle on user_id (total order (ts,
    event_id) — partition-count invariant), then a map-side-combined
    pair count. The behavioral-analytics primitive behind funnels and
    session models."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "ext_cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY 1
    )
    SELECT f.cohort_week,
           CAST(floor(date_diff('day', f.cohort_week,
                                CAST(e.ts AS DATE)) / 7.0) AS BIGINT) AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_active
    FROM events e JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
)
def ext_cohort_retention(spark, sf_dir):
    """[EXT] cohort retention: users cohorted by the ISO week of their
    first event; per (cohort, week-offset) distinct active users. One
    groupBy for cohort assignment (broadcast back onto events — the
    cohort table is |users|-sized, far under the fact table), one
    count-distinct aggregation."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    joined = e.join(F.broadcast(firsts), "user_id")
    offset = F.floor(
        F.datediff(F.col("ts").cast("date"), F.col("cohort_week")) / 7.0
    ).cast("long")
    return joined.groupBy(
        "cohort_week", offset.alias("week_offset")
    ).agg(F.countDistinct("user_id").alias("n_active"))
