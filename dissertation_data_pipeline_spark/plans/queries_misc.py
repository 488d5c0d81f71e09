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
             WHEN 1 THEN 'Introduced' WHEN 2 THEN 'Engrossed'
             WHEN 3 THEN 'Enrolled' WHEN 4 THEN 'Passed'
             WHEN 5 THEN 'Vetoed' WHEN 6 THEN 'Failed'
             ELSE 'Unknown'
           END AS status_label
    FROM orders
    """,
)
def fs4_status_decode(spark, sf_dir):
    """F-s4 (legiscan_collector.py:91-100): int status code -> label
    (codes synthesized from o_orderkey; the progress-event override is
    exercised in the collect_bills pipeline tests)."""
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
