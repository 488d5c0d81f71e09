"""SURVEY §2 long-tail coverage: the small projection/filter/agg/sort/
set/string operators that larger queries subsume but the inventory
lists line-by-line. Each gets a dedicated oracle-checked query so the
coverage map (COVERAGE.md) points at executable evidence, not prose.

Of the operators that are driver-side in the reference, only F-d4
(run timestamps — value inherently nondeterministic) remains without
a data-plane gate row; P11, F-s8, O3, K5, K6, J5 and A11 carry oracle
rows in queries_coverage3.py since round 7.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from dissertation_data_pipeline_spark.plans.registry import register
from dissertation_data_pipeline_spark.schemas import conform
from dissertation_data_pipeline_spark.tables import load_table


@register(
    "p1_p2_conform_contract",
    """
    SELECT c_custkey AS cust_id, c_name AS name, c_mktsegment AS segment,
           CAST(NULL AS VARCHAR) AS notes
    FROM customer
    """,
)
def p1_p2_conform_contract(spark, sf_dir):
    """P1 (build_master_corpus.py:73-85: project+rename to contract) +
    P2 (legiscan_normalizer.py:255-258: back-fill missing columns) —
    rename-select onto a fixed StructType via ``conform``, which adds
    the absent ``notes`` column as a typed NULL (the engine's canonical
    missing value, replacing the reference's ``""``)."""
    contract = StructType(
        [
            StructField("cust_id", LongType()),
            StructField("name", StringType()),
            StructField("segment", StringType()),
            StructField("notes", StringType()),
        ]
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )
    return conform(c, contract)


@register(
    "p3_p5_value_and_length_filters",
    """
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE upper(trim(p_brand)) <> 'BRAND#11' AND length(p_name) > 9
    """,
)
def p3_p5_value_and_length_filters(spark, sf_dir):
    """P3 (build_master_corpus.py:95: case-insensitive value-exclusion
    filter) + P5 (build_corpus.py:103-104: minimum text length) — NULLs
    fail both predicates natively, matching the reference's dropna."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        (F.upper(F.trim(F.col("p_brand"))) != "BRAND#11")
        & (F.length("p_name") > 9)
    ).select("p_partkey", "p_name", "p_brand")


@register(
    "p10_o4_deterministic_head",
    """
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders ORDER BY o_orderkey LIMIT 10
    """,
)
def p10_o4_deterministic_head(spark, sf_dir):
    """P10 (fetch_texts.py:86-87: --limit test runs) + O4
    (legiscan_normalizer.py:376: head-N preview) — ``limit`` pinned to
    a total order on the unique key; a bare limit is
    partition-nondeterministic and would not oracle-match."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
    )


@register(
    "a3_a5_minmax_mean",
    """
    SELECT o_orderstatus,
           min(year(o_orderdate)) AS min_year,
           max(year(o_orderdate)) AS max_year,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
             AS avg_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def a3_a5_minmax_mean(spark, sf_dir):
    """A3 (build_corpus.py:113: min/max year range) + A5
    (normalize_corpus.py:306: mean) — the mean is computed as an exact
    DECIMAL sum cast to double, divided by the count: double summation
    is reduction-order-dependent and would not hash-match the oracle."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.min(F.year("o_orderdate")).alias("min_year"),
        F.max(F.year("o_orderdate")).alias("max_year"),
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_price"),
    )


@register(
    "a10_completeness_histogram",
    """
    SELECT score, count(*) AS n FROM (
      SELECT (CASE WHEN o_orderkey % 5 <> 0 THEN 1 ELSE 0 END
            + CASE WHEN o_orderkey % 7 <> 0 THEN 1 ELSE 0 END
            + CASE WHEN o_orderkey % 11 <> 0 THEN 1 ELSE 0 END) AS score
      FROM orders
    ) GROUP BY score
    """,
)
def a10_completeness_histogram(spark, sf_dir):
    """A10 (legiscan_normalizer.py:316: row-wise completeness =
    ``notna().sum(axis=1)``) — sum of per-column not-NULL flags over
    deterministically synthesized missing fields, histogrammed."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    cols = [
        F.when(k % 5 != 0, F.col("o_orderstatus")),
        F.when(k % 7 != 0, F.col("o_orderpriority")),
        F.when(k % 11 != 0, F.col("o_orderdate").cast("string")),
    ]
    score = cols[0].isNotNull().cast("int")
    for c in cols[1:]:
        score = score + c.isNotNull().cast("int")
    return (
        o.select(score.alias("score"))
        .groupBy("score")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "u2_except_uncovered_nations",
    """
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT c_nationkey FROM customer WHERE c_custkey % 50 = 0
    """,
)
def u2_except_uncovered_nations(spark, sf_dir):
    """U2 (build_master_corpus.py:154-156: set difference for the
    missing-states report) — relational EXCEPT (``subtract``), the
    engine-native form of the reference's ``set(a) - set(b)``."""
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey")
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 50 == 0)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    return n.subtract(c)


@register(
    "o1_o5_sorted_frequency",
    """
    SELECT o_orderpriority, count(*) AS n
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def o1_o5_sorted_frequency(spark, sf_dir):
    """O1 (build_master_corpus.py:138: global sort) + O5
    (build_corpus.py:119: ``value_counts().sort_index()`` by-key output
    convention) — frequency table ordered by key, one shuffle + a
    global sort of the tiny aggregate."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


@register(
    "fs6_fs7_fs15_string_normalize",
    """
    SELECT s_suppkey,
           upper(trim(s_name)) AS name_upper,
           lower(trim(s_name)) AS name_lower,
           trim(concat('  ', s_name, '\t')) AS url_norm,
           length(s_name) AS name_len
    FROM supplier
    """,
)
def fs6_fs7_fs15_string_normalize(spark, sf_dir):
    """F-s6 (trim/upper/lower, pervasive e.g. build_corpus.py:68-75) +
    F-s7 (legiscan_normalizer.py:219-223: URL str-cast + strip) +
    F-s15 (build_corpus.py:84: ``str.len``) — pure built-in columns."""
    s = load_table(spark, sf_dir, "supplier")
    padded = F.concat(F.lit("  "), F.col("s_name"), F.lit("\t"))
    return s.select(
        "s_suppkey",
        F.upper(F.trim("s_name")).alias("name_upper"),
        F.lower(F.trim("s_name")).alias("name_lower"),
        F.trim(padded).alias("url_norm"),
        F.length("s_name").alias("name_len"),
    )


@register(
    "fs11_fa2_concat_fields",
    """
    SELECT n_nationkey,
           concat_ws('_', upper(trim(n_name)), CAST(n_regionkey AS VARCHAR))
             AS dim_key,
           concat_ws(' ',
             coalesce(CASE WHEN n_nationkey % 3 = 0 THEN NULL ELSE n_name END, ''),
             coalesce(CASE WHEN n_nationkey % 4 = 0 THEN NULL
                           ELSE lower(n_name) END, ''))
             AS search_text
    FROM nation
    """,
)
def fs11_fa2_concat_fields(spark, sf_dir):
    """F-s11 (legiscan_collector.py:222: label/key concat) + F-a2
    (tag_metadata.py:24-25: row-wise multi-column text concat with
    NaN→'' fill) — ``concat_ws`` over coalesced columns; missing
    fields synthesized deterministically."""
    n = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    return n.select(
        "n_nationkey",
        F.concat_ws(
            "_", F.upper(F.trim("n_name")), F.col("n_regionkey").cast("string")
        ).alias("dim_key"),
        F.concat_ws(
            " ",
            F.coalesce(F.when(k % 3 != 0, F.col("n_name")), F.lit("")),
            F.coalesce(F.when(k % 4 != 0, F.lower(F.col("n_name"))), F.lit("")),
        ).alias("search_text"),
    )
