"""[EXT] Skew-handling queries: salted join / salted two-phase
aggregation / key-skew diagnostics, oracle-checked.

The skew is synthesized (70% of orders collapse onto one hot customer
key), and the salted forms must return EXACTLY the rows of the plain
formulation — each oracle is the straightforward unsalted SQL, which is
the whole point: salting changes the physical distribution, never the
result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators.skew import (
    key_skew_report,
    salted_agg,
    salted_join,
)
from dissertation_data_pipeline_spark.plans.registry import register
from dissertation_data_pipeline_spark.tables import load_table

#: synthetic hot key: ~70% of orders land on customer 7
_HOT_SQL = "CASE WHEN o_orderkey % 10 < 7 THEN 7 ELSE o_custkey END"


def _hot_orders(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    hot = F.when(F.col("o_orderkey") % 10 < 7, F.lit(7)).otherwise(
        F.col("o_custkey")
    )
    return o.withColumn("hot_custkey", hot.cast("long"))


@register(
    "ext_salted_skew_join",
    f"""
    SELECT c_mktsegment, count(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM (SELECT *, {_HOT_SQL} AS hot_custkey FROM orders) o
    JOIN customer ON hot_custkey = c_custkey
    GROUP BY 1
    """,
)
def ext_salted_skew_join(spark, sf_dir):
    """Salted equi-join on a hot key (16-way spread, small side
    replicated), rolled up by segment. The oracle is the PLAIN join —
    salting must be result-invariant."""
    o = _hot_orders(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "hot_custkey"
    )
    joined = salted_join(o, c, ["hot_custkey"], salt=16)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
    )


@register(
    "ext_salted_two_phase_agg",
    f"""
    SELECT hot_custkey, count(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           min(o_orderdate) AS first_order, max(o_orderdate) AS last_order
    FROM (SELECT *, {_HOT_SQL} AS hot_custkey FROM orders)
    GROUP BY 1
    """,
)
def ext_salted_two_phase_agg(spark, sf_dir):
    """Two-phase salted aggregation over the hot key: partial per
    (key, salt), merge per key — identical rows to a plain groupBy."""
    o = _hot_orders(spark, sf_dir).withColumn(
        "_price", F.col("o_totalprice").cast("decimal(18,2)")
    )
    out = salted_agg(
        o,
        ["hot_custkey"],
        {
            "n_orders": ("count", "o_orderkey"),
            "total_value": ("sum", "_price"),
            "first_order": ("min", "o_orderdate"),
            "last_order": ("max", "o_orderdate"),
        },
        salt=16,
    )
    return out.withColumn("total_value", F.col("total_value").cast("double"))


@register(
    "ext_key_skew_report",
    f"""
    WITH counts AS (
      SELECT {_HOT_SQL} AS key, count(*) AS cnt FROM orders GROUP BY 1
    ), totals AS (
      SELECT sum(cnt) AS _rows, count(*) AS _keys FROM counts
    )
    SELECT key, cnt, round(cnt / _rows, 6) AS share,
           round(cnt * _keys / _rows, 6) AS x_mean
    FROM counts, totals
    ORDER BY cnt DESC, key LIMIT 10
    """,
)
def ext_key_skew_report(spark, sf_dir):
    """The salting decision input: top-key share + multiple of mean
    key frequency for the synthetic hot key."""
    return key_skew_report(_hot_orders(spark, sf_dir), "hot_custkey", top=10)
