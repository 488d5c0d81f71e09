"""[EXT] skew toolkit: result-equivalence + physical-plan contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators.skew import (
    key_skew_report,
    salted_agg,
    salted_join,
    with_salt,
)
from dissertation_data_pipeline_spark.tables import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain_join(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = o.join(c, ["o_custkey"])
    salted = salted_join(o, c, ["o_custkey"], salt=8)
    assert _rows(salted) == _rows(plain)


def test_salted_left_join_keeps_unmatched_big_rows_once(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "zz")], "k int, v string")
    small = spark.createDataFrame([(1, "dim1"), (2, "dim2")], "k int, d string")
    out = salted_join(big, small, ["k"], how="left", salt=4)
    assert _rows(out) == [(1, "a", "dim1"), (2, "b", "dim2"), (99, "zz", None)]


def test_salted_join_rejects_small_side_preserving_joins(spark):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    with pytest.raises(AssertionError):
        salted_join(df, df, ["k"], how="right")


def test_salted_agg_matches_plain_groupby(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").withColumn(
        "_price", F.col("o_totalprice").cast("decimal(18,2)")
    )
    plain = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_price").alias("total"),
        F.min("o_orderdate").alias("lo"),
        F.max("o_orderdate").alias("hi"),
    )
    salted = salted_agg(
        o,
        ["o_orderstatus"],
        {
            "n": ("count", "o_orderkey"),
            "total": ("sum", "_price"),
            "lo": ("min", "o_orderdate"),
            "hi": ("max", "o_orderdate"),
        },
        salt=8,
    )
    assert _rows(salted.select("o_orderstatus", "n", "lo", "hi")) == _rows(
        plain.select("o_orderstatus", "n", "lo", "hi")
    )
    # decimal partial sums widen precision; compare values, not dtypes
    assert _rows(salted.select(F.col("total").cast("double"))) == _rows(
        plain.select(F.col("total").cast("double"))
    )


def test_salted_agg_rejects_non_algebraic(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    with pytest.raises(AssertionError):
        salted_agg(o, ["o_orderstatus"], {"m": ("avg", "o_totalprice")})


def test_salt_column_reaches_the_shuffle(spark, sf_dir):
    """Physical contract: the partial-phase exchange hash-partitions on
    (key, _salt) — the hot key actually spreads."""
    o = load_table(spark, sf_dir, "orders")
    partial = with_salt(o, 8).groupBy("o_orderstatus", "_salt").agg(
        F.count(F.lit(1)).alias("c")
    )
    plan = partial._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" in plan
    assert "_salt" in plan[plan.index("hashpartitioning"):].split(")")[0]


def test_key_skew_report_flags_hot_key(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    hot = o.withColumn(
        "k", F.when(F.col("o_orderkey") % 10 < 7, F.lit(7)).otherwise(F.col("o_custkey"))
    )
    [top] = key_skew_report(hot, "k", top=1).collect()
    assert top["key"] == 7
    assert top["share"] > 0.65
    assert top["x_mean"] > 100


def test_aqe_splits_skewed_join_partitions(spark):
    """The OTHER half of the skew story: salting (above) is the
    explicit tool; AQE skew-join splitting is the automatic one. With a
    hot key holding 80% of a 2M-row side, the executed plan must show
    SortMergeJoin(skew=true) with a skewed AQEShuffleRead — the hot
    partition split into advisory-sized chunks, no salting needed.
    Thresholds are lowered to local-data sizes (production defaults:
    256MB / factor 5); the downstream agg must NOT be keyed on the join
    key, or Spark skips the split to preserve the required
    distribution (that interaction is exactly why the salted variants
    exist for keyed-output pipelines)."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big = spark.range(2_000_000).select(
            F.when(F.col("id") % 5 != 0, F.lit(7))
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(50_000).select(
            (F.col("id") % 1000).alias("k"), F.col("id").alias("r")
        )
        j = big.join(right, "k").select(F.sum("payload").alias("s"))
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:3000]
        assert "AQEShuffleRead skewed" in plan, plan[:3000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_agg_count_skips_nulls_like_plain_count(spark):
    # count(col) semantics: NULL inputs are not counted — exactly what
    # the documented oracle df.groupBy(k).agg(F.count(col)) does
    from pyspark.sql import Row

    from dissertation_data_pipeline_spark.operators.skew import salted_agg

    rows = [Row(k="a", x=1), Row(k="a", x=None), Row(k="a", x=3),
            Row(k="b", x=None)]
    df = spark.createDataFrame(rows, "k string, x int")
    got = {r.k: r.n for r in
           salted_agg(df, ["k"], {"n": ("count", "x")}, salt=4).collect()}
    assert got == {"a": 2, "b": 0}


def test_with_salt_is_deterministic_per_row_content(spark, sf_dir):
    # retry safety: the salt must be a pure function of row content so
    # stage recomputation cannot re-salt rows (SPARK-23207 class)
    from dissertation_data_pipeline_spark.operators.skew import with_salt

    df = load_table(spark, sf_dir, "orders").limit(200)
    a = with_salt(df, 16).select("o_orderkey", "_salt").collect()
    b = with_salt(df.repartition(7), 16).select("o_orderkey", "_salt").collect()
    assert {(r.o_orderkey, r._salt) for r in a} == {
        (r.o_orderkey, r._salt) for r in b
    }
