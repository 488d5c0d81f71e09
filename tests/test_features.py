"""Feature-engineering semantics: hash split, hashing trick, LOO target
encoding, correlation matrix."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators.features import (
    feature_hash_long,
    split_assign,
    target_encode_loo,
)
from dissertation_data_pipeline_spark.plans.registry import QUERIES


def test_split_proportions_and_determinism(spark):
    df = spark.range(20000).select(F.col("id").alias("doc_id"))
    counts = {
        r["split"]: r["n"]
        for r in df.select(split_assign("doc_id").alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n = sum(counts.values())
    assert counts["train"] / n == pytest.approx(0.80, abs=0.02)
    assert counts["val"] / n == pytest.approx(0.10, abs=0.01)
    assert counts["test"] / n == pytest.approx(0.10, abs=0.01)
    # repartitioning must not move any row across splits
    again = {
        r["split"]: r["n"]
        for r in df.repartition(13)
        .select(split_assign("doc_id").alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert again == counts


def test_feature_hash_preserves_token_mass(spark):
    df = spark.createDataFrame(
        [(1, "a b c a"), (2, "x"), (3, "p q p q p q")],
        "doc_id long, text string",
    )
    fh = feature_hash_long(df, "doc_id", "text", n_slots=8)
    rows = fh.collect()
    assert all(0 <= r["slot"] < 8 for r in rows)
    mass = {
        r["_id"]: r["m"]
        for r in fh.groupBy("_id").agg(F.sum("cnt").alias("m")).collect()
    }
    assert mass == {1: 4, 2: 1, 3: 6}  # every token lands in exactly one slot


def test_target_encode_loo_exact_and_singleton_null(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("a", 30), ("b", 5)],
        "cat string, y long",
    )
    got = {
        (r["cat"], r["y"]): r["loo_target_mean"]
        for r in target_encode_loo(df, "cat", "y").collect()
    }
    assert got[("a", 10)] == pytest.approx((20 + 30) / 2)
    assert got[("a", 20)] == pytest.approx((10 + 30) / 2)
    assert got[("a", 30)] == pytest.approx((10 + 20) / 2)
    assert got[("b", 5)] is None  # singleton category: no other rows


def test_corr_matrix_bounds_and_determinism(spark, sf_dir):
    # (the driver's synthetic lineitem draws measures independently, so
    # no pair is strongly correlated — assert the invariants instead)
    rows = QUERIES["ext_corr_matrix"].fn(spark, sf_dir).collect()
    assert len(rows) == 6
    for r in rows:
        assert -1.0 <= r["corr"] <= 1.0
    # exact integer moments -> bit-identical on rerun
    again = QUERIES["ext_corr_matrix"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_k_anonymity_suppresses_small_cohorts(spark, sf_dir):
    from dissertation_data_pipeline_spark.tables import load_table

    out = QUERIES["ext_k_anonymity"].fn(spark, sf_dir)
    cohorts = out.groupBy("event_type", "hour_of_day").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert cohorts.filter(F.col("n") < 50).count() == 0  # k holds in output
    # suppression only ever drops rows, never rewrites them
    e = load_table(spark, sf_dir, "events")
    assert out.count() <= e.count()
    # pseudonym is one-way but stable: same user -> same token
    tokens = out.select("pseudo_id").distinct().count()
    users_released = (
        e.select(
            "event_type",
            F.hour("ts").cast("long").alias("hour_of_day"),
            "user_id",
        )
        .join(
            out.select("event_type", "hour_of_day").distinct(),
            ["event_type", "hour_of_day"],
        )
        .select("user_id")
        .distinct()
        .count()
    )
    assert tokens == users_released


def test_feature_hash_long_ignores_empty_tokens(spark):
    from pyspark.sql import Row

    from dissertation_data_pipeline_spark.operators.features import feature_hash_long

    df = spark.createDataFrame(
        [Row(doc_id=1, text="a  b"), Row(doc_id=2, text="a b"), Row(doc_id=3, text="")]
    )
    rows = feature_hash_long(df, "doc_id", "text", n_slots=64).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r._id, {})[r.slot] = r.cnt
    assert by_doc[1] == by_doc[2]  # double space adds no phantom slot
    assert 3 not in by_doc  # empty doc has zero features


def test_target_encode_loo_skips_null_targets(spark):
    from pyspark.sql import Row

    from dissertation_data_pipeline_spark.operators.features import target_encode_loo

    df = spark.createDataFrame(
        [Row(id=1, cat="a", y=1), Row(id=2, cat="a", y=None), Row(id=3, cat="a", y=3),
         Row(id=4, cat="b", y=5), Row(id=5, cat="b", y=None)],
        "id int, cat string, y int",
    )
    got = {r.id: r.loo_target_mean for r in target_encode_loo(df, "cat", "y").collect()}
    assert got[1] == 3.0  # mean over the OTHER non-null row (y=3)
    assert got[3] == 1.0
    assert got[4] is None  # no other labeled row -> NULL, not 0.0
