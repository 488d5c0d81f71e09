"""Unit tests for composite operators (SURVEY §2.2-§2.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dissertation_data_pipeline_spark import operators as ops
from dissertation_data_pipeline_spark.schemas import BILLS_COMBINED, conform


def test_conform_adds_and_types(spark):
    df = spark.createDataFrame([("CO", "HB1", "  ")], "state string, bill_number string, title string")
    out = conform(df, BILLS_COMBINED)
    assert [f.name for f in out.schema.fields] == [f.name for f in BILLS_COMBINED.fields]
    row = out.collect()[0]
    assert row["title"] is None  # whitespace-only canonicalized to NULL
    assert row["last_action_date"] is None  # missing column -> typed NULL


def test_union_conform_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id int, a string")
    b = spark.createDataFrame([(2,)], "id int")
    out = ops.union_conform(a, b).orderBy("id").collect()
    assert [r["a"] for r in out] == ["x", None]


def test_dedup_priority_explicit_order(spark):
    df = spark.createDataFrame(
        [("k1", "Manual_Curated", 1), ("k1", "Both_Manual_and_API", 2), ("k2", "API_Pipeline", 3)],
        "k string, method string, id int",
    )
    out = ops.dedup_priority(
        df, "k", "method", ["Manual_Curated", "Both_Manual_and_API", "API_Pipeline"], tiebreak=["id"]
    )
    got = {r["k"]: r["method"] for r in out.collect()}
    assert got == {"k1": "Manual_Curated", "k2": "API_Pipeline"}


def test_dedup_latest_per_key_tiebreak(spark):
    df = spark.createDataFrame(
        [("k", "2020-01-02", 5), ("k", "2020-01-02", 3), ("k", "2019-12-31", 1)],
        "k string, d string, id int",
    )
    out = ops.dedup_latest_per_key(df, "k", ["d"], tiebreak=["id"]).collect()
    assert len(out) == 1 and out[0]["id"] == 3  # latest date, lowest id wins


def test_flag_both_sources(spark):
    df = spark.createDataFrame(
        [("k1", "Manual"), ("k1", "API"), ("k2", "Manual")], "k string, collection_method string"
    )
    out = {(r["k"], r["collection_method"]) for r in ops.flag_both_sources(df, "k").collect()}
    assert out == {("k1", "Both_Manual_and_API"), ("k2", "Manual")}


def test_merge_duplicates_coalesce_fill(spark):
    df = spark.createDataFrame(
        [
            ("k", "2020-01-02", None, "urlA", 1),
            ("k", "2020-01-01", "Title B", None, 2),
            ("k", "2020-01-01", "Title C", "urlC", 3),
        ],
        "k string, d string, title string, url string, id int",
    )
    out = ops.merge_duplicates_coalesce_fill(
        df, "k", order_date_col="d", fill_cols=["title", "url"], tiebreak=["id"]
    ).collect()
    assert len(out) == 1
    row = out[0]
    # winner is the latest-date row (id=1); its missing title filled from
    # the next-best row in deterministic order (id=2 before id=3 only if
    # completeness ties — id=3 is more complete, so Title C wins? No:
    # fill order is (date desc, completeness desc, id): id=1, id=3 (2 fields), id=2 (1 field)
    assert row["url"] == "urlA"
    assert row["title"] == "Title C"


def test_duplicate_groups_and_conflicts(spark):
    df = spark.createDataFrame(
        [("k1", "a"), ("k1", "b"), ("k2", "c")], "k string, v string"
    )
    assert ops.duplicate_groups(df, "k").count() == 2
    rep = ops.conflict_report(df, "k", ["v"]).collect()
    assert len(rep) == 1 and rep[0]["v_distinct"] == 2


def test_anti_report(spark):
    dim = spark.createDataFrame([("CO",), ("WY",)], "state string")
    facts = spark.createDataFrame([("CO",)], "state string")
    out = ops.anti_report(dim, facts, "state").collect()
    assert [r["state"] for r in out] == ["WY"]


def test_top_k_frequency_deterministic_ties(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",), ("b",), ("c",)], "v string")
    out = ops.top_k_frequency(df, "v", 2).collect()
    assert [(r["v"], r["cnt"]) for r in out] == [("a", 2), ("b", 2)]


def test_snapshot_diff_classifies_all_states(spark):
    from dissertation_data_pipeline_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "C", 30.0), (4, "D", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "B", 20.0), (3, "Z", 30.0), (4, "D", 41.0), (5, "E", 50.0)],
        "k long, s string, v double",
    )
    got = {
        r["k"]: (r["status"], r["changed_cols"])
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    assert got == {
        1: ("removed", ""),
        2: ("unchanged", ""),
        3: ("changed", "s"),
        4: ("changed", "v"),
        5: ("added", ""),
    }


def test_snapshot_diff_null_safe(spark):
    """NULL -> value and value -> NULL are changes; NULL == NULL is not."""
    from dissertation_data_pipeline_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame([(1, None), (2, "x"), (3, None)], "k long, s string")
    new = spark.createDataFrame([(1, "y"), (2, None), (3, None)], "k long, s string")
    got = {
        r["k"]: r["status"] for r in snapshot_diff(old, new, ["k"], ["s"]).collect()
    }
    assert got == {1: "changed", 2: "changed", 3: "unchanged"}


def test_dense_ids_matches_global_rank_and_is_partition_invariant(spark):
    import pytest

    from dissertation_data_pipeline_spark.operators.ids import dense_ids

    df = spark.range(0, 500).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("key")
    )
    expected = {
        r["id"]: i
        for i, r in enumerate(
            sorted(df.collect(), key=lambda r: r["key"])
        )
    }
    for n_parts in (1, 3, 16):
        got = {
            r["id"]: r["dense_id"]
            for r in dense_ids(df, "key", num_partitions=n_parts).collect()
        }
        assert got == expected, f"mismatch at num_partitions={n_parts}"
    # contiguity: exactly 0..n-1
    assert sorted(expected.values()) == list(range(500))
    # duplicate keys make the total order ambiguous -> refuse
    dup = df.withColumn("key", F.lit("same"))
    with pytest.raises(ValueError, match="unique"):
        dense_ids(dup, "key")
