"""[EXT] connected-components cluster resolution semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators.clusters import (
    connected_components,
    dedup_survivors,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_chain_converges_to_min_label(spark):
    # a 6-node path: needs multiple propagation rounds, not one hop
    cc = connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]))
    got = {r["doc_id"]: r["component_id"] for r in cc.collect()}
    assert got == {i: 1 for i in range(1, 7)}


def test_multiple_components_and_isolated_pairs(spark):
    cc = connected_components(
        _pairs(spark, [(10, 11), (11, 12), (20, 21), (30, 31), (31, 30)])
    )
    got = {r["doc_id"]: r["component_id"] for r in cc.collect()}
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}


def test_component_id_is_min_regardless_of_edge_direction(spark):
    # min id appears only as dst: label still flows against edge direction
    cc = connected_components(_pairs(spark, [(5, 1), (5, 9), (9, 7)]))
    got = {r["doc_id"]: r["component_id"] for r in cc.collect()}
    assert got == {1: 1, 5: 1, 9: 1, 7: 1}


def test_dedup_survivors_keep_canonical_and_untouched(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    cc = connected_components(_pairs(spark, [(2, 3), (3, 4), (6, 7)]))
    kept = sorted(
        r["doc_id"] for r in dedup_survivors(docs, cc).select("doc_id").collect()
    )
    # 3,4 fold into 2; 7 folds into 6; 1 and 5 never paired
    assert kept == [1, 2, 5, 6]


def test_empty_pairs_yield_empty_components(spark):
    cc = connected_components(_pairs(spark, []))
    assert cc.count() == 0
