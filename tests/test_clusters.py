"""[EXT] connected-components cluster resolution semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators.clusters import (
    connected_components,
    connected_components_star,
    dedup_survivors,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


import pytest


@pytest.mark.parametrize("threshold", [2_000_000, 0], ids=["union-find", "loop"])
def test_chain_converges_to_min_label(spark, threshold):
    # a 6-node path: needs multiple propagation rounds, not one hop
    cc = connected_components(
        _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]),
        small_edge_threshold=threshold,
    )
    got = {r["doc_id"]: r["component_id"] for r in cc.collect()}
    assert got == {i: 1 for i in range(1, 7)}


@pytest.mark.parametrize("threshold", [2_000_000, 0], ids=["union-find", "loop"])
def test_multiple_components_and_isolated_pairs(spark, threshold):
    cc = connected_components(
        _pairs(spark, [(10, 11), (11, 12), (20, 21), (30, 31), (31, 30)]),
        small_edge_threshold=threshold,
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


# -- large-star/small-star fallback (Kiveris et al. 2014) -------------------

def _union_find_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_star_long_chain_converges_with_bounded_rounds(spark):
    """Adversarial diameter: a 120-node path. Large-star/small-star is
    O(log^2 n) rounds independent of diameter — max_iter=12 would starve
    pure per-hop propagation (diameter 119) but is ample here."""
    edges = [(i, i + 1) for i in range(120)]
    cc = connected_components_star(_pairs(spark, edges), max_iter=12)
    got = {r["doc_id"]: r["component_id"] for r in cc.collect()}
    assert got == {i: 0 for i in range(121)}


def test_star_matches_propagation_and_oracle_on_random_graphs(spark):
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(40 + 20 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = _pairs(spark, edges)
        star = {r["doc_id"]: r["component_id"] for r in connected_components_star(df).collect()}
        prop = {
            r["doc_id"]: r["component_id"]
            for r in connected_components(df, small_edge_threshold=0).collect()
        }
        auto = {r["doc_id"]: r["component_id"] for r in connected_components(df).collect()}
        oracle = _union_find_oracle(edges)
        assert star == prop == auto == oracle


def test_star_multiple_components_direction_insensitive(spark):
    cc = connected_components_star(
        _pairs(spark, [(5, 1), (5, 9), (9, 7), (20, 21), (30, 31)])
    )
    got = {r["doc_id"]: r["component_id"] for r in cc.collect()}
    assert got == {1: 1, 5: 1, 7: 1, 9: 1, 20: 20, 21: 20, 30: 30, 31: 30}


def test_star_keeps_self_pair_only_nodes(spark):
    # a node appearing ONLY in self-pairs is still "a node appearing in
    # a pair" — both variants must emit it as its own singleton
    from pyspark.sql import Row

    from dissertation_data_pipeline_spark.operators.clusters import (
        connected_components,
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [Row(id_a=5, id_b=5), Row(id_a=1, id_b=2)]
    )
    want = {(1, 1), (2, 1), (5, 5)}
    got_star = {
        (r.doc_id, r.component_id)
        for r in connected_components_star(pairs).collect()
    }
    got_prop = {
        (r.doc_id, r.component_id)
        for r in connected_components(pairs).collect()
    }
    assert got_star == want and got_prop == want


def test_components_drop_null_ids_consistently(spark):
    from pyspark.sql import Row

    from dissertation_data_pipeline_spark.operators.clusters import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [Row(id_a=None, id_b=3), Row(id_a=1, id_b=2)],
        "id_a bigint, id_b bigint",
    )
    # below the threshold -> single-task path; must not crash on NULL
    got = {
        (r.doc_id, r.component_id) for r in connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1)}
