"""Graph analytics: triangle counting (degree-ordered orientation),
degree stats, edge normalization."""

from __future__ import annotations

import pytest

from dissertation_data_pipeline_spark.operators import graphs as g


@pytest.fixture(scope="module")
def spark():
    from dissertation_data_pipeline_spark.session import get_spark

    return get_spark()


def _edges(spark, pairs):
    return g.normalize_edges(
        spark.createDataFrame(pairs, "id_a long, id_b long")
    )


def _tri(spark, pairs, **kw):
    return g.triangle_count(_edges(spark, pairs), **kw).collect()[0]


def test_clique_triangles(spark):
    k5 = [(i, j) for i in range(5) for j in range(5) if i < j]
    r = _tri(spark, k5)
    assert (r["n_triangles"], r["n_nodes"], r["n_edges"]) == (10, 5, 10)


def test_path_and_star_have_no_triangles(spark):
    assert _tri(spark, [(1, 2), (2, 3), (3, 4)])["n_triangles"] == 0
    assert _tri(spark, [(0, i) for i in range(1, 6)])["n_triangles"] == 0


def test_shared_edge_triangles(spark):
    # two triangles sharing edge (1,2)
    r = _tri(spark, [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)])
    assert r["n_triangles"] == 2


def test_normalization_collapses_duplicates_and_loops(spark):
    r = _tri(spark, [(1, 2), (2, 1), (1, 1), (2, 3), (3, 1), (1, 3)])
    assert r["n_edges"] == 3
    assert r["n_triangles"] == 1


def test_degree_cap_drops_hub(spark):
    # star hub 0 (degree 5) + one triangle (10,11,12)
    pairs = [(0, i) for i in range(1, 6)] + [(10, 11), (11, 12), (10, 12)]
    r = _tri(spark, pairs, max_degree=3)
    assert r["n_dropped_nodes"] == 1
    assert r["n_triangles"] == 1
    assert r["n_edges"] == 3  # hub edges gone


def test_degree_stats(spark):
    rows = {
        r["degree"]: r["n_nodes"]
        for r in g.degree_stats(_edges(spark, [(0, 1), (0, 2), (0, 3)])).collect()
    }
    assert rows == {3: 1, 1: 3}
