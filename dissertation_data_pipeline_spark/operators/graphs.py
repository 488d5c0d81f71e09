"""[EXT] Distributed graph analytics over pair/edge lists.

The dedup layer (dedup_ext/clusters) produces near-dup *graphs*; this
module adds the standard analytics over any undirected edge list:
degree statistics, component-size distribution, and triangle counting.

Triangle counting uses the degree-ordered orientation (Suri &
Vassilvitskii 2011, "Counting Triangles and the Curse of the Last
Reducer"): orient every edge from its lower-(degree, id) endpoint to
the higher one, enumerate wedges by self-joining oriented edges on the
center, and close them with a semi-join against the oriented edge set.
Orientation bounds every node's out-degree by O(sqrt(m)), so wedge
work is O(m^1.5) total and — the actual point — no single reducer
owns a hub's full neighborhood. A hard ``max_degree`` cap (drop
super-nodes first, count them separately) is the standard skew guard
for power-law graphs; capped counts are exact on the capped graph and
the report says what was dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["normalize_edges", "degree_stats", "triangle_count"]


def normalize_edges(
    pairs: DataFrame, src_col: str = "id_a", dst_col: str = "id_b"
) -> DataFrame:
    """Canonical undirected edge list: (u < v), self-loops dropped,
    duplicates collapsed. One shuffle (the distinct)."""
    u = F.least(F.col(src_col), F.col(dst_col)).alias("u")
    v = F.greatest(F.col(src_col), F.col(dst_col)).alias("v")
    return (
        pairs.select(u, v).filter(F.col("u") != F.col("v")).distinct()
    )


def degree_stats(edges: DataFrame) -> DataFrame:
    """Degree distribution of a normalized edge list: one row per
    degree value with the node count — the first diagnostic to run on
    any pair-generating dedup output (a fat tail here predicts skew in
    every downstream pair join)."""
    degrees = (
        edges.select(F.col("u").alias("id"))
        .union(edges.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return degrees.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


def triangle_count(
    edges: DataFrame, *, max_degree: int | None = None
) -> DataFrame:
    """Exact global triangle count by degree-ordered wedge closing.

    Returns one row: (n_triangles, n_nodes, n_edges, n_dropped_nodes).
    With ``max_degree`` set, nodes above the cap are removed first
    (with their incident edges) and reported in ``n_dropped_nodes`` —
    the super-node guard for power-law graphs.

    Plan: degrees (1 shuffle) -> orientation join (2 broadcast-or-
    shuffle hash joins on node id) -> wedge self-join on the center
    (out-degree bounded by orientation) -> closing semi-join on the
    (u, v) pair key. Everything is equi-join + aggregate; no node ever
    materializes its full neighborhood in one task.
    """
    e = edges.localCheckpoint(eager=False)
    degrees = (
        e.select(F.col("u").alias("id"))
        .union(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    if max_degree is not None:
        keep = degrees.filter(F.col("deg") <= max_degree)
        dropped = degrees.filter(F.col("deg") > max_degree).count()
        e = (
            e.join(keep.select(F.col("id").alias("u")), "u", "left_semi")
            .join(keep.select(F.col("id").alias("v")), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=False)
        )
        degrees = keep
    else:
        dropped = 0

    du = degrees.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = degrees.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    # orient low-(deg, id) -> high-(deg, id); ties break on id, so the
    # orientation is acyclic and every triangle has exactly one wedge
    # centered at its smallest endpoint
    lower_u = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_u, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_u, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .localCheckpoint(eager=False)
    )
    a, b = oriented.alias("a"), oriented.alias("b")
    wedges = a.join(
        b,
        (F.col("a.src") == F.col("b.src")) & (F.col("a.dst") < F.col("b.dst")),
    ).select(F.col("a.dst").alias("x"), F.col("b.dst").alias("y"))
    # a wedge (x, y) closes iff the oriented edge set contains x->y or
    # y->x; both endpoints outrank the center, so either direction is
    # possible — normalize wedge and edge to the (min, max) pair key
    closing = oriented.select(
        F.least("src", "dst").alias("x"), F.greatest("src", "dst").alias("y")
    )
    tri = (
        wedges.select(F.least("x", "y").alias("x"), F.greatest("x", "y").alias("y"))
        .join(closing, ["x", "y"], "left_semi")
        .count()
    )
    n_nodes = degrees.count()
    n_edges = e.count()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(tri, n_nodes, n_edges, dropped)],
        "n_triangles long, n_nodes long, n_edges long, n_dropped_nodes long",
    )
