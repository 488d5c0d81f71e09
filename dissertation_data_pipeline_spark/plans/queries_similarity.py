"""[EXT] similarity-search queries over the embeddings table.

The oracle reproduces the double math exactly: products are widened to
double and summed with ``list_reduce`` (strict left fold), matching
Spark's ``F.aggregate`` fold order, so cosine values are bit-identical
before the 6-decimal display rounding.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators import similarity as sim
from dissertation_data_pipeline_spark.plans.registry import register
from dissertation_data_pipeline_spark.tables import load_table

#: query set: every 100th vector — scales with the table
_QUERY_PRED = "vec_id % 100 = 0"

# strict-left-fold dot/norm helpers in DuckDB SQL (match F.aggregate order)
_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(range(1, 65), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), (acc, x) -> acc + x)"
)
_NORM = (
    "sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, 65), "
    "i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE)), (acc, x) -> acc + x))"
)


def _cos(a: str, b: str) -> str:
    d = _DOT.format(a=a, b=b)
    na = _NORM.format(a=a)
    nb = _NORM.format(a=b)
    return (
        f"CASE WHEN {na} > 0 AND {nb} > 0 THEN {d} / ({na} * {nb}) ELSE 0.0 END"
    )


@register(
    "ext_ann_brute_topk",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS query_vec
      FROM embeddings WHERE {_QUERY_PRED}
    ),
    scored AS (
      SELECT q.query_id, c.vec_id,
             round({_cos('q.query_vec', 'c.embedding')}, 6) AS sim
      FROM q JOIN embeddings c ON q.query_id <> c.vec_id
    ),
    ranked AS (
      SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= 10
    """,
)
def ext_ann_brute_topk(spark, sf_dir):
    """[EXT] exact cosine top-10 per query vector (every 100th vec_id):
    broadcast queries x partitioned corpus scan, deterministic
    tie-break (sim desc, vec_id asc)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return sim.brute_force_topk(queries, emb, k=10)


def _bucket_sql(vec: str) -> str:
    """Bucket id as explicit nested arithmetic (no lambda/list work in
    the inner loop — a per-row list literal inside a lambda is O(n^2)
    in DuckDB). The left-fold order matches Spark's ``F.aggregate``."""
    planes = sim.hyperplanes(8, 64)
    bits = []
    for j, plane in enumerate(planes):
        proj = "0.0"
        for i, cfg in enumerate(plane):
            proj = f"({proj} + ({vec}[{i + 1}]::DOUBLE * {cfg}))"
        bits.append(f"(CASE WHEN {proj} > 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


@register(
    "ext_ann_lsh_topk",
    f"""
    WITH corpus AS MATERIALIZED (
      SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS query_vec, bucket
      FROM corpus WHERE {_QUERY_PRED}
    ),
    scored AS (
      SELECT q.query_id, c.vec_id,
             round({_cos('q.query_vec', 'c.embedding')}, 6) AS sim
      FROM q JOIN corpus c ON q.bucket = c.bucket AND q.query_id <> c.vec_id
    ),
    ranked AS (
      SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= 10
    """,
)
def ext_ann_lsh_topk(spark, sf_dir):
    """[EXT] LSH-bucketed approximate top-10: 8 md5-derived signed
    hyperplanes -> 256 cells; a query scores only its own cell. The
    scale path: bucket becomes a partition column, probes prune reads."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return sim.hyperplane_lsh_topk(queries, emb, k=10)


@register(
    "ext_vector_stats",
    f"""
    SELECT label,
           count(*) AS n_vectors,
           CAST(SUM(CAST({_NORM.format(a='embedding')} AS DECIMAL(18,9))) AS DOUBLE)
             / count(*) AS avg_norm
    FROM embeddings GROUP BY 1
    """,
)
def ext_vector_stats(spark, sf_dir):
    """[EXT] per-label vector stats; norms summed as DECIMAL(18,9) so
    the group aggregate is order-independent and engine-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        (
            F.sum(sim.l2_norm("embedding").cast("decimal(18,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_norm"),
    )
