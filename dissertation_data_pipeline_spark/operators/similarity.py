"""[EXT] Similarity search over embedding columns (north-star op).

Embeddings are ``array<float>`` columns; all math is widened to double
and folded left-to-right (``F.aggregate``), which makes the result
bit-reproducible across engines and partitionings — the same property
the dedup layer gets from md5.

Operators:
- ``cosine`` / ``dot`` / ``l2_norm`` — expression builders (JVM-side,
  no UDF; 64-dim fold stays inside codegen).
- ``brute_force_topk`` — exact top-k: broadcast the (small) query set
  against the corpus, per-query window top-k. The corpus scan stays
  fully partitioned; the only shuffle is the per-query ranking, whose
  input is already reduced to (queries x corpus) rows with only id +
  similarity columns.
- ``hyperplane_lsh_topk`` — the scale path: 8 signed random
  hyperplanes bucket the corpus into 256 cells; queries probe only
  their own cell. Hyperplane coefficients (±1) are derived from md5 in
  *driver Python* and inlined as literals, so any engine reproduces
  them. At 100 TB the bucketed corpus is written partitioned by
  bucket id -> a probe reads 1/256th of the data; multi-probe (flip
  lowest-margin bits) trades recall for reads.

An IVF (k-means) variant needs iterative centroid training — that
belongs to a fit/transform pair, not a single declarative plan; the
LSH variant provides the same read-pruning shape without training.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _fold_sum(products: Column) -> Column:
    """Strict left-fold sum (deterministic double summation order)."""
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column | str, b: Column | str) -> Column:
    return _fold_sum(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        _fold_sum(F.transform(_c(a), lambda x: x.cast("double") * x.cast("double")))
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def hyperplanes(num_planes: int = 8, dim: int = 64) -> list[list[float]]:
    """Deterministic ±1 hyperplane coefficients from md5 — computed in
    driver Python, inlined as literals, identical in any engine."""
    planes = []
    for j in range(num_planes):
        row = []
        for i in range(dim):
            digit = int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[0], 16)
            row.append(1.0 if digit % 2 else -1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column | str, planes: list[list[float]]) -> Column:
    """Sign-of-projection bucket id: bit j = (vec . plane_j) > 0."""
    out = F.lit(0)
    for j, plane in enumerate(planes):
        proj = _fold_sum(
            F.zip_with(
                _c(vec),
                F.array(*[F.lit(v) for v in plane]),
                lambda x, cfg: x.cast("double") * cfg,
            )
        )
        out = out + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query. Ranking key is (rounded similarity
    desc, corpus id asc) — fully deterministic under ties. Queries are
    broadcast; the corpus is never re-shuffled for the scoring pass."""
    # spread the corpus scan: a small single-file read is one partition,
    # and a broadcast cross join inherits the probe side's parallelism
    corpus = corpus.repartition(F.col(corpus_id))
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col(query_id) != F.col(corpus_id))
        .select(
            F.col(query_id),
            F.col(corpus_id),
            F.round(cosine(query_vec, corpus_vec), 6).alias("sim"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "sim", "rank")
    )


def hyperplane_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    k: int = 10,
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    cell. Join on bucket id replaces the cross join — at scale this is
    a partition-pruned read, not a scan."""
    planes = hyperplanes(num_planes, dim)
    cb = corpus.withColumn("_bucket", lsh_bucket(corpus_vec, planes)).repartition(
        "_bucket"
    )
    qb = queries.withColumn("_bucket", lsh_bucket(query_vec, planes))
    scored = (
        F.broadcast(qb)
        .join(cb, "_bucket")
        .filter(F.col(query_id) != F.col(corpus_id))
        .select(
            F.col(query_id),
            F.col(corpus_id),
            F.round(cosine(query_vec, corpus_vec), 6).alias("sim"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "sim", "rank")
    )
