"""Remaining SURVEY §2 coverage: P8 enrichment predicate, F-a2/F-a4
amendment heuristic, F-j1 one-level flatten, F-s9 state code, and the
[EXT] embedding near-dup + approx-distinct operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from dissertation_data_pipeline_spark import functions as fx
from dissertation_data_pipeline_spark.functions import is_missing
from dissertation_data_pipeline_spark.operators import similarity as sim
from dissertation_data_pipeline_spark.plans.registry import register
from dissertation_data_pipeline_spark.session import pin_spread
from dissertation_data_pipeline_spark.tables import load_table


@register(
    "p8_needs_enrichment",
    """
    SELECT o_orderkey, pri, clerk FROM (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL
                  WHEN o_orderkey % 5 = 1 THEN ''
                  WHEN o_orderkey % 5 = 2 THEN 'not found'
                  ELSE o_orderpriority END AS pri,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS clerk
      FROM orders
    )
    WHERE pri IS NULL OR trim(pri) = '' OR lower(trim(pri)) = 'not found'
       OR clerk IS NULL OR trim(clerk) = '' OR lower(trim(clerk)) = 'not found'
    """,
)
def p8_needs_enrichment(spark, sf_dir):
    """P8 (legiscan_enricher.py:332-338): rows needing enrichment — the
    disjunction of ``is_missing`` over the enrichable fields, with the
    reference's three-way missingness (NULL / '' / 'not found')
    synthesized deterministically."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    df = o.select(
        "o_orderkey",
        F.when(k % 5 == 0, F.lit(None))
        .when(k % 5 == 1, F.lit(""))
        .when(k % 5 == 2, F.lit("not found"))
        .otherwise(F.col("o_orderpriority"))
        .alias("pri"),
        F.when(k % 7 == 0, F.lit(None)).otherwise(F.col("o_orderstatus")).alias("clerk"),
    )
    return df.filter(is_missing("pri") | is_missing("clerk"))


@register(
    "fa4_is_amendment",
    """
    SELECT doc_id,
           (contains(lower(coalesce(title, '')), 'amend')
            OR contains(lower(coalesce(title, '')), 'relating to')
            OR contains(lower(coalesce(title, '')), 'concerning')
            OR contains(lower(coalesce(title, '')), 'modifying')
            OR contains(lower(coalesce(title, '')), 'revising')
            OR contains(lower(coalesce(title, '')), 'repealing')
            OR contains(lower(coalesce(title, '')), 'adding to')
            OR (contains(lower(coalesce(body, '')), 'be it enacted')
                AND contains(lower(substr(coalesce(body, ''), 1, 500)),
                             'amend'))
           ) AS is_amendment
    FROM (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN 'An act to amend the school code'
                  WHEN doc_id % 5 = 1 THEN 'Relating to firearm storage'
                  WHEN doc_id % 5 = 2 THEN 'Revising chapter 12'
                  ELSE 'A new appropriations act' END AS title,
             CASE WHEN doc_id % 4 = 1
                  THEN 'amend this statute. ' || text || ' be it enacted'
                  ELSE text END AS body
      FROM documents
    )
    """,
)
def fa4_is_amendment(spark, sf_dir):
    """F-a4 (normalize_corpus.py:64-81): amendment heuristic with the
    reference's FULL signal list (incl. 'relating to' / 'revising')
    and the asymmetric text rule — enacting clause ANYWHERE in the
    text, 'amend' within the first 500 chars. The %4==1 bodies append
    the clause at the END, past 500 chars for most documents, so the
    full-text scope is genuinely exercised. Parity with a Python port
    of the reference is pinned in tests/test_reference_parity.py."""
    d = load_table(spark, sf_dir, "documents")
    k = F.col("doc_id")
    staged = d.select(
        "doc_id",
        F.when(k % 5 == 0, F.lit("An act to amend the school code"))
        .when(k % 5 == 1, F.lit("Relating to firearm storage"))
        .when(k % 5 == 2, F.lit("Revising chapter 12"))
        .otherwise(F.lit("A new appropriations act"))
        .alias("title"),
        F.when(
            k % 4 == 1,
            F.concat(
                F.lit("amend this statute. "),
                F.col("text"),
                F.lit(" be it enacted"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("body"),
    )
    return staged.select(
        "doc_id", fx.is_amendment("title", "body").alias("is_amendment")
    )


@register(
    "fj1_flatten_structs",
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS props_k
    FROM events
    """,
)
def fj1_flatten_structs(spark, sf_dir):
    """F-j1 (normalize_json.py:10): one-level flatten of nested records
    — parse the JSON column to a struct, then star-expand with dotted
    names projected flat (pd.json_normalize(max_level=1) semantics)."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.select(
        "event_id", "event_type", F.from_json("props", "k BIGINT").alias("props")
    )
    # star-expansion: each struct field becomes a flat prefixed column
    return parsed.select(
        "event_id",
        "event_type",
        F.col("props.k").alias("props_k"),
    )


@register(
    "fs9_state_code",
    """
    SELECT c_custkey,
           CASE WHEN regexp_matches(upper(trim(raw)), '^[A-Z]{2}$')
                THEN upper(trim(raw)) END AS state_code
    FROM (
      SELECT c_custkey,
             CASE c_custkey % 3 WHEN 0 THEN ' co ' WHEN 1 THEN 'Colorado'
                                ELSE 'WY' END AS raw
      FROM customer
    )
    """,
)
def fs9_state_code(spark, sf_dir):
    """F-s9 (legiscan_enricher.py:250-252): 2-letter state codes pass
    through (upper/trim), anything else -> NULL (the reference sliced
    full names blindly — documented fix, full names go through the dim
    join J2)."""
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    raw = (
        F.when(k % 3 == 0, F.lit(" co "))
        .when(k % 3 == 1, F.lit("Colorado"))
        .otherwise(F.lit("WY"))
    )
    return c.select("c_custkey", fx.state_code(raw).alias("state_code"))


def _near_dup_sql() -> str:
    from dissertation_data_pipeline_spark.operators.similarity import (
        LSH_PLANE_STEPS,
        LSH_PLANES_MAX,
    )
    from dissertation_data_pipeline_spark.plans.queries_similarity import (
        _bucket_sql,
        _cos,
    )

    # the identical corpus-size -> plane-count rule as
    # similarity.adaptive_lsh_planes, as an exact-count CASE: each
    # branch inlines that plane count's full bucket expression
    branches = "".join(
        f"""
           WHEN (SELECT c FROM n) < {bound}
             THEN {_bucket_sql('embedding', planes)}"""
        for bound, planes in LSH_PLANE_STEPS
    )
    return f"""
    WITH n AS (SELECT count(*) AS c FROM embeddings),
    corpus AS MATERIALIZED (
      SELECT vec_id, embedding,
             CASE {branches}
               ELSE {_bucket_sql('embedding', LSH_PLANES_MAX)}
             END AS bucket
      FROM embeddings
    )
    SELECT id_a, id_b, cos FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round({_cos('a.embedding', 'b.embedding')}, 6) AS cos
      FROM corpus a JOIN corpus b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ) WHERE cos >= 0.3
    """


@register("ext_embedding_near_dup", _near_dup_sql())
def ext_embedding_near_dup(spark, sf_dir):
    """[EXT] embedding-cosine near-duplicate pairs: hyperplane-LSH
    buckets generate candidates, exact cosine >= threshold verifies.
    The vector analog of minhash_lsh_pairs. The oracle reproduces the
    md5-derived hyperplane buckets and the strict-left-fold cosine
    bit-for-bit (same helpers as ext_ann_lsh_topk). The testdata
    embeddings are near-orthogonal random vectors (max pair cosine
    ~0.5), so the registered query uses threshold 0.3 to push real
    pairs through the candidate->verify path instead of vacuously
    matching on an empty set; production near-dup would use ~0.99.

    The plane count is SIZE-ADAPTIVE (adaptive_lsh_planes; the exact
    same row-count rule in the oracle's CASE): fixed 8 planes means
    256 buckets forever, so random (non-similar) collisions grow
    quadratically with the corpus — measured 372 s at sf10 (200k
    vectors) with 8 planes vs seconds with the rule's 16. Unchanged
    at every gate scale (sf0.001-0.1 are all < 20k vectors -> 8
    planes, bit-identical to the fixed-plane formulation). Norms are
    precomputed per vector (cosine_pre): re-folding them per pair
    multiplied the HOF work by pairs/vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    planes = sim.hyperplanes(sim.adaptive_lsh_planes(emb.count()), 64)
    b = (
        emb.withColumn("_bucket", sim.lsh_bucket("embedding", planes))
        .withColumn("_n", sim.l2_norm("embedding"))
        .transform(lambda d: pin_spread(d, "_bucket"))
    )
    a2, b2 = b.alias("a"), b.alias("b")
    pairs = (
        a2.join(
            b2,
            (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(
                sim.cosine_pre(
                    F.col("a.embedding"),
                    F.col("b.embedding"),
                    F.col("a._n"),
                    F.col("b._n"),
                ),
                6,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= 0.3)
    )
    return pairs


@register(
    "ext_approx_count_distinct",
    """
    SELECT count(DISTINCT o_custkey) AS exact_custkeys,
           TRUE AS approx_within_5pct
    FROM orders
    """,
)
def ext_approx_count_distinct(spark, sf_dir):
    """[EXT] approx_count_distinct (A2's 100 TB path): HLL++ sketch,
    one pass, no exact-distinct shuffle. HLL estimates are
    engine-specific, so the hashable contract is the part both engines
    agree on: the exact distinct count plus a boolean asserting the
    sketch landed within 5% of it (rsd=0.02, so 5% is a 2.5-sigma
    bound; deterministic for a fixed dataset). The unit test bounds the
    relative error independently."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("exact_custkeys"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", 0.02)
                - F.countDistinct("o_custkey")
            )
            <= 0.05 * F.countDistinct("o_custkey")
        ).alias("approx_within_5pct"),
    )
