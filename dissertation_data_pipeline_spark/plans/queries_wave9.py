"""Wave 9 — the IVF-PQ composition (the 100 TB ANN query path), plus
URL canonicalization (the crawl pipeline's zeroth dedup tier).

Round-4 scale sweeps measured exhaustive PQ-ADC retrieval
(``ext_ann_pq_rerank``) at >40 min at sf10: its lookup join is
O(corpus x queries) by construction (3.2e9 rows there), which is the
documented cost of the *exhaustive baseline* — the same reason
``ext_ann_brute_topk`` exists as a yardstick rather than a query path.
What production indexes actually run is the composition in this wave:
coarse-quantizer pruning (IVF) in front of code-distance ranking (PQ)
in front of a point-lookup exact re-rank — Jégou et al. 2011's IVFADC.
Each stage already exists here (``ivf_centroids``/``ivf_assign``,
``pq_codes``, the re-rank tail of ``ext_ann_pq_rerank``); this wave
wires them into one gate-checked query whose per-query work is bounded
by n_probe/n_cells of the corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators import similarity as sim
from dissertation_data_pipeline_spark.plans.queries_similarity import (
    _CENT_ORDER,
    _D2,
    _QUERY_PRED,
    _cos,
)
from dissertation_data_pipeline_spark.plans.registry import register
from dissertation_data_pipeline_spark.tables import load_table

# per-subspace squared L2 between an 8-wide slice of a query vector and
# a codebook subcentroid — the same strict left fold as the engine
_SUB_D2 = (
    "list_reduce(list_prepend(0.0, list_transform(range(1, 9), "
    "i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE) "
    "* ({a}[i]::DOUBLE - {b}[i]::DOUBLE))), (acc, x) -> acc + x)"
)


@register(
    "ext_ann_ivfpq_rerank",
    f"""
    WITH coarse AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY {_CENT_ORDER}) - 1 AS cell_id,
             embedding AS centroid
      FROM embeddings ORDER BY {_CENT_ORDER} LIMIT 32
    ),
    cells AS MATERIALIZED (
      SELECT vec_id, cell_id FROM (
        SELECT c.vec_id, k.cell_id,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY {_cos('c.embedding', 'k.centroid')} DESC,
                          k.cell_id ASC) AS cr
        FROM embeddings c, coarse k) WHERE cr = 1
    ),
    probes AS (
      SELECT query_id, cell_id FROM (
        SELECT q.vec_id AS query_id, k.cell_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY {_cos('q.embedding', 'k.centroid')} DESC,
                          k.cell_id ASC) AS cr
        FROM embeddings q, coarse k WHERE {_QUERY_PRED}) WHERE cr <= 2
    ),
    pqcents AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY {_CENT_ORDER}) - 1 AS code_id,
             embedding AS centroid
      FROM embeddings ORDER BY {_CENT_ORDER} LIMIT 16
    ),
    subs AS (SELECT unnest(range(0, 8)) AS s),
    cb AS (
      SELECT code_id, s, centroid[(s*8+1):(s*8+8)] AS subc FROM pqcents, subs
    ),
    codes AS MATERIALIZED (
      SELECT vec_id, s, code_id FROM (
        SELECT vx.vec_id, vx.s, cb.code_id,
               row_number() OVER (PARTITION BY vx.vec_id, vx.s ORDER BY
                 {_SUB_D2.format(a='subv', b='subc')} ASC,
                 cb.code_id ASC) AS rn
        FROM (SELECT vec_id, s, embedding[(s*8+1):(s*8+8)] AS subv
              FROM embeddings, subs) vx
        JOIN cb USING (s)
      ) WHERE rn = 1
    ),
    lut AS (
      SELECT p.query_id, p.cell_id, cb.s, cb.code_id,
             CAST(floor(
               {_SUB_D2.format(a="q.embedding[(cb.s*8+1):(cb.s*8+8)]", b="subc")}
               * 1000000000000) AS BIGINT) AS qd
      FROM probes p
      JOIN embeddings q ON q.vec_id = p.query_id
      CROSS JOIN cb
    ),
    scored AS (
      SELECT lut.query_id, codes.vec_id, CAST(SUM(lut.qd) AS BIGINT) AS adc
      FROM codes
      JOIN cells USING (vec_id)
      JOIN lut ON lut.cell_id = cells.cell_id
              AND lut.s = codes.s AND lut.code_id = codes.code_id
      WHERE codes.vec_id <> lut.query_id
      GROUP BY 1, 2
    ),
    short AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc ASC, vec_id ASC) AS rk
        FROM scored) WHERE rk <= 20
    ),
    rr AS (
      SELECT s.query_id, s.vec_id,
             CAST(floor({_D2.format(a='q.embedding', b='c.embedding')}
                        * 1000000000000) AS BIGINT) AS exact_pd
      FROM short s
      JOIN embeddings q ON q.vec_id = s.query_id
      JOIN embeddings c ON c.vec_id = s.vec_id
    )
    SELECT query_id, vec_id, exact_pd, rank FROM (
      SELECT query_id, vec_id, exact_pd,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY exact_pd ASC, vec_id ASC) AS rank
      FROM rr
    ) WHERE rank <= 5
    """,
)
def ext_ann_ivfpq_rerank(spark, sf_dir):
    """[EXT] IVF-PQ two-stage retrieval (Jégou et al. 2011 IVFADC —
    the composition production vector indexes run): 32 coarse cells
    prune each query to its 2 nearest cells, PQ asymmetric code
    distances shortlist the top-20 of ONLY those cells' vectors, and
    the 20 survivors are re-ranked against true vectors with exact L2
    into a top-5.

    The per-query ADC work is n_probe/n_cells (1/16) of the
    exhaustive ``ext_ann_pq_rerank``; at 100 TB the cells are the
    partition layout (``write_ivf_partitioned``), so pruning is a
    planning-time partition filter and the exact stage is a
    shortlist-sized point lookup. Determinism matches the exhaustive
    path: integer picodistance ADC sums, full (adc, id) and
    (exact_pd, id) tiebreaks."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    return sim.ivfpq_rerank_topk(
        q,
        emb,
        n_cells=32,
        n_probe=2,
        shortlist=20,
        k=5,
        exclude_self=True,
    )


def _url_variants_sql() -> str:
    """Deterministic synthetic raw URLs from customer keys — one
    variant per canonicalization rule (case, default/non-default
    ports, tracking params, param order, fragment, empty path,
    non-http scheme, non-URL garbage)."""
    return """
      CASE c_custkey % 6
        WHEN 0 THEN 'HTTP://WWW.Example' || (c_custkey % 5)
                    || '.COM:80/Path/' || c_custkey
                    || '?utm_source=news&b=2&a=1#frag'
        WHEN 1 THEN 'https://Example' || (c_custkey % 5)
                    || '.com:443/a/b?z=9&a=1&utm_campaign=x'
        WHEN 2 THEN 'https://sub.example' || (c_custkey % 5)
                    || '.co:8443/x?fbclid=abc'
        WHEN 3 THEN 'http://example' || (c_custkey % 5) || '.org'
        WHEN 4 THEN 'ftp://Files.Example' || (c_custkey % 5)
                    || '.net/data?ref=h&q=1'
        ELSE 'not a url ' || c_custkey
      END
    """


def _url_variants_col():
    k = F.col("c_custkey")
    m5 = (k % 5).cast("string")
    return (
        F.when(
            k % 6 == 0,
            F.concat(
                F.lit("HTTP://WWW.Example"), m5, F.lit(".COM:80/Path/"),
                k.cast("string"), F.lit("?utm_source=news&b=2&a=1#frag"),
            ),
        )
        .when(
            k % 6 == 1,
            F.concat(
                F.lit("https://Example"), m5,
                F.lit(".com:443/a/b?z=9&a=1&utm_campaign=x"),
            ),
        )
        .when(
            k % 6 == 2,
            F.concat(
                F.lit("https://sub.example"), m5, F.lit(".co:8443/x?fbclid=abc")
            ),
        )
        .when(k % 6 == 3, F.concat(F.lit("http://example"), m5, F.lit(".org")))
        .when(
            k % 6 == 4,
            F.concat(
                F.lit("ftp://Files.Example"), m5, F.lit(".net/data?ref=h&q=1")
            ),
        )
        .otherwise(F.concat(F.lit("not a url "), k.cast("string")))
    )


from dissertation_data_pipeline_spark.functions import urls as fu  # noqa: E402


@register(
    "ext_url_canonicalize",
    f"""
    WITH raw AS (
      SELECT c_custkey, {_url_variants_sql()} AS raw_url FROM customer
    ),
    u AS (
      SELECT c_custkey, raw_url,
             {fu.url_canonical_sql('raw_url')} AS u
      FROM raw
    )
    SELECT c_custkey, u.canon AS url_canon, u.host AS host,
           u.domain AS registered_domain
    FROM u
    """,
)
def ext_url_canonicalize(spark, sf_dir):
    """[EXT] URL canonicalization (functions/urls.py) — the crawl
    pipeline's zeroth dedup tier, run before any content is fetched:
    lowercase scheme/host, drop fragments / default ports / tracking
    params (utm_*, fbclid, gclid, ref), sort surviving params, '/'
    for empty paths, two-label registered-domain heuristic (a PSL
    snapshot would rot; documented approximation). Non-URLs
    canonicalize to NULL. Raw URLs are synthesized deterministically
    from customer keys — one variant per rule — the same move the
    reference-shape scalar queries use for shapes the testdata lacks
    (e.g. fs9 state codes). Pure regex/array codegen expressions; the
    oracle applies the IDENTICAL regexes via url_canonical_sql, which
    lives beside the engine function so the rules cannot drift."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", _url_variants_col().alias("raw_url")
    )
    return c.select(
        "c_custkey",
        fu.canonicalize_url("raw_url").alias("url_canon"),
        fu.url_host("raw_url").alias("host"),
        fu.url_registered_domain("raw_url").alias("registered_domain"),
    )


def _multiprobe_sql() -> str:
    from dissertation_data_pipeline_spark.plans.queries_similarity import (
        _bucket_sql,
        _plane_proj_sqls,
    )

    bucket_c = _bucket_sql("embedding")
    projs = _plane_proj_sqls("embedding")
    margins = ", ".join(
        f"{{'m': abs({p}), 'j': {j}}}" for j, p in enumerate(projs)
    )
    return f"""
    WITH corpus AS MATERIALIZED (
      SELECT vec_id, embedding, {bucket_c} AS bucket FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS query_vec,
             {bucket_c} AS bucket,
             list_sort([{margins}]) AS ms
      FROM embeddings WHERE {_QUERY_PRED}
    ),
    probes AS (
      SELECT query_id, query_vec,
             unnest(list_prepend(bucket,
               list_transform(ms[1:2], f -> xor(bucket, 1 << f.j))))
               AS bucket
      FROM q
    ),
    scored AS (
      SELECT p.query_id, c.vec_id,
             round({_cos('p.query_vec', 'c.embedding')}, 6) AS sim
      FROM probes p JOIN corpus c USING (bucket)
      WHERE p.query_id <> c.vec_id
    ),
    ranked AS (
      SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= 10
    """


@register("ext_ann_lsh_multiprobe_topk", _multiprobe_sql())
def ext_ann_lsh_multiprobe_topk(spark, sf_dir):
    """[EXT] multi-probe LSH top-10 (Lv et al. 2007): each query
    scores its own bucket PLUS the buckets reached by flipping its 2
    lowest-|margin| sign bits — the planes the query sits closest to,
    the likeliest single-bit differences for a true neighbor. The
    standard recall lever for single-table LSH: ~3x the candidate
    reads recover most of what a second hash table would buy without
    storing the corpus twice; at 100 TB the corpus stays written once
    (partitioned by bucket) and multi-probe is a query-side fan-out
    over 3 partition keys. Candidates strictly contain the
    single-probe set, so per-query top-1 similarity dominates
    ``ext_ann_lsh_topk``'s (pinned by test). Margins are the identical
    projection doubles as the bucket bits on both engines, so flip
    selection (and therefore the candidate set) matches exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return sim.hyperplane_lsh_multiprobe_topk(
        queries, emb, k=10, n_flip=2, exclude_self=True
    )


@register(
    "ext_dense_ids",
    """
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)))
                - 1 AS BIGINT) AS dense_id
    FROM documents
    """,
)
def ext_dense_ids(spark, sf_dir):
    """[EXT] scalable global enumeration (operators/ids.py dense_ids):
    contiguous 0-based ids over the corpus in a total key order
    WITHOUT the single-partition global-sort window the naive
    ``row_number() OVER (ORDER BY ...)`` plans — range-partitioned
    sorted layout, Arrow-batched per-partition enumeration (zero extra
    shuffles), prefix-sum offsets broadcast back.  The order key is
    md5(doc_id) so the assigned ids are a nontrivial permutation (by
    raw doc_id the op would be the identity and the row vacuous); the
    oracle is the very window the operator exists to avoid, which at
    gate SF is cheap and exact."""
    from dissertation_data_pipeline_spark.operators.ids import dense_ids

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("sort_key")
    )
    return dense_ids(docs, "sort_key").select("doc_id", "dense_id")
