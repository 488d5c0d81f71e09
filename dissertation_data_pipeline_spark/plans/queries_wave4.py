"""Wave 4 — retrieval & curation closers.

Four operators rounding out the dedup/retrieval families with shapes
the earlier waves lacked:

- **containment pairs** (Broder's resemblance/containment twin):
  asymmetric doc-inside-doc detection that Jaccard structurally misses;
- **winnowing fingerprints** (Schleimer et al. 2003 / MOSS):
  position-aware local fingerprinting with a per-window guarantee —
  the evidence-producing complement to SimHash/MinHash;
- **two-stage PQ retrieval** (shortlist by asymmetric code distance,
  re-rank the shortlist against true vectors) — the query path every
  production PQ index actually runs;
- **bigram LM scoring** (CCNet-style): corpus-trained language-model
  perplexity as a document quality signal.

Exactness rules follow the repo discipline: every hash is md5-derived,
distances are strict-fold doubles floored into integer picodistance
units before any reduction, and the one floating sum (LM log-probs)
is documented bounded-error (terms bit-identical across engines,
partition-order spread ~1e-13 vs 1e-4 display rounding).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators import dedup_ext as dx
from dissertation_data_pipeline_spark.operators import similarity as sim
from dissertation_data_pipeline_spark.operators.training import bigram_lm_scores
from dissertation_data_pipeline_spark.plans.queries_similarity import (
    PQ_ADC_SCORED_CTE,
    _D2,
)
from dissertation_data_pipeline_spark.plans.registry import register
from dissertation_data_pipeline_spark.tables import load_table


@register(
    "ext_containment_pairs",
    r"""
    WITH toks AS (
      SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
    ),
    shl AS (
      SELECT doc_id, lang,
             list_distinct(CASE WHEN len(t) >= 3
               THEN list_transform(range(1, len(t) - 1),
                                   i -> array_to_string(t[i:i+2], ' '))
               ELSE [array_to_string(t, ' ')] END) AS shingles
      FROM toks
    ),
    post AS (SELECT doc_id, lang, unnest(shingles) AS s FROM shl),
    dfreq AS (SELECT lang, s, count(*) AS dfc FROM post GROUP BY 1, 2),
    kept AS (
      SELECT p.doc_id, p.lang, p.s
      FROM post p JOIN dfreq d ON p.lang = d.lang AND p.s = d.s
      WHERE d.dfc <= 16
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY 1),
    inter AS (
      SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM kept a JOIN kept b
        ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3
    )
    SELECT lang, id_a, id_b, containment_a, containment_b FROM (
      SELECT lang, id_a, id_b,
             round(i::DOUBLE / sa.n, 6) AS containment_a,
             round(i::DOUBLE / sb.n, 6) AS containment_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
    ) WHERE containment_a >= 0.5 OR containment_b >= 0.5
    """,
)
def ext_containment_pairs(spark, sf_dir):
    """[EXT] asymmetric shingle-containment pairs within language
    blocks: |A∩B|/|A| and |A∩B|/|B| over the CAPPED shingle universe
    (max_df=16), kept when either direction >= 0.5 — the
    doc-inside-doc / quote-envelope signal Jaccard structurally misses
    (a paragraph wholly quoted in a 10x longer page has Jaccard ~0.1
    but containment ~1.0).

    The stop-shingle cap is load-bearing here, not optional: this
    query blocks on language ALONE (cross-source quote detection is
    the point), so block population grows with the corpus and
    boilerplate posting lists grow linearly — measured 453 s at sf10
    (500k docs) uncapped vs seconds capped, the df^2 blowup the cap
    exists to kill. A contained quote's discriminative shingles are
    low-df, so the signal survives; dropped mass is observable via
    ``ext_stop_shingle_report``. The oracle implements the identical
    capped-universe rule."""
    return dx.containment_pairs(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        ["lang"],
        threshold=0.5,
        max_df=16,
    )


# winnowing parameters: 5-char grams, window of 4 consecutive hashes
_WINNOW_HEXVAL = " + ".join(
    f"(strpos('0123456789abcdef', md5(substr(s, i + 1, 5))[{k}:{k}]) - 1) "
    f"* {16 ** (8 - k)}"
    for k in range(1, 9)
)


@register(
    "ext_winnowing_fingerprints",
    f"""
    WITH norm AS (
      SELECT doc_id, lower(trim(text)) AS s FROM documents
    ),
    keyed AS (
      SELECT doc_id,
             CASE WHEN length(s) >= 5
               THEN list_transform(range(0, length(s) - 4),
                      i -> CAST(({_WINNOW_HEXVAL}) AS BIGINT) * 1048576
                           + (1048575 - i))
               ELSE CAST([] AS BIGINT[]) END AS ks
      FROM norm
    ),
    sel AS (
      SELECT doc_id, len(ks) AS n_grams,
             CASE WHEN len(ks) = 0 THEN CAST([] AS VARCHAR[])
               ELSE list_sort(list_distinct(list_transform(
                 range(0, greatest(len(ks) - 3, 1)),
                 j -> concat(
                   CAST(1048575 - (list_min(ks[j+1 : j+least(4, len(ks))])
                                   & 1048575) AS VARCHAR),
                   ':',
                   CAST(list_min(ks[j+1 : j+least(4, len(ks))]) >> 20
                        AS VARCHAR)))))
               END AS fps
      FROM keyed
    )
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(len(fps) AS BIGINT) AS n_fingerprints,
           md5(array_to_string(fps, '|')) AS fp_digest
    FROM sel
    """,
)
def ext_winnowing_fingerprints(spark, sf_dir):
    """[EXT] winnowing document fingerprints (Schleimer, Wilkerson,
    Aiken 2003 — MOSS): hash every 5-char gram, slide a window of 4
    hashes, keep each window's minimum (rightmost on ties via a packed
    position key), digest the sorted distinct selections. Guaranteed
    >= 1 fingerprint per window, expected density 2/(w+1) — the
    position-aware local fingerprint for plagiarism/near-dup evidence.

    Per-doc expression work only (no shuffle); both engines realize
    the rightmost-min as ONE integer ``min`` over packed
    ``hash*2^20 + (2^20-1-pos)`` keys, so selections match
    bit-for-bit."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", dx.winnowing_fingerprints("text", k=5, w=4).alias("_w")
    )
    # unpack in a second projection: _w is referenced three times, so
    # CollapseProject keeps the projections apart and the fingerprint
    # pipeline runs once per row (see operator docstring)
    return d.select(
        "doc_id",
        F.col("_w.n_grams").alias("n_grams"),
        F.col("_w.n_fingerprints").alias("n_fingerprints"),
        F.col("_w.fp_digest").alias("fp_digest"),
    )


@register(
    "ext_ann_pq_rerank",
    f"""
    WITH {PQ_ADC_SCORED_CTE},
    short AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc ASC, vec_id ASC) AS rank
        FROM scored
      ) WHERE rank <= 20
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
def ext_ann_pq_rerank(spark, sf_dir):
    """[EXT] two-stage PQ retrieval — the query path every production
    PQ index runs: shortlist top-20 per query by asymmetric code
    distance (corpus touched only through its 8 nibble codes), then
    re-rank the 20 candidates against their TRUE vectors with exact L2
    and keep the top-5. The expensive exact distances run on 20 rows
    per query instead of the whole corpus — at 100 TB the re-rank
    stage reads a point-lookup's worth of full vectors.

    Exactness: shortlist membership is decided on exact-integer ADC
    picodistances with a full tiebreak; re-rank distances are
    strict-fold doubles floored to integer picodistance units —
    bit-identical in both engines before any comparison.

    Scale status: the shortlist stage here is EXHAUSTIVE ADC —
    O(corpus x queries) by construction (measured >40 min at sf10),
    the PQ analog of ``ext_ann_brute_topk``'s yardstick role. The
    production-shaped path is ``ext_ann_ivfpq_rerank``
    (queries_wave9), which bounds the ADC stage to n_probe/n_cells
    of the corpus via coarse-cell pruning."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    wa = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    short = (
        sim.pq_adc_scores(emb, q, exclude_self=True)
        .withColumn("_rn", F.row_number().over(wa))
        .filter(F.col("_rn") <= 20)
        .select("query_id", "vec_id")
    )
    qv = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv"))
    cv = emb.select(F.col("vec_id"), F.col("embedding").alias("_cv"))
    d2 = F.aggregate(
        F.zip_with(
            F.col("_qv"),
            F.col("_cv"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rr = (
        short.join(qv, "query_id")
        .join(cv, "vec_id")
        .select(
            "query_id",
            "vec_id",
            F.floor(d2 * F.lit(1_000_000_000_000)).cast("long").alias("exact_pd"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.asc("exact_pd"), F.asc("vec_id"))
    return (
        rr.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 5)
        .select("query_id", "vec_id", "exact_pd", "rank")
    )


@register(
    "ext_bigram_lm_score",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
      FROM documents
    ),
    bg AS (
      SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
      FROM t, LATERAL (SELECT unnest(range(1, len(tk))) AS i)
    ),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
    v AS (SELECT count(DISTINCT w2) AS vocab FROM bg),
    scored AS (
      SELECT bg.doc_id,
             ln((c12 + 1)::DOUBLE / (c1 + vocab)::DOUBLE) AS lp
      FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(sum(lp) / count(*), 4) AS avg_logp,
           round(exp(-sum(lp) / count(*)), 4) AS perplexity
    FROM scored GROUP BY 1
    """,
)
def ext_bigram_lm_score(spark, sf_dir):
    """[EXT] corpus-trained bigram LM score per document — the CCNet
    quality signal (Wenzek et al. 2020 rank documents by LM perplexity
    and keep the low-perplexity head). Add-one-smoothed
    ``p(w2|w1) = (c12+1)/(c_hist(w1)+V)``; output = bigram count, mean
    log-prob, perplexity. See operators/training.py::bigram_lm_scores
    for the pre-aggregated join-back plan shape and the bounded-error
    float-sum argument."""
    return bigram_lm_scores(load_table(spark, sf_dir, "documents"))


@register(
    "ext_repeated_substring_spans",
    r"""
    WITH posts AS (
      SELECT doc_id, i AS pos, substr(s, i, 15) AS g
      FROM (SELECT doc_id, lower(trim(text)) AS s FROM documents),
           LATERAL (SELECT unnest(range(1, greatest(length(s) - 14, 0) + 1)) AS i)
    ),
    freq AS (SELECT g FROM posts GROUP BY g HAVING count(*) > 1),
    dup AS (SELECT doc_id, pos FROM posts WHERE g IN (SELECT g FROM freq)),
    runs AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM dup
    )
    SELECT doc_id, span_start, span_end, span_chars FROM (
      SELECT doc_id,
             CAST(min(pos) AS BIGINT) AS span_start,
             CAST(max(pos) + 14 AS BIGINT) AS span_end,
             CAST(max(pos) + 14 - min(pos) + 1 AS BIGINT) AS span_chars
      FROM runs GROUP BY doc_id, grp
    ) WHERE span_chars >= 30
    """,
)
def ext_repeated_substring_spans(spark, sf_dir):
    """[EXT] maximal repeated-substring spans (the scalable char-gram
    approximation of Lee et al. 2022's suffix-array substring dedup):
    every position whose 15-gram recurs anywhere in the corpus is
    flagged, consecutive flagged positions merge into maximal spans
    (gaps-and-islands), spans under 30 chars drop. The spans are what
    an exact-substring dedup pass would cut from the training corpus.
    See operators/dedup_ext.py::repeated_substring_spans for the
    no-pairwise-work plan shape."""
    out = dx.repeated_substring_spans(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        gram_chars=15,
        min_span_chars=30,
    )
    return out.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("span_chars").cast("long").alias("span_chars"),
    )


@register(
    "ext_ccnet_buckets",
    r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
      FROM documents
    ),
    bg AS (
      SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
      FROM t, LATERAL (SELECT unnest(range(1, len(tk))) AS i)
    ),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
    v AS (SELECT count(DISTINCT w2) AS vocab FROM bg),
    scored AS (
      SELECT bg.doc_id,
             ln((c12 + 1)::DOUBLE / (c1 + vocab)::DOUBLE) AS lp
      FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v
    ),
    ppl AS (
      SELECT doc_id, round(exp(-sum(lp) / count(*)), 4) AS perplexity
      FROM scored GROUP BY 1
    ),
    ranked AS (
      SELECT d.doc_id, d.lang, p.perplexity,
             ntile(3) OVER (PARTITION BY d.lang
                            ORDER BY p.perplexity ASC, d.doc_id ASC) AS bucket
      FROM documents d JOIN ppl p ON p.doc_id = d.doc_id
    )
    SELECT doc_id, lang, perplexity, bucket,
           (['head', 'middle', 'tail'])[bucket] AS bucket_name
    FROM ranked
    """,
)
def ext_ccnet_buckets(spark, sf_dir):
    """[EXT] CCNet head/middle/tail corpus partition (Wenzek et al.
    2020 §4.3): per-language equal-frequency perplexity buckets over
    the corpus-trained bigram LM score — 'head' is the training-set
    keep, 'tail' the drop. Deterministic: the ntile order is
    (4dp-rounded perplexity ASC, doc_id ASC), a total order both
    engines agree on. One window shuffle on the language key beyond
    the LM scorer's plan."""
    from dissertation_data_pipeline_spark.operators.training import (
        ccnet_perplexity_buckets,
    )

    return ccnet_perplexity_buckets(load_table(spark, sf_dir, "documents"))
