"""Wave 5 — table maintenance, stream accounting, and corpus statistics.

Five operators rounding out the engine's pipeline-maintenance surface:

- **MERGE INTO** (:mod:`operators.merge`): the set-based form of the
  reference's read-patch-rewrite snapshot maintenance
  (build_master_corpus.py concat-then-dedup; the enricher's
  read-patch-write loop) — one full-outer shuffle join.
- **CDC apply**: replay a change log (latest-op-per-key, deletes win)
  onto a base snapshot — the incremental sibling of MERGE.
- **PMI collocations** (Church & Hanks 1990): corpus-level multiword
  unit mining; the PMI argument is computed from exact int64 counts
  with IEEE-deterministic arithmetic so top-N membership is
  engine-stable.
- **Late-data accounting**: batch replay of streaming watermark
  semantics — per-key running-max event time vs arrival order, exact
  int64 microsecond math.
- **Bottom-k overlap sketches** (Cohen & Kaplan 2007): deterministic
  md5-derived bottom-64 sketches per source + pairwise Jaccard
  estimates — quadratic only on sketches, never on documents.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators.merge import (
    apply_changes,
    merge_upsert,
)
from dissertation_data_pipeline_spark.operators.sketches import (
    bottomk_sketches,
    sketch_overlap_pairs,
)
from dissertation_data_pipeline_spark.operators.temporal import late_event_report
from dissertation_data_pipeline_spark.operators.training import pmi_collocations
from dissertation_data_pipeline_spark.plans.queries_dedup import _HEXVAL
from dissertation_data_pipeline_spark.plans.registry import register
from dissertation_data_pipeline_spark.tables import load_table


@register(
    "ext_merge_upsert",
    """
    WITH t AS (
      SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id % 3 != 2
    ),
    u AS (
      SELECT doc_id, lang AS u_lang, n_chars + 100 AS u_n
      FROM documents WHERE doc_id % 2 = 0
    ),
    j AS (
      SELECT t.doc_id AS t_id, u.doc_id AS u_id,
             t.lang, t.source, t.n_chars, u.u_lang, u.u_n
      FROM t FULL JOIN u ON t.doc_id = u.doc_id
    )
    SELECT COALESCE(t_id, u_id) AS doc_id,
           CASE WHEN t_id IS NOT NULL THEN lang ELSE u_lang END AS lang,
           CASE WHEN t_id IS NOT NULL AND u_id IS NOT NULL THEN 'merged'
                WHEN t_id IS NOT NULL THEN source
                ELSE 'inserted' END AS source,
           CASE WHEN t_id IS NOT NULL AND u_id IS NOT NULL THEN u_n
                WHEN t_id IS NOT NULL THEN n_chars
                ELSE u_n END AS n_chars
    FROM j
    WHERE NOT (t_id IS NOT NULL AND u_id IS NOT NULL
               AND COALESCE(source = 'src0', FALSE))
    """,
)
def ext_merge_upsert(spark, sf_dir):
    """[EXT] MERGE INTO semantics on the documents snapshot: the
    doc_id%2 slice plays the incoming batch against the doc_id%3
    target. Matched rows in 'src0' are deleted, other matches update
    (source='merged', n_chars from the batch), unmatched batch rows
    insert with source='inserted'. One full-outer shuffle join on the
    key; output schema == target schema (overwrite-ready)."""
    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("doc_id") % 3 != 2).select(
        "doc_id", "lang", "source", "n_chars"
    )
    updates = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id",
        F.col("lang").alias("u_lang"),
        (F.col("n_chars") + 100).alias("u_n"),
    )
    return merge_upsert(
        target,
        updates,
        "doc_id",
        update_set={"source": F.lit("merged"), "n_chars": F.col("s.u_n")},
        insert_values={
            "doc_id": F.col("s.doc_id"),
            "lang": F.col("s.u_lang"),
            "source": F.lit("inserted"),
            "n_chars": F.col("s.u_n"),
        },
        delete_when=F.col("t.source") == "src0",
    )


@register(
    "ext_cdc_apply",
    """
    WITH base AS (
      SELECT c_custkey AS user_id, c_name FROM customer WHERE c_custkey < 100
    ),
    ch AS (
      SELECT user_id, ts, event_id, event_type AS ch_type, value AS ch_value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ),
    latest AS (
      SELECT user_id, ts, event_id, ch_type, ch_value FROM ch WHERE rn = 1
    ),
    j AS (
      SELECT b.user_id AS b_id, l.user_id AS c_id,
             b.c_name, l.ts, l.event_id, l.ch_type, l.ch_value
      FROM base b FULL JOIN latest l ON b.user_id = l.user_id
    )
    SELECT COALESCE(b_id, c_id) AS user_id, c_name, ts, event_id,
           ch_type, ch_value,
           CASE WHEN c_id IS NULL THEN 'kept'
                WHEN b_id IS NOT NULL THEN 'updated'
                ELSE 'inserted' END AS change_status
    FROM j
    WHERE NOT (c_id IS NOT NULL AND COALESCE(ch_type = 'error', FALSE))
    """,
)
def ext_cdc_apply(spark, sf_dir):
    """[EXT] CDC replay: the events table as a change log over a
    customer snapshot (user_id keys; 'error' = tombstone/delete, any
    other latest op upserts). Latest-op-per-key by the deterministic
    (ts DESC, event_id DESC) order, then one full-outer join applies
    kept/updated/inserted/deleted fates. Users >= 100 exercise the
    insert leg; latest-op deletes remove their key entirely."""
    base = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 100)
        .select(F.col("c_custkey").alias("user_id"), "c_name")
    )
    changes = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("ch_type"),
        F.col("value").alias("ch_value"),
    )
    return apply_changes(
        base,
        changes,
        "user_id",
        order_by=[F.desc("ts"), F.desc("event_id")],
        is_delete=F.col("ch_type") == "error",
    )


@register(
    "ext_pmi_collocations",
    r"""
    WITH toks AS (
      SELECT string_split_regex(lower(trim(text)), '\s+') AS t FROM documents
    ),
    uc AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c_w
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1
    ),
    bc AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab
      FROM (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks)
      ) GROUP BY 1, 2
    ),
    tot AS (
      SELECT (SELECT CAST(sum(c_w) AS BIGINT) FROM uc) AS T1,
             (SELECT CAST(sum(c_ab) AS BIGINT) FROM bc) AS T2
    )
    SELECT w1, w2, c_ab, c_a, c_b, round(ln(score), 4) AS pmi FROM (
      SELECT bc.w1, bc.w2, bc.c_ab, ua.c_w AS c_a, ub.c_w AS c_b,
             (bc.c_ab::DOUBLE / T2::DOUBLE)
             / ((ua.c_w::DOUBLE / T1::DOUBLE) * (ub.c_w::DOUBLE / T1::DOUBLE))
               AS score
      FROM bc
      JOIN uc ua ON bc.w1 = ua.w
      JOIN uc ub ON bc.w2 = ub.w
      CROSS JOIN tot
      WHERE bc.c_ab >= 5
    ) ORDER BY score DESC, w1, w2 LIMIT 100
    """,
)
def ext_pmi_collocations(spark, sf_dir):
    """[EXT] top-100 collocations by PMI over the documents corpus
    (min bigram count 5). Ranking runs on the raw probability-ratio
    double (exact-int operands, IEEE-deterministic ops — see
    operators/training.py::pmi_collocations); ln() only touches the
    4dp display column."""
    return pmi_collocations(
        load_table(spark, sf_dir, "documents"), min_count=5, top_n=100
    )


@register(
    "ext_late_data_report",
    """
    WITH flagged AS (
      SELECT event_type,
             epoch_us(ts) AS ts_us,
             max(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) - 600000000 AS wm_us
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN wm_us IS NOT NULL AND ts_us < wm_us
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           COALESCE(MAX(CASE WHEN wm_us IS NOT NULL AND ts_us < wm_us
                             THEN wm_us - ts_us END), 0) AS max_lateness_us
    FROM flagged GROUP BY 1
    """,
)
def ext_late_data_report(spark, sf_dir):
    """[EXT] streaming-watermark accounting replayed in batch: per
    event_type, how many events would a 600 s watermark have dropped,
    and by how much (worst case). Watermark = per-user running max of
    event time over arrival (event_id) order; all math in exact int64
    microseconds."""
    return late_event_report(
        load_table(spark, sf_dir, "events"),
        key="user_id",
        ts_col="ts",
        arrival_col="event_id",
        allowed_lateness_s=600,
        group_col="event_type",
    )


@register(
    "ext_source_overlap_sketch",
    rf"""
    WITH toks AS (
      SELECT doc_id, source,
             string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id, source,
             list_distinct(CASE WHEN len(t) >= 3
               THEN list_transform(range(1, len(t) - 1),
                                   i -> array_to_string(t[i:i+2], ' '))
               ELSE [array_to_string(t, ' ')] END) AS shingles
      FROM toks
    ),
    post AS (SELECT DISTINCT source, unnest(shingles) AS s FROM sh),
    hs AS (SELECT DISTINCT source, {_HEXVAL} AS h FROM post),
    sk AS (
      SELECT source, list_sort(list(h))[1:64] AS sketch,
             CAST(count(*) AS BIGINT) AS n_distinct
      FROM hs GROUP BY 1
    ),
    pairs AS (
      SELECT a.source AS g_a, b.source AS g_b,
             a.n_distinct AS n_a, b.n_distinct AS n_b,
             list_sort(list_distinct(list_concat(a.sketch, b.sketch)))[1:64] AS B,
             list_intersect(a.sketch, b.sketch) AS I
      FROM sk a JOIN sk b ON a.source < b.source
    )
    SELECT g_a, g_b, n_a, n_b,
           CAST(len(list_filter(B, x -> list_contains(I, x))) AS BIGINT)
             AS n_shared_in_sample,
           CAST(len(B) AS BIGINT) AS sample_size,
           round(len(list_filter(B, x -> list_contains(I, x)))::DOUBLE
                 / len(B), 6) AS jaccard_est
    FROM pairs
    """,
)
def ext_source_overlap_sketch(spark, sf_dir):
    """[EXT] pairwise source-overlap estimation from bottom-64 shingle
    sketches: each source reduces to its 64 smallest md5-derived
    shingle hashes, then every source pair gets a Jaccard estimate
    from the merged sketch — quadratic only on the |sources| sketch
    rows (512 bytes each), never on documents. The md5 hash makes the
    estimate itself deterministic, so the oracle reproduces it
    exactly."""
    sk = bottomk_sketches(
        load_table(spark, sf_dir, "documents"),
        "source",
        "text",
        id_col="doc_id",
        k=64,
    )
    return sketch_overlap_pairs(sk, "source", k=64)


_CMS_HEX = "0123456789abcdef"


def _cms_bucket(tok_expr: str) -> str:
    """DuckDB twin of the Spark bucket fn: first two hex digits of
    md5(d || ':' || token) as an int in 0..255."""
    h = f"md5(CAST(d AS VARCHAR) || ':' || {tok_expr})"
    return (
        f"((strpos('{_CMS_HEX}', substr({h}, 1, 1)) - 1) * 16"
        f" + (strpos('{_CMS_HEX}', substr({h}, 2, 1)) - 1))"
    )


@register(
    "ext_count_min_hitters",
    rf"""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents
    ),
    nz AS (SELECT tok FROM toks WHERE length(tok) > 0),
    tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS true_cnt
           FROM nz GROUP BY 1),
    top AS (SELECT tok, true_cnt FROM tc
            ORDER BY true_cnt DESC, tok ASC LIMIT 10),
    posts AS (
      SELECT tok, d, {_cms_bucket('tok')} AS b
      FROM nz CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS d)
    ),
    cms AS (SELECT d, b, CAST(count(*) AS BIGINT) AS cnt
            FROM posts GROUP BY 1, 2),
    probe AS (
      SELECT t.tok, t.true_cnt, dd.d, {_cms_bucket('t.tok')} AS b
      FROM top t CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS d) dd
    )
    SELECT p.tok, p.true_cnt, CAST(min(c.cnt) AS BIGINT) AS est_cnt
    FROM probe p JOIN cms c ON c.d = p.d AND c.b = p.b
    GROUP BY 1, 2
    """,
)
def ext_count_min_hitters(spark, sf_dir):
    """[EXT] count-min sketch heavy hitters (Cormode & Muthukrishnan
    2005): a 4x256 md5-bucketed counter matrix over the corpus token
    stream, probed at the true top-10 tokens so the one-sided
    estimate >= truth guarantee is gate-checked data, not prose. The
    sketch is mergeable cell-wise — the streaming/distributed
    heavy-hitter structure at any scale."""
    from dissertation_data_pipeline_spark.operators.sketches import (
        count_min_heavy_hitters,
    )

    return count_min_heavy_hitters(load_table(spark, sf_dir, "documents"))


@register(
    "ext_hll_distinct",
    r"""
    WITH toks AS (
      SELECT source, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents
    ),
    dist AS (SELECT DISTINCT source, tok FROM toks WHERE length(tok) > 0),
    hx AS (SELECT source, md5(tok) AS h FROM dist),
    parts AS (
      SELECT source,
             ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)) AS j,
             substr(h, 3, 12) AS tail,
             length(regexp_extract(substr(h, 3, 12), '^(0*)', 1)) AS z
      FROM hx
    ),
    rho AS (
      SELECT source, j,
             CASE WHEN z = 12 THEN 49
                  ELSE z * 4
                       + CASE substr(tail, z + 1, 1)
                           WHEN '1' THEN 3
                           WHEN '2' THEN 2 WHEN '3' THEN 2
                           WHEN '4' THEN 1 WHEN '5' THEN 1
                           WHEN '6' THEN 1 WHEN '7' THEN 1
                           ELSE 0 END
                       + 1 END AS rho
      FROM parts
    ),
    regs AS (SELECT source, j, max(rho) AS r FROM rho GROUP BY 1, 2),
    per_group AS (
      SELECT source,
             CAST(sum(CAST(1 AS BIGINT) << (49 - r))
                  + (256 - count(*)) * (CAST(1 AS BIGINT) << 49)
                  AS BIGINT) AS reg_sum,
             CAST(256 - count(*) AS BIGINT) AS zero_regs
      FROM regs GROUP BY 1
    ),
    exact AS (SELECT source, CAST(count(*) AS BIGINT) AS n_exact
              FROM dist GROUP BY 1)
    SELECT p.source, e.n_exact, p.reg_sum, p.zero_regs,
           round(CASE WHEN (2.6499581405668102e+19 / CAST(p.reg_sum AS DOUBLE)) <= 640.0
                           AND p.zero_regs > 0
                      THEN 256.0 * ln(256.0 / CAST(p.zero_regs AS DOUBLE))
                      ELSE 2.6499581405668102e+19 / CAST(p.reg_sum AS DOUBLE)
                 END, 4) AS hll_est
    FROM per_group p JOIN exact e USING (source)
    """,
)
def ext_hll_distinct(spark, sf_dir):
    """[EXT] HyperLogLog distinct-token count per source (Flajolet et
    al. 2007) reported beside the exact distinct count: 256
    md5-addressed registers, rho from integer/string ops only, the
    harmonic denominator formed as an exact int64 sum so partition
    order cannot perturb it. Mergeable by cell-wise max — the
    distributed distinct-count structure; the register-state column
    (reg_sum) keeps the sketch itself, not just the estimate, under
    the gate."""
    from dissertation_data_pipeline_spark.operators.sketches import (
        hll_distinct_by_group,
    )

    return hll_distinct_by_group(
        load_table(spark, sf_dir, "documents"), "source"
    )


from dissertation_data_pipeline_spark.plans.queries_training import _H_EXPR


@register(
    "ext_shard_assignment",
    rf"""
    WITH t AS (
      SELECT CAST(({_H_EXPR}) % 16 AS BIGINT) AS shard,
             CAST(len(string_split_regex(lower(trim(text)), '\s+'))
                  AS BIGINT) AS nt
      FROM documents
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS total_tokens,
           CAST(max(nt) AS BIGINT) AS max_doc_tokens
    FROM t GROUP BY shard
    """,
)
def ext_shard_assignment(spark, sf_dir):
    """[EXT] Deterministic training-shard assignment (see
    :func:`operators.training.shard_assignment`): shard =
    md5-hash(doc_id) % 16, per-shard document count / token budget /
    largest doc. The assignment is a pure function of the document id
    — identical under any partitioning, cluster size, or re-run — and
    the oracle recomputes it from scratch in SQL, so determinism is
    gate-verified, not claimed."""
    from dissertation_data_pipeline_spark.operators.training import (
        shard_assignment,
    )

    return shard_assignment(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", n_shards=16
    )


def _h32(expr: str) -> str:
    """DuckDB twin of operators.training.uniform_hash_u32 for an
    arbitrary VARCHAR expression: md5-hex first 8 digits -> uint32 as
    explicit digit arithmetic (DuckDB has no conv())."""
    return " + ".join(
        f"CAST((strpos('0123456789abcdef', substr(md5({expr}), "
        f"{i + 1}, 1)) - 1) AS BIGINT) * {16 ** (7 - i)}"
        for i in range(8)
    )


@register(
    "ext_classifier_quality_filter",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    feats AS (
      SELECT doc_id, ({_h32("tok")}) % 4096 AS bucket FROM toks
    ),
    w AS (
      SELECT b AS bucket,
             (({_h32("CAST(b AS VARCHAR) || ':w'")}) % 2001) - 1000
               AS weight_milli
      FROM range(4096) t(b)
    ),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(weight_milli) AS BIGINT) AS score_milli
      FROM feats JOIN w USING (bucket) GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, score_milli, score_milli > 0 AS keep
    FROM agg
    """,
)
def ext_classifier_quality_filter(spark, sf_dir):
    """[EXT] fastText-style hashed linear classifier inference (see
    :func:`operators.training.hashed_classifier_score`): the
    classifier-based quality-filter step. Integer milli-weight
    arithmetic end to end, so the oracle match is exact, not
    float-tolerant; the weight table is recomputed identically by both
    engines from md5."""
    from dissertation_data_pipeline_spark.operators.training import (
        hashed_classifier_score,
    )

    return hashed_classifier_score(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", dim=4096
    )


@register(
    "ext_temperature_mixture",
    """
    WITH counts AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS _n,
             sum(sqrt(CAST(n_docs AS DOUBLE))) AS _z
      FROM counts
    )
    SELECT lang, n_docs,
           round(CAST(n_docs AS DOUBLE) / _n, 6) AS natural_share,
           round(sqrt(CAST(n_docs AS DOUBLE)) / _z, 6) AS temp_share,
           CAST(round(100000.0 * sqrt(CAST(n_docs AS DOUBLE)) / _z, 0)
                AS BIGINT) AS target_docs
    FROM counts, tot
    """,
)
def ext_temperature_mixture(spark, sf_dir):
    """[EXT] Temperature (alpha=0.5) multilingual mixture planning (see
    :func:`operators.training.temperature_mixture`): per-language
    natural vs flattened sampling shares and integer document budgets.
    sqrt is IEEE-exact on both engines (pow is not) — that is why the
    temperature is 0.5 and not a config float."""
    from dissertation_data_pipeline_spark.operators.training import (
        temperature_mixture,
    )

    return temperature_mixture(
        load_table(spark, sf_dir, "documents"), "lang", budget=100_000
    )
