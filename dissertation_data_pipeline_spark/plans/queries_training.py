"""[EXT] Training-data pipeline queries: repetition metrics, Gopher
quality gate, sequence packing, stratified sampling, domain
reweighting, corpus n-gram stats, text scrubbing.

These extend the reference's corpus-building intent (build_corpus.py's
filter -> dedup -> tag flow) to the LLM-data-pipeline scale called for
by BASELINE.json's north star; each query is DuckDB-oracle-checked.
All Spark plans stay on the codegen path (explode + hash aggregate,
window, scan-side expressions) — see operators/training.py for the
100 TB design notes per operator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators.training import (
    weighted_sample_per_group,
    chunk_documents,
    corpus_top_bigrams,
    decontaminate_report,
    domain_resample,
    gopher_quality_gate,
    pack_sequences,
    repetition_profile,
    scrub_text,
    stratified_sample,
)
from dissertation_data_pipeline_spark.plans.registry import register
from dissertation_data_pipeline_spark.tables import load_table

#: shared DuckDB CTE: token long form with positions (the oracle twin
#: of operators.training.token_long_form)
_TOKS_CTE = """
    toks AS (
      SELECT doc_id, tok, pos FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents)
    ),
    bigs AS (
      SELECT doc_id, tok || ' ' || nxt AS bigram FROM (
        SELECT doc_id, tok,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM toks)
      WHERE nxt IS NOT NULL
    )
"""

#: md5-hex -> uint32 as explicit digit arithmetic (DuckDB has no conv();
#: generated as 8 fixed terms, not a lambda — see oracle notes)
_H_EXPR = " + ".join(
    "CAST((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), "
    f"{i + 1}, 1)) - 1) AS BIGINT) * {16 ** (7 - i)}"
    for i in range(8)
)

_SRC_NUM = "CAST(regexp_extract(source, '([0-9]+)', 1) AS INTEGER)"


@register(
    "ext_repetition_profile",
    f"""
    WITH {_TOKS_CTE},
    per_tok AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             count(*) AS n_distinct_tokens,
             max(c) AS top_token_count
      FROM (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2)
      GROUP BY 1
    ),
    per_big AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
             max(c) AS top_bigram_count
      FROM (SELECT doc_id, bigram, count(*) AS c FROM bigs GROUP BY 1, 2)
      GROUP BY 1
    )
    SELECT p.doc_id, n_tokens, n_distinct_tokens,
           round(n_distinct_tokens / n_tokens, 6) AS distinct_ratio,
           round(top_token_count / n_tokens, 6) AS top_token_frac,
           round(top_bigram_count / n_bigrams, 6) AS top_bigram_frac
    FROM per_tok p LEFT JOIN per_big b ON p.doc_id = b.doc_id
    """,
)
def ext_repetition_profile(spark, sf_dir):
    """Gopher-style repetition metrics per document (Rae et al. 2021
    §A1.1: duplicate-fraction filters). Explode + two hash-aggregate
    trees; ratios are single IEEE divisions of exact counts."""
    return repetition_profile(load_table(spark, sf_dir, "documents"))


@register(
    "ext_gopher_quality_gate",
    """
    SELECT doc_id, n_tokens, mean_word_len, stop_hits,
           (n_tokens BETWEEN 10 AND 1000
            AND mean_word_len >= 2.0 AND mean_word_len <= 12.0
            AND stop_hits >= 2) AS keep
    FROM (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             round(length(replace(text, ' ', ''))
                   / len(string_split(text, ' ')), 6) AS mean_word_len,
             (CASE WHEN contains(' ' || text || ' ', ' the ') THEN 1 ELSE 0 END
              + CASE WHEN contains(' ' || text || ' ', ' a ') THEN 1 ELSE 0 END
              + CASE WHEN contains(' ' || text || ' ', ' and ') THEN 1 ELSE 0 END
              + CASE WHEN contains(' ' || text || ' ', ' of ') THEN 1 ELSE 0 END
              + CASE WHEN contains(' ' || text || ' ', ' to ') THEN 1 ELSE 0 END)
               AS stop_hits
      FROM documents)
    """,
)
def ext_gopher_quality_gate(spark, sf_dir):
    """Expression-only quality gate (token bounds, mean word length,
    stopword presence) — scan-side, no shuffle, no UDF."""
    return gopher_quality_gate(load_table(spark, sf_dir, "documents"))


@register(
    "ext_pack_sequences",
    """
    WITH t AS (
      SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), c AS (
      SELECT *, COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
      FROM t
    )
    SELECT source, CAST(floor(cum_excl / 512.0) AS BIGINT) AS seq_id,
           count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM c GROUP BY 1, 2
    """,
)
def ext_pack_sequences(spark, sf_dir):
    """Block-pack docs into 512-token training sequences per source
    shard: running-sum window partitioned by shard (no global sort),
    then a rollup per sequence."""
    return pack_sequences(load_table(spark, sf_dir, "documents"), budget=512)


@register(
    "ext_stratified_sample",
    f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             {_H_EXPR} AS h,
             20 + 3 * ({_SRC_NUM} % 5) AS rate_pct
      FROM documents)
    WHERE h * 100 < rate_pct * CAST(4294967296 AS BIGINT)
    """,
)
def ext_stratified_sample(spark, sf_dir):
    """Per-source stratified sampling with an md5-uniform and integer
    threshold math — deterministic on any engine or cluster size."""
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.regexp_extract("source", r"([0-9]+)", 1).cast("int")
    rate_pct = F.lit(20) + F.lit(3) * (src_num % 5)
    return stratified_sample(docs, rate_pct).select("doc_id", "source")


@register(
    "ext_domain_resample",
    f"""
    SELECT doc_id, source,
           unnest(range(1, 1 + ({_SRC_NUM} % 3) + 1)) AS copy_idx
    FROM documents
    """,
)
def ext_domain_resample(spark, sf_dir):
    """Data-mixture upsampling: 1-3 copies per doc keyed on source —
    a narrow explode, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.regexp_extract("source", r"([0-9]+)", 1).cast("int")
    n_copies = F.lit(1) + (src_num % 3)
    return domain_resample(docs, n_copies).select("doc_id", "source", "copy_idx")


@register(
    "ext_decontamination",
    r"""
    WITH lt AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
    ),
    ltoks AS (
      SELECT doc_id, tok, pos FROM (
        SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos
        FROM lt)
    ),
    tris AS (
      SELECT DISTINCT doc_id,
             tok || ' ' || n1 || ' ' || n2 AS shingle
      FROM (
        SELECT doc_id, tok,
               lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS n1,
               lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS n2
        FROM ltoks)
      WHERE n2 IS NOT NULL
      UNION
      SELECT doc_id, array_to_string(t, ' ') AS shingle
      FROM lt WHERE len(t) < 3
    )
    SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id,
           count(*) AS n_shared
    FROM (SELECT * FROM tris WHERE doc_id % 97 <> 0) tr
    JOIN (SELECT * FROM tris WHERE doc_id % 97 = 0) ev
      ON tr.shingle = ev.shingle
    GROUP BY 1, 2 HAVING count(*) >= 2
    """,
)
def ext_decontamination(spark, sf_dir):
    """Benchmark decontamination report: train docs (doc_id % 97 != 0)
    sharing >= 2 distinct word-3-grams with any eval doc (% 97 == 0).
    Inverted-index shingle join — eval side tiny, broadcast-able."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    return decontaminate_report(train, eval_df, min_overlap=2)


@register(
    "ext_corpus_top_bigrams",
    f"""
    WITH {_TOKS_CTE}
    SELECT bigram, count(*) AS cnt FROM bigs
    GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 20
    """,
)
def ext_corpus_top_bigrams(spark, sf_dir):
    """Corpus-level top-20 bigrams (boilerplate/contamination probe):
    hash aggregate with map-side combine + TakeOrdered."""
    return corpus_top_bigrams(load_table(spark, sf_dir, "documents"), k=20)


@register(
    "ext_scrub_text",
    r"""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(regexp_replace(
             lower(text || ' See HTTPS://Ex.com/a?b=1 or mail '
                        || 'Bob.Smith+x@ex-ample.org end'),
             'https?://\S+', ' ', 'g'),
             '[\w.+-]+@[\w-]+\.[\w.]+', ' ', 'g'),
             '\s+', ' ', 'g')) AS scrubbed
    FROM documents
    """,
)
def ext_scrub_text(spark, sf_dir):
    """C4-style scrub (lowercase, strip URLs/emails, collapse
    whitespace) over text with injected dirt, so removal is actually
    exercised. RE2-safe patterns shared verbatim with the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"),
        F.lit(" See HTTPS://Ex.com/a?b=1 or mail Bob.Smith+x@ex-ample.org end"),
    )
    return docs.select("doc_id", scrub_text(dirty).alias("scrubbed"))


@register(
    "ext_chunk_documents",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    st AS (
      SELECT doc_id, t, len(t) AS n,
             unnest(range(0, len(t), 24)) AS start
      FROM toks
    )
    SELECT doc_id,
           CAST(start / 24 AS BIGINT) AS chunk_idx,
           CAST(start AS BIGINT) AS start_pos,
           CAST(least(32, n - start) AS BIGINT) AS chunk_tokens,
           md5(array_to_string(t[start + 1 : start + 32], ' ')) AS chunk_md5
    FROM st
    WHERE start = 0 OR start + 8 < n
    """,
)
def ext_chunk_documents(spark, sf_dir):
    """[EXT] fixed-window token chunking with overlap (32-token
    windows every 24 tokens; trailing fully-contained windows
    dropped). Scan-shaped retrieval/RAG prep — no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d, "doc_id", "text", window=32, stride=24)


@register(
    "ext_weighted_sample",
    r"""
    WITH u AS (
      SELECT doc_id, lang, n_chars,
             ((strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16^7
              + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 2, 1)) - 1) * 16^6
              + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 3, 1)) - 1) * 16^5
              + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 4, 1)) - 1) * 16^4
              + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 5, 1)) - 1) * 16^3
              + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 6, 1)) - 1) * 16^2
              + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 7, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 8, 1)) - 1)
             ) AS h32
      FROM documents
    ), keyed AS (
      SELECT doc_id, lang, n_chars,
             ln((h32 + 1) / 4294967297.0) / n_chars AS es_key
      FROM u
    )
    SELECT lang, doc_id, n_chars, sample_rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY lang ORDER BY es_key DESC, doc_id ASC
      ) AS sample_rank
      FROM keyed
    ) WHERE sample_rank <= 5
    """,
)
def ext_weighted_sample(spark, sf_dir):
    """[EXT] Efraimidis-Spirakis weighted sampling without
    replacement: 5 docs per language, weight = n_chars, md5-derived
    uniforms — deterministic, reproducible, one window shuffle
    (operators/training.py::weighted_sample_per_group)."""
    d = load_table(spark, sf_dir, "documents")
    return weighted_sample_per_group(
        d, ["lang"], "n_chars", 5, id_col="doc_id"
    ).select("lang", "doc_id", "n_chars", "sample_rank")
