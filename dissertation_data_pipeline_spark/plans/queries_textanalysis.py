"""[EXT] text-analysis queries over the documents table, with oracles.

The quality score intentionally uses the *rounded* component ratios
(as ``quality_features`` returns them) so the published score is
reproducible from the published features; the oracle mirrors that.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators import textanalysis as ta
from dissertation_data_pipeline_spark.plans.registry import register
from dissertation_data_pipeline_spark.tables import load_table


def _profile_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in ta.LANG_PROFILES[lang])
    return (
        r"len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\s+')), "
        f"[{words}]))"
    )


_LANG_CASE = f"""
  CASE
    WHEN {_profile_sql('en')} >= {_profile_sql('de')}
     AND {_profile_sql('en')} >= {_profile_sql('es')}
     AND {_profile_sql('en')} >= {_profile_sql('fr')} THEN 'en'
    WHEN {_profile_sql('de')} >= {_profile_sql('es')}
     AND {_profile_sql('de')} >= {_profile_sql('fr')} THEN 'de'
    WHEN {_profile_sql('es')} >= {_profile_sql('fr')} THEN 'es'
    ELSE 'fr'
  END
"""


@register(
    "ext_langid",
    f"""
    SELECT doc_id, {_LANG_CASE} AS lang_pred FROM documents
    """,
)
def ext_langid(spark, sf_dir):
    """[EXT] n-gram/stopword-heuristic language ID: per-language profile
    scores, argmax with fixed tie order (en, de, es, fr)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", ta.lang_id("text").alias("lang_pred"))


@register(
    "ext_langid_confusion",
    f"""
    SELECT lang, lang_pred, count(*) AS cnt FROM (
      SELECT lang, {_LANG_CASE} AS lang_pred FROM documents
    ) GROUP BY 1, 2
    """,
)
def ext_langid_confusion(spark, sf_dir):
    """[EXT] langid confusion rollup against the table's lang column."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", ta.lang_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


_QF_SQL = r"""
  SELECT doc_id,
         length(coalesce(text, '')) AS n_chars,
         CASE WHEN trim(coalesce(text, '')) = '' THEN 0
              ELSE len(string_split_regex(lower(trim(text)), '\s+')) END AS n_words,
         length(regexp_replace(coalesce(text, ''), '[A-Za-z0-9\s]', '', 'g')) AS n_punct,
         length(regexp_replace(coalesce(text, ''), '[^0-9]', '', 'g')) AS n_digit,
         len(list_filter(string_split_regex(lower(trim(coalesce(text, ''))), '\s+'),
             t -> list_contains(['the','a','of','and','to','in','is','that','it','for'], t))) AS n_stop
  FROM documents
"""


@register(
    "ext_quality_features",
    f"""
    SELECT doc_id, n_chars, n_words,
           round((n_chars - (n_words - 1)) / greatest(n_words, 1)::DOUBLE, 6) AS avg_word_len,
           round(n_punct / greatest(n_chars, 1)::DOUBLE, 6) AS punct_ratio,
           round(n_digit / greatest(n_chars, 1)::DOUBLE, 6) AS digit_ratio,
           round(n_stop / greatest(n_words, 1)::DOUBLE, 6) AS stopword_ratio
    FROM ({_QF_SQL})
    """,
)
def ext_quality_features(spark, sf_dir):
    """[EXT] C4/Gopher-style cheap quality gates: length, punctuation,
    digit, and stopword ratios — pure expressions at scan speed."""
    d = load_table(spark, sf_dir, "documents")
    feats = ta.quality_features("text")
    return d.select("doc_id", *[c.alias(n) for n, c in feats.items()])


@register(
    "ext_quality_score",
    f"""
    SELECT doc_id,
           (least(n_words::BIGINT * 10000, 1000000) * 4
            + least(CAST(round(round(n_stop / greatest(n_words, 1)::DOUBLE, 6) * 1e6, 0) AS BIGINT) * 5, 1000000) * 3
            + (1000000 - least(CAST(round(round(n_punct / greatest(n_chars, 1)::DOUBLE, 6) * 1e6, 0) AS BIGINT) * 10, 1000000)) * 2
            + (1000000 - least(CAST(round(round(n_digit / greatest(n_chars, 1)::DOUBLE, 6) * 1e6, 0) AS BIGINT) * 10, 1000000)) * 1
           )::DOUBLE / 10000000.0 AS quality
    FROM ({_QF_SQL})
    """,
)
def ext_quality_score(spark, sf_dir):
    """[EXT] scalar quality score in [0,1] with fixed documented
    weights, computed from the published (rounded) ratios."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", ta.quality_score("text").alias("quality"))


@register(
    "ext_token_counts",
    r"""
    SELECT doc_id,
           CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                ELSE len(string_split_regex(lower(trim(text)), '\s+')) END::INTEGER AS ws_tokens,
           len(regexp_extract_all(coalesce(text, ''),
               '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]'))::INTEGER AS bpe_ish_tokens
    FROM documents
    """,
)
def ext_token_counts(spark, sf_dir):
    """[EXT] token counting: whitespace tokens + BPE-ish pre-tokenizer
    (alnum runs / single symbols) via regexp_count."""
    d = load_table(spark, sf_dir, "documents")
    counts = ta.token_counts("text")
    return d.select("doc_id", *[c.alias(n) for n, c in counts.items()])


@register(
    "ext_doc_fingerprint",
    """
    SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(
                 list_filter(string_split(coalesce(text, ''), ''), c -> c <> ''),
                 c -> ascii(c)::BIGINT)),
             (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
    FROM documents
    """,
)
def ext_doc_fingerprint(spark, sf_dir):
    """[EXT] rolling polynomial content fingerprint (acc*31+codepoint
    mod 1e9+7), strict left fold — order-sensitive, engine-exact."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", ta.doc_fingerprint("text").alias("fingerprint"))


_PII_SQL = dict(ta.PII_PATTERNS)  # DuckDB quotes pass backslashes through verbatim
_TERM_SQL = r"\b(customer|vector)\b"
_REDACTED = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace(text, "
    f"'{_PII_SQL['email']}', '[PII:email]', 'g'), "
    f"'{_PII_SQL['url']}', '[PII:url]', 'g'), "
    f"'{_PII_SQL['phone']}', '[PII:phone]', 'g'), "
    f"'{_TERM_SQL}', '[TERM]', 'g')"
)


@register(
    "ext_pii_redaction",
    f"""
    SELECT doc_id,
           CAST(length(regexp_extract_all(text, '{_PII_SQL["email"]}')) AS BIGINT) AS n_email,
           CAST(length(regexp_extract_all(text, '{_PII_SQL["url"]}')) AS BIGINT) AS n_url,
           CAST(length(regexp_extract_all(text, '{_PII_SQL["phone"]}')) AS BIGINT) AS n_phone,
           CAST(length(regexp_extract_all(text, '{_TERM_SQL}')) AS BIGINT) AS n_terms,
           md5({_REDACTED}) AS redacted_md5,
           CAST(length({_REDACTED}) AS BIGINT) AS redacted_len
    FROM documents
    """,
)
def ext_pii_redaction(spark, sf_dir):
    """[EXT] PII + dictionary redaction over the corpus: per-kind match
    counts and the md5/length of the redacted text (the text itself
    stays out of the result on purpose — at scale the rewritten corpus
    is a sink, not a query result)."""
    d = load_table(spark, sf_dir, "documents")
    r = ta.redact("text")
    return d.select(
        "doc_id",
        r["n_email"].alias("n_email"),
        r["n_url"].alias("n_url"),
        r["n_phone"].alias("n_phone"),
        r["n_terms"].alias("n_terms"),
        F.md5(r["redacted"]).alias("redacted_md5"),
        F.length(r["redacted"]).cast("long").alias("redacted_len"),
    )


@register(
    "ext_unicode_nfc",
    """
    WITH raws AS (
      SELECT doc_id, text || 'e' || chr(769) || ' a' || chr(778) AS raw
      FROM documents
    )
    SELECT doc_id,
           CAST(length(raw) AS BIGINT) AS len_raw,
           CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_nfc,
           length(raw) != length(nfc_normalize(raw)) AS changed
    FROM raws
    """,
)
def ext_unicode_nfc(spark, sf_dir):
    """[EXT] Unicode NFC canonicalization (see
    :func:`operators.text_udf.normalize_unicode_nfc`) — gate-proven
    against DuckDB's ``nfc_normalize``. Every document gets a
    decomposed suffix (e+U+0301, a+U+030A) appended so the
    normalization demonstrably composes (codepoint length shrinks by
    2) rather than passing ASCII through untouched; lengths are exact
    ints, so the comparison is bit-strict."""
    from dissertation_data_pipeline_spark.operators.text_udf import (
        normalize_unicode_nfc,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.col("text"), F.lit("é å")).alias("raw"),
    )
    out = normalize_unicode_nfc(docs, "raw", "norm")
    return out.select(
        "doc_id",
        F.length("raw").cast("long").alias("len_raw"),
        F.length("norm").cast("long").alias("len_nfc"),
        (F.length("raw") != F.length("norm")).alias("changed"),
    )
