"""[EXT] Relevance ranking over the document corpus: TF-IDF and BM25.

The reference's keyword machinery is boolean containment
(master_list_builder.py keyword filters; SURVEY §2.2 P9) — any corpus
curation or search layer additionally needs *graded* relevance. Both
scorers here are single declarative plans over the token long form:

    docs --repartition(id)--> tokens --groupBy(id,tok)--> tf
         --groupBy(tok)--> df  --join--> score

Scale notes:
- The posting build reuses the dedup layer's single-exchange shape:
  hash-partition raw docs by id (explicit partition count — exempt
  from AQE coalescing), tokenize in-partition; the (id, tok) term-
  frequency aggregate needs no further exchange.
- Document frequency is one groupBy on the token key (map-side
  combined; Zipf skew is absorbed by the partial aggregate, the same
  argument as corpus_top_bigrams).
- Corpus-level scalars (N, avgdl) attach via broadcast of one-row
  aggregates — never a driver-side collect inside the plan.
- Scoring, ranking, and top-k are expressions + one window over the
  score; every float is rounded before publication so the DuckDB
  oracle hash-matches (ln is the only libm call; see queries file).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators.dedup_ext import tokens


def term_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, term) -> tf over whitespace tokens, single-exchange (see
    module docstring). Returns (_id, _tok, tf). Empty tokens are
    dropped: splitting '' on \\s+ yields [''], so an empty/whitespace
    document would otherwise publish a phantom ''-term into TF-IDF/BM25
    document-frequency statistics (the same phantom-token class as the
    BPE and feature-hashing fixes)."""
    nparts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
        .repartition(nparts, F.col("_id"))
        .select("_id", F.explode(tokens("_text")).alias("_tok"))
        .filter(F.length("_tok") > 0)
        .groupBy("_id", "_tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 3
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)``, the scikit-learn smoothing).
    Deterministic: rank ties break on the term string.

    Output: (doc_id, term, term_rank, score)."""
    tf = term_frequencies(df, id_col, text_col).localCheckpoint(eager=False)
    dfreq = tf.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("_n"))
    scored = (
        tf.join(dfreq, "_tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (F.log((F.col("_n") + 1) / (F.col("_df") + 1)) + F.lit(1.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy("_id").orderBy(F.col("score").desc(), F.col("_tok").asc())
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(
            F.col("_id").alias("doc_id"),
            F.col("_tok").alias("term"),
            "term_rank",
            "score",
        )
    )


def bm25_rank(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
) -> DataFrame:
    """Okapi BM25 ranking of the corpus against a fixed term set.

    score(D) = Σ_t ln(1 + (N - df + 0.5)/(df + 0.5))
               · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

    dl is whitespace token count, avgdl the exact corpus mean (DECIMAL
    ratio of two counts, cast to double — no order-dependent float
    sum). Only documents containing at least one query term appear.

    Determinism: per-term contributions are rounded to integer
    micro-units BEFORE the per-document sum, so the sum is
    order-independent (a double Σ would depend on which query term a
    partition delivered first) — the same integer-canonicalization
    trick quality_score uses. The top-n is orderBy+limit —
    TakeOrdered (per-partition top-n, then merge), never a global
    single-partition sort.

    Output: (rank, doc_id, score), top ``top_n`` by (score desc,
    doc_id asc)."""
    assert query_terms, "bm25_rank needs at least one query term"
    tf = term_frequencies(df, id_col, text_col).localCheckpoint(eager=False)
    dl = tf.groupBy("_id").agg(F.sum("tf").alias("_dl"))
    qt = [str(t) for t in query_terms]
    qtf = tf.filter(F.col("_tok").isin(qt))
    dfreq = qtf.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("_n"),
        (
            F.sum("_dl").cast("decimal(38,10)") / F.count(F.lit(1))
        ).cast("double").alias("_avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + F.lit(k1) * (1 - b + F.lit(b) * F.col("_dl") / F.col("_avgdl"))
    )
    contrib_micro = F.round(idf * tf_norm * F.lit(1e6)).cast("long")
    scored = (
        qtf.join(dfreq, "_tok")
        .join(dl, "_id")
        .crossJoin(F.broadcast(corpus))
        .groupBy("_id")
        .agg((F.sum(contrib_micro) / F.lit(1e6)).alias("score"))
    )
    top = scored.orderBy(F.col("score").desc(), F.col("_id").asc()).limit(top_n)
    w = Window.orderBy(F.col("score").desc(), F.col("_id").asc())
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", F.col("_id").alias("doc_id"), "score")
    )


#: rule-based topic dictionaries over the corpus vocabulary — the shape
#: of the reference's inferred classifier (output/co_pilot_summary.csv:1
#: carries 7 binary strategy columns + a plain-language summary; the
#: producing classify_co_pilot.py is absent from the repo, so the rule
#: form is reconstructed per SURVEY §2.10's [EXT] note)
TOPIC_RULES: dict[str, tuple[str, ...]] = {
    "scans": ("scan", "filter"),
    "joins": ("join", "merge", "hash"),
    "aggregation": ("agg", "group"),
    "streaming": ("stream", "window", "batch"),
    "storage": ("table", "row", "column"),
    "performance": ("fast", "slow", "big", "small"),
    "vectors": ("vector", "embedding"),
}


def rule_classify(
    col, rules: dict[str, tuple[str, ...]] = TOPIC_RULES
) -> dict[str, "F.Column"]:
    """Rule-based multi-label document classification: one boolean per
    topic (distinct-token overlap with the topic dictionary), a topic
    count, and an assembled plain-language summary — all scan-speed
    Column expressions, no UDFs.

    Returns {has_<topic>: bool, ..., n_topics: int, summary: str}.
    NULL text classifies as no-topic (flags false, n_topics 0) — the
    coalesce keeps all three outputs consistent; without it the flags
    and count were NULL while the summary said 'covers: none'."""
    toks = F.coalesce(
        F.array_distinct(tokens(col)), F.array().cast("array<string>")
    )
    out: dict[str, F.Column] = {}
    flags = []
    for topic, words in rules.items():
        flag = F.arrays_overlap(toks, F.array(*[F.lit(w) for w in words]))
        out[f"has_{topic}"] = flag
        flags.append((topic, flag))
    n = None
    for _, flag in flags:
        term = flag.cast("int")
        n = term if n is None else n + term
    out["n_topics"] = n
    matched = F.concat_ws(
        ", ",
        *[F.when(flag, F.lit(topic)) for topic, flag in flags],  # nulls drop
    )
    out["summary"] = F.when(matched == "", F.lit("covers: none")).otherwise(
        F.concat(F.lit("covers: "), matched)
    )
    return out
