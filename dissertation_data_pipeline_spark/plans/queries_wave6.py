"""Wave 6 — tokenizer training and the grouped-agg UDAF surface.

- **BPE training** (:mod:`operators.bpe`): the iterative merge loop is
  driver-pattern (per-round global argmax -> 1-row collect) and thus
  not one-statement-SQL-expressible; the *gate-checked* query here is
  its first iteration — corpus-wide adjacent symbol-pair counts over
  the char+EOW initialization — which pins the word-frequency
  reduction, the symbol initialization, and the pair-count aggregate
  that every subsequent round reuses. Full-loop parity vs an
  independent pure-Python reference lives in tests/test_wave6.py.
- **Grouped-agg pandas UDAF** (:mod:`operators.udafs`): per-label
  coordinate-wise embedding median — a holistic (non-algebraic)
  aggregate Spark lacks natively, exploded to long form so the gate
  can hash it.
"""

from __future__ import annotations

from dissertation_data_pipeline_spark.operators.bpe import (
    initial_symbols,
    pair_counts,
    word_frequencies,
)
from dissertation_data_pipeline_spark.operators.udafs import label_dim_medians
from dissertation_data_pipeline_spark.plans.registry import register
from dissertation_data_pipeline_spark.tables import load_table

from pyspark.sql import functions as F


@register(
    "ext_bpe_pair_counts",
    r"""
    WITH words AS (
      SELECT word, CAST(count(*) AS BIGINT) AS freq
      FROM (
        SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        FROM documents
      )
      WHERE len(word) > 0 GROUP BY 1
    ),
    syms AS (
      SELECT freq,
             list_concat(
               list_transform(range(1, len(word) + 1), i -> word[i:i]),
               ['</w>']
             ) AS s
      FROM words
    ),
    pairs AS (
      SELECT freq,
             unnest(list_transform(range(1, len(s)),
                                   i -> {'a': s[i], 'b': s[i + 1]})) AS p
      FROM syms
    )
    SELECT p.a AS a, p.b AS b, CAST(sum(freq) AS BIGINT) AS cnt
    FROM pairs GROUP BY 1, 2
    ORDER BY cnt DESC, a, b LIMIT 20
    """,
)
def ext_bpe_pair_counts(spark, sf_dir):
    """[EXT] BPE training round 1: top-20 adjacent symbol pairs (char +
    end-of-word initialization, counts weighted by word frequency,
    deterministic (cnt DESC, a, b) tiebreak). This is exactly the
    argmax input of operators/bpe.py::bpe_train's first iteration —
    the corpus->word-frequency reduction and the pair aggregate that
    every round reuses, value-checked; the loop itself is verified by
    reference-implementation parity in tests."""
    words = initial_symbols(
        word_frequencies(load_table(spark, sf_dir, "documents"))
    )
    return (
        pair_counts(words)
        .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
        .limit(20)
    )


@register(
    "ext_udaf_label_medians",
    """
    WITH long AS (
      SELECT label, i AS dim, CAST(embedding[i] AS DOUBLE) AS v
      FROM (
        SELECT label, embedding,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings
      )
    )
    SELECT label, CAST(dim AS BIGINT) AS dim, round(median(v), 6) AS med
    FROM long GROUP BY 1, 2
    """,
)
def ext_udaf_label_medians(spark, sf_dir):
    """[EXT] the GROUPED_AGG pandas-UDAF surface: per-label
    coordinate-wise embedding median (order-statistic aggregate, no
    Spark built-in), float32 widened to float64 before sorting so the
    middle-pair average is bit-identical to the oracle's DOUBLE
    median. Long-form (label, dim, med) output."""
    return label_dim_medians(load_table(spark, sf_dir, "embeddings"))


@register(
    "ext_incremental_agg",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS value_cents
    FROM events GROUP BY 1
    """,
)
def ext_incremental_agg(spark, sf_dir):
    """[EXT] incremental aggregate maintenance: the per-user event
    rollup is refreshed from a persisted state table (the event_id%10
    != 0 slice's aggregate) plus a delta batch aggregate (the %10 == 0
    slice) via operators/merge.py::merge_aggregates — ONE full-outer
    join of two key-sized tables, O(delta) new data read. The oracle
    re-aggregates the whole corpus: the merged state must equal the
    full recompute exactly (counts and cent-sums are exact int64)."""
    from dissertation_data_pipeline_spark.operators.merge import merge_aggregates

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )

    def agg(df):
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("value_cents"),
        )

    old = agg(ev.filter(F.col("event_id") % 10 != 0))
    delta = agg(ev.filter(F.col("event_id") % 10 == 0))
    return merge_aggregates(
        old, delta, "user_id", count_col="n_events", sum_cols=["value_cents"]
    )
