"""Driver-facing query registry (SURVEY §2 inventory -> named queries).

Every implemented operator from SURVEY §2 appears here as a named query
over the shared testdata tables, paired with an ANSI-SQL oracle that
DuckDB runs on the same parquet files. Query names carry the SURVEY
operator ids they exercise.

Cross-engine exactness rules used throughout:

- **Money math in DECIMAL(18,2)** — double sums are order-dependent
  across partitionings; summing exact decimals then casting the final
  value to double is bit-reproducible in both engines.
- **Deterministic total orders** — every window/dedup/top-k has an
  explicit tiebreak column, so results don't depend on partitioning.
- **Canonical NULL** — synthesized missingness uses NULL, never ''.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators import (
    anti_report,
    conflict_report,
    dedup_latest_per_key,
    dedup_priority,
    duplicate_groups,
    frequency,
    merge_duplicates_coalesce_fill,
    top_k_frequency,
    union_conform,
)
from dissertation_data_pipeline_spark.tables import load_table


@dataclass(frozen=True)
class Q:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None -> rows-only check


QUERIES: dict[str, Q] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = Q(fn, sql)
        return fn

    return deco


#: Names the external correctness gate should check FIRST.  The gate
#: walks ``queries()`` in dict order with a bounded budget (round 1
#: covered exactly the first 50 entries), so ordering is coverage
#: policy: queries whose gate status must change this round (fixed
#: hash/canon bugs, newly added oracles) come first, then queries the
#: gate has never checked; queries with green recorded rows from a
#: prior round sort last.  Populated by ``_driver_priority()``.
DRIVER_PRIORITY: list[str] = []

#: Queries with a green (hash_match) row in CORRECTNESS_r01/r02.json — the
#: gate has already hard-verified these, so under a bounded budget they
#: sort LAST and the budget buys rows for never-checked queries instead.
GREEN_PRIOR_ROUNDS: frozenset[str] = frozenset(
    {
        "flagship_corpus_rollup", "a1_frequency_status", "a2_orders_summary",
        "a7_duplicate_groups", "a8_conflict_report", "p4_filter_project",
        "j1_left_join", "j2_dim_rollup", "j3_anti_join", "j6_multikey_join",
        "u1_union_conform", "u3_distinct", "w1_dedup_priority",
        "w2_latest_per_key", "w5_flag_both_sources", "a9_coalesce_fill",
        "o2_top_k_frequency", "fs1_normalize_bill_number",
        "fs3_normalize_status", "fs12_normalize_text_plain", "fs14_word_count",
        "fs13_doc_id_from_url", "j4_make_bill_id", "fd2_parse_date_multi",
        "fd1_lenient_year_rollup", "fd3_year_from_prefix", "p9_keyword_filter",
        "fj3_base64_roundtrip", "p6_p7_predicates", "ext_dedup_exact",
        "ext_dedup_tokenset", "ext_minhash_lsh_pairs", "ext_simhash_pairs",
        "ext_near_dup_components", "ext_blocked_jaccard_pairs",
        "ext_ann_brute_topk", "ext_ann_lsh_topk", "ext_ann_ivf_topk",
        "ext_embedding_quantize", "ext_vector_stats", "ext_langid",
        "ext_langid_confusion", "ext_quality_features",
        # round 2 (47)
        "a4_a6_conditional_counts", "fs2_bill_number_variants",
        "fa3_matched_keywords", "fa1_theme_tags", "w3_fj2_nested_arrays",
        "ext_simhash_values", "ext_ann_ivf_trained_topk",
        "ext_embedding_near_dup", "ext_approx_count_distinct",
        "ext_merge_upsert", "ext_cdc_apply", "ext_incremental_agg",
        "ext_pmi_collocations", "ext_late_data_report",
        "ext_source_overlap_sketch", "ext_bpe_pair_counts",
        "ext_udaf_label_medians", "ext_asof_nearest",
        "p1_p2_conform_contract", "p3_p5_value_and_length_filters",
        "p8_needs_enrichment", "p10_o4_deterministic_head",
        "a3_a5_minmax_mean", "a10_completeness_histogram",
        "u2_except_uncovered_nations", "w4_format_preference",
        "fa4_is_amendment", "fj1_flatten_structs", "fs4_status_decode",
        "fs6_fs7_fs15_string_normalize", "fs9_state_code",
        "fs11_fa2_concat_fields", "ext_quality_score", "ext_token_counts",
        "ext_doc_fingerprint", "ext_gopher_quality_gate",
        "ext_stratified_sample", "ext_domain_resample", "ext_decontamination",
        "ext_corpus_top_bigrams", "ext_scrub_text", "ext_multimodal_features",
        "ext_salted_skew_join", "ext_salted_two_phase_agg",
        "ext_key_skew_report", "ext_asof_join", "ext_interval_join",
        # round 3 (49, CORRECTNESS_r03.json)
        "ext_weighted_median", "ext_repetition_profile", "ext_pack_sequences",
        "s_json_props", "fs5_title_case", "fs10_safe_filename",
        "o1_o5_sorted_frequency", "s7_bulk_datasets_fixture",
        "s2_excel_fixture", "uf2_pdf_fixture", "s_tumbling_window",
        "s_session_window", "s_dedup_in_window", "ext_dedup_incremental",
        "ext_semantic_dedup", "ext_dup_ngram_fraction", "ext_containment_pairs",
        "ext_winnowing_fingerprints", "ext_chunk_documents",
        "ext_chunk_dedup_clean", "ext_entity_resolution", "ext_ann_pq_codes",
        "ext_ann_pq_adc_topk", "ext_ann_pq_rerank", "ext_label_centroid_sim",
        "ext_pii_redaction", "ext_token_freq_quality", "ext_bigram_lm_score",
        "ext_weighted_sample", "ext_train_split", "ext_negative_sampling",
        "ext_feature_hashing", "ext_target_encoding", "ext_sessionize_batch",
        "ext_time_rollup", "ext_time_gap_fill", "ext_event_percentiles",
        "ext_pivot_wide", "ext_unpivot_melt", "ext_cube_totals",
        "ext_grouping_sets", "ext_window_suite", "ext_funnel_stages",
        "ext_cohort_retention", "ext_running_distinct_users",
        "ext_triangle_count", "ext_pagerank_transitions",
        "ext_curation_pipeline", "tpch_q1_pricing_summary",
        # round 4 (50, CORRECTNESS_r04.json)
        "ext_scd2_history", "ext_ann_ivf_partitioned_topk",
        "ext_cdc_scd2_pipeline", "ext_hll_distinct", "s_stateful_profile",
        "ext_shard_assignment", "ext_classifier_quality_filter",
        "ext_temperature_mixture", "ext_unicode_nfc", "ext_ann_recall_at_10",
        "ext_ann_ivfpq_rerank", "ext_url_canonicalize",
        "ext_ann_lsh_multiprobe_topk", "ext_containment_pairs",
        "ext_capped_jaccard_pairs", "ext_stop_shingle_report",
        "ext_ccnet_buckets", "ext_rolling_features", "ext_count_min_hitters",
        "s_sliding_window", "ext_histogram_equiwidth", "ext_pct_of_total",
        "ext_mad_outliers", "ext_event_transitions",
        "ext_multimodal_frame_sample", "ext_multimodal_audio",
        "ext_range_window_hour", "ext_approx_percentile_bounded",
        "ext_fuzzy_levenshtein_pairs", "ext_tfidf_top_terms", "ext_bm25_rank",
        "ext_intersect_segments", "ext_dq_checks", "ext_rule_classifier",
        "ext_snapshot_diff", "ext_histogram_equidepth", "ext_group_linreg",
        "ext_zorder_values", "ext_corr_matrix", "ext_k_anonymity",
        "ext_table_profile", "ext_sql_surface", "ext_zscore_scaler",
        "ext_attribution_last_touch", "ext_repeated_substring_spans",
        "tpch_q9_product_profit", "tpch_q13_customer_distribution",
        "tpch_q15_top_supplier", "tpch_q21_waiting_suppliers",
        "tpch_q2_min_cost_supplier",
        # round 5 (45 green of 50 checked, CORRECTNESS_r05.json — the 5
        # reds stay out and lead round 6's DRIVER_PRIORITY instead)
        "tpch_q3_shipping_priority", "tpch_q4_order_priority",
        "tpch_q5_region_volume", "tpch_q6_forecast_revenue",
        "tpch_q7_nation_volume", "tpch_q8_market_share",
        "tpch_q10_returned_items", "tpch_q11_important_stock",
        "tpch_q12_late_lines_by_status", "tpch_q14_promo_effect",
        "tpch_q16_part_supplier_variety", "tpch_q17_small_qty_revenue",
        "tpch_q18_large_volume_customers", "tpch_q19_disc_revenue_or",
        "tpch_q20_potential_promotion", "tpch_q22_idle_customers",
        "ext_ann_ivf_build", "ext_dedup_pair_recall",
        "ext_dedup_pair_recall_b6r2", "i1_i3_state_protocol",
        "s1_csv_fixture", "s4_jsonl_fixture", "s5_zip_fixture",
        "s9_textdir_fixture", "k2_parquet_roundtrip",
        "k3_excel_roundtrip", "s_stream_stream_left_outer",
        "s_stream_stream_full_outer",
    }
)


def set_driver_priority(names: list[str]) -> None:
    DRIVER_PRIORITY[:] = names


#: Round in which a query's implementing code last changed in a way
#: that could alter its gate output (semantics, plan shape, oracle).
#: Maintained alongside such changes; compared against the last green
#: driver round derived from CORRECTNESS_r*.json so rows whose code
#: changed AFTER their most recent green sort ahead of fresh greens
#: (the driver's bounded sample then re-verifies them first).
CODE_CHANGED_ROUND: dict[str, int] = {
    # round 6, commit 4a72304 (temporal/merge/clusters review fixes
    # landed after these rows' last driver green):
    "ext_asof_join": 6, "ext_interval_join": 6, "ext_merge_upsert": 6,
    "ext_sessionize_batch": 6, "ext_scd2_history": 6,
    "ext_cdc_scd2_pipeline": 6, "ext_near_dup_components": 6,
    # round 6 parity-changed semantics (driver rows predate them):
    "fa4_is_amendment": 6, "fs4_status_decode": 6,
    # round 7: prefix-strip guard applied to bill_number_variants and
    # divergence documentation in normalize_bill_number:
    "fs1_normalize_bill_number": 7, "fs2_bill_number_variants": 7,
    # round 7: html_to_text fallback now decodes entities (bs4 parity):
    "uf1_html_fixture": 7,
    # round 8: MinHash banding is threshold-adaptive (6x2 at the
    # default 12/0.5 — candidate geometry changed for every row that
    # inherits the default, oracles re-rendered from the same rule):
    "ext_minhash_lsh_pairs": 8, "ext_dedup_incremental": 8,
    "ext_dedup_pair_recall": 8,
    # round 8: oracle predicate tightened (glob-faithful draft_* skip)
    # and curation oracle refactored into the shared _curation_sql
    # (SQL text verified byte-identical; re-verified anyway):
    "p11_skip_list_scan": 8, "ext_curation_pipeline": 8,
    # round 8: drain state partitions sized to staged rows (results
    # partition-count independent; re-verified):
    "s_stateful_profile": 8,
    # round 9: oracles refactored into shared SQL-rendering helpers
    # (_entity_resolution_sql/_semdedup_sql/_blocked_jaccard_sql) for
    # the new fixed-block twins; rendered corpus SQL is byte-identical
    # except a redundant self-alias in the entity join; semantics
    # unchanged, re-verify anyway:
    "ext_entity_resolution": 9, "ext_semantic_dedup": 9,
    "ext_blocked_jaccard_pairs": 9,
    # round 9 optimization wave (results verified identical at
    # sf0.001/0.01/0.1; plan shape changed): recall verify legs spread
    # across cores (wider bucket grid + explicit repartition), messy-
    # date and corr-matrix scans spread before their CPU-heavy
    # projections, q11 per-part aggregate materialized once, pagerank
    # lineage cut every 3rd round:
    "ext_simhash_pair_recall": 9, "ext_simhash_pair_recall_h3": 9,
    "ext_embedding_near_dup_recall": 9,
    "ext_embedding_near_dup_recall_single": 9,
    "fd1_lenient_year_rollup": 9, "fd2_parse_date_multi": 9,
    "ext_corr_matrix": 9, "tpch_q11_important_stock": 9,
    "ext_pagerank_transitions": 9,
    # round 9 optimization wave 2 (same bar — results verified
    # identical, plan shape changed): posting checkpoint moved after
    # the spread/cap in _blocked_intersections (ext_blocked_jaccard_
    # pairs already stamped 9 above), q2's region-filtered bridge
    # materialized once:
    "tpch_q2_min_cost_supplier": 9,
    "ext_capped_jaccard_pairs": 9, "ext_containment_pairs": 9,
}


def _green(row: dict) -> bool:
    return (
        row.get("err") is None
        and bool(row.get("rows_match"))
        and row.get("schema_match") is not False
        and row.get("hash_match") is not False
    )


_LAST_GREEN_CACHE: dict[str, int] | None = None


def last_green_rounds() -> dict[str, int]:
    """query name -> latest round with a green driver CORRECTNESS row,
    read from the CORRECTNESS_r*.json files at the repo root.  A query
    whose LATEST recorded row is red is excluded entirely (its stale
    green must not shield a known failure from the sample).  Falls
    back to GREEN_PRIOR_ROUNDS (round unknown -> 0) if none are
    readable (e.g. the package is imported outside the repo)."""
    global _LAST_GREEN_CACHE
    if _LAST_GREEN_CACHE is not None:
        return _LAST_GREEN_CACHE
    import json
    import re
    from pathlib import Path

    greens: dict[str, int] = {}
    last_any: dict[str, int] = {}
    repo = Path(__file__).resolve().parents[2]
    for p in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            last_any[name] = max(last_any.get(name, 0), rnd)
            if _green(row):
                greens[name] = max(greens.get(name, 0), rnd)
    # demote red-after-green: only keep a green that is the query's
    # most recent recorded outcome
    out = {n: g for n, g in greens.items() if last_any.get(n, g) <= g}
    if not out and not last_any:
        out = {n: 0 for n in GREEN_PRIOR_ROUNDS}
    _LAST_GREEN_CACHE = out
    return out


def _changed_rounds() -> dict[str, int]:
    """Per-query round of the most recent code change that could alter
    gate output: the max of the hand-maintained CODE_CHANGED_ROUND
    (semantic changes, documented) and the MECHANICAL fingerprint
    stamp (plans/gate_fingerprints.json — registration-site or
    engine-dep-closure drift; round 9 wires it in so a deep operator
    edit rotates every dependent query without a manual entry)."""
    try:
        from dissertation_data_pipeline_spark.plans.fingerprints import (
            recorded_fingerprints,
        )

        mech = {
            n: e.get("round", 0) for n, e in recorded_fingerprints().items()
        }
    except Exception:
        mech = {}
    out = dict(mech)
    for n, r in CODE_CHANGED_ROUND.items():
        out[n] = max(out.get(n, 0), r)
    return out


def _ordered_names() -> list[str]:
    pri = [n for n in DRIVER_PRIORITY if n in QUERIES]
    seen = set(pri)
    lg = last_green_rounds()
    changed = _changed_rounds()
    # >= not >: at round granularity a change landing in the SAME round
    # as the green may have landed after it — treat same-round as stale
    # (costs one conservative re-check; a later green clears it)
    stale = [
        n for n in QUERIES
        if n not in seen
        and n in lg
        and changed.get(n, 0) >= lg[n]
    ]
    seen |= set(stale)
    never = [n for n in QUERIES if n not in seen and n not in lg]
    seen |= set(never)
    # oldest green first, so the bounded sample rotates through the
    # registry instead of re-checking the same fresh greens each round
    green = sorted(
        (n for n in QUERIES if n not in seen), key=lambda n: (lg[n], n)
    )
    return pri + stale + never + green


def query_fns() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name].fn for name in _ordered_names()}


def oracle_sqls() -> dict[str, str]:
    return {
        name: QUERIES[name].sql
        for name in _ordered_names()
        if QUERIES[name].sql is not None
    }


def _dec(col) -> F.Column:
    """Exact money representation (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# Flagship (SURVEY §7.2): scan -> filter -> derive -> window-dedup -> join
# -> aggregate. Exercises P4/P10, W2, J1, A1-A4, F-d1 shapes in one plan.
# ---------------------------------------------------------------------------

@register(
    "flagship_corpus_rollup",
    """
    WITH filtered AS (
      SELECT * FROM lineitem WHERE l_quantity > 5
    ), dedup AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY l_orderkey, l_partkey
          ORDER BY l_shipdate DESC NULLS LAST, l_linenumber ASC
        ) AS rn FROM filtered
      ) WHERE rn = 1
    )
    SELECT year(o_orderdate) AS order_year,
           o_orderstatus,
           count(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue
    FROM dedup JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
    """,
)
def flagship_corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §7.2 minimum end-to-end slice on the shared star schema:
    lineitem scan (filter pushed to parquet) -> latest-line-per
    (order, part) dedup (W2, one shuffle) -> join orders (AQE picks
    broadcast vs sort-merge by size) -> year/status rollup (A1-A4)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 5)
    li = dedup_latest_per_key(
        li, ["l_orderkey", "l_partkey"], ["l_shipdate"], tiebreak=["l_linenumber"]
    )
    orders = load_table(spark, sf_dir, "orders")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.col("o_orderstatus"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------

@register(
    "a1_frequency_status",
    """
    SELECT o_orderstatus, count(*) AS cnt FROM orders GROUP BY 1
    """,
)
def a1_frequency_status(spark, sf_dir):
    """A1 value_counts (build_master_corpus.py:149): groupBy-count with
    map-side partial aggregation."""
    return frequency(load_table(spark, sf_dir, "orders"), "o_orderstatus")


@register(
    "a2_orders_summary",
    """
    SELECT count(*) AS total_rows,
           count(DISTINCT o_custkey) AS distinct_custkeys,
           min(o_orderdate) AS min_orderdate,
           max(o_orderdate) AS max_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_totalprice
    FROM orders
    """,
)
def a2_orders_summary(spark, sf_dir):
    """A2/A3/A5 summary block (build_master_corpus.py:145-157) as one
    aggregate row; avg computed as exact-decimal sum / count."""
    return load_table(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.countDistinct("o_custkey").alias("distinct_custkeys"),
        F.min("o_orderdate").alias("min_orderdate"),
        F.max("o_orderdate").alias("max_orderdate"),
        (F.sum(_dec("o_totalprice")).cast("double") / F.count(F.lit(1))).alias(
            "avg_totalprice"
        ),
    )


@register(
    "a4_a6_conditional_counts",
    """
    SELECT count(*) AS total_rows,
           CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished,
           CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
           CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent
    FROM orders
    """,
)
def a4_a6_conditional_counts(spark, sf_dir):
    """A4/A6 sum-of-booleans / count-if (normalize_corpus.py:302-305,
    build_corpus.py:112-117). DuckDB ``count_if`` returns HUGEINT
    (int128), which the driver gate's pandas canon coerces to
    object/float and hash-mismatches — the oracle casts every count to
    BIGINT so both engines emit int64."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
    )


@register(
    "a7_duplicate_groups",
    """
    SELECT o_orderkey, o_custkey, o_orderdate FROM (
      SELECT o_orderkey, o_custkey, o_orderdate,
             count(*) OVER (PARTITION BY o_custkey, o_orderdate) AS c
      FROM orders
    ) WHERE c > 1
    """,
)
def a7_duplicate_groups(spark, sf_dir):
    """A7 groupby-filter HAVING-count>1 (legiscan_normalizer.py:287-288)
    via a single window shuffle instead of groupBy + semi-join."""
    return duplicate_groups(
        load_table(spark, sf_dir, "orders"), ["o_custkey", "o_orderdate"]
    ).select("o_orderkey", "o_custkey", "o_orderdate")


@register(
    "a8_conflict_report",
    """
    SELECT o_custkey, o_orderdate, group_size, status_distinct, priority_distinct
    FROM (
      SELECT o_custkey, o_orderdate, count(*) AS group_size,
             count(DISTINCT o_orderstatus) AS status_distinct,
             count(DISTINCT o_orderpriority) AS priority_distinct
      FROM orders GROUP BY 1, 2
    ) WHERE group_size > 1 AND (status_distinct > 1 OR priority_distinct > 1)
    """,
)
def a8_conflict_report(spark, sf_dir):
    """A8 per-group conflict detection (legiscan_normalizer.py:296-302)."""
    rep = conflict_report(
        load_table(spark, sf_dir, "orders"),
        ["o_custkey", "o_orderdate"],
        ["o_orderstatus", "o_orderpriority"],
    )
    return rep.select(
        "o_custkey",
        "o_orderdate",
        "group_size",
        F.col("o_orderstatus_distinct").alias("status_distinct"),
        F.col("o_orderpriority_distinct").alias("priority_distinct"),
    )


# ---------------------------------------------------------------------------
# Projections / filters (SURVEY §2.2)
# ---------------------------------------------------------------------------

@register(
    "p4_filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 10
    """,
)
def p4_filter_project(spark, sf_dir):
    """P3-P5 predicate + projection. The filter and the 4-column read
    schema both reach the parquet scan (PushedFilters / ReadSchema)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.06)
            & (F.col("l_quantity") < 10)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------

@register(
    "j1_left_join",
    """
    SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """,
)
def j1_left_join(spark, sf_dir):
    """J1 left equi-join (build_corpus.py:62-64). Customer is the small
    side -> Catalyst broadcasts it; no shuffle of the fact table."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice"
    )


@register(
    "j2_dim_rollup",
    """
    SELECT r_name, count(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1
    """,
)
def j2_dim_rollup(spark, sf_dir):
    """J2 dimension lookup (build_master_corpus.py:66-67) as explicit
    broadcast joins — the 51-row dim pattern at any scale."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


@register(
    "j3_anti_join",
    """
    SELECT n_nationkey, n_name FROM nation n
    WHERE NOT EXISTS (
      SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9900
    )
    """,
)
def j3_anti_join(spark, sf_dir):
    """J3/U2 anti-join set difference — the missing-states report
    (build_master_corpus.py:153-156)."""
    n = load_table(spark, sf_dir, "nation")
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900)
        .select(F.col("c_nationkey").alias("n_nationkey"))
    )
    return anti_report(n, c, "n_nationkey").select("n_nationkey", "n_name")


@register(
    "j6_multikey_join",
    """
    SELECT year(o_orderdate) AS order_year, c_mktsegment,
           count(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS segment_value
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2
    """,
)
def j6_multikey_join(spark, sf_dir):
    """J6 — the reference's *planned* analytical join (state-year panel,
    README.md:12-16): fact x covariate on a compound key, here
    (year, segment) after an equi-join."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.year("o_orderdate").alias("order_year"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("segment_value"),
        )
    )


# ---------------------------------------------------------------------------
# Set ops (SURVEY §2.7)
# ---------------------------------------------------------------------------

@register(
    "u1_union_conform",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, o_orderstatus, CAST(NULL AS DOUBLE)
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def u1_union_conform(spark, sf_dir):
    """U1 schema-aligned union (pd.concat, build_master_corpus.py:122):
    the second input omits a contract column and is NULL-backfilled by
    unionByName(allowMissingColumns=True)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    b = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderstatus")
    return union_conform(a, b)


@register(
    "u3_distinct",
    """
    SELECT DISTINCT o_custkey, o_orderpriority FROM orders
    """,
)
def u3_distinct(spark, sf_dir):
    """U3 distinct (.unique(), legiscan_normalizer.py:293)."""
    return load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority").distinct()


# ---------------------------------------------------------------------------
# Windows / dedup (SURVEY §2.5) + sorts/top-k (§2.6)
# ---------------------------------------------------------------------------

#: explicit priority ladder replacing the reference's lexicographic accident
PRIORITY_ORDER = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "w1_dedup_priority",
    """
    SELECT o_custkey, o_orderkey, o_orderpriority FROM (
      SELECT o_custkey, o_orderkey, o_orderpriority, row_number() OVER (
        PARTITION BY o_custkey
        ORDER BY CASE o_orderpriority
                   WHEN '1-URGENT' THEN 0 WHEN '2-HIGH' THEN 1
                   WHEN '3-MEDIUM' THEN 2 WHEN '4-NOT SPECIFIED' THEN 3
                   WHEN '5-LOW' THEN 4 ELSE 5 END ASC,
                 o_orderkey ASC
      ) AS rn FROM orders
    ) WHERE rn = 1
    """,
)
def w1_dedup_priority(spark, sf_dir):
    """W1 keep-first-per-key with *explicit* priority order
    (build_master_corpus.py:137-139; the reference relied on
    lexicographic ordering of method labels)."""
    return dedup_priority(
        load_table(spark, sf_dir, "orders"),
        "o_custkey",
        "o_orderpriority",
        PRIORITY_ORDER,
        tiebreak=["o_orderkey"],
    ).select("o_custkey", "o_orderkey", "o_orderpriority")


@register(
    "w2_latest_per_key",
    """
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC NULLS LAST, o_orderkey ASC
      ) AS rn FROM orders
    ) WHERE rn = 1
    """,
)
def w2_latest_per_key(spark, sf_dir):
    """W2 latest-per-key (legiscan_normalizer.py:314-321)."""
    return dedup_latest_per_key(
        load_table(spark, sf_dir, "orders"),
        "o_custkey",
        ["o_orderdate"],
        tiebreak=["o_orderkey"],
    ).select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")


@register(
    "w5_flag_both_sources",
    """
    SELECT o_orderkey, o_custkey,
           CASE WHEN count(DISTINCT o_orderstatus)
                     OVER (PARTITION BY o_custkey, o_orderdate) > 1
                THEN 'Both_Manual_and_API' ELSE o_orderstatus END AS collection_method
    FROM orders
    """,
)
def w5_flag_both_sources(spark, sf_dir):
    """W5 both-sources provenance flag (build_master_corpus.py:127-135):
    o_orderstatus stands in for the collection-method column; keys with
    >1 distinct method get the merged label before dedup."""
    from dissertation_data_pipeline_spark.operators import flag_both_sources

    o = load_table(spark, sf_dir, "orders")
    flagged = flag_both_sources(
        o, ["o_custkey", "o_orderdate"], method_col="o_orderstatus",
    )
    return flagged.select(
        "o_orderkey", "o_custkey", F.col("o_orderstatus").alias("collection_method")
    )


@register(
    "a9_coalesce_fill",
    """
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderdate,
             o_orderkey % 2 AS version,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderpriority END AS pri,
             CASE WHEN o_orderkey % 4 = 0 THEN NULL ELSE o_totalprice END AS price
      FROM orders
    ), scored AS (
      SELECT *,
             (CASE WHEN pri IS NOT NULL AND trim(pri) <> '' THEN 1 ELSE 0 END
              + CASE WHEN price IS NOT NULL THEN 1 ELSE 0 END) AS comp
      FROM base
    ), ranked AS (
      SELECT *, row_number() OVER w AS rn,
             first_value(CASE WHEN pri IS NOT NULL AND trim(pri) <> '' THEN pri END IGNORE NULLS) OVER wf AS pri_f,
             first_value(price IGNORE NULLS) OVER wf AS price_f
      FROM scored
      WINDOW w AS (PARTITION BY o_custkey, o_orderdate
                   ORDER BY version DESC NULLS LAST, comp DESC, o_orderkey ASC),
             wf AS (PARTITION BY o_custkey, o_orderdate
                    ORDER BY version DESC NULLS LAST, comp DESC, o_orderkey ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    )
    SELECT o_orderkey, o_custkey, o_orderdate,
           pri_f AS o_orderpriority, price_f AS o_totalprice
    FROM ranked WHERE rn = 1
    """,
)
def a9_coalesce_fill(spark, sf_dir):
    """A9 group-merge with coalesce-fill (legiscan_normalizer.py:306-331):
    per duplicate group pick the best row (version desc, completeness
    desc, explicit tiebreak) and fill its missing fields from the other
    rows in the same deterministic order. Missingness is synthesized
    with NULLs keyed on o_orderkey."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        (F.col("o_orderkey") % 2).alias("version"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
        F.when(F.col("o_orderkey") % 4 == 0, F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    merged = merge_duplicates_coalesce_fill(
        o,
        ["o_custkey", "o_orderdate"],
        order_date_col="version",
        fill_cols=["o_orderpriority", "o_totalprice"],
        tiebreak=["o_orderkey"],
    )
    return merged.select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice"
    )


@register(
    "o2_top_k_frequency",
    """
    SELECT c_mktsegment, cnt FROM (
      SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY 1
    ) ORDER BY cnt DESC, c_mktsegment LIMIT 3
    """,
)
def o2_top_k_frequency(spark, sf_dir):
    """O2 top-k frequency (build_corpus.py:122) — TakeOrdered, no global
    sort."""
    return top_k_frequency(load_table(spark, sf_dir, "customer"), "c_mktsegment", 3)


# -- sibling query modules register themselves on import (kept at the
# bottom: they import `register` from this module) ---------------------------
from dissertation_data_pipeline_spark.plans import queries_scalar  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_dedup  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_similarity  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_textanalysis  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_streaming  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_misc  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_tpch  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_coverage  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_coverage2  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_training  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_multimodal  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_skew  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_temporal  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_tpch2  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_tpch3  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_analytics  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_wave3  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_features  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_timeseries  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_wave4  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_wave5  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_wave6  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_wave8  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_wave9  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_fixtures  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_state  # noqa: E402,F401
from dissertation_data_pipeline_spark.plans import queries_coverage3  # noqa: E402,F401

# Gate-coverage policy for ROUND 9 (see DRIVER_PRIORITY docstring).
# Cumulative driver-green after r8: all 239 then-registered queries.
# The 7 newcomers lead (fixed-block twins + the four recall rows),
# then the three refactored-oracle corpus rows and the dedup family
# the epsilon-slack prefilter touched; the ~90 queries the new
# dep-closure fingerprints restamped (engine modules dedup_ext/
# similarity changed this round) follow mechanically via
# _changed_rounds and rotate across rounds 9-10 under the budget.
set_driver_priority(
    [
        # new this round: fixed-block oracle twins for the three
        # remaining naive-oracle families (r8 verdict #3)...
        "ext_blocked_jaccard_block_pairs",
        "ext_semantic_dedup_block",
        "ext_entity_resolution_block",
        # ...and the measured-recall rows for SimHash and embedding
        # near-dup, derived-cutoff + legacy-lever pairs (r8 verdict #4)
        "ext_simhash_pair_recall",
        "ext_simhash_pair_recall_h3",
        "ext_embedding_near_dup_recall",
        "ext_embedding_near_dup_recall_single",
        # ...and the registered approx-percentile sketch path
        "ext_approx_percentiles",
        # changed this round (oracle refactors + epsilon-slack size
        # prefilter; also in CODE_CHANGED_ROUND, listed to pin order)
        "ext_entity_resolution",
        "ext_semantic_dedup",
        "ext_blocked_jaccard_pairs",
        "ext_minhash_lsh_pairs",
        "ext_dedup_incremental",
        "ext_simhash_pairs",
        "ext_near_dup_components",
    ]
)
