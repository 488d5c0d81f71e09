"""Empty-input robustness: every operator family must survive
zero-row tables (at 100 TB, empty partitions/days/sources are routine
— an operator that throws on empty input kills the whole job)."""

from __future__ import annotations

import pytest

from dissertation_data_pipeline_spark.plans import QUERIES
from dissertation_data_pipeline_spark.tables import TABLE_NAMES, load_table

#: one representative per wave (keep the matrix cheap: each runs a
#: full plan against 10 empty tables)
REPRESENTATIVES = [
    "flagship_corpus_rollup",
    "a2_orders_summary",
    "w1_dedup_priority",
    "tpch_q1_pricing_summary",
    "ext_dedup_exact",
    "ext_minhash_lsh_pairs",
    "ext_simhash_pairs",
    "ext_near_dup_components",
    "ext_ann_ivf_topk",
    "ext_langid",
    "ext_pack_sequences",
    "ext_asof_join",
    "ext_time_rollup",
    "ext_bm25_rank",
    "ext_tfidf_top_terms",
    "ext_dq_checks",
    "ext_funnel_stages",
    "ext_triangle_count",
    "ext_sessionize_batch",
    "ext_snapshot_diff",
    "ext_rule_classifier",
    "ext_multimodal_audio",
    "ext_chunk_dedup_clean",
    "ext_token_freq_quality",
    "ext_pagerank_transitions",
    "ext_histogram_equidepth",
    "ext_group_linreg",
    "ext_zorder_values",
    # round 3
    "ext_capped_jaccard_pairs",
    "ext_stop_shingle_report",
    "ext_ccnet_buckets",
    "ext_rolling_features",
]


@pytest.fixture(scope="module")
def spark():
    from dissertation_data_pipeline_spark.session import get_spark

    return get_spark()


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for name in TABLE_NAMES:
        schema = load_table(spark, "/root/testdata/sf0.001", name).schema
        spark.createDataFrame([], schema).write.parquet(f"{d}/{name}.parquet")
    return d


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    n = QUERIES[name].fn(spark, empty_sf_dir).count()
    # aggregates-without-groups legitimately emit one (empty/zero) row;
    # funnels emit one row per stage; everything else emits none
    assert n >= 0
