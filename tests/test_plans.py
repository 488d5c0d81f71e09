"""Physical-plan assertions — the scale contract, enforced.

Correctness says the operators compute the right answer; these tests
pin the *plan shapes* that make them viable at 100 TB:

- filters and column projections must reach the parquet scan
  (PushedFilters / ReadSchema) — a scan that reads every column for a
  two-column projection is wrong at any scale;
- dimension joins must broadcast (no shuffle of the fact side's keys);
- pair-join operators must spread work via a repartition exchange, not
  probe a broadcast on one partition.

`explain`-string matching is version-sensitive by nature; assertions
target long-stable markers (PushedFilters, ReadSchema,
BroadcastHashJoin, Exchange hashpartitioning).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.plans import QUERIES
from dissertation_data_pipeline_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def plan_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def spark():
    from dissertation_data_pipeline_spark.session import get_spark

    return get_spark()


def test_filter_pushes_to_parquet_scan(spark):
    df = QUERIES["p4_filter_project"].fn(spark, SF_DIR)
    plan = plan_str(df)
    assert "PushedFilters:" in plan
    # the quantity/length-style predicate must appear in the scan node,
    # not only in a post-scan Filter
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), f"no pushed filters in scan:\n{plan}"


def test_projection_prunes_scan_schema(spark):
    o = load_table(spark, SF_DIR, "orders")
    df = o.select("o_orderkey", "o_orderstatus")
    plan = plan_str(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert read_cols == {"o_orderkey", "o_orderstatus"}, read_cols


def test_flagship_pushes_quantity_filter(spark):
    df = QUERIES["flagship_corpus_rollup"].fn(spark, SF_DIR)
    plan = plan_str(df)
    assert "GreaterThan(l_quantity,5" in plan, "l_quantity>5 not pushed to scan"


def test_dim_join_broadcasts(spark):
    df = QUERIES["j2_dim_rollup"].fn(spark, SF_DIR)
    plan = plan_str(df)
    assert "BroadcastHashJoin" in plan, f"dim join did not broadcast:\n{plan}"
    # and the dim side, not the fact side, is the broadcast exchange
    assert "BroadcastExchange" in plan


def test_tpch_q5_broadcasts_small_dims(spark):
    df = QUERIES["tpch_q5_region_volume"].fn(spark, SF_DIR)
    plan = plan_str(df)
    assert "BroadcastHashJoin" in plan


def test_tpch_q8_snowflake_broadcasts_every_dim(spark):
    """Q8 joins 8 relations; all six dimension sides (part, customer,
    nation x2, region-pruned nations, supplier) must broadcast so the
    only shuffle join is lineitem-orders — at 100 TB that plan touches
    the two fact tables exactly once each."""
    df = QUERIES["tpch_q8_market_share"].fn(spark, SF_DIR)
    plan = plan_str(df)
    n_bhj = plan.count("BroadcastHashJoin")
    assert n_bhj >= 5, f"expected >=5 broadcast joins in Q8, got {n_bhj}"
    n_smj = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    assert n_smj <= 1, (
        f"Q8 should shuffle-join at most once (lineitem-orders), got {n_smj}"
    )


def test_tpch_q16_excludes_suppliers_without_shuffle(spark):
    """The NOT-IN supplier exclusion must plan as a broadcast anti-join,
    not a shuffled one — the exclusion list is dim-sized."""
    df = QUERIES["tpch_q16_part_supplier_variety"].fn(spark, SF_DIR)
    plan = plan_str(df)
    assert re.search(r"BroadcastHashJoin .*LeftAnti", plan), (
        "broadcast anti-join missing:\n" + plan[:2000]
    )


def test_pair_join_repartitions_by_bucket(spark):
    """LSH candidate generation must shuffle by band bucket — the skew
    and parallelism strategy — rather than broadcast-probe one side."""
    df = QUERIES["ext_minhash_lsh_pairs"].fn(spark, SF_DIR)
    plan = plan_str(df)
    assert re.search(r"hashpartitioning\([^)]*band", plan), (
        "band-bucket repartition missing:\n" + plan[:2000]
    )


def test_whole_stage_codegen_covers_flagship(spark):
    df = QUERIES["flagship_corpus_rollup"].fn(spark, SF_DIR)
    df.collect()  # AQE finalizes (and codegen-compiles) only on execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen spans render as `*(N)` stage markers in the final AQE plan
    assert "*(" in plan, (
        "no whole-stage codegen span in flagship plan:\n" + plan[:2000]
    )


def test_no_cartesian_products_in_registry(spark):
    """No registry query may plan a cartesian/broadcast nested-loop join
    (the `id_a < id_b` self-joins must ride an equi-join on bucket
    keys).

    Exceptions — plans where a BroadcastNestedLoopJoin with a tiny
    broadcast side IS the correct distributed shape:
    - ``ext_ann_brute_topk``: the (small, filtered) query set broadcast
      against the streamed corpus; the scale path is the bucketed
      variants (LSH/IVF), which join on equi-keys.
    - ``ext_ann_ivf_topk``: the n_cells-row centroid table broadcast
      for the assignment pass (every IVF implementation scores each
      vector against every coarse centroid — that IS the operator);
      the probe pass itself joins equi on cell_id.
    - ``ext_key_skew_report``: a single-row totals frame broadcast to
      attach corpus-level denominators.
    - ``tpch_q22_idle_customers``: the global (cnt, sum) 1-row
      aggregate broadcast to every customer partition — the exact
      above-average predicate needs the corpus denominator rowside.
    - ``ext_tfidf_top_terms`` / ``ext_bm25_rank``: the 1-row corpus
      scalars (N, avgdl) broadcast onto the scored postings.
    - ``ext_dq_checks``: the 1-row total-rows aggregate broadcast onto
      the (1-row) FK violation count.
    - ``ext_histogram_equiwidth``: the 1-row global (min, max) aggregate
      broadcast onto the scan so bin assignment stays a codegen
      expression.
    - ``ext_histogram_equidepth``: the 1-row total count, the 9-row
      decile index frame, and the 1-row boundary array all broadcast
      onto bounded frames — binning stays codegen, no global row sort."""
    allowed = {
        "ext_ann_brute_topk",
        "ext_ann_ivf_topk",
        "ext_ann_ivf_trained_topk",  # same centroid broadcast as ivf_topk
        "ext_ann_ivf_partitioned_topk",  # same packed 1-row centroid
        # broadcast, probe-side (corpus side is the pruned layout scan)
        "ext_key_skew_report",
        "tpch_q22_idle_customers",
        "tpch_q11_important_stock",  # 1-row national stock total broadcast
        # for the exact share-of-total threshold (same class as q22)
        "ext_tfidf_top_terms",
        "ext_bm25_rank",
        "ext_dq_checks",
        "ext_histogram_equiwidth",
        "ext_histogram_equidepth",
        "ext_negative_sampling",  # 1-row corpus-count broadcast
        "ext_time_gap_fill",  # 1-row hour-bounds broadcast onto the grid
        "ext_ann_pq_codes",  # packed 1-row codebook broadcast for the
        # map-side argmin encode (same class as ivf_topk's centroids)
        "ext_ann_pq_adc_topk",  # 128-row codebook broadcast: every query
        # scores every codebook entry to build its lookup table — that
        # IS the PQ-ADC operator (same class as the IVF centroid pass)
        "ext_ann_pq_rerank",  # same codebook broadcast (shortlist stage
        # reuses pq_adc_scores); the re-rank stage joins equi on ids
        "ext_ann_recall_at_10",  # composes the two allowed legs it
        # evaluates: brute (query-set broadcast) and IVF (centroid
        # broadcast); the recall join itself is equi on (query, vec)
        "ext_temperature_mixture",  # 1-row (total, sqrt-mass) aggregate
        # broadcast onto the per-language counts (same class as q22)
        "ext_ann_ivfpq_rerank",  # composes BOTH allowed classes: the
        # packed 1-row coarse-centroid broadcast (corpus + query
        # assignment, as ivf_topk) and the 128-row codebook broadcast
        # (lookup tables, as pq_adc_topk); the pruned ADC join itself
        # is equi on (cell_id, subspace, code)
        "ext_bigram_lm_score",  # 1-row vocabulary-size broadcast: the
        # smoothing denominator attaches to every scored bigram
        "ext_ccnet_buckets",  # composes the bigram LM scorer, so it
        # inherits the same 1-row vocabulary broadcast
        "ext_pmi_collocations",  # 1-row (T1, T2) corpus totals broadcast
        # onto the scored bigrams (same class as bm25/tfidf)
        "ext_source_overlap_sketch",  # the |groups|-row sketch table
        # self-paired on group < group: quadratic ONLY on 512-byte
        # sketches, never on documents — that reduction IS the operator
    }
    offenders = {}
    for name, q in QUERIES.items():
        if name in allowed:
            continue
        df = q.fn(spark, SF_DIR)
        plan = plan_str(df)
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            offenders[name] = True
    assert not offenders, f"cartesian/nested-loop joins in: {sorted(offenders)}"


def test_chunking_is_scan_shaped(spark):
    # chunk extraction must stay shuffle-free: generate + filter +
    # project over the scan, no Exchange anywhere
    df = QUERIES["ext_chunk_documents"].fn(spark, SF_DIR)
    plan = plan_str(df)
    assert "Exchange" not in plan, plan
    assert "Generate" in plan


def test_dup_ngram_fraction_has_no_pair_join(spark):
    # the dup-signal query is aggregate-shaped: document frequency +
    # re-aggregate. Any cartesian/nested-loop node means a pairwise
    # plan snuck in.
    df = QUERIES["ext_dup_ngram_fraction"].fn(spark, SF_DIR)
    plan = plan_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_shuffle_budget():
    """Every registry query must plan at most 6 shuffle Exchanges.

    The shuffle count IS the 100 TB cost model: the whole registry
    currently planes at <= 5 (see PLAN_STATS.md); this cap catches any
    future query or refactor that silently adds a pass over the data.
    Iterative operators cut lineage per round (localCheckpoint), so
    their returned plan reflects the steady-state round, which is the
    number that matters at scale anyway."""
    import sys

    sys.path.insert(0, "tools")
    from plan_stats import SF_DIR as PS_SF  # noqa: F401
    from plan_stats import count_exchanges, plan_text

    from dissertation_data_pipeline_spark.plans.registry import QUERIES
    from dissertation_data_pipeline_spark.session import get_spark

    spark = get_spark()
    over = {}
    for name, q in QUERIES.items():
        s, _ = count_exchanges(plan_text(q.fn(spark, SF_DIR)))
        if s > 6:
            over[name] = s
    assert not over, f"shuffle budget exceeded: {over}"


def test_runtime_bloom_filter_injects(spark):
    """Runtime row-level filtering (the 100 TB shuffle-saver): a
    selective filtered side must inject a bloom filter into the fact
    scan so non-joining rows die before the shuffle. Size thresholds
    gate it to big scans in production; lowered here to demonstrate the
    plan shape on local data."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        # force a shuffle join; with a broadcast join Spark prunes via
        # the broadcast itself and needs no bloom filter
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, SF_DIR, "lineitem")
        o = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_orderstatus") == "F"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert "bloom_filter_agg" in plan_str(j).lower()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_pin_spread_ab_toggle_same_results(spark):
    """spark.graft.unpinnedAB=true must change only the physical spread
    (A/B attribution for the bench), never the rows."""
    from dissertation_data_pipeline_spark.plans.registry import QUERIES

    fn = QUERIES["ext_minhash_lsh_pairs"].fn
    sf = "/root/testdata/sf0.001"
    try:
        spark.conf.set("spark.graft.unpinnedAB", "false")
        pinned = {tuple(r) for r in fn(spark, sf).collect()}
        spark.conf.set("spark.graft.unpinnedAB", "true")
        unpinned = {tuple(r) for r in fn(spark, sf).collect()}
    finally:
        spark.conf.set("spark.graft.unpinnedAB", "false")
    assert pinned == unpinned


def test_pin_spread_unpinned_identity_without_cols(spark):
    from dissertation_data_pipeline_spark.session import pin_spread

    df = spark.range(10)
    try:
        spark.conf.set("spark.graft.unpinnedAB", "true")
        assert pin_spread(df) is df  # pure round-robin spread -> no-op
    finally:
        spark.conf.set("spark.graft.unpinnedAB", "false")
    out = pin_spread(df)
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert out.rdd.getNumPartitions() == n
