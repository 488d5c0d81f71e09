"""Wave-3 semantics: chunk-level boilerplate removal, unigram-frequency
quality, integer PageRank, equi-depth histogram, per-group OLS, Z-order
layout (real parquet-footer skipping)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators.graphs import pagerank_int
from dissertation_data_pipeline_spark.plans.queries_wave3 import zorder_value
from dissertation_data_pipeline_spark.sources.layout import (
    file_minmax_stats,
    skipped_fraction,
    write_zordered,
)


# ---------------------------------------------------------------- chunk dedup
def test_chunk_dedup_removes_cross_doc_chunks_only(spark, sf_dir):
    from dissertation_data_pipeline_spark.plans.registry import QUERIES

    rows = {
        r["doc_id"]: r
        for r in QUERIES["ext_chunk_dedup_clean"]
        .fn(spark, sf_dir)
        .collect()
    }
    # every doc fully accounted for; cleaned text length consistent
    for r in rows.values():
        assert 0 <= r["n_kept"] <= r["n_chunks"]
        if r["n_kept"] == 0:
            assert r["cleaned"] == ""
        else:
            # kept chunks reassemble to at most the original token count
            assert len(r["cleaned"].split(" ")) <= r["n_chunks"] * 8


def test_chunk_dedup_tiny_corpus(spark):
    # doc 1 and 2 share their first 8 tokens exactly; doc 3 is unique
    shared = "a b c d e f g h"
    df = spark.createDataFrame(
        [
            (1, shared + " u1 u2 u3 u4 u5 u6 u7 u8"),
            (2, shared + " v1 v2 v3 v4 v5 v6 v7 v8"),
            (3, "w1 w2 w3 w4 w5 w6 w7 w8"),
        ],
        "doc_id long, text string",
    )
    toks = F.split(F.col("text"), " ")
    n = F.ceil(F.size(toks) / F.lit(8.0)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(toks, i * 8 + 1, 8), " "),
    )
    ch = df.select("doc_id", F.posexplode(chunks).alias("pos", "chunk"))
    freq = ch.groupBy("chunk").agg(F.countDistinct("doc_id").alias("nd"))
    kept = (
        ch.join(freq, "chunk")
        .filter(F.col("nd") == 1)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    got = {r["doc_id"]: r["n_kept"] for r in kept.collect()}
    assert got == {1: 1, 2: 1, 3: 1}  # each doc keeps only its unique chunk


# ------------------------------------------------------------------ pagerank
def _ranks(spark, edges_rows, **kw):
    edges = spark.createDataFrame(edges_rows, "src string, dst string, w long")
    return {
        r["node"]: r["r"] for r in pagerank_int(edges, **kw).collect()
    }


def test_pagerank_symmetric_two_cycle_is_uniform(spark):
    r = _ranks(spark, [("a", "b", 1), ("b", "a", 1)])
    assert r["a"] == r["b"]


def test_pagerank_star_ranks_cycle_nodes_over_leaves(spark):
    # hub<->l1 form the recurrent core; l2/l3 only ever emit. A fixed
    # iteration count oscillates BETWEEN hub and l1 (the 2-cycle is
    # periodic), so assert the period-stable facts: both core nodes
    # outrank the pure leaves, and symmetric leaves tie bit-exactly.
    r = _ranks(
        spark,
        [("l1", "hub", 1), ("l2", "hub", 1), ("l3", "hub", 1), ("hub", "l1", 1)],
    )
    assert r["hub"] > r["l2"]
    assert r["l1"] > r["l2"]
    assert r["l2"] == r["l3"]  # symmetric leaves tie exactly (integer math)


def test_pagerank_partitioning_invariant(spark):
    rows = [
        ("a", "b", 3), ("b", "c", 2), ("c", "a", 5),
        ("a", "c", 1), ("c", "b", 2),
    ]
    edges = spark.createDataFrame(rows, "src string, dst string, w long")
    r1 = {r["node"]: r["r"] for r in pagerank_int(edges).collect()}
    r2 = {
        r["node"]: r["r"]
        for r in pagerank_int(edges.repartition(7, "dst")).collect()
    }
    assert r1 == r2  # bit-identical under any partitioning


def test_pagerank_mass_is_bounded(spark):
    # floor divisions only LOSE mass: total <= scale, and not by much
    r = _ranks(spark, [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)])
    total = sum(r.values())
    assert total <= 1_000_000_000
    assert total > 900_000_000


# ------------------------------------------------------------------- linreg
def test_linreg_recovers_perfect_line(spark):
    # y = 700x + 300 (cents), three groups' worth of x values
    rows = [("t", x, 700 * x + 300) for x in range(0, 50)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    m = df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    row = m.select(
        (num / den).alias("slope"),
        (
            (F.col("sy").cast("double") - num / den * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("icept"),
    ).collect()[0]
    assert row["slope"] == pytest.approx(700.0, abs=1e-9)
    assert row["icept"] == pytest.approx(300.0, abs=1e-6)


def test_linreg_query_r2_in_unit_interval(spark, sf_dir):
    from dissertation_data_pipeline_spark.plans.registry import QUERIES

    for r in QUERIES["ext_group_linreg"].fn(spark, sf_dir).collect():
        assert 0.0 <= r["r2"] <= 1.0


# -------------------------------------------------------- equi-depth buckets
def test_equidepth_buckets_are_balanced(spark, sf_dir):
    from dissertation_data_pipeline_spark.plans.registry import QUERIES

    rows = QUERIES["ext_histogram_equidepth"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    counts = {r["bucket"]: r["n"] for r in rows}
    n = sum(counts.values())
    # exact order-statistic boundaries: every bucket within 2 of n/10
    # unless ties force spill (synthetic prices are near-unique)
    for b in range(10):
        assert abs(counts[b] - n / 10) <= max(2, 0.02 * n)
    # buckets tile the value range in order
    ordered = [r for _, r in sorted((r["bucket"], r) for r in rows)]
    for lo_r, hi_r in zip(ordered, ordered[1:]):
        assert lo_r["hi_cents"] <= hi_r["lo_cents"]


# ------------------------------------------------------------------- z-order
def test_zorder_value_interleaves_bits(spark):
    df = spark.range(1).select(
        zorder_value(F.lit(0b1010), F.lit(0b0110), 4).alias("z")
    )
    # a bits -> odd positions, b bits -> even: a=1010, b=0110
    # z = b0*1 + a0*2 + b1*4 + a1*8 + ... = interleave(a,b)
    a, b = 0b1010, 0b0110
    expect = sum(((a >> i) & 1) << (2 * i + 1) for i in range(4)) | sum(
        ((b >> i) & 1) << (2 * i) for i in range(4)
    )
    assert df.collect()[0]["z"] == expect


def test_zorder_layout_skips_files_in_both_dims(spark, tmp_path):
    # 64x64 grid of (a, b) keys, one row each — worst case for 1-D sort
    grid = (
        spark.range(64 * 64)
        .select(
            (F.col("id") % 64).alias("a"),
            (F.col("id") / 64).cast("long").alias("b"),
            F.col("id").alias("payload"),
        )
    )
    zpath = str(tmp_path / "zorder")
    apath = str(tmp_path / "asort")
    write_zordered(grid, zpath, "a", "b", bits=6, n_files=16)
    (
        grid.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(apath)
    )
    zstats = file_minmax_stats(zpath, ["a", "b"])
    astats = file_minmax_stats(apath, ["a", "b"])
    assert len(zstats) == 16
    # filter on a: both layouts skip
    assert skipped_fraction(zstats, "a", 0, 7) >= 0.5
    assert skipped_fraction(astats, "a", 0, 7) >= 0.5
    # filter on b: ONLY the z-order layout skips — the point of the curve
    z_b = skipped_fraction(zstats, "b", 0, 7)
    a_b = skipped_fraction(astats, "b", 0, 7)
    assert z_b >= 0.5
    assert a_b == 0.0


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from dissertation_data_pipeline_spark.sources.layout import compact_parquet

    p = str(tmp_path / "frag")
    spark.range(50_000).selectExpr(
        "id", "id % 97 AS k", "repeat('x', 64) AS pad"
    ).repartition(64).write.parquet(p)
    import glob

    assert len(glob.glob(p + "/*.parquet")) == 64
    before = spark.read.parquet(p).orderBy("id").collect()

    n = compact_parquet(spark, p, target_bytes=16 * 1024 * 1024)
    files = glob.glob(p + "/*.parquet")
    assert len(files) == n and n < 8  # tiny table -> a handful of files
    after = spark.read.parquet(p).orderBy("id").collect()
    assert after == before  # byte-identical contents

    # sorted compaction restores clustering: per-file key ranges disjoint
    from dissertation_data_pipeline_spark.sources.layout import (
        file_minmax_stats,
    )

    compact_parquet(spark, p, target_bytes=4 * 1024 * 1024, sort_cols=["k"])
    stats = sorted(
        file_minmax_stats(p, ["k"]), key=lambda s: (s["k_min"], s["k_max"])
    )
    for lo, hi in zip(stats, stats[1:]):
        assert lo["k_max"] <= hi["k_min"]
