"""[EXT] Mergeable set sketches: bottom-k corpus-overlap estimation.

A training-data pipeline constantly asks "how much does source A
overlap source B?" (e.g. CommonCrawl snapshot vs a curated corpus)
without being able to afford the exact pairwise shingle intersection.
The classic answer is a **bottom-k sketch** (Cohen & Kaplan 2007;
Broder 1997's single-permutation MinHash): keep the k smallest hash
values of each set; for any two sets, the k smallest of the sketch
union form a uniform sample of the union, and the fraction of that
sample present in both sketches is an unbiased Jaccard estimate with
error O(1/sqrt(k)).

Because the shingle hash here is md5-derived (no RNG), the sketch —
and therefore the *estimate itself* — is a deterministic function of
the corpus, reproducible bit-for-bit by any engine (the DuckDB oracle
recomputes it exactly; this is the same determinism discipline as the
MinHash/SimHash operators in ``dedup_ext``).

Scale (100 TB): sketch construction is a distinct + per-group top-k —
two map-side-combinable aggregations; each group reduces to k int64s
(k=64 -> 512 bytes). The pairwise stage then runs over |groups| rows,
not |documents|: comparing every pair of 10,000 sources is 5*10^7
cheap array ops on one executor, where the exact computation would be
a petabyte shuffle. This "reduce to sketches, go quadratic only on
sketches" shape is the entire point of the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators import dedup_ext as dx


def bottomk_sketches(
    df: DataFrame,
    group_col: str,
    text_col: str,
    *,
    id_col: str,
    k: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-group bottom-k sketch over word-``shingle_n``-gram shingles.

    Returns ``(group_col, sketch: array<long> ascending, n_distinct)``
    where ``sketch`` holds the k smallest distinct md5-derived shingle
    hashes seen across every document of the group and ``n_distinct``
    the group's exact distinct-shingle count (free at this reduction).

    Plan: shingle postings (explode, distinct per doc) -> distinct
    ``(group, hash)`` -> per-group ascending ``row_number`` <= k ->
    ``collect_list`` under the same window partitioning. Two shuffles
    total, both on keys that shrink monotonically.
    """
    postings = dx.shingle_postings(
        df, id_col, text_col, n=shingle_n, carry_cols=(group_col,)
    )
    hashes = postings.select(
        F.col(group_col), dx.shingle_hash(F.col("_shingle")).alias("_h")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("_h")
    return (
        hashes.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(group_col)))
        .filter(F.col("_rn") <= k)
        .groupBy(group_col)
        .agg(
            F.sort_array(F.collect_list("_h")).alias("sketch"),
            F.max("_n").cast("long").alias("n_distinct"),
        )
    )


def sketch_overlap_pairs(sketches: DataFrame, group_col: str, *, k: int = 64) -> DataFrame:
    """Estimated Jaccard for every group pair from bottom-k sketches.

    For sketches S_a, S_b: let B = the ``min(k, |S_a ∪ S_b|)`` smallest
    values of ``S_a ∪ S_b`` (itself a valid bottom-k sketch of the
    union — sketches are mergeable); the estimate is
    ``|B ∩ S_a ∩ S_b| / |B|``. Pure array expressions over one
    self-join on ``group < group`` — quadratic only in group count.

    The sketch frame is checkpointed first: both join legs consume it,
    and an uncheckpointed plan re-runs the whole corpus reduction per
    leg (measured 2x — the same double-evaluation trap as the SimHash
    pair expansion in ``dedup_ext.simhash_pairs``).
    """
    sketches = sketches.localCheckpoint()
    a = sketches.select(
        F.col(group_col).alias("g_a"),
        F.col("sketch").alias("_sa"),
        F.col("n_distinct").alias("n_a"),
    )
    b = sketches.select(
        F.col(group_col).alias("g_b"),
        F.col("sketch").alias("_sb"),
        F.col("n_distinct").alias("n_b"),
    )
    merged = F.slice(F.array_sort(F.array_union("_sa", "_sb")), 1, k)
    inter = F.array_intersect("_sa", "_sb")
    hits = F.size(F.array_intersect(merged, inter))
    return (
        a.join(b, F.col("g_a") < F.col("g_b"))
        .select(
            "g_a",
            "g_b",
            "n_a",
            "n_b",
            hits.cast("long").alias("n_shared_in_sample"),
            F.size(merged).cast("long").alias("sample_size"),
            F.round(hits.cast("double") / F.size(merged), 6).alias("jaccard_est"),
        )
    )


def count_min_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    *,
    depth: int = 4,
    width: int = 256,
    top_k: int = 10,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over the corpus
    token stream, evaluated on its heavy hitters: build the depth x
    width counter matrix with md5-derived bucket functions, then report
    each true top-``top_k`` token's exact count beside its CMS
    estimate (the min over rows).  The CMS one-sided guarantee —
    estimate >= truth, over-count bounded by colliding mass — becomes
    CHECKABLE output rather than a docstring claim.

    Determinism: bucket ``d`` of a token is the first two hex digits
    of ``md5(d || ':' || token)`` (0..255) — no RNG, identical in any
    engine, so the sketch and therefore every estimate is a pure
    function of the corpus (same discipline as the bottom-k sketches
    above).

    Scale (100 TB): the sketch is ``depth`` map-side-combinable
    aggregations over the token long form, reducing the corpus to
    depth*width int64 counters — mergeable across partitions, days, or
    clusters by cell-wise addition, which is why CMS is the streaming
    heavy-hitter structure. The probe stage joins ``top_k * depth``
    rows against those counters: nothing here scales with corpus size
    except the two aggregation passes.

    Output: (token, true_cnt, est_cnt), est_cnt >= true_cnt always.
    ``width`` must be 256 (two hex digits) — widening means taking
    more digits in BOTH engines' bucket expressions.
    """
    if width != 256:
        # hard error, not assert: under ``python -O`` an assert is
        # stripped and a non-256 width would silently hash md5 buckets
        # that disagree with the 2-hex-digit oracle expression
        raise ValueError(
            "bucket fn reads 2 hex digits; width is fixed at 256"
        )
    toks = (
        df.select(F.explode(dx.tokens(text_col)).alias("tok"))
        .filter(F.length("tok") > 0)
    )
    true_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_cnt"))
    top = true_counts.orderBy(F.desc("true_cnt"), F.asc("tok")).limit(top_k)

    def bucket(d: int, tok) -> F.Column:
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{d}:"), tok)), 1, 2), 16, 10
        ).cast("int")

    posts = toks.select(
        "tok",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        bucket(d, F.col("tok")).alias("b"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("_db"),
    ).select("tok", "_db.d", "_db.b")
    cms = posts.groupBy("d", "b").agg(F.count(F.lit(1)).alias("cnt"))
    probes = top.select(
        "tok",
        "true_cnt",
        *[bucket(d, F.col("tok")).alias(f"_b{d}") for d in range(depth)],
    )
    probe_cells = probes.select(
        "tok",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), F.col(f"_b{d}").alias("b")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("_db"),
    ).select("tok", "true_cnt", "_db.d", "_db.b")
    return (
        probe_cells.join(F.broadcast(cms), ["d", "b"])
        .groupBy("tok", "true_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
        .select("tok", "true_cnt", "est_cnt")
    )
