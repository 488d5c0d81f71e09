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

from pyspark.sql import DataFrame
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

    Plan: shingle postings (explode, distinct per doc) -> per-(group,
    hash-shard) partial bottom-k + distinct count -> per-group merge.
    Bottom-k sketches are mergeable, and sharding BY THE HASH VALUE
    makes the per-shard distinct sets disjoint, so the k smallest of
    the merged per-shard bottom-ks are exactly the group's k smallest
    and the exact distinct count is the sum of shard counts.  This
    replaced a per-group ``row_number`` window: the window sorted every
    distinct hash of a group in ONE task (task count = group count —
    five tasks here no matter the core count), where the sharded
    aggregate spreads the same reduction over group x shard cells with
    map-side partial ``collect_set`` dedup before the exchange
    (measured 1.76x at sf0.1, byte-identical output).  Memory bound:
    a cell holds ~|distinct shingles| / n_shards hashes; shard count
    scales with the session's parallelism so bigger clusters bound
    cells tighter.
    """
    n_shards = max(64, df.sparkSession.sparkContext.defaultParallelism)
    postings = dx.shingle_postings(
        df, id_col, text_col, n=shingle_n, carry_cols=(group_col,)
    )
    hashes = postings.select(
        F.col(group_col), dx.shingle_hash(F.col("_shingle")).alias("_h")
    )
    lvl1 = hashes.groupBy(
        group_col, (F.col("_h") % n_shards).alias("_shard")
    ).agg(
        F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("_sk"),
        F.size(F.collect_set("_h")).cast("long").alias("_nd"),
    )
    return lvl1.groupBy(group_col).agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("_sk"))), 1, k).alias(
            "sketch"
        ),
        F.sum("_nd").alias("n_distinct"),
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


#: HLL geometry — 256 registers addressed by the first two hex digits
#: of md5(token); rho read from the NEXT 12 hex digits (48 bits), so
#: register values lie in 1..49 (49 = the all-zero tail).
_HLL_M = 256
_HLL_RHO_MAX = 49
#: alpha_m * m^2 * 2^49 pre-combined into ONE double literal so both
#: engines reach the raw estimate with a single division (no
#: intermediate multiply rounding to keep in sync):
#: 0.7213/(1+1.079/256) * 65536.0 * 562949953421312.0
_HLL_C = 2.6499581405668102e19


def _hll_rho(tail: F.Column) -> F.Column:
    """1 + count of leading zero BITS of a 12-hex-digit string, via
    integer/string ops only (no float log2 — libm rounding near
    power-of-2 boundaries is not engine-portable): 4 bits per leading
    zero hex char, plus the zero bits inside the first nonzero char.
    """
    z = F.length(F.regexp_extract(tail, r"^(0*)", 1))
    first = F.substring(tail, z + F.lit(1), F.lit(1))
    in_char = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return F.when(z == 12, F.lit(_HLL_RHO_MAX)).otherwise(
        z * 4 + in_char + 1
    )


def hll_distinct_by_group(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
) -> DataFrame:
    """HyperLogLog distinct-token estimate per group (Flajolet,
    Fusy, Gandouet & Meunier 2007), reported BESIDE the exact
    distinct count so the accuracy claim (±1.04/sqrt(256) ≈ 6.5%
    typical) is gate-checked output, not prose.

    Register j (0..255) of a token is the first two hex digits of
    ``md5(token)``; its rank rho is 1 + the leading-zero bits of the
    next 48 bits. A group's register vector is ``max(rho)`` per j —
    one map-side-combinable aggregation, mergeable across partitions,
    days, or clusters by cell-wise max, which is why HLL is THE
    distributed distinct-count structure (this mergeability is what
    ``approx_count_distinct`` uses internally; building it from
    first principles makes the register state an auditable column).

    Determinism: md5-derived, no RNG — identical in any engine. The
    harmonic-mean denominator ``sum(2^-rho)`` is formed as an EXACT
    integer ``sum(1 << (49 - rho))`` scaled by 2^49 (each term ≤
    2^48, ≤256 terms → fits int64; integer addition is associative,
    so partition order cannot perturb the sum the way double
    summation would). The estimate is then ONE double division of
    engine-identical operands. Absent registers contribute rho=0
    terms; the small-range linear-counting branch (raw ≤ 2.5m and
    zero registers present) uses ``m * ln(m/V)`` — the lone libm
    call, tolerated because outputs are rounded to 4 dp and inputs
    are md5-random (never poised on a rounding boundary).

    Scale (100 TB): the corpus reduces to ≤256 int64s per group in
    two shuffles that shrink monotonically (distinct tokens, then
    registers); nothing downstream scales with corpus size. Output:
    ``(group, n_exact, reg_sum, zero_regs, hll_est)`` — ``reg_sum``
    is the bit-exact scaled denominator, so register-level divergence
    is caught even where 4-dp rounding would hide it.
    """
    toks = (
        df.select(
            F.col(group_col), F.explode(dx.tokens(text_col)).alias("tok")
        )
        .filter(F.length("tok") > 0)
        .distinct()
    )
    h = F.md5(F.col("tok"))
    regs = (
        toks.select(
            F.col(group_col),
            F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("_j"),
            _hll_rho(F.substring(h, 3, 12)).alias("_rho"),
        )
        .groupBy(group_col, "_j")
        .agg(F.max("_rho").alias("_r"))
    )
    per_group = regs.groupBy(group_col).agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 49 - _r)")).alias(
            "_s_present"
        ),
        F.count(F.lit(1)).cast("long").alias("_n_present"),
    )
    s = (
        F.col("_s_present")
        + (F.lit(_HLL_M) - F.col("_n_present")) * F.lit(1 << _HLL_RHO_MAX)
    ).cast("long")
    v = (F.lit(_HLL_M) - F.col("_n_present")).cast("long")
    raw = F.lit(_HLL_C) / F.col("reg_sum").cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * _HLL_M)) & (F.col("zero_regs") > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / F.col("zero_regs").cast("double")),
    ).otherwise(raw)
    exact = toks.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    return (
        per_group.select(
            F.col(group_col), s.alias("reg_sum"), v.alias("zero_regs")
        )
        .join(exact, group_col)
        .select(
            group_col,
            "n_exact",
            "reg_sum",
            "zero_regs",
            F.round(est, 4).alias("hll_est"),
        )
    )
