"""[EXT] Scalable deduplication operators (BASELINE.json north-star).

The reference deduplicates only on surrogate keys (SURVEY §2.5); a
training-data pipeline at 100 TB needs *content* dedup. This module
implements the standard family — exact, MinHash+LSH, SimHash, blocked
n-gram Jaccard — as pure DataFrame/array expressions (no Python UDFs:
hashing is md5 via JVM, set ops are higher-order array functions).

Portability-by-construction: every hash is derived from ``md5`` hex
strings, which DuckDB computes identically, so each operator has an
exact SQL oracle. (Spark's ``xxhash64``/``hash`` would be faster but
engine-private; md5's cost is still JVM-side and vectorizable, and at
scale the dominant cost is the shuffle, not the hash.)

Scale design:
- **Exact / token-set dedup**: one groupBy shuffle on a 128-bit digest —
  the minimum possible. Digest keys distribute uniformly (no skew).
- **MinHash LSH**: banded signatures; candidate generation is an
  explode (rows × bands) + self-join *within band buckets only* — the
  quadratic term is bounded by bucket size, the classic LSH trade.
- **SimHash**: 48-bit signature, 6×8-bit bands; pairs sharing a band
  byte are verified by Hamming distance (bit_count(xor)).
- **Blocked Jaccard**: all-pairs only within caller-supplied blocking
  keys — the operator refuses unblocked all-pairs by design.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _md5(col: Column) -> Column:
    return F.md5(col.cast("binary"))


def tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokens."""
    return F.split(F.lower(F.trim(_c(col).cast("string"))), r"\s+")


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles; texts shorter than n words fall
    back to a single whole-text shingle."""
    toks = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array(F.array_join(toks, " ")))
    )


def char_ngrams(col: Column | str, n: int = 4) -> Column:
    """Distinct character n-grams of the lowercased text."""
    s = F.lower(F.trim(_c(col).cast("string")))
    grams = F.transform(
        F.sequence(F.lit(1), F.length(s) - (n - 1)),
        lambda i: F.substring(s, i, n),
    )
    return F.array_distinct(F.when(F.length(s) >= n, grams).otherwise(F.array(s)))


def minhash_signature(shingles: Column, num_hashes: int = 12) -> Column:
    """MinHash signature: element i is the lexicographic min of
    ``md5(i # shingle)`` over the shingle set — the min of a salted
    random permutation, one independent permutation per salt."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s, i=i: _md5(F.concat(F.lit(f"{i}#"), s)))
            )
            for i in range(num_hashes)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays, as double."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact-content dedup: md5 digest groupBy; emits one row per
    distinct content with the canonical (min) id and the copy count.
    One shuffle on a uniform 128-bit key — no skew at any scale."""
    return (
        df.select(F.col(id_col), _md5(_c(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def tokenset_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-insensitive exact dedup: digest of the *sorted distinct
    token set* — catches shuffled/reordered copies that byte-exact
    dedup misses."""
    key = _md5(F.array_join(F.array_sort(F.array_distinct(tokens(text_col))), " "))
    return (
        df.select(F.col(id_col), key.alias("tokenset_hash"))
        .groupBy("tokenset_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_words: int = 3,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH, verified with exact
    shingle Jaccard >= ``threshold``.

    Plan shape (scale-critical):
    1. one narrow pass computes shingles + signature per row;
    2. explode to (band_idx, band_key) — rows × bands;
    3. self-join on the band bucket (shuffle on band_key; quadratic
       only within a bucket);
    4. distinct candidate pairs, then verify by re-joining the shingle
       sets and computing exact Jaccard.

    Output: (id_a, id_b, jaccard) with id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    assert rows_per_band * bands == num_hashes, "bands must divide num_hashes"

    base = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(text_col, shingle_words).alias("_shingles"),
    ).withColumn("_sig", minhash_signature(F.col("_shingles"), num_hashes))

    band_entries = base.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        _md5(
                            F.array_join(
                                F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band),
                                "|",
                            )
                        ).alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("_id", "band.band_idx", "band.band_key")

    # repartition by the band bucket: distributes candidate generation
    # across the cluster (a small single-file scan otherwise probes a
    # broadcast join on ONE partition) and co-locates the self-join
    band_entries = band_entries.repartition("band_idx", "band_key")
    a = band_entries.alias("a")
    b = band_entries.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )

    sh = base.select("_id", "_shingles")
    verified = (
        candidates.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_shingles", "_sh_a"), "id_a")
        .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_shingles", "_sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("_sh_a"), F.col("_sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(col: Column | str, bits: int = 48) -> Column:
    """SimHash over the distinct token set (default 48-bit — wide
    enough to discriminate within a shared vocabulary, and still a
    positive int64 so band extraction needs no sign handling).

    Per token, bits come from the leading hex digits of ``md5(token)``
    (4 bits per digit). Each bit position accumulates +1/-1 across
    tokens; the signature bit is 1 where the sum is positive. Pure
    array expressions, md5-portable.
    """
    toks = F.array_distinct(tokens(col))

    def bit(d: Column, b: int) -> Column:
        digit = F.substring(d, b // 4 + 1, 1)
        val = F.conv(digit, 16, 10).cast("int")
        return F.shiftright(val, 3 - (b % 4)).bitwiseAND(F.lit(1))

    # single fold: ONE md5 per token, all bit counters advanced together
    # (one aggregate per bit would re-evaluate the digest array per bit —
    # a `bits`-fold blowup in md5 work that dominates at corpus scale)
    def step(acc: Column, t: Column) -> Column:
        d = _md5(t)
        return F.zip_with(
            acc,
            F.array(*[bit(d, b) * 2 - 1 for b in range(bits)]),
            lambda a, v: a + v,
        )

    counts = F.aggregate(toks, F.array_repeat(F.lit(0), bits), step)
    # assemble via one zip_with + fold so `counts` appears once in the
    # expression tree (48 separate references would re-run the fold 48x)
    weights = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])
    contrib = F.zip_with(
        counts, weights, lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(contrib, F.lit(0).cast("long"), lambda a, x: a + x)


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    bits: int = 48,
) -> DataFrame:
    """Near-dup pairs by SimHash: 8-bit bands generate candidates
    (pairs agreeing on at least one band byte), verified by Hamming
    distance <= ``max_hamming``. With bands > max_hamming the banding
    is exact by pigeonhole (48 bits / 6 bands covers radius <= 5)."""
    bands_n = bits // 8
    base = df.select(F.col(id_col).alias("_id"), simhash(text_col, bits).alias("_sh"))
    bands = base.select(
        "_id",
        "_sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftright(F.col("_sh"), 8 * i).bitwiseAND(F.lit(255)).alias("band_val"),
                    )
                    for i in range(bands_n)
                ]
            )
        ).alias("band"),
    ).select("_id", "_sh", "band.band_idx", "band.band_val")

    # same repartition rationale as minhash_lsh_pairs
    bands = bands.repartition("band_idx", "band_val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sh").alias("sh_a"),
            F.col("b._sh").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# Blocked n-gram Jaccard
# ---------------------------------------------------------------------------

def blocked_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    *,
    ngram_words: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact word-n-gram Jaccard for all pairs *within each block*.
    Blocking keys (language, source, LSH bucket, ...) bound the
    quadratic term; this operator intentionally requires them —
    unblocked all-pairs does not exist at 100 TB."""
    assert block_cols, "blocked_jaccard_pairs requires blocking columns"
    base = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("_id"),
        word_shingles(text_col, ngram_words).alias("_sh"),
    ).repartition(*block_cols)  # parallelize + co-locate the block join
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a._id") < F.col("b._id")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return (
        a.join(b, cond)
        .select(
            *[F.col(f"a.{c}").alias(c) for c in block_cols],
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.round(jaccard(F.col("a._sh"), F.col("b._sh")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
