"""[EXT] Skew-handling operators: salted joins, two-phase aggregation,
and key-skew diagnostics.

AQE's skew-join handling splits oversized *shuffle partitions*, which
covers most cases; salting is the explicit fallback for the cases AQE
can't fix — a single hot key that exceeds one task's memory, or skew
under an operation AQE won't rewrite (window over a hot partition key,
streaming state). These operators make the technique first-class and
result-transparent: every salted form returns EXACTLY the rows of its
unsalted equivalent (the oracle for the salted join is the plain SQL
join), only the physical distribution changes.

Scale design (100 TB):
- ``salted_join`` spreads each hot key over ``salt`` shuffle
  partitions; the small side is replicated ``salt``-fold, so size the
  factor to the skew ratio, not to the cluster (16-64 is typical).
  Replication cost = |small| * salt rows — still broadcast-magnitude
  for dimension tables.
- ``salted_agg`` is classic two-phase aggregation: partial per
  (key, salt), final per key. Only algebraic aggregates compose this
  way (count/sum/min/max — the partials merge); holistic ones
  (exact median, collect_list ordering) do not — enforced by API.
- ``key_skew_report`` is the *diagnostic* that decides whether to
  salt: top-key share and max/mean partition ratio. Run it on a
  sample; the full-scan form here is for correctness tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_salt", "salted_join", "salted_agg", "key_skew_report"]

#: algebraic aggregate builders usable in salted_agg's two phases:
#: name -> (partial over rows, final over partials). ``count`` counts
#: NON-NULL values of its input column (SQL count(col) semantics — the
#: documented oracle ``df.groupBy(keys).agg(F.count(col))``); count(*)
#: is count over a non-null literal column.
_ALGEBRAIC = {
    "count": (lambda c: F.count(F.col(c) if isinstance(c, str) else c), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def with_salt(df: DataFrame, salt: int, col_name: str = "_salt") -> DataFrame:
    """Attach a uniform salt in [0, salt), DETERMINISTIC per row
    content: ``xxhash64`` over all columns (mod salt).

    Determinism is a *correctness* requirement, not a nicety: a salt
    from ``monotonically_increasing_id`` (or rand) changes when a
    fetch-failure retry recomputes a subset of map tasks, so rows can
    land in different (key, salt) shuffle partitions than their
    original attempt and the downstream aggregate double-counts or
    drops them — the SPARK-23207 class of silent corruption, which
    Spark only self-repairs for its own round-robin repartition.
    Content-hashing is stable across retries; identical duplicate rows
    sharing a salt value only narrows their spread, it never changes
    any result."""
    return df.withColumn(
        col_name,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt)).cast("int"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join where the big side's hot keys are spread over ``salt``
    sub-keys and the small side is replicated to match. Result rows are
    identical to ``big.join(small, on, how)``.

    Only inner/left (big-side-preserving) joins: an outer small side
    would emit its unmatched rows once per replica.
    """
    assert how in ("inner", "left"), "salted_join preserves the big side only"
    bs = with_salt(big, salt)
    ss = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return bs.join(ss, [*on, "_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    *,
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation: partial aggregate per (keys..., salt),
    final merge per keys. ``aggs`` maps output column -> (agg_name,
    input_col) with agg_name in {count, sum, min, max} (the algebraic
    set — partials must merge losslessly).

    Equivalent to ``df.groupBy(keys).agg(...)``; use when one group
    dwarfs the rest and even map-side combine leaves a hot reducer.
    """
    unknown = {a for a, _ in aggs.values()} - set(_ALGEBRAIC)
    assert not unknown, f"non-algebraic aggregates cannot be salted: {unknown}"
    partial = with_salt(df, salt).groupBy(*keys, "_salt").agg(
        *[
            _ALGEBRAIC[a][0](in_col).alias(f"_p_{out}")
            for out, (a, in_col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[a][1](f"_p_{out}").alias(out)
            for out, (a, in_col) in aggs.items()
        ]
    )


def key_skew_report(df: DataFrame, key: Column | str, top: int = 10) -> DataFrame:
    """Top-N key frequencies with each key's share of rows and its
    multiple of the mean key frequency — the numbers that justify (or
    veto) salting a join/aggregation on this key."""
    k = F.col(key) if isinstance(key, str) else key
    counts = df.groupBy(k.alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("_rows"), F.count(F.lit(1)).alias("_keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("_rows"), 6).alias("share"),
            F.round(
                F.col("cnt") * F.col("_keys") / F.col("_rows"), 6
            ).alias("x_mean"),
        )
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(top)
    )
