"""Dedup family — the reference's signature operators (SURVEY §2.5, §7.3-4).

The reference deduplicates with order-dependent pandas idioms
(``sort_values`` + ``drop_duplicates(keep='first')``, per-group Python
loops). Those are order-NONdeterministic on ties; every operator here
fixes a documented total order (SURVEY §7.4 hard part #1) so results are
reproducible across partitionings and cluster sizes.

Scale notes: every operator below is a single hash-partition shuffle on
the dedup key. At 100 TB, skewed keys are the risk — these are
surrogate-key dedups (key ≈ unique id), so groups are tiny; for
heavy-hitter keys use the [EXT] skew toolkit in ``operators.skew``
(salted join / two-phase salted aggregation / skew diagnostics).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _keys(key: str | Sequence[str]) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


# W1 — build_master_corpus.py:137-139. The reference exploits the
# lexicographic accident 'Both_Manual_and_API' < 'Manual_Curated'; the
# engine makes priority explicit.
def dedup_priority(
    df: DataFrame,
    key: str | Sequence[str],
    priority_col: str,
    priority_order: Sequence[str],
    tiebreak: Sequence[str | Column] = (),
) -> DataFrame:
    """Keep one row per key, preferring earlier ``priority_order`` values
    of ``priority_col``; ties broken by ``tiebreak`` columns/expressions
    ascending. Callers own making the order TOTAL — when natural
    tiebreak columns can tie (two same-priority scrapes of one key),
    append a content-derived expression (e.g. ``md5`` of the payload)
    so the winner is partition-independent."""
    rank = F.lit(len(priority_order))
    for i, v in enumerate(reversed(priority_order)):
        rank = F.when(F.col(priority_col) == v, F.lit(len(priority_order) - 1 - i)).otherwise(rank)
    order = [rank.asc()] + [
        (F.col(c) if isinstance(c, str) else c).asc_nulls_last() for c in tiebreak
    ]
    w = Window.partitionBy(*_keys(key)).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# W2 — legiscan_normalizer.py:314-321: latest-per-key by (date desc,
# completeness desc), with an explicit final tiebreak for determinism.
def dedup_latest_per_key(
    df: DataFrame,
    key: str | Sequence[str],
    order_desc: Sequence[str | Column],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    order = [
        (F.col(c) if isinstance(c, str) else c).desc_nulls_last() for c in order_desc
    ] + [F.col(c).asc_nulls_last() for c in tiebreak]
    w = Window.partitionBy(*_keys(key)).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# W5 — build_master_corpus.py:127-135: before dropping duplicates, mark
# keys present in >1 source by rewriting the provenance column.
def flag_both_sources(
    df: DataFrame,
    key: str | Sequence[str],
    method_col: str = "collection_method",
    both_label: str = "Both_Manual_and_API",
) -> DataFrame:
    w = Window.partitionBy(*_keys(key))
    n_methods = F.size(F.collect_set(F.col(method_col)).over(w))
    return df.withColumn(
        method_col,
        F.when(n_methods > 1, F.lit(both_label)).otherwise(F.col(method_col)),
    )


def completeness(cols: Sequence[str]) -> Column:
    """A10 — row completeness score: count of non-missing fields
    (legiscan_normalizer.py:316)."""
    out = F.lit(0)
    for c in cols:
        out = out + (
            F.col(c).isNotNull() & (F.trim(F.col(c).cast("string")) != "")
        ).cast("int")
    return out


# A9 — legiscan_normalizer.py:306-331: per duplicate group, pick the best
# row (latest date, then most complete) and fill its missing fields from
# the other rows. The reference fills "from any other row" in arbitrary
# iteration order; the engine fills from rows in the SAME total order
# (best first), so output is deterministic.
def merge_duplicates_coalesce_fill(
    df: DataFrame,
    key: str | Sequence[str],
    order_date_col: str,
    fill_cols: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """One shuffle on ``key``; within each group a single window pass
    computes both the winner (row_number) and, per fill column, the first
    non-missing value in preference order (first_value ignorenulls over
    the full frame)."""
    keys = _keys(key)
    comp = completeness(fill_cols).alias("_completeness")
    ordered = df.withColumn("_completeness", comp)
    order = [
        F.col(order_date_col).desc_nulls_last(),
        F.col("_completeness").desc(),
    ] + [F.col(c).asc_nulls_last() for c in tiebreak]
    w_rank = Window.partitionBy(*keys).orderBy(*order)
    w_frame = w_rank.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    out = ordered.withColumn("_rn", F.row_number().over(w_rank))
    for c in fill_cols:
        non_missing = F.when(
            F.col(c).isNotNull() & (F.trim(F.col(c).cast("string")) != ""), F.col(c)
        )
        out = out.withColumn(c, F.first(non_missing, ignorenulls=True).over(w_frame))
    return out.filter(F.col("_rn") == 1).drop("_rn", "_completeness")
