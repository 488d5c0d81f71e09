"""Relational composite operators (SURVEY §2.2-§2.7).

Each helper returns a *lazy* DataFrame — no collect() in the data plane.
Shuffle behavior at scale is noted per operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# U1 — pd.concat after projecting to a shared contract
# (build_master_corpus.py:122, legiscan_normalizer.py:438).
def union_conform(*dfs: DataFrame) -> DataFrame:
    """Schema-aligned union-all. ``unionByName(allowMissingColumns=True)``
    so each input may omit contract columns (they become NULL). Zero
    shuffle — union is a narrow op."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


# A1 — value_counts() (build_master_corpus.py:149,151; build_corpus.py:119,122)
def frequency(df: DataFrame, *cols: str, sort_by_key: bool = False) -> DataFrame:
    """Frequency table: groupBy(cols).count(). One shuffle on the group
    keys with map-side partial aggregation (hash agg) — at 100 TB the
    reduce side sees only one row per distinct key."""
    out = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("cnt"))
    if sort_by_key:
        return out.orderBy(*cols)
    return out.orderBy(F.desc("cnt"), *cols)


# O2 — value_counts().head(k) (build_corpus.py:122)
def top_k_frequency(df: DataFrame, col: str, k: int) -> DataFrame:
    """Top-k frequency. The final orderBy+limit is a TakeOrdered — no
    global sort materialization."""
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.col(col))
        .limit(k)
    )


# J3/U2 — missing-states report (build_master_corpus.py:153-156)
def anti_report(dim: DataFrame, facts: DataFrame, key: str | Sequence[str]) -> DataFrame:
    """Dimension rows with no matching fact row (left-anti join). The dim
    side is small by construction -> broadcast the *fact keys* is wrong at
    scale; instead anti-join dim (small, broadcastable) against distinct
    fact keys — Catalyst broadcasts the dim side automatically."""
    keys = [key] if isinstance(key, str) else list(key)
    return dim.join(facts.select(*keys).distinct(), on=keys, how="left_anti")


# A7 — groups with >1 row (legiscan_normalizer.py:287-288,
# build_master_corpus.py:128)
def duplicate_groups(df: DataFrame, key: str | Sequence[str]) -> DataFrame:
    """All rows whose key occurs more than once. Implemented as a window
    count (single shuffle on the key) rather than groupBy+semi-join
    (two shuffles of the full table)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys)
    return (
        df.withColumn("_grp_cnt", F.count(F.lit(1)).over(w))
        .filter(F.col("_grp_cnt") > 1)
        .drop("_grp_cnt")
    )


# A8 — per-group conflict detection (legiscan_normalizer.py:296-302):
# within duplicate groups, count distinct non-missing values per column.
def conflict_report(
    df: DataFrame, key: str | Sequence[str], value_cols: Sequence[str]
) -> DataFrame:
    keys = [key] if isinstance(key, str) else list(key)
    aggs = [F.count(F.lit(1)).alias("group_size")] + [
        F.countDistinct(
            F.when(F.col(c).isNotNull() & (F.trim(F.col(c).cast("string")) != ""), F.col(c))
        ).alias(f"{c}_distinct")
        for c in value_cols
    ]
    grouped = df.groupBy(*keys).agg(*aggs)
    conflict = F.lit(False)
    for c in value_cols:
        conflict = conflict | (F.col(f"{c}_distinct") > 1)
    return grouped.filter((F.col("group_size") > 1) & conflict)


# A2-A6 — the reference's printed summary block as one aggregate row
# (build_master_corpus.py:145-157, build_corpus.py:108-123).
def summary_stats(
    df: DataFrame,
    *,
    distinct_col: str | None = None,
    minmax_col: str | None = None,
    bool_cols: Sequence[str] = (),
    mean_col: str | None = None,
) -> DataFrame:
    aggs: list[Column] = [F.count(F.lit(1)).alias("total_rows")]
    if distinct_col:
        aggs.append(F.countDistinct(distinct_col).alias(f"distinct_{distinct_col}"))
    if minmax_col:
        aggs.append(F.min(minmax_col).alias(f"min_{minmax_col}"))
        aggs.append(F.max(minmax_col).alias(f"max_{minmax_col}"))
    for c in bool_cols:
        aggs.append(F.sum(F.col(c).cast("int")).alias(f"n_{c}"))
    if mean_col:
        aggs.append(F.round(F.avg(mean_col), 2).alias(f"avg_{mean_col}"))
    return df.agg(*aggs)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Full-outer snapshot reconciliation: classify every key as
    ``added`` (new only), ``removed`` (old only), ``changed`` (present
    in both, any compare column differs under null-safe equality), or
    ``unchanged`` — plus the comma-joined list of changed columns.

    The batch twin of SCD2 change capture (temporal.py): where SCD2
    *accumulates* history, this diffs two materialized snapshots — the
    incremental-pipeline primitive for "what did this run change".

    Scale: one full-outer shuffle join on the key columns (both sides
    hash-partitioned — no broadcast, snapshots are fact-sized); the
    per-column comparison is a codegen projection. Skewless for
    unique-key snapshots by construction.
    """
    key_cols = list(key_cols)
    compare_cols = list(compare_cols)
    assert key_cols, "snapshot_diff requires key columns"
    o = old.select(
        *[F.col(k).alias(k) for k in key_cols],
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(k) for k in key_cols],
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    j = o.join(n, key_cols, "full_outer")
    diffs = [
        (c, ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))) for c in compare_cols
    ]
    any_diff = None
    for _, d in diffs:
        any_diff = d if any_diff is None else (any_diff | d)
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(any_diff if any_diff is not None else F.lit(False), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    changed = F.when(
        status == "changed",
        F.concat_ws(",", *[F.when(d, F.lit(c)) for c, d in diffs]),
    ).otherwise(F.lit(""))
    return j.select(
        *key_cols, status.alias("status"), changed.alias("changed_cols")
    )
