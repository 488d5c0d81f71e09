"""[EXT] Declarative data-quality validation (expectations layer).

The reference validates ad hoc: per-row "needs enrichment" predicates
(scripts/legislation/legiscan_enricher.py:333-341), dropna on required
columns (scripts/legislation/build_corpus.py:103), and conflict prints
(legiscan_normalizer.py:299). This module turns that into a
first-class operator: a set of named constraints evaluated over a
table in ONE aggregation pass, producing a (check, violations,
n_rows, pass) report — the Deequ/Great-Expectations shape, Spark-first.

Constraint kinds:
- ``not_null(col)`` — col must be non-null
- ``unique(cols)`` — no duplicate key groups
- ``in_set(col, values)`` — domain membership
- ``in_range(col, lo, hi)`` — inclusive numeric/date bounds
- ``matches(col, regex)`` — full-match pattern
- ``foreign_key(col, dim, dim_col)`` — referential integrity

Scale design: every row-local constraint compiles to a conditional
COUNT in a single global aggregate — one pass, map-side partials, no
shuffle of row data (only the one-row partial aggregates move).
``unique`` adds one groupBy on the key (unavoidable — uniqueness is a
global property; the shuffle moves only keys). ``foreign_key`` is a
left-anti count against the (broadcastable) dimension. The report
unions one-row aggregates — Spark evaluates each leg independently,
so the row-local legs are grouped into ONE aggregate first.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    kind: str
    #: row-local violation predicate (NULL-safe, true == violated).
    #: compare=False: a pyspark Column is unhashable and its __eq__
    #: builds an expression, so including it in the generated
    #: __eq__/__hash__ makes frozen Checks raise on hash()/== — Checks
    #: compare by (name, kind, key_cols) identity instead
    predicate: Column | None = field(default=None, compare=False)
    #: for unique: the key columns
    key_cols: tuple[str, ...] = ()
    #: for foreign_key: (dim_df, fact_col, dim_col)
    fk: tuple[DataFrame, str, str] | None = field(default=None, compare=False)


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", "row", F.col(col).isNull())


def in_set(col: str, values: Sequence) -> Check:
    vals = list(values)
    return Check(
        f"in_set({col})", "row", F.col(col).isNull() | ~F.col(col).isin(vals)
    )


def in_range(col: str, lo, hi) -> Check:
    c = F.col(col)
    return Check(
        f"in_range({col})", "row", c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi))
    )


def matches(col: str, pattern: str) -> Check:
    c = F.col(col)
    return Check(
        f"matches({col})", "row", c.isNull() | ~c.rlike(f"^(?:{pattern})$")
    )


def unique(*cols: str) -> Check:
    return Check(f"unique({','.join(cols)})", "unique", key_cols=tuple(cols))


def foreign_key(col: str, dim: DataFrame, dim_col: str) -> Check:
    return Check(f"foreign_key({col})", "fk", fk=(dim, col, dim_col))


def run_checks(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Evaluate all checks; returns (check, violations, n_rows, passed)
    with one row per check, ordered by check name. All row-local
    constraints share a single aggregation pass."""
    assert checks, "run_checks needs at least one check"
    legs: list[DataFrame] = []

    row_checks = [c for c in checks if c.kind == "row"]
    if row_checks:
        legs.append(
            df.agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum(c.predicate.cast("long")).alias(f"_v{i}")
                    for i, c in enumerate(row_checks)
                ],
            ).select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c.name).alias("check"),
                                F.coalesce(F.col(f"_v{i}"), F.lit(0)).alias(
                                    "violations"
                                ),
                                F.col("_n").alias("n_rows"),
                            )
                            for i, c in enumerate(row_checks)
                        ]
                    )
                ).alias("r")
            ).select("r.check", "r.violations", "r.n_rows")
        )

    for c in checks:
        if c.kind == "unique":
            # violations = rows carrying a key that appears more than
            # once (the rows you'd have to drop or repair)
            dup = (
                df.groupBy(*[F.col(k) for k in c.key_cols])
                .agg(F.count(F.lit(1)).alias("_cnt"))
                .agg(
                    F.coalesce(
                        F.sum(F.when(F.col("_cnt") > 1, F.col("_cnt"))), F.lit(0)
                    ).alias("violations"),
                    F.coalesce(F.sum("_cnt"), F.lit(0)).alias("n_rows"),
                )
            )
            legs.append(dup.select(F.lit(c.name).alias("check"), "violations", "n_rows"))
        elif c.kind == "fk":
            dim, fact_col, dim_col = c.fk
            keys = dim.select(F.col(dim_col).alias(fact_col)).distinct()
            miss = (
                df.filter(F.col(fact_col).isNotNull())
                .join(F.broadcast(keys), fact_col, "left_anti")
                .agg(F.count(F.lit(1)).alias("violations"))
            )
            total = df.agg(F.count(F.lit(1)).alias("n_rows"))
            legs.append(
                miss.crossJoin(total).select(
                    F.lit(c.name).alias("check"), "violations", "n_rows"
                )
            )

    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.select(
        "check",
        F.col("violations").cast("long").alias("violations"),
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("violations") == 0).alias("passed"),
    ).orderBy("check")
