"""[EXT] Upsert-shaped table maintenance: MERGE INTO and CDC apply.

The reference maintains its corpus by re-running pandas scripts that
re-read, patch, and rewrite whole CSV/parquet snapshots
(build_master_corpus.py's concat-then-dedup; the enricher's
read-patch-write loop over master_corpus.parquet). The engine expresses
the same maintenance as *set-based merge semantics* — the shape Delta
Lake/Iceberg call ``MERGE INTO`` and Spark can execute as ONE
full-outer shuffle join at any scale:

- :func:`merge_upsert` — declarative MERGE: matched-update,
  matched-delete (predicated), not-matched-insert, with the target's
  schema preserved. One shuffle on the merge key; a small source side
  broadcasts (Catalyst/AQE decide — the operator never forces a
  cartesian or a collect).
- :func:`latest_changes` / :func:`apply_changes` — change-data-capture
  replay: reduce a change log to its latest op per key (deterministic
  total order), then apply upserts and deletes onto a base snapshot in
  one full-outer join.

Scale notes (100 TB): both operators are a single hash-partitioned
join on the key — the minimal possible data movement for keyed
maintenance. The change-log reduction is a window over (key, order)
with map-side-combinable input; skewed hot keys split under AQE.
Neither operator collects, loops, or touches Python row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str | Sequence[str],
    *,
    update_set: Mapping[str, Column],
    insert_values: Mapping[str, Column] | None = None,
    delete_when: Column | None = None,
) -> DataFrame:
    """MERGE ``source`` INTO ``target`` ON ``key`` — one full-outer join.

    ``key`` may be one column name or a sequence of names (composite
    merge key, e.g. SCD2's ``(entity, effective_from)``); all key
    columns join equi-wise and the non-null assumption below applies
    to every one of them.

    Row fates (ANSI/Delta MERGE semantics):

    - **matched & delete_when** -> row removed;
    - **matched** (else)        -> target row with ``update_set``
      columns replaced (expressions may reference both sides via the
      ``t``/``s`` aliases);
    - **target-only**           -> kept unchanged;
    - **source-only**           -> inserted from ``insert_values``
      (missing columns become typed NULLs). Pass ``insert_values=None``
      for an update-only merge (source-only rows dropped).

    Keys are assumed non-null on both sides (enforce upstream — a NULL
    key would read as "unmatched" on both legs), and the SOURCE must be
    key-unique: ANSI/Delta MERGE *errors* on multiple source matches,
    and a distributed plan cannot raise lazily, so a duplicate-key
    source here fans each matched target row out once per duplicate —
    reduce a raw change feed with :func:`latest_changes` first. The
    output schema is exactly the target schema, so (given a key-unique
    source) the result can overwrite the target's storage location.
    """
    keys = [key] if isinstance(key, str) else list(key)
    # an update_set/insert_values entry keyed by a NON-target column
    # (typo, or the source's name where it differs) would silently
    # never be read — the merge "succeeds" updating nothing. ANSI
    # MERGE errors on unknown assignment targets; so do we.
    tcols = {f.name for f in target.schema.fields}
    unknown = set(update_set) - tcols
    if insert_values is not None:
        unknown |= set(insert_values) - tcols
    if unknown:
        raise ValueError(
            f"merge_upsert: assignment targets not in the target "
            f"schema: {sorted(unknown)}"
        )
    t, s = target.alias("t"), source.alias("s")
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"t.{k}") == F.col(f"s.{k}"))
    joined = t.join(s, cond, "full_outer")
    # Keys are non-null (contract above), so one representative column
    # per side distinguishes the three fates after the full-outer join.
    matched = (
        F.col(f"t.{keys[0]}").isNotNull() & F.col(f"s.{keys[0]}").isNotNull()
    )
    target_only = F.col(f"s.{keys[0]}").isNull()

    if delete_when is not None:
        joined = joined.filter(~(matched & F.coalesce(delete_when, F.lit(False))))
    if insert_values is None:
        joined = joined.filter(F.col(f"t.{keys[0]}").isNotNull())

    out = []
    for f in target.schema.fields:
        upd = update_set.get(f.name, F.col(f"t.{f.name}"))
        ins = (
            insert_values.get(f.name, F.lit(None).cast(f.dataType))
            if insert_values is not None
            else F.lit(None).cast(f.dataType)
        )
        out.append(
            F.when(matched, upd)
            .when(target_only, F.col(f"t.{f.name}"))
            .otherwise(ins)
            .alias(f.name)
        )
    return joined.select(*out)


def latest_changes(
    changes: DataFrame,
    key: str,
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Reduce a change log to its LATEST row per key.

    ``order_by`` must be a deterministic total order per key (e.g.
    ``[F.desc("ts"), F.desc("change_id")]`` — always include a unique
    final tiebreak so replays are partition-order independent). One
    window shuffle on the key.
    """
    w = Window.partitionBy(key).orderBy(*order_by)
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    *,
    order_by: Sequence[Column | str],
    is_delete: Column,
    status_col: str = "change_status",
) -> DataFrame:
    """Replay a CDC change log onto a base snapshot.

    ``changes`` is reduced to its latest op per key (:func:`latest_changes`),
    then applied: a latest-op delete removes the key (a delete for an
    absent key is a no-op); any other op upserts. Output columns are the
    base columns, the change columns (NULL where the key saw no change),
    and ``status_col`` in ``{'kept','updated','inserted'}``. Non-key
    column names must be disjoint between the two frames (rename
    upstream).
    """
    latest = latest_changes(changes, key, order_by).withColumn(
        "_del", F.coalesce(is_delete, F.lit(False))
    )
    b, c = base.alias("b"), latest.alias("c")
    joined = b.join(c, F.col(f"b.{key}") == F.col(f"c.{key}"), "full_outer")
    has_change = F.col(f"c.{key}").isNotNull()
    in_base = F.col(f"b.{key}").isNotNull()
    surviving = joined.filter(~(has_change & F.col("_del")))
    out_key = F.coalesce(F.col(f"b.{key}"), F.col(f"c.{key}")).alias(key)
    base_cols = [F.col(f"b.{f}") for f in base.columns if f != key]
    change_cols = [F.col(f"c.{f}") for f in latest.columns if f not in (key, "_del")]
    status = (
        F.when(~has_change, F.lit("kept"))
        .when(in_base, F.lit("updated"))
        .otherwise(F.lit("inserted"))
        .alias(status_col)
    )
    return surviving.select(out_key, *base_cols, *change_cols, status)


def merge_aggregates(
    old: DataFrame,
    delta: DataFrame,
    key: str,
    *,
    count_col: str,
    sum_cols: Sequence[str] = (),
) -> DataFrame:
    """Incremental maintenance of a keyed algebraic aggregate.

    ``old`` is a persisted aggregate state table (one row per key with
    a count column and exact-integer/decimal sum columns); ``delta`` is
    the same aggregation computed over ONLY the new batch — retractions
    are expressed as negative contributions. The refreshed state is one
    full-outer join: ``coalesce(old, 0) + coalesce(delta, 0)`` per
    column, dropping keys whose count reaches zero.

    This is the O(delta) alternative to re-aggregating the corpus: at
    100 TB the delta aggregate touches only new files, and the merge
    shuffles |keys-in-delta| + |state| rows — the same shape a
    materialized-view refresh or a Structured Streaming
    ``foreachBatch`` upsert executes. Only works for ALGEBRAIC
    aggregates (count/sum and anything derivable from them: mean,
    moments, min/max under insert-only); holistic statistics (median,
    distinct) need their own mergeable summaries
    (``operators/sketches.py``).
    """
    cols = [count_col, *sum_cols]
    o = old.select(key, *[F.col(c).alias(f"_o_{c}") for c in cols])
    d = delta.select(key, *[F.col(c).alias(f"_d_{c}") for c in cols])
    joined = o.join(d, key, "full_outer")
    merged = [
        (
            F.coalesce(F.col(f"_o_{c}"), F.lit(0))
            + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
        ).alias(c)
        for c in cols
    ]
    return joined.select(key, *merged).filter(F.col(count_col) > 0)
