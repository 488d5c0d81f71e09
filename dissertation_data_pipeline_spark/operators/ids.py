"""Scalable global enumeration — contiguous ids in total key order.

The 100 TB version of ``row_number() OVER (ORDER BY key)``: a bare
global-sort window funnels every row through ONE task (Spark plans a
single-partition Exchange for an unpartitioned window), which is the
classic driver-shaped bottleneck for "assign training-example ids to
the corpus".  The scalable shape is the zipWithIndex pattern, here
expressed DataFrame-first:

1. ``repartitionByRange(key)`` + ``sortWithinPartitions(key)`` — a
   globally sorted LAYOUT (partition i's keys all precede partition
   i+1's), one range shuffle, no funnel;
2. enumerate within each partition (Arrow-batched ``mapInPandas`` with
   a per-partition running counter — zero shuffles; a window over
   ``spark_partition_id()`` would plan a second full Exchange);
3. per-partition counts -> prefix-sum offsets (n_partitions rows, a
   driver-scale side table) broadcast-joined back; the id is
   ``offset + local_rank``.

The enumerated frame is localCheckpoint'd before the counts pass:
range boundaries come from a SAMPLING job, so re-evaluating the plan
for the counts could re-draw boundaries and mismatch the offsets.
The ids themselves are boundary-independent (a row's rank depends
only on the total order of the key), so output is deterministic
across runs, partitionings, and cluster sizes; the checkpoint makes
offsets and enumeration consistent WITHIN a run.  In production this
materialization is the enumeration job's output write itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_ids(
    df: DataFrame,
    order_col: str,
    id_col: str = "dense_id",
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign contiguous 0-based BIGINT ids in ascending ``order_col``
    order (which must be duplicate-free for the total order to be
    unambiguous — enforced at runtime).  See module docstring for the
    scale design."""

    def _enumerate(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = 0
        for pdf in iterator:
            out = pdf.copy()
            out["_pid"] = pid
            out["_local"] = range(seen, seen + len(pdf))
            seen += len(pdf)
            yield out

    ranged = df.repartitionByRange(
        *([num_partitions] if num_partitions else []), F.col(order_col)
    ).sortWithinPartitions(order_col)
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["_pid int", "_local long"]
    )
    enum = ranged.mapInPandas(_enumerate, schema).localCheckpoint()

    counts = enum.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    # prefix-sum over n_partitions rows — driver-scale, the documented
    # single-partition window exception (same class as PageRank's node
    # count): the BIG side never funnels
    w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w), F.lit(0)).alias("_offset")
    )
    out = enum.join(F.broadcast(offsets), "_pid").withColumn(
        id_col, (F.col("_offset") + F.col("_local")).cast("long")
    )
    # duplicate keys would make ranks partition-boundary-dependent
    # (ties straddling a range boundary get arbitrary relative ids) —
    # refuse rather than return nondeterministic output
    n_rows, n_keys = out.agg(
        F.count(F.lit(1)), F.countDistinct(order_col)
    ).first()
    if n_rows != n_keys:
        raise ValueError(
            f"dense_ids requires unique {order_col!r}: "
            f"{n_rows} rows but {n_keys} distinct keys"
        )
    return out.drop("_pid", "_local", "_offset")
