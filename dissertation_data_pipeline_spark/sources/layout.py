"""Z-order (Morton curve) file layout for multi-dimensional data skipping.

Bucketing (``sources.bucketing``) pre-pays the shuffle for ONE join key;
Z-ordering pre-pays *predicate pushdown* for SEVERAL filter columns at
once. Sorting files by the interleaved-bit curve value makes each file's
min/max footer range tight in every interleaved dimension, so a filter
on ANY of them prunes most files at planning time — the mechanism behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``. At 100 TB, a scan that skips 95%
of files beats any execution-side optimization; layout is the cheapest
accelerator there is.

The reference has no analog (single-process pandas, SURVEY §4.2); this
is scale infrastructure in the same family as its write-once parquet
artifact conventions.

Implementation notes:
- The curve value is a pure bitwise codegen expression
  (``plans.queries_wave3.zorder_value``) over *bucketed* column values
  (low ``bits`` bits each) — no UDF, no sort-key blowup.
- ``repartitionByRange(zval)`` gives contiguous, balanced curve
  segments (range boundaries from a sampled sketch — at 100 TB, set
  ``n_files`` so each file lands near the rowgroup-friendly 128-512 MiB
  band); ``sortWithinPartitions`` tightens ranges inside each file.
- Effectiveness is *measured*, not assumed: ``file_minmax_stats`` reads
  the real parquet footers back and ``tests/test_layout.py`` asserts
  Z-ordered files overlap far less of the key space than the unsorted
  layout — i.e. the skipping is real, on disk, not a docstring claim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *,
    bits: int = 8,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet laid out along the Z-order curve of the
    low ``bits`` bits of ``col_a`` and ``col_b`` (columns must already
    be bucketed into [0, 2**bits) — e.g. ``key % 256`` or a
    ``width_bucket``)."""
    from dissertation_data_pipeline_spark.plans.queries_wave3 import zorder_value

    z = zorder_value(F.col(col_a), F.col(col_b), bits).alias("_zval")
    (
        df.withColumn("_zval", z)
        .repartitionByRange(n_files, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval")
        .write.mode(mode)
        .parquet(path)
    )


def file_minmax_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max of ``cols`` from the real parquet footers (what
    a scan's file-skipping actually sees). Returns one dict per file:
    ``{"file": ..., "<col>_min": ..., "<col>_max": ...}``."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        row: dict = {"file": os.path.basename(f)}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    continue
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            row[f"{c}_min"], row[f"{c}_max"] = lo, hi
        out.append(row)
    return out


def skipped_fraction(
    stats: list[dict], col: str, lo, hi
) -> float:
    """Fraction of files a ``col BETWEEN lo AND hi`` filter skips given
    footer stats — the planning-time pruning a real scan would do."""
    if not stats:
        return 0.0
    skipped = sum(
        1
        for s in stats
        if s[f"{col}_max"] is not None
        and (s[f"{col}_max"] < lo or s[f"{col}_min"] > hi)
    )
    return skipped / len(stats)


def compact_parquet(
    spark,
    path: str,
    *,
    target_bytes: int = 256 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Compact a small-file parquet directory to ~``target_bytes``
    files (snapshot-swap rewrite). Returns the new file count.

    The small-files problem is THE silent killer of long-lived 100 TB
    tables: every incremental append (one file per micro-batch per
    partition) multiplies scan task counts, footer reads, and driver
    planning time. Periodic compaction to row-group-friendly sizes
    (128-512 MiB) restores scan efficiency; with ``sort_cols`` the
    rewrite also restores clustering (pair with Z-order via
    ``write_zordered`` for multi-dim keys).

    Sizing uses the on-disk byte total (what governs scan splits), not
    row counts — measured RECURSIVELY, so a Hive-partitioned layout
    (``date=*/part-*.parquet`` — exactly the micro-batch layout the
    small-files problem comes from) is sized correctly instead of
    reading as 0 bytes and collapsing the whole table into one file.
    Partitioned tables are compacted flat by design here; to preserve
    the partition columns in the layout, pass them as ``sort_cols`` and
    re-write with ``partitionBy`` upstream.

    The rewrite is one job: read -> repartition(n) -> write to a tmp
    dir -> atomic directory swap (same crash-safety convention as
    ``StateTable``: stale tmp/bak from a crashed run are cleared first,
    and a run that died between the two renames left ``.compact-bak``
    as the only complete copy — restored here before compacting).
    """
    import glob
    import os
    import shutil

    tmp = path.rstrip("/") + ".compact-tmp"
    bak = path.rstrip("/") + ".compact-bak"
    if not os.path.exists(path) and os.path.exists(bak):
        os.rename(bak, path)  # recover the crashed swap's only copy
    shutil.rmtree(tmp, ignore_errors=True)
    if os.path.exists(path):
        shutil.rmtree(bak, ignore_errors=True)

    def _files() -> list[str]:
        return glob.glob(
            os.path.join(path, "**", "*.parquet"), recursive=True
        )

    size = sum(os.path.getsize(f) for f in _files())
    n_files = max(1, -(-size // target_bytes))  # ceil
    df = spark.read.parquet(path)
    if sort_cols:
        df = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(tmp)
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak, ignore_errors=True)
    return len(_files())
