"""Bucketed-table layout: shuffle-free co-located joins and aggregations.

At 100 TB the single biggest cost of a fact-fact join (lineitem x orders
on orderkey) is the pairwise shuffle. Bucketing pre-pays that shuffle at
write time: both tables are written hash-partitioned into the same
number of buckets on the join key, so every subsequent join or groupBy
on that key reads co-located buckets and plans **zero Exchange nodes**
(verified in ``tests/test_bucketing.py``).

The reference has no analogous concept (single-process pandas, SURVEY
§4.2) — this is pure scale infrastructure, the Spark-native equivalent
of its "write once, re-read cheaply" parquet artifacts
(`build_corpus.py` output conventions).

Notes that matter in production:
- Bucketed tables must go through the session catalog
  (``saveAsTable``); a plain ``parquet(path)`` write silently drops
  bucket metadata. We write *external* tables (explicit ``path``) so
  the data outlives catalog entries.
- Both sides must agree on bucket count (or be integer multiples with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
- ``sortBy`` the bucket key so the sort-merge join can also skip its
  Sort when every bucket is a single file
  (``spark.sql.legacy.bucketedTableScan.outputOrdering`` governs this;
  we assert only the Exchange elision, which is version-stable).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    *,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external bucketed parquet table.

    ``n_buckets`` should target executor-memory-sized buckets at the
    production SF (e.g. 100 TB fact / 256 MiB ≈ 400k buckets is too
    many; pick by largest-join working set, typically 2-8k).
    """
    w = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back *through the catalog* (a path read
    would lose bucketing metadata and re-shuffle)."""
    return spark.table(table)
