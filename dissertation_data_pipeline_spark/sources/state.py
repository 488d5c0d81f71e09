"""Incremental-ingest state tables (SURVEY §2.9 I1-I5, §4.1 O-m5/O-m6).

The reference keeps three kinds of durable state as JSON files:
content-hash change detection (legiscan_api.py:21-56), a processed-set
for resumability (utils.py:14-53), and a positive/negative response
cache (legiscan_enricher.py:64-99). In the engine all three are the
same thing: a small keyed parquet table used in anti-joins/joins before
expensive work. No driver-side sets — membership tests are joins, so
they scale with the cluster, not the driver heap.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class StateTable:
    """A keyed parquet-backed state table with upsert-by-key.

    Writes go to a new snapshot directory then swap (rename) — the
    atomicity story a real deployment would get from Delta/Iceberg,
    reduced to plain parquet for this environment."""

    def __init__(self, spark: SparkSession, path: str, schema: StructType, key: str):
        self.spark = spark
        self.path = path
        self.schema = schema
        self.key = key

    def read(self) -> DataFrame:
        # crash recovery: if a previous upsert died between its two
        # renames (current moved to .bak, tmp not yet promoted), the
        # .bak snapshot is the only complete copy — restore it instead
        # of silently starting from an empty table
        bak = self.path + ".bak"
        if not os.path.exists(self.path) and os.path.exists(bak):
            os.rename(bak, self.path)
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(self.path)

    def upsert(self, updates: DataFrame) -> None:
        """Keep the newest row per key (updates win over current).

        ``updates`` is expected to carry one row per key; if a batch
        does contain duplicate keys, the survivor is chosen by a
        deterministic total order over the non-key columns (stringified,
        descending, NULLs last) rather than partition order — the same
        batch always produces the same table."""
        current = self.read().withColumn("_gen", F.lit(0))
        incoming = updates.select(*[f.name for f in self.schema.fields]).withColumn(
            "_gen", F.lit(1)
        )
        from pyspark.sql import Window

        tiebreak = [
            F.desc_nulls_last(F.col(f.name).cast("string"))
            for f in self.schema.fields
            if f.name != self.key
        ]
        w = Window.partitionBy(self.key).orderBy(F.desc("_gen"), *tiebreak)
        merged = (
            current.unionByName(incoming)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_gen")
        )
        import shutil

        tmp = self.path + ".tmp"
        bak = self.path + ".bak"
        # clear leftovers from a crashed previous upsert FIRST: a stale
        # .bak would make the rename below raise ENOTEMPTY forever (but
        # only after read() above has had its chance to recover from
        # it), and a stale .tmp would poison the overwrite
        shutil.rmtree(tmp, ignore_errors=True)
        if os.path.exists(self.path):
            shutil.rmtree(bak, ignore_errors=True)
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(self.path):
            os.rename(self.path, bak)
        os.rename(tmp, self.path)
        shutil.rmtree(bak, ignore_errors=True)


# I2/I3 — processed-set / idempotent-skip: anti-join the work list
# against already-processed keys (replaces utils.py:14-53 + the
# file-exists skip at fetch_texts.py:104-109).
def filter_unprocessed(work: DataFrame, state: DataFrame, key: str) -> DataFrame:
    return work.join(state.select(key).distinct(), on=key, how="left_anti")


# I1 — content-hash change detection (legiscan_api.py:21-56): keep work
# whose hash differs from (or is absent in) the recorded state.
def content_changed(
    work: DataFrame, state: DataFrame, key: str, hash_col: str = "content_hash"
) -> DataFrame:
    st = state.select(
        F.col(key), F.col(hash_col).alias("_known_hash")
    )
    return (
        work.join(st, on=key, how="left")
        .filter(
            F.col("_known_hash").isNull()
            | (F.col(hash_col) != F.col("_known_hash"))
        )
        .drop("_known_hash")
    )
