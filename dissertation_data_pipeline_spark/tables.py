"""Testdata table loaders (TESTDATA.md).

The driver generates a TPC-H-ish star schema + ``events``/``documents``/
``embeddings`` at /root/testdata/sf{0.001,0.01,0.1}. Tables are read with
their parquet-embedded schemas (deterministic, driver-generated); the
engine's schema-contract machinery (``schemas.conform``) is exercised by
the pipeline-level fixtures, not these scans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # the caller may hand us a foreign session (the driver harness does);
    # pin the confs query correctness depends on — tz-naive parquet
    # timestamps must be read in UTC to match the oracle engine
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts has shipped as TIMESTAMP(NANOS), nanos-as-INT64, and
        # plain TIMESTAMP(MICROS) across testdata generations. Normalize
        # from the observed schema (no session-conf mutation) so every
        # downstream query sees a micro-precision session-tz TIMESTAMP —
        # the same thing the DuckDB oracle observes.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampType

        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        t = df.schema["ts"].dataType
        if isinstance(t, LongType):
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if not isinstance(t, TimestampType):  # TIMESTAMP_NTZ → session-tz (UTC)
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so ``spark.sql`` queries work."""
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
