"""Readers and sinks (SURVEY §2.1 S1-S10, K1-K6).

Production paths never infer schemas (SURVEY §1.3): every reader takes
a StructType contract and conforms to it. Driver-side shims (Excel,
ZIP) are explicitly small-data by construction and documented as such.
"""

from __future__ import annotations

import io
import os
import zipfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from dissertation_data_pipeline_spark.schemas import conform


# S1 — CSV scan (reference: pd.read_csv at build_master_corpus.py:64 etc.)
def read_csv(
    spark: SparkSession, path: str, schema: StructType, *, header: bool = True
) -> DataFrame:
    """Header-aware CSV scan with an explicit contract — no inference;
    Catalyst still prunes columns into the scan.

    ``escape='"'`` pins RFC-4180 quoting (embedded quotes doubled, not
    backslashed) — what pandas/DuckDB/Excel emit; Spark's backslash
    default silently keeps ``""`` literal inside quoted fields.

    ``header=False`` maps columns POSITIONALLY onto the contract
    (headerless scans name columns _c0.._cN, which ``conform``'s
    by-name matching would turn into an all-NULL frame with no
    error); the file must carry at least as many columns as the
    contract."""
    raw = spark.read.csv(
        path, header=header, schema=None, inferSchema=False, escape='"'
    )
    if not header:
        names = [f.name for f in schema.fields]
        if len(raw.columns) < len(names):
            raise ValueError(
                f"{path}: headerless CSV has {len(raw.columns)} columns "
                f"but the contract needs {len(names)}"
            )
        raw = raw.toDF(*names, *raw.columns[len(names):])
    return conform(raw, schema)


# S4 — JSONL scan (normalize_json.py:8; JSONL is Spark's native JSON layout)
def read_jsonl(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


# S3 — parquet scan
def read_parquet(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    return conform(df, schema) if schema is not None else df


def read_parquet_evolving(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Read a parquet directory whose files were written under DIFFERENT
    schema versions (columns added over time — the long-lived-table
    reality the reference handles for CSVs via fuzzy_rename/conform).

    ``mergeSchema`` makes the scan union all file footers' fields;
    files missing a column yield NULLs for it. With ``schema`` given,
    the merged frame is then conformed to the contract (order, types,
    missing -> NULL) — so v1 files, v2 files, and the contract all
    coexist in one query. mergeSchema costs one footer pass per file at
    planning time; production tables should pin the contract schema
    once evolution settles (the ``schema`` arg IS that pin).
    """
    df = spark.read.option("mergeSchema", "true").parquet(path)
    return conform(df, schema) if schema is not None else df


# S2 — Excel scan (legiscan_normalizer.py:137). Spark core has no xlsx
# reader; the reference's Excel inputs are dim-sized curation sheets, so
# a driver-side read -> createDataFrame is the honest mapping. The codec
# is the stdlib zip+SpreadsheetML reader (sources/xlsx.py) — no
# openpyxl dependency, no gating.
def read_excel(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    from dissertation_data_pipeline_spark.sources import xlsx

    rows = xlsx.read_rows(path)
    if not rows:
        return conform(spark.createDataFrame([], schema), schema)
    header = [str(h) if h is not None else "" for h in rows[0]]
    # stringify cells so one untyped createDataFrame covers every sheet
    # (mixed int/str columns would break inference); conform() then
    # casts to the contract types. Blank cells stay NULL — never the
    # literal 'nan'/'None' (the module's NULL-canonicalization rule).
    data = [
        [
            None
            if v is None
            else (str(v).lower() if isinstance(v, bool) else str(v))
            for v in r
        ]
        for r in rows[1:]
    ]
    raw = spark.createDataFrame(
        data, StructType([StructField(h, StringType(), True) for h in header])
    )
    return conform(raw, schema)


# S5 — JSON-in-ZIP scan (legiscan_collector.py:241-251). ZIP is not a
# splittable format: each archive is one unit of work. binaryFile scan +
# driver/executor-side unzip keeps the *archives* distributed even
# though members of one archive are read serially.
def read_json_zip(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    member_glob: str = "*.json",
) -> DataFrame:
    """``member_glob`` is a real fnmatch glob over member names
    (default ``*.json`` — matches exactly the .json-suffixed members;
    ``data.json.bak`` does not slip through)."""
    bins = spark.read.format("binaryFile").load(path).select("path", "content")

    def explode_zip(iterator):
        import fnmatch
        import json

        import pandas as pd

        for pdf in iterator:
            rows = []
            for _, r in pdf.iterrows():
                with zipfile.ZipFile(io.BytesIO(r["content"])) as zf:
                    for name in zf.namelist():
                        if fnmatch.fnmatch(name, member_glob):
                            rows.append(
                                {"member": name, "json": zf.read(name).decode("utf-8", "replace")}
                            )
            yield pd.DataFrame(rows, columns=["member", "json"])

    members = bins.mapInPandas(explode_zip, "member string, json string")
    parsed = members.select(
        "member", F.from_json("json", schema).alias("rec")
    ).select("member", "rec.*")
    return parsed


# S10 — keyword/config scan (utils.py:173-181): line-per-term, '#' comments
def read_keywords(spark: SparkSession, path: str) -> list[str]:
    rows = (
        spark.read.text(path)
        .select(F.trim("value").alias("kw"))
        .filter((F.col("kw") != "") & ~F.col("kw").startswith("#"))
        .collect()
    )
    return [r["kw"] for r in rows]


# S9 — per-document text-file scan (normalize_corpus.py:171-177): the
# file-per-bill layout becomes (filename, text) rows joined by key.
def read_text_dir(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.format("binaryFile")
        .load(path)
        .select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("filename"),
            F.col("content").cast("string").alias("text"),
        )
    )


# P11 — name-based skip list in the loader (legiscan_normalizer.py:
# 127-129: hidden/config files skipped by name before parsing). File
# LISTING is a driver-side operation in Spark regardless (FileIndex),
# so applying include/skip globs to an explicit file list keeps
# skipped files out of the scan entirely — a post-scan filter on the
# path column would still read their bytes. Dot-prefixed files are
# additionally hidden from Spark's own listing (Hadoop convention),
# but the explicit list makes the skip POLICY visible and testable.
def read_text_dir_skip(
    spark: SparkSession,
    path: str,
    *,
    include_glob: str = "*",
    skip_globs: Sequence[str] = (),
) -> DataFrame:
    """P11's name-based skip list over a text directory: list files
    matching ``include_glob``, drop any whose basename matches a
    ``skip_globs`` fnmatch pattern, read the rest as (filename, text).

    Listing goes through the Hadoop FileSystem API (resolved from the
    path's scheme), so the skip policy works on any filesystem the
    Spark cluster can read — local, hdfs://, s3a:// — not just the
    driver's local disk (ADVICE r7: the original driver-side
    ``glob.glob`` silently failed on remote paths).  Dot-files are
    excluded from the listing to match both Python-glob and Spark
    hidden-file conventions regardless of the backend's glob dialect.

    Scale note: the listing is driver-side by nature (the skip list is
    a per-NAME policy, same as the reference's normalizer skip —
    legiscan_normalizer.py:127-129); the DATA read is a distributed
    binaryFile scan over the surviving paths."""
    import fnmatch

    sc = spark.sparkContext
    jvm = sc._jvm  # noqa: SLF001
    glob_path = jvm.org.apache.hadoop.fs.Path(os.path.join(path, include_glob))
    fs = glob_path.getFileSystem(sc._jsc.hadoopConfiguration())  # noqa: SLF001
    statuses = fs.globStatus(glob_path)
    files = sorted(
        str(st.getPath())
        for st in (statuses or [])
        if st.isFile()
        and not st.getPath().getName().startswith(".")
        and not any(
            fnmatch.fnmatch(st.getPath().getName(), g) for g in skip_globs
        )
    )
    if not files:
        raise FileNotFoundError(
            f"no files under {path!r} match {include_glob!r} after skips"
        )
    return (
        spark.read.format("binaryFile")
        .load(files)
        .select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("filename"),
            F.col("content").cast("string").alias("text"),
        )
    )


# K1/K2/K4 — sinks. Partitioning is the 100 TB story (SURVEY O-m8):
# layout by the pruning columns so test-scoped reads prune partitions.
def write_table(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    compression: str | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Columnar/text sink. ``fmt`` covers parquet/orc/csv/json (all
    built-in, splittable except json-gzip). ``compression`` picks the
    codec (parquet/orc: snappy default, zstd for cold data — better
    ratio, still splittable at the stripe/row-group level). At 100 TB,
    ``max_records_per_file`` is the file-size governor: without it a
    skewed final stage writes multi-GB files that downstream scans
    cannot split fairly."""
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        # RFC-4180 quoting on the write side too, so engine-written
        # CSVs round-trip through read_csv / pandas / DuckDB
        writer = writer.option("header", True).option("escape", '"')
    if compression:
        writer = writer.option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """ORC scan (S3-sibling of read_parquet): predicate pushdown and
    column pruning work the same as parquet; schema pinned when the
    contract is known."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


# K3 — styled Excel sink (legiscan_normalizer.py:386-399): one curated
# sheet with auto-sized columns. Driver-side by construction — the
# reference writes report-sized curation sheets, not data-plane output;
# callers hand in an aggregate/report DataFrame (rows ≈ groups).
def write_excel(
    df: DataFrame,
    path: str,
    *,
    sheet_name: str = "Bills",
    autosize: bool = True,
    width_cap: int = 50,
) -> None:
    """Write a small DataFrame to xlsx with the reference's column
    sizing: width = min(max(cell length, header length), cap) + 2
    (legiscan_normalizer.py:386-399). Stdlib codec (sources/xlsx.py) —
    driver-side because callers hand in report-sized frames; the
    distributed sink for data volumes is write_table(fmt='csv')."""
    from dissertation_data_pipeline_spark.sources import xlsx

    header = list(df.columns)
    rows = [list(r) for r in df.collect()]
    widths = None
    if autosize:
        widths = [
            min(
                max(
                    max((len(str(r[i])) for r in rows), default=0),
                    len(str(col)),
                ),
                width_cap,
            )
            + 2
            for i, col in enumerate(header)
        ]
    xlsx.write_rows(
        path, [header] + rows, sheet_name=sheet_name, col_widths=widths
    )


# O3 — glob-latest artifact resolution (fetch_texts.py:55-59,
# normalize_corpus.py:234-240, build_corpus.py:35-39): the reference's
# stage handoff is "newest timestamped file wins". Driver-side by
# design — path resolution is not a data-plane operation.
def latest_artifact(pattern: str) -> str:
    import glob as _glob

    matches = sorted(_glob.glob(pattern), reverse=True)
    if not matches:
        raise FileNotFoundError(f"no artifact matches {pattern!r}")
    return matches[0]


# K5 — report sink (normalize_corpus.py:308-330): small aggregate
# DataFrames formatted driver-side. Collect is legal here by
# construction — inputs are aggregate outputs, rows ≈ groups.
def write_report(sections: dict[str, DataFrame], path: str | None = None) -> str:
    lines: list[str] = []
    for title, df in sections.items():
        lines.append(f"== {title} ==")
        for row in df.collect():
            lines.append("  " + ", ".join(f"{k}={v}" for k, v in row.asDict().items()))
        lines.append("")
    text = "\n".join(lines)
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write(text)
    return text
