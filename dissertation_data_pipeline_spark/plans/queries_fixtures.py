"""Gate rows for the IO surfaces that have no data-plane table: the
bulk-dataset DataSource (S7), the stdlib Excel reader (S2), and PDF
text extraction (U-f2) run against small fixtures COMMITTED to the
repo, so the external DuckDB gate hash-verifies them like any other
query instead of trusting pytest alone.

The fixtures are deterministic by construction (hand-written JSON, a
one-sheet xlsx written by the engine's own codec, a Flate text-object
PDF), and the oracles are independent re-statements: DuckDB reads the
same JSON files for S7; the xlsx/PDF oracles are literal VALUES — the
expected content written down separately from the code under test.
These queries ignore ``sf_dir`` on purpose: their input is the
fixture, the same at every scale factor.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from dissertation_data_pipeline_spark.plans.registry import register

#: repo root, derived from this file's location so the driver's cwd
#: never matters (plans/ -> package -> repo)
_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_FIX = os.path.join(_REPO, "tests", "fixtures")


@register(
    "s7_bulk_datasets_fixture",
    f"""
    SELECT l.dataset_id,
           l.content_hash,
           r.record_id,
           r.payload
    FROM read_json('{_FIX}/s7_bulk/datasets.json',
                    columns = {{'dataset_id': 'VARCHAR',
                                'content_hash': 'VARCHAR'}}) l
    JOIN (
      SELECT regexp_extract(filename, 'dataset-(.*)\\.json', 1) AS dataset_id,
             record_id, payload
      FROM read_json('{_FIX}/s7_bulk/dataset-*.json',
                     columns = {{'record_id': 'VARCHAR',
                                 'payload': 'VARCHAR'}},
                     filename = true)
    ) r USING (dataset_id)
    """,
)
def s7_bulk_datasets_fixture(spark, sf_dir):
    """S7 as a gate row: the batch bulk-dataset DataSource reads the
    committed fixture feed (one partition per dataset, no state file
    so every dataset is 'changed'); the oracle joins the same listing
    and dataset JSON files in DuckDB."""
    from dissertation_data_pipeline_spark.sources.datasource import (
        HAVE_DATASOURCE_API,
        BulkDatasetsDataSource,
    )

    if not HAVE_DATASOURCE_API:  # pragma: no cover - pyspark>=4 here
        raise RuntimeError("bulk_datasets needs the pyspark-4 DataSource API")
    spark.dataSource.register(BulkDatasetsDataSource)
    return (
        spark.read.format("bulk_datasets")
        .option("endpoint", f"file://{_FIX}/s7_bulk")
        .load()
    )


@register(
    "s2_excel_fixture",
    """
    SELECT * FROM (VALUES
      ('CO', 'HB1',  'School Finance', 2023),
      ('WY', 'SB2',  NULL,             2022),
      ('CO', 'HB22', 'Water Rights',   2024)
    ) AS t(state, bill_number, title, year)
    """,
)
def s2_excel_fixture(spark, sf_dir):
    """S2 as a gate row: the stdlib xlsx codec reads the committed
    one-sheet workbook and conforms it to a typed contract; the oracle
    states the expected sheet content as literal VALUES."""
    from dissertation_data_pipeline_spark.sources.io import read_excel

    schema = StructType(
        [
            StructField("state", StringType()),
            StructField("bill_number", StringType()),
            StructField("title", StringType()),
            StructField("year", IntegerType()),
        ]
    )
    return read_excel(spark, f"{_FIX}/s2_bills.xlsx", schema)


@register(
    "uf2_pdf_fixture",
    """
    SELECT 'B1' AS bill_id,
           'Colorado HB1 establishes school finance '
           || 'provisions for the 2023 fiscal year.' AS raw_text
    """,
)
def uf2_pdf_fixture(spark, sf_dir):
    """U-f2 as a gate row: extract_documents (the mapInPandas decision
    stage) decodes the committed Flate text-object PDF; the oracle
    states the expected extracted text literally.  Extracted text is
    whitespace-normalized on the Spark side so the row is
    environment-independent: pdf_to_text prefers pypdf when installed,
    and pypdf's line-break/layout whitespace differs from the stdlib
    fallback while the token stream is identical."""
    import base64

    from dissertation_data_pipeline_spark.operators.text_udf import (
        extract_documents,
    )

    with open(f"{_FIX}/uf2_bill.pdf", "rb") as fh:
        payload = base64.b64encode(fh.read()).decode()
    docs = spark.createDataFrame(
        [("B1", "application/pdf", payload)],
        "bill_id string, mime string, doc_b64 string",
    )
    return extract_documents(docs).select(
        "bill_id",
        F.regexp_replace(F.trim(F.col("raw_text")), r"\s+", " ").alias(
            "raw_text"
        ),
    )
