"""SURVEY §2 T-only conversions (round 7): driver-gate rows for
operators previously covered only by pytest because their output is a
file layout, a report string, or a schema transform rather than a
plain table. Each is expressed so the DuckDB oracle can state the
expected CONTENT (and, where the operator's point is the layout, the
layout invariant as an oracled literal):

- P11 skip-list scan       -> surviving files' (filename, text)
- J5  file-key join        -> scan side joined to a dim by the key
                              embedded in the filename
- K6  file-per-row sink    -> re-scanned rows + oracled file count
- O3  glob-latest artifact -> the newest artifact's rows (a wrong
                              pick hash-mismatches)
- A11 stats counters       -> the counters as one aggregate row
- F-s8 column normalize    -> data under contract names (the gate's
                              schema compare IS the assertion)
- K5  report sink          -> the formatted report string itself,
                              reconstructed literally in SQL
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from dissertation_data_pipeline_spark.plans.queries_fixtures import (
    _FIX,
    _tmp_layout,
)
from dissertation_data_pipeline_spark.plans.registry import register
from dissertation_data_pipeline_spark.tables import load_table


@register(
    "p11_skip_list_scan",
    f"""
    SELECT filename, text FROM (
      SELECT regexp_extract(filename, '([^/]+)$', 1) AS filename,
             content AS text
      FROM read_text('{_FIX}/p11_dir/*.txt')
    )
    -- both skip conventions stated: the loader's name skip — the glob
    -- is 'draft_*', so the SQL escapes the underscore ('draft%' would
    -- also exclude a draftX.txt the engine KEEPS — ADVICE r7) — and
    -- the dot-file hiding Spark's listing applies natively but
    -- DuckDB's glob does not
    WHERE filename NOT LIKE 'draft\\_%' ESCAPE '\\' AND filename NOT LIKE '.%'
    """,
)
def p11_skip_list_scan(spark, sf_dir):
    """P11 as a gate row (legiscan_normalizer.py:127-129): the loader's
    name-based skip list applied to a committed fixture directory that
    contains two ingestable bills, a 'draft_*' file the skip list must
    drop, a dot-file (hidden by listing convention in BOTH engines),
    and a config.ini the include glob excludes. The oracle re-states
    the skip as a WHERE over DuckDB's read_text."""
    from dissertation_data_pipeline_spark.sources.io import read_text_dir_skip

    return read_text_dir_skip(
        spark,
        f"{_FIX}/p11_dir",
        include_glob="*.txt",
        skip_globs=("draft_*",),
    )


@register(
    "j5_file_key_join",
    f"""
    SELECT regexp_extract(filename, 'bill_([A-Z0-9_]+)\\.txt$', 1) AS bill_key,
           v.state_name,
           content AS text
    FROM read_text('{_FIX}/s9_docs/*.txt')
    JOIN (VALUES ('CO_HB1', 'Colorado'),
                 ('UT_HJR3', 'Utah'),
                 ('WY_SB2', 'Wyoming')) v(bill_key, state_name)
      ON regexp_extract(filename, 'bill_([A-Z0-9_]+)\\.txt$', 1) = v.bill_key
    """,
)
def j5_file_key_join(spark, sf_dir):
    """J5 as a gate row (normalize_corpus.py:171-177 + the downstream
    key join): the file-per-bill directory scan keyed by the id
    embedded in each filename, joined to a small dim — the reference's
    'match fetched text files back to corpus rows' step. The dim
    broadcasts (3 rows); the scan side never shuffles."""
    from dissertation_data_pipeline_spark.sources.io import read_text_dir

    dim = spark.createDataFrame(
        [("CO_HB1", "Colorado"), ("UT_HJR3", "Utah"), ("WY_SB2", "Wyoming")],
        "bill_key string, state_name string",
    )
    docs = read_text_dir(spark, f"{_FIX}/s9_docs").select(
        F.regexp_extract("filename", r"bill_([A-Z0-9_]+)\.txt$", 1).alias(
            "bill_key"
        ),
        "text",
    )
    return docs.join(F.broadcast(dim), "bill_key").select(
        "bill_key", "state_name", "text"
    )


@register(
    "k6_file_per_row_sink",
    """
    SELECT n.n_name AS k,
           'nation ' || CAST(n.n_nationkey AS VARCHAR) || ' of ' || r.r_name
             AS value,
           CAST(25 AS BIGINT) AS n_files
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def k6_file_per_row_sink(spark, sf_dir):
    """K6 as a gate row (text_processor.py:113-155, fetch_texts.py:
    121-125: one text file per bill). The engine's layout for
    file-per-row is ``partitionBy(key)`` over a text sink — one
    hive directory per key, one file inside (SURVEY's
    'prefer columns-not-files' note documents why this is the sink,
    not the working representation). The round-trip re-scans the tree
    (partition discovery restores the key) and the oracle also pins
    the layout invariant: exactly one part-file per row, stated as the
    literal 25 (nation's fixed cardinality at every TPC-H SF)."""
    import glob as _glob

    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    per_row = nation.join(
        F.broadcast(region),
        nation["n_regionkey"] == region["r_regionkey"],
    ).select(
        F.concat(
            F.lit("nation "),
            F.col("n_nationkey").cast("string"),
            F.lit(" of "),
            F.col("r_name"),
        ).alias("value"),
        F.col("n_name").alias("k"),
    )
    path = _tmp_layout("k6rows", sf_dir)
    per_row.repartition("k").write.mode("overwrite").partitionBy("k").text(path)
    n_files = len(_glob.glob(os.path.join(path, "k=*", "part-*")))
    out = spark.read.text(path)  # partition discovery restores k
    return out.select(
        F.col("k").cast("string").alias("k"),
        F.col("value").alias("value"),
        F.lit(n_files).cast("long").alias("n_files"),
    )


@register(
    "o3_latest_artifact_scan",
    """
    SELECT o_orderkey AS orderkey, o_orderstatus AS status
    FROM orders WHERE o_orderkey % 3 = 2
    """,
)
def o3_latest_artifact_scan(spark, sf_dir):
    """O3 as a gate row (fetch_texts.py:55-59, normalize_corpus.py:
    234-240: newest timestamped artifact wins). Three timestamped CSV
    artifacts are written from DISJOINT slices of orders; the engine
    resolves the stage input via glob-latest and returns its rows —
    the oracle states the newest slice, so resolving any other
    artifact (or sorting names wrongly) hash-mismatches."""
    from dissertation_data_pipeline_spark.sources.io import (
        latest_artifact,
        read_csv,
        write_table,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderstatus").alias("status"),
    )
    base = _tmp_layout("o3art", sf_dir)
    for i, day in enumerate(("20260101", "20260102", "20260103")):
        write_table(
            orders.filter(F.col("orderkey") % 3 == i),
            os.path.join(base, f"results_{day}.csv"),
            fmt="csv",
        )
    newest = latest_artifact(os.path.join(base, "results_*.csv"))
    schema = StructType(
        [StructField("orderkey", LongType()), StructField("status", StringType())]
    )
    return read_csv(spark, newest, schema)


@register(
    "a11_stats_counters",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS INT) AS n_langs,
           CAST(count_if(n_chars < 150) AS BIGINT) AS n_short,
           CAST(count_if(lang = 'en') AS BIGINT) AS n_en,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    """,
)
def a11_stats_counters(spark, sf_dir):
    """A11 as a gate row (legiscan_collector.py:238-276,
    legiscan_enricher.py:519-525: per-run counter dicts). The engine's
    counters are ONE aggregate row over the data — map-side partial
    aggregation makes this a single reduce of five longs at any scale,
    replacing the reference's imperative `stats['x'] += 1` loops."""
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").cast("int").alias("n_langs"),
        F.count_if(F.col("n_chars") < 150).alias("n_short"),
        F.count_if(F.col("lang") == "en").alias("n_en"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@register(
    "fs8_column_normalize",
    """
    SELECT c_custkey AS cust_id, c_name AS name, c_mktsegment AS segment
    FROM customer
    """,
)
def fs8_column_normalize(spark, sf_dir):
    """F-s8 as a gate row (legiscan_normalizer.py:59-101: fuzzy header
    mapping). Messy source headers — padding, case, interior
    whitespace — are mapped onto contract names by ``fuzzy_rename``;
    the driver gate's SCHEMA comparison is the assertion (a missed or
    shadowed mapping changes the output columns), and the value hash
    proves the rename never reorders or corrupts data."""
    from dissertation_data_pipeline_spark.schemas import fuzzy_rename

    messy = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("Cust  Key"),
        F.col("c_name").alias("CUSTOMER NAME"),
        F.col("c_mktsegment").alias(" Mkt Segment "),
    )
    return fuzzy_rename(
        messy,
        {
            "cust_id": ["cust key"],
            "name": ["customer name"],
            "segment": ["mkt segment"],
        },
    ).select("cust_id", "name", "segment")


@register(
    "s6_rest_pages_fixture",
    f"""
    SELECT jurisdiction, session, identifier, title,
           CAST(regexp_extract(filename, 'page-(\\d+)\\.json', 1) AS INT)
             AS page
    FROM read_json('{_FIX}/s6_pages/page-*.json',
                    columns = {{'jurisdiction': 'VARCHAR',
                                'session': 'VARCHAR',
                                'identifier': 'VARCHAR',
                                'title': 'VARCHAR'}},
                    filename = true)
    """,
)
def s6_rest_pages_fixture(spark, sf_dir):
    """S6 as a gate row: the paginated-feed DataSource reads the
    committed 3-page fixture through its file:// transport with
    ``max_parallel_pages=2`` — pages round-robined into 2 partitions,
    each fetching ITS pages sequentially (the hard concurrency bound
    against rate-limited APIs), so the gate exercises the REAL
    partition planning, not a happy path. The oracle reads the same
    page files and restates the page tag from the filename.
    Reference: legiscan_collector.py paginated getMasterList."""
    from dissertation_data_pipeline_spark.sources.datasource import (
        HAVE_DATASOURCE_API,
        RestPagesDataSource,
    )

    if not HAVE_DATASOURCE_API:  # pragma: no cover - pyspark>=4 here
        raise RuntimeError("rest_pages needs the pyspark-4 DataSource API")
    spark.dataSource.register(RestPagesDataSource)
    return (
        spark.read.format("rest_pages")
        .option("endpoint", f"file://{_FIX}/s6_pages")
        .option("pages", "3")
        .option("max_parallel_pages", "2")
        .load()
    )


@register(
    "s8_point_lookup",
    """
    SELECT key,
           CASE WHEN hit THEN 'v-' || substr(md5(key), 1, 8) END AS value,
           hit AS found
    FROM (
      SELECT DISTINCT c_name AS key,
             CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) % 3 <> 0
               AS hit
      FROM customer WHERE c_custkey % 50 = 0
    )
    """,
)
def s8_point_lookup(spark, sf_dir):
    """S8 as a gate row (legiscan_enricher.py:171-427 per-key lookup,
    re-shaped distinct-keys-first): ``fetch_missing_keys`` runs the
    injected fetch over DISTINCT keys in a bounded number of client
    partitions (here 1 — the reference's sequential client), emitting
    misses as first-class found=false rows (I4). The injected fetch is
    deterministic (md5 of the key; every third key a miss) so the
    oracle restates the whole lookup in SQL — what the gate proves is
    the distinct/repartition/mapInPandas machinery and the
    negative-result contract, with no network anywhere."""
    from dissertation_data_pipeline_spark.sources.rest import fetch_missing_keys

    def fetch(keys):
        import hashlib
        import re as _re

        out = {}
        for k in keys:
            m = _re.search(r"(\d+)$", k)
            n = int(m.group(1)) if m else 0
            out[k] = (
                "v-" + hashlib.md5(k.encode()).hexdigest()[:8]
                if n % 3
                else None
            )
        return out

    keys = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 50 == 0)
        .select(F.col("c_name").alias("key"))
    )
    return fetch_missing_keys(keys, "key", fetch, fetch_partitions=1)


@register(
    "k5_report_fixture",
    """
    SELECT '== status_counts ==' || chr(10) ||
           string_agg('  status=' || status || ', n=' || CAST(n AS VARCHAR),
                      chr(10) ORDER BY status) || chr(10) AS report
    FROM (SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n
          FROM orders GROUP BY 1)
    """,
)
def k5_report_fixture(spark, sf_dir):
    """K5 as a gate row (normalize_corpus.py:308-330: the human-readable
    run report). ``write_report`` formats aggregate sections driver-side
    (collect is legal by construction — rows = groups); the oracle
    reconstructs the exact report string in SQL, so format drift
    (separators, ordering, trailing newline) hash-mismatches."""
    from dissertation_data_pipeline_spark.sources.io import write_report

    counts = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status")
    )
    text = write_report({"status_counts": counts})
    return spark.createDataFrame([(text,)], "report string")
