"""[EXT] analytics-wave queries: pivot/unpivot, CUBE, window suite,
funnel, fuzzy matching, TF-IDF / BM25 ranking, set intersection.

Cross-engine conventions (registry module docstring applies):
- counts CAST to BIGINT in DuckDB (its integer SUM widens to HUGEINT,
  which the gate canon mis-hashes);
- money sums in DECIMAL(18,2), final cast to DOUBLE;
- every float division rounded to 6dp on both sides;
- BM25 contributions integer-canonicalized (micro-units) before the
  per-document sum so float addition order can't matter;
- ``ln`` is the one libm call (TF-IDF idf, BM25 idf): both engines
  evaluate the same double expression and the result is rounded before
  ranking/publication.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators import analytics as an
from dissertation_data_pipeline_spark.operators import textrank as tr
from dissertation_data_pipeline_spark.plans.registry import register
from dissertation_data_pipeline_spark.tables import load_table


@register(
    "ext_pivot_wide",
    """
    SELECT year(o_orderdate) AS order_year,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS rev_p
    FROM orders GROUP BY 1
    """,
)
def ext_pivot_wide(spark, sf_dir):
    """[EXT] year × status pivot with an explicit value list — one
    aggregation pass, fixed schema, no value-discovery job (the
    distributed form of the reference's driver-side value_counts
    crosstabs, build_master_corpus.py:149-151)."""
    return an.pivot_year_status(load_table(spark, sf_dir, "orders"))


@register(
    "ext_unpivot_melt",
    """
    WITH wide AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n_lines,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, 'n_lines' AS metric, n_lines AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_qty', sum_qty FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM wide
    """,
)
def ext_unpivot_melt(spark, sf_dir):
    """[EXT] melt (unpivot) a wide per-flag aggregate into long form —
    an Expand over the metric columns, zero shuffles beyond the
    aggregation itself."""
    return an.unpivot_returnflag_metrics(load_table(spark, sf_dir, "lineitem"))


@register(
    "ext_cube_totals",
    """
    SELECT o_orderstatus,
           year(o_orderdate) AS order_year,
           CAST(GROUPING(o_orderstatus, year(o_orderdate)) AS BIGINT) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, year(o_orderdate))
    """,
)
def ext_cube_totals(spark, sf_dir):
    """[EXT] CUBE(status, year): cells, both subtotal planes, grand
    total — ONE Expand + one aggregation with map-side partials, not
    four scans. grouping_id bit order (first col = MSB) matches
    DuckDB's GROUPING()."""
    return an.cube_status_year(load_table(spark, sf_dir, "orders")).withColumn(
        "gid", F.col("gid").cast("long")
    )


@register(
    "ext_window_suite",
    """
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS seq,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume_dist,
           date_diff('day',
                     lag(CAST(o_orderdate AS DATE)) OVER w,
                     CAST(o_orderdate AS DATE)) AS days_since_prev,
           round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w3 AS DOUBLE)
                 / (COUNT(*) OVER w3), 6) AS moving_avg_3,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER wrun AS DOUBLE) AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           w3 AS (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
           wrun AS (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def ext_window_suite(spark, sf_dir):
    """[EXT] per-customer order-sequence window suite: all seven
    analytics share one window spec -> one shuffle + one sort.
    Deterministic total order (date, orderkey); moving average is an
    exact DECIMAL frame-sum over the frame count."""
    return an.window_suite(load_table(spark, sf_dir, "orders"))


@register(
    "ext_funnel_stages",
    """
    WITH s1 AS (
      SELECT user_id AS u, min(ts) AS t FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ), s2 AS (
      SELECT e.user_id AS u, min(e.ts) AS t FROM events e JOIN s1 ON e.user_id = s1.u
      WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1
    ), s3 AS (
      SELECT e.user_id AS u, min(e.ts) AS t FROM events e JOIN s2 ON e.user_id = s2.u
      WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1
    ), s4 AS (
      SELECT e.user_id AS u, min(e.ts) AS t FROM events e JOIN s3 ON e.user_id = s3.u
      WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1
    )
    SELECT CAST(1 AS INTEGER) AS stage_idx, 'signup' AS stage, (SELECT COUNT(*) FROM s1) AS n_users
    UNION ALL SELECT 2, 'view', (SELECT COUNT(*) FROM s2)
    UNION ALL SELECT 3, 'click', (SELECT COUNT(*) FROM s3)
    UNION ALL SELECT 4, 'purchase', (SELECT COUNT(*) FROM s4)
    """,
)
def ext_funnel_stages(spark, sf_dir):
    """[EXT] ordered-stage funnel (signup -> view -> click ->
    purchase): per stage one groupBy(user).min(ts) + equi-join on the
    previous stage — shuffles on user_id only, never an event-level
    self-join."""
    return an.funnel_conversion(load_table(spark, sf_dir, "events"))


@register(
    "ext_fuzzy_levenshtein_pairs",
    """
    SELECT a.p_brand, a.p_type,
           a.p_partkey AS id_a, b.p_partkey AS id_b,
           levenshtein(a.p_name, b.p_name) AS distance
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_type = b.p_type
     AND a.p_partkey < b.p_partkey
    WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
       AND levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def ext_fuzzy_levenshtein_pairs(spark, sf_dir):
    """[EXT] blocked edit-distance matching over part names within
    (brand, type) blocks — co-located equi-join, quadratic only per
    block, levenshtein evaluated inside the join stage."""
    return an.fuzzy_pairs_levenshtein(
        load_table(spark, sf_dir, "part"),
        "p_partkey",
        "p_name",
        ["p_brand", "p_type"],
        max_distance=2,
    )


_TF_SQL = r"""
  SELECT doc_id AS _id, tok AS _tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
    FROM documents
  ) WHERE len(tok) > 0 GROUP BY 1, 2
"""


@register(
    "ext_tfidf_top_terms",
    f"""
    WITH tf AS ({_TF_SQL}),
    dfreq AS (SELECT _tok, CAST(COUNT(*) AS BIGINT) AS _df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(DISTINCT doc_id) AS _n FROM documents),
    scored AS (
      SELECT tf._id, tf._tok,
             round(tf.tf * (ln((n._n + 1) / (dfreq._df + 1)) + 1.0), 6) AS score
      FROM tf JOIN dfreq ON tf._tok = dfreq._tok CROSS JOIN n
    )
    SELECT _id AS doc_id, _tok AS term, term_rank, score FROM (
      SELECT *, row_number() OVER (PARTITION BY _id ORDER BY score DESC, _tok ASC) AS term_rank
      FROM scored
    ) WHERE term_rank <= 3
    """,
)
def ext_tfidf_top_terms(spark, sf_dir):
    """[EXT] top-3 characteristic terms per document by smoothed
    TF-IDF — single-exchange tf build, map-side-combined df, broadcast
    corpus size, one per-doc ranking window."""
    return tr.tfidf_top_terms(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", k=3
    )


#: fixed query for the BM25 demo: mixed-df terms from the corpus vocab
BM25_QUERY = ("spark", "query", "vector")


@register(
    "ext_bm25_rank",
    f"""
    WITH tf AS ({_TF_SQL}),
    dl AS (SELECT _id, CAST(SUM(tf) AS BIGINT) AS _dl FROM tf GROUP BY 1),
    qtf AS (SELECT * FROM tf WHERE _tok IN ('spark', 'query', 'vector')),
    dfreq AS (SELECT _tok, CAST(COUNT(*) AS BIGINT) AS _df FROM qtf GROUP BY 1),
    corpus AS (
      SELECT COUNT(*) AS _n,
             CAST(CAST(SUM(_dl) AS DECIMAL(38,10)) / COUNT(*) AS DOUBLE) AS _avgdl
      FROM dl
    ),
    scored AS (
      SELECT qtf._id,
             SUM(CAST(round(
               ln(1.0 + (corpus._n - dfreq._df + 0.5) / (dfreq._df + 0.5))
               * (qtf.tf * (1.2 + 1)) / (qtf.tf + 1.2 * (1 - 0.75 + 0.75 * dl._dl / corpus._avgdl))
               * 1e6, 0) AS BIGINT)) / 1e6 AS score
      FROM qtf
      JOIN dfreq ON qtf._tok = dfreq._tok
      JOIN dl ON qtf._id = dl._id
      CROSS JOIN corpus
      GROUP BY 1
    )
    SELECT rank, doc_id, score FROM (
      SELECT row_number() OVER (ORDER BY score DESC, _id ASC) AS rank,
             _id AS doc_id, score
      FROM scored
    ) WHERE rank <= 20
    """,
)
def ext_bm25_rank(spark, sf_dir):
    """[EXT] Okapi BM25 (k1=1.2, b=0.75) top-20 over the corpus for a
    fixed term set — integer-canonicalized contributions, TakeOrdered
    top-n (never a global single-partition sort of the corpus)."""
    return tr.bm25_rank(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        BM25_QUERY,
        k1=1.2,
        b=0.75,
        top_n=20,
    )


@register(
    "ext_intersect_segments",
    """
    SELECT DISTINCT c_mktsegment FROM customer WHERE c_nationkey = 0
    INTERSECT
    SELECT DISTINCT c_mktsegment FROM customer WHERE c_nationkey = 1
    """,
)
def ext_intersect_segments(spark, sf_dir):
    """[EXT] INTERSECT set operation (the U-family sibling of
    u2_except): market segments present in both nation 0 and
    nation 1."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_nationkey") == 0)
        .select("c_mktsegment")
        .intersect(c.filter(F.col("c_nationkey") == 1).select("c_mktsegment"))
    )


@register(
    "ext_dq_checks",
    """
    WITH n AS (SELECT COUNT(*) AS n_rows FROM orders),
    report AS (
      SELECT 'foreign_key(o_custkey)' AS "check",
             CAST((SELECT COUNT(*) FROM orders o
                   WHERE o.o_custkey IS NOT NULL
                     AND NOT EXISTS (SELECT 1 FROM customer c
                                     WHERE c.c_custkey = o.o_custkey)) AS BIGINT) AS violations,
             (SELECT n_rows FROM n) AS n_rows
      UNION ALL
      SELECT 'in_range(o_totalprice)',
             CAST((SELECT COUNT(*) FROM orders
                   WHERE o_totalprice IS NULL OR o_totalprice < 0
                      OR o_totalprice > 1000000) AS BIGINT),
             (SELECT n_rows FROM n)
      UNION ALL
      SELECT 'in_set(o_orderstatus)',
             CAST((SELECT COUNT(*) FROM orders
                   WHERE o_orderstatus IS NULL
                      OR o_orderstatus NOT IN ('F', 'O', 'P')) AS BIGINT),
             (SELECT n_rows FROM n)
      UNION ALL
      SELECT 'matches(o_orderpriority)',
             CAST((SELECT COUNT(*) FROM orders
                   WHERE o_orderpriority IS NULL
                      OR NOT regexp_full_match(o_orderpriority, '[1-5]-[A-Z ]+')) AS BIGINT),
             (SELECT n_rows FROM n)
      UNION ALL
      SELECT 'not_null(o_orderdate)',
             CAST((SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL) AS BIGINT),
             (SELECT n_rows FROM n)
      UNION ALL
      SELECT 'not_null(o_orderkey)',
             CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) AS BIGINT),
             (SELECT n_rows FROM n)
      UNION ALL
      SELECT 'unique(o_orderkey)',
             CAST((SELECT COALESCE(SUM(cnt), 0) FROM (
                     SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey
                   ) WHERE cnt > 1) AS BIGINT),
             (SELECT n_rows FROM n)
    )
    SELECT "check", violations, n_rows, violations = 0 AS passed
    FROM report ORDER BY 1
    """,
)
def ext_dq_checks(spark, sf_dir):
    """[EXT] declarative expectations over orders: six constraint kinds
    in one report — all row-local checks share ONE aggregation pass;
    unique adds one key-only groupBy; the FK check is a broadcast
    left-anti count (quality_checks.py; the reference's ad-hoc
    analogues: legiscan_enricher.py:333-341, build_corpus.py:103)."""
    from dissertation_data_pipeline_spark.operators import quality_checks as qc

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return qc.run_checks(
        o,
        [
            qc.not_null("o_orderkey"),
            qc.not_null("o_orderdate"),
            qc.in_set("o_orderstatus", ["F", "O", "P"]),
            qc.in_range("o_totalprice", 0, 1_000_000),
            qc.matches("o_orderpriority", "[1-5]-[A-Z ]+"),
            qc.unique("o_orderkey"),
            qc.foreign_key("o_custkey", c, "c_custkey"),
        ],
    )


def _topic_sql(words) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        r"len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\s+')), "
        f"[{lst}])) > 0"
    )


@register(
    "ext_rule_classifier",
    f"""
    WITH flags AS (
      SELECT doc_id,
             {_topic_sql(tr.TOPIC_RULES["scans"])} AS has_scans,
             {_topic_sql(tr.TOPIC_RULES["joins"])} AS has_joins,
             {_topic_sql(tr.TOPIC_RULES["aggregation"])} AS has_aggregation,
             {_topic_sql(tr.TOPIC_RULES["streaming"])} AS has_streaming,
             {_topic_sql(tr.TOPIC_RULES["storage"])} AS has_storage,
             {_topic_sql(tr.TOPIC_RULES["performance"])} AS has_performance,
             {_topic_sql(tr.TOPIC_RULES["vectors"])} AS has_vectors
      FROM documents
    )
    SELECT doc_id, has_scans, has_joins, has_aggregation, has_streaming,
           has_storage, has_performance, has_vectors,
           (has_scans::INT + has_joins::INT + has_aggregation::INT
            + has_streaming::INT + has_storage::INT + has_performance::INT
            + has_vectors::INT) AS n_topics,
           CASE WHEN NOT (has_scans OR has_joins OR has_aggregation OR has_streaming
                          OR has_storage OR has_performance OR has_vectors)
                THEN 'covers: none'
                ELSE 'covers: ' || concat_ws(', ',
                  CASE WHEN has_scans THEN 'scans' END,
                  CASE WHEN has_joins THEN 'joins' END,
                  CASE WHEN has_aggregation THEN 'aggregation' END,
                  CASE WHEN has_streaming THEN 'streaming' END,
                  CASE WHEN has_storage THEN 'storage' END,
                  CASE WHEN has_performance THEN 'performance' END,
                  CASE WHEN has_vectors THEN 'vectors' END)
           END AS summary
    FROM flags
    """,
)
def ext_rule_classifier(spark, sf_dir):
    """[EXT-parity] rule-based multi-label classifier: the shape of the
    reference's co_pilot_summary.csv (7 binary strategy columns +
    plain_language_summary; the producing classify_co_pilot.py is
    absent upstream — SURVEY §2.10). Topic dictionaries over distinct
    tokens, topic count, and an assembled summary — pure scan-speed
    expressions."""
    d = load_table(spark, sf_dir, "documents")
    cls = tr.rule_classify("text")
    return d.select("doc_id", *[c.alias(n) for n, c in cls.items()])


@register(
    "ext_snapshot_diff",
    """
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0
    ), new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
             CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           CASE WHEN old.o_orderkey IS NULL THEN 'added'
                WHEN new.o_orderkey IS NULL THEN 'removed'
                WHEN old.o_orderstatus IS DISTINCT FROM new.o_orderstatus
                  OR old.o_totalprice IS DISTINCT FROM new.o_totalprice THEN 'changed'
                ELSE 'unchanged' END AS status,
           CASE WHEN old.o_orderkey IS NOT NULL AND new.o_orderkey IS NOT NULL
                 AND (old.o_orderstatus IS DISTINCT FROM new.o_orderstatus
                      OR old.o_totalprice IS DISTINCT FROM new.o_totalprice)
                THEN concat_ws(',',
                  CASE WHEN old.o_orderstatus IS DISTINCT FROM new.o_orderstatus THEN 'o_orderstatus' END,
                  CASE WHEN old.o_totalprice IS DISTINCT FROM new.o_totalprice THEN 'o_totalprice' END)
                ELSE '' END AS changed_cols
    FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    """,
)
def ext_snapshot_diff(spark, sf_dir):
    """[EXT] full-outer snapshot reconciliation (added / removed /
    changed / unchanged + changed-column list) between two synthesized
    order snapshots — the incremental-pipeline "what changed this run"
    primitive, one shuffle join on the key
    (operators/relational.py::snapshot_diff)."""
    from dissertation_data_pipeline_spark.operators.relational import snapshot_diff

    o = load_table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 11 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 1)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return snapshot_diff(
        old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    )


@register(
    "ext_triangle_count",
    """
    WITH li AS (
      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > 40
    ), edges AS (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                      greatest(a.l_partkey, b.l_partkey) AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT (SELECT COUNT(*) FROM edges e1
            JOIN edges e2 ON e1.v = e2.u
            JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles,
           (SELECT COUNT(*) FROM (SELECT DISTINCT id FROM
              (SELECT u AS id FROM edges UNION ALL SELECT v FROM edges))) AS n_nodes,
           (SELECT COUNT(*) FROM edges) AS n_edges,
           CAST(0 AS BIGINT) AS n_dropped_nodes
    """,
)
def ext_triangle_count(spark, sf_dir):
    """[EXT] exact triangle count of the high-quantity co-purchase
    graph (parts sharing an order) by degree-ordered wedge closing
    (operators/graphs.py — Suri & Vassilvitskii orientation: out-degree
    bounded by O(sqrt m), no reducer owns a hub's neighborhood). The
    oracle brute-forces the 3-way edge join over normalized u<v<w
    edges — same count, quadratic shape the operator avoids."""
    from dissertation_data_pipeline_spark.operators import graphs as g

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 40)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("id_a"), F.col("b.l_partkey").alias("id_b")
    )
    return g.triangle_count(g.normalize_edges(pairs))


@register(
    "ext_rolling_features",
    """
    WITH cents AS (
      SELECT user_id, ts, event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ), roll AS (
      SELECT user_id, ts, event_id, v,
             lag(v, 1) OVER w AS l1,
             lag(v, 2) OVER w AS l2,
             lag(v, 3) OVER w AS l3,
             CAST(count(*) OVER w4 AS BIGINT) AS n,
             CAST(sum(v) OVER w4 AS BIGINT) AS s,
             CAST(sum(v * v) OVER w4 AS BIGINT) AS s2
      FROM cents
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
             w4 AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, ts, event_id,
           round(v::DOUBLE / 100, 6) AS value,
           round(l1::DOUBLE / 100, 6) AS lag1,
           round(s::DOUBLE / n / 100, 6) AS roll_mean,
           round(sqrt(greatest(s2::DOUBLE / n
                               - (s::DOUBLE / n) * (s::DOUBLE / n), 0))
                 / 100, 6) AS roll_std,
           round((v * 8 + COALESCE(l1 * 4, 0) + COALESCE(l2 * 2, 0)
                  + COALESCE(l3, 0))::DOUBLE
                 / (8 + CASE WHEN l1 IS NULL THEN 0 ELSE 4 END
                      + CASE WHEN l2 IS NULL THEN 0 ELSE 2 END
                      + CASE WHEN l3 IS NULL THEN 0 ELSE 1 END)
                 / 100, 6) AS ewma
    FROM roll
    """,
)
def ext_rolling_features(spark, sf_dir):
    """[EXT] per-user rolling ML features (lag, 4-row rolling mean /
    population std from exact integer moments, bounded EWMA with
    power-of-two weights) — the standard temporal feature block, in
    the engine's exact-arithmetic discipline: every float output is a
    bounded number of ops over bit-identical int64 inputs, rounded to
    6dp. One shuffle on user_id; all windows share the (ts, event_id)
    total order."""
    from dissertation_data_pipeline_spark.operators.analytics import (
        rolling_features,
    )

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return rolling_features(
        ev, "user_id", "ts", "value", id_col="event_id", window_rows=4
    )
