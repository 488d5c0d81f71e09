"""[EXT] Feature-engineering / ML-prep queries: hash split, hashing-
trick features, leave-one-out target encoding, one-pass correlation
matrix, privacy release prep (pseudonymization + k-anonymity), table
profiling, label-centroid similarity, SQL-surface demos (plain ANSI +
GROUPING SETS), z-score scaling, deterministic negative sampling.

Oracle portability notes: DuckDB has no ``conv(hex, 16, 10)``, so the
md5-uniform is spelled as a strpos-digit sum (same trick as
``queries_training``); correlation is computed from exact integer
moment sums with the IDENTICAL final-formula structure on both sides,
so every float op sees bit-identical inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators.features import (
    feature_hash_long,
    split_assign,
    target_encode_loo,
)
from dissertation_data_pipeline_spark.plans.registry import register
from dissertation_data_pipeline_spark.tables import load_table


def _h_sql(expr: str) -> str:
    """DuckDB md5-uniform u32 of a VARCHAR sql expression (mirrors
    ``operators.training.uniform_hash_u32``)."""
    return " + ".join(
        f"CAST((strpos('0123456789abcdef', substr(md5({expr}), "
        f"{i + 1}, 1)) - 1) AS BIGINT) * {16 ** (7 - i)}"
        for i in range(8)
    )


@register(
    "ext_train_split",
    f"""
    WITH s AS (
      SELECT lang, n_chars,
             CASE WHEN ({_h_sql('CAST(doc_id AS VARCHAR)')}) % 100 < 80
                    THEN 'train'
                  WHEN ({_h_sql('CAST(doc_id AS VARCHAR)')}) % 100 < 90
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY 1, 2
    """,
)
def ext_train_split(spark, sf_dir):
    """[EXT] Deterministic 80/10/10 train/val/test assignment from the
    md5 uniform of doc_id, reported as per-(split, lang) counts. The
    split is a pure scan-side expression — no shuffle to assign, stable
    under re-ingestion, any partitioning, any engine — which is the
    property a training pipeline needs so eval sets never contaminate
    across reruns."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(split_assign("doc_id").alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "ext_feature_hashing",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok
      FROM documents
    )
    SELECT doc_id,
           CAST(({_h_sql('tok')}) % 64 AS BIGINT) AS slot,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks WHERE len(tok) > 0 GROUP BY 1, 2
    """,
)
def ext_feature_hashing(spark, sf_dir):
    """[EXT] Hashing-trick features (Weinberger et al. 2009): tokens
    into 64 md5 slots, long-form (doc_id, slot, cnt) output — the
    sparse representation that scales (see
    ``operators/features.py::feature_hash_long``). One explode + one
    map-side-combined groupBy, no joins, no vocabulary state."""
    d = load_table(spark, sf_dir, "documents")
    return feature_hash_long(d, "doc_id", "text", n_slots=64).select(
        F.col("_id").alias("doc_id"), "slot", "cnt"
    )


@register(
    "ext_target_encoding",
    """
    WITH agg AS (
      SELECT source,
             CAST(SUM(n_chars) AS BIGINT) AS s,
             CAST(COUNT(n_chars) AS BIGINT) AS c
      FROM documents GROUP BY 1
    )
    SELECT d.doc_id, d.source,
           round(CAST(agg.s - d.n_chars AS DOUBLE)
                 / CAST(nullif(agg.c - 1, 0) AS DOUBLE), 6) AS loo_target_mean
    FROM documents d JOIN agg USING (source)
    """,
)
def ext_target_encoding(spark, sf_dir):
    """[EXT] Leakage-free categorical encoding: source -> leave-one-out
    mean of n_chars ((sum - own)/(cnt - 1), exact integer sums, one
    final division). Per-category aggregate is one row per category at
    any scale — broadcast back, no second pass over the target."""
    d = load_table(spark, sf_dir, "documents")
    return target_encode_loo(
        d.select("doc_id", "source", "n_chars"), "source", "n_chars"
    ).select("doc_id", "source", "loo_target_mean")


_CORR_COLS = {
    "q": "l_quantity",
    "p": "l_extendedprice",
    "d": "l_discount",
    "t": "l_tax",
}
_CORR_PAIRS = [("q", "p"), ("q", "d"), ("q", "t"), ("p", "d"), ("p", "t"), ("d", "t")]


def _corr_sql() -> str:
    cents = ", ".join(
        f"CAST(CAST({c} AS DECIMAL(18,2)) * 100 AS BIGINT) AS {k}"
        for k, c in _CORR_COLS.items()
    )
    sums = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for k in _CORR_COLS:
        sums.append(f"SUM({k}) AS s{k}")
        sums.append(f"SUM({k} * {k}) AS s{k}{k}")
    for a, b in _CORR_PAIRS:
        sums.append(f"SUM({a} * {b}) AS s{a}{b}")

    def corr(a: str, b: str) -> str:
        # identical formula structure to the Spark side: means first,
        # then covariance/variances, then one sqrt — every input to a
        # float op is an exact-integer cast
        return (
            f"round((CAST(s{a}{b} AS DOUBLE) / CAST(n AS DOUBLE)"
            f" - (CAST(s{a} AS DOUBLE) / CAST(n AS DOUBLE))"
            f" * (CAST(s{b} AS DOUBLE) / CAST(n AS DOUBLE)))"
            f" / sqrt("
            f"(CAST(s{a}{a} AS DOUBLE) / CAST(n AS DOUBLE)"
            f" - (CAST(s{a} AS DOUBLE) / CAST(n AS DOUBLE))"
            f" * (CAST(s{a} AS DOUBLE) / CAST(n AS DOUBLE)))"
            f" * (CAST(s{b}{b} AS DOUBLE) / CAST(n AS DOUBLE)"
            f" - (CAST(s{b} AS DOUBLE) / CAST(n AS DOUBLE))"
            f" * (CAST(s{b} AS DOUBLE) / CAST(n AS DOUBLE)))), 6)"
        )

    arms = " UNION ALL ".join(
        f"SELECT '{_CORR_COLS[a]}' AS col_a, '{_CORR_COLS[b]}' AS col_b, "
        f"{corr(a, b)} AS corr FROM m"
        for a, b in _CORR_PAIRS
    )
    return f"""
    WITH cents AS (SELECT {cents} FROM lineitem),
    m AS (SELECT {', '.join(sums)} FROM cents)
    {arms}
    """


@register("ext_corr_matrix", _corr_sql())
def ext_corr_matrix(spark, sf_dir):
    """[EXT] Pearson correlation matrix of the four lineitem measures
    in ONE aggregation pass: 15 integer moment sums (cents; the squared
    -price sums exceed int64 so they accumulate as DECIMAL(38,0) /
    HUGEINT — still exact), then each pairwise correlation is a fixed
    dag of IEEE ops on exact integers, identical on both engines.

    This is the moment-sketch pattern at its best: the full matrix
    costs one scan + one 1-row aggregate regardless of scale; adding
    columns grows the aggregate width, never the pass count. (Spark's
    built-in ``corr`` computes float co-moments in-stream — fine
    numerically, but not cross-engine-hashable; same answer here to
    ~1e-12.)"""
    li = load_table(spark, sf_dir, "lineitem")
    # NO repartition before the aggregate: the r9 spread of the raw
    # scan was a driver-confirmed regression (0.64x), and a measured
    # A/B of the narrow-projection variants (r10, median-of-5,
    # .count() on the 1-row aggregate) reads no-spread 0.63 s vs
    # narrow-spread 0.85 s vs spread-after-cast 0.78 s — the partial
    # (map-side) decimal moment sums already parallelize across the
    # scan tasks and contract to one row per task, so ANY added
    # exchange of per-row data is pure cost.  At real scale the scan
    # arrives in thousands of splits and the same map-side partial
    # aggregation applies unchanged.
    cents = li.select(*_CORR_COLS.values()).select(
        *[
            (F.col(c).cast("decimal(18,2)") * 100).cast("long").alias(k)
            for k, c in _CORR_COLS.items()
        ]
    )
    sums = [F.count(F.lit(1)).alias("n")]
    for k in _CORR_COLS:
        sums.append(F.sum(F.col(k).cast("decimal(38,0)")).alias(f"s{k}"))
        sums.append(
            F.sum((F.col(k) * F.col(k)).cast("decimal(38,0)")).alias(f"s{k}{k}")
        )
    for a, b in _CORR_PAIRS:
        sums.append(
            F.sum((F.col(a) * F.col(b)).cast("decimal(38,0)")).alias(f"s{a}{b}")
        )
    m = cents.agg(*sums)

    def corr(a: str, b: str) -> F.Column:
        n = F.col("n").cast("double")
        mean = lambda k: F.col(f"s{k}").cast("double") / n  # noqa: E731
        e2 = lambda k: F.col(f"s{k}{k}").cast("double") / n  # noqa: E731
        exy = F.col(f"s{a}{b}").cast("double") / n
        cov = exy - mean(a) * mean(b)
        var = lambda k: e2(k) - mean(k) * mean(k)  # noqa: E731
        return F.round(cov / F.sqrt(var(a) * var(b)), 6)

    rows = F.array(
        *[
            F.struct(
                F.lit(_CORR_COLS[a]).alias("col_a"),
                F.lit(_CORR_COLS[b]).alias("col_b"),
                corr(a, b).alias("corr"),
            )
            for a, b in _CORR_PAIRS
        ]
    )
    return m.select(F.explode(rows).alias("r")).select(
        "r.col_a", "r.col_b", "r.corr"
    )


@register(
    "ext_k_anonymity",
    f"""
    WITH pseudo AS (
      SELECT substr(md5(CAST(user_id AS VARCHAR)), 1, 16) AS pseudo_id,
             event_type,
             CAST(hour(ts) AS BIGINT) AS hour_of_day,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events
    ), cohorts AS (
      SELECT event_type, hour_of_day,
             CAST(COUNT(*) AS BIGINT) AS cohort_n
      FROM pseudo GROUP BY 1, 2
    )
    SELECT p.pseudo_id, p.event_type, p.hour_of_day, p.v AS value_cents
    FROM pseudo p JOIN cohorts c USING (event_type, hour_of_day)
    WHERE c.cohort_n >= 50
    """,
)
def ext_k_anonymity(spark, sf_dir):
    """[EXT] Privacy-preserving release prep, two standard steps in one
    pass: (1) pseudonymization — user_id replaced by a one-way md5
    token (stable across runs/engines, so longitudinal joins still
    work on the pseudonym); (2) k-anonymity suppression — rows whose
    quasi-identifier cohort (event_type, hour-of-day) holds fewer than
    k=50 members are dropped, so no released row is identifiable to a
    group smaller than k (Sweeney 2002).

    Plan: cohort counts are one map-side-combined groupBy over the
    quasi-identifier (tiny output — bounded by the QI domain, not row
    count), broadcast back as a join filter; pseudonymization is a
    scan-side expression. At 100 TB: same two stages, no extra pass —
    the suppression filter rides the existing scan."""
    e = load_table(spark, sf_dir, "events")
    pseudo = e.select(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 16).alias(
            "pseudo_id"
        ),
        "event_type",
        F.hour("ts").cast("long").alias("hour_of_day"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias(
            "value_cents"
        ),
    )
    cohorts = pseudo.groupBy("event_type", "hour_of_day").agg(
        F.count(F.lit(1)).alias("cohort_n")
    )
    return (
        pseudo.join(
            F.broadcast(cohorts.filter(F.col("cohort_n") >= 50)),
            ["event_type", "hour_of_day"],
        )
        .select("pseudo_id", "event_type", "hour_of_day", "value_cents")
    )


@register(
    "ext_table_profile",
    """
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) - COUNT(doc_id) AS BIGINT) AS nn_doc_id,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd_doc_id,
             CAST(MIN(doc_id) AS VARCHAR) AS mn_doc_id,
             CAST(MAX(doc_id) AS VARCHAR) AS mx_doc_id,
             CAST(COUNT(*) - COUNT(lang) AS BIGINT) AS nn_lang,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS nd_lang,
             MIN(lang) AS mn_lang, MAX(lang) AS mx_lang,
             CAST(COUNT(*) - COUNT(source) AS BIGINT) AS nn_source,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS nd_source,
             MIN(source) AS mn_source, MAX(source) AS mx_source,
             CAST(COUNT(*) - COUNT(n_chars) AS BIGINT) AS nn_n_chars,
             CAST(COUNT(DISTINCT n_chars) AS BIGINT) AS nd_n_chars,
             CAST(MIN(n_chars) AS VARCHAR) AS mn_n_chars,
             CAST(MAX(n_chars) AS VARCHAR) AS mx_n_chars
      FROM documents
    )
    SELECT 'doc_id' AS column_name, n_rows, nn_doc_id AS n_nulls,
           nd_doc_id AS n_distinct, mn_doc_id AS min_val, mx_doc_id AS max_val
    FROM m
    UNION ALL
    SELECT 'lang', n_rows, nn_lang, nd_lang, mn_lang, mx_lang FROM m
    UNION ALL
    SELECT 'source', n_rows, nn_source, nd_source, mn_source, mx_source FROM m
    UNION ALL
    SELECT 'n_chars', n_rows, nn_n_chars, nd_n_chars, mn_n_chars, mx_n_chars
    FROM m
    """,
)
def ext_table_profile(spark, sf_dir):
    """[EXT] ANALYZE-style column profile (the first thing any
    ingestion run records): per column — null count, exact distinct
    count, min/max (stringified post-aggregation, so numeric order is
    preserved) — emitted long-form, one row per column.

    One logical pass over the scan: the multi-column COUNT(DISTINCT)
    compiles to a single Expand-based aggregate (rows x 4 internally,
    still one scan, map-side partially aggregated). At 100 TB the
    distinct counts would swap to approx_count_distinct — exact here
    because the oracle must hash the values; the docstring IS the
    documented swap point."""
    d = load_table(spark, sf_dir, "documents")
    m = d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("doc_id")).alias("nn_doc_id"),
        F.countDistinct("doc_id").alias("nd_doc_id"),
        F.min("doc_id").cast("string").alias("mn_doc_id"),
        F.max("doc_id").cast("string").alias("mx_doc_id"),
        (F.count(F.lit(1)) - F.count("lang")).alias("nn_lang"),
        F.countDistinct("lang").alias("nd_lang"),
        F.min("lang").alias("mn_lang"),
        F.max("lang").alias("mx_lang"),
        (F.count(F.lit(1)) - F.count("source")).alias("nn_source"),
        F.countDistinct("source").alias("nd_source"),
        F.min("source").alias("mn_source"),
        F.max("source").alias("mx_source"),
        (F.count(F.lit(1)) - F.count("n_chars")).alias("nn_n_chars"),
        F.countDistinct("n_chars").alias("nd_n_chars"),
        F.min("n_chars").cast("string").alias("mn_n_chars"),
        F.max("n_chars").cast("string").alias("mx_n_chars"),
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows"),
                F.col(f"nn_{c}").alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_val"),
                F.col(f"mx_{c}").alias("max_val"),
            )
            for c in ["doc_id", "lang", "source", "n_chars"]
        ]
    )
    return m.select(F.explode(rows).alias("r")).select("r.*")


@register(
    "ext_label_centroid_sim",
    """
    WITH ex AS (
      SELECT label, i AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000000) AS BIGINT) AS x
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
    ),
    sums AS (
      SELECT label, dim, CAST(SUM(x) AS BIGINT) AS s FROM ex GROUP BY 1, 2
    ),
    norms AS (
      SELECT label, SUM(CAST(s AS HUGEINT) * s) AS n2 FROM sums GROUP BY 1
    ),
    dots AS (
      SELECT a.label AS label_a, b.label AS label_b,
             SUM(CAST(a.s AS HUGEINT) * b.s) AS num
      FROM sums a JOIN sums b ON a.dim = b.dim AND a.label < b.label
      GROUP BY 1, 2
    )
    SELECT d.label_a, d.label_b,
           round(CAST(d.num AS DOUBLE)
                 / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 6)
             AS cos_sim
    FROM dots d
    JOIN norms na ON na.label = d.label_a
    JOIN norms nb ON nb.label = d.label_b
    """,
)
def ext_label_centroid_sim(spark, sf_dir):
    """[EXT] Pairwise cosine similarity between per-label embedding
    centroids — the cluster-quality / label-confusion diagnostic for an
    embedding space. The count terms cancel algebraically
    (cos(Sa/na, Sb/nb) == Sa.Sb / (|Sa||Sb|)), so the whole metric
    reduces to integer sums: per-dimension element sums in units of
    1e-7 (floor — identical on every engine), then dot/norm sums as
    DECIMAL(38,0)/HUGEINT (the cross products reach ~1e19), one sqrt
    at the end on exact integers. Distributed float centroid math made
    bit-reproducible.

    Plan: one posexplode pass -> groupBy (label, dim) with map-side
    combine (output = labels x dims rows — tiny at any corpus scale) ->
    the label-pair join runs on the AGGREGATED frame only. Adding a
    billion vectors changes nothing downstream of the first groupBy."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "label",
        "dim",
        F.floor(F.col("v").cast("double") * 10000000).cast("long").alias("x"),
    )
    sums = ex.groupBy("label", "dim").agg(F.sum("x").alias("s"))
    norms = sums.groupBy("label").agg(
        F.sum((F.col("s") * F.col("s")).cast("decimal(38,0)")).alias("n2")
    )
    a, b = sums.alias("a"), sums.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.dim") == F.col("b.dim"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b")
        )
        .agg(
            F.sum((F.col("a.s") * F.col("b.s")).cast("decimal(38,0)")).alias(
                "num"
            )
        )
    )
    na = norms.select(F.col("label").alias("label_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("label").alias("label_b"), F.col("n2").alias("nb2"))
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            F.round(
                F.col("num").cast("double")
                / F.sqrt(F.col("na2").cast("double") * F.col("nb2").cast("double")),
                6,
            ).alias("cos_sim"),
        )
    )


# One SQL text, two engines: restricted to the ANSI subset both Spark SQL
# and DuckDB parse identically, so the SQL-API query IS its own oracle.
_SQL_SURFACE = """
    SELECT o_orderpriority,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY 1, 2
"""


@register("ext_sql_surface", _SQL_SURFACE)
def ext_sql_surface(spark, sf_dir):
    """[EXT] The SQL API surface: this query is executed via
    ``spark.sql`` over registered views using the IDENTICAL text the
    DuckDB oracle runs — one ANSI statement, two engines, value-equal.
    Proof that a SQL-first user of the engine (the reference's users
    write no SQL, but any analyst replacing it would) gets the same
    Catalyst plan quality as the DataFrame API: pushdown, map-side
    combine, AQE all apply to ``spark.sql`` plans identically."""
    from dissertation_data_pipeline_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_SURFACE)


@register(
    "ext_zscore_scaler",
    """
    WITH cents AS (
      SELECT event_id, event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM events
    ), m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s,
             SUM(CAST(v AS HUGEINT) * v) AS s2
      FROM cents GROUP BY 1
    )
    SELECT c.event_id, c.event_type,
           round((CAST(c.v AS DOUBLE) - CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE))
                 / sqrt(CAST(m.s2 AS DOUBLE) / CAST(m.n AS DOUBLE)
                        - (CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE))
                          * (CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE))), 6) AS z
    FROM cents c JOIN m USING (event_type)
    """,
)
def ext_zscore_scaler(spark, sf_dir):
    """[EXT] Per-group standardization (StandardScaler): z = (x - mean)
    / population std, with mean and std derived from exact integer
    (sum, sum-of-squares) moments — one aggregation (tiny output, one
    row per group) broadcast back onto the rows; every float op sees
    identical exact-integer inputs on both engines. The two-pass-free
    scaler every feature pipeline needs."""
    e = load_table(spark, sf_dir, "events")
    cents = e.select(
        "event_id",
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("v"),
    )
    m = cents.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).alias("s2"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s").cast("double") / n
    var = F.col("s2").cast("double") / n - mean * mean
    return cents.join(F.broadcast(m), "event_type").select(
        "event_id",
        "event_type",
        F.round((F.col("v").cast("double") - mean) / F.sqrt(var), 6).alias("z"),
    )


@register(
    "ext_negative_sampling",
    """
    WITH n AS (SELECT COUNT(*) AS corpus_n FROM documents),
    anchors AS (SELECT doc_id FROM documents WHERE doc_id % 20 = 0),
    cand AS (
      SELECT a.doc_id AS anchor_id, j,
             (a.doc_id * 2654435761 + j * 40503) % n.corpus_n AS neg_id
      FROM anchors a, n, (SELECT unnest([1, 2, 3, 4, 5]) AS j)
    )
    SELECT anchor_id, j AS neg_rank, neg_id
    FROM cand
    WHERE neg_id != anchor_id
      AND neg_id IN (SELECT doc_id FROM documents)
    """,
)
def ext_negative_sampling(spark, sf_dir):
    """[EXT] Deterministic negative sampling for contrastive training
    pairs: each anchor doc draws k=5 pseudo-random negatives via a
    Knuth-style multiplicative hash ring over the corpus id space — no
    RNG state, no shuffle to sample, identical picks on any engine or
    partitioning (the property that makes training runs reproducible).
    Candidates semi-join the corpus to guarantee existence (ids here
    are dense, but the join is the contract for sparse id spaces);
    self-hits are filtered.

    Plan: anchors x 5 via a broadcast literal array (no crossJoin of
    facts), one left-semi join on neg_id. At 100 TB the semi-join is
    the only shuffle and rides the id hash."""
    d = load_table(spark, sf_dir, "documents")
    n_row = d.agg(F.count(F.lit(1)).alias("corpus_n"))
    anchors = d.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("anchor_id")
    )
    ks = F.array(*[F.lit(j) for j in range(1, 6)])
    cand = (
        anchors.crossJoin(F.broadcast(n_row))
        .select(
            "anchor_id",
            F.explode(ks).alias("j"),
            F.col("corpus_n"),
        )
        .select(
            "anchor_id",
            F.col("j").alias("neg_rank"),
            (
                (F.col("anchor_id") * 2654435761 + F.col("j") * 40503)
                % F.col("corpus_n")
            ).alias("neg_id"),
        )
        .filter(F.col("neg_id") != F.col("anchor_id"))
    )
    return cand.join(
        d.select(F.col("doc_id").alias("neg_id")), "neg_id", "left_semi"
    ).select("anchor_id", "neg_rank", "neg_id")


# GROUPING SETS is SQL-only surface in Spark (the DataFrame API exposes
# only rollup/cube); same ANSI text runs on both engines.
_GROUPING_SETS_SQL = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
           CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("ext_grouping_sets", _GROUPING_SETS_SQL)
def ext_grouping_sets(spark, sf_dir):
    """[EXT] Explicit GROUPING SETS — the irregular-subtotal shape CUBE
    and ROLLUP can't express (two independent 1-D margins + grand
    total, WITHOUT the (status, priority) cross plane). One Expand pass
    over the scan, map-side combined; grouping() flags disambiguate
    real NULLs from subtotal rows. Spark exposes this via SQL only, so
    the query runs through ``spark.sql`` on registered views with the
    identical ANSI text as the oracle."""
    from dissertation_data_pipeline_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)
