"""Second TPC-H wave — the decision-support shapes the first wave skipped.

Covers the remaining classic plan shapes expressible on the testdata's
star schema (no ``partsupp``, no commit/receipt dates, so Q2/Q11/Q20 are
out of reach and Q4/Q9/Q12/Q16/Q19/Q21 are adapted to the columns that
exist — each docstring says what was substituted):

- existential semi-join + agg (Q4)
- 8-way snowflake + share-of-total (Q8)
- multi-dim profit rollup (Q9)
- conditional counts over a fact-fact join (Q12)
- left-join histogram-of-counts (Q13)
- view + scalar-max + join-back (Q15)
- distinct-count with NOT-IN exclusion (Q16)
- correlated per-group threshold (Q17, made engine-exact)
- OR-of-conjuncts pushdown (Q19)
- single-culprit detection via distinct-case aggregates (Q21)
- above-average anti-join (Q22, made engine-exact)

Exactness rules follow the first wave: money math in DECIMAL(18,2),
ratios as ONE double division over identical operands, counts as BIGINT.
Inequality thresholds that TPC-H states over ``avg()`` are restated as
exact integer/decimal cross-multiplications (``5*qty*cnt < sum`` instead
of ``qty < 0.2*avg``) so no float boundary can flip a row between
engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.plans.registry import register
from dissertation_data_pipeline_spark.tables import load_table


def _dec(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def _one() -> F.Column:
    return F.lit(1).cast("decimal(18,2)")


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


@register(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY 1
    """,
)
def tpch_q4_order_priority(spark, sf_dir):
    """TPC-H Q4 (adapted): priority counts of orders with a late-shipped
    line. No commit/receipt dates in this schema, so "late" means
    l_shipdate > o_orderdate. The EXISTS is a LEFT SEMI join — the fact
    side never fans out, and the mixed equi+range condition keeps it a
    single shuffle on l_orderkey."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hit = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "tpch_q8_market_share",
    """
    SELECT o_year,
           round(CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN vol
                              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(SUM(vol) AS DOUBLE) AS DOUBLE), 6) AS mkt_share,
           count(*) AS n_lines
    FROM (
      SELECT year(o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS vol,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n1.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE p_type = 'STANDARD' AND r_name = 'AMERICA'
        AND o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
    )
    GROUP BY 1
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 (adapted): NATION_1 suppliers' share of STANDARD-part
    revenue sold into AMERICA, per order year. The widest join in the
    suite — 8 relations; every dimension (part, customer, supplier,
    nation x2, region) broadcasts, so the only shuffle is
    lineitem-orders. Share = one double division over decimal sums."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    ).select("p_partkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1995-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    # customer nations restricted to AMERICA, built dim-side (tiny)
    amer_nations = F.broadcast(
        n.join(r, n.n_regionkey == r.r_regionkey).select(
            F.col("n_nationkey").alias("cnk")
        )
    )
    supp_nation = F.broadcast(
        n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    )
    vol = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    df = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(amer_nations, F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(supp_nation, F.col("s_nationkey") == F.col("snk"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("vol"),
            "supp_nation",
        )
    )
    nation_vol = F.when(
        F.col("supp_nation") == "NATION_1", F.col("vol")
    ).otherwise(F.lit(0).cast("decimal(18,2)"))
    return df.groupBy("o_year").agg(
        F.round(
            (F.sum(nation_vol).cast("double") / F.sum("vol").cast("double"))
            .cast("double"),
            6,
        ).alias("mkt_share"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q9_product_profit",
    """
    SELECT n_name AS nation, year(l_shipdate) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 (adapted): profit on 'bolt' parts by supplier nation and
    ship year. No partsupp in this schema, so profit omits the
    supplycost term (pure discounted revenue). The p_name LIKE filter
    shrinks the broadcast part dim before the fact join; supplier and
    nation broadcast too — one wide scan, zero fact-fact shuffles
    before the group-by."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("bolt")
    ).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@register(
    "tpch_q12_late_lines_by_status",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def tpch_q12_late_lines_by_status(spark, sf_dir):
    """TPC-H Q12 (adapted): no shipmode column, so late lines group by
    l_linestatus; "late" is shipdate past orderdate (no commit/receipt
    dates). The priority split is two conditional SUMs in one pass —
    map-side partial agg, counts cast to BIGINT (the a4_a6 lesson:
    DuckDB count_if yields HUGEINT and breaks the gate's canon)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    ).select("l_orderkey", "l_shipdate", "l_linestatus")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "tpch_q13_customer_distribution",
    """
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders
    GROUP BY 1
    """,
)
def tpch_q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: order-count histogram over ALL customers (zero-order
    customers included via the left join; the comment-pattern exclusion
    becomes a priority exclusion). count(o_orderkey) counts matches
    only — null-safe in both engines. Two shuffles: join on custkey,
    then the tiny histogram agg."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    """
    WITH revenue AS MATERIALIZED (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: quarter revenue view, scalar max, join back. The
    equality against max() is safe ONLY because revenue stays
    DECIMAL until the final projection — double sums would make
    "equals the max" engine-dependent. Spark computes the view once,
    localCheckpoints it (it feeds both the max and the join), and
    broadcasts the 1-row max."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount")))
            .alias("total_revenue")
        )
        .localCheckpoint(eager=False)
    )
    best = F.broadcast(rev.agg(F.max("total_revenue").alias("best_rev")))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(best, rev.total_revenue == F.col("best_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@register(
    "tpch_q16_part_supplier_variety",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_size IN (1, 4, 9, 14, 23, 36, 45, 50)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16_part_supplier_variety(spark, sf_dir):
    """TPC-H Q16 (adapted): supplier variety per (brand, type, size).
    No partsupp — lineitem is the part-supplier bridge; the
    complaint-comment exclusion becomes a negative-balance exclusion.
    The NOT IN is a broadcast LEFT ANTI join (s_suppkey is non-null so
    NOT IN ≡ anti-join); distinct-count shuffles once on the group
    key after the dims prune the fact scan."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 50)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q17_small_qty_revenue",
    """
    WITH perpart AS MATERIALIZED (
      SELECT l_partkey AS pk, count(*) AS cnt,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                AS DOUBLE) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem
    JOIN part    ON p_partkey = l_partkey
    JOIN perpart ON pk = l_partkey
    WHERE p_brand = 'Brand#3'
      AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < total_qty
    """,
)
def tpch_q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17: revenue lost to small-quantity orders. The spec's
    ``l_quantity < 0.2 * avg(l_quantity)`` is restated exactly as
    ``5 * qty * cnt < sum_qty`` — all-decimal cross-multiplication, so
    no float average can flip a boundary row between engines. The
    per-part aggregate pre-shrinks on l_partkey and joins back
    broadcast; one fact scan feeds both sides via localCheckpoint."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).localCheckpoint(eager=False)
    perpart = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(_dec("l_quantity")).alias("total_qty"),
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    ).select("p_partkey")
    small = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(perpart, F.col("l_partkey") == F.col("pk"))
        .filter(_dec("l_quantity") * 5 * F.col("cnt") < F.col("total_qty"))
    )
    return small.agg(
        (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
        .cast("double")
        .alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q19_disc_revenue_or",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disc_revenue_or(spark, sf_dir):
    """TPC-H Q19 (adapted): OR-of-conjuncts revenue (no container
    column, so brand+size+quantity bands). Catalyst pushes the
    disjunction's common part-side predicates into the broadcast dim
    and the quantity bounds to the fact scan; the OR evaluates
    post-join in one codegen stage."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(10, 30) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & q.between(20, 30))
    )
    rev = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q21_waiting_suppliers",
    """
    WITH per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_r_supp,
             max(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS r_supp
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY 1
    )
    SELECT s_name, count(*) AS numwait
    FROM per_order JOIN supplier ON s_suppkey = r_supp
    WHERE n_supp >= 2 AND n_r_supp = 1
    GROUP BY 1
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def tpch_q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 (adapted): the "only supplier who returned" per
    finished multi-supplier order. The spec's EXISTS/NOT-EXISTS pair
    collapses into one grouped pass: distinct suppliers, distinct
    R-flagged suppliers, and (when exactly one) that supplier via
    max(CASE) — integer-only, single shuffle on l_orderkey instead of
    two correlated self-joins of the fact table."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    r_supp = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(r_supp).alias("n_r_supp"),
            F.max(r_supp).alias("r_supp"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.join(F.broadcast(s), F.col("r_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "tpch_q22_idle_customers",
    """
    WITH pos AS MATERIALIZED (
      SELECT count(*) AS cnt,
             SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment, count(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, pos
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cnt > total
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY 1
    """,
)
def tpch_q22_idle_customers(spark, sf_dir):
    """TPC-H Q22 (adapted): rich-but-idle customers per market segment
    (no phone column, so segments replace country codes; every
    synthetic customer has SOME order, so "idle" means no order since
    2001-01-01). The spec's ``acctbal > avg(positive acctbal)`` is
    cross-multiplied to the exact ``acctbal * cnt > sum`` — decimal
    both sides, no float average. Global (cnt, sum) broadcast as a
    1-row literal; the no-recent-orders test is a LEFT ANTI on
    custkey against the date-pruned orders scan."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    stats = F.broadcast(
        c.filter(F.col("c_acctbal") > 0.0).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(_dec("c_acctbal")).alias("total"),
        )
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("2001-01-01")
    ).select("o_custkey")
    rich = c.crossJoin(stats).filter(
        _dec("c_acctbal") * F.col("cnt") > F.col("total")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
    )
