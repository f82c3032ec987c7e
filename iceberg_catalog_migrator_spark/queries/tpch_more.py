"""Remaining TPC-H-style queries (Q2/Q8/Q9/Q11/Q12/Q13/Q15/Q16/Q17/Q20/
Q21/Q22) adapted to the testdata star schema.

The fixtures have no ``partsupp`` table and no commit/receipt dates, ship
modes, phones, or containers, so the partsupp-driven queries use
``lineitem`` as the part↔supplier relationship and the date-arithmetic
queries use ``l_shipdate`` vs ``o_orderdate``. The *shape* of each query
(correlated subqueries, min-per-group, share-of-total, histogram-of-
counts, semi/anti joins, double-correlated EXISTS) is preserved — that
shape, not the constants, is what exercises the engine.

Scale notes (100 TB design rules applied throughout):
- BOUNDED dimensions (region/nation) and scalar/per-year aggregates carry
  explicit broadcast hints; SF-growing relations (part/supplier/customer
  and per-key aggregates) are left to Catalyst/AQE, which broadcasts them
  at this scale but falls back to shuffle joins when they outgrow the
  threshold — a forced hint would OOM at 100 TB;
- selective filters sit directly on the scan so parquet pushdown sees
  them before any join;
- every SUM uses the deterministic decimal pattern from
  ``functions.numeric`` (order-independent at any parallelism);
- per-group extremes use MIN/MAX or window row_number with a total
  tie-break, never ``first()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dsum, dsum_expr
from ..sources import load_table
from .registry import register_query

REVENUE = "l_extendedprice * (1 - l_discount)"


def _rev(df: DataFrame):
    return df.l_extendedprice * (1 - df.l_discount)


# ---------------------------------------------------------------- q2 (adapted)
@register_query(
    "q2_min_price_supplier",
    oracle="""
    SELECT p_partkey, p_name, s_name, unit_price FROM (
      SELECT p.p_partkey, p.p_name, s.s_name,
             ROUND(l.l_extendedprice / l.l_quantity, 6) AS unit_price,
             ROW_NUMBER() OVER (
               PARTITION BY p.p_partkey
               ORDER BY l.l_extendedprice / l.l_quantity, l.l_suppkey, l.l_orderkey, l.l_linenumber
             ) AS rk
      FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE p.p_size = 15
    ) t WHERE rk = 1
    """,
    description="TPC-H Q2 shape: min-cost supplier per part (lineitem as the part-supplier relation)",
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    unit = li.l_extendedprice / li.l_quantity
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select("p_partkey", "p_name", "s_name", unit.alias("up"), "l_suppkey", "l_orderkey", "l_linenumber")
    )
    w = Window.partitionBy("p_partkey").orderBy("up", "l_suppkey", "l_orderkey", "l_linenumber")
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("p_partkey", "p_name", "s_name", F.round("up", 6).alias("unit_price"))
    )


# ---------------------------------------------------------------- q8 (adapted)
@register_query(
    "q8_market_share",
    oracle=f"""
    WITH market AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             sn.n_name AS supp_nation,
             {REVENUE} AS volume
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    ),
    by_nation AS (
      SELECT o_year, supp_nation,
             SUM(CAST(volume AS DECIMAL(18,8))) AS nat_dec
      FROM market GROUP BY o_year, supp_nation
    ),
    total AS (
      SELECT o_year, SUM(nat_dec) AS tot_dec
      FROM by_nation GROUP BY o_year
    )
    SELECT b.o_year,
           ROUND(CAST(ROUND(b.nat_dec, 4) AS DOUBLE)
                 / CAST(ROUND(t.tot_dec, 4) AS DOUBLE), 6) AS mkt_share
    FROM by_nation b JOIN total t ON b.o_year = t.o_year
    WHERE b.supp_nation = 'NATION_5'
    """,
    description="TPC-H Q8: one nation's yearly revenue share of a region's market for one part type",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")

    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    market = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            "supp_nation",
            _rev(li).alias("volume"),
        )
    )
    # one pass over the fact subtree: keep per-nation sums as exact
    # decimals, derive the yearly total by summing them (decimal
    # addition is associative, so this equals summing rows directly),
    # and round only at the end. by_nation feeds BOTH the yearly total
    # and the nation filter; pin the (years x nations)-sized aggregate
    # once or the whole 7-table join tree executes twice as two plan
    # subtrees.
    by_nation = market.groupBy("o_year", "supp_nation").agg(
        F.sum(F.col("volume").cast("decimal(18,8)")).alias("nat_dec")
    ).localCheckpoint()
    total = by_nation.groupBy("o_year").agg(F.sum("nat_dec").alias("tot_dec"))
    return (
        by_nation.filter(F.col("supp_nation") == "NATION_5")
        .join(F.broadcast(total), "o_year")
        .select(
            "o_year",
            F.round(
                F.round("nat_dec", 4).cast("double") / F.round("tot_dec", 4).cast("double"),
                6,
            ).alias("mkt_share"),
        )
    )


# ---------------------------------------------------------------- q9 (adapted)
@register_query(
    "q9_product_type_profit",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           {dsum_expr(REVENUE, 8)} AS profit
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY supp_nation, o_year
    """,
    description="TPC-H Q9: profit by supplier nation and year for parts matching a name pattern",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dsum(_rev(li), 8).alias("profit"))
    )


# ---------------------------------------------------------------- q11 (adapted)
@register_query(
    "q11_important_parts",
    oracle=f"""
    SELECT l_partkey, {dsum_expr('l_extendedprice', 2)} AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING {dsum_expr('l_extendedprice', 2)} > (
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(DISTINCT l_partkey) * 1.5
      FROM lineitem
    )
    """,
    description="TPC-H Q11: parts whose total traded value exceeds 1.5x the average part value (scalar subquery over the same fact, scale-invariant threshold)",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # ONE lineitem pass: keep the exact decimal sum per part, pin the
    # part-count-sized aggregate, and derive the threshold from it —
    # decimal addition is exact and associative, so sum-of-group-sums
    # equals the direct total and countDistinct(l_partkey) is the group
    # count. The naive scalar subquery re-scanned lineitem a second time.
    per = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("dec_sum")
    ).localCheckpoint()
    per_part = per.select(
        "l_partkey", F.round("dec_sum", 2).cast("double").alias("part_value")
    )
    # count(l_partkey), not count(*): countDistinct excluded a null
    # key, so the group count must too (no-op on this data, exact on any)
    total = per.agg(
        (F.sum("dec_sum").cast("double") / F.count("l_partkey") * 1.5).alias(
            "threshold"
        )
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


# ---------------------------------------------------------------- q12 (adapted)
@register_query(
    "q12_late_shipments_by_priority",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY l.l_returnflag
    """,
    description="TPC-H Q12 shape: late shipments (>90 days after order) split by order priority class",
)
def q12_late_shipments_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------- q13
@register_query(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) t GROUP BY c_count
    """,
    description="TPC-H Q13: histogram of orders-per-customer (left join keeps zero-order customers)",
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------- q15
@register_query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {dsum_expr(REVENUE, 8)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    description="TPC-H Q15: supplier(s) with maximum quarterly revenue (scalar MAX subquery)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    # revenue feeds the scalar MAX and the equality filter; pin the
    # supplier-count-sized aggregate once instead of scanning and
    # aggregating the quarter's lineitems twice
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_rev(li), 8).alias("total_revenue")
    ).localCheckpoint()
    max_rev = revenue.agg(F.max("total_revenue").alias("mr"))
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_revenue == F.col("mr"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------- q16 (adapted)
@register_query(
    "q16_supplier_part_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#15' AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    description="TPC-H Q16: distinct supplier count per brand/type/size (lineitem as partsupp)",
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#15")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------- q17
@register_query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH brand_lines AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_brand = 'Brand#23'
    ),
    part_avg AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 0.2 AS qty_threshold
      FROM brand_lines GROUP BY l_partkey
    )
    SELECT ROUND(CAST(ROUND(SUM(CAST(b.l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) / 7.0, 4) AS avg_yearly
    FROM brand_lines b JOIN part_avg a ON b.l_partkey = a.l_partkey
    WHERE b.l_quantity < a.qty_threshold
    """,
    description="TPC-H Q17: revenue of below-one-fifth-average-quantity lines (correlated avg per part)",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    li = load_table(spark, sf_dir, "lineitem")
    brand_lines = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # correlated per-part average via a window over the join's own
    # partkey partitioning — one pass over brand_lines instead of the
    # aggregate+self-join rendering that re-ran the lineitem x part
    # join as a second plan subtree (guide §2.4)
    wp = Window.partitionBy("l_partkey")
    threshold = (
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(wp).cast("double")
        / F.count("*").over(wp)
        * 0.2
    )
    return (
        brand_lines.withColumn("qty_threshold", threshold)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2).cast(
                    "double"
                )
                / 7.0,
                4,
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------- q20 (adapted)
@register_query(
    "q20_excess_volume_suppliers",
    oracle=f"""
    SELECT s.s_suppkey, s.s_name FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_name LIKE 'red%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_suppkey
      HAVING {dsum_expr('l_quantity', 2)} > 100
    )
    """,
    description="TPC-H Q20 shape: suppliers who shipped excess volume of a part family in a year (semi join)",
)
def q20_excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    excess = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(dsum("l_quantity", 2).alias("qty"))
        .filter(F.col("qty") > 100)
    )
    return supp.join(
        excess, supp.s_suppkey == excess.l_suppkey, "leftsemi"
    ).select("s_suppkey", "s_name")


# ---------------------------------------------------------------- q21 (adapted)
@register_query(
    "q21_blocking_suppliers",
    oracle="""
    WITH per_supp AS (
      SELECT l.l_orderkey, l.l_suppkey, MAX(l.l_shipdate) AS max_ship
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey, l.l_suppkey
    ),
    flagged AS (
      SELECT l_orderkey, l_suppkey, max_ship,
             COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
             MAX(max_ship) OVER (PARTITION BY l_orderkey) AS order_max
      FROM per_supp
    ),
    counted AS (
      SELECT *,
             SUM(CASE WHEN max_ship = order_max THEN 1 ELSE 0 END)
               OVER (PARTITION BY l_orderkey) AS n_at_max
      FROM flagged
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM counted f JOIN supplier s ON f.l_suppkey = s.s_suppkey
    WHERE f.n_supp >= 2 AND f.max_ship = f.order_max AND f.n_at_max = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    description="TPC-H Q21 shape: suppliers who alone shipped last on finished multi-supplier orders",
)
def q21_blocking_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    # one explicit repartition on l_orderkey serves BOTH the
    # (l_orderkey, l_suppkey) aggregation (clustered-distribution subset
    # rule) and the l_orderkey window — without it each would shuffle.
    per_supp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "leftsemi")
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("max_ship"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_supp.select(
        "l_orderkey",
        "l_suppkey",
        "max_ship",
        F.count("*").over(w).alias("n_supp"),
        F.max("max_ship").over(w).alias("order_max"),
    ).withColumn(
        "n_at_max",
        F.sum(F.when(F.col("max_ship") == F.col("order_max"), 1).otherwise(0)).over(w),
    )
    return (
        flagged.filter(
            (F.col("n_supp") >= 2)
            & (F.col("max_ship") == F.col("order_max"))
            & (F.col("n_at_max") == 1)
        )
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------- q22 (adapted)
@register_query(
    "q22_dormant_rich_customers",
    oracle=f"""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS v
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey, COUNT(*) AS numcust, {dsum_expr('c_acctbal', 2)} AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT v FROM avg_bal)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c.c_nationkey
    """,
    description="TPC-H Q22: above-average-balance customers with no recent orders (scalar subquery + anti join)",
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double") / F.count("*")
        ).alias("v")
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("v"))
    dormant = rich.join(orders, rich.c_custkey == orders.o_custkey, "leftanti")
    return dormant.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        dsum("c_acctbal", 2).alias("totacctbal"),
    )
