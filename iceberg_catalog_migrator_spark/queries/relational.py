"""Relational analytics surface (SURVEY §2b): TPC-H-style queries
adapted to the testdata star schema, expressed DataFrame-first so
Catalyst owns the physical plan (broadcast vs shuffle join, pushdown,
partial aggregation).

Scale notes baked into each query:
- bounded dimension joins (`region`, `nation`) are explicit ``F.broadcast``
  — at 100 TB the fact side never shuffles for them; SF-growing tables
  (customer/part/supplier) are left to Catalyst/AQE so the plan stays
  valid when they outgrow the broadcast threshold;
- filters precede joins so parquet scans see pushed predicates;
- every aggregate uses the deterministic decimal-sum pattern from
  ``functions.numeric`` (order-independent at any parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum, dsum_expr
from ..sources import load_table
from .registry import register_query

REVENUE = "l_extendedprice * (1 - l_discount)"


def _rev(df: DataFrame):
    return df.l_extendedprice * (1 - df.l_discount)


# ---------------------------------------------------------------- q1
@register_query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_expr('l_quantity', 2)} AS sum_qty,
           {dsum_expr('l_extendedprice', 2)} AS sum_base_price,
           {dsum_expr(REVENUE, 8)} AS sum_disc_price,
           {dsum_expr(f'{REVENUE} * (1 + l_tax)', 8)} AS sum_charge,
           ROUND({dsum_expr('l_quantity', 2)} / COUNT(*), 6) AS avg_qty,
           ROUND({dsum_expr('l_extendedprice', 2)} / COUNT(*), 6) AS avg_price,
           ROUND({dsum_expr('l_discount', 4)} / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1 pricing summary: scan-side filter, 6 aggregates, tiny group key",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li = li.filter(li.l_shipdate <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 2).alias("sum_qty"),
            dsum("l_extendedprice", 2).alias("sum_base_price"),
            dsum(_rev(li), 8).alias("sum_disc_price"),
            dsum(_rev(li) * (1 + li.l_tax), 8).alias("sum_charge"),
            F.round(dsum("l_quantity", 2) / F.count("*"), 6).alias("avg_qty"),
            F.round(dsum("l_extendedprice", 2) / F.count("*"), 6).alias("avg_price"),
            F.round(dsum("l_discount", 4) / F.count("*"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------- q3
@register_query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {dsum_expr(REVENUE, 8)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    description="TPC-H Q3: selective dim filter then fact join, top-10 with unique tie-break",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_rev(li), 8).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------- q4
@register_query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    description="TPC-H Q4: EXISTS → left-semi join",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "leftsemi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# ---------------------------------------------------------------- q5
@register_query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {dsum_expr(REVENUE, 8)} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    description="TPC-H Q5: 6-way star join, broadcast dims, local-supplier co-nation condition",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_rev(li), 8).alias("revenue"))
    )


# ---------------------------------------------------------------- q6
@register_query(
    "q6_revenue_forecast",
    oracle=f"""
    SELECT {dsum_expr('l_extendedprice * l_discount', 8)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    description="TPC-H Q6: pure scan+filter+global agg — pushdown showcase",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (li.l_shipdate >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (li.l_shipdate < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (li.l_discount >= 0.05)
            & (li.l_discount <= 0.07)
            & (li.l_quantity < 24)
        ).agg(dsum(li.l_extendedprice * li.l_discount, 8).alias("revenue"))
    )


# ---------------------------------------------------------------- q7
@register_query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {dsum_expr('volume', 8)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l_shipdate) AS l_year,
             {REVENUE} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    description="TPC-H Q7: nation-pair volume, two broadcast joins of the same dim",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            _rev(li).alias("volume"),
        )
    )
    return joined.groupBy("supp_nation", "cust_nation", "l_year").agg(
        dsum("volume", 4).alias("revenue")
    )


# ---------------------------------------------------------------- q10
@register_query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {dsum_expr(REVENUE, 8)} AS revenue, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    description="TPC-H Q10: returned-item revenue by customer, top-20",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(_rev(li), 8).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------- q14
@register_query(
    "q14_promo_effect",
    oracle=f"""
    SELECT ROUND(
             100.0 * {dsum_expr(f"CASE WHEN p_type = 'PROMO' THEN {REVENUE} ELSE 0.0 END", 8)}
             / {dsum_expr(REVENUE, 8)}, 6) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
    description="TPC-H Q14: conditional aggregation ratio",
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    promo = F.when(part.p_type == "PROMO", _rev(li)).otherwise(F.lit(0.0))
    return joined.agg(
        F.round(100.0 * dsum(promo, 8) / dsum(_rev(li), 8), 6).alias("promo_revenue")
    )


# ---------------------------------------------------------------- q18
@register_query(
    "q18_large_volume_customer",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {dsum_expr('l_quantity', 2)} AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    description="TPC-H Q18: HAVING subquery → semi join on aggregated keys",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # ONE lineitem pass: the per-order decimal quantity sum both
    # selects the big orders AND is the final sum_qty (orderkey is in
    # the group-by, so each output group is exactly one order and its
    # re-aggregated sum equals the already-computed per-order sum).
    # The naive rendering scanned lineitem twice and re-aggregated the
    # joined rows over a 5-column key.
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("q", 2).cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------- q19
@register_query(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {dsum_expr(REVENUE, 8)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
    description="TPC-H Q19: disjunctive multi-range predicate over a join",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part, part.p_partkey == li.l_partkey)
    cond = (
        ((part.p_brand == "Brand#12") & part.p_size.between(1, 15) & li.l_quantity.between(1, 11))
        | ((part.p_brand == "Brand#23") & part.p_size.between(1, 25) & li.l_quantity.between(10, 20))
        | ((part.p_brand == "Brand#34") & part.p_size.between(1, 35) & li.l_quantity.between(20, 30))
    )
    return joined.filter(cond).agg(dsum(_rev(li), 8).alias("revenue"))


# ------------------------------------------------------- set operations
@register_query(
    "setop_active_nations",
    oracle="""
    SELECT n_nationkey AS nationkey FROM nation
    WHERE n_nationkey IN (SELECT c_nationkey FROM customer)
    INTERSECT
    SELECT n_nationkey FROM nation
    WHERE n_nationkey IN (SELECT s_nationkey FROM supplier)
    ORDER BY nationkey
    """,
    description="INTERSECT of customer-bearing and supplier-bearing nations",
)
def setop_active_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    with_cust = nation.join(
        cust, nation.n_nationkey == cust.c_nationkey, "leftsemi"
    ).select(F.col("n_nationkey").alias("nationkey"))
    with_supp = nation.join(
        supp, nation.n_nationkey == supp.s_nationkey, "leftsemi"
    ).select(F.col("n_nationkey").alias("nationkey"))
    return with_cust.intersect(with_supp).orderBy("nationkey")


@register_query(
    "antijoin_customers_without_orders",
    oracle="""
    SELECT COUNT(*) AS n_customers FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    description="anti join: customers that never ordered",
)
def antijoin_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "leftanti")
        .agg(F.count("*").alias("n_customers"))
    )


# ------------------------------------------------------------ rollup/cube
@register_query(
    "rollup_revenue_by_flag_status",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           GROUPING(l_returnflag) + GROUPING(l_linestatus) AS lvl,
           {dsum_expr(REVENUE, 8)} AS revenue
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    description="ROLLUP with grouping-level disambiguation",
)
def rollup_revenue_by_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") + F.grouping("l_linestatus")).cast("bigint").alias("lvl"),
            dsum(_rev(li), 8).alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "lvl",
            "revenue",
        )
    )


@register_query(
    "cube_orders_by_status_priority",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
           COALESCE(o_orderpriority, 'ALL') AS orderpriority,
           GROUPING(o_orderstatus) + GROUPING(o_orderpriority) AS lvl,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    description="CUBE over two categorical keys",
)
def cube_orders_by_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            (F.grouping("o_orderstatus") + F.grouping("o_orderpriority"))
            .cast("bigint")
            .alias("lvl"),
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "lvl",
            "n_orders",
            "total",
        )
    )


# ------------------------------------------------------------ distinct
@register_query(
    "distinct_count_parts_per_brand",
    oracle="""
    SELECT p_brand, COUNT(DISTINCT p_type) AS n_types, COUNT(DISTINCT p_size) AS n_sizes
    FROM part GROUP BY p_brand
    """,
    description="multi COUNT DISTINCT (expand + two-phase agg in Spark)",
)
def distinct_count_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.countDistinct("p_type").alias("n_types"),
        F.countDistinct("p_size").alias("n_sizes"),
    )


# ------------------------------------------------------------ scalar fns
@register_query(
    "scalar_functions_showcase",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LENGTH(p_name) AS name_len,
           SUBSTR(p_type, 1, 3) AS type_prefix,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           ROUND(p_retailprice * 1.1, 2) AS marked_up,
           CAST(FLOOR(p_retailprice / 100) AS BIGINT) AS price_bucket,
           ABS(p_size - 25) AS size_dev,
           CASE WHEN p_size >= 25 THEN 'big' ELSE 'small' END AS size_class
    FROM part
    WHERE p_partkey <= 200
    """,
    description="string/math/conditional scalar expressions (whole-stage codegen path)",
)
def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_type", 1, 3).alias("type_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("marked_up"),
        F.floor(F.col("p_retailprice") / 100).cast("bigint").alias("price_bucket"),
        F.abs(F.col("p_size") - 25).cast("bigint").alias("size_dev"),
        F.when(F.col("p_size") >= 25, "big").otherwise("small").alias("size_class"),
    )


# ------------------------------------------------------------ date fns
@register_query(
    "date_functions_orders",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS o_quarter,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY o_year, o_quarter
    """,
    description="date-part extraction + aggregate by derived keys",
)
def date_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.quarter("o_orderdate").cast("bigint").alias("o_quarter"),
            "o_totalprice",
        )
        .groupBy("o_year", "o_quarter")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", 2).alias("total"))
    )


# ------------------------------------------------------------ union all
@register_query(
    "union_all_party_names",
    oracle="""
    SELECT kind, COUNT(*) AS n FROM (
      SELECT 'customer' AS kind, c_name AS name FROM customer
      UNION ALL
      SELECT 'supplier' AS kind, s_name AS name FROM supplier
    ) u
    GROUP BY kind
    """,
    description="UNION ALL of heterogeneous sources normalized to one schema",
)
def union_all_party_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"), F.col("c_name").alias("name")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"), F.col("s_name").alias("name")
    )
    return cust.unionByName(supp).groupBy("kind").agg(F.count("*").alias("n"))
