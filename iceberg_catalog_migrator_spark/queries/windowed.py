"""Window-function surface: ranking, analytic, and frame-based queries.

Determinism rules: every window ORDER BY carries a unique tie-break key,
and frame sums go through the decimal cast (exact, reassociation-safe —
DuckDB evaluates window sums with segment trees, Spark streams the
frame; only exact arithmetic is stable under both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dsum
from ..sources import load_table
from .registry import register_query

REVENUE = "l_extendedprice * (1 - l_discount)"


@register_query(
    "window_top3_parts_per_brand",
    oracle=f"""
    SELECT p_brand, p_partkey, revenue, rn FROM (
      SELECT p_brand, p_partkey, revenue,
             ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rn
      FROM (
        SELECT p_brand, p_partkey,
               CAST(ROUND(SUM(CAST({REVENUE} AS DECIMAL(18,8))), 2) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey
      ) per_part
    ) ranked
    WHERE rn <= 3
    """,
    description="per-group top-k via row_number (the scalable top-k idiom)",
)
def window_top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    per_part = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(dsum(li.l_extendedprice * (1 - li.l_discount), 8).alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), "p_partkey")
    return (
        per_part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "revenue", "rn")
    )


@register_query(
    "window_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    WHERE o_custkey <= 100
    """,
    description="cumulative sum per key (unbounded-preceding frame)",
)
def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_spend"),
    )


@register_query(
    "window_order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           DATEDIFF('day',
             LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             o_orderdate) AS gap_days
    FROM orders
    WHERE o_custkey <= 100
    """,
    description="lag + date arithmetic: days between consecutive orders",
)
def window_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate").cast("date"), prev.cast("date"))
        .cast("bigint")
        .alias("gap_days"),
    )


@register_query(
    "window_supplier_rank_in_nation",
    oracle="""
    SELECT s_nationkey, s_suppkey, s_acctbal,
           RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS bal_rank,
           DENSE_RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS bal_dense_rank
    FROM supplier
    """,
    description="rank/dense_rank (tie-stable: equal keys get equal ranks)",
)
def window_supplier_rank_in_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"))
    return supp.select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        F.rank().over(w).cast("bigint").alias("bal_rank"),
        F.dense_rank().over(w).cast("bigint").alias("bal_dense_rank"),
    )


@register_query(
    "window_moving_avg_spend",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           ROUND(
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
             / COUNT(*) OVER w, 6) AS moving_avg
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
    )
    """,
    description="moving average over a bounded rows frame",
)
def window_moving_avg_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    total = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(total / F.count("*").over(w), 6).alias("moving_avg"),
    )


@register_query(
    "window_trailing_30d_spend",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS trailing_spend
    FROM orders WHERE o_custkey <= 500
    """,
    description="rangeBetween value frame: per-customer trailing-30-day spend (frame by value, not row count — same-day ties always share a frame)",
)
def window_trailing_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 500)
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).cast("bigint")
    with_day = orders.withColumn("day", day)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-30, Window.currentRow)
    )
    return with_day.select(
        "o_orderkey",
        "o_custkey",
        "day",
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w), 2)
        .cast("double")
        .alias("trailing_spend"),
    )


@register_query(
    "trend_customer_spend_slope",
    oracle="""
    SELECT o_custkey, n, ROUND(
      CAST(CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS DOUBLE), 6) AS slope_cents_per_day
    FROM (
      SELECT o_custkey,
             COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM (
        SELECT o_custkey,
               CAST(DATEDIFF('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS x,
               CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 100, 0) AS BIGINT) AS y
        FROM orders
      ) p GROUP BY o_custkey
    ) s
    WHERE n >= 5 AND n * sxx - sx * sx <> 0
    """,
    description="per-customer OLS spend trend: exact integer-sum regression slope, one aggregation pass",
)
def trend_customer_spend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope of order value over time, per customer, in a
    single groupBy pass: x (days) and y (cents) are integers, so the
    four sufficient statistics are EXACT int64 sums at any parallelism
    — the slope formula then runs in doubles identically in both
    engines. The pattern generalizes to any per-key OLS/covariance at
    100 TB: sufficient statistics aggregate map-side, no window sort,
    no second scan, and integers below 2^53 convert to double without
    rounding."""
    orders = load_table(spark, sf_dir, "orders")
    x = F.datediff("o_orderdate", F.lit("1995-01-01")).cast("bigint")
    y = F.round(F.col("o_totalprice").cast("decimal(18,2)") * 100, 0).cast("bigint")
    stats = (
        orders.select("o_custkey", x.alias("x"), y.alias("y"))
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return (
        stats.filter(
            (F.col("n") >= 5) & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") != 0)
        )
        .select("o_custkey", "n", F.round(num / den, 6).alias("slope_cents_per_day"))
    )


@register_query(
    "window_distribution_functions",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND(PERCENT_RANK() OVER w, 6) AS bal_percent_rank,
           ROUND(CUME_DIST() OVER w, 6) AS bal_cume_dist,
           NTH_VALUE(c_acctbal, 3) OVER (PARTITION BY c_mktsegment
             ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS segment_third_highest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    description="distribution window functions: percent_rank, cume_dist, nth_value over a full frame",
)
def window_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    # the custkey tie-break totalizes the order so percent_rank and the
    # nth_value pick are engine-independent; both engines compute the
    # rank functions from the same total order
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wfull = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("bal_percent_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
        F.nth_value("c_acctbal", 3).over(wfull).alias("segment_third_highest"),
    )
