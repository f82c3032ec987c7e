"""Coverage completions for SURVEY §2b: outer/cross joins, exceptAll,
GROUPING SETS, subqueries through the SQL front-end, array/map
functions, exact percentiles, regex extraction, null-safe semantics,
inline lookup tables, and approx-distinct with a tolerance gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dsum, dsum_expr
from ..sources import load_table, register_temp_views
from .registry import register_query


@register_query(
    "outer_join_nation_order_counts",
    oracle="""
    SELECT n.n_nationkey, n.n_name, COALESCE(o.n_orders, 0) AS n_orders
    FROM nation n
    LEFT JOIN (
      SELECT c_nationkey, COUNT(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey
    ) o ON n.n_nationkey = o.c_nationkey
    """,
    description="left outer join with null-fill (dims keep rows with no facts)",
)
def outer_join_nation_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per_nation = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        nation.join(per_nation, nation.n_nationkey == per_nation.c_nationkey, "left")
        .select(
            "n_nationkey",
            "n_name",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
    )


@register_query(
    "full_outer_customer_supplier_nations",
    oracle="""
    SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
           COALESCE(c.n_cust, 0) AS n_cust,
           COALESCE(s.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
    FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
      ON c.c_nationkey = s.s_nationkey
    """,
    description="full outer join of two aggregates",
)
def full_outer_customer_supplier_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        cust.join(supp, cust.c_nationkey == supp.s_nationkey, "full_outer")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@register_query(
    "cross_join_region_priorities",
    oracle="""
    SELECT r_name, p.o_orderpriority
    FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
    """,
    description="cross join of two tiny domains (broadcast NLJ)",
)
def cross_join_region_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").select("r_name")
    prios = load_table(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    return region.crossJoin(F.broadcast(prios))


@register_query(
    "exceptall_priority_orders",
    oracle="""
    WITH high AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
    low AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
    SELECT o_custkey, COUNT(*) AS n FROM (
      SELECT o_custkey FROM high
      EXCEPT ALL
      SELECT o_custkey FROM low
    ) t GROUP BY o_custkey
    """,
    description="EXCEPT ALL multiset difference (bag semantics preserved)",
)
def exceptall_priority_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    high = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return high.exceptAll(low).groupBy("o_custkey").agg(F.count("*").alias("n"))


@register_query(
    "grouping_sets_revenue",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(ship_year_raw, -1) AS ship_year,
           n
    FROM (
      SELECT l_returnflag,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year_raw,
             COUNT(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (ship_year_raw))
    ) t
    """,
    description="explicit GROUPING SETS through the SQL front-end",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(ship_year_raw, -1) AS ship_year,
               n
        FROM (
          SELECT l_returnflag,
                 CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year_raw,
                 COUNT(*) AS n
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag), (CAST(EXTRACT(year FROM l_shipdate) AS BIGINT)))
        ) t
        """
    )


@register_query(
    "sql_scalar_subquery_above_avg",
    oracle="""
    SELECT COUNT(*) AS n_above
    FROM part
    WHERE p_retailprice > (SELECT ROUND(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                                        / COUNT(*), 4) FROM part)
    """,
    description="scalar subquery via the SQL front-end (deterministic avg)",
)
def sql_scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT COUNT(*) AS n_above
        FROM part
        WHERE p_retailprice > (SELECT ROUND(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                                            / COUNT(*), 4) FROM part)
        """
    )


@register_query(
    "array_functions_showcase",
    oracle="""
    SELECT vec_id,
           LEN(embedding) AS dim,
           ROUND(CAST(LIST_SUM(LIST_TRANSFORM(embedding,
                 x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,14)) AS DOUBLE))) AS DOUBLE), 4) AS vec_sum,
           ROUND(CAST(MAX(u.v) AS DOUBLE), 6) AS vec_max
    FROM embeddings, LATERAL UNNEST(embedding) AS u(v)
    GROUP BY vec_id, embedding
    """,
    description="array ops: size, element transform+fold, per-array max",
)
def array_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(
            F.aggregate(
                vec,
                F.lit(0).cast("decimal(28,14)"),
                lambda acc, x: (acc + x.cast("decimal(28,14)")).cast("decimal(28,14)"),
            ).cast("double"),
            4,
        ).alias("vec_sum"),
        F.round(F.array_max(vec), 6).alias("vec_max"),
    )


@register_query(
    "map_functions_showcase",
    oracle="""
    SELECT lang, n_docs, total_chars FROM (
      SELECT lang, COUNT(*) AS n_docs,
             -- bare SUM over int yields DuckDB HUGEINT (int128), which the
             -- driver's typed hash sees as a different value class than
             -- Spark's bigint; pin the output type explicitly
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents GROUP BY lang
    ) t
    """,
    description="map construction/explode round-trip (map_from_entries -> explode)",
)
def map_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )
    # pack into a map column, then unpack — exercises MapType end-to-end
    packed = per_lang.select(
        "lang",
        F.create_map(
            F.lit("n_docs"), F.col("n_docs"), F.lit("total_chars"), F.col("total_chars")
        ).alias("stats"),
    )
    return packed.select(
        "lang",
        F.col("stats")["n_docs"].alias("n_docs"),
        F.col("stats")["total_chars"].alias("total_chars"),
    )


@register_query(
    "percentile_acctbal_by_nation",
    oracle="""
    SELECT c_nationkey,
           ROUND(QUANTILE_CONT(c_acctbal, 0.5), 4) AS median_bal,
           ROUND(QUANTILE_CONT(c_acctbal, 0.9), 4) AS p90_bal
    FROM customer GROUP BY c_nationkey
    """,
    description="exact continuous percentiles (sort-based, no sketch)",
)
def percentile_acctbal_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("median_bal"),
        F.round(F.expr("percentile(c_acctbal, 0.9)"), 4).alias("p90_bal"),
    )


@register_query(
    "regexp_extract_part_names",
    oracle="""
    SELECT p_partkey,
           REGEXP_EXTRACT(p_name, '([a-z]+)_(\\d+)', 2) AS name_num,
           REGEXP_MATCHES(p_name, '\\d$') AS ends_digit
    FROM part WHERE p_partkey <= 500
    """,
    description="regex extraction + boolean regex predicate",
)
def regexp_extract_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)_(\d+)", 2).alias("name_num"),
        F.col("p_name").rlike(r"\d$").alias("ends_digit"),
    )


@register_query(
    "nullsafe_join_semantics",
    oracle="""
    WITH l AS (SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey END AS k,
                      n_name FROM nation),
         r AS (SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey END AS k,
                      n_regionkey FROM nation)
    SELECT COUNT(*) AS n_matches
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
    description="null-safe equality join (<=> / IS NOT DISTINCT FROM)",
)
def nullsafe_join_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    k = F.when(F.col("n_nationkey") % 5 == 0, None).otherwise(F.col("n_nationkey"))
    left = nation.select(k.alias("lk"), "n_name")
    right = nation.select(k.alias("rk"), "n_regionkey")
    return left.join(right, left.lk.eqNullSafe(right.rk)).agg(
        F.count("*").alias("n_matches")
    )


@register_query(
    "inline_lookup_broadcast_join",
    oracle="""
    SELECT m.region_group, COUNT(*) AS n_nations
    FROM nation n
    JOIN (VALUES (0, 'west'), (1, 'east'), (2, 'north'), (3, 'south'), (4, 'central'))
         AS m(r_key, region_group)
      ON n.n_regionkey = m.r_key
    GROUP BY m.region_group
    """,
    description="inline VALUES lookup table broadcast-joined to a dim",
)
def inline_lookup_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    # a VALUES literal stays entirely JVM-side; createDataFrame here cost
    # ~4s of Python->JVM RPC + schema inference overhead in the bench
    lookup = spark.sql(
        "SELECT r_key, region_group FROM VALUES"
        " (0, 'west'), (1, 'east'), (2, 'north'), (3, 'south'), (4, 'central')"
        " AS m(r_key, region_group)"
    )
    return (
        nation.join(F.broadcast(lookup), nation.n_regionkey == lookup.r_key)
        .groupBy("region_group")
        .agg(F.count("*").alias("n_nations"))
    )


@register_query(
    "unpivot_lineitem_metrics",
    oracle=f"""
    SELECT metric, {dsum_expr('value', 6)} AS total, COUNT(*) AS n
    FROM (
      SELECT l_orderkey, metric, value
      FROM lineitem
      UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax))
    ) t
    GROUP BY metric
    """,
    description="unpivot/melt: wide numeric columns to long (metric, value) rows, then per-metric totals",
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="value",
    )
    return long.groupBy("metric").agg(
        dsum("value", 6).alias("total"), F.count("*").alias("n")
    )


@register_query(
    "range_join_quantity_bands",
    oracle="""
    SELECT b.band_name, COUNT(*) AS n_lines
    FROM lineitem l
    JOIN (VALUES ('scarce', 0.0, 10.0), ('moderate', 10.0, 25.0),
                 ('bulk', 25.0, 40.0), ('huge', 40.0, 1e9))
         AS b(band_name, lo, hi)
      ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.band_name
    """,
    description="range join: fact column into broadcast interval bands (inequality-only join condition)",
)
def range_join_quantity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join — no equality key, so Spark plans a broadcast
    nested-loop join; the band table is tiny and explicitly broadcast,
    keeping the fact side map-only (the scalable shape for banding,
    binning, and calendar joins at 100 TB)."""
    li = load_table(spark, sf_dir, "lineitem")
    # VALUES literal, not createDataFrame: the Python->JVM RPC + schema
    # inference costs seconds of pure overhead on a 4-row table
    bands = spark.sql(
        "SELECT band_name, CAST(lo AS DOUBLE) lo, CAST(hi AS DOUBLE) hi FROM VALUES"
        " ('scarce', 0.0, 10.0), ('moderate', 10.0, 25.0),"
        " ('bulk', 25.0, 40.0), ('huge', 40.0, 1e9)"
        " AS b(band_name, lo, hi)"
    )
    return (
        li.join(F.broadcast(bands), (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi))
        .groupBy("band_name")
        .agg(F.count("*").alias("n_lines"))
    )


@register_query(
    "approx_distinct_with_tolerance",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS exact_distinct, TRUE AS approx_within_5pct
    FROM orders
    """,
    description="approx_count_distinct (HLL++) gated against the exact count — the oracle pins exactness of the gate, not the sketch",
)
def approx_distinct_with_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.countDistinct("o_custkey").alias("exact_distinct"),
        F.approx_count_distinct("o_custkey", rsd=0.03).alias("approx"),
    )
    return agg.select(
        "exact_distinct",
        (
            F.abs(F.col("approx") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("approx_within_5pct"),
    )


@register_query(
    "skew_salted_hot_key_agg",
    oracle="""
    SELECT grp,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
    FROM (
      SELECT CASE WHEN o_custkey % 10 < 7 THEN 0 ELSE o_custkey END AS k,
             o_totalprice
      FROM orders
    ) big
    JOIN (
      SELECT DISTINCT CASE WHEN o_custkey % 10 < 7 THEN 0 ELSE o_custkey END AS k,
             CAST(CASE WHEN o_custkey % 10 < 7 THEN 0 ELSE o_custkey END % 5 AS VARCHAR) AS grp
      FROM orders
    ) dim ON big.k = dim.k
    GROUP BY grp
    """,
    description="skew-mitigated aggregation: 70% of rows land on one hot key; salted join scatters it, result equals the plain join exactly",
)
def skew_salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key demonstration wired through :func:`~..functions.skew.
    salted_join`: ~70% of orders are remapped to one synthetic key, the
    pathological shape where one shuffle partition holds most of the
    data. The salt scatters the hot key across 16 buckets while the
    replicated dim guarantees the join result is EXACTLY the plain
    join's multiset (the oracle computes the unsalted join), so the
    mitigation is free of semantic drift."""
    from ..functions.skew import salted_join

    orders = load_table(spark, sf_dir, "orders")
    k = F.when(F.col("o_custkey") % 10 < 7, 0).otherwise(F.col("o_custkey"))
    big = orders.select(k.alias("k"), "o_totalprice")
    dim = (
        orders.select(k.alias("k"))
        .distinct()
        .select("k", (F.col("k") % 5).cast("string").alias("grp"))
    )
    return (
        salted_join(big, dim, on="k", salt=16)
        .groupBy("grp")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total"),
        )
    )


# -- skyline (Pareto-optimal set) --------------------------------------------
# The multi-criteria shortlist operator (EDBT'23 integrated it into
# Spark SQL as a dedicated physical operator; composed DataFrame ops
# express it without engine surgery): a part is on the skyline iff no
# other part is at-most-its-price AND at-least-its-size with one strict.
# Distributed shape is the classic two-phase BNL: skyline() is closed
# under union-of-local-skylines, so each partition prunes to its local
# skyline map-side (an O(n log n) sort + linear sweep in Arrow batches),
# and only those survivors — output-sized, not input-sized — meet in the
# final single-partition sweep. A naive dominance ANTI-join is O(n^2)
# pairs; this never materializes a pair at all.


def _skyline_sweep(batches):
    """Local skyline per Arrow batch-set: sort (price asc, size desc),
    keep points whose size strictly exceeds the best seen — or ties it
    at the same price (equal points are mutually non-dominated)."""
    import pandas as pd

    for pdf in batches:
        if len(pdf) == 0:
            continue
        s = pdf.sort_values(
            ["p_retailprice", "p_size"], ascending=[True, False]
        ).reset_index(drop=True)
        keep, best_size, best_price = [], None, None
        for price, size in zip(s["p_retailprice"], s["p_size"]):
            if best_size is None or size > best_size:
                keep.append(True)
                best_size, best_price = size, price
            else:
                keep.append(size == best_size and price == best_price)
        yield s[pd.Series(keep, index=s.index)]


@register_query(
    "skyline_parts_price_size",
    oracle="""
    SELECT p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS p_size
    FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    """,
    description="skyline query: Pareto-optimal parts (min retailprice, max size) via two-phase local-skyline sweep, no pairwise dominance join",
)
def skyline_parts_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", F.col("p_size").cast("long").alias("p_size")
    )
    schema = "p_partkey long, p_retailprice double, p_size long"
    local = part.mapInPandas(_skyline_sweep, schema)
    # survivors are skyline-sized; one exchange to a single sweep.
    # (If a workload's skyline were pathologically large, add one more
    # hash-bucketed sweep level before this — skyline-of-skylines
    # composes arbitrarily.)
    return local.repartition(1).mapInPandas(_skyline_sweep, schema)


@register_query(
    "approx_percentile_with_tolerance",
    oracle="""
    WITH r AS (
      SELECT o_totalprice AS v,
             ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER () AS n
      FROM orders
    )
    SELECT MAX(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT) THEN v END) AS exact_p50,
           MAX(CASE WHEN rn = CAST(CEIL(0.95 * n) AS BIGINT) THEN v END) AS exact_p95,
           TRUE AS approx_within_2pct
    FROM r
    """,
    description="approx_percentile (mergeable sketch) gated against exact rank-discrete percentiles — the oracle pins exactness of the gate, not the sketch",
)
def approx_percentile_with_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch counterpart of ``approx_distinct_with_tolerance``:
    ``approx_percentile`` aggregates mergeable partial sketches (the
    only way percentiles scale past a single pass at 100 TB), and the
    query gates the estimate against the exact percentile. The exact
    side is RANK-DISCRETE (the ceil(q*n)-th smallest value, orderkey
    tie-break), not interpolated — a continuous median interpolates to
    a half-cent whose double representation rounds differently across
    engines; an element of the data cannot. The global rank is the
    price of exactness (same cost class Spark's own ``percentile``
    pays in its single reducer); the sketch path it gates is the one
    that scales."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("v", "o_orderkey")
    r = (
        orders.select(F.col("o_totalprice").alias("v"), "o_orderkey")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy()))
    )
    agg = r.agg(
        F.max(
            F.when(F.col("rn") == F.ceil(0.50 * F.col("n")).cast("bigint"), F.col("v"))
        ).alias("exact_p50"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.95 * F.col("n")).cast("bigint"), F.col("v"))
        ).alias("exact_p95"),
        F.expr("approx_percentile(v, 0.50, 10000)").alias("ap50"),
        F.expr("approx_percentile(v, 0.95, 10000)").alias("ap95"),
    )
    return agg.select(
        "exact_p50",
        "exact_p95",
        (
            (F.abs(F.col("ap50") - F.col("exact_p50")) <= 0.02 * F.col("exact_p50"))
            & (F.abs(F.col("ap95") - F.col("exact_p95")) <= 0.02 * F.col("exact_p95"))
        ).alias("approx_within_2pct"),
    )


# -- temporal (interval-containment) join ------------------------------------


@register_query(
    "temporal_join_events_to_priority_state",
    oracle="""
    WITH ordered AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
             LAG(o_orderpriority) OVER w AS prev_p
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), runs AS (
      SELECT o_custkey, o_orderdate, o_orderpriority,
             SUM(CASE WHEN prev_p IS NULL OR prev_p <> o_orderpriority THEN 1 ELSE 0 END)
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      FROM ordered
    ), collapsed AS (
      SELECT o_custkey, run_id, MIN(o_orderpriority) AS state,
             MIN(o_orderdate) AS valid_from
      FROM runs GROUP BY o_custkey, run_id
    ), intervals AS (
      SELECT o_custkey, state, valid_from,
             LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY run_id) AS valid_to
      FROM collapsed
    )
    SELECT i.state,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e
    JOIN intervals i
      ON i.o_custkey = e.user_id
     AND CAST(e.ts AS DATE) >= i.valid_from
     AND (i.valid_to IS NULL OR CAST(e.ts AS DATE) < i.valid_to)
    GROUP BY i.state
    """,
    description="temporal join: events matched to the SCD-2 priority state valid AT event time (equi-key + interval containment, no as-of approximation)",
)
def temporal_join_events_to_priority_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bitemporal-lite primitive: fact rows joined to the dimension
    interval CONTAINING their event time — stricter than an as-of join
    (which takes the latest earlier row; this also honors interval
    ends). Intervals come from collapsing per-customer priority runs
    (the SCD-2 build, one customer-keyed exchange); the probe is an
    equi-join on the entity key with the containment predicate applied
    in-partition — at 100 TB both sides shuffle once on the key and the
    interval check never leaves the partition."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_p = F.lag("o_orderpriority").over(w)
    chg = F.when(prev_p.isNull() | (prev_p != F.col("o_orderpriority")), 1).otherwise(0)
    runs = orders.select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority", chg.alias("chg")
    ).withColumn("run_id", F.sum("chg").over(wrun))
    collapsed = runs.groupBy("o_custkey", "run_id").agg(
        F.min("o_orderpriority").alias("state"),
        F.min("o_orderdate").alias("valid_from"),
    )
    w2 = Window.partitionBy("o_custkey").orderBy("run_id")
    intervals = collapsed.select(
        "o_custkey",
        "state",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    joined = ev.join(
        intervals,
        (ev.user_id == intervals.o_custkey)
        & (F.col("d") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("d") < F.col("valid_to"))),
    )
    return joined.groupBy("state").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


@register_query(
    "sql_pipe_syntax_priority_stats",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           {dsum_expr("o_totalprice")} AS total
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    HAVING COUNT(*) > 10
    """,
    description=(
        "Spark 4 SQL pipe syntax (FROM ... |> WHERE |> AGGREGATE |> WHERE): "
        "linear dataflow SQL, same plan as the nested form"
    ),
)
def sql_pipe_syntax_priority_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipe operators compile to the identical Catalyst plan as
    nested SQL — the win is authoring order matching dataflow order, a
    Spark-4.0+ front-end feature (SPARK-49555). Aggregation uses the
    repo's deterministic decimal-sum contract so the DuckDB oracle
    hash-matches bit-for-bit."""
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
           GROUP BY o_orderpriority
        |> WHERE n > 10
        |> SELECT o_orderpriority, n, total
        """
    )


@register_query(
    "sql_session_variable_topdecile",
    oracle=f"""
    WITH cut AS (
      SELECT PERCENTILE_DISC(0.9) WITHIN GROUP (
               ORDER BY CAST(o_totalprice * 100 AS BIGINT)) AS cutoff_cents
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_top,
           {dsum_expr("o_totalprice")} AS total
    FROM orders, cut
    WHERE CAST(o_totalprice * 100 AS BIGINT) > cutoff_cents
    """,
    description=(
        "SQL session variables (DECLARE/SET VARIABLE, Spark 4): a computed "
        "threshold parameterizes a later statement without string splicing; "
        "discrete percentile on integer cents keeps the cutoff engine-exact"
    ),
)
def sql_session_variable_topdecile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_DISC is an order statistic (no interpolation), taken
    over integer cents — bit-identical in any engine — so the variable
    the second statement reads is deterministic, unlike a float
    PERCENTILE_CONT cutoff that can drift one ulp between engines and
    flip boundary rows."""
    register_temp_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE topdecile_cutoff_cents BIGINT")
    spark.sql(
        """
        SET VARIABLE topdecile_cutoff_cents = (
          SELECT PERCENTILE_DISC(0.9) WITHIN GROUP (
                   ORDER BY CAST(o_totalprice * 100 AS BIGINT))
          FROM orders
        )
        """
    )
    return spark.sql(
        """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_top,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
        FROM orders
        WHERE CAST(o_totalprice * 100 AS BIGINT) > topdecile_cutoff_cents
        """
    )


@register_query(
    "lateral_topk_orders_per_customer",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice
    FROM (
      SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c.c_custkey
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    ) WHERE rk <= 2
    """,
    description=(
        "correlated LATERAL subquery join (per-customer ORDER BY ... LIMIT 2): "
        "Catalyst decorrelates to a ranked window, never a per-row re-scan; "
        "oracle replays as ROW_NUMBER"
    ),
)
def lateral_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic (price DESC, orderkey) tiebreak makes top-2
    unambiguous, so the LATERAL form and the window-rank oracle agree
    row-for-row in any engine."""
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        """
    )
