"""Core relational query suite over the TPC-H-ish star schema.

Demonstrates the engine's full SQL operator surface (SURVEY.md §2B/§2C):
scans with pushdown, projections/filters, all join flavors (broadcast-hash
for dims, sort-merge for facts, semi/anti, non-equi), hash aggregation with
partial combine, grouping sets/rollup, window functions (rank, running
aggregates), top-k, set ops, scalar string/date functions.

Scale design notes (100 TB target):
* Dimension tables (`region`, `nation`, `supplier`, `customer` at small SF)
  are joined with explicit ``F.broadcast`` hints — no shuffle of the fact
  table for dim joins; at larger dim sizes AQE's size-based planning takes
  over (hints only on the genuinely small sides: region/nation/supplier).
* Fact-fact joins (lineitem ⋈ orders) shuffle on the join key once; filters
  are applied before the join so pushdown + AQE minimize shuffled bytes.
* Aggregates are expressed as single groupBy so Catalyst plans
  partial_agg → shuffle → final_agg (map-side combine).
* Top-k uses orderBy+limit → ``TakeOrderedAndProject`` (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .helpers import (
    SQL_CHARGE,
    SQL_DISC_PRICE,
    charge,
    davg,
    dec,
    disc_price,
    dsum,
    dsum_prod,
    sql_davg,
    sql_dsum,
    sql_dsum_expr,
)
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q01 — full-scan hash aggregation (TPC-H Q1 shape)
# --------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum_expr(SQL_DISC_PRICE, 'sum_disc_price')},
           {sql_dsum_expr(SQL_CHARGE, 'sum_charge', 6)},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Pricing summary report: scan + filter + 8-way hash agg "
        "(partial+final). Reference surface: SURVEY §2C aggregation row.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum_prod(disc_price(), "sum_disc_price", 4),
            dsum_prod(charge(), "sum_charge", 6),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q02 — selective filter + single scalar aggregate (TPC-H Q6 shape)
# --------------------------------------------------------------------------
@query(
    "q02_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum_expr("CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(8,2))", 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="Revenue-change forecast: tight multi-predicate filter pushed to the "
        "parquet scan, single global aggregate.",
)
def q02_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum_prod(dec("l_extendedprice") * F.col("l_discount").cast("decimal(8,2)"), "revenue", 4),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# q03 — fact⋈fact⋈dim join + agg + top-k (TPC-H Q3 shape)
# --------------------------------------------------------------------------
@query(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum_expr(SQL_DISC_PRICE, 'revenue')},
           o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="Top-10 valuable unshipped orders: broadcast customer dim, shuffle "
        "join orders⋈lineitem, agg, TakeOrderedAndProject (no global sort).",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum_prod(disc_price(), "revenue", 4))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q04 — left-semi join (EXISTS) + agg (TPC-H Q4 shape)
# --------------------------------------------------------------------------
@query(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    doc="Order-priority check: EXISTS subquery as left-semi join.",
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# q05 — 6-way star join (TPC-H Q5 shape)
# --------------------------------------------------------------------------
@query(
    "q05_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {sql_dsum_expr(SQL_DISC_PRICE, 'revenue')}
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    doc="Regional supplier volume: 6-way star join; region/nation/supplier "
        "broadcast, facts shuffle once on orderkey.",
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    supplier = _t(spark, sf_dir, "supplier")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    nr = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    snr = supplier.join(F.broadcast(nr), supplier.s_nationkey == nr.n_nationkey)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(snr), li.l_suppkey == snr.s_suppkey)
        .join(
            customer,
            (orders.o_custkey == customer.c_custkey)
            & (customer.c_nationkey == snr.s_nationkey),
        )
        .groupBy("n_name")
        .agg(dsum_prod(disc_price(), "revenue", 4))
    )


# --------------------------------------------------------------------------
# q06 — join + agg + top-k with dims (TPC-H Q10 shape)
# --------------------------------------------------------------------------
@query(
    "q06_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_dsum_expr(SQL_DISC_PRICE, 'revenue')},
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="Top-20 customers by returned-item losses.",
)
def q06_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum_prod(disc_price(), "revenue", 4))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# q07 — window: top-k per group via row_number
# --------------------------------------------------------------------------
@query(
    "q07_top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS INTEGER) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
    doc="Top-3 orders per customer: window row_number, tie-broken by key "
        "(deterministic across engines).",
)
def q07_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# --------------------------------------------------------------------------
# q08 — window: running aggregate (prefix sums, exact decimal)
# --------------------------------------------------------------------------
@query(
    "q08_customer_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DECIMAL(38,2)) AS DOUBLE) AS running_spend
    FROM orders
    """,
    doc="Running spend per customer: ordered window frame, decimal-exact "
        "prefix sum (order fixed by (date, key) so results are deterministic).",
)
def q08_customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("decimal(38,2)").cast("double").alias("running_spend"),
    )


# --------------------------------------------------------------------------
# q09 — date extraction + multi-key agg (TPC-H Q9 flavor)
# --------------------------------------------------------------------------
@query(
    "q09_yearly_nation_volume",
    oracle=f"""
    SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           {sql_dsum_expr(SQL_DISC_PRICE, 'volume')},
           COUNT(*) AS n_lineitems
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name, o_year
    """,
    doc="Yearly volume by supplier nation: date part extraction + 2-key agg.",
)
def q09_yearly_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    sn = supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .select(
            "n_name",
            F.year("o_orderdate").alias("o_year"),
            disc_price().alias("dp"),
        )
        .groupBy("n_name", "o_year")
        .agg(
            dsum_prod(F.col("dp"), "volume", 4),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# --------------------------------------------------------------------------
# q10 — left outer join + count distribution (TPC-H Q13 shape)
# --------------------------------------------------------------------------
@query(
    "q10_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    doc="Customer order-count distribution: left outer join with a join-side "
        "predicate, two-level aggregation.",
)
def q10_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders,
            (customer.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# q11 — conditional aggregation (TPC-H Q12 shape)
# --------------------------------------------------------------------------
@query(
    "q11_priority_shipping",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
    doc="Conditional aggregation: CASE WHEN inside SUM (pivot-style counts).",
)
def q11_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# q12 — ROLLUP grouping sets
# --------------------------------------------------------------------------
@query(
    "q12_rollup_flag_status",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP over (returnflag, linestatus): grouping-sets aggregation "
        "with NULL subtotal rows.",
)
def q12_rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity", "sum_qty"),
    )


# --------------------------------------------------------------------------
# q13 — distinct aggregation
# --------------------------------------------------------------------------
@query(
    "q13_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Multi-distinct aggregation (expand + two-phase agg in Catalyst).",
)
def q13_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# q14 — HAVING + join-back (TPC-H Q18 shape)
# --------------------------------------------------------------------------
@query(
    "q14_large_orders",
    oracle=f"""
    SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
           {sql_dsum('l_quantity', 'total_qty')}
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 180
    """,
    doc="Large-volume orders: aggregate with HAVING over a grouped join. "
        "Plan: pre-aggregate lineitem on its join key and apply the HAVING "
        "filter BEFORE joining — the aggregation shuffles only the narrow "
        "(orderkey, qty) pairs and the join sees just qualifying orders, "
        "instead of shuffling the full 3-way join then aggregating. "
        "Equivalent because o_orderkey is unique in orders.",
)
def q14_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 180)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("qty_dec").cast("decimal(38,2)").cast("double").alias("total_qty"),
        )
    )


# --------------------------------------------------------------------------
# q15 — window max over aggregate (TPC-H Q15 shape, no self-join)
# --------------------------------------------------------------------------
@query(
    "q15_top_suppliers",
    oracle=f"""
    SELECT s_suppkey, s_name, total_revenue
    FROM (
      SELECT s_suppkey, s_name, total_revenue,
             MAX(total_revenue) OVER () AS max_revenue
      FROM (
        SELECT s_suppkey, s_name,
               {sql_dsum_expr(SQL_DISC_PRICE, 'total_revenue')}
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-07-01'
        GROUP BY s_suppkey, s_name
      )
    )
    WHERE total_revenue = max_revenue
    """,
    doc="Top supplier(s) by revenue: global-max window over an aggregate "
        "(replaces the reference-era correlated subquery).",
)
def q15_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    supplier = _t(spark, sf_dir, "supplier")
    rev = (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(dsum_prod(disc_price(), "total_revenue", 4))
    )
    w = Window.partitionBy()
    return (
        rev.withColumn("max_revenue", F.max("total_revenue").over(w))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# q16 — anti join
# --------------------------------------------------------------------------
@query(
    "q16_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="Customers with no orders: left-anti join (NOT EXISTS).",
)
def q16_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


# --------------------------------------------------------------------------
# q17 — non-equi join condition (range/theta)
# --------------------------------------------------------------------------
@query(
    "q17_late_shipments",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_late
    FROM lineitem
    JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority
    """,
    doc="Late shipments: equi key + non-equi (range) join residual.",
)
def q17_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late"))
    )


# --------------------------------------------------------------------------
# q18 — set operations
# --------------------------------------------------------------------------
@query(
    "q18_segment_set_ops",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    doc="INTERSECT/EXCEPT set algebra over customer keys.",
)
def q18_segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = (
        orders.filter(F.col("o_totalprice") > 100000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    low = (
        orders.filter(F.col("o_orderpriority") == "5-LOW")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return building.intersect(big).subtract(low)


# --------------------------------------------------------------------------
# q19 — scalar function surface (string/date/conditional)
# --------------------------------------------------------------------------
@query(
    "q19_scalar_functions",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           CAST(length(p_name) AS INTEGER) AS name_len,
           substr(p_type, 1, 5) AS type_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           replace(p_name, ' ', '_') AS name_snake,
           CASE WHEN p_size >= 25 THEN 'large' ELSE 'small' END AS size_class,
           CAST(round(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(8,2)), 2) AS DOUBLE) AS marked_up
    FROM part
    """,
    doc="Scalar function sweep: string ops, conditionals, decimal rounding — "
        "all whole-stage-codegen expressions, no UDFs.",
)
def q19_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.when(F.col("p_size") >= 25, "large").otherwise("small").alias("size_class"),
        F.round(dec("p_retailprice") * F.lit(1.1).cast("decimal(8,2)"), 2)
        .cast("double")
        .alias("marked_up"),
    )


# --------------------------------------------------------------------------
# q20 — min/max/avg dim aggregate + ordered output
# --------------------------------------------------------------------------
@query(
    "q20_brand_stats",
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n_parts,
           MIN(p_retailprice) AS min_price,
           MAX(p_retailprice) AS max_price,
           {sql_davg('p_retailprice', 'avg_price')},
           CAST(MIN(p_size) AS INTEGER) AS min_size,
           CAST(MAX(p_size) AS INTEGER) AS max_size
    FROM part
    GROUP BY p_brand
    """,
    doc="Brand statistics: min/max are order-independent; avg via decimal.",
)
def q20_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_retailprice").alias("min_price"),
        F.max("p_retailprice").alias("max_price"),
        davg("p_retailprice", "avg_price"),
        F.min("p_size").alias("min_size"),
        F.max("p_size").alias("max_size"),
    )
