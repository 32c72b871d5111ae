"""Advanced aggregation and window surface: CUBE / GROUPING SETS, exact
percentiles, pivot, correlated scalar subqueries, and lag/ntile windows.

Rounds out SURVEY.md §2C's aggregation + window rows beyond the ROLLUP
already covered by ``q12_rollup_flag_status``. Two queries here
(``q31``, ``q34``) deliberately enter through ``spark.sql`` to exercise
the parser-facing surface (GROUPING SETS syntax, scalar-subquery
decorrelation) that the DataFrame API can't reach.

Scale: CUBE expands each input row into 2^k grouping-set copies before the
partial aggregation — with k=2 low-cardinality keys the partial agg
collapses copies map-side, so the shuffle carries only (4 × #groups) rows.
Exact percentiles sort within each (small) group; for high-cardinality
groups at 100 TB switch to ``percentile_approx`` (same API shape, bounded
memory) — both are exposed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .helpers import dsum, sql_dsum
from .registry import query


@query(
    "q29_cube_flag_status",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n_lines,
           {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over (returnflag, linestatus): all 2^2 grouping sets in one "
        "pass — per-key totals, both marginals, and the grand total. "
        "Null grouping markers projected to 'ALL' identically in both "
        "engines (base columns are non-null).",
)
def q29_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_lines"), dsum("l_quantity", "sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_lines",
            "sum_qty",
        )
    )


@query(
    "q30_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS p50_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           quantile_cont(l_extendedprice, 0.5) AS p50_price,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles per group (Spark `percentile` == "
        "DuckDB `quantile_cont`: identical linear-interpolation definition "
        "over the sorted group). The approx path for wide groups is "
        "percentile_approx with the same call shape.",
)
def q30_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("p50_qty"),
        F.percentile("l_quantity", F.lit(0.9)).alias("p90_qty"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("p50_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@query(
    "q31_grouping_sets_sql",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n_lines,
           {sql_dsum('l_extendedprice', 'sum_price')}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    doc="Explicit GROUPING SETS via the engine's SQL entry path "
        "(register_views + spark.sql — every other query uses the "
        "DataFrame API; this exercises the parser-facing surface): "
        "per-flag and per-status marginals (a strict subset of CUBE's sets) in one pass.",
)
def q31_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n_lines,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@query(
    "q32_mom_revenue_growth",
    oracle=f"""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             COUNT(*) AS n_orders,
             {sql_dsum('o_totalprice', 'revenue')}
      FROM orders
      GROUP BY month
    )
    SELECT month, n_orders, revenue,
           LAG(revenue) OVER (ORDER BY month) AS prev_revenue,
           revenue - LAG(revenue) OVER (ORDER BY month) AS mom_delta
    FROM m
    """,
    doc="Month-over-month revenue growth: monthly rollup (exact decimal "
        "accumulation) then LAG over the month axis. The global window is "
        "safe at any data scale because its input cardinality is #months — "
        "the 100-TB fact scan collapses in the partial aggregation first. "
        "Delta is a single IEEE subtraction of two bit-exact doubles.",
)
def q32_mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "revenue"),
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "n_orders",
        "revenue",
        prev.alias("prev_revenue"),
        (F.col("revenue") - prev).alias("mom_delta"),
    )


@query(
    "q33_spend_deciles",
    oracle="""
    WITH spend AS (
      SELECT o_custkey AS custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec
      FROM orders
      GROUP BY o_custkey
    )
    SELECT s.custkey, c.c_mktsegment AS segment,
           CAST(CAST(spend_dec AS DECIMAL(38,2)) AS DOUBLE) AS total_spend,
           CAST(NTILE(10) OVER (
             PARTITION BY c.c_mktsegment ORDER BY spend_dec DESC, s.custkey
           ) AS INTEGER) AS decile
    FROM spend s JOIN customer c ON s.custkey = c.c_custkey
    """,
    doc="Per-segment customer spend deciles: decimal-exact spend per "
        "customer, broadcast join to the dimension, NTILE(10) within each "
        "market segment (ties broken by custkey → deterministic). Ranking "
        "stays decimal until emission so both engines order identically; "
        "partitioning by segment bounds each window's sort.",
)
def q33_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .helpers import dec

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spend = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(dec("o_totalprice")).alias("spend_dec")
    )
    joined = spend.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        spend.custkey == F.col("c_custkey"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("spend_dec").desc(), F.col("custkey")
    )
    return joined.select(
        "custkey",
        F.col("c_mktsegment").alias("segment"),
        F.col("spend_dec").cast("decimal(38,2)").cast("double").alias("total_spend"),
        F.ntile(10).over(w).alias("decile"),
    )


# Written once, submitted verbatim to BOTH engines: Spark must decorrelate
# the scalar subquery (aggregate + rewritten join) — a planner surface the
# DataFrame API can't reach — and the arithmetic follows the helpers.py
# decimal discipline so the two engines emit bit-identical doubles.
_Q34_SQL = """
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
            AS DECIMAL(38,2)) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#4'
  AND l.l_quantity < (
    SELECT 0.2 * (CAST(CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
                       AS DECIMAL(38,2)) AS DOUBLE) / COUNT(*))
    FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


@query(
    "q34_small_quantity_revenue",
    oracle=_Q34_SQL,
    doc="TPC-H Q17 shape: revenue from below-one-fifth-of-average-quantity "
        "orders per part, expressed as a correlated scalar subquery and "
        "submitted as SQL so Catalyst exercises subquery decorrelation "
        "(rewrite to per-part aggregate + join). At scale the decorrelated "
        "per-part aggregate shuffles on l_partkey once and the brand "
        "dimension filter broadcasts.",
)
def q34_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q34_SQL)


@query(
    "q35_pivot_status_by_flag",
    oracle="""
    SELECT l_returnflag AS returnflag,
           CAST(CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(18,2)) END)
                AS DECIMAL(38,2)) AS DOUBLE) AS F,
           CAST(CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(18,2)) END)
                AS DECIMAL(38,2)) AS DOUBLE) AS O
    FROM lineitem
    GROUP BY returnflag
    """,
    doc="Pivot: linestatus values become columns of per-flag quantity "
        "totals. The pivot value list is explicit — at 100 TB an implicit "
        "pivot would first run a driver-side DISTINCT over the fact table; "
        "pinning the values keeps it one pass (conditional partial aggs, "
        "single shuffle on the group key).",
)
def q35_pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .helpers import dec

    lineitem = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        lineitem.groupBy(F.col("l_returnflag").alias("returnflag"))
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(dec("l_quantity")))
    )
    return pivoted.select(
        "returnflag",
        F.col("F").cast("decimal(38,2)").cast("double").alias("F"),
        F.col("O").cast("decimal(38,2)").cast("double").alias("O"),
    )


@query(
    "q79_grouping_id",
    oracle="""
    SELECT CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                AS BIGINT) AS gid,
           COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gid, returnflag, linestatus
    """,
    doc="CUBE with GROUPING()-derived aggregation-level ids: the SQL:1999 "
        "surface that disambiguates a real NULL group key from a rollup "
        "super-aggregate row — gid encodes which columns are aggregated "
        "away (0 = detail, 3 = grand total). Spark's grouping_id() and "
        "DuckDB's GROUPING() compose the same bit pattern; stated "
        "explicitly in both engines. One Expand + hash agg, same plan "
        "as q29's CUBE.",
)
def q79_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                    AS BIGINT) AS gid,
               COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY gid, returnflag, linestatus
        """
    )
