"""Advanced aggregation surface: CUBE grouping sets and exact percentiles.

Rounds out SURVEY.md §2C's aggregation row (``df.cube()``, ``GROUPING
SETS``, percentile) beyond the ROLLUP already covered by
``q12_rollup_flag_status``.

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
