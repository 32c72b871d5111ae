"""Second relational batch: global-share HAVING (TPC-H Q11 shape),
EXISTS / NOT EXISTS decorrelation (Q21 shape), scalar-subquery + anti-join
(Q22 shape), bucketed histograms, and exact-moment dispersion statistics.

These fill the remaining classic analytic shapes in SURVEY.md §2C's join +
aggregation rows: semi/anti joins produced by subquery decorrelation, a
broadcast scalar threshold, and numerically robust second-moment statistics
(built-in ``stddev``/``corr`` accumulate doubles in shuffle order and are
not cross-engine reproducible — here the moments accumulate in exact
DECIMAL and the final formula is a fixed IEEE op sequence, so results are
bit-identical at any partitioning; same discipline as plans/helpers.py).

Scale notes are per-query in the docstrings; the common theme: every fact
scan aggregates (or semi-joins) before anything wide, thresholds broadcast,
and nothing ever collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table, register_views
from .helpers import SQL_DISC_PRICE, dec, disc_price, sql_dsum
from .registry import query

REV_SHARE_MULT = 1.6  # Q11-style threshold: > 1.6× the average part share


@query(
    "q36_part_revenue_share",
    oracle=f"""
    WITH part_rev AS (
      SELECT l_partkey AS partkey,
             SUM({SQL_DISC_PRICE}) AS rev_dec
      FROM lineitem
      GROUP BY partkey
    ), total AS (
      SELECT CAST(CAST(SUM(rev_dec) AS DECIMAL(38,4)) AS DOUBLE) AS total_rev,
             COUNT(*) AS n_parts
      FROM part_rev
    )
    SELECT partkey,
           CAST(CAST(rev_dec AS DECIMAL(38,4)) AS DOUBLE) AS part_rev,
           CAST(CAST(rev_dec AS DECIMAL(38,4)) AS DOUBLE) / total_rev AS share
    FROM part_rev, total
    WHERE CAST(CAST(rev_dec AS DECIMAL(38,4)) AS DOUBLE)
          > {REV_SHARE_MULT} * total_rev / n_parts
    """,
    doc="TPC-H Q11 shape: parts whose discounted revenue exceeds a multiple "
        "of the AVERAGE part's share of the global total (scale-free — the "
        "threshold adapts to any SF). One shuffle on l_partkey builds "
        "per-part revenue; the global total+count is a second aggregation "
        "over that (already tiny) table, broadcast back as a one-row cross "
        "join — the 100-TB fact table is scanned exactly once and the "
        "threshold comparison never reshuffles it. Both sides accumulate "
        "in exact DECIMAL, so share = one IEEE division of bit-identical "
        "doubles.",
)
def q36_part_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # consumed twice (global total + threshold join): materialize the
    # per-part aggregate once so the fact table is scanned exactly once
    part_rev = (
        li.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(disc_price()).alias("rev_dec"))
        .localCheckpoint(eager=False)
    )
    total = part_rev.agg(
        F.sum("rev_dec").cast("decimal(38,4)").cast("double").alias("total_rev"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    rev_d = F.col("rev_dec").cast("decimal(38,4)").cast("double")
    return (
        part_rev.crossJoin(F.broadcast(total))
        .filter(rev_d > F.lit(REV_SHARE_MULT) * F.col("total_rev") / F.col("n_parts"))
        .select(
            "partkey",
            rev_d.alias("part_rev"),
            (rev_d / F.col("total_rev")).alias("share"),
        )
    )


# Submitted verbatim to BOTH engines (like q34): Spark must decorrelate one
# EXISTS and one NOT EXISTS that reference a column of the outer join
# (o_orderdate) into left-semi / left-anti joins on l_orderkey.
# "Late" is adapted to this schema (no l_commitdate): shipped > 60 days
# after the order date.
_Q37_SQL = """
SELECT s.s_name AS supplier, COUNT(*) AS n_waiting_lines
FROM lineitem l1
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY supplier
"""


@query(
    "q37_waiting_suppliers",
    oracle=_Q37_SQL,
    doc="TPC-H Q21 shape: suppliers who were the SOLE late shipper on "
        "completed multi-supplier orders — a correlated EXISTS plus a "
        "correlated NOT EXISTS, submitted as SQL so Catalyst plans them as "
        "left-semi and left-anti joins on l_orderkey. All three lineitem "
        "legs shuffle on the same key (co-partitioned, AQE merges them); "
        "the supplier dimension broadcasts. No driver-side logic.",
)
def q37_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q37_SQL)


_Q38_SQL = """
SELECT n.n_name AS nation, COUNT(*) AS n_customers,
       CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2))
            AS DOUBLE) AS total_bal
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE c.c_acctbal > (
  SELECT CAST(CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2)))
              AS DECIMAL(38,2)) AS DOUBLE) / COUNT(*)
  FROM customer c2 WHERE c2.c_acctbal > 0.0
)
AND NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
GROUP BY nation
"""


@query(
    "q38_idle_rich_customers",
    oracle=_Q38_SQL,
    doc="TPC-H Q22 shape: above-average-balance customers with no urgent "
        "order, per nation. An uncorrelated scalar subquery (exact-decimal "
        "global average, computed once and broadcast into the filter) plus "
        "a NOT EXISTS that Catalyst rewrites to a left-anti join against "
        "the pre-filtered urgent-orders side. The anti join's build side "
        "shrinks by the priority filter BEFORE the shuffle; the nation "
        "dimension broadcasts.",
)
def q38_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q38_SQL)


BUCKET_WIDTH = 25_000  # o_totalprice histogram bucket width


@query(
    "q39_order_price_histogram",
    oracle=f"""
    SELECT CAST(FLOOR(o_totalprice / {BUCKET_WIDTH}.0) AS INTEGER) AS bucket,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'bucket_revenue')}
    FROM orders
    GROUP BY bucket
    """,
    doc="Fixed-width histogram of order values: bucket = floor(x / width) "
        "computed row-side, then one hash aggregation — the distributed "
        "histogram primitive (a training-data profiling staple). Bucket "
        "count is data-independent and small, so map-side partial "
        "aggregation collapses everything before one tiny shuffle.",
)
def q39_order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .helpers import dsum

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / F.lit(float(BUCKET_WIDTH)))
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "bucket_revenue"),
        )
    )


@query(
    "q40_dispersion_exact_moments",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                  AS DECIMAL(38,2)) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                           * CAST(l_quantity AS DECIMAL(18,2)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,2)))
                  AS DECIMAL(38,2)) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                           * CAST(l_discount AS DECIMAL(18,2)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS syy,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                           * CAST(l_discount AS DECIMAL(18,2)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS sxy
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag AS returnflag,
           n AS n_lines,
           sqrt(sxx / n - (sx / n) * (sx / n)) AS stddev_qty,
           sqrt(syy / n - (sy / n) * (sy / n)) AS stddev_disc,
           (sxy / n - (sx / n) * (sy / n))
             / (sqrt(sxx / n - (sx / n) * (sx / n))
                * sqrt(syy / n - (sy / n) * (sy / n))) AS corr_qty_disc
    FROM m
    """,
    doc="Population stddev + Pearson correlation from EXACT decimal moments "
        "(sums of x, x², y, y², xy — 2dp content squares to 4dp, still "
        "exact). Built-in stddev/corr merge double partials in shuffle "
        "order and are not reproducible across engines or even across "
        "runs; decimal moments are associative, so one pass + one shuffle "
        "yields bit-identical statistics at any parallelism. The closing "
        "formula is the same fixed IEEE op sequence in both engines.",
)
def q40_dispersion_exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = dec("l_quantity")
    y = dec("l_discount")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("decimal(38,2)").cast("double").alias("sx"),
        F.sum(x * x).cast("decimal(38,4)").cast("double").alias("sxx"),
        F.sum(y).cast("decimal(38,2)").cast("double").alias("sy"),
        F.sum(y * y).cast("decimal(38,4)").cast("double").alias("syy"),
        F.sum(x * y).cast("decimal(38,4)").cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (
        F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy")
    )
    var_x = sxx / n - (sx / n) * (sx / n)
    var_y = syy / n - (sy / n) * (sy / n)
    return m.select(
        F.col("l_returnflag").alias("returnflag"),
        n.alias("n_lines"),
        F.sqrt(var_x).alias("stddev_qty"),
        F.sqrt(var_y).alias("stddev_disc"),
        ((sxy / n - (sx / n) * (sy / n)) / (F.sqrt(var_x) * F.sqrt(var_y))).alias(
            "corr_qty_disc"
        ),
    )


@query(
    "q42_unpivot_measures",
    oracle=f"""
    WITH m AS (
      SELECT l_returnflag,
             {sql_dsum('l_quantity', 'sum_qty')},
             {sql_dsum('l_extendedprice', 'sum_price')}
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM m
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM m
    """,
    doc="Unpivot (melt): wide per-flag measures reshaped to long "
        "(flag, measure, value) rows — the DataFrame `unpivot` operator "
        "(SQL UNION ALL equivalent in the oracle). Runs AFTER the "
        "aggregation, so the reshape touches #groups x #measures rows, "
        "never the fact table.",
)
def q42_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .helpers import dsum

    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(
        dsum("l_quantity", "sum_qty"), dsum("l_extendedprice", "sum_price")
    )
    return m.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price"], "measure", "value"
    )


@query(
    "q43_suppliers_per_nation_array",
    oracle="""
    SELECT n.n_name AS nation,
           array_to_string(list_sort(array_agg(s.s_name)), '|') AS suppliers,
           COUNT(*) AS n_suppliers
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY nation
    """,
    doc="Array-valued aggregation: per nation, the sorted list of supplier "
        "names (collect_list + sort_array == DuckDB array_agg + list_sort; "
        "sorting makes the collected order deterministic — collect_list "
        "alone is partition-order-dependent and NOT reproducible). The "
        "output serializes the array to a '|'-joined scalar: the driver's "
        "pandas canonicalizer cannot hash list cells (r02 finding), so "
        "every registered query emits scalar-only top-level columns. "
        "Collected groups must be bounded (dimension-sized here); an "
        "unbounded collect at 100 TB is an OOM by design, not a bug.",
)
def q43_suppliers_per_nation_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.array_join(F.sort_array(F.collect_list("s_name")), "|").alias(
                "suppliers"
            ),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )


# Submitted verbatim to BOTH engines: a correlated LATERAL subquery with
# ORDER BY + LIMIT — Catalyst plans a LateralJoin (DuckDB a lateral
# dependent join); values are raw parquet doubles, no accumulation needed.
_Q46_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (
  SELECT o.o_orderkey, o.o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o.o_totalprice DESC, o.o_orderkey
  LIMIT 2
) t
WHERE c.c_mktsegment = 'BUILDING'
"""


@query(
    "q46_lateral_topk",
    oracle=_Q46_SQL,
    doc="Correlated LATERAL subquery: top-2 orders per BUILDING-segment "
        "customer, expressed as a lateral dependent join (the remaining "
        "subquery planner surface after scalar/EXISTS decorrelation — "
        "q34/q37/q38). Catalyst rewrites it to a ranked join on o_custkey; "
        "ties broken by orderkey so both engines pick identical rows. The "
        "window form (q07) is the hand-decorrelated twin — this exercises "
        "the parser/planner path.",
)
def q46_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q46_SQL)


TRADE_A, TRADE_B = "NATION_1", "NATION_2"


@query(
    "q47_bilateral_trade",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           COUNT(*) AS n_lines,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * CAST(1 - l.l_discount AS DECIMAL(8,2)))
                AS DECIMAL(38,4)) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    WHERE (sn.n_name = '{TRADE_A}' AND cn.n_name = '{TRADE_B}')
       OR (sn.n_name = '{TRADE_B}' AND cn.n_name = '{TRADE_A}')
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bilateral shipping volume between two nations by "
        "year. Both dimension legs pre-filter to the two nations BEFORE "
        "joining (nation broadcasts into supplier and customer, shrinking "
        "each to 2/25), so the filtered supplier side broadcasts into the "
        "fact scan; the orders leg stays an unhinted equi-join — at 100 TB "
        "orders is fact-sized and must shuffle (AQE converts it to "
        "broadcast only when the filtered side actually fits).",
)
def q47_bilateral_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nation = (
        load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name")
        .filter(F.col("n_name").isin(TRADE_A, TRADE_B))
    )
    supp_f = supp.join(
        F.broadcast(nation.withColumnRenamed("n_name", "supp_nation")),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    cust_f = cust.join(
        F.broadcast(nation.withColumnRenamed("n_name", "cust_nation")),
        cust.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", "cust_nation")
    ord_f = orders.join(cust_f, orders.o_custkey == cust_f.c_custkey).select(
        "o_orderkey", "cust_nation"
    )
    pair = (
        (F.col("supp_nation") == TRADE_A) & (F.col("cust_nation") == TRADE_B)
    ) | ((F.col("supp_nation") == TRADE_B) & (F.col("cust_nation") == TRADE_A))
    joined = (
        li.join(F.broadcast(supp_f), li.l_suppkey == F.col("s_suppkey"))
        .join(ord_f, li.l_orderkey == F.col("o_orderkey"))
        .filter(pair)
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("l_year"),
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(disc_price()).cast("decimal(38,4)").cast("double").alias("revenue"),
    )


SHARE_NATION = "NATION_3"


@query(
    "q48_market_share",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(CAST(SUM(CASE WHEN sn.n_name = '{SHARE_NATION}'
                         THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                              * CAST(1 - l.l_discount AS DECIMAL(8,2))
                         ELSE CAST(0 AS DECIMAL(18,4)) END)
                AS DECIMAL(38,4)) AS DOUBLE)
           / CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                           * CAST(1 - l.l_discount AS DECIMAL(8,2)))
                  AS DECIMAL(38,4)) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: one nation's share of total revenue per order "
        "year — a conditional aggregate divided by the unconditional one, "
        "both accumulated in exact DECIMAL within the same single pass "
        "(no second scan, no join between numerator and denominator). "
        "Share = one IEEE division of two bit-exact doubles.",
)
def q48_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # orders is fact-sized: unhinted equi-join (shuffles at 100 TB; AQE may
    # still broadcast locally). Supplier + nation are true dimensions.
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
    )
    cond_rev = F.when(F.col("n_name") == SHARE_NATION, disc_price()).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    num = F.sum(cond_rev).cast("decimal(38,4)").cast("double")
    den = F.sum(disc_price()).cast("decimal(38,4)").cast("double")
    return joined.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        (num / den).alias("mkt_share"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "q49_disjunctive_predicates",
    oracle="""
    SELECT COUNT(*) AS n_lines,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * CAST(1 - l.l_discount AS DECIMAL(8,2)))
                AS DECIMAL(38,4)) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 40)
    """,
    doc="TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides. "
        "Catalyst factors the common sub-predicates per side (constraint "
        "propagation pushes the per-table OR residuals below the join) so "
        "each scan prunes before shuffling — the disjunction is never "
        "evaluated row-at-a-time over the full cross product.",
)
def q49_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & (q >= 1)
        & (q <= 30)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & (q >= 10)
        & (q <= 40)
    )
    return j.filter(cond).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(disc_price()).cast("decimal(38,4)").cast("double").alias("revenue"),
    )


@query(
    "q51_join_key_skew_profile",
    oracle="""
    WITH per_key AS (
      SELECT l_suppkey AS key, COUNT(*) AS n_rows
      FROM lineitem GROUP BY key
    )
    SELECT COUNT(*) AS n_keys,
           MIN(n_rows) AS min_rows,
           MAX(n_rows) AS max_rows,
           CAST(SUM(n_rows) AS DOUBLE) / COUNT(*) AS avg_rows,
           CAST(MAX(n_rows) AS DOUBLE)
             / (CAST(SUM(n_rows) AS DOUBLE) / COUNT(*)) AS skew_factor,
           COUNT(*) FILTER (WHERE n_rows
             > 2 * (SELECT CAST(SUM(n_rows) AS DOUBLE) / COUNT(*) FROM per_key))
             AS n_hot_keys
    FROM per_key
    """,
    doc="Join-key skew profile: per-key cardinality distribution of the "
        "join column (min/max/avg rows per key, skew factor = max/avg, "
        "hot-key count above 2x average) — the diagnostic run before "
        "choosing between plain shuffle, AQE skew split, and the explicit "
        "salted join (q28). Integer counts and one fixed IEEE division "
        "sequence: deterministic at any parallelism; output is one row "
        "regardless of input size.",
)
def q51_join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_key = (
        li.groupBy(F.col("l_suppkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .localCheckpoint(eager=False)  # consumed twice: profile + hot-key gate
    )
    avg_rows = F.sum("n_rows").cast("double") / F.count(F.lit(1))
    profile = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.min("n_rows").alias("min_rows"),
        F.max("n_rows").alias("max_rows"),
        avg_rows.alias("avg_rows"),
        (F.max("n_rows").cast("double") / avg_rows).alias("skew_factor"),
    )
    hot = (
        per_key.crossJoin(
            F.broadcast(per_key.agg(avg_rows.alias("global_avg")))
        )
        .filter(F.col("n_rows") > 2 * F.col("global_avg"))
        .agg(F.count(F.lit(1)).alias("n_hot_keys"))
    )
    return profile.crossJoin(F.broadcast(hot))


@query(
    "q53_multiset_ops",
    oracle="""
    (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
     INTERSECT ALL
     SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    doc="Multiset (ALL) set algebra: INTERSECT ALL keeps the minimum "
        "multiplicity per key, EXCEPT ALL subtracts multiplicities — the "
        "bag semantics q18's distinct variants discard. Spark plans these "
        "as dedicated hash-based operators (no pre-distinct), one shuffle "
        "per operand on the compared columns.",
)
def q53_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("custkey")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    return big.intersectAll(urgent).exceptAll(low)


@query(
    "q54_left_join_null_extension",
    oracle="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_urgent,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o.o_orderkey) AS n_null_extended,
           COALESCE(MAX(o.o_totalprice), -1.0) AS max_urgent_price
    FROM customer c
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    GROUP BY c.c_custkey
    """,
    doc="Left-outer join null-extension semantics made explicit: customers "
        "keep one null-extended row when no urgent order matches, COUNT of "
        "the nullable column skips those rows while COUNT(*) keeps them, "
        "and the aggregate over the extended side needs a COALESCE "
        "sentinel. The join-side filter lives in the ON clause — pushing "
        "it to WHERE would silently turn the join inner (the classic "
        "outer-join bug this query pins).",
)
def q54_left_join_null_extension(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    joined = cust.join(
        orders,
        (orders.o_custkey == cust.c_custkey)
        & (orders.o_orderpriority == "1-URGENT"),
        "left",
    )
    return joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("n_urgent"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("o_orderkey")).alias("n_null_extended"),
        F.coalesce(F.max("o_totalprice"), F.lit(-1.0)).alias("max_urgent_price"),
    )


# Submitted verbatim to BOTH engines: the standard aggregate FILTER clause
# (conditional aggregation without CASE scaffolding), through the parser.
_Q55_SQL = """
SELECT l_returnflag,
       COUNT(*) AS n_lines,
       COUNT(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                 FILTER (WHERE l_discount > 0.05)
            AS DECIMAL(38,2)) AS DOUBLE) AS discounted_revenue
FROM lineitem
GROUP BY l_returnflag
"""


@query(
    "q55_filtered_aggregates",
    oracle=_Q55_SQL,
    doc="Aggregate FILTER clause (SQL:2003) through the spark.sql parser "
        "path: per-group conditional counts and a conditionally-filtered "
        "exact-decimal revenue sum in ONE pass — the declarative form of "
        "q35's CASE-based pivot arms. Same partial+final hash aggregation "
        "as any grouped query; the filters evaluate row-side before the "
        "partial aggregate, so nothing extra shuffles.",
)
def q55_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q55_SQL)


# Submitted verbatim to BOTH engines: relative-rank window functions.
# percent_rank = (rank-1)/(n-1) and cume_dist = n_peers_le/n are IEEE
# divisions of identical integers — deterministic with a total order.
_Q56_SQL = """
SELECT o_orderkey, o_custkey,
       PERCENT_RANK() OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
       ) AS price_percentile,
       CUME_DIST() OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
       ) AS price_cume_dist
FROM orders
"""


@query(
    "q56_relative_rank",
    oracle=_Q56_SQL,
    doc="Relative-rank window functions (PERCENT_RANK / CUME_DIST) per "
        "customer: each order positioned within its customer's price "
        "distribution — the row-preserving normalization a feature "
        "pipeline uses before cross-customer comparisons. Total order via "
        "the orderkey tie-break makes both engines emit identical ranks; "
        "the window partitions on the join key, so one bounded sort per "
        "customer.",
)
def q56_relative_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q56_SQL)


@query(
    "q57_gap_fill_carry_forward",
    oracle="""
    WITH actual AS (
      SELECT c.c_mktsegment AS segment,
             CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev_dec,
             COUNT(*) AS n_orders
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 300000
      GROUP BY segment, month
    ), bounds AS (
      SELECT MIN(month) AS lo, MAX(month) AS hi FROM actual
    ), months AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE)
               AS month
      FROM bounds
    ), spine AS (
      SELECT DISTINCT c_mktsegment AS segment FROM customer
    )
    SELECT s.segment, m.month,
           a.n_orders IS NOT NULL AS has_data,
           COALESCE(a.n_orders, 0) AS n_orders,
           CAST(CAST(last_value(a.rev_dec IGNORE NULLS) OVER (
             PARTITION BY s.segment ORDER BY m.month
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DECIMAL(38,2)) AS DOUBLE) AS carried_revenue
    FROM spine s CROSS JOIN months m
    LEFT JOIN actual a ON a.segment = s.segment AND a.month = m.month
    """,
    doc="Time-series gap filling: a complete (segment x month) spine built "
        "from sequence(), left-joined to sparse actuals, missing months "
        "filled by last_value(IGNORE NULLS) carry-forward — the dense-grid "
        "preparation step for forecasting/feature pipelines. The spine is "
        "dimensions x months (bounded, broadcast); the fact table only "
        "feeds the pre-aggregated actuals, so the cross join never touches "
        "raw rows. Carried values stay exact decimal until emission.",
)
def q57_gap_fill_carry_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    actual = (
        orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 300000)
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        )
        .agg(
            F.sum(dec("o_totalprice")).alias("rev_dec"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .localCheckpoint(eager=False)  # consumed twice: bounds + the join
    )
    months = actual.agg(
        F.min("month").alias("lo"), F.max("month").alias("hi")
    ).select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 month"))
        ).alias("month")
    )
    spine = customer.select(F.col("c_mktsegment").alias("segment")).distinct()
    grid = spine.crossJoin(F.broadcast(months))
    joined = grid.join(actual, ["segment", "month"], "left")
    w = (
        Window.partitionBy("segment")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "segment",
        "month",
        F.col("n_orders").isNotNull().alias("has_data"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.last("rev_dec", ignorenulls=True)
        .over(w)
        .cast("decimal(38,2)")
        .cast("double")
        .alias("carried_revenue"),
    )


# --------------------------------------------------------------------------
# q58 — recursive CTE hierarchy walk (Spark 4 WITH RECURSIVE)
# --------------------------------------------------------------------------
@query(
    "q58_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE walk AS (
      SELECT s_suppkey AS suppkey, s_suppkey AS node, 0 AS depth,
             CAST(round(s_acctbal * 100) AS BIGINT) AS path_cents
      FROM supplier
      UNION ALL
      SELECT w.suppkey, w.node // 2 AS node, w.depth + 1 AS depth,
             w.path_cents + CAST(round(s.s_acctbal * 100) AS BIGINT)
               AS path_cents
      FROM walk w JOIN supplier s ON s.s_suppkey = w.node // 2
      WHERE w.node > 1
    )
    SELECT suppkey, depth AS chain_depth, path_cents,
           CAST(path_cents AS DOUBLE) / 100 AS path_balance
    FROM walk WHERE node <= 1
    """,
    doc="Recursive CTE (Spark 4 WITH RECURSIVE): walk each supplier's "
        "ancestor chain in the implied binary hierarchy (parent = suppkey "
        "div 2 — the management-chain shape) accumulating exact-cents "
        "balance along the path. Recursion depth is log2(n) and each "
        "iteration is one equi-join of the shrinking frontier against the "
        "supplier dim — the construct scales as an iterative broadcast "
        "join, not a blowup. Balances accumulate as BIGINT cents per row "
        "chain (no cross-row float order anywhere).",
)
def q58_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE walk AS (
          SELECT s_suppkey AS suppkey, s_suppkey AS node, 0 AS depth,
                 CAST(round(s_acctbal * 100) AS BIGINT) AS path_cents
          FROM supplier
          UNION ALL
          SELECT w.suppkey, w.node DIV 2 AS node, w.depth + 1 AS depth,
                 w.path_cents + CAST(round(s.s_acctbal * 100) AS BIGINT)
                   AS path_cents
          FROM walk w JOIN supplier s ON s.s_suppkey = w.node DIV 2
          WHERE w.node > 1
        )
        SELECT suppkey, depth AS chain_depth, path_cents,
               CAST(path_cents AS DOUBLE) / 100 AS path_balance
        FROM walk WHERE node <= 1
        """
    )


@query(
    "q59_nation_supplier_roster",
    oracle="""
    SELECT n.n_name AS nation,
           string_agg(s.s_name, ',' ORDER BY s.s_acctbal DESC, s.s_name)
             AS roster,
           COUNT(*) AS n_suppliers
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY nation
    """,
    doc="Ordered string aggregation (Spark 4 listagg WITHIN GROUP == "
        "DuckDB string_agg ORDER BY): per nation, the supplier roster as "
        "one CSV string ordered by balance then name — deterministic "
        "because the order clause is total. Same bounded-group caveat as "
        "q43: concatenated groups must be dimension-sized; the aggregation "
        "itself is one partial+final hash agg after a broadcast dim join.",
)
def q59_nation_supplier_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT /*+ BROADCAST(n) */ n.n_name AS nation,
               listagg(s.s_name, ',')
                 WITHIN GROUP (ORDER BY s.s_acctbal DESC, s.s_name) AS roster,
               COUNT(*) AS n_suppliers
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


_PROFILE_COLS = ["l_returnflag", "l_linestatus", "l_quantity", "l_shipdate"]


@query(
    "q60_column_profile",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{c}' AS column_name,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT({c}) AS n_nulls,
           COUNT(DISTINCT {c}) AS n_distinct,
           1.0 - CAST(COUNT({c}) AS DOUBLE) / COUNT(*) AS null_fraction
    FROM lineitem
    """
        for c in _PROFILE_COLS
    ),
    doc="Table profiling (the ANALYZE / data-quality-dashboard shape): "
        "null and exact-distinct counts for a column set in ONE aggregation "
        "pass — Catalyst plans the multi-column DISTINCT as a single "
        "Expand (xN columns) + partial/final agg, one shuffle total, "
        "instead of N table scans. Output cardinality = column count. "
        "Swap exact distinct for the HLL sketch (operators/sketches.py) "
        "when profiling runs on every ingest batch at 100 TB.",
)
def q60_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
        ]
    wide = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct" for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack}) AS "
        "(column_name, n_rows, n_nulls, n_distinct)"
    ).select(
        "column_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        (
            F.lit(1.0)
            - (F.col("n_rows") - F.col("n_nulls")).cast("double") / F.col("n_rows")
        ).alias("null_fraction"),
    )


@query(
    "q61_defensive_ingest",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(CASE CAST(o_orderkey % 3 AS INTEGER)
                    WHEN 0 THEN CAST(o_orderkey AS VARCHAR)
                    WHEN 1 THEN 'N/A'
                    ELSE '#' || CAST(o_orderkey AS VARCHAR) END
                    AS BIGINT) AS parsed_id,
           TRY_CAST('2024-' || lpad(CAST(o_orderkey % 15 + 1 AS VARCHAR), 2, '0')
                    || '-01' AS DATE) AS parsed_month,
           o_totalprice / NULLIF(CAST(o_orderkey % 5 AS INTEGER), 0)
             AS per_slot_price
    FROM orders
    """,
    doc="Error-safe ingest surface: try_cast parses dirty numerics/dates to "
        "NULL instead of failing the job (month 13-15 strings, '#'-prefixed "
        "and 'N/A' ids), and NULLIF guards division by zero — the defensive "
        "idiom for semi-trusted feeds, where one bad record must not kill "
        "a 100-TB batch (complements the CDC dead-letter path, which "
        "quarantines whole records). Pure narrow map, no shuffle.",
)
def q61_defensive_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    dirty_id = (
        "CASE CAST(o_orderkey % 3 AS INT) "
        "WHEN 0 THEN CAST(o_orderkey AS STRING) "
        "WHEN 1 THEN 'N/A' "
        "ELSE concat('#', CAST(o_orderkey AS STRING)) END"
    )
    return orders.select(
        "o_orderkey",
        F.expr(f"try_cast({dirty_id} AS BIGINT)").alias("parsed_id"),
        F.expr(
            "try_cast(concat('2024-', lpad(CAST(o_orderkey % 15 + 1 AS STRING),"
            " 2, '0'), '-01') AS DATE)"
        ).alias("parsed_month"),
        F.expr("o_totalprice / nullif(CAST(o_orderkey % 5 AS INT), 0)").alias(
            "per_slot_price"
        ),
    )


# Recursive CTE (new SQL surface in Spark 4): iterate-within-the-planner,
# the construct hierarchies/graph-reachability queries need without a
# driver-side loop. The synthetic hierarchy is the binary-heap parent
# relation parent(k) = k div 2 over supplier keys (deterministic, derived
# from existing data — no new fixture), so every chain terminates at key 1
# in O(log n) steps. The dedup CC operators keep their driver-side loop
# deliberately (localCheckpoint per round bounds plan growth at web
# scale); this exercises the PLANNER's recursion path on a bounded-depth
# hierarchy, where it is the right tool.
def _q62_sql(div_expr: str) -> str:
    return f"""
    WITH RECURSIVE up(node, anc, depth) AS (
      SELECT s_suppkey, s_suppkey, 0 FROM supplier
      UNION ALL
      SELECT node, {div_expr}, depth + 1 FROM up WHERE anc > 1
    )
    SELECT node AS s_suppkey,
           CAST(MAX(depth) AS INTEGER) AS depth,
           CAST(SUM(anc) AS BIGINT) AS chain_sum
    FROM up GROUP BY node
    """


@query(
    "q62_recursive_chain",
    oracle=_q62_sql("anc // 2"),
    doc="Recursive CTE ancestor walk: each supplier climbs the synthetic "
        "binary-heap hierarchy parent(k) = k div 2 to the root, emitting "
        "chain depth and the exact integer sum of ancestor keys. Verbatim "
        "WITH RECURSIVE submitted to both planners (Spark 4 UnionLoop vs "
        "DuckDB recursive CTE), differing only in the integer-division "
        "spelling; all accumulations are BIGINT. Depth is log2(|supplier|) "
        "so the iteration count is bounded by the key domain, not rows.",
)
def q62_recursive_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_q62_sql("anc DIV 2"))


# SQL UDFs (new surface in Spark 4): CREATE FUNCTION ... RETURN <expr> is
# macro-expanded by the analyzer into the calling plan — reusable business
# logic with ZERO runtime UDF tax (stays inside whole-stage codegen,
# pushdown still works through it). The opposite end of the UDF spectrum
# from Python UDFs; the oracle simply inlines the same expression.


@query(
    "q63_sql_udf_pricing",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_lines,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(1.0 - l_discount AS DECIMAL(8,2)))
                     AS DECIMAL(38,4)) AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Spark 4 scalar SQL UDF: revenue = disc_price(price, discount) "
        "declared once with CREATE FUNCTION ... RETURN and reused — the "
        "analyzer inlines it as a macro, so the plan is byte-identical to "
        "writing the expression inline (whole-stage codegen, DECIMAL "
        "accumulation discipline intact). The reusable-business-logic "
        "surface with none of the Python-UDF serialization tax.",
)
def q63_sql_udf_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price_udf("
        "p DOUBLE, d DOUBLE) RETURNS DECIMAL(27,4) "
        "RETURN CAST(p AS DECIMAL(18,2)) * CAST(1.0 - d AS DECIMAL(8,2))"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_lines,
               CAST(CAST(SUM(disc_price_udf(l_extendedprice, l_discount))
                         AS DECIMAL(38,4)) AS DOUBLE) AS revenue
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


@query(
    "q64_sql_table_function",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT tok) AS n_distinct
    FROM (
      SELECT d.lang, t.tok
      FROM documents d, LATERAL unnest(string_split(trim(d.text), ' ')) AS t(tok)
    )
    GROUP BY lang
    """,
    doc="Spark 4 SQL table function: tokenize(s) RETURNS TABLE(tok) "
        "declared in SQL and applied per row via LATERAL — the "
        "set-returning twin of the scalar SQL UDF (and the zero-overhead "
        "alternative to the Python UDTF surface in functions/udtfs.py: "
        "the analyzer rewrites it to a generate/explode, no Python "
        "worker). Per-language token totals keep the check exact.",
)
def q64_sql_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION tokenize_udtf(s STRING) "
        "RETURNS TABLE(tok STRING) "
        "RETURN SELECT explode(split(trim(s), ' '))"
    )
    return spark.sql(
        """
        SELECT d.lang,
               COUNT(*) AS n_tokens,
               COUNT(DISTINCT t.tok) AS n_distinct
        FROM documents d, LATERAL tokenize_udtf(d.text) t
        GROUP BY d.lang
        """
    )


@query(
    "q65_try_arithmetic",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) AS n_lines,
           CAST(SUM(CASE WHEN l_discount = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_discount,
           CAST(SUM(CASE WHEN l_discount = 0.0 THEN 0
                         ELSE CAST(round(l_extendedprice / l_discount, 2)
                                   AS DECIMAL(18,2)) END)
                AS DOUBLE) AS sum_price_per_disc,
           CAST(SUM(CASE WHEN TRY_CAST(
                  CASE WHEN l_linenumber % 2 = 0
                       THEN CAST(l_orderkey AS VARCHAR)
                       ELSE l_returnflag END AS INTEGER) IS NULL
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_castable
    FROM lineitem
    GROUP BY l_linestatus
    """,
    doc="ANSI-safe arithmetic surface (Spark 4 runs ANSI mode by default, "
        "where silent-null arithmetic became errors): try_divide yields "
        "NULL on zero divisors instead of failing the job, try_cast "
        "probes castability — the idioms a pipeline needs on dirty data. "
        "The oracle spells the same semantics with CASE/TRY_CAST; "
        "divisions are rounded to a DECIMAL grid before the sum so the "
        "aggregate stays order-independent.",
)
def q65_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ratio = F.expr(
        "cast(round(try_divide(l_extendedprice, l_discount), 2)"
        " as decimal(18,2))"
    )
    return li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(F.col("l_discount") == 0.0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero_discount"),
        F.sum(F.coalesce(ratio, F.lit(0).cast("decimal(18,2)")))
        .cast("double")
        .alias("sum_price_per_disc"),
        F.sum(
            F.when(
                F.expr(
                    "try_cast(CASE WHEN l_linenumber % 2 = 0"
                    " THEN cast(l_orderkey as string)"
                    " ELSE l_returnflag END as int)"
                ).isNull(),
                0,
            ).otherwise(1)
        )
        .cast("long")
        .alias("n_castable"),
    )


@query(
    "q66_collated_grouping",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN c_custkey % 2 = 0
                  THEN lower(c_mktsegment) ELSE c_mktsegment END AS seg,
             c_acctbal
      FROM customer
    )
    SELECT lower(seg) AS segment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM mixed
    GROUP BY lower(seg)
    """,
    doc="Collation-aware grouping (Spark 4 COLLATE): a mixed-case segment "
        "column (synthesized: every even custkey lowercased) groups under "
        "UTF8_LCASE collation — case variants collapse into one group "
        "WITHOUT rewriting the data, the way a lower() pre-pass would. "
        "The emitted key is normalized explicitly (lower) so the output "
        "value is deterministic; the oracle is the lower() twin. "
        "Collation rides the grouping expression — one hash agg, "
        "identical plan shape to any groupBy.",
)
def q66_collated_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH mixed AS (
          SELECT CASE WHEN c_custkey % 2 = 0
                      THEN lower(c_mktsegment) ELSE c_mktsegment END AS seg,
                 c_acctbal
          FROM customer
        )
        SELECT lower(seg) AS segment,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_bal
        FROM mixed
        GROUP BY seg COLLATE UTF8_LCASE, lower(seg)
        """
    )


@query(
    "q67_variant_props",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS k_sum,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS INTEGER) AS k_min,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS INTEGER) AS k_max,
           CAST(COUNT(CASE WHEN json_extract_string(props, '$.missing')
                           IS NOT NULL THEN 1 END) AS BIGINT) AS n_missing
    FROM events GROUP BY event_type
    """,
    doc="Spark 4 VARIANT type over semi-structured event props: "
        "try_parse_json -> variant_get typed extraction (binary-encoded "
        "variant, not string re-parsing — the open-table-format answer to "
        "schemaless columns; Parquet shredding gives it columnar pushdown "
        "at rest). Absent paths yield NULL (counted), malformed JSON "
        "yields a NULL variant instead of failing the scan. Aggregation "
        "itself is one map-side-combined hash agg.",
)
def q67_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH v AS (
          SELECT event_type, try_parse_json(props) AS pv FROM events
        )
        SELECT event_type,
               COUNT(*) AS n_events,
               SUM(CAST(variant_get(pv, '$.k', 'int') AS BIGINT)) AS k_sum,
               MIN(variant_get(pv, '$.k', 'int')) AS k_min,
               MAX(variant_get(pv, '$.k', 'int')) AS k_max,
               COUNT(variant_get(pv, '$.missing', 'string')) AS n_missing
        FROM v GROUP BY event_type
        """
    )


@query(
    "q68_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="Spark 4 SQL pipe syntax (|> operators, SQL:2023-adjacent): the "
        "q01 aggregation restated as a linear FROM |> WHERE |> AGGREGATE "
        "|> ORDER BY pipeline. Catalyst compiles it to the identical "
        "logical plan as the nested form — same pushdown, same partial "
        "aggregation — so this registers the SURFACE, the oracle proves "
        "the semantics.",
)
def q68_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> AGGREGATE COUNT(*) AS n_lines,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_qty
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n_lines, sum_qty
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


@query(
    "q69_group_by_all",
    oracle="""
    SELECT o_orderpriority,
           CAST(o_orderdate AS DATE)
             - CAST((CAST(o_orderdate AS DATE) - DATE '1992-01-01') % 7 AS INT)
             AS order_week_anchor,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY ALL
    ORDER BY ALL
    """,
    doc="GROUP BY ALL / ORDER BY ALL (Spark 3.4+/4 SQL sugar, same as "
        "DuckDB's): every non-aggregate select item becomes a grouping "
        "key, every output column an ordering key — resolved at analysis "
        "time into the identical hash-agg + sort plan as the explicit "
        "form, so the sugar costs nothing. The synthesized week anchor "
        "(date minus day-number mod 7 — pure integer date arithmetic) "
        "exercises expression-valued keys under ALL resolution.",
)
def q69_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               date_sub(CAST(o_orderdate AS DATE),
                 CAST(datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') % 7
                      AS INT))
                 AS order_week_anchor,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM orders
        WHERE o_orderstatus = 'O'
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@query(
    "q70_session_variables",
    oracle="""
    WITH thr AS (
      SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM orders
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_above,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_above
    FROM orders, thr
    WHERE o_totalprice > thr.v
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Session variables + EXECUTE IMMEDIATE (Spark 4): DECLARE a typed "
        "session variable, SET VAR from a scalar subquery (exact decimal "
        "mean emitted once as a double), then run a dynamically-built SQL "
        "string that references the variable. The variable is resolved at "
        "analysis time to a literal, so the executed plan is the plain "
        "filtered hash-agg — parameterization costs nothing and the "
        "threshold never round-trips through Python. Oracle inlines the "
        "same scalar subquery.",
)
def q70_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    spark.sql(
        "DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 0.0"
    )
    spark.sql(
        """
        SET VAR price_floor = (
          SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          FROM orders
        )
        """
    )
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority,
                  COUNT(*) AS n_above,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                    AS total_above
           FROM orders
           WHERE o_totalprice > price_floor
           GROUP BY o_orderpriority
           ORDER BY o_orderpriority'
        """
    )


@query(
    "q71_scd2_intervals",
    oracle="""
    WITH hist AS (
      SELECT o_custkey,
             CAST(o_orderdate AS DATE) AS valid_from,
             CAST(o_totalprice AS DECIMAL(18,2)) AS state_price,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS DATE), o_orderkey
             ) AS version_no,
             LEAD(CAST(o_orderdate AS DATE)) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS DATE), o_orderkey
             ) AS valid_to
      FROM orders
    )
    SELECT o_custkey, version_no, valid_from, valid_to,
           CAST(state_price AS DOUBLE) AS state_price,
           valid_to IS NULL AS is_current
    FROM hist
    WHERE o_custkey % 10 = 0
    ORDER BY o_custkey, version_no
    """,
    doc="SCD Type-2 dimension build from a changelog: each change event "
        "becomes a validity interval [valid_from, valid_to) via lead() "
        "inside the key's partition (deterministic orderkey tiebreak), "
        "with version numbers and an is_current flag — the warehouse "
        "dimension-history pattern that point-in-time joins consume. One "
        "window pass per key partition, no self-join (the naive "
        "interval build is an O(n^2) self-join per key). Output filtered "
        "to a deterministic 10% key slice to keep the checked frame "
        "proportionate.",
)
def q71_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").cast("date"), "o_orderkey"
    )
    hist = orders.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("valid_from"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("state_price"),
        F.row_number().over(w).alias("version_no"),
        F.lead(F.col("o_orderdate").cast("date")).over(w).alias("valid_to"),
    )
    return (
        hist.filter(F.col("o_custkey") % 10 == 0)
        .select(
            "o_custkey",
            "version_no",
            "valid_from",
            "valid_to",
            F.col("state_price").cast("double").alias("state_price"),
            F.col("valid_to").isNull().alias("is_current"),
        )
        .orderBy("o_custkey", "version_no")
    )


@query(
    "q72_pivot_multi_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
             AS F_qty,
           CAST(COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT)
             AS F_cnt,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
             AS O_qty,
           CAST(COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT)
             AS O_cnt
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Pivot with MULTIPLE aggregates per pivot value (.pivot().agg(sum, "
        "count)): Spark expands to one conditional-aggregation column per "
        "(value x aggregate) pair inside a single hash agg — same plan as "
        "the hand-written CASE form the oracle states, no per-value scans. "
        "Explicit pivot values keep the schema static (no driver-side "
        "distinct pre-query). Decimal accumulation, doubles emitted once.",
)
def q72_pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return out.select(
        "l_returnflag",
        F.col("F_qty").cast("double").alias("F_qty"),
        F.coalesce(F.col("F_cnt"), F.lit(0)).cast("long").alias("F_cnt"),
        F.col("O_qty").cast("double").alias("O_qty"),
        F.coalesce(F.col("O_cnt"), F.lit(0)).cast("long").alias("O_cnt"),
    ).orderBy("l_returnflag")


@query(
    "q73_basket_lift",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS item
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), nb AS (
      SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_baskets FROM baskets
    ), item_n AS (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS n FROM baskets GROUP BY item
    ), pair AS (
      SELECT a.item AS item_a, b.item AS item_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM baskets a JOIN baskets b
        ON a.okey = b.okey AND a.item < b.item
      GROUP BY item_a, item_b
    )
    SELECT p.item_a, p.item_b, p.n_both, ia.n AS n_a, ib.n AS n_b,
           p.n_both / CAST(ia.n AS DOUBLE) AS confidence_a_to_b,
           (p.n_both * nb.n_baskets)
             / (CAST(ia.n AS DOUBLE) * ib.n) AS lift
    FROM pair p
    JOIN item_n ia ON ia.item = p.item_a
    JOIN item_n ib ON ib.item = p.item_b
    CROSS JOIN nb
    WHERE p.n_both >= 20
    ORDER BY p.item_a, p.item_b
    """,
    doc="Market-basket association rules over (order, part-brand) baskets: "
        "support, confidence and lift per brand pair with a minimum "
        "support cut. Pair generation is a within-basket self-join — "
        "fan-out bounded by basket size squared, shuffled on the basket "
        "key, never all-pairs across baskets; the item and basket totals "
        "are dimension-sized broadcasts. Lift's single double expression "
        "is evaluated in the same operand order in both engines.",
)
def q73_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("item"))
        .distinct()
        .localCheckpoint(eager=False)  # pair legs + item totals + basket count
    )
    nb = baskets.select("okey").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_baskets")
    )
    item_n = baskets.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .filter(F.col("n_both") >= 20)
    )
    ia = item_n.select(F.col("item").alias("item_a"), F.col("n").alias("n_a"))
    ib = item_n.select(F.col("item").alias("item_b"), F.col("n").alias("n_b"))
    return (
        pair.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a",
            "item_b",
            "n_both",
            "n_a",
            "n_b",
            (F.col("n_both") / F.col("n_a").cast("double")).alias(
                "confidence_a_to_b"
            ),
            (
                (F.col("n_both") * F.col("n_baskets"))
                / (F.col("n_a").cast("double") * F.col("n_b"))
            ).alias("lift"),
        )
        .orderBy("item_a", "item_b")
    )


@query(
    "q74_higher_order_functions",
    oracle="""
    WITH sup_parts AS (
      SELECT l.l_suppkey AS suppkey,
             list_sort(list(DISTINCT CAST(l.l_quantity AS BIGINT)))
               AS quantities
      FROM lineitem l
      GROUP BY l.l_suppkey
    )
    SELECT suppkey,
           CAST(len(quantities) AS INTEGER) AS n_distinct_qty,
           CAST(list_reduce(quantities, (x, y) -> x + y) AS BIGINT)
             AS qty_sum,
           CAST(len(list_filter(quantities, q -> q % 2 = 0)) AS INTEGER)
             AS n_even,
           CAST(list_reduce(list_transform(quantities, q -> q * q),
                            (x, y) -> x + y) AS BIGINT) AS qty_sq_sum,
           len(list_filter(quantities, q -> q > 45)) > 0 AS any_large,
           len(list_filter(quantities, q -> q >= 10)) = len(quantities)
             AS all_ge_10
    FROM sup_parts
    WHERE suppkey % 7 = 0
    ORDER BY suppkey
    """,
    doc="Higher-order array functions end-to-end: sorted distinct "
        "quantity arrays per supplier folded with aggregate (reduce), "
        "transform, filter, exists and forall — all evaluated inside "
        "whole-stage codegen on the array column, zero UDFs, zero "
        "explodes after the one collect. Integer-only payloads keep the "
        "fold cross-engine exact; exists/forall are stated as "
        "filter-length identities in the oracle (DuckDB's list_* twins).",
)
def q74_higher_order_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = (
        li.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.array_sort(
                F.collect_set(F.col("l_quantity").cast("long"))
            ).alias("quantities")
        )
        .filter(F.col("suppkey") % 7 == 0)
    )
    q = "quantities"
    return sup.select(
        "suppkey",
        F.expr(f"size({q})").cast("int").alias("n_distinct_qty"),
        F.expr(f"aggregate({q}, cast(0 as bigint), (x, y) -> x + y)")
        .cast("long")
        .alias("qty_sum"),
        F.expr(f"size(filter({q}, q -> q % 2 = 0))").cast("int").alias("n_even"),
        F.expr(
            f"aggregate(transform({q}, q -> q * q), cast(0 as bigint),"
            " (x, y) -> x + y)"
        )
        .cast("long")
        .alias("qty_sq_sum"),
        F.expr(f"exists({q}, q -> q > 45)").alias("any_large"),
        F.expr(f"forall({q}, q -> q >= 10)").alias("all_ge_10"),
    ).orderBy("suppkey")


@query(
    "q75_map_functions",
    oracle="""
    WITH per AS (
      SELECT l_suppkey AS suppkey,
             CAST(month(CAST(l_shipdate AS DATE)) AS INTEGER) AS m,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem
      GROUP BY suppkey, m
    )
    SELECT suppkey,
           CAST(COUNT(*) AS INTEGER) AS n_months,
           CAST(MAX(CASE WHEN m = 1 THEN q END) AS BIGINT) AS jan_qty,
           CAST(SUM(CASE WHEN q >= 500 THEN q ELSE 0 END) AS BIGINT)
             AS heavy_month_qty,
           CAST(MAX(q) AS BIGINT) AS peak_month_qty
    FROM per
    WHERE suppkey % 11 = 0
    GROUP BY suppkey
    ORDER BY suppkey
    """,
    doc="Map-typed column surface end-to-end: per-supplier month→quantity "
        "maps built with map_from_entries over sorted entry structs, then "
        "interrogated with map_filter + map_values + aggregate, "
        "element_at, and cardinality — all JVM map expressions, no "
        "explode after the one collect. The oracle states the same "
        "semantics relationally (conditional aggregation), proving the "
        "map pipeline computes what the flat form computes. Scalar "
        "outputs only: map columns themselves stay engine-internal.",
)
def q75_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per = (
        li.groupBy(
            F.col("l_suppkey").alias("suppkey"),
            F.month(F.col("l_shipdate").cast("date")).cast("int").alias("m"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
        .filter(F.col("suppkey") % 11 == 0)
    )
    sup = per.groupBy("suppkey").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("m", "q")))
        ).alias("by_month")
    )
    return sup.select(
        "suppkey",
        F.expr("cardinality(by_month)").cast("int").alias("n_months"),
        F.expr("element_at(by_month, 1)").cast("long").alias("jan_qty"),
        F.expr(
            "aggregate(map_values(map_filter(by_month, (k, v) -> v >= 500)),"
            " cast(0 as bigint), (acc, x) -> acc + x)"
        )
        .cast("long")
        .alias("heavy_month_qty"),
        F.expr(
            "aggregate(map_values(by_month), cast(0 as bigint),"
            " (acc, x) -> greatest(acc, x))"
        )
        .cast("long")
        .alias("peak_month_qty"),
    ).orderBy("suppkey")


# ------------------------------------------------ schema-drift union -------
#
# The ingestion-side reality the reference's FAILFAST conformer rejects:
# two record batches whose producers disagree on column sets. Spark's
# unionByName(allowMissingColumns=True) aligns by NAME and null-fills the
# gaps — the schema-drift-tolerant append every long-lived pipeline
# eventually needs (DuckDB's twin is UNION ALL BY NAME). Here: an "old
# feed" batch without the channel column and a "new feed" batch without
# the legacy flag, merged and profiled.


@query(
    "q77_union_by_name",
    oracle="""
    SELECT feed, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN channel IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_channel,
           CAST(SUM(CASE WHEN legacy_flag IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_legacy
    FROM (
      SELECT 'old' AS feed, event_type, legacy_flag, channel FROM (
        SELECT event_type, event_id % 2 = 0 AS legacy_flag,
               CAST(NULL AS VARCHAR) AS channel
        FROM events WHERE event_id % 3 = 0
      )
      UNION ALL BY NAME
      SELECT 'new' AS feed, event_type,
             CAST(NULL AS BOOLEAN) AS legacy_flag,
             CASE WHEN value >= 50 THEN 'web' ELSE 'app' END AS channel
      FROM events WHERE event_id % 3 = 1
    )
    GROUP BY feed, event_type
    ORDER BY feed, event_type
    """,
    doc="Schema-drift-tolerant union: an old feed (legacy_flag, no "
        "channel) and a new feed (channel, no legacy_flag) merged with "
        "unionByName(allowMissingColumns=True) — name-aligned, null-"
        "filled, then profiled per feed. The append shape a connector "
        "needs once producers evolve independently; DuckDB twin is "
        "UNION ALL BY NAME. Narrow maps + one hash agg.",
)
def q77_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    old_feed = ev.filter(F.col("event_id") % 3 == 0).select(
        F.lit("old").alias("feed"),
        "event_type",
        (F.col("event_id") % 2 == 0).alias("legacy_flag"),
    )
    new_feed = ev.filter(F.col("event_id") % 3 == 1).select(
        F.lit("new").alias("feed"),
        "event_type",
        F.when(F.col("value") >= 50, "web").otherwise("app").alias("channel"),
    )
    merged = old_feed.unionByName(new_feed, allowMissingColumns=True)
    return (
        merged.groupBy("feed", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("channel").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_null_channel"),
            F.sum(F.when(F.col("legacy_flag").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_null_legacy"),
        )
        .orderBy("feed", "event_type")
    )
