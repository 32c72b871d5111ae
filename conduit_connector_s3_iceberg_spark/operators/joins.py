"""Advanced join operators: as-of, range-band, and salted (skew-safe) joins.

Operators Spark has no single primitive for, each built as a composition of
DataFrame ops chosen for 100 TB behavior (SURVEY.md §2D; the reference has
no joins at all — this is north-star surface):

* **as-of join** — NOT a join + filter + top-1 (that explodes: every probe
  row joins every earlier build row before pruning). Instead the classic
  sort-merge form: tag both streams, union, one window over (key, time) with
  ``last(ignorenulls)`` carrying the build side forward. ONE shuffle on the
  key, zero row amplification, works at any scale.
* **range-band join** — value-interval lookup against a small bands table:
  broadcast nested-loop with a range predicate. The build side is tiny by
  construction (bands/dimensions), so the "nested loop" is a per-row scan of
  a broadcast array — the right plan at any fact-side scale.
* **salted join** — hot-key mitigation: explode the small side S ways,
  scatter the big side's hot keys across the salts, join on (key, salt).
  AQE's skew-join split handles moderate skew automatically; explicit
  salting is the deterministic form for pathological keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    time_col: str,
    build_cols: list[str],
    strict: bool = True,
) -> DataFrame:
    """For each probe row, attach the build row with the greatest
    ``time_col`` before (``strict``) or at-or-before it, per ``key``.

    Union-tag + window: shuffles ONCE on ``key``; within each key partition
    rows sort by time and build values are carried forward with
    ``last(ignorenulls=True)``. No join, no candidate explosion.
    """
    b = build.select(
        key,
        time_col,
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__b_{c}") for c in build_cols],
    )
    p = probe.withColumn("__side", F.lit(1))
    for c in build_cols:
        p = p.withColumn(f"__b_{c}", F.lit(None).cast(dict(b.dtypes)[f"__b_{c}"]))
    merged = b.unionByName(p, allowMissingColumns=True)
    # at equal ts: strict → probe first (build not visible); else build first
    order = [F.col(time_col), F.col("__side").desc() if strict else F.col("__side")]
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"__b_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
        for c in build_cols
    ]
    return (
        merged.select("*", *carried)
        .filter(F.col("__side") == 1)
        .drop("__side", *[f"__b_{c}" for c in build_cols])
    )


@query(
    "q26_asof_join",
    oracle="""
    SELECT v.event_id, v.user_id, v.ts,
           c.ts AS asof_ts, c.value AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id AND c.ts < v.ts
    """,
    doc="As-of (attribution) join: each view matched to the same user's "
        "latest strictly-earlier click. Implemented as union + single keyed "
        "window (one shuffle, no candidate explosion) — the scalable form "
        "of DuckDB's ASOF JOIN.",
)
def q26_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        views, clicks, key="user_id", time_col="ts", build_cols=["ts", "value"]
    )
    # inner-asof semantics (DuckDB ASOF JOIN drops unmatched probes)
    return joined.filter(F.col("asof_ts").isNotNull()).select(
        "event_id", "user_id", "ts", "asof_ts", "asof_value"
    )


#: Static value bands for the range join — a stand-in for any small interval
#: dimension (price tiers, latency buckets, quality bands).
VALUE_BANDS = [
    ("tier_0_50", 0.0, 50.0),
    ("tier_50_100", 50.0, 100.0),
    ("tier_100_200", 100.0, 200.0),
    ("tier_200_500", 200.0, 500.0),
]


@query(
    "q27_range_band_join",
    oracle=f"""
    SELECT band, COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events e
    JOIN (VALUES {", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in VALUE_BANDS)})
         AS bands(band, lo, hi)
      ON e.value >= bands.lo AND e.value < bands.hi
    GROUP BY band
    """,
    doc="Range (interval) join: events matched into value bands via a "
        "broadcast non-equi join — build side is a literal dimension, so "
        "the physical plan is a broadcast nested-loop over an in-memory "
        "array, constant-cost per fact row at any scale.",
)
def q27_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bands = F.broadcast(
        ev.sparkSession.createDataFrame(VALUE_BANDS, "band string, lo double, hi double")
    )
    return (
        ev.join(bands, (ev.value >= bands.lo) & (ev.value < bands.hi))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    scatter_col: str | None = None,
) -> DataFrame:
    """Equi-join with the small side replicated ``n_salts`` ways and the big
    side deterministically scattered across salts — every hot key spreads
    over ``n_salts`` tasks instead of one straggler.

    ``scatter_col``: a column of the big side used to derive the salt
    (hash-based, deterministic — keeps the whole plan re-computable, which
    random salts would break under task retry)."""
    scatter = scatter_col or key
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    small_salted = small.select("*", salts)
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(scatter), F.lit(n_salts)).cast("int")
    )
    return big_salted.join(small_salted, [key, "__salt"]).drop("__salt")


@query(
    "q28_salted_join",
    oracle="""
    SELECT s.s_name,
           COUNT(*) AS n_lines,
           CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    """,
    doc="Skew-safe salted join: supplier replicated 8x, lineitem scattered "
        "by hash(l_orderkey) — result identical to the plain equi-join "
        "(the oracle), but no single-task straggler on a hot key. The "
        "explicit form of AQE's skew-join split.",
)
def q28_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_quantity", "l_orderkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    joined = salted_join(li, supp, key="s_suppkey", scatter_col="l_orderkey")
    return joined.groupBy("s_name").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("sum_qty"),
    )
