"""Sketch aggregations: re-aggregable approximate distinct counts (Apache
DataSketches HLL, built into Spark 3.5+) and count-min frequency sketches.

The 100-TB motivation: exact per-group distinct counts don't roll up — you
cannot sum them across groups or days. HLL sketches DO (union is lossless
for the sketch), so the scale pattern is: aggregate once into per-group
sketch bytes, persist them, and answer any coarser rollup later by
``hll_union_agg`` over the stored sketches — no rescan of the fact data.
Estimates are deterministic for a given input set (the sketch is a pure
function of the hashed values), but engine-specific — so these register as
rows-only checks, with accuracy and re-aggregability asserted in unit
tests (tests/test_operators.py) instead of the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

HLL_LGK = 14  # log2 of sketch buckets: ~0.8% relative error, 32 KB max


def distinct_sketches(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per-group HLL sketch + estimate for ``value_col``. The ``sketch``
    bytes column is the persistable artifact; keep it to make every future
    coarser rollup a sketch-union instead of a fact rescan."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(HLL_LGK)).alias("sketch")
    ).select(
        *group_cols,
        "sketch",
        F.hll_sketch_estimate("sketch").alias("approx_distinct"),
    )


def union_rollup(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Roll stored sketches up to a coarser grouping (possibly empty =
    global) by sketch union — the operation exact distinct counts cannot
    do. Input is ``distinct_sketches`` output (or a table of it)."""
    grouped = (
        sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    )
    return grouped.agg(F.hll_union_agg("sketch").alias("sketch")).select(
        *group_cols,
        "sketch",
        F.hll_sketch_estimate("sketch").alias("approx_distinct"),
    )


def freq_sketch(
    df: DataFrame,
    value_col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> bytes:
    """Count-min sketch of a column as portable bytes (additive merges are
    order-independent → deterministic for fixed seed). The streaming-side
    heavy-hitter complement to the exact ``text_heavy_hitters`` rollup."""
    row = df.agg(
        F.count_min_sketch(
            value_col, F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("cms")
    ).collect()[0]
    return bytes(row["cms"])


def events_hll_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type approximate distinct users via DataSketches HLL
    (~0.8% error at lgK=14, 32 KB per group). The sketch column is the
    point: persisted sketches answer ANY coarser rollup (daily → monthly →
    global) by union, without rescanning the fact table — the only
    distinct-count strategy that survives 100 TB cubes.

    Library function, NOT a registered query: the DataSketches binary is
    engine-internal so no DuckDB oracle exists (it sat as a permanent
    ``no_oracle`` driver row in r01/r02). Accuracy + re-aggregability are
    unit-tested in tests/test_operators.py; the bit-exact cross-checked
    twin is the ``events_hll_registers``/``events_hll_estimate`` pair
    below."""
    ev = load_table(spark, sf_dir, "events")
    return distinct_sketches(ev, ["event_type"], "user_id").drop("sketch")


# ------------------------------------------- oracle-checkable HLL variant --
#
# The Spark-native HLL above (`hll_sketch_agg`) is rows-only checkable: its
# binary sketch is engine-internal. This variant rebuilds HyperLogLog from
# first principles with md5-derived registers, so DuckDB can recompute the
# EXACT same registers and estimate — converting the sketch family from
# "trust the engine" to bit-exact cross-checked. Same plan shape as any
# production HLL: one narrow map per row, one max-aggregation over
# HLL_M register keys (map-side combined), constant-size output.
#
# Register math (identical text in both engines): bucket = first 2 md5 hex
# chars mod HLL_M; v = next 15 hex chars (60 bits); rho = 61 - bitlength(v)
# (v = 0 -> 61). Estimate = alpha * m^2 / sum(2^-reg), registers folded in
# bucket order — a fixed IEEE op sequence over powers of two.

HLL_M = 64          # registers (b = 6 bits)
HLL_ALPHA = 0.709   # standard alpha for m = 64


@query(
    "events_hll_registers",
    oracle=f"""
    WITH h AS (
      SELECT md5(CAST(user_id AS VARCHAR)) AS hx FROM events
    ),
    r AS (
      SELECT CAST(CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) % {HLL_M} AS INTEGER)
               AS bucket,
             CAST(('0x' || substr(hx, 3, 15)) AS BIGINT) AS v
      FROM h
    ),
    regs AS (
      SELECT bucket,
             MAX(CASE WHEN v = 0 THEN 61
                      ELSE 61 - length(bin(v)) END) AS register
      FROM r GROUP BY bucket
    )
    SELECT s.bucket, CAST(COALESCE(regs.register, 0) AS INTEGER) AS register
    FROM (SELECT unnest(generate_series(0, {HLL_M - 1})) AS bucket) s
    LEFT JOIN regs ON regs.bucket = s.bucket
    """,
    doc=f"HyperLogLog registers, oracle-checkable: md5-derived bucket "
        f"(mod {HLL_M}) and leading-zero rank per row, max per register — "
        "bit-identical in both engines, unlike the engine-internal "
        "hll_sketch_agg binary. One narrow map + one tiny max-agg; "
        "registers merge by max, so shards re-aggregate exactly like any "
        "production HLL.",
)
def events_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hx = F.md5(F.col("user_id").cast("string"))
    bucket = (F.conv(F.substring(hx, 1, 2), 16, 10).cast("long") % HLL_M).cast("int")
    v = F.conv(F.substring(hx, 3, 15), 16, 10).cast("long")
    rho = F.when(v == 0, F.lit(61)).otherwise(
        F.lit(61) - F.length(F.bin(v))
    )
    regs = (
        ev.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("register"))
    )
    spine = spark.range(0, HLL_M).select(F.col("id").cast("int").alias("bucket"))
    return spine.join(regs, "bucket", "left").select(
        "bucket", F.coalesce("register", F.lit(0)).cast("int").alias("register")
    )


@query(
    "events_hll_estimate",
    oracle=f"""
    WITH h AS (
      SELECT md5(CAST(user_id AS VARCHAR)) AS hx FROM events
    ),
    r AS (
      SELECT CAST(CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) % {HLL_M} AS INTEGER)
               AS bucket,
             CAST(('0x' || substr(hx, 3, 15)) AS BIGINT) AS v
      FROM h
    ),
    regs AS (
      SELECT bucket,
             MAX(CASE WHEN v = 0 THEN 61
                      ELSE 61 - length(bin(v)) END) AS register
      FROM r GROUP BY bucket
    ),
    full_regs AS (
      SELECT s.bucket, COALESCE(regs.register, 0) AS register
      FROM (SELECT unnest(generate_series(0, {HLL_M - 1})) AS bucket) s
      LEFT JOIN regs ON regs.bucket = s.bucket
    ),
    folded AS (
      SELECT list_reduce(
               list_transform(array_agg(register ORDER BY bucket),
                              x -> pow(2.0, -x)),
               (a, b) -> a + b) AS inv_sum,
             COUNT(*) FILTER (WHERE register = 0) AS n_zero
      FROM full_regs
    ),
    est AS (
      SELECT {HLL_ALPHA} * {HLL_M} * {HLL_M} / inv_sum AS raw_e, n_zero
      FROM folded
    ),
    corrected AS (
      SELECT CASE WHEN raw_e <= 2.5 * {HLL_M} AND n_zero > 0
                  THEN {HLL_M} * ln({HLL_M}.0 / n_zero)
                  ELSE raw_e END AS hll_estimate
      FROM est
    )
    SELECT corrected.hll_estimate,
           (SELECT COUNT(DISTINCT user_id) FROM events) AS true_distinct,
           corrected.hll_estimate
             / (SELECT COUNT(DISTINCT user_id) FROM events) - 1.0 AS rel_error
    FROM corrected
    """,
    doc="HLL cardinality estimate from the oracle-checkable registers: "
        "alpha * m^2 / sum(2^-register) folded in bucket order (powers of "
        "two — every intermediate is IEEE-exact), with the standard "
        "small-range linear-counting branch (E <= 2.5m and empty registers "
        "present -> m*ln(m/V), Flajolet et al. 2007) applied identically "
        "in both engines, alongside the true distinct count and relative "
        "error. Proves the whole sketch path (hash -> registers -> "
        "estimate) end-to-end against an independent engine, not just row "
        "counts.",
)
def events_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    regs = events_hll_registers(spark, sf_dir)
    folded = regs.agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(bucket, register))),"
            " s -> pow(2.0D, -s.register)), 0.0D, (a, b) -> a + b)"
        ).alias("inv_sum"),
        F.count(F.when(F.col("register") == 0, 1)).alias("n_zero"),
    )
    ev = load_table(spark, sf_dir, "events")
    true_d = ev.agg(F.countDistinct("user_id").alias("true_distinct"))
    raw_e = F.lit(HLL_ALPHA) * F.lit(HLL_M) * F.lit(HLL_M) / F.col("inv_sum")
    est = F.when(
        (raw_e <= F.lit(2.5 * HLL_M)) & (F.col("n_zero") > 0),
        F.lit(HLL_M) * F.log(F.lit(float(HLL_M)) / F.col("n_zero")),
    ).otherwise(raw_e)
    return (
        folded.crossJoin(F.broadcast(true_d))
        .select(
            est.alias("hll_estimate"),
            "true_distinct",
            (est / F.col("true_distinct") - F.lit(1.0)).alias("rel_error"),
        )
    )
