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


@query(
    "events_hll_user_counts",
    oracle=None,  # engine-specific estimates: accuracy + re-aggregability
    # are asserted in tests/test_operators.py against exact counts
    doc="Per-event-type approximate distinct users via DataSketches HLL "
        "(~0.8% error at lgK=14, 32 KB per group). The sketch column is "
        "the point: persisted sketches answer ANY coarser rollup (daily → "
        "monthly → global) by union, without rescanning the fact table — "
        "the only distinct-count strategy that survives 100 TB cubes. "
        "Rows-only check by design (DuckDB's approx algorithm differs).",
)
def events_hll_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return distinct_sketches(ev, ["event_type"], "user_id").drop("sketch")
