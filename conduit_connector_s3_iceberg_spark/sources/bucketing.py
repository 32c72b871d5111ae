"""Bucketed-table layout: pre-shuffled storage for repeated co-located joins.

The 100-TB pattern: a fact table that joins on the same key in every
pipeline run (orders x lineitem, doc_id x embeddings) pays one layout-time
shuffle via ``bucketBy`` and then NEVER shuffles on that key again — Spark's
scan reports the hash-partitioned output, so SortMergeJoin / aggregation on
the bucket key plans with ZERO Exchange on the bucketed sides. This is the
Spark-native analogue of Iceberg's ``bucket(n, col)`` partition transform
(the layout the reference connector's tables would use server-side; see
``iceberg.py`` for the DML layer).

Rules for the no-shuffle plan to hold (asserted in tests):
* both sides bucketed on the join key with the SAME bucket count,
* ``spark.sql.sources.bucketing.enabled`` on (default),
* bucket count >= shuffle parallelism you would otherwise want — each
  bucket is one task, so pick n_buckets for target-cluster parallelism,
  not for the laptop.
``sort_by`` additionally persists per-bucket sort order, which removes the
join's Sort as well (bucketed SMJ reads pre-sorted runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed parquet table registered in the catalog.

    One full shuffle now (the bucketing write), none later for any join or
    aggregation on ``key`` between same-bucketed tables.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left: str, right: str, key: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on the bucket key.

    With matching bucket specs the physical plan contains no Exchange on
    either side (verified by ``tests/test_sources_maintenance.py``); the
    join parallelism is the bucket count.
    """
    keys = [key] if isinstance(key, str) else list(key)
    return spark.table(left).join(spark.table(right), on=keys, how=how)


# ------------------------------------------------------------ Z-order keys
#
# Multi-dimensional data skipping (Iceberg's `rewrite_data_files` zorder
# analog): interleave the bits of two normalized columns so rows close in
# BOTH dimensions land close in the sort order. Files written sorted by
# the key then carry tight parquet footer min/max ranges in *both*
# columns — a filter on either dimension prunes most files, where a
# single-column sort only prunes its own column. Pure JVM bit arithmetic
# (shifts/ands unrolled per bit), no UDF.


def zorder_key(
    col_a, lo_a: float, hi_a: float, col_b, lo_b: float, hi_b: float, bits: int = 16
):
    """Morton (Z-curve) key of two columns, each normalized to ``bits``
    levels over a caller-supplied [lo, hi) domain (fixed domains keep the
    key deterministic and computable in one narrow map — no extra
    min/max pass; out-of-domain values clamp to the edge buckets)."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    def norm(c, lo, hi):
        c = c if isinstance(c, Column) else F.col(c)
        scaled = F.floor(
            (c.cast("double") - F.lit(float(lo)))
            / F.lit(float(hi) - float(lo))
            * F.lit(float(1 << bits))
        ).cast("long")
        return F.least(F.greatest(scaled, F.lit(0)), F.lit((1 << bits) - 1))

    a, b = norm(col_a, lo_a, hi_a), norm(col_b, lo_b, hi_b)
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftrightunsigned(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftrightunsigned(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return key


def write_zordered(
    df, path: str, col_a, dom_a: tuple, col_b, dom_b: tuple, n_files: int = 8
) -> None:
    """Write ``df`` as parquet clustered along the Z-curve of two columns:
    range-partition on the key (contiguous curve segments per file) and
    sort within each file. One shuffle at layout time; afterwards filters
    on EITHER column prune files via footer min/max."""
    from pyspark.sql import functions as F

    z = zorder_key(col_a, *dom_a, col_b, *dom_b).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
