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
