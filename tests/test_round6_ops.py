"""Round-6 operator tests: the materialized dedup-metadata maintenance
table and its consumers."""

from __future__ import annotations

import os
import shutil

SF001 = "/root/testdata/sf0.001"


def test_dedup_labels_table_builds_once_then_serves_from_disk(spark):
    """The maintenance op writes the table on first touch; subsequent
    consumers read the persisted parquet without rebuilding (the
    rewrite_data_files shape: label once, serve every consumer)."""
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        dedup_table_path,
        ensure_dedup_table,
    )

    path = dedup_table_path(SF001)
    shutil.rmtree(path, ignore_errors=True)

    df1 = ensure_dedup_table(spark, SF001)
    assert {"doc_id", "cluster_id", "group_fp"} == set(df1.columns)
    n = df1.count()
    assert n > 0
    success = os.path.join(path, "_SUCCESS")
    assert os.path.exists(success)
    m1 = os.path.getmtime(success)

    df2 = ensure_dedup_table(spark, SF001)
    assert df2.count() == n
    assert os.path.getmtime(success) == m1, "table was rebuilt on re-read"


def test_dedup_table_key_tracks_source_identity():
    """Different source dirs (different corpus identity) key different
    table paths — a corpus change can never serve stale labels."""
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        dedup_table_path,
    )

    assert dedup_table_path(SF001) != dedup_table_path("/root/testdata/sf0.01")


def test_consumers_equal_recompute_labels(spark):
    """The persisted table's labels equal a from-scratch min-label
    recompute (star contraction and min-label agree on cluster ids —
    both emit the component-min doc_id)."""
    from pyspark.sql import functions as F

    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        dedup_cluster_labels,
        ensure_dedup_table,
    )

    fresh = dedup_cluster_labels(spark, SF001)
    persisted = ensure_dedup_table(spark, SF001).select(
        "doc_id", "cluster_id"
    )
    diff = (
        fresh.alias("a")
        .join(persisted.alias("b"), "doc_id")
        .filter(F.col("a.cluster_id") != F.col("b.cluster_id"))
        .count()
    )
    assert diff == 0
    assert fresh.count() == persisted.count()
