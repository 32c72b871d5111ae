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
    success = os.path.join(path, "labels_g0", "_SUCCESS")
    assert os.path.exists(success)
    assert os.path.exists(os.path.join(path, "manifest.json"))
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


def _write_ordered_feed(spark, tmp_path, cols):
    """Split sf0.001 documents into 3 ascending-doc_id parquet chunks with
    ascending mtimes, so the file stream delivers doc ids in order and
    first-seen admission equals the batch keep=min(doc_id) rule."""
    import pandas as pd  # noqa: F401 (toPandas)

    docs = (
        spark.read.parquet(os.path.join(SF001, "documents.parquet"))
        .select(*cols)
        .orderBy("doc_id")
        .toPandas()
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    n = len(docs)
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        p = feed / f"chunk{i}.parquet"
        docs.iloc[cuts[i]:cuts[i + 1]].to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(feed), spark.read.parquet(str(feed)).schema


def test_mixture_shift_stream_matches_batch(spark, tmp_path):
    """The mixture-shift monitor maintained from a 3-epoch document feed
    equals the batch corpus_dedup_mixture_shift over the same corpus —
    bit-exact, including the IEEE share divisions (r5 verdict #6)."""
    from conduit_connector_s3_iceberg_spark.operators.corpus import (
        corpus_dedup_mixture_shift,
    )
    from conduit_connector_s3_iceberg_spark.streaming.corpus import (
        maintain_mixture_stream,
        mixture_shift_from_state,
    )
    from conduit_connector_s3_iceberg_spark.writer import ParquetWarehouse

    feed, schema = _write_ordered_feed(
        spark, tmp_path, ["doc_id", "source", "text"]
    )
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    maintain_mixture_stream(
        stream, wh, "mix", str(tmp_path / "ckpt")
    ).awaitTermination(180)

    got = [tuple(r) for r in mixture_shift_from_state(wh, "mix").collect()]
    want = [
        tuple(r) for r in corpus_dedup_mixture_shift(spark, SF001).collect()
    ]
    assert got == want


def test_family_savings_stream_matches_batch(spark, tmp_path):
    """The family-savings manifest recomputed from the IVM group summaries
    after a 3-epoch feed equals the batch dedup_family_savings manifest."""
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        dedup_family_savings,
    )
    from conduit_connector_s3_iceberg_spark.streaming.dedup_stream import (
        family_savings_from_state,
        maintain_family_savings_stream,
    )
    from conduit_connector_s3_iceberg_spark.writer import ParquetWarehouse

    feed, schema = _write_ordered_feed(spark, tmp_path, ["doc_id", "text"])
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    maintain_family_savings_stream(
        stream, wh, "fam", str(tmp_path / "ckpt")
    ).awaitTermination(180)

    got = [tuple(r) for r in family_savings_from_state(wh, "fam").collect()]
    want = [tuple(r) for r in dedup_family_savings(spark, SF001).collect()]
    assert got == want


def test_mixture_epoch_replay_is_idempotent(spark, tmp_path):
    """Re-delivering an epoch (foreachBatch at-least-once) must not
    double-apply its deltas — the epoch sidecar guards the merge."""
    from conduit_connector_s3_iceberg_spark.streaming.corpus import (
        apply_mixture_epoch,
        mixture_shift_from_state,
    )
    from conduit_connector_s3_iceberg_spark.writer import ParquetWarehouse

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    batch = spark.createDataFrame(
        [(1, "s0", "alpha beta"), (2, "s0", "alpha beta"), (3, "s1", "gamma")],
        "doc_id long, source string, text string",
    )
    apply_mixture_epoch(wh, "mix", batch, 0)
    first = [tuple(r) for r in mixture_shift_from_state(wh, "mix").collect()]
    apply_mixture_epoch(wh, "mix", batch, 0)  # replayed epoch
    second = [tuple(r) for r in mixture_shift_from_state(wh, "mix").collect()]
    assert first == second
    # s0 has a dup pair: before 4 tokens, after 2; s1 unchanged
    by_src = {r[0]: r for r in first}
    assert by_src["s0"][1] == 4 and by_src["s0"][2] == 2
    assert by_src["s1"][1] == 1 and by_src["s1"][2] == 1
