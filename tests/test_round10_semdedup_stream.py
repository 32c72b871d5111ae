"""Round-10: streaming semantic-dedup admission twin (r9 verdict item 7).

batch==stream equality: N vec_id-ordered epochs of
``maintain_semdedup_stream`` — across a checkpointed query restart — must
admit exactly the set the batch ``emb_semdedup_admission`` query admits,
because admission is monotone in the seen-prefix SET (a verdict never
depends on whether the earlier witness was itself admitted).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from conduit_connector_s3_iceberg_spark.operators.similarity import (
    emb_semdedup_admission,
    sem_quantizer_stats,
)
from conduit_connector_s3_iceberg_spark.streaming.semdedup_stream import (
    apply_semdedup_epoch,
    maintain_semdedup_stream,
)
from conduit_connector_s3_iceberg_spark.writer import ParquetWarehouse

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet"))


def test_stream_admission_equals_batch_across_restart(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "warehouse"))
    emb = _emb(spark)
    mu, nbits = sem_quantizer_stats(spark, SF)

    src = tmp_path / "emb_in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema(emb.schema).parquet(str(src))
        maintain_semdedup_stream(
            stream, wh, "sem_idx", "sem_out", ckpt, mu, nbits
        ).awaitTermination(180)

    # epoch 1: the low-vec_id half (one file -> one micro-batch)
    emb.filter(F.col("vec_id") < 250).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run()
    n_out_e1 = wh.read("sem_out").count()
    assert wh.read("sem_idx").count() == 250  # every SEEN vector indexed

    # epoch 2: the rest, via a NEW query on the SAME checkpoint (restart)
    emb.filter(F.col("vec_id") >= 250).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run()

    got = sorted(r["vec_id"] for r in wh.read("sem_out").collect())
    want = sorted(
        r["vec_id"]
        for r in emb_semdedup_admission(spark, SF).collect()
        if r["admitted"]
    )
    assert got == want
    assert wh.read("sem_idx").count() == emb.count()
    # both epochs actually admitted something (epoch 2 rejects against the
    # standing index too, so it admits fewer than its raw half)
    assert 0 < n_out_e1 < len(got)

    # third run with no new files: a no-op
    run()
    assert wh.read("sem_out").count() == len(got)


def test_semdedup_epoch_replay_is_idempotent(spark, tmp_path):
    """At-least-once replay: re-delivering an applied epoch must change
    neither the index nor the output (epoch sidecar + commit marks)."""
    wh = ParquetWarehouse(spark, str(tmp_path / "warehouse"))
    emb = _emb(spark)
    mu, nbits = sem_quantizer_stats(spark, SF)
    batch = emb.filter(F.col("vec_id") < 100)

    apply_semdedup_epoch(wh, "sem_idx", "sem_out", batch, 0, mu, nbits)
    idx1 = wh.read("sem_idx").count()
    out1 = sorted(r["vec_id"] for r in wh.read("sem_out").collect())
    assert idx1 == 100

    apply_semdedup_epoch(wh, "sem_idx", "sem_out", batch, 0, mu, nbits)
    assert wh.read("sem_idx").count() == idx1
    assert sorted(r["vec_id"] for r in wh.read("sem_out").collect()) == out1


def test_standing_index_scan_is_block_pruned(spark, tmp_path):
    """The probe of the standing index must read only the micro-batch's
    blocks: the index is hive-partitioned by block, and the isin filter
    prunes to the touched directories."""
    wh = ParquetWarehouse(spark, str(tmp_path / "warehouse"))
    emb = _emb(spark)
    mu, nbits = sem_quantizer_stats(spark, SF)
    apply_semdedup_epoch(
        wh, "sem_idx", "sem_out", emb.filter(F.col("vec_id") < 250), 0, mu, nbits
    )
    blocks = [
        r["block"]
        for r in wh.read("sem_idx").select("block").distinct().collect()
    ]
    one = blocks[0]
    plan = (
        wh.read("sem_idx")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pruned = (
        wh.read("sem_idx")
        .filter(F.col("block").isin([one]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: []" in plan
    assert "block#" in pruned and "PartitionFilters: []" not in pruned
