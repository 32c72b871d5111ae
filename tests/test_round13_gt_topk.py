"""Round-13 verdict item #3: persisted exact ground-truth top-k.

The ANN recall-audit family joins against a materialized exact top-K
table instead of recomputing brute force per query. These tests pin the
artifact against an inline brute-force recompute after builds, O(delta)
appends (including a replay and a new-probe append), and verify the
serving queries read the artifact, not the corpus.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from conduit_connector_s3_iceberg_spark.operators import gt_topk as gt
from conduit_connector_s3_iceberg_spark.operators.similarity import (
    RECALL_QUERIES,
    TOP_K,
)
from conduit_connector_s3_iceberg_spark.state import read_manifest

SF001 = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _inline_truth(spark, sf_dir):
    emb = gt._emb_frame(
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    ).localCheckpoint(eager=False)
    q = gt._queries_of(emb)
    return gt._rank_topk(gt._scored(emb, q), base=emb)


def _fresh_root(sf_dir):
    root = gt.gt_topk_path(sf_dir)
    if os.path.exists(root):
        shutil.rmtree(root)
    return root


def test_build_matches_inline_bruteforce(spark):
    _fresh_root(SF001)
    got = gt.serve_gt_topk(spark, SF001)
    assert _rows(got) == _rows(_inline_truth(spark, SF001))
    # structural invariants: every probe has exactly ranks 1..K
    per_q = got.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("rank").alias("rs")
    )
    bad = per_q.filter(
        (F.col("n") != TOP_K)
        | (F.col("rs") != TOP_K * (TOP_K + 1) // 2)
    )
    assert bad.isEmpty()
    assert got.select("query_id").distinct().count() == RECALL_QUERIES


def test_append_maintains_odelta_and_stays_exact(spark, tmp_path):
    sf_dir = str(tmp_path / "sf")
    corpus = os.path.join(sf_dir, "embeddings.parquet")
    os.makedirs(corpus)
    base = spark.read.parquet(os.path.join(SF001, "embeddings.parquet"))
    n = base.count()
    head = base.filter(F.col("vec_id") < n - 60)
    tail = base.filter(F.col("vec_id") >= n - 60)
    head.toPandas().to_parquet(os.path.join(corpus, "a.parquet"), index=False)
    root = _fresh_root(sf_dir)
    gt.ensure_gt_topk(spark, sf_dir)
    assert read_manifest(root)["gen"] == 0

    tail.toPandas().to_parquet(os.path.join(corpus, "b.parquet"), index=False)
    got = gt.serve_gt_topk(spark, sf_dir)
    assert read_manifest(root)["gen"] == 1, "append must maintain"
    assert _rows(got) == _rows(_inline_truth(spark, sf_dir))


def test_replay_append_is_exact_noop(spark, tmp_path):
    sf_dir = str(tmp_path / "sf")
    corpus = os.path.join(sf_dir, "embeddings.parquet")
    os.makedirs(corpus)
    base = spark.read.parquet(os.path.join(SF001, "embeddings.parquet"))
    base.toPandas().to_parquet(os.path.join(corpus, "a.parquet"), index=False)
    root = _fresh_root(sf_dir)
    before = _rows(gt.serve_gt_topk(spark, sf_dir))
    # re-deliver 30 already-present vectors as a new file
    base.filter(F.col("vec_id") % 7 == 0).limit(30).toPandas().to_parquet(
        os.path.join(corpus, "replay.parquet"), index=False
    )
    after = _rows(gt.serve_gt_topk(spark, sf_dir))
    assert after == before
    assert read_manifest(root)["gen"] == 1


def test_new_probe_append_computes_full_rows(spark, tmp_path):
    """An appended vector that is itself a probe (vec_id < GT_QUERIES)
    gets a full-corpus truth row set."""
    sf_dir = str(tmp_path / "sf")
    corpus = os.path.join(sf_dir, "embeddings.parquet")
    os.makedirs(corpus)
    base = spark.read.parquet(os.path.join(SF001, "embeddings.parquet"))
    # hold out probe 3 AND a tail slice
    held = (F.col("vec_id") == 3) | (F.col("vec_id") >= 400)
    base.filter(~held).toPandas().to_parquet(
        os.path.join(corpus, "a.parquet"), index=False
    )
    _fresh_root(sf_dir)
    first = gt.serve_gt_topk(spark, sf_dir)
    assert first.filter(F.col("query_id") == 3).isEmpty()
    base.filter(held).toPandas().to_parquet(
        os.path.join(corpus, "b.parquet"), index=False
    )
    got = gt.serve_gt_topk(spark, sf_dir)
    assert got.filter(F.col("query_id") == 3).count() == TOP_K
    assert _rows(got) == _rows(_inline_truth(spark, sf_dir))


def test_recall_consumers_read_artifact_not_corpus_for_truth(spark):
    """sim_topk_bruteforce must plan as a pure artifact read."""
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        sim_topk_bruteforce,
    )

    _fresh_root(SF001)
    root = gt.gt_topk_path(SF001)
    gt.ensure_gt_topk(spark, SF001)
    df = sim_topk_bruteforce(spark, SF001)
    files = df.inputFiles()
    assert files
    for f in files:
        assert root in f, f


def test_stream_twin_equals_batch_across_restart(spark, tmp_path):
    """Build on the head slice, stream the tail as TWO availableNow
    epochs with a checkpoint restart between them, then compare the
    state against a from-scratch build over the full corpus — and the
    retrieval-eval consumers served from it against their inline
    formulations."""
    from conduit_connector_s3_iceberg_spark.streaming.gt_stream import (
        GT_STREAM_SCHEMA,
        maintain_gt_topk_stream,
    )

    sf_dir = str(tmp_path / "sf")
    corpus = os.path.join(sf_dir, "embeddings.parquet")
    os.makedirs(corpus)
    base = spark.read.parquet(os.path.join(SF001, "embeddings.parquet"))
    n = base.count()
    # head: everything but the tail 90 (all probes stay in the head)
    base.filter(F.col("vec_id") < n - 90).toPandas().to_parquet(
        os.path.join(corpus, "a.parquet"), index=False
    )
    root = _fresh_root(sf_dir)
    gt.ensure_gt_topk(spark, sf_dir)

    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    ckpt = str(tmp_path / "ckpt_gt")

    def run_epoch():
        q = maintain_gt_topk_stream(
            spark.readStream.schema(GT_STREAM_SCHEMA).parquet(str(src_dir)),
            root,
            ckpt,
        )
        q.awaitTermination(180)

    import glob

    for i, pred in enumerate(
        (F.col("vec_id").between(n - 90, n - 46),
         F.col("vec_id") >= n - 45)
    ):
        # write via Spark to keep the array<float> element type (pandas
        # round-trips embeddings as double)
        stage = str(tmp_path / f"stage{i}")
        base.filter(pred).select("vec_id", "embedding").coalesce(
            1
        ).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*"))[0]
        shutil.move(part, os.path.join(str(src_dir), f"e{i}.parquet"))
        run_epoch()  # second call restarts from the checkpoint

    # full-corpus truth: stage the streamed rows as corpus files so the
    # inline recompute sees the same bytes
    base.filter(F.col("vec_id") >= n - 90).toPandas().to_parquet(
        os.path.join(corpus, "b.parquet"), index=False
    )
    man = read_manifest(root)
    got = spark.read.parquet(os.path.join(root, "topk", f"gen_{man['gen']}"))
    assert _rows(got) == _rows(_inline_truth(spark, sf_dir))


def test_stream_rejects_new_probe_ids(spark, tmp_path):
    from conduit_connector_s3_iceberg_spark.operators.gt_topk import (
        maintain_gt_topk,
    )

    import pytest

    sf_dir = str(tmp_path / "sf")
    corpus = os.path.join(sf_dir, "embeddings.parquet")
    os.makedirs(corpus)
    base = spark.read.parquet(os.path.join(SF001, "embeddings.parquet"))
    base.filter(F.col("vec_id") != 2).toPandas().to_parquet(
        os.path.join(corpus, "a.parquet"), index=False
    )
    root = _fresh_root(sf_dir)
    gt.ensure_gt_topk(spark, sf_dir)
    with pytest.raises(ValueError, match="new probe"):
        maintain_gt_topk(
            spark,
            base.filter(F.col("vec_id") == 2).select("vec_id", "embedding"),
            root,
        )
    # a REPLAYED probe vector is not a new probe: epoch merges cleanly
    before = _rows(gt.serve_gt_topk(spark, sf_dir))
    maintain_gt_topk(
        spark,
        base.filter(F.col("vec_id") == 1).select("vec_id", "embedding"),
        root,
    )
    assert _rows(gt.serve_gt_topk(spark, sf_dir)) == before
