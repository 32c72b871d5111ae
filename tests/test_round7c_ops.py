"""Round-7 third-wave operator tests: arrival-order semantic novelty gate
(batch query + streaming admission twin)."""

from __future__ import annotations

import os

SF001 = "/root/testdata/sf0.001"


def _epoch_feed(spark, tmp_path, n_epochs=3):
    """The sf0.001 embeddings table split into vec_id-ordered parquet
    chunks (one file per epoch, mtime-ordered for maxFilesPerTrigger)."""
    emb = (
        spark.read.parquet(os.path.join(SF001, "embeddings.parquet"))
        .select("vec_id", "label", "embedding")
        .orderBy("vec_id")
        .toPandas()
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    n = len(emb)
    cuts = [n * i // n_epochs for i in range(n_epochs + 1)]
    chunks = []
    for i in range(n_epochs):
        p = feed / f"chunk{i}.parquet"
        emb.iloc[cuts[i] : cuts[i + 1]].to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        chunks.append(p)
    return feed, chunks


def test_semantic_gate_epochs_equal_batch_query(spark, tmp_path):
    """Three vec_id-ordered epochs through apply_semantic_gate_epoch admit
    EXACTLY the batch query's admitted set — the prior-seen criterion is
    order-free per row, so any epoch slicing of an ordered feed agrees."""
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        emb_semantic_gate,
    )
    from conduit_connector_s3_iceberg_spark.streaming.dedup_stream import (
        apply_semantic_gate_epoch,
    )
    from conduit_connector_s3_iceberg_spark.writer import ParquetWarehouse

    feed, chunks = _epoch_feed(spark, tmp_path)
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    for e, p in enumerate(chunks):
        apply_semantic_gate_epoch(wh, "semidx", "semout", spark.read.parquet(str(p)), e)

    got = sorted(r.vec_id for r in wh.read("semout").select("vec_id").collect())
    batch = emb_semantic_gate(spark, SF001).collect()
    want = sorted(r.vec_id for r in batch if r.admitted)
    assert got == want
    # the gate must actually reject something and admit something
    assert 0 < len(got) < len(batch)
    # the seen index holds EVERY vector (prior-seen, not prior-admitted)
    assert wh.read("semidx").count() == len(batch)


def test_semantic_gate_replay_is_idempotent(spark, tmp_path):
    """Re-delivering an applied epoch must not re-admit or re-index."""
    from conduit_connector_s3_iceberg_spark.streaming.dedup_stream import (
        apply_semantic_gate_epoch,
    )
    from conduit_connector_s3_iceberg_spark.writer import ParquetWarehouse

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    batch = (
        spark.read.parquet(os.path.join(SF001, "embeddings.parquet"))
        .select("vec_id", "label", "embedding")
        .limit(40)
    )
    apply_semantic_gate_epoch(wh, "semidx", "semout", batch, 0)
    n_out = wh.read("semout").count()
    n_idx = wh.read("semidx").count()
    apply_semantic_gate_epoch(wh, "semidx", "semout", batch, 0)
    assert wh.read("semout").count() == n_out
    assert wh.read("semidx").count() == n_idx


def test_semantic_gate_stream_runs_end_to_end(spark, tmp_path):
    """The writeStream wrapper over a 3-chunk ordered feed reproduces the
    batch admitted set through the real foreachBatch/checkpoint path."""
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        emb_semantic_gate,
    )
    from conduit_connector_s3_iceberg_spark.streaming.dedup_stream import (
        maintain_semantic_gate_stream,
    )
    from conduit_connector_s3_iceberg_spark.writer import ParquetWarehouse

    feed, _ = _epoch_feed(spark, tmp_path)
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    stream = (
        spark.readStream.schema(spark.read.parquet(str(feed)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    maintain_semantic_gate_stream(
        stream, wh, "semidx", "semout", str(tmp_path / "ckpt")
    ).awaitTermination(180)

    got = sorted(r.vec_id for r in wh.read("semout").select("vec_id").collect())
    want = sorted(
        r.vec_id for r in emb_semantic_gate(spark, SF001).collect() if r.admitted
    )
    assert got == want


def test_label_propagation_partitions_nodes(spark):
    """Every graph node gets exactly one community; sizes are consistent;
    labels are node ids; at least one community has >1 member (the trade
    graph is dense enough to cluster) and there is more than one
    community (LPA must not collapse the graph to a single label in 4
    rounds)."""
    from collections import Counter

    from conduit_connector_s3_iceberg_spark.operators.graph import (
        _cs_edges,
        graph_label_propagation,
    )

    rows = graph_label_propagation(spark, SF001).collect()
    nodes = {r.src for r in _cs_edges(spark, SF001).select("src").collect()}
    assert {r.id for r in rows} == nodes and len(rows) == len(nodes)

    sizes = Counter(r.community for r in rows)
    for r in rows:
        assert r.community_size == sizes[r.community]
        assert r.community in nodes
    assert max(sizes.values()) > 1
    assert len(sizes) > 1
