"""Round-9: auto-compaction policy for generation state.

compact/expire existed but were manual (r8 verdict, next-round item 4);
now the maintain paths trigger them when the live generation width
exceeds the manifest-recorded ``auto_compact_gens`` threshold — for both
the dedup labels state and the ANN cell index. Expiry follows a one-
compaction-cycle grace window (only generations superseded two
compactions ago are deleted) so lazily-held reader DataFrames survive.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from conduit_connector_s3_iceberg_spark.operators.dedup import (
    build_dedup_state,
    maintain_dedup_state,
)
from conduit_connector_s3_iceberg_spark.state import (
    read_manifest,
    stamp_manifest,
)


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, f"doc {i} " + " ".join(f"t{i}x{j}" for j in range(10)))
         for i in ids],
        "doc_id bigint, text string",
    )


def _gen_dirs(root, kind):
    d = os.path.join(root, kind)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(n[4:]) for n in os.listdir(d) if n.startswith("gen_")
    )


def test_dedup_appends_keep_generation_width_bounded(spark, tmp_path):
    root = str(tmp_path / "labels")
    build_dedup_state(spark, _docs(spark, range(10)), root)
    stamp_manifest(root, auto_compact_gens=3)

    n_appends = 10
    for i in range(n_appends):
        lo = 100 + 10 * i
        maintain_dedup_state(spark, _docs(spark, range(lo, lo + 5)), root)
        man = read_manifest(root)
        width = man["gen"] - man.get("base_gen", 0) + 1
        assert width <= 3, f"append {i}: live width {width} > threshold"

    # disk is bounded too: live window + one grace cycle, never the full
    # history of n_appends generations
    on_disk = _gen_dirs(root, "index")
    assert len(on_disk) <= 2 * (3 + 1), on_disk
    assert len(on_disk) < n_appends

    # consumers stay green: the auto-compacted state serves the same
    # labels as a fresh full build over the union corpus
    man = read_manifest(root)
    got = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(root, f"labels_g{man['gen']}"))
            .select("doc_id", "cluster_id")
            .collect(),
        )
    )
    all_ids = list(range(10)) + [
        100 + 10 * i + j for i in range(n_appends) for j in range(5)
    ]
    ref_root = str(tmp_path / "ref")
    ref = build_dedup_state(spark, _docs(spark, all_ids), ref_root)
    want = sorted(map(tuple, ref.select("doc_id", "cluster_id").collect()))
    assert got == want


def test_dedup_auto_compaction_preserves_delta_anchor(spark, tmp_path):
    """labels_g0/pairs_g0 — the generation-diff anchor — must survive
    every auto-compaction + grace expiry."""
    root = str(tmp_path / "labels")
    build_dedup_state(spark, _docs(spark, range(10)), root)
    stamp_manifest(root, auto_compact_gens=2)
    for i in range(8):
        lo = 100 + 10 * i
        maintain_dedup_state(spark, _docs(spark, range(lo, lo + 3)), root)
    assert os.path.isdir(os.path.join(root, "labels_g0"))
    assert os.path.isdir(os.path.join(root, "pairs_g0"))


def test_ann_appends_keep_cell_generation_width_bounded(spark, tmp_path):
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        ann_index_path,
        ensure_ann_index,
    )

    sf_dir = str(tmp_path / "sf")
    corpus = os.path.join(sf_dir, "embeddings.parquet")
    os.makedirs(corpus)
    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pdf = base.filter(F.col("vec_id") < 40).toPandas()
    pdf.to_parquet(os.path.join(corpus, "a.parquet"), index=False)

    root = ann_index_path(sf_dir)
    ensure_ann_index(spark, sf_dir)
    stamp_manifest(root, auto_compact_gens=3)

    full = base.toPandas()
    n_appends = 8
    for i in range(n_appends):
        lo, hi = 40 + 10 * i, 50 + 10 * i
        chunk = full[(full.vec_id >= lo) & (full.vec_id < hi)]
        chunk.to_parquet(os.path.join(corpus, f"d{i}.parquet"), index=False)
        idx = ensure_ann_index(spark, sf_dir)
        man = read_manifest(root)
        width = man["gen"] - man.get("base_gen", 0) + 1
        assert width <= 3, f"append {i}: live width {width} > threshold"
        assert idx.count() == hi  # every delta landed

    on_disk = _gen_dirs(root, "cells")
    assert len(on_disk) <= 2 * (3 + 1), on_disk
    assert len(on_disk) < n_appends

    # served rows green after compaction cycles: exactly the union corpus
    idx = ensure_ann_index(spark, sf_dir)
    got = {r["vec_id"] for r in idx.select("vec_id").collect()}
    assert got == set(range(40 + 10 * n_appends))
