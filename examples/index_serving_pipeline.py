"""Persisted-index serving walkthrough: build the cell-partitioned IVF
index once, then run the whole serving/maintenance day against it.

Run from the repo root (takes ~1 min on local[8]):

    python examples/index_serving_pipeline.py [sf_dir]

Walkthrough — the lifecycle of a standing vector index at corpus scale
(each stage prints a small sample):
  1. build    — ``ensure_ann_index`` assigns every vector to its Voronoi
                cell and persists the index PARTITIONED BY cell (assign
                once per corpus generation; appends are O(delta));
  2. serve    — ``sim_ann_ivf_indexed`` probes NPROBE cells by reading
                only those partitions' files (static pruning from a
                bounded probe list) — bit-identical to the inline IVF;
  3. audit    — ``sim_index_balance_audit`` prices the index's health
                (hot cell = worst-case probe latency; the re-train
                trigger), and the quantization ladder prices cheaper
                candidate tiers in front of it: int8 codes, 4-bit
                minhash signatures, 1-bit sign codes;
  4. maintain — ``streaming.maintain_ann_index_stream`` admits an
                embedding stream into the same partitioned layout
                (pure-map assignment, replay-guarded epochs).

Every query stage is also a registered query with a DuckDB oracle —
this script strings them into the serving shape they exist for.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from conduit_connector_s3_iceberg_spark.plans.registry import load_all  # noqa: E402
from conduit_connector_s3_iceberg_spark.session import build_session  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

STAGES = [
    ("2. serve: partition-pruned IVF top-k", "sim_ann_ivf_indexed"),
    ("3. audit: cell balance / re-train trigger", "sim_index_balance_audit"),
    ("3. audit: int8 candidate tier recall", "emb_int8_recall"),
    ("3. audit: 4-bit minhash signature error", "dedup_bbit_minhash"),
    ("3. audit: 1-bit sign-code recall", "emb_sign_hamming_recall"),
    ("3. audit: per-dimension quantization readiness", "emb_dim_moments"),
]


def main() -> None:
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        ensure_ann_index,
    )

    spark = build_session(shuffle_partitions=8)
    registry = load_all()

    idx = ensure_ann_index(spark, SF_DIR)
    print(f"=== 1. build: persisted IVF index — {idx.count()} vectors ===")
    idx.groupBy("cell").count().orderBy("cell").show(5)

    for title, qname in STAGES:
        df = registry[qname].build(spark, SF_DIR)
        n = df.count()
        print(f"\n=== {title} [{qname}] — {n} rows ===")
        df.show(3, truncate=60)

    print("\n=== 4. maintain: streaming admission ===")
    print(
        "see streaming.maintain_ann_index_stream + tests/test_ann_index.py::"
        "test_ann_index_stream_matches_batch_build for the epoch-replay-"
        "guarded streaming twin of stage 1."
    )
    spark.stop()


if __name__ == "__main__":
    main()
