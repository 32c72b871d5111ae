"""Hybrid retrieval walkthrough: the lexical + vector search operators end
to end on the driver-generated tables.

Run from the repo root (takes ~1 min on local[8]):

    python examples/retrieval_pipeline.py [sf_dir]

Walkthrough — the shape of a production hybrid-search / data-curation
retrieval stack (each stage prints a small sample):
  1. index    — BM25 term saliency (the lexical index's scoring side) and
                the per-source quality calibration used to filter what
                gets indexed;
  2. ANN      — exact brute-force baseline, then the three approximate
                paths (LSH buckets, IVF cells, IVF+PQ asymmetric
                distances) with the recall@k audit against the baseline;
  3. fuse     — reciprocal-rank fusion of the cosine and euclidean
                rankings (the calibration-free list merge);
  4. rerank   — truncated-dimension rerank (cheap first pass) and
                maximal-marginal-relevance diversification (the final
                result list);
  5. mine     — hard-negative mining from the fused neighborhoods
                (contrastive training data for the next embedding model).

Every operator here is also a registered query with a DuckDB oracle —
this script just strings them into the pipeline shape they exist for.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from conduit_connector_s3_iceberg_spark.plans.registry import load_all  # noqa: E402
from conduit_connector_s3_iceberg_spark.session import build_session  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

STAGES = [
    ("1. index: BM25 term saliency", "text_bm25_top_terms"),
    ("1. index: per-source quality calibration", "text_quality_calibration"),
    ("2. ANN: exact top-k baseline", "sim_topk_bruteforce"),
    ("2. ANN: LSH-bucketed", "sim_ann_lsh"),
    ("2. ANN: IVF cells", "sim_ann_ivf"),
    ("2. ANN: IVF+PQ asymmetric distances", "sim_ann_ivfpq"),
    ("2. ANN: recall@k audit", "sim_ann_recall"),
    ("3. fuse: reciprocal-rank fusion", "sim_rrf_fusion"),
    ("4. rerank: truncated-dim first pass", "sim_truncated_rerank"),
    ("4. rerank: MMR diversification", "sim_mmr_rerank"),
    ("5. mine: hard negatives", "sim_hard_negatives"),
]


def main() -> None:
    spark = build_session(shuffle_partitions=8)
    registry = load_all()
    for title, qname in STAGES:
        df = registry[qname].build(spark, SF_DIR)
        n = df.count()
        print(f"\n=== {title} [{qname}] — {n} rows ===")
        df.show(3, truncate=60)
    spark.stop()


if __name__ == "__main__":
    main()
