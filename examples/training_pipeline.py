"""Training-data pipeline walkthrough: the LLM-corpus operators end to end
on the driver-generated tables.

Run from the repo root (takes ~2 min on local[8]):

    python examples/training_pipeline.py [sf_dir]

Walkthrough (each stage prints a small sample):
  1. clean    — language gate + heuristic quality score + PII redaction +
                boilerplate-chunk splice-out (CCNet-style);
  2. decontaminate — Bloom-filter probe of benchmark shingles plus the
                MinHash near-dup probe of the train index;
  3. dedup    — exact keep-first, then near-dup pairs via the PPJoin
                prefix-filtered Jaccard join, then semantic clusters over
                embedding cosine (SemDeDup); plus the O(delta) incremental
                check a daily batch runs against the standing indexes;
  4. sample   — temperature-mixture weights and the exact-budget epoch
                draw they apportion (capped Hamilton quotas);
  5. encode   — token-id dictionary encode + overlapping RAG chunks;
  6. monitor  — HLL/CMS register sketches (the re-aggregable rollup
                state), histogram quantiles, and ANN index recall@k.

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
    ("1. clean: quality score", "text_quality_score"),
    ("1. clean: PII redaction", "text_pii_redact"),
    ("1. clean: boilerplate splice-out", "text_boilerplate_chunks"),
    ("1. clean: rule-cascade attrition audit", "text_filter_cascade"),
    ("1. clean: token entropy gate", "text_token_entropy"),
    ("2. decontaminate: bloom probe", "text_bloom_decontaminate"),
    ("2. decontaminate: near-dup probe of train index", "corpus_neardup_decontamination"),
    ("3. dedup: exact keep-first", "dedup_exact_keep_first"),
    ("3. dedup: near-dup pairs (prefix-filtered)", "dedup_jaccard_prefix_filter"),
    ("3. dedup: semantic clusters", "dedup_semantic_clusters"),
    ("3. dedup: incremental delta verdicts", "dedup_incremental_delta"),
    ("3. dedup: content-defined repeated regions", "dedup_cdc_chunks"),
    ("4. sample: DSIR importance weights", "text_dsir_weights"),
    ("4. sample: DSIR importance resample", "sample_dsir_resample"),
    ("4. sample: mixture weights", "sample_mixture_weights"),
    ("4. sample: epoch by mixture", "sample_epoch_by_mixture"),
    ("5. encode: token ids", "text_token_ids"),
    ("5. encode: RAG chunks", "pack_chunks_overlap"),
    ("6. monitor: HLL estimate", "events_hll_estimate"),
    ("6. monitor: CMS estimates", "events_cms_estimate"),
    ("6. monitor: length quantiles", "sketch_hist_quantiles"),
    ("6. monitor: ANN recall@10", "sim_ann_recall"),
    ("6. monitor: PQ distortion audit", "emb_pq_distortion"),
    ("6. monitor: embedding drift by label", "emb_drift_by_label"),
    ("6. monitor: KMV cross-source overlap", "sketch_kmv_jaccard"),
    ("6. monitor: novelty curve (crawl saturation)", "text_ngram_novelty"),
    ("6. monitor: CUSUM rate drift", "events_cusum_changepoints"),
    ("result: composed training set", "pipeline_training_set"),
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
