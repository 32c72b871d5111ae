"""Semantic-dedup lifecycle walkthrough: the SemDeDup admission triangle.

Run from the repo root (takes ~1 min on local[8]):

    python examples/semantic_dedup_pipeline.py [sf_dir]

Walkthrough — pruning semantically-redundant vectors at corpus scale
(each stage prints a small sample):
  1. audit   — ``emb_semdedup_balance_audit`` prices the quantizer:
               corpus-scaled depth (nbits), block populations, and
               pair_work = Sigma|block|^2, the exact cost of every
               pairwise stage below (linear when blocks stay ~TARGET);
  2. prune   — ``emb_semdedup`` (the batch pruner): within each block,
               of every pair above TAU cosine the copy CLOSER to its
               block centroid is removed — the atypical copy survives;
  3. admit   — ``ensure_semdedup_state`` builds the persisted seen-vector
               state under arrival-order admission (first-wins; monotone
               in the seen prefix, so O(delta) appends are exact), and
               ``emb_semdedup_state_audit`` re-verifies the stored
               verdicts against the from-scratch rule;
  4. stream  — ``streaming.maintain_semdedup_stream`` admits an
               embedding stream against the same frozen quantizer with
               block-pruned probes of the standing index (the twin whose
               equality with the batch rule is epoch-slicing-proof).

Every query stage is also a registered query with a DuckDB oracle —
this script strings them into the corpus-curation shape they exist for.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from conduit_connector_s3_iceberg_spark.plans.registry import load_all  # noqa: E402
from conduit_connector_s3_iceberg_spark.session import build_session  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

STAGES = [
    ("1. audit: quantizer balance / pair-work price",
     "emb_semdedup_balance_audit"),
    ("2. prune: SemDeDup batch pruner", "emb_semdedup"),
    ("3. admit: arrival-order admission (from scratch)",
     "emb_semdedup_admission"),
    ("3. admit: persisted state re-verified", "emb_semdedup_state_audit"),
]


def main() -> None:
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        ensure_semdedup_state,
    )

    spark = build_session(shuffle_partitions=8)
    registry = load_all()

    state = ensure_semdedup_state(spark, SF_DIR)
    kept = state.filter("admitted").count()
    print(
        f"=== persisted admission state: {state.count()} seen, "
        f"{kept} admitted ==="
    )

    for title, name in STAGES:
        print(f"=== {title} ({name}) ===")
        registry[name].build(spark, SF_DIR).show(5)

    print("=== 4. stream: see streaming/semdedup_stream.py and its "
          "equality test (tests/test_round10_semdedup_stream.py) ===")
    spark.stop()


if __name__ == "__main__":
    main()
