"""End-to-end EXPERIMENTATION/preference-analytics pipeline — the
round-10 additions strung into the shape an always-on experimentation
platform runs daily:

  1. monitor   — Wald SPRT early-stopping verdicts per metric stream
                 (reject / accept / keep collecting), CUSUM drift guard;
  2. uplift    — Qini decile report: did the targeting score find the
                 persuadables or just the sure things;
  3. preference— Bradley–Terry strengths over pairwise comparisons (the
                 RLHF reward-data statistic), rank-sum significance;
  4. assign    — Madow PPS systematic sampling for the next cohort,
                 deterministic stratified hash assignment.

Every stage is a registered, DuckDB-oracle-checked query; this script
just strings them into the experimentation shape they exist for.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from conduit_connector_s3_iceberg_spark.plans.registry import load_all  # noqa: E402
from conduit_connector_s3_iceberg_spark.session import build_session  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

STAGES = [
    ("1. monitor: SPRT early-stopping verdicts", "events_sprt_boundary"),
    ("1. monitor: CUSUM drift guard", "events_cusum_changepoints"),
    ("1. monitor: Poisson rate-shift test", "events_rate_shift_test"),
    ("2. uplift: Qini decile report", "events_uplift_qini"),
    ("2. uplift: CUPED variance reduction", "events_ab_cuped"),
    ("2. uplift: difference-in-differences", "events_did_lift"),
    ("3. preference: Bradley–Terry strengths", "events_bradley_terry"),
    ("3. preference: rank-sum significance", "events_ab_ranksum"),
    ("3. preference: Wilson conversion intervals", "events_wilson_ci"),
    ("4. assign: PPS systematic cohort draw", "sample_pps_systematic"),
    ("4. assign: stratified hash assignment", "sample_stratified_hash"),
    ("4. assign: required sample size", "events_ab_sample_size"),
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
