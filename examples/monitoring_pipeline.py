"""End-to-end OPERATIONS/monitoring pipeline over the event stream — the
sibling of examples/training_pipeline.py for the telemetry side of a data
platform. Stages:

  1. health    — per-day CUSUM drift scan, weekday-adjusted anomalies,
                 time-weighted gauge averages;
  2. behavior  — Markov transition matrix, conversion latency, DAU/WAU
                 stickiness, bot-regularity flags;
  3. experiment— deterministic A/B assignment with pooled-z lift;
  4. capacity  — KMV cross-type user overlap (metadata-sized sketches),
                 HLL distinct rollups, compaction bin planning for the
                 small files the ingest lands.

Every stage is a registered, DuckDB-oracle-checked query; this script just
strings them into the monitoring shape they exist for.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from conduit_connector_s3_iceberg_spark.plans.registry import load_all  # noqa: E402
from conduit_connector_s3_iceberg_spark.session import build_session  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

STAGES = [
    ("1. health: CUSUM rate drift", "events_cusum_changepoints"),
    ("1. health: weekday-adjusted anomalies", "events_seasonal_anomaly"),
    ("1. health: time-weighted gauge average", "events_time_weighted_value"),
    ("2. behavior: transition matrix", "events_transition_matrix"),
    ("2. behavior: Markov stationary mix", "events_markov_stationary"),
    ("2. behavior: conversion latency", "events_time_to_conversion"),
    ("2. behavior: DAU/WAU stickiness", "events_dau_wau"),
    ("2. behavior: bot regularity flags", "events_bot_regularity"),
    ("3. experiment: A/B lift + z", "events_ab_lift"),
    ("3. experiment: windowed funnel", "events_windowed_funnel"),
    ("3. experiment: removal-effect attribution", "events_markov_attribution"),
    ("4. capacity: Holt level/trend forecast", "events_holt_smoothing"),
    ("4. capacity: peak concurrent sessions", "events_peak_concurrency"),
    ("4. capacity: KMV cross-type overlap", "sketch_kmv_jaccard"),
    ("4. capacity: HLL distinct rollup", "events_hll_estimate"),
    ("4. capacity: compaction bin plan", "layout_compaction_bins"),
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
