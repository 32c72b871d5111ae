"""Unit tests for the join-operator library (edge cases the oracle-checked
queries don't pin down) and the sliding window rollup."""

from __future__ import annotations

from pyspark.sql import functions as F

from conduit_connector_s3_iceberg_spark.operators.joins import asof_join, salted_join
from conduit_connector_s3_iceberg_spark.streaming.windows import sliding_rollup


def _probe_build(spark):
    probe = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (2, 15, "p3")],
        "k long, t long, tag string",
    )
    build = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 99, 990.0)],
        "k long, t long, v double",
    )
    return probe, build


def test_asof_join_strict_excludes_equal_timestamps(spark):
    probe, build = _probe_build(spark)
    got = {
        r["tag"]: r["asof_v"]
        for r in asof_join(probe, build, "k", "t", ["v"], strict=True).collect()
    }
    # p1 (t=10): build t=10 NOT visible under strict < → no match
    # p2 (t=20): latest build at t=15 → 150.0; p3 (t=15): build t=99 is later → None
    assert got == {"p1": None, "p2": 150.0, "p3": None}


def test_asof_join_inclusive_matches_equal_timestamps(spark):
    probe, build = _probe_build(spark)
    got = {
        r["tag"]: r["asof_v"]
        for r in asof_join(probe, build, "k", "t", ["v"], strict=False).collect()
    }
    assert got == {"p1": 100.0, "p2": 150.0, "p3": None}


def test_asof_join_carries_multiple_build_columns(spark):
    probe, build = _probe_build(spark)
    row = (
        asof_join(probe, build, "k", "t", ["t", "v"], strict=True)
        .filter(F.col("tag") == "p2")
        .collect()[0]
    )
    assert (row["asof_t"], row["asof_v"]) == (15, 150.0)


def test_salted_join_equals_plain_join(spark):
    big = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("payload")
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(7)], "k long, name string"
    )
    plain = {
        (r["payload"], r["name"])
        for r in big.join(small, "k").select("payload", "name").collect()
    }
    salted = {
        (r["payload"], r["name"])
        for r in salted_join(big, small, "k", n_salts=4, scatter_col="payload")
        .select("payload", "name")
        .collect()
    }
    assert salted == plain and len(salted) == 1000


def test_sliding_rollup_overlapping_windows(spark):
    events = spark.createDataFrame(
        [(1, "2024-01-01 10:20:00", "click", 1.0, 1)],
        "user_id long, ts_s string, event_type string, value double, event_id long",
    ).select(
        "user_id", F.to_timestamp("ts_s").alias("ts"), "event_type", "value", "event_id"
    )
    rows = sliding_rollup(events, window="1 hour", slide="15 minutes").collect()
    # one event lands in 60/15 = 4 overlapping windows
    assert len(rows) == 4
    assert all(r["n_events"] == 1 for r in rows)
    starts = sorted(str(r["window_start"]) for r in rows)
    assert starts[0] == "2024-01-01 09:30:00" and starts[-1] == "2024-01-01 10:15:00"
