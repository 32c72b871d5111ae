"""Round-7 streaming retention maintenance: the user-week state table
admits novel (user, week) rows per epoch and serves the cohort grid
through the same plan the batch query runs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.001"


def _event_feed(spark, tmp_path, n_epochs=3):
    """sf0.001 events (with user_id) split into ordered parquet chunks."""
    ev = (
        spark.read.parquet(SF001 + "/events.parquet")
        .select("event_id", "ts", "user_id")
        .orderBy("event_id")
        .toPandas()
    )
    feed = tmp_path / "evfeed"
    feed.mkdir()
    n = len(ev)
    cuts = [n * i // n_epochs for i in range(n_epochs + 1)]
    for i in range(n_epochs):
        p = feed / f"chunk{i}.parquet"
        ev.iloc[cuts[i] : cuts[i + 1]].to_parquet(
            p, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(feed), spark.read.parquet(str(feed)).schema


def test_retention_stream_matches_batch(spark, tmp_path):
    """The maintained user-week state serves a cohort grid bit-identical
    to the batch query over the same rows — shared cohort_grid plan, so
    any drift is state-admission drift."""
    from conduit_connector_s3_iceberg_spark.plans.events import (
        events_retention_cohorts,
    )
    from conduit_connector_s3_iceberg_spark.streaming.ivm import (
        maintain_retention_stream,
        retention_from_state,
    )
    from conduit_connector_s3_iceberg_spark.writer import ParquetWarehouse

    feed, schema = _event_feed(spark, tmp_path)
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    maintain_retention_stream(
        stream, wh, "uweeks", str(tmp_path / "ckpt")
    ).awaitTermination(180)

    got = sorted(tuple(r) for r in retention_from_state(wh, "uweeks").collect())
    want = sorted(
        tuple(r) for r in events_retention_cohorts(spark, SF001).collect()
    )
    assert got == want
    # the state is DISTINCT user-weeks: no key appears twice
    state = wh.read("uweeks")
    assert state.count() == state.select("user_id", "w").distinct().count()


def test_retention_stream_replay_and_late_arrival(spark, tmp_path):
    """A replayed epoch admits nothing (epoch guard); a late-arriving
    earlier week MOVES the user's cohort at serve time — first-seen
    state is a min, not a sticky label."""
    from conduit_connector_s3_iceberg_spark.streaming.ivm import (
        append_index,
        probe_novel,
        retention_from_state,
    )
    from conduit_connector_s3_iceberg_spark.writer import (
        ParquetWarehouse,
        epoch_already_applied,
        mark_epoch_applied,
    )

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    uw1 = spark.createDataFrame([(7, 10)], "user_id long, w long")
    for _ in range(2):  # duplicate delivery of epoch 0
        if not epoch_already_applied(wh, "uw__applied_epoch", 0):
            append_index(wh, "uw", probe_novel(wh, "uw", uw1, ["user_id", "w"]))
            mark_epoch_applied(wh, "uw__applied_epoch", spark, 0)
    assert wh.read("uw").count() == 1
    g1 = retention_from_state(wh, "uw").collect()
    assert len(g1) == 1 and g1[0]["week_offset"] == 0

    # late arrival: the SAME user active in an EARLIER week (w=8)
    uw2 = spark.createDataFrame([(7, 8)], "user_id long, w long")
    append_index(wh, "uw", probe_novel(wh, "uw", uw2, ["user_id", "w"]))
    g2 = {r["week_offset"]: r for r in retention_from_state(wh, "uw").collect()}
    # cohort moved to week 8; the old week-10 activity is now offset 2
    assert set(g2) == {0, 2}
    assert g2[0]["cohort_size"] == 1 and g2[2]["active_users"] == 1
