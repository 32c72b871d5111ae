"""Round-11 ADVICE fixes.

1. ``sprt_stream`` / ``cusum_drift_stream`` (streaming/drift.py): a key
   whose epoch rows span multiple Arrow chunks must fold in DAY order,
   not arrival order — the fix buffers every chunk and sorts once. The
   test forces multi-chunk groups (arrow maxRecordsPerBatch=2) with
   reverse-day arrival and asserts the latched SPRT verdict equals the
   single-chunk fold.
2. ``mm_scene_cuts`` (operators/multimodal.py): character-length
   convention on BOTH engines (oracle previously used strlen = bytes) —
   verified on a non-ASCII corpus including astral-plane code points.
3. ``events_bradley_terry`` (operators/timeseries.py): degenerate
   all-ties corpus yields an empty result (types set is empty), never a
   ZeroDivisionError; the tot==0 guard is additionally unreachable with
   nonempty types (any m entry implies a strict win).
4. ``_global_prefix_sum`` (operators/timeseries.py): the shared
   range-partition + broadcast-offset helper now backs both
   ``_global_rank`` and the PPS weight prefix sum — equivalence against
   the single-window spec asserted here.
"""

from __future__ import annotations

import glob
import shutil

import duckdb
import pytest
from pyspark.sql import functions as F


# ------------------------------------------------ multi-chunk SPRT fold ----


def _python_sprt(rows, l1, l0, bound):
    """Reference fold: day-ordered cumulative LLR with latched verdict."""
    s, dec, dday = 0, "continue", None
    for day, k, n in sorted(rows):
        s += k * l1 + (n - k) * l0
        if dec == "continue":
            if s >= bound:
                dec, dday = "reject_null", day
            elif s <= -bound:
                dec, dday = "accept_null", day
    return s, dec, dday


def test_sprt_stream_multichunk_group_folds_in_day_order(spark, tmp_path):
    """One key, 12 daily rows, arrow batches of 2, rows written in
    REVERSE day order: per-chunk sorting (the pre-fix behavior) would
    fold later days first and latch the wrong decision day; buffering
    all chunks and sorting once matches the reference fold."""
    from conduit_connector_s3_iceberg_spark.streaming.drift import sprt_stream

    l1, l0, bound = 1_000_000, -400_000, 3_000_000
    # k-run layout: folded in calendar order the LLR crosses +bound at
    # day 3; folded in the reverse-arrival chunk order it would latch a
    # different decision day — the discriminating case
    rows = [
        (f"2024-03-{d:02d}", k, 1)
        for d, k in zip(
            range(1, 13), [1, 1, 1, 0, 1, 1, 1, 0, 0, 0, 0, 0]
        )
    ]
    expect = _python_sprt(
        [(day, k, n) for day, k, n in rows], l1, l0, bound
    )

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    daily = spark.createDataFrame(
        # reverse order so arrival order != day order across chunks
        [("t0", day, k, n) for day, k, n in reversed(rows)],
        "event_type string, day string, k long, n long",
    ).select("event_type", F.to_date("day").alias("day"), "k", "n")
    stage = tmp_path / "stage"
    daily.coalesce(1).write.parquet(str(stage))
    [part] = glob.glob(str(stage / "part-*.parquet"))
    shutil.move(part, str(src_dir / "e0.parquet"))

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        out_dir = str(tmp_path / "out")
        q = (
            sprt_stream(
                spark.readStream.schema(
                    "event_type string, day date, k long, n long"
                ).parquet(str(src_dir)),
                l1,
                l0,
                bound,
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old
            )

    got = (
        spark.read.schema(
            "event_type string, day date, k long, n long, cum_scaled long,"
            " decision string, decision_day date"
        )
        .parquet(out_dir)
        .orderBy("day")
        .collect()
    )
    assert len(got) == len(rows)
    final = got[-1]
    s_exp, dec_exp, dday_exp = expect
    assert final["cum_scaled"] == s_exp
    assert final["decision"] == dec_exp
    assert str(final["decision_day"]) == dday_exp
    # the whole emitted trajectory is day-monotone in cum for days 1-7
    # (k=1 run) — a chunk-order fold would break monotonicity
    days = [str(r["day"]) for r in got]
    assert days == sorted(days)


def test_cusum_stream_multichunk_group_folds_in_day_order(spark, tmp_path):
    """CUSUM twin of the multi-chunk test: the max(0, ·) clamp makes the
    fold order-sensitive; reverse-arrival multi-chunk input must still
    produce the calendar-order trajectory."""
    from conduit_connector_s3_iceberg_spark.streaming.drift import (
        CUSUM_SCALE,
        cusum_drift_stream,
    )

    ref = 2 * CUSUM_SCALE  # reference mean 2.0 scaled
    xs = [5, 0, 0, 5, 5, 0, 0, 0]  # clamp engages on the 0-runs
    rows = [(f"2024-04-{d:02d}", x) for d, x in zip(range(1, 9), xs)]
    s, expect = 0, []
    for _, x in rows:
        s = max(0, s + x * CUSUM_SCALE - ref)
        expect.append(s)

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    daily = spark.createDataFrame(
        [("t0", day, x) for day, x in reversed(rows)],
        "event_type string, day string, x long",
    ).select("event_type", F.to_date("day").alias("day"), "x")
    stage = tmp_path / "stage"
    daily.coalesce(1).write.parquet(str(stage))
    [part] = glob.glob(str(stage / "part-*.parquet"))
    shutil.move(part, str(src_dir / "e0.parquet"))

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        out_dir = str(tmp_path / "out")
        q = (
            cusum_drift_stream(
                spark.readStream.schema(
                    "event_type string, day date, x long"
                ).parquet(str(src_dir)),
                {"t0": ref},
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old
            )

    got = spark.read.parquet(out_dir).orderBy("day").collect()
    assert [r["cusum_scaled"] for r in got] == expect


# ------------------------------------------- scene cuts on non-ASCII -------


def test_mm_scene_cuts_non_ascii_matches_oracle(spark, tmp_path):
    """Character convention on both engines: é (2-byte), € (3-byte),
    𝄞 (4-byte, astral) payloads must produce identical frame counts and
    cut positions in Spark (length+ascii) and DuckDB (length+ord)."""
    from conduit_connector_s3_iceberg_spark.operators.multimodal import (
        FRAME_STRIDE,
        mm_scene_cuts,
    )
    from conduit_connector_s3_iceberg_spark.plans.registry import QUERIES

    texts = [
        "é" * (FRAME_STRIDE * 3),             # BMP 2-byte, uniform sigs
        "€" * FRAME_STRIDE + "a" * FRAME_STRIDE * 2,  # cut at frame 2
        "𝄞" * (FRAME_STRIDE + 5),             # astral: strlen != length
        "日本語テキスト" * 40,                   # CJK mix
        "plain ascii " * 20,
        "x",                                   # single frame
    ]
    sf_dir = str(tmp_path / "sfna")
    spark.createDataFrame(
        [(i, t, len(t), "s") for i, t in enumerate(texts)],
        "doc_id bigint, text string, n_chars bigint, source string",
    ).coalesce(1).write.parquet(sf_dir + "/documents.parquet")

    got = {
        r["doc_id"]: (r["n_frames"], r["n_cuts"], r["mean_shot_frames"])
        for r in mm_scene_cuts(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(QUERIES["mm_scene_cuts"].oracle).fetchall()
    }
    assert got == want
    # the astral doc proves char (not byte) framing: 4-byte chars would
    # quadruple the frame count under strlen
    assert got[2][0] == -(-(FRAME_STRIDE + 5) // FRAME_STRIDE)


# ------------------------------------------ Bradley-Terry all-ties guard ---


def test_bradley_terry_all_ties_is_empty_not_zerodivision(spark, tmp_path):
    """All pairwise comparisons tie (every type has the same per-user
    mean) → the wins matrix is empty → empty result, no exception, and
    the oracle agrees."""
    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        events_bradley_terry,
    )
    from conduit_connector_s3_iceberg_spark.plans.registry import QUERIES

    sf_dir = str(tmp_path / "sfties")
    rows = []
    eid = 0
    for u in range(1, 4):
        for t in ("a", "b", "c"):
            eid += 1
            rows.append((eid, u, t, "2024-05-01 00:00:00", 7.0))
    spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, event_type string,"
        " ts string, value double",
    ).selectExpr(
        "event_id", "user_id", "event_type",
        "cast(ts as timestamp_ntz) as ts", "value",
    ).coalesce(1).write.parquet(sf_dir + "/events.parquet")

    out = events_bradley_terry(spark, sf_dir).collect()
    assert out == []
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    assert con.execute(QUERIES["events_bradley_terry"].oracle).fetchall() == []


# ------------------------------------------------- shared prefix sum -------


def test_global_prefix_sum_matches_single_window_spec(spark):
    from pyspark.sql.window import Window

    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        _global_prefix_sum,
        _global_rank,
    )

    df = spark.range(0, 997).select(
        (F.col("id") * 7919 % 997).alias("k"),
        (F.col("id") % 13 + 1).alias("w"),
    ).repartition(8)
    got = {
        r["k"]: (r["_p"],)
        for r in _global_prefix_sum(df, ["k"], "w", "_p").collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["k"]: (r["_p"],)
        for r in df.withColumn(
            "_p", F.coalesce(F.sum("w").over(w), F.lit(0)).cast("bigint")
        ).collect()
    }
    assert got == want

    rk = {r["k"]: r["_grank"] for r in _global_rank(df, ["k"]).collect()}
    want_rk = {
        r["k"]: r["_r"]
        for r in df.withColumn(
            "_r", F.row_number().over(Window.orderBy("k")).cast("bigint")
        ).collect()
    }
    assert rk == want_rk
