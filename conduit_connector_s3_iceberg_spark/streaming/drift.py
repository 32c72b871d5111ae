"""Streaming CUSUM drift alarms via ``applyInPandasWithState``.

The batch query ``events_cusum_changepoints`` scans a complete history; a
monitoring pipeline needs the same statistic maintained ON the stream so a
persistent rate shift alarms within an epoch of crossing the threshold.
CUSUM's recursion S_d = max(0, S_{d-1} + x_d·SCALE − ref) is exactly
per-key state-carrying — the ``applyInPandasWithState`` shape — with ONE
BIGINT of state per series (plus the day cursor). The reference mean is
batch-trained (a frozen baseline passed in as a plain dict), which is the
operationally honest split: the monitored statistic updates online, the
baseline changes only when retrained.

Exactness: identical integer arithmetic to the batch query, so on a
bounded input the stream's final per-day alarm rows equal the batch
query's rows (asserted in tests/test_streaming.py). Rows inside one epoch
are processed in (day) order per key; state carries across epochs via the
checkpoint.

Scale: state is one row per SERIES (event types, sensors) — constant per
key, partitioned across executors; each epoch touches only series present
in the batch. Arrow-batched per key group, no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CUSUM_SCALE = 1_000_000  # must match plans.events.CUSUM_SCALE
CUSUM_H = 4

DRIFT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("day", T.DateType()),
        T.StructField("x", T.LongType()),
        T.StructField("cusum_scaled", T.LongType()),
        T.StructField("drifted", T.BooleanType()),
    ]
)

DRIFT_STATE_SCHEMA = T.StructType(
    [T.StructField("s", T.LongType())]
)


def cusum_drift_stream(
    daily: DataFrame, ref_scaled: dict[str, int]
) -> DataFrame:
    """daily(event_type, day, x) stream → per-day CUSUM rows with drift
    alarms, state = one BIGINT per series. ``ref_scaled`` maps series →
    round(SCALE * mean daily count) from the frozen training window."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout in tests
            state.remove()
            return
        s = state.get[0] if state.exists else 0
        ref = int(ref_scaled.get(event_type, 0))
        out_day, out_x, out_s, out_flag = [], [], [], []
        # Buffer EVERY Arrow chunk for the key before sorting: a key whose
        # epoch rows span multiple batches must fold in day order, not
        # arrival order — per-chunk sorts would interleave the CUSUM fold.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        rows = (
            pd.concat(chunks, ignore_index=True).sort_values("day")
            if chunks
            else pd.DataFrame(columns=["day", "x"])
        )
        for _, row in rows.iterrows():
            x = int(row["x"])
            s = max(0, s + x * CUSUM_SCALE - ref)
            out_day.append(row["day"])
            out_x.append(x)
            out_s.append(s)
            out_flag.append(s > CUSUM_H * ref)
        state.update((s,))
        yield pd.DataFrame(
            {
                "event_type": event_type,
                "day": out_day,
                "x": out_x,
                "cusum_scaled": out_s,
                "drifted": out_flag,
            }
        )

    return (
        daily.groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=DRIFT_OUTPUT_SCHEMA,
            stateStructType=DRIFT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --------------------------------------------------- streaming SPRT -------
#
# Streaming twin of the batch ``events_sprt_boundary``: Wald's
# sequential test is BORN sequential — the monitoring pipeline feeds
# daily (k successes, n trials) per series and the per-key state carries
# the cumulative LLR plus the latched decision (SPRT stops at the first
# boundary crossing; later days keep reporting the frozen verdict).
# The LLR constants (l1 per success, l0 per failure, the ±bound) are
# batch-trained from the frozen global totals and passed in — same
# operational split as the CUSUM reference mean. Integer arithmetic is
# identical to the batch oracle, so on a bounded input the stream's
# latched per-series verdicts equal the batch query's rows (asserted in
# tests/test_round10_ops.py across a two-epoch checkpoint restart).
# State: one BIGINT + the latched verdict per series.

SPRT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("day", T.DateType()),
        T.StructField("k", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("cum_scaled", T.LongType()),
        T.StructField("decision", T.StringType()),
        T.StructField("decision_day", T.DateType()),
    ]
)

SPRT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("s", T.LongType()),
        T.StructField("dec", T.StringType()),
        T.StructField("dday", T.DateType()),
    ]
)


def sprt_stream(
    daily: DataFrame, l1: int, l0: int, bound: int
) -> DataFrame:
    """daily(event_type, day, k, n) stream → per-day SPRT rows with the
    latched decision, state = (cum LLR, verdict, decision day) per
    series. ``l1``/``l0``/``bound`` are the 1e6-scaled Mitchell-log LLR
    constants from the frozen batch totals."""

    def update(key, pdfs, state):
        (event_type,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout in tests
            state.remove()
            return
        if state.exists:
            s, dec, dday = state.get
        else:
            s, dec, dday = 0, "continue", None
        cols = {k: [] for k in ("day", "k", "n", "cum", "dec", "dday")}
        # Buffer all chunks, then ONE day-ordered fold: SPRT's verdict is
        # latched at the first boundary crossing, so a key spanning
        # multiple Arrow batches in one epoch must not fold chunks in
        # arrival order — that could latch a different decision day than
        # the batch events_sprt_boundary this stream promises equality to.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        rows = (
            pd.concat(chunks, ignore_index=True).sort_values("day")
            if chunks
            else pd.DataFrame(columns=["day", "k", "n"])
        )
        for _, row in rows.iterrows():
            k, n = int(row["k"]), int(row["n"])
            s = s + k * l1 + (n - k) * l0
            if dec == "continue":
                if s >= bound:
                    dec, dday = "reject_null", row["day"]
                elif s <= -bound:
                    dec, dday = "accept_null", row["day"]
            cols["day"].append(row["day"])
            cols["k"].append(k)
            cols["n"].append(n)
            cols["cum"].append(s)
            cols["dec"].append(dec)
            cols["dday"].append(dday)
        state.update((s, dec, dday))
        yield pd.DataFrame(
            {
                "event_type": event_type,
                "day": cols["day"],
                "k": cols["k"],
                "n": cols["n"],
                "cum_scaled": cols["cum"],
                "decision": cols["dec"],
                "decision_day": cols["dday"],
            }
        )

    return daily.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=SPRT_OUTPUT_SCHEMA,
        stateStructType=SPRT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
