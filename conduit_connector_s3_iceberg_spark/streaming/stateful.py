"""Custom stateful streaming operator via ``applyInPandasWithState``.

The escape hatch for semantics the built-in windowed aggregations can't
express (SURVEY.md §2C 'UDF surface'): arbitrary per-key state carried
across micro-batches, Arrow-batched (pandas) on the Python side — the
sanctioned custom-stateful path in Structured Streaming.

Operator here: **running per-user totals** — every epoch emits each active
user's cumulative event count / value sum / last-seen timestamp. This is
the stream twin of ``q24_user_activity`` restricted to running totals, and
the canonical shape for e.g. running token counts per document source in a
training-data pipeline.

Scale: state is partitioned by the grouping key across executors; each
micro-batch touches only keys present in the batch (plus timed-out keys).
Arrow transfer batches rows per key-group — no per-row Python overhead.
State eviction: ``GroupStateTimeout.ProcessingTimeTimeout`` with an
``idle_timeout_ms`` — an idle key's state is dropped and its final totals
emitted with ``expired=true``, bounding state size on an unbounded key
space (the equivalent of a watermark for this operator).

Caveat (why ``idle_timeout_ms=None`` exists): with ProcessingTimeTimeout
the availableNow executor keeps constructing timeout-check micro-batches
after the input is drained, so such a query NEVER self-terminates —
``processAllAvailable``/``awaitTermination`` on a bounded input hang until
their own timeout. Bounded/batch-style runs (tests, backfills) should pass
``idle_timeout_ms=None`` → ``NoTimeout``: state then lives for the query's
lifetime, which on a bounded input is exactly the batch semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("expired", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def running_user_totals(
    events: DataFrame, idle_timeout_ms: int | None = 3_600_000
) -> DataFrame:
    """events(user_id, ts, value, ...) stream → running totals per user,
    emitted each epoch the user is active; state dropped (and flushed with
    ``expired=true``) after ``idle_timeout_ms`` without activity
    (``None`` disables eviction — see module caveat)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, s, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "sum_value": [s],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                    "expired": [True],
                }
            )
            return
        n, s, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
        state.update((n, s, last_us))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [s],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
                "expired": [False],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if idle_timeout_ms is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )


# --------------------------------------------------- streaming anomaly flag
#
# Stream twin of plans/events.py::events_anomaly_zscore — same cleared-
# fraction integer test (x*n - s1)^2 > 4*(n*s2 - s1^2), but the per-user
# history (n, s1, s2 over per-epoch event counts) lives in group state
# instead of a window, so each micro-batch is flagged against everything
# seen before it without recomputing history. All state is three BIGINTs
# per user — constant-size, no raw retention — and the flag math is exact
# integers end-to-end (bit-identical to the batch query's discipline).

ANOMALY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("epoch_count", T.LongType()),
        T.StructField("n_prior", T.LongType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)

ANOMALY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s1", T.LongType()),
        T.StructField("s2", T.LongType()),
    ]
)


def anomaly_flags(
    events: DataFrame, idle_timeout_ms: int | None = 3_600_000
) -> DataFrame:
    """events(user_id, ...) stream → one row per active user per epoch,
    flagging epochs whose event count exceeds mean + 2*sigma of that user's
    prior epochs (exact integer test; needs >= 2 prior observations).
    ``idle_timeout_ms=None`` disables eviction — see module caveat."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, s1, s2 = state.get if state.exists else (0, 0, 0)
        x = sum(len(pdf) for pdf in pdfs)
        dev = x * n - s1
        flag = bool(
            n >= 2 and dev > 0 and dev * dev > 4 * (n * s2 - s1 * s1)
        )
        state.update((n + 1, s1 + x, s2 + x * x))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "epoch_count": [x],
                "n_prior": [n],
                "is_anomaly": [flag],
            }
        )

    return (
        events.select("user_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=ANOMALY_OUTPUT_SCHEMA,
            stateStructType=ANOMALY_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if idle_timeout_ms is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )
