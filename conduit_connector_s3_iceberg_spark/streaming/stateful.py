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
    events: DataFrame, idle_timeout_ms: int = 3_600_000
) -> DataFrame:
    """events(user_id, ts, value, ...) stream → running totals per user,
    emitted each epoch the user is active; state dropped (and flushed with
    ``expired=true``) after ``idle_timeout_ms`` without activity."""

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
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
