"""Streaming per-source admission quota via ``transformWithState``.

Spark 4's successor to ``applyInPandasWithState`` (SPARK-49564): state is
declared as named, schema'd primitives (ValueState/ListState/MapState) on a
``StatefulProcessor`` object instead of one opaque tuple, and the runtime
can evolve/inspect it. This module covers that API surface with the
streaming twin of ``corpus_domain_cap``: each source may admit at most
``cap`` documents over the stream's lifetime; later documents are emitted
with ``admitted=false`` (audit row) so the sink can route rejects.

Scale: state is ONE BIGINT per source key, partitioned across executors by
the grouping key — constant-size per key, unbounded key spaces bounded by
TTL (``ttl_ms``). Admission order inside a micro-batch follows arrival
(file/partition order), giving deterministic replay from a checkpoint.
``timeMode="None"``: no timers, so bounded (availableNow) runs terminate
cleanly — the same caveat documented in ``stateful.py``.

Requires the RocksDB state store provider (transformWithState's backing
store); tests set ``spark.sql.streaming.stateStore.providerClass``.

Environment note (2026-08-13): transformWithState's Python state-server
protocol needs the ``google.protobuf`` runtime (pyspark ships only the
generated ``StateMessage_pb2``), which this container lacks and cannot
install — the TWS query crashes at worker init with
``ImportError: cannot import name 'descriptor' from 'google.protobuf'``.
``tws_runtime_available()`` gates it; ``per_source_quota_stream_legacy``
is the executable twin on ``applyInPandasWithState`` with identical
output, and the test suite runs the twin everywhere + the TWS form
wherever protobuf exists.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

QUOTA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("quota_rank", T.LongType()),
        T.StructField("admitted", T.BooleanType()),
    ]
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class SourceQuotaProcessor(StatefulProcessor):
    """Admit the first ``cap`` documents per source; flag the rest."""

    def __init__(self, cap: int, ttl_ms: int | None = None):
        self.cap = cap
        self.ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._admitted = handle.getValueState(
            "admitted_count", "count BIGINT", self.ttl_ms
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        prior = self._admitted.get()
        count = int(prior[0]) if prior is not None else 0
        for pdf in rows:
            n = len(pdf)
            ranks = pd.RangeIndex(count + 1, count + n + 1)
            yield pd.DataFrame(
                {
                    "source": pdf["source"].values,
                    "doc_id": pdf["doc_id"].values,
                    "quota_rank": ranks.to_numpy(),
                    "admitted": ranks.to_numpy() <= self.cap,
                }
            )
            count += n
        self._admitted.update((count,))

    def close(self) -> None:
        pass


def tws_runtime_available() -> bool:
    """True when the protobuf runtime transformWithState's Python state
    protocol needs is importable (see module environment note)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def per_source_quota_stream(
    docs: DataFrame, cap: int, ttl_ms: int | None = None
) -> DataFrame:
    """docs(source, doc_id, ...) stream → every document with its running
    per-source rank and an admitted flag (rank <= cap). One BIGINT of state
    per source; ``ttl_ms`` evicts idle sources' counters."""
    return (
        docs.select("source", "doc_id")
        .groupBy("source")
        .transformWithStateInPandas(
            statefulProcessor=SourceQuotaProcessor(cap, ttl_ms),
            outputStructType=QUOTA_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )


def per_source_quota_stream_legacy(docs: DataFrame, cap: int) -> DataFrame:
    """Identical semantics on ``applyInPandasWithState`` (the pre-Spark-4
    stateful API): the executable twin where the TWS protobuf runtime is
    unavailable. Same one-BIGINT-per-source state, same output schema."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    state_schema = T.StructType([T.StructField("count", T.LongType())])

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        count = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n = len(pdf)
            ranks = pd.RangeIndex(count + 1, count + n + 1)
            yield pd.DataFrame(
                {
                    "source": pdf["source"].values,
                    "doc_id": pdf["doc_id"].values,
                    "quota_rank": ranks.to_numpy(),
                    "admitted": ranks.to_numpy() <= cap,
                }
            )
            count += n
        state.update((count,))

    return (
        docs.select("source", "doc_id")
        .groupBy("source")
        .applyInPandasWithState(
            update,
            outputStructType=QUOTA_OUTPUT_SCHEMA,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
