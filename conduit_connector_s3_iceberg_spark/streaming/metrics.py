"""In-flight pipeline metrics via ``df.observe`` + a StreamingQueryListener.

The batch side publishes its attrition funnel as a table
(``text_filter_cascade``); a continuously-running ingest needs the same
numbers per MICRO-BATCH, without a second pass over the data. Spark's
observation API is exactly that seam: ``df.observe(name, aggs...)``
evaluates the aggregates as a side-product of the batch's own execution
(zero extra scans, computed inside the same whole-stage-codegen pipeline),
and every epoch's values arrive on the driver in the
``QueryProgressEvent.progress.observedMetrics`` map.

The reference's per-record ack/error surface (`SparkDestinationStream.java`
ack-per-record) maps to exactly this: per-epoch admitted/rejected counts as
engine-level metrics rather than log lines.

Scale notes: observed aggregates are plain partial+final aggregations
folded alongside the query — constant driver-side state per epoch.
Listeners run on the driver event bus (async): consumers must treat
delivery as eventually-consistent, which :class:`AttritionListener`
handles by accumulating under a lock and exposing a wait helper.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

OBS_NAME = "ingest_attrition"


def gate_flags(quality_threshold: float) -> dict[str, Column]:
    """The streaming clean gates as named boolean flags (same expressions
    as ``clean_doc_stream``, factored so observation and filtering cannot
    drift apart)."""
    from ..operators.text import LANG_MARKERS, _hits, quality_col

    return {
        "lang": _hits(LANG_MARKERS["en"]) > 0,
        "quality": quality_col() >= quality_threshold,
    }


def observe_attrition(
    docs: DataFrame, flags: dict[str, Column], name: str = OBS_NAME
) -> DataFrame:
    """Attach per-gate pass counters to the stream. Returns the SAME rows —
    observation is a pass-through — with aggregates riding the epoch:
    ``n_rows`` plus one ``pass_<gate>`` counter per flag (counted
    independently, so per-rule attrition is reconstructable downstream).
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(flag.cast("long")).alias(f"pass_{g}") for g, flag in flags.items()
    ]
    return docs.observe(name, *aggs)


class AttritionListener(StreamingQueryListener):
    """Accumulates observed-metric rows per epoch from the driver event
    bus. Event delivery is async — :meth:`wait_for_total` polls until the
    accumulated row count reaches a target (or times out), the pattern a
    metrics exporter uses before publishing."""

    def __init__(self, name: str = OBS_NAME):
        self.name = name
        self._lock = threading.Lock()
        self.epochs: list[dict] = []

    # --- StreamingQueryListener interface -------------------------------
    def onQueryStarted(self, event):  # noqa: N802 (Spark API casing)
        pass

    def onQueryProgress(self, event):  # noqa: N802
        row = event.progress.observedMetrics.get(self.name)
        if row is not None:
            with self._lock:
                self.epochs.append(row.asDict())

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    # --- consumer helpers ----------------------------------------------
    def totals(self) -> dict:
        with self._lock:
            out: dict = {}
            for e in self.epochs:
                for k, v in e.items():
                    out[k] = out.get(k, 0) + (v or 0)
            return out

    def wait_for_total(self, key: str, target: int, timeout_s: float = 30.0) -> dict:
        import time

        deadline = time.time() + timeout_s
        while time.time() < deadline:
            t = self.totals()
            if t.get(key, 0) >= target:
                return t
            time.sleep(0.2)
        return self.totals()
