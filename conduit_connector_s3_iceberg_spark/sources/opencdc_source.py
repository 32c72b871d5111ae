"""OpenCDC envelope files as a first-class pluggable Spark source via the
Python DataSource API (Spark 4) — ``spark.read.format("opencdc")``.

The reference IS a connector: a gRPC plugin process receiving OpenCDC
records (``src/main/proto/opencdc.proto:51-97``) and applying them through
an embedded Spark. This module re-expresses that connector surface the way
Spark 4 natively plugs sources in: a registered ``DataSource`` whose reader
yields the same envelope rows ``streaming/cdc.py`` consumes
(:data:`~..functions.codec.CDC_ENVELOPE` — position/operation/key/before/
after/metadata), in batch and in streaming form.

Scale & honesty notes:

* **Partitioning**: one input partition per envelope file — Spark schedules
  files across executors exactly like its built-in file sources, so ingest
  parallelism tracks the file count.
* **Pushdown**: ``pushFilters`` accepts ``operation = '<op>'`` equality
  filters (Spark 4.1 Python-source pushdown) — a deletes-only or
  upserts-only consumer skips non-matching records at the source, before
  anything reaches the JVM.
* **This is the SLOW path by design**: rows cross the Python↔JVM boundary
  via Arrow. The hot ingest path remains the built-in JSON reader
  (``read_cdc_stream``) — this source exists to demonstrate the pluggable
  connector surface itself (custom wire formats, paginated APIs, queue
  drains) with the same envelope contract.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
)

ENVELOPE_DDL = (
    "position string, operation string, key string, before string, "
    "after string, metadata map<string,string>"
)

_FIELDS = ("position", "operation", "key", "before", "after", "metadata")


def _envelope_files(path: str) -> list[str]:
    """Deterministic (sorted) list of envelope files under ``path``."""
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith((".jsonl", ".json"))
    )


def _parse_line(line: str):
    d = json.loads(line)
    return tuple(d.get(f) for f in _FIELDS)


@dataclass
class _FilePartition(InputPartition):
    file: str


class OpenCDCReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("opencdc source requires a 'path' option")
        self.op_filter: str | None = None

    def pushFilters(self, filters):
        """Accept operation-equality pushdown; everything else stays in
        Spark. Returns the filters we could NOT handle (API contract)."""
        unsupported = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("operation",):
                self.op_filter = f.value
            else:
                unsupported.append(f)
        return unsupported

    def partitions(self):
        return [_FilePartition(f) for f in _envelope_files(self.path)]

    def read(self, partition: _FilePartition):
        with open(partition.file) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                row = _parse_line(line)
                if self.op_filter is not None and row[1] != self.op_filter:
                    continue
                yield row


class OpenCDCStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch form: offset = the NAME of the last consumed file (files
    are consumed in sorted-name order); each batch drains the files whose
    names sort strictly after the offset. Tracking the name — not a count —
    means a late-arriving file that sorts before already-consumed names is
    skipped deterministically rather than silently shifting the slice and
    re-reading old files (producers must write monotonically-named files,
    the same contract as the built-in file stream source's log). The
    simple-reader API re-reads from the driver on replay, keeping the
    source exactly-once w.r.t. the checkpointed offset."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("opencdc source requires a 'path' option")

    def initialOffset(self):
        return {"last_file": ""}

    @staticmethod
    def _after(files, offset):
        last = offset.get("last_file", "")
        return [f for f in files if f > last]

    def read(self, start):
        files = self._after(_envelope_files(self.path), start)
        rows = []
        for f in files:
            with open(f) as fh:
                rows.extend(
                    _parse_line(ln) for ln in fh if ln.strip()
                )
        end = {"last_file": files[-1] if files else start.get("last_file", "")}
        return iter(rows), end

    def readBetweenOffsets(self, start, end):
        files = _envelope_files(self.path)
        last_start = start.get("last_file", "")
        last_end = end.get("last_file", "")
        rows = []
        for f in files:
            if last_start < f <= last_end:
                with open(f) as fh:
                    rows.extend(_parse_line(ln) for ln in fh if ln.strip())
        return iter(rows)

    def commit(self, end):
        pass  # offsets live in the stream checkpoint; nothing to clean up


class OpenCDCDataSource(DataSource):
    """``spark.read.format("opencdc").option("path", dir).load()`` after
    ``spark.dataSource.register(OpenCDCDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "opencdc"

    def schema(self) -> str:
        return ENVELOPE_DDL

    def reader(self, schema):
        return OpenCDCReader(self.options)

    def simpleStreamReader(self, schema):
        return OpenCDCStreamReader(self.options)
