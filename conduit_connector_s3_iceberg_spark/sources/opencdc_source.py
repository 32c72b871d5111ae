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

    def writer(self, schema, overwrite: bool):
        return OpenCDCWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return OpenCDCStreamWriter(self.options, overwrite)


# -------------------------------------------------------------- write path --
#
# The reference is a DESTINATION connector: records arrive over the plugin
# wire and are written out (`SparkDestinationStream.java:229-232`). The
# read half above replays envelope files INTO Spark; this half is the
# complement — `df.write.format("opencdc")` / `writeStream.format("opencdc")`
# emits envelope files OTHER OpenCDC consumers (including this module's own
# reader) can drain. Commit protocol:
#
# * each task serializes its partition to a STAGING file (`_staging/…`,
#   task-unique name) and reports it in its commit message;
# * the driver-side commit renames staged files to their final
#   monotonically-increasing names (`cdc-<seq>-<i>.jsonl` — scanning the
#   directory for the current max sequence), honoring the stream reader's
#   monotonic-name contract; streaming commits embed the micro-batch id as
#   the sequence, making a replayed epoch overwrite its own files
#   (idempotent) instead of appending duplicates;
# * abort deletes the staged files — a failed job leaves the directory's
#   visible contents untouched (the same staged-rename discipline as
#   Spark's file sinks / Iceberg's snapshot commit).

from pyspark.sql.datasource import (  # noqa: E402  (late: keep read path first)
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _StagedFile(WriterCommitMessage):
    staged: str
    rows: int
    part: int  # input partition index: publish order == record order


def _row_to_envelope(row) -> str:
    d = {f: getattr(row, f) for f in _FIELDS}
    if d.get("metadata") is not None:
        d["metadata"] = dict(d["metadata"])
    return json.dumps(d, sort_keys=True)


def _stage_partition(path: str, iterator) -> _StagedFile:
    """Task side: write this partition's rows to a task-unique staging file."""
    import uuid

    from pyspark import TaskContext

    staging = os.path.join(path, "_staging")
    os.makedirs(staging, exist_ok=True)
    staged = os.path.join(staging, f"stage-{uuid.uuid4().hex}.jsonl")
    n = 0
    with open(staged, "w") as fh:
        for row in iterator:
            fh.write(_row_to_envelope(row) + "\n")
            n += 1
    ctx = TaskContext.get()
    part = ctx.partitionId() if ctx is not None else 0
    return _StagedFile(staged=staged, rows=n, part=part)


def _next_seq(path: str) -> int:
    """1 + the highest committed sequence number in ``path``."""
    best = -1
    for f in os.listdir(path):
        if f.startswith("cdc-") and f.endswith(".jsonl"):
            try:
                best = max(best, int(f.split("-")[1]))
            except ValueError:
                continue
    return best + 1


def _publish(path: str, messages, seq: int) -> None:
    """Driver side: rename staged files into their final monotonic names,
    in INPUT PARTITION order — the reader consumes files sorted by name,
    so publish order must equal record order or a consumer replaying one
    commit would see intra-commit CDC operations scrambled (caught by the
    sink→source→apply loop test: an update staged into a lower-sorting
    uuid than its insert would lose the LWW collapse)."""
    staged = sorted(
        ((m.part, m.staged) for m in messages if m is not None and m.rows > 0)
    )
    for i, (_part, src) in enumerate(staged):
        os.replace(src, os.path.join(path, f"cdc-{seq:012d}-{i:05d}.jsonl"))
    _discard(messages)


def _discard(messages) -> None:
    for m in messages or ():
        if m is not None and os.path.exists(m.staged):
            try:
                os.remove(m.staged)
            except OSError:
                pass


class OpenCDCWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("opencdc sink requires a 'path' option")
        self.overwrite = overwrite
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator):
        return _stage_partition(self.path, iterator)

    def commit(self, messages):
        if self.overwrite:
            for f in _envelope_files(self.path):
                os.remove(f)
        _publish(self.path, messages, _next_seq(self.path))

    def abort(self, messages):
        _discard(messages)


class OpenCDCStreamWriter(DataSourceStreamWriter):
    """Micro-batch sink: batch N commits as sequence N, so a replayed epoch
    re-publishes the same file names (overwrite = idempotent) rather than
    appending a second copy of the batch."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("opencdc sink requires a 'path' option")
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator):
        return _stage_partition(self.path, iterator)

    def commit(self, messages, batchId: int):
        for f in _envelope_files(self.path):
            base = os.path.basename(f)
            if base.startswith(f"cdc-{batchId:012d}-"):
                os.remove(f)  # replayed epoch: replace our own prior output
        _publish(self.path, messages, batchId)

    def abort(self, messages, batchId: int):
        _discard(messages)
