"""The OpenCDC Python DataSource (Spark 4 pluggable-source surface):
batch read, operation pushdown, and the streaming reader feeding the
standard CDC apply."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from conduit_connector_s3_iceberg_spark.sources.opencdc_source import (
    ENVELOPE_DDL,
    OpenCDCDataSource,
)


def _env(position, op, key=None, after=None):
    return {
        "position": position,
        "operation": op,
        "key": json.dumps(key) if key is not None else None,
        "before": None,
        "after": json.dumps(after) if after is not None else None,
        "metadata": {"src": "test"},
    }


def _write_jsonl(path, envs):
    with open(path, "w") as fh:
        for e in envs:
            fh.write(json.dumps(e) + "\n")


def test_opencdc_batch_read_and_schema(spark, tmp_path):
    spark.dataSource.register(OpenCDCDataSource)
    src = tmp_path / "cdc"
    src.mkdir()
    _write_jsonl(
        src / "a.jsonl",
        [
            _env("p1", "create", {"id": 1}, {"id": 1, "name": "a", "qty": 5}),
            _env("p2", "delete", {"id": 9}),
        ],
    )
    _write_jsonl(
        src / "b.jsonl",
        [_env("p3", "update", {"id": 1}, {"id": 1, "name": "a2", "qty": 6})],
    )
    df = spark.read.format("opencdc").option("path", str(src)).load()
    assert df.schema["metadata"].dataType == T.MapType(
        T.StringType(), T.StringType()
    )
    rows = {r["position"]: r for r in df.collect()}
    assert set(rows) == {"p1", "p2", "p3"}
    assert rows["p2"]["operation"] == "delete" and rows["p2"]["after"] is None
    assert json.loads(rows["p3"]["after"])["name"] == "a2"
    assert rows["p1"]["metadata"]["src"] == "test"
    # one partition per file — ingest parallelism tracks the file count
    assert df.rdd.getNumPartitions() == 2


def test_opencdc_operation_filter_pushdown(spark, tmp_path):
    spark.dataSource.register(OpenCDCDataSource)
    src = tmp_path / "cdc2"
    src.mkdir()
    _write_jsonl(
        src / "a.jsonl",
        [
            _env("p1", "create", {"id": 1}, {"id": 1}),
            _env("p2", "delete", {"id": 1}),
            _env("p3", "create", {"id": 2}, {"id": 2}),
        ],
    )
    df = (
        spark.read.format("opencdc")
        .option("path", str(src))
        .load()
        .filter(F.col("operation") == "delete")
    )
    got = [r["position"] for r in df.collect()]
    assert got == ["p2"]


def test_opencdc_stream_feeds_cdc_apply(spark, tmp_path):
    """The streaming reader drains envelope files across epochs and the
    standard CDC apply produces the same table as the batch path."""
    from conduit_connector_s3_iceberg_spark.streaming.cdc import (
        apply_cdc_stream,
    )
    from conduit_connector_s3_iceberg_spark.writer import ParquetWarehouse

    spark.dataSource.register(OpenCDCDataSource)
    src = tmp_path / "cdc3"
    src.mkdir()
    _write_jsonl(
        src / "0.jsonl",
        [
            _env("p1", "create", {"id": 1}, {"id": 1, "name": "a", "qty": 5}),
            _env("p2", "create", {"id": 2}, {"id": 2, "name": "b", "qty": 7}),
        ],
    )
    _write_jsonl(
        src / "1.jsonl",
        [
            _env("p3", "update", {"id": 1}, {"id": 1, "name": "a2", "qty": 6}),
            _env("p4", "delete", {"id": 2}),
        ],
    )
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("qty", T.IntegerType(), True),
        ]
    )
    wh = ParquetWarehouse(spark, str(tmp_path / "cdc3_wh"))
    wh.create_table("t", schema)
    stream = (
        spark.readStream.format("opencdc").option("path", str(src)).load()
    )
    q = apply_cdc_stream(
        stream, wh, "t", ["id"], str(tmp_path / "cdc3_ckpt")
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in wh.read("t").collect())
    assert got == [(1, "a2", 6)]


def test_opencdc_stream_offset_is_filename_not_count(tmp_path):
    """Offsets are the last consumed file NAME, not an index count: a
    late file sorting before consumed names must not shift the slice and
    cause an old file to be re-read (at-most-once per file is preserved;
    the out-of-order file is skipped deterministically — r3 ADVICE)."""
    from conduit_connector_s3_iceberg_spark.sources.opencdc_source import (
        OpenCDCStreamReader,
    )

    src = tmp_path / "ooo"
    src.mkdir()
    _write_jsonl(
        src / "b.jsonl",
        [_env("p1", "create", {"id": 1}, {"id": 1, "name": "a", "qty": 1})],
    )
    rdr = OpenCDCStreamReader({"path": str(src)})
    start = rdr.initialOffset()
    rows1, off1 = rdr.read(start)
    assert len(list(rows1)) == 1
    assert off1["last_file"].endswith("b.jsonl")

    # a late file that sorts BEFORE b, plus a genuinely new file after it
    _write_jsonl(
        src / "a.jsonl",
        [_env("p2", "create", {"id": 9}, {"id": 9, "name": "x", "qty": 9})],
    )
    _write_jsonl(
        src / "c.jsonl",
        [_env("p3", "create", {"id": 2}, {"id": 2, "name": "c", "qty": 2})],
    )
    rows2, off2 = rdr.read(off1)
    keys = [r[2] for r in rows2]  # position 2 = key json
    assert keys == ['{"id": 2}']  # c consumed once; b NOT re-read; a skipped
    assert off2["last_file"].endswith("c.jsonl")

    # replay window (readBetweenOffsets) honors the same name bounds
    replay = list(rdr.readBetweenOffsets(off1, off2))
    assert [r[2] for r in replay] == ['{"id": 2}']
    # empty source advance: offset sticks, nothing read
    rows3, off3 = rdr.read(off2)
    assert list(rows3) == [] and off3 == off2


def _env_rows(n, op="create", start=0):
    return [
        {
            "position": f"p{start + i:04d}",
            "operation": op,
            "key": json.dumps({"id": start + i}),
            "before": None,
            "after": json.dumps({"id": start + i, "v": f"v{start + i}"}),
            "metadata": {"src": "test"},
        }
        for i in range(n)
    ]


def test_opencdc_batch_write_round_trip_and_append(spark, tmp_path):
    spark.dataSource.register(OpenCDCDataSource)
    out = tmp_path / "sink"
    df = spark.createDataFrame(_env_rows(6), schema=ENVELOPE_DDL)
    df.write.format("opencdc").option("path", str(out)).mode("append").save()
    df2 = spark.createDataFrame(_env_rows(3, start=6), schema=ENVELOPE_DDL)
    df2.write.format("opencdc").option("path", str(out)).mode("append").save()

    files = sorted(p.name for p in out.glob("cdc-*.jsonl"))
    assert files, "no committed files"
    # second commit's sequence sorts strictly after the first's
    seqs = sorted({f.split("-")[1] for f in files})
    assert len(seqs) == 2 and seqs[0] < seqs[1]
    # no staging leftovers
    assert not list((out / "_staging").glob("*"))

    back = spark.read.format("opencdc").option("path", str(out)).load()
    assert back.count() == 9
    assert sorted(r["position"] for r in back.collect()) == [
        f"p{i:04d}" for i in range(9)
    ]


def test_opencdc_batch_overwrite_replaces_contents(spark, tmp_path):
    spark.dataSource.register(OpenCDCDataSource)
    out = tmp_path / "sink"
    spark.createDataFrame(_env_rows(5), schema=ENVELOPE_DDL).write.format(
        "opencdc"
    ).option("path", str(out)).mode("append").save()
    spark.createDataFrame(_env_rows(2, start=100), schema=ENVELOPE_DDL).write.format(
        "opencdc"
    ).option("path", str(out)).mode("overwrite").save()
    back = spark.read.format("opencdc").option("path", str(out)).load()
    assert sorted(r["position"] for r in back.collect()) == ["p0100", "p0101"]


def test_opencdc_stream_write_is_idempotent_per_batch(spark, tmp_path):
    spark.dataSource.register(OpenCDCDataSource)
    src = tmp_path / "src"
    src.mkdir()
    (src / "a-0001.jsonl").write_text(
        "\n".join(json.dumps(r) for r in _env_rows(4)) + "\n"
    )
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    q = (
        spark.readStream.format("opencdc")
        .option("path", str(src))
        .load()
        .writeStream.format("opencdc")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    back = spark.read.format("opencdc").option("path", str(out)).load()
    assert back.count() == 4

    # simulate an epoch replay: re-publishing batch 0 must REPLACE batch-0
    # files, not append a second copy
    from conduit_connector_s3_iceberg_spark.sources.opencdc_source import (
        OpenCDCStreamWriter,
        _stage_partition,
    )
    from pyspark.sql import Row

    w = OpenCDCStreamWriter({"path": str(out)}, overwrite=False)
    rows = [Row(**r) for r in _env_rows(4)]
    msg = _stage_partition(str(out), iter(rows))
    w.commit([msg], 0)
    back2 = spark.read.format("opencdc").option("path", str(out)).load()
    assert back2.count() == 4


def test_opencdc_full_loop_sink_to_source_to_apply(spark, tmp_path):
    """The connector round trip the reference performs over gRPC, here
    over files: envelopes WRITTEN by the opencdc sink are DRAINED by the
    opencdc stream source and APPLIED by the CDC layer — producing the
    same table as applying the originals directly."""
    from conduit_connector_s3_iceberg_spark.streaming.cdc import (
        apply_cdc_stream,
    )
    from conduit_connector_s3_iceberg_spark.writer import ParquetWarehouse

    spark.dataSource.register(OpenCDCDataSource)
    envelopes = [
        _env("p1", "create", {"id": 1}, {"id": 1, "name": "a", "qty": 5}),
        _env("p2", "create", {"id": 2}, {"id": 2, "name": "b", "qty": 7}),
        _env("p3", "update", {"id": 1}, {"id": 1, "name": "a2", "qty": 6}),
        _env("p4", "delete", {"id": 2}),
    ]
    # 1. a producer emits envelopes through the opencdc SINK
    hub = tmp_path / "hub"
    spark.createDataFrame(envelopes, schema=ENVELOPE_DDL).write.format(
        "opencdc"
    ).option("path", str(hub)).mode("append").save()

    # 2. the consumer drains the hub via the opencdc STREAM SOURCE and
    # applies through the standard CDC layer
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("qty", T.IntegerType(), True),
        ]
    )
    wh = ParquetWarehouse(spark, str(tmp_path / "loop_wh"))
    wh.create_table("t", schema)
    stream = (
        spark.readStream.format("opencdc").option("path", str(hub)).load()
    )
    q = apply_cdc_stream(stream, wh, "t", ["id"], str(tmp_path / "loop_ckpt"))
    q.awaitTermination(120)

    assert [(r["id"], r["name"], r["qty"]) for r in wh.read("t").orderBy("id").collect()] == [
        (1, "a2", 6)
    ]
