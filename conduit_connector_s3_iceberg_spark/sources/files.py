"""File and stream sources beyond the parquet warehouse (SURVEY.md §2C,
'Scans / sources' row).

The reference ingests exactly one wire format — JSON payload bytes conformed
to the table schema (``SparkDestinationStream.java:221-227``); its Spark
embed implies the full reader surface. Exposed here with schema-conformance
semantics matching the reference's FAILFAST contract.

Scale: all readers are plain DataSource scans — splittable (CSV/JSON split
by line, parquet by row-group), predicate/column pruning where the format
supports it. Schema inference is OFF on the hot paths: at 100 TB an
inference pass is a full extra scan, and drifting inferred types break
downstream plans. Callers pass explicit schemas; ``infer=True`` exists for
exploration only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    failfast: bool = True,
    multiline: bool = False,
) -> DataFrame:
    """JSON-lines scan. With a schema + ``failfast`` this is the batch form
    of the reference's insert parse: a record that cannot be coerced fails
    the job rather than silently nulling (PERMISSIVE) or dropping
    (DROPMALFORMED)."""
    reader = spark.read.option("multiLine", str(multiline).lower())
    if schema is not None:
        reader = reader.schema(schema)
        reader = reader.option("mode", "FAILFAST" if failfast else "PERMISSIVE")
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    delimiter: str = ",",
    failfast: bool = True,
) -> DataFrame:
    """CSV scan with explicit schema (no inference pass over the data)."""
    reader = (
        spark.read.option("header", str(header).lower()).option("sep", delimiter)
    )
    if schema is not None:
        reader = reader.schema(schema)
        reader = reader.option("mode", "FAILFAST" if failfast else "PERMISSIVE")
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def rate_stream(
    spark: SparkSession, rows_per_second: int = 1000, num_partitions: int | None = None
) -> DataFrame:
    """Synthetic benchmark stream (``rate`` source): (timestamp, value)
    rows at a fixed rate — the standard load generator for exercising the
    streaming operators without external infrastructure."""
    reader = spark.readStream.format("rate").option(
        "rowsPerSecond", str(rows_per_second)
    )
    if num_partitions is not None:
        reader = reader.option("numPartitions", str(num_partitions))
    return reader.load()


def read_binary(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-asset scan for multimodal ingestion (``binaryFile`` source):
    one row per file with ``(path, modificationTime, length, content:
    binary)`` — the ingest edge that feeds operators/multimodal.py
    (decode / feature-extract / frame-sample run downstream as
    mapInPandas stages over the ``content`` column).

    Scale: files are assigned to tasks by size bins (``maxPartitionBytes``
    applies), the scan never concatenates files, and ``glob`` +
    ``max_bytes`` prune at the LISTING stage — a 100 TB asset lake is
    filtered before a single content byte is read. Keep individual assets
    under a few hundred MB (one row must fit in task memory); bigger blobs
    belong in chunked columns written by the warehouse."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(df.length <= max_bytes)
    return df


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """ORC scan (columnar sibling of the parquet path — Spark's built-in
    vectorized ORC reader, same predicate-pushdown / column-pruning
    machinery). The stored schema, when given, is authoritative like the
    warehouse's parquet reads: added columns null-fill, dropped columns
    are not projected. Avro is NOT offered: the spark-avro datasource jar
    is absent from this environment (probed — see COVERAGE.md)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC write with optional hive partitioning — interop escape hatch for
    consumers standardized on ORC (Hive/Trino estates)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
