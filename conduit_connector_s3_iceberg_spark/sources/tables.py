"""Parquet table source for the driver-generated warehouse.

The engine's scan layer. Tables live one-parquet-per-table under a scale
directory (TESTDATA.md); on a real deployment these would be Iceberg tables
resolved through the configured catalog (see ``session.build_session``) —
the read surface is identical (``spark.read`` / ``spark.table``), so every
query in :mod:`..plans` works against either.

Scale: ``spark.read.parquet`` is a DataSourceV1 parquet scan with full
predicate pushdown + column pruning; Catalyst prunes columns to the
projection and pushes filters to the row-group level. No caching here —
callers decide (a 100 TB scan must never be ``.cache()``d blindly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Resolved-relation cache: creating a parquet relation reads file footers
# on the driver, and the warehouse tables are immutable within a session —
# re-resolving them per query is pure planning overhead (the local-mode
# analogue of a catalog metadata cache; Iceberg caches table metadata the
# same way). Keyed by session so concurrent/stopped sessions never share
# JVM-bound plan objects.
_RELATION_CACHE: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one warehouse table. Pushdown-friendly: callers filter/select on
    the returned DataFrame and Catalyst pushes into the parquet scan.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark 4
    refuses to read natively: read it as raw int64 nanos (legacy conf) and
    convert to a microsecond TimestampType column (values in the warehouse
    are µs-aligned, so the floor division is lossless).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    key = (spark, sf_dir, name)
    cached = _RELATION_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            # integer div truncates ns → µs exactly like DuckDB's ns→µs cast
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _RELATION_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all warehouse tables as temp views for ``spark.sql`` use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
