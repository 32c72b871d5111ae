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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one warehouse table. Pushdown-friendly: callers filter/select on
    the returned DataFrame and Catalyst pushes into the parquet scan."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all warehouse tables as temp views for ``spark.sql`` use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
