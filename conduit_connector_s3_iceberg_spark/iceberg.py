"""Iceberg table store: the production twin of :class:`.writer.ParquetWarehouse`.

Same operation surface (read / append / delete-by-key / merge-apply /
compaction), executed as real Iceberg row-level DML through ``spark.sql`` —
what the reference's embedded Spark does via ``IcebergSparkSessionExtensions``
(``SparkUtils.java:45``), minus its flaws:

* deletes bind parameters via ``spark.sql(query, args=...)`` instead of
  string-inlined literals (reference uses jOOQ inlining,
  ``SparkDestinationStream.java:134``) — injection-safe by construction;
* composite keys AND all fields (reference bug: drops all but one,
  ``SparkDestinationStream.java:126-132``);
* update/apply is one atomic ``MERGE INTO`` (reference: non-atomic
  delete-then-insert, ``README.md:74-77``);
* appends are batched DataFrameWriterV2, not one file per record.

SQL builders are pure functions so the statement shapes are unit-tested in
this container (no Iceberg jar); execution methods require a session built
with ``build_session(config=...)`` against a real catalog.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

#: marker column carrying the per-row operation through a MERGE source view
OP_COL = "__op"


def _qident(name: str) -> str:
    """Backtick-quote one identifier part (`` ` `` doubled inside)."""
    return "`" + name.replace("`", "``") + "`"


def qualified(catalog: str, namespace: str, table: str) -> str:
    return ".".join(_qident(p) for p in (catalog, namespace, table))


def delete_sql(table_fqn: str, key_fields: list[str]) -> tuple[str, dict[str, Any]]:
    """``DELETE FROM t WHERE k0 = :k0 AND k1 = :k1`` with named parameter
    slots (values bound at execution — never spliced into the text)."""
    if not key_fields:
        raise ValueError("key has no fields")  # reference guard, `:119-122`
    preds = " AND ".join(
        f"{_qident(k)} = :k{i}" for i, k in enumerate(key_fields)
    )
    return f"DELETE FROM {table_fqn} WHERE {preds}", {}


def merge_apply_sql(
    table_fqn: str, source_view: str, key_fields: list[str], data_fields: list[str]
) -> str:
    """One atomic MERGE applying a collapsed CDC batch: delete rows whose
    final op is delete, update matched upserts, insert unmatched upserts.

    ``source_view`` columns: all table columns + :data:`OP_COL`.
    """
    on = " AND ".join(
        f"t.{_qident(k)} = s.{_qident(k)}" for k in key_fields
    )
    sets = ", ".join(f"t.{_qident(c)} = s.{_qident(c)}" for c in data_fields)
    cols = ", ".join(_qident(c) for c in (*key_fields, *data_fields))
    vals = ", ".join(f"s.{_qident(c)}" for c in (*key_fields, *data_fields))
    return (
        f"MERGE INTO {table_fqn} AS t\n"
        f"USING {_qident(source_view)} AS s\n"
        f"ON {on}\n"
        f"WHEN MATCHED AND s.{_qident(OP_COL)} = 'delete' THEN DELETE\n"
        f"WHEN MATCHED THEN UPDATE SET {sets}\n"
        f"WHEN NOT MATCHED AND s.{_qident(OP_COL)} <> 'delete' "
        f"THEN INSERT ({cols}) VALUES ({vals})"
    )


def merge_sync_sql(
    table_fqn: str, source_view: str, key_fields: list[str], data_fields: list[str]
) -> str:
    """Full-snapshot synchronization MERGE: make the target exactly equal
    the source relation — update matched, insert unmatched, and DELETE
    target rows absent from the source (``WHEN NOT MATCHED BY SOURCE``,
    Spark 4 / Iceberg MERGE surface). The one-statement form of
    ``table_diff`` + apply: the standard nightly reconcile against an
    authoritative snapshot when no change feed exists.
    """
    on = " AND ".join(
        f"t.{_qident(k)} = s.{_qident(k)}" for k in key_fields
    )
    sets = ", ".join(f"t.{_qident(c)} = s.{_qident(c)}" for c in data_fields)
    cols = ", ".join(_qident(c) for c in (*key_fields, *data_fields))
    vals = ", ".join(f"s.{_qident(c)}" for c in (*key_fields, *data_fields))
    return (
        f"MERGE INTO {table_fqn} AS t\n"
        f"USING {_qident(source_view)} AS s\n"
        f"ON {on}\n"
        f"WHEN MATCHED THEN UPDATE SET {sets}\n"
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})\n"
        f"WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )


def compact_sql(catalog: str, namespace: str, table: str) -> str:
    """Iceberg small-files compaction procedure (the cure for the
    reference's one-file-per-record write pattern)."""
    return (
        f"CALL {_qident(catalog)}.system.rewrite_data_files("
        f"table => '{namespace}.{table}')"
    )


def expire_snapshots_sql(
    catalog: str, namespace: str, table: str, older_than: str
) -> str:
    return (
        f"CALL {_qident(catalog)}.system.expire_snapshots("
        f"table => '{namespace}.{table}', older_than => TIMESTAMP '{older_than}')"
    )


class IcebergTableStore:
    """Executes the operation surface against a live Iceberg catalog."""

    def __init__(self, spark: SparkSession, catalog: str, namespace: str):
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace

    def _fqn(self, table: str) -> str:
        return qualified(self.catalog, self.namespace, table)

    def read(self, table: str) -> DataFrame:
        return self.spark.table(self._fqn(table))

    def schema(self, table: str):
        # reference: schema fetched from the table per insert (`:216`)
        return self.read(table).schema

    def append(self, table: str, df: DataFrame) -> None:
        df.writeTo(self._fqn(table)).append()

    def delete_by_key(self, table: str, key_map: dict[str, Any]) -> None:
        sql, _ = delete_sql(self._fqn(table), list(key_map))
        args = {f"k{i}": v for i, (_, v) in enumerate(key_map.items())}
        self.spark.sql(sql, args=args)

    def merge_apply(
        self, table: str, source: DataFrame, key_fields: list[str]
    ) -> None:
        """``source``: table-shaped rows + an :data:`OP_COL` column, already
        collapsed last-write-wins (see ``streaming.cdc.collapse_lww``)."""
        view = f"__cdc_batch_{table}"
        source.createOrReplaceTempView(view)
        data_fields = [
            f.name
            for f in self.schema(table).fields
            if f.name not in key_fields
        ]
        self.spark.sql(
            merge_apply_sql(self._fqn(table), view, key_fields, data_fields)
        )

    def compact(self, table: str) -> None:
        self.spark.sql(compact_sql(self.catalog, self.namespace, table))

    def expire_snapshots(self, table: str, older_than: str) -> None:
        self.spark.sql(
            expire_snapshots_sql(self.catalog, self.namespace, table, older_than)
        )
