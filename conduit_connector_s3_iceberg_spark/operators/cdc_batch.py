"""CDC batch-collapse operators, oracle-checkable over the ``events`` table.

The reference applies change records one at a time — one Spark job and one
data file per record (``SparkDestinationStream.java:70-85,229-232``). The
idiomatic Spark form is: collapse each micro-batch to one row per key
(last-write-wins) and apply it with a single MERGE — these operators are
that collapse + apply logic expressed over a static table so the driver's
DuckDB oracle can check it. The live write path (real MERGE / Iceberg /
parquet copy-on-write) lives in :mod:`..writer`; Structured Streaming
ingestion in :mod:`..streaming`.

Scale: LWW-collapse is one window (or groupBy-max join) partitioned by key;
the apply is one shuffle-join on the key. No per-record jobs, no small
files: 10^6 records/epoch become exactly one commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

CUTOVER = "2024-01-08"  # base snapshot = week 1; ops stream = the rest


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return load_table(spark, sf_dir, "events")


def last_write_wins(df: DataFrame, keys: list[str], order: list[str]) -> DataFrame:
    """Collapse to one row per key: the latest by ``order`` (ties broken by
    the last order column, which must be unique). The core CDC pre-MERGE
    collapse (SURVEY.md §4 'custom work actually needed')."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


@query(
    "cdc_last_write_wins",
    oracle="""
    SELECT user_id, event_type, value AS last_value, ts AS last_ts,
           n_versions
    FROM (
      SELECT user_id, event_type, value, ts, event_id,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC
             ) AS rn,
             COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_versions
      FROM events
    )
    WHERE rn = 1
    """,
    doc="Last-write-wins collapse per (user_id, event_type): the micro-batch "
        "CDC dedup that turns N change records into one MERGE source row "
        "per key (replaces the reference's one-job-per-record loop).",
)
def cdc_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wc = Window.partitionBy("user_id", "event_type")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n_versions", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
            "n_versions",
        )
    )


@query(
    "cdc_apply_ops",
    oracle=f"""
    WITH base AS (
      SELECT user_id, value, ts FROM (
        SELECT user_id, value, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{CUTOVER}'
      ) WHERE rn = 1
    ), ops AS (
      SELECT user_id,
             CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
             value, ts
      FROM (
        SELECT user_id, event_type, value, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{CUTOVER}'
      ) WHERE rn = 1
    )
    SELECT coalesce(o.user_id, b.user_id) AS user_id,
           coalesce(o.value, b.value) AS value,
           coalesce(o.ts, b.ts) AS last_ts,
           CASE WHEN o.user_id IS NULL THEN 'unchanged'
                WHEN b.user_id IS NULL THEN 'inserted'
                ELSE 'updated' END AS change
    FROM base b FULL OUTER JOIN ops o ON b.user_id = o.user_id
    WHERE o.op IS NULL OR o.op <> 'delete'
    """,
    doc="Batched CDC apply (MERGE semantics, oracle-checkable): base "
        "snapshot ⟕⟖ LWW-collapsed ops; upserts update-or-insert, 'error' "
        "ops delete the key — the reference's CREATE/UPDATE/DELETE dispatch "
        "(SparkDestinationStream.java:94-108) as one atomic set operation, "
        "fixing its non-atomic update (README.md:74-77).",
)
def cdc_apply_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    cut = F.lit(CUTOVER).cast("timestamp")
    base = last_write_wins(
        ev.filter(F.col("ts") < cut), ["user_id"], ["ts", "event_id"]
    ).select("user_id", "value", "ts")
    ops = last_write_wins(
        ev.filter(F.col("ts") >= cut), ["user_id"], ["ts", "event_id"]
    ).select(
        "user_id",
        F.when(F.col("event_type") == "error", "delete")
        .otherwise("upsert")
        .alias("op"),
        "value",
        "ts",
    )
    b = base.alias("b")
    o = ops.alias("o")
    return (
        b.join(o, F.col("b.user_id") == F.col("o.user_id"), "full_outer")
        .filter(F.col("o.op").isNull() | (F.col("o.op") != "delete"))
        .select(
            F.coalesce(F.col("o.user_id"), F.col("b.user_id")).alias("user_id"),
            F.coalesce(F.col("o.value"), F.col("b.value")).alias("value"),
            F.coalesce(F.col("o.ts"), F.col("b.ts")).alias("last_ts"),
            F.when(F.col("o.user_id").isNull(), "unchanged")
            .when(F.col("b.user_id").isNull(), "inserted")
            .otherwise("updated")
            .alias("change"),
        )
    )


@query(
    "cdc_net_effect",
    oracle=f"""
    WITH base_keys AS (
      SELECT DISTINCT user_id FROM events WHERE ts < TIMESTAMP '{CUTOVER}'
    ), ops AS (
      SELECT user_id,
             CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
             value, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_ops,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id) AS BIGINT) AS n_deletes
      FROM events WHERE ts >= TIMESTAMP '{CUTOVER}'
    ), last_op AS (
      SELECT user_id, op, value, ts, n_ops, n_deletes
      FROM ops WHERE rn = 1
    )
    SELECT o.user_id,
           CASE WHEN o.op = 'delete' AND b.user_id IS NOT NULL THEN 'delete'
                WHEN o.op = 'delete' THEN 'none'
                WHEN b.user_id IS NOT NULL THEN 'update'
                ELSE 'insert' END AS net_op,
           CASE WHEN o.op = 'delete' THEN NULL ELSE o.value END AS final_value,
           o.ts AS last_ts,
           o.n_ops,
           o.n_ops - o.n_deletes AS n_upserts,
           o.n_deletes
    FROM last_op o LEFT JOIN base_keys b ON o.user_id = b.user_id
    """,
    doc="Net-effect compaction of a CDC op-log (Iceberg changelog "
        "'net_changes' semantics): per key, the whole ops window collapses "
        "to ONE net operation against the pre-window snapshot — "
        "insert+…+delete inside the window cancels to 'none', "
        "delete-of-existing stays 'delete', upsert maps to insert/update "
        "by prior existence. Downstream MERGE applies |keys| rows instead "
        "of |log| rows. One window over key-partitioned ops + one "
        "key-equi join against the distinct base-key set.",
)
def cdc_net_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    cut = F.lit(CUTOVER).cast("timestamp")
    base_keys = (
        ev.filter(F.col("ts") < cut).select("user_id").distinct().alias("b")
    )
    from pyspark.sql import Window

    wk = Window.partitionBy("user_id")
    wo = wk.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    last_op = (
        ev.filter(F.col("ts") >= cut)
        .select(
            "user_id",
            F.when(F.col("event_type") == "error", "delete")
            .otherwise("upsert")
            .alias("op"),
            "value",
            "ts",
            "event_id",
        )
        .withColumn("rn", F.row_number().over(wo))
        .withColumn("n_ops", F.count(F.lit(1)).over(wk).cast("bigint"))
        .withColumn(
            "n_deletes",
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0))
            .over(wk)
            .cast("bigint"),
        )
        .filter(F.col("rn") == 1)
        .alias("o")
    )
    return last_op.join(
        base_keys, F.col("o.user_id") == F.col("b.user_id"), "left"
    ).select(
        F.col("o.user_id").alias("user_id"),
        F.when(
            (F.col("op") == "delete") & F.col("b.user_id").isNotNull(), "delete"
        )
        .when(F.col("op") == "delete", "none")
        .when(F.col("b.user_id").isNotNull(), "update")
        .otherwise("insert")
        .alias("net_op"),
        F.when(F.col("op") == "delete", F.lit(None)).otherwise(F.col("value"))
        .alias("final_value"),
        F.col("ts").alias("last_ts"),
        "n_ops",
        (F.col("n_ops") - F.col("n_deletes")).alias("n_upserts"),
        "n_deletes",
    )
