"""Recursive time-series smoothing (north-star layer).

Holt's linear-trend exponential smoothing over the daily event-count
series — the classic capacity-forecast primitive (q02's regression fits
one global line; this tracks level + trend recursively and extrapolates).
The recursion is inherently sequential IN TIME but embarrassingly
parallel ACROSS series, so the idiomatic Spark shape is: build the dense
(series, day, count) grid distributed (one hash agg + a generate-series
fill), then run the T-step recursion per series inside one Arrow-batched
``applyInPandas`` group — the same split streaming uses (state per key,
sequence within key).

Determinism: the smoothing constants are alpha = gamma = 1/4, so every
update is ``trunc((x + 3*prev) / 4)`` — division by 4 is EXACT in binary
floating point and trunc-toward-zero matches across Python, Spark and
DuckDB; state stays in scaled integers (SCALE = 10^6) whose magnitudes
stay far below 2^53. The oracle replays the identical recursion as a
``WITH RECURSIVE`` CTE. No float accumulates across rows; the emitted
doubles are single exact-input IEEE divisions.

Reference scope note: the reference connector has no time-series surface;
this extends the north-star monitoring layer alongside
``events_cusum_changepoints`` and ``q02_forecast_revenue``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

TS_SCALE = 1_000_000
HOLT_HORIZON = 3  # forecast steps emitted


@query(
    "events_holt_smoothing",
    oracle=f"""
    WITH bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
      FROM events
    ), grid AS (
      SELECT e.event_type, CAST(u.g AS BIGINT) AS t
      FROM (SELECT DISTINCT event_type FROM events) e
      CROSS JOIN bounds b,
      UNNEST(range(0, date_diff('day', b.d0, b.d1) + 1)) AS u(g)
    ), counts AS (
      SELECT event_type,
             CAST(date_diff('day', b.d0, CAST(ts AS DATE)) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events CROSS JOIN bounds b
      GROUP BY event_type, date_diff('day', b.d0, CAST(ts AS DATE))
    ), series AS MATERIALIZED (
      SELECT g.event_type, g.t, COALESCE(c.x, 0) AS x
      FROM grid g LEFT JOIN counts c
        ON c.event_type = g.event_type AND c.t = g.t
    ), init AS (
      SELECT s0.event_type, CAST(1 AS BIGINT) AS t,
             s0.x * {TS_SCALE} AS l, (s1.x - s0.x) * {TS_SCALE} AS b
      FROM series s0 JOIN series s1
        ON s0.event_type = s1.event_type AND s0.t = 0 AND s1.t = 1
    ), state AS (
      WITH RECURSIVE rec AS (
        SELECT * FROM init
        UNION ALL
        SELECT r.event_type, r.t + 1,
               CAST(trunc((d.x * {TS_SCALE} + 3 * (r.l + r.b)) / 4.0)
                    AS BIGINT),
               CAST(trunc((
                 (CAST(trunc((d.x * {TS_SCALE} + 3 * (r.l + r.b)) / 4.0)
                       AS BIGINT) - r.l) + 3 * r.b) / 4.0) AS BIGINT)
        FROM rec r JOIN series d
          ON d.event_type = r.event_type AND d.t = r.t + 1
      )
      SELECT * FROM rec
    ), final AS (
      SELECT event_type, t, l, b,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY t DESC)
               AS rn
      FROM state
    )
    SELECT event_type,
           t + 1 AS n_days,
           l AS level_scaled, b AS trend_scaled,
           CAST(l AS DOUBLE) / {TS_SCALE} AS level,
           CAST(b AS DOUBLE) / {TS_SCALE} AS trend,
           CAST(l + 1 * b AS DOUBLE) / {TS_SCALE} AS forecast_1,
           CAST(l + 2 * b AS DOUBLE) / {TS_SCALE} AS forecast_2,
           CAST(l + 3 * b AS DOUBLE) / {TS_SCALE} AS forecast_3
    FROM final WHERE rn = 1
    """,
    doc="Holt linear-trend exponential smoothing of the daily event-count "
        "series (alpha = gamma = 1/4): level/trend tracked recursively "
        "over the dense day grid, extrapolated 3 steps. Sequential in "
        "time, parallel across series — the T-step recursion runs per "
        "series in one Arrow-batched applyInPandas group; the oracle "
        "replays it as a recursive CTE. Exact: /4 is binary-exact, state "
        "is scaled BIGINT, trunc matches across engines.",
)
def events_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("timestamp").cast("date").alias("day")
    )
    bounds = ev.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
            "d0",
        )
        .select(
            "event_type",
            "day",
            F.datediff("day", "d0").cast("bigint").alias("t"),
        )
    )
    counts = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    series = grid.join(counts, ["event_type", "day"], "left").select(
        "event_type", "t", F.coalesce(F.col("x"), F.lit(0)).cast("bigint").alias("x")
    )

    def holt(pdf):
        import math

        import pandas as pd

        pdf = pdf.sort_values("t")
        xs = [int(v) * TS_SCALE for v in pdf["x"]]
        et = pdf["event_type"].iloc[0]
        if len(xs) < 2:
            return pd.DataFrame(
                [],
                columns=[
                    "event_type", "n_days", "level_scaled", "trend_scaled",
                    "level", "trend", "forecast_1", "forecast_2", "forecast_3",
                ],
            )
        l = xs[0]
        b = xs[1] - xs[0]
        for x in xs[2:]:
            # /4 is exact in binary; trunc-toward-zero matches the oracle
            l_new = math.trunc((x + 3 * (l + b)) / 4)
            b = math.trunc(((l_new - l) + 3 * b) / 4)
            l = l_new
        row = (
            et,
            len(xs),
            l,
            b,
            l / TS_SCALE,
            b / TS_SCALE,
            (l + 1 * b) / TS_SCALE,
            (l + 2 * b) / TS_SCALE,
            (l + 3 * b) / TS_SCALE,
        )
        return pd.DataFrame(
            [row],
            columns=[
                "event_type", "n_days", "level_scaled", "trend_scaled",
                "level", "trend", "forecast_1", "forecast_2", "forecast_3",
            ],
        )

    return series.groupBy("event_type").applyInPandas(
        holt,
        schema="event_type string, n_days bigint, level_scaled bigint, "
        "trend_scaled bigint, level double, trend double, "
        "forecast_1 double, forecast_2 double, forecast_3 double",
    )
