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
    # ONE corpus pass: the (type, day) count frame is series-sized; bounds,
    # the type list, and the dense grid all derive from it, so events is
    # never rescanned (scan_count.py: 6 reads -> 1)
    counts = (
        ev.groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
        .localCheckpoint(eager=False)
    )
    bounds = counts.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = (
        counts.select("event_type")
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


# ------------------------------------------------ Markov power iteration ---
#
# The stationary behavior of the user journey: quantize the row-stochastic
# transition matrix over event types once (round(S*c/rowtotal) — the
# lm/graph discipline), then run K synchronous power-iteration steps
# r' = r·P entirely in scaled BIGINT — sum_u r(u)*p(u,v) div S. The state
# space is the event-type vocabulary (bounded), so every frame after the
# transition count is metadata-sized; the only corpus-scale work is the
# one lag-window pass that counts transitions. Deterministic: integer
# sums are associative; the quantization drift (row sums a few ulp-units
# off S) is identical in both engines. Emitted as the K-step iterate, not
# a fixpoint claim.

MK_SCALE = 1_000_000_000
MK_ITERS = 8


def _mk_oracle() -> str:
    steps = []
    for k in range(1, MK_ITERS + 1):
        p = k - 1
        steps.append(f"""
    r{k} AS MATERIALIZED (
      SELECT m.dst AS state,
             CAST(SUM(r.mass * m.p_scaled) // {MK_SCALE} AS BIGINT) AS mass
      FROM r{p} r JOIN model m ON m.src = r.state
      GROUP BY m.dst
    )""")
    return f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ), c AS (
      SELECT prev AS src, event_type AS dst, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type
    ), rt AS (
      SELECT src, CAST(SUM(n) AS BIGINT) AS total FROM c GROUP BY src
    ), model AS MATERIALIZED (
      SELECT c.src, c.dst,
             CAST(round({MK_SCALE} * c.n / rt.total) AS BIGINT) AS p_scaled
      FROM c JOIN rt USING (src)
    ), states AS (
      SELECT src AS state FROM rt
    ), r0 AS (
      SELECT state,
             CAST({MK_SCALE} // (SELECT COUNT(*) FROM states) AS BIGINT)
               AS mass
      FROM states
    ),{','.join(steps)}
    SELECT f.state, f.mass AS stationary_scaled,
           CAST(f.mass AS DOUBLE) / {MK_SCALE} AS stationary,
           CAST(e.n_events AS BIGINT) AS n_events,
           CAST(e.n_events AS DOUBLE)
             / (SELECT COUNT(*) FROM events) AS empirical_share
    FROM r{MK_ITERS} f
    JOIN (SELECT event_type, COUNT(*) AS n_events FROM events
          GROUP BY event_type) e
      ON e.event_type = f.state
    """


@query(
    "events_markov_stationary",
    oracle=_mk_oracle(),
    doc=f"Markov power iteration over the user-journey transition chain: "
        f"the row-stochastic event-type matrix quantized once to scaled "
        f"BIGINT, then {MK_ITERS} synchronous r' = r·P steps in pure "
        f"integer arithmetic (sum(r·p) div S) — the {MK_ITERS}-step "
        f"iterate of the stationary distribution, next to each state's "
        f"empirical visit share. Corpus-scale work is one lag-window "
        f"pass; every iteration frame is |event-type-vocabulary| rows.",
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    # ONE corpus pass: the |types|²-row transition-count frame is
    # materialized and every downstream frame (row totals, model, init
    # vector) derives from it (scan_count.py: 7 reads -> 2)
    c = (
        seq.groupBy(F.col("prev").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=False)
    )
    rt = c.groupBy("src").agg(F.sum("n").cast("bigint").alias("total"))
    model = (
        c.join(rt, "src")
        .select(
            "src",
            "dst",
            F.round(F.lit(MK_SCALE) * F.col("n") / F.col("total"))
            .cast("bigint")
            .alias("p_scaled"),
        )
        .localCheckpoint(eager=False)  # consumed every iteration
    )
    n_states = rt.select(F.count(F.lit(1)).alias("k"))
    r = rt.crossJoin(F.broadcast(n_states)).select(
        F.col("src").alias("state"),
        F.expr(f"{MK_SCALE} div k").cast("bigint").alias("mass"),
    )
    for _ in range(MK_ITERS):
        r = (
            r.join(model, r.state == model.src)
            .groupBy(F.col("dst").alias("state"))
            .agg(
                F.expr(f"CAST(sum(mass * p_scaled) div {MK_SCALE} AS BIGINT)")
                .alias("mass")
            )
        )
    totals = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    ).localCheckpoint(eager=False)  # |types| rows; feeds grand + result
    grand = totals.agg(F.sum("n_events").alias("n_total"))
    return (
        r.join(totals, r.state == totals.event_type)
        .crossJoin(F.broadcast(grand))
        .select(
            "state",
            F.col("mass").alias("stationary_scaled"),
            (F.col("mass").cast("double") / F.lit(float(MK_SCALE))).alias(
                "stationary"
            ),
            "n_events",
            (F.col("n_events").cast("double") / F.col("n_total")).alias(
                "empirical_share"
            ),
        )
    )
