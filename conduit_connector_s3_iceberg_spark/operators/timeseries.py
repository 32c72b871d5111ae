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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

TS_SCALE = 1_000_000
HOLT_HORIZON = 3  # forecast steps emitted


def _dense_daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense (event_type, t, x) day-grid count series — the shared front
    end of the Holt smoother and its rolling-origin backtest. ONE corpus
    pass: the (type, day) count frame is series-sized; bounds, the type
    list, and the dense grid all derive from it, so events is never
    rescanned (scan_count.py: 6 reads -> 1)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("timestamp").cast("date").alias("day")
    )
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
    return grid.join(counts, ["event_type", "day"], "left").select(
        "event_type", "t", F.coalesce(F.col("x"), F.lit(0)).cast("bigint").alias("x")
    )



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
    series = _dense_daily_series(spark, sf_dir)

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


# --------------------------------------------- Markov removal attribution --
#
# Data-driven multi-touch attribution (Anderl et al. 2014): model user
# journeys as an absorbing Markov chain (start -> touch states ->
# conv/null), compute the conversion probability from start, then for
# each channel remove its state (transitions into it die to null) and
# measure how much conversion probability disappears — the channel's
# removal effect. The principled alternative to events_attribution's
# positional heuristics.
#
# All removal scenarios are computed JOINTLY: the value vector is keyed
# by (scenario, state) and the K value-iteration steps run once over
# that one vocabulary-sized frame — no per-channel loop, no unrolling
# per channel. v(s) = p(s->conv) + sum_t p(s->t) v(t) iterated K times
# in scaled BIGINT (quantized transition matrix, div-S products), so
# both engines agree bit-for-bit. Shares divide integer removal masses
# (never a float sum).

MA_SCALE = 1_000_000_000
MA_ITERS = 12


def _ma_oracle() -> str:
    steps = []
    for k in range(1, MA_ITERS + 1):
        p = k - 1
        steps.append(f"""
    v{k} AS MATERIALIZED (
      SELECT m.scenario, m.src AS state,
             CAST(m.p_conv + SUM(m.p_scaled * COALESCE(v.val, 0))
                  // {MA_SCALE} AS BIGINT) AS val
      FROM smodel m
      LEFT JOIN v{p} v ON v.scenario = m.scenario AND v.state = m.dst
      GROUP BY m.scenario, m.src, m.p_conv
    )""")
    return f"""
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS pos
      FROM events
    ), pseq AS (
      SELECT user_id, MIN(pos) AS p_pos FROM seq
      WHERE event_type = 'purchase' GROUP BY user_id
    ), path AS (
      SELECT s.user_id, s.event_type, s.pos,
             LAG(s.event_type) OVER (
               PARTITION BY s.user_id ORDER BY s.pos
             ) AS prev,
             MAX(s.pos) OVER (PARTITION BY s.user_id) AS last_pos,
             p.p_pos IS NOT NULL AS converts
      FROM seq s LEFT JOIN pseq p ON s.user_id = p.user_id
      WHERE p.p_pos IS NULL OR s.pos < p.p_pos
    ), trans AS (
      SELECT COALESCE(prev, 'start') AS src, event_type AS dst FROM path
      UNION ALL
      SELECT event_type AS src,
             CASE WHEN converts THEN 'conv' ELSE 'null' END AS dst
      FROM path WHERE pos = last_pos
      UNION ALL
      SELECT 'start' AS src, 'conv' AS dst
      FROM pseq WHERE p_pos = 1
    ), c AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
      FROM trans GROUP BY src, dst
    ), rt AS (
      SELECT src, CAST(SUM(n) AS BIGINT) AS total FROM c GROUP BY src
    ), model AS (
      SELECT c.src, c.dst,
             CAST(round({MA_SCALE} * c.n / rt.total) AS BIGINT) AS p_scaled
      FROM c JOIN rt USING (src)
    ), scenarios AS (
      SELECT DISTINCT src AS removed FROM model WHERE src <> 'start'
      UNION ALL SELECT '__none__'
    ), smodel0 AS (
      SELECT s.removed AS scenario, m.src,
             CASE WHEN m.dst = s.removed THEN 'null' ELSE m.dst END AS dst,
             CAST(SUM(m.p_scaled) AS BIGINT) AS p_scaled
      FROM scenarios s JOIN model m ON m.src <> s.removed
      GROUP BY 1, 2, 3
    ), pconv AS (
      SELECT scenario, src,
             CAST(SUM(CASE WHEN dst = 'conv' THEN p_scaled ELSE 0 END)
                  AS BIGINT) AS p_conv
      FROM smodel0 GROUP BY scenario, src
    ), smodel AS MATERIALIZED (
      SELECT s0.scenario, s0.src, s0.dst, s0.p_scaled, pc.p_conv
      FROM smodel0 s0
      JOIN pconv pc ON pc.scenario = s0.scenario AND pc.src = s0.src
    ), v0 AS (
      SELECT DISTINCT scenario, src AS state, CAST(0 AS BIGINT) AS val
      FROM smodel
    ),{','.join(steps)}
    , base AS (
      SELECT val AS v_base FROM v{MA_ITERS}
      WHERE scenario = '__none__' AND state = 'start'
    ), removals AS (
      SELECT v.scenario AS channel,
             b.v_base - v.val AS removal_scaled
      FROM v{MA_ITERS} v CROSS JOIN base b
      WHERE v.scenario <> '__none__' AND v.state = 'start'
    )
    SELECT channel,
           removal_scaled,
           CAST(removal_scaled AS DOUBLE) / (SELECT v_base FROM base)
             AS removal_effect,
           CAST(removal_scaled AS DOUBLE)
             / (SELECT SUM(removal_scaled) FROM removals)
             AS attribution_share
    FROM removals
    ORDER BY channel
    """


@query(
    "events_markov_attribution",
    oracle=_ma_oracle(),
    doc="Markov removal-effect attribution (Anderl et al. 2014): user "
        "journeys up to first purchase as an absorbing chain; per channel, "
        "the conversion probability lost when its state is removed "
        "(transitions into it die to null), and the share of total "
        "removal mass. All scenarios iterate jointly in ONE "
        "(scenario, state)-keyed vocabulary-sized frame, K=12 value-"
        "iteration steps in scaled BIGINT; shares divide integer masses. "
        "Corpus-scale work is one window pass building transitions.",
)
def events_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("pos")
    )
    pseq = (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("pos").alias("p_pos"))
    )
    wp = Window.partitionBy("user_id").orderBy("pos")
    path = (
        seq.join(pseq, "user_id", "left")
        .filter(F.col("p_pos").isNull() | (F.col("pos") < F.col("p_pos")))
        .withColumn("prev", F.lag("event_type").over(wp))
        .withColumn(
            "last_pos", F.max("pos").over(Window.partitionBy("user_id"))
        )
        .withColumn("converts", F.col("p_pos").isNotNull())
    )
    trans = (
        path.select(
            F.coalesce(F.col("prev"), F.lit("start")).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .unionAll(
            path.filter(F.col("pos") == F.col("last_pos")).select(
                F.col("event_type").alias("src"),
                F.when(F.col("converts"), "conv").otherwise("null").alias("dst"),
            )
        )
        .unionAll(
            pseq.filter(F.col("p_pos") == 1).select(
                F.lit("start").alias("src"), F.lit("conv").alias("dst")
            )
        )
    )
    c = trans.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).localCheckpoint(eager=False)  # vocabulary-sized; feeds rt + model
    rt = c.groupBy("src").agg(F.sum("n").cast("bigint").alias("total"))
    model = c.join(rt, "src").select(
        "src",
        "dst",
        F.round(F.lit(MA_SCALE) * F.col("n") / F.col("total"))
        .cast("bigint")
        .alias("p_scaled"),
    )
    scenarios = (
        model.filter(F.col("src") != "start")
        .select(F.col("src").alias("removed"))
        .distinct()
        .unionAll(
            model.sparkSession.createDataFrame(
                [("__none__",)], "removed string"
            )
        )
    )
    dst2 = F.when(F.col("dst") == F.col("removed"), "null").otherwise(
        F.col("dst")
    )
    smodel = (
        scenarios.join(model, F.col("src") != F.col("removed"))
        .select(
            F.col("removed").alias("scenario"),
            "src",
            dst2.alias("dst"),
            "p_scaled",
        )
        .groupBy("scenario", "src", "dst")
        .agg(
            F.sum(F.when(F.col("dst") == "conv", F.col("p_scaled")).otherwise(0))
            .cast("bigint")
            .alias("p_conv_part"),
            F.sum(F.col("p_scaled")).cast("bigint").alias("p_all"),
        )
        .withColumn(
            "p_scaled", F.col("p_all")
        )
        .drop("p_all")
    )
    # per (scenario, src): the conv mass is a property of the src row set
    pconv = smodel.groupBy("scenario", "src").agg(
        F.sum("p_conv_part").cast("bigint").alias("p_conv")
    )
    sm = smodel.join(pconv, ["scenario", "src"]).localCheckpoint(
        eager=False
    )  # consumed every iteration
    v = sm.select("scenario", F.col("src").alias("state")).distinct().select(
        "scenario", "state", F.lit(0).cast("bigint").alias("val")
    )
    for _ in range(MA_ITERS):
        v = (
            sm.alias("m")
            .join(
                v.alias("v"),
                (F.col("v.scenario") == F.col("m.scenario"))
                & (F.col("v.state") == F.col("m.dst")),
                "left",
            )
            .groupBy(
                F.col("m.scenario").alias("scenario"),
                F.col("m.src").alias("state"),
                F.col("m.p_conv").alias("p_conv"),
            )
            .agg(
                F.expr(
                    f"CAST(p_conv + sum(p_scaled * coalesce(val, 0))"
                    f" div {MA_SCALE} AS BIGINT)"
                ).alias("val")
            )
            .select("scenario", "state", "val")
        )
    base = v.filter(
        (F.col("scenario") == "__none__") & (F.col("state") == "start")
    ).select(F.col("val").alias("v_base"))
    removals = (
        v.filter((F.col("scenario") != "__none__") & (F.col("state") == "start"))
        .crossJoin(F.broadcast(base))
        .select(
            F.col("scenario").alias("channel"),
            (F.col("v_base") - F.col("val")).alias("removal_scaled"),
            "v_base",
        )
        .localCheckpoint(eager=False)
    )
    tot = removals.agg(
        F.sum("removal_scaled").cast("bigint").alias("tot_removal")
    )
    return (
        removals.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "removal_scaled",
            (F.col("removal_scaled").cast("double") / F.col("v_base")).alias(
                "removal_effect"
            ),
            (
                F.col("removal_scaled").cast("double") / F.col("tot_removal")
            ).alias("attribution_share"),
        )
        .orderBy("channel")
    )


# ------------------------------------------------ autocorrelation (ACF) ----
#
# Autocorrelation of the daily event-count series at lags 1..7 — the
# seasonality detector (a weekly cycle puts a spike at lag 7) run before
# choosing forecast models or anomaly baselines. Determinism: daily
# counts are integers on a dense date spine (missing days = 0), so every
# moment (Sx, Sy, Sxx, Syy, Sxy per lag) is an exact BIGINT fold; the
# Pearson r is then one scalar IEEE chain written identically in both
# engines. Magnitudes: counts < 1e5, T < 1e4 → n*Sxy < 1e14·1e4 « 2^63.

ACF_MAX_LAG = 7


@query(
    "events_autocorrelation",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY day
    ), bounds AS (
      SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily
    ), spine AS (
      SELECT CAST(u.d AS DATE) AS day,
             CAST(ROW_NUMBER() OVER (ORDER BY u.d) AS BIGINT) AS t
      FROM bounds, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS u(d)
    ), series AS (
      SELECT s.t, COALESCE(d.n, 0) AS x
      FROM spine s LEFT JOIN daily d ON s.day = d.day
    ), lags AS (
      SELECT CAST(l.lag AS BIGINT) AS lag, a.x AS x, b.x AS y
      FROM UNNEST(generate_series(1, {ACF_MAX_LAG})) AS l(lag)
      JOIN series a ON TRUE
      JOIN series b ON b.t = a.t + l.lag
    ), mom AS (
      SELECT lag,
             CAST(COUNT(*) AS BIGINT) AS np,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM lags GROUP BY lag
    )
    SELECT lag, np AS n_pairs,
           CASE WHEN (np * sxx - sx * sx) > 0 AND (np * syy - sy * sy) > 0
                THEN CAST(np * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(np * sxx - sx * sx AS DOUBLE)
                            * CAST(np * syy - sy * sy AS DOUBLE))
                ELSE NULL END AS acf
    FROM mom
    ORDER BY lag
    """,
    doc=f"Autocorrelation of the daily event-count series at lags "
        f"1..{ACF_MAX_LAG} (dense zero-filled date spine): the weekly-"
        "seasonality detector. All moments are exact BIGINT folds over "
        "integer counts — order-independent under any shuffle; Pearson r "
        "is one scalar IEEE chain per lag, NULL-guarded for degenerate "
        "(constant) series. Corpus-scale work is one date hash agg; "
        "everything after is spine-sized.",
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    ).select(
        "day",
        F.row_number()
        .over(Window.orderBy("day"))
        .cast("bigint")
        .alias("t"),
    )
    series = (
        spine.join(daily, "day", "left")
        .select("t", F.coalesce("n", F.lit(0)).cast("bigint").alias("x"))
        .localCheckpoint(eager=False)  # spine-sized; both lag-join sides
    )
    lagf = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("bigint").alias("lag")
    )
    a = series.alias("a")
    b = series.alias("b")
    lags = (
        a.crossJoin(F.broadcast(lagf))
        .join(b, F.col("b.t") == F.col("a.t") + F.col("lag"))
        .select("lag", F.col("a.x").alias("x"), F.col("b.x").alias("y"))
    )
    mom = lags.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("np"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    num = F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("np") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        mom.select(
            "lag",
            F.col("np").alias("n_pairs"),
            F.when(
                (vx > 0) & (vy > 0),
                num.cast("double")
                / F.sqrt(vx.cast("double") * vy.cast("double")),
            ).alias("acf"),
        )
        .orderBy("lag")
    )


# ------------------------------------------------ Kaplan-Meier survival ----
#
# User-lifetime survival curve (Kaplan & Meier 1958): S(t) = prod over
# event times t_i <= t of (1 - d_i / n_i), with users still active on
# the corpus's final day treated as right-censored (their lifetime is a
# lower bound — dropping them would bias churn fast). Lifetime = days
# between a user's first and last event.
#
# Shape: the corpus-scale work is one (user) hash agg; everything after
# runs on the duration-value domain (<= observation window in days).
# The product is an ORDERED fold over the collected per-time factors
# (same left-to-right IEEE sequence in both engines — the suite's
# array-fold discipline); each factor is one division of exact integers.
# The prefix expansion is a self-join on the tiny duration domain.


@query(
    "events_survival_km",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(MIN(CAST(ts AS DATE)) AS DATE) AS d0,
             CAST(MAX(CAST(ts AS DATE)) AS DATE) AS d1
      FROM events GROUP BY user_id
    ), mx AS (
      SELECT MAX(d1) AS dmax FROM u
    ), life AS (
      SELECT CAST(d1 - d0 AS BIGINT) AS t,
             CASE WHEN d1 = mx.dmax THEN 0 ELSE 1 END AS observed
      FROM u CROSS JOIN mx
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM life
    ), ev AS (
      SELECT t,
             CAST(SUM(observed) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS leaving
      FROM life GROUP BY t
    ), risk AS (
      SELECT t, d,
             CAST(tot.n_users
               - COALESCE(SUM(leaving) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk
      FROM ev CROSS JOIN tot
    ), steps AS (
      SELECT t, d, n_at_risk,
             1.0 - CAST(d AS DOUBLE) / n_at_risk AS factor
      FROM risk WHERE d > 0
    )
    SELECT s.t, s.d AS n_events, s.n_at_risk,
           list_reduce(
             list_transform(array_agg(p.factor ORDER BY p.t), x -> x),
             (a, b) -> a * b) AS survival
    FROM steps s JOIN steps p ON p.t <= s.t
    GROUP BY s.t, s.d, s.n_at_risk
    ORDER BY s.t
    """,
    doc="Kaplan-Meier survival of user lifetime (days first->last event), "
        "right-censoring users still active on the corpus's last day: "
        "S(t) as an ORDERED product fold of (1 - d_i/n_i) — identical "
        "left-to-right IEEE sequence in both engines; factors are single "
        "divisions of exact integers. One user-keyed hash agg at corpus "
        "scale; the curve itself lives on the duration domain (prefix "
        "self-join over <= window-days rows).",
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    mx = u.agg(F.max("d1").alias("dmax"))
    life = u.crossJoin(F.broadcast(mx)).select(
        F.datediff("d1", "d0").cast("bigint").alias("t"),
        F.when(F.col("d1") == F.col("dmax"), 0).otherwise(1).alias("observed"),
    )
    life = life.localCheckpoint(eager=False)  # user-sized; 2 consumers
    tot = life.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    evt = life.groupBy("t").agg(
        F.sum("observed").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("leaving"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = evt.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        (
            F.col("n_users")
            - F.coalesce(F.sum("leaving").over(w), F.lit(0))
        ).alias("n_at_risk"),
    )
    steps = risk.filter(F.col("d") > 0).select(
        "t",
        "d",
        "n_at_risk",
        (F.lit(1.0) - F.col("d").cast("double") / F.col("n_at_risk")).alias(
            "factor"
        ),
    )
    s = steps.alias("s")
    p = steps.select(F.col("t").alias("pt"), F.col("factor").alias("pf"))
    return (
        s.join(F.broadcast(p), F.col("pt") <= F.col("s.t"))
        .groupBy(F.col("s.t").alias("t"), F.col("s.d").alias("n_events"),
                 F.col("s.n_at_risk").alias("n_at_risk"))
        .agg(
            F.expr(
                "aggregate(transform(array_sort(collect_list("
                "struct(pt, pf))), x -> x.pf), cast(1.0 as double),"
                " (a, b) -> a * b)"
            ).alias("survival")
        )
        .orderBy("t")
    )


# ------------------------------------------------ Fano factor (burstiness) -
#
# Index of dispersion per event type over the dense daily-count series:
# Fano = variance / mean. A Poisson-like arrival process sits near 1;
# bursty types (incidents, bots, campaigns) blow past it, metronomic
# ones fall below — the one-scalar triage read before the CUSUM /
# seasonal tooling. Exact integer moments on the zero-filled spine; the
# ratio is one scalar IEEE chain per type.


@query(
    "events_fano_factor",
    oracle="""
    WITH bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
      FROM events
    ), grid AS (
      SELECT e.event_type, CAST(u.d AS DATE) AS day
      FROM (SELECT DISTINCT event_type FROM events) e
      CROSS JOIN bounds b,
      UNNEST(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS u(d)
    ), counts AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY event_type, day
    ), series AS (
      SELECT g.event_type, COALESCE(c.x, 0) AS x
      FROM grid g LEFT JOIN counts c
        ON c.event_type = g.event_type AND c.day = g.day
    ), mom AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM series GROUP BY event_type
    )
    SELECT event_type, n AS n_days, sx AS n_events,
           CAST(sx AS DOUBLE) / n AS mean_daily,
           (CAST(sxx AS DOUBLE) / n
            - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
             AS var_daily,
           (CAST(sxx AS DOUBLE) / n
            - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
           / (CAST(sx AS DOUBLE) / n) AS fano
    FROM mom
    ORDER BY event_type
    """,
    doc="Index of dispersion (Fano factor) per event type over the dense "
        "zero-filled daily series: variance/mean of daily counts — ~1 is "
        "Poisson-like, >>1 is bursty (incidents, bots, campaigns), <1 is "
        "metronomic. One date hash agg at corpus scale; exact BIGINT "
        "moments; one IEEE chain per type. The triage scalar before the "
        "CUSUM / seasonal / ACF tooling.",
)
def events_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("day")
    )
    counts = (
        ev.groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
        .localCheckpoint(eager=False)  # series-sized; bounds/grid/join reuse
    )
    bounds = counts.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = (
        counts.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    series = grid.join(counts, ["event_type", "day"], "left").select(
        "event_type", F.coalesce("x", F.lit(0)).cast("bigint").alias("x")
    )
    mom = series.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sx").cast("double") / nd
    var = F.col("sxx").cast("double") / nd - mean * mean
    return mom.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("sx").alias("n_events"),
        mean.alias("mean_daily"),
        var.alias("var_daily"),
        (var / mean).alias("fano"),
    ).orderBy("event_type")


# ------------------------------------------- exponentially decayed counts --
#
# Time-decayed popularity ("trending"): each event contributes
# 0.9^age_days to its type's score, so a burst yesterday outranks a
# steady trickle last month -- the freshness-weighted heavy-hitter table
# a crawl scheduler or recency-weighted sampler reads instead of raw
# counts. The decay curve is materialized as a STATIC integer table
# (w_0 = SCALE; w_{k+1} = w_k * 9 div 10, truncating), so the weighted
# sum is exact BIGINT arithmetic: day-grain counts (exact) join a
# 4096-row broadcast weight table, and `sum(count * weight)` is an
# associative integer sum -- bit-stable under any shuffle order. The
# oracle replays the identical truncating recurrence as WITH RECURSIVE.
# SCALE = 10^9 keeps sum(count*weight) <= total_events * SCALE < 2^53
# through sf >= 1, so the final double emission is exact-input.

DECAY_SCALE = 1_000_000_000
DECAY_MAX_AGE = 4096  # static domain; 0.9^k underflows the scale at k~197


def _decay_weights():
    """age -> floor-decayed weight, the exact integer recurrence."""
    w, out = DECAY_SCALE, []
    for age in range(DECAY_MAX_AGE):
        out.append((age, w))
        w = w * 9 // 10
    return out


@query(
    "events_decayed_popularity",
    oracle=f"""
    WITH RECURSIVE w(age, wt) AS (
      SELECT CAST(0 AS BIGINT), CAST({DECAY_SCALE} AS BIGINT)
      UNION ALL
      SELECT age + 1, wt * 9 // 10 FROM w WHERE age < {DECAY_MAX_AGE} - 1
    ), ref AS (
      SELECT MAX(CAST(ts AS DATE)) AS d1 FROM events
    ), daily AS (
      SELECT event_type,
             CAST(date_diff('day', CAST(ts AS DATE), d1) AS BIGINT) AS age,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events, ref GROUP BY 1, 2
    ), scored AS (
      SELECT event_type,
             CAST(SUM(n) AS BIGINT) AS n_events,
             CAST(SUM(n * wt) AS BIGINT) AS score_scaled
      FROM daily JOIN w USING (age)
      GROUP BY event_type
    )
    SELECT event_type, n_events, score_scaled,
           CAST(score_scaled AS DOUBLE) / {DECAY_SCALE}.0 AS decayed_score,
           CAST(row_number() OVER (ORDER BY score_scaled DESC, event_type)
                AS BIGINT) AS rnk
    FROM scored
    """,
    doc="Exponentially time-decayed popularity per event type: each event "
        "contributes 0.9^age_days, computed as day-grain exact counts "
        "joined to a STATIC 4096-row integer decay table (w_{{k+1}} = "
        "w_k * 9 div 10 -- the truncating recurrence both engines replay "
        "identically), so the score is one associative BIGINT sum, "
        "bit-stable under any partitioning. The weight table is a "
        "broadcast; the ref day is a 1-row broadcast; the only shuffle is "
        "the day-grain count agg. Rank ties break on event_type.",
)
def events_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "event_type"
    )
    daily = ev.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return decayed_scores_from_daily(daily)


def decayed_scores_from_daily(daily: DataFrame) -> DataFrame:
    """Serve decayed-popularity scores from a day-grain count table
    ``(event_type, d: date, n: bigint)``.

    This is the serve-time half shared by the batch query above and the
    streaming IVM maintainer (``streaming.ivm.decayed_popularity_from_
    summary``): the decay depends on TODAY's ages, so the maintained state
    is the undecayed day-grain table (O(types x days), metadata-sized) and
    the decay arithmetic reruns here per read — aggregating the day grid,
    never the corpus. The ref day is a 1-row broadcast over the day-grain
    frame; the weight table is a static broadcast.
    """
    spark = daily.sparkSession
    ref = daily.agg(F.max("d").alias("d1"))
    aged = (
        daily.crossJoin(F.broadcast(ref))
        .select(
            "event_type",
            F.datediff("d1", "d").cast("bigint").alias("age"),
            "n",
        )
    )
    weights = spark.createDataFrame(_decay_weights(), "age bigint, wt bigint")
    scored = (
        aged.join(F.broadcast(weights), "age")
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum(F.col("n") * F.col("wt")).alias("score_scaled"),
        )
    )
    win = Window.orderBy(F.desc("score_scaled"), "event_type")
    return scored.select(
        "event_type",
        "n_events",
        "score_scaled",
        (F.col("score_scaled").cast("double") / F.lit(float(DECAY_SCALE))).alias(
            "decayed_score"
        ),
        F.row_number().over(win).cast("bigint").alias("rnk"),
    )


# ------------------------------------------------ rolling-origin backtest --
#
# The evaluation a forecaster is actually judged by: at EVERY day t, take
# the Holt state the smoother had reached by t, forecast t+1..t+3, and
# score the error against what actually happened — rolling-origin
# cross-validation (Tashman 2000), never a single train/test split. The
# persistence forecast x_t ("tomorrow = today") is the skill baseline: a
# smoother that can't beat it is not earning its state.
#
# Scale/determinism: the recursion already computes the state at every t
# (the smoother just keeps the last one), so the backtest is the SAME
# per-series applyInPandas pass, now also folding |l_t + h·b_t − S·x_{t+h}|
# into exact per-horizon BIGINT error sums. Everything after the day-grain
# count agg is series-sized. The oracle replays the identical recursion as
# a recursive CTE and joins states to actuals.

BT_HORIZONS = 3

_SERIES_SQL = f"""
    bounds AS (
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
    )
"""


@query(
    "events_forecast_backtest",
    oracle=f"""
    WITH {_SERIES_SQL}, init AS (
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
    ), fc AS (
      SELECT s.event_type, CAST(h.h AS BIGINT) AS horizon,
             ABS(s.l + h.h * s.b - a.x * {TS_SCALE}) AS err_holt,
             ABS(o.x * {TS_SCALE} - a.x * {TS_SCALE}) AS err_naive
      FROM state s
      CROSS JOIN (VALUES (1), (2), (3)) AS h(h)
      JOIN series a ON a.event_type = s.event_type AND a.t = s.t + h.h
      JOIN series o ON o.event_type = s.event_type AND o.t = s.t
    )
    SELECT event_type, horizon,
           CAST(COUNT(*) AS BIGINT) AS n_forecasts,
           CAST(SUM(err_holt) AS BIGINT) AS sum_err_holt,
           CAST(SUM(err_naive) AS BIGINT) AS sum_err_naive,
           CAST(CAST(SUM(err_holt) AS BIGINT) AS DOUBLE)
             / (COUNT(*) * {TS_SCALE}.0) AS mae_holt,
           CAST(CAST(SUM(err_naive) AS BIGINT) AS DOUBLE)
             / (COUNT(*) * {TS_SCALE}.0) AS mae_naive,
           CAST(CAST(SUM(err_holt) AS BIGINT) AS DOUBLE)
             / NULLIF(CAST(SUM(err_naive) AS BIGINT), 0) AS skill
    FROM fc GROUP BY event_type, horizon
    """,
    doc="Rolling-origin forecast backtest (Tashman 2000) of the Holt "
        "smoother: at every day t, forecast t+1..t+3 from the state the "
        "recursion had reached by t and score |forecast − actual| against "
        "the persistence baseline x_t — per (series, horizon) MAE and the "
        "holt/naive skill ratio (< 1 ⇒ the smoother earns its state). "
        "Same one-pass day-grain front end and exact scaled-BIGINT "
        "recursion as events_holt_smoothing; error sums are associative "
        "integers, the three emitted ratios are single divisions.",
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    series = _dense_daily_series(spark, sf_dir)

    def backtest(pdf):
        import math

        import pandas as pd

        pdf = pdf.sort_values("t")
        xs = [int(v) * TS_SCALE for v in pdf["x"]]
        et = pdf["event_type"].iloc[0]
        cols = [
            "event_type", "horizon", "n_forecasts", "sum_err_holt",
            "sum_err_naive", "mae_holt", "mae_naive", "skill",
        ]
        if len(xs) < 2:
            return pd.DataFrame([], columns=cols)
        # replay the recursion, keeping EVERY state (t >= 1)
        states = {}
        l = xs[0]
        b = xs[1] - xs[0]
        states[1] = (l, b)
        for t in range(2, len(xs)):
            l_new = math.trunc((xs[t] + 3 * (l + b)) / 4)
            b = math.trunc(((l_new - l) + 3 * b) / 4)
            l = l_new
            states[t] = (l, b)
        sums = {h: [0, 0, 0] for h in range(1, BT_HORIZONS + 1)}  # n, holt, naive
        for t, (lt, bt) in states.items():
            for h in range(1, BT_HORIZONS + 1):
                if t + h >= len(xs):
                    continue
                actual = xs[t + h]
                sums[h][0] += 1
                sums[h][1] += abs(lt + h * bt - actual)
                sums[h][2] += abs(xs[t] - actual)
        rows = []
        for h, (n, sh, sn) in sums.items():
            if n == 0:
                continue
            rows.append((
                et, h, n, sh, sn,
                sh / (n * TS_SCALE), sn / (n * TS_SCALE),
                (sh / sn) if sn != 0 else None,
            ))
        return pd.DataFrame(rows, columns=cols)

    return series.groupBy("event_type").applyInPandas(
        backtest,
        schema="event_type string, horizon bigint, n_forecasts bigint, "
        "sum_err_holt bigint, sum_err_naive bigint, mae_holt double, "
        "mae_naive double, skill double",
    )


# --------------------------------------------------- burst detection --------


@query(
    "events_burst_viterbi",
    oracle=f"""
    WITH {_SERIES_SQL}, base AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(round({TS_SCALE} * CAST(SUM(x) AS DOUBLE) / COUNT(*))
                  AS BIGINT) AS r0q,
             CAST(round(sqrt(CAST(COUNT(*) * SUM(x * x)
                                  - SUM(x) * SUM(x) AS DOUBLE))
                        * {TS_SCALE} / COUNT(*)) AS BIGINT) AS sdq
      FROM series GROUP BY event_type
    ), cost AS (
      SELECT s.event_type, s.t, s.x, b.nd, b.r0q, b.sdq,
             ABS(s.x * {TS_SCALE} - b.r0q) AS c0,
             ABS(s.x * {TS_SCALE} - (b.r0q + (3 * b.sdq) // 2)) AS c1
      FROM series s JOIN base b USING (event_type)
    ), dp AS (
      WITH RECURSIVE rec AS (
        SELECT event_type, t, nd, r0q, sdq, c0 AS d0, c1 + sdq AS d1
        FROM cost WHERE t = 0
        UNION ALL
        SELECT c.event_type, c.t, c.nd, c.r0q, c.sdq,
               c.c0 + LEAST(r.d0, r.d1),
               c.c1 + LEAST(r.d1, r.d0 + r.sdq)
        FROM rec r JOIN cost c
          ON c.event_type = r.event_type AND c.t = r.t + 1
      )
      SELECT * FROM rec
    ), bt AS (
      WITH RECURSIVE rec2 AS (
        SELECT event_type, t, sdq,
               CASE WHEN d0 <= d1 THEN 0 ELSE 1 END AS st
        FROM dp WHERE t = nd - 1
        UNION ALL
        SELECT d.event_type, d.t, d.sdq,
               CASE WHEN r.st = 0
                    THEN CASE WHEN d.d0 <= d.d1 THEN 0 ELSE 1 END
                    ELSE CASE WHEN d.d1 <= d.d0 + d.sdq THEN 1 ELSE 0 END
               END
        FROM rec2 r JOIN dp d
          ON d.event_type = r.event_type AND d.t = r.t - 1
      )
      SELECT * FROM rec2
    ), burst_days AS (
      SELECT b.event_type, b.t, c.x, c.r0q,
             b.t - ROW_NUMBER() OVER (
               PARTITION BY b.event_type ORDER BY b.t
             ) AS grp
      FROM bt b JOIN cost c ON c.event_type = b.event_type AND c.t = b.t
      WHERE b.st = 1
    )
    SELECT event_type,
           CAST(MIN(t) AS BIGINT) AS start_t,
           CAST(MAX(t) AS BIGINT) AS end_t,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(x) AS BIGINT) AS x_total,
           CAST(SUM(x) * {TS_SCALE} - COUNT(*) * MIN(r0q) AS BIGINT)
             AS excess_scaled
    FROM burst_days
    GROUP BY event_type, grp
    ORDER BY event_type, start_t
    """,
    doc="Two-state burst detection (the min-cost Kleinberg shape, KDD'02 "
    "'Bursty and hierarchical structure in streams'): per series, a "
    "Viterbi DP over {baseline, burst} day states with L1 emission cost "
    "|x_t - rate| against the series mean r0 and the DISPERSION-ADAPTIVE "
    "burst rate r0 + 3·sd/2 (a fixed multiplier goes silent as volume "
    "grows — Poisson relative noise shrinks ~1/sqrt(mean) — the sd-scaled "
    "rate keeps the detector calibrated at every SF), ascent penalty = "
    "one sd. L1 costs instead of Poisson log-likelihoods keep the whole "
    "DP in exact scaled integers (the only IEEE steps are the "
    "correctly-rounded mean/sd quantizations); forward min-cost "
    "recursion + backward state reconstruction (ties resolve to "
    "baseline), burst days grouped into maximal episodes with their "
    "excess mass. Scale: the DP runs on the day-grain series "
    "(metadata-sized) inside one Arrow-batched applyInPandas group per "
    "series — the bounded-state split the Holt backtest uses; the corpus "
    "is touched exactly once by the shared dense-series front end. The "
    "oracle replays the identical integer recursion via recursive CTEs.",
)
def events_burst_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    series = _dense_daily_series(spark, sf_dir)

    def viterbi(pdf):
        import math

        import pandas as pd

        pdf = pdf.sort_values("t")
        xs = [int(v) for v in pdf["x"]]
        et = pdf["event_type"].iloc[0]
        cols = [
            "event_type", "start_t", "end_t", "n_days", "x_total",
            "excess_scaled",
        ]
        nd = len(xs)
        if nd == 0:
            return pd.DataFrame([], columns=cols)

        def round_half_away(v: float) -> int:
            # DuckDB round() semantics (half away from zero) — Python's
            # builtin is half-even, which can differ by 1 at a .5
            # boundary and change the whole cost table. v - floor(v) is
            # exact (Sterbenz), so this rounds the REPRESENTED value.
            f = math.floor(v) if v >= 0 else math.ceil(v)
            if v >= 0:
                return int(f + 1) if v - f >= 0.5 else int(f)
            return int(f - 1) if f - v >= 0.5 else int(f)

        s1 = sum(xs)
        s2 = sum(x * x for x in xs)
        # same association as the oracle: exact integer product, ONE
        # correctly-rounded float division (never s1/nd then *TS_SCALE —
        # two roundings can land the other side of a .5 boundary)
        r0q = round_half_away(TS_SCALE * s1 / nd)
        sdq = round_half_away(
            math.sqrt(float(nd * s2 - s1 * s1)) * TS_SCALE / nd
        )
        r1q = r0q + (3 * sdq) // 2
        c0 = [abs(x * TS_SCALE - r0q) for x in xs]
        c1 = [abs(x * TS_SCALE - r1q) for x in xs]
        d0 = [0] * nd
        d1 = [0] * nd
        d0[0], d1[0] = c0[0], c1[0] + sdq
        for t in range(1, nd):
            d0[t] = c0[t] + min(d0[t - 1], d1[t - 1])
            d1[t] = c1[t] + min(d1[t - 1], d0[t - 1] + sdq)
        st = [0] * nd
        st[nd - 1] = 0 if d0[nd - 1] <= d1[nd - 1] else 1
        for t in range(nd - 2, -1, -1):
            if st[t + 1] == 0:
                st[t] = 0 if d0[t] <= d1[t] else 1
            else:
                st[t] = 1 if d1[t] <= d0[t] + sdq else 0
        rows = []
        t = 0
        while t < nd:
            if st[t] == 1:
                s = t
                while t < nd and st[t] == 1:
                    t += 1
                xt = sum(xs[s:t])
                rows.append(
                    (et, s, t - 1, t - s, xt, xt * TS_SCALE - (t - s) * r0q)
                )
            else:
                t += 1
        return pd.DataFrame(rows, columns=cols)

    out = series.groupBy("event_type").applyInPandas(
        viterbi,
        schema=(
            "event_type string, start_t bigint, end_t bigint,"
            " n_days bigint, x_total bigint, excess_scaled bigint"
        ),
    )
    return out.orderBy("event_type", "start_t")


# ------------------------------------------------------ seasonal strength --
#
# Hyndman's seasonal-strength statistic F_s = max(0, 1 − Var(remainder) /
# Var(detrended)) from a classical decomposition of the daily count
# series: trend = centered 7-day moving average (full windows only),
# seasonal = day-of-week mean of the detrended series, remainder = what's
# left. F_s near 0 → no weekly cycle, near 1 → the cycle explains the
# detrended variance; THE one number behind "do we need dow-aware
# anomaly baselines for this event type?" (events_seasonal_anomaly's
# premise, audited).
#
# Exactness: detrended values are kept in the ×7 integer domain
# (R7 = 7·x − Σ₇x — no division), day-of-week is datediff from a fixed
# Monday anchor mod 7 (both engines' native dow functions disagree on
# numbering; datediff is pure integer arithmetic), the seasonal mean's
# one double division is written identically, and remainders are
# quantized before the variance sums. Squared-sum accumulators live in
# decimal(38,0)/HUGEINT (quantized remainders square past 2^63 at
# production daily volumes — the emb_isotropy discipline).

SEAS_SCALE = 1_000_000


@query(
    "events_seasonal_strength",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, CAST(ts AS DATE) AS day FROM events
    ), counts AS (
      SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
      FROM ev GROUP BY event_type, day
    ), bounds AS (
      SELECT MIN(day) AS d0, MAX(day) AS d1 FROM counts
    ), grid AS (
      SELECT t.event_type, g.day
      FROM (SELECT DISTINCT event_type FROM counts) t
      CROSS JOIN (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        FROM bounds
      ) g
    ), series AS (
      SELECT g.event_type, g.day, COALESCE(c.x, 0) AS x
      FROM grid g LEFT JOIN counts c
        ON g.event_type = c.event_type AND g.day = c.day
    ), tr AS (
      SELECT event_type, day, x,
             SUM(x) OVER w AS t7, COUNT(*) OVER w AS w_n,
             datediff('day', DATE '1970-01-05', day) % 7 AS dow
      FROM series
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), det AS (
      SELECT event_type, dow, 7 * x - t7 AS r7
      FROM tr WHERE w_n = 7
    ), seas AS (
      SELECT event_type, dow,
             CAST(SUM(r7) AS DOUBLE) / COUNT(*) AS s
      FROM det GROUP BY event_type, dow
    ), rem AS (
      SELECT d.event_type,
             CAST({SEAS_SCALE} AS BIGINT) * d.r7 AS det_q,
             CAST(round({SEAS_SCALE}.0 * (d.r7 - s.s)) AS BIGINT) AS rem_q
      FROM det d JOIN seas s
        ON d.event_type = s.event_type AND d.dow = s.dow
    ), mom AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(det_q) AS BIGINT) AS sd,
             CAST(SUM(CAST(det_q AS HUGEINT) * det_q) AS DOUBLE) AS sdd,
             CAST(SUM(rem_q) AS BIGINT) AS sr,
             CAST(SUM(CAST(rem_q AS HUGEINT) * rem_q) AS DOUBLE) AS srr
      FROM rem GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           (sdd - (CAST(sd AS DOUBLE) * sd) / n) / n AS var_detrended,
           (srr - (CAST(sr AS DOUBLE) * sr) / n) / n AS var_remainder,
           GREATEST(0.0, 1.0 - ((srr - (CAST(sr AS DOUBLE) * sr) / n) / n)
                    / ((sdd - (CAST(sd AS DOUBLE) * sd) / n) / n))
             AS seasonal_strength
    FROM mom
    ORDER BY event_type
    """,
    doc="Weekly seasonal strength per event type (Hyndman's F_s = "
        "max(0, 1 − Var(remainder)/Var(detrended)) over a classical "
        "decomposition): centered 7-day trend on full windows, "
        "day-of-week seasonal means, all in the ×7 exact-integer domain "
        "with an anchor-Monday datediff dow (engine dow numbering "
        "differs), remainders quantized before decimal-accumulated "
        "variance sums. The audit behind dow-aware anomaly baselines. "
        "One dense day grid + two window passes + dimension-grain aggs.",
)
def events_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("day")
    )
    counts = (
        ev.groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
        .localCheckpoint(eager=False)  # bounds/grid/join reuse (fano shape)
    )
    bounds = counts.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = (
        counts.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    series = grid.join(counts, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("x", F.lit(0)).cast("bigint").alias("x")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    tr = series.select(
        "event_type",
        "x",
        F.sum("x").over(w).alias("t7"),
        F.count(F.lit(1)).over(w).alias("w_n"),
        (F.datediff(F.col("day"), F.lit("1970-01-05").cast("date")) % 7).alias(
            "dow"
        ),
    )
    det = tr.filter(F.col("w_n") == 7).select(
        "event_type", "dow", (F.lit(7) * F.col("x") - F.col("t7")).alias("r7")
    ).localCheckpoint(eager=False)  # feeds seas AND rem
    seas = det.groupBy("event_type", "dow").agg(
        (F.sum("r7").cast("double") / F.count(F.lit(1))).alias("s")
    )
    rem = det.join(seas, ["event_type", "dow"]).select(
        "event_type",
        (F.lit(SEAS_SCALE).cast("bigint") * F.col("r7")).alias("det_q"),
        F.expr(
            f"cast(round({SEAS_SCALE}.0 * (r7 - s)) as bigint)"
        ).alias("rem_q"),
    )
    d19, d38 = "decimal(19,0)", "decimal(38,0)"
    mom = rem.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("det_q").cast("bigint").alias("sd"),
        F.sum(
            (F.col("det_q").cast(d19) * F.col("det_q").cast(d19)).cast(d38)
        )
        .cast(d38)
        .cast("double")
        .alias("sdd"),
        F.sum("rem_q").cast("bigint").alias("sr"),
        F.sum(
            (F.col("rem_q").cast(d19) * F.col("rem_q").cast(d19)).cast(d38)
        )
        .cast(d38)
        .cast("double")
        .alias("srr"),
    )
    nd = F.col("n")
    var_det = (
        F.col("sdd") - (F.col("sd").cast("double") * F.col("sd")) / nd
    ) / nd
    var_rem = (
        F.col("srr") - (F.col("sr").cast("double") * F.col("sr")) / nd
    ) / nd
    return mom.select(
        "event_type",
        F.col("n").alias("n_days"),
        var_det.alias("var_detrended"),
        var_rem.alias("var_remainder"),
        F.greatest(F.lit(0.0), F.lit(1.0) - var_rem / var_det).alias(
            "seasonal_strength"
        ),
    ).orderBy("event_type")


# ------------------------------------------------------- RFM segmentation --
#
# The classic marketing-analytics cut (Hughes 1994): score every user
# 1..Q on Recency (days since last purchase — lower is better), Frequency
# (purchase count), and Monetary (purchase value), then report the
# Q³-cell grid. Scores are ntile quantiles with DETERMINISTIC total
# order: each ranking breaks ties by user_id, so both engines assign the
# identical segment to every user (a bare ntile over a tied column is
# engine-dependent). The per-user rollup is one hash agg; the three
# rankings are windows over the |users| frame (at 100 TB: range-partition
# by the ranked key — same plan Spark's ntile already compiles to); the
# report is Q³ rows.

def _global_prefix_sum(df, order, col, out: str) -> DataFrame:
    """Exact EXCLUSIVE global running sum of ``col`` over a total order
    WITHOUT a single-task window: range partition on the order columns
    (global order across partitions), per-partition exclusive running sum,
    plus broadcast per-partition sum offsets. The only unpartitioned
    window runs over the <= |partitions| offset rows. The sum is exact
    wherever the range boundaries fall, so the range partitioner's
    sampling cannot perturb the result; the order must be a total order
    (tie-break included) for determinism. ``col`` may be a column name or
    Column expression with exact-integer values (the sum is folded in
    BIGINT). Shared by :func:`_global_rank` (col = 1 ⇒ rank − 1) and the
    PPS weight prefix sum (``sampling.sample_pps_systematic``)."""
    c = F.col(col) if isinstance(col, str) else col
    rp = df.repartitionByRange(*order)
    local = Window.partitionBy(F.spark_partition_id()).orderBy(
        *order
    ).rowsBetween(Window.unboundedPreceding, -1)
    with_local = rp.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_lc", F.coalesce(F.sum(c).over(local), F.lit(0)).cast("bigint")
    )
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )  # <= |partitions| rows: bounded by construction
    offs = (
        with_local.groupBy("_pid")
        .agg(F.sum(c).cast("bigint").alias("_cnt"))
        .withColumn(
            "_off",
            F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).cast("bigint"),
        )
        .select("_pid", "_off")
    )
    return (
        with_local.join(F.broadcast(offs), "_pid")
        .withColumn(out, (F.col("_off") + F.col("_lc")).cast("bigint"))
        .drop("_pid", "_lc", "_off", "_cnt")
    )


def _global_rank(df, order) -> DataFrame:
    """Exact global rank (row_number over a total order) as the exclusive
    prefix COUNT + 1 — see :func:`_global_prefix_sum` for the
    no-single-task-window machinery."""
    return (
        _global_prefix_sum(df, order, F.lit(1), "_gpre")
        .withColumn("_grank", (F.col("_gpre") + 1).cast("bigint"))
        .drop("_gpre")
    )


def _ntile_from_rank(rank_col: str, n_col: str, q: int):
    """Standard-SQL ntile bucket from an exact global rank: the first
    n % q buckets take ceil(n/q) rows, the rest floor(n/q) — the same
    assignment ntile() makes over the same total order, computable
    map-side from (rank, n) without any window."""
    r = f"({n_col} % {q})"
    s_ = f"({n_col} div {q})"
    return F.expr(
        f"cast(case when {rank_col} <= {r} * ({s_} + 1)"
        f" then ({rank_col} - 1) div ({s_} + 1) + 1"
        f" else {r} + ({rank_col} - {r} * ({s_} + 1) - 1) div {s_} + 1"
        " end as int)"
    )


RFM_Q = 4


@query(
    "events_rfm_segments",
    oracle=f"""
    WITH p AS (
      SELECT user_id,
             MAX(CAST(ts AS DATE)) AS last_day,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS monetary_c
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ), ref AS (
      SELECT MAX(last_day) AS ref_day FROM p
    ), scored AS (
      SELECT user_id, freq, monetary_c,
             datediff('day', last_day, ref.ref_day) AS recency_days,
             ntile({RFM_Q}) OVER (
               ORDER BY datediff('day', last_day, ref.ref_day), user_id
             ) AS r_score,
             ntile({RFM_Q}) OVER (ORDER BY freq DESC, user_id) AS f_score,
             ntile({RFM_Q}) OVER (ORDER BY monetary_c DESC, user_id)
               AS m_score
      FROM p CROSS JOIN ref
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(freq) AS BIGINT) AS n_purchases,
           CAST(SUM(monetary_c) AS BIGINT) AS monetary_cents,
           CAST(MIN(recency_days) AS BIGINT) AS min_recency_days,
           CAST(MAX(recency_days) AS BIGINT) AS max_recency_days
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
    doc=f"RFM segmentation (Hughes 1994) at Q={RFM_Q}: per-user recency/"
        "frequency/monetary rollup (monetary in exact cents), three "
        "EXACT quantile scores with deterministic user_id tie-breaks (a "
        "bare ntile over tied values is engine-dependent), Q³-cell "
        "report with population, purchase, and value mass per cell. "
        "Scores come from distributed global ranks — range partition + "
        "per-partition row_number + broadcast partition offsets — and "
        "the standard-SQL ntile bucket formula, so no window ever "
        "gathers the user frame into one task (the oracle's plain ntile "
        "over the same total order is the spec being matched).",
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    p = ev.groupBy("user_id").agg(
        F.max(F.col("ts").cast("date")).alias("last_day"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("monetary_c"),
    )
    ref = p.agg(F.max("last_day").alias("ref_day"))
    base = p.crossJoin(F.broadcast(ref)).withColumn(
        "recency_days", F.datediff(F.col("ref_day"), F.col("last_day"))
    )
    n_row = base.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    # optimization r13: the three exact-ntile ranks used to CHAIN (each
    # _global_rank consumed the previous one's join output), serializing
    # three range-sample + shuffle + window + offset-join pipelines and
    # dragging all prior columns through each shuffle. Computed as three
    # independent branches over `base` they produce the identical scores
    # (each rank is a function of base alone) and the scheduler runs
    # their stages concurrently; the 3-way user_id join at the end is
    # over one row per user.
    base = base.localCheckpoint(eager=False)  # feeds 3 rank branches
    scored = base
    for col_name, order in (
        ("r_score", (F.col("recency_days"), F.col("user_id"))),
        ("f_score", (F.col("freq").desc(), F.col("user_id"))),
        ("m_score", (F.col("monetary_c").desc(), F.col("user_id"))),
    ):
        branch = (
            _global_rank(base, order)
            .crossJoin(F.broadcast(n_row))
            .select(
                "user_id",
                _ntile_from_rank("_grank", "_n", RFM_Q).alias(col_name),
            )
        )
        scored = scored.join(branch, "user_id")
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("freq").cast("bigint").alias("n_purchases"),
            F.sum("monetary_c").cast("bigint").alias("monetary_cents"),
            F.min("recency_days").cast("bigint").alias("min_recency_days"),
            F.max("recency_days").cast("bigint").alias("max_recency_days"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# ------------------------------------------------------------ burstiness ---
#
# Goh & Barabási (2008) burstiness coefficient B = (σ − μ)/(σ + μ) over
# per-user interarrival gaps: B → −1 for metronome traffic, 0 for a
# Poisson process, → +1 for extreme bursts. The per-type number that
# says whether rate-based anomaly thresholds (events_anomaly_*) can
# assume Poisson noise — and the signature bot detectors read next to
# events_bot_regularity. Gaps are exact epoch-microsecond integers from
# a per-(user, type) lag window (ties broken by event_id); Σg is BIGINT,
# Σg² lives in decimal(38,0)/HUGEINT (a 30-day gap is ~2.6e12 µs —
# squared is past 2^63); μ and σ are one identical double chain at the
# end.


@query(
    "events_burstiness",
    oracle="""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id
             ) AS gap
      FROM events
    ), mom AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(gap) AS BIGINT) AS sg,
             CAST(SUM(CAST(gap AS HUGEINT) * gap) AS DOUBLE) AS sgg
      FROM g WHERE gap IS NOT NULL
      GROUP BY event_type
    )
    SELECT event_type, n AS n_gaps,
           CAST(sg AS DOUBLE) / n / 1000000.0 AS mean_gap_s,
           sqrt(sgg / n - (CAST(sg AS DOUBLE) / n) * (CAST(sg AS DOUBLE) / n))
             / 1000000.0 AS sd_gap_s,
           (sqrt(sgg / n - (CAST(sg AS DOUBLE) / n) * (CAST(sg AS DOUBLE) / n))
              - CAST(sg AS DOUBLE) / n)
           / (sqrt(sgg / n - (CAST(sg AS DOUBLE) / n) * (CAST(sg AS DOUBLE) / n))
              + CAST(sg AS DOUBLE) / n) AS burstiness
    FROM mom
    ORDER BY event_type
    """,
    doc="Goh-Barabási burstiness B = (σ−μ)/(σ+μ) of per-user interarrival "
        "gaps, per event type: −1 metronome, 0 Poisson, +1 bursty — the "
        "audit that says whether Poisson-noise anomaly thresholds are "
        "valid for this stream. Gaps are exact epoch-microsecond integers "
        "from one (user, type) lag window; Σg² accumulates in "
        "decimal(38,0)/HUGEINT; μ/σ/B are one identical double chain.",
)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
        ).alias("gap"),  # ts is NTZ; the cast's tz offset cancels in the diff
    ).filter(F.col("gap").isNotNull())
    d19, d38 = "decimal(19,0)", "decimal(38,0)"
    mom = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("gap").cast("bigint").alias("sg"),
        F.sum((F.col("gap").cast(d19) * F.col("gap").cast(d19)).cast(d38))
        .cast(d38)
        .cast("double")
        .alias("sgg"),
    )
    mu = F.col("sg").cast("double") / F.col("n")
    sd = F.sqrt(F.col("sgg") / F.col("n") - mu * mu)
    return mom.select(
        "event_type",
        F.col("n").alias("n_gaps"),
        (mu / F.lit(1_000_000.0)).alias("mean_gap_s"),
        (sd / F.lit(1_000_000.0)).alias("sd_gap_s"),
        ((sd - mu) / (sd + mu)).alias("burstiness"),
    ).orderBy("event_type")


# ----------------------------------------------- Poisson rate-shift test ---
#
# Did each event type's arrival rate change between the first and second
# half of the observation window? Split the day range at its midpoint,
# count arrivals and exposure days per half, and score the shift with
# the standard conditional chi-square (observed vs exposure-proportional
# expected counts under the pooled rate). Every statistic derives from
# integer counts and day spans via single divisions — bit-identical
# across engines. One corpus scan + a type-grain agg; the 1-row date
# range is the only broadcast.


@query(
    "events_rate_shift_test",
    oracle="""
    WITH ev AS (
      SELECT event_type, CAST(ts AS DATE) AS day FROM events
    ), rng AS (
      SELECT MIN(day) AS d0, MAX(day) AS d1,
             (MIN(day) + CAST(datediff('day', MIN(day), MAX(day)) // 2
                              AS INTEGER)) AS mid
      FROM ev
    ), g AS (
      SELECT e.event_type,
             CASE WHEN e.day <= rng.mid THEN 1 ELSE 0 END AS h1
      FROM ev e CROSS JOIN rng
    ), agg AS (
      SELECT event_type,
             CAST(SUM(h1) AS BIGINT) AS n_first,
             CAST(SUM(1 - h1) AS BIGINT) AS n_second
      FROM g GROUP BY event_type
    ), spans AS (
      SELECT CAST(datediff('day', d0, mid) + 1 AS BIGINT) AS days_first,
             CAST(datediff('day', mid, d1) AS BIGINT) AS days_second
      FROM rng
    )
    SELECT event_type, n_first, n_second, days_first, days_second,
           CAST(n_first AS DOUBLE) / days_first AS rate_first,
           -- zero-exposure guard: a single-day window makes days_second 0;
           -- NULLIF keeps both engines on NULL instead of DuckDB IEEE Inf
           -- vs Spark non-ANSI NULL diverging
           CAST(n_second AS DOUBLE) / NULLIF(days_second, 0) AS rate_second,
           CASE WHEN days_second = 0 THEN NULL ELSE
           (n_first - CAST(n_first + n_second AS DOUBLE) * days_first
              / (days_first + days_second))
           * (n_first - CAST(n_first + n_second AS DOUBLE) * days_first
              / (days_first + days_second))
           / (CAST(n_first + n_second AS DOUBLE) * days_first
              / (days_first + days_second))
           + (n_second - CAST(n_first + n_second AS DOUBLE) * days_second
              / (days_first + days_second))
           * (n_second - CAST(n_first + n_second AS DOUBLE) * days_second
              / (days_first + days_second))
           / (CAST(n_first + n_second AS DOUBLE) * days_second
              / (days_first + days_second)) END AS chi2
    FROM agg CROSS JOIN spans
    ORDER BY event_type
    """,
    doc="Poisson rate-shift screen per event type: the observation "
        "window split at its midpoint day, arrivals vs exposure days per "
        "half, pooled-rate expected counts, and the conditional "
        "chi-square (1 df) for the shift. All inputs are exact integer "
        "counts/day spans; the only floats are final divisions — "
        "bit-identical across engines. Scale: one map-side half-flag at "
        "the scan, a |types|-row agg, a 1-row range broadcast.",
)
def events_rate_shift_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("day")
    )
    rng = ev.agg(
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
        F.expr(
            "date_add(min(day),"
            " cast(datediff(max(day), min(day)) div 2 as int))"
        ).alias("mid"),
    )
    agg = (
        ev.crossJoin(F.broadcast(rng))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("day") <= F.col("mid"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_first"),
            F.sum(F.when(F.col("day") > F.col("mid"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_second"),
        )
    )
    spans = rng.select(
        (F.datediff("mid", "d0") + 1).cast("bigint").alias("days_first"),
        F.datediff("d1", "mid").cast("bigint").alias("days_second"),
    )
    e1 = (
        F.col("n_first").cast("double") + F.col("n_second")
    ) * F.col("days_first") / (F.col("days_first") + F.col("days_second"))
    e2 = (
        F.col("n_first").cast("double") + F.col("n_second")
    ) * F.col("days_second") / (F.col("days_first") + F.col("days_second"))
    return (
        agg.crossJoin(F.broadcast(spans))
        .select(
            "event_type",
            "n_first",
            "n_second",
            "days_first",
            "days_second",
            (F.col("n_first").cast("double") / F.col("days_first")).alias(
                "rate_first"
            ),
            # zero-exposure guard (single-day window → days_second = 0):
            # explicit NULL in BOTH engines — see the oracle's NULLIF note
            F.when(
                F.col("days_second") > 0,
                F.col("n_second").cast("double") / F.col("days_second"),
            ).alias("rate_second"),
            F.when(
                F.col("days_second") > 0,
                (F.col("n_first") - e1) * (F.col("n_first") - e1) / e1
                + (F.col("n_second") - e2) * (F.col("n_second") - e2) / e2,
            ).alias("chi2"),
        )
        .orderBy("event_type")
    )


# ----------------------------------------------------- Benford's-law audit -
#
# First-significant-digit distribution of positive event values vs the
# Benford expectation — the classic screen for fabricated or truncated
# numeric feeds. The digit comes from the STRING form of floor(value)
# (no log10: log-of-double leading-digit extraction has ulp-boundary
# hazards at exact powers of ten; string length of an integer does not).
# Expected shares are inlined as shared literal constants so both
# engines carry identical doubles.

_BENFORD = {
    1: 0.3010299956639812, 2: 0.17609125905568124, 3: 0.12493873660829992,
    4: 0.09691001300805642, 5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129, 9: 0.04575749056067514,
}
_BENFORD_SQL_VALUES = ", ".join(f"({d}, {p!r})" for d, p in _BENFORD.items())


@query(
    "events_benford_audit",
    oracle=f"""
    WITH pos AS (
      SELECT CAST(CAST(floor(value) AS BIGINT) AS VARCHAR) AS s
      FROM events WHERE floor(value) >= 1
    ), digits AS (
      SELECT CAST(substr(s, 1, 1) AS INTEGER) AS digit,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM pos GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS t FROM digits
    ), exp_raw(digit, expected_raw) AS (VALUES {_BENFORD_SQL_VALUES}),
    exp_t AS (
      SELECT digit, CAST(expected_raw AS DOUBLE) AS expected FROM exp_raw
    )
    SELECT e.digit, COALESCE(d.n, 0) AS n,
           CAST(COALESCE(d.n, 0) AS DOUBLE) / tot.t AS share,
           e.expected,
           (CAST(COALESCE(d.n, 0) AS DOUBLE) / tot.t - e.expected)
           * (CAST(COALESCE(d.n, 0) AS DOUBLE) / tot.t - e.expected)
           / e.expected AS chi2_term
    FROM exp_t e LEFT JOIN digits d ON d.digit = e.digit CROSS JOIN tot
    ORDER BY e.digit
    """,
    doc="Benford first-digit audit of positive event values: observed "
        "share per leading digit vs the Benford expectation (inlined "
        "literal constants, identical doubles in both engines) with the "
        "per-digit chi-square term. Digit extraction is string-based on "
        "floor(value) — no log10 ulp hazards. Scale: map-side digit at "
        "the scan, a 9-row agg.",
)
def events_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    digits = (
        ev.filter(F.expr("floor(value) >= 1"))
        .select(
            F.expr(
                "cast(substring(cast(cast(floor(value) as bigint) as string),"
                " 1, 1) as int)"
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = digits.agg(F.sum("n").cast("bigint").alias("t"))
    exp_t = spark.createDataFrame(
        sorted(_BENFORD.items()), "digit int, expected double"
    )
    share = F.coalesce(F.col("n"), F.lit(0)).cast("double") / F.col("t")
    return (
        exp_t.join(digits, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n"),
            share.alias("share"),
            "expected",
            (
                (share - F.col("expected"))
                * (share - F.col("expected"))
                / F.col("expected")
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


# --------------------------------------------------- Markov entropy rate ---
#
# The information rate of the user journey: H = sum_s pi(s) * H(row_s)
# with pi the power-iteration stationary vector (events_markov_stationary's
# exact scaled-integer discipline) and H(row) = -sum_d p log2 p computed
# with the corrected Mitchell log over the SCALED-INTEGER transition
# probabilities — libm-free, so the per-state entropies and the final
# rate are bit-identical across engines. A low rate with high stationary
# mass flags deterministic bot journeys (cf. events_bot_regularity);
# a uniform-ish rate is organic browsing. Corpus-scale work is the one
# lag-window transition count; every later frame is |types|-sized.


def _ent_oracle() -> str:
    from .lm import _mlog2c_q

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
    logp = _mlog2c_q("p_scaled")
    log_s = _mlog2c_q(f"CAST({MK_SCALE} AS BIGINT)")
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
    ), r0 AS (
      SELECT src AS state,
             CAST({MK_SCALE} // (SELECT COUNT(*) FROM rt) AS BIGINT) AS mass
      FROM rt
    ),{','.join(steps)},
    hrow AS (
      SELECT src AS state,
             CAST(SUM(p_scaled * ({log_s} - {logp})) AS BIGINT) AS h_num
      FROM model WHERE p_scaled > 0 GROUP BY src
    )
    SELECT h.state,
           CAST(r.mass AS DOUBLE) / {MK_SCALE} AS stationary,
           CAST(h.h_num AS DOUBLE) / ({MK_SCALE} * 1000000.0)
             AS h_row_bits,
           CAST(SUM(CAST(r.mass AS DECIMAL(38, 0)) * h.h_num)
                OVER () AS DOUBLE)
             / (CAST({MK_SCALE} AS DOUBLE) * {MK_SCALE} * 1000000.0)
             AS entropy_rate_bits
    FROM hrow h JOIN r{MK_ITERS} r USING (state)
    ORDER BY h.state
    """


@query(
    "events_entropy_rate",
    oracle=_ent_oracle(),
    doc=f"Markov entropy rate of the user-journey chain: per-state row "
        f"entropy H(row) = -sum p log2 p over the scaled-integer "
        f"transition matrix (corrected Mitchell log — libm-free, "
        f"bit-identical across engines) and the chain rate "
        f"sum pi(s)H(row_s) with pi the {MK_ITERS}-step power iterate. "
        "The DECIMAL(38,0) fold keeps the pi x H products exact at any "
        "state-space size. Low rate + high mass = deterministic bot "
        "journeys; corpus-scale work is the one lag-window pass.",
)
def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .lm import _mlog2c_q_spark

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
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
        .localCheckpoint(eager=False)
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
    log_s = _mlog2c_q_spark(f"CAST({MK_SCALE} AS BIGINT)")
    logp = _mlog2c_q_spark("p_scaled")
    hrow = (
        model.filter(F.col("p_scaled") > 0)
        .groupBy(F.col("src").alias("state"))
        .agg(
            F.expr(f"CAST(sum(p_scaled * ({log_s} - {logp})) AS BIGINT)")
            .alias("h_num")
        )
    )
    joined = hrow.join(r, "state")
    rate = joined.agg(
        F.expr(
            "CAST(sum(CAST(mass AS DECIMAL(38,0)) * h_num) AS DOUBLE)"
        ).alias("rate_num")
    )
    return (
        joined.crossJoin(F.broadcast(rate))
        .select(
            "state",
            (F.col("mass").cast("double") / F.lit(float(MK_SCALE))).alias(
                "stationary"
            ),
            (
                F.col("h_num").cast("double")
                / F.lit(float(MK_SCALE) * 1_000_000.0)
            ).alias("h_row_bits"),
            (
                F.col("rate_num")
                / F.lit(float(MK_SCALE) * float(MK_SCALE) * 1_000_000.0)
            ).alias("entropy_rate_bits"),
        )
        .orderBy("state")
    )


# ------------------------------------------------------- value-Gini audit --
#
# Concentration of event value per type as an EXACT Gini over the
# cent-quantized value (round(value*100)): group to the (type, cent)
# grid — bounded by the VALUE DOMAIN, not the corpus — then fold tie
# blocks with integer rank sums: a block of c copies of value v whose
# predecessors count k contributes v * (c*k + c(c+1)/2) to the rank-
# weighted sum regardless of intra-block order, so the statistic is
# exact under ties and deterministic under any partitioning. Products
# accumulate in DECIMAL(38,0) (n^2-scale rank sums overflow int64 at
# corpus scale). The only window runs over the bounded grid.


@query(
    "events_value_gini",
    oracle="""
    WITH q AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vb
      FROM events WHERE value >= 0
    ), grid AS (
      SELECT event_type, vb, CAST(COUNT(*) AS BIGINT) AS c
      FROM q GROUP BY event_type, vb
    ), cum AS (
      SELECT event_type, vb, c,
             CAST(COALESCE(SUM(c) OVER (PARTITION BY event_type
               ORDER BY vb ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS k
      FROM grid
    ), agg AS (
      SELECT event_type,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(CAST(vb AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(vb AS DECIMAL(38,0))
                  * (c * k + c * (c + 1) / 2)) AS DECIMAL(38,0)) AS srx
      FROM cum GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(sx AS DOUBLE) / 100.0 / n AS mean_value,
           CASE WHEN sx > 0 THEN
             (2.0 * CAST(srx AS DOUBLE) - (n + 1.0) * CAST(sx AS DOUBLE))
               / (n * CAST(sx AS DOUBLE))
           END AS gini
    FROM agg ORDER BY event_type
    """,
    doc="Exact Gini concentration of event value per type over the "
        "cent-quantized grid: tie blocks fold with closed-form integer "
        "rank sums (c*k + c(c+1)/2), so the coefficient is exact under "
        "ties and independent of partitioning; DECIMAL(38,0) carries the "
        "n^2-scale products. The only window runs over the (type, cent) "
        "grid — bounded by the value domain, never the corpus. High "
        "Gini = a few whale events carry the type's value mass.",
)
def events_value_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    grid = (
        ev.filter(F.col("value") >= 0)
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("vb"),
        )
        .groupBy("event_type", "vb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("vb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = grid.withColumn(
        "k", F.coalesce(F.sum("c").over(w), F.lit(0)).cast("bigint")
    )
    agg = cum.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.expr("CAST(sum(CAST(vb AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))")
        .alias("sx"),
        F.expr(
            "CAST(sum(CAST(vb AS DECIMAL(38,0))"
            " * (c * k + c * (c + 1) div 2)) AS DECIMAL(38,0))"
        ).alias("srx"),
    )
    return agg.select(
        "event_type",
        "n",
        (F.col("sx").cast("double") / 100.0 / F.col("n")).alias("mean_value"),
        F.when(
            F.col("sx") > 0,
            (
                2.0 * F.col("srx").cast("double")
                - (F.col("n") + 1.0) * F.col("sx").cast("double")
            )
            / (F.col("n") * F.col("sx").cast("double")),
        ).alias("gini"),
    ).orderBy("event_type")


# ------------------------------------------------ Wilson conversion CI -----
#
# Per-event-type conversion proportion with the Wilson 95% score
# interval — the interval that behaves at small n and extreme p where
# the Wald CI collapses. Conversion: of the distinct users who emitted
# the type, the share who ever purchased. All inputs are exact distinct
# counts; z is a shared literal; sqrt is correctly-rounded IEEE — the
# bounds are bit-identical across engines. Two distinct-aggs + a
# |types|-row fold; the purchaser set rides a broadcast semi-join.

WILSON_Z = 1.96


@query(
    "events_wilson_ci",
    oracle=f"""
    WITH buyers AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ), peruser AS (
      SELECT DISTINCT e.event_type, e.user_id,
             (b.user_id IS NOT NULL) AS converted
      FROM events e LEFT JOIN buyers b ON b.user_id = e.user_id
      WHERE e.event_type <> 'purchase'
    ), agg AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(COUNT(*) FILTER (WHERE converted) AS BIGINT) AS n_conv
      FROM peruser GROUP BY event_type
    )
    SELECT event_type, n_users, n_conv,
           CAST(n_conv AS DOUBLE) / n_users AS p,
           ((CAST(n_conv AS DOUBLE) / n_users)
              + {WILSON_Z} * {WILSON_Z} / (2.0 * n_users)
            - {WILSON_Z} * sqrt(
                (CAST(n_conv AS DOUBLE) / n_users)
                * (1.0 - CAST(n_conv AS DOUBLE) / n_users) / n_users
                + {WILSON_Z} * {WILSON_Z}
                  / (4.0 * n_users * CAST(n_users AS DOUBLE))))
           / (1.0 + {WILSON_Z} * {WILSON_Z} / n_users) AS wilson_lo,
           ((CAST(n_conv AS DOUBLE) / n_users)
              + {WILSON_Z} * {WILSON_Z} / (2.0 * n_users)
            + {WILSON_Z} * sqrt(
                (CAST(n_conv AS DOUBLE) / n_users)
                * (1.0 - CAST(n_conv AS DOUBLE) / n_users) / n_users
                + {WILSON_Z} * {WILSON_Z}
                  / (4.0 * n_users * CAST(n_users AS DOUBLE))))
           / (1.0 + {WILSON_Z} * {WILSON_Z} / n_users) AS wilson_hi
    FROM agg ORDER BY event_type
    """,
    doc="Conversion proportion per event type (distinct users emitting "
        "the type who ever purchase) with the Wilson 95% score interval "
        "— well-behaved at small n and extreme p where Wald collapses. "
        "Exact distinct counts in, correctly-rounded sqrt, shared "
        "z literal: bounds bit-identical across engines. The purchaser "
        "set is a semi-join side; everything after is |types| rows.",
)
def events_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select(
        "user_id"
    ).distinct()
    peruser = (
        ev.filter(F.col("event_type") != "purchase")
        .select("event_type", "user_id")
        .distinct()
        .join(
            F.broadcast(buyers.withColumn("conv", F.lit(True))),
            "user_id",
            "left",
        )
        .select("event_type", F.coalesce("conv", F.lit(False)).alias("conv"))
    )
    agg = peruser.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count(F.when(F.col("conv"), 1)).cast("bigint").alias("n_conv"),
    )
    z = F.lit(WILSON_Z)
    p = F.col("n_conv").cast("double") / F.col("n_users")
    half = z * F.sqrt(
        p * (F.lit(1.0) - p) / F.col("n_users")
        + z * z / (F.lit(4.0) * F.col("n_users") * F.col("n_users").cast("double"))
    )
    denom = F.lit(1.0) + z * z / F.col("n_users")
    center = p + z * z / (F.lit(2.0) * F.col("n_users"))
    return agg.select(
        "event_type",
        "n_users",
        "n_conv",
        p.alias("p"),
        ((center - half) / denom).alias("wilson_lo"),
        ((center + half) / denom).alias("wilson_hi"),
    ).orderBy("event_type")


# -------------------------------------------------- exact grid quantiles ---
#
# Exact P50/P90/P99 of event value per type WITHOUT a corpus-sized sort:
# fold to the (type, cent) grid — bounded by the value domain — take
# cumulative counts over the grid, and pick the smallest cent with
# cum >= ceil(q*n) (the lower exact quantile, type-7-floor convention).
# The deterministic, scale-safe alternative to percentile_approx when
# the value domain is bounded: no sketch error, no global sort, the one
# window runs over the grid. Quantile ranks are exact integer ceils
# (ceil(q*n) = (n*num + den - 1) div den with rational q), so both
# engines pick identical grid cells.

QUANTILE_QS = [(1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99")]


@query(
    "events_exact_quantiles",
    oracle=f"""
    WITH q AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vb
      FROM events WHERE value >= 0
    ), grid AS (
      SELECT event_type, vb, CAST(COUNT(*) AS BIGINT) AS c
      FROM q GROUP BY event_type, vb
    ), cum AS (
      SELECT event_type, vb, c,
             CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY vb
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum,
             CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM grid
    )
    SELECT event_type, MAX(n) AS n,
           {", ".join(
             f'''CAST(MIN(CASE WHEN cum >= (n * {num} + {den} - 1) // {den}
                 THEN vb END) AS DOUBLE) / 100.0 AS {name}'''
             for num, den, name in QUANTILE_QS)}
    FROM cum GROUP BY event_type ORDER BY event_type
    """,
    doc="Exact P50/P90/P99 of event value per type from the cent-"
        "quantized grid: cumulative counts over the (type, cent) frame "
        "— bounded by the VALUE DOMAIN, never the corpus — and the "
        "smallest cell reaching ceil(q*n) picked with exact integer "
        "rank arithmetic. No sketch error, no global sort; the "
        "deterministic scale-safe alternative to percentile_approx for "
        "bounded-domain measures (cf. sketch_hist_quantiles for the "
        "mergeable-sketch form this audits against).",
)
def events_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    grid = (
        ev.filter(F.col("value") >= 0)
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("vb"),
        )
        .groupBy("event_type", "vb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("vb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    cum = grid.select(
        "event_type",
        "vb",
        F.sum("c").over(wcum).cast("bigint").alias("cum"),
        F.sum("c").over(wall).cast("bigint").alias("n"),
    )
    aggs = [F.max("n").alias("n")]
    for num, den, name in QUANTILE_QS:
        rank = (F.col("n") * num + den - 1).cast("bigint")
        aggs.append(
            (
                F.min(
                    F.when(
                        F.col("cum") >= F.expr(f"(n * {num} + {den} - 1) div {den}"),
                        F.col("vb"),
                    )
                ).cast("double")
                / 100.0
            ).alias(name)
        )
    return cum.groupBy("event_type").agg(*aggs).orderBy("event_type")


# ------------------------------------------------ Bradley–Terry strengths --
#
# Pairwise-preference strength estimation (Bradley & Terry 1952) — the
# statistical core of RLHF reward-data analysis: given "A beat B" counts,
# recover latent strengths p with P(A beats B) = p_a / (p_a + p_b) via the
# classic MM fixed point p_i' = W_i / Σ_j n_ij/(p_i+p_j) (Hunter 2004).
# Comparisons here: within each user, event type A "beats" B when A's
# mean value exceeds B's — decided exactly by the integer cross-multiply
# s_a·n_b > s_b·n_a on cent-quantized sums (no division, no ties lost to
# float noise). The distributed work is the per-(user,type) aggregate and
# the per-user pair generation (≤ |types|² rows per user, |types| is
# small and fixed); the resulting wins matrix is |types|² METADATA, so
# the MM iterations run driver-side in arbitrary-precision integers
# (the bounded-collect discipline of the Lloyd trainer) and the oracle
# mirrors them in HUGEINT chained CTEs: every step is an exact integer
# floor-division on non-negative values, so both engines agree
# bit-for-bit. At 100 TB the matrix is still |types|² rows — the
# fixed point never touches the corpus again.

BT_ITERS = 8
BT_PSCALE = 1_000_000            # strength fixed-point scale
_BT_TP = 10**12                  # T_SCALE * P_SCALE folded into one literal

_BT_BASE_SQL = f"""
    ut AS (
      SELECT user_id, event_type,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id, event_type
    ), pw AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             CAST(SUM(CASE WHEN a.s * b.n > b.s * a.n
                           THEN 1 ELSE 0 END) AS BIGINT) AS wa,
             CAST(SUM(CASE WHEN a.s * b.n < b.s * a.n
                           THEN 1 ELSE 0 END) AS BIGINT) AS wb
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY ta, tb
    ), m AS MATERIALIZED (
      SELECT ta AS i, tb AS j, wa + wb AS nij FROM pw WHERE wa + wb > 0
      UNION ALL
      SELECT tb, ta, wa + wb FROM pw WHERE wa + wb > 0
    ), types AS (
      SELECT DISTINCT i FROM m
    ), wins AS (
      SELECT t.i, CAST(COALESCE(SUM(v.w), 0) AS BIGINT) AS w
      FROM types t LEFT JOIN (
        SELECT ta AS i, wa AS w FROM pw
        UNION ALL SELECT tb, wb FROM pw
      ) v USING (i) GROUP BY t.i
    ), cmp AS (
      SELECT i, CAST(SUM(nij) AS BIGINT) AS c FROM m GROUP BY i
    ), nt AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS nk FROM types
    ), p0 AS MATERIALIZED (
      SELECT i, w, CAST({BT_PSCALE} AS HUGEINT) AS p FROM wins
    )
"""

_BT_ITER_SQL = f"""
    , d{{k}} AS MATERIALIZED (
      SELECT m.i,
             CAST(SUM((CAST(m.nij AS HUGEINT) * {_BT_TP})
                      // (pi.p + pj.p)) AS HUGEINT) AS d
      FROM m JOIN p{{prev}} pi ON pi.i = m.i
             JOIN p{{prev}} pj ON pj.i = m.j
      GROUP BY m.i
    ), raw{{k}} AS MATERIALIZED (
      SELECT t.i, t.w,
             CASE WHEN t.w = 0 THEN CAST(0 AS HUGEINT)
                  ELSE (CAST(t.w AS HUGEINT) * {_BT_TP}) // dd.d
             END AS pr
      FROM p{{prev}} t JOIN d{{k}} dd ON dd.i = t.i
    ), p{{k}} AS MATERIALIZED (
      SELECT i, w,
             CASE WHEN SUM(pr) OVER () = 0 THEN CAST({BT_PSCALE} AS HUGEINT)
                  ELSE GREATEST(CAST(1 AS HUGEINT),
                                (pr * (SELECT nk FROM nt) * {BT_PSCALE})
                                // SUM(pr) OVER ()) END AS p
      FROM raw{{k}}
    )
"""

_BT_ORACLE = (
    "WITH "
    + _BT_BASE_SQL
    + "".join(
        _BT_ITER_SQL.format(k=k, prev=k - 1) for k in range(1, BT_ITERS + 1)
    )
    + f"""
    SELECT t.i AS event_type,
           t.w AS wins,
           CAST(c.c - t.w AS BIGINT) AS losses,
           c.c AS comparisons,
           CAST(t.p AS BIGINT) AS strength_scaled,
           CAST(t.p AS DOUBLE) / {BT_PSCALE} AS strength
    FROM p{BT_ITERS} t JOIN cmp c ON c.i = t.i
    ORDER BY event_type
    """
)


@query(
    "events_bradley_terry",
    oracle=_BT_ORACLE,
    doc="Bradley–Terry preference strengths over event types (the RLHF "
        "reward-data statistic): per-user mean-value comparisons decided "
        "by exact integer cross-multiply on cent sums, aggregated to a "
        "|types|² wins matrix in one distributed pass, then 8 Hunter-MM "
        "fixed-point rounds in exact integer arithmetic (floor divisions "
        "on non-negative scaled values — Python bigints on the driver, "
        "HUGEINT chained CTEs in the oracle, identical bits). The "
        "corpus-sized work is one aggregate + one bounded per-user pair "
        "join; the iteration input is metadata.",
)
def events_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    ut = ev.groupBy("user_id", "event_type").agg(
        F.sum("cents").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    a, b = ut.alias("a"), ut.alias("b")
    pw = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ta"),
            F.col("b.event_type").alias("tb"),
        )
        .agg(
            F.sum(
                (F.col("a.s") * F.col("b.n") > F.col("b.s") * F.col("a.n"))
                .cast("bigint")
            ).alias("wa"),
            F.sum(
                (F.col("a.s") * F.col("b.n") < F.col("b.s") * F.col("a.n"))
                .cast("bigint")
            ).alias("wb"),
        )
    )
    # bounded collect: the wins matrix is |types|² rows of METADATA
    # (|types| is the event-type vocabulary, ~5) — the corpus never
    # feeds the fixed point again.
    rows = pw.collect()
    m: dict[tuple[str, str], int] = {}
    wins: dict[str, int] = {}
    for r in rows:
        nij = int(r["wa"]) + int(r["wb"])
        if nij > 0:
            m[(r["ta"], r["tb"])] = nij
            m[(r["tb"], r["ta"])] = nij
            wins.setdefault(r["ta"], 0)
            wins.setdefault(r["tb"], 0)
    for r in rows:
        if r["ta"] in wins:
            wins[r["ta"]] += int(r["wa"])
        if r["tb"] in wins:
            wins[r["tb"]] += int(r["wb"])
    types = sorted(wins)
    nt = len(types)
    cmp = {i: sum(n for (ii, _), n in m.items() if ii == i) for i in types}
    p = {i: BT_PSCALE for i in types}
    for _ in range(BT_ITERS):
        d = {
            i: sum(
                (nij * _BT_TP) // (p[i] + p[j])
                for (ii, j), nij in m.items()
                if ii == i
            )
            for i in types
        }
        raw = {
            i: 0 if wins[i] == 0 else (wins[i] * _BT_TP) // d[i]
            for i in types
        }
        tot = sum(raw.values())
        # Degenerate all-ties guard: tot == 0 with nonempty types cannot
        # happen (any m entry has nij > 0, i.e. a strict win, so some
        # wins[i] > 0 ⇒ some raw[i] > 0), but guard anyway — uniform
        # strengths instead of ZeroDivisionError; oracle mirrors it.
        if tot == 0:
            p = {i: BT_PSCALE for i in types}
        else:
            p = {i: max(1, (raw[i] * nt * BT_PSCALE) // tot) for i in types}
    out = [
        (
            i,
            wins[i],
            cmp[i] - wins[i],
            cmp[i],
            p[i],
            float(p[i]) / BT_PSCALE,
        )
        for i in types
    ]
    return spark.createDataFrame(
        out,
        "event_type string, wins bigint, losses bigint, comparisons bigint,"
        " strength_scaled bigint, strength double",
    ).orderBy("event_type")


# ------------------------------------------------------- SPRT boundary -----
#
# Wald's sequential probability ratio test over the daily event stream —
# the early-stopping monitor for always-on experimentation: for each
# event type, accumulate the log-likelihood ratio of "this type's
# success rate is LIFT× the global rate" (H1) vs "it equals the global
# rate" (H0) day by day, and report the first day the cumulative LLR
# crosses ±log(19) (α = β = 0.05) — reject_null (lifted), accept_null
# (not lifted), or continue. With LIFT = 2 the per-success increment is
# exactly log2(2) = 1 bit; the per-failure increment
# log2((1−2p0)/(1−p0)) and the boundary log2(19) use the suite's
# Mitchell bit-length log over INTEGER totals (libm-free, quantized to
# 1e6 before the exact BIGINT fold), so the whole trajectory is
# bit-identical in both engines. Work shape: one daily hash agg, one
# per-type cumulative window (day grain — bounded rows per type), one
# final agg. Degenerate guard: GREATEST(·, 1) clamps the H1 failure
# mass when p0 ≥ 1/2 would make a 2× lift impossible.

SPRT_SUCCESS_CENTS = 25000   # success: cent-quantized value >= this
_SPRT_BOUND_ARG = "19"       # A = log2(19) ⇒ α = β = 0.05

from .lm import _mlog2_q as _sprt_mlog_sql  # noqa: E402
from .lm import _mlog2_q_spark as _sprt_mlog_spark  # noqa: E402

_SPRT_L0_SQL = (
    _sprt_mlog_sql("GREATEST(n0 - 2 * s0, CAST(1 AS BIGINT))")
    + " - "
    + _sprt_mlog_sql("GREATEST(n0 - s0, CAST(1 AS BIGINT))")
)
_SPRT_L0_SPARK = (
    _sprt_mlog_spark("greatest(n0 - 2 * s0, cast(1 as bigint))")
    + " - "
    + _sprt_mlog_spark("greatest(n0 - s0, cast(1 as bigint))")
)


@query(
    "events_sprt_boundary",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CASE WHEN round(value * 100) >= {SPRT_SUCCESS_CENTS}
                  THEN 1 ELSE 0 END AS sc
      FROM events
    ), tot AS (
      SELECT CAST(SUM(sc) AS BIGINT) AS s0,
             CAST(COUNT(*) AS BIGINT) AS n0 FROM ev
    ), consts AS (
      SELECT CAST(1000000 AS BIGINT) AS l1,
             CAST({_SPRT_L0_SQL} AS BIGINT) AS l0,
             CAST({_sprt_mlog_sql(_SPRT_BOUND_ARG)} AS BIGINT) AS bound
      FROM tot
    ), daily AS (
      SELECT event_type, d,
             CAST(SUM(sc) AS BIGINT) AS k,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ev GROUP BY event_type, d
    ), llr AS (
      SELECT event_type, d, k, n,
             SUM(k * (SELECT l1 FROM consts)
                 + (n - k) * (SELECT l0 FROM consts))
               OVER (PARTITION BY event_type ORDER BY d) AS cum
      FROM daily
    ), x AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(k) AS BIGINT) AS successes,
             CAST(SUM(n) AS BIGINT) AS trials,
             MIN(CASE WHEN cum >= (SELECT bound FROM consts)
                      THEN d END) AS rej_day,
             MIN(CASE WHEN cum <= -(SELECT bound FROM consts)
                      THEN d END) AS acc_day,
             CAST(max_by(cum, d) AS BIGINT) AS llr_final_scaled
      FROM llr GROUP BY event_type
    )
    SELECT event_type, n_days, successes, trials, llr_final_scaled,
           CAST(llr_final_scaled AS DOUBLE) / 1000000.0 AS llr_final_bits,
           CASE WHEN rej_day IS NOT NULL
                     AND (acc_day IS NULL OR rej_day <= acc_day)
                THEN 'reject_null'
                WHEN acc_day IS NOT NULL THEN 'accept_null'
                ELSE 'continue' END AS decision,
           CASE WHEN rej_day IS NOT NULL
                     AND (acc_day IS NULL OR rej_day <= acc_day)
                THEN rej_day ELSE acc_day END AS decision_day
    FROM x ORDER BY event_type
    """,
    doc="Wald SPRT early-stopping monitor per event type: daily "
        "cumulative log-likelihood ratio of a 2× success-rate lift vs "
        "the global rate, first crossing of ±log2(19) (α = β = 0.05) "
        "reported as reject_null / accept_null / continue with the "
        "decision day. Per-success increment is exactly 1 bit; failure "
        "increment and boundary use the Mitchell integer log (libm-"
        "free, 1e6-quantized) so the trajectory is bit-identical across "
        "engines. One daily agg + one bounded per-type window.",
)
def events_sprt_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("d"),
        (F.round(F.col("value") * 100) >= SPRT_SUCCESS_CENTS)
        .cast("int")
        .alias("sc"),
    )
    tot = ev.agg(
        F.sum("sc").cast("bigint").alias("s0"),
        F.count(F.lit(1)).cast("bigint").alias("n0"),
    )
    consts = tot.select(
        F.lit(1000000).cast("bigint").alias("l1"),
        F.expr(_SPRT_L0_SPARK).cast("bigint").alias("l0"),
        F.expr(_sprt_mlog_spark(_SPRT_BOUND_ARG)).cast("bigint").alias("bound"),
    )
    daily = ev.groupBy("event_type", "d").agg(
        F.sum("sc").cast("bigint").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    # one bounded 1-row broadcast: the three LLR constants
    w = Window.partitionBy("event_type").orderBy("d")
    llr = (
        daily.crossJoin(F.broadcast(consts))
        .select(
            "event_type",
            "d",
            "k",
            "n",
            "bound",
            F.sum(
                F.col("k") * F.col("l1") + (F.col("n") - F.col("k")) * F.col("l0")
            )
            .over(w)
            .alias("cum"),
        )
    )
    x = llr.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("k").cast("bigint").alias("successes"),
        F.sum("n").cast("bigint").alias("trials"),
        F.min(F.when(F.col("cum") >= F.col("bound"), F.col("d"))).alias("rej_day"),
        F.min(F.when(F.col("cum") <= -F.col("bound"), F.col("d"))).alias("acc_day"),
        F.expr("max_by(cum, d)").cast("bigint").alias("llr_final_scaled"),
    )
    rej_first = F.col("rej_day").isNotNull() & (
        F.col("acc_day").isNull() | (F.col("rej_day") <= F.col("acc_day"))
    )
    return x.select(
        "event_type",
        "n_days",
        "successes",
        "trials",
        "llr_final_scaled",
        (F.col("llr_final_scaled").cast("double") / 1000000.0).alias(
            "llr_final_bits"
        ),
        F.when(rej_first, F.lit("reject_null"))
        .when(F.col("acc_day").isNotNull(), F.lit("accept_null"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
        F.when(rej_first, F.col("rej_day"))
        .otherwise(F.col("acc_day"))
        .alias("decision_day"),
    ).orderBy("event_type")


# ------------------------------------------------------ uplift / Qini ------
#
# Uplift-modeling decile diagnostics (Radcliffe's Qini): rank users by a
# targeting score, split them into deciles, and ask where the TREATED
# conversion lift over control concentrates — the standard report for
# "did the targeting model find the persuadables, or just the sure
# things". Honest temporal design: the score is PRE-period activity
# (events before the data midpoint), the outcome is a POST-period
# purchase, and treatment is a deterministic 50% hash split — no
# leakage between score and outcome windows. Deciles come from the
# distributed exact global rank (_global_rank + _ntile_from_rank — no
# single-task window; the oracle's plain ntile over the same total
# order is the spec). Cumulative Qini = Ct − Cc·Nt/Nc and cumulative
# uplift are exact-integer-input IEEE divisions, NULLIF-guarded for
# empty control cells in BOTH engines.

QINI_Q = 10
_QINI_SALT = "qini-v1:"


@query(
    "events_uplift_qini",
    oracle=f"""
    WITH span AS (
      SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
      FROM events
    ), mid AS (
      SELECT d0 + CAST((datediff('day', d0, d1) + 1) // 2 AS INTEGER) AS m
      FROM span
    ), pre AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS score
      FROM events WHERE CAST(ts AS DATE) < (SELECT m FROM mid)
      GROUP BY user_id
    ), post AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase'
        AND CAST(ts AS DATE) >= (SELECT m FROM mid)
    ), u AS (
      SELECT p.user_id, p.score,
             CASE WHEN substr(md5('{_QINI_SALT}' || p.user_id::VARCHAR),
                              1, 1) < '8'
                  THEN 1 ELSE 0 END AS treated,
             CASE WHEN po.user_id IS NOT NULL THEN 1 ELSE 0 END AS conv
      FROM pre p LEFT JOIN post po USING (user_id)
    ), dec AS (
      SELECT user_id, treated, conv,
             ntile({QINI_Q}) OVER (ORDER BY score DESC, user_id) AS decile
      FROM u
    ), agg AS (
      SELECT decile,
             CAST(SUM(treated) AS BIGINT) AS n_t,
             CAST(SUM(1 - treated) AS BIGINT) AS n_c,
             CAST(SUM(treated * conv) AS BIGINT) AS conv_t,
             CAST(SUM((1 - treated) * conv) AS BIGINT) AS conv_c
      FROM dec GROUP BY decile
    ), cum AS (
      SELECT decile, n_t, n_c, conv_t, conv_c,
             SUM(n_t) OVER w AS cnt, SUM(n_c) OVER w AS cnc,
             SUM(conv_t) OVER w AS cct, SUM(conv_c) OVER w AS ccc
      FROM agg WINDOW w AS (ORDER BY decile
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW)
    )
    SELECT CAST(decile AS INT) AS decile, n_t, n_c, conv_t, conv_c,
           CAST(cct AS DOUBLE)
             - CAST(ccc AS DOUBLE) * cnt / NULLIF(cnc, 0) AS qini_cum,
           CAST(cct AS DOUBLE) / NULLIF(cnt, 0)
             - CAST(ccc AS DOUBLE) / NULLIF(cnc, 0) AS uplift_cum
    FROM cum ORDER BY decile
    """,
    doc="Qini decile report for uplift targeting: pre-period activity "
        "score, post-period purchase outcome, deterministic 50% hash "
        "treatment split (temporal firewall between score and outcome "
        "windows). Deciles from the distributed exact global rank (no "
        "single-task window; the oracle's ntile over the same total "
        "order is the spec); cumulative Qini and uplift are exact-"
        "integer-input IEEE divisions with NULLIF guards in both "
        "engines.",
)
def events_uplift_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("date").alias("d")
    )
    span = ev.agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    ).select(
        F.expr("date_add(d0, cast((datediff(d1, d0) + 1) div 2 as int))").alias("m")
    )
    # one bounded 1-row broadcast: the period midpoint
    evm = ev.crossJoin(F.broadcast(span))
    pre = (
        evm.filter(F.col("d") < F.col("m"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("score"))
    )
    post = (
        evm.filter(
            (F.col("event_type") == "purchase") & (F.col("d") >= F.col("m"))
        )
        .select("user_id")
        .distinct()
        .withColumn("conv1", F.lit(1))
    )
    u = (
        pre.join(post, "user_id", "left")
        .select(
            "user_id",
            "score",
            (
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(_QINI_SALT), F.col("user_id").cast("string")
                        )
                    ),
                    1,
                    1,
                )
                < "8"
            )
            .cast("int")
            .alias("treated"),
            F.coalesce(F.col("conv1"), F.lit(0)).alias("conv"),
        )
    )
    n_row = u.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    ranked = _global_rank(
        u, (F.col("score").desc(), F.col("user_id"))
    ).crossJoin(F.broadcast(n_row))
    dec = ranked.withColumn(
        "decile", _ntile_from_rank("_grank", "_n", QINI_Q)
    )
    agg = dec.groupBy("decile").agg(
        F.sum("treated").cast("bigint").alias("n_t"),
        F.sum(1 - F.col("treated")).cast("bigint").alias("n_c"),
        F.sum(F.col("treated") * F.col("conv")).cast("bigint").alias("conv_t"),
        F.sum((1 - F.col("treated")) * F.col("conv"))
        .cast("bigint")
        .alias("conv_c"),
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )  # QINI_Q rows — bounded by construction
    cum = agg.select(
        "decile",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.sum("n_t").over(wc).alias("cnt"),
        F.sum("n_c").over(wc).alias("cnc"),
        F.sum("conv_t").over(wc).alias("cct"),
        F.sum("conv_c").over(wc).alias("ccc"),
    )
    return cum.select(
        F.col("decile").cast("int").alias("decile"),
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.expr(
            "CAST(cct AS DOUBLE)"
            " - CAST(ccc AS DOUBLE) * cnt / NULLIF(cnc, 0)"
        ).alias("qini_cum"),
        F.expr(
            "CAST(cct AS DOUBLE) / NULLIF(cnt, 0)"
            " - CAST(ccc AS DOUBLE) / NULLIF(cnc, 0)"
        ).alias("uplift_cum"),
    ).orderBy("decile")


# ------------------------------------------ Mantel-Haenszel pooled OR ------
#
# The Mantel-Haenszel common odds ratio (Mantel & Haenszel 1959) — the
# stratified-experiment estimator that answers "does click expose a
# higher success rate than view, CONTROLLING for day?" without the
# Simpson's-paradox trap a pooled 2x2 walks into. Strata are days; per
# stratum the 2x2 is (exposure = click vs view) x (success = value
# cents >= the SPRT threshold); OR_MH = sum_i(a_i*d_i/n_i) /
# sum_i(b_i*c_i/n_i).
#
# Determinism: each stratum term a*d/n is quantized to the 1e6 grid in
# DOUBLE — the product a*d*SCALE is computed as an IEEE double chain
# (never a BIGINT multiply, which wraps silently in non-ANSI Spark but
# errors in DuckDB once a*d exceeds ~9.2e12, i.e. cells past ~3e6), so
# it is overflow-free at ANY cell size and exactly rounded while
# a*d*SCALE < 2^53 (cells to ~9.4e4 per day-stratum; past that the
# double multiply rounds deterministically and IDENTICALLY in both
# engines — the term is already a 1e6-grid quantization, so the
# estimator's contract is unchanged). The rounded terms are then summed
# in BIGINT; the emitted OR is one final IEEE division. Work shape: one
# filtered scan + one (day)-keyed hash agg + one |days|-row fold —
# nothing corpus-sized after the first aggregate.

MH_SUCCESS_CENTS = SPRT_SUCCESS_CENTS
MH_SCALE = 1_000_000


def _mh_term(x: str, y: str) -> str:
    """Stratum term ``round(x*y*SCALE/n)`` with the product chained in
    DOUBLE (overflow-free; exactly rounded while x*y*SCALE < 2^53, and
    deterministically IEEE-rounded identically in both engines beyond) —
    one shared string so the Spark plan and the DuckDB oracle evaluate
    the byte-identical expression."""
    return (
        f"CAST(round(CAST({x} AS DOUBLE) * CAST({y} AS DOUBLE) * {MH_SCALE}"
        " / (a + b + c + d_)) AS BIGINT)"
    )


@query(
    "events_mh_odds_ratio",
    oracle=f"""
    WITH cells AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CASE WHEN event_type = 'click'
                       AND round(value * 100) >= {MH_SUCCESS_CENTS}
                      THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN event_type = 'click'
                       AND round(value * 100) < {MH_SUCCESS_CENTS}
                      THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(SUM(CASE WHEN event_type = 'view'
                       AND round(value * 100) >= {MH_SUCCESS_CENTS}
                      THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN event_type = 'view'
                       AND round(value * 100) < {MH_SUCCESS_CENTS}
                      THEN 1 ELSE 0 END) AS BIGINT) AS d_
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY CAST(ts AS DATE)
    ), terms AS (
      SELECT {_mh_term("a", "d_")} AS t_ad,
             {_mh_term("b", "c")} AS t_bc,
             a, b, c, d_
      FROM cells
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(SUM(a) AS BIGINT) AS exposed_success,
           CAST(SUM(b) AS BIGINT) AS exposed_fail,
           CAST(SUM(t_ad) AS BIGINT) AS sum_ad_scaled,
           CAST(SUM(t_bc) AS BIGINT) AS sum_bc_scaled,
           CASE WHEN SUM(t_bc) = 0 THEN NULL
                ELSE CAST(SUM(t_ad) AS DOUBLE) / CAST(SUM(t_bc) AS DOUBLE)
                END AS mh_odds_ratio
    FROM terms
    """,
    doc="Mantel-Haenszel pooled odds ratio across day strata (click vs "
        "view exposure, cent-threshold success): per-stratum a*d/n and "
        "b*c/n quantized to the 1e6 grid with the product chained in "
        "DOUBLE (overflow-free at any cell size; identical IEEE chain "
        "in both engines), folded as BIGINT sums; OR is one "
        "final IEEE division. The Simpson-safe effect estimate the "
        "always-on experimentation layer reports next to the SPRT "
        "monitor. One filtered scan + day-keyed hash agg; everything "
        "after is |days|-sized.",
)
def events_mh_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            F.to_date("ts").alias("d"),
            (F.col("event_type") == "click").alias("exp"),
            (F.round(F.col("value") * 100) >= MH_SUCCESS_CENTS).alias("suc"),
        )
    )
    cells = ev.groupBy("d").agg(
        F.sum((F.col("exp") & F.col("suc")).cast("int"))
        .cast("bigint")
        .alias("a"),
        F.sum((F.col("exp") & ~F.col("suc")).cast("int"))
        .cast("bigint")
        .alias("b"),
        F.sum((~F.col("exp") & F.col("suc")).cast("int"))
        .cast("bigint")
        .alias("c"),
        F.sum((~F.col("exp") & ~F.col("suc")).cast("int"))
        .cast("bigint")
        .alias("d_"),
    )
    terms = cells.select(
        "a",
        "b",
        F.expr(_mh_term("a", "d_")).alias("t_ad"),
        F.expr(_mh_term("b", "c")).alias("t_bc"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("a").cast("bigint").alias("exposed_success"),
        F.sum("b").cast("bigint").alias("exposed_fail"),
        F.sum("t_ad").cast("bigint").alias("sum_ad_scaled"),
        F.sum("t_bc").cast("bigint").alias("sum_bc_scaled"),
        F.when(F.sum("t_bc") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.sum("t_ad").cast("double") / F.sum("t_bc").cast("double")
        )
        .alias("mh_odds_ratio"),
    )
