"""Data-layout operators: multi-dimensional clustering for scan pruning.

At 100 TB the cheapest operator is the file you never open. Iceberg (the
reference's storage layer, ``SparkUtils.java:45-51``) prunes files by
per-file column min/max stats, so WHAT ORDER rows are written in decides
how many files a selective query touches: a time-linear layout gives tight
``ts`` ranges but every file spans all users; a Z-order (Morton) layout
interleaves the bits of both dimensions so every file is a small rectangle
in (user, day) space and point/range predicates on EITHER column skip most
files.

``layout_zorder_stats`` computes, for the same event table, the per-file
min/max envelopes under both layouts — the exact numbers an Iceberg
``rewrite_data_files(strategy => 'sort', sort_order => zorder(...))``
maintenance pass would produce, and the direct input to a "fraction of
files a point query must open" estimate.

Scale shape: the file assignment is NOT a global-window sort. Both sort
keys here are bounded integers (Morton code of 8+5 bits; day index), so
the layout is computed as: (1) a metadata-sized key histogram (one
map-side-combined count), (2) a running offset over that tiny register
frame, (3) a broadcast join back + a per-key rank window (thousands of
independent key partitions, no straggler), giving every row its exact
global position without ever funneling the corpus through one reducer —
the same register discipline as the histogram-quantile sketch. The oracle
states the identical assignment as one global ROW_NUMBER, which DuckDB can
afford at oracle scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

N_FILES = 32          # target files per layout
EPOCH = "2024-01-01"  # day index origin (events fixture starts here)

# Morton interleave: user bit b -> position 2b, day bit b -> position 2b+1.
# user_id needs 8 bits at fixture scale, day 5; spans are validated by the
# n_rows invariant (every row lands in exactly one file regardless).
_Z_SPARK = " + ".join(
    f"(shiftright(u, {b}) % 2) * {1 << (2 * b)}"
    f" + (shiftright(d, {b}) % 2) * {1 << (2 * b + 1)}"
    for b in range(8)
)
_Z_SQL = " + ".join(
    f"((u >> {b}) & 1) * {1 << (2 * b)} + ((d >> {b}) & 1) * {1 << (2 * b + 1)}"
    for b in range(8)
)


def _assign_files(ev: DataFrame, key: str) -> DataFrame:
    """file_id = ((global_rank - 1) * N_FILES) // n over (key, event_id)
    order, computed without a global window: histogram offsets + per-key
    rank. Exact because keys are processed in order and ties are ranked by
    event_id inside their key partition."""
    regs = ev.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    w_off = (
        Window.orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = regs.select(
        key,
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off"),
        F.sum("cnt").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    rk = Window.partitionBy(key).orderBy("event_id")
    return (
        ev.join(F.broadcast(offs), key)
        .withColumn("rk", F.row_number().over(rk))
        .withColumn(
            "file_id",
            (
                (F.col("off") + F.col("rk") - 1) * N_FILES / F.col("n")
            ).cast("long"),
        )
    )


@query(
    "layout_zorder_stats",
    oracle=f"""
    WITH ev AS (
      SELECT event_id, user_id AS u,
             CAST(date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                  AS BIGINT) AS d
      FROM events
    ), keyed AS (
      SELECT *, CAST({_Z_SQL} AS BIGINT) AS zkey FROM ev
    ), assigned AS (
      SELECT 'linear' AS layout, u, d,
             CAST(((ROW_NUMBER() OVER (ORDER BY d, event_id) - 1)
                   * {N_FILES}) // COUNT(*) OVER () AS BIGINT) AS file_id
      FROM keyed
      UNION ALL
      SELECT 'zorder' AS layout, u, d,
             CAST(((ROW_NUMBER() OVER (ORDER BY zkey, event_id) - 1)
                   * {N_FILES}) // COUNT(*) OVER () AS BIGINT) AS file_id
      FROM keyed
    )
    SELECT layout, file_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(u) AS BIGINT) AS u_min, CAST(MAX(u) AS BIGINT) AS u_max,
           CAST(MIN(d) AS BIGINT) AS d_min, CAST(MAX(d) AS BIGINT) AS d_max,
           CAST(MAX(u) - MIN(u) AS BIGINT) AS u_span,
           CAST(MAX(d) - MIN(d) AS BIGINT) AS d_span
    FROM assigned GROUP BY layout, file_id
    """,
    doc=f"Z-order vs time-linear layout: assign events to {N_FILES} files "
        "under each ordering and report the per-file (user, day) min/max "
        "envelope — the stats Iceberg prunes scans with. Z-order files "
        "are rectangles in both dimensions (small u_span AND d_span); "
        "linear files span all users. Assignment uses bounded-key "
        "histogram offsets + per-key ranks, never a global single-reducer "
        "window.",
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("user_id").alias("u"),
        F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date"))
        .cast("long")
        .alias("d"),
    )
    keyed = ev.withColumn("zkey", F.expr(_Z_SPARK).cast("long"))

    def stats(assigned: DataFrame, name: str) -> DataFrame:
        return assigned.groupBy("file_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("u").cast("long").alias("u_min"),
            F.max("u").cast("long").alias("u_max"),
            F.min("d").cast("long").alias("d_min"),
            F.max("d").cast("long").alias("d_max"),
            (F.max("u") - F.min("u")).cast("long").alias("u_span"),
            (F.max("d") - F.min("d")).cast("long").alias("d_span"),
        ).select(F.lit(name).alias("layout"), "*")

    linear = stats(_assign_files(keyed, "d"), "linear")
    zorder = stats(_assign_files(keyed, "zkey"), "zorder")
    return linear.unionByName(zorder)


# ------------------------------------------------ compaction bin packing ----
#
# The other half of the layout problem: at 100 TB the killer isn't just row
# ORDER inside files, it's file COUNT — streaming/CDC ingestion (the
# reference's write path, ``SparkDestinationStream.java``) lands one small
# file per trigger per partition, and a year of that makes planning+open
# costs dominate scans. Iceberg's ``rewrite_data_files(strategy=>'binpack')``
# fixes it by coalescing adjacent small files into target-sized outputs
# WITHOUT reordering rows. This operator is that planner: given the file
# manifest (per-file byte sizes, sort-ordered within each partition), assign
# every input file an output bin via running-total arithmetic —
# bin = floor(preceding_bytes / target) — the same greedy sequential fill
# binpack performs.
#
# Scale: planning runs on the MANIFEST (one row per file — metadata-sized,
# millions of rows at worst), never on the data. The window is partitioned
# by the table partition key, so each partition's plan is independent; no
# global sort, no corpus scan. Here the "manifest" is simulated from the
# events table as one file per (event_type, day) with a byte-size proxy.

COMPACT_TARGET = 16_384  # target output-file bytes (fixture-scaled)


@query(
    "layout_compaction_bins",
    oracle=f"""
    WITH files AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(length(props) + 32) AS BIGINT) AS file_bytes
      FROM events GROUP BY 1, 2
    ), planned AS (
      SELECT event_type, day, n_rows, file_bytes,
             CAST(COALESCE(SUM(file_bytes) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) // {COMPACT_TARGET} AS BIGINT) AS bin_id
      FROM files
    )
    SELECT event_type, bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST(SUM(file_bytes) AS BIGINT) AS bin_bytes,
           MIN(day) AS min_day, MAX(day) AS max_day
    FROM planned
    GROUP BY event_type, bin_id
    ORDER BY event_type, bin_id
    """,
    doc="Compaction planner (Iceberg binpack rewrite shape): one simulated "
    "small file per (event_type, day), greedily packed in day order into "
    f"~{COMPACT_TARGET}-byte output bins via running-total division — "
    "bin = floor(preceding_bytes / target), so every bin except a "
    "partition's last holds >= target bytes once its first overflowing "
    "file lands. Pure manifest-level arithmetic: the window runs over "
    "one row per FILE (metadata), partitioned by the table partition "
    "key — the data itself is never shuffled by planning.",
)
def layout_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    files = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.length("props") + 32).cast("long").alias("file_bytes"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = files.withColumn(
        "bin_id",
        F.floor(
            F.coalesce(F.sum("file_bytes").over(w), F.lit(0))
            / F.lit(COMPACT_TARGET)
        ).cast("long"),
    )
    return (
        planned.groupBy("event_type", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("file_bytes").cast("long").alias("bin_bytes"),
            F.min("day").alias("min_day"),
            F.max("day").alias("max_day"),
        )
        .orderBy("event_type", "bin_id")
    )


# ------------------------------------------------ partition-key advisor ----
#
# The design question every Iceberg table starts with: which column(s)
# should the partition spec use? The advisor profiles each candidate key
# on the dimensions that matter at 100 TB: partition count (too many →
# small-file problem, too few → no pruning), row skew (max/median — one
# hot partition straggles every write and scan), and the share of rows
# in the single hottest partition. Exact integer stats at the candidate
# grain; the median is the exact middle of the per-partition count list
# (dimension-sized, folded in sorted order). One corpus scan per
# candidate — at scale this runs as one multi-grain pass over a sample.

PART_CANDIDATES = ["lang", "source", "lang || '|' || source"]
_CAND_LABELS = ["lang", "source", "lang,source"]


@query(
    "layout_partition_advisor",
    oracle=f"""
    WITH stats AS (
      {' UNION ALL '.join(
        f'''SELECT '{label}' AS candidate,
               CAST(COUNT(*) AS BIGINT) AS n_partitions,
               CAST(MAX(n) AS BIGINT) AS rows_max,
               CAST(median(n) AS DOUBLE) AS rows_median,
               CAST(SUM(n) AS BIGINT) AS n_rows
        FROM (SELECT {expr} AS k, COUNT(*) AS n FROM documents GROUP BY 1)'''
        for label, expr in zip(_CAND_LABELS, PART_CANDIDATES))}
    )
    SELECT candidate, n_partitions, rows_max, rows_median,
           rows_max / rows_median AS skew_ratio,
           CAST(rows_max AS DOUBLE) / n_rows AS hottest_share
    FROM stats
    ORDER BY candidate
    """,
    doc="Partition-key advisor: per candidate partition spec (lang, "
        "source, lang×source), the partition count, the hottest "
        "partition's rows, the exact median partition size, the "
        "max/median skew ratio, and the hottest partition's row share — "
        "the table that picks an Iceberg partition spec before the first "
        "write. Per-candidate stats are one hash agg each; the median "
        "folds the dimension-sized partition list.",
)
def layout_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    outs = []
    for label, expr in zip(_CAND_LABELS, PART_CANDIDATES):
        per = docs.groupBy(F.expr(expr).alias("k")).agg(
            F.count(F.lit(1)).alias("n")
        )
        outs.append(
            per.agg(
                F.lit(label).alias("candidate"),
                F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
                F.max("n").cast("bigint").alias("rows_max"),
                F.expr("CAST(median(n) AS DOUBLE)").alias("rows_median"),
                F.sum("n").cast("bigint").alias("n_rows"),
            )
        )
    stats = outs[0]
    for o in outs[1:]:
        stats = stats.unionAll(o)
    return stats.select(
        "candidate",
        "n_partitions",
        "rows_max",
        "rows_median",
        (F.col("rows_max") / F.col("rows_median")).alias("skew_ratio"),
        (F.col("rows_max").cast("double") / F.col("n_rows")).alias(
            "hottest_share"
        ),
    ).orderBy("candidate")


# ------------------------------------------------ sort-order advisor -------
#
# "Which sort key should the rewrite use?" answered by measurement, not
# folklore: for every candidate sort key, lay the table out into N_FILES
# by that key, record each file's min/max envelope for every PROBE
# column, and compute how many files an equality probe on that column
# must open on average (1.0 = perfectly clustered, N_FILES = useless).
# The interesting cells are the off-diagonal ones — a sort key earns its
# place by co-clustering the columns the workload actually filters on
# (correlated columns ride along; uncorrelated ones don't).
#
# Scale: file assignment uses the register-offset discipline of
# layout_zorder_stats (domain-sized histogram + per-key rank — no global
# corpus window); envelopes are 32 rows per candidate; the coverage join
# is value-domain × N_FILES against a broadcast span table. The oracle
# states the identical assignment as one global ROW_NUMBER.

_ADVISOR_KEYS = ["o_custkey", "o_orderdate", "o_totalprice"]


@query(
    "layout_sort_advisor",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{sk}' AS sort_key, '{pc}' AS probe_col,
           CAST({N_FILES} AS BIGINT) AS n_files,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(nf) AS DOUBLE) / COUNT(*) AS avg_files_per_value,
           1.0 - CAST(SUM(nf) AS DOUBLE) / COUNT(*) / {N_FILES}
             AS skip_rate
    FROM (
      SELECT v.val, CAST(COUNT(*) AS BIGINT) AS nf
      FROM (
        SELECT DISTINCT {pc} AS val FROM orders
      ) v JOIN (
        SELECT file_id, MIN({pc}) AS lo, MAX({pc}) AS hi
        FROM (
          SELECT *,
                 CAST(((ROW_NUMBER() OVER (ORDER BY {sk}, o_orderkey) - 1)
                       * {N_FILES}) // (SELECT COUNT(*) FROM orders)
                      AS INTEGER) AS file_id
          FROM orders
        ) GROUP BY file_id
      ) f ON v.val BETWEEN f.lo AND f.hi
      GROUP BY v.val
    )
    """
        for sk in _ADVISOR_KEYS
        for pc in _ADVISOR_KEYS
    )
    + " ORDER BY sort_key, probe_col",
    doc=f"Sort-order advisor over the orders table: for each candidate "
        f"sort key, the average number of the {N_FILES} files an equality "
        "probe on each column must open (min/max envelope containment) "
        "and the implied skip rate — the measured decision table for an "
        "Iceberg rewrite_data_files sort order, where off-diagonal cells "
        "reveal which columns ride along with which sort. Register-"
        "offset file assignment (no global corpus window); value-domain "
        "× files coverage join against broadcast span tables.",
)
def layout_sort_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", *_ADVISOR_KEYS
    )
    orders = orders.localCheckpoint(eager=False)  # one scan serves all 3 layouts

    def assign(key: str) -> DataFrame:
        regs = orders.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
        w_off = Window.orderBy(key).rowsBetween(Window.unboundedPreceding, -1)
        w_all = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        offs = regs.select(
            key,
            F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off"),
            F.sum("cnt").over(w_all).alias("n"),
        )
        w_in = Window.partitionBy(key).orderBy("o_orderkey")
        return (
            orders.join(F.broadcast(offs), key)
            .withColumn("pos", F.col("off") + F.row_number().over(w_in))
            .select(
                *_ADVISOR_KEYS,
                (
                    ((F.col("pos") - 1) * N_FILES) / F.col("n")
                )
                .cast("int")
                .alias("file_id"),
            )
        )

    parts = []
    for sk in _ADVISOR_KEYS:
        assigned = assign(sk).localCheckpoint(eager=False)
        spans = {
            pc: assigned.groupBy("file_id").agg(
                F.min(pc).alias("lo"), F.max(pc).alias("hi")
            )
            for pc in _ADVISOR_KEYS
        }
        for pc in _ADVISOR_KEYS:
            dv = orders.select(F.col(pc).alias("val")).distinct()
            cover = (
                dv.join(
                    F.broadcast(spans[pc]),
                    (F.col("val") >= F.col("lo"))
                    & (F.col("val") <= F.col("hi")),
                )
                .groupBy("val")
                .agg(F.count(F.lit(1)).cast("bigint").alias("nf"))
            )
            parts.append(
                cover.agg(
                    F.lit(sk).alias("sort_key"),
                    F.lit(pc).alias("probe_col"),
                    F.lit(N_FILES).cast("bigint").alias("n_files"),
                    F.count(F.lit(1)).cast("bigint").alias("n_values"),
                    (
                        F.sum("nf").cast("double") / F.count(F.lit(1))
                    ).alias("avg_files_per_value"),
                    (
                        F.lit(1.0)
                        - F.sum("nf").cast("double")
                        / F.count(F.lit(1))
                        / F.lit(N_FILES)
                    ).alias("skip_rate"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("sort_key", "probe_col")


# ------------------------------------------------ pruning-payoff audit -----
#
# The number the layout decision is actually made on: given the per-file
# min/max envelopes a layout produces (exactly what layout_zorder_stats
# computes, and what Iceberg stores in manifests), how many files does a
# point predicate OPEN? This audit replays the full point-query workload
# on each dimension — every distinct user as `user_id = u`, every distinct
# day as `day = d` — against both layouts' envelopes and reports files
# touched per query. Z-order should cut user-point scans from "every
# file" to a small rectangle count while keeping day-point scans cheap;
# time-linear wins day queries only.
#
# Scale: the probe joins a dimension-domain frame (distinct users/days)
# against the FILE MANIFEST (64 envelope rows here; one row per file at
# 100 TB — metadata, auto-broadcast), never the data. All counts are
# exact integers; the two emitted ratios are single exact-input IEEE
# divisions.

_PRUNE_ENV_SQL = f"""
    ev AS (
      SELECT event_id, user_id AS u,
             CAST(date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                  AS BIGINT) AS d
      FROM events
    ), keyed AS (
      SELECT *, CAST({_Z_SQL} AS BIGINT) AS zkey FROM ev
    ), assigned AS (
      SELECT 'linear' AS layout, u, d,
             CAST(((ROW_NUMBER() OVER (ORDER BY d, event_id) - 1)
                   * {N_FILES}) // COUNT(*) OVER () AS BIGINT) AS file_id
      FROM keyed
      UNION ALL
      SELECT 'zorder' AS layout, u, d,
             CAST(((ROW_NUMBER() OVER (ORDER BY zkey, event_id) - 1)
                   * {N_FILES}) // COUNT(*) OVER () AS BIGINT) AS file_id
      FROM keyed
    ), env AS (
      SELECT layout, file_id,
             CAST(MIN(u) AS BIGINT) AS u_min, CAST(MAX(u) AS BIGINT) AS u_max,
             CAST(MIN(d) AS BIGINT) AS d_min, CAST(MAX(d) AS BIGINT) AS d_max
      FROM assigned GROUP BY layout, file_id
    ), counts AS (
      SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files
      FROM env GROUP BY layout
    )
"""


@query(
    "layout_pruning_audit",
    oracle=f"""
    WITH {_PRUNE_ENV_SQL},
    uq AS (SELECT DISTINCT u FROM ev),
    dq AS (SELECT DISTINCT d FROM ev),
    uh AS (
      SELECT layout, CAST(COUNT(*) AS BIGINT) AS file_hits
      FROM uq JOIN env ON u BETWEEN u_min AND u_max GROUP BY layout
    ), dh AS (
      SELECT layout, CAST(COUNT(*) AS BIGINT) AS file_hits
      FROM dq JOIN env ON d BETWEEN d_min AND d_max GROUP BY layout
    ), nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_queries FROM uq),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_queries FROM dq)
    SELECT layout, 'user_point' AS dim, n_queries, n_files, file_hits,
           CAST(file_hits AS DOUBLE) / n_queries AS avg_files_per_query,
           CAST(file_hits AS DOUBLE) / (n_queries * n_files)
             AS frac_files_scanned
    FROM uh JOIN counts USING (layout), nu
    UNION ALL
    SELECT layout, 'day_point' AS dim, n_queries, n_files, file_hits,
           CAST(file_hits AS DOUBLE) / n_queries AS avg_files_per_query,
           CAST(file_hits AS DOUBLE) / (n_queries * n_files)
             AS frac_files_scanned
    FROM dh JOIN counts USING (layout), nd
    """,
    doc="Data-skipping payoff audit: replay every distinct-user and "
        "distinct-day point predicate against the per-file (user, day) "
        "min/max envelopes of the time-linear and Z-order layouts and "
        "count files each query must open — the manifest-pruning "
        "simulation that turns layout_zorder_stats' envelopes into the "
        "number the rewrite decision is made on. Probes join the "
        "dimension domain against the metadata-sized envelope manifest "
        "(auto-broadcast), never the data; exact integer hit counts, "
        "single-division ratios.",
)
def layout_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    env = (
        layout_zorder_stats(spark, sf_dir)
        .select("layout", "file_id", "u_min", "u_max", "d_min", "d_max")
        .localCheckpoint(eager=False)  # one assignment pass, two probes
    )
    counts = env.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_files")
    )
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("u"),
        F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date"))
        .cast("long")
        .alias("d"),
    )

    def probe(qdf: DataFrame, qcol: str, lo: str, hi: str, dim: str) -> DataFrame:
        n_q = qdf.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
        hits = (
            qdf.join(
                env,
                (F.col(qcol) >= F.col(lo)) & (F.col(qcol) <= F.col(hi)),
            )
            .groupBy("layout")
            .agg(F.count(F.lit(1)).cast("long").alias("file_hits"))
        )
        return (
            hits.join(counts, "layout")
            .crossJoin(F.broadcast(n_q))
            .select(
                "layout",
                F.lit(dim).alias("dim"),
                "n_queries",
                "n_files",
                "file_hits",
                (F.col("file_hits").cast("double") / F.col("n_queries")).alias(
                    "avg_files_per_query"
                ),
                (
                    F.col("file_hits").cast("double")
                    / (F.col("n_queries") * F.col("n_files"))
                ).alias("frac_files_scanned"),
            )
        )

    uprobe = probe(ev.select("u").distinct(), "u", "u_min", "u_max", "user_point")
    dprobe = probe(ev.select("d").distinct(), "d", "d_min", "d_max", "day_point")
    return uprobe.unionByName(dprobe)
