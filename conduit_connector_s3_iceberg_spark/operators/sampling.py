"""Deterministic corpus-sampling operators (north-star layer).

A 100 TB training-data pipeline needs *reproducible* sampling — rerunning the
job, or running it on a different cluster layout, must select the same rows.
``rand()`` can't do that (per-task seeds change with partitioning), so every
operator here derives its randomness from a content-free key hash:

* **Bernoulli-by-hash**: keep a row iff a hex prefix of ``md5(salt || key)``
  falls below a per-stratum threshold. Pure narrow map — no shuffle, no
  state, embarrassingly parallel, and the sample is a *consistent* subset
  (the 10%% sample is a superset of the 5%% sample for the same salt).
  Per-language thresholds rebalance a skewed corpus in the same pass.
* **Per-stratum top-k by hash rank**: the distributed equivalent of
  reservoir sampling — rank rows inside each stratum by the same key hash
  and keep the first k. One shuffle on the stratum key; each stratum's
  window is independent, so skew is bounded by the largest stratum (and the
  rank can be computed with a partial top-k per partition first, which
  Spark's window + filter plan does via running rank).

Hashes are md5 over the stringified key — identical lowercase hex in Spark
and DuckDB, and hex strings compare lexicographically exactly like the
128-bit values they encode, so thresholds are plain string comparisons.

Reference scope note: the reference connector (s3-iceberg destination,
``src/main/java/io/conduit/SparkDestinationStream.java``) has no sampling
surface; this layer is part of the north-star LLM-pipeline extensions
(BASELINE.json ``north_star``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

SALT = "s1:"           # version the sample; changing it redraws everything
# per-language keep-rates as hex-prefix thresholds (256 buckets of 1/256):
# en is downsampled to 25%, everything else kept at 75% — the usual
# "rebalance the dominant language" shape.
RATE_EN_HEX = "40"     # 64/256  = 25%
RATE_OTHER_HEX = "c0"  # 192/256 = 75%
STRATUM_K = 25         # per-language reservoir size


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _sample_key() -> F.Column:
    return F.md5(F.concat(F.lit(SALT), F.col("doc_id").cast("string")))


_SQL_SAMPLE_KEY = f"md5('{SALT}' || doc_id::VARCHAR)"


@query(
    "sample_stratified_hash",
    oracle=f"""
    SELECT doc_id, lang, substr({_SQL_SAMPLE_KEY}, 1, 2) AS bucket
    FROM documents
    WHERE substr({_SQL_SAMPLE_KEY}, 1, 2)
          < CASE WHEN lang = 'en' THEN '{RATE_EN_HEX}' ELSE '{RATE_OTHER_HEX}' END
    """,
    doc="Deterministic stratified Bernoulli sampling: keep a doc iff the "
        "first two hex chars of md5(salt||doc_id) fall under the language's "
        "rate threshold (en 25%, other 75%). Narrow map, zero shuffle, "
        "reproducible across runs/cluster layouts, consistent across rates.",
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bucket = F.substring(_sample_key(), 1, 2)
    threshold = F.when(F.col("lang") == "en", F.lit(RATE_EN_HEX)).otherwise(
        F.lit(RATE_OTHER_HEX)
    )
    return docs.select("doc_id", "lang", bucket.alias("bucket")).filter(
        F.col("bucket") < threshold
    )


@query(
    "sample_stratum_reservoir",
    oracle=f"""
    SELECT doc_id, lang, rk
    FROM (
      SELECT doc_id, lang,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY {_SQL_SAMPLE_KEY}, doc_id
             ) AS INTEGER) AS rk
      FROM documents
    )
    WHERE rk <= {STRATUM_K}
    """,
    doc=f"Per-stratum uniform {STRATUM_K}-sample (distributed reservoir): "
        "rank each language's docs by the deterministic key hash and keep "
        "the first k. One shuffle on lang; window rank + filter lets Spark "
        "keep a running top-k per partition instead of a full sort.",
)
def sample_stratum_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(_sample_key(), F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= STRATUM_K)
    )


# --------------------------------------------------------------- token budget
#
# "Sample to a token budget" — the knob an actual pretraining mix is tuned
# by: each language contributes AT MOST ``TOKEN_BUDGET`` tokens, chosen in
# deterministic hash order so reruns (and budget increases) select a
# consistent, growing prefix. A doc is kept iff the running token total of
# the docs hashed before it is still under the budget — i.e. the first doc
# to cross the line is still taken (budgets are soft caps on *starts*,
# matching sequence packing's chunk-cut rule in operators/corpus.py).

TOKEN_BUDGET = 4_000   # per-language token budget; a config knob in practice


@query(
    "sample_token_budget",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
             {_SQL_SAMPLE_KEY} AS hk
      FROM documents
    ), c AS (
      SELECT doc_id, lang, n_tokens,
             -- CAST: DuckDB SUM(BIGINT) is HUGEINT; Spark's is BIGINT
             CAST(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY hk, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens AS BIGINT) AS tokens_before
      FROM t
    )
    SELECT doc_id, lang, n_tokens, tokens_before
    FROM c WHERE tokens_before < {TOKEN_BUDGET}
    """,
    doc=f"Token-budget sampling: order each language's docs by the "
        "deterministic sample hash and keep the prefix whose running token "
        f"count stays under {TOKEN_BUDGET:,} tokens (the doc that crosses "
        "the line is kept — budgets cap starts, like chunk cuts in "
        "pack_sequences). One window shuffle on lang; the running sum is "
        "computed per-partition after the shuffle, and the budget filter "
        "discards the corpus tail early in the same stage.",
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    n_tokens = F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint")
    t = docs.select(
        "doc_id", "lang", n_tokens.alias("n_tokens"), _sample_key().alias("hk")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("hk", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.select(
            "doc_id",
            "lang",
            "n_tokens",
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("tokens_before"),
        )
        .filter(F.col("tokens_before") < TOKEN_BUDGET)
    )


# --------------------------------------------------- quality-weighted sample
#
# Deterministic importance sampling: a doc's keep-probability IS its quality
# score (the shared heuristic from operators/text.py), so the sample tilts
# toward high-quality text without a hard threshold — the soft-gate shape
# quality-classifier pipelines use (e.g. accept with p = score). Randomness
# again comes from the content-free key hash, so the draw is reproducible
# and consistent across reruns: quality is quantized to 16 bits and compared
# against the first 4 hex chars of md5(salt||doc_id) AS STRINGS (hex order =
# numeric order), keeping everything a narrow codegen map — no shuffle, no
# RNG state, no UDF.

SALT_Q = "q1:"
QUALITY_BITS_MAX = 65535  # quality 1.0 maps to 0xffff (16-bit quantization)

_QW_QUALITY_SQL = """
      SELECT doc_id, lang,
             0.3*(CAST(len(list_distinct(string_split(trim(text), ' '))) AS DOUBLE)
                  / len(string_split(trim(text), ' ')))
             + 0.3*(CAST(len(list_filter(string_split(trim(text), ' '),
                            x -> x IN ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
                    / len(string_split(trim(text), ' ')))
             + 0.2*(1 - CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                        / length(text))
             + 0.2*least(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                         / len(string_split(trim(text), ' ')) / 10, 1.0)
               AS quality
      FROM documents
"""


@query(
    "sample_quality_weighted",
    oracle=f"""
    WITH q AS (
{_QW_QUALITY_SQL}
    )
    SELECT doc_id, lang, quality,
           substr(md5('{SALT_Q}' || doc_id::VARCHAR), 1, 4) AS bucket
    FROM q
    -- lower(): DuckDB to_hex is UPPERCASE, md5 is lowercase — the string
    -- compare needs one case for hex order to equal numeric order
    WHERE substr(md5('{SALT_Q}' || doc_id::VARCHAR), 1, 4)
          < lpad(lower(to_hex(least(CAST(floor(quality * 65536) AS BIGINT),
                                    {QUALITY_BITS_MAX}))), 4, '0')
    """,
    doc="Quality-weighted sampling: keep a doc with probability equal to "
        "its quality score — deterministic soft gate via a 16-bit quantized "
        "threshold compared against the key hash's first 4 hex chars as "
        "strings. Pure narrow map (quality + md5 + string compare in one "
        "codegen stage), zero shuffle, reproducible across runs.",
)
def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import quality_col

    docs = _docs(spark, sf_dir)
    quality = quality_col()
    thr = F.least(
        F.floor(quality * 65536).cast("bigint"), F.lit(QUALITY_BITS_MAX)
    )
    thr_hex = F.lpad(F.lower(F.hex(thr)), 4, "0")
    bucket = F.substring(
        F.md5(F.concat(F.lit(SALT_Q), F.col("doc_id").cast("string"))), 1, 4
    )
    return (
        docs.select(
            "doc_id",
            "lang",
            quality.alias("quality"),
            bucket.alias("bucket"),
            thr_hex.alias("_thr"),
        )
        .filter(F.col("bucket") < F.col("_thr"))
        .drop("_thr")
    )


# ------------------------------------------- exact apportioned sampling ---
#
# "Sample EXACTLY N documents with the corpus' source mix" — the fixed-
# budget cousin of the rate-based samplers above. Rate sampling yields a
# binomially-noisy count; a training run with a hard token/doc budget needs
# exact integer quotas. Quotas come from the largest-remainder (Hamilton)
# apportionment of N over per-source counts — the same method parliament
# seats use, and the unique one that never strays more than 1 from the
# ideal share. Everything is integer arithmetic; selection inside each
# source is the module's deterministic md5-rank, so the draw is
# reproducible under any cluster layout.

APPORTION_N = 100


@query(
    "sample_domain_apportioned",
    oracle=f"""
    WITH per AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS t FROM per
    ), q0 AS (
      SELECT source, n,
             ({APPORTION_N} * n) // t AS base,
             ({APPORTION_N} * n) % t AS rem
      FROM per, tot
    ), bonus AS (
      SELECT source, base, rem,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
      FROM q0
    ), need AS (
      SELECT {APPORTION_N} - CAST(SUM(base) AS BIGINT) AS r FROM q0
    ), quotas AS (
      SELECT source,
             CAST(base + CASE WHEN rk <= r THEN 1 ELSE 0 END AS BIGINT)
               AS quota
      FROM bonus, need
    ), ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {_SQL_SAMPLE_KEY}, doc_id
             ) AS prk
      FROM documents
    )
    SELECT r.doc_id, r.source,
           CAST(r.prk AS INTEGER) AS pick_rank, q.quota
    FROM ranked r JOIN quotas q ON q.source = r.source
    WHERE r.prk <= q.quota
    """,
    doc=f"Exact-budget stratified sample: precisely {APPORTION_N} documents "
        "apportioned over sources by largest remainder (Hamilton) — "
        "integer quotas never off the ideal share by more than 1 — then "
        "selected per source by deterministic md5 rank. All quota math is "
        "BIGINT; the source table is dimension-sized so the apportionment "
        "windows are metadata-scale; the corpus pays one source-keyed "
        "window for the pick rank (same shape as the reservoir sampler). "
        "The fixed-budget complement to rate-based sampling: re-runs and "
        "re-partitions draw the identical sample.",
)
def sample_domain_apportioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    tot = per.agg(F.sum("n").cast("long").alias("t"))
    q0 = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        F.expr(f"({APPORTION_N} * n) div t").alias("base"),
        (F.lit(APPORTION_N) * F.col("n") % F.col("t")).alias("rem"),
    )
    bonus = q0.select(
        "source",
        "base",
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), F.col("source")))
        .alias("rk"),
    )
    need = q0.agg(
        (F.lit(APPORTION_N) - F.sum("base").cast("long")).alias("r")
    )
    quotas = bonus.crossJoin(F.broadcast(need)).select(
        "source",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("r"), 1).otherwise(0)
        )
        .cast("long")
        .alias("quota"),
    )
    w = Window.partitionBy("source").orderBy(_sample_key(), F.col("doc_id"))
    ranked = docs.select(
        "doc_id", "source", F.row_number().over(w).alias("prk")
    )
    return (
        ranked.join(F.broadcast(quotas), "source")
        .filter(F.col("prk") <= F.col("quota"))
        .select(
            "doc_id", "source", F.col("prk").cast("int").alias("pick_rank"), "quota"
        )
    )


# ------------------------------------------------------------------
# Temperature-scaled domain mixture (the multilingual-LM mixing rule:
# p_s ∝ n_s^alpha with alpha < 1 upweights small domains; alpha = 0.5
# here, computed as sqrt so both engines use the same correctly-rounded
# primitive instead of libm pow). All counting is exact BIGINT at the
# group grain; the double math runs on the dimension-sized per-source
# frame, folded in source order so the normalization sum is one fixed
# IEEE sequence on both engines.
# ------------------------------------------------------------------

MIXTURE_BUDGET = 1_000  # documents per training epoch drawn from the mixture


@query(
    "sample_mixture_weights",
    oracle=f"""
    WITH per AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS t_docs,
             list_reduce(
               list_transform(array_agg(n_docs ORDER BY source),
                              x -> sqrt(CAST(x AS DOUBLE))),
               (a, b) -> a + b) AS t_w
      FROM per
    )
    SELECT per.source, per.n_docs, per.n_tokens,
           CAST(per.n_docs AS DOUBLE) / t_docs AS raw_share,
           sqrt(CAST(per.n_docs AS DOUBLE)) / t_w AS temp_share,
           sqrt(CAST(per.n_docs AS DOUBLE)) / t_w * {MIXTURE_BUDGET}
             AS expected_docs,
           sqrt(CAST(per.n_docs AS DOUBLE)) / t_w * {MIXTURE_BUDGET}
             / per.n_docs AS epochs_per_doc
    FROM per, tot
    """,
    doc="Temperature-scaled mixture weights over sources (p_s ∝ n_s^0.5): "
        "the data-mixing step before sampling a training epoch. Exact "
        "BIGINT counts at the group grain; share math on the "
        "dimension-sized source frame with the normalizer folded in source "
        "order (fixed IEEE sequence). epochs_per_doc > 1 flags domains the "
        "mixture would oversample past one epoch. One corpus scan, one "
        "map-side-combined aggregation — the 100-TB cost is the count, "
        "not the mixture math.",
)
def sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col("text")), " ")))
        .cast("long")
        .alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("long").alias("t_docs"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(source, n_docs))),"
            " s -> sqrt(double(s.n_docs))), 0.0D, (a, b) -> a + b)"
        ).alias("t_w"),
    )
    w = F.sqrt(F.col("n_docs").cast("double")) / F.col("t_w")
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_docs").cast("double") / F.col("t_docs")).alias("raw_share"),
        w.alias("temp_share"),
        (w * MIXTURE_BUDGET).alias("expected_docs"),
        (w * MIXTURE_BUDGET / F.col("n_docs")).alias("epochs_per_doc"),
    )


# ------------------------------------------------------------------
# The two pieces above composed into the step a training run actually
# executes: draw ONE epoch of MIXTURE_BUDGET documents whose per-source
# quotas follow the TEMPERATURE shares (sqrt weights, cf.
# sample_mixture_weights) instead of the raw counts — largest-remainder
# apportionment over the real-valued ideals, a per-source cap at the
# source's size (a domain the mixture would oversample past one epoch
# contributes all its documents once; without-replacement sampling cannot
# repeat), then the deterministic md5-rank pick. Doubles appear only in
# the dimension-sized quota math, in one fixed IEEE op sequence; the
# corpus pays the same single source-keyed window as the other exact
# samplers.
# ------------------------------------------------------------------

MIXTURE_BUDGET_EPOCH = 30  # small enough to bite at every fixture SF


@query(
    "sample_epoch_by_mixture",
    oracle=f"""
    WITH per AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ), tot AS (
      SELECT list_reduce(
               list_transform(array_agg(n_docs ORDER BY source),
                              x -> sqrt(CAST(x AS DOUBLE))),
               (a, b) -> a + b) AS t_w
      FROM per
    ), ideal AS (
      SELECT source, n_docs,
             {MIXTURE_BUDGET_EPOCH} * sqrt(CAST(n_docs AS DOUBLE)) / t_w
               AS ideal
      FROM per, tot
    ), q0 AS (
      SELECT source, n_docs, ideal,
             CAST(floor(ideal) AS BIGINT) AS base,
             ideal - floor(ideal) AS rem
      FROM ideal
    ), bonus AS (
      SELECT source, n_docs, base,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
      FROM q0
    ), need AS (
      SELECT {MIXTURE_BUDGET_EPOCH} - CAST(SUM(base) AS BIGINT) AS r FROM q0
    ), quotas AS (
      SELECT source,
             least(CAST(base + CASE WHEN rk <= r THEN 1 ELSE 0 END
                        AS BIGINT),
                   n_docs) AS quota
      FROM bonus, need
    ), ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {_SQL_SAMPLE_KEY}, doc_id
             ) AS prk
      FROM documents
    )
    SELECT r.doc_id, r.source,
           CAST(r.prk AS INTEGER) AS pick_rank, q.quota
    FROM ranked r JOIN quotas q ON q.source = r.source
    WHERE r.prk <= q.quota
    """,
    doc=f"One training epoch ({MIXTURE_BUDGET_EPOCH} docs) drawn by the "
        "temperature mixture: per-source quotas = largest-remainder "
        "apportionment of the sqrt-weighted shares, capped at source size "
        "(oversampled domains contribute fully once), picks by "
        "deterministic md5 rank. The glue step between mixture design "
        "and the sampled corpus — rerunning on any cluster layout draws "
        "the identical epoch.",
)
def sample_epoch_by_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tot = per.agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(source, n_docs))),"
            " s -> sqrt(double(s.n_docs))), 0.0D, (a, b) -> a + b)"
        ).alias("t_w")
    )
    ideal_c = (
        F.lit(MIXTURE_BUDGET_EPOCH)
        * F.sqrt(F.col("n_docs").cast("double"))
        / F.col("t_w")
    )
    q0 = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.floor(ideal_c).cast("long").alias("base"),
        (ideal_c - F.floor(ideal_c)).alias("rem"),
    )
    bonus = q0.select(
        "source",
        "n_docs",
        "base",
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), F.col("source")))
        .alias("rk"),
    )
    need = q0.agg(
        (F.lit(MIXTURE_BUDGET_EPOCH) - F.sum("base").cast("long")).alias("r")
    )
    quotas = bonus.crossJoin(F.broadcast(need)).select(
        "source",
        F.least(
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("r"), 1).otherwise(0)
            ).cast("long"),
            F.col("n_docs"),
        ).alias("quota"),
    )
    w = Window.partitionBy("source").orderBy(_sample_key(), F.col("doc_id"))
    ranked = docs.select(
        "doc_id", "source", F.row_number().over(w).alias("prk")
    )
    return (
        ranked.join(F.broadcast(quotas), "source")
        .filter(F.col("prk") <= F.col("quota"))
        .select(
            "doc_id",
            "source",
            F.col("prk").cast("int").alias("pick_rank"),
            "quota",
        )
    )


# ---------------------------------------------------------------- priority
#
# Weighted sampling WITHOUT replacement via priority sampling (Duffield,
# Lund & Thorup, JACM 2007): each item gets priority q = w / u with u
# uniform in (0,1]; the k highest-priority items form the sample, and the
# (k+1)-th priority tau yields the unbiased per-item weight estimator
# max(w, tau). Long documents are proportionally more likely to be kept,
# but no document can be drawn twice — the subsampling mode LLM data
# curricula actually want (vs Bernoulli's variable sample size and
# with-replacement mixtures' duplicate draws).
#
# Determinism: u is md5-derived — v = first 13 hex chars of
# md5(salt||doc_id) as an integer (52 bits, exactly representable), and
# the priority is computed as w / (v+1), ONE IEEE division of two
# exactly-representable integers → correctly rounded → bit-identical in
# Spark and DuckDB. No float ever accumulates; ranking ties break on
# doc_id.

PRIORITY_K = 15      # sample size per source stratum (< stratum size at every fixture SF, so the threshold estimator engages)
PRIORITY_SALT = "p1:"

_PRI_KEY_SQL = (
    f"CAST(CAST(('0x' || substr(md5('{PRIORITY_SALT}' || doc_id::VARCHAR),"
    " 1, 13)) AS BIGINT) + 1 AS DOUBLE)"
)


def _pri_v() -> F.Column:
    h = F.md5(F.concat(F.lit(PRIORITY_SALT), F.col("doc_id").cast("string")))
    return (
        F.conv(F.substring(h, 1, 13), 16, 10).cast("long") + F.lit(1)
    ).cast("double")


@query(
    "sample_priority_weighted",
    oracle=f"""
    WITH pri AS (
      SELECT doc_id, source, n_chars,
             CAST(n_chars AS DOUBLE) / {_PRI_KEY_SQL} AS priority
      FROM documents
    ), ranked AS (
      SELECT doc_id, source, n_chars, priority,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY priority DESC, doc_id
             ) AS INTEGER) AS rn
      FROM pri
    ), tau AS (
      SELECT source, MAX(priority) AS tau
      FROM ranked WHERE rn = {PRIORITY_K} + 1 GROUP BY source
    )
    SELECT r.doc_id, r.source, r.n_chars, r.priority, r.rn,
           COALESCE(t.tau, 0.0) AS tau,
           GREATEST(CAST(r.n_chars AS DOUBLE), COALESCE(t.tau, 0.0))
             AS adj_weight
    FROM ranked r LEFT JOIN tau t USING (source)
    WHERE r.rn <= {PRIORITY_K}
    """,
    doc=f"Priority sampling (Duffield-Lund-Thorup): top-{PRIORITY_K} docs "
        "per source by priority = n_chars / u with u md5-derived, plus the "
        "(k+1)-th priority tau and the unbiased weight estimator "
        "max(w, tau). Weighted WITHOUT replacement, deterministic, one "
        "shuffle on source; the window is a per-stratum top-k (running "
        "top-k per partition, never a full sort). The estimator makes "
        "downstream token counts unbiased: E[sum adj_weight] = sum w.",
)
def sample_priority_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    pri = docs.select(
        "doc_id",
        "source",
        "n_chars",
        (F.col("n_chars").cast("double") / _pri_v()).alias("priority"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("priority").desc(), F.col("doc_id")
    )
    ranked = pri.withColumn("rn", F.row_number().over(w).cast("int")).filter(
        F.col("rn") <= PRIORITY_K + 1
    )
    tau = (
        ranked.filter(F.col("rn") == PRIORITY_K + 1)
        .groupBy("source")
        .agg(F.max("priority").alias("tau"))
    )
    return (
        ranked.filter(F.col("rn") <= PRIORITY_K)
        .join(F.broadcast(tau), "source", "left")
        .select(
            "doc_id",
            "source",
            "n_chars",
            "priority",
            "rn",
            F.coalesce("tau", F.lit(0.0)).alias("tau"),
            F.greatest(
                F.col("n_chars").cast("double"),
                F.coalesce("tau", F.lit(0.0)),
            ).alias("adj_weight"),
        )
    )


# ------------------------------------------------ DSIR importance resample --
#
# The second half of DSIR (Xie et al., NeurIPS 2023): having scored every
# raw document with a target-vs-raw log-likelihood ratio
# (text.dsir_log_weights), actually DRAW the resample — keep doc i with
# probability min(1, base * 2^logw_i). Reproducibility demands hash
# randomness, and cross-engine exactness demands no pow(): both sides are
# compared in the LOG domain — keep iff log2(u) < log2(base) + logw, where
# u is the doc's 60-bit md5 fraction, log2(u) = mitchell(v) - 60 (the same
# bitlength log2 as the weights themselves), and log2(base) is exact
# because DSIR_BASE_RATE is a power of two. Everything is a deterministic
# IEEE comparison of identically-derived doubles.
#
# Scale: the weight table is the DSIR pipeline's output (explode + two
# broadcast joins); the draw itself is a pure narrow map over it.

DSIR_BASE_LOG2 = -2  # base keep rate 2^-2 = 25% at logw = 0
_DSIR_SALT = "dsir1:"

# mitchell log2 of the 60-bit hash value, identical text in both engines
_U_LOG2_SPARK = (
    "(length(bin(v)) - 1)"
    " + (v / shiftleft(cast(1 as bigint), length(bin(v)) - 1) - 1.0) - 60.0"
)
_U_LOG2_SQL = (
    "(length(bin(v)) - 1)"
    " + (v / (CAST(1 AS BIGINT) << (length(bin(v)) - 1)) - 1.0) - 60.0"
)


from .text import _DSIR_CORE_SQL  # noqa: E402  (shared oracle CTE chain)

_DSIR_RESAMPLE_ORACLE = f"""
    WITH {_DSIR_CORE_SQL},
    drawn AS (
      SELECT doc_id, lang, dsir_logw,
             CAST(('0x' || substr(md5('{_DSIR_SALT}' || doc_id::VARCHAR),
                                  1, 15)) AS BIGINT) AS v
      FROM dsirw
    )
    SELECT doc_id, lang, dsir_logw
    FROM drawn
    WHERE {_U_LOG2_SQL} < {float(DSIR_BASE_LOG2)!r} + dsir_logw
    ORDER BY doc_id
    """


@query(
    "sample_dsir_resample",
    oracle=_DSIR_RESAMPLE_ORACLE,
    doc="DSIR importance resampling, the actual draw: keep doc i with "
    "probability min(1, 2^(-2) * 2^dsir_logw), decided in the log "
    "domain (Mitchell log2 of the doc's 60-bit md5 fraction vs "
    "log2(base) + logw) so no pow() ever runs — every comparison is of "
    "identically-derived doubles in both engines. Target-like docs "
    "(logw >= 2) are always kept; raw-typical docs keep at ~25%; "
    "anti-target docs are suppressed exponentially. A pure narrow map "
    "over the DSIR weight table.",
)
def sample_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import dsir_log_weights

    docs = load_table(spark, sf_dir, "documents")
    w = dsir_log_weights(docs)
    v = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(_DSIR_SALT), F.col("doc_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    kept = w.withColumn("v", v).filter(
        F.expr(_U_LOG2_SPARK)
        < F.lit(float(DSIR_BASE_LOG2)) + F.col("dsir_logw")
    )
    return kept.select("doc_id", "lang", "dsir_logw").orderBy("doc_id")



# ------------------------------------------------ Neyman allocation ---------
#
# Proportional stratified sampling is optimal only when strata are equally
# noisy; Neyman (1934) allocation n_h ∝ N_h·σ_h minimizes the estimator
# variance for a fixed total budget by oversampling heterogeneous strata.
# Here the measured variable is document length (n_chars) per source.
#
# Exactness: N_h·σ_h = sqrt(N_h·Σx² − (Σx)²) — the moments accumulate in
# DECIMAL(38,0) (the q40 exact-moment discipline; BIGINT would overflow at
# corpus scale), ONE sqrt of the exact integer emits the weight, quantized
# to scaled BIGINT, and the budget split is the same largest-remainder
# integer apportionment as sample_domain_apportioned. The strata table is
# dimension-sized; the corpus pays one map-side-combined moment pass.

NEYMAN_N = 200          # total sample budget to allocate
NEYMAN_WSCALE = 1000    # weight quantization


@query(
    "sample_neyman_allocation",
    oracle=f"""
    WITH per AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(n_chars AS DECIMAL(38,0))
                      * CAST(n_chars AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS sx2
      FROM documents GROUP BY source
    ), wts AS (
      SELECT source, n,
             sqrt(CAST(n * sx2 - sx * sx AS DOUBLE)) / n AS sigma,
             CAST(round({NEYMAN_WSCALE}.0
                        * sqrt(CAST(n * sx2 - sx * sx AS DOUBLE)))
                  AS BIGINT) AS ws
      FROM per
    ), tot AS (
      SELECT CAST(SUM(ws) AS BIGINT) AS w,
             CAST(SUM(n) AS BIGINT) AS t
      FROM wts
    ), q0 AS (
      SELECT source, n, sigma, ws,
             ({NEYMAN_N} * ws) // w AS base,
             ({NEYMAN_N} * ws) % w AS rem,
             ({NEYMAN_N} * n) // t AS prop_base
      FROM wts, tot
    ), bonus AS (
      SELECT source, n, sigma, base, rem, prop_base,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
      FROM q0
    ), need AS (
      SELECT {NEYMAN_N} - CAST(SUM(base) AS BIGINT) AS r FROM q0
    )
    SELECT source, n, sigma,
           CAST(base + CASE WHEN rk <= r THEN 1 ELSE 0 END AS BIGINT)
             AS neyman_quota,
           CAST(prop_base AS BIGINT) AS proportional_floor
    FROM bonus, need
    ORDER BY source
    """,
    doc=f"Neyman-optimal stratified allocation of a {NEYMAN_N}-doc budget "
    "over sources: n_h proportional to N_h*sigma_h (length variance per "
    "source), moments exact in DECIMAL(38,0), one sqrt per stratum "
    "quantized to BIGINT, largest-remainder integer split. Oversamples "
    "heterogeneous sources — the variance-minimizing refinement of the "
    "proportional quota (floor shown for contrast). Strata table is "
    "dimension-sized; corpus cost is one moment pass.",
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    x = F.col("n_chars").cast("decimal(38,0)")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("decimal(38,0)").alias("sx"),
        F.sum(x * x).cast("decimal(38,0)").alias("sx2"),
    )
    num = (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    wts = per.select(
        "source",
        "n",
        (F.sqrt(num) / F.col("n")).alias("sigma"),
        F.round(F.lit(float(NEYMAN_WSCALE)) * F.sqrt(num))
        .cast("long")
        .alias("ws"),
    )
    tot = wts.agg(
        F.sum("ws").cast("long").alias("w"), F.sum("n").cast("long").alias("t")
    )
    q0 = wts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        "sigma",
        F.expr(f"({NEYMAN_N} * ws) div w").cast("long").alias("base"),
        ((F.lit(NEYMAN_N) * F.col("ws")) % F.col("w")).alias("rem"),
        F.expr(f"({NEYMAN_N} * n) div t").cast("long").alias("prop_base"),
    )
    w_rk = Window.orderBy(F.desc("rem"), "source")
    bonus = q0.withColumn("rk", F.row_number().over(w_rk))
    need = q0.agg(
        (F.lit(NEYMAN_N) - F.sum("base")).cast("long").alias("r")
    )
    return (
        bonus.crossJoin(F.broadcast(need))
        .select(
            "source",
            "n",
            "sigma",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("r"), 1).otherwise(0)
            )
            .cast("long")
            .alias("neyman_quota"),
            F.col("prop_base").cast("long").alias("proportional_floor"),
        )
        .orderBy("source")
    )


@query(
    "sample_consistency_audit",
    oracle=f"""
    WITH marked AS (
      SELECT doc_id,
             substr({_SQL_SAMPLE_KEY}, 1, 2) < '0d' AS in_5pct,
             substr({_SQL_SAMPLE_KEY}, 1, 2) < '1a' AS in_10pct
      FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE in_5pct) AS BIGINT) AS n_5pct,
           CAST(COUNT(*) FILTER (WHERE in_10pct) AS BIGINT) AS n_10pct,
           CAST(COUNT(*) FILTER (WHERE in_5pct AND NOT in_10pct) AS BIGINT)
             AS n_violations
    FROM marked
    """,
    doc="Consistent-sampling audit: with hash-threshold sampling the 5% "
    "band ('0d'/256) is BY CONSTRUCTION a subset of the 10% band "
    "('1a'/256) for the same salt — n_violations must be exactly 0, "
    "proven corpus-wide in one narrow pass. The invariant that lets a "
    "pipeline grow a sample without redrawing it (and the audit that "
    "catches a salt drift instantly).",
)
def sample_consistency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    band = F.substring(_sample_key(), 1, 2)
    marked = docs.select(
        (band < "0d").alias("in_5pct"), (band < "1a").alias("in_10pct")
    )
    return marked.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count(F.when(F.col("in_5pct"), 1)).cast("long").alias("n_5pct"),
        F.count(F.when(F.col("in_10pct"), 1)).cast("long").alias("n_10pct"),
        F.count(F.when(F.col("in_5pct") & ~F.col("in_10pct"), 1))
        .cast("long")
        .alias("n_violations"),
    )


# ------------------------------------------------ temperature sweep --------
#
# The decision table behind sample_mixture_weights' fixed T=0.5: the same
# mixture at T ∈ {1/4, 1/2, 3/4, 1}, with the effective number of
# sources (inverse Simpson, 1/Σp²) per temperature — how hard each T
# flattens the source skew. n^T is composed from sqrt ONLY (x^¼ =
# sqrt(sqrt x), x^¾ = sqrt(x)·sqrt(sqrt x)): sqrt is correctly rounded
# by IEEE 754, so the composition is bit-identical across engines where
# pow() would not be. Normalizers and Σp² fold the dimension-sized source
# list in source order (the sample_mixture_weights discipline).

MIX_TEMPS = ["0.25", "0.5", "0.75", "1.0"]


def _pow_sql(x: str, t: str) -> str:
    return {
        "0.25": f"sqrt(sqrt({x}))",
        "0.5": f"sqrt({x})",
        "0.75": f"sqrt({x}) * sqrt(sqrt({x}))",
        "1.0": x,
    }[t]


@query(
    "mix_temperature_sweep",
    oracle=f"""
    WITH per AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ), melted AS (
      SELECT t.t AS temperature, source, n_docs,
             CASE t.t
               {' '.join(f"WHEN '{t}' THEN {_pow_sql('CAST(n_docs AS DOUBLE)', t)}" for t in MIX_TEMPS)}
             END AS w
      FROM per, UNNEST([{', '.join(repr(t) for t in MIX_TEMPS)}]) AS t(t)
    ), norms AS (
      SELECT temperature,
             list_reduce(list_transform(
               array_agg(w ORDER BY source), x -> x), (a, b) -> a + b) AS t_w
      FROM melted GROUP BY temperature
    ), shared AS (
      SELECT m.temperature, m.source, m.n_docs, m.w / n.t_w AS share
      FROM melted m JOIN norms n ON m.temperature = n.temperature
    ), eff AS (
      SELECT temperature,
             1.0 / list_reduce(list_transform(
               array_agg(share ORDER BY source), x -> x * x),
               (a, b) -> a + b) AS effective_sources
      FROM shared GROUP BY temperature
    )
    SELECT s.temperature, s.source, s.n_docs, s.share, e.effective_sources
    FROM shared s JOIN eff e ON s.temperature = e.temperature
    ORDER BY s.temperature, s.source
    """,
    doc="Mixture-temperature sweep: source shares at T = 1/4, 1/2, 3/4, 1 "
        "plus the effective source count (inverse Simpson) per T — the "
        "table that justifies a mixing temperature. n^T composed from "
        "sqrt only (correctly-rounded, engine-identical; pow is not); "
        "normalizers and Σp² fold the source list in source order. One "
        "corpus scan; everything after is dimension-sized.",
)
def mix_temperature_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    cases = " ".join(
        f"WHEN '{t}' THEN {_pow_sql('CAST(n_docs AS DOUBLE)', t)}"
        for t in MIX_TEMPS
    )
    melted = per.select(
        "source",
        "n_docs",
        F.explode(F.array(*[F.lit(t) for t in MIX_TEMPS])).alias("temperature"),
    ).withColumn("w", F.expr(f"CASE temperature {cases} END"))
    norms = melted.groupBy("temperature").agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(source, w))),"
            " s -> s.w), 0.0D, (a, b) -> a + b)"
        ).alias("t_w")
    )
    shared = melted.join(norms, "temperature").select(
        "temperature", "source", "n_docs", (F.col("w") / F.col("t_w")).alias("share")
    )
    eff = shared.groupBy("temperature").agg(
        (
            F.lit(1.0)
            / F.expr(
                "aggregate(transform(array_sort(collect_list(struct(source, share))),"
                " s -> s.share * s.share), 0.0D, (a, b) -> a + b)"
            )
        ).alias("effective_sources")
    )
    return (
        shared.join(eff, "temperature")
        .select("temperature", "source", "n_docs", "share", "effective_sources")
        .orderBy("temperature", "source")
    )


# ------------------------------------------------ Poisson bootstrap CI -----
#
# Bootstrap confidence intervals at corpus scale: true multinomial
# resampling needs a global draw, but the POISSON bootstrap (each row's
# replicate weight ~ Poisson(1), independent per row) is embarrassingly
# parallel — one map-side weight per (row, replicate), partial aggs, and
# a B-group shuffle. The weights come from a deterministic hash uniform:
# the first 8 md5 hex chars of (replicate:salt:doc_id) compared against
# the Poisson(1) CDF quantized to the same 16^8 grid AS FIXED-WIDTH HEX
# STRINGS — so both engines draw bit-identical weights with zero float
# parsing. The measured statistic (mean n_chars) stays in exact BIGINT
# folds; each replicate mean is one IEEE division; the CI bounds are
# exact order statistics over the B replicate means.

BOOT_B = 100
BOOT_SALT = "boot1"
# cumulative Poisson(1) CDF scaled to 16^8, as 8-char hex (k = 0..6)
_POIS_HEX = [
    "5e2d58d8", "bc5ab1b1", "eb715e1d", "fb239797",
    "ff1025f5", "ffd90f3b", "fffa8b71",
]


def _pois_weight_case(h: str) -> str:
    """Poisson(1) inverse-CDF on an 8-hex-char uniform, as a CASE ladder
    (weight capped at 7; P(X>7) < 1e-5 — documented truncation)."""
    whens = " ".join(
        f"WHEN {h} < '{t}' THEN {k}" for k, t in enumerate(_POIS_HEX)
    )
    return f"CASE {whens} ELSE 7 END"


@query(
    "sample_poisson_bootstrap_ci",
    oracle=f"""
    WITH reps AS (
      SELECT CAST(u.r AS BIGINT) AS rep, d.doc_id, d.n_chars,
             substr(md5(u.r::VARCHAR || ':{BOOT_SALT}:' || d.doc_id::VARCHAR),
                    1, 8) AS h
      FROM documents d, UNNEST(generate_series(1, {BOOT_B})) AS u(r)
    ), weighted AS (
      SELECT rep, CAST({_pois_weight_case('h')} AS BIGINT) AS w, n_chars
      FROM reps
    ), repmeans AS (
      SELECT rep,
             CAST(SUM(w) AS BIGINT) AS sw,
             CAST(SUM(w * n_chars) AS BIGINT) AS swx,
             CAST(SUM(w * n_chars) AS DOUBLE) / SUM(w) AS mean_r
      FROM weighted GROUP BY rep HAVING SUM(w) > 0
    ), ranked AS (
      SELECT mean_r,
             ROW_NUMBER() OVER (ORDER BY mean_r, rep) AS rk,
             COUNT(*) OVER () AS nb
      FROM repmeans
    ), base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars
      FROM documents
    )
    SELECT b.n_docs, b.mean_chars,
           CAST({BOOT_B} AS BIGINT) AS n_replicates,
           (SELECT mean_r FROM ranked WHERE rk = 3) AS ci_lo,
           (SELECT mean_r FROM ranked WHERE rk = 98) AS ci_hi
    FROM base b
    """,
    doc=f"Poisson-bootstrap 95% CI for mean document length ({BOOT_B} "
        "replicates): per-(row, replicate) Poisson(1) weights from a "
        "hash uniform compared against hex-quantized CDF thresholds — "
        "bit-identical draws in both engines, no RNG state, no global "
        "resample. The scalable bootstrap: map-side weights + partial "
        "aggs, shuffle cardinality = B. Replicate means are exact-BIGINT "
        "numerators with one IEEE division; CI bounds are exact order "
        "statistics (ranks 3 and 98).",
)
def sample_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    reps = docs.select(
        "doc_id",
        "n_chars",
        F.explode(F.expr(f"sequence(1, {BOOT_B})")).alias("rep"),
    ).select(
        F.col("rep").cast("bigint").alias("rep"),
        "n_chars",
        F.expr(
            f"substring(md5(concat(cast(rep as string), ':{BOOT_SALT}:',"
            " cast(doc_id as string))), 1, 8)"
        ).alias("h"),
    )
    weighted = reps.select(
        "rep",
        F.expr(f"CAST({_pois_weight_case('h')} AS BIGINT)").alias("w"),
        "n_chars",
    )
    repmeans = (
        weighted.groupBy("rep")
        .agg(
            F.sum("w").cast("bigint").alias("sw"),
            F.sum(F.col("w") * F.col("n_chars")).cast("bigint").alias("swx"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "rep", (F.col("swx").cast("double") / F.col("sw")).alias("mean_r")
        )
    )
    ranked = repmeans.select(
        "mean_r",
        F.row_number()
        .over(Window.orderBy("mean_r", "rep"))
        .alias("rk"),
    )
    lo = ranked.filter(F.col("rk") == 3).select(F.col("mean_r").alias("ci_lo"))
    hi = ranked.filter(F.col("rk") == 98).select(F.col("mean_r").alias("ci_hi"))
    base = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (
            F.sum("n_chars").cast("double") / F.count(F.lit(1))
        ).alias("mean_chars"),
    )
    return (
        base.select(
            "n_docs", "mean_chars", F.lit(BOOT_B).cast("bigint").alias("n_replicates")
        )
        .crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
    )


# ---------------------------------------- importance-weight ESS audit -------

ESS_W_SCALE = 65536  # 16-bit weight quantization (same grid as the soft gate)


@query(
    "sample_ess_audit",
    oracle=f"""
    WITH q AS (
{_QW_QUALITY_SQL}
    ), wq AS (
      SELECT d.source,
             CAST(round({ESS_W_SCALE} * q.quality) AS BIGINT) AS w
      FROM q JOIN documents d USING (doc_id)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS sum_w,
           CAST(SUM(w * w) AS BIGINT) AS sum_w2,
           CAST(SUM(w) AS DOUBLE) * SUM(w) / SUM(w * w) AS ess,
           CAST(SUM(w) AS DOUBLE) * SUM(w) / SUM(w * w) / COUNT(*)
             AS ess_ratio
    FROM wq
    GROUP BY source
    ORDER BY source
    """,
    doc="Effective-sample-size audit of the quality importance weights "
    "(Kong 1992): per source, ESS = (Σw)²/Σw² and its ratio to the raw "
    "doc count — the diagnostic run BEFORE any weighted resample ships; "
    "ESS ratio near 1 means near-uniform weights (weighting is a no-op), "
    "a low ratio means a few documents dominate the resample and the "
    "downstream estimator's variance explodes. Weights quantize once to "
    "the 16-bit grid the soft sampling gate itself uses, so Σw and Σw² "
    "are exact BIGINT sums (order-independent); ESS is a final one-chain "
    "IEEE division. Scale: one narrow map + one hash shuffle to source "
    "grain — no data movement beyond the groupBy.",
)
def sample_ess_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import quality_col

    docs = _docs(spark, sf_dir)
    wq = docs.select(
        "source",
        F.round(F.lit(ESS_W_SCALE) * quality_col()).cast("bigint").alias("w"),
    )
    return (
        wq.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("w").cast("bigint").alias("sum_w"),
            F.sum(F.col("w") * F.col("w")).cast("bigint").alias("sum_w2"),
            (
                F.sum("w").cast("double")
                * F.sum("w")
                / F.sum(F.col("w") * F.col("w"))
            ).alias("ess"),
            (
                F.sum("w").cast("double")
                * F.sum("w")
                / F.sum(F.col("w") * F.col("w"))
                / F.count(F.lit(1))
            ).alias("ess_ratio"),
        )
        .orderBy("source")
    )


# --------------------------------------- truncated importance sampling ------

ESS_CLIP_PCTS = (90, 99, 100)  # clip grid: p90 / p99 / no-clip


@query(
    "sample_weight_truncation",
    oracle=f"""
    WITH q AS (
{_QW_QUALITY_SQL}
    ), wq AS (
      SELECT CAST(round({ESS_W_SCALE} * quality) AS BIGINT) AS w FROM q
    ), hist AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM wq GROUP BY w
    ), cum AS (
      SELECT w, c,
             SUM(c) OVER (ORDER BY w
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
             SUM(c) OVER () AS n
      FROM hist
    ), taus AS (
      SELECT p.pct, MIN(cum.w) AS tau
      FROM (VALUES {", ".join(f"({p})" for p in ESS_CLIP_PCTS)}) AS p(pct)
      JOIN cum ON cum.cc * 100 >= p.pct * cum.n
      GROUP BY p.pct
    ), clipped AS (
      SELECT t.pct, t.tau,
             CAST(SUM(LEAST(h.w, t.tau) * h.c) AS BIGINT) AS s1,
             CAST(SUM(LEAST(h.w, t.tau) * LEAST(h.w, t.tau) * h.c)
                  AS BIGINT) AS s2,
             CAST(SUM(h.c) AS BIGINT) AS n,
             CAST(SUM(h.w * h.c) AS BIGINT) AS mass,
             CAST(SUM(CASE WHEN h.w > t.tau THEN h.c ELSE 0 END)
                  AS BIGINT) AS n_clipped
      FROM taus t CROSS JOIN hist h
      GROUP BY t.pct, t.tau
    )
    SELECT CAST(pct AS BIGINT) AS pct, tau,
           CAST(s1 AS DOUBLE) * s1 / s2 AS ess,
           CAST(s1 AS DOUBLE) * s1 / s2 / n AS ess_ratio,
           1.0 - CAST(s1 AS DOUBLE) / mass AS mass_clipped,
           n_clipped
    FROM clipped
    ORDER BY pct
    """,
    doc="Truncated importance sampling audit (Ionides 2008): clip the "
    "quality weights at their own p90/p99/max and report, per clip "
    "level, the effective sample size, ESS ratio, clipped-mass fraction "
    "and clipped-doc count — the bias/variance operating curve consulted "
    "before a weighted resample ships (clipping trades a bounded bias "
    "for the variance the ESS audit flags). EVERYTHING after the one "
    "corpus pass runs on the weight HISTOGRAM: weights live on the "
    "16-bit grid, so the histogram is register-domain (<= 65537 rows), "
    "quantile thresholds come from exact cumulative-count integer math "
    "(the sketch_hist_quantiles idiom), and each clip level's moment "
    "sums fold SUM(min(w,tau)^k * count) over that histogram — the "
    "3-level grid costs three passes over metadata, zero over data. All "
    "exact BIGINT; ESS is a final one-chain IEEE division.",
)
def sample_weight_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import quality_col

    docs = _docs(spark, sf_dir)
    hist = (
        docs.select(
            F.round(F.lit(ESS_W_SCALE) * quality_col())
            .cast("bigint")
            .alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)  # register-domain; taus + 3 folds
    )
    wcum = Window.orderBy("w").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = hist.withColumn("cc", F.sum("c").over(wcum)).withColumn(
        "n", F.sum("c").over(wall)
    )
    pcts = spark.createDataFrame(
        [(p,) for p in ESS_CLIP_PCTS], "pct bigint"
    )
    taus = (
        F.broadcast(pcts)
        .join(cum, F.col("cc") * 100 >= F.col("pct") * F.col("n"))
        .groupBy("pct")
        .agg(F.min("w").alias("tau"))
    )
    clipped = (
        F.broadcast(taus)
        .crossJoin(hist)
        .groupBy("pct", "tau")
        .agg(
            F.sum(F.least(F.col("w"), F.col("tau")) * F.col("c"))
            .cast("bigint")
            .alias("s1"),
            F.sum(
                F.least(F.col("w"), F.col("tau"))
                * F.least(F.col("w"), F.col("tau"))
                * F.col("c")
            )
            .cast("bigint")
            .alias("s2"),
            F.sum("c").cast("bigint").alias("n"),
            F.sum(F.col("w") * F.col("c")).cast("bigint").alias("mass"),
            F.sum(F.when(F.col("w") > F.col("tau"), F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("n_clipped"),
        )
    )
    return clipped.select(
        "pct",
        "tau",
        F.expr("cast(s1 as double) * s1 / s2").alias("ess"),
        F.expr("cast(s1 as double) * s1 / s2 / n").alias("ess_ratio"),
        F.expr("1.0 - cast(s1 as double) / mass").alias("mass_clipped"),
        "n_clipped",
    ).orderBy("pct")


# --------------------------------------------- quality operating curve ------

QF_PCTS = (25, 50, 75, 90)  # candidate cut percentiles


@query(
    "text_quality_frontier",
    oracle=f"""
    WITH q AS (
{_QW_QUALITY_SQL}
    ), wq AS (
      SELECT CAST(round({ESS_W_SCALE} * q.quality) AS BIGINT) AS w,
             CAST(len(string_split(trim(d.text), ' ')) AS BIGINT) AS toks
      FROM q JOIN documents d USING (doc_id)
    ), hist AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(toks) AS BIGINT) AS tk
      FROM wq GROUP BY w
    ), tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(tk) AS BIGINT) AS t
      FROM hist
    ), cum AS (
      SELECT w, c,
             SUM(c) OVER (ORDER BY w
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM hist
    ), taus AS (
      SELECT p.pct, MIN(cum.w) AS tau
      FROM (VALUES {", ".join(f"({p})" for p in QF_PCTS)}) AS p(pct)
      JOIN cum ON cum.cc * 100 >= p.pct * (SELECT n FROM tot)
      GROUP BY p.pct
    ), kept AS (
      SELECT t2.pct, t2.tau,
             CAST(SUM(CASE WHEN h.w >= t2.tau THEN h.c ELSE 0 END)
                  AS BIGINT) AS kept_docs,
             CAST(SUM(CASE WHEN h.w >= t2.tau THEN h.tk ELSE 0 END)
                  AS BIGINT) AS kept_tokens,
             CAST(SUM(CASE WHEN h.w >= t2.tau THEN h.w * h.c ELSE 0 END)
                  AS BIGINT) AS kept_wsum
      FROM taus t2 CROSS JOIN hist h
      GROUP BY t2.pct, t2.tau
    )
    SELECT CAST(k.pct AS BIGINT) AS pct, k.tau,
           k.kept_docs,
           k.kept_docs / CAST(tot.n AS DOUBLE) AS kept_doc_frac,
           k.kept_tokens,
           k.kept_tokens / CAST(tot.t AS DOUBLE) AS kept_token_frac,
           CAST(k.kept_wsum AS DOUBLE)
             / (k.kept_docs * {ESS_W_SCALE}.0) AS mean_quality_kept
    FROM kept k CROSS JOIN tot
    ORDER BY pct
    """,
    doc="Quality-cut operating curve: for cuts at the quality score's own "
    "p25/p50/p75/p90, the kept doc/token mass and the mean quality of "
    "the survivors — the frontier a cleaning pipeline consults to price "
    "a threshold before committing to it (text_filter_cascade applies "
    "ONE chosen gate; this prices the whole menu). Same register-domain "
    "discipline as sample_weight_truncation: one corpus pass builds the "
    "16-bit (quality -> doc count, token mass) histogram, thresholds "
    "come from exact cumulative-count integer math, and each cut's "
    "kept-mass sums fold over the <= 65537-row histogram — four cuts "
    "cost four metadata passes, zero data passes. All exact BIGINT; the "
    "fractions are final one-chain IEEE divisions.",
)
def text_quality_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import quality_col

    docs = _docs(spark, sf_dir)
    hist = (
        docs.select(
            F.round(F.lit(ESS_W_SCALE) * quality_col())
            .cast("bigint")
            .alias("w"),
            F.size(F.split(F.trim(F.col("text")), " "))
            .cast("bigint")
            .alias("toks"),
        )
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("c"),
            F.sum("toks").cast("bigint").alias("tk"),
        )
        .localCheckpoint(eager=False)  # register-domain; taus + folds
    )
    wcum = Window.orderBy("w").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = (
        hist.withColumn("cc", F.sum("c").over(wcum))
        .withColumn("n", F.sum("c").over(wall))
        .withColumn("t", F.sum("tk").over(wall))
    )
    pcts = spark.createDataFrame([(p,) for p in QF_PCTS], "pct bigint")
    taus = (
        F.broadcast(pcts)
        .join(cum, F.col("cc") * 100 >= F.col("pct") * F.col("n"))
        .groupBy("pct")
        .agg(F.min("w").alias("tau"))
    )
    tot = hist.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum("tk").cast("bigint").alias("t"),
    )
    kept = (
        F.broadcast(taus)
        .crossJoin(hist)
        .groupBy("pct", "tau")
        .agg(
            F.sum(F.when(F.col("w") >= F.col("tau"), F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("kept_docs"),
            F.sum(F.when(F.col("w") >= F.col("tau"), F.col("tk")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
            F.sum(
                F.when(
                    F.col("w") >= F.col("tau"), F.col("w") * F.col("c")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("kept_wsum"),
        )
    )
    return (
        kept.crossJoin(F.broadcast(tot))
        .select(
            "pct",
            "tau",
            "kept_docs",
            F.expr("kept_docs / cast(n as double)").alias("kept_doc_frac"),
            "kept_tokens",
            F.expr("kept_tokens / cast(t as double)").alias(
                "kept_token_frac"
            ),
            F.expr(
                f"cast(kept_wsum as double) / (kept_docs * {ESS_W_SCALE}.0)"
            ).alias("mean_quality_kept"),
        )
        .orderBy("pct")
    )


# ------------------------------------------------ k-fold CV assignment ------

KFOLD = 5
SALT_F = "kf1:"  # version the folds; changing it redraws everything


@query(
    "sample_kfold_assignments",
    oracle=f"""
    WITH assign AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5('{SALT_F}' || doc_id::VARCHAR), 1, 15))
                  AS BIGINT) % {KFOLD} AS fold
      FROM documents
    ), cell AS (
      SELECT fold, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM assign GROUP BY fold, lang
    ), lt AS (
      SELECT lang, CAST(SUM(n) AS BIGINT) AS lang_total FROM cell
      GROUP BY lang
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total FROM cell
    ), ft AS (
      SELECT fold, CAST(SUM(n) AS BIGINT) AS fold_total FROM cell
      GROUP BY fold
    )
    SELECT c.fold, c.lang, c.n,
           CAST(lt.lang_total * ft.fold_total AS DOUBLE) / tot.total
             AS expected,
           (c.n - CAST(lt.lang_total * ft.fold_total AS DOUBLE) / tot.total)
             * (c.n - CAST(lt.lang_total * ft.fold_total AS DOUBLE)
                / tot.total)
             / (CAST(lt.lang_total * ft.fold_total AS DOUBLE) / tot.total)
             AS chi2_term
    FROM cell c
    JOIN lt USING (lang) JOIN ft USING (fold) CROSS JOIN tot
    ORDER BY c.fold, c.lang
    """,
    doc=f"Deterministic {KFOLD}-fold cross-validation assignment with a "
    "stratification-balance audit: fold = salted-md5(doc_id) mod k (the "
    "events_ab_lift assignment discipline — reproducible across engines, "
    "reruns, and cluster layouts), and per (fold, lang) cell the "
    "observed count, the independence-expected count, and its chi-square "
    "term — summing chi2_term over the grid against chi2((k-1)(L-1)) df "
    "is the pre-registration check that no fold is accidentally "
    "language-skewed before per-fold eval numbers get compared. Scale: "
    "one narrow hash map + one (fold, lang)-grain shuffle; margins and "
    "the grid are k x L metadata. Counts and margin products are exact "
    "BIGINT; expected/chi2 are fixed one-chain IEEE expressions.",
)
def sample_kfold_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    assign = docs.select(
        "lang",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(SALT_F), F.col("doc_id").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % KFOLD
        ).alias("fold"),
    )
    cell = assign.groupBy("fold", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    cell = cell.localCheckpoint(eager=False)  # k x L grid; 3 margins + join
    lt = cell.groupBy("lang").agg(F.sum("n").cast("bigint").alias("lang_total"))
    ft = cell.groupBy("fold").agg(F.sum("n").cast("bigint").alias("fold_total"))
    tot = cell.agg(F.sum("n").cast("bigint").alias("total"))
    expected = F.expr(
        "cast(lang_total * fold_total as double) / total"
    )
    return (
        cell.join(F.broadcast(lt), "lang")
        .join(F.broadcast(ft), "fold")
        .crossJoin(F.broadcast(tot))
        .select(
            "fold",
            "lang",
            "n",
            expected.alias("expected"),
            (
                (F.col("n") - expected)
                * (F.col("n") - expected)
                / expected
            ).alias("chi2_term"),
        )
        .orderBy("fold", "lang")
    )


# ---------------------------------------------------- time-decayed admission
#
# Recency-weighted sampling as a pure map-side integer gate: an event aged
# `a` days is admitted with probability 2^(−floor(a / HALF_LIFE)) — full
# admission for the newest half-life window, halving per window. The gate
# is `u < 2^52 >> floor(a/HL)` with u the 52-bit uniform from the md5 hex
# prefix (the Bernoulli-by-hash idiom above): a power-of-two threshold
# shift needs NO float arithmetic, so the admission set is bit-identical
# across engines and across reruns (replay-idempotent by construction —
# the property a backfill needs). The only non-map work is the 1-row
# reference-day broadcast and the dimension-grain acceptance report; at
# 100 TB the gate filters at the scan.

DECAY_HALF_LIFE_DAYS = 7
DECAY_SALT = "decay:"
_U52 = 1 << 52


@query(
    "sample_decayed_admission",
    oracle=f"""
    WITH ev AS (
      SELECT event_id, event_type, CAST(ts AS DATE) AS day FROM events
    ), ref AS (
      SELECT MAX(day) AS ref_day FROM ev
    ), gated AS (
      SELECT e.event_id, e.event_type,
             datediff('day', e.day, ref.ref_day) // {DECAY_HALF_LIFE_DAYS}
               AS k,
             CAST(('0x' || substr(md5('{DECAY_SALT}' || e.event_id::VARCHAR),
                                  1, 13)) AS BIGINT) AS u
      FROM ev e CROSS JOIN ref
    )
    SELECT event_type, k,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (WHERE u < ({_U52} >> k)) AS BIGINT)
             AS n_admitted,
           CAST(COUNT(*) FILTER (WHERE u < ({_U52} >> k)) AS DOUBLE)
             / COUNT(*) AS admit_rate
    FROM gated
    GROUP BY event_type, k
    ORDER BY event_type, k
    """,
    doc=f"Time-decayed admission sampling report: events admitted with "
        f"probability 2^(−floor(age/{DECAY_HALF_LIFE_DAYS}d)) via an "
        "integer power-of-two threshold over the 52-bit md5 uniform — no "
        "float in the gate, bit-identical admission across engines and "
        "reruns (backfill-idempotent). Per (event_type, half-life bucket): "
        "population, admitted count, realized rate vs the nominal 2^−k. "
        "Map-side gate at the scan + dimension-grain rollup; the 1-row "
        "reference day is the only broadcast.",
)
def sample_decayed_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("ts").cast("date").alias("day")
    )
    ref = ev.agg(F.max("day").alias("ref_day"))
    gated = ev.crossJoin(F.broadcast(ref)).select(
        "event_type",
        F.floor(
            F.datediff(F.col("ref_day"), F.col("day"))
            / F.lit(DECAY_HALF_LIFE_DAYS)
        ).cast("long").alias("k"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(DECAY_SALT), F.col("event_id").cast("string"))
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long").alias("u"),
    )
    # Spark's shiftright masks the shift count mod 64 (Java semantics), so
    # an event aged >= 64 half-lives would wrap to full admission where the
    # saturating-shift oracle admits none. Clamp to 63: for every k >= 53
    # the threshold is already 0 in both engines, so least(k, 63) is exact.
    admit = F.expr(
        f"u < shiftright(cast({_U52} as bigint), cast(least(k, 63L) as int))"
    )
    return (
        gated.groupBy("event_type", "k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count(F.when(admit, 1)).cast("bigint").alias("n_admitted"),
            (
                F.count(F.when(admit, 1)).cast("double") / F.count(F.lit(1))
            ).alias("admit_rate"),
        )
        .orderBy("event_type", "k")
    )


# ------------------------------------------- PPS systematic sampling -------
#
# Probability-proportional-to-size systematic sampling — the survey-
# statistics workhorse (Madow 1949) a token-budgeted corpus draw wants:
# lay all items on a line scaled by weight (here n_chars), walk it with
# a fixed step T/k from the deterministic half-step anchor, and select
# every item whose weight interval contains an anchor. Selection count
# per item is EXACTLY floor-counting the odd multiples of T/(2k) inside
# [2k·c_i, 2k·(c_i+w_i)) — pure BIGINT div arithmetic on the weight
# prefix sums, so both engines agree bit-for-bit and Σ hits = k by
# construction (asserted in the output). Items heavier than the step
# are selected multiple times (certainty items — exactly the PPS
# semantics). Work shape: an exact DISTRIBUTED global weight prefix
# sum (range partition + per-partition running sums + broadcast
# partition offsets — the _global_rank discipline, no single-task
# window) + one hash agg; the oracle's plain global window is the spec
# being matched.

PPS_K = 200  # anchors drawn per corpus


@query(
    "sample_pps_systematic",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS wt,
             CAST(COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS c
      FROM documents
    ), tt AS (
      SELECT CAST(SUM(wt) AS BIGINT) AS t FROM w
    ), hits AS (
      SELECT doc_id, source, wt,
             CASE WHEN o_hi >= o_lo THEN (o_hi - o_lo) // 2 + 1
                  ELSE CAST(0 AS BIGINT) END AS m
      FROM (
        SELECT doc_id, source, wt,
               olo + CASE WHEN olo % 2 = 0 THEN 1 ELSE 0 END AS o_lo,
               ohi - CASE WHEN ohi % 2 = 0 THEN 1 ELSE 0 END AS o_hi
        FROM (
          SELECT doc_id, source, wt,
                 (2 * {PPS_K} * c + t - 1) // t AS olo,
                 (2 * {PPS_K} * (c + wt) - 1) // t AS ohi
          FROM w CROSS JOIN tt
        )
      )
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_selected,
           CAST(SUM(CASE WHEN m > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_certainty,
           CAST(SUM(m) AS BIGINT) AS hits,
           CAST(SUM(wt) AS BIGINT) AS weight,
           CAST(SUM(CASE WHEN m > 0 THEN wt ELSE 0 END) AS BIGINT)
             AS sel_weight
    FROM hits
    GROUP BY source
    ORDER BY source
    """,
    doc="Madow systematic PPS sampling over documents weighted by "
        f"n_chars: {PPS_K} deterministic half-step anchors walk the "
        "weight line, per-item hit counts fall out of exact BIGINT "
        "floor-counting of odd step multiples inside each weight "
        "interval (Σ hits = k by construction; heavy items hit "
        "multiple times = certainty selections). The weight prefix sum "
        "is distributed (range partition + broadcast offsets, no "
        "single-task window); per-source selection/certainty/weight "
        "coverage report.",
)
def sample_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("bigint").alias("wt")
    )
    # exact global weight prefix sum WITHOUT a single-task window: the
    # shared _global_prefix_sum helper (range partition on doc_id,
    # per-partition running sum, broadcast per-partition weight offsets —
    # the only unpartitioned window runs over <= |partitions| offset rows)
    from .timeseries import _global_prefix_sum

    w = _global_prefix_sum(docs, ["doc_id"], "wt", "c").select(
        "doc_id", "source", "wt", "c"
    )
    tt = docs.agg(F.sum("wt").cast("bigint").alias("t"))
    # one bounded 1-row broadcast: the total weight
    bounds = (
        w.crossJoin(F.broadcast(tt))
        .select(
            "doc_id",
            "source",
            "wt",
            F.expr(f"(2 * {PPS_K} * c + t - 1) div t").alias("olo"),
            F.expr(f"(2 * {PPS_K} * (c + wt) - 1) div t").alias("ohi"),
        )
        .select(
            "doc_id",
            "source",
            "wt",
            F.expr("olo + CASE WHEN olo % 2 = 0 THEN 1 ELSE 0 END").alias(
                "o_lo"
            ),
            F.expr("ohi - CASE WHEN ohi % 2 = 0 THEN 1 ELSE 0 END").alias(
                "o_hi"
            ),
        )
    )
    hits = bounds.select(
        "doc_id",
        "source",
        "wt",
        F.expr(
            "CASE WHEN o_hi >= o_lo THEN (o_hi - o_lo) div 2 + 1"
            " ELSE 0L END"
        ).alias("m"),
    )
    return (
        hits.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum((F.col("m") > 0).cast("bigint")).cast("bigint").alias(
                "n_selected"
            ),
            F.sum((F.col("m") > 1).cast("bigint")).cast("bigint").alias(
                "n_certainty"
            ),
            F.sum("m").cast("bigint").alias("hits"),
            F.sum("wt").cast("bigint").alias("weight"),
            F.sum(F.when(F.col("m") > 0, F.col("wt")).otherwise(0))
            .cast("bigint")
            .alias("sel_weight"),
        )
        .orderBy("source")
    )
