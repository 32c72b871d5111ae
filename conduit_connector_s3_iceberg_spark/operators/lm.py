"""Corpus-trained n-gram language-model scoring (north-star layer).

The model-based cousin of ``text_rarity_score``: train a bigram model on
the corpus itself, then score every document by the mean conditional
probability of its bigrams — the cheap "fluency" proxy (KenLM-style
perplexity filtering without the external model) that production cleaning
pipelines run between heuristic quality scoring and model-based filtering.
Documents full of common transitions score high; boilerplate with rare or
never-seen transitions scores low.

Determinism: per-bigram conditional probabilities are computed ONCE in the
model table as ``round(SCALE * c2 / c1)`` — a single correctly-rounded IEEE
division + round, identical across engines — and every cross-row
accumulation after that is BIGINT. The per-doc mean is one exact integer
ratio emitted as a final division. No float ever accumulates across rows,
so the score is bit-stable under any partitioning (the discipline of
``plans/helpers.py``).

Scale: the model (distinct bigrams) is vocabulary-sized, not corpus-sized;
the doc×model join runs on pre-aggregated per-doc bigram counts, so the
shuffle moves ``distinct(doc, bigram)`` rows, never raw token positions.
All hashing/explode work is JVM-side (``transform`` over token arrays —
no Python in the path).

Reference scope note: the reference connector (s3-iceberg destination) has
no text surface; this is part of the north-star LLM-pipeline extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

LM_SCALE = 1_000_000_000

# token array (lowercased, space-split) — identical in both engines
_TOKS_SPARK = "split(trim(lower(text)), ' ')"
_TOKS_SQL = "string_split(trim(lower(text)), ' ')"


@query(
    "lm_bigram_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ), bg AS (
      SELECT doc_id, t[g] AS w1, t[g + 1] AS w2
      FROM toks, UNNEST(range(1, len(t))) AS u(g)
    ), bgc AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2
    ), pfc AS (
      SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM bgc GROUP BY w1
    ), model AS (
      SELECT w1, w2,
             CAST(round({LM_SCALE} * c2 / c1) AS BIGINT) AS p_scaled
      FROM bgc JOIN pfc USING (w1)
    ), docbg AS (
      SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM bg GROUP BY doc_id, w1, w2
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
           CAST(SUM(cnt * p_scaled) AS BIGINT) AS fluency_scaled,
           CAST(CAST(SUM(cnt * p_scaled) AS BIGINT) AS DOUBLE)
             / (CAST(SUM(cnt) AS BIGINT) * {LM_SCALE}.0) AS mean_bigram_prob
    FROM docbg JOIN model USING (w1, w2)
    GROUP BY doc_id
    """,
    doc="Corpus-trained bigram LM fluency score: P(w2|w1) = c(w1,w2)/c(w1) "
        "estimated over the whole corpus, each doc scored by the mean "
        "conditional probability of its bigrams (KenLM-style perplexity "
        "filtering without the external model). Probabilities are "
        "quantized to scaled BIGINT once in the model table; every "
        "accumulation after that is exact integers — bit-stable under any "
        "shuffle order. The doc-side join input is pre-aggregated "
        "(doc, bigram, count), so the model join moves distinct pairs, "
        "not raw token positions.",
)
def lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # bigram structs, JVM-side: transform over the leading slice pairs each
    # token with its successor ([] is 0-based, slice() is 1-based)
    bg = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(slice({_TOKS_SPARK}, 1, size({_TOKS_SPARK}) - 1), "
                f"(x, i) -> struct(x AS w1, {_TOKS_SPARK}[i + 1] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))

    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    pfc = bgc.groupBy("w1").agg(F.sum("c2").alias("c1"))
    model = bgc.join(pfc, "w1").select(
        "w1",
        "w2",
        F.round(F.lit(LM_SCALE) * F.col("c2") / F.col("c1"))
        .cast("bigint")
        .alias("p_scaled"),
    )
    docbg = bg.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        docbg.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.sum(F.col("cnt") * F.col("p_scaled")).alias("fluency_scaled"),
            (
                F.sum(F.col("cnt") * F.col("p_scaled")).cast("double")
                / (F.sum("cnt") * F.lit(float(LM_SCALE)))
            ).alias("mean_bigram_prob"),
        )
    )


# ------------------------------------------------ fluency-bucket profile ----
#
# The artifact a perplexity FILTER actually consumes: how much of the
# corpus (docs and token mass) sits in each fluency band, so the cut
# threshold is chosen against real mass instead of a guess. Buckets are
# FIXED-WIDTH per-mille bands of the mean bigram probability, pure
# integer arithmetic — (1000 * fluency_scaled) div (n_bigrams * LM_SCALE) —
# NOT an ntile: ntile needs a corpus-wide sort, while fixed thresholds
# bucket in the same hash-agg that built the scores (the histogram-
# register discipline).

@query(
    "lm_score_buckets",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ), bg AS (
      SELECT doc_id, t[g] AS w1, t[g + 1] AS w2
      FROM toks, UNNEST(range(1, len(t))) AS u(g)
    ), bgc AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2
    ), pfc AS (
      SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM bgc GROUP BY w1
    ), model AS (
      SELECT w1, w2,
             CAST(round({LM_SCALE} * c2 / c1) AS BIGINT) AS p_scaled
      FROM bgc JOIN pfc USING (w1)
    ), docbg AS (
      SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM bg GROUP BY doc_id, w1, w2
    ), scores AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
             CAST(SUM(cnt * p_scaled) AS BIGINT) AS fluency_scaled
      FROM docbg JOIN model USING (w1, w2)
      GROUP BY doc_id
    )
    SELECT CAST((1000 * fluency_scaled) // (n_bigrams * {LM_SCALE})
                AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bigrams) AS BIGINT) AS token_mass
    FROM scores
    GROUP BY bucket
    ORDER BY bucket
    """,
    doc="Fluency-band corpus profile: documents and token mass per fixed "
    "per-mille band of the corpus-trained mean bigram probability — the mass "
    "table a perplexity-filter threshold is chosen against. Buckets by "
    "pure integer division of already-exact scaled scores (no ntile, "
    "no corpus-wide sort); the model/scoring plan is lm_bigram_score's.",
)
def lm_score_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    scores = lm_bigram_score(spark, sf_dir).select(
        "doc_id", "n_bigrams", "fluency_scaled"
    )
    bucket = F.expr(f"(1000 * fluency_scaled) div (n_bigrams * {LM_SCALE})").cast(
        "long"
    )
    return (
        scores.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bigrams").cast("long").alias("token_mass"),
        )
        .orderBy("bucket")
    )
