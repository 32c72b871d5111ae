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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

LM_SCALE = 1_000_000_000

# token array (lowercased, space-split) — identical in both engines and
# shared with the persisted counts state (ONE definition, so the state
# key covers every consumer's tokenizer)
from .lm_state import TOKS_SPARK as _TOKS_SPARK  # noqa: E402
from .lm_state import TOKS_SQL as _TOKS_SQL  # noqa: E402


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
        "not raw token positions. Served from the persisted token-counts "
        "state (lm_state.py): the corpus tokenize+explode runs at state-"
        "maintenance time, and the query reads the (doc, bigram, count) "
        "table — sum(cnt) regroupings are the same exact integers as the "
        "raw explode, so this oracle re-audits the persisted bytes "
        "against a from-scratch recomputation on every sweep.",
)
def lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .lm_state import serve_bi

    # (doc_id, w1, w2, cnt) from the persisted counts state — this IS the
    # docbg frame; the corpus-level model derives from it by regrouping
    docbg = serve_bi(spark, sf_dir).localCheckpoint(eager=False)
    bgc = docbg.groupBy("w1", "w2").agg(F.sum("cnt").alias("c2"))
    pfc = bgc.groupBy("w1").agg(F.sum("c2").alias("c1"))
    model = bgc.join(pfc, "w1").select(
        "w1",
        "w2",
        F.round(F.lit(LM_SCALE) * F.col("c2") / F.col("c1"))
        .cast("bigint")
        .alias("p_scaled"),
    )
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


# ------------------------------------------------ stupid-backoff trigram ----
#
# Brants et al. 2007 ("Large Language Models in Machine Translation"):
# S(w3|w1,w2) = f(w1w2w3)/f(w1w2) if seen, else 0.4 * f(w2w3)/f(w2),
# else 0.4^2 * f(w3)/T — the non-normalized backoff score that scales to
# web-sized models because it needs only raw counts, no discounting.
# Trained on the EVEN-doc_id half of the corpus and scoring the ODD half
# (held-out split), so the backoff branches actually fire: a self-trained
# model would hit the trigram table on every lookup.
#
# Determinism: each branch is quantized ONCE — round(CONST * c / c'),
# integer product then a single IEEE division and round, identical across
# engines (0.4·SCALE and 0.16·SCALE are integer constants) — and every
# cross-row accumulation after that is BIGINT (the lm_bigram_score
# discipline).

BO_TRI = LM_SCALE            # scale for the trigram branch
BO_BI = (2 * LM_SCALE) // 5  # 0.4  * scale — exact integers
BO_UNI = (4 * LM_SCALE) // 25  # 0.16 * scale


@query(
    "lm_stupid_backoff",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ), train_tri AS (
      SELECT t[g] AS w1, t[g + 1] AS w2, t[g + 2] AS w3
      FROM toks, UNNEST(range(1, len(t) - 1)) AS u(g)
      WHERE doc_id % 2 = 0
    ), train_bi AS (
      SELECT t[g] AS w1, t[g + 1] AS w2
      FROM toks, UNNEST(range(1, len(t))) AS u(g)
      WHERE doc_id % 2 = 0
    ), train_uni AS (
      SELECT t[g] AS w1
      FROM toks, UNNEST(range(1, len(t) + 1)) AS u(g)
      WHERE doc_id % 2 = 0
    ), c3 AS (
      SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c123
      FROM train_tri GROUP BY w1, w2, w3
    ), c2 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM train_bi GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM train_uni GROUP BY w1
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS t_tokens FROM train_uni
    ), doctri AS (
      SELECT doc_id, t[g] AS w1, t[g + 1] AS w2, t[g + 2] AS w3,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks, UNNEST(range(1, len(t) - 1)) AS u(g)
      WHERE doc_id % 2 = 1
      GROUP BY doc_id, t[g], t[g + 1], t[g + 2]
    ), scored AS (
      SELECT d.doc_id, d.cnt,
             CASE
               WHEN c3.c123 IS NOT NULL
                 THEN CAST(round({BO_TRI} * c3.c123 / cb.c12) AS BIGINT)
               WHEN bi.cb23 IS NOT NULL
                 THEN CAST(round({BO_BI} * bi.cb23 / cu.c1) AS BIGINT)
               WHEN u3.c1 IS NOT NULL
                 THEN CAST(round({BO_UNI} * u3.c1 / t_tokens) AS BIGINT)
               ELSE CAST(0 AS BIGINT)
             END AS s_scaled,
             CASE WHEN c3.c123 IS NOT NULL THEN 'tri'
                  WHEN bi.cb23 IS NOT NULL THEN 'bi'
                  WHEN u3.c1 IS NOT NULL THEN 'uni'
                  ELSE 'oov' END AS level
      FROM doctri d
      LEFT JOIN c3 ON d.w1 = c3.w1 AND d.w2 = c3.w2 AND d.w3 = c3.w3
      LEFT JOIN c2 cb ON d.w1 = cb.w1 AND d.w2 = cb.w2
      LEFT JOIN (SELECT w1 AS bw2, w2 AS bw3,
                        CAST(COUNT(*) AS BIGINT) AS cb23
                 FROM train_bi GROUP BY w1, w2) bi
        ON d.w2 = bi.bw2 AND d.w3 = bi.bw3
      LEFT JOIN c1 cu ON d.w2 = cu.w1
      LEFT JOIN c1 u3 ON d.w3 = u3.w1
      CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_trigrams,
           CAST(SUM(cnt * s_scaled) AS BIGINT) AS score_scaled,
           CAST(CAST(SUM(cnt * s_scaled) AS BIGINT) AS DOUBLE)
             / (CAST(SUM(cnt) AS BIGINT) * {LM_SCALE}.0) AS mean_score,
           CAST(SUM(CASE WHEN level = 'bi' THEN cnt ELSE 0 END) AS BIGINT)
             AS n_backoff_bi,
           CAST(SUM(CASE WHEN level = 'uni' THEN cnt ELSE 0 END) AS BIGINT)
             AS n_backoff_uni,
           CAST(SUM(CASE WHEN level = 'oov' THEN cnt ELSE 0 END) AS BIGINT)
             AS n_oov
    FROM scored
    GROUP BY doc_id
    """,
    doc="Stupid-backoff trigram scoring (Brants et al. 2007): the held-out "
        "half of the corpus scored against counts from the training half — "
        "S = f3/f2, backing off to 0.4·f2/f1, 0.16·f1/T, 0 for OOV, with "
        "per-level audit counts. Each branch quantized once "
        "(round(CONST·c/c'), integer product + one IEEE division), BIGINT "
        "sums after — bit-stable under any shuffle. All lookup tables are "
        "pre-aggregated count frames joined on their n-gram keys; the doc "
        "side is pre-aggregated (doc, trigram, cnt) so joins move distinct "
        "trigrams, not token positions.",
)
def lm_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TOKS_SPARK).alias("t")
    )
    # tokenized train split is consumed 3× (tri/bi/uni explodes): materialize
    # once so the split+filter front end runs once, not per consumer (the
    # shared-index discipline from dedup.py; scratch table on a cluster)
    train = docs.filter(F.col("doc_id") % 2 == 0).localCheckpoint(eager=False)
    score = docs.filter(F.col("doc_id") % 2 == 1)

    tri_expr = (
        "transform(slice(t, 1, greatest(size(t) - 2, 0)), "
        "(x, i) -> struct(x AS w1, t[i + 1] AS w2, t[i + 2] AS w3))"
    )
    bi_expr = (
        "transform(slice(t, 1, greatest(size(t) - 1, 0)), "
        "(x, i) -> struct(x AS w1, t[i + 1] AS w2))"
    )

    train_tri = train.select(F.explode(F.expr(tri_expr)).alias("g")).select(
        "g.w1", "g.w2", "g.w3"
    )
    train_bi = train.select(F.explode(F.expr(bi_expr)).alias("g")).select(
        "g.w1", "g.w2"
    )
    train_uni = train.select(F.explode("t").alias("w1"))

    c3 = train_tri.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("bigint").alias("c123")
    )
    c2 = train_bi.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12")
    )
    # the (w2,w3)-keyed bigram table is the SAME counts as c2, renamed —
    # no second corpus-wide aggregation
    bi23 = c2.select(
        F.col("w1").alias("bw2"),
        F.col("w2").alias("bw3"),
        F.col("c12").alias("cb23"),
    )
    c1 = train_uni.groupBy("w1").agg(
        F.count(F.lit(1)).cast("bigint").alias("c1")
    )
    # token total = sum of the vocab-sized unigram table, not a 4th corpus pass
    tot = c1.agg(F.sum("c1").cast("bigint").alias("t_tokens"))

    doctri = (
        score.select("doc_id", F.explode(F.expr(tri_expr)).alias("g"))
        .select("doc_id", "g.w1", "g.w2", "g.w3")
        .groupBy("doc_id", "w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .alias("d")
    )
    joined = (
        doctri.join(
            c3.alias("c3"),
            (F.col("d.w1") == F.col("c3.w1"))
            & (F.col("d.w2") == F.col("c3.w2"))
            & (F.col("d.w3") == F.col("c3.w3")),
            "left",
        )
        .join(
            c2.alias("cb"),
            (F.col("d.w1") == F.col("cb.w1")) & (F.col("d.w2") == F.col("cb.w2")),
            "left",
        )
        .join(
            bi23,
            (F.col("d.w2") == F.col("bw2")) & (F.col("d.w3") == F.col("bw3")),
            "left",
        )
        .join(
            c1.alias("cu"), F.col("d.w2") == F.col("cu.w1"), "left"
        )
        .join(
            c1.alias("u3"), F.col("d.w3") == F.col("u3.w1"), "left"
        )
        .crossJoin(F.broadcast(tot))
    )
    s_scaled = (
        F.when(
            F.col("c123").isNotNull(),
            F.round(F.lit(BO_TRI) * F.col("c123") / F.col("c12")).cast("bigint"),
        )
        .when(
            F.col("cb23").isNotNull(),
            F.round(F.lit(BO_BI) * F.col("cb23") / F.col("cu.c1")).cast("bigint"),
        )
        .when(
            F.col("u3.c1").isNotNull(),
            F.round(F.lit(BO_UNI) * F.col("u3.c1") / F.col("t_tokens")).cast(
                "bigint"
            ),
        )
        .otherwise(F.lit(0).cast("bigint"))
    )
    level = (
        F.when(F.col("c123").isNotNull(), "tri")
        .when(F.col("cb23").isNotNull(), "bi")
        .when(F.col("u3.c1").isNotNull(), "uni")
        .otherwise("oov")
    )
    scored = joined.select(
        F.col("d.doc_id").alias("doc_id"),
        F.col("d.cnt").alias("cnt"),
        s_scaled.alias("s_scaled"),
        level.alias("level"),
    )
    return scored.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_trigrams"),
        F.sum(F.col("cnt") * F.col("s_scaled")).cast("bigint").alias("score_scaled"),
        (
            F.sum(F.col("cnt") * F.col("s_scaled")).cast("double")
            / (F.sum("cnt") * F.lit(float(LM_SCALE)))
        ).alias("mean_score"),
        F.sum(F.when(F.col("level") == "bi", F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("n_backoff_bi"),
        F.sum(F.when(F.col("level") == "uni", F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("n_backoff_uni"),
        F.sum(F.when(F.col("level") == "oov", F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("n_oov"),
    )


# ------------------------------------------------ conditional entropy ------
#
# Corpus-level conditional entropy H(W2 | W1) of the bigram model — the
# predictability scalar: low H means the next token is easy to guess
# (template-heavy / repetitive corpora), high H means diverse
# continuations. Complements text_token_entropy (unigram, per-doc) and
# text_ngram_diversity (distinct ratios) with the conditional view.
#
# H(W2|W1) = (1/N) * sum over bigrams c12 * (log2 c1 - log2 c12), with
# log2 as Mitchell's bit-length approximation over INTEGER counts only
# (the suite's libm-free log: deterministic IEEE sequence in both
# engines), each log pre-quantized to 1e6 before the exact BIGINT fold.


def _mlog2_q(col: str) -> str:
    """Quantized Mitchell log2 of an integer column (both engines:
    identical arithmetic; DuckDB `bin` == Spark `bin` for positives)."""
    return (
        f"CAST(round(1000000.0 * ((length(bin({col})) - 1)"
        f" + ({col} / (CAST(1 AS BIGINT) << (length(bin({col})) - 1)) - 1.0)))"
        " AS BIGINT)"
    )


def _mlog2_q_spark(col: str) -> str:
    return (
        f"cast(round(1000000.0 * ((length(bin({col})) - 1)"
        f" + ({col} / shiftleft(cast(1 as bigint), length(bin({col})) - 1)"
        " - 1.0))) as bigint)"
    )


@query(
    "lm_conditional_entropy",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ), bg AS (
      SELECT t[g] AS w1, t[g + 1] AS w2
      FROM toks, UNNEST(range(1, len(t))) AS u(g)
    ), bgc AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2
    ), pfc AS (
      SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bgc GROUP BY w1
    ), terms AS (
      SELECT c12, {_mlog2_q('c1')} AS l1, {_mlog2_q('c12')} AS l12
      FROM bgc JOIN pfc USING (w1)
    )
    SELECT CAST(SUM(c12) AS BIGINT) AS n_bigrams,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams,
           CAST(SUM(c12 * (l1 - l12)) AS BIGINT) AS h_scaled,
           CAST(CAST(SUM(c12 * (l1 - l12)) AS BIGINT) AS DOUBLE)
             / SUM(c12) / 1000000.0 AS cond_entropy_bits
    FROM terms
    """,
    doc="Corpus conditional entropy H(next token | current token) over "
        "the bigram model: the predictability scalar separating diverse "
        "text (high H) from template/boilerplate corpora (low H). "
        "Mitchell bit-length log2 over integer counts only (libm-free, "
        "per the suite's entropy discipline), quantized to 1e6 before "
        "the exact BIGINT fold; one IEEE division at emission. Two "
        "vocabulary-sized hash aggs after the bigram explode.",
)
def lm_conditional_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .lm_state import serve_bi

    # corpus bigram counts regrouped from the persisted per-doc counts
    bgc = serve_bi(spark, sf_dir).groupBy("w1", "w2").agg(
        F.sum("cnt").cast("bigint").alias("c12")
    )
    pfc = bgc.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    terms = bgc.join(pfc, "w1").select(
        "c12",
        F.expr(_mlog2_q_spark("c1")).alias("l1"),
        F.expr(_mlog2_q_spark("c12")).alias("l12"),
    )
    return terms.agg(
        F.sum("c12").cast("bigint").alias("n_bigrams"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_bigrams"),
        F.sum(F.col("c12") * (F.col("l1") - F.col("l12")))
        .cast("bigint")
        .alias("h_scaled"),
        (
            F.sum(F.col("c12") * (F.col("l1") - F.col("l12")))
            .cast("bigint")
            .cast("double")
            / F.sum("c12")
            / F.lit(1000000.0)
        ).alias("cond_entropy_bits"),
    )


# --------------------------------------------- per-source KL divergence ----
#
# Domain-similarity for data selection (the quantity behind DSIR-style
# importance weighting and the "is this crawl like my target?" question):
# per source, the KL divergence of its unigram distribution from the
# corpus distribution, in bits. KL(P_s || P_c) = (1/N_s) * Σ_w c_sw *
# (log2(c_sw/N_s) - log2(c_w/N)); the per-word contribution
# c_sw * (l(c_sw) - l(N_s) - l(c_w) + l(N)) is an exact BIGINT fold over
# quantized logs (every log argument is a positive count — c_w >= c_sw
# > 0 by construction, so the divergence is always defined).
#
# Log precision: KL of near-identical distributions is a SMALL
# difference of large log terms, so plain Mitchell log2 (max error
# 0.0861 bits/log — fine for the entropy queries, whose values are
# O(bits)) would swamp the signal. This op uses Mitchell plus the
# quadratic correction term 0.3466·f·(1−f) (minimax-fit; max error
# 0.0076 bits/log, 11x tighter), still libm-free and engine-identical:
# bit-length + two IEEE multiplies, quantized once to 1e6.
#
# Scale: one token explode, one (source, word) hash agg, one word-keyed
# join to the corpus counts (the only data-sized shuffle), and the
# per-source totals ride a broadcast; output is |sources| rows.


def _mlog2c_q(col: str) -> str:
    """Corrected quantized Mitchell log2 (DuckDB): k + f + 0.3466·f·(1−f)
    with f the mantissa offset — libm-free, deterministic."""
    f = f"({col} / (CAST(1 AS BIGINT) << (length(bin({col})) - 1)) - 1.0)"
    return (
        f"CAST(round(1000000.0 * ((length(bin({col})) - 1)"
        f" + {f} + 0.3466 * {f} * (1.0 - {f}))) AS BIGINT)"
    )


def _mlog2c_q_spark(col: str) -> str:
    f = (
        f"({col} / shiftleft(cast(1 as bigint), length(bin({col})) - 1)"
        " - 1.0)"
    )
    return (
        f"cast(round(1000000.0 * ((length(bin({col})) - 1)"
        f" + {f} + 0.3466 * {f} * (1.0 - {f}))) as bigint)"
    )


@query(
    "lm_source_kl",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({_TOKS_SQL}) AS w FROM documents
    ), sw AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c_sw
      FROM toks GROUP BY source, w
    ), wc AS (
      SELECT w, CAST(SUM(c_sw) AS BIGINT) AS c_w FROM sw GROUP BY w
    ), st AS (
      SELECT source, CAST(SUM(c_sw) AS BIGINT) AS n_s,
             CAST(COUNT(*) AS BIGINT) AS n_types
      FROM sw GROUP BY source
    ), tot AS (
      SELECT CAST(SUM(c_w) AS BIGINT) AS n FROM wc
    ), contrib AS (
      SELECT sw.source,
             CAST(SUM(sw.c_sw * ({_mlog2c_q('sw.c_sw')} - {_mlog2c_q('st.n_s')}
                       - {_mlog2c_q('wc.c_w')} + {_mlog2c_q('tot.n')}))
                  AS BIGINT) AS klq
      FROM sw
      JOIN wc USING (w)
      JOIN st ON st.source = sw.source
      CROSS JOIN tot
      GROUP BY sw.source
    )
    SELECT s.source, s.n_s AS n_tokens, s.n_types,
           CAST(c.klq AS DOUBLE) / (CAST(s.n_s AS DOUBLE) * 1000000.0)
             AS kl_bits
    FROM st s JOIN contrib c ON c.source = s.source
    ORDER BY s.source
    """,
    doc="Per-source unigram KL divergence from the corpus distribution "
    "(bits/token) — the domain-similarity number behind DSIR-style "
    "data selection: a source with high KL is out-of-distribution "
    "relative to the pooled corpus and gets up/down-weighted "
    "accordingly. Exact-integer fold of quantized Mitchell log2 over "
    "counts (libm-free — the lm_conditional_entropy discipline; the "
    "piecewise-linear log2 can leave a near-uniform source a few 1e-4 "
    "bits NEGATIVE — bounded approximation error, not a sign the "
    "divergence is wrong-ordered across sources); one token explode + "
    "one (source, word) agg + one word-keyed join; |sources|-row "
    "output.",
)
def lm_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.expr(_TOKS_SPARK)).alias("w")
    )
    sw = toks.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_sw")
    )
    sw = sw.localCheckpoint(eager=False)  # feeds wc, st, contrib
    wc = sw.groupBy("w").agg(F.sum("c_sw").cast("bigint").alias("c_w"))
    st = sw.groupBy("source").agg(
        F.sum("c_sw").cast("bigint").alias("n_s"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
    tot = wc.agg(F.sum("c_w").cast("bigint").alias("n"))
    contrib = (
        sw.join(wc, "w")
        .join(F.broadcast(st.select("source", "n_s")), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            (
                F.col("c_sw")
                * (
                    F.expr(_mlog2c_q_spark("c_sw"))
                    - F.expr(_mlog2c_q_spark("n_s"))
                    - F.expr(_mlog2c_q_spark("c_w"))
                    + F.expr(_mlog2c_q_spark("n"))
                )
            ).alias("x"),
        )
        .groupBy("source")
        .agg(F.sum("x").cast("bigint").alias("klq"))
    )
    return (
        st.join(contrib, "source")
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            "n_types",
            (
                F.col("klq").cast("double")
                / (F.col("n_s").cast("double") * F.lit(1000000.0))
            ).alias("kl_bits"),
        )
        .orderBy("source")
    )


# ------------------------------------------------ CCNet perplexity gate ----
#
# Wenzek et al. 2020 (CCNet): split each LANGUAGE's documents into
# head / middle / tail thirds by LM perplexity and keep the head (or
# head+middle) for training. The corpus-trained mean-bigram-probability
# score above is the module's perplexity stand-in (high score = low
# perplexity), so head = highest-score third PER LANGUAGE.
#
# The scalable cut: CCNet's percentile thresholds are NOT computed with
# ntile over the corpus (a per-language global sort — the anti-pattern at
# 100 TB). Scores are first bucketed into fixed per-mille bands in the
# same hash agg that built them (lm_score_buckets' move); the cumulative
# window that places the 1/3 and 2/3 cuts then runs over the
# language × ≤1001-row BAND table, and band classes broadcast back onto
# the corpus. Cuts land on band boundaries — the band straddling a cut
# goes whole to the earlier class — which is the documented granularity
# trade for never sorting the corpus. All cut arithmetic is BIGINT
# (3·cum_start vs n_docs), bit-stable cross-engine.

@query(
    "lm_perplexity_gate",
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
    ), scored AS (
      SELECT s.doc_id, d.lang,
             CAST((1000 * s.fluency_scaled) // (s.n_bigrams * {LM_SCALE})
                  AS BIGINT) AS bucket
      FROM scores s JOIN documents d ON s.doc_id = d.doc_id
    ), bands AS (
      SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM scored GROUP BY lang, bucket
    ), cum AS (
      SELECT lang, bucket, n_docs,
             COALESCE(CAST(SUM(n_docs) OVER (
               PARTITION BY lang ORDER BY bucket DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS BIGINT), 0) AS cum_start,
             CAST(SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
      FROM bands
    ), classed AS (
      SELECT lang, bucket,
             CASE WHEN 3 * cum_start < n_lang THEN 'head'
                  WHEN 3 * cum_start < 2 * n_lang THEN 'middle'
                  ELSE 'tail' END AS ppl_band
      FROM cum
    )
    SELECT s.doc_id, s.lang, s.bucket, c.ppl_band
    FROM scored s JOIN classed c ON s.lang = c.lang AND s.bucket = c.bucket
    ORDER BY s.doc_id
    """,
    doc="CCNet-style per-language perplexity gate (Wenzek et al. 2020): "
        "head / middle / tail thirds of each language by the corpus-trained "
        "mean bigram probability (high score = low perplexity). Thresholds "
        "come from a cumulative window over the language × per-mille BAND "
        "table (≤1001 rows/language), never an ntile over the corpus — the "
        "band straddling a cut goes whole to the earlier class, the "
        "documented granularity trade that avoids a per-language global "
        "sort. Band classes broadcast back onto the per-doc scores; all "
        "cut arithmetic is exact BIGINT.",
)
def lm_perplexity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    scores = lm_bigram_score(spark, sf_dir).select(
        "doc_id", "n_bigrams", "fluency_scaled"
    )
    # scored feeds BOTH the band table and the final class join: materialize
    # the per-doc buckets once (same shared-front-end discipline as the
    # bigram explode in lm_bigram_score) so the model build doesn't run twice
    scored = (
        scores.join(docs, "doc_id")
        .select(
            "doc_id",
            "lang",
            F.expr(f"(1000 * fluency_scaled) div (n_bigrams * {LM_SCALE})")
            .cast("bigint")
            .alias("bucket"),
        )
        .localCheckpoint(eager=False)
    )
    # band table: language × ≤1001 rows — every window below runs on THIS,
    # not the corpus
    bands = scored.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    w_desc = (
        Window.partitionBy("lang")
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_lang = Window.partitionBy("lang")
    cum = bands.select(
        "lang",
        "bucket",
        F.coalesce(F.sum("n_docs").over(w_desc), F.lit(0))
        .cast("bigint")
        .alias("cum_start"),
        F.sum("n_docs").over(w_lang).cast("bigint").alias("n_lang"),
    )
    classed = cum.select(
        "lang",
        "bucket",
        F.when(3 * F.col("cum_start") < F.col("n_lang"), "head")
        .when(3 * F.col("cum_start") < 2 * F.col("n_lang"), "middle")
        .otherwise("tail")
        .alias("ppl_band"),
    )
    return (
        scored.join(F.broadcast(classed), ["lang", "bucket"])
        .select("doc_id", "lang", "bucket", "ppl_band")
        .orderBy("doc_id")
    )


# ------------------------------------------------- Kneser-Ney smoothing ----
#
# The standard smoothing for n-gram filtering models (Kneser & Ney 1995;
# Chen & Goodman 1999 interpolated form) and what KenLM actually estimates:
#   P_KN(w2|w1) = max(c(w1,w2) - D, 0)/c(w1)
#               + D * N1+(w1,.)/c(w1) * N1+(.,w2)/B
# with discount D = 0.75 and continuation probability N1+(.,w2)/B (B =
# distinct bigram count). Unlike the MLE bigram model above, rare
# continuations are scored by how many DISTINCT contexts they follow --
# "Francisco" is common but only ever follows "San", so its continuation
# probability is tiny. The discount arithmetic uses D = 3/4 exactly:
# max(c2 - 3/4, 0)/c1 == max(4*c2 - 3, 0)/(4*c1), all integers.
#
# Determinism: two-stage quantization keeps every integer intermediate
# under 2^53 (exact as a double) at any SF -- p_cont is quantized once per
# w2 (round(S*N1l/B)), then folded into the per-bigram score
# (round(3*N1r*p_cont/(4*c1))); each stage is one correctly-rounded IEEE
# division + round on exact integer inputs, identical across engines.
# Everything after the model table is BIGINT accumulation.

@query(
    "lm_kneser_ney",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ), bg AS (
      SELECT doc_id, t[g] AS w1, t[g + 1] AS w2
      FROM toks, UNNEST(range(1, len(t))) AS u(g)
    ), bgc AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2
    ), pfc AS (
      SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS n1r
      FROM bgc GROUP BY w1
    ), sfc AS (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1l FROM bgc GROUP BY w2
    ), btot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS b FROM bgc
    ), cont AS (
      SELECT w2, CAST(round({LM_SCALE} * n1l / b) AS BIGINT) AS p_cont
      FROM sfc, btot
    ), model AS (
      SELECT w1, w2,
             CAST(round(CAST(greatest(4 * c2 - 3, 0) AS BIGINT)
                        * {LM_SCALE} / (4 * c1)) AS BIGINT)
             + CAST(round(3 * n1r * p_cont / (4 * c1)) AS BIGINT)
               AS p_scaled
      FROM bgc JOIN pfc USING (w1) JOIN cont USING (w2)
    ), docbg AS (
      SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM bg GROUP BY doc_id, w1, w2
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
           CAST(SUM(cnt * p_scaled) AS BIGINT) AS kn_scaled,
           CAST(CAST(SUM(cnt * p_scaled) AS BIGINT) AS DOUBLE)
             / (CAST(SUM(cnt) AS BIGINT) * {LM_SCALE}.0) AS mean_kn_prob
    FROM docbg JOIN model USING (w1, w2)
    GROUP BY doc_id
    """,
    doc="Interpolated Kneser-Ney bigram scoring (D = 3/4): per-doc mean of "
        "P_KN(w2|w1) = max(c2 - D,0)/c1 + D*N1+(w1,.)/c1 * N1+(.,w2)/B -- "
        "the smoothing KenLM estimates, scoring rare continuations by "
        "distinct-context mass instead of raw frequency. Discounts are "
        "exact rationals (max(4c2-3,0)/(4c1)); two-stage scaled-BIGINT "
        "quantization keeps every intermediate under 2^53, so the score "
        "is bit-stable under any shuffle order. Model is self-trained, so "
        "every doc bigram is in-vocabulary (the backoff term covers the "
        "discount mass, not OOV). Served from the persisted token-counts "
        "state (lm_state.py): the (doc, bigram, count) table IS the "
        "doc-side join input, and every model count is an exact-integer "
        "regrouping of it — the oracle's from-scratch recomputation "
        "re-audits the persisted bytes on every sweep.",
)
def lm_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .lm_state import serve_bi

    docbg = serve_bi(spark, sf_dir).localCheckpoint(eager=False)
    bgc = docbg.groupBy("w1", "w2").agg(
        F.sum("cnt").cast("bigint").alias("c2")
    )
    bgc = bgc.localCheckpoint(eager=False)  # feeds pfc, sfc, btot, model
    pfc = bgc.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count(F.lit(1)).cast("bigint").alias("n1r")
    )
    sfc = bgc.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("n1l"))
    btot = bgc.agg(F.count(F.lit(1)).cast("bigint").alias("b"))
    cont = sfc.crossJoin(F.broadcast(btot)).select(
        "w2",
        F.round(F.lit(LM_SCALE) * F.col("n1l") / F.col("b"))
        .cast("bigint")
        .alias("p_cont"),
    )
    model = (
        bgc.join(pfc, "w1")
        .join(cont, "w2")
        .select(
            "w1",
            "w2",
            (
                F.round(
                    F.expr("cast(greatest(4 * c2 - 3, 0) as bigint)")
                    * F.lit(LM_SCALE)
                    / (4 * F.col("c1"))
                ).cast("bigint")
                + F.round(
                    3 * F.col("n1r") * F.col("p_cont") / (4 * F.col("c1"))
                ).cast("bigint")
            ).alias("p_scaled"),
        )
    )
    return (
        docbg.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.sum(F.col("cnt") * F.col("p_scaled")).alias("kn_scaled"),
            (
                F.sum(F.col("cnt") * F.col("p_scaled")).cast("double")
                / (F.sum("cnt") * F.lit(float(LM_SCALE)))
            ).alias("mean_kn_prob"),
        )
    )


@query(
    "lm_good_turing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ), uni AS (
      SELECT u.w, CAST(COUNT(*) AS BIGINT) AS r
      FROM toks, UNNEST(t) AS u(w)
      GROUP BY u.w
    ), cc AS (
      SELECT r, CAST(COUNT(*) AS BIGINT) AS n_types FROM uni GROUP BY r
    ), tot AS (
      SELECT CAST(SUM(r * n_types) AS BIGINT) AS n_tokens FROM cc
    )
    SELECT c.r,
           c.n_types,
           CAST(c.r * c.n_types AS BIGINT) AS class_tokens,
           CAST(round({LM_SCALE} * (c.r + 1) * COALESCE(nx.n_types, 0)
                      / c.n_types) AS BIGINT) AS r_star_scaled,
           CAST(round({LM_SCALE} * (c.r + 1) * COALESCE(nx.n_types, 0)
                      / t.n_tokens) AS BIGINT) AS gt_mass_scaled
    FROM cc c
    LEFT JOIN cc nx ON nx.r = c.r + 1
    CROSS JOIN tot t
    ORDER BY c.r
    """,
    doc="Good-Turing frequency smoothing table: unigram types bucketed by "
    "raw count r, with N_r = |{w : c(w)=r}| and the Turing-smoothed "
    "count r* = (r+1) N_(r+1)/N_r per class (r* = 0 for the top class "
    "where N_(r+1) vanishes — production SGT regresses the tail; the "
    "count-of-counts table emitted here IS that regression's input). "
    "gt_mass = (r+1) N_(r+1)/N is each class's reallocated probability "
    "mass; the r=1 row's gt_mass... is the classic missing-mass estimate "
    "N_1/N shifted down to r=0 (Gale & Sampson 1995). Scale: the corpus "
    "reduces to vocabulary-grain counts in one hash shuffle; the "
    "count-of-counts table is register-domain (|distinct r| rows), its "
    "r+1 self-join and the 1-row token total are metadata ops. Smoothed "
    "values are single correctly-rounded divisions scaled to BIGINT — "
    "order-independent, engine-identical.",
)
def lm_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .lm_state import serve_uni

    # corpus unigram counts regrouped from the persisted per-doc counts
    uni = (
        serve_uni(spark, sf_dir)
        .groupBy("w")
        .agg(F.sum("cnt").cast("bigint").alias("r"))
    )
    cc = uni.groupBy("r").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types")
    )
    cc = cc.localCheckpoint(eager=False)  # register-domain; 3 consumers
    # token total folded over the register-domain frame, not the corpus
    wtot = Window.partitionBy()
    with_tot = cc.withColumn(
        "n_tokens", F.sum(F.col("r") * F.col("n_types")).over(wtot)
    )
    nx = cc.select(
        (F.col("r") - 1).alias("r"), F.col("n_types").alias("n_next")
    )
    return (
        with_tot.join(F.broadcast(nx), "r", "left")
        .select(
            "r",
            "n_types",
            (F.col("r") * F.col("n_types")).cast("bigint").alias("class_tokens"),
            F.round(
                F.lit(LM_SCALE)
                * (F.col("r") + 1)
                * F.coalesce(F.col("n_next"), F.lit(0))
                / F.col("n_types")
            )
            .cast("bigint")
            .alias("r_star_scaled"),
            F.round(
                F.lit(LM_SCALE)
                * (F.col("r") + 1)
                * F.coalesce(F.col("n_next"), F.lit(0))
                / F.col("n_tokens")
            )
            .cast("bigint")
            .alias("gt_mass_scaled"),
        )
        .orderBy("r")
    )


# ------------------------------------------- interpolation-lambda curve ----
#
# Cross-entropy of the lambda-interpolated bigram/unigram mixture
# p(w2|w1) = lam*p_bi + (1-lam)*p_uni at five EXACT-binary lambdas
# (0, .25, .5, .75, 1): the curve every n-gram LM tunes by hand. Both
# component probabilities quantize to scaled integers (round(S*c/t) —
# one correctly-rounded division each), the mixture re-quantizes with
# exact binary-fraction multipliers (0.25*int is exact in IEEE), and
# the entropy folds with the corrected Mitchell log2 — end to end
# libm-free and engine-identical. One bigram explode; each lambda adds
# a vocabulary-grain fold, not a corpus pass.

LM_INTERP_SCALE = 1_000_000_000
LM_LAMBDAS = ["0.0", "0.25", "0.5", "0.75", "1.0"]  # exact binary fractions


def _interp_oracle() -> str:
    log_s = _mlog2c_q(f"CAST({LM_INTERP_SCALE} AS BIGINT)")
    rows = []
    for lam in LM_LAMBDAS:
        # GREATEST(mix, 1): past ~2*LM_INTERP_SCALE bigram tokens a hapax
        # probability quantizes to 0 and the Mitchell log helper would
        # silently evaluate bin(0) — clamp to the smallest representable
        # quantum (identically in the Spark twin) so the entropy stays
        # finite and engine-identical at any corpus size
        mix = (
            f"GREATEST(CAST(round({lam} * p2 + (1.0 - {lam}) * p1)"
            f" AS BIGINT), 1)"
        )
        rows.append(f"""
      SELECT CAST({lam} AS DOUBLE) AS lam,
             CAST(SUM(c12 * ({log_s} - {_mlog2c_q(mix)})) AS BIGINT)
               AS h_scaled,
             CAST(SUM(c12) AS BIGINT) AS n_bigrams
      FROM model""")
    body = "\n      UNION ALL\n".join(rows)
    return f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ), bg AS (
      SELECT t[g] AS w1, t[g + 1] AS w2
      FROM toks, UNNEST(range(1, len(t))) AS u(g)
    ), bgc AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2
    ), pfc AS (
      SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bgc GROUP BY w1
    ), uni AS (
      SELECT w2, CAST(SUM(c12) AS BIGINT) AS cw FROM bgc GROUP BY w2
    ), tot AS (
      SELECT CAST(SUM(c12) AS BIGINT) AS n FROM bgc
    ), model AS MATERIALIZED (
      SELECT b.c12,
             CAST(round({LM_INTERP_SCALE} * b.c12 / p.c1) AS BIGINT) AS p2,
             CAST(round({LM_INTERP_SCALE} * u.cw / tot.n) AS BIGINT) AS p1
      FROM bgc b JOIN pfc p USING (w1) JOIN uni u USING (w2) CROSS JOIN tot
    )
    SELECT lam, h_scaled, n_bigrams,
           CAST(h_scaled AS DOUBLE) / n_bigrams / 1000000.0 AS h_bits
    FROM ({body})
    ORDER BY lam
    """


@query(
    "lm_interpolation_curve",
    oracle=_interp_oracle(),
    doc="Training-fit cross-entropy of the lambda-interpolated bigram/"
        "unigram mixture at five exact-binary lambdas — the hand-tuning "
        "curve of every n-gram LM (lam=1 shows bigram sharpness, lam=0 "
        "the unigram floor; the in-corpus curve is monotone toward the "
        "bigram end BY CONSTRUCTION and is a fit diagnostic, not a "
        "held-out score — see lm_stupid_backoff for the split form). "
        "Scaled-integer probabilities, exact-binary mixture weights, "
        "corrected Mitchell log2: libm-free, engine-identical. One "
        "bigram explode; per-lambda folds are vocabulary-grain. The "
        "quantized mixture clamps to >= 1 scale unit (greatest(mix, 1) "
        "in both engines): beyond ~2*LM_INTERP_SCALE bigram tokens a "
        "hapax probability underflows the quantization to 0, and the "
        "clamp caps its contribution at log2(S) bits instead of feeding "
        "bin(0) to the log helper.",
)
def lm_interpolation_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .lm_state import serve_bi

    # corpus bigram counts by regrouping the persisted per-doc counts —
    # no tokenize/explode at query time (lm_state.py)
    bgc = serve_bi(spark, sf_dir).groupBy("w1", "w2").agg(
        F.sum("cnt").cast("bigint").alias("c12")
    ).localCheckpoint(eager=False)  # feeds pfc/uni/tot/model
    pfc = bgc.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    uni = bgc.groupBy("w2").agg(F.sum("c12").cast("bigint").alias("cw"))
    tot = bgc.agg(F.sum("c12").cast("bigint").alias("n"))
    model = (
        bgc.join(pfc, "w1")
        .join(uni, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "c12",
            F.round(F.lit(LM_INTERP_SCALE) * F.col("c12") / F.col("c1"))
            .cast("bigint")
            .alias("p2"),
            F.round(F.lit(LM_INTERP_SCALE) * F.col("cw") / F.col("n"))
            .cast("bigint")
            .alias("p1"),
        )
        .localCheckpoint(eager=False)  # consumed once per lambda
    )
    log_s = _mlog2c_q_spark(f"CAST({LM_INTERP_SCALE} AS BIGINT)")
    out = None
    for lam in LM_LAMBDAS:
        # greatest(mix, 1): same quantization-underflow clamp as the oracle
        mix = (
            f"greatest(cast(round({lam} * p2 + (1.0 - {lam}) * p1)"
            f" as bigint), 1)"
        )
        row = model.agg(
            F.expr(
                f"CAST(sum(c12 * ({log_s} - {_mlog2c_q_spark(mix)})) AS BIGINT)"
            ).alias("h_scaled"),
            F.sum("c12").cast("bigint").alias("n_bigrams"),
        ).select(
            F.lit(float(lam)).alias("lam"),
            "h_scaled",
            "n_bigrams",
            (
                F.col("h_scaled").cast("double")
                / F.col("n_bigrams")
                / F.lit(1_000_000.0)
            ).alias("h_bits"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("lam")


# ------------------------------------------------ transfer (CE) matrix -----
#
# Source-to-source cross-entropy transfer matrix — the data-mixing
# signal behind DoReMi-style domain reweighting: CE(a, b) is the bits
# per token source ``a`` costs under source ``b``'s add-one-smoothed
# unigram model, and the regret CE(a, b) − CE(a, a) is exactly the
# excess loss of modeling a domain with another domain's statistics
# (zero on the diagonal, larger = less transferable). The smoothing
# makes missing words cost log2(n_b + V) − 0, so the identity
#   CEq(a,b) = n_a·L(n_b + V) − Σ_{w ∈ a∩b} c_aw·L(c_bw + 1)
# reduces the whole matrix to ONE vocab-keyed sw ⋈ sw join (shared
# words only — absent words contribute through the closed-form base
# term) plus a |sources|² metadata grid. L is the corrected Mitchell
# log2 (libm-free, 1e6-quantized, same as lm_source_kl) so both
# engines fold identical integers; the two final divisions are
# exact-input IEEE.


@query(
    "lm_transfer_matrix",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({_TOKS_SQL}) AS w FROM documents
    ), sw AS MATERIALIZED (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY source, w
    ), st AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM sw GROUP BY source
    ), vv AS (
      SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM sw
    ), shared AS MATERIALIZED (
      SELECT a.source AS sa, b.source AS sb,
             CAST(SUM(a.c * {_mlog2c_q('(b.c + 1)')}) AS BIGINT) AS hit
      FROM sw a JOIN sw b ON a.w = b.w
      GROUP BY sa, sb
    ), grid AS (
      SELECT sa.source AS sa, sb.source AS sb, sa.n AS na,
             CAST(sa.n * {_mlog2c_q('(sb.n + vv.v)')} AS BIGINT) AS base
      FROM st sa CROSS JOIN st sb CROSS JOIN vv
    ), ce AS MATERIALIZED (
      SELECT g.sa, g.sb, g.na,
             g.base - COALESCE(s.hit, CAST(0 AS BIGINT)) AS ceq
      FROM grid g LEFT JOIN shared s ON s.sa = g.sa AND s.sb = g.sb
    )
    SELECT c1.sa AS source_a, c1.sb AS source_b,
           c1.na AS n_tokens_a,
           CAST(c1.ceq AS DOUBLE) / (c1.na * 1000000.0) AS ce_bits,
           CAST(c1.ceq AS DOUBLE) / (c1.na * 1000000.0)
             - CAST(c2.ceq AS DOUBLE) / (c2.na * 1000000.0)
             AS transfer_regret_bits
    FROM ce c1 JOIN ce c2 ON c2.sa = c1.sa AND c2.sb = c1.sa
    ORDER BY source_a, source_b
    """,
    doc="Source×source cross-entropy transfer matrix under add-one-"
        "smoothed unigram models (the DoReMi-style domain-reweighting "
        "signal), with per-pair regret over the diagonal. Smoothing "
        "collapses absent-word cost into a closed-form base term, so "
        "the data-sized work is ONE vocab-keyed sw ⋈ sw join over "
        "shared words + per-source totals; the |sources|² grid is "
        "metadata. Corrected Mitchell log2, exact BIGINT folds, two "
        "IEEE divisions at emission.",
)
def lm_transfer_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.expr(_TOKS_SPARK)).alias("w")
    )
    sw = toks.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint(eager=False)  # feeds totals, vocab AND the pair join
    st = sw.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    vv = sw.agg(F.countDistinct("w").cast("bigint").alias("v"))
    a, b = sw.alias("a"), sw.alias("b")
    shared = (
        a.join(b, "w")
        .groupBy(
            F.col("a.source").alias("sa"), F.col("b.source").alias("sb")
        )
        .agg(
            F.sum(
                F.col("a.c") * F.expr(_mlog2c_q_spark("(b.c + 1)"))
            )
            .cast("bigint")
            .alias("hit")
        )
    )
    sta = st.select(F.col("source").alias("sa"), F.col("n").alias("na"))
    stb = st.select(F.col("source").alias("sb"), F.col("n").alias("nb"))
    # |sources|² metadata grid: crossJoin of two |sources|-row frames
    # plus the 1-row vocab count — all bounded by design
    grid = (
        sta.crossJoin(stb)
        .crossJoin(F.broadcast(vv))
        .select(
            "sa",
            "sb",
            "na",
            F.expr(_mlog2c_q_spark("(nb + v)"))
            .alias("lsm"),
        )
        .select(
            "sa",
            "sb",
            "na",
            (F.col("na") * F.col("lsm")).cast("bigint").alias("base"),
        )
    )
    ce = (
        grid.join(shared, ["sa", "sb"], "left")
        .select(
            "sa",
            "sb",
            "na",
            (
                F.col("base")
                - F.coalesce(F.col("hit"), F.lit(0).cast("bigint"))
            ).alias("ceq"),
        )
        .localCheckpoint(eager=False)  # read twice: full grid + diagonal
    )
    diag = ce.filter(F.col("sa") == F.col("sb")).select(
        F.col("sa").alias("dsa"),
        F.col("na").alias("dna"),
        F.col("ceq").alias("dceq"),
    )
    return (
        ce.join(diag, ce.sa == diag.dsa)
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            F.col("na").alias("n_tokens_a"),
            (
                F.col("ceq").cast("double") / (F.col("na") * 1000000.0)
            ).alias("ce_bits"),
            (
                F.col("ceq").cast("double") / (F.col("na") * 1000000.0)
                - F.col("dceq").cast("double") / (F.col("dna") * 1000000.0)
            ).alias("transfer_regret_bits"),
        )
        .orderBy("source_a", "source_b")
    )
