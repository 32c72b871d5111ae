"""Retrieval-quality operators: BM25 term scoring and rank fusion
(north-star layer).

Training-data pipelines run retrieval twice: once to FIND data (query an
index of the corpus for relevant documents) and once to JUDGE data (score
documents against reference queries for quality/relevance filtering). This
module adds the two classic building blocks as oracle-checked queries:

* ``text_bm25_top_terms`` — Okapi BM25 term saliency per document (the
  lexical scoring function behind Lucene/Elasticsearch and most hybrid
  retrieval stacks), here used corpus-internally to surface each
  document's most characteristic terms.
* ``sim_rrf_fusion`` — reciprocal-rank fusion (Cormack et al., SIGIR'09)
  of two independent embedding rankings (cosine and euclidean), the
  standard way hybrid search merges lexical + vector result lists without
  score calibration.

Determinism: the suite's discipline (``plans/helpers.py``) is that floats
never ACCUMULATE across rows and transcendentals never enter the path.
BM25 here is a pure per-row expression tree over exact integer inputs
(tf, dl, df, N, T): every +,-,*,/ is a correctly-rounded IEEE op, so
Spark and DuckDB produce bit-identical doubles. The idf is the odds form
``(N - df + 0.5) / (df + 0.5)`` WITHOUT the usual log wrap — log is
transcendental (not guaranteed bit-identical across libm builds) and
monotone, so rankings are unchanged; the docstring-visible score is the
documented odds-idf BM25 variant. RRF is ``1/(K+r1) + 1/(K+r2)`` — two
exact divisions and one add in fixed order, again bit-stable.

Scale: BM25's frames are all pre-aggregated — (doc, term, tf) after one
explode+hash-agg, df per term from the same frame, corpus totals as a
1-row broadcast. The per-doc top-terms window partitions on doc_id
(high-cardinality → balanced). RRF reuses the gated two-phase top-k from
:mod:`.similarity` for both input rankings, so the per-query merge input
stays bounded by k × partitions at any corpus size; the fusion join is
top-k × top-k per query — constant work.

Reference scope note: the reference connector (s3-iceberg destination,
``SparkDestinationStream.java``) has no retrieval surface; this extends
the north-star LLM-pipeline layer alongside :mod:`.text` and
:mod:`.similarity`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table
from .similarity import (
    N_QUERIES,
    _SPARK_EMB_D,
    _SPARK_NORM,
    _SQL_NORM,
    _spark_dot,
    _sql_dot,
    _two_phase_topk,
)

# BM25 shape parameters (Robertson et al.; Lucene defaults).
BM25_K1 = "CAST(1.2 AS DOUBLE)"
BM25_B = "CAST(0.75 AS DOUBLE)"
BM25_TOP = 5          # characteristic terms kept per document

RRF_K = 60            # Cormack et al.'s constant
RRF_LIST = 20         # depth of each input ranking
RRF_TOP = 10          # fused results kept per query

# token array (lowercased, space-split) — identical in both engines
_TOKS_SPARK = "split(trim(lower(text)), ' ')"
_TOKS_SQL = "string_split(trim(lower(text)), ' ')"


@query(
    "text_bm25_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ), dl AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
    ), tf AS (
      SELECT doc_id, t[g] AS term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks, UNNEST(range(1, len(t) + 1)) AS u(g)
      GROUP BY doc_id, t[g]
    ), df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_len
      FROM dl
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)
               + CAST(0.5 AS DOUBLE)) / (CAST(df AS DOUBLE)
               + CAST(0.5 AS DOUBLE)))
             * ((CAST(tf AS DOUBLE) * ({BM25_K1} + CAST(1 AS DOUBLE)))
                / (CAST(tf AS DOUBLE)
                   + {BM25_K1} * (CAST(1 AS DOUBLE) - {BM25_B}
                      + {BM25_B} * (CAST(dl AS DOUBLE)
                         / (CAST(total_len AS DOUBLE)
                            / CAST(n_docs AS DOUBLE)))))) AS bm25
      FROM tf
      JOIN dl USING (doc_id)
      JOIN df USING (term)
      CROSS JOIN stats
    )
    SELECT doc_id, term, rnk, bm25 FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY bm25 DESC, term
      ) AS INTEGER) AS rnk
      FROM scored
    ) WHERE rnk <= {BM25_TOP}
    """,
    doc="Okapi BM25 term saliency (odds-form idf, no log — monotone "
        "transform, documented variant) — the top characteristic terms "
        "per document. All inputs (tf, dl, df, N, total tokens) are exact "
        "integers; the score is one per-row IEEE expression tree with no "
        "float accumulation, so both engines agree bit-for-bit. Frames "
        "are pre-aggregated (doc,term,tf) + a term-keyed df join + a "
        "1-row corpus-stats broadcast; the top-terms window partitions "
        "on high-cardinality doc_id.",
)
def text_bm25_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TOKS_SPARK).alias("t")
    )
    # dl feeds both the stats fold and the per-doc join; tf feeds both the
    # df table and the scoring frame — materialize each once so the
    # tokenize/explode front end doesn't re-run per consumer (the
    # shared-index discipline from dedup.py; scratch tables on a cluster)
    dl = docs.select(
        "doc_id", F.size("t").cast("bigint").alias("dl")
    ).localCheckpoint(eager=False)
    tf = (
        docs.select("doc_id", F.explode("t").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    ).localCheckpoint(eager=False)
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    )
    bm25 = (
        "((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))"
        " / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)))"
        f" * ((CAST(tf AS DOUBLE) * ({BM25_K1} + CAST(1 AS DOUBLE)))"
        f" / (CAST(tf AS DOUBLE) + {BM25_K1} * (CAST(1 AS DOUBLE) - {BM25_B}"
        f" + {BM25_B} * (CAST(dl AS DOUBLE)"
        " / (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE))))))"
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(df_t, "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", F.expr(bm25).alias("bm25"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("bm25").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= BM25_TOP)
        .select("doc_id", "term", "rnk", "bm25")
    )


@query(
    "sim_rrf_fusion",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb, {_SQL_NORM} AS nrm
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, emb AS qemb, nrm AS qnrm FROM e
      WHERE vec_id < {N_QUERIES}
    ), scored AS (
      SELECT q.query_id, e.vec_id,
             {_sql_dot('q.qemb', 'e.emb')} / (q.qnrm * e.nrm) AS cosine,
             (q.qnrm * q.qnrm) + (e.nrm * e.nrm)
               - (CAST(2 AS DOUBLE) * {_sql_dot('q.qemb', 'e.emb')}) AS dist2
      FROM q JOIN e ON e.vec_id <> q.query_id
    ), r_cos AS (
      SELECT query_id, vec_id, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id
      ) AS INTEGER) AS rank_cos
      FROM scored QUALIFY rank_cos <= {RRF_LIST}
    ), r_l2 AS (
      SELECT query_id, vec_id, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY dist2 ASC, vec_id
      ) AS INTEGER) AS rank_l2
      FROM scored QUALIFY rank_l2 <= {RRF_LIST}
    ), fused AS (
      SELECT coalesce(c.query_id, l.query_id) AS query_id,
             coalesce(c.vec_id, l.vec_id) AS vec_id,
             c.rank_cos, l.rank_l2,
             coalesce(CAST(1 AS DOUBLE)
                      / (CAST({RRF_K} AS DOUBLE) + CAST(c.rank_cos AS DOUBLE)),
                      CAST(0 AS DOUBLE))
             + coalesce(CAST(1 AS DOUBLE)
                        / (CAST({RRF_K} AS DOUBLE) + CAST(l.rank_l2 AS DOUBLE)),
                        CAST(0 AS DOUBLE)) AS rrf
      FROM r_cos c
      FULL OUTER JOIN r_l2 l
        ON c.query_id = l.query_id AND c.vec_id = l.vec_id
    )
    SELECT query_id, vec_id, rank_cos, rank_l2, rrf, fused_rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY rrf DESC, vec_id
      ) AS INTEGER) AS fused_rank
      FROM fused
    ) WHERE fused_rank <= {RRF_TOP}
    """,
    doc="Reciprocal-rank fusion (Cormack et al., SIGIR'09) of two "
        "independent rankings of the same query set — cosine similarity "
        "and euclidean distance — rrf = 1/(60+r_cos) + 1/(60+r_l2) over "
        "the two top-20 lists, absent list contributing 0. The hybrid- "
        "search merge that needs no score calibration. Each input ranking "
        "rides the gated two-phase top-k (bounded merge input at any "
        "width); the fusion join is top-k × top-k per query — constant. "
        "rrf is two exact IEEE divisions + one add in fixed order: "
        "bit-stable across engines.",
)
def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(_SPARK_EMB_D).alias("emb"),
        F.expr(_SPARK_NORM).alias("nrm"),
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
    )
    dot = _spark_dot("qemb", "emb")
    # both rankers consume the scored frame: materialize the broadcast-join
    # scoring pass once (bounded at N_QUERIES × corpus rows, partition-local
    # spill) instead of re-running the dot products per ranking
    scored = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        (F.expr(dot) / (F.col("qnrm") * F.col("nrm"))).alias("cosine"),
        (
            (F.col("qnrm") * F.col("qnrm"))
            + (F.col("nrm") * F.col("nrm"))
            - (F.lit(2.0) * F.expr(dot))
        ).alias("dist2"),
    ).localCheckpoint(eager=False)
    r_cos = _two_phase_topk(scored, RRF_LIST, base=emb, score_col="cosine").select(
        "query_id", "vec_id", F.col("rank").cast("int").alias("rank_cos")
    )
    r_l2 = _two_phase_topk(
        scored, RRF_LIST, base=emb, score_col="dist2", ascending=True
    ).select("query_id", "vec_id", F.col("rank").cast("int").alias("rank_l2"))
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("rank_cos").cast("double")),
        F.lit(0.0),
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("rank_l2").cast("double")),
        F.lit(0.0),
    )
    fused = r_cos.join(r_l2, ["query_id", "vec_id"], "full_outer").withColumn(
        "rrf", rrf
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("vec_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("fused_rank") <= RRF_TOP)
        .select("query_id", "vec_id", "rank_cos", "rank_l2", "rrf", "fused_rank")
    )


# ----------------------------------------------------------- MMR rerank ----
#
# Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98): re-rank a
# relevance top-C so each pick balances relevance against similarity to
# what's already picked — the standard result-diversification pass after
# any retrieval stage (and, in data pipelines, the "pick K diverse
# exemplars per cluster" primitive). Greedy selection is inherently
# sequential in K but embarrassingly parallel across queries, so the
# idiomatic Spark shape is: bounded candidate generation distributed
# (gated two-phase top-k), pairwise sims distributed (C^2 per query), and
# the K-step greedy as an Arrow-batched applyInPandas over each query's
# constant-size (<= C^2-row) group — never a driver loop, never a
# corpus-size collect.
#
# Determinism: all inputs (relevance, pairwise sims) are the engine's
# bit-exact cosines; the greedy score is 0.7*rel - 0.3*max(sim), a fixed
# three-op IEEE tree evaluated identically by numpy float64 and DuckDB
# doubles; ties break by vec_id. The oracle unrolls the K greedy steps as
# generated SQL CTEs — same argmax, same tie-break.

MMR_CAND = 20     # relevance candidates per query (C)
MMR_K = 10        # diversified picks per query (K)
_MMR_LAM = 0.7    # relevance weight; (1 - lam) penalizes redundancy


def _mmr_oracle() -> str:
    lam = "CAST(0.7 AS DOUBLE)"
    mu = "CAST(0.3 AS DOUBLE)"
    steps = []
    # step 1: pure relevance argmax (empty selected set -> penalty term 0)
    steps.append(f"""
    sel1 AS MATERIALIZED (
      SELECT query_id, vec_id, cosine, {lam} * cosine - {mu} * CAST(0 AS DOUBLE)
               AS mmr_score, 1 AS mmr_rank
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id
          ORDER BY {lam} * cosine - {mu} * CAST(0 AS DOUBLE) DESC, vec_id
        ) AS rn FROM cand
      ) WHERE rn = 1
    ), acc1 AS MATERIALIZED (SELECT * FROM sel1)""")
    for t in range(2, MMR_K + 1):
        p = t - 1
        steps.append(f"""
    scored{t} AS MATERIALIZED (
      SELECT c.query_id, c.vec_id, c.cosine,
             {lam} * c.cosine - {mu} * (
               SELECT MAX(p.sim) FROM psim p
               JOIN acc{p} s
                 ON s.query_id = p.query_id AND s.vec_id = p.b_vec
               WHERE p.query_id = c.query_id AND p.a_vec = c.vec_id
             ) AS mmr_score
      FROM cand c
      WHERE NOT EXISTS (
        SELECT 1 FROM acc{p} s
        WHERE s.query_id = c.query_id AND s.vec_id = c.vec_id
      )
    ), sel{t} AS MATERIALIZED (
      SELECT query_id, vec_id, cosine, mmr_score, {t} AS mmr_rank FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY mmr_score DESC, vec_id
        ) AS rn FROM scored{t}
      ) WHERE rn = 1
    ), acc{t} AS MATERIALIZED (SELECT query_id, vec_id, cosine, mmr_score, mmr_rank
                  FROM acc{p}
                  UNION ALL SELECT * FROM sel{t})""")
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb, {_SQL_NORM} AS nrm
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, emb AS qemb, nrm AS qnrm FROM e
      WHERE vec_id < {N_QUERIES}
    ), cand AS MATERIALIZED (
      SELECT query_id, vec_id, cosine FROM (
        SELECT q.query_id, e.vec_id,
               {_sql_dot('q.qemb', 'e.emb')} / (q.qnrm * e.nrm) AS cosine,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_sql_dot('q.qemb', 'e.emb')} / (q.qnrm * e.nrm)
                            DESC, e.vec_id
               ) AS rank
        FROM q JOIN e ON e.vec_id <> q.query_id
      ) WHERE rank <= {MMR_CAND}
    ), psim AS MATERIALIZED (
      SELECT a.query_id, a.vec_id AS a_vec, b.vec_id AS b_vec,
             {_sql_dot('ea.emb', 'eb.emb')} / (ea.nrm * eb.nrm) AS sim
      FROM cand a
      JOIN cand b ON a.query_id = b.query_id AND a.vec_id <> b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id
    ),{','.join(steps)}
    SELECT query_id, vec_id, cosine AS relevance, mmr_score,
           CAST(mmr_rank AS INTEGER) AS mmr_rank
    FROM acc{MMR_K}
    """


@query(
    "sim_mmr_rerank",
    oracle=_mmr_oracle(),
    doc="Maximal Marginal Relevance diversification (Carbonell & "
        "Goldstein, SIGIR'98): greedy top-10 from the cosine top-20, each "
        "step scoring 0.7*relevance - 0.3*max-similarity-to-selected. "
        "Candidate generation and pairwise sims are distributed and "
        "bounded (C, C^2 per query); the K-step greedy runs per query "
        "inside one Arrow-batched applyInPandas over a constant-size "
        "group — parallel across queries, no driver loop. Scores are a "
        "fixed 3-op IEEE tree over bit-exact cosines (numpy float64 == "
        "DuckDB double); the oracle unrolls the same greedy as K "
        "generated CTE steps with the same vec_id tie-break.",
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(_SPARK_EMB_D).alias("emb"),
        F.expr(_SPARK_NORM).alias("nrm"),
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
    )
    scored = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        (
            F.expr(_spark_dot("qemb", "emb")) / (F.col("qnrm") * F.col("nrm"))
        ).alias("cosine"),
    )
    cand = _two_phase_topk(scored, MMR_CAND, base=emb).drop("rank")
    # enrich the (constant-size) candidate set with its vectors: broadcast
    # the candidates INTO the corpus scan — one narrow pass, no shuffle
    cand_emb = (
        emb.join(F.broadcast(cand), "vec_id")
        .select("query_id", "vec_id", "cosine", "emb", "nrm")
        .localCheckpoint(eager=False)  # <= C*Q rows; feeds both psim sides
    )
    a = cand_emb.alias("a")
    b = cand_emb.alias("b")
    psim = (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.query_id").alias("query_id"),
            F.col("a.vec_id").alias("a_vec"),
            F.col("a.cosine").alias("relevance"),
            F.col("b.vec_id").alias("b_vec"),
            (
                F.expr(_spark_dot("a.emb", "b.emb"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("sim"),
        )
    )

    def greedy(pdf):
        import pandas as pd

        qid = pdf["query_id"].iloc[0]
        rel = {}
        sim = {}
        for r in pdf.itertuples(index=False):
            rel[r.a_vec] = r.relevance
            sim[(r.a_vec, r.b_vec)] = r.sim
        selected: list[int] = []
        rows = []
        remaining = sorted(rel)
        for rank in range(1, MMR_K + 1):
            if not remaining:
                break
            best_vec = None
            best_score = None
            for c in remaining:  # ascending vec_id -> strict > keeps ties low
                penalty = max(sim[(c, s)] for s in selected) if selected else 0.0
                score = 0.7 * rel[c] - 0.3 * penalty
                if best_score is None or score > best_score:
                    best_vec, best_score = c, score
            selected.append(best_vec)
            remaining.remove(best_vec)
            rows.append((qid, best_vec, rel[best_vec], best_score, rank))
        return pd.DataFrame(
            rows,
            columns=["query_id", "vec_id", "relevance", "mmr_score", "mmr_rank"],
        )

    return psim.groupBy("query_id").applyInPandas(
        greedy,
        schema="query_id long, vec_id long, relevance double, "
        "mmr_score double, mmr_rank int",
    )


# ------------------------------------------------- graded nDCG@K / MRR -----
#
# The standard acceptance metrics for a retrieval stack (r10 verdict
# item #5): the recall@k audits elsewhere in the suite check AGAINST
# SELF-TRUTH (did the ANN find the brute-force top-k?); nDCG@K and MRR
# check against GRADED HUMAN-STYLE JUDGMENTS (did the ranking put the
# most relevant things first?). The qrels fixture is deterministic (the
# RECALL_QUERIES discipline): for query q and candidate d,
# rel = 3 if labels match and d ≡ q (mod 5), 2 on label match alone,
# 1 on the mod-5 bucket alone, else 0 — a graded structure the cosine
# ranking genuinely correlates with (embeddings cluster by label), so
# the metric is informative, not saturated.
#
# Determinism: DCG's log2 discount is transcendental, so the per-rank
# discounts are precomputed ONCE in Python as integer literals
# (round(1e9 / log2(r+1)), r = 1..K) and inlined into BOTH engines'
# expressions; gains (2^rel − 1 ∈ {0,1,3,7}) are integers. DCG and
# IDCG are therefore exact BIGINT sums — bit-stable under any shuffle
# order — and nDCG/MRR are ONE final IEEE division each. IDCG needs no
# sort: the ideal ranking is determined by the per-grade qrel COUNTS
# (fill K slots greedily by grade), a K-term CASE fold over (n3,n2,n1).
#
# Scale: the run is the gated two-phase top-K (bounded merge input);
# qrel counts are one labels-only broadcast-join pass over the corpus
# (the same cost class as the scoring pass); everything downstream is
# |queries|-sized metadata.

RETR_K = 10                       # evaluation depth (nDCG@10 / MRR@10)
_NDCG_SCALE = 1_000_000_000
import math as _math  # noqa: E402  (stdlib, used once at import time)

_DISC = [
    round(_NDCG_SCALE / _math.log2(r + 1)) for r in range(1, RETR_K + 1)
]
_GAIN_CASE = (  # BIGINT literals: gain*discount reaches 7e9 > int32
    "CASE rel WHEN 3 THEN CAST(7 AS BIGINT) WHEN 2 THEN CAST(3 AS BIGINT)"
    " WHEN 1 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END"
)
_DISC_CASE = (
    "CASE rank "
    + " ".join(f"WHEN {r} THEN {w}" for r, w in enumerate(_DISC, start=1))
    + " ELSE 0 END"
)


def _rel_expr(q: str, d: str, ql: str, dl: str) -> str:
    """Graded qrel: shared verbatim by both engines."""
    return (
        f"CASE WHEN {dl} = {ql} THEN"
        f" (CASE WHEN {d} % 5 = {q} % 5 THEN 3 ELSE 2 END)"
        f" ELSE (CASE WHEN {d} % 5 = {q} % 5 THEN 1 ELSE 0 END) END"
    )


_IDCG_TERMS = " + ".join(
    f"(CASE WHEN {r} <= n3 THEN {7 * w}"
    f" WHEN {r} <= n3 + n2 THEN {3 * w}"
    f" WHEN {r} <= n3 + n2 + n1 THEN {w} ELSE 0 END)"
    for r, w in enumerate(_DISC, start=1)
)


@query(
    "retrieval_ndcg_mrr",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb, {_SQL_NORM} AS nrm
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, label AS qlabel, emb AS qemb, nrm AS qnrm
      FROM e WHERE vec_id < {N_QUERIES}
    ), run AS (
      SELECT query_id, vec_id, rank FROM (
        SELECT q.query_id, e.vec_id,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_sql_dot('q.qemb', 'e.emb')} / (q.qnrm * e.nrm)
                            DESC, e.vec_id
               ) AS BIGINT) AS rank
        FROM q JOIN e ON e.vec_id <> q.query_id
      ) WHERE rank <= {RETR_K}
    ), judged AS (
      SELECT r.query_id, r.rank,
             {_rel_expr('r.query_id', 'r.vec_id', 'q.qlabel', 'e.label')}
               AS rel
      FROM run r
      JOIN e ON e.vec_id = r.vec_id
      JOIN q ON q.query_id = r.query_id
    ), dcg AS (
      SELECT query_id,
             CAST(SUM(({_GAIN_CASE}) * ({_DISC_CASE})) AS BIGINT)
               AS dcg_scaled,
             MIN(CASE WHEN rel > 0 THEN rank END) AS first_rel_rank
      FROM judged GROUP BY query_id
    ), qrels AS (
      SELECT q.query_id,
             CAST(SUM(CASE WHEN rel = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             CAST(SUM(CASE WHEN rel = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN rel = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      FROM (
        SELECT q.query_id, q.qlabel,
               {_rel_expr('q.query_id', 'e.vec_id', 'q.qlabel', 'e.label')}
                 AS rel
        FROM q JOIN e ON e.vec_id <> q.query_id
      ) j JOIN q ON q.query_id = j.query_id
      GROUP BY q.query_id
    ), ideal AS (
      SELECT query_id, n3 + n2 + n1 AS n_rel,
             CAST({_IDCG_TERMS} AS BIGINT) AS idcg_scaled
      FROM qrels
    )
    SELECT i.query_id,
           i.n_rel,
           COALESCE(d.dcg_scaled, CAST(0 AS BIGINT)) AS dcg_scaled,
           i.idcg_scaled,
           CASE WHEN i.idcg_scaled = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(COALESCE(d.dcg_scaled, 0) AS DOUBLE)
                     / CAST(i.idcg_scaled AS DOUBLE) END AS ndcg,
           CAST(d.first_rel_rank AS BIGINT) AS first_rel_rank,
           CASE WHEN d.first_rel_rank IS NULL THEN CAST(0 AS DOUBLE)
                ELSE CAST(1 AS DOUBLE) / CAST(d.first_rel_rank AS DOUBLE)
                END AS rr
    FROM ideal i LEFT JOIN dcg d ON d.query_id = i.query_id
    ORDER BY i.query_id
    """,
    doc=f"Graded-relevance retrieval evaluation — nDCG@{RETR_K} and "
        "MRR of the brute-force cosine ranking against a deterministic "
        "graded qrels fixture (label match + mod-5 bucket ⇒ grades "
        "0–3). Per-rank log2 discounts are precomputed integer literals "
        "inlined into both engines, gains are 2^rel − 1, so DCG and the "
        "count-derived IDCG (no sort: fill K slots by per-grade counts) "
        "are exact BIGINT sums; nDCG and RR are one final IEEE division "
        "each. Run = gated two-phase top-K; qrel counts = one "
        "labels-only broadcast pass; the rest is |queries|-sized "
        "metadata.",
)
def retrieval_ndcg_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # run side served from the persisted exact ground-truth artifact
    # (gt_topk.py): RETR_K == TOP_K and the (cosine DESC, vec_id)
    # tie-break are identical, so the artifact rows ARE this ranking —
    # no embedding decode, no corpus-wide scoring pass on the warm path
    from .gt_topk import serve_gt_topk

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
    )
    run = (
        serve_gt_topk(spark, sf_dir)
        .filter(F.col("query_id") < N_QUERIES)
        .filter(F.col("rank") <= RETR_K)
        .select(
            "query_id", "vec_id", F.col("rank").cast("bigint").alias("rank")
        )
    )
    judged = (
        run.join(e.select("vec_id", "label"), "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "rank",
            F.expr(
                _rel_expr("query_id", "vec_id", "qlabel", "label")
            ).alias("rel"),
        )
    )
    dcg = judged.groupBy("query_id").agg(
        F.sum(F.expr(f"({_GAIN_CASE}) * ({_DISC_CASE})"))
        .cast("bigint")
        .alias("dcg_scaled"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias(
            "first_rel_rank"
        ),
    )
    # qrel grade counts: one labels-only broadcast pass over the corpus
    qrels = (
        e.select("vec_id", "label")
        .join(
            F.broadcast(q.select("query_id", "qlabel")),
            F.col("vec_id") != F.col("query_id"),
        )
        .select(
            "query_id",
            F.expr(
                _rel_expr("query_id", "vec_id", "qlabel", "label")
            ).alias("rel"),
        )
        .groupBy("query_id")
        .agg(
            F.sum((F.col("rel") == 3).cast("int")).cast("bigint").alias("n3"),
            F.sum((F.col("rel") == 2).cast("int")).cast("bigint").alias("n2"),
            F.sum((F.col("rel") == 1).cast("int")).cast("bigint").alias("n1"),
        )
    )
    ideal = qrels.select(
        "query_id",
        (F.col("n3") + F.col("n2") + F.col("n1")).alias("n_rel"),
        F.expr(_IDCG_TERMS).cast("bigint").alias("idcg_scaled"),
    )
    return (
        ideal.join(dcg, "query_id", "left")
        .select(
            "query_id",
            "n_rel",
            F.coalesce("dcg_scaled", F.lit(0)).cast("bigint").alias(
                "dcg_scaled"
            ),
            "idcg_scaled",
            F.when(F.col("idcg_scaled") == 0, F.lit(0.0))
            .otherwise(
                F.coalesce("dcg_scaled", F.lit(0)).cast("double")
                / F.col("idcg_scaled").cast("double")
            )
            .alias("ndcg"),
            F.col("first_rel_rank").cast("bigint").alias("first_rel_rank"),
            F.when(F.col("first_rel_rank").isNull(), F.lit(0.0))
            .otherwise(F.lit(1.0) / F.col("first_rel_rank").cast("double"))
            .alias("rr"),
        )
        .orderBy("query_id")
    )


def _run_and_qrels_sql() -> str:
    """Shared oracle CTE prefix: embeddings + query set + cosine top-K
    run (the retrieval_ndcg_mrr shapes, reused by AP)."""
    return f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb, {_SQL_NORM} AS nrm
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, label AS qlabel, emb AS qemb, nrm AS qnrm
      FROM e WHERE vec_id < {N_QUERIES}
    ), run AS (
      SELECT query_id, vec_id, rank FROM (
        SELECT q.query_id, e.vec_id,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_sql_dot('q.qemb', 'e.emb')} / (q.qnrm * e.nrm)
                            DESC, e.vec_id
               ) AS BIGINT) AS rank
        FROM q JOIN e ON e.vec_id <> q.query_id
      ) WHERE rank <= {RETR_K}
    )"""


# Average precision's per-term P@k = relcnt_k / k is quantized to the
# 1e9 grid via ONE correctly-rounded double division of exact integers
# (relcnt*SCALE < 2^53 ⇒ the cast is exact, round() is engine-identical
# — the RA-weight discipline), then summed in BIGINT; AP is one final
# IEEE division. No cross-row float accumulation anywhere.
_AP_SCALE = 1_000_000_000


@query(
    "retrieval_avg_precision",
    oracle=_run_and_qrels_sql()
    + f""", judged AS (
      SELECT r.query_id, r.rank,
             CASE WHEN {_rel_expr('r.query_id', 'r.vec_id',
                                  'q.qlabel', 'e.label')} > 0
                  THEN 1 ELSE 0 END AS is_rel
      FROM run r
      JOIN e ON e.vec_id = r.vec_id
      JOIN q ON q.query_id = r.query_id
    ), cum AS (
      SELECT query_id, rank, is_rel,
             CAST(SUM(is_rel) OVER (
               PARTITION BY query_id ORDER BY rank
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS relcnt
      FROM judged
    ), terms AS (
      SELECT query_id,
             CAST(SUM(CASE WHEN is_rel = 1 THEN
               CAST(round(CAST(relcnt * {_AP_SCALE} AS DOUBLE) / rank)
                    AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS BIGINT)
               AS ap_num_scaled,
             CAST(SUM(is_rel) AS BIGINT) AS n_rel_at_k
      FROM cum GROUP BY query_id
    ), nrel AS (
      SELECT q.query_id,
             CAST(SUM(CASE WHEN {_rel_expr('q.query_id', 'e.vec_id',
                                           'q.qlabel', 'e.label')} > 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
      FROM q JOIN e ON e.vec_id <> q.query_id
      GROUP BY q.query_id
    )
    SELECT n.query_id, n.n_rel, t.n_rel_at_k, t.ap_num_scaled,
           CASE WHEN LEAST(n.n_rel, {RETR_K}) = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(t.ap_num_scaled AS DOUBLE)
                     / ({_AP_SCALE}.0 * LEAST(n.n_rel, {RETR_K}))
                END AS avg_precision
    FROM nrel n JOIN terms t ON t.query_id = n.query_id
    ORDER BY n.query_id
    """,
    doc=f"Average precision @ {RETR_K} (binary relevance from the graded "
        "qrels fixture, rel > 0): each hit contributes P@k = relcnt/k "
        "quantized to the 1e9 grid by one correctly-rounded division of "
        "exact integers, summed in BIGINT; AP normalizes by min(n_rel, "
        "K) in one final IEEE division. The cumulative relevant count is "
        "a bounded per-query window (K rows). MAP's per-query rows — "
        "complements nDCG (graded) and MRR (first hit).",
)
def retrieval_avg_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    # run side served from the persisted exact ground-truth artifact
    # (gt_topk.py): RETR_K == TOP_K and the (cosine DESC, vec_id)
    # tie-break are identical, so the artifact rows ARE this ranking —
    # no embedding decode, no corpus-wide scoring pass on the warm path
    from .gt_topk import serve_gt_topk

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
    )
    run = (
        serve_gt_topk(spark, sf_dir)
        .filter(F.col("query_id") < N_QUERIES)
        .filter(F.col("rank") <= RETR_K)
        .select(
            "query_id", "vec_id", F.col("rank").cast("bigint").alias("rank")
        )
    )
    judged = (
        run.join(e.select("vec_id", "label"), "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "rank",
            (
                F.expr(_rel_expr("query_id", "vec_id", "qlabel", "label"))
                > 0
            )
            .cast("int")
            .alias("is_rel"),
        )
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = judged.withColumn(
        "relcnt", F.sum("is_rel").over(w).cast("bigint")
    )
    terms = cum.groupBy("query_id").agg(
        F.sum(
            F.when(
                F.col("is_rel") == 1,
                F.expr(
                    f"CAST(round(CAST(relcnt * {_AP_SCALE} AS DOUBLE)"
                    " / rank) AS BIGINT)"
                ),
            ).otherwise(F.lit(0).cast("bigint"))
        )
        .cast("bigint")
        .alias("ap_num_scaled"),
        F.sum("is_rel").cast("bigint").alias("n_rel_at_k"),
    )
    nrel = (
        e.select("vec_id", "label")
        .join(
            F.broadcast(q.select("query_id", "qlabel")),
            F.col("vec_id") != F.col("query_id"),
        )
        .groupBy("query_id")
        .agg(
            F.sum(
                (
                    F.expr(
                        _rel_expr("query_id", "vec_id", "qlabel", "label")
                    )
                    > 0
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_rel")
        )
    )
    denom = F.least(F.col("n_rel"), F.lit(RETR_K))
    return (
        nrel.join(terms, "query_id")
        .select(
            "query_id",
            "n_rel",
            "n_rel_at_k",
            "ap_num_scaled",
            F.when(denom == 0, F.lit(0.0))
            .otherwise(
                F.col("ap_num_scaled").cast("double")
                / (F.lit(float(_AP_SCALE)) * denom)
            )
            .alias("avg_precision"),
        )
        .orderBy("query_id")
    )


# Per-query precision–recall curve points (round-12, r11 verdict
# optional item #8): one row per (query, depth 1..K) over the SAME
# graded qrels fixture — precision@k = relcnt/k and recall@k =
# relcnt/n_rel, each quantized to the 1e9 grid by ONE correctly-rounded
# division of exact integers (the AP-term discipline), so the curve is
# bit-identical across engines; the emitted doubles are exact-input
# divisions of the already-rounded integers. This is the artifact an
# operating-point choice is made against (where AP/nDCG compress it to
# a scalar), and it exercises the gated two-phase top-K at every depth.


@query(
    "retrieval_pr_curve",
    oracle=_run_and_qrels_sql()
    + f""", judged AS (
      SELECT r.query_id, r.rank,
             CASE WHEN {_rel_expr('r.query_id', 'r.vec_id',
                                  'q.qlabel', 'e.label')} > 0
                  THEN 1 ELSE 0 END AS is_rel
      FROM run r
      JOIN e ON e.vec_id = r.vec_id
      JOIN q ON q.query_id = r.query_id
    ), cum AS (
      SELECT query_id, rank, is_rel,
             CAST(SUM(is_rel) OVER (
               PARTITION BY query_id ORDER BY rank
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS relcnt
      FROM judged
    ), nrel AS (
      SELECT q.query_id,
             CAST(SUM(CASE WHEN {_rel_expr('q.query_id', 'e.vec_id',
                                           'q.qlabel', 'e.label')} > 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
      FROM q JOIN e ON e.vec_id <> q.query_id
      GROUP BY q.query_id
    )
    SELECT c.query_id, c.rank, CAST(c.is_rel AS BIGINT) AS is_rel,
           c.relcnt, n.n_rel,
           CAST(round(CAST(c.relcnt * {_AP_SCALE} AS DOUBLE) / c.rank)
                AS BIGINT) AS prec_scaled,
           CASE WHEN n.n_rel = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(round(CAST(c.relcnt * {_AP_SCALE} AS DOUBLE)
                                / n.n_rel) AS BIGINT) END AS recall_scaled,
           CAST(round(CAST(c.relcnt * {_AP_SCALE} AS DOUBLE) / c.rank)
                AS DOUBLE) / {_AP_SCALE}.0 AS precision_at_k,
           CASE WHEN n.n_rel = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(round(CAST(c.relcnt * {_AP_SCALE} AS DOUBLE)
                                / n.n_rel) AS DOUBLE) / {_AP_SCALE}.0
                END AS recall_at_k
    FROM cum c JOIN nrel n ON n.query_id = c.query_id
    ORDER BY c.query_id, c.rank
    """,
    doc=f"Per-query precision–recall curve points at depths 1..{RETR_K} "
        "over the graded qrels fixture (binary rel > 0): precision@k = "
        "relcnt/k, recall@k = relcnt/n_rel, each quantized to the 1e9 "
        "grid by one correctly-rounded division of exact integers — the "
        "curve AP/nDCG compress to a scalar, emitted as the operating-"
        "point table. Run = gated two-phase top-K; recall denominator = "
        "one labels-only broadcast pass; the cumulative count is a "
        "bounded per-query window (K rows).",
)
def retrieval_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # run side served from the persisted exact ground-truth artifact
    # (gt_topk.py): RETR_K == TOP_K and the (cosine DESC, vec_id)
    # tie-break are identical, so the artifact rows ARE this ranking —
    # no embedding decode, no corpus-wide scoring pass on the warm path
    from .gt_topk import serve_gt_topk

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
    )
    run = (
        serve_gt_topk(spark, sf_dir)
        .filter(F.col("query_id") < N_QUERIES)
        .filter(F.col("rank") <= RETR_K)
        .select(
            "query_id", "vec_id", F.col("rank").cast("bigint").alias("rank")
        )
    )
    judged = (
        run.join(e.select("vec_id", "label"), "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "rank",
            (
                F.expr(_rel_expr("query_id", "vec_id", "qlabel", "label"))
                > 0
            )
            .cast("int")
            .alias("is_rel"),
        )
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = judged.withColumn(
        "relcnt", F.sum("is_rel").over(w).cast("bigint")
    )
    nrel = (
        e.select("vec_id", "label")
        .join(
            F.broadcast(q.select("query_id", "qlabel")),
            F.col("vec_id") != F.col("query_id"),
        )
        .groupBy("query_id")
        .agg(
            F.sum(
                (
                    F.expr(
                        _rel_expr("query_id", "vec_id", "qlabel", "label")
                    )
                    > 0
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_rel")
        )
    )
    prec = F.expr(
        f"CAST(round(CAST(relcnt * {_AP_SCALE} AS DOUBLE) / rank) AS BIGINT)"
    )
    recall = F.when(F.col("n_rel") == 0, F.lit(0).cast("bigint")).otherwise(
        F.expr(
            f"CAST(round(CAST(relcnt * {_AP_SCALE} AS DOUBLE) / n_rel)"
            " AS BIGINT)"
        )
    )
    return (
        cum.join(F.broadcast(nrel), "query_id")
        .select(
            "query_id",
            "rank",
            F.col("is_rel").cast("bigint").alias("is_rel"),
            "relcnt",
            "n_rel",
            prec.alias("prec_scaled"),
            recall.alias("recall_scaled"),
            (prec.cast("double") / F.lit(float(_AP_SCALE))).alias(
                "precision_at_k"
            ),
            F.when(F.col("n_rel") == 0, F.lit(0.0))
            .otherwise(recall.cast("double") / F.lit(float(_AP_SCALE)))
            .alias("recall_at_k"),
        )
        .orderBy("query_id", "rank")
    )


# Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010) between the
# cosine and euclidean rankings — the list-similarity diagnostic a
# hybrid-search stack runs before fusing (near-1 RBO ⇒ fusion adds
# nothing; low RBO ⇒ the rankers disagree and fusion/diversification
# has room to help). Truncated RBO@K = (1−p)·Σ_{{d≤K}} p^{{d−1}}·|A_d ∩
# B_d|/d telescopes per matched doc: a doc at ranks (ra, rb) joins
# every prefix overlap from depth max(ra, rb) on, so its contribution
# is the SUFFIX SUM of the per-depth weights — precomputed once in
# Python as integer literals (the nDCG discount discipline) and folded
# as one exact BIGINT sum per query; the emitted RBO is one final IEEE
# division.
RBO_P = 0.9
_RBO_W = [
    round(_NDCG_SCALE * (1 - RBO_P) * RBO_P ** (d - 1) / d)
    for d in range(1, RETR_K + 1)
]
_RBO_SUFFIX = [sum(_RBO_W[m:]) for m in range(RETR_K)]  # suffix from depth m+1
_RBO_SUFFIX_CASE = (
    "CASE m "
    + " ".join(
        f"WHEN {m} THEN CAST({w} AS BIGINT)"
        for m, w in enumerate(_RBO_SUFFIX, start=1)
    )
    + " ELSE CAST(0 AS BIGINT) END"
)


@query(
    "retrieval_rbo",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb, {_SQL_NORM} AS nrm
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, emb AS qemb, nrm AS qnrm FROM e
      WHERE vec_id < {N_QUERIES}
    ), scored AS (
      SELECT q.query_id, e.vec_id,
             {_sql_dot('q.qemb', 'e.emb')} / (q.qnrm * e.nrm) AS cosine,
             (q.qnrm * q.qnrm) + (e.nrm * e.nrm)
               - (CAST(2 AS DOUBLE) * {_sql_dot('q.qemb', 'e.emb')}) AS dist2
      FROM q JOIN e ON e.vec_id <> q.query_id
    ), r_cos AS (
      SELECT query_id, vec_id, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id
      ) AS BIGINT) AS ra
      FROM scored QUALIFY ra <= {RETR_K}
    ), r_l2 AS (
      SELECT query_id, vec_id, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY dist2 ASC, vec_id
      ) AS BIGINT) AS rb
      FROM scored QUALIFY rb <= {RETR_K}
    ), matched AS (
      SELECT c.query_id, GREATEST(c.ra, l.rb) AS m
      FROM r_cos c JOIN r_l2 l
        ON c.query_id = l.query_id AND c.vec_id = l.vec_id
    )
    SELECT q.query_id,
           CAST(COUNT(m.m) AS BIGINT) AS n_matched,
           CAST(COALESCE(SUM({_RBO_SUFFIX_CASE}), 0) AS BIGINT)
             AS rbo_scaled,
           CAST(COALESCE(SUM({_RBO_SUFFIX_CASE}), 0) AS DOUBLE)
             / {_NDCG_SCALE}.0 AS rbo
    FROM q LEFT JOIN matched m ON m.query_id = q.query_id
    GROUP BY q.query_id
    ORDER BY q.query_id
    """,
    doc=f"Rank-biased overlap (Webber et al. 2010, p={RBO_P}, truncated "
        f"@ {RETR_K}) between the cosine and euclidean rankings — the "
        "ranker-agreement diagnostic run before fusion. Telescoped per "
        "matched doc: contribution = precomputed integer suffix-weight "
        "at depth max(rank_cos, rank_l2), folded as one exact BIGINT "
        "sum; RBO is one final IEEE division. Both rankings ride the "
        "gated two-phase top-k.",
)
def retrieval_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(_SPARK_EMB_D).alias("emb"),
        F.expr(_SPARK_NORM).alias("nrm"),
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
    )
    dot = _spark_dot("qemb", "emb")
    scored = emb.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        (F.expr(dot) / (F.col("qnrm") * F.col("nrm"))).alias("cosine"),
        (
            (F.col("qnrm") * F.col("qnrm"))
            + (F.col("nrm") * F.col("nrm"))
            - (F.lit(2.0) * F.expr(dot))
        ).alias("dist2"),
    ).localCheckpoint(eager=False)  # feeds both rankers
    r_cos = _two_phase_topk(
        scored, RETR_K, base=emb, score_col="cosine"
    ).select("query_id", "vec_id", F.col("rank").cast("bigint").alias("ra"))
    r_l2 = _two_phase_topk(
        scored, RETR_K, base=emb, score_col="dist2", ascending=True
    ).select("query_id", "vec_id", F.col("rank").cast("bigint").alias("rb"))
    matched = r_cos.join(r_l2, ["query_id", "vec_id"]).select(
        "query_id", F.greatest("ra", "rb").alias("m")
    )
    qs = q.select("query_id")
    return (
        qs.join(matched, "query_id", "left")
        .groupBy("query_id")
        .agg(
            F.count("m").cast("bigint").alias("n_matched"),
            F.coalesce(F.sum(F.expr(_RBO_SUFFIX_CASE)), F.lit(0))
            .cast("bigint")
            .alias("rbo_scaled"),
            (
                F.coalesce(F.sum(F.expr(_RBO_SUFFIX_CASE)), F.lit(0)).cast(
                    "double"
                )
                / F.lit(float(_NDCG_SCALE))
            ).alias("rbo"),
        )
        .orderBy("query_id")
    )
