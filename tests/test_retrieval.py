"""Property tests for the retrieval operators (BM25 term saliency, RRF
fusion): the defining invariants the oracle's value-hash alone doesn't
state, on the sf0.001 fixture."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from conduit_connector_s3_iceberg_spark.operators.retrieval import (
    BM25_TOP,
    RRF_K,
    RRF_LIST,
    RRF_TOP,
    sim_rrf_fusion,
    text_bm25_top_terms,
)

SF = "/root/testdata/sf0.001"


def test_bm25_matches_hand_computed_score(spark):
    """Recompute BM25 for one (doc, term) from raw counts in Python — the
    operator's per-row expression tree must reproduce it (same IEEE ops)."""
    out = text_bm25_top_terms(spark, SF)
    row = out.orderBy("doc_id", "rnk").first()
    doc_id, term, got = row["doc_id"], row["term"], row["bm25"]

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.expr("split(trim(lower(text)), ' ')").alias("t"))
    )
    toks = docs.select("doc_id", F.explode("t").alias("term"))
    tf = (
        toks.filter((F.col("doc_id") == doc_id) & (F.col("term") == term))
        .count()
    )
    dl = docs.filter(F.col("doc_id") == doc_id).select(F.size("t")).first()[0]
    df = (
        toks.filter(F.col("term") == term)
        .select("doc_id").distinct().count()
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.size("t")).alias("tot")
    ).first()
    n_docs, total_len = stats["n"], stats["tot"]

    idf = (float(n_docs) - float(df) + 0.5) / (float(df) + 0.5)
    tf_part = (float(tf) * (1.2 + 1.0)) / (
        float(tf)
        + 1.2 * (1.0 - 0.75 + 0.75 * (float(dl) / (float(total_len) / float(n_docs))))
    )
    assert math.isclose(got, idf * tf_part, rel_tol=1e-12)


def test_bm25_ranks_are_contiguous_and_capped(spark):
    out = text_bm25_top_terms(spark, SF)
    per_doc = (
        out.groupBy("doc_id")
        .agg(F.max("rnk").alias("mx"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert per_doc, "no documents scored"
    for r in per_doc:
        assert r["mx"] == r["n"] <= BM25_TOP


def test_rrf_score_is_the_reciprocal_rank_formula(spark):
    out = sim_rrf_fusion(spark, SF).collect()
    assert out, "no fused results"
    for r in out:
        want = 0.0
        if r["rank_cos"] is not None:
            assert 1 <= r["rank_cos"] <= RRF_LIST
            want += 1.0 / (float(RRF_K) + float(r["rank_cos"]))
        if r["rank_l2"] is not None:
            assert 1 <= r["rank_l2"] <= RRF_LIST
            want += 1.0 / (float(RRF_K) + float(r["rank_l2"]))
        assert r["rank_cos"] is not None or r["rank_l2"] is not None
        assert math.isclose(r["rrf"], want, rel_tol=1e-12)
        assert r["vec_id"] != r["query_id"]


def test_rrf_fused_ranks_contiguous_per_query(spark):
    out = sim_rrf_fusion(spark, SF)
    per_q = (
        out.groupBy("query_id")
        .agg(
            F.max("fused_rank").alias("mx"),
            F.count(F.lit(1)).alias("n"),
            F.min("fused_rank").alias("mn"),
        )
        .collect()
    )
    assert per_q
    for r in per_q:
        assert r["mn"] == 1 and r["mx"] == r["n"] <= RRF_TOP


def test_rrf_double_listed_item_beats_single_listed(spark):
    """Any item present in BOTH top lists at rank <= L/3 must outscore any
    item present in only one list — the fusion property RRF exists for."""
    rows = sim_rrf_fusion(spark, SF).collect()
    both = [
        r["rrf"]
        for r in rows
        if r["rank_cos"] is not None
        and r["rank_l2"] is not None
        and r["rank_cos"] <= RRF_LIST // 3
        and r["rank_l2"] <= RRF_LIST // 3
    ]
    single = [
        r["rrf"] for r in rows if r["rank_cos"] is None or r["rank_l2"] is None
    ]
    if both and single:
        assert min(both) > max(single)


def test_mmr_diversifies_and_scores_consistently(spark):
    from conduit_connector_s3_iceberg_spark.operators.retrieval import (
        MMR_K,
        sim_mmr_rerank,
    )
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        sim_topk_bruteforce,
    )

    mmr = sim_mmr_rerank(spark, SF).collect()
    by_q = {}
    for r in mmr:
        by_q.setdefault(r["query_id"], []).append(r)
    assert by_q
    rel = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in sim_topk_bruteforce(spark, SF).collect()
    }
    diverged = False
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["mmr_rank"])
        assert [r["mmr_rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) == MMR_K
        # pick 1 is pure relevance: must equal the brute-force rank-1 hit
        assert rows[0]["vec_id"] == rel[(qid, 1)]
        assert rows[0]["mmr_score"] == 0.7 * rows[0]["relevance"]
        # later picks carry a similarity term bounded by |cosine| <= 1, so
        # the score sits within 0.3 of pure relevance (negative cosines
        # make the "penalty" a bonus — both directions are legal)
        for r in rows[1:]:
            assert abs(r["mmr_score"] - 0.7 * r["relevance"]) <= 0.3 + 1e-12
        mmr_order = [r["vec_id"] for r in rows]
        rel_order = [rel[(qid, k)] for k in range(1, MMR_K + 1)]
        if mmr_order != rel_order:
            diverged = True
    # diversification must actually change at least one query's ordering
    assert diverged


def test_ndcg_mrr_bounds_and_consistency(spark):
    """nDCG in [0,1] with DCG <= IDCG (ideal is an upper bound by
    construction), RR consistent with first_rel_rank, and the graded
    qrels actually discriminating (not all queries saturated at 1.0)."""
    from conduit_connector_s3_iceberg_spark.operators.retrieval import (
        RETR_K,
        retrieval_ndcg_mrr,
    )

    rows = retrieval_ndcg_mrr(spark, SF).collect()
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        N_QUERIES,
    )

    assert len(rows) == N_QUERIES
    for r in rows:
        assert 0.0 <= r["ndcg"] <= 1.0, r
        assert r["dcg_scaled"] <= r["idcg_scaled"], r
        if r["first_rel_rank"] is None:
            assert r["rr"] == 0.0 and r["dcg_scaled"] == 0
        else:
            assert 1 <= r["first_rel_rank"] <= RETR_K
            assert r["rr"] == 1.0 / r["first_rel_rank"]
        assert r["n_rel"] >= 0
    # the cosine ranking correlates with label-derived grades, so the
    # metric should be informative: some relevant doc found somewhere...
    assert any(r["rr"] > 0 for r in rows)
    # ...and the fixture hard enough that not every query is perfect
    assert any(r["ndcg"] < 1.0 for r in rows)


def test_pr_curve_invariants(spark):
    """Round-12: per-query PR points — precision consistent with the
    cumulative count, recall monotone in rank, precision*k == relcnt on
    the quantization grid, and the curve consistent with the AP rows
    computed over the same run."""
    from conduit_connector_s3_iceberg_spark.operators.retrieval import (
        _AP_SCALE,
        RETR_K,
        retrieval_avg_precision,
        retrieval_pr_curve,
    )
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        N_QUERIES,
    )

    rows = retrieval_pr_curve(spark, SF).collect()
    assert len(rows) == N_QUERIES * RETR_K
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    ap_rows = {
        r["query_id"]: r for r in retrieval_avg_precision(spark, SF).collect()
    }
    for qid, pts in by_q.items():
        pts.sort(key=lambda r: r["rank"])
        assert [p["rank"] for p in pts] == list(range(1, RETR_K + 1))
        prev_recall = -1
        for p in pts:
            assert p["prec_scaled"] == round(
                p["relcnt"] * _AP_SCALE / p["rank"]
            )
            assert 0 <= p["precision_at_k"] <= 1.0
            assert 0 <= p["recall_at_k"] <= 1.0
            assert p["recall_scaled"] >= prev_recall  # monotone in rank
            prev_recall = p["recall_scaled"]
            assert p["n_rel"] == ap_rows[qid]["n_rel"]
        # relcnt at depth K == the AP row's n_rel_at_k over the same run
        assert pts[-1]["relcnt"] == ap_rows[qid]["n_rel_at_k"]
