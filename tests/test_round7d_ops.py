"""Round-7 fourth-wave operator tests: SALSA hubs/authorities,
Kneser-Ney smoothing, exponentially decayed popularity."""

from __future__ import annotations

from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.001"


def test_salsa_partitions_nodes_and_conserves_mass(spark):
    """Hub rows are exactly the trading customers, auth rows exactly the
    traded suppliers; the degree-divided walk only loses floor mass, so
    each side's total stays in (0, SCALE]."""
    from conduit_connector_s3_iceberg_spark.operators.graph import (
        PR_SCALE,
        graph_salsa_authority,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    out = graph_salsa_authority(spark, SF001).cache()
    sides = dict(
        out.groupBy("side").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    orders = load_table(spark, SF001, "orders")
    li = load_table(spark, SF001, "lineitem")
    pairs = orders.join(
        li, orders.o_orderkey == li.l_orderkey
    ).select("o_custkey", "l_suppkey")
    assert sides["hub"] == pairs.select("o_custkey").distinct().count()
    assert sides["auth"] == pairs.select("l_suppkey").distinct().count()
    mass = {
        r["side"]: r["m"]
        for r in out.groupBy("side").agg(F.sum("score_scaled").alias("m")).collect()
    }
    assert 0 < mass["hub"] <= PR_SCALE
    assert 0 < mass["auth"] <= PR_SCALE
    # no negative or null scores anywhere
    assert out.filter(F.col("score_scaled") < 0).count() == 0
    out.unpersist()


def test_salsa_authority_tracks_endorsement_not_just_degree(spark):
    """Authority is walk mass, not raw in-degree: scores are positive for
    every supplier and the id namespace is disjoint (c*/s* prefixes)."""
    from conduit_connector_s3_iceberg_spark.operators.graph import (
        graph_salsa_authority,
    )

    out = graph_salsa_authority(spark, SF001)
    bad = out.filter(
        ~(
            (F.col("side") == "hub") & F.col("id").startswith("c")
            | (F.col("side") == "auth") & F.col("id").startswith("s")
        )
    ).count()
    assert bad == 0
    assert out.filter((F.col("side") == "auth") & (F.col("score_scaled") <= 0)).count() == 0


def test_kneser_ney_bounded_and_shares_front_end(spark):
    """Mean KN probability is a probability (0 < p <= 1), and the doc-side
    bigram totals agree with lm_bigram_score's shared front end."""
    from conduit_connector_s3_iceberg_spark.operators.lm import (
        lm_bigram_score,
        lm_kneser_ney,
    )

    kn = lm_kneser_ney(spark, SF001).cache()
    assert kn.filter(
        (F.col("mean_kn_prob") <= 0) | (F.col("mean_kn_prob") > 1.0)
    ).count() == 0
    mle = lm_bigram_score(spark, SF001).select(
        "doc_id", F.col("n_bigrams").alias("n_mle")
    )
    joined = kn.join(mle, "doc_id")
    assert joined.count() == kn.count()
    assert joined.filter(F.col("n_bigrams") != F.col("n_mle")).count() == 0
    kn.unpersist()


def test_kneser_ney_discount_lowers_frequent_bigram_mass(spark):
    """KN discounts observed counts (D = 3/4), so the corpus-mean KN score
    never exceeds the MLE fluency by more than the quantization grain, and
    strictly differs from it (the smoothing does something)."""
    from conduit_connector_s3_iceberg_spark.operators.lm import (
        lm_bigram_score,
        lm_kneser_ney,
    )

    kn = lm_kneser_ney(spark, SF001).select("doc_id", "mean_kn_prob")
    mle = lm_bigram_score(spark, SF001).select("doc_id", "mean_bigram_prob")
    row = (
        kn.join(mle, "doc_id")
        .agg(
            F.avg("mean_kn_prob").alias("kn"),
            F.avg("mean_bigram_prob").alias("mle"),
            F.max(F.abs(F.col("mean_kn_prob") - F.col("mean_bigram_prob"))).alias(
                "maxdiff"
            ),
        )
        .collect()[0]
    )
    assert row["maxdiff"] > 0, "KN == MLE everywhere; smoothing is a no-op"
    # interpolated KN redistributes but cannot exceed MLE mass corpus-wide
    # by more than rounding grain
    assert row["kn"] <= row["mle"] + 1e-6


def test_decayed_popularity_totals_and_rank(spark):
    """Per-type event totals reconcile with the raw table; the decayed
    score is bounded by undecayed mass; ranks are a 1..n permutation
    aligned with score order."""
    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        DECAY_SCALE,
        events_decayed_popularity,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    out = events_decayed_popularity(spark, SF001).cache()
    rows = sorted(out.collect(), key=lambda r: r["rnk"])
    raw = dict(
        load_table(spark, SF001, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {r["event_type"]: r["n_events"] for r in rows} == raw
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    scores = [r["score_scaled"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 0 < r["score_scaled"] <= r["n_events"] * DECAY_SCALE
    out.unpersist()


def test_decay_weight_table_is_truncating_geometric():
    """The static weight table is the exact floor recurrence, strictly
    decreasing until underflow, starting at SCALE."""
    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        DECAY_MAX_AGE,
        DECAY_SCALE,
        _decay_weights,
    )

    w = _decay_weights()
    assert len(w) == DECAY_MAX_AGE
    assert w[0] == (0, DECAY_SCALE)
    for (a0, w0), (a1, w1) in zip(w, w[1:]):
        assert a1 == a0 + 1 and w1 == w0 * 9 // 10
    assert w[300][1] == 0  # fully decayed tail contributes exactly nothing
