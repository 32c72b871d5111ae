"""Physical-plan regression tests: the scale properties the engine promises
(pushdown, broadcast, no accidental cartesian products) asserted against
`explain` output so a refactor can't silently regress them."""

from __future__ import annotations

import pytest

from conduit_connector_s3_iceberg_spark.plans.registry import load_all

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = load_all()[name].build(spark, SF)
    je = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return je.explainString(mode)


def test_filters_push_into_parquet_scan(spark):
    plan = plan_of(spark, "q03_shipping_priority")
    assert "PushedFilters" in plan
    # the date filter and the segment filter must reach their scans
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400] or "GreaterThan(l_shipdate" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_dimension_joins_broadcast(spark):
    plan = plan_of(spark, "q05_local_supplier_volume")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # all dims fit the broadcast threshold
    assert "CartesianProduct" not in plan


def test_column_pruning_reaches_scan(spark):
    plan = plan_of(spark, "q01_pricing_summary")
    # lineitem has 16 columns; the pricing summary needs 7 — the scan's
    # ReadSchema must not include untouched wide columns like l_comment
    read_schemas = [
        seg.split("\n")[0] for seg in plan.split("ReadSchema: ")[1:]
    ]
    assert read_schemas and all("l_comment" not in rs for rs in read_schemas)


def test_dedup_pipeline_has_no_cartesian(spark):
    plan = plan_of(spark, "dedup_ngram_jaccard")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_is_single_shuffle_window(spark):
    plan = plan_of(spark, "q26_asof_join")
    # the as-of implementation must stay join-free: one exchange on the key,
    # a window, no join operator of any kind
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert op not in plan, f"asof plan unexpectedly contains {op}"
    assert "Window" in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    # at 100 TB the fact side of a selective dim join should be pruned by a
    # runtime bloom filter before the shuffle (Spark injects
    # bloom_filter_agg on the filtered build side and might_contain on the
    # probe scan). Locally everything broadcasts, so force the shuffle-join
    # regime the big cluster would be in and pin that the optimizer still
    # injects the filter.
    from pyspark.sql import functions as F

    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    saved = {k: spark.conf.get(k) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        orders = load_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, SF, "lineitem")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        je = j._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
        plan = je.explainString(mode)
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_topk_similarity_is_two_phase(spark):
    # the exact top-k must NOT funnel a WIDE scored corpus into N_QUERIES
    # reducer tasks: when the input is wider than the cluster (partitions >
    # 2×slots — the only regime where a single-key merge can straggle),
    # phase 1 ranks within (query_id, spark_partition_id()) and truncates
    # to k, so the final per-query merge exchange reads at most
    # k × partitions rows. On narrow inputs (small SF) the gate skips the
    # extra window — phase 1 would only add a shuffle there (r2 bench:
    # +56% on sim_topk_bruteforce). Both regimes are pinned here.
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        _two_phase_topk,
    )

    scored = spark.createDataFrame(
        [(q, v, float((q * 31 + v) % 97)) for q in range(3) for v in range(200)],
        "query_id long, vec_id long, cosine double",
    )
    wide_n = 2 * spark.sparkContext.defaultParallelism + 8
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )

    wide = _two_phase_topk(scored.repartition(wide_n), 5)
    plan = wide._jdf.queryExecution().explainString(mode)
    assert "SPARK_PARTITION_ID()" in plan or "part_id" in plan

    narrow = _two_phase_topk(scored.coalesce(2), 5)
    nplan = narrow._jdf.queryExecution().explainString(mode)
    assert "SPARK_PARTITION_ID()" not in nplan and "part_id" not in nplan

    # the gate is a pure plan change: both regimes return identical rows
    assert sorted(map(tuple, wide.collect())) == sorted(
        map(tuple, narrow.collect())
    )
    # phase-1 window keys include the partition id, and Spark's rank-limit
    # pushdown must be active (map-side truncation before every exchange) —
    # if this disappears, the shuffle is corpus-sized again
    assert "local_rank" in plan
    assert "part_id" in plan.split("Exchange hashpartitioning")[1]
    assert "WindowGroupLimit" in plan


def test_hash_sampling_is_narrow_map(spark):
    # deterministic Bernoulli sampling must not shuffle: the whole operator
    # is filter+project over the scan (at 100 TB this is the difference
    # between a map-only pass and a pointless repartition)
    plan = plan_of(spark, "sample_stratified_hash")
    assert "Exchange" not in plan
    for op in ("SortMergeJoin", "BroadcastHashJoin", "Window"):
        assert op not in plan


def test_heavy_hitters_is_partial_agg_plus_topk(spark):
    plan = plan_of(spark, "text_heavy_hitters")
    # top-k must be TakeOrderedAndProject (k rows/partition to the driver),
    # never a global Sort
    assert "TakeOrderedAndProject" in plan
    # partial (map-side) aggregation before the shuffle
    assert "partial_count" in plan or "HashAggregate" in plan


def test_centroids_single_shuffle(spark):
    import re

    plan = plan_of(spark, "emb_label_centroids")
    # posexplode → partial agg → ONE exchange on (label, pos) → final agg
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange == 1, f"expected 1 shuffle, plan has {n_exchange}"


def test_spend_deciles_broadcasts_dimension(spark):
    plan = plan_of(spark, "q33_spend_deciles")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


# Deliberate broadcast non-equi joins over tiny build sides (literal band
# dimension; 5-row query set). Everything else must plan hash joins.
def test_aqe_converts_small_join_to_broadcast(spark):
    # the 100-TB claim "AQE re-plans shuffles at runtime" made concrete:
    # with static broadcast disabled the planner picks a sort-merge join,
    # and AQE converts it to broadcast at runtime once the filtered side's
    # true size is known
    from pyspark.sql import functions as F

    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")
    try:
        li = load_table(spark, SF, "lineitem")
        small = (
            load_table(spark, SF, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        df = li.join(small, li.l_orderkey == small.o_orderkey)
        je = df._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
        assert "SortMergeJoin" in je.explainString(mode)
        df.collect()
        assert "BroadcastHashJoin" in je.executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_shuffle_hash_join_hint_honored(spark):
    # SURVEY §2C lists all four physical join strategies; broadcast and
    # sort-merge appear throughout the registry — this pins the third:
    # a shuffled-hash join selected via hint (the right call when both
    # sides are large but one side's partitions fit in memory, avoiding
    # the sort-merge sort)
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    df = li.join(orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey)
    je = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    assert "ShuffledHashJoin" in je.explainString(mode)


def test_exists_subqueries_become_semi_anti_joins(spark):
    # Q21 shape: the correlated EXISTS / NOT EXISTS must decorrelate into
    # left-semi and left-anti joins — never a per-row subquery loop
    plan = plan_of(spark, "q37_waiting_suppliers")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_anti_join_shape_idle_customers(spark):
    # Q22 shape: NOT EXISTS → left-anti join; dimension join broadcasts
    plan = plan_of(spark, "q38_idle_rich_customers")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_contamination_probe_broadcasts(spark):
    # the probe shingle index is tiny — it must broadcast, and the corpus
    # side must never cartesian
    plan = plan_of(spark, "text_contamination")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_part_revenue_share_single_fact_scan(spark):
    # the global-total threshold must NOT rescan the fact table: the
    # per-part aggregate is checkpointed and both consumers read it
    plan = plan_of(spark, "q36_part_revenue_share")
    assert plan.count("Scan parquet") <= 1


BROADCAST_NONEQUI_OK = {
    "q27_range_band_join",
    "sim_topk_bruteforce",
    # one-row global-threshold broadcast (Q11 shape) — bounded by design
    "q36_part_revenue_share",
    # cross join of three one-row funnel-stage counts — bounded by design
    "q41_conversion_funnel",
    # one-row corpus-size broadcast into the IDF table — bounded by design
    "text_tfidf_top_terms",
    # one-row global-average + one-row hot-key-count broadcasts — bounded
    "q51_join_key_skew_profile",
    # segments × months spine cross join (both sides bounded dims)
    "q57_gap_fill_carry_forward",
    # one-row total-token-count broadcast into the K-row vocab — bounded
    "text_vocab_coverage",
    # one-row centroid-array broadcasts (K×DIM values each) — bounded
    "emb_kmeans_assign",
    # one-row v1-vector and norm broadcasts (DIM values) — bounded
    "emb_pca_power",
    # 1-row × 1-row crossJoin(broadcast(true_d)) estimate fold — bounded
    "events_hll_estimate",
    # r9: one-row date-range / span / total / water-level / truth-size
    # broadcasts — all bounded by design
    "events_rate_shift_test",
    "events_benford_audit",
    "events_entropy_rate",
    "mix_unimax_allocation",
    "sim_multistep_train_audit",
    # one-row corpus-total broadcast into the vocab table — bounded
    "text_rarity_score",
    # one-row codebook broadcast (M×K×SUBDIM constants) — bounded
    "emb_pq_codes",
    # one-row codebook + N_QUERIES-row ADC-table broadcasts — bounded
    "emb_pq_adc_topk",
    # one-row codebook broadcast (M×K×SUBDIM constants) — bounded
    "emb_pq_distortion",
    # one-row centroid-array broadcast (K×DIM values) — bounded
    "emb_outlier_topk",
    # same one-row centroid-array broadcast feeding the purity audit
    "emb_cluster_purity",
    # N_QUERIES-row broadcast with label-disagreement predicate — bounded
    # (same shape as sim_topk_bruteforce)
    "sim_hard_negatives",
    # RECALL_QUERIES-row (50) probe broadcast with <> self-exclusion
    # predicate — the sim_topk_bruteforce shape; truth side of the
    # leave-one-out 1-NN audit is exact brute force by definition
    "emb_knn_loo_accuracy",
    # r10: 1-row (nbits) corpus-stats broadcast into the 1-row balance
    # fold — bounded by design
    "emb_semdedup_balance_audit",
    # two one-row totals broadcasts feeding the integer apportionment
    "sample_neyman_allocation",
    # one-row model-totals broadcast into the 1024-bucket weight table
    "text_dsir_weights",
    # same bounded DSIR broadcasts feeding the log-domain draw
    "sample_dsir_resample",
    # composes the DSIR one-row totals broadcast with the cluster join
    "pipeline_weighted_manifest",
    # T-row type-pair spine and T×k-row sketch joins — metadata-sized
    "sketch_kmv_jaccard",
    # one-row basket-count broadcast into the rule table — bounded
    "q73_basket_lift",
    # distinct-fingerprint self-join — domain-bounded at 2^16 rows
    "dedup_simhash_hamming_audit",
    # D×W register spine / D-row probe-lookup cross joins (constants)
    "events_cms_registers",
    "events_cms_estimate",
    # composes sim_topk_bruteforce + sim_ann_lsh (their bounded broadcasts)
    "sim_ann_recall",
    # one-row corpus-total + one-row bonus-count broadcasts — bounded
    "sample_domain_apportioned",
    # one-row tempered-weight-total broadcasts into |sources| rows — bounded
    "sample_mixture_weights",
    "sample_epoch_by_mixture",
    # N_QUERIES-row query broadcast, non-equi self-pair predicate — same
    # bounded shape as sim_topk_bruteforce
    "sim_truncated_rerank",
    # one-row node-count broadcast seeding base = SCALE div N — bounded
    "graph_pagerank",
    # one-row seed-count broadcast seeding base = SCALE div k — bounded
    "graph_ppr_seeded",
    # one-row corpus-count broadcast into the DIM×DIM Gram grid — bounded
    "emb_effective_rank",
    # one-row LLR-constants broadcast into the daily grid — bounded
    "events_sprt_boundary",
    # RECALL_QUERIES-row probe broadcast, <> self-exclusion predicate —
    # the sim_topk_bruteforce shape; triplet truth is brute force by
    # definition
    "emb_triplet_margin_audit",
    # |sources|-row × |sources|-row CE grid + one-row vocab broadcast —
    # metadata-sized by design
    "lm_transfer_matrix",
    # one-row total-weight broadcast into the anchor-count arithmetic
    "sample_pps_systematic",
    # one-row period-midpoint + one-row user-count broadcasts — bounded
    "events_uplift_qini",
    # composes the brute-force truth broadcast (sim_topk_bruteforce
    # shape) with the bounded probe-bucket equi-join
    "sim_lsh_multiprobe_recall",
    # 1-row sketch-sum × 1-row exact-F2 fold — bounded by design
    "sketch_ams_f2",
    # one-row codebook broadcast + queries×probes table — bounded
    "sim_ann_ivfpq",
    # one-row corpus-stats (N, total tokens) broadcast into the tf table
    "text_bm25_top_terms",
    # N_QUERIES-row query broadcast, <> self-pair predicate (the
    # sim_topk_bruteforce shape) feeding both fused rankings / the MMR
    # candidate stage
    "sim_rrf_fusion",
    "sim_mmr_rerank",
    # one-row train-token-total broadcast into the doc-trigram frame
    "lm_stupid_backoff",
    # one-row global-max broadcast into the |buckets|-row accounting
    "pack_length_buckets",
    # one-row (d0, d1) date-bounds broadcast seeding the dense day grid
    "events_holt_smoothing",
    # one-row state-count broadcast seeding mass = SCALE div k, and a
    # one-row grand-total broadcast into the |states|-row result
    "events_markov_stationary",
    # two one-row pair-count broadcasts folding the audit summary
    "dedup_lsh_recall_audit",
    # one-row peak + one-row session-count broadcasts folding the summary
    "events_peak_concurrency",
    # scenario x model expansion over the vocabulary-sized transition
    # table (non-equi on the removed channel) + 1-row base/total folds
    "events_markov_attribution",
    # round 5 bounded broadcasts:
    # marginal-sized grid cross joins (|langs| x |sources|) + 1-row total
    "corpus_lang_source_chisq",
    # |labels|-row (5) centroid table broadcast against the corpus
    "emb_centroid_margin",
    # 3-row probe-level frame + bounded candidate/hit folds
    "sim_ivf_nprobe_curve",
    # 1-row vector-total broadcast into the |shards|-row audit
    "sim_ivf_shard_plan",
    # 7-row lag frame broadcast against the date-spine-sized series
    "events_autocorrelation",
    # two 1-row CI-bound broadcasts folded into the 1-row summary
    "sample_poisson_bootstrap_ci",
    # 1-row global-totals broadcast into the |sources|-row influence table
    "corpus_source_influence",
    # 1-row index-totals broadcast into the 16-cell maintenance report
    "sim_ivf_delta_assign",
    # 1-row token-totals broadcast into the |sources|-row mixture table
    "corpus_dedup_mixture_shift",
    # 5-row query-set broadcast against the corpus scan (bruteforce shape)
    "sim_cross_encoder_rerank",
    # three 1-row estimate broadcasts + 1-row truth fold (64-register domain)
    "sketch_hll_set_algebra",
    # duration-domain prefix self-join + 1-row user-total broadcast
    "events_survival_km",
    # 32-row file-span broadcasts probed by value-domain containment
    "layout_sort_advisor",
    # 1-row date-bounds broadcast seeding the dense day grid
    "events_fano_factor",
    # 1-row truth broadcast folded into the 1-row estimate audit
    "sketch_cms_join_size",
    # round 7 third wave bounded broadcasts:
    # 1-row ref-day broadcast aging the O(types x days) day-grain frame
    "events_decayed_popularity",
    # 1-row date-bounds broadcast seeding the dense day grid (Holt shape)
    "events_forecast_backtest",
    # 1-row query-count broadcast into the |layouts|-row pruning audit
    "layout_pruning_audit",
    # 1-row bigram-type-total broadcast into the continuation table
    "lm_kneser_ney",
    # 5-row query-set broadcast against the corpus scan (bruteforce shape)
    "emb_int8_recall",
    # 32-row bounded pair sample, broadcast non-equi self-join (496 pairs)
    "emb_jl_projection_audit",
    # 1-row period-midpoint broadcast onto the scan (CUPED pre/post split)
    "events_ab_cuped",
    # 1-row date-bounds broadcast seeding the dense day grid (Holt shape)
    "events_burst_viterbi",
    # 3-row pct grid + 3-row tau table broadcast over the register-domain
    # weight histogram (never the corpus)
    "sample_weight_truncation",
    # 1-row index-totals broadcast into the N_CENTROIDS-row balance table
    "sim_index_balance_audit",
    # 4-row pct grid + 4-row tau table + 1-row totals broadcast over the
    # register-domain quality histogram (never the corpus)
    "text_quality_frontier",
    # 5-row query-set broadcast against the corpus scan (bruteforce shape)
    "emb_sign_hamming_recall",
    # 1-row max broadcasts normalizing each HITS half-step
    "graph_hits",
    # 1-row corpus-total broadcast into the k x L fold grid
    "sample_kfold_assignments",
    # round 8 bounded broadcasts:
    # |thresholds|-row grid joined to the candidate-pair set by a non-equi
    # integer cross-multiply + 1-row pair-total fold
    "dedup_threshold_curve",
    # 1-row n / DIM-array mean / decimal gram-mass broadcasts — bounded
    "emb_abtt_isotropy_gain",
    # 1-row event-time-bounds broadcast splitting pre/post (CUPED shape)
    "events_did_lift",
    # 1-row corpus-token-total broadcast into the |sources|-row KL table
    "lm_source_kl",
    # N_QUERIES-row query broadcast (bruteforce shape) + bounded probe/
    # scan/total folds over the trained-index audit
    "sim_ann_trained_recall",
    # |nprobe-levels|-row spine joined by prank <= np (non-equi on a
    # 4-row side) + bounded folds — the one-pass operating curve
    "sim_trained_nprobe_curve",
    # |labels|-row (5) centroid table broadcast (centroid-margin shape)
    "emb_silhouette",
    # 1-row edge-total broadcast into the |nations|-row community table
    "graph_modularity",
    # 1-row unigram-total + 1-row pair-total broadcasts into the
    # min-count-filtered collocation table
    "text_collocations_pmi",
    # N_QUERIES-row query broadcast against the corpus scan (the
    # bruteforce shape) carrying the in-probed-cell flag
    "sim_range_search_audit",
    # k-row centroid-pair and k-row sigma broadcasts (k = |labels|)
    "emb_davies_bouldin",
    # 1-row grand-mean array + 1-row B/W mass broadcasts — bounded
    "emb_calinski_harabasz",
    # 1-row date-bounds broadcast seeding the dense day grid (fano shape)
    "events_seasonal_strength",
    # 1-row reference-day broadcast ahead of the map-side integer gate
    "sample_decayed_admission",
    # two N_QUERIES-row query broadcasts (bruteforce shape, both rounds)
    "sim_prf_rocchio",
    # 1-row reference-day broadcast into the |purchasers| frame
    "events_rfm_segments",
    # 1-row split-totals broadcast into the 1-row affinity fold
    "corpus_split_hellinger",
    # round 11 bounded broadcasts:
    # eight 1-row state-aggregate broadcasts crossJoined into the single
    # audit row (each read from a different persisted artifact; the cp_*
    # invariants joined the audit in round 12)
    "graph_state_audit",
    # N_QUERIES-row query broadcast against the corpus scan (bruteforce
    # shape) for both the run and the labels-only qrel-count pass
    "retrieval_ndcg_mrr",
    "retrieval_avg_precision",
    "retrieval_pr_curve",
    # round 12 bounded broadcasts:
    # two 1-row state-aggregate broadcasts crossJoined into the single
    # counts-audit row (uni vs bi artifacts)
    "lm_counts_state_audit",
}


def test_no_unbounded_join_in_any_registered_query(spark):
    # registry-wide hygiene net: a refactor that degrades any query to a
    # cartesian product (or an accidental nested-loop join over two big
    # sides) fails here, not at 100 TB
    failures = []
    for name, q in sorted(load_all().items()):
        df = q.build(spark, SF)
        je = df._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
        plan = je.explainString(mode)
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in BROADCAST_NONEQUI_OK:
            failures.append(f"{name}: BroadcastNestedLoopJoin")
    assert not failures, failures


def test_aqe_splits_skewed_join_partitions(spark):
    """Pin the runtime skew answer SCALE.md leans on: AQE detects a hot
    join key's oversized shuffle partition and splits it (SMJ skew=true),
    so one fat key cannot straggle a 1000-executor join."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # keep every shuffle a real exchange so skew stats are per-partition
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        from pyspark.sql import functions as F

        # key 0 carries 50k fat rows; keys 1..99 one row each
        left = spark.range(0, 50_000).select(
            F.when(F.col("id") < 49_901, 0).otherwise(F.col("id") % 100).alias("k"),
            F.concat(F.lit("x" * 200), F.col("id")).alias("payload"),
        )
        right = spark.range(0, 100).selectExpr("id AS k", "id * 10 AS v")
        joined = left.join(right, "k")
        # collect() (not count()) so THIS DataFrame's query execution runs
        # and its adaptive plan finalizes — count() spawns a separate one
        assert len(joined.collect()) == 50_000
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "skew=true" in final, final[:2000]
        assert "AQEShuffleRead skewed" in final
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_kmv_family_scans_the_corpus_once(spark):
    # the deduped hash frame / sketch rows are localCheckpointed and every
    # consumer (exact counts, both Jaccard legs) reads the materialization
    # — not a fresh events scan per consumer
    for name in ("sketch_kmv_distinct", "sketch_kmv_jaccard"):
        plan = plan_of(spark, name)
        assert plan.count("Scan parquet") == 0, name  # all reads via checkpoints


def test_dau_wau_has_fixed_fanout_no_nested_loop(spark):
    # trailing-week membership must be the 7-offset explode, never a
    # range join whose comparison cost grows with the calendar
    plan = plan_of(spark, "events_dau_wau")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
