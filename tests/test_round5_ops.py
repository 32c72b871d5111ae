"""Property tests for the round-5 operators: LSH banding S-curve,
dedup-savings manifest, centroid-margin audit, IVF nprobe curve, and the
lang×source chi-square.

Each asserts the operator's defining invariant (what the oracle's
value-hash alone doesn't state), on the sf0.001 fixture."""

import pytest

from conduit_connector_s3_iceberg_spark.operators.corpus import (
    corpus_lang_source_chisq,
)
from conduit_connector_s3_iceberg_spark.operators.dedup import (
    dedup_family_savings,
    dedup_lsh_scurve,
)
from conduit_connector_s3_iceberg_spark.operators.similarity import (
    NPROBE_LEVELS,
    emb_centroid_margin,
    sim_ivf_nprobe_curve,
)

SF = "/root/testdata/sf0.001"


def test_scurve_theory_is_monotone_and_bounded(spark):
    """The binomial-tail capture probability is strictly increasing in s,
    so its per-bucket average must be nondecreasing over Jaccard deciles;
    both curves live in [0, 1]."""
    rows = dedup_lsh_scurve(spark, SF).orderBy("bucket").collect()
    assert rows, "pair population empty at sf0.001"
    prev = -1.0
    for r in rows:
        assert 0.0 <= r.theory_capture <= 1.0
        assert 0.0 <= r.realized_capture <= 1.0
        assert r.n_captured <= r.n_pairs
        assert r.theory_capture >= prev
        prev = r.theory_capture


def test_family_savings_simhash_coarsens_exact(spark):
    """Identical texts share a SimHash, so the SimHash partition is a
    coarsening of the exact partition: fewer groups, at least as many
    docs removed; token accounting is internally consistent."""
    by = {r.family: r for r in dedup_family_savings(spark, SF).collect()}
    assert set(by) == {"exact", "simhash"}
    for r in by.values():
        assert r.tokens_kept + r.tokens_removed == r.tokens_total
        assert r.n_docs - r.n_groups == r.docs_removed
        assert 0.0 <= r.frac_tokens_removed < 1.0
    assert by["simhash"].n_groups <= by["exact"].n_groups
    assert by["simhash"].docs_removed >= by["exact"].docs_removed
    # same corpus on both rows
    assert by["simhash"].n_docs == by["exact"].n_docs
    assert by["simhash"].tokens_total == by["exact"].tokens_total


def test_centroid_margin_invariants(spark):
    """Margins are runner-up-minus-nearest, hence nonnegative; own-centroid
    hits are bounded by the label's vector count."""
    rows = emb_centroid_margin(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.min_margin >= 0.0
        assert r.avg_margin >= r.min_margin - 1e-9
        assert 0 <= r.n_own_centroid <= r.n_vecs


def test_nprobe_curve_is_monotone(spark):
    """More probes can only add candidates and hits: both counts and
    recall are nondecreasing in nprobe; recall stays in [0, 1]."""
    rows = sim_ivf_nprobe_curve(spark, SF).orderBy("nprobe").collect()
    assert [r.nprobe for r in rows] == sorted(NPROBE_LEVELS)
    prev_c = prev_h = -1
    for r in rows:
        assert r.n_candidates >= prev_c
        assert r.n_hits >= prev_h
        assert 0.0 <= r.recall_at_k <= 1.0
        assert r.n_hits <= r.n_candidates or r.n_candidates == 0
        prev_c, prev_h = r.n_candidates, r.n_hits


def test_chisq_shape_and_bounds(spark):
    [r] = corpus_lang_source_chisq(spark, SF).collect()
    assert r.dof == (r.n_langs - 1) * (r.n_sources - 1)
    assert r.chi2 >= 0.0
    assert 0.0 <= r.cramers_v <= 1.0 + 1e-12


def test_cluster_size_histogram_partitions_corpus(spark):
    """Histogram buckets partition the corpus: doc counts sum to the
    corpus size, every largest_cluster fits its bucket, and bucket-1
    clusters are exactly the singletons."""
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        dedup_cluster_size_histogram,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = dedup_cluster_size_histogram(spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.largest_cluster <= r.size_bucket or r.size_bucket == 128
        if r.size_bucket == 1:
            assert r.n_clusters == r.n_docs


def test_source_originality_accounting(spark):
    """original + internal + external = n_docs per source; exactly one
    original per family corpus-wide."""
    from conduit_connector_s3_iceberg_spark.operators.corpus import (
        corpus_source_originality,
    )
    from conduit_connector_s3_iceberg_spark.operators.dedup import dedup_simhash

    rows = corpus_source_originality(spark, SF).collect()
    for r in rows:
        assert r.n_original + r.n_internal_copies + r.n_external_copies == r.n_docs
        assert 0.0 < r.originality_rate <= 1.0
    n_families = dedup_simhash(spark, SF).select("simhash16").distinct().count()
    assert sum(r.n_original for r in rows) == n_families


def test_shard_plan_is_balanced(spark):
    """Round-robin by size rank: shard vector totals differ by at most the
    largest single cell, and the load factors average 1 over used shards
    scaled by coverage."""
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        sim_ivf_shard_plan,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = sim_ivf_shard_plan(spark, SF).collect()
    n_vecs = load_table(spark, SF, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n_vecs
    if len(rows) > 1:
        totals = [r.n_vecs for r in rows]
        largest = max(r.largest_cell for r in rows)
        assert max(totals) - min(totals) <= largest


def test_interval_overlap_join_plans_as_equi_join(spark):
    """The banded interval join must execute as a hash/merge EQUI-join on
    the band key — the whole point of banding is avoiding the nested-loop
    plan a naive inequality self-join gets."""
    from conduit_connector_s3_iceberg_spark.plans.events import (
        q78_interval_overlap_join,
    )

    df = q78_interval_overlap_join(spark, SF)
    je = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    plan = je.explainString(mode)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    rows = df.collect()
    for r in rows:
        assert r.user_a < r.user_b
        assert r.total_overlap_us >= 0
        assert r.n_overlapping_sessions >= 1


def test_poisson_bootstrap_ci_shape(spark):
    """CI bounds are ordered, lie within the data range, and bracket a
    plausible neighborhood of the point estimate; replicate count fixed."""
    from conduit_connector_s3_iceberg_spark.operators.sampling import (
        sample_poisson_bootstrap_ci,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    [r] = sample_poisson_bootstrap_ci(spark, SF).collect()
    stats = load_table(spark, SF, "documents").agg(
        {"n_chars": "min"}
    ).collect()[0][0]
    mx = load_table(spark, SF, "documents").agg({"n_chars": "max"}).collect()[0][0]
    assert r.n_replicates == 100
    assert r.ci_lo <= r.ci_hi
    assert stats <= r.ci_lo and r.ci_hi <= mx
