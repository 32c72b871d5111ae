"""Round-7 fifth-wave operator tests: cohort retention, Good-Turing
smoothing, JL projection audit, data-constrained epoch planning."""

from __future__ import annotations

from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.001"


def test_retention_cohorts_offset_zero_is_full_cohort(spark):
    """Every cohort's week_offset=0 row retains 100% (the first-event week
    is by construction active), and retention never exceeds 1."""
    from conduit_connector_s3_iceberg_spark.plans.events import (
        events_retention_cohorts,
    )

    out = events_retention_cohorts(spark, SF001).cache()
    w0 = out.filter(F.col("week_offset") == 0)
    assert w0.count() > 0
    assert w0.filter(F.col("active_users") != F.col("cohort_size")).count() == 0
    assert out.filter(F.col("retention") > 1.0).count() == 0
    assert out.filter(F.col("week_offset") < 0).count() == 0
    out.unpersist()


def test_retention_cohorts_sizes_partition_users(spark):
    """Cohort sizes sum to the distinct-user count — each user belongs to
    exactly one cohort (their first-event week)."""
    from conduit_connector_s3_iceberg_spark.plans.events import (
        events_retention_cohorts,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    out = events_retention_cohorts(spark, SF001)
    total = (
        out.filter(F.col("week_offset") == 0)
        .agg(F.sum("cohort_size"))
        .collect()[0][0]
    )
    users = load_table(spark, SF001, "events").select("user_id").distinct().count()
    assert total == users


def test_good_turing_mass_and_identities(spark):
    """Count-of-counts table: class_tokens sum to the corpus token count;
    r* = (r+1) N_{r+1} / N_r holds on a hand-checked row; the top class
    (no N_{r+1}) smooths to 0."""
    from conduit_connector_s3_iceberg_spark.operators.lm import (
        LM_SCALE,
        lm_good_turing,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    out = lm_good_turing(spark, SF001).cache()
    rows = {r["r"]: r for r in out.collect()}
    docs = load_table(spark, SF001, "documents")
    n_tokens = docs.select(
        F.sum(F.size(F.split(F.trim(F.lower(F.col("text"))), " "))).alias("n")
    ).collect()[0]["n"]
    assert sum(r["class_tokens"] for r in rows.values()) == n_tokens
    rmax = max(rows)
    assert rows[rmax]["r_star_scaled"] == 0  # no class above the top
    # pick any row with a successor class and check the GT identity
    r = next(r for r in sorted(rows) if r + 1 in rows)
    expect = round(
        LM_SCALE * (r + 1) * rows[r + 1]["n_types"] / rows[r]["n_types"]
    )
    assert rows[r]["r_star_scaled"] == expect
    out.unpersist()


def test_jl_audit_distortion_is_bounded_and_centered(spark):
    """The Rademacher projection preserves distance in expectation: the
    mean squared-distance ratio sits near 1 and every pair's ratio is
    positive with the K=8 concentration one expects at this dimension."""
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        emb_jl_projection_audit,
    )

    row = emb_jl_projection_audit(spark, SF001).collect()[0]
    assert row["n_pairs"] > 100
    assert 0.7 < row["mean_ratio"] < 1.3
    assert row["min_ratio_scaled"] > 0
    assert row["frac_within_25pct"] > 0.2


def test_repeat_epochs_budget_and_contiguity(spark):
    """Allocations are contiguous epochs >= 1, capped at EPOCH_MAX, total
    allocation does not exceed budget by more than one crossing slice,
    and every source gets at least one epoch (epoch-1 slices dominate
    the ranking until the budget is far larger than any source)."""
    from conduit_connector_s3_iceberg_spark.operators.corpus import (
        EPOCH_BUDGET_X,
        EPOCH_MAX,
        corpus_repeat_epochs,
    )

    out = corpus_repeat_epochs(spark, SF001).cache()
    rows = out.collect()
    assert rows, "planner produced no allocations"
    total_unique = sum(r["n_tokens"] for r in rows)
    budget = EPOCH_BUDGET_X * total_unique
    allocated = sum(r["tokens_allocated"] for r in rows)
    max_src = max(r["n_tokens"] for r in rows)
    assert allocated < budget + max_src  # crossing slice kept, never two
    for r in rows:
        assert 1 <= r["epochs"] <= EPOCH_MAX
        assert r["tokens_allocated"] == r["epochs"] * r["n_tokens"]
        # halving schedule: effective value of e epochs is sum n >> i
        expect = sum(r["n_tokens"] // (2**i) for i in range(r["epochs"]))
        assert r["effective_value"] == expect
    out.unpersist()


def test_cohort_ltv_monotone_and_dense(spark):
    """LTV per user is non-decreasing in offset within a cohort, the
    offset grid is dense 0..max, and cohort sizes match the retention
    matrix's."""
    from conduit_connector_s3_iceberg_spark.plans.events import (
        events_cohort_ltv,
        events_retention_cohorts,
    )

    rows = events_cohort_ltv(spark, SF001).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_start"], []).append(r)
    ret_sizes = {
        r["cohort_start"]: r["cohort_size"]
        for r in events_retention_cohorts(spark, SF001).collect()
    }
    for start, rs in by_cohort.items():
        rs.sort(key=lambda r: r["week_offset"])
        assert [r["week_offset"] for r in rs] == list(range(len(rs)))
        ltvs = [r["ltv_per_user"] for r in rs]
        assert all(b >= a - 1e-9 for a, b in zip(ltvs, ltvs[1:]))
        assert rs[0]["cohort_size"] == ret_sizes[start]
        for r in rs:
            assert r["revenue"] >= 0.0
