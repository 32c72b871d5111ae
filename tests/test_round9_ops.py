"""Round-9 operator semantics beyond the oracle harness."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.001"


def test_unimax_waterfilling_exercises_both_regimes(spark, monkeypatch):
    """The fixture's near-uniform sources never hit the epoch cap, so the
    oracle only checks the waterfilled regime; this pins the capped one:
    a tiny domain gets its full capped supply, big domains share the
    remaining budget at a common level, and the budget is exhausted."""
    from conduit_connector_s3_iceberg_spark.operators import corpus as C

    docs = spark.createDataFrame(
        [(i, "t " * 5, "tiny") for i in range(2)]
        + [(100 + i, "w " * 200, "biga") for i in range(30)]
        + [(500 + i, "v " * 200, "bigb") for i in range(30)],
        "doc_id bigint, text string, source string",
    ).select("doc_id", F.trim("text").alias("text"), "source")
    monkeypatch.setattr(
        "conduit_connector_s3_iceberg_spark.sources.tables.load_table",
        lambda spark_, sf_dir, name: docs,
    )
    monkeypatch.setattr(
        C, "load_table", lambda spark_, sf_dir, name: docs
    )
    rows = {
        r["source"]: r
        for r in C.mix_unimax_allocation(spark, "ignored").collect()
    }
    tiny, biga, bigb = rows["tiny"], rows["biga"], rows["bigb"]
    # tiny hits the cap: allocation == capped supply, epochs == cap
    assert tiny["allocation"] == tiny["supply_capped"]
    assert tiny["epochs"] == C.UNIMAX_EPOCH_CAP
    # the two big domains sit AT the water level (equal allocations)
    assert biga["allocation"] == bigb["allocation"] == biga["water_level"]
    assert biga["allocation"] < biga["supply_capped"]
    # budget exhausted exactly
    total_alloc = sum(r["allocation"] for r in rows.values())
    budget = C.UNIMAX_BUDGET_X * sum(r["tokens"] for r in rows.values())
    assert math.isclose(total_alloc, budget, rel_tol=1e-12)


def test_entropy_rate_bounds(spark):
    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        events_entropy_rate,
    )

    rows = events_entropy_rate(spark, SF001).collect()
    assert rows
    k = len(rows)
    rate = rows[0]["entropy_rate_bits"]
    assert all(abs(r["entropy_rate_bits"] - rate) < 1e-12 for r in rows)
    # 0 <= H(row) <= log2(k); rate is a pi-weighted average of rows
    for r in rows:
        assert -1e-6 <= r["h_row_bits"] <= math.log2(k) + 0.01
    assert 0 <= rate <= math.log2(k) + 0.01


def test_value_gini_range_and_uniform_zero(spark):
    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        events_value_gini,
    )

    for r in events_value_gini(spark, SF001).collect():
        if r["gini"] is not None:
            assert -1e-9 <= r["gini"] <= 1.0


def test_benford_shares_sum_to_one(spark):
    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        events_benford_audit,
    )

    rows = events_benford_audit(spark, SF001).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    assert math.isclose(sum(r["share"] for r in rows), 1.0, rel_tol=1e-9)
    assert math.isclose(sum(r["expected"] for r in rows), 1.0, rel_tol=1e-9)


def test_mmd_linear_is_zero_on_identical_groups(spark):
    """Two labels with identical embedding multisets -> mmd2 == 0 exactly
    (the statistic is built from scaled-integer sums, so 'identical
    distributions' really produces the integer zero)."""
    from conduit_connector_s3_iceberg_spark.operators import similarity as S

    emb = spark.createDataFrame(
        [(i, [float(i % 4), 1.0, -2.0, 0.5] * 16, 0) for i in range(8)]
        + [(100 + i, [float(i % 4), 1.0, -2.0, 0.5] * 16, 1) for i in range(8)]
        + [(200 + i, [9.0 + i, 0.0, 0.0, 0.0] * 16, 2) for i in range(4)],
        "vec_id bigint, embedding array<float>, label int",
    )
    import conduit_connector_s3_iceberg_spark.operators.similarity as sim

    orig = sim.load_table
    try:
        sim.load_table = lambda spark_, sf_dir, name: emb
        rows = {
            (r["label_a"], r["label_b"]): r["mmd2"]
            for r in S.emb_mmd_linear(spark, "ignored").collect()
        }
    finally:
        sim.load_table = orig
    assert rows[(0, 1)] == 0.0
    assert rows[(0, 2)] > 1.0
