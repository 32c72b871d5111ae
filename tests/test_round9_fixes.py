"""Round-9: regression tests for the r8 ADVICE items.

1. sample_decayed_admission's power-of-two gate must not wrap at shift
   counts >= 64 (Spark shiftright masks the count mod 64, Java semantics;
   the DuckDB oracle's ``>>`` saturates to 0) — events older than 64
   half-lives must be rejected, not admitted at full probability.
2. seed_ivf_centroids must fail loudly when the corpus lacks the seed
   vec_ids 0..K-1 instead of silently diverging from the oracle's cent0
   CTE via the static-constant fallback.
3. track_cache: persisted shared front ends registered by one registry
   query are released when the next registry query is built, bounding
   executor cache growth in long-lived sessions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conduit_connector_s3_iceberg_spark.operators.sampling import _U52
from conduit_connector_s3_iceberg_spark.operators.similarity import (
    N_CENTROIDS,
    seed_ivf_centroids,
)
from conduit_connector_s3_iceberg_spark.plans import registry


def _admit_expr():
    # the exact gate expression from sample_decayed_admission
    return F.expr(
        f"u < shiftright(cast({_U52} as bigint), cast(least(k, 63L) as int))"
    )


def test_decay_gate_saturates_past_64_half_lives(spark):
    """k >= 53 must admit nothing — including k = 64/65/128 where Spark's
    raw shiftright would wrap to shift-0 (full admission)."""
    rows = [(k, u) for k in (52, 53, 63, 64, 65, 128) for u in (0, 1, _U52 - 1)]
    df = spark.createDataFrame(rows, "k bigint, u bigint")
    got = {
        (r["k"], r["u"]): r["admit"]
        for r in df.select("k", "u", _admit_expr().alias("admit")).collect()
    }
    # k=52: threshold = 2^52 >> 52 = 1 -> only u=0 admitted
    assert got[(52, 0)] is True
    assert got[(52, 1)] is False
    # saturated region: nothing admitted, no wraparound at k >= 64
    for k in (53, 63, 64, 65, 128):
        for u in (0, 1, _U52 - 1):
            assert got[(k, u)] is False, (k, u)


def test_decay_gate_matches_oracle_saturating_shift(spark):
    """Bit-parity with DuckDB's saturating >> across the whole k range."""
    import duckdb

    rows = [(k, u) for k in range(0, 70) for u in (0, 1, 7, _U52 >> 1, _U52 - 1)]
    df = spark.createDataFrame(rows, "k bigint, u bigint")
    got = sorted(
        (r["k"], r["u"], r["admit"])
        for r in df.select("k", "u", _admit_expr().alias("admit")).collect()
    )
    con = duckdb.connect()
    want = sorted(
        (k, u, bool(con.execute(
            f"SELECT {u} < ({_U52} >> least({k}, 63))").fetchone()[0]))
        for k, u in rows
    )
    assert got == want


def test_seed_ivf_centroids_requires_contiguous_seed_ids(spark):
    """A corpus missing any of vec_ids 0..K-1 must be rejected at build
    time (the oracle's cent0 CTE would have fewer cells -> divergence)."""
    emb = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(3, N_CENTROIDS + 3)],
        "vec_id bigint, embedding array<float>",
    )
    with pytest.raises(ValueError, match="missing seed vec_ids"):
        seed_ivf_centroids(spark, emb)


def test_seed_ivf_centroids_accepts_full_seed_range(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 2.0, 3.0]) for i in range(N_CENTROIDS)],
        "vec_id bigint, embedding array<float>",
    )
    cents = seed_ivf_centroids(spark, emb)
    assert len(cents) == N_CENTROIDS
    assert cents[5][0] == 5.0  # data-point seed, not the static constant


def test_track_cache_released_on_next_registry_query(spark):
    registry.release_tracked_caches()  # clean slate
    df = spark.range(10).toDF("n")
    registry.track_cache(df)
    assert df.storageLevel.useMemory
    assert len(registry._TRACKED_CACHES) == 1
    # building ANY registry query releases previously tracked caches
    q = registry.load_all()["sample_decayed_admission"]
    q.build(spark, "/root/testdata/sf0.001")  # build only — no action needed
    assert not df.storageLevel.useMemory
    assert len(registry._TRACKED_CACHES) == 0


def test_release_tracked_caches_counts(spark):
    registry.release_tracked_caches()
    a, b = spark.range(5).toDF("a"), spark.range(6).toDF("b")
    registry.track_cache(a)
    registry.track_cache(b)
    assert registry.release_tracked_caches() == 2
    assert registry.release_tracked_caches() == 0
