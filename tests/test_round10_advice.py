"""Round-10 ADVICE fixes.

1. ``_round_half_away`` (similarity.py): decimal-string rounding — the
   additive floor(x+0.5) form misrounds ulp-boundary doubles; verified
   value-by-value against DuckDB's round() on a DOUBLE *parameter*
   (literals parse as DECIMAL and take a different code path).
2. ``events_rate_shift_test`` (timeseries.py): single-day observation
   window makes days_second = 0; both engines must yield NULL for
   rate_second/chi2 instead of DuckDB Inf vs Spark NULL diverging.
3. ``lm_interpolation_curve`` (lm.py): quantized mixture clamps to >= 1
   so hapax-probability underflow past ~2*LM_INTERP_SCALE bigram tokens
   never feeds bin(0) to the Mitchell log helper.
4. ``ParquetWarehouse.rollback`` marks restoration is covered in
   tests/test_round8_marks.py (test_rollback_restores_marks_as_of_...).
"""

from __future__ import annotations

import duckdb
import pytest

from conduit_connector_s3_iceberg_spark.operators.similarity import (
    _round_half_away,
)

# ulp-boundary and tie cases where floor(x+0.5) style rounding disagrees
# with the engines, plus plain cases
ROUND_CASES = [
    0.49999999999999994,  # x+0.5 == 1.0 in binary64; engines give 0
    -0.49999999999999994,
    0.5,
    -0.5,
    1.5,
    2.5,  # half-away, NOT banker's (Python round() would give 2)
    -2.5,
    0.4999999999999999,
    3.0,
    -3.0,
    0.0,
    1234567.5,
    -1234567.5,
    2251799813685248.5,  # 2^51 + 0.5 — representable half at scale
]


@pytest.mark.parametrize("x", ROUND_CASES)
def test_round_half_away_matches_duckdb_round(x):
    got = _round_half_away(x)
    # bind as a parameter: a SQL literal would parse as DECIMAL and
    # round in decimal arithmetic, which is not the DOUBLE path the
    # manifest-vs-audit comparison exercises
    want = duckdb.sql("SELECT round(?::DOUBLE)", params=[x]).fetchone()[0]
    assert got == int(want), (x, got, want)


def test_round_half_away_is_not_bankers():
    assert _round_half_away(2.5) == 3
    assert _round_half_away(-2.5) == -3


def _single_day_events(tmp_path, spark):
    """A one-day events slice: d0 == d1 == mid → days_second == 0."""
    import os

    sf_dir = str(tmp_path / "sf_oneday")
    os.makedirs(sf_dir, exist_ok=True)
    spark.createDataFrame(
        [
            (1, 101, "click", "2024-03-01 08:00:00", 1.0),
            (2, 102, "click", "2024-03-01 09:30:00", 2.0),
            (3, 101, "view", "2024-03-01 18:45:00", 3.0),
        ],
        "event_id bigint, user_id bigint, event_type string, "
        "ts string, value double",
    ).selectExpr(
        "event_id",
        "user_id",
        "event_type",
        "cast(ts as timestamp_ntz) as ts",
        "value",
    ).write.mode("overwrite").parquet(os.path.join(sf_dir, "events.parquet"))
    return sf_dir


def test_rate_shift_single_day_window_nulls_match_oracle(spark, tmp_path):
    """Degenerate window: both engines must produce NULL (not Inf/NaN)
    for rate_second and chi2, and still hash-match each other."""
    import os

    from conduit_connector_s3_iceberg_spark.plans.registry import load_all

    sf_dir = _single_day_events(tmp_path, spark)
    q = load_all()["events_rate_shift_test"]
    rows = q.build(spark, sf_dir).collect()
    assert rows, "one event type per row expected"
    for r in rows:
        assert r["days_second"] == 0
        assert r["rate_second"] is None
        assert r["chi2"] is None

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        + repr(os.path.join(sf_dir, "events.parquet", "*.parquet"))
        + ")"
    )
    oracle = con.execute(q.oracle).fetchall()
    got = sorted([tuple(r) for r in rows])
    want = sorted([tuple(r) for r in oracle])
    assert got == want


def test_lm_interp_mix_clamp_is_engine_identical():
    """The clamp expression itself: greatest(round(...), 1) in DuckDB ==
    the Spark twin for an underflowing hapax probability (p1 quantizes
    to 0 at lam=0 → mix would be 0 without the clamp)."""
    want = duckdb.sql(
        "SELECT GREATEST(CAST(round(0.0 * 0 + (1.0 - 0.0) * 0)"
        " AS BIGINT), 1)"
    ).fetchone()[0]
    assert want == 1
