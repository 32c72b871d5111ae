"""Invariant tests for cdc_net_effect and lm_stupid_backoff (the
properties the oracle's value-hash alone doesn't state), on sf0.001."""

from __future__ import annotations

from pyspark.sql import functions as F

from conduit_connector_s3_iceberg_spark.operators.cdc_batch import (
    CUTOVER,
    cdc_net_effect,
)
from conduit_connector_s3_iceberg_spark.operators.lm import lm_stupid_backoff

SF = "/root/testdata/sf0.001"


def test_net_effect_covers_every_ops_key_once(spark):
    out = cdc_net_effect(spark, SF)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ops_keys = (
        ev.filter(F.col("ts") >= F.lit(CUTOVER).cast("timestamp"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert out.count() == ops_keys
    assert out.groupBy("user_id").count().filter("count > 1").count() == 0


def test_net_effect_op_classification(spark):
    rows = cdc_net_effect(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    base_keys = {
        r["user_id"]
        for r in ev.filter(F.col("ts") < F.lit(CUTOVER).cast("timestamp"))
        .select("user_id")
        .distinct()
        .collect()
    }
    seen = set()
    for r in rows:
        seen.add(r["net_op"])
        assert r["n_ops"] == r["n_upserts"] + r["n_deletes"]
        if r["net_op"] in ("delete", "none"):
            assert r["final_value"] is None
        else:
            assert r["final_value"] is not None
        if r["net_op"] in ("delete", "update"):
            assert r["user_id"] in base_keys
        if r["net_op"] in ("insert", "none"):
            assert r["user_id"] not in base_keys
    # the fixture must exercise at least the upsert paths
    assert "update" in seen


def test_stupid_backoff_scores_only_holdout_and_backs_off(spark):
    out = lm_stupid_backoff(spark, SF)
    assert out.filter(F.col("doc_id") % 2 == 0).count() == 0
    agg = out.agg(
        F.sum("n_backoff_bi").alias("bi"),
        F.sum("n_backoff_uni").alias("uni"),
        F.sum("n_oov").alias("oov"),
        F.sum("n_trigrams").alias("n"),
        F.min("mean_score").alias("mn"),
        F.max("mean_score").alias("mx"),
    ).first()
    # held-out scoring must hit lower-order branches somewhere
    assert agg["bi"] + agg["uni"] + agg["oov"] > 0
    assert agg["n"] > 0
    assert 0.0 <= agg["mn"] <= agg["mx"] <= 1.0


def test_stupid_backoff_score_bounded_by_branch_weights(spark):
    """Per-doc mean score can never exceed the trigram branch max (1.0) and
    a doc scored entirely through the unigram branch caps at 0.16."""
    rows = lm_stupid_backoff(spark, SF).collect()
    for r in rows:
        if r["n_backoff_bi"] + r["n_oov"] == 0 and r["n_backoff_uni"] == r["n_trigrams"]:
            assert r["mean_score"] <= 0.16 + 1e-9
