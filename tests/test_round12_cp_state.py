"""Round-12 verdict item #1: persisted customer–part co-purchase state.

The link-prediction trio (graph_link_jaccard / graph_resource_allocation
/ graph_adamic_adar) is served from two derived artifacts (cp_pairs,
cp_cdeg) refreshed from an appended cp_edges set. These tests verify the
artifacts against an INDEPENDENT from-scratch formulation (a plain
self-join, not the production local-explode), the O(delta) maintenance
path, cp-only refresh independence (cs fixpoints untouched when only
the co-purchase edge set grows), and the audit's cp invariants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conduit_connector_s3_iceberg_spark.operators import graph_state as gs
from conduit_connector_s3_iceberg_spark.operators.graph import (
    LINK_DEG_CAP,
    graph_link_jaccard,
)
from conduit_connector_s3_iceberg_spark.state import read_manifest

from test_round11_graph_state import (  # noqa: F401 (fixture re-export)
    _move_parts,
    _stage_corpus,
    isolated_root,
)


def _cp_scratch(spark, sf_dir):
    """Independent recompute: distinct cp edges, capped degrees, and the
    (c1, c2, sdeg, cnt) pair groups via a PLAIN SELF-JOIN (deliberately
    not the production per-part explode)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("okey"), F.col("o_custkey").alias("c")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("s")
    )
    cp = orders.join(li, "okey").select("c", "s").distinct()
    deg = cp.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("sdeg")
    )
    kept = cp.join(deg.filter(F.col("sdeg") <= LINK_DEG_CAP), "s")
    cdeg = kept.groupBy("c").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    a = kept.filter(F.col("sdeg") >= 2).select(
        F.col("c").alias("c1"), "s", "sdeg"
    )
    b = kept.filter(F.col("sdeg") >= 2).select(F.col("c").alias("c2"), "s")
    pairs = (
        a.join(b, "s")
        .filter(F.col("c1") < F.col("c2"))
        .groupBy("c1", "c2", "sdeg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    return cp, cdeg, pairs


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_build_cp_artifacts_match_independent_scratch(
    spark, tmp_path, isolated_root
):
    sf_dir, _, _ = _stage_corpus(spark, tmp_path)
    cp, cdeg, pairs = _cp_scratch(spark, sf_dir)
    assert _rows(gs.serve_cp_edges(spark, sf_dir).select("c", "s")) == _rows(
        cp
    )
    assert _rows(gs.serve_cp_cdeg(spark, sf_dir)) == _rows(cdeg)
    assert _rows(
        gs.serve_cp_pairs(spark, sf_dir).select("c1", "c2", "sdeg", "cnt")
    ) == _rows(pairs)


def test_jaccard_served_matches_selfjoin(spark, tmp_path, isolated_root):
    sf_dir, _, _ = _stage_corpus(spark, tmp_path)
    _, cdeg, pairs = _cp_scratch(spark, sf_dir)
    agg = pairs.groupBy("c1", "c2").agg(
        F.sum("cnt").cast("bigint").alias("cn")
    )
    expected = (
        agg.join(
            cdeg.select(F.col("c").alias("c1"), F.col("deg").alias("deg1")),
            "c1",
        )
        .join(
            cdeg.select(F.col("c").alias("c2"), F.col("deg").alias("deg2")),
            "c2",
        )
        .select(
            "c1",
            "c2",
            "cn",
            "deg1",
            "deg2",
            (
                F.col("cn").cast("double")
                / (F.col("deg1") + F.col("deg2") - F.col("cn"))
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "c1", "c2")
        .limit(100)
    )
    got = graph_link_jaccard(spark, sf_dir)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in expected.collect()
    ]


def test_append_refreshes_cp_artifacts(spark, tmp_path, isolated_root):
    sf_dir, d_orders, d_li = _stage_corpus(
        spark, tmp_path, "o_orderkey % 5 = 0"
    )
    gs.ensure_graph_state(spark, sf_dir)  # build on the base slice
    root = gs.graph_state_path(sf_dir)
    _move_parts(d_orders, f"{sf_dir}/orders.parquet", "d1")
    _move_parts(d_li, f"{sf_dir}/lineitem.parquet", "d1")
    got = _rows(
        gs.serve_cp_pairs(spark, sf_dir).select("c1", "c2", "sdeg", "cnt")
    )
    man = read_manifest(root)
    assert man["gen"] == 1, "append must maintain, not rebuild"
    assert man["cp_grew_gen"] == 1, "cp growth must be recorded"
    # round 13: the pair artifact is EXACTLY maintained by the touched-
    # part adjustment generation — fresh immediately, no refresh needed
    _, _, pairs = _cp_scratch(spark, sf_dir)
    assert got == _rows(pairs)
    # the top-K result tables are deferred: still at the build's
    # generation until a link query (or the cadence call) reads them
    assert man["cp_fix_gen"] == 0
    graph_link_jaccard(spark, sf_dir).collect()
    assert read_manifest(root)["cp_fix_gen"] == 1


def test_cp_only_growth_skips_cs_fixpoint_refresh(
    spark, tmp_path, isolated_root
):
    """A delta that adds a NEW co-purchase pair but NO new
    customer–supplier pair must refresh cp artifacts only."""
    sf_dir, _, _ = _stage_corpus(spark, tmp_path)
    gs.ensure_graph_state(spark, sf_dir)
    root = gs.graph_state_path(sf_dir)

    # pick an existing (ck, sk) edge, and a part this customer has
    # never bought: new order for ck with one lineitem (sk, new pk)
    edge = gs.serve_edges(spark, sf_dir).first()
    ck, sk = edge["ck"], edge["sk"]
    max_pk = gs.serve_cp_edges(spark, sf_dir).agg(F.max("s")).first()[0]
    new_pk = max_pk + 1
    d_orders = spark.createDataFrame(
        [(20_000_000, ck)], "okey bigint, ck bigint"
    )
    d_li = spark.createDataFrame(
        [(20_000_000, sk, new_pk)], "okey bigint, sk bigint, pk bigint"
    )
    gs.maintain_graph_delta(spark, d_orders, d_li, root)
    man = read_manifest(root)
    assert man["gen"] == 1
    assert man["edges_grew_gen"] == 0, "no new cs edge"
    assert man["cp_grew_gen"] == 1, "new cp edge recorded"
    # deferred refresh: a link query freshens cp_top only; the cs
    # fixpoints stay at gen 0 because the cs edge set never grew
    graph_link_jaccard(spark, sf_dir).collect()
    man = read_manifest(root)
    assert man["fix_gen"] == 0, "no new cs edge => no fixpoint refresh"
    assert man["cp_fix_gen"] == 1, "new cp edge => cp_top refresh on read"
    assert (
        gs.serve_cp_edges(spark, sf_dir)
        .filter((F.col("c") == ck) & (F.col("s") == new_pk))
        .count()
        == 1
    )


def test_audit_cp_invariants(spark, tmp_path, isolated_root):
    from conduit_connector_s3_iceberg_spark.operators.graph import (
        graph_state_audit,
    )

    sf_dir, _, _ = _stage_corpus(spark, tmp_path)
    row = graph_state_audit(spark, sf_dir).first()
    cp, cdeg, pairs = _cp_scratch(spark, sf_dir)
    assert row["n_cp_edges"] == cp.count()
    assert row["cp_degree_mass"] == cdeg.agg(F.sum("deg")).first()[0]
    assert row["cp_pair_mass"] == pairs.agg(F.sum("cnt")).first()[0]
    assert row["n_cp_pair_groups"] == pairs.count()
