"""Round-12 advice fixes.

1. medium — duplicate okey rows WITHIN one delta batch must collapse
   before staging into the insert-only okc map (graph_state.py).
2. low — update-shaped order rows (same okey, changed ck) are DETECTED:
   raise on the stream path, degrade to rebuild on the file path.
3. low — BFS_ROUNDS is part of the graph-state key: changing the
   harmonic fixpoint constant yields a fresh key, never stale bytes.
4. low — events_mh_odds_ratio's stratum term is chained in DOUBLE, so
   large cells never overflow BIGINT (Spark would wrap silently while
   DuckDB errors — a cross-engine divergence).
5. low — graph_state_audit reads all artifacts through ONE pinned
   manifest (covered by the audit-consistency test here plus the
   registry sweeps; the pinning itself is read_artifact's contract).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conduit_connector_s3_iceberg_spark.operators import graph_state as gs
from conduit_connector_s3_iceberg_spark.state import read_manifest

from test_round11_graph_state import (  # noqa: F401 (fixture re-export)
    _move_parts,
    _scratch,
    _served,
    _stage_corpus,
    isolated_root,
)

SF = "/root/testdata/sf0.001"


def _okc_count(spark, sf_dir):
    return gs.serve_okc(spark, sf_dir).count()


def test_duplicate_okey_rows_within_batch_collapse(
    spark, tmp_path, isolated_root
):
    """A re-delivered row inside ONE delta batch must not inflate okc."""
    sf_dir, _, _ = _stage_corpus(spark, tmp_path)
    gs.ensure_graph_state(spark, sf_dir)
    root = gs.graph_state_path(sf_dir)
    before = _okc_count(spark, sf_dir)
    new_o = spark.createDataFrame(
        [(10_000_001, 7), (10_000_001, 7), (10_000_001, 7)],
        "okey bigint, ck bigint",
    )
    empty_l = spark.createDataFrame([], "okey bigint, sk bigint, pk bigint")
    gs.maintain_graph_delta(spark, new_o, empty_l, root)
    assert _okc_count(spark, sf_dir) == before + 1
    okc = gs.serve_okc(spark, sf_dir)
    assert okc.count() == okc.select("okey").distinct().count()


def test_update_shaped_row_within_batch_raises(
    spark, tmp_path, isolated_root
):
    sf_dir, _, _ = _stage_corpus(spark, tmp_path)
    gs.ensure_graph_state(spark, sf_dir)
    root = gs.graph_state_path(sf_dir)
    conflicted = spark.createDataFrame(
        [(10_000_002, 1), (10_000_002, 2)], "okey bigint, ck bigint"
    )
    empty_l = spark.createDataFrame([], "okey bigint, sk bigint, pk bigint")
    with pytest.raises(ValueError, match="update-shaped"):
        gs.maintain_graph_delta(spark, conflicted, empty_l, root)
    assert read_manifest(root)["gen"] == 0  # nothing committed


def test_update_shaped_row_vs_standing_raises(
    spark, tmp_path, isolated_root
):
    sf_dir, _, _ = _stage_corpus(spark, tmp_path)
    gs.ensure_graph_state(spark, sf_dir)
    root = gs.graph_state_path(sf_dir)
    existing = gs.serve_okc(spark, sf_dir).first()
    changed = spark.createDataFrame(
        [(existing["okey"], existing["ck"] + 1)], "okey bigint, ck bigint"
    )
    empty_l = spark.createDataFrame([], "okey bigint, sk bigint, pk bigint")
    with pytest.raises(ValueError, match="update-shaped"):
        gs.maintain_graph_delta(spark, changed, empty_l, root)
    assert read_manifest(root)["gen"] == 0


def test_update_shaped_file_append_degrades_to_rebuild(
    spark, tmp_path, isolated_root
):
    """File path: an appended orders file that CHANGES an existing
    order's ck degrades to a full rebuild (gen resets), reproducing
    exactly what the from-scratch oracles compute over the corpus."""
    sf_dir, _, _ = _stage_corpus(spark, tmp_path)
    gs.ensure_graph_state(spark, sf_dir)
    root = gs.graph_state_path(sf_dir)
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    ck_type = dict(orders.dtypes)["o_custkey"]
    changed = orders.limit(1).withColumn(
        "o_custkey", (F.col("o_custkey") + 1).cast(ck_type)
    )
    _move_parts(changed, f"{sf_dir}/orders.parquet", "upd")
    got = _served(spark, sf_dir)
    man = read_manifest(root)
    assert man["gen"] == 0, "ck-conflicting append must rebuild, not append"
    assert got == _scratch(spark, sf_dir)


def test_bfs_rounds_in_state_key(monkeypatch):
    from conduit_connector_s3_iceberg_spark.operators import graph

    k1 = gs.graph_state_path(SF)
    monkeypatch.setattr(graph, "BFS_ROUNDS", graph.BFS_ROUNDS + 1)
    k2 = gs.graph_state_path(SF)
    assert k1 != k2, "BFS_ROUNDS must be part of the hashed state key"


def test_mh_term_survives_large_cells(spark):
    """Cells of 3e7 wrapped the old BIGINT product (a*d_*1e6 ~ 9e20 >>
    2^63); the DOUBLE chain stays positive and finite, and matches the
    plain float computation to quantization."""
    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        MH_SCALE,
        _mh_term,
    )

    a = d_ = 30_000_000
    b = c = 1
    df = spark.createDataFrame(
        [(a, b, c, d_)], "a bigint, b bigint, c bigint, d_ bigint"
    )
    row = df.select(F.expr(_mh_term("a", "d_")).alias("t")).first()
    expected = round(float(a) * float(d_) * MH_SCALE / (a + b + c + d_))
    assert row["t"] == expected > 0


def test_audit_consistency_on_isolated_corpus(spark, tmp_path, isolated_root):
    """graph_state_audit (pinned-manifest read path) agrees with direct
    recomputation over the corpus."""
    from conduit_connector_s3_iceberg_spark.operators.graph import (
        graph_state_audit,
    )

    sf_dir, _, _ = _stage_corpus(spark, tmp_path)
    row = graph_state_audit(spark, sf_dir).first()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    und = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    assert row["n_und_edges"] == und.count()
    assert row["n_orders_mapped"] == orders.count()
    assert row["degree_mass"] == 2 * und.count()
