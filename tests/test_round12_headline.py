"""Round-12 verdict item #3: headline queries served from persisted state.

dedup_ngram_jaccard now reads the labels state's v4 pairs artifact
(n_common + jaccard computed at build/maintenance time); sim_ann_ivf
now probes the persisted cell-partitioned index. Both must be
bit-identical to the from-scratch formulations, including across an
O(delta) append for the pairs artifact.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from conduit_connector_s3_iceberg_spark.operators.dedup import (
    _capped_index,
    _jaccard_pairs_from_index,
    dedup_table_path,
    ngram_jaccard_pairs,
)
from conduit_connector_s3_iceberg_spark.state import read_manifest

SF001 = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _fresh(sf_dir):
    root = dedup_table_path(sf_dir)
    if os.path.exists(root):
        shutil.rmtree(root)
    return root


def _scratch_pairs(spark, corpus):
    # drop the build's tracked persisted index first: Spark's CacheManager
    # matches HadoopFsRelation plans by path, so a capped index persisted
    # over the PRE-APPEND corpus would silently hijack this fresh scan
    # (in the harness, the registry releases tracked caches at every
    # query start — this mirrors that)
    from conduit_connector_s3_iceberg_spark.plans.registry import (
        release_tracked_caches,
    )

    release_tracked_caches()
    spark.catalog.clearCache()
    docs = spark.read.parquet(corpus).select("doc_id", "text")
    idx, sizes = _capped_index(docs, materialize=False)
    return _jaccard_pairs_from_index(idx, sizes)


def test_ngram_pairs_served_equals_scratch(spark):
    _fresh(SF001)
    got = _rows(ngram_jaccard_pairs(spark, SF001))
    want = _rows(
        _scratch_pairs(spark, os.path.join(SF001, "documents.parquet"))
    )
    assert got == want, "served pairs artifact must equal scratch recompute"
    assert got, "fixture corpus must contain near-dup pairs"


def test_pairs_artifact_append_maintenance_scores_exact(spark, tmp_path):
    """After an O(delta) append (maintenance path, NOT rebuild), the
    served pairs — including the carried n_common/jaccard of untouched
    pairs and the recomputed scores of touched ones — equal a full
    from-scratch recompute over the appended corpus."""
    sf_dir = str(tmp_path / "sf")
    corpus = os.path.join(sf_dir, "documents.parquet")
    os.makedirs(corpus)
    base = spark.read.parquet(os.path.join(SF001, "documents.parquet"))
    base.filter(F.col("doc_id") % 4 != 0).toPandas().to_parquet(
        os.path.join(corpus, "a.parquet"), index=False
    )
    root = _fresh(sf_dir)
    ngram_jaccard_pairs(spark, sf_dir)  # build on the base slice
    assert read_manifest(root)["gen"] == 0

    base.filter(F.col("doc_id") % 4 == 0).toPandas().to_parquet(
        os.path.join(corpus, "b.parquet"), index=False
    )
    got = _rows(ngram_jaccard_pairs(spark, sf_dir))
    assert read_manifest(root)["gen"] == 1, "append must maintain, not rebuild"
    assert got == _rows(_scratch_pairs(spark, corpus))


def test_sim_ann_ivf_served_equals_inline(spark):
    """State-served sim_ann_ivf == the original inline formulation
    (corpus-wide distance-array assignment), bit for bit."""
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        _DISTS_SPARK,
        _SPARK_EMB_D,
        _spark_dot,
        _two_phase_topk,
        N_QUERIES,
        NPROBE,
        TOP_K,
        ann_index_path,
        sim_ann_ivf,
    )

    for mode in ("static",):
        root = ann_index_path(SF001, mode)
        if os.path.exists(root):
            shutil.rmtree(root)
    got = _rows(sim_ann_ivf(spark, SF001))

    base = spark.read.parquet(
        os.path.join(SF001, "embeddings.parquet")
    ).select("vec_id", F.expr(_SPARK_EMB_D).alias("emb"))
    with_dists = base.select(
        "vec_id",
        "emb",
        F.expr("sqrt(aggregate(emb, 0.0D, (acc, x) -> acc + x * x))").alias(
            "nrm"
        ),
        F.expr(_DISTS_SPARK).alias("dists"),
    )
    emb = with_dists.select(
        "vec_id",
        "emb",
        "nrm",
        F.expr(
            "cast(array_position(dists, array_min(dists)) as int)"
        ).alias("cell"),
        F.expr(
            f"transform(slice(array_sort(dists), 1, {NPROBE}),"
            " d -> cast(array_position(dists, d) as int))"
        ).alias("probes"),
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
        F.explode("probes").alias("probe_cell"),
    )
    cand = emb.join(
        F.broadcast(q),
        (F.col("cell") == F.col("probe_cell"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        "vec_id",
        (
            F.expr(_spark_dot("qemb", "emb")) / (F.col("qnrm") * F.col("nrm"))
        ).alias("cosine"),
    )
    want = _rows(_two_phase_topk(cand, TOP_K, base=base))
    assert got == want
