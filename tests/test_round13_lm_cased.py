"""Round-13 verdict item #2: cased token-counts artifacts.

The counts state (v2) persists a CASED uni_c/bi_c pair next to the
lowercased artifacts — derived from ONE tokenize pass, because
space-splitting commutes with lower() — and the collocations / rarity /
heavy-hitters / tf-idf family now serves from them. These tests pin the
cased artifacts against inline derivations, the zero-corpus-scan warm
plan, O(delta) maintenance of all four artifacts, and the
cross-tokenizer audit invariant.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from conduit_connector_s3_iceberg_spark.operators import lm_state as ls
from conduit_connector_s3_iceberg_spark.state import read_manifest

SF001 = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _fresh_root(sf_dir):
    root = ls.token_counts_path(sf_dir)
    if os.path.exists(root):
        shutil.rmtree(root)
    return root


def test_cased_counts_match_inline_derivation(spark):
    _fresh_root(SF001)
    docs = spark.read.parquet(os.path.join(SF001, "documents.parquet"))
    assert _rows(ls.serve_uni_cased(spark, SF001)) == _rows(
        ls._uni_of(docs.select("doc_id", "text"), ls.TOKS_C_SPARK)
    )
    assert _rows(ls.serve_bi_cased(spark, SF001)) == _rows(
        ls._bi_of(docs.select("doc_id", "text"), ls.TOKS_C_SPARK)
    )


def test_lowercased_artifacts_are_exact_regroup_of_cased(spark):
    """The staged lowercased artifacts must equal BOTH the direct
    lowercased tokenization (what consumers' oracles assume) and the
    (doc_id, lower(w)) regroup of the cased artifacts (how they are
    derived) — pinning the commutation the v2 design rests on."""
    _fresh_root(SF001)
    docs = spark.read.parquet(os.path.join(SF001, "documents.parquet"))
    uni = ls.serve_uni(spark, SF001)
    assert _rows(uni) == _rows(ls._uni_of(docs.select("doc_id", "text")))
    regroup = (
        ls.serve_uni_cased(spark, SF001)
        .groupBy("doc_id", F.lower(F.col("w")).alias("w"))
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    assert _rows(uni) == _rows(regroup)


def test_append_maintains_all_four_artifacts(spark, tmp_path):
    sf_dir = str(tmp_path / "sf")
    corpus = os.path.join(sf_dir, "documents.parquet")
    os.makedirs(corpus)
    base = spark.read.parquet(os.path.join(SF001, "documents.parquet"))
    base.filter(F.col("doc_id") < 30).toPandas().to_parquet(
        os.path.join(corpus, "a.parquet"), index=False
    )
    root = _fresh_root(sf_dir)
    ls.ensure_token_counts(spark, sf_dir)
    base.filter(
        (F.col("doc_id") >= 30) & (F.col("doc_id") < 40)
    ).toPandas().to_parquet(os.path.join(corpus, "b.parquet"), index=False)
    got = ls.serve_bi_cased(spark, sf_dir)
    assert read_manifest(root)["gen"] == 1, "append must maintain"
    want = ls._bi_of(
        spark.read.parquet(corpus).select("doc_id", "text"), ls.TOKS_C_SPARK
    )
    assert _rows(got) == _rows(want)


def test_cased_consumers_read_only_state_files(spark):
    """Warm collocations/rarity/heavy-hitters plans read state parquet
    only — zero corpus text scans (tf-idf keeps its 1-row corpus count,
    so it is excluded)."""
    from conduit_connector_s3_iceberg_spark.operators.text import (
        text_collocations_pmi,
        text_heavy_hitters,
        text_rarity_score,
    )

    _fresh_root(SF001)
    root = ls.token_counts_path(SF001)
    ls.ensure_token_counts(spark, SF001)
    for q in (text_collocations_pmi, text_rarity_score, text_heavy_hitters):
        df = q(spark, SF001)
        # inputFiles() is unreliable once track_cache interposes an
        # InMemoryRelation, so assert on the executed plan's FileScan
        # locations instead
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "documents.parquet" not in plan, q.__name__
        assert "token_counts" in plan, q.__name__


def test_audit_pins_cross_tokenizer_invariants(spark):
    _fresh_root(SF001)
    row = ls.lm_counts_state_audit(spark, SF001).first()
    # casing cannot change the token mass
    assert row["n_tokens_cased"] == row["n_tokens"]
    # case folding can only merge vocab entries / bigram types
    assert row["n_vocab_cased"] >= row["n_vocab"]
    assert row["n_bigram_types_cased"] >= row["n_bigram_types"]


def test_oov_gate_serves_from_streamed_state(spark, tmp_path):
    """Round-13 item #4: the OOV admission gate served from a state
    maintained ENTIRELY by the streaming twin (with a checkpoint restart
    between epochs) equals the from-scratch formulation over the full
    corpus — the batch==stream discipline applied to the gate a
    streaming ingest pipeline actually runs."""
    from conduit_connector_s3_iceberg_spark.operators.lm_state import (
        lm_oov_rate,
    )
    from conduit_connector_s3_iceberg_spark.streaming.lm_stream import (
        TOKEN_STREAM_SCHEMA,
        maintain_token_counts_stream,
    )

    sf_dir = str(tmp_path / "sf")
    corpus = os.path.join(sf_dir, "documents.parquet")
    os.makedirs(corpus)
    base = spark.read.parquet(os.path.join(SF001, "documents.parquet"))
    base.filter(F.col("doc_id") % 3 == 0).toPandas().to_parquet(
        os.path.join(corpus, "a.parquet"), index=False
    )
    root = _fresh_root(sf_dir)
    ls.ensure_token_counts(spark, sf_dir)

    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    ckpt = str(tmp_path / "ckpt_tok")

    def run_epoch():
        q = maintain_token_counts_stream(
            spark.readStream.schema(TOKEN_STREAM_SCHEMA).parquet(
                str(src_dir)
            ),
            root,
            ckpt,
        )
        q.awaitTermination(180)

    for i, pred in enumerate(("doc_id % 3 = 1", "doc_id % 3 = 2")):
        base.filter(F.expr(pred)).select("doc_id", "text").toPandas(
        ).to_parquet(os.path.join(str(src_dir), f"e{i}.parquet"),
                     index=False)
        run_epoch()  # second call restarts from the checkpoint

    # stage the streamed docs as corpus files so the freshness check
    # sees the same snapshot the stream delivered
    base.filter(F.col("doc_id") % 3 != 0).toPandas().to_parquet(
        os.path.join(corpus, "b.parquet"), index=False
    )
    got = _rows(lm_oov_rate(spark, sf_dir))

    # from-scratch: vocab from even docs, OOV mass of odd docs
    uni = ls._uni_of(base.select("doc_id", "text"))
    vocab = (
        uni.filter(F.col("doc_id") % 2 == 0)
        .select("w")
        .distinct()
        .withColumn("in_vocab", F.lit(1))
    )
    want = _rows(
        uni.filter(F.col("doc_id") % 2 == 1)
        .join(vocab, "w", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), F.col("cnt")).otherwise(0)
            )
            .cast("bigint")
            .alias("oov_tokens"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "oov_tokens",
            (F.col("oov_tokens").cast("double") / F.col("n_tokens")).alias(
                "oov_rate"
            ),
        )
        .orderBy("doc_id")
    )
    assert got == want
