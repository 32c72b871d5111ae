"""Round-9: persisted shingle-count front end (r8 verdict item 6).

The tokenize→shingle→hash→count front end of the Jaccard family is now a
maintained state table (doc_id, shingle_h, cnt): built once per corpus,
appended O(delta) on corpus appends (counts are per-document — appends
only ADD rows), rebuilt on rewrite, auto-compacted. Consumers
(ngram_jaccard, weighted_jaccard, threshold_curve, prefix_filter,
containment, source_matrix; edit_verify via ngram) read the 3-column
state instead of re-deriving from raw text per query.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from conduit_connector_s3_iceberg_spark.operators.dedup import (
    _counts_of,
    ensure_shingle_counts,
    shingle_counts_path,
)
from conduit_connector_s3_iceberg_spark.state import read_manifest

SF001 = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_counts_match_inline_derivation(spark):
    root = shingle_counts_path(SF001)
    if os.path.exists(root):
        shutil.rmtree(root)
    got = ensure_shingle_counts(spark, SF001)
    docs = spark.read.parquet(os.path.join(SF001, "documents.parquet"))
    want = _counts_of(docs.select("doc_id", "text"))
    assert _rows(got) == _rows(want)
    # warm serve: same bytes, no new generation
    man1 = read_manifest(root)
    again = ensure_shingle_counts(spark, SF001)
    assert read_manifest(root) == man1
    assert _rows(again) == _rows(want)


def test_counts_append_is_o_delta_and_rewrite_rebuilds(spark, tmp_path):
    sf_dir = str(tmp_path / "sf")
    corpus = os.path.join(sf_dir, "documents.parquet")
    os.makedirs(corpus)
    base = spark.read.parquet(os.path.join(SF001, "documents.parquet"))
    pdf = base.filter(F.col("doc_id") < 30).toPandas()
    pdf.to_parquet(os.path.join(corpus, "a.parquet"), index=False)

    root = shingle_counts_path(sf_dir)
    if os.path.exists(root):
        shutil.rmtree(root)
    ensure_shingle_counts(spark, sf_dir)
    assert read_manifest(root)["gen"] == 0

    # append: new generation only, content equals full recompute
    pdf2 = base.filter(
        (F.col("doc_id") >= 30) & (F.col("doc_id") < 40)
    ).toPandas()
    pdf2.to_parquet(os.path.join(corpus, "b.parquet"), index=False)
    got = ensure_shingle_counts(spark, sf_dir)
    assert read_manifest(root)["gen"] == 1  # O(delta) append, not rebuild
    want = _counts_of(
        spark.read.parquet(corpus).select("doc_id", "text")
    )
    assert _rows(got) == _rows(want)

    # rewrite a file -> full rebuild (gen resets, content still exact)
    pdf.iloc[:10].to_parquet(os.path.join(corpus, "a.parquet"), index=False)
    got = ensure_shingle_counts(spark, sf_dir)
    assert read_manifest(root)["gen"] == 0
    want = _counts_of(
        spark.read.parquet(corpus).select("doc_id", "text")
    )
    assert _rows(got) == _rows(want)


def test_counts_consumers_no_corpus_scan_on_warm_path(spark):
    """The point of the state: a warm run must not read
    documents.parquet at all. Round 12 moved dedup_ngram_jaccard one
    level further up the state stack (it reads the labels state's v4
    PAIRS artifact — see test_round12_headline.py), so the
    shingle-counts warm-path witness here is dedup_threshold_curve,
    which still derives its candidate set from the persisted counts."""
    from conduit_connector_s3_iceberg_spark.plans.registry import load_all

    q = load_all()["dedup_threshold_curve"]
    q.build(spark, SF001).collect()  # warm the state
    df = q.build(spark, SF001)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    spark.catalog.clearCache()
    # the corpus TEXT is never re-read on the warm path: the only
    # documents.parquet scan allowed is the zero-column row-count probe
    # (ReadSchema: struct<>) — any scan carrying `text` re-derives the
    # front end and defeats the state
    for seg in plan.split("documents.parquet")[1:]:
        read_schema = seg.split("ReadSchema: ")[1].split("\n")[0]
        assert "text" not in read_schema, read_schema
    # served from the persisted state: plan strings hide the source
    # behind the persisted capped-index segment (InMemoryTableScan) and
    # truncate relation paths, so the witness is the served counts
    # frame itself — its only file inputs live under the state root
    served = ensure_shingle_counts(spark, SF001)
    root = shingle_counts_path(SF001)
    files = served.inputFiles()
    assert files and all(root in f for f in files), files

    # and the round-12 ngram path: warm inputs are the pairs artifact
    q2 = load_all()["dedup_ngram_jaccard"]
    df2 = q2.build(spark, SF001)
    files = df2.inputFiles()
    assert files and all("dedup_labels" in f for f in files), files


def test_maintain_counts_replay_is_idempotent(spark, tmp_path):
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        build_shingle_counts,
        maintain_shingle_counts,
    )

    def docs(ids):
        return spark.createDataFrame(
            [(i, f"alpha beta gamma delta tok{i} x{i} y{i}") for i in ids],
            "doc_id bigint, text string",
        )

    root = str(tmp_path / "counts")
    build_shingle_counts(spark, docs(range(10)), root)
    first = maintain_shingle_counts(spark, docs(range(10, 15)), root)
    n1 = first.count()
    replay = maintain_shingle_counts(spark, docs(range(10, 15)), root)
    assert replay.count() == n1  # re-delivered epoch adds nothing
    want = _counts_of(docs(range(15)))
    assert _rows(replay) == _rows(want)


def test_streaming_counts_equal_batch(spark, tmp_path):
    """Streaming maintenance (rate-limited file stream -> foreachBatch)
    converges to exactly the batch-built table over the same corpus."""
    import os

    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        build_shingle_counts,
    )
    from conduit_connector_s3_iceberg_spark.streaming.dedup_stream import (
        maintain_counts_stream,
    )

    src = str(tmp_path / "stream_src")
    os.makedirs(src)

    def docs(ids, tag):
        return spark.createDataFrame(
            [(i, f"one two three tok{i} {tag}{i}") for i in ids],
            "doc_id bigint, text string",
        )

    docs(range(8), "a").coalesce(1).write.mode("append").parquet(src)
    docs(range(8, 14), "b").coalesce(1).write.mode("append").parquet(src)

    root = str(tmp_path / "counts")
    build_shingle_counts(
        spark, spark.createDataFrame([], "doc_id bigint, text string"), root
    )
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = maintain_counts_stream(
        stream, root, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)

    from conduit_connector_s3_iceberg_spark.state import gen_paths

    man = read_manifest(root)
    got = _rows(
        spark.read.parquet(
            *gen_paths(root, "counts", man["gen"], man.get("base_gen", 0))
        )
    )
    want = _rows(_counts_of(spark.read.parquet(src).select("doc_id", "text")))
    assert got == want
