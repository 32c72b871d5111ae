"""Round-13 advice fixes.

1. Token-counts auto-compaction now follows the ANN index's one-cycle
   grace expiry (advice r12 #1): lock-free readers holding a
   pre-compaction manifest must survive the compaction that supersedes
   it — only generations already superseded by the PREVIOUS compaction
   are deleted.
2. ``ngram_jaccard_pairs`` dropped its dead ``materialize`` parameter
   (advice r12 #3) — the state-served path has nothing to cache.
"""

from __future__ import annotations

import inspect
import os

from pyspark.sql import functions as F

from conduit_connector_s3_iceberg_spark.operators import lm_state as ls
from conduit_connector_s3_iceberg_spark.state import (
    read_manifest,
    stamp_manifest,
)

SF001 = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _gen_dirs(root, kind):
    d = os.path.join(root, kind)
    if not os.path.isdir(d):
        return []
    return sorted(int(n[4:]) for n in os.listdir(d) if n.startswith("gen_"))


def test_token_counts_compaction_keeps_one_grace_cycle(spark, tmp_path):
    """Appends past the threshold compact, but the immediately-
    superseded generations survive one extra cycle: a reader that
    captured the manifest just before the compaction can still resolve
    every path it lists."""
    sf_dir = str(tmp_path / "sf")
    corpus = os.path.join(sf_dir, "documents.parquet")
    os.makedirs(corpus)
    base = spark.read.parquet(os.path.join(SF001, "documents.parquet"))
    base.filter(F.col("doc_id") < 20).toPandas().to_parquet(
        os.path.join(corpus, "a.parquet"), index=False
    )
    root = ls.token_counts_path(sf_dir)
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    ls.ensure_token_counts(spark, sf_dir)
    stamp_manifest(root, auto_compact_gens=2)

    pre_man = None
    n_appends = 6
    for i in range(n_appends):
        lo = 20 + 10 * i
        chunk = base.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 10)
        )
        man_before = read_manifest(root)
        if man_before["gen"] - man_before.get("base_gen", 0) + 1 == 2:
            # the NEXT append will trigger compaction — capture the
            # manifest a lock-free reader would be holding
            pre_man = man_before
        chunk.toPandas().to_parquet(
            os.path.join(corpus, f"d{i}.parquet"), index=False
        )
        ls.ensure_token_counts(spark, sf_dir)
        man = read_manifest(root)
        width = man["gen"] - man.get("base_gen", 0) + 1
        assert width <= 2, f"append {i}: width {width}"
        if pre_man is not None and man["base_gen"] > pre_man["gen"]:
            # compaction fired since we captured pre_man: every
            # generation pre_man reaches must still exist on disk
            for kind in ("uni", "bi"):
                for g in range(
                    pre_man.get("base_gen", 0), pre_man["gen"] + 1
                ):
                    path = os.path.join(root, kind, f"gen_{g}")
                    assert os.path.isdir(path), (
                        f"grace violated: {path} deleted while a "
                        f"pre-compaction manifest could still list it"
                    )
            pre_man = None

    # disk stays bounded (live window + one grace cycle), never the
    # full append history
    for kind in ("uni", "bi"):
        on_disk = _gen_dirs(root, kind)
        assert len(on_disk) < n_appends + 1, on_disk

    # content still exact after compaction cycles
    want = ls._uni_of(
        spark.read.parquet(corpus).select("doc_id", "text")
    )
    assert _rows(ls.serve_uni(spark, sf_dir)) == _rows(want)


def test_ngram_jaccard_pairs_signature_has_no_materialize():
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    params = inspect.signature(ngram_jaccard_pairs).parameters
    assert "materialize" not in params
