"""Round-7 second-wave operator tests: SemDeDup embedding pruning and the
CCNet-style per-language perplexity gate."""

from __future__ import annotations

from collections import defaultdict

SF001 = "/root/testdata/sf0.001"


def test_semdedup_partition_and_witness_consistency(spark):
    """Every vector appears exactly once; kept <=> zero dominating
    witnesses; every cluster keeps its most atypical member (the max-dist2
    vector is never dominated, so a cluster can never be emptied)."""
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        emb_semdedup,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = emb_semdedup(spark, SF001).collect()
    n_vecs = load_table(spark, SF001, "embeddings").count()
    assert len(rows) == n_vecs
    assert len({r.vec_id for r in rows}) == n_vecs

    by_cluster = defaultdict(list)
    for r in rows:
        assert (r.n_witnesses == 0) == bool(r.kept)
        by_cluster[r.cluster].append(r)
    for members in by_cluster.values():
        assert any(m.kept for m in members), "cluster fully pruned"


def test_semdedup_removed_have_closer_neighbor_above_tau(spark):
    """Spot-verify the dominance rule against a brute-force recompute of
    one cluster: a vector is removed iff some same-cluster vector above
    TAU cosine is strictly farther from the centroid (ties by vec_id)."""
    import math

    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        SEMDEDUP_TAU,
        emb_semdedup,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    out = {r.vec_id: r for r in emb_semdedup(spark, SF001).collect()}
    embs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, SF001, "embeddings").collect()
    }
    # largest cluster, recomputed members from the operator's own output
    clusters = defaultdict(list)
    for vid, r in out.items():
        clusters[r.cluster].append(vid)
    members = max(clusters.values(), key=len)

    cent = [
        sum(round(embs[v][i] * 1_000_000) for v in members)
        / len(members)
        / 1_000_000
        for i in range(64)
    ]
    d2 = {
        v: sum((embs[v][i] - cent[i]) ** 2 for i in range(64)) for v in members
    }
    nrm = {v: math.sqrt(sum(x * x for x in embs[v])) for v in members}
    for v in members:
        dominated = any(
            u != v
            and sum(embs[u][i] * embs[v][i] for i in range(64))
            / (nrm[u] * nrm[v])
            >= SEMDEDUP_TAU
            and (d2[u] > d2[v] or (d2[u] == d2[v] and u < v))
            for u in members
        )
        assert dominated == (not out[v].kept), f"vec {v}"


def test_perplexity_gate_bands_are_contiguous_thirds(spark):
    """Per language: band classes are contiguous in bucket order
    (head buckets > middle buckets > tail buckets) and respect the
    cum_start cut rule — docs in strictly-higher buckets number < n/3
    for a head band, in [n/3, 2n/3) for middle, >= 2n/3 for tail."""
    from conduit_connector_s3_iceberg_spark.operators.lm import (
        lm_perplexity_gate,
    )

    rows = lm_perplexity_gate(spark, SF001).collect()
    assert rows and len({r.doc_id for r in rows}) == len(rows)

    langs = defaultdict(list)
    for r in rows:
        langs[r.lang].append(r)
    for lang, rs in langs.items():
        n = len(rs)
        band_buckets = defaultdict(set)
        for r in rs:
            band_buckets[r.ppl_band].add(r.bucket)
        if "head" in band_buckets and "middle" in band_buckets:
            assert min(band_buckets["head"]) > max(band_buckets["middle"])
        if "middle" in band_buckets and "tail" in band_buckets:
            assert min(band_buckets["middle"]) > max(band_buckets["tail"])
        assert "head" in band_buckets, lang  # highest band is always head
        for r in rs:
            above = sum(1 for o in rs if o.bucket > r.bucket)
            if r.ppl_band == "head":
                assert 3 * above < n
            elif r.ppl_band == "middle":
                assert n <= 3 * above < 2 * n
            else:
                assert 3 * above >= 2 * n


def test_perplexity_gate_head_is_highest_fluency(spark):
    """Every head doc's bucket >= every tail doc's bucket within a
    language (head = low perplexity = high mean bigram probability)."""
    from conduit_connector_s3_iceberg_spark.operators.lm import (
        lm_perplexity_gate,
    )

    rows = lm_perplexity_gate(spark, SF001).collect()
    by_lang = defaultdict(lambda: {"head": [], "tail": []})
    for r in rows:
        if r.ppl_band in ("head", "tail"):
            by_lang[r.lang][r.ppl_band].append(r.bucket)
    for lang, d in by_lang.items():
        if d["head"] and d["tail"]:
            assert min(d["head"]) > max(d["tail"]), lang


def test_substring_spans_brute_force_equivalence(spark):
    """Windows recomputed brute-force in Python: per-doc duplicated
    positions, merged spans, and fractions must match the operator."""
    from collections import Counter

    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        SUB_K,
        dedup_substring_spans,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    out = {r.doc_id: r for r in dedup_substring_spans(spark, SF001).collect()}
    docs = {
        r.doc_id: r.text.strip().lower().split(" ")
        for r in load_table(spark, SF001, "documents").collect()
    }
    assert set(out) == set(docs)

    wins = Counter()
    per_doc = {}
    for did, t in docs.items():
        ws = [
            (g, tuple(t[g : g + SUB_K]))
            for g in range(0, max(len(t) - SUB_K + 1, 0))
        ]
        per_doc[did] = ws
        wins.update(w for _, w in ws)

    for did, t in docs.items():
        dup_pos = sorted(g for g, w in per_doc[did] if wins[w] > 1)
        spans = []
        for g in dup_pos:
            e = g + SUB_K - 1
            if spans and g <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], e))
            else:
                spans.append((g, e))
        r = out[did]
        assert r.n_tokens == len(t)
        assert r.n_dup_spans == len(spans), did
        assert r.dup_tokens == sum(e - s + 1 for s, e in spans), did
        assert r.longest_span == max(
            (e - s + 1 for s, e in spans), default=0
        ), did
        assert abs(r.dup_fraction - r.dup_tokens / r.n_tokens) < 1e-12


def test_substring_spans_bounds(spark):
    """Structural bounds: spans are at least SUB_K tokens, never exceed
    the document, and dup_tokens >= n_dup_spans * SUB_K."""
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        SUB_K,
        dedup_substring_spans,
    )

    for r in dedup_substring_spans(spark, SF001).collect():
        assert 0 <= r.dup_tokens <= r.n_tokens
        if r.n_dup_spans:
            assert r.longest_span >= SUB_K
            assert r.dup_tokens >= r.n_dup_spans * SUB_K
        else:
            assert r.dup_tokens == 0 and r.longest_span == 0


def _gate_reference(epochs, k, max_overlap):
    """Python reference for epoch-granular substring-gated admission:
    per epoch, exact in-batch keep-first, then every doc judged against
    the index AS OF the previous epoch; admitted docs' digests extend it."""
    index: set = set()
    admitted = []
    for batch in epochs:
        seen_fp = set()
        survivors = []
        for did, text in sorted(batch):
            fp = " ".join(text.strip().lower().split())
            if fp in seen_fp:
                continue
            seen_fp.add(fp)
            survivors.append((did, text))
        batch_new: set = set()
        for did, text in survivors:
            t = text.strip().lower().split(" ")
            wins = [
                tuple(t[g : g + k]) for g in range(max(len(t) - k + 1, 0))
            ]
            hits = sum(1 for w in wins if w in index)
            if not wins or hits <= max_overlap * len(wins):
                admitted.append(did)
                batch_new.update(wins)
        index |= batch_new
    return sorted(admitted)


def test_substring_gate_epochs_match_reference(spark, tmp_path):
    """Three hand-built epochs through apply_substring_gate_epoch: the
    admitted set equals the Python epoch-sequential reference — novel
    variants pass, heavy overlaps are rejected, rejected docs never
    extend the index, short docs pass freely."""
    from conduit_connector_s3_iceberg_spark.operators.dedup import SUB_K
    from conduit_connector_s3_iceberg_spark.streaming.dedup_stream import (
        apply_substring_gate_epoch,
    )
    from conduit_connector_s3_iceberg_spark.writer import ParquetWarehouse

    base = "a b c d e f g h"
    epochs = [
        [(1, base), (2, base), (3, "p q r s t u v w")],
        [(4, "a b c d e f x y"), (5, base + " z")],
        [(6, base + " z"), (7, "m n")],
    ]
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    for e, rows in enumerate(epochs):
        batch = spark.createDataFrame(rows, "doc_id long, text string")
        apply_substring_gate_epoch(wh, "ssx", "ssout", batch, e)

    got = sorted(r.doc_id for r in wh.read("ssout").collect())
    want = _gate_reference(epochs, SUB_K, 0.5)
    assert got == want
    # the reference must actually exercise both branches
    assert 4 in got and 7 in got and 5 not in got and 6 not in got


def test_substring_gate_replay_is_idempotent(spark, tmp_path):
    """Re-delivering an applied epoch must not re-admit or re-index."""
    from conduit_connector_s3_iceberg_spark.streaming.dedup_stream import (
        apply_substring_gate_epoch,
    )
    from conduit_connector_s3_iceberg_spark.writer import ParquetWarehouse

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    batch = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    apply_substring_gate_epoch(wh, "ssx", "ssout", batch, 0)
    n_out = wh.read("ssout").count()
    n_idx = wh.read("ssx").count()
    apply_substring_gate_epoch(wh, "ssx", "ssout", batch, 0)
    assert wh.read("ssout").count() == n_out
    assert wh.read("ssx").count() == n_idx


def test_substring_gate_stream_runs_end_to_end(spark, tmp_path):
    """The writeStream wrapper admits a clean ordered feed: every unique
    document of the sf0.001 corpus below the overlap cap is admitted and
    the digest index is queryable afterwards."""
    import os

    from conduit_connector_s3_iceberg_spark.streaming.dedup_stream import (
        maintain_substring_gate_stream,
    )
    from conduit_connector_s3_iceberg_spark.writer import ParquetWarehouse

    docs = (
        spark.read.parquet(os.path.join(SF001, "documents.parquet"))
        .select("doc_id", "text")
        .orderBy("doc_id")
        .toPandas()
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    n = len(docs)
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        p = feed / f"chunk{i}.parquet"
        docs.iloc[cuts[i] : cuts[i + 1]].to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    stream = (
        spark.readStream.schema(
            spark.read.parquet(str(feed)).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    maintain_substring_gate_stream(
        stream, wh, "ssx", "ssout", str(tmp_path / "ckpt")
    ).awaitTermination(180)

    admitted = wh.read("ssout").count()
    assert 0 < admitted <= n
    assert wh.read("ssx").count() > 0
