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
