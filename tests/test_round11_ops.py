"""Round-11 operator wave: seeded harmonic centrality, retrieval AP/RBO,
Mantel-Haenszel OR, Flesch readability."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_harmonic_seeded_bfs_invariants(spark):
    """Seeds at dist 0; every finite dist reachable via an edge from a
    node one hop closer (BFS correctness); harmonic = 1/dist; bipartite
    trade graph ⇒ customer nodes sit at odd distances from the supplier
    seed set."""
    from conduit_connector_s3_iceberg_spark.operators.graph import (
        PPR_SEED_MAX_KEY,
        graph_harmonic_seeded,
    )

    rows = graph_harmonic_seeded(spark, SF).collect()
    dist = {r["id"]: r["dist"] for r in rows}
    seeds = {f"s{k}" for k in range(PPR_SEED_MAX_KEY + 1)} & set(dist)
    assert seeds and all(dist[s] == 0 for s in seeds)
    for r in rows:
        if r["dist"] is None:
            assert r["harmonic"] == 0.0
        elif r["dist"] > 0:
            assert r["harmonic"] == 1.0 / r["dist"]
            # bipartite parity: c-nodes odd, s-nodes even
            assert r["dist"] % 2 == (1 if r["id"].startswith("c") else 0)
    # BFS triangle property on the undirected graph: along any edge the
    # dists differ by at most 1
    from conduit_connector_s3_iceberg_spark.operators.graph_state import (
        serve_edges,
    )

    for e in serve_edges(spark, SF).collect():
        dc, ds = dist.get(f"c{e['ck']}"), dist.get(f"s{e['sk']}")
        if dc is not None and ds is not None:
            assert abs(dc - ds) <= 1


def test_avg_precision_bounds_and_extremes(spark):
    from conduit_connector_s3_iceberg_spark.operators.retrieval import (
        RETR_K,
        retrieval_avg_precision,
    )

    rows = retrieval_avg_precision(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["avg_precision"] <= 1.0 + 1e-12, r
        assert 0 <= r["n_rel_at_k"] <= RETR_K
        assert r["n_rel_at_k"] <= r["n_rel"]
        if r["n_rel_at_k"] == 0:
            assert r["ap_num_scaled"] == 0


def test_rbo_bounds_and_self_identity(spark, tmp_path):
    """RBO in [0, truncated-mass]; two IDENTICAL rankings reach exactly
    the truncated weight mass (sum of all per-depth weights)."""
    from conduit_connector_s3_iceberg_spark.operators.retrieval import (
        _NDCG_SCALE,
        _RBO_SUFFIX,
        _RBO_W,
        retrieval_rbo,
    )

    # identical rankings: doc at rank r contributes SUFFIX[r], so the
    # attainable maximum is sum(SUFFIX) = (1-p)*sum_d p^(d-1) = 1 - p^K
    max_mass = sum(_RBO_SUFFIX) / _NDCG_SCALE
    rows = retrieval_rbo(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["rbo"] <= max_mass + 1e-12
    # suffix table consistency: suffix[m] = sum of weights from depth m+1
    assert _RBO_SUFFIX[0] == sum(_RBO_W)
    assert _RBO_SUFFIX[-1] == _RBO_W[-1]


def test_mh_odds_ratio_sane(spark):
    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        events_mh_odds_ratio,
    )

    [r] = events_mh_odds_ratio(spark, SF).collect()
    assert r["n_strata"] >= 1
    assert r["sum_ad_scaled"] >= 0 and r["sum_bc_scaled"] >= 0
    if r["mh_odds_ratio"] is not None:
        assert r["mh_odds_ratio"] > 0
        assert r["mh_odds_ratio"] == (
            r["sum_ad_scaled"] / r["sum_bc_scaled"]
        )


def test_flesch_counts_and_formula(spark):
    from conduit_connector_s3_iceberg_spark.operators.text import (
        text_flesch_readability,
    )

    rows = text_flesch_readability(spark, SF).collect()
    assert rows
    for r in rows[:50]:
        w, s, y = r["n_words"], r["n_sentences"], r["n_syllables"]
        assert w >= 1 and s >= 1 and y >= 0
        expect = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
        assert r["flesch"] == expect


def test_triplet_margin_ivf_subset_of_brute(spark):
    """The IVF-served margins are computed over a candidate SUBSET of the
    brute audit's, so per-probe cpos/cneg can only be <= the brute ones;
    at the per-label report level: probe counts can only shrink (probes
    may lose coverage in the probed cells), and both reports share the
    same label domain subset."""
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        emb_triplet_margin_audit,
        emb_triplet_margin_ivf,
    )

    brute = {
        r["label"]: r for r in emb_triplet_margin_audit(spark, SF).collect()
    }
    ivf = {r["label"]: r for r in emb_triplet_margin_ivf(spark, SF).collect()}
    assert ivf and set(ivf) <= set(brute)
    for lbl, r in ivf.items():
        assert 1 <= r["n_probes"] <= brute[lbl]["n_probes"]
        assert 0 <= r["violations"] <= r["n_probes"]


def test_audio_vad_segment_structure(spark):
    from conduit_connector_s3_iceberg_spark.operators.multimodal import (
        mm_audio_vad_segments,
    )

    rows = mm_audio_vad_segments(spark, SF).collect()
    assert rows
    saw_multi = False
    for r in rows:
        assert 0 <= r["n_voiced"] <= r["n_frames"]
        assert 0 <= r["n_segments"] <= r["n_voiced"]
        assert r["longest_segment"] <= r["n_voiced"]
        if r["n_segments"] > 0:
            assert r["longest_segment"] >= 1
            # pigeonhole: longest run >= ceil(voiced / segments)
            assert (
                r["longest_segment"]
                >= -(-r["n_voiced"] // r["n_segments"])
            )
        else:
            assert r["n_voiced"] == 0 and r["longest_segment"] == 0
        assert r["voiced_ratio"] == r["n_voiced"] / r["n_frames"]
        saw_multi = saw_multi or r["n_segments"] > 1
    assert saw_multi, "fixture should produce multi-segment clips"
