"""Unit tests for the join-operator library (edge cases the oracle-checked
queries don't pin down) and the sliding window rollup."""

from __future__ import annotations

from pyspark.sql import functions as F

from conduit_connector_s3_iceberg_spark.operators.joins import asof_join, salted_join
from conduit_connector_s3_iceberg_spark.streaming.windows import sliding_rollup


def _probe_build(spark):
    probe = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (2, 15, "p3")],
        "k long, t long, tag string",
    )
    build = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 99, 990.0)],
        "k long, t long, v double",
    )
    return probe, build


def test_asof_join_strict_excludes_equal_timestamps(spark):
    probe, build = _probe_build(spark)
    got = {
        r["tag"]: r["asof_v"]
        for r in asof_join(probe, build, "k", "t", ["v"], strict=True).collect()
    }
    # p1 (t=10): build t=10 NOT visible under strict < → no match
    # p2 (t=20): latest build at t=15 → 150.0; p3 (t=15): build t=99 is later → None
    assert got == {"p1": None, "p2": 150.0, "p3": None}


def test_asof_join_inclusive_matches_equal_timestamps(spark):
    probe, build = _probe_build(spark)
    got = {
        r["tag"]: r["asof_v"]
        for r in asof_join(probe, build, "k", "t", ["v"], strict=False).collect()
    }
    assert got == {"p1": 100.0, "p2": 150.0, "p3": None}


def test_asof_join_carries_multiple_build_columns(spark):
    probe, build = _probe_build(spark)
    row = (
        asof_join(probe, build, "k", "t", ["t", "v"], strict=True)
        .filter(F.col("tag") == "p2")
        .collect()[0]
    )
    assert (row["asof_t"], row["asof_v"]) == (15, 150.0)


def test_salted_join_equals_plain_join(spark):
    big = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("payload")
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(7)], "k long, name string"
    )
    plain = {
        (r["payload"], r["name"])
        for r in big.join(small, "k").select("payload", "name").collect()
    }
    salted = {
        (r["payload"], r["name"])
        for r in salted_join(big, small, "k", n_salts=4, scatter_col="payload")
        .select("payload", "name")
        .collect()
    }
    assert salted == plain and len(salted) == 1000


def test_sliding_rollup_overlapping_windows(spark):
    events = spark.createDataFrame(
        [(1, "2024-01-01 10:20:00", "click", 1.0, 1)],
        "user_id long, ts_s string, event_type string, value double, event_id long",
    ).select(
        "user_id", F.to_timestamp("ts_s").alias("ts"), "event_type", "value", "event_id"
    )
    rows = sliding_rollup(events, window="1 hour", slide="15 minutes").collect()
    # one event lands in 60/15 = 4 overlapping windows
    assert len(rows) == 4
    assert all(r["n_events"] == 1 for r in rows)
    starts = sorted(str(r["window_start"]) for r in rows)
    assert starts[0] == "2024-01-01 09:30:00" and starts[-1] == "2024-01-01 10:15:00"


# --- corpus operators (pack_sequences / dedup_source_matrix invariants) ---

SF001 = "/root/testdata/sf0.001"


def test_pack_sequences_invariants(spark):
    from conduit_connector_s3_iceberg_spark.operators.corpus import (
        CHUNK_TOKENS,
        pack_sequences,
    )

    rows = pack_sequences(spark, SF001).collect()
    # every document is packed exactly once
    assert len({r.doc_id for r in rows}) == len(rows)
    by_shard: dict[tuple, list] = {}
    for r in rows:
        assert r.shard == r.doc_id % 16
        assert r.chunk_key == f"{r.lang}-{r.shard}-{r.chunk_no}"
        assert r.chunk_no == r.start_offset // CHUNK_TOKENS
        by_shard.setdefault((r.lang, r.shard), []).append(r)
    # offsets are contiguous in doc_id order within each (lang, shard):
    # each doc starts where the previous one ended — no gaps, no overlap
    for group in by_shard.values():
        group.sort(key=lambda r: r.doc_id)
        expect = 0
        for r in group:
            assert r.start_offset == expect
            expect += r.n_tokens


def test_source_matrix_consistent_with_pair_list(spark):
    from conduit_connector_s3_iceberg_spark.operators.corpus import (
        dedup_source_matrix,
    )
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        dedup_ngram_jaccard,
    )

    n_pairs = dedup_ngram_jaccard(spark, SF001).count()
    matrix = dedup_source_matrix(spark, SF001).collect()
    # the matrix is a lossless rollup: per-cell counts sum to the pair count
    assert sum(r.n_pairs for r in matrix) == n_pairs
    assert all(r.max_jaccard >= 0.3 for r in matrix)


def test_text_normalize_is_idempotent(spark):
    from conduit_connector_s3_iceberg_spark.operators.text import text_normalize

    once = {r.doc_id: r.norm_text for r in text_normalize(spark, SF001).collect()}
    # re-normalizing the normalized text must be a fixpoint
    df = spark.createDataFrame(
        [(k, v) for k, v in once.items()], "doc_id long, text string"
    )
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), "[0-9]+", "<num>"),
        " +",
        " ",
    )
    twice = {r.doc_id: r.n for r in df.select("doc_id", norm.alias("n")).collect()}
    assert twice == once


# --- sketch aggregations (HLL distinct counts, count-min frequencies) -----


def test_hll_sketches_accurate_and_reaggregable(spark):
    from conduit_connector_s3_iceberg_spark.operators.sketches import (
        distinct_sketches,
        union_rollup,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    ev = load_table(spark, SF001, "events")
    per_type = distinct_sketches(ev, ["event_type"], "user_id")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in per_type.collect():
        assert abs(r.approx_distinct - exact[r.event_type]) <= max(
            2, 0.05 * exact[r.event_type]
        )
    # the scale property: union of per-group sketches answers the GLOBAL
    # distinct without rescanning the input
    global_est = union_rollup(per_type, []).collect()[0].approx_distinct
    global_exact = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    assert abs(global_est - global_exact) <= max(2, 0.05 * global_exact)


def test_count_min_sketch_deterministic(spark):
    from conduit_connector_s3_iceberg_spark.operators.sketches import freq_sketch
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    ev = load_table(spark, SF001, "events")
    s1 = freq_sketch(ev, "event_type")
    s2 = freq_sketch(ev.repartition(7), "event_type")
    # additive merge → identical bytes regardless of partitioning
    assert s1 == s2 and len(s1) > 0


def test_cluster_representatives_cover_corpus_and_pick_best(spark):
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        dedup_cluster_labels,
        dedup_cluster_representatives,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    reps = dedup_cluster_representatives(spark, SF001).collect()
    labels = {r["doc_id"]: r["cluster_id"] for r in dedup_cluster_labels(spark, SF001).collect()}
    chars = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, SF001, "documents").select("doc_id", "n_chars").collect()
    }
    # every doc is spoken for exactly once
    assert sum(r["n_members"] for r in reps) == len(labels)
    assert len({r["cluster_id"] for r in reps}) == len(reps)
    # the representative is its cluster's best (n_chars DESC, doc_id ASC)
    for r in reps:
        members = [d for d, c in labels.items() if c == r["cluster_id"]]
        best = max(members, key=lambda d: (chars[d], -d))
        assert r["rep_doc_id"] == best and r["rep_chars"] == chars[best]


def test_star_contraction_converges_on_deep_chain(spark):
    """A path graph deeper than any propagation round budget: star
    contraction's O(log n) alternations must label the whole chain with
    its minimum, where min-label propagation would need depth rounds
    (r3 verdict item — diameter-independent connected components)."""
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        star_contraction_components,
    )

    depth = 100  # diameter 99 >> min_label_components' 32-round budget
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(depth - 1)], "a long, b long"
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in star_contraction_components(chain).collect()
    }
    assert got == {i: 0 for i in range(depth)}


def test_star_contraction_matches_min_label_on_random_graph(spark):
    """Both CC engines agree exactly on an arbitrary multi-component
    graph (same (node → component-min) labeling)."""
    import random

    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        min_label_components,
        star_contraction_components,
    )

    rng = random.Random(42)
    edges = [
        (a, b)
        for a, b in (
            (rng.randrange(120), rng.randrange(120)) for _ in range(150)
        )
        if a != b  # self-loops carry no connectivity; engines differ on them
    ]
    df = spark.createDataFrame(edges, "a long, b long")
    star = {
        r["node"]: r["cluster_id"]
        for r in star_contraction_components(df).collect()
    }
    prop = {
        r["node"]: r["cluster_id"]
        for r in min_label_components(df).collect()
    }
    # min_label drops self-loop-only nodes differently: compare shared keys
    assert star == prop and len(star) > 50


def test_quality_weighted_sample_tilts_toward_quality(spark):
    from conduit_connector_s3_iceberg_spark.operators.sampling import (
        sample_quality_weighted,
    )
    from conduit_connector_s3_iceberg_spark.operators.text import quality_col, _docs

    kept = sample_quality_weighted(spark, SF001)
    all_q = _docs(spark, SF001).select(quality_col().alias("q"))
    n_all, mean_all = all_q.count(), all_q.agg(F.avg("q")).first()[0]
    n_kept, mean_kept = (
        kept.count(),
        kept.agg(F.avg("quality")).first()[0],
    )
    # acceptance rate tracks mean quality (binomial noise at n=50 is wide)
    assert abs(n_kept / n_all - mean_all) < 0.25
    # and the sample is quality-tilted
    assert mean_kept >= mean_all


def test_vocab_coverage_curve_is_consistent(spark):
    from conduit_connector_s3_iceberg_spark.operators.text import (
        VOCAB_K,
        text_vocab_coverage,
        _docs,
        _tokens,
    )

    rows = sorted(
        text_vocab_coverage(spark, SF001).collect(), key=lambda r: r["rank"]
    )
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= VOCAB_K
    # counts non-increasing in rank order; running sum and coverage consistent
    run = 0
    total = _docs(spark, SF001).select(
        F.explode(_tokens()).alias("w")
    ).filter(F.col("w") != "").count()
    for prev, cur in zip(rows, rows[1:]):
        # rank order = n_uses DESC, word ASC
        assert prev["n_uses"] > cur["n_uses"] or (
            prev["n_uses"] == cur["n_uses"] and prev["word"] < cur["word"]
        )
    for r in rows:
        run += r["n_uses"]
        assert r["cum_uses"] == run
        assert abs(r["coverage"] - run / total) < 1e-12
    assert rows[-1]["coverage"] <= 1.0


def test_length_percentile_gate_keeps_middle_band(spark):
    from conduit_connector_s3_iceberg_spark.operators.text import (
        LEN_PCT_HIGH,
        LEN_PCT_LOW,
        text_length_percentile_gate,
        _docs,
    )

    kept = text_length_percentile_gate(spark, SF001)
    assert kept.filter(
        (F.col("pct") <= LEN_PCT_LOW) | (F.col("pct") > LEN_PCT_HIGH)
    ).count() == 0
    # per-language keep fraction is about the band width
    per_lang = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {
        r["lang"]: r["n"]
        for r in _docs(spark, SF001).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in per_lang.items():
        frac = n / totals[lang]
        assert 0.6 <= frac <= 1.0  # ties can push past 0.9 at tiny n


def test_shard_manifest_partitions_whole_corpus(spark):
    from conduit_connector_s3_iceberg_spark.operators.corpus import (
        corpus_shard_manifest,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = corpus_shard_manifest(spark, SF001).collect()
    docs = load_table(spark, SF001, "documents")
    n_docs, total_chars = docs.count(), docs.agg(F.sum("n_chars")).first()[0]
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["total_chars"] for r in rows) == total_chars
    assert all(r["shard"] in "0123456789abcdef" for r in rows)
    assert all(len(r["digest_lo"]) == 32 and r["digest_lo"] <= r["digest_hi"] for r in rows)


def test_ann_recall_against_bruteforce(spark):
    """The ANN operators must be *good*, not merely deterministic: recall@10
    vs the exact brute-force baseline. IVF (cluster-structured data, nprobe
    2/16) is exact on this corpus; banded LSH (16 tables x 4 sign bits)
    measures ~0.88 mean recall — the single-table 8-bit signature it
    replaced measured 0.0 (neighbors at cosine ~0.3-0.4 collide a k-bit
    signature with prob ~0.6^k; see the module comment's k/L tradeoff)."""
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        sim_ann_ivf,
        sim_ann_lsh,
        sim_topk_bruteforce,
    )

    sf = "/root/testdata/sf0.01"
    exact: dict[int, set[int]] = {}
    for r in sim_topk_bruteforce(spark, sf).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recalls(fn):
        got: dict[int, set[int]] = {}
        for r in fn(spark, sf).collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return [len(got.get(q, set()) & e) / len(e) for q, e in exact.items()]

    ivf = recalls(sim_ann_ivf)
    assert min(ivf) == 1.0, f"IVF recall dropped: {ivf}"
    lsh = recalls(sim_ann_lsh)
    assert sum(lsh) / len(lsh) >= 0.7 and min(lsh) >= 0.5, f"LSH recall: {lsh}"


def test_length_gate_approx_matches_exact(spark):
    from conduit_connector_s3_iceberg_spark.operators.text import (
        _docs,
        length_gate_by_approx_thresholds,
        text_length_percentile_gate,
    )

    sf = "/root/testdata/sf0.01"
    exact = {r["doc_id"] for r in text_length_percentile_gate(spark, sf).collect()}
    approx = {r["doc_id"] for r in length_gate_by_approx_thresholds(_docs(spark, sf)).collect()}
    cuts = {
        r["lang"]: (r["lo"], r["hi"])
        for r in _docs(spark, sf)
        .groupBy("lang")
        .agg(F.expr("approx_percentile(n_chars, array(0.05, 0.95), 10000)").alias("c"))
        .select("lang", F.col("c")[0].alias("lo"), F.col("c")[1].alias("hi"))
        .collect()
    }
    docs = {
        r["doc_id"]: (r["lang"], r["n_chars"])
        for r in _docs(spark, sf).select("doc_id", "lang", "n_chars").collect()
    }
    # approx_percentile is exact below 10k rows/group, so the ONLY allowed
    # disagreements are boundary ties: rows whose n_chars equals one of
    # their language's two cut values (cume_dist keeps/drops tie groups as
    # a unit; the value cut drops/keeps the cut value itself)
    for d in exact ^ approx:
        lang, n_chars = docs[d]
        assert n_chars in cuts[lang], (d, lang, n_chars, cuts[lang])
    assert len(exact ^ approx) <= 0.05 * len(docs)


def test_span_dedup_coverage_consistent_with_hot_spans(spark):
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        dedup_span_coverage,
        dedup_span_hot,
    )

    cov = dedup_span_coverage(spark, SF001).collect()
    hot = dedup_span_hot(spark, SF001).collect()
    assert all(0 <= r["n_dup_spans"] <= r["n_spans"] for r in cov)
    assert all(0.0 <= r["dup_ratio"] <= 1.0 for r in cov)
    assert all(r["n_docs"] >= 2 for r in hot)
    # every occurrence of a hot span lands in exactly one document's
    # n_dup_spans count, so the two rollups must total identically
    assert sum(r["n_dup_spans"] for r in cov) == sum(r["n_occurrences"] for r in hot)


def test_kmeans_assign_invariants(spark):
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        KMEANS_K,
        emb_kmeans_assign,
    )

    rows = emb_kmeans_assign(spark, SF001).collect()
    assert all(0 <= r["cluster0"] < KMEANS_K for r in rows)
    assert all(0 <= r["cluster1"] < KMEANS_K for r in rows)
    # a seed point is its own iteration-0 centroid (distance exactly 0)
    assert all(r["cluster0"] == r["vec_id"] for r in rows if r["vec_id"] < KMEANS_K)


def test_fake_codec_decode_resize_roundtrip():
    import numpy as np

    from conduit_connector_s3_iceberg_spark.operators.multimodal import (
        decode_image,
        resize_image,
    )

    payload = b"hello world, this is a fake image payload"
    img = decode_image(payload)
    assert img.dtype == np.uint8 and img.ndim == 2
    h, w = img.shape
    assert 4 <= h <= 15 and 4 <= w <= 15
    # deterministic: same payload, same pixels
    assert np.array_equal(img, decode_image(payload))
    # resize: header carries the target shape, body is H*W pixels
    out = resize_image(payload, width=6, height=9)
    assert out[0] == 9 and out[1] == 6 and len(out) == 2 + 9 * 6
    # identity resize preserves the pixel block exactly
    same = resize_image(payload, width=w, height=h)
    assert same[2:] == img.tobytes()


def test_pca_power_invariants(spark):
    import math

    from conduit_connector_s3_iceberg_spark.operators.similarity import emb_pca_power

    rows = {r["pos"]: r for r in emb_pca_power(spark, SF001).collect()}
    assert sorted(rows) == list(range(64))
    # v2_unit is unit-norm by construction
    assert math.isclose(
        sum(r["v2_unit"] ** 2 for r in rows.values()), 1.0, rel_tol=1e-9
    )
    # G is PSD, so <v1, v2> = v1' G v1 >= 0
    assert sum(r["v1"] * r["v2"] for r in rows.values()) >= 0.0


def test_fuzzy_linkage_hot_prefix_block_is_salted_not_dropped(spark):
    """A pathological hot blocking key (boilerplate header shared by many
    rows) must NOT go quadratic — but it must also keep finding pairs:
    oversized blocks are round-robin salted into cap-sized sub-blocks
    (pairs within a salt only), bounding candidates at n*cap/2 per block
    while retaining recall where fuzzy duplicates concentrate (r3
    verdict: salt, don't drop)."""
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        FUZZY_BLOCK_CAP,
        fuzzy_blocked_pairs,
    )

    n_hot = 200
    hot = [(i, "BOILERPLATE!", f"BOILERPLATE! row {i:04d}") for i in range(n_hot)]
    cold = [
        (1000 + i, f"unique-{i:04d}-", f"unique-{i:04d}- body text A")
        for i in range(5)
    ] + [
        (2000 + i, f"unique-{i:04d}-", f"unique-{i:04d}- body text B")
        for i in range(5)
    ]
    b = spark.createDataFrame(
        hot + cold, "doc_id long, blk string, pfx string"
    )
    got = fuzzy_blocked_pairs(b, max_dist=30).collect()
    assert n_hot > FUZZY_BLOCK_CAP
    # the hot block is split into ceil(200/64)=4 round-robin salts of 50
    # rows each: every near-identical pfx pair inside a salt is FOUND
    # (4 * C(50,2) = 4900 — recall retained, unlike the old drop policy)
    n_salts = -(-n_hot // FUZZY_BLOCK_CAP)
    per_salt = n_hot // n_salts
    hot_pairs = [r for r in got if r["doc_a"] < 1000]
    assert len(hot_pairs) == n_salts * per_salt * (per_salt - 1) // 2
    # ... while staying bounded: never the quadratic C(200,2) = 19900
    assert len(hot_pairs) <= n_hot * FUZZY_BLOCK_CAP // 2
    # the five 2-row cold blocks still contribute exactly one pair each
    assert len(got) - len(hot_pairs) == 5
    # with the cap lifted the same frame explodes quadratically
    uncapped = fuzzy_blocked_pairs(b, max_dist=30, cap=10_000).count()
    assert uncapped == 5 + n_hot * (n_hot - 1) // 2


def _blob_frame(spark):
    """Three well-separated blobs in 4-d; vec_ids 0/1/2 land in distinct
    blobs so the lowest-id seeding starts one centroid per blob."""
    import math

    centers = [(10.0, 0.0, 0.0, 0.0), (0.0, 10.0, 0.0, 0.0), (0.0, 0.0, 10.0, 0.0)]
    rows = []
    for i in range(60):
        blob = i % 3
        # deterministic small perturbation, no RNG
        eps = [0.1 * math.sin(i * 7 + d) for d in range(4)]
        rows.append((i, [c + e for c, e in zip(centers[blob], eps)]))
    return spark.createDataFrame(rows, "vec_id long, emb array<double>")


def test_kmeans_fit_converges_and_separates_blobs(spark):
    from conduit_connector_s3_iceberg_spark.operators.similarity import kmeans_fit

    emb = _blob_frame(spark)
    cents, assigns, rounds = kmeans_fit(emb, k=3, max_rounds=10)
    labels = {r["vec_id"]: r["cluster"] for r in assigns.collect()}
    # converged before the cap, and each blob maps to exactly one cluster
    assert rounds < 10
    for blob in range(3):
        blob_labels = {labels[i] for i in range(60) if i % 3 == blob}
        assert len(blob_labels) == 1, (blob, blob_labels)
    assert len({labels[i] for i in range(3)}) == 3
    # centroids are near the true centers (well within the perturbation)
    got = {r["cid"]: r["c"] for r in cents.collect()}
    assert len(got) == 3
    for c in got.values():
        assert max(abs(x) for x in c) > 9.0


def test_ivf_search_trained_matches_bruteforce_in_blob(spark):
    import math

    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        ivf_search_trained,
        kmeans_fit,
    )

    emb = _blob_frame(spark)
    cents, _, _ = kmeans_fit(emb, k=3, max_rounds=10)
    queries = emb.filter(F.col("vec_id") < 3)
    got = ivf_search_trained(emb, cents, queries, k=5, nprobe=1)
    rows = got.collect()
    assert len(rows) == 15  # 3 queries x top-5

    # python-side brute force: with nprobe=1 on separated blobs, IVF top-5
    # must equal the exact top-5 (all true neighbors live in the own blob)
    vecs = {r["vec_id"]: r["emb"] for r in emb.collect()}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    for qid in range(3):
        expect = sorted(
            ((cos(vecs[qid], v), -vid) for vid, v in vecs.items() if vid != qid),
            reverse=True,
        )[:5]
        expect_ids = [-t[1] for t in expect]
        got_ids = [
            r["vec_id"]
            for r in sorted(
                (r for r in rows if r["query_id"] == qid),
                key=lambda r: r["rank"],
            )
        ]
        assert got_ids == expect_ids, (qid, got_ids, expect_ids)


def test_pq_fit_trained_codebooks_beat_seeded(spark):
    """Trained PQ codebooks must reconstruct strictly better (lower total
    squared error) than the lowest-vec_id seeded codebook on clustered
    data — the reason production PQ trains with k-means at all."""
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        pq_encode,
        pq_fit,
    )

    emb = _blob_frame(spark)  # 4-dim, 3 blobs -> test geometry m=2, subdim=2
    # seeded codebook with matching geometry (k=3, from vec_id < 3) — the
    # same shape _pq_codebook builds for the registered 8x8x16 queries
    seeded = (
        emb.filter(F.col("vec_id") < 3)
        .select(
            F.col("vec_id").alias("cid"),
            F.explode(
                F.expr(
                    "transform(sequence(0, 1), m -> named_struct("
                    " 'm', m, 'c', transform(sequence(1, 2),"
                    " j -> element_at(emb, m * 2 + j))))"
                )
            ).alias("s"),
        )
        .select(F.col("s.m").alias("m"), "cid", F.col("s.c").alias("c"))
        .groupBy("m")
        .agg(F.array_sort(F.collect_list(F.struct("cid", "c"))).alias("ents"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(named_struct("
                "'m', m, 'ents', ents))), s -> s.ents)"
            ).alias("cb")
        )
    )
    trained = pq_fit(emb, m=2, subdim=2, k=3, max_rounds=6)
    err_seeded = (
        pq_encode(emb, seeded, m=2, subdim=2).agg(F.sum("sq_err")).collect()[0][0]
    )
    err_trained = (
        pq_encode(emb, trained, m=2, subdim=2).agg(F.sum("sq_err")).collect()[0][0]
    )
    assert 0.0 <= err_trained < err_seeded


def test_prefix_filter_same_pairs_fewer_candidates(spark):
    """PPJoin prefix filtering must be lossless (identical verified pairs
    to the full inverted-index join) while generating strictly fewer
    candidate pairs — the point of the technique."""
    from pyspark.sql import Window as W

    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _capped_index,
        _docs,
        dedup_jaccard_prefix_filter,
        dedup_ngram_jaccard,
    )

    full = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["jaccard"])
        for r in dedup_ngram_jaccard(spark, SF001).collect()
    }
    pref = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["jaccard"])
        for r in dedup_jaccard_prefix_filter(spark, SF001).collect()
    }
    assert pref == full and len(full) > 0

    idx, sizes = _capped_index(_docs(spark, SF001))
    a, b = idx.alias("a"), idx.alias("b")
    n_full_cand = (
        a.join(
            b,
            (F.col("a.shingle_h") == F.col("b.shingle_h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    df_tbl = idx.groupBy("shingle_h").agg(F.count(F.lit(1)).alias("df"))
    w = W.partitionBy("doc_id").orderBy("df", "shingle_h")
    prefix = (
        idx.join(df_tbl, "shingle_h")
        .join(sizes, "doc_id")
        .withColumn("rnk", F.row_number().over(w))
        .filter(
            F.col("rnk")
            <= F.floor((1.0 - JACCARD_THRESHOLD) * F.col("sz")).cast("int") + 1
        )
        .select("doc_id", "shingle_h")
    )
    pa, pb = prefix.alias("a"), prefix.alias("b")
    n_pref_cand = (
        pa.join(
            pb,
            (F.col("a.shingle_h") == F.col("b.shingle_h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    assert n_pref_cand < n_full_cand
