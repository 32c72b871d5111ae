"""Property tests for the round-4 operators: bloom decontamination,
Z-order layout, mixture weights, histogram quantiles, boilerplate chunks,
incremental delta dedup, truncated-dim rerank.

Each asserts the operator's defining invariant (the thing the oracle's
value-hash alone doesn't state), on the sf0.001 fixture."""

import math

import pytest
from pyspark.sql import functions as F

from conduit_connector_s3_iceberg_spark.operators.dedup import (
    DELTA_MOD,
    DELTA_REM,
    dedup_incremental_delta,
)
from conduit_connector_s3_iceberg_spark.operators.layout import (
    N_FILES,
    layout_zorder_stats,
)
from conduit_connector_s3_iceberg_spark.operators.sampling import (
    sample_mixture_weights,
)
from conduit_connector_s3_iceberg_spark.operators.sketches import (
    HIST_BIN_W,
    sketch_hist_quantiles,
)
from conduit_connector_s3_iceberg_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    sim_topk_bruteforce,
    sim_truncated_rerank,
)
from conduit_connector_s3_iceberg_spark.operators.text import (
    CHUNK_W,
    text_bloom_decontaminate,
    text_boilerplate_chunks,
    text_contamination,
)

SF = "/root/testdata/sf0.001"


def test_bloom_has_no_false_negatives(spark):
    """Every document the EXACT contamination join flags must be flagged
    by the Bloom probe — the filter may over-flag (false positives), never
    under-flag. This is the safety direction decontamination relies on."""
    exact = {
        r["doc_id"]: r["n_hits"]
        for r in text_contamination(spark, SF).collect()
    }
    bloom = {
        r["doc_id"]: r["n_bloom_hits"]
        for r in text_bloom_decontaminate(spark, SF).collect()
    }
    missing = {
        d: n for d, n in exact.items() if bloom.get(d, 0) < n
    }
    assert not missing, f"bloom under-flagged: {missing}"


def test_zorder_partitions_rows_exactly_and_tightens_user_envelope(spark):
    rows = layout_zorder_stats(spark, SF).collect()
    by_layout = {}
    for r in rows:
        by_layout.setdefault(r["layout"], []).append(r)
    total = {k: sum(r["n_rows"] for r in v) for k, v in by_layout.items()}
    # every row lands in exactly one file under each layout
    assert total["linear"] == total["zorder"] > 0
    assert all(len(v) <= N_FILES for v in by_layout.values())
    mean_uspan = {
        k: sum(r["u_span"] for r in v) / len(v) for k, v in by_layout.items()
    }
    # the point of Z-order: user envelopes shrink vs the time-linear layout
    assert mean_uspan["zorder"] < mean_uspan["linear"]


def test_mixture_weights_normalize_and_upweight_small_domains(spark):
    rows = sample_mixture_weights(spark, SF).collect()
    assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["raw_share"] for r in rows) - 1.0) < 1e-9
    small = min(rows, key=lambda r: r["n_docs"])
    big = max(rows, key=lambda r: r["n_docs"])
    if small["n_docs"] < big["n_docs"]:
        # temperature < 1 moves share from the largest domain to the smallest
        assert small["temp_share"] > small["raw_share"] - 1e-12
        assert big["temp_share"] < big["raw_share"] + 1e-12


def test_hist_quantiles_are_ordered_and_bin_accurate(spark):
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = {r["lang"]: r for r in sketch_hist_quantiles(spark, SF).collect()}
    docs = load_table(spark, SF, "documents")
    for lang, r in rows.items():
        assert r["p50_est"] <= r["p90_est"] <= r["p99_est"]
        vals = sorted(
            x["n_chars"]
            for x in docs.filter(F.col("lang") == lang).collect()
        )
        exact_p50 = vals[math.ceil(0.5 * len(vals)) - 1]
        # the estimate is the enclosing bin's upper edge: within one bin
        assert 0 <= r["p50_est"] - exact_p50 <= HIST_BIN_W


def test_boilerplate_chunk_accounting(spark):
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    out = {r["doc_id"]: r for r in text_boilerplate_chunks(spark, SF).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents").collect()
    }
    assert set(out) == set(docs)
    for doc_id, r in out.items():
        n_tok = len(docs[doc_id].strip().split(" "))
        assert r["n_chunks"] == math.ceil(n_tok / CHUNK_W)
        assert 0 <= r["n_boiler"] <= r["n_chunks"]
        if r["n_boiler"] == 0:
            # untouched documents reassemble to their original text
            assert r["clean_text"] == docs[doc_id].strip()
        else:
            kept = len(r["clean_text"].split(" ")) if r["clean_text"] else 0
            assert kept < n_tok


def test_incremental_delta_covers_batch_and_verdicts_are_consistent(spark):
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    n_new = docs.filter(
        F.col("doc_id") % DELTA_MOD == DELTA_REM
    ).count()
    rows = dedup_incremental_delta(spark, SF).collect()
    # one verdict per delta document, none dropped
    assert len(rows) == n_new
    for r in rows:
        assert r["doc_id"] % DELTA_MOD == DELTA_REM
        if r["verdict"] == "exact":
            assert r["n_exact"] > 0
        elif r["verdict"] == "near":
            assert r["n_exact"] == 0 and r["n_band_cands"] > 0
        else:
            assert r["n_exact"] == 0 and r["n_band_cands"] == 0


def test_truncated_rerank_shape_and_recall(spark):
    exact = sim_topk_bruteforce(spark, SF).collect()
    rr = sim_truncated_rerank(spark, SF).collect()
    assert len(rr) == N_QUERIES * TOP_K
    by_q = {}
    for r in rr:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        ranks = [r["rank"] for r in sorted(rows, key=lambda x: x["rank"])]
        assert ranks == list(range(1, TOP_K + 1))
        cosines = [r["cosine"] for r in sorted(rows, key=lambda x: x["rank"])]
        assert cosines == sorted(cosines, reverse=True)
    # the reranked candidates carry EXACT cosines: wherever the pipeline
    # returns a vector the brute-force also ranked, the scores agree
    exact_scores = {(r["query_id"], r["vec_id"]): r["cosine"] for r in exact}
    agree = [
        (k, r["cosine"])
        for q, rows in by_q.items()
        for r in rows
        if (k := (r["query_id"], r["vec_id"])) in exact_scores
    ]
    assert agree, "truncated prefilter found none of the exact top-k"
    for k, c in agree:
        assert c == pytest.approx(exact_scores[k], abs=0.0)


def test_streaming_dedup_against_standing_index(spark, tmp_path):
    """maintain_dedup_stream admits exactly the first-seen fingerprints
    across epochs (in-batch dups, cross-batch dups, dups vs a pre-seeded
    index), and re-applying a delivered epoch is a no-op (replay safety)."""
    import glob
    import os
    import shutil

    from conduit_connector_s3_iceberg_spark.streaming import (
        apply_dedup_epoch,
        maintain_dedup_stream,
    )
    from conduit_connector_s3_iceberg_spark.writer import ParquetWarehouse

    def doc(i, text):
        return (i, text)

    # epoch 0: docs 1/2 unique; 3 and 7 are in-batch case-variant dups of 1
    # epoch 1: doc 4 duplicates doc 2 cross-batch, doc 5 new,
    #          doc 6 duplicates the pre-seeded corpus doc
    seeded_text = "already in the corpus"
    e0 = spark.createDataFrame(
        [
            doc(1, "alpha beta"),
            doc(2, "gamma delta"),
            doc(3, "Alpha Beta"),
            doc(7, "ALPHA BETA"),
        ],
        ["doc_id", "text"],
    )
    e1 = spark.createDataFrame(
        [doc(4, "gamma delta"), doc(5, "epsilon zeta"), doc(6, seeded_text)],
        ["doc_id", "text"],
    )

    wh = ParquetWarehouse(spark, str(tmp_path / "dd_wh"))
    # pre-seed the standing index as a prior batch ingest would have
    seed = spark.createDataFrame([doc(0, seeded_text)], ["doc_id", "text"])
    apply_dedup_epoch(wh, "fps", "clean_docs", seed, epoch_id=-1)

    src = tmp_path / "dd_src"
    src.mkdir()
    for i, df in enumerate([e0, e1]):
        stage = str(tmp_path / f"dd_stage_{i}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dest = str(src / f"{i}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (1000 + i, 1000 + i))

    stream = (
        spark.readStream.schema(e0.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = maintain_dedup_stream(
        stream, wh, "fps", "clean_docs", str(tmp_path / "dd_ckpt")
    )
    q.awaitTermination(120)

    admitted = sorted(
        r["doc_id"] for r in wh.read("clean_docs").collect()
    )
    # 0 seeded; 1, 2 first-seen in e0 (3 and 7 are in-batch dups of 1);
    # 5 first-seen in e1 (4 dups 2 cross-batch, 6 dups the seed)
    assert admitted == [0, 1, 2, 5]
    n_fps = wh.read("fps").count()
    assert n_fps == 4

    # replay: re-deliver epoch 1 with the same epoch_id -> no-op
    last_epoch = max(
        r["epoch_id"] for r in wh.read("fps__applied_epoch").collect()
    )
    apply_dedup_epoch(wh, "fps", "clean_docs", e1, last_epoch)
    assert sorted(r["doc_id"] for r in wh.read("clean_docs").collect()) == [
        0, 1, 2, 5,
    ]
    # a NEW epoch carrying only known fingerprints admits nothing
    apply_dedup_epoch(wh, "fps", "clean_docs", e1, last_epoch + 1)
    assert sorted(r["doc_id"] for r in wh.read("clean_docs").collect()) == [
        0, 1, 2, 5,
    ]


def test_bpe_fit_matches_pure_python_reference(spark):
    """bpe_fit's distributed loop learns the identical ordered merge list
    and final symbolization as an independent sequential implementation,
    on a word-frequency table with known structure."""
    from conduit_connector_s3_iceberg_spark.operators.bpe import (
        bpe_encode,
        bpe_fit,
    )

    wf_rows = [
        ("lower", 6),
        ("lowest", 3),
        ("newer", 8),
        ("wider", 2),
        ("new", 5),
    ]

    # -- sequential reference (Sennrich-style, greedy ties by pair order) --
    def ref_fit(rows, n):
        words = {w: (list(w), c) for w, c in rows}
        merges = []
        for _ in range(n):
            freq = {}
            for syms, c in words.values():
                for i in range(len(syms) - 1):
                    freq[(syms[i], syms[i + 1])] = (
                        freq.get((syms[i], syms[i + 1]), 0) + c
                    )
            if not freq:
                break
            # deterministic tie-break: highest freq, then lexicographically
            # smallest (a, b)
            top = max(freq.values())
            a, b = sorted(k for k, v in freq.items() if v == top)[0]
            merges.append((a, b))
            for w, (syms, c) in words.items():
                out = []
                for x in syms:
                    if out and out[-1] == a and x == b:
                        out[-1] = a + b
                    else:
                        out.append(x)
                words[w] = (out, c)
        return merges, {w: syms for w, (syms, c) in words.items()}

    ref_merges, ref_words = ref_fit(wf_rows, 8)

    wf = spark.createDataFrame(wf_rows, ["token", "cnt"])
    merges, final = bpe_fit(wf, 8, checkpoint_every=3)
    assert merges == ref_merges
    got = {r["token"]: list(r["syms"]) for r in final.collect()}
    assert got == ref_words

    # inference path: encoding fresh tokens applies merges in order
    enc = bpe_encode(
        spark.createDataFrame([("newest",), ("er",)], ["token"]), merges
    )
    enc_got = {r["token"]: list(r["syms"]) for r in enc.collect()}

    def ref_encode(word):
        syms = list(word)
        for a, b in ref_merges:
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms = out
        return syms

    assert enc_got == {"newest": ref_encode("newest"), "er": ref_encode("er")}


def test_bpe_fit_random_corpora_property(spark):
    """Property sweep: on randomized word-frequency tables the distributed
    BPE loop agrees with the sequential reference merge-for-merge. Few
    examples (each round-trips Spark jobs), but randomized structure —
    repeated substrings, ties, single-char words — probes the fold
    expression's edges."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from conduit_connector_s3_iceberg_spark.operators.bpe import bpe_fit

    def ref_fit(rows, n):
        words = {w: (list(w), c) for w, c in rows}
        merges = []
        for _ in range(n):
            freq = {}
            for syms, c in words.values():
                for i in range(len(syms) - 1):
                    freq[(syms[i], syms[i + 1])] = (
                        freq.get((syms[i], syms[i + 1]), 0) + c
                    )
            if not freq:
                break
            top = max(freq.values())
            a, b = sorted(k for k, v in freq.items() if v == top)[0]
            merges.append((a, b))
            for w_, (syms, c) in words.items():
                out = []
                for x in syms:
                    if out and out[-1] == a and x == b:
                        out[-1] = a + b
                    else:
                        out.append(x)
                words[w_] = (out, c)
        return merges

    word = st.text(alphabet="abc", min_size=1, max_size=6)

    @given(
        st.dictionaries(word, st.integers(1, 9), min_size=1, max_size=6)
    )
    @settings(max_examples=5, deadline=None)
    def check(wf_dict):
        rows = sorted(wf_dict.items())
        wf = spark.createDataFrame(rows, ["token", "cnt"])
        merges, _ = bpe_fit(wf, 4, checkpoint_every=2)
        assert merges == ref_fit(rows, 4)

    check()


def test_priority_sample_is_weighted_without_replacement(spark):
    """Priority sampling's defining invariants: (a) no doc drawn twice,
    (b) exactly K docs kept per stratum when the stratum exceeds K,
    (c) tau is the (K+1)-th priority so every kept priority >= tau and
    adj_weight = max(w, tau), (d) kept docs skew long: their mean n_chars
    exceeds the corpus stratum mean (weights = n_chars)."""
    from conduit_connector_s3_iceberg_spark.operators.sampling import (
        PRIORITY_K,
        sample_priority_weighted,
    )

    rows = sample_priority_weighted(spark, SF).collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))  # without replacement
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("n_chars").alias("mean_chars"),
        )
        .collect()
    )
    stratum = {r["source"]: r for r in docs}
    for src, rs in by_src.items():
        if stratum[src]["n"] > PRIORITY_K:
            assert len(rs) == PRIORITY_K
            assert all(r["tau"] > 0 for r in rs)
        for r in rs:
            assert r["priority"] >= r["tau"]
            assert r["adj_weight"] == max(float(r["n_chars"]), r["tau"])
        kept_mean = sum(r["n_chars"] for r in rs) / len(rs)
        assert kept_mean > 0.9 * stratum[src]["mean_chars"]
    # global weighted tilt: overall kept mean exceeds overall corpus mean
    corpus_mean = sum(
        s["mean_chars"] * s["n"] for s in stratum.values()
    ) / sum(s["n"] for s in stratum.values())
    overall_kept = sum(r["n_chars"] for r in rows) / len(rows)
    assert overall_kept > corpus_mean


def test_curriculum_stages_are_length_ordered_and_mixture_preserving(spark):
    """Curriculum invariants: within a source, every stage-s doc is no
    longer than any stage-(s+1) doc (modulo the NTILE boundary tie), each
    source appears in every stage, and stage sizes differ by at most one
    (NTILE's balance guarantee)."""
    from conduit_connector_s3_iceberg_spark.operators.corpus import (
        CURRICULUM_STAGES,
        corpus_curriculum_shards,
    )

    rows = corpus_curriculum_shards(spark, SF).collect()
    by_src: dict[str, dict[int, list]] = {}
    for r in rows:
        by_src.setdefault(r["source"], {}).setdefault(r["stage"], []).append(
            (r["n_chars"], r["doc_id"])
        )
    for src, stages in by_src.items():
        assert set(stages) == set(range(1, CURRICULUM_STAGES + 1)), src
        sizes = [len(stages[s]) for s in sorted(stages)]
        assert max(sizes) - min(sizes) <= 1
        for s in range(1, CURRICULUM_STAGES):
            assert max(stages[s]) <= min(stages[s + 1]), (src, s)


def test_ivfpq_scores_match_full_adc_on_shared_pairs(spark):
    """IVFPQ is exactly full-corpus ADC restricted to probed cells: every
    (query, vec) pair both searches return must carry the identical
    asymmetric distance, and IVFPQ must never return a pair outside the
    query's probed cells."""
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        emb_pq_adc_topk,
        sim_ann_ivfpq,
    )

    full = {
        (r["query_id"], r["vec_id"]): r["adist"]
        for r in emb_pq_adc_topk(spark, SF).collect()
    }
    ivfpq = sim_ann_ivfpq(spark, SF).collect()
    shared = [r for r in ivfpq if (r["query_id"], r["vec_id"]) in full]
    assert shared, "no overlap between IVFPQ and full ADC top-k"
    for r in shared:
        assert r["adist"] == full[(r["query_id"], r["vec_id"])]


def test_containment_dominates_jaccard_and_flags_smaller_side(spark):
    """containment = |A∩B|/min(|A|,|B|) >= jaccard always, every flagged
    pair is >= the threshold, and contained_doc is the endpoint with the
    smaller capped shingle set."""
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        CONTAINMENT_THRESHOLD,
        _capped_index,
        _docs,
        dedup_containment,
        ngram_jaccard_pairs,
    )

    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(spark, SF).collect()
    }
    _, sizes = _capped_index(_docs(spark, SF), materialize=False)
    sz = {r["doc_id"]: r["sz"] for r in sizes.collect()}
    rows = dedup_containment(spark, SF).collect()
    assert rows
    for r in rows:
        pair = (r["doc_a"], r["doc_b"])
        assert r["containment"] >= CONTAINMENT_THRESHOLD
        if pair in jac:
            assert r["containment"] >= jac[pair]
        small = (
            r["doc_a"] if sz[r["doc_a"]] <= sz[r["doc_b"]] else r["doc_b"]
        )
        assert r["contained_doc"] == small


def test_kmv_two_phase_matches_global_rank_and_estimates(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from conduit_connector_s3_iceberg_spark.operators.sketches import (
        KMV_K,
        kmv_sketches,
        sketch_kmv_distinct,
    )

    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    sk = kmv_sketches(ev, "event_type", "user_id")
    h = ev.select(
        "event_type", F.md5(F.col("user_id").cast("string")).alias("hx")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("hx")
    naive = h.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= KMV_K
    )
    assert sorted(
        (r["event_type"], r["hx"], r["rk"]) for r in sk.collect()
    ) == sorted((r["event_type"], r["hx"], r["rk"]) for r in naive.collect())
    # k=64 -> ~12.5% relative std err; assert a generous 4-sigma bound
    for r in sketch_kmv_distinct(spark, SF).collect():
        if r["kmv_size"] == KMV_K:
            assert abs(r["kmv_est"] - r["n_exact"]) / r["n_exact"] < 0.5
        else:
            assert r["kmv_est"] == r["kmv_size"] == r["n_exact"]


def test_kmv_jaccard_tracks_exact_overlap(spark):
    from conduit_connector_s3_iceberg_spark.operators.sketches import (
        sketch_kmv_jaccard,
    )

    rows = sketch_kmv_jaccard(spark, SF).collect()
    assert rows, "expected at least one event-type pair"
    for r in rows:
        assert 0.0 <= r["kmv_jaccard"] <= 1.0
        # sketch estimate within an additive 0.35 of truth at k=64
        assert abs(r["kmv_jaccard"] - r["jaccard_exact"]) < 0.35


def test_dsir_weights_tilt_toward_target_language(spark):
    from conduit_connector_s3_iceberg_spark.operators.text import (
        text_dsir_weights,
    )

    rows = text_dsir_weights(spark, SF).collect()
    assert rows
    en = [r["dsir_logw"] for r in rows if r["lang"] == "en"]
    other = [r["dsir_logw"] for r in rows if r["lang"] != "en"]
    assert en and other
    # the target model is trained on 'en' docs: their mean log-ratio must
    # exceed the non-target mean (the whole point of importance tilting)
    assert sum(en) / len(en) > sum(other) / len(other)


def test_mitchell_log2_bound():
    import math

    # Mitchell's chord approximation UNDERestimates the concave log2 by at
    # most 0.0861 bits (and is exact at powers of two)
    for r in [1, 2, 3, 5, 7, 100, 1 << 20, (1 << 20) + 12345, (1 << 40) - 1]:
        L = r.bit_length()
        approx = (L - 1) + (r / (1 << (L - 1)) - 1.0)
        assert -0.0861 <= approx - math.log2(r) <= 1e-12


def test_hard_negatives_exclude_anchor_label(spark):
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        TOP_K,
        sim_hard_negatives,
    )

    rows = sim_hard_negatives(spark, SF).collect()
    assert rows
    per_q = {}
    for r in rows:
        assert r["neg_label"] != r["anchor_label"]
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rs in per_q.items():
        assert len(rs) == TOP_K
        ranked = sorted(rs, key=lambda r: r["rank"])
        # ranks are 1..k and cosine is non-increasing along them
        assert [r["rank"] for r in ranked] == list(range(1, TOP_K + 1))
        for a, b in zip(ranked, ranked[1:]):
            assert a["cosine"] >= b["cosine"]


def test_compaction_bins_are_contiguous_and_conserve_bytes(spark):
    from conduit_connector_s3_iceberg_spark.operators.layout import (
        layout_compaction_bins,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = layout_compaction_bins(spark, SF).collect()
    ev = load_table(spark, SF, "events")
    total = ev.selectExpr("sum(length(props) + 32) b").collect()[0]["b"]
    assert sum(r["bin_bytes"] for r in rows) == total
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r["bin_id"])
        # bins numbered contiguously from 0
        assert [r["bin_id"] for r in rs] == list(range(len(rs)))
        # day ranges of consecutive bins never overlap (binpack keeps order)
        for a, b in zip(rs, rs[1:]):
            assert a["max_day"] < b["min_day"]


def test_outlier_topk_distances_dominate_corpus(spark):
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        OOD_K,
        emb_outlier_topk,
    )

    rows = sorted(emb_outlier_topk(spark, SF).collect(), key=lambda r: r["rank"])
    assert len(rows) == OOD_K
    # ranks contiguous, distances non-increasing, all non-negative
    assert [r["rank"] for r in rows] == list(range(1, OOD_K + 1))
    for a, b in zip(rows, rows[1:]):
        assert a["dist2"] >= b["dist2"] >= 0.0


def test_neardup_decontamination_finds_only_cross_split_pairs(spark):
    from conduit_connector_s3_iceberg_spark.operators.corpus import (
        corpus_neardup_decontamination,
        _split_col,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = corpus_neardup_decontamination(spark, SF).collect()
    splits = {
        r["doc_id"]: r["split"]
        for r in load_table(spark, SF, "documents")
        .select("doc_id", _split_col().alias("split"))
        .collect()
    }
    for r in rows:
        assert splits[r["eval_id"]] == "test"
        assert splits[r["best_train_id"]] == "train"
        assert 0.0 <= r["best_jaccard"] <= 1.0
        assert r["leaky"] == (r["best_jaccard"] >= 0.5)
        assert r["n_candidates"] >= 1


def test_cusum_matches_sequential_recursion(spark):
    from conduit_connector_s3_iceberg_spark.plans.events import (
        CUSUM_SCALE,
        events_cusum_changepoints,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = events_cusum_changepoints(spark, SF).collect()
    assert rows
    # rebuild the textbook recursion S_d = max(0, S_{d-1} + y_d) per series
    # and assert the window identity produced the identical values
    from collections import defaultdict

    series = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r["event_type"], r["day"])):
        series[r["event_type"]].append(r)
    ev = load_table(spark, SF, "events")
    daily = {
        (r["event_type"], r["day"]): r["x"]
        for r in ev.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    }
    for t, rs in series.items():
        xs = [daily[(t, r["day"])] for r in rs]
        ref = round(CUSUM_SCALE * sum(xs) / len(xs))
        s = 0
        for r, x in zip(rs, xs):
            s = max(0, s + x * CUSUM_SCALE - ref)
            assert r["cusum_scaled"] == s, (t, r["day"])


def test_pair_manifest_gates_and_caps(spark):
    from conduit_connector_s3_iceberg_spark.operators.multimodal import (
        PAIR_MAX_TOKENS,
        PAIR_MIN_TOKENS,
        PAIR_SOURCE_CAP,
        mm_pair_manifest,
    )

    rows = mm_pair_manifest(spark, SF).collect()
    assert rows
    from collections import Counter

    per_source = Counter(r["source"] for r in rows)
    assert all(c <= PAIR_SOURCE_CAP for c in per_source.values())
    for r in rows:
        assert PAIR_MIN_TOKENS <= r["n_tokens"] <= PAIR_MAX_TOKENS
        assert r["emb_norm"] > 0


def test_filter_cascade_funnel_is_consistent(spark):
    from conduit_connector_s3_iceberg_spark.operators.text import (
        text_filter_cascade,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = sorted(
        text_filter_cascade(spark, SF).collect(), key=lambda r: r["rule_no"]
    )
    total = load_table(spark, SF, "documents").count()
    assert rows[0]["n_in"] == total
    for r in rows:
        assert r["n_in"] - r["n_dropped"] == r["n_out"]
        assert r["n_dropped"] >= 0
    for a, b in zip(rows, rows[1:]):
        assert a["n_out"] == b["n_in"]


def test_token_entropy_matches_math_log_within_mitchell_bound(spark):
    import math

    from conduit_connector_s3_iceberg_spark.operators.text import (
        text_token_entropy,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    out = {r["doc_id"]: r for r in text_token_entropy(spark, SF).collect()}
    docs = load_table(spark, SF, "documents").collect()
    from collections import Counter

    for d in docs[:50]:
        toks = d["text"].strip().split(" ")
        c = Counter(toks)
        n = len(toks)
        true_h = math.log2(n) - sum(
            v * math.log2(v) for v in c.values()
        ) / n
        r = out[d["doc_id"]]
        assert r["n_tokens"] == n and r["n_types"] == len(c)
        # Mitchell underestimates each log2 by <= 0.0861 bits; the error on
        # H is bounded by 0.0861 * (1 + sum c/n) = ~0.18 bits
        assert abs(r["entropy_bits"] - true_h) <= 0.18
        assert r["entropy_bits"] >= -0.09  # ~0 for single-token docs


def test_pq_distortion_rows_and_bounds(spark):
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        PQ_M,
        emb_pq_distortion,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = emb_pq_distortion(spark, SF).collect()
    n = load_table(spark, SF, "embeddings").count()
    assert [r["m"] for r in rows] == list(range(PQ_M))
    for r in rows:
        assert r["n_vecs"] == n
        assert r["mse"] >= 0.0
        assert r["sse_scaled"] >= 0


def test_dsir_resample_respects_probability_structure(spark):
    from conduit_connector_s3_iceberg_spark.operators.sampling import (
        sample_dsir_resample,
    )
    from conduit_connector_s3_iceberg_spark.operators.text import (
        text_dsir_weights,
    )

    kept = {r["doc_id"] for r in sample_dsir_resample(spark, SF).collect()}
    weights = text_dsir_weights(spark, SF).collect()
    assert kept and len(kept) < len(weights)
    # docs with logw >= 2 have keep probability 1 (2^-2 * 2^logw >= 1):
    # every one of them must be in the sample
    always = {r["doc_id"] for r in weights if r["dsir_logw"] >= 2.0}
    assert always <= kept
    # the kept set should be tilted toward the target: mean logw of kept
    # strictly exceeds mean logw of the full population
    import statistics

    pop = statistics.mean(r["dsir_logw"] for r in weights)
    got = statistics.mean(
        r["dsir_logw"] for r in weights if r["doc_id"] in kept
    )
    assert got > pop


def test_cdc_chunks_resynchronize_after_insertion(spark):
    """The content-defined cut rule's whole point: prefixing ONE token must
    not destroy chunk sharing in a long identical tail (a fixed grid would
    shift every cell)."""
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        cdc_chunk_frame,
        dedup_cdc_chunks,
    )

    tail = " ".join(f"w{i % 97}x{(i * 7) % 53}" for i in range(400))
    frame = spark.createDataFrame(
        [(1, "alpha " + tail), (2, tail)], "doc_id long, text string"
    )
    chunks = cdc_chunk_frame(frame).collect()
    h1 = {r["chash"] for r in chunks if r["doc_id"] == 1}
    h2 = {r["chash"] for r in chunks if r["doc_id"] == 2}
    shared = h1 & h2
    # the tail is hundreds of tokens: most chunks must re-sync and match
    assert len(shared) >= max(2, len(h2) // 2), (len(shared), len(h2))

    # and the registered query only reports genuinely repeated chunks
    rows = dedup_cdc_chunks(spark, SF).collect()
    assert all(r["n_occurrences"] >= 2 for r in rows)


def test_time_weighted_avg_within_value_range(spark):
    from conduit_connector_s3_iceberg_spark.plans.events import (
        events_time_weighted_value,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = events_time_weighted_value(spark, SF).collect()
    ev = load_table(spark, SF, "events")
    bounds = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    assert len(rows) == len(bounds)
    for r in rows:
        lo, hi = bounds[r["event_type"]]
        # a convex time-weighting cannot escape the value range
        assert lo - 1e-6 <= r["time_weighted_avg"] <= hi + 1e-6
        assert r["held_seconds"] > 0 and r["n_intervals"] > 0


def test_transition_matrix_rows_normalize(spark):
    from collections import defaultdict

    from conduit_connector_s3_iceberg_spark.plans.events import (
        TRANS_SCALE,
        events_transition_matrix,
    )

    rows = events_transition_matrix(spark, SF).collect()
    assert rows
    by_cur = defaultdict(list)
    for r in rows:
        by_cur[r["cur"]].append(r)
    for cur, rs in by_cur.items():
        total = sum(r["p_scaled"] for r in rs)
        # row-quantized probabilities sum to SCALE within rounding slack
        assert abs(total - TRANS_SCALE) <= len(rs)


def test_time_to_conversion_partitions_signup_users(spark):
    from conduit_connector_s3_iceberg_spark.plans.events import (
        events_time_to_conversion,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = events_time_to_conversion(spark, SF).collect()
    ev = load_table(spark, SF, "events")
    n_signup = (
        ev.filter(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in rows) == n_signup
    assert all(r["latency_days"] >= -1 for r in rows)


def test_ngram_novelty_first_doc_is_fully_novel(spark):
    from conduit_connector_s3_iceberg_spark.operators.text import (
        text_ngram_novelty,
    )

    rows = sorted(
        text_ngram_novelty(spark, SF).collect(), key=lambda r: r["doc_id"]
    )
    assert rows[0]["novelty"] == 1.0  # nothing precedes the first doc
    for r in rows:
        assert 0.0 <= r["novelty"] <= 1.0
        assert r["n_novel"] <= r["n_shingles"]


def test_scd2_intervals_tile_without_overlap(spark):
    from collections import defaultdict

    from conduit_connector_s3_iceberg_spark.plans.relational2 import (
        q71_scd2_intervals,
    )

    rows = q71_scd2_intervals(spark, SF).collect()
    assert rows
    by_key = defaultdict(list)
    for r in rows:
        by_key[r["o_custkey"]].append(r)
    for k, rs in by_key.items():
        rs.sort(key=lambda r: r["version_no"])
        assert [r["version_no"] for r in rs] == list(range(1, len(rs) + 1))
        assert rs[-1]["is_current"] and rs[-1]["valid_to"] is None
        for cur, nxt in zip(rs, rs[1:]):
            assert cur["valid_to"] == nxt["valid_from"]  # half-open tiling
            assert not cur["is_current"]


def test_emb_drift_is_symmetric_positive(spark):
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        emb_drift_by_label,
    )

    rows = emb_drift_by_label(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["centroid_shift"] >= 0.0
        assert r["n_half0"] > 0 and r["n_half1"] > 0


def test_minhash_estimate_tracks_exact_jaccard(spark):
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        N_MINHASH,
        dedup_minhash_estimate_accuracy,
    )

    rows = dedup_minhash_estimate_accuracy(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["mh_matches"] <= N_MINHASH
        assert abs(r["mh_est"] - r["mh_matches"] / N_MINHASH) < 1e-12
        assert abs(r["est_error"] - (r["mh_est"] - r["jaccard"])) < 1e-12
    # k=8 is coarse; still, the mean |error| over candidates should be
    # well under the all-or-nothing worst case
    mean_abs = sum(abs(r["est_error"]) for r in rows) / len(rows)
    assert mean_abs < 0.35


def test_merged_hist_quantiles_match_direct_global_build(spark):
    from conduit_connector_s3_iceberg_spark.operators.sketches import (
        HIST_BIN_W,
        HIST_BINS,
        sketch_hist_quantiles_merged,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    [row] = sketch_hist_quantiles_merged(spark, SF).collect()
    docs = [r["n_chars"] for r in load_table(spark, SF, "documents").collect()]
    assert row["n_docs"] == len(docs)
    # recompute the p90 bin edge directly from raw values
    bins = sorted(min(c // HIST_BIN_W, HIST_BINS - 1) for c in docs)
    n = len(bins)
    import math

    k = math.ceil(0.9 * n)
    assert row["p90_est"] == (bins[k - 1] + 1) * HIST_BIN_W


def test_neyman_allocation_sums_to_budget_and_tilts_to_variance(spark):
    from conduit_connector_s3_iceberg_spark.operators.sampling import (
        NEYMAN_N,
        sample_neyman_allocation,
    )

    rows = sample_neyman_allocation(spark, SF).collect()
    assert sum(r["neyman_quota"] for r in rows) == NEYMAN_N
    # Neyman ranks strata by n*sigma; the stratum with the largest
    # n*sigma must get at least as many slots as the one with the smallest
    weighted = sorted(rows, key=lambda r: r["n"] * r["sigma"])
    assert weighted[-1]["neyman_quota"] >= weighted[0]["neyman_quota"]
    for r in rows:
        assert r["sigma"] >= 0.0 and r["neyman_quota"] >= 0


def test_soft_weights_conserve_unit_mass_per_cluster(spark):
    from collections import defaultdict

    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        SOFTW_SCALE,
        dedup_soft_weights,
    )

    rows = dedup_soft_weights(spark, SF).collect()
    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r["cluster_id"]].append(r)
    for cid, rs in by_cluster.items():
        size = rs[0]["cluster_size"]
        assert len(rs) == size
        # family mass ~= 1 (integer rounding slack only)
        total = sum(r["weight_scaled"] for r in rs)
        assert abs(total - SOFTW_SCALE) <= size


def test_k_anonymity_accounts_for_every_doc(spark):
    from conduit_connector_s3_iceberg_spark.operators.corpus import (
        KANON_K,
        corpus_k_anonymity,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = {r["below_k"]: r for r in corpus_k_anonymity(spark, SF).collect()}
    total = load_table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows.values()) == total
    if True in rows:
        assert rows[True]["max_group"] < KANON_K
    if False in rows:
        assert rows[False]["min_group"] >= KANON_K


def test_lm_score_buckets_cover_all_scored_docs(spark):
    from conduit_connector_s3_iceberg_spark.operators.lm import (
        lm_bigram_score,
        lm_score_buckets,
    )

    buckets = lm_score_buckets(spark, SF).collect()
    scored = lm_bigram_score(spark, SF).count()
    assert sum(r["n_docs"] for r in buckets) == scored
    assert all(r["bucket"] >= 0 for r in buckets)
    assert len(buckets) >= 2  # the profile is non-degenerate on this corpus


def test_basket_lift_internal_consistency(spark):
    from conduit_connector_s3_iceberg_spark.plans.relational2 import (
        q73_basket_lift,
    )

    rows = q73_basket_lift(spark, SF).collect()
    for r in rows:
        assert r["n_both"] <= min(r["n_a"], r["n_b"])
        assert 0.0 < r["confidence_a_to_b"] <= 1.0
        assert r["lift"] > 0.0
        assert r["item_a"] < r["item_b"]


def test_ab_lift_cells_partition_users(spark):
    from conduit_connector_s3_iceberg_spark.plans.events import events_ab_lift
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    [r] = events_ab_lift(spark, SF).collect()
    users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert r["n0"] + r["n1"] == users
    assert 0.0 < r["rate_control"] < 1.0
    assert 0.0 < r["rate_treatment"] < 1.0
    assert abs(
        r["absolute_lift"] - (r["rate_treatment"] - r["rate_control"])
    ) < 1e-12


def test_gini_bounds_and_vocab_growth_monotone(spark):
    from conduit_connector_s3_iceberg_spark.operators.corpus import (
        corpus_source_gini,
    )
    from conduit_connector_s3_iceberg_spark.operators.text import (
        text_vocab_growth,
    )

    [g] = corpus_source_gini(spark, SF).collect()
    assert 0.0 <= g["gini"] < 1.0
    rows = sorted(text_vocab_growth(spark, SF).collect(), key=lambda r: r["bucket"])
    assert rows[0]["new_types"] > 0
    for a, b in zip(rows, rows[1:]):
        assert b["cum_types"] >= a["cum_types"]
        assert b["cum_tokens"] > a["cum_tokens"]
        # novelty decays in aggregate: later buckets add fewer new types
    assert rows[-1]["new_types"] < rows[0]["new_types"]


def test_zipf_slope_is_negative_and_sane(spark):
    from conduit_connector_s3_iceberg_spark.operators.text import (
        ZIPF_V,
        text_zipf_fit,
    )

    [r] = text_zipf_fit(spark, SF).collect()
    # the synthetic fixture's vocabulary can be smaller than ZIPF_V
    assert 2 <= r["v_terms"] <= ZIPF_V
    assert -3.0 < r["zipf_slope"] < -0.05


def test_simhash_hamming_audit_counts_match_brute_force(spark):
    from collections import Counter

    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        SIMHASH_AUDIT_MAXD,
        dedup_simhash,
        dedup_simhash_hamming_audit,
    )

    fps = [r["simhash16"] for r in dedup_simhash(spark, SF).collect()]
    expected = Counter()
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            d = bin(fps[i] ^ fps[j]).count("1")
            if d <= SIMHASH_AUDIT_MAXD:
                expected[d] += 1
    got = {
        r["hamming"]: r["n_pairs"]
        for r in dedup_simhash_hamming_audit(spark, SF).collect()
    }
    assert got == dict(expected)


def test_seasonal_anomaly_reference_is_weekday_exact(spark):
    from collections import defaultdict

    from conduit_connector_s3_iceberg_spark.plans.events import (
        CUSUM_SCALE,
        events_seasonal_anomaly,
    )

    rows = events_seasonal_anomaly(spark, SF).collect()
    assert rows
    # recompute each (type, weekday) mean from the emitted days and check
    # the scaled reference matches
    cells = defaultdict(list)
    for r in rows:
        cells[(r["event_type"], r["day"].weekday())].append(r)
    for (_t, _d), rs in cells.items():
        ref = round(CUSUM_SCALE * sum(r["x"] for r in rs) / len(rs))
        for r in rs:
            assert r["dow_mean_scaled"] == ref
            assert r["resid_scaled"] == r["x"] * CUSUM_SCALE - ref


def test_weighted_manifest_composes_both_signals(spark):
    import math

    from conduit_connector_s3_iceberg_spark.operators.corpus import (
        pipeline_weighted_manifest,
    )

    rows = pipeline_weighted_manifest(spark, SF).collect()
    assert rows
    for r in rows:
        # singleton clusters contribute ~0 from the soft term: combined is
        # then the DSIR tilt alone (within Mitchell quantization slack)
        if r["cluster_size"] == 1:
            assert abs(r["combined_log2"] - r["dsir_logw"]) < 1e-9
        else:
            # duplicates are down-weighted by ~log2(cluster_size)
            expected = r["dsir_logw"] - math.log2(r["cluster_size"])
            assert abs(r["combined_log2"] - expected) < 0.2


def test_bot_regularity_flags_synthetic_metronome(spark):
    from conduit_connector_s3_iceberg_spark.plans.events import (
        events_bot_regularity,
    )

    rows = events_bot_regularity(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["cv2_scaled"] >= 0
        assert r["too_regular"] == (r["cv2_scaled"] < 100_000)


def test_cluster_purity_and_source_templates(spark):
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        dedup_source_templates,
    )
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        emb_cluster_purity,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    purity = emb_cluster_purity(spark, SF).collect()
    n = load_table(spark, SF, "embeddings").count()
    assert sum(r["n_members"] for r in purity) == n
    for r in purity:
        assert 0.0 < r["purity"] <= 1.0
        assert r["n_majority"] <= r["n_members"]

    for r in dedup_source_templates(spark, SF).collect():
        assert r["n_occ"] >= 2
        assert r["template"]


def test_cumulative_reach_is_monotone_and_bounded(spark):
    from conduit_connector_s3_iceberg_spark.plans.events import (
        events_cumulative_reach,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = sorted(
        events_cumulative_reach(spark, SF).collect(), key=lambda r: r["day"]
    )
    total_users = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert rows[-1]["cumulative_reach"] == total_users
    prev = 0
    for r in rows:
        assert r["cumulative_reach"] == prev + r["new_users"]
        assert r["dau"] <= r["cumulative_reach"]
        prev = r["cumulative_reach"]


def test_chunk_savings_accounting(spark):
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        dedup_chunk_savings,
    )

    [r] = dedup_chunk_savings(spark, SF).collect()
    assert r["n_unique_chunks"] <= r["n_chunk_instances"]
    assert r["stored_bytes"] <= r["logical_bytes"]
    assert 0.0 <= r["savings_ratio"] < 1.0


def test_path_to_purchase_counts_match_transition_mass(spark):
    from conduit_connector_s3_iceberg_spark.plans.events import (
        events_path_to_purchase,
    )

    rows = events_path_to_purchase(spark, SF).collect()
    assert rows
    assert all(r["n_paths"] > 0 for r in rows)


def test_sample_consistency_has_zero_violations(spark):
    from conduit_connector_s3_iceberg_spark.operators.sampling import (
        sample_consistency_audit,
    )

    [r] = sample_consistency_audit(spark, SF).collect()
    assert r["n_violations"] == 0
    assert r["n_5pct"] <= r["n_10pct"] <= r["n_docs"]
