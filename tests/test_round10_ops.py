"""Round-10 operator wave: seeded PPR, Bradley–Terry, effective rank.

Semantic invariants beyond the oracle hash-match (which the registry
sweep already covers): restart-mass locality for the personalized
PageRank, win-rate consistency and model fit for the Bradley–Terry
fixed point, and spectral bounds for the participation-ratio rank.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conduit_connector_s3_iceberg_spark.operators.graph import (
    PPR_SEED_MAX_KEY,
    PR_SCALE,
    graph_ppr_seeded,
)
from conduit_connector_s3_iceberg_spark.operators.similarity import (
    DIM,
    emb_effective_rank,
)
from conduit_connector_s3_iceberg_spark.operators.timeseries import (
    BT_PSCALE,
    events_bradley_terry,
)

SF001 = "/root/testdata/sf0.001"


# ----------------------------------------------------- graph_ppr_seeded ---


def test_ppr_mass_conserved_and_seeds_dominate(spark):
    rows = graph_ppr_seeded(spark, SF001).collect()
    seeds = [r for r in rows if r["is_seed"] == 1]
    others = [r for r in rows if r["is_seed"] == 0]
    assert 1 <= len(seeds) <= PPR_SEED_MAX_KEY + 1  # suppkey is 0-based
    # undirected graph, no dangling mass: total rank stays within integer
    # floor-loss of SCALE (each node loses < 1 unit per div, 6 rounds)
    total = sum(r["rank_scaled"] for r in rows)
    assert 0 < total <= PR_SCALE
    assert total > PR_SCALE - 40 * len(rows)
    # restart mass lands only on seeds: every seed outranks the median
    # non-seed (teleport gives seeds 0.15/|seeds| every round)
    med = sorted(r["rank_scaled"] for r in others)[len(others) // 2]
    for s in seeds:
        assert s["rank_scaled"] > med


def test_ppr_rank_zero_iff_disconnected_from_seeds(spark):
    # every node in this connected trade graph is reachable from a seed
    # within 6 rounds at sf0.001, so no rank collapses to zero — and any
    # zero would mean teleport mass leaked somewhere it shouldn't
    rows = graph_ppr_seeded(spark, SF001).collect()
    reachable = [r for r in rows if r["rank_scaled"] > 0]
    assert len(reachable) >= len(rows) * 0.9


# ------------------------------------------------- events_bradley_terry ---


def test_bt_wins_losses_and_strength_consistency(spark):
    rows = events_bradley_terry(spark, SF001).collect()
    assert rows, "no event types with decided comparisons"
    for r in rows:
        assert r["wins"] + r["losses"] == r["comparisons"]
        assert r["strength_scaled"] >= 1
        assert abs(r["strength"] - r["strength_scaled"] / BT_PSCALE) < 1e-12
    # normalization keeps total strength near |types| * PSCALE
    total = sum(r["strength_scaled"] for r in rows)
    assert abs(total - len(rows) * BT_PSCALE) <= len(rows) * 2


def test_bt_strength_tracks_win_rate(spark):
    # the MM fixed point must rank a type that wins most of its
    # comparisons above one that loses most of them
    rows = sorted(
        events_bradley_terry(spark, SF001).collect(),
        key=lambda r: r["wins"] / r["comparisons"],
    )
    weakest, strongest = rows[0], rows[-1]
    if strongest["wins"] / strongest["comparisons"] > (
        weakest["wins"] / weakest["comparisons"] + 0.2
    ):
        assert strongest["strength"] > weakest["strength"]


# -------------------------------------------------- emb_effective_rank ----


def test_effective_rank_bounds_and_consistency(spark):
    row = emb_effective_rank(spark, SF001).collect()[0]
    # PR of any non-degenerate spectrum lies in [1, DIM]
    assert 1.0 <= row["effective_rank"] <= DIM
    assert abs(row["rank_ratio"] - row["effective_rank"] / DIM) < 1e-12
    assert row["trace_scaled"] > 0  # total variance is positive
    assert row["frob2"] > 0
    # synthetic embeddings are near-isotropic by construction — the
    # collapse detector must NOT fire (PR well above a handful of dims)
    assert row["effective_rank"] > DIM * 0.5


# ---------------------------------------------- mm_clip_alignment_gate ----


def test_alignment_gate_counts_and_bounds(spark):
    from conduit_connector_s3_iceberg_spark.operators.multimodal import (
        MM_ALIGN_SCALE,
        mm_clip_alignment_gate,
    )

    rows = mm_clip_alignment_gate(spark, SF001).collect()
    assert rows
    total_pairs = sum(r["n_pairs"] for r in rows)
    assert total_pairs == 500 // 2  # every adjacent even/odd pair at sf0.001
    for r in rows:
        assert 0 <= r["kept"] <= r["n_pairs"]
        assert abs(r["retention"] - r["kept"] / r["n_pairs"]) < 1e-12
        # cosine of unit vectors lies in [-1, 1]
        assert -1.0 <= r["mean_alignment"] <= 1.0
        assert (
            abs(
                r["mean_alignment"]
                - r["align_scaled"] / r["n_pairs"] / MM_ALIGN_SCALE
            )
            < 1e-9
        )


# ------------------------------------------------ events_sprt_boundary ----


def test_sprt_decisions_consistent(spark):
    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        events_sprt_boundary,
    )

    rows = events_sprt_boundary(spark, "/root/testdata/sf0.01").collect()
    assert rows
    decided = 0
    for r in rows:
        assert r["successes"] <= r["trials"]
        assert r["decision"] in ("reject_null", "accept_null", "continue")
        if r["decision"] == "continue":
            assert r["decision_day"] is None
        else:
            assert r["decision_day"] is not None
            decided += 1
        # a decided-down type must have accumulated strongly negative LLR
        if r["decision"] == "accept_null":
            assert r["llr_final_bits"] < 0
    # at sf0.01 the global-vs-type rate spread decides at least one type
    assert decided >= 1


# ------------------------------------------------------- sprt_stream ------


def test_sprt_stream_matches_batch_across_restart(spark, tmp_path):
    """The stream's latched per-series verdict (decision, decision day,
    final LLR) equals the batch events_sprt_boundary rows when the same
    daily history is replayed over TWO epochs with a checkpoint restart
    between them — the CUSUM-twin protocol."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        SPRT_SUCCESS_CENTS,
        _SPRT_BOUND_ARG,
        _SPRT_L0_SPARK,
        _sprt_mlog_spark,
        events_sprt_boundary,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table
    from conduit_connector_s3_iceberg_spark.streaming.drift import sprt_stream

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        (F.round(F.col("value") * 100) >= SPRT_SUCCESS_CENTS)
        .cast("int")
        .alias("sc"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.sum("sc").cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    # frozen LLR constants: same Mitchell-log expressions as the batch op
    consts = (
        ev.agg(
            F.sum("sc").cast("bigint").alias("s0"),
            F.count(F.lit(1)).cast("bigint").alias("n0"),
        )
        .select(
            F.expr(_SPRT_L0_SPARK).cast("bigint").alias("l0"),
            F.expr(_sprt_mlog_spark(_SPRT_BOUND_ARG))
            .cast("bigint")
            .alias("bound"),
        )
        .collect()[0]
    )
    l1, l0, bound = 1_000_000, int(consts["l0"]), int(consts["bound"])

    def add_epoch_file(df, name):
        stage = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(stage))
        [part] = glob.glob(str(stage / "part-*.parquet"))
        shutil.move(part, str(src_dir / f"{name}.parquet"))

    days = sorted({r["day"] for r in daily.select("day").distinct().collect()})
    cut = days[len(days) // 2]
    src_dir = tmp_path / "sprt_src"
    src_dir.mkdir()
    out_dir = str(tmp_path / "sprt_out")
    ckpt = str(tmp_path / "ckpt_sprt")

    def run_epoch():
        q = (
            sprt_stream(
                spark.readStream.schema(daily.schema).parquet(str(src_dir)),
                l1,
                l0,
                bound,
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    add_epoch_file(daily.filter(F.col("day") <= F.lit(cut)), "e0")
    run_epoch()
    add_epoch_file(daily.filter(F.col("day") > F.lit(cut)), "e1")
    run_epoch()

    got_rows = (
        spark.read.schema(
            "event_type string, day date, k long, n long, cum_scaled long,"
            " decision string, decision_day date"
        )
        .parquet(out_dir)
        .collect()
    )
    latest = {}
    for r in got_rows:
        if r["event_type"] not in latest or r["day"] > latest[r["event_type"]]["day"]:
            latest[r["event_type"]] = r
    batch = {r["event_type"]: r for r in events_sprt_boundary(spark, sf).collect()}
    assert set(latest) == set(batch)
    for t, b in batch.items():
        s = latest[t]
        assert s["cum_scaled"] == b["llr_final_scaled"], t
        assert s["decision"] == b["decision"], t
        assert s["decision_day"] == b["decision_day"], t


# --------------------------------------------- sample_pps_systematic ------


def test_pps_systematic_invariants(spark):
    from conduit_connector_s3_iceberg_spark.operators.sampling import (
        PPS_K,
        sample_pps_systematic,
    )

    rows = sample_pps_systematic(spark, SF001).collect()
    # Σ hits = k by construction — the Madow systematic-sampling identity
    assert sum(r["hits"] for r in rows) == PPS_K
    for r in rows:
        assert r["n_selected"] <= r["n_items"]
        assert r["n_certainty"] <= r["n_selected"]
        assert r["sel_weight"] <= r["weight"]
    # selection tracks weight share: every source with weight share
    # >= 2/k must receive at least one hit (its interval spans a step)
    total_w = sum(r["weight"] for r in rows)
    for r in rows:
        if r["weight"] / total_w >= 2 / PPS_K:
            assert r["hits"] >= 1, r["source"]


# ------------------------------------------- emb_triplet_margin_audit -----


def test_triplet_margin_probe_partition(spark):
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        RECALL_QUERIES,
        emb_triplet_margin_audit,
    )

    rows = emb_triplet_margin_audit(spark, SF001).collect()
    # every probe with both a positive and a negative lands in exactly
    # one label row; sf0.001 has all labels populated so none drop
    assert sum(r["n_probes"] for r in rows) == RECALL_QUERIES
    for r in rows:
        assert 0 <= r["violations"] <= r["n_probes"]
        assert abs(
            r["mean_margin"] - r["margin_scaled"] / r["n_probes"] / 1e6
        ) < 1e-9


# ---------------------------------------------------- events_uplift_qini --


def test_qini_deciles_consistent(spark):
    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        QINI_Q,
        events_uplift_qini,
    )

    rows = events_uplift_qini(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == QINI_Q
    cnt = cnc = cct = ccc = 0
    for r in sorted(rows, key=lambda r: r["decile"]):
        assert r["conv_t"] <= r["n_t"] and r["conv_c"] <= r["n_c"]
        cnt += r["n_t"]; cnc += r["n_c"]; cct += r["conv_t"]; ccc += r["conv_c"]
        if cnc > 0:
            want = cct - ccc * cnt / cnc
            assert abs(r["qini_cum"] - want) < 1e-9
    # the hash split is ~50/50 over the user universe
    assert 0.3 < cnt / (cnt + cnc) < 0.7


# ----------------------------------------------------------- mm_scene_cuts


def test_scene_cuts_consistency(spark):
    from conduit_connector_s3_iceberg_spark.operators.multimodal import (
        FRAME_STRIDE,
        mm_scene_cuts,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    rows = {r["doc_id"]: r for r in mm_scene_cuts(spark, SF001).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF001, "documents").collect()
    }
    assert set(rows) == set(docs)
    for doc_id, text in docs.items():
        r = rows[doc_id]
        want_nf = max(-(-len(text) // FRAME_STRIDE), 1)
        assert r["n_frames"] == want_nf, doc_id
        assert 0 <= r["n_cuts"] <= max(r["n_frames"] - 1, 0)
        assert abs(
            r["mean_shot_frames"] - r["n_frames"] / (r["n_cuts"] + 1)
        ) < 1e-12


# --------------------------------------------- sim_lsh_multiprobe_recall --


def test_multiprobe_recall_monotone(spark):
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        sim_lsh_multiprobe_recall,
    )

    rows = sorted(
        sim_lsh_multiprobe_recall(spark, SF001).collect(),
        key=lambda r: r["probe_level"],
    )
    assert [r["probe_level"] for r in rows] == [0, 1, 2]
    # probing strictly widens the candidate set and never hurts recall
    for a, b in zip(rows, rows[1:]):
        assert b["candidates"] >= a["candidates"]
        assert b["recall"] >= a["recall"]
        assert b["scan_frac"] >= a["scan_frac"]
    for r in rows:
        assert 0.0 <= r["recall"] <= 1.0
        assert 0.0 < r["scan_frac"] <= 1.0


# ------------------------------------------------------- sketch_ams_f2 ----


def test_ams_f2_estimator_sane(spark):
    from conduit_connector_s3_iceberg_spark.operators.sketches import (
        AMS_K,
        sketch_ams_f2,
    )

    row = sketch_ams_f2(spark, SF001).collect()[0]
    assert row["k_estimators"] == AMS_K
    assert row["f2_exact"] > 0
    # K=16 averaged estimators: relative stderr ~ sqrt(2/K) ~ 0.35 —
    # a 3-sigma band is the sane-estimate envelope, not a tight bound
    assert 0.0 < row["ratio"] < 2.5
