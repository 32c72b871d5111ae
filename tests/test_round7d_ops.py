"""Round-7 fourth-wave operator tests: SALSA hubs/authorities,
Kneser-Ney smoothing, exponentially decayed popularity."""

from __future__ import annotations

from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.001"


def test_salsa_partitions_nodes_and_conserves_mass(spark):
    """Hub rows are exactly the trading customers, auth rows exactly the
    traded suppliers; the degree-divided walk only loses floor mass, so
    each side's total stays in (0, SCALE]."""
    from conduit_connector_s3_iceberg_spark.operators.graph import (
        PR_SCALE,
        graph_salsa_authority,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    out = graph_salsa_authority(spark, SF001).cache()
    sides = dict(
        out.groupBy("side").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    orders = load_table(spark, SF001, "orders")
    li = load_table(spark, SF001, "lineitem")
    pairs = orders.join(
        li, orders.o_orderkey == li.l_orderkey
    ).select("o_custkey", "l_suppkey")
    assert sides["hub"] == pairs.select("o_custkey").distinct().count()
    assert sides["auth"] == pairs.select("l_suppkey").distinct().count()
    mass = {
        r["side"]: r["m"]
        for r in out.groupBy("side").agg(F.sum("score_scaled").alias("m")).collect()
    }
    assert 0 < mass["hub"] <= PR_SCALE
    assert 0 < mass["auth"] <= PR_SCALE
    # no negative or null scores anywhere
    assert out.filter(F.col("score_scaled") < 0).count() == 0
    out.unpersist()


def test_salsa_authority_tracks_endorsement_not_just_degree(spark):
    """Authority is walk mass, not raw in-degree: scores are positive for
    every supplier and the id namespace is disjoint (c*/s* prefixes)."""
    from conduit_connector_s3_iceberg_spark.operators.graph import (
        graph_salsa_authority,
    )

    out = graph_salsa_authority(spark, SF001)
    bad = out.filter(
        ~(
            (F.col("side") == "hub") & F.col("id").startswith("c")
            | (F.col("side") == "auth") & F.col("id").startswith("s")
        )
    ).count()
    assert bad == 0
    assert out.filter((F.col("side") == "auth") & (F.col("score_scaled") <= 0)).count() == 0


def test_kneser_ney_bounded_and_shares_front_end(spark):
    """Mean KN probability is a probability (0 < p <= 1), and the doc-side
    bigram totals agree with lm_bigram_score's shared front end."""
    from conduit_connector_s3_iceberg_spark.operators.lm import (
        lm_bigram_score,
        lm_kneser_ney,
    )

    kn = lm_kneser_ney(spark, SF001).cache()
    assert kn.filter(
        (F.col("mean_kn_prob") <= 0) | (F.col("mean_kn_prob") > 1.0)
    ).count() == 0
    mle = lm_bigram_score(spark, SF001).select(
        "doc_id", F.col("n_bigrams").alias("n_mle")
    )
    joined = kn.join(mle, "doc_id")
    assert joined.count() == kn.count()
    assert joined.filter(F.col("n_bigrams") != F.col("n_mle")).count() == 0
    kn.unpersist()


def test_kneser_ney_discount_lowers_frequent_bigram_mass(spark):
    """KN discounts observed counts (D = 3/4), so the corpus-mean KN score
    never exceeds the MLE fluency by more than the quantization grain, and
    strictly differs from it (the smoothing does something)."""
    from conduit_connector_s3_iceberg_spark.operators.lm import (
        lm_bigram_score,
        lm_kneser_ney,
    )

    kn = lm_kneser_ney(spark, SF001).select("doc_id", "mean_kn_prob")
    mle = lm_bigram_score(spark, SF001).select("doc_id", "mean_bigram_prob")
    row = (
        kn.join(mle, "doc_id")
        .agg(
            F.avg("mean_kn_prob").alias("kn"),
            F.avg("mean_bigram_prob").alias("mle"),
            F.max(F.abs(F.col("mean_kn_prob") - F.col("mean_bigram_prob"))).alias(
                "maxdiff"
            ),
        )
        .collect()[0]
    )
    assert row["maxdiff"] > 0, "KN == MLE everywhere; smoothing is a no-op"
    # interpolated KN redistributes but cannot exceed MLE mass corpus-wide
    # by more than rounding grain
    assert row["kn"] <= row["mle"] + 1e-6


def test_decayed_popularity_totals_and_rank(spark):
    """Per-type event totals reconcile with the raw table; the decayed
    score is bounded by undecayed mass; ranks are a 1..n permutation
    aligned with score order."""
    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        DECAY_SCALE,
        events_decayed_popularity,
    )
    from conduit_connector_s3_iceberg_spark.sources.tables import load_table

    out = events_decayed_popularity(spark, SF001).cache()
    rows = sorted(out.collect(), key=lambda r: r["rnk"])
    raw = dict(
        load_table(spark, SF001, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {r["event_type"]: r["n_events"] for r in rows} == raw
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    scores = [r["score_scaled"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 0 < r["score_scaled"] <= r["n_events"] * DECAY_SCALE
    out.unpersist()


def test_decay_weight_table_is_truncating_geometric():
    """The static weight table is the exact floor recurrence, strictly
    decreasing until underflow, starting at SCALE."""
    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        DECAY_MAX_AGE,
        DECAY_SCALE,
        _decay_weights,
    )

    w = _decay_weights()
    assert len(w) == DECAY_MAX_AGE
    assert w[0] == (0, DECAY_SCALE)
    for (a0, w0), (a1, w1) in zip(w, w[1:]):
        assert a1 == a0 + 1 and w1 == w0 * 9 // 10
    assert w[300][1] == 0  # fully decayed tail contributes exactly nothing


def _event_feed(spark, tmp_path, n_epochs=3):
    """sf0.001 events split into event_id-ordered parquet chunks."""
    import os

    ev = (
        spark.read.parquet(SF001 + "/events.parquet")
        .select("event_id", "ts", "event_type")
        .orderBy("event_id")
        .toPandas()
    )
    feed = tmp_path / "evfeed"
    feed.mkdir()
    n = len(ev)
    cuts = [n * i // n_epochs for i in range(n_epochs + 1)]
    for i in range(n_epochs):
        p = feed / f"chunk{i}.parquet"
        # pandas defaults to nanosecond timestamps, which Spark's parquet
        # reader rejects — coerce to the micros the engine tables use
        ev.iloc[cuts[i] : cuts[i + 1]].to_parquet(
            p, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(feed), spark.read.parquet(str(feed)).schema


def test_decayed_popularity_stream_matches_batch(spark, tmp_path):
    """Day-grain counts maintained from a 3-epoch event feed serve scores
    bit-identical to the batch query — the decay is serve-time arithmetic
    over the maintained grid, so streaming==batch exactly."""
    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        events_decayed_popularity,
    )
    from conduit_connector_s3_iceberg_spark.streaming.ivm import (
        decayed_popularity_from_summary,
        maintain_decayed_popularity_stream,
    )
    from conduit_connector_s3_iceberg_spark.writer import ParquetWarehouse

    feed, schema = _event_feed(spark, tmp_path)
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    maintain_decayed_popularity_stream(
        stream, wh, "daypop", str(tmp_path / "ckpt")
    ).awaitTermination(180)

    got = sorted(
        tuple(r) for r in decayed_popularity_from_summary(wh, "daypop").collect()
    )
    want = sorted(
        tuple(r) for r in events_decayed_popularity(spark, SF001).collect()
    )
    assert got == want


def test_decayed_popularity_replay_is_idempotent(spark, tmp_path):
    """Re-delivering an epoch must not double-count its day-grain deltas."""
    from conduit_connector_s3_iceberg_spark.streaming.ivm import (
        SIGN_COL,
        apply_summary_delta,
    )
    from conduit_connector_s3_iceberg_spark.writer import (
        ParquetWarehouse,
        epoch_already_applied,
        mark_epoch_applied,
    )
    from pyspark.sql import functions as F2

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    batch = spark.read.parquet(SF001 + "/events.parquet").limit(50)
    delta = batch.select(
        F2.lit(1).alias(SIGN_COL), F2.to_date("ts").alias("d"), "event_type"
    )
    for _ in range(2):  # second delivery of the same epoch must be a no-op
        if not epoch_already_applied(wh, "pop__applied_epoch", 0):
            apply_summary_delta(wh, "pop", delta, ["event_type", "d"], [])
            mark_epoch_applied(wh, "pop__applied_epoch", spark, 0)
    total = wh.read("pop").agg(F2.sum("n_rows").alias("s")).collect()[0]["s"]
    assert total == 50


def test_isotropy_matches_bruteforce_pairs(spark):
    """The gram-identity mean pairwise cosine equals the brute-force
    all-pairs mean of the QUANTIZED unit vectors (same ISO_SCALE grid),
    per label, to float tolerance."""
    import itertools

    import numpy as np

    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        ISO_SCALE,
        emb_isotropy,
    )

    emb = spark.read.parquet(SF001 + "/embeddings.parquet").toPandas()
    by_label = {}
    for _, row in emb.iterrows():
        v = np.asarray(row["embedding"], dtype=np.float64)
        u = np.array(
            [round(x / float(np.sqrt((v * v).sum())) * ISO_SCALE) for x in v]
        )
        by_label.setdefault(row["label"], []).append(u)
    got = {r["label"]: r for r in emb_isotropy(spark, SF001).collect()}
    for label, us in by_label.items():
        n = len(us)
        brute = sum(
            float(np.dot(a, b))
            for a, b in itertools.combinations(us, 2)
        ) * 2.0 / (n * (n - 1) * ISO_SCALE * ISO_SCALE)
        assert got[label]["n_vecs"] == n
        assert abs(got[label]["mean_pairwise_cosine"] - brute) < 1e-9


def test_pruning_audit_zorder_beats_linear_on_user_points(spark):
    """The audit must show the layout trade: Z-order opens strictly fewer
    files per user-point query than time-linear (whose files all span the
    full user range), while linear wins or ties on day points."""
    from conduit_connector_s3_iceberg_spark.operators.layout import (
        layout_pruning_audit,
    )

    rows = {
        (r["layout"], r["dim"]): r
        for r in layout_pruning_audit(spark, SF001).collect()
    }
    assert rows[("zorder", "user_point")]["avg_files_per_query"] < (
        rows[("linear", "user_point")]["avg_files_per_query"]
    )
    assert rows[("linear", "day_point")]["avg_files_per_query"] <= (
        rows[("zorder", "day_point")]["avg_files_per_query"]
    )
    for r in rows.values():
        assert 0 < r["frac_files_scanned"] <= 1.0
        assert r["file_hits"] <= r["n_queries"] * r["n_files"]


def test_filtered_ann_prefilter_dominates_postfilter(spark):
    """Pre-filtering can only help: per query it returns at least as many
    same-label results and at least the recall of post-filtering (both
    draw from the same probed candidate pool)."""
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        TOP_K,
        sim_ann_filtered,
    )

    rows = sim_ann_filtered(spark, SF001).collect()
    by_q = {}
    for r in rows:
        assert 0 <= r["recall"] <= 1.0
        assert r["n_returned"] <= TOP_K
        assert r["n_hits"] <= min(r["n_returned"], r["n_exact"])
        by_q.setdefault(r["query_id"], {})[r["strategy"]] = r
    assert by_q, "no query produced results"
    for q, s in by_q.items():
        if "prefilter" in s and "postfilter" in s:
            assert s["prefilter"]["n_returned"] >= s["postfilter"]["n_returned"]
            assert s["prefilter"]["recall"] >= s["postfilter"]["recall"]


def test_forecast_backtest_reconciles_and_covers_horizons(spark):
    """Every series gets horizons 1..3; forecast counts shrink as the
    horizon grows; MAE columns reconcile exactly with the integer error
    sums they were emitted from."""
    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        TS_SCALE,
        events_forecast_backtest,
    )

    rows = events_forecast_backtest(spark, SF001).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["horizon"]] = r
        assert r["mae_holt"] == r["sum_err_holt"] / (r["n_forecasts"] * TS_SCALE)
        assert r["mae_naive"] == r["sum_err_naive"] / (r["n_forecasts"] * TS_SCALE)
        if r["sum_err_naive"] != 0:
            assert r["skill"] == r["sum_err_holt"] / r["sum_err_naive"]
    for et, hs in by_type.items():
        assert set(hs) == {1, 2, 3}
        assert hs[1]["n_forecasts"] >= hs[2]["n_forecasts"] >= hs[3]["n_forecasts"]


def test_forecast_backtest_agrees_with_holt_final_state(spark):
    """The backtest's replayed recursion reaches the same terminal state
    the smoother emits: a 1-step forecast made at the last backtestable
    origin uses a state on the smoother's exact trajectory (cross-checked
    by replaying the recursion in pure Python)."""
    import math

    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        TS_SCALE,
        _dense_daily_series,
        events_holt_smoothing,
    )

    series = _dense_daily_series(spark, SF001).collect()
    by_type = {}
    for r in series:
        by_type.setdefault(r["event_type"], {})[r["t"]] = r["x"]
    final = {r["event_type"]: r for r in events_holt_smoothing(spark, SF001).collect()}
    for et, xs_map in by_type.items():
        xs = [xs_map[t] * TS_SCALE for t in sorted(xs_map)]
        l, b = xs[0], xs[1] - xs[0]
        for x in xs[2:]:
            l_new = math.trunc((x + 3 * (l + b)) / 4)
            b = math.trunc(((l_new - l) + 3 * b) / 4)
            l = l_new
        assert final[et]["level_scaled"] == l
        assert final[et]["trend_scaled"] == b


def test_score_correlation_bounds_and_bruteforce(spark):
    """rho stays in [-1, 1] and matches a pandas brute-force Spearman
    (same doc_id tie-break) per source."""
    from conduit_connector_s3_iceberg_spark.operators.lm import lm_bigram_score
    from conduit_connector_s3_iceberg_spark.operators.text import (
        text_quality_score,
        text_score_correlation,
    )

    got = {r["source"]: r for r in text_score_correlation(spark, SF001).collect()}
    q = text_quality_score(spark, SF001).select("doc_id", "quality").toPandas()
    f = lm_bigram_score(spark, SF001).select("doc_id", "fluency_scaled").toPandas()
    docs = spark.read.parquet(SF001 + "/documents.parquet").select(
        "doc_id", "source"
    ).toPandas()
    j = q.merge(f, on="doc_id").merge(docs, on="doc_id")
    for source, grp in j.groupby("source"):
        rq = {
            d: i + 1
            for i, d in enumerate(
                grp.sort_values(["quality", "doc_id"])["doc_id"]
            )
        }
        rf = {
            d: i + 1
            for i, d in enumerate(
                grp.sort_values(["fluency_scaled", "doc_id"])["doc_id"]
            )
        }
        n = len(grp)
        sd2 = sum((rq[d] - rf[d]) ** 2 for d in grp["doc_id"])
        want = 1.0 - 6.0 * sd2 / (n * (n * n - 1)) if n > 1 else None
        r = got[source]
        assert r["n_docs"] == n and r["sum_d2"] == sd2
        assert -1.0 <= r["spearman_rho"] <= 1.0
        assert abs(r["spearman_rho"] - want) < 1e-12


def test_int8_recall_matches_pandas_bruteforce(spark):
    """Overlap@k per query matches a pandas replay of both rankings
    (same quantizer, same tie-break); recall reconciles with n_overlap;
    top_missed_rank is NULL iff overlap is full."""
    import numpy as np

    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        N_QUERIES,
        QUANT_LEVELS,
        TOP_K,
        emb_int8_recall,
    )

    got = {r["query_id"]: r for r in emb_int8_recall(spark, SF001).collect()}
    pdf = spark.read.parquet(SF001 + "/embeddings.parquet").toPandas()
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=np.float64) for r in pdf.itertuples()}
    nrm = {v: float(np.sqrt((x * x).sum())) for v, x in vecs.items()}
    scale = {v: QUANT_LEVELS / np.abs(x).max() for v, x in vecs.items()}
    codes = {v: np.round(x * scale[v]).astype(np.int64) for v, x in vecs.items()}
    for qid in range(N_QUERIES):
        exact, approx = [], []
        for v, x in vecs.items():
            if v == qid:
                continue
            exact.append((-(float(vecs[qid] @ x) / (nrm[qid] * nrm[v])), v))
            approx.append((
                -(float(codes[qid] @ codes[v]) / (scale[qid] * scale[v])
                  / (nrm[qid] * nrm[v])), v))
        topf = {v for _, v in sorted(exact)[:TOP_K]}
        topq = {v for _, v in sorted(approx)[:TOP_K]}
        r = got[qid]
        assert r["n_overlap"] == len(topf & topq)
        assert r["recall"] == r["n_overlap"] / float(TOP_K)
        missed = {v for v in topf if v not in topq}
        if missed:
            ranks = {v: i + 1 for i, (_, v) in enumerate(sorted(exact))}
            assert r["top_missed_rank"] == min(ranks[v] for v in missed)
        else:
            assert r["top_missed_rank"] is None
