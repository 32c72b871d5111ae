"""Invariant tests for the round-4 third-wave operators: link-prediction
Jaccard, multi-touch attribution, within-source quality calibration."""

from __future__ import annotations

from pyspark.sql import functions as F

from conduit_connector_s3_iceberg_spark.operators.graph import (
    LINK_TOP,
    graph_link_jaccard,
)
from conduit_connector_s3_iceberg_spark.operators.text import (
    text_quality_calibration,
)
from conduit_connector_s3_iceberg_spark.plans.events import (
    ATTR_SCALE,
    events_attribution,
)

SF = "/root/testdata/sf0.001"


def test_link_jaccard_bounds_and_ordering(spark):
    rows = graph_link_jaccard(spark, SF).collect()
    assert 0 < len(rows) <= LINK_TOP
    prev = None
    for r in rows:
        assert r["c1"] < r["c2"]
        assert 1 <= r["cn"] <= min(r["deg1"], r["deg2"])
        assert 0.0 < r["jaccard"] <= 1.0
        expected = r["cn"] / (r["deg1"] + r["deg2"] - r["cn"])
        assert r["jaccard"] == expected
        if prev is not None:
            assert r["jaccard"] <= prev
        prev = r["jaccard"]


def test_attribution_credit_conservation(spark):
    """Each conversion hands out exactly one first-touch, one last-touch,
    and ~SCALE of linear credit — so the per-channel totals must sum to
    the number of attributed conversions (and its scaled equivalent,
    within n_convs/2 of rounding slack)."""
    rows = events_attribution(spark, SF).collect()
    assert rows
    n_first = sum(r["first_touch"] for r in rows)
    n_last = sum(r["last_touch"] for r in rows)
    linear = sum(r["linear_scaled"] for r in rows)
    assert n_first == n_last > 0
    # linear credit sums to n_convs * SCALE up to per-touch rounding (each
    # conversion's n rounded credits differ from SCALE by < n/2 ulp-units)
    assert abs(linear - n_first * ATTR_SCALE) < n_first * ATTR_SCALE * 0.001
    for r in rows:
        assert r["first_touch"] <= r["n_touchpoints"]
        assert r["last_touch"] <= r["n_touchpoints"]


def test_calibration_each_source_keeps_its_own_top_decile(spark):
    out = text_quality_calibration(spark, SF)
    per_src = (
        out.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("top_decile"), 1).otherwise(0)).alias("kept"),
            F.max("src_rank").alias("max_rank"),
            F.min("pct_in_source").alias("mn"),
            F.max("pct_in_source").alias("mx"),
        )
        .collect()
    )
    assert len(per_src) > 1, "fixture must have multiple sources"
    for r in per_src:
        assert r["kept"] == r["n"] // 10  # exactly the top decile, per source
        assert r["max_rank"] == r["n"]
        assert r["mn"] == 0.0 and r["mx"] == 1.0


def test_calibration_gate_differs_from_global_gate(spark):
    """The operator's reason to exist: the within-source top decile is NOT
    the same doc set as the global top decile whenever sources differ in
    score distribution."""
    out = text_quality_calibration(spark, SF).select(
        "doc_id", "quality", "top_decile"
    )
    n = out.count()
    global_top = {
        r["doc_id"]
        for r in out.orderBy(F.col("quality").desc(), "doc_id")
        .limit(n // 10)
        .collect()
    }
    per_source = {r["doc_id"] for r in out.filter("top_decile").collect()}
    assert len(per_source) > 0
    assert per_source != global_top


def test_length_bucket_accounting_is_exact(spark):
    from conduit_connector_s3_iceberg_spark.operators.corpus import (
        BATCH_TOKENS,
        pack_length_buckets,
    )

    rows = pack_length_buckets(spark, SF).collect()
    assert rows
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    assert sum(r["n_docs"] for r in rows) == n_docs  # partition of the corpus
    prev_cap = 0
    for r in rows:
        assert r["bucket_cap"] > prev_cap
        prev_cap = r["bucket_cap"]
        assert r["waste_bucketed"] == r["padded_tokens"] - r["total_tokens"]
        assert 0 <= r["waste_bucketed"] <= r["waste_naive"]
        assert 0.0 < r["efficiency"] <= 1.0
        cap_per_batch = BATCH_TOKENS // r["bucket_cap"]
        assert r["n_batches"] == -(-r["n_docs"] // cap_per_batch)


def test_windowed_funnel_narrows_the_lifetime_funnel(spark):
    from conduit_connector_s3_iceberg_spark.plans.events import (
        events_windowed_funnel,
    )

    r = events_windowed_funnel(spark, SF).first()
    assert r["n_purchases"] > 0
    assert 0 <= r["n_full_chain"] <= r["n_click_within_hop"] <= r["n_purchases"]
    assert r["chain_rate"] == r["n_full_chain"] / r["n_purchases"]
    # the 1h hop must actually bind on the fixture (otherwise the op is
    # indistinguishable from an unbounded funnel)
    assert r["n_click_within_hop"] < r["n_purchases"]


def test_holt_smoothing_matches_python_recursion(spark):
    import math

    from pyspark.sql import functions as F2

    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        TS_SCALE,
        events_holt_smoothing,
    )

    out = {r["event_type"]: r for r in events_holt_smoothing(spark, SF).collect()}
    assert out
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_type", F2.col("ts").cast("date").alias("day"))
    )
    d0, d1 = ev.agg(F2.min("day"), F2.max("day")).first()
    n = (d1 - d0).days + 1
    counts = {
        (r["event_type"], (r["day"] - d0).days): r["count"]
        for r in ev.groupBy("event_type", "day").count().collect()
    }
    for et, row in out.items():
        xs = [counts.get((et, t), 0) * TS_SCALE for t in range(n)]
        l, b = xs[0], xs[1] - xs[0]
        for x in xs[2:]:
            l_new = math.trunc((x + 3 * (l + b)) / 4)
            b = math.trunc(((l_new - l) + 3 * b) / 4)
            l = l_new
        assert row["n_days"] == n
        assert row["level_scaled"] == l
        assert row["trend_scaled"] == b
        assert row["forecast_2"] == (l + 2 * b) / TS_SCALE


def test_markov_stationary_conserves_mass(spark):
    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        MK_SCALE,
        events_markov_stationary,
    )

    rows = events_markov_stationary(spark, SF).collect()
    assert len(rows) >= 2
    total = sum(r["stationary_scaled"] for r in rows)
    # each div-floor loses < 1 unit per (state, iteration): mass stays
    # within a whisker of the simplex
    assert MK_SCALE * 0.999 <= total <= MK_SCALE
    for r in rows:
        assert r["stationary_scaled"] > 0
        assert r["stationary"] == r["stationary_scaled"] / MK_SCALE
        assert 0.0 < r["empirical_share"] < 1.0


def test_window_tvf_each_event_in_two_windows(spark):
    from conduit_connector_s3_iceberg_spark.plans.events import q76_window_tvf

    out = q76_window_tvf(spark, SF)
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == 2 * n_events  # 2h window / 1h slide: exactly 2 each
    widths = out.select(
        (F.unix_micros(F.col("win_end").cast("timestamp"))
         - F.unix_micros(F.col("win_start").cast("timestamp"))).alias("w")
    ).distinct().collect()
    assert [r["w"] for r in widths] == [2 * 3600 * 1_000_000]


def test_lsh_recall_audit_bounds(spark):
    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        dedup_lsh_recall_audit,
    )

    r = dedup_lsh_recall_audit(spark, SF).first()
    assert r["n_exact_pairs"] > 0, "fixture must contain true near-dups"
    assert 0 <= r["n_true_candidates"] <= min(
        r["n_exact_pairs"], r["n_candidate_pairs"]
    )
    assert r["n_missed"] == r["n_exact_pairs"] - r["n_true_candidates"]
    assert r["candidate_recall"] == r["n_true_candidates"] / r["n_exact_pairs"]
    # 8 bands at j >= 0.5 give expected recall ~1-(1-j)^8 adjusted for the
    # 2-band rule — anything under half would mean the banding is broken
    assert r["candidate_recall"] >= 0.5


def test_truncation_curve_monotone_with_perfect_top(spark):
    from conduit_connector_s3_iceberg_spark.operators.similarity import (
        CURVE_WIDTHS,
        N_QUERIES,
        TOP_K,
        sim_truncation_curve,
    )

    rows = {r["width"]: r for r in sim_truncation_curve(spark, SF).collect()}
    assert sorted(rows) == CURVE_WIDTHS
    full = rows[CURVE_WIDTHS[-1]]
    assert full["n_hits"] == N_QUERIES * TOP_K and full["recall_at_k"] == 1.0
    for w, r in rows.items():
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert r["recall_at_k"] == r["n_hits"] / (N_QUERIES * TOP_K)
    # a shorter prefix cannot beat the full ranking it's measured against
    assert rows[CURVE_WIDTHS[0]]["recall_at_k"] < 1.0


def test_peak_concurrency_matches_naive_sweep(spark):
    from conduit_connector_s3_iceberg_spark.plans.events import (
        events_peak_concurrency,
        q22_sessionization,
    )

    got = events_peak_concurrency(spark, SF).first()
    sessions = q22_sessionization(spark, SF).collect()
    eps = []
    for s in sessions:
        eps.append((s["session_start"], 1))
        eps.append((s["session_end"], -1))
    eps.sort(key=lambda e: (e[0], -e[1]))  # starts before ends at ties
    active = best = 0
    best_ts = None
    for ts, d in eps:
        active += d
        if active > best:
            best, best_ts = active, ts
    assert got["n_sessions"] == len(sessions)
    assert got["max_concurrent"] == best
    assert got["at_ts"] == best_ts


def test_winnowing_selection_matches_python_reference(spark):
    import hashlib

    from conduit_connector_s3_iceberg_spark.operators.dedup import (
        WINNOW_W,
        dedup_winnowing_fingerprints,
    )

    out = dedup_winnowing_fingerprints(spark, SF).collect()
    assert out
    # independent reference: winnow every doc in python, group, compare top
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    from collections import defaultdict

    groups = defaultdict(set)
    occ = defaultdict(int)
    for d in docs:
        toks = d["text"].strip().split(" ")
        m = max(len(toks) - 2, 1)
        hs = [
            hashlib.md5(" ".join(toks[p : p + 3]).encode()).hexdigest()
            for p in range(m)
        ]
        selected = set()
        for t in range(0, m - WINNOW_W + 1):
            window = hs[t : t + WINNOW_W]
            mn = min(window)
            p_sel = max(i for i, h in enumerate(window, start=t) if h == mn)
            selected.add((p_sel, hs[p_sel]))
        for _, h in selected:
            groups[h].add(d["doc_id"])
            occ[h] += 1
    expected = sorted(
        ((h, len(ds), occ[h]) for h, ds in groups.items() if len(ds) >= 2),
        key=lambda r: (-r[1], -r[2], r[0]),
    )[: len(out)]
    got = [(r["fingerprint"], r["n_docs"], r["n_occurrences"]) for r in out]
    assert got == expected


def test_markov_attribution_shares_partition_removal_mass(spark):
    from conduit_connector_s3_iceberg_spark.operators.timeseries import (
        events_markov_attribution,
    )

    rows = events_markov_attribution(spark, SF).collect()
    channels = {r["channel"] for r in rows}
    assert "purchase" not in channels and "start" not in channels
    assert len(rows) >= 2
    tot = sum(r["removal_scaled"] for r in rows)
    assert tot > 0
    for r in rows:
        assert 0 <= r["removal_scaled"] <= tot
        assert 0.0 <= r["removal_effect"] <= 1.0 + 1e-9
        assert r["attribution_share"] == r["removal_scaled"] / tot
    assert abs(sum(r["attribution_share"] for r in rows) - 1.0) < 1e-9


def test_temperature_sweep_flattens_with_lower_t(spark):
    from conduit_connector_s3_iceberg_spark.operators.sampling import (
        mix_temperature_sweep,
    )

    rows = mix_temperature_sweep(spark, SF).collect()
    eff = {}
    shares = {}
    for r in rows:
        eff[r["temperature"]] = r["effective_sources"]
        shares.setdefault(r["temperature"], []).append(r["share"])
    assert set(eff) == {"0.25", "0.5", "0.75", "1.0"}
    n_sources = len(shares["1.0"])
    for t, ss in shares.items():
        assert abs(sum(ss) - 1.0) < 1e-9
        assert 1.0 <= eff[t] <= n_sources + 1e-9
    # lower temperature flattens: effective source count is monotone
    # non-increasing in T up to float noise (the fixture's sources are
    # near-uniform, so the curve can be flat to ~1e-14)
    tol = 1e-9
    assert eff["0.25"] >= eff["0.5"] - tol
    assert eff["0.5"] >= eff["0.75"] - tol
    assert eff["0.75"] >= eff["1.0"] - tol


def test_partition_advisor_flags_finer_spec_as_more_partitions(spark):
    from conduit_connector_s3_iceberg_spark.operators.layout import (
        layout_partition_advisor,
    )

    rows = {r["candidate"]: r for r in layout_partition_advisor(spark, SF).collect()}
    assert set(rows) == {"lang", "source", "lang,source"}
    # the composite spec partitions at least as finely as either column
    assert rows["lang,source"]["n_partitions"] >= max(
        rows["lang"]["n_partitions"], rows["source"]["n_partitions"]
    )
    for r in rows.values():
        assert r["rows_max"] >= r["rows_median"] > 0
        assert r["skew_ratio"] >= 1.0
        assert 0.0 < r["hottest_share"] <= 1.0


def test_groupwise_split_has_zero_leakage_where_doc_split_leaks(spark):
    from conduit_connector_s3_iceberg_spark.operators.corpus import (
        GROUP_SPLIT_SALT,
        corpus_groupwise_split,
    )
    from conduit_connector_s3_iceberg_spark.operators.dedup import dedup_simhash

    rows = corpus_groupwise_split(spark, SF).collect()
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    assert sum(r["n_docs"] for r in rows) == spark.read.parquet(
        f"{SF}/documents.parquet"
    ).count()
    for r in rows:
        assert r["n_leaky_docs"] == 0  # zero by construction
    # contrast: splitting each DOC independently leaks on the same groups
    # (the fixture has multi-doc SimHash families) — the reason this
    # operator exists
    fp = dedup_simhash(spark, SF)
    doc_split = fp.select(
        F.col("simhash16").alias("group_fp"),
        F.when(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(GROUP_SPLIT_SALT), F.col("doc_id").cast("string")
                    )
                ),
                1,
                2,
            )
            < "cc",
            "train",
        )
        .otherwise("eval")
        .alias("split"),
    )
    leaky_groups = (
        doc_split.groupBy("group_fp")
        .agg(F.countDistinct("split").alias("k"))
        .filter("k > 1")
        .count()
    )
    assert leaky_groups > 0


def test_winnowing_guarantees_one_fingerprint_per_window(spark):
    """The winnowing coverage guarantee (Schleimer et al., Thm 1): every
    window of W consecutive k-gram positions contains >= 1 selected
    fingerprint, and the selection density stays well under 1."""
    import hashlib

    from conduit_connector_s3_iceberg_spark.operators.dedup import WINNOW_W

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50).collect()
    checked = 0
    for d in docs:
        toks = d["text"].strip().split(" ")
        m = max(len(toks) - 2, 1)
        if m < WINNOW_W:
            continue
        hs = [
            hashlib.md5(" ".join(toks[p : p + 3]).encode()).hexdigest()
            for p in range(m)
        ]
        selected = set()
        for t in range(0, m - WINNOW_W + 1):
            window = hs[t : t + WINNOW_W]
            mn = min(window)
            p_sel = max(i for i, h in enumerate(window, start=t) if h == mn)
            selected.add(p_sel)
        for t in range(0, m - WINNOW_W + 1):
            assert any(t <= p <= t + WINNOW_W - 1 for p in selected)
        assert len(selected) < m  # strictly sparser than all positions
        checked += 1
    assert checked > 0
