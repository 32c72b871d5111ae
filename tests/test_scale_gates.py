"""Scale-gate coverage at a width where the gates actually FIRE.

The width-adaptive branches — the two-phase top-k gate in
operators/similarity.py (_two_phase_topk: partitions > 2x parallelism)
and the conditional corpus repartition in operators/dedup.py
(_distinct_shingles: skip the fan-out when the scan is already wide) —
never trigger at sf0.1's natural partition counts (single parquet file
per table), so the ordinary suite exercises only their narrow branch.
Shrinking spark.sql.files.maxPartitionBytes splits the same sf0.1 files
into dozens of input partitions, which is exactly the shape a 100-TB
scan has (partitions >> slots): the REAL registered queries then run
end-to-end through the gated branches and are checked against their
DuckDB oracles (r3 verdict item #3).
"""

from __future__ import annotations

import duckdb
import pytest

from conduit_connector_s3_iceberg_spark.plans.registry import load_all
from conduit_connector_s3_iceberg_spark.sources.tables import TABLES, load_table
from tools.check_correctness import norm_rows

SF01 = "/root/testdata/sf0.1"
NARROW_BYTES = 32 * 1024  # splits ~600 KB-6 MB files into 10-300 partitions

GATED_QUERIES = [
    "sim_topk_bruteforce",
    "sim_ann_ivf",
    "dedup_ngram_jaccard",
    # round 4: the truncated-dim candidate stage routes through the same
    # gated two-phase merge
    "sim_truncated_rerank",
    # round 4 second wave: the asymmetric MinHash probe and the DSIR
    # model build run their shared-frame materializations at forced
    # width (checkpointed indexes consumed by multiple joins)
    "corpus_neardup_decontamination",
    "text_dsir_weights",
    "sketch_kmv_distinct",
    # round 4 third wave: RRF runs BOTH rankings through the gated
    # two-phase merge off one materialized scoring pass; BM25 exercises
    # the shared dl/tf materializations at forced width
    "sim_rrf_fusion",
    "text_bm25_top_terms",
    # round 5: the wide Jaccard family — the 20-41-exchange plans whose
    # materialized capped index is the load-bearing scale decision (r4
    # verdict item 5); forced width drives the persisted-index path the
    # way a 100-TB scan would
    "dedup_jaccard_prefix_filter",
    "dedup_containment",
    "dedup_source_matrix",
]


@pytest.fixture()
def wide_scan(spark):
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(NARROW_BYTES))
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)


def _oracle_rows(name: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF01}/{t}.parquet')"
        )
    rel = con.execute(load_all()[name].oracle)
    cols = [d[0] for d in rel.description]
    return cols, rel.fetchall()


def test_gates_fire_at_forced_width(wide_scan):
    """Preconditions: under the shrunk split size both probes see the
    at-scale shape — without this the queries below would silently test
    the narrow branch again."""
    sc = wide_scan.sparkContext
    emb_parts = load_table(wide_scan, SF01, "embeddings").rdd.getNumPartitions()
    doc_parts = load_table(wide_scan, SF01, "documents").rdd.getNumPartitions()
    # two-phase top-k gate: partitions > 2x parallelism
    assert emb_parts > 2 * sc.defaultParallelism, emb_parts
    # conditional repartition: scan already wider than the cluster -> the
    # pre-shingle fan-out shuffle must NOT fire (the 100-TB branch)
    assert doc_parts >= sc.defaultParallelism, doc_parts


@pytest.mark.parametrize("name", GATED_QUERIES)
def test_gated_branch_matches_oracle(wide_scan, name):
    """The real registered query, forced through its scale branch,
    matches its DuckDB oracle exactly (same comparison as the
    correctness harness: column names + order-insensitive values)."""
    q = load_all()[name]
    df = q.build(wide_scan, SF01)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    wide_scan.catalog.clearCache()
    oracle_cols, oracle_rows = _oracle_rows(name)
    assert sorted(spark_cols) == sorted(oracle_cols)
    assert norm_rows(spark_cols, spark_rows) == norm_rows(
        oracle_cols, oracle_rows
    )


# ------------------------------------------------- corpus-scan budget ------
#
# The r4 driver-bench regression (dedup_ngram_jaccard 1.03 -> 7.73 s) was an
# index-materialization regression: an unmaterialized plan left 8 static
# parquet scans of `documents` riding on runtime ReuseExchange, which failed
# under contention. This gate turns that class of regression into a test
# failure: every Jaccard-family query must read the corpus at most
# MAX_CORPUS_READS times in its EXECUTED (post-AQE) plan.

MAX_CORPUS_READS = 3
SF001 = "/root/testdata/sf0.01"

SCAN_BUDGETED = [
    "dedup_ngram_jaccard",
    "dedup_jaccard_prefix_filter",
    "dedup_containment",
    "dedup_source_matrix",
    # round-5 multi-consumer front ends, locked at their measured counts
    "dedup_lsh_scurve",
    "dedup_cluster_size_histogram",
    # round 7: window explode materialized once (digest agg + position
    # join), corpus re-read only for the per-doc token counts
    "dedup_substring_spans",
    # round 7: the shared bigram explode is checkpointed in
    # lm_bigram_score — this consumer was 12 corpus reads before that
    "lm_perplexity_gate",
]


@pytest.mark.parametrize("name", SCAN_BUDGETED)
def test_dedup_corpus_scan_budget(spark, name):
    from tools.scan_count import classify_scans_tree

    q = load_all()[name]
    df = q.build(spark, SF001)
    df.collect()  # AQE: the final plan exists only after execution
    c = classify_scans_tree(df, spark._jvm)
    spark.catalog.clearCache()
    effective = c["top_scans"] + c["cached_scans"]
    assert effective <= MAX_CORPUS_READS, (
        f"{name}: {effective} effective corpus reads "
        f"(top={c['top_scans']} cached={c['cached_scans']}) — "
        "did an index materialization regress to lineage?"
    )
