"""Corpus-assembly operators: sequence packing and duplicate provenance.

Two north-star pipeline stages downstream of cleaning/dedup:

* **Sequence packing** — assigning documents to fixed-token-budget training
  chunks. True global first-fit packing is inherently serial; the form every
  production pipeline actually runs is *sharded sequential packing*: shard
  the corpus deterministically, order within the shard, cut chunks at the
  token budget by running cumulative sum. Each shard's window is
  independent, so the whole operator is one window over (lang, shard) —
  embarrassingly parallel, no driver involvement, stable output under
  re-runs (everything keys off doc_id).
* **Duplicate provenance** — which *sources* duplicate which: the near-dup
  pair list (operators/dedup.py) rolled up to a source×source matrix. This
  is the report a crawl operator reads to decide which feeds to drop; cost
  is two broadcast-sized joins from pairs back to the (doc_id, source) map
  plus one tiny aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table
from .dedup import (
    _SIMHASH_FP,
    _fanned_out,
    _simhash_vote_sql,
    JACCARD_THRESHOLD,
    MAX_SHINGLE_DF,
    N_MINHASH,
    SHINGLES_SPARK,
    SHINGLES_SQL,
    VERIFY_THRESHOLD,
    _minhash_aggs,
    ngram_jaccard_pairs,
)

CHUNK_TOKENS = 512   # token budget per packed training chunk
N_PACK_SHARDS = 16   # deterministic shards; at 100 TB scale this up so a
                     # shard's docs fit one task comfortably


@query(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(doc_id % {N_PACK_SHARDS} AS INTEGER) AS shard,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, lang, shard, n_tokens,
             -- CAST: DuckDB SUM(BIGINT) yields HUGEINT (Arrow decimal128);
             -- Spark's running sum is BIGINT — align the wire types.
             CAST(SUM(n_tokens) OVER (
               PARTITION BY lang, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens AS BIGINT) AS start_offset
      FROM t
    )
    SELECT doc_id, lang, shard, n_tokens, start_offset,
           CAST(FLOOR(start_offset / {CHUNK_TOKENS}.0) AS BIGINT) AS chunk_no,
           lang || '-' || shard || '-'
                || CAST(CAST(FLOOR(start_offset / {CHUNK_TOKENS}.0) AS BIGINT)
                        AS VARCHAR) AS chunk_key
    FROM c
    """,
    doc=f"Sharded sequential sequence packing: docs are dealt into "
        f"{N_PACK_SHARDS} deterministic shards (doc_id mod), ordered by "
        "doc_id within (lang, shard), and cut into training chunks of "
        f"{CHUNK_TOKENS} tokens by running cumulative token count (a doc "
        "starts the chunk its start offset falls in — the concat-then-cut "
        "packing LLM pipelines use). One bounded window per shard, no "
        "global sort, no driver logic; chunk keys are globally unique and "
        "reproducible run-to-run.",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % N_PACK_SHARDS).cast("int").alias("shard"),
        F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    chunk_no = F.floor(F.col("start_offset") / F.lit(float(CHUNK_TOKENS))).cast(
        "bigint"
    )
    return c.select(
        "doc_id",
        "lang",
        "shard",
        "n_tokens",
        "start_offset",
        chunk_no.alias("chunk_no"),
        F.concat_ws(
            "-", F.col("lang"), F.col("shard"), chunk_no.cast("string")
        ).alias("chunk_key"),
    )


# the near-dup pair CTE chain from operators/dedup.py, inlined for the
# provenance rollup oracle (DuckDB requires the full lineage in one query)
_NEARDUP_PAIRS_SQL = f"""
    sh AS (
      SELECT doc_id, unnest(list_distinct({SHINGLES_SQL})) AS shingle
      FROM documents
    ), kept AS (
      SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {MAX_SHINGLE_DF}
    ), idx AS (
      SELECT s.doc_id, s.shingle FROM sh s JOIN kept k ON s.shingle = k.shingle
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM idx GROUP BY doc_id
    ), rawpairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    ), pairs AS (
      SELECT p.doc_a, p.doc_b,
             CAST(p.n_common AS DOUBLE) / (sa.sz + sb.sz - p.n_common) AS jaccard
      FROM rawpairs p
      JOIN sizes sa ON p.doc_a = sa.doc_id
      JOIN sizes sb ON p.doc_b = sb.doc_id
      WHERE CAST(p.n_common AS DOUBLE) / (sa.sz + sb.sz - p.n_common)
            >= {JACCARD_THRESHOLD}
    )
"""


@query(
    "dedup_source_matrix",
    oracle=f"""
    WITH {_NEARDUP_PAIRS_SQL}
    SELECT da.source AS source_a, db.source AS source_b,
           COUNT(*) AS n_pairs,
           MAX(p.jaccard) AS max_jaccard
    FROM pairs p
    JOIN documents da ON p.doc_a = da.doc_id
    JOIN documents db ON p.doc_b = db.doc_id
    GROUP BY source_a, source_b
    """,
    doc="Duplicate provenance: the near-dup pair list rolled up to a "
        "source×source matrix (pair count + strongest overlap per source "
        "pair) — the feed-overlap report a crawl operator uses to drop or "
        "down-weight redundant sources. The (doc_id → source) map joins "
        "into the pair list by doc_id (uniform key); the matrix itself is "
        "#sources² at most, so the final aggregation is tiny. max() over "
        "doubles is order-independent — no accumulation nondeterminism.",
)
def dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one materialized (doc_id, source) map serves BOTH pair-endpoint
    # joins — without it each alias re-scans the corpus for a 2-column map
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .localCheckpoint(eager=False)
    )
    # pairs come from the labels state's persisted v4 artifact — one
    # columnar read, shared with dedup_ngram_jaccard
    pairs = ngram_jaccard_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", "jaccard"
    )
    da, db = docs.alias("da"), docs.alias("db")
    return (
        pairs.join(da, F.col("doc_a") == F.col("da.doc_id"))
        .join(db, F.col("doc_b") == F.col("db.doc_id"))
        .groupBy(
            F.col("da.source").alias("source_a"),
            F.col("db.source").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )


@query(
    "pack_chunk_texts",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, lang,
             CAST(doc_id % {N_PACK_SHARDS} AS INTEGER) AS shard,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, text, lang, shard, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY lang, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens AS start_offset
      FROM t
    )
    SELECT lang || '-' || shard || '-'
             || CAST(CAST(FLOOR(start_offset / {CHUNK_TOKENS}.0) AS BIGINT)
                     AS VARCHAR) AS chunk_key,
           COUNT(*) AS n_docs,
           -- CAST: DuckDB SUM(BIGINT) yields HUGEINT; Spark emits BIGINT.
           CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens,
           md5(string_agg(text, ' ' ORDER BY doc_id)) AS text_fp
    FROM c
    GROUP BY chunk_key
    """,
    doc="Chunk assembly, the step after pack_sequences: concatenate each "
        "chunk's documents (in doc_id order) into the training sequence. "
        "The collected group is bounded by the token budget — ordered "
        "concatenation via sort_array(collect_list(struct)) is "
        "deterministic under any partitioning (plain collect_list is NOT). "
        "Emits a content fingerprint per chunk (the dataset-card hash); "
        "same single window shuffle as the assignment step plus one "
        "bounded aggregation.",
)
def pack_chunk_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = pack_sequences(spark, sf_dir).select("doc_id", "chunk_key", "n_tokens")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rows = assigned.join(docs, "doc_id")
    ordered_concat = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct("doc_id", "text"))),
            lambda s: s["text"],
        ),
        " ",
    )
    return rows.groupBy("chunk_key").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("chunk_tokens"),
        F.md5(ordered_concat).alias("text_fp"),
    )


# ------------------------------------------------------- train/val/test split
#
# Deterministic corpus split: the split a doc lands in is a pure function of
# its id (md5 hex prefix, same discipline as operators/sampling.py), so the
# assignment is reproducible across runs, clusters, and partitionings, and
# adding documents never moves existing ones between splits. Narrow map +
# one tiny rollup.

SPLIT_SALT = "split:"
TRAIN_HEX = "cc"   # 204/256 ≈ 80% train
VAL_HEX = "e6"     # 230/256 ≈ 90% cumulative → ~10% val, ~10% test


@query(
    "corpus_train_split",
    oracle=f"""
    WITH assigned AS (
      SELECT lang,
             CASE WHEN substr(md5('{SPLIT_SALT}' || doc_id::VARCHAR), 1, 2) < '{TRAIN_HEX}'
                  THEN 'train'
                  WHEN substr(md5('{SPLIT_SALT}' || doc_id::VARCHAR), 1, 2) < '{VAL_HEX}'
                  THEN 'val' ELSE 'test' END AS split,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT lang, split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM assigned
    GROUP BY lang, split
    """,
    doc="Deterministic hash-based train/val/test split (~80/10/10) rolled "
        "up per language: split = md5(salt||doc_id) hex-prefix banding, the "
        "reproducible-sampling discipline of operators/sampling.py. "
        "Assignment is a narrow map (zero shuffle); the rollup output is "
        "langs × 3 rows regardless of corpus size.",
)
def corpus_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(
        F.md5(F.concat(F.lit(SPLIT_SALT), F.col("doc_id").cast("string"))), 1, 2
    )
    assigned = docs.select(
        "lang",
        F.when(h < TRAIN_HEX, "train")
        .when(h < VAL_HEX, "val")
        .otherwise("test")
        .alias("split"),
        F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint").alias("n_tokens"),
    )
    return assigned.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


# --------------------------------------------------------- domain mix weights
#
# Per-source sampling weights for domain mixing (the Pile/DoReMi-style
# mixture table): weight ∝ sqrt(token share), normalized. All cross-row
# float sums go through scaled integers so the result is bit-identical under
# any shuffle order (sqrt and division are single IEEE-exact ops; only SUMs
# are order-sensitive, and those are integer). Output is |sources| rows —
# the '100 TB in, mixture table out' shape.

WEIGHT_SCALE = 1_000_000_000_000  # 1e12: sqrt-share quantization for exact sums


@query(
    "mix_domain_weights",
    oracle=f"""
    WITH per_source AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS tokens
      FROM documents
      GROUP BY source
    ), shared AS (
      SELECT source, n_docs, tokens,
             CAST(tokens AS DOUBLE)
               / CAST(SUM(tokens) OVER () AS BIGINT) AS token_share
      FROM per_source
    ), scaled AS (
      SELECT *,
             CAST(round(sqrt(token_share) * {WEIGHT_SCALE}) AS BIGINT)
               AS w_scaled
      FROM shared
    )
    SELECT source, n_docs, tokens, token_share,
           CAST(w_scaled AS DOUBLE)
             / CAST(SUM(w_scaled) OVER () AS BIGINT) AS mix_weight
    FROM scaled
    """,
    doc="Domain-mixing weight table: per-source token share, then sampling "
        "weight ∝ sqrt(share) normalized over sources (sqrt temper, the "
        "standard 'flatten the head domains' mixture). Exactness: shares "
        "and weights divide scaled-integer sums (order-independent); sqrt "
        "and each division are single correctly-rounded IEEE ops, so both "
        "engines emit identical bits. One corpus aggregation; everything "
        "after runs on |sources| rows.",
)
def mix_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint")).alias(
            "tokens"
        ),
    )
    everything = Window.partitionBy()
    shared = per_source.select(
        "*",
        (
            F.col("tokens").cast("double") / F.sum("tokens").over(everything)
        ).alias("token_share"),
    )
    scaled = shared.select(
        "*",
        F.round(F.sqrt(F.col("token_share")) * WEIGHT_SCALE)
        .cast("bigint")
        .alias("w_scaled"),
    )
    return scaled.select(
        "source",
        "n_docs",
        "tokens",
        "token_share",
        (
            F.col("w_scaled").cast("double") / F.sum("w_scaled").over(everything)
        ).alias("mix_weight"),
    ).drop("w_scaled")


# ------------------------------------------------------------- split drift
#
# Distribution-drift monitor over the hash splits: chi-square statistic of
# each split's token-length-bucket histogram against the whole-corpus
# distribution. The guard every training pipeline wants: a hash split
# SHOULD be distribution-neutral — a chi2 spike means the split key leaks
# signal. Per-bucket contributions are quantized to 1e-9 before the
# cross-bucket sum, so the statistic is bit-stable under any aggregation
# order (same scaled-integer discipline as mix_domain_weights).

DRIFT_SCALE = 1_000_000_000


@query(
    "corpus_split_drift",
    oracle=f"""
    WITH assigned AS (
      SELECT CASE WHEN substr(md5('{SPLIT_SALT}' || doc_id::VARCHAR), 1, 2) < '{TRAIN_HEX}'
                  THEN 'train'
                  WHEN substr(md5('{SPLIT_SALT}' || doc_id::VARCHAR), 1, 2) < '{VAL_HEX}'
                  THEN 'val' ELSE 'test' END AS split,
             CAST(LEAST(FLOOR(len(string_split(trim(text), ' ')) / 32.0), 7)
                  AS INTEGER) AS len_bucket
      FROM documents
    ), cell AS (
      SELECT split, len_bucket, COUNT(*) AS observed
      FROM assigned GROUP BY split, len_bucket
    ), totals AS (
      SELECT split, len_bucket, observed,
             CAST(SUM(observed) OVER (PARTITION BY split) AS BIGINT) AS split_total,
             CAST(SUM(observed) OVER (PARTITION BY len_bucket) AS BIGINT) AS bucket_total,
             CAST(SUM(observed) OVER () AS BIGINT) AS grand_total
      FROM cell
    ), contrib AS (
      SELECT split, observed, split_total,
             CAST(round(
               (observed - CAST(split_total AS DOUBLE) * bucket_total / grand_total)
               * (observed - CAST(split_total AS DOUBLE) * bucket_total / grand_total)
               / (CAST(split_total AS DOUBLE) * bucket_total / grand_total)
               * {DRIFT_SCALE}) AS BIGINT) AS c_scaled
      FROM totals
    )
    SELECT split,
           CAST(MAX(split_total) AS BIGINT) AS n_docs,
           CAST(SUM(c_scaled) AS BIGINT) AS chi2_scaled,
           CAST(CAST(SUM(c_scaled) AS BIGINT) AS DOUBLE) / {DRIFT_SCALE} AS chi2
    FROM contrib
    GROUP BY split
    """,
    doc="Split-distribution drift monitor: chi-square of each train/val/"
        "test split's token-length histogram against the whole-corpus "
        "distribution — the check that a sampling/split key is "
        "distribution-neutral. One corpus-wide bucket aggregation, then "
        "everything runs on splits × 8 cells; per-cell contributions are "
        "quantized to scaled integers before the cross-cell sum so the "
        "statistic is reproducible under any shuffle order.",
)
def corpus_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(
        F.md5(F.concat(F.lit(SPLIT_SALT), F.col("doc_id").cast("string"))), 1, 2
    )
    n_tok = F.size(F.split(F.trim(F.col("text")), " "))
    assigned = docs.select(
        F.when(h < TRAIN_HEX, "train")
        .when(h < VAL_HEX, "val")
        .otherwise("test")
        .alias("split"),
        F.least(F.floor(n_tok / F.lit(32.0)), F.lit(7)).cast("int").alias(
            "len_bucket"
        ),
    )
    cell = assigned.groupBy("split", "len_bucket").agg(
        F.count(F.lit(1)).alias("observed")
    )
    totals = cell.select(
        "*",
        F.sum("observed").over(Window.partitionBy("split")).alias("split_total"),
        F.sum("observed").over(Window.partitionBy("len_bucket")).alias(
            "bucket_total"
        ),
        F.sum("observed").over(Window.partitionBy()).alias("grand_total"),
    )
    expected = (
        F.col("split_total").cast("double")
        * F.col("bucket_total")
        / F.col("grand_total")
    )
    contrib = totals.select(
        "split",
        "split_total",
        F.round(
            (F.col("observed") - expected)
            * (F.col("observed") - expected)
            / expected
            * DRIFT_SCALE
        )
        .cast("bigint")
        .alias("c_scaled"),
    )
    return contrib.groupBy("split").agg(
        F.max("split_total").alias("n_docs"),
        F.sum("c_scaled").alias("chi2_scaled"),
        (F.sum("c_scaled").cast("double") / DRIFT_SCALE).alias("chi2"),
    )


# ------------------------------------------------------------- domain caps
#
# Per-source document cap — the anti-spam stage of a crawl pipeline: no
# single feed/domain may contribute more than DOMAIN_CAP documents, and the
# survivors are the "best" by a quality rank (here n_chars DESC — longer
# docs win — with doc_id as the deterministic tiebreak). The plan is the
# same two-phase top-k used in operators/similarity.py: a local
# row_number over (source, input-partition) truncates each partition to the
# cap BEFORE the shuffle, so the per-source exchange moves at most
# cap × n_partitions rows, not the whole corpus — with a handful of
# sources, a single-phase window would funnel the entire corpus into a few
# reducer tasks (exactly the straggler shape VERDICT r1 flagged in the
# brute-force top-k).

DOMAIN_CAP = 15


@query(
    "corpus_domain_cap",
    oracle=f"""
    SELECT doc_id, source, n_chars, rk
    FROM (
      SELECT doc_id, source, n_chars,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
             ) AS INTEGER) AS rk
      FROM documents
    )
    WHERE rk <= {DOMAIN_CAP}
    """,
    doc=f"Per-source document cap: keep each source's top {DOMAIN_CAP} docs "
        "by quality rank (n_chars DESC, doc_id tiebreak). Two-phase top-k: "
        "a per-input-partition row_number truncates to the cap before the "
        "per-source shuffle, bounding the exchange at cap x partitions "
        "rows — sources are few, so the single-phase window would be a "
        "straggler funnel at corpus scale.",
)
def corpus_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    order = (F.col("n_chars").desc(), F.col("doc_id"))
    local = Window.partitionBy("source", F.spark_partition_id()).orderBy(*order)
    pruned = (
        docs.withColumn("_lrk", F.row_number().over(local))
        .filter(F.col("_lrk") <= DOMAIN_CAP)
        .drop("_lrk")
    )
    final = Window.partitionBy("source").orderBy(*order)
    return pruned.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(final).cast("int").alias("rk"),
    ).filter(F.col("rk") <= DOMAIN_CAP)


# ------------------------------------------------------------ shard manifest
#
# The write-side bookkeeping of a training-data export: assign every doc a
# deterministic shard (first hex char of md5(salt||doc_id) — 16 uniform
# shards, reproducible across runs and cluster layouts), and emit the
# per-shard manifest a trainer validates against: document count, total
# chars, id range, and an order-insensitive content digest (min/max of the
# per-doc content hash — any dropped/duplicated/corrupted doc moves at
# least one of the fields with high probability).
#
# Scale: a narrow map (two md5s) into a 16-key partial+final aggregate —
# map-side combine reduces each input partition to <=16 rows before the
# shuffle; the exchange moves O(shards x partitions) rows regardless of
# corpus size.

SHARD_SALT = "shard1:"


@query(
    "corpus_shard_manifest",
    oracle=f"""
    SELECT substr(md5('{SHARD_SALT}' || doc_id::VARCHAR), 1, 1) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id,
           MIN(md5(text)) AS digest_lo,
           MAX(md5(text)) AS digest_hi
    FROM documents
    GROUP BY shard
    """,
    doc="Deterministic 16-way shard assignment (hex digit of a salted key "
        "hash) with a per-shard export manifest: doc count, char total, id "
        "range, and an order-insensitive min/max content digest. Narrow "
        "map into a 16-key partial+final aggregate — the exchange is "
        "O(shards x partitions) rows at any corpus size.",
)
def corpus_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    shard = F.substring(
        F.md5(F.concat(F.lit(SHARD_SALT), F.col("doc_id").cast("string"))), 1, 1
    )
    return (
        docs.select(
            shard.alias("shard"),
            "doc_id",
            "n_chars",
            F.md5("text").alias("content_hash"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.min("content_hash").alias("digest_lo"),
            F.max("content_hash").alias("digest_hi"),
        )
    )


# ----------------------------------------------------- split decontamination
#
# Train→test leakage audit: for every TEST-split document, how many of its
# 3-gram shingles also occur anywhere in the TRAIN split. This is the check
# a pipeline runs before shipping an eval set carved from the same crawl —
# near-dup pairs that straddle the split boundary inflate eval scores.
#
# Scale: the train shingle set is an inverted index deduped on an 8-byte
# xxhash64 key (one shuffle on a uniform key, map-side combine); the test
# side (~10% of the corpus) left-joins it on that key — the same
# bucketed-join shape as dedup_ngram_jaccard, never O(n²), and the rollup
# back to one row per test doc is a partial+final aggregate. The oracle
# joins raw shingle strings (DuckDB has no xxhash64); a 64-bit collision
# would surface as a driver hash mismatch — accepted, as in the dedup
# family.

def _split_col() -> F.Column:
    h = F.substring(
        F.md5(F.concat(F.lit(SPLIT_SALT), F.col("doc_id").cast("string"))), 1, 2
    )
    return (
        F.when(h < TRAIN_HEX, "train").when(h < VAL_HEX, "val").otherwise("test")
    )


_SPLIT_SQL = (
    f"CASE WHEN substr(md5('{SPLIT_SALT}' || doc_id::VARCHAR), 1, 2) < '{TRAIN_HEX}'"
    f" THEN 'train'"
    f" WHEN substr(md5('{SPLIT_SALT}' || doc_id::VARCHAR), 1, 2) < '{VAL_HEX}'"
    f" THEN 'val' ELSE 'test' END"
)


@query(
    "corpus_split_decontamination",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, lang, text, {_SPLIT_SQL} AS split FROM documents
    ), train_sh AS (
      SELECT DISTINCT unnest(list_distinct({SHINGLES_SQL})) AS shingle
      FROM assigned WHERE split = 'train'
    ), eval_sh AS (
      SELECT doc_id, lang, unnest(list_distinct({SHINGLES_SQL})) AS shingle
      FROM assigned WHERE split = 'test'
    )
    SELECT e.doc_id, e.lang,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(t.shingle) AS BIGINT) AS n_leaked,
           CAST(COUNT(t.shingle) AS DOUBLE) / COUNT(*) AS leak_frac
    FROM eval_sh e LEFT JOIN train_sh t ON e.shingle = t.shingle
    GROUP BY e.doc_id, e.lang
    """,
    doc="Train→test decontamination audit: per test-split document, the "
        "count and fraction of its distinct 3-gram shingles that occur "
        "anywhere in the train split. Deduped train inverted index on an "
        "8-byte hash key, left join from the (~10%) test side, "
        "partial+final rollup — the dedup-family bucketed-join shape.",
)
def corpus_split_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", _split_col().alias("split")
    )
    shingle = F.explode(F.array_distinct(F.expr(SHINGLES_SPARK))).alias("shingle")
    train_sh = (
        docs.filter(F.col("split") == "train")
        .select(shingle)
        .select(F.xxhash64("shingle").alias("sh"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    eval_sh = (
        docs.filter(F.col("split") == "test")
        .select("doc_id", "lang", shingle)
        .select("doc_id", "lang", F.xxhash64("shingle").alias("sh"))
    )
    return (
        eval_sh.join(train_sh, "sh", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_leaked"),
            (F.count("hit").cast("double") / F.count(F.lit(1))).alias("leak_frac"),
        )
    )


# ------------------------------------------------------------- dataset card
#
# The one-table summary a corpus release publishes: volume, diversity,
# duplication, and split sizes, each metric defined EXACTLY as its
# dedicated operator defines it (token = whitespace token as in
# text_token_stats; exact-dup fingerprint as in dedup_exact_groups; split
# banding as in corpus_train_split) so the card never drifts from the
# queries it summarizes.


@query(
    "corpus_dataset_card",
    oracle=f"""
    WITH agg AS (
      SELECT COUNT(*) AS n_docs,
             COUNT(DISTINCT source) AS n_sources,
             COUNT(DISTINCT lang) AS n_langs,
             COUNT(DISTINCT md5(lower(trim(text)))) AS n_unique_texts,
             SUM(n_chars) AS total_chars,
             SUM(len(string_split(trim(text), ' '))) AS total_tokens,
             SUM(CASE WHEN substr(md5('{SPLIT_SALT}' || doc_id::VARCHAR), 1, 2)
                      < '{TRAIN_HEX}' THEN 1 ELSE 0 END) AS train_docs,
             SUM(CASE WHEN substr(md5('{SPLIT_SALT}' || doc_id::VARCHAR), 1, 2)
                      >= '{TRAIN_HEX}'
                  AND substr(md5('{SPLIT_SALT}' || doc_id::VARCHAR), 1, 2)
                      < '{VAL_HEX}' THEN 1 ELSE 0 END) AS val_docs
      FROM documents
    )
    SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM agg
    UNION ALL SELECT 'n_sources', CAST(n_sources AS DOUBLE) FROM agg
    UNION ALL SELECT 'n_langs', CAST(n_langs AS DOUBLE) FROM agg
    UNION ALL SELECT 'excess_exact_dups',
                     CAST(n_docs - n_unique_texts AS DOUBLE) FROM agg
    UNION ALL SELECT 'total_chars', CAST(total_chars AS DOUBLE) FROM agg
    UNION ALL SELECT 'total_tokens', CAST(total_tokens AS DOUBLE) FROM agg
    UNION ALL SELECT 'train_docs', CAST(train_docs AS DOUBLE) FROM agg
    UNION ALL SELECT 'val_docs', CAST(val_docs AS DOUBLE) FROM agg
    UNION ALL SELECT 'test_docs',
                     CAST(n_docs - train_docs - val_docs AS DOUBLE) FROM agg
    """,
    doc="Dataset card: corpus volume, source/language diversity, exact-dup "
        "excess, token totals, and train/val/test sizes in ONE aggregation "
        "pass over the corpus (multi-DISTINCT planned as a single Expand, "
        "like q60) unpivoted to long form. Every metric reuses its "
        "dedicated operator's exact definition, so the published card and "
        "the pipeline gates can never disagree. All values are exact "
        "integers emitted as doubles (< 2^53, lossless).",
)
def corpus_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    band = F.substring(
        F.md5(F.concat(F.lit(SPLIT_SALT), F.col("doc_id").cast("string"))), 1, 2
    )
    n_tokens = F.size(F.split(F.trim(F.col("text")), " "))
    wide = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct(F.md5(F.lower(F.trim(F.col("text"))))).alias(
            "n_unique_texts"
        ),
        F.sum("n_chars").alias("total_chars"),
        F.sum(n_tokens.cast("long")).alias("total_tokens"),
        F.sum((band < TRAIN_HEX).cast("long")).alias("train_docs"),
        F.sum(((band >= TRAIN_HEX) & (band < VAL_HEX)).cast("long")).alias(
            "val_docs"
        ),
    )
    pairs = [
        ("n_docs", "n_docs"),
        ("n_sources", "n_sources"),
        ("n_langs", "n_langs"),
        ("excess_exact_dups", "n_docs - n_unique_texts"),
        ("total_chars", "total_chars"),
        ("total_tokens", "total_tokens"),
        ("train_docs", "train_docs"),
        ("val_docs", "val_docs"),
        ("test_docs", "n_docs - train_docs - val_docs"),
    ]
    stack = ", ".join(f"'{m}', CAST({e} AS DOUBLE)" for m, e in pairs)
    return wide.selectExpr(f"stack({len(pairs)}, {stack}) AS (metric, value)")


# ---------------------------------------------------- overlapping chunks --
#
# RAG-style chunking: fixed W-token windows advancing by stride S < W, so
# consecutive chunks share W-S tokens of context — the retrieval-index
# preparation step (the non-overlapping pack_* family above is the
# training-set twin). Pure per-row array arithmetic: chunk count and every
# slice are expressions over the token array — narrow map, zero shuffle,
# output rows = total chunks.

RAG_CHUNK_W = 40   # tokens per chunk
RAG_CHUNK_S = 30   # stride (25% overlap)


@query(
    "pack_chunks_overlap",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks,
             len(string_split(trim(text), ' ')) AS n
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, n, k.k AS chunk_idx,
             k.k * {RAG_CHUNK_S} + 1 AS chunk_start,
             array_to_string(
               list_slice(toks, k.k * {RAG_CHUNK_S} + 1,
                          k.k * {RAG_CHUNK_S} + {RAG_CHUNK_W}), ' ') AS ctext
      FROM d, LATERAL (
        SELECT unnest(generate_series(0,
          CAST(greatest(n - {RAG_CHUNK_W}, 0) // {RAG_CHUNK_S} AS BIGINT)))
          AS k
      ) k
    )
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(chunk_start AS INTEGER) AS chunk_start,
           CAST(least({RAG_CHUNK_W}, n - chunk_idx * {RAG_CHUNK_S}) AS INTEGER)
             AS n_chunk_tokens,
           md5(ctext) AS chunk_fp
    FROM chunks
    """,
    doc=f"Overlapping chunking for retrieval indexes: {RAG_CHUNK_W}-token "
        f"windows advancing by {RAG_CHUNK_S} (consecutive chunks share "
        f"{RAG_CHUNK_W - RAG_CHUNK_S} tokens of context). Chunk count and "
        "every slice are per-row array expressions — narrow map, zero "
        "shuffle; chunk text is fingerprinted (md5) so the output stays "
        "scalar and the content is still cross-checked.",
)
def pack_chunks_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.split(F.trim(F.col("text")), " ").alias("toks"),
        F.size(F.split(F.trim(F.col("text")), " ")).alias("n"),
    )
    chunks = d.select(
        "doc_id",
        "n",
        F.explode(
            F.expr(
                f"sequence(0, greatest(n - {RAG_CHUNK_W}, 0) div {RAG_CHUNK_S})"
            )
        ).alias("chunk_idx"),
        "toks",
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        (F.col("chunk_idx") * RAG_CHUNK_S + 1).cast("int").alias("chunk_start"),
        F.least(
            F.lit(RAG_CHUNK_W), F.col("n") - F.col("chunk_idx") * RAG_CHUNK_S
        )
        .cast("int")
        .alias("n_chunk_tokens"),
        F.md5(
            F.expr(
                f"concat_ws(' ', slice(toks, chunk_idx * {RAG_CHUNK_S} + 1,"
                f" {RAG_CHUNK_W}))"
            )
        ).alias("chunk_fp"),
    )


# ------------------------------------------------------------- curriculum
#
# Length-curriculum shard assignment: short (easy) documents first is the
# classic curriculum-learning schedule (Bengio et al., ICML'09), and
# sequence-length ordering is the cheap difficulty proxy production
# pipelines actually use. Each source is independently NTILE'd into
# CURRICULUM_STAGES by (n_chars, doc_id) so every stage keeps the full
# source mixture (a curriculum must not become a source schedule), and
# within a stage documents carry a deterministic md5 shuffle key — the
# writer emits files sorted by (stage, shuffle_key), which is exactly the
# read order trainers consume.
#
# Scale: the only window is per-source NTILE (one shuffle on source,
# partitions bounded by the per-source doc count); there is deliberately
# NO dense global position — a row_number over a whole stage would be a
# single-reducer sort at 100 TB. The shuffle key IS the order: consumers
# range-partition/sort by (stage, shuffle_key), which Spark executes as a
# distributed sort.

CURRICULUM_STAGES = 4
CURRICULUM_SALT = "cur1:"


@query(
    "corpus_curriculum_shards",
    oracle=f"""
    SELECT doc_id, source, n_chars,
           CAST(NTILE({CURRICULUM_STAGES}) OVER (
             PARTITION BY source ORDER BY n_chars, doc_id
           ) AS INTEGER) AS stage,
           md5('{CURRICULUM_SALT}' || doc_id::VARCHAR) AS shuffle_key
    FROM documents
    """,
    doc=f"Length-curriculum assignment: NTILE({CURRICULUM_STAGES}) per "
        "source by (n_chars, doc_id) — short/easy docs land in stage 1 — "
        "plus a deterministic md5 shuffle key for within-stage order. "
        "Every stage preserves the full source mixture; no global window "
        "(the per-source NTILE is the only shuffle, and within-stage order "
        "is a sort key, not a dense single-reducer rank).",
)
def corpus_curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.ntile(CURRICULUM_STAGES).over(w).cast("int").alias("stage"),
        F.md5(
            F.concat(F.lit(CURRICULUM_SALT), F.col("doc_id").cast("string"))
        ).alias("shuffle_key"),
    )


# ------------------------------------------ near-dup decontamination --------
#
# Exact-shingle leakage (corpus_split_decontamination above) misses the
# common real-world case: the benchmark item was lightly paraphrased,
# reformatted, or truncated before landing in the crawl. The published
# recipe (GPT-3 appendix C / The Pile / Dolma) is NEAR-dup decontamination:
# MinHash-LSH candidates between eval and train, exact-Jaccard verify, drop
# or flag eval items above threshold. This operator is that pipeline with
# the roles made ASYMMETRIC: the train side is the big standing index, the
# eval probe is tiny, so at 100 TB you persist the train band index once
# and stream eval sets through it (same probe-side shape as
# dedup_incremental_delta).
#
# Candidate gate is >= 1 shared band (decontamination optimizes recall, not
# pair-count thrift); the verified Jaccard and the leak verdict use the
# dedup family's VERIFY_THRESHOLD so "leaky" here means exactly what
# "duplicate" means there.

@query(
    "corpus_neardup_decontamination",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, text, {_SPLIT_SQL} AS split FROM documents
    ), sh AS (
      SELECT doc_id, split, unnest(list_distinct({SHINGLES_SQL})) AS shingle
      FROM assigned WHERE split IN ('train', 'test')
    ), sig AS (
      SELECT doc_id, split,
             {", ".join(f"min(md5('{i}:' || shingle)) AS mh{i}" for i in range(N_MINHASH))}
      FROM sh GROUP BY doc_id, split
    ), bands AS (
      SELECT doc_id, split,
             unnest([{", ".join(f"{{'band': {i}, 'h': mh{i}}}" for i in range(N_MINHASH))}],
                    recursive := true)
      FROM sig
    ), cand AS (
      SELECT DISTINCT e.doc_id AS eval_id, t.doc_id AS train_id
      FROM bands e
      JOIN bands t ON t.band = e.band AND t.h = e.h AND t.split = 'train'
      WHERE e.split = 'test'
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
    ), verified AS (
      SELECT c.eval_id, c.train_id,
             CAST(COUNT(*) AS DOUBLE)
               / (se.sz + st.sz - COUNT(*)) AS jaccard
      FROM cand c
      JOIN sh a ON a.doc_id = c.eval_id
      JOIN sh b ON b.doc_id = c.train_id AND b.shingle = a.shingle
      JOIN sizes se ON se.doc_id = c.eval_id
      JOIN sizes st ON st.doc_id = c.train_id
      GROUP BY c.eval_id, c.train_id, se.sz, st.sz
    )
    SELECT eval_id,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           MAX(CASE WHEN rk = 1 THEN train_id END) AS best_train_id,
           MAX(CASE WHEN rk = 1 THEN jaccard END) AS best_jaccard,
           MAX(CASE WHEN rk = 1 THEN jaccard END) >= {VERIFY_THRESHOLD}
             AS leaky
    FROM (
      SELECT eval_id, train_id, jaccard,
             ROW_NUMBER() OVER (
               PARTITION BY eval_id ORDER BY jaccard DESC, train_id
             ) AS rk
      FROM verified
    )
    GROUP BY eval_id
    ORDER BY eval_id
    """,
    doc="Near-duplicate decontamination (GPT-3/Pile/Dolma recipe): "
    "MinHash-LSH candidates between the test split and the train split "
    "(>= 1 shared band — recall-first), exact-Jaccard verification on "
    "candidates only, one row per contaminated-candidate eval doc with "
    "its best-matching train doc and a leak verdict at the dedup "
    "family's verify threshold. Asymmetric at scale: the train band "
    "index is the persisted big side, eval probes stream through it.",
)
def corpus_neardup_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fanned out: the exploded shingle frame below is localCheckpointed and
    # consumed by the signature agg, sizes, and both verify legs — a
    # one-split scan pins ALL of them to a single task (measured: five
    # concurrent ~2 s single-task stages)
    docs = _fanned_out(
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", _split_col().alias("split"))
        .filter(F.col("split").isin("train", "test"))
    )
    sh = docs.select(
        "doc_id",
        "split",
        F.explode(F.array_distinct(F.expr(SHINGLES_SPARK))).alias("shingle"),
    ).localCheckpoint(eager=False)  # consumed by sig, sizes, both verify legs
    sig = sh.groupBy("doc_id", "split").agg(*_minhash_aggs())
    bands = sig.select(
        "doc_id",
        "split",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band"), F.col(f"mh{i}").alias("h"))
                    for i in range(N_MINHASH)
                ]
            )
        ).alias("bh"),
    ).select("doc_id", "split", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))
    ev = bands.filter(F.col("split") == "test").select(
        F.col("doc_id").alias("eval_id"), "band", "h"
    )
    tr = bands.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_id"), "band", "h"
    )
    cand = ev.join(tr, ["band", "h"]).select("eval_id", "train_id").distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("eval_id"), F.col("shingle").alias("sha"))
    b = sh.select(F.col("doc_id").alias("tid"), F.col("shingle").alias("shb"))
    verified = (
        cand.join(a, "eval_id")
        .join(b, (F.col("train_id") == F.col("tid")) & (F.col("sha") == F.col("shb")))
        .groupBy("eval_id", "train_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .join(sizes.select(F.col("doc_id").alias("eval_id"), F.col("sz").alias("se")), "eval_id")
        .join(sizes.select(F.col("doc_id").alias("train_id"), F.col("sz").alias("st")), "train_id")
        .select(
            "eval_id",
            "train_id",
            (
                F.col("n_common").cast("double")
                / (F.col("se") + F.col("st") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
    w = Window.partitionBy("eval_id").orderBy(F.desc("jaccard"), "train_id")
    ranked = verified.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("eval_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.max(F.when(F.col("rk") == 1, F.col("train_id"))).alias(
                "best_train_id"
            ),
            F.max(F.when(F.col("rk") == 1, F.col("jaccard"))).alias(
                "best_jaccard"
            ),
            (
                F.max(F.when(F.col("rk") == 1, F.col("jaccard")))
                >= VERIFY_THRESHOLD
            ).alias("leaky"),
        )
        .orderBy("eval_id")
    )


# -------------------------------------------------- k-anonymity audit -------
#
# Release hygiene: when a corpus ships with per-document metadata, any
# combination of quasi-identifiers whose group is small can single out a
# contributor (Sweeney 2002). The audit is purely relational: group by the
# quasi-identifier tuple, count, and report how much of the corpus sits in
# groups below k — the number a release review reads before publishing
# metadata columns. One hash-agg at the quasi-identifier grain (bounded:
# langs x sources x length buckets), then a two-row verdict rollup.

KANON_K = 10
KANON_LEN_BUCKET = 256  # n_chars bucket width


@query(
    "corpus_k_anonymity",
    oracle=f"""
    WITH groups AS (
      SELECT lang, source,
             CAST(n_chars // {KANON_LEN_BUCKET} AS BIGINT) AS len_bucket,
             CAST(COUNT(*) AS BIGINT) AS group_size
      FROM documents
      GROUP BY lang, source, len_bucket
    )
    SELECT (group_size < {KANON_K}) AS below_k,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(group_size) AS BIGINT) AS n_docs,
           CAST(MIN(group_size) AS BIGINT) AS min_group,
           CAST(MAX(group_size) AS BIGINT) AS max_group
    FROM groups
    GROUP BY below_k
    ORDER BY below_k
    """,
    doc=f"k-anonymity audit over the (lang, source, length-bucket) "
    "quasi-identifier tuple: how many metadata groups — and how many "
    f"documents — fall below k={KANON_K}, i.e. could single out a "
    "contributor if the metadata ships. One hash-agg at the "
    "quasi-identifier grain (dimension-bounded), two-row verdict. The "
    "release-review number for publishing metadata columns.",
)
def corpus_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    groups = docs.groupBy(
        "lang",
        "source",
        F.floor(F.col("n_chars") / KANON_LEN_BUCKET).cast("long").alias(
            "len_bucket"
        ),
    ).agg(F.count(F.lit(1)).cast("long").alias("group_size"))
    return (
        groups.groupBy(
            (F.col("group_size") < KANON_K).alias("below_k")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("group_size").cast("long").alias("n_docs"),
            F.min("group_size").cast("long").alias("min_group"),
            F.max("group_size").cast("long").alias("max_group"),
        )
        .orderBy("below_k")
    )


# ---------------------------------------------------------- l-diversity ----
#
# k-anonymity's blind spot (Machanavajjhala et al. 2007): a group can be
# large yet HOMOGENEOUS — every member carrying the same sensitive value —
# so group membership alone discloses it. The sensitive attribute here is
# the document content itself (its fingerprint): a quasi-identifier group
# whose docs are all near-copies of one text leaks that text to anyone who
# can place a contributor in the group. l = distinct content fingerprints
# per (lang, source, length-bucket) group; the release gate is l >= L.
# Same dimension-bounded two-agg shape as corpus_k_anonymity.

LDIV_L = 3


@query(
    "corpus_l_diversity",
    oracle=f"""
    WITH groups AS (
      SELECT lang, source,
             CAST(n_chars // {KANON_LEN_BUCKET} AS BIGINT) AS len_bucket,
             CAST(COUNT(*) AS BIGINT) AS group_size,
             CAST(COUNT(DISTINCT md5(lower(trim(text)))) AS BIGINT) AS l
      FROM documents
      GROUP BY lang, source, len_bucket
    )
    SELECT (l < {LDIV_L}) AS below_l,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(group_size) AS BIGINT) AS n_docs,
           CAST(MIN(l) AS BIGINT) AS min_l,
           CAST(MAX(l) AS BIGINT) AS max_l
    FROM groups
    GROUP BY below_l
    ORDER BY below_l
    """,
    doc=f"l-diversity audit (Machanavajjhala et al. 2007) over the same "
    "(lang, source, length-bucket) quasi-identifier tuple as "
    "corpus_k_anonymity, with the content fingerprint as the sensitive "
    f"attribute: groups whose distinct-content count falls below l={LDIV_L} "
    "are homogeneity-attack exposed even when they pass the k gate. One "
    "hash-agg at the quasi-identifier grain with a distinct-count, "
    "two-row verdict — the companion release-review number.",
)
def corpus_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    groups = docs.groupBy(
        "lang",
        "source",
        F.floor(F.col("n_chars") / KANON_LEN_BUCKET).cast("long").alias(
            "len_bucket"
        ),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.countDistinct(F.md5(F.lower(F.trim(F.col("text")))))
        .cast("long")
        .alias("l"),
    )
    return (
        groups.groupBy((F.col("l") < LDIV_L).alias("below_l"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("group_size").cast("long").alias("n_docs"),
            F.min("l").cast("long").alias("min_l"),
            F.max("l").cast("long").alias("max_l"),
        )
        .orderBy("below_l")
    )


# ------------------------------------------------- source concentration -----
#
# One number for "is this corpus dominated by a few sources?": the Gini
# coefficient of per-source token mass, computed with the rank formula
# G = sum_i (2i - n - 1) x_(i) / (n sum x) over ascending-sorted sizes —
# pure integer arithmetic until one final division. The source frame is
# dimension-sized, so the rank window is metadata-scale; the corpus pays
# exactly one token-count aggregation. Dataset cards report this next to
# the domain caps (a post-cap Gini near the pre-cap value means the caps
# did nothing).

@query(
    "corpus_source_gini",
    oracle="""
    WITH per AS (
      SELECT source,
             CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS mass
      FROM documents GROUP BY source
    ), ranked AS (
      SELECT mass,
             CAST(ROW_NUMBER() OVER (ORDER BY mass, source) AS BIGINT) AS i,
             CAST(COUNT(*) OVER () AS BIGINT) AS n,
             CAST(SUM(mass) OVER () AS BIGINT) AS total
      FROM per
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_sources,
           CAST(MAX(total) AS BIGINT) AS total_tokens,
           CAST(SUM((2 * i - n - 1) * mass) AS BIGINT) AS gini_num,
           CAST(SUM((2 * i - n - 1) * mass) AS BIGINT)
             / (CAST(MAX(n) AS BIGINT) * CAST(MAX(total) AS DOUBLE)) AS gini
    FROM ranked
    """,
    doc="Gini coefficient of per-source token mass (rank formula over the "
    "ascending-sorted dimension-sized source frame — integer numerator, "
    "one final division). The concentration number a dataset card "
    "reports next to its domain caps; 0 = perfectly even, ->1 = one "
    "source owns the corpus.",
)
def corpus_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.sum(F.expr("size(split(trim(text), ' '))")).cast("long").alias("mass")
    )
    w_rank = Window.orderBy("mass", "source")
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = per.select(
        "mass",
        F.row_number().over(w_rank).cast("long").alias("i"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
        F.sum("mass").over(w_all).cast("long").alias("total"),
    )
    num = F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("mass")).cast("long")
    return ranked.agg(
        F.max("n").cast("long").alias("n_sources"),
        F.max("total").cast("long").alias("total_tokens"),
        num.alias("gini_num"),
        (
            num
            / (
                F.max("n").cast("long")
                * F.max("total").cast("double")
            )
        ).alias("gini"),
    )


# ---------------------------------------- combined sampling-weight manifest -
#
# The artifact the epoch sampler actually consumes: ONE log-domain weight
# per document combining the dedup family's popularity correction
# (soft-dedup 1/cluster_size) with DSIR's target-domain tilt. Combining in
# log2 space needs no pow(): log2(soft) comes from the Mitchell bitlength
# fold of the already-quantized integer weight (minus the same fold of the
# scale constant, so soft=1 maps to 0), and dsir_logw is already a log2.
# The draw rule downstream is sample_dsir_resample's: keep iff
# log2(u_hash) < log2(base) + combined_log2.

_MLOG2_WS = (
    "((length(bin({v})) - 1)"
    " + ({v} / shiftleft(cast(1 as bigint), length(bin({v})) - 1) - 1.0))"
)
_MLOG2_WS_SQL = (
    "((length(bin({v})) - 1)"
    " + ({v} / (CAST(1 AS BIGINT) << (length(bin({v})) - 1)) - 1.0))"
)


def _pipeline_weighted_oracle() -> str:
    from .dedup import _PAIRS_SQL, SOFTW_SCALE
    from .text import _DSIR_CORE_SQL

    soft_sql = f"CAST(round({SOFTW_SCALE} / s.cluster_size) AS BIGINT)"
    return f"""
    WITH RECURSIVE {_PAIRS_SQL},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(root, node) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.root, e.dst FROM reach r JOIN edges e ON r.node = e.src
    ),
    labels AS (
      SELECT root AS doc_id, MIN(node) AS cluster_id FROM reach GROUP BY root
    ),
    csizes AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM labels GROUP BY cluster_id
    ),
    {_DSIR_CORE_SQL},
    soft AS (
      SELECT l.doc_id, s.cluster_size, {soft_sql} AS soft_scaled
      FROM labels l JOIN csizes s USING (cluster_id)
    )
    SELECT d.doc_id, soft.cluster_size, soft.soft_scaled, d.dsir_logw,
           ({_MLOG2_WS_SQL.format(v="soft.soft_scaled")}
            - {_MLOG2_WS_SQL.format(v=SOFTW_SCALE)}) + d.dsir_logw
             AS combined_log2
    FROM dsirw d JOIN soft ON soft.doc_id = d.doc_id
    ORDER BY d.doc_id
    """


@query(
    "pipeline_weighted_manifest",
    oracle=_pipeline_weighted_oracle(),
    doc="The sampler-facing weight manifest: per document, the soft-dedup "
    "popularity correction (1/cluster_size over near-dup clusters) and "
    "the DSIR target tilt combined into ONE log2-domain weight — "
    "Mitchell folds of quantized integers plus the already-log dsir "
    "score, no pow() anywhere. Downstream draw = compare against the "
    "hash fraction's log2 (sample_dsir_resample's rule). Composition "
    "cost: the two families' passes plus one doc-grain join.",
)
def pipeline_weighted_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import SOFTW_SCALE, dedup_soft_weights
    from .text import dsir_log_weights

    soft = dedup_soft_weights(spark, sf_dir).select(
        "doc_id", "cluster_size", F.col("weight_scaled").alias("soft_scaled")
    )
    docs = load_table(spark, sf_dir, "documents")
    dsir = dsir_log_weights(docs).select("doc_id", "dsir_logw")
    combined = (
        F.expr(_MLOG2_WS.format(v="soft_scaled"))
        - F.expr(_MLOG2_WS.format(v=str(SOFTW_SCALE)))
    ) + F.col("dsir_logw")
    return (
        dsir.join(soft, "doc_id")
        .select(
            "doc_id",
            "cluster_size",
            "soft_scaled",
            "dsir_logw",
            combined.alias("combined_log2"),
        )
        .orderBy("doc_id")
    )



# ------------------------------------------------ length-bucketed batching --
#
# The OTHER packing policy: models fine-tuned on per-example sequences
# (not concat-and-cut pretraining) pad every batch to its longest member,
# so batch assembly by length bucket is what controls padding waste.
# This op is the accounting that justifies the policy: per power-of-2
# length bucket, the docs/token mass, the padded token cost, the waste
# vs the naive pad-everything-to-global-max policy, and the batch count
# under a fixed per-batch token budget. Pure integer arithmetic + one
# final efficiency division per bucket.

BATCH_TOKENS = 4096     # padded token budget per assembled batch
_BUCKET_CAPS = [16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192]


def _bucket_case(col: str) -> str:
    """Smallest power-of-2 cap >= n (chained integer CASE — no log2)."""
    whens = " ".join(
        f"WHEN {col} <= {c} THEN {c}" for c in _BUCKET_CAPS[:-1]
    )
    return f"CASE {whens} ELSE {_BUCKET_CAPS[-1]} END"


@query(
    "pack_length_buckets",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), g AS (
      SELECT CAST(MAX(n_tokens) AS BIGINT) AS global_max FROM t
    ), b AS (
      SELECT CAST({_bucket_case('n_tokens')} AS BIGINT) AS bucket_cap,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             CAST(MAX(n_tokens) AS BIGINT) AS bucket_max
      FROM t GROUP BY bucket_cap
    )
    SELECT bucket_cap, bucket_max, n_docs, total_tokens,
           n_docs * bucket_max AS padded_tokens,
           n_docs * bucket_max - total_tokens AS waste_bucketed,
           n_docs * global_max - total_tokens AS waste_naive,
           CAST(total_tokens AS DOUBLE) / (n_docs * bucket_max) AS efficiency,
           CAST(ceil(CAST(n_docs AS DOUBLE)
                     / greatest({BATCH_TOKENS} // bucket_cap, 1)) AS BIGINT)
             AS n_batches
    FROM b CROSS JOIN g
    ORDER BY bucket_cap
    """,
    doc="Length-bucketed batch planning for padded (per-example) training: "
        "docs grouped into power-of-2 length buckets; per bucket the token "
        "mass, padded cost (padding to the bucket's longest member, as a "
        "batch assembler would), waste vs the naive pad-to-global-max "
        "policy, "
        "padding efficiency, and batch count under a fixed "
        f"{BATCH_TOKENS}-token padded budget. One hash agg on a constant "
        "bucket key + a 1-row global-max broadcast — no sort, no window. "
        "Integer accounting; one IEEE division per emitted bucket.",
)
def pack_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        F.size(F.split(F.trim(F.col("text")), " "))
        .cast("bigint")
        .alias("n_tokens")
    )
    g = t.agg(F.max("n_tokens").cast("bigint").alias("global_max"))
    b = (
        t.select(
            F.expr(_bucket_case("n_tokens")).cast("bigint").alias("bucket_cap"),
            "n_tokens",
        )
        .groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.max("n_tokens").cast("bigint").alias("bucket_max"),
        )
    )
    return (
        b.crossJoin(F.broadcast(g))
        .select(
            "bucket_cap",
            "bucket_max",
            "n_docs",
            "total_tokens",
            (F.col("n_docs") * F.col("bucket_max")).alias("padded_tokens"),
            (F.col("n_docs") * F.col("bucket_max") - F.col("total_tokens")).alias(
                "waste_bucketed"
            ),
            (F.col("n_docs") * F.col("global_max") - F.col("total_tokens")).alias(
                "waste_naive"
            ),
            (
                F.col("total_tokens").cast("double")
                / (F.col("n_docs") * F.col("bucket_max"))
            ).alias("efficiency"),
            # capacity floors at 1 batch-slot: a doc longer than the batch
            # budget (bucket_cap > BATCH_TOKENS) still occupies one batch,
            # and without the floor the div yields 0 -> divide-by-zero
            F.ceil(
                F.col("n_docs").cast("double")
                / F.expr(f"greatest({BATCH_TOKENS} div bucket_cap, 1)")
            )
            .cast("bigint")
            .alias("n_batches"),
        )
        .orderBy("bucket_cap")
    )


# ------------------------------------------------ group-wise (leak-safe) ---
#
# corpus_train_split hashes each DOC independently — correct until the
# corpus contains (near-)duplicates: two copies of one document then land
# in different splits and the eval set leaks training text verbatim. The
# leak-safe form splits by duplicate GROUP: hash the group key (here the
# 16-bit SimHash fingerprint — boilerplate families share it; any cluster
# label works at other fuzziness levels), so every member of a group
# lands in the same split by construction. Emitted per split: doc/group
# counts plus the leakage audit — docs whose group spans >1 split — which
# is ZERO by construction here and nonzero for the doc-keyed split on the
# same groups (the test pins both).

GROUP_SPLIT_SALT = "gsplit_v1"
GS_TRAIN_HEX = "cc"  # 80% of the 256 two-hex space
GS_VAL_HEX = "e6"    # next 10%


@query(
    "corpus_groupwise_split",
    oracle=f"""
    WITH votes AS (
      SELECT doc_id, {", ".join(_simhash_vote_sql(b) for b in range(16))}
      FROM (
        SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
        FROM documents
      ) GROUP BY doc_id
    ), grouped AS (
      SELECT doc_id, CAST({_SIMHASH_FP} AS INTEGER) AS group_fp FROM votes
    ), assigned AS (
      SELECT doc_id, group_fp,
             CASE WHEN substr(md5('{GROUP_SPLIT_SALT}' || group_fp::VARCHAR),
                              1, 2) < '{GS_TRAIN_HEX}' THEN 'train'
                  WHEN substr(md5('{GROUP_SPLIT_SALT}' || group_fp::VARCHAR),
                              1, 2) < '{GS_VAL_HEX}' THEN 'val'
                  ELSE 'test' END AS split
      FROM grouped
    ), spans AS (
      SELECT group_fp, CAST(COUNT(DISTINCT split) AS BIGINT) AS n_splits
      FROM assigned GROUP BY group_fp
    )
    SELECT a.split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT a.group_fp) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN s.n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_leaky_docs
    FROM assigned a JOIN spans s ON a.group_fp = s.group_fp
    GROUP BY a.split
    ORDER BY a.split
    """,
    doc="Group-wise train/val/test split: the split hash is taken over the "
        "near-dup group key (SimHash fingerprint), not the doc id, so "
        "every member of a duplicate family lands in one split — the "
        "leakage guard doc-keyed splits lack. Emits per-split doc/group "
        "counts and the cross-split-group audit (zero by construction). "
        "One explode+agg for the fingerprint, one fingerprint-keyed "
        "shuffle; no corpus-grain joins beyond the group map.",
)
def corpus_groupwise_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import ensure_dedup_table

    # consumer of the persisted dedup-metadata maintenance table (see
    # dedup_labels_table): the group key is read, not recomputed; the
    # oracle stays the full SimHash recompute
    grouped = ensure_dedup_table(spark, sf_dir).select("doc_id", "group_fp")
    h = F.substring(
        F.md5(
            F.concat(F.lit(GROUP_SPLIT_SALT), F.col("group_fp").cast("string"))
        ),
        1,
        2,
    )
    assigned = grouped.withColumn(
        "split",
        F.when(h < GS_TRAIN_HEX, "train")
        .when(h < GS_VAL_HEX, "val")
        .otherwise("test"),
    ).localCheckpoint(eager=False)  # feeds spans + the rollup
    spans = assigned.groupBy("group_fp").agg(
        F.countDistinct("split").cast("bigint").alias("n_splits")
    )
    return (
        assigned.join(spans, "group_fp")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("group_fp").cast("bigint").alias("n_groups"),
            F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_leaky_docs"),
        )
        .orderBy("split")
    )


# ------------------------------------------------ lang x source chi-square -
#
# Composition-independence audit: is language distribution independent of
# source? A large chi-square / Cramér's V means sources are language-
# skewed, so source-level sampling decisions silently reshape the language
# mix — the check run before trusting per-source quotas at 100 TB.
#
# Determinism: observed/marginal counts are exact integers; each cell's
# expected count and contribution is an identical IEEE expression in both
# engines; contributions are quantized to exact integers (positive →
# round is half-away-from-zero in both) before the order-independent
# BIGINT fold; chi2 and Cramér's V are then a fixed scalar IEEE chain.

_CHI2_SCALE = 1_000_000_000


@query(
    "corpus_lang_source_chisq",
    oracle=f"""
    WITH o AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY lang, source
    ), rt AS (
      SELECT lang, CAST(SUM(n) AS BIGINT) AS r FROM o GROUP BY lang
    ), ct AS (
      SELECT source, CAST(SUM(n) AS BIGINT) AS c FROM o GROUP BY source
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS t,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS nl,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS ns
      FROM o
    ), cells AS (
      SELECT CAST(COALESCE(o.n, 0) AS DOUBLE) AS obs,
             CAST(rt.r AS DOUBLE) * ct.c / tot.t AS e
      FROM rt CROSS JOIN ct CROSS JOIN tot
      LEFT JOIN o ON o.lang = rt.lang AND o.source = ct.source
    ), q AS (
      SELECT CAST(SUM(CAST(round((obs - e) * (obs - e) / e * {_CHI2_SCALE})
                           AS BIGINT)) AS BIGINT) AS chi2_q
      FROM cells
    )
    SELECT tot.t AS n_docs, tot.nl AS n_langs, tot.ns AS n_sources,
           CAST((tot.nl - 1) * (tot.ns - 1) AS BIGINT) AS dof,
           CAST(q.chi2_q AS DOUBLE) / {_CHI2_SCALE} AS chi2,
           sqrt(CAST(q.chi2_q AS DOUBLE) / {_CHI2_SCALE}
                / (CAST(tot.t AS DOUBLE)
                   * least(tot.nl - 1, tot.ns - 1))) AS cramers_v
    FROM tot CROSS JOIN q
    """,
    doc="Chi-square independence test of language x source with Cramér's "
        "V: full contingency grid (marginal cross join includes zero "
        "cells, as the test requires), per-cell contributions quantized "
        "to exact integers before the fold. Everything after the one "
        "(lang, source) hash agg is marginal-sized — the 'reduce 100 TB "
        "to one decision row' shape.",
)
def corpus_lang_source_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    o = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return chisq_from_counts(o)


def chisq_from_counts(o: DataFrame) -> DataFrame:
    """Chi-square + Cramér's V over a pre-aggregated ``(lang, source, n)``
    count frame. Shared by the batch query (counts from one corpus scan)
    and the streaming monitor (counts IVM-maintained in O(delta) per
    epoch — ``streaming.corpus.composition_chisq_from_summary``)."""
    o = o.localCheckpoint(eager=False)  # marginal-sized; consumed 4x
    rt = o.groupBy("lang").agg(F.sum("n").cast("bigint").alias("r"))
    ct = o.groupBy("source").agg(F.sum("n").cast("bigint").alias("c"))
    tot = o.agg(
        F.sum("n").cast("bigint").alias("t"),
        F.countDistinct("lang").cast("bigint").alias("nl"),
        F.countDistinct("source").cast("bigint").alias("ns"),
    )
    cells = (
        rt.crossJoin(ct)
        .crossJoin(F.broadcast(tot))
        .join(o, ["lang", "source"], "left")
        .select(
            F.coalesce(F.col("n"), F.lit(0)).cast("double").alias("obs"),
            (F.col("r").cast("double") * F.col("c") / F.col("t")).alias("e"),
        )
    )
    q = cells.agg(
        F.sum(
            F.expr(
                f"CAST(round((obs - e) * (obs - e) / e * {_CHI2_SCALE})"
                " AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("chi2_q")
    )
    return (
        F.broadcast(tot)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("t").alias("n_docs"),
            F.col("nl").alias("n_langs"),
            F.col("ns").alias("n_sources"),
            ((F.col("nl") - 1) * (F.col("ns") - 1))
            .cast("bigint")
            .alias("dof"),
            (F.col("chi2_q").cast("double") / F.lit(_CHI2_SCALE)).alias("chi2"),
            F.sqrt(
                F.col("chi2_q").cast("double")
                / F.lit(_CHI2_SCALE)
                / (
                    F.col("t").cast("double")
                    * F.least(F.col("nl") - 1, F.col("ns") - 1)
                )
            ).alias("cramers_v"),
        )
    )


# ------------------------------------------------ source originality -------
#
# Provenance audit over near-dup families: which source ORIGINATED each
# family (proxy: lowest doc_id — substitute crawl timestamp in production)
# and, per source, how much of its corpus is original vs copied, split by
# whether the original lives in the same source (internal duplication:
# templates, re-posts) or another one (syndication / scraping). The query
# that decides per-source trust weights before mixture sampling.

@query(
    "corpus_source_originality",
    oracle=f"""
    WITH fam AS (
      SELECT doc_id, source, CAST({_SIMHASH_FP} AS INTEGER) AS fp
      FROM (
        SELECT doc_id, source,
               {", ".join(_simhash_vote_sql(b) for b in range(16))}
        FROM (
          SELECT doc_id, source,
                 unnest(string_split(trim(text), ' ')) AS token
          FROM documents
        ) GROUP BY doc_id, source
      )
    ), origin AS (
      SELECT fp, MIN(doc_id) AS origin_doc,
             arg_min(source, doc_id) AS origin_source
      FROM fam GROUP BY fp
    ), flagged AS (
      SELECT f.source,
             CASE WHEN f.doc_id = o.origin_doc THEN 1 ELSE 0 END AS original,
             CASE WHEN f.doc_id <> o.origin_doc
                   AND f.source = o.origin_source THEN 1 ELSE 0
                  END AS internal_copy,
             CASE WHEN f.doc_id <> o.origin_doc
                   AND f.source <> o.origin_source THEN 1 ELSE 0
                  END AS external_copy
      FROM fam f JOIN origin o ON f.fp = o.fp
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(original) AS BIGINT) AS n_original,
           CAST(SUM(internal_copy) AS BIGINT) AS n_internal_copies,
           CAST(SUM(external_copy) AS BIGINT) AS n_external_copies,
           CAST(SUM(original) AS DOUBLE) / COUNT(*) AS originality_rate
    FROM flagged
    GROUP BY source
    ORDER BY source
    """,
    doc="Per-source originality over 16-bit SimHash families: original "
        "(family's lowest doc_id — swap in crawl time at production), "
        "internal copies (origin in the same source) and external copies "
        "(origin elsewhere), plus the originality rate that feeds source "
        "trust weights. One fingerprint agg + a family-sized origin "
        "lookup joined back; integer counts, one IEEE division per row.",
)
def corpus_source_originality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import ensure_dedup_table

    docs = load_table(spark, sf_dir, "documents")
    # consumer of the persisted maintenance table (see dedup_labels_table):
    # the 16-vote SimHash agg is served from the persisted group_fp column
    # joined to the 2-column (doc_id, source) projection; the oracle stays
    # the full SimHash recompute, so the table is re-verified here
    fam = (
        ensure_dedup_table(spark, sf_dir)
        .select("doc_id", F.col("group_fp").cast("int").alias("fp"))
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", "fp")
        .localCheckpoint(eager=False)  # feeds origin agg AND the flag join
    )
    origin = fam.groupBy("fp").agg(
        F.min("doc_id").alias("origin_doc"),
        F.expr("min_by(source, doc_id)").alias("origin_source"),
    )
    flagged = fam.join(F.broadcast(origin), "fp").select(
        "source",
        F.when(F.col("doc_id") == F.col("origin_doc"), 1)
        .otherwise(0)
        .alias("original"),
        F.when(
            (F.col("doc_id") != F.col("origin_doc"))
            & (F.col("source") == F.col("origin_source")),
            1,
        )
        .otherwise(0)
        .alias("internal_copy"),
        F.when(
            (F.col("doc_id") != F.col("origin_doc"))
            & (F.col("source") != F.col("origin_source")),
            1,
        )
        .otherwise(0)
        .alias("external_copy"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("original").cast("bigint").alias("n_original"),
            F.sum("internal_copy").cast("bigint").alias("n_internal_copies"),
            F.sum("external_copy").cast("bigint").alias("n_external_copies"),
            (
                F.sum("original").cast("double") / F.count(F.lit(1))
            ).alias("originality_rate"),
        )
        .orderBy("source")
    )


# ------------------------------------------------ source influence ---------
#
# Leave-one-source-out (jackknife) influence on a corpus statistic: how
# much does each source pull the corpus-mean document length? The
# data-ablation planning query — sources with outsized |influence| get
# audited before anything trains on the mix. One (source) hash agg; the
# leave-one-out means come from the global totals minus each source's
# totals (no per-source rescan). Integer sums; one IEEE division chain
# per source row, written identically in both engines.


@query(
    "corpus_source_influence",
    oracle="""
    WITH s AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_chars) AS BIGINT) AS sx
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(sx) AS BIGINT) AS sxt
      FROM s
    )
    SELECT source, n AS n_docs,
           CAST(sx AS DOUBLE) / n AS mean_chars_source,
           CAST(sxt AS DOUBLE) / nt AS mean_chars_all,
           CASE WHEN nt - n > 0
                THEN CAST(sxt - sx AS DOUBLE) / (nt - n)
                ELSE NULL END AS mean_chars_without,
           CASE WHEN nt - n > 0
                THEN CAST(sxt AS DOUBLE) / nt
                     - CAST(sxt - sx AS DOUBLE) / (nt - n)
                ELSE NULL END AS influence
    FROM s CROSS JOIN tot
    ORDER BY source
    """,
    doc="Leave-one-source-out influence on mean document length: each "
        "source's pull on the corpus mean, computed from global totals "
        "minus per-source totals — one hash agg + a 1-row broadcast, no "
        "per-source rescan (the jackknife at 100 TB). Integer sums; one "
        "IEEE division chain per row, NULL-guarded for a single-source "
        "corpus.",
)
def corpus_source_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n_chars").cast("bigint").alias("sx"),
    )
    s = s.localCheckpoint(eager=False)  # feeds the totals AND the per-row join
    tot = s.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("sx").cast("bigint").alias("sxt"),
    )
    rest = F.col("nt") - F.col("n")
    without = F.when(
        rest > 0, (F.col("sxt") - F.col("sx")).cast("double") / rest
    )
    return (
        s.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n").alias("n_docs"),
            (F.col("sx").cast("double") / F.col("n")).alias(
                "mean_chars_source"
            ),
            (F.col("sxt").cast("double") / F.col("nt")).alias(
                "mean_chars_all"
            ),
            without.alias("mean_chars_without"),
            F.when(
                rest > 0,
                F.col("sxt").cast("double") / F.col("nt")
                - (F.col("sxt") - F.col("sx")).cast("double") / rest,
            ).alias("influence"),
        )
        .orderBy("source")
    )


# ------------------------------------------------ dedup mixture shift ------
#
# What dedup does to the MIXTURE: sources over-represented by duplicates
# lose share when a keep-first pass runs, so any mixture weights tuned on
# the raw corpus are stale the moment dedup lands. This emits, per
# source, the token share before and after exact dedup (keep = lowest
# doc_id per content fingerprint, tokens attributed to the surviving
# doc's source) and the shift — the table that says whether the sampler
# needs re-tuning. Integer token accounting; one IEEE division chain per
# row.


@query(
    "corpus_dedup_mixture_shift",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
             md5(lower(trim(text))) AS fp
      FROM documents
    ), keep AS (
      SELECT fp, MIN(doc_id) AS keep_doc FROM tok GROUP BY fp
    ), flagged AS (
      SELECT t.source, t.n_tokens,
             CASE WHEN t.doc_id = k.keep_doc THEN t.n_tokens ELSE 0 END
               AS kept_tokens
      FROM tok t JOIN keep k ON t.fp = k.fp
    ), per_source AS (
      SELECT source,
             CAST(SUM(n_tokens) AS BIGINT) AS tokens_before,
             CAST(SUM(kept_tokens) AS BIGINT) AS tokens_after
      FROM flagged GROUP BY source
    ), tot AS (
      SELECT CAST(SUM(tokens_before) AS BIGINT) AS tb,
             CAST(SUM(tokens_after) AS BIGINT) AS ta
      FROM per_source
    )
    SELECT source, tokens_before, tokens_after,
           CAST(tokens_before AS DOUBLE) / tb AS share_before,
           CAST(tokens_after AS DOUBLE) / ta AS share_after,
           CAST(tokens_after AS DOUBLE) / ta
             - CAST(tokens_before AS DOUBLE) / tb AS share_shift
    FROM per_source CROSS JOIN tot
    ORDER BY source
    """,
    doc="Mixture-share shift under exact dedup: per-source token share "
        "before vs after a keep-first pass (keep = lowest doc_id per "
        "content fingerprint) — duplicate-inflated sources lose share, "
        "so mixture weights tuned pre-dedup are stale. One fingerprint "
        "agg + a source-sized tail with a 1-row totals broadcast; the "
        "re-tuning trigger for the sampling family.",
)
def corpus_dedup_mixture_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        F.expr("CAST(size(split(trim(text), ' ')) AS BIGINT)").alias("n_tokens"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"),
    )
    tok = tok.localCheckpoint(eager=False)  # feeds keep agg AND the flag join
    keep = tok.groupBy("fp").agg(F.min("doc_id").alias("keep_doc"))
    flagged = tok.join(keep, "fp").select(
        "source",
        "n_tokens",
        F.when(F.col("doc_id") == F.col("keep_doc"), F.col("n_tokens"))
        .otherwise(F.lit(0))
        .alias("kept_tokens"),
    )
    per_source = flagged.groupBy("source").agg(
        F.sum("n_tokens").cast("bigint").alias("tokens_before"),
        F.sum("kept_tokens").cast("bigint").alias("tokens_after"),
    )
    per_source = per_source.localCheckpoint(eager=False)
    tot = per_source.agg(
        F.sum("tokens_before").cast("bigint").alias("tb"),
        F.sum("tokens_after").cast("bigint").alias("ta"),
    )
    sb = F.col("tokens_before").cast("double") / F.col("tb")
    sa = F.col("tokens_after").cast("double") / F.col("ta")
    return (
        per_source.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "tokens_before",
            "tokens_after",
            sb.alias("share_before"),
            sa.alias("share_after"),
            (sa - sb).alias("share_shift"),
        )
        .orderBy("source")
    )


# ------------------------------------------ data-constrained epoch plan -----

EPOCH_MAX = 6        # never repeat a source more than 6 epochs
EPOCH_BUDGET_X = 2   # training budget = 2x the unique-token corpus


@query(
    "corpus_repeat_epochs",
    oracle=f"""
    WITH src AS (
      SELECT source,
             CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ), grid AS (
      SELECT s.source, s.n_tokens, e.epoch,
             CAST(floor(s.n_tokens / power(2, e.epoch - 1)) AS BIGINT)
               AS value
      FROM src s, UNNEST(range(1, {EPOCH_MAX} + 1)) AS e(epoch)
    ), ranked AS (
      SELECT *,
             SUM(n_tokens) OVER (
               ORDER BY value DESC, source, epoch
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_tokens,
             CAST({EPOCH_BUDGET_X} * SUM(CASE WHEN epoch = 1 THEN n_tokens
                                              ELSE 0 END) OVER () AS BIGINT)
               AS budget
      FROM grid WHERE value > 0
    ), taken AS (
      SELECT * FROM ranked WHERE cum_tokens - n_tokens < budget
    )
    SELECT source,
           MIN(n_tokens) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS epochs,
           CAST(COUNT(*) * MIN(n_tokens) AS BIGINT) AS tokens_allocated,
           CAST(SUM(value) AS BIGINT) AS effective_value,
           CAST(COUNT(*) * MIN(n_tokens) AS DOUBLE) / MIN(budget)
             AS budget_share
    FROM taken
    GROUP BY source
    ORDER BY source
    """,
    doc="Data-constrained epoch planner (the Muennighoff-style repeat "
    "allocator): under a training budget of 2x the unique corpus, decide "
    "how many epochs each source repeats. Epoch e of source s costs "
    "n_tokens(s) and is worth n_tokens(s) >> (e-1) — a halving "
    "diminishing-returns schedule for repeated data — and slices are "
    "taken greedily by marginal value until the budget line; the slice "
    "that crosses it is kept (budgets cap starts, like pack_sequences "
    "cuts). Halving is strictly decreasing while positive, so a source's "
    "epoch e always outranks its epoch e+1 and allocations are "
    "contiguous — the greedy IS the optimal fractional-knapsack order. "
    "Scale: one corpus-grain hash shuffle to source token counts; the "
    "grid is |sources| x 6 rows, so the global ranking window sorts "
    "metadata, never data. All integer math (floor-div by powers of "
    "two), engine-identical.",
)
def corpus_repeat_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.trim(F.col("text")), " ")))
        .cast("bigint")
        .alias("n_tokens")
    )
    grid = src.select(
        "source",
        "n_tokens",
        F.explode(F.expr(f"sequence(1, {EPOCH_MAX})")).alias("epoch"),
    ).select(
        "source",
        "n_tokens",
        F.col("epoch").cast("bigint").alias("epoch"),
        F.expr("cast(floor(n_tokens / power(2, epoch - 1)) as bigint)").alias(
            "value"
        ),
    )
    wrank = (
        Window.partitionBy()
        .orderBy(F.col("value").desc(), "source", "epoch")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy()
    ranked = (
        grid.filter(F.col("value") > 0)
        .withColumn("cum_tokens", F.sum("n_tokens").over(wrank))
        .withColumn(
            "budget",
            (
                F.lit(EPOCH_BUDGET_X)
                * F.sum(
                    F.when(F.col("epoch") == 1, F.col("n_tokens")).otherwise(
                        F.lit(0)
                    )
                ).over(wall)
            ).cast("bigint"),
        )
    )
    taken = ranked.filter(F.col("cum_tokens") - F.col("n_tokens") < F.col("budget"))
    return (
        taken.groupBy("source")
        .agg(
            F.min("n_tokens").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("epochs"),
            (F.count(F.lit(1)) * F.min("n_tokens"))
            .cast("bigint")
            .alias("tokens_allocated"),
            F.sum("value").cast("bigint").alias("effective_value"),
            (
                (F.count(F.lit(1)) * F.min("n_tokens")).cast("double")
                / F.min("budget")
            ).alias("budget_share"),
        )
        .orderBy("source")
    )


# ------------------------------------------- mirrored-rank pair packing -----

PACK_CTX = 512  # context length for paired packing (same grid as chunks)


@query(
    "pack_pair_efficiency",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS l
      FROM documents
    ), ranked AS (
      SELECT doc_id, lang, l,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY l DESC, doc_id
             ) AS rd,
             CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n
      FROM d
    ), pairs AS (
      SELECT a.lang,
             LEAST(a.l, {PACK_CTX}) + LEAST(b.l, {PACK_CTX}) AS fill
      FROM ranked a
      JOIN ranked b
        ON b.lang = a.lang AND b.rd = a.n - a.rd + 1 AND a.rd < b.rd
    ), solo AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM({PACK_CTX} - LEAST(l, {PACK_CTX})) AS BIGINT)
               AS naive_waste
      FROM d GROUP BY lang
    ), paired AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN fill <= {PACK_CTX}
                           THEN {PACK_CTX} - fill ELSE 0 END) AS BIGINT)
               AS pair_waste,
             CAST(SUM(CASE WHEN fill > {PACK_CTX} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_overflow
      FROM pairs GROUP BY lang
    )
    SELECT s.lang, s.n_docs, p.n_pairs, p.n_overflow,
           s.naive_waste, p.pair_waste,
           1.0 - p.pair_waste / CAST(s.naive_waste AS DOUBLE)
             AS waste_reduction
    FROM solo s JOIN paired p USING (lang)
    ORDER BY s.lang
    """,
    doc="Sequence-packing efficiency audit via mirrored-rank pairing: per "
    "language, rank docs by token length desc and pair rank i with rank "
    "n-i+1 (longest with shortest — the closed-form two-pointer pass, "
    "the standard first cut at training-batch packing before an LPT "
    "solver), clamp each member at the context length, and compare "
    "padding waste against one-doc-per-sequence. The table that decides "
    "whether packing is worth a shuffle: waste_reduction near 1 means "
    "almost all padding disappears. Scale: ranks are lang-partitioned "
    "windows (bounded partitions, no global sort); the pair join is "
    "rank-equality inside the same lang — co-partitioned, zero "
    "additional shuffle after the window's. Odd middle doc stays solo "
    "by the a.rd < b.rd guard; all integer math.",
)
def pack_pair_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint").alias("l"),
    )
    w = Window.partitionBy("lang").orderBy(F.col("l").desc(), "doc_id")
    wl = Window.partitionBy("lang")
    ranked = d.select(
        "lang",
        "l",
        F.row_number().over(w).alias("rd"),
        F.count(F.lit(1)).over(wl).cast("bigint").alias("n"),
    ).localCheckpoint(eager=False)  # one window pass; both pair legs
    a = ranked.select(
        "lang", F.col("l").alias("la"), "rd", "n"
    )
    b = ranked.select(
        F.col("lang").alias("lang_b"), F.col("l").alias("lb"),
        F.col("rd").alias("rb"),
    )
    pairs = a.join(
        b,
        (F.col("lang_b") == F.col("lang"))
        & (F.col("rb") == F.col("n") - F.col("rd") + 1)
        & (F.col("rd") < F.col("rb")),
    ).select(
        "lang",
        (
            F.least(F.col("la"), F.lit(PACK_CTX))
            + F.least(F.col("lb"), F.lit(PACK_CTX))
        ).alias("fill"),
    )
    solo = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.lit(PACK_CTX) - F.least(F.col("l"), F.lit(PACK_CTX)))
        .cast("bigint")
        .alias("naive_waste"),
    )
    paired = pairs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(
            F.when(
                F.col("fill") <= PACK_CTX, F.lit(PACK_CTX) - F.col("fill")
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("pair_waste"),
        F.sum(F.when(F.col("fill") > PACK_CTX, 1).otherwise(0))
        .cast("bigint")
        .alias("n_overflow"),
    )
    return (
        solo.join(paired, "lang")
        .select(
            "lang",
            "n_docs",
            "n_pairs",
            "n_overflow",
            "naive_waste",
            "pair_waste",
            F.expr(
                "1.0 - pair_waste / cast(naive_waste as double)"
            ).alias("waste_reduction"),
        )
        .orderBy("lang")
    )


# ------------------------------------------------ k-fold leakage audit ------


@query(
    "corpus_kfold_leakage",
    oracle=f"""
    WITH votes AS (
      SELECT doc_id, {", ".join(_simhash_vote_sql(b) for b in range(16))}
      FROM (
        SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
        FROM documents
      ) GROUP BY doc_id
    ), grouped AS (
      SELECT doc_id, CAST({_SIMHASH_FP} AS INTEGER) AS group_fp FROM votes
    ), assigned AS (
      SELECT doc_id, group_fp,
             CAST(('0x' || substr(md5('kf1:' || doc_id::VARCHAR), 1, 15))
                  AS BIGINT) % 5 AS fold
      FROM grouped
    ), spans AS (
      SELECT group_fp, CAST(COUNT(DISTINCT fold) AS BIGINT) AS n_folds
      FROM assigned GROUP BY group_fp
    )
    SELECT a.fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT a.group_fp) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN s.n_folds > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_leaky_docs,
           CAST(SUM(CASE WHEN s.n_folds > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS leak_frac
    FROM assigned a JOIN spans s ON a.group_fp = s.group_fp
    GROUP BY a.fold
    ORDER BY a.fold
    """,
    doc="Cross-fold leakage audit of the doc-keyed k-fold design: join the "
    "deterministic fold assignment (sample_kfold_assignments' hash) to "
    "the near-dup group key and count, per fold, the docs whose "
    "duplicate family spans more than one fold — the exact contamination "
    "a doc-keyed CV design admits and corpus_groupwise_split's "
    "group-keyed hash eliminates by construction (the two queries are "
    "the before/after of the same decision). Serves the group key from "
    "the persisted dedup labels table (consumer discipline; the oracle "
    "stays the full SimHash recompute). One fold map + one "
    "group_fp-grain span agg; everything else is the k-row rollup.",
)
def corpus_kfold_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import ensure_dedup_table
    from .sampling import KFOLD, SALT_F

    grouped = ensure_dedup_table(spark, sf_dir).select("doc_id", "group_fp")
    assigned = grouped.select(
        "doc_id",
        "group_fp",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(SALT_F), F.col("doc_id").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % KFOLD
        ).alias("fold"),
    ).localCheckpoint(eager=False)  # feeds spans + the rollup
    spans = assigned.groupBy("group_fp").agg(
        F.countDistinct("fold").cast("bigint").alias("n_folds")
    )
    return (
        assigned.join(spans, "group_fp")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("group_fp").cast("bigint").alias("n_groups"),
            F.sum(F.when(F.col("n_folds") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_leaky_docs"),
            (
                F.sum(F.when(F.col("n_folds") > 1, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("leak_frac"),
        )
        .orderBy("fold")
    )


# ------------------------------------------------------ split Hellinger -----
#
# Distribution-level split drift: the Hellinger distance H = sqrt(1 − A)
# with affinity A = Σ_w sqrt(p_w · q_w) between the TRAIN and VAL unigram
# distributions (same hash split as corpus_train_split). corpus_split_drift
# compares marginal stats; this compares the DISTRIBUTIONS — H near 0 says
# the validation set measures the same language the model trains on, H
# near 1 says the split is measuring something else. Exactness at 100 TB:
# sqrt(p·q) is computed as sqrt(cp)·sqrt(cq) / (sqrt(Np)·sqrt(Nq)) —
# counts convert to doubles exactly (< 2⁵³), each sqrt is IEEE-correctly
# rounded, and the per-word product is quantized to BIGINT before the
# vocab-wide sum, so no count product ever overflows and no float sum
# depends on shuffle order. One token explode + one (split, word) agg +
# one word-grain join; totals ride 1-row broadcasts.

HELL_SCALE = 1_000_000


@query(
    "corpus_split_hellinger",
    oracle=f"""
    WITH toks AS (
      SELECT CASE WHEN substr(md5('{{salt}}' || doc_id::VARCHAR), 1, 2)
                       < '{{train_hex}}' THEN 'train'
                  WHEN substr(md5('{{salt}}' || doc_id::VARCHAR), 1, 2)
                       < '{{val_hex}}' THEN 'val'
                  ELSE 'test' END AS split,
             unnest(string_split(trim(text), ' ')) AS w
      FROM documents
    ), c AS (
      SELECT split, w, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks WHERE split IN ('train', 'val') GROUP BY split, w
    ), tot AS (
      SELECT CAST(SUM(CASE WHEN split = 'train' THEN cnt END) AS BIGINT)
               AS np,
             CAST(SUM(CASE WHEN split = 'val' THEN cnt END) AS BIGINT) AS nq
      FROM c
    ), pairs AS (
      SELECT COALESCE(p.w, q.w) AS w,
             COALESCE(p.cnt, 0) AS cp, COALESCE(q.cnt, 0) AS cq
      FROM (SELECT w, cnt FROM c WHERE split = 'train') p
      FULL OUTER JOIN (SELECT w, cnt FROM c WHERE split = 'val') q
        ON p.w = q.w
    ), aff AS (
      SELECT CAST(SUM(CAST(round({HELL_SCALE}.0 * sqrt(CAST(cp AS DOUBLE))
                           * sqrt(CAST(cq AS DOUBLE))) AS BIGINT)) AS BIGINT)
               AS sq,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(COUNT(*) FILTER (WHERE cp = 0 OR cq = 0) AS BIGINT)
               AS n_disjoint
      FROM pairs
    )
    SELECT tot.np AS train_tokens, tot.nq AS val_tokens,
           aff.n_types, aff.n_disjoint,
           CAST(aff.sq AS DOUBLE) / {HELL_SCALE}
             / (sqrt(CAST(tot.np AS DOUBLE)) * sqrt(CAST(tot.nq AS DOUBLE)))
             AS affinity,
           sqrt(1.0 - CAST(aff.sq AS DOUBLE) / {HELL_SCALE}
                / (sqrt(CAST(tot.np AS DOUBLE)) * sqrt(CAST(tot.nq AS DOUBLE))))
             AS hellinger
    FROM aff CROSS JOIN tot
    """.format(salt=SPLIT_SALT, train_hex=TRAIN_HEX, val_hex=VAL_HEX),
    doc="Hellinger distance between the train and val unigram "
        "distributions (same hash split as corpus_train_split): the "
        "distribution-level split-drift number corpus_split_drift's "
        "marginals can't see. Affinity terms are sqrt(cp)·sqrt(cq) "
        "(exact-input IEEE sqrts — no count product ever forms, so "
        "nothing overflows at 100 TB), quantized per word before the "
        "vocab-wide BIGINT sum; one token explode + one (split, word) "
        "agg + one word-grain full-outer join.",
)
def corpus_split_hellinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(
        F.md5(F.concat(F.lit(SPLIT_SALT), F.col("doc_id").cast("string"))), 1, 2
    )
    toks = docs.select(
        F.when(h < TRAIN_HEX, "train")
        .when(h < VAL_HEX, "val")
        .otherwise("test")
        .alias("split"),
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("w"),
    ).filter(F.col("split").isin("train", "val"))
    c = toks.groupBy("split", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    ).localCheckpoint(eager=False)  # feeds totals AND both join sides
    tot = c.agg(
        F.sum(F.when(F.col("split") == "train", F.col("cnt"))).cast("bigint").alias("np"),
        F.sum(F.when(F.col("split") == "val", F.col("cnt"))).cast("bigint").alias("nq"),
    )
    p = c.filter(F.col("split") == "train").select("w", F.col("cnt").alias("cp"))
    q = c.filter(F.col("split") == "val").select("w", F.col("cnt").alias("cq"))
    pairs = p.join(q, "w", "full_outer").select(
        F.coalesce("cp", F.lit(0)).alias("cp"),
        F.coalesce("cq", F.lit(0)).alias("cq"),
    )
    aff = pairs.agg(
        F.sum(
            F.expr(
                f"cast(round({HELL_SCALE}.0 * sqrt(cast(cp as double))"
                " * sqrt(cast(cq as double))) as bigint)"
            )
        ).cast("bigint").alias("sq"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(
            F.when((F.col("cp") == 0) | (F.col("cq") == 0), 1).otherwise(0)
        ).cast("bigint").alias("n_disjoint"),
    )
    den = F.sqrt(F.col("np").cast("double")) * F.sqrt(F.col("nq").cast("double"))
    affinity = F.col("sq").cast("double") / F.lit(HELL_SCALE) / den
    return aff.crossJoin(F.broadcast(tot)).select(
        F.col("np").alias("train_tokens"),
        F.col("nq").alias("val_tokens"),
        "n_types",
        "n_disjoint",
        affinity.alias("affinity"),
        F.sqrt(F.lit(1.0) - affinity).alias("hellinger"),
    )


# ------------------------------------------------ UniMax budget allocation -
#
# UniMax (Chung et al., 2023): given a token budget and a per-domain
# repeat cap, allocate the budget as uniformly as possible across
# domains without exceeding any domain's capped supply — waterfilling.
# The sequential greedy of the paper has a closed form: sort domains by
# capped supply s_i ascending; the water level t satisfies
# sum(min(s_i, t)) = B, i.e. t = (B - prefix_j) / (k - j) for the unique
# j with s_j <= t < s_(j+1). That is pure window arithmetic over the
# |domains|-row metadata frame — the corpus-scale work is ONE token
# count. Budget/cap here: B = 2x total supply, cap 4 epochs (enough to
# exercise both the capped and waterfilled regimes on the fixture).

UNIMAX_EPOCH_CAP = 4
UNIMAX_BUDGET_X = 2  # budget = UNIMAX_BUDGET_X * total one-epoch supply


@query(
    "mix_unimax_allocation",
    oracle=f"""
    WITH per AS (
      SELECT source,
             CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT)
               AS tokens
      FROM documents GROUP BY source
    ), sup AS (
      SELECT source, tokens,
             CAST({UNIMAX_EPOCH_CAP} AS BIGINT) * tokens AS s
      FROM per
    ), tot AS (
      SELECT CAST({UNIMAX_BUDGET_X} AS BIGINT) * SUM(tokens) AS b,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM sup
    ), ranked AS (
      -- candidate at row j: domains 1..j-1 fully satisfied, the rest at
      -- the level -> t_j = (B - prefix_(j-1)) / (k - j + 1), valid on
      -- [s_(j-1), s_j). Row 1 covers the nobody-satisfied case.
      SELECT s.*, tot.b, tot.k,
             ROW_NUMBER() OVER (ORDER BY s, source) AS j,
             CAST(COALESCE(SUM(s) OVER (ORDER BY s, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS p_prev,
             LAG(s) OVER (ORDER BY s, source) AS s_prev
      FROM sup s CROSS JOIN tot
    ), lvl AS (
      -- if total capped supply <= budget no row is valid -> Infinity,
      -- min(s, t) = s for everyone (budget not binding)
      SELECT COALESCE(MAX(CASE
               WHEN CAST(b - p_prev AS DOUBLE) / (k - j + 1) < s
                AND (s_prev IS NULL
                     OR CAST(b - p_prev AS DOUBLE) / (k - j + 1) >= s_prev)
               THEN CAST(b - p_prev AS DOUBLE) / (k - j + 1) END),
             CAST('Infinity' AS DOUBLE)) AS t
      FROM ranked
    )
    SELECT r.source, r.tokens, r.s AS supply_capped,
           CASE WHEN CAST(r.s AS DOUBLE) < lvl.t
                THEN CAST(r.s AS DOUBLE) ELSE lvl.t END AS allocation,
           CASE WHEN CAST(r.s AS DOUBLE) < lvl.t
                THEN CAST(r.s AS DOUBLE) ELSE lvl.t END / r.tokens
             AS epochs,
           lvl.t AS water_level
    FROM ranked r CROSS JOIN lvl
    ORDER BY r.source
    """,
    doc=f"UniMax token-budget allocation (Chung et al. 2023) in closed "
        f"form: waterfilling over per-domain capped supplies (cap "
        f"{UNIMAX_EPOCH_CAP} epochs, budget {UNIMAX_BUDGET_X}x the "
        "one-epoch supply) via prefix sums on the sorted |domains|-row "
        "frame — the unique water level t with sum(min(s_i,t)) = budget "
        "found by window arithmetic, no sequential greedy. Per domain: "
        "allocation, realized epochs, and the level. Corpus-scale work "
        "is one token count; everything after is metadata-sized.",
)
def mix_unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    sup = (
        docs.groupBy("source")
        .agg(
            F.sum(F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint"))
            .cast("bigint")
            .alias("tokens")
        )
        .select(
            "source",
            "tokens",
            (F.lit(UNIMAX_EPOCH_CAP).cast("bigint") * F.col("tokens")).alias(
                "s"
            ),
        )
    )
    tot = sup.agg(
        (F.lit(UNIMAX_BUDGET_X).cast("bigint") * F.sum("tokens")).alias("b"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    wo = Window.orderBy("s", "source")
    ranked = (
        sup.crossJoin(F.broadcast(tot))
        .withColumn("j", F.row_number().over(wo).cast("bigint"))
        .withColumn(
            "p_prev",
            F.coalesce(
                F.sum("s").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("bigint"),
        )
        .withColumn("s_prev", F.lag("s").over(wo))
        .localCheckpoint(eager=False)  # |domains| rows; level + output
    )
    # candidate at row j: domains 1..j-1 fully satisfied, rest at level
    cand = (F.col("b") - F.col("p_prev")).cast("double") / (
        F.col("k") - F.col("j") + 1
    )
    lvl = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    (cand < F.col("s"))
                    & (F.col("s_prev").isNull() | (cand >= F.col("s_prev"))),
                    cand,
                )
            ),
            F.lit(float("inf")),
        ).alias("t")
    )
    alloc = F.when(
        F.col("s").cast("double") < F.col("t"), F.col("s").cast("double")
    ).otherwise(F.col("t"))
    return (
        ranked.crossJoin(F.broadcast(lvl))
        .select(
            "source",
            "tokens",
            F.col("s").alias("supply_capped"),
            alloc.alias("allocation"),
            (alloc / F.col("tokens")).alias("epochs"),
            F.col("t").alias("water_level"),
        )
        .orderBy("source")
    )
