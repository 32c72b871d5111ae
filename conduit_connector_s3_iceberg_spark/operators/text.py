"""Text-analysis operators over the ``documents`` table (north-star layer).

Everything is built from JVM-side expression primitives (split, higher-order
array lambdas, regexp_count, md5) — zero Python UDFs, so the whole pipeline
stays inside whole-stage codegen and scales linearly with executors: each
operator is a narrow map over the document rows followed by (at most) one
hash aggregation. No shuffles except the final group-bys.

Cross-engine notes: documents are lowercase ``[a-z0-9 ]`` single-spaced, so
``split(text, ' ')`` tokenizes identically in Spark and DuckDB; ratio math
uses one IEEE double op sequence written identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import QUERIES, query, track_cache
from ..sources.tables import load_table
from . import lm as _lm  # noqa: F401  (registers the fluency oracle this module composes)
from .dedup import SHINGLES_SPARK, SHINGLES_SQL

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
_SW_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# language marker words for the n-gram/stopword-hit language heuristic
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "to", "in"),
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "fr": ("le", "la", "et", "les", "des", "est"),
    "es": ("el", "los", "y", "que", "por", "una"),
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _tokens() -> F.Column:
    return F.split(F.trim(F.col("text")), " ")


def quality_col() -> F.Column:
    """The heuristic quality score over the ``text`` column — shared by the
    batch queries below and the streaming corpus pipeline
    (streaming/corpus.py), so batch and stream gate identically."""
    toks = _tokens()
    n_tok = F.size(toks)
    return (
        F.lit(0.3) * (F.size(F.array_distinct(toks)).cast("double") / n_tok)
        + F.lit(0.3) * (_hits(STOPWORDS).cast("double") / n_tok)
        + F.lit(0.2)
        * (
            F.lit(1)
            - F.regexp_count(F.col("text"), F.lit("[0-9]")).cast("double")
            / F.length("text")
        )
        + F.lit(0.2)
        * F.least(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / n_tok
            / 10,
            F.lit(1.0),
        )
    )


def _hits(words: tuple[str, ...]) -> F.Column:
    lst = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter(split(trim(text), ' '), x -> x IN ({lst})))")


def _sql_hits(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(string_split(trim(text), ' '), x -> x IN ({lst})))"


@query(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(trim(text), ' ')) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(string_split(trim(text), ' '))) AS INTEGER)
             AS n_distinct_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INTEGER)
             AS n_regex_tokens,
           CAST(length(replace(text, ' ', '')) AS INTEGER) AS n_nonspace_chars,
           CAST(length(text) AS INTEGER) AS n_chars_measured
    FROM documents
    """,
    doc="Token counting: whitespace tokens, distinct tokens, and a BPE-ish "
        "regex token count — all codegen expressions (no UDF).",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = _tokens()
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.regexp_count(F.col("text"), F.lit("[a-z]+|[0-9]+")).alias("n_regex_tokens"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias(
            "n_nonspace_chars"
        ),
        F.length("text").alias("n_chars_measured"),
    )


@query(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id, n_tokens, ttr, stop_ratio, digit_ratio, avg_token_len,
           0.3*ttr + 0.3*stop_ratio + 0.2*(1 - digit_ratio)
             + 0.2*least(avg_token_len/10, 1.0) AS quality
    FROM (
      SELECT doc_id,
             CAST(len(string_split(trim(text), ' ')) AS INTEGER) AS n_tokens,
             CAST(len(list_distinct(string_split(trim(text), ' '))) AS DOUBLE)
               / len(string_split(trim(text), ' ')) AS ttr,
             CAST({_sql_hits(STOPWORDS)} AS DOUBLE)
               / len(string_split(trim(text), ' ')) AS stop_ratio,
             CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
               / length(text) AS digit_ratio,
             CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / len(string_split(trim(text), ' ')) AS avg_token_len
      FROM documents
    )
    """,
    doc="Heuristic quality scoring: type-token ratio, stopword ratio, digit "
        "ratio, token length — weighted into one score (identical IEEE op "
        "order on both engines).",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = _tokens()
    n_tok = F.size(toks)
    base = docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / n_tok).alias("ttr"),
        (_hits(STOPWORDS).cast("double") / n_tok).alias("stop_ratio"),
        (
            F.regexp_count(F.col("text"), F.lit("[0-9]")).cast("double")
            / F.length("text")
        ).alias("digit_ratio"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / n_tok
        ).alias("avg_token_len"),
    )
    return base.select(
        "*",
        (
            F.lit(0.3) * F.col("ttr")
            + F.lit(0.3) * F.col("stop_ratio")
            + F.lit(0.2) * (F.lit(1) - F.col("digit_ratio"))
            + F.lit(0.2) * F.least(F.col("avg_token_len") / 10, F.lit(1.0))
        ).alias("quality"),
    )


@query(
    "text_langid",
    oracle=f"""
    SELECT doc_id, lang AS lang_labeled,
           CAST(en AS INTEGER) AS hits_en, CAST(de AS INTEGER) AS hits_de,
           CAST(fr AS INTEGER) AS hits_fr, CAST(es AS INTEGER) AS hits_es,
           CASE
             WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en'
             WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
             WHEN fr >= es AND fr > 0 THEN 'fr'
             WHEN es > 0 THEN 'es'
             ELSE 'und'
           END AS lang_detected
    FROM (
      SELECT doc_id, lang,
             {_sql_hits(LANG_MARKERS['en'])} AS en,
             {_sql_hits(LANG_MARKERS['de'])} AS de,
             {_sql_hits(LANG_MARKERS['fr'])} AS fr,
             {_sql_hits(LANG_MARKERS['es'])} AS es
      FROM documents
    )
    """,
    doc="Marker-word language ID heuristic with a deterministic argmax "
        "(priority tie-break en>de>fr>es, 'und' when no markers hit).",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("lang_labeled"),
        _hits(LANG_MARKERS["en"]).alias("hits_en"),
        _hits(LANG_MARKERS["de"]).alias("hits_de"),
        _hits(LANG_MARKERS["fr"]).alias("hits_fr"),
        _hits(LANG_MARKERS["es"]).alias("hits_es"),
    )
    en, de, fr, es = (F.col(f"hits_{x}") for x in ("en", "de", "fr", "es"))
    return scored.select(
        "*",
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), "en")
        .when((de >= fr) & (de >= es) & (de > 0), "de")
        .when((fr >= es) & (fr > 0), "fr")
        .when(es > 0, "es")
        .otherwise("und")
        .alias("lang_detected"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text))) AS content_fp,
           min(md5(shingle)) AS min_shingle_fp
    FROM (
      SELECT doc_id, text,
             unnest(list_transform(
               generate_series(1, greatest(len(string_split(trim(text),' ')) - 2, 1)),
               i -> array_to_string(list_slice(string_split(trim(text),' '), i, i+2), ' ')
             )) AS shingle
      FROM documents
    )
    GROUP BY doc_id, text
    """,
    doc="Document fingerprinting: exact content hash + MinHash-1 over 3-gram "
        "shingles (stable under shingle reordering; rolling-hash analogue).",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    shingled = docs.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_fp"),
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(split(trim(text),' ')) - 2, 1)),"
                " i -> concat_ws(' ', slice(split(trim(text),' '), i, 3)))"
            )
        ).alias("shingle"),
    )
    return shingled.groupBy("doc_id", "content_fp").agg(
        F.min(F.md5(F.col("shingle"))).alias("min_shingle_fp")
    )


HEAVY_HITTER_K = 20


@query(
    "text_heavy_hitters",
    oracle=f"""
    SELECT token, COUNT(*) AS n_docs
    FROM (
      SELECT doc_id, unnest(list_distinct(string_split(trim(text), ' '))) AS token
      FROM documents
    )
    GROUP BY token
    ORDER BY n_docs DESC, token
    LIMIT {HEAVY_HITTER_K}
    """,
    doc=f"Corpus heavy hitters: top-{HEAVY_HITTER_K} tokens by document "
        "frequency. Served from the persisted CASED token-counts state "
        "(lm_state.py): uni_c holds exactly one row per (doc, token), so "
        "document frequency is a row-count regroup — no corpus text "
        "scan, no explode on the warm path; the final top-k is a "
        "TakeOrderedAndProject (k rows per partition to the driver, "
        "never a full sort). Deterministic tie-break on the token "
        "itself.",
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .lm_state import serve_uni_cased

    return (
        serve_uni_cased(spark, sf_dir)
        .groupBy(F.col("w").alias("token"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), F.col("token"))
        .limit(HEAVY_HITTER_K)
    )


@query(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           regexp_replace(regexp_replace(lower(trim(text)), '[0-9]+', '<num>', 'g'),
                          ' +', ' ', 'g') AS norm_text,
           md5(regexp_replace(regexp_replace(lower(trim(text)), '[0-9]+', '<num>', 'g'),
                              ' +', ' ', 'g')) AS norm_fp
    FROM documents
    """,
    doc="Canonical text normalization for dedup/training prep: lowercase, "
        "trim, digit runs -> '<num>' placeholder, whitespace collapsed — "
        "then a stable content fingerprint of the normalized form. Pure "
        "narrow map (regexp_replace is codegen, no UDF, no shuffle); the "
        "fingerprint feeds the exact-dedup groupBy downstream.",
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), "[0-9]+", "<num>"),
        " +",
        " ",
    )
    return docs.select(
        "doc_id", norm.alias("norm_text"), F.md5(norm).alias("norm_fp")
    )


HIST_BUCKET_TOKENS = 32  # token-count histogram bucket width
HIST_MAX_BUCKET = 7


@query(
    "text_token_histogram",
    oracle=f"""
    SELECT lang,
           CAST(LEAST(FLOOR(len(string_split(trim(text), ' ')) / {HIST_BUCKET_TOKENS}.0),
                      {HIST_MAX_BUCKET}) AS INTEGER) AS len_bucket,
           COUNT(*) AS n_docs,
           -- CAST: DuckDB SUM(integer) yields HUGEINT; Spark emits BIGINT
           CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY lang, len_bucket
    """,
    doc="Token-length histogram per language: the corpus-profiling rollup "
        "run before choosing packing/truncation lengths. Bucket = "
        f"floor(n_tokens/{HIST_BUCKET_TOKENS}) capped at {HIST_MAX_BUCKET} "
        "(open-ended tail bucket). Row-side bucketing then one tiny "
        "aggregation — (lang × 8) groups regardless of corpus size.",
)
def text_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    n_tok = F.size(_tokens())
    bucket = F.least(
        F.floor(n_tok / F.lit(float(HIST_BUCKET_TOKENS))),
        F.lit(HIST_MAX_BUCKET),
    ).cast("int")
    return docs.groupBy(
        "lang", bucket.alias("len_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok.cast("bigint")).alias("total_tokens"),
    )


PROBE_MOD = 97  # probe set = doc_id % 97 == 0 (~1% of the corpus)

# 3-gram shingles, same fragments as operators/dedup.py (kept textually in
# sync; see SHINGLES_SPARK/SHINGLES_SQL there).
_SH_SPARK = (
    "transform(sequence(1, greatest(size(split(trim(text),' ')) - 2, 1)),"
    " i -> concat_ws(' ', slice(split(trim(text),' '), i, 3)))"
)
_SH_SQL = (
    "list_transform(generate_series(1, greatest(len(string_split(trim(text),' ')) - 2, 1)),"
    " i -> array_to_string(list_slice(string_split(trim(text),' '), i, i+2), ' '))"
)


@query(
    "text_contamination",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct({_SH_SQL})) AS shingle
      FROM documents
    ), probe AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % {PROBE_MOD} = 0
    ), sz AS (
      SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id
    ), hits AS (
      SELECT s.doc_id, COUNT(*) AS n_hits
      FROM sh s JOIN probe p ON s.shingle = p.shingle
      WHERE s.doc_id % {PROBE_MOD} <> 0
      GROUP BY s.doc_id
    )
    SELECT h.doc_id, h.n_hits, z.n_shingles,
           CAST(h.n_hits AS DOUBLE) / z.n_shingles AS contamination
    FROM hits h JOIN sz z ON h.doc_id = z.doc_id
    """,
    doc="Benchmark-contamination check: per corpus document, the fraction "
        "of its 3-gram shingles that appear in a (deterministic ~1%) probe "
        "set — the eval-overlap scrub every training pipeline runs. The "
        "probe shingle index is tiny → broadcast to every executor; the "
        "corpus side is a narrow scan + one aggregation, never a shuffle "
        "of the 100-TB text. Shingles join on an 8-byte xxhash64.",
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    sc = docs.sparkSession.sparkContext
    sh = docs.repartition(sc.defaultParallelism, "doc_id").select(
        "doc_id",
        F.explode(F.expr(f"array_distinct({_SH_SPARK})")).alias("shingle"),
    ).select("doc_id", F.xxhash64("shingle").alias("shingle_h"))
    # consumed three times (probe / sizes / hits): materialize once
    sh = sh.localCheckpoint(eager=False)
    probe = (
        sh.filter(F.col("doc_id") % PROBE_MOD == 0)
        .select("shingle_h")
        .distinct()
    )
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        sh.filter(F.col("doc_id") % PROBE_MOD != 0)
        .join(F.broadcast(probe), "shingle_h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return hits.join(sz, "doc_id").select(
        "doc_id",
        "n_hits",
        "n_shingles",
        (F.col("n_hits").cast("double") / F.col("n_shingles")).alias(
            "contamination"
        ),
    )


QUALITY_THRESHOLD = 0.45  # ~median of the corpus quality distribution


@query(
    "pipeline_training_set",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             md5(lower(trim(text))) AS content_fp,
             CAST(len(string_split(trim(text), ' ')) AS INTEGER) AS n_tokens,
             0.3*(CAST(len(list_distinct(string_split(trim(text), ' '))) AS DOUBLE)
                  / len(string_split(trim(text), ' ')))
           + 0.3*(CAST({_sql_hits(STOPWORDS)} AS DOUBLE)
                  / len(string_split(trim(text), ' ')))
           + 0.2*(1 - CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                      / length(text))
           + 0.2*least(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                       / len(string_split(trim(text), ' ')) / 10, 1.0)
               AS quality,
             {_sql_hits(LANG_MARKERS['en'])} AS en_hits
      FROM documents
    )
    SELECT doc_id, content_fp, n_tokens, quality FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY content_fp ORDER BY doc_id
      ) AS rn
      FROM scored
      WHERE en_hits > 0 AND quality >= {QUALITY_THRESHOLD}
    ) WHERE rn = 1
    """,
    doc="The composed training-data filter pipeline: language gate (en "
        "markers) -> quality gate -> exact-dedup keep-first — all computed "
        "in ONE narrow pass over the corpus (no joins between stages; every "
        "signal is an expression over the same row), then a single "
        "fingerprint-partitioned window for the dedup. The canonical "
        "LLM-corpus cleaning shape at 100 TB: map-only until one shuffle.",
)
def pipeline_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    scored = docs.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_fp"),
        F.size(_tokens()).alias("n_tokens"),
        quality_col().alias("quality"),
        _hits(LANG_MARKERS["en"]).alias("en_hits"),
    )
    kept = scored.filter(
        (F.col("en_hits") > 0) & (F.col("quality") >= QUALITY_THRESHOLD)
    )
    w = Window.partitionBy("content_fp").orderBy("doc_id")
    return (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "content_fp", "n_tokens", "quality")
    )


TFIDF_TOP_K = 50


@query(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct(string_split(trim(text), ' '))) AS token
      FROM documents
    ), df_t AS (
      SELECT token, COUNT(*) AS doc_freq FROM tok GROUP BY token
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    )
    SELECT token, doc_freq,
           CAST(n_docs AS DOUBLE) / doc_freq AS n_over_df
    FROM df_t, n
    ORDER BY doc_freq DESC, token
    LIMIT {TFIDF_TOP_K}
    """,
    doc="Corpus IDF statistics: document frequency per distinct token and "
        "the exact N/df ratio — the weighting table a TF-IDF retrieval or "
        "quality-filter stage broadcasts (idf = ln(n_over_df) is a "
        "downstream map; the transcendental itself is excluded from the "
        "compared output because libm ln differs by 1 ulp across engines). "
        "Document frequency is a row-count regroup of the persisted "
        "CASED token-counts state (uni_c holds one row per (doc, "
        "token) — no corpus text scan on the warm path); the corpus "
        "size joins in as a one-row broadcast; top-k by document "
        "frequency (TakeOrderedAndProject, deterministic token "
        "tie-break).",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .lm_state import serve_uni_cased

    docs = _docs(spark, sf_dir)
    df_t = (
        serve_uni_cased(spark, sf_dir)
        .groupBy(F.col("w").alias("token"))
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        df_t.crossJoin(F.broadcast(n))
        .select(
            "token",
            "doc_freq",
            (F.col("n_docs").cast("double") / F.col("doc_freq")).alias("n_over_df"),
        )
        .orderBy(F.col("doc_freq").desc(), F.col("token"))
        .limit(TFIDF_TOP_K)
    )


@query(
    "text_langid_confusion",
    oracle=f"""
    SELECT lang AS lang_labeled,
           CASE
             WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en'
             WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
             WHEN fr >= es AND fr > 0 THEN 'fr'
             WHEN es > 0 THEN 'es'
             ELSE 'und'
           END AS lang_detected,
           COUNT(*) AS n_docs
    FROM (
      SELECT lang,
             {_sql_hits(LANG_MARKERS['en'])} AS en,
             {_sql_hits(LANG_MARKERS['de'])} AS de,
             {_sql_hits(LANG_MARKERS['fr'])} AS fr,
             {_sql_hits(LANG_MARKERS['es'])} AS es
      FROM documents
    )
    GROUP BY lang_labeled, lang_detected
    """,
    doc="Language-ID confusion matrix: labeled vs detected language counts "
        "— the accuracy report for the langid heuristic (which labels to "
        "trust, where the detector needs markers). Same single-pass "
        "scoring as text_langid, rolled to at most |langs|² cells.",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = text_langid(spark, sf_dir)
    return scored.groupBy(
        "lang_labeled", F.col("lang_detected")
    ).agg(F.count(F.lit(1)).alias("n_docs"))


# ------------------------------------------------------------ repetition
#
# Gopher/C4-style repetition gate: heavily repeated n-grams are the classic
# signature of boilerplate and degenerate text. Score = most-frequent
# trigram count / total trigram count. Shape at scale: one explode + two
# hash aggregations ((doc_id, trigram) then doc_id) — both keyed by doc_id
# so the second agg is a near-local rollup of the first's output.

@query(
    "text_repetition_score",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(string_split(trim(text),' ')) - 2, 1)),
               i -> array_to_string(list_slice(string_split(trim(text),' '), i, i+2), ' ')
             )) AS tri
      FROM documents
    ), c AS (
      SELECT doc_id, tri, COUNT(*) AS cnt FROM s GROUP BY doc_id, tri
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_trigrams,
           COUNT(*) AS n_distinct_trigrams,
           CAST(MAX(cnt) AS BIGINT) AS max_trigram_count,
           CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS BIGINT) AS repetition_ratio
    FROM c
    GROUP BY doc_id
    """,
    doc="Per-document trigram repetition score (the Gopher 'repeated "
        "n-gram fraction' quality gate): most-frequent-trigram share of all "
        "trigrams. One explode + two doc-keyed hash aggregations; output is "
        "one row per document.",
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import SHINGLES_SPARK  # same tokenization as the dedup family

    docs = _docs(spark, sf_dir)
    tri = docs.select(
        "doc_id", F.explode(F.expr(SHINGLES_SPARK)).alias("tri")
    )
    counts = tri.groupBy("doc_id", "tri").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_trigrams"),
        F.count(F.lit(1)).alias("n_distinct_trigrams"),
        F.max("cnt").alias("max_trigram_count"),
        (F.max("cnt").cast("double") / F.sum("cnt")).alias("repetition_ratio"),
    )


# ------------------------------------------------------ Gopher repetition rules
#
# The published Gopher repetition-rule family (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", §A1.1.2): a document is dropped when too
# much of its mass sits in REPEATED n-grams — measured here as (a) the
# top-bigram occurrence share and (b) the fraction of trigram occurrences
# belonging to trigram types that appear >= 2 times in the document
# ("duplicate n-gram mass"; distinct from text_repetition_score, which is
# the single most-frequent-trigram share only). Both statistics are exact
# integer masses per document; the gate itself is an exact per-million
# cross-multiply (1e6·mass <= limit_q·total — no float compare decides
# admission), so both engines admit the identical document set. Shape at
# scale: two explodes + two doc_id-keyed hash-agg chains joined on doc_id
# — corpus-linear, no shuffle wider than the doc grain.

BIGRAMS_SPARK = (
    "transform(sequence(1, greatest(size(split(trim(text),' ')) - 1, 1)),"
    " i -> concat_ws(' ', slice(split(trim(text),' '), i, 2)))"
)
BIGRAMS_SQL = (
    "list_transform(generate_series(1, greatest(len(string_split(trim(text),' ')) - 1, 1)),"
    " i -> array_to_string(list_slice(string_split(trim(text),' '), i, i+1), ' '))"
)
# per-million admission limits (Gopher's published thresholds)
GOPHER_TOP_BI_MAX_Q = 200_000   # top bigram <= 0.20 of bigram occurrences
GOPHER_DUP_TRI_MAX_Q = 300_000  # duplicated-trigram mass <= 0.30


@query(
    "text_gopher_rules",
    oracle=f"""
    WITH bi AS (
      SELECT doc_id, unnest({BIGRAMS_SQL}) AS g FROM documents
    ), bc AS (
      SELECT doc_id, g, COUNT(*) AS cnt FROM bi GROUP BY doc_id, g
    ), bagg AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
             CAST(MAX(cnt) AS BIGINT) AS top_bigram_count,
             CAST(SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT)
               AS dup_bigram_mass
      FROM bc GROUP BY doc_id
    ), tri AS (
      SELECT doc_id, unnest({SHINGLES_SQL}) AS g FROM documents
    ), tc AS (
      SELECT doc_id, g, COUNT(*) AS cnt FROM tri GROUP BY doc_id, g
    ), tagg AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_trigrams,
             CAST(SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT)
               AS dup_trigram_mass
      FROM tc GROUP BY doc_id
    )
    SELECT b.doc_id, n_bigrams, top_bigram_count, dup_bigram_mass,
           n_trigrams, dup_trigram_mass,
           CAST(top_bigram_count AS DOUBLE) / n_bigrams AS top_bigram_frac,
           CAST(dup_trigram_mass AS DOUBLE) / n_trigrams AS dup_trigram_frac,
           (1000000 * top_bigram_count <= {GOPHER_TOP_BI_MAX_Q} * n_bigrams
            AND 1000000 * dup_trigram_mass
                <= {GOPHER_DUP_TRI_MAX_Q} * n_trigrams) AS passes_gopher
    FROM bagg b JOIN tagg t ON b.doc_id = t.doc_id
    """,
    doc="Gopher repetition-rule gate (Rae et al. 2021 §A1.1.2): per-document "
        "top-bigram occurrence share and duplicated-trigram mass fraction, "
        "with the published 0.20/0.30 limits applied as exact per-million "
        "integer cross-multiplies — the admission decision never touches a "
        "float. Two explode+hash-agg chains keyed by doc_id joined at the "
        "doc grain; corpus-linear at 100 TB.",
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Zero-shuffle form (optimization r13, guide §2.4): every output column
    # is a per-document statistic of the gram multiset, so the explode +
    # two-level hash-agg chains + doc-grain join (2 corpus scans, 4
    # exchanges) collapse into ONE narrow projection over the sorted gram
    # arrays — n = array size, top count = longest equal run, duplicated
    # mass = elements with an equal sorted neighbor. Identical integers by
    # construction (multiset counting == sorted-run counting; the per-row
    # verdict form gopher_pass_col has asserted this equivalence since r8);
    # the two doubles divide the same BIGINTs as before. Null text needs no
    # special-casing (r13 ADVICE): the greatest(n-2, 1) floor makes the gram
    # array [''] for a null text in BOTH the old explode form and this one,
    # so such a doc yields (n=1, top=1, dup=0) — exactly the oracle's output
    # for its single NULL gram row.
    from .dedup import _fanned_out

    # fan the single-file scan out first: ALL the cost is per-row array
    # work now, and one parquet file = one task otherwise (the guard
    # never fires at 100 TB where the scan is naturally many-splits)
    docs = _fanned_out(_docs(spark, sf_dir))

    def dup_mass(arr: str) -> str:
        # occurrences belonging to gram types with multiplicity >= 2
        return (
            f"size(filter(sequence(1, size({arr})), i ->"
            f" (i > 1 AND element_at({arr}, i) = element_at({arr}, i - 1))"
            f" OR (i < size({arr})"
            f" AND element_at({arr}, i) = element_at({arr}, i + 1))))"
        )

    top_bi = (
        "aggregate(sbarr,"
        " named_struct('prev', cast(null as string), 'run', 0, 'best', 0),"
        " (acc, x) -> named_struct("
        "   'prev', x,"
        "   'run', if(acc.prev <=> x, acc.run + 1, 1),"
        "   'best', greatest(acc.best, if(acc.prev <=> x, acc.run + 1, 1))),"
        " acc -> acc.best)"
    )
    # sort once per gram kind: each array column is consumed 2-3 times
    # below, which keeps CollapseProject from inlining (re-sorting)
    arrs = docs.select(
        "doc_id",
        F.expr(f"array_sort({BIGRAMS_SPARK})").alias("sbarr"),
        F.expr(f"array_sort({SHINGLES_SPARK})").alias("starr"),
    )
    return arrs.select(
        "doc_id",
        F.expr("cast(size(sbarr) as bigint)").alias("n_bigrams"),
        F.expr(f"cast({top_bi} as bigint)").alias("top_bigram_count"),
        F.expr(f"cast({dup_mass('sbarr')} as bigint)").alias("dup_bigram_mass"),
        F.expr("cast(size(starr) as bigint)").alias("n_trigrams"),
        F.expr(f"cast({dup_mass('starr')} as bigint)").alias("dup_trigram_mass"),
    ).select(
        "doc_id",
        "n_bigrams",
        "top_bigram_count",
        "dup_bigram_mass",
        "n_trigrams",
        "dup_trigram_mass",
        (F.col("top_bigram_count").cast("double") / F.col("n_bigrams")).alias(
            "top_bigram_frac"
        ),
        (F.col("dup_trigram_mass").cast("double") / F.col("n_trigrams")).alias(
            "dup_trigram_frac"
        ),
        (
            (
                F.lit(1_000_000) * F.col("top_bigram_count")
                <= F.lit(GOPHER_TOP_BI_MAX_Q) * F.col("n_bigrams")
            )
            & (
                F.lit(1_000_000) * F.col("dup_trigram_mass")
                <= F.lit(GOPHER_DUP_TRI_MAX_Q) * F.col("n_trigrams")
            )
        ).alias("passes_gopher"),
    )


def gopher_pass_col() -> F.Column:
    """Narrow per-row form of the ``text_gopher_rules`` admission gate —
    bit-identical verdict to the batch query (asserted in
    tests/test_round8_ops.py) but ZERO shuffles: the duplicated-trigram
    mass is counted as sorted-neighbor equality (an element belongs to a
    duplicated type iff it equals a neighbor in the sorted gram array, so
    one array_sort + one index filter replaces the explode + groupBy),
    and the top-bigram count is a single left fold tracking the longest
    equal run. Being a pure codegen expression over ``text``, this is the
    form a STREAMING admission gate uses (stateless, pre-watermark — the
    clean_doc_stream discipline) and the form a 100-TB batch gate prefers
    when only the verdict is needed: corpus-linear with no gram shuffle
    at all."""
    st = f"array_sort({SHINGLES_SPARK})"
    sb = f"array_sort({BIGRAMS_SPARK})"
    dup_tri = (
        f"size(filter(sequence(1, size({st})), i ->"
        f" (i > 1 AND element_at({st}, i) = element_at({st}, i - 1))"
        f" OR (i < size({st}) AND element_at({st}, i) = element_at({st}, i + 1))))"
    )
    top_bi = (
        f"aggregate({sb},"
        " named_struct('prev', cast(null as string), 'run', 0, 'best', 0),"
        " (acc, x) -> named_struct("
        "   'prev', x,"
        "   'run', if(acc.prev <=> x, acc.run + 1, 1),"
        "   'best', greatest(acc.best, if(acc.prev <=> x, acc.run + 1, 1))),"
        " acc -> acc.best)"
    )
    return F.expr(
        f"1000000 * {top_bi} <= {GOPHER_TOP_BI_MAX_Q} * size({sb})"
        f" AND 1000000 * {dup_tri} <= {GOPHER_DUP_TRI_MAX_Q} * size({st})"
    )


# -------------------------------------------------------- collocations (PMI)
#
# Collocation extraction by pointwise mutual information: PMI(a,b) =
# log2( p(ab) / (p(a)·p(b)) ) = log2(f_ab) + 2·log2(N) − log2(M) −
# log2(f_a) − log2(f_b) over adjacent-token pair counts — the classic
# phrase-mining statistic (Church & Hanks 1990). Every log argument is a
# positive integer COUNT, so each term uses the corrected quantized
# Mitchell log2 (lm_source_kl's 0.3466·f·(1−f) form: libm-free, max error
# 0.0076 bits/log, engine-identical), and the whole score is an exact
# BIGINT sum of quantized logs — the top-k ranking is decided by integer
# compare, never a float. Min-count floor excludes the unstable tail
# (hapax pairs have divergent PMI by construction). Shape at scale: one
# pair explode + (pair, token, token) hash aggs + two token-keyed joins;
# totals ride 1-row broadcasts; TakeOrderedAndProject emits k rows.

COLLOC_MIN_COUNT = 5
COLLOC_TOP_K = 50


@query(
    "text_collocations_pmi",
    oracle=f"""
    WITH t AS (
      SELECT string_split(trim(text), ' ') AS toks FROM documents
      WHERE len(string_split(trim(text), ' ')) >= 2
    ), pairs AS (
      SELECT toks[i] AS tok_a, toks[i + 1] AS tok_b
      FROM t, unnest(generate_series(1, len(toks) - 1)) AS s(i)
    ), pc AS (
      SELECT tok_a, tok_b, CAST(COUNT(*) AS BIGINT) AS f_ab
      FROM pairs GROUP BY tok_a, tok_b
      HAVING COUNT(*) >= {COLLOC_MIN_COUNT}
    ), uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS f_w FROM (
        SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents
      ) GROUP BY w
    ), tot AS (
      SELECT CAST(SUM(f_w) AS BIGINT) AS n FROM uni
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pairs
    ), scored AS (
      SELECT pc.tok_a, pc.tok_b, pc.f_ab,
             {_lm._mlog2c_q('pc.f_ab')} + 2 * {_lm._mlog2c_q('tot.n')}
               - {_lm._mlog2c_q('m.m')} - {_lm._mlog2c_q('ua.f_w')}
               - {_lm._mlog2c_q('ub.f_w')} AS pmi_q
      FROM pc
      JOIN uni ua ON pc.tok_a = ua.w
      JOIN uni ub ON pc.tok_b = ub.w
      CROSS JOIN tot CROSS JOIN m
    )
    SELECT tok_a, tok_b, f_ab, pmi_q,
           pmi_q / 1000000.0 AS pmi_bits
    FROM scored
    ORDER BY pmi_q DESC, tok_a, tok_b
    LIMIT {COLLOC_TOP_K}
    """,
    doc=f"Top-{COLLOC_TOP_K} collocations by pointwise mutual information "
        "over adjacent token pairs (Church & Hanks 1990), min pair count "
        f"{COLLOC_MIN_COUNT}: PMI assembled as an exact BIGINT sum of "
        "corrected quantized Mitchell log2 terms (every argument a "
        "positive count; libm-free, engine-identical), so the ranking is "
        "an integer sort. Served from the persisted CASED token-counts "
        "state (lm_state.py): pair counts are a (w1, w2) regroup of the "
        "bi_c artifact, unigram counts a regroup of uni_c, both corpus "
        "totals exact BIGINT folds of the same artifacts — zero corpus "
        "text scans on the warm path, and this from-scratch oracle "
        "re-audits the persisted bytes every sweep. Top-k via "
        "TakeOrderedAndProject.",
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .lm_state import serve_bi_cased, serve_uni_cased

    # the adjacent-pair frame IS the cased bigram artifact: corpus pair
    # counts and the pair total are exact regroupings/folds of it (a
    # 1-token doc contributes no bigram, matching the >= 2 filter)
    bi = serve_bi_cased(spark, sf_dir)
    pc = (
        bi.groupBy(
            F.col("w1").alias("tok_a"), F.col("w2").alias("tok_b")
        )
        .agg(F.sum("cnt").cast("bigint").alias("f_ab"))
        .filter(F.col("f_ab") >= COLLOC_MIN_COUNT)
    )
    uni = (
        serve_uni_cased(spark, sf_dir)
        .groupBy("w")
        .agg(F.sum("cnt").cast("bigint").alias("f_w"))
    )
    uni = track_cache(uni)  # both join sides + the total read it
    tot = uni.agg(F.sum("f_w").cast("bigint").alias("n"))
    m = bi.agg(F.sum("cnt").cast("bigint").alias("m"))
    scored = (
        pc.join(uni.select(F.col("w").alias("tok_a"), F.col("f_w").alias("fa")), "tok_a")
        .join(uni.select(F.col("w").alias("tok_b"), F.col("f_w").alias("fb")), "tok_b")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(m))
        .select(
            "tok_a",
            "tok_b",
            "f_ab",
            (
                F.expr(_lm._mlog2c_q_spark("f_ab"))
                + F.lit(2) * F.expr(_lm._mlog2c_q_spark("n"))
                - F.expr(_lm._mlog2c_q_spark("m"))
                - F.expr(_lm._mlog2c_q_spark("fa"))
                - F.expr(_lm._mlog2c_q_spark("fb"))
            ).alias("pmi_q"),
        )
    )
    return (
        scored.select(
            "tok_a",
            "tok_b",
            "f_ab",
            "pmi_q",
            (F.col("pmi_q") / F.lit(1_000_000.0)).alias("pmi_bits"),
        )
        .orderBy(F.col("pmi_q").desc(), "tok_a", "tok_b")
        .limit(COLLOC_TOP_K)
    )


# ------------------------------------------------------------ token rarity
#
# A model-free 'perplexity proxy': score each token by an integer
# information weight — floor(log2(total_tokens / freq)) + 1, computed as
# the bit length of the integer quotient — and each document by the mean
# weight of its tokens; rare-token-heavy docs score high. Rank-free by
# design (r2 verdict): the previous dense_rank over the whole vocabulary
# ran in a single reducer and broadcast the full ranked vocab, which dies
# at web-corpus vocabulary sizes (10^8+ tokens). This formulation needs
# only a 1-row corpus-total broadcast; the weight is a narrow integer
# expression per vocab row, and integer weights keep the cross-engine math
# exact (bit length == truncated log2, no libm).

@query(
    "text_rarity_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
      FROM documents
    ), vocab AS (
      SELECT tok, COUNT(*) AS freq FROM tok GROUP BY tok
    ), tot AS (
      SELECT CAST(SUM(freq) AS BIGINT) AS total FROM vocab
    ), scored AS (
      SELECT tok, CAST(length(bin(total // freq)) AS INTEGER) AS rarity
      FROM vocab, tot
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(s.rarity) AS BIGINT) AS rarity_sum,
           CAST(SUM(s.rarity) AS DOUBLE) / COUNT(*) AS mean_rarity
    FROM tok t JOIN scored s ON t.tok = s.tok
    GROUP BY t.doc_id
    """,
    doc="Mean token-rarity score per document: each token weighted by "
        "floor(log2(total_tokens/freq)) + 1 (bit length of the integer "
        "quotient — an exact, integer Shannon-information proxy), "
        "documents scored by the mean weight of their tokens. Served "
        "from the persisted CASED token-counts state (lm_state.py): the "
        "vocab table is a (w) regroup of uni_c, the corpus total its "
        "BIGINT fold, and the per-doc score a cnt-weighted fold over "
        "the same artifact — zero corpus text scans on the warm path "
        "(the token join shuffles on tok, reusing the vocab "
        "aggregation's partitioning; integer sums stay "
        "order-independent); this from-scratch oracle re-audits the "
        "persisted bytes every sweep.",
)
def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .lm_state import serve_uni_cased

    tok = serve_uni_cased(spark, sf_dir).select(
        "doc_id", F.col("w").alias("tok"), "cnt"
    )
    tok = track_cache(tok)  # feeds the vocab agg AND the per-doc fold
    vocab = tok.groupBy("tok").agg(F.sum("cnt").alias("freq"))
    total = vocab.agg(F.sum("freq").alias("total"))
    scored = vocab.crossJoin(F.broadcast(total)).select(
        "tok",
        F.length(F.bin(F.expr("total div freq"))).cast("int").alias("rarity"),
    )
    return (
        tok.join(scored, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("rarity")).alias("rarity_sum"),
            (
                F.sum(F.col("cnt") * F.col("rarity")).cast("double")
                / F.sum("cnt")
            ).alias("mean_rarity"),
        )
    )


# ------------------------------------------------------------ PII scrub
#
# Regex PII redaction (emails, IPv4) — the scrub pass every training corpus
# runs before packing. The synthetic corpus contains no PII, so the query
# deterministically injects fixture PII for a known subset of doc_ids
# (doc_id%3==0 gets an email, doc_id%5==0 an IP) and then redacts it; the
# operator under test is the redaction expression chain, which is plain
# regexp_count/regexp_replace — JVM codegen, narrow map, zero shuffle.

EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
IPV4_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"


@query(
    "text_pii_redact",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text
               || CASE WHEN doc_id % 3 = 0
                       THEN ' contact user' || doc_id::VARCHAR || '@example.com'
                       ELSE '' END
               || CASE WHEN doc_id % 5 = 0
                       THEN ' host 10.0.' || (doc_id % 200)::VARCHAR || '.'
                            || (doc_id % 250)::VARCHAR
                       ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(t, '{IPV4_RE}')) AS INTEGER) AS n_ips,
           md5(regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                              '{IPV4_RE}', '<IP>', 'g')) AS redacted_fp
    FROM aug
    """,
    doc="PII scrub: count and redact emails/IPv4 addresses "
        "(regexp_count + chained regexp_replace, '<EMAIL>'/'<IP>' masks). "
        "Fixture PII is injected deterministically per doc_id since the "
        "synthetic corpus has none; output fingerprints the redacted text. "
        "Pure narrow map over the scan — no shuffle, no Python.",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" host 10.0."),
                    (F.col("doc_id") % 200).cast("string"),
                    F.lit("."),
                    (F.col("doc_id") % 250).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("t"), F.lit(EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(IPV4_RE),
        F.lit("<IP>"),
    )
    return aug.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(IPV4_RE)).alias("n_ips"),
        F.md5(redacted).alias("redacted_fp"),
    )


# ----------------------------------------------------------- vocab coverage
#
# Tokenizer-design telemetry: the top-K vocabulary by corpus frequency with
# each word's cumulative share of all tokens — the "how big must the vocab
# be to cover X% of the stream" curve.
#
# Scale: the word count is a partial+final aggregate on uniform string keys
# (map-side combine absorbs the Zipf head — 'the' collapses to one row per
# map task before the shuffle). The global top-K then uses the two-phase
# shape: a per-partition row_number over the post-agg partitions truncates
# to K BEFORE the single-partition merge, so the final window sees at most
# K x shuffle-partitions rows — never the full vocabulary. The running
# coverage sum runs on the K survivors only.

VOCAB_K = 30


@query(
    "text_vocab_coverage",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split(trim(text), ' ')) AS word FROM documents
    ), counts AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n_uses
      FROM words WHERE word <> '' GROUP BY word
    ), tot AS (
      SELECT CAST(SUM(n_uses) AS BIGINT) AS total_tokens FROM counts
    ), ranked AS (
      SELECT word, n_uses,
             CAST(ROW_NUMBER() OVER (ORDER BY n_uses DESC, word) AS INTEGER)
               AS rank,
             CAST(SUM(n_uses) OVER (
               ORDER BY n_uses DESC, word ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS cum_uses
      FROM counts
    )
    SELECT rank, word, n_uses, cum_uses,
           CAST(cum_uses AS DOUBLE) / total_tokens AS coverage
    FROM ranked, tot WHERE rank <= {VOCAB_K}
    """,
    doc=f"Top-{VOCAB_K} vocabulary with cumulative token-coverage share. "
        "Partial+final word count (map-side combine tames the Zipf head), "
        "two-phase global top-K (per-partition pre-truncation bounds the "
        "single-partition merge at K x partitions rows), running coverage "
        "over the K survivors only.",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    counts = (
        docs.select(F.explode(_tokens()).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n_uses"))
    )
    total = counts.agg(F.sum("n_uses").alias("total_tokens"))
    order = (F.col("n_uses").desc(), F.col("word"))
    local = Window.partitionBy(F.spark_partition_id()).orderBy(*order)
    survivors = (
        counts.withColumn("_lrk", F.row_number().over(local))
        .filter(F.col("_lrk") <= VOCAB_K)
        .drop("_lrk")
    )
    merged = Window.orderBy(*order)  # K x partitions rows only — bounded
    run = merged.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        survivors.select(
            F.row_number().over(merged).cast("int").alias("rank"),
            "word",
            "n_uses",
            F.sum("n_uses").over(run).alias("cum_uses"),
        )
        .filter(F.col("rank") <= VOCAB_K)
        .crossJoin(F.broadcast(total))
        .select(
            "rank",
            "word",
            "n_uses",
            "cum_uses",
            (F.col("cum_uses").cast("double") / F.col("total_tokens")).alias(
                "coverage"
            ),
        )
    )


# ----------------------------------------------- length-percentile trimming
#
# The classic "drop the freak tails" gate: keep each language's documents
# between the 5th and 95th length percentile — exact, via cume_dist, so the
# cut adapts per language instead of using one global magic number.
#
# Scale: one shuffle on lang + a per-language sort (the same shape as the
# stratum reservoir; bounded by the largest language). At 100 TB the same
# gate runs as a two-pass threshold join — approx_percentile per language
# (tiny agg), broadcast the cutoffs, filter in a narrow map; the windowed
# form here is the oracle-checkable exact twin and the correctness anchor
# for that rewrite. cume_dist = rank/total is an exact rational, so both
# engines produce bit-identical doubles.

LEN_PCT_LOW = 0.05
LEN_PCT_HIGH = 0.95


@query(
    "text_length_percentile_gate",
    oracle=f"""
    SELECT doc_id, lang, n_chars, pct
    FROM (
      SELECT doc_id, lang, n_chars,
             cume_dist() OVER (PARTITION BY lang ORDER BY n_chars) AS pct
      FROM documents
    )
    WHERE pct > {LEN_PCT_LOW} AND pct <= {LEN_PCT_HIGH}
    """,
    doc="Per-language length-percentile gate: keep docs strictly above the "
        f"{LEN_PCT_LOW:.0%} and at or below the {LEN_PCT_HIGH:.0%} "
        "cume_dist of n_chars. Exact windowed form (one shuffle on lang); "
        "the documented 100-TB rewrite is approx_percentile thresholds "
        "broadcast into a narrow filter, with this query as its exact "
        "correctness anchor.",
)
def text_length_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy("n_chars")
    return (
        docs.select(
            "doc_id", "lang", "n_chars", F.cume_dist().over(w).alias("pct")
        )
        .filter((F.col("pct") > LEN_PCT_LOW) & (F.col("pct") <= LEN_PCT_HIGH))
    )


def length_gate_by_approx_thresholds(
    docs: DataFrame,
    low: float = LEN_PCT_LOW,
    high: float = LEN_PCT_HIGH,
    accuracy: int = 10_000,
) -> DataFrame:
    """The 100-TB form of ``text_length_percentile_gate``: instead of a
    per-language window sort of the corpus, compute the two cutoffs per
    language with ``approx_percentile`` (a tiny partial+final aggregate —
    one KLL sketch per language per map task), broadcast the |languages|-row
    threshold table, and gate in a narrow map join. Two passes over the
    scan, zero wide shuffles, no per-language sort.

    ``approx_percentile`` at accuracy=10k is exact for groups under ~10k
    rows and within 1/accuracy quantile error beyond —
    ``tests/test_operators.py::test_length_gate_approx_matches_exact``
    pins the agreement against the exact windowed gate.
    """
    cuts = docs.groupBy("lang").agg(
        F.expr(
            f"approx_percentile(n_chars, array({low}, {high}), {accuracy})"
        ).alias("cuts")
    ).select(
        "lang",
        F.col("cuts")[0].alias("lo_cut"),
        F.col("cuts")[1].alias("hi_cut"),
    )
    return (
        docs.join(F.broadcast(cuts), "lang")
        .filter((F.col("n_chars") > F.col("lo_cut")) & (F.col("n_chars") <= F.col("hi_cut")))
        .select("doc_id", "lang", "n_chars")
    )


# ------------------------------------------------------- token-id encode --
#
# The last batch step before training: map every token to a vocabulary id
# (dictionary encoding) with OOV -> 0, emitting each document's id
# sequence in order. Vocabulary = the top TOKEN_VOCAB_V tokens by corpus
# frequency (ties by token text, so the table is deterministic). At scale
# the vocab is a broadcast dimension (it is bounded by V, not the corpus)
# and the encode is one broadcast join per exploded token + one doc-keyed
# ordered re-assembly — no shuffle of the corpus beyond the final group.

TOKEN_VOCAB_V = 256


@query(
    "text_token_ids",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, i.pos,
             string_split(trim(text), ' ')[i.pos] AS tok
      FROM documents, LATERAL (
        SELECT unnest(generate_series(1, len(string_split(trim(text), ' '))))
          AS pos
      ) i
    ), vocab AS (
      SELECT tok, CAST(ROW_NUMBER() OVER (
               ORDER BY COUNT(*) DESC, tok
             ) AS INTEGER) AS token_id
      FROM tok GROUP BY tok
      ORDER BY COUNT(*) DESC, tok
      LIMIT {TOKEN_VOCAB_V}
    ), enc AS (
      SELECT t.doc_id, t.pos, COALESCE(v.token_id, 0) AS tid
      FROM tok t LEFT JOIN vocab v ON v.tok = t.tok
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_tokens,
           CAST(SUM(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS INTEGER) AS n_oov,
           array_to_string(array_agg(tid ORDER BY pos), ',') AS ids
    FROM enc GROUP BY doc_id
    """,
    doc=f"Dictionary-encode the corpus to token ids: top-{TOKEN_VOCAB_V} "
        "frequency vocabulary (rank ties broken by token text), OOV -> 0, "
        "per-document id sequence reassembled in token order and emitted "
        "','-joined (scalar-safe). The vocab is a bounded broadcast "
        "dimension; the corpus pays one explode + one broadcast join + "
        "one doc-keyed group — the standard pre-training encode pass.",
)
def text_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.posexplode(_tokens()).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    from pyspark.sql import Window

    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("tok"))
        .limit(TOKEN_VOCAB_V)
        .select(
            "tok",
            F.row_number()
            .over(Window.orderBy(F.col("freq").desc(), F.col("tok")))
            .alias("token_id"),
        )
    )
    enc = tok.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id", "pos", F.coalesce("token_id", F.lit(0)).alias("tid")
    )
    return enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_tokens"),
        F.sum(F.when(F.col("tid") == 0, 1).otherwise(0))
        .cast("int")
        .alias("n_oov"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, tid))),"
            " s -> s.tid), ',')"
        ).alias("ids"),
    )


# ----------------------------------------------- boilerplate chunk removal --
# CCNet-style shared-paragraph removal, adapted to this corpus's
# single-space word soup: the "paragraph" unit is a fixed 8-token chunk at
# a fixed offset grid. A chunk seen in >= BOILER_DF distinct documents
# anywhere in the corpus is boilerplate (nav bars, cookie banners, license
# headers in a real crawl); documents are re-emitted with those chunks
# spliced out. Scale shape: one explode to the chunk grain, one
# map-side-combined distinct-count per (source, chunk), then the corpus
# joins only against the *flagged* chunk set — at real thresholds that set
# is tiny relative to the corpus (boilerplate is by definition repeated),
# so the join broadcasts and the reassembly is one doc-keyed aggregation.

CHUNK_W = 8       # tokens per boilerplate unit
BOILER_DF = 2     # chunk is boilerplate at >= this many distinct docs

_CHUNKS_SPARK = f"""
transform(sequence(0, cast(ceil(size(split(trim(text), ' ')) / {CHUNK_W}.0)
                           as int) - 1),
          i -> array_join(slice(split(trim(text), ' '),
                                i * {CHUNK_W} + 1, {CHUNK_W}), ' '))
"""


@query(
    "text_boilerplate_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS t
      FROM documents
    ), chunks AS (
      SELECT doc_id, i,
             array_to_string(
               list_slice(t, i * {CHUNK_W} + 1, i * {CHUNK_W} + {CHUNK_W}),
               ' ') AS chunk
      FROM (
        SELECT doc_id, t,
               unnest(generate_series(
                 0, CAST(ceil(len(t) / {CHUNK_W}.0) AS INTEGER) - 1)) AS i
        FROM toks
      )
    ), boiler AS (
      SELECT chunk
      FROM chunks
      GROUP BY chunk
      HAVING COUNT(DISTINCT doc_id) >= {BOILER_DF}
    ), flagged AS (
      SELECT c.doc_id, c.i, c.chunk,
             (b.chunk IS NOT NULL) AS is_boiler
      FROM chunks c
      LEFT JOIN boiler b ON b.chunk = c.chunk
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(*) FILTER (WHERE is_boiler) AS BIGINT) AS n_boiler,
           COALESCE(string_agg(chunk, ' ' ORDER BY i)
                      FILTER (WHERE NOT is_boiler), '') AS clean_text
    FROM flagged GROUP BY doc_id
    """,
    doc=f"Boilerplate removal: {CHUNK_W}-token grid chunks shared by >= "
        f"{BOILER_DF} distinct docs are spliced out "
        "(CCNet-style shared-paragraph filter). One explode + one "
        "distinct-count agg builds the flagged set; the corpus then "
        "left-joins only that small repeated-chunk set (broadcast at real "
        "thresholds) and reassembles per doc in chunk order.",
)
def text_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    chunks = docs.select(
        "doc_id",
        F.posexplode(F.expr(_CHUNKS_SPARK)).alias("i", "chunk"),
    )
    boiler = (
        chunks.groupBy("chunk")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= BOILER_DF)
        .select("chunk", F.lit(True).alias("is_boiler"))
    )
    flagged = chunks.join(
        F.broadcast(boiler), ["chunk"], "left"
    ).select(
        "doc_id",
        "i",
        "chunk",
        F.coalesce("is_boiler", F.lit(False)).alias("is_boiler"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.count(F.when(F.col("is_boiler"), 1)).cast("long").alias("n_boiler"),
        F.array_join(
            F.expr(
                "transform(filter(array_sort(collect_list("
                "  struct(i, chunk, is_boiler))), s -> NOT s.is_boiler),"
                " s -> s.chunk)"
            ),
            " ",
        ).alias("clean_text"),
    )


# ------------------------------------------- bloom-filter decontamination --
# The broadcast-sketch variant of text_contamination: instead of shipping
# the benchmark's full distinct-shingle set to every executor, ship an
# m-bit Bloom filter of it. At 100 TB the benchmark suite's n-gram set can
# run to billions of entries; the Bloom filter is a fixed BLOOM_M bits
# regardless, at the price of a bounded false-positive rate — which is the
# safe direction for decontamination (flag-and-drop may discard a few
# clean documents, never leak a benchmark document through). Bit positions
# derive from md5 substrings (conv hex->long % m), so both engines build
# bit-identical filters. Plan shape: benchmark scan -> k exploded
# positions -> distinct (the "bits set" frame, <= BLOOM_M rows, broadcast);
# corpus scan -> k positions per distinct shingle -> broadcast semi-ish
# left join -> a shingle hits iff all k positions matched.

BLOOM_M = 4096   # filter bits
BLOOM_K = 3      # hash functions (md5 hex substrings 1-8, 9-16, 17-24)


def _bloom_pos_spark(j: int) -> str:
    return f"conv(substring(md5(shingle), {8 * j + 1}, 8), 16, 10) % {BLOOM_M}"


def _bloom_pos_sql(j: int) -> str:
    return (
        f"CAST(('0x' || substr(md5(shingle), {8 * j + 1}, 8)) AS BIGINT)"
        f" % {BLOOM_M}"
    )


@query(
    "text_bloom_decontaminate",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct({_SH_SQL})) AS shingle
      FROM documents
    ), bits AS (
      SELECT DISTINCT p
      FROM (
        SELECT unnest([{", ".join(_bloom_pos_sql(j) for j in range(BLOOM_K))}])
          AS p
        FROM (SELECT DISTINCT shingle FROM sh WHERE doc_id % {PROBE_MOD} = 0)
      )
    ), probe AS (
      SELECT s.doc_id, s.shingle,
             {" AND ".join(
                f"EXISTS (SELECT 1 FROM bits WHERE p = {_bloom_pos_sql(j)})"
                for j in range(BLOOM_K))} AS hit
      FROM sh s
      WHERE s.doc_id % {PROBE_MOD} <> 0
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(*) FILTER (WHERE hit) AS BIGINT) AS n_bloom_hits,
           CAST(COUNT(*) FILTER (WHERE hit) AS DOUBLE) / COUNT(*)
             AS bloom_rate
    FROM probe GROUP BY doc_id
    HAVING COUNT(*) FILTER (WHERE hit) > 0
    """,
    doc=f"Bloom-filter decontamination: {BLOOM_M}-bit / {BLOOM_K}-hash "
        "filter over the benchmark shard's distinct 3-gram shingles "
        "(md5-derived positions, bit-identical cross-engine), probed by "
        "the rest of the corpus. Constant-size broadcast state vs the "
        "exact join's full shingle set; false positives only over-flag "
        "(safe for decontamination). One explode + one broadcast join + "
        "one doc-grain agg.",
)
def text_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _fanned_out

    # fanned out: the checkpointed explode otherwise pins the filter build
    # AND the whole md5 probe pass to the one-split scan's single task
    docs = _fanned_out(_docs(spark, sf_dir))
    sh = docs.select(
        "doc_id",
        F.explode(F.expr(f"array_distinct({_SH_SPARK})")).alias("shingle"),
    )
    # consumed twice (filter build / corpus probe): materialize once
    sh = sh.localCheckpoint(eager=False)
    bench = sh.filter(F.col("doc_id") % PROBE_MOD == 0).select("shingle").distinct()
    bits = (
        bench.select(
            F.explode(
                F.array(
                    *[F.expr(_bloom_pos_spark(j)) for j in range(BLOOM_K)]
                )
            ).alias("p")
        )
        .distinct()
    )
    probe = sh.filter(F.col("doc_id") % PROBE_MOD != 0)
    # The filter IS the artifact: materialize the BLOOM_M-bit mask on the
    # driver (constant 512 bytes — the same constant-size-state exception
    # as the CMS fetch in sketches.py) and probe it as a pure codegen
    # expression: zero joins on the probe path, the only remaining shuffle
    # is the final doc-id aggregation. This is exactly how a production
    # bloom filter ships to executors — as a broadcast constant, not a
    # join side.
    words = [0] * (BLOOM_M // 64)
    for (pos,) in bits.collect():
        words[pos >> 6] |= 1 << (pos & 63)
    # two's-complement into Spark's signed longs
    mask = F.array(
        *[F.lit(w - (1 << 64) if w >= (1 << 63) else w).cast("long")
          for w in words]
    )
    def slot_hit(j: int) -> F.Column:
        pj = f"({_bloom_pos_spark(j)})"
        return F.expr(
            f"(shiftright(element_at(bloom_mask,"
            f" cast(shiftright({pj}, 6) as int) + 1),"
            f" cast({pj} % 64 as int)) & 1) = 1"
        )
    matched = probe.withColumn("bloom_mask", mask).select(
        "doc_id",
        (slot_hit(0) & slot_hit(1) & slot_hit(2)).alias("hit"),
    )
    return (
        matched.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.count(F.when(F.col("hit"), 1)).cast("long").alias("n_bloom_hits"),
            (
                F.count(F.when(F.col("hit"), 1)).cast("double")
                / F.count(F.lit(1))
            ).alias("bloom_rate"),
        )
        .filter(F.col("n_bloom_hits") > 0)
    )


# ------------------------------------------- DSIR importance weights --------
#
# Data Selection with Importance Resampling (Xie et al., NeurIPS 2023):
# score each raw document by the log-likelihood ratio of a TARGET-domain
# bag-of-hashed-ngrams model vs the RAW-corpus model, then resample raw data
# proportionally — the standard way to tilt a 100-TB crawl toward a small
# high-quality target distribution without training a classifier.
#
# Features are word bigrams hashed into DSIR_B buckets (the paper's hashed
# n-gram parameterization), with add-1 smoothing on both models. The
# log-ratio is evaluated with Mitchell's base-2 approximation (Mitchell,
# IRE Trans. 1962): log2(r) ~= (L-1) + r/2^(L-1) - 1 with L = bitlength(r)
# — exact integer ops plus ONE power-of-two division, so it is bit-identical
# across engines where a libm ln() is not guaranteed to be. Per-bucket
# weights are quantized to scaled BIGINT once in the (DSIR_B)-row weight
# table; every per-doc accumulation after that is exact integer arithmetic
# (the ``plans/helpers.py`` discipline), emitted as one final division.
#
# Scale shape: one explode over bigrams -> (doc, bucket) pre-aggregation;
# the model is two DSIR_B-row register tables folded from the same exploded
# frame (map-side combined); scoring is a broadcast join of the constant
# weight table against pre-aggregated (doc, bucket, cnt) rows. No Python,
# no window over the corpus, no second scan of `documents` beyond the
# shared bigram frame.

DSIR_B = 1024                # hashed feature buckets
DSIR_RSCALE = 1 << 20        # ratio quantization; log2 = exactly 20
DSIR_WSCALE = 1_000_000      # per-bucket weight quantization

# same tokenizer as the lm family — imported from the counts state so
# the persisted-state key covers this consumer's definition too
from .lm_state import TOKS_SPARK as _BG_TOKS_SPARK  # noqa: E402
from .lm_state import TOKS_SQL as _BG_TOKS_SQL  # noqa: E402


_DSIR_CORE_SQL = f"""toks AS (
      SELECT doc_id, lang, {_BG_TOKS_SQL} AS t FROM documents
    ), bg AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(t[g] || ' ' || t[g + 1]), 1, 15))
                  AS BIGINT) % {DSIR_B} AS b
      FROM toks, UNNEST(range(1, len(t))) AS u(g)
    ), raw AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS n_raw FROM bg GROUP BY b
    ), tgt AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS n_tgt
      FROM bg WHERE lang = 'en' GROUP BY b
    ), bk AS (
      SELECT raw.b, raw.n_raw,
             COALESCE(tgt.n_tgt, CAST(0 AS BIGINT)) AS n_tgt
      FROM raw LEFT JOIN tgt ON raw.b = tgt.b
    ), tot AS (
      SELECT CAST(SUM(n_raw) AS BIGINT) AS tr,
             CAST(SUM(n_tgt) AS BIGINT) AS tt
      FROM bk
    ), wr AS (
      SELECT b,
             GREATEST(CAST(1 AS BIGINT),
               CAST(round({DSIR_RSCALE}.0
                 * (((n_tgt + 1) / (tt + {DSIR_B}))
                    / ((n_raw + 1) / (tr + {DSIR_B})))) AS BIGINT)) AS r
      FROM bk, tot
    ), wv AS (
      SELECT b,
             CAST(round({DSIR_WSCALE}.0
               * ((length(bin(r)) - 1)
                  + (r / (CAST(1 AS BIGINT) << (length(bin(r)) - 1))
                     - 1.0))) AS BIGINT) AS w
      FROM wr
    ), docb AS (
      SELECT doc_id, lang, b, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM bg GROUP BY doc_id, lang, b
    ),
    dsirw AS (
      SELECT doc_id, lang,
             CAST(SUM(cnt) AS BIGINT) AS n_feat,
             ((CAST(SUM(cnt * w) AS BIGINT) / CAST(SUM(cnt) AS BIGINT))
              / {DSIR_WSCALE}.0) - 20.0 AS dsir_logw
      FROM docb JOIN wv USING (b)
      GROUP BY doc_id, lang
    )"""


@query(
    "text_dsir_weights",
    oracle=f"""
    WITH {_DSIR_CORE_SQL}
    SELECT doc_id, lang, n_feat, dsir_logw FROM dsirw ORDER BY doc_id
    """,
    doc="DSIR importance weights (hashed-bigram log-likelihood ratio of "
    "target 'en' model vs raw-corpus model, add-1 smoothed) per document. "
    "Log2 via Mitchell's bitlength approximation so both engines compute "
    "the identical value without a libm ln; per-bucket weights quantized "
    "to BIGINT once in a 1024-row broadcast table, per-doc sums exact "
    "integers. dsir_logw > 0 means the doc looks more like the target "
    "domain than the raw corpus; resample with weights 2^dsir_logw. "
    "Served from the persisted token-counts state (lm_state.py): the "
    "hashed feature buckets derive from the (doc, bigram, count) table "
    "(one md5 per DISTINCT per-doc bigram instead of per instance — "
    "identical counts), with lang joined from a text-free column scan.",
)
def text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .lm_state import serve_bi

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    docb = (
        serve_bi(spark, sf_dir)
        .select(
            "doc_id",
            "cnt",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("w1"), F.lit(" "), F.col("w2")
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % DSIR_B
            ).alias("b"),
        )
        .groupBy("doc_id", "b")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .join(docs, "doc_id")
        .select("doc_id", "lang", "b", "cnt")
        .localCheckpoint(eager=False)
    )
    return _dsir_from_docb(docb).orderBy("doc_id")


def dsir_log_weights(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, n_feat, dsir_logw) — the library form over an
    arbitrary documents frame (no persisted state assumed), reused by
    the resampler in sampling.py."""
    bg = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                f"transform(slice({_BG_TOKS_SPARK}, 1, size({_BG_TOKS_SPARK}) - 1), "
                f"(x, i) -> concat(x, ' ', {_BG_TOKS_SPARK}[i + 1]))"
            )
        ).alias("feat"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5(F.col("feat")), 1, 15), 16, 10).cast("long")
            % DSIR_B
        ).alias("b"),
    )
    # one explode -> one (doc, lang, bucket) pre-aggregation, materialized
    # once: BOTH model register tables and the scoring input derive from it
    # by re-aggregation, so the corpus pays a single explode+hash pass
    # instead of one per consumer (at sf0.1 the wall time is stage
    # overhead either way; at corpus scale the explode pass dominates and
    # running it once is the difference that matters)
    docb = (
        bg.groupBy("doc_id", "lang", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    return _dsir_from_docb(docb)


def _dsir_from_docb(docb: DataFrame) -> DataFrame:
    """DSIR scoring tail over a pre-aggregated (doc_id, lang, b, cnt)
    frame — shared by the state-served query and the library form."""
    raw = docb.groupBy("b").agg(F.sum("cnt").cast("long").alias("n_raw"))
    tgt = (
        docb.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.sum("cnt").cast("long").alias("n_tgt"))
    )
    bk = raw.join(tgt, "b", "left").select(
        "b",
        "n_raw",
        F.coalesce("n_tgt", F.lit(0).cast("long")).alias("n_tgt"),
    )
    tot = bk.agg(
        F.sum("n_raw").cast("long").alias("tr"),
        F.sum("n_tgt").cast("long").alias("tt"),
    )
    ratio = (
        (F.col("n_tgt") + 1) / (F.col("tt") + DSIR_B)
    ) / ((F.col("n_raw") + 1) / (F.col("tr") + DSIR_B))
    r = F.greatest(
        F.lit(1).cast("long"),
        F.round(F.lit(float(DSIR_RSCALE)) * ratio).cast("long"),
    )
    wr = bk.crossJoin(F.broadcast(tot)).select("b", r.alias("r"))
    lb = F.length(F.bin(F.col("r")))
    p2 = F.expr("shiftleft(CAST(1 AS BIGINT), length(bin(r)) - 1)")
    mlog = (lb - 1) + (F.col("r") / p2 - F.lit(1.0))
    wv = wr.select(
        "b",
        F.round(F.lit(float(DSIR_WSCALE)) * mlog).cast("long").alias("w"),
    )
    return (
        docb.join(F.broadcast(wv), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("cnt").cast("long").alias("n_feat"),
            F.sum(F.col("cnt") * F.col("w")).cast("long").alias("s"),
        )
        .select(
            "doc_id",
            "lang",
            "n_feat",
            (
                (F.col("s") / F.col("n_feat")) / F.lit(float(DSIR_WSCALE))
                - F.lit(20.0)
            ).alias("dsir_logw"),
        )
    )


# --------------------------------------------------- filter cascade audit ---
#
# Production cleaning (C4, FineWeb, Dolma) is a SEQUENCE of cheap rules,
# and the artifact reviewers actually read is the attrition funnel: how
# many documents entered each rule, how many it dropped, how many remain.
# Publishing that per-rule attrition is what makes a filter auditable —
# a rule that silently deletes 40% of a source is a bug report, not a
# cleaning step. Rules here (integer-exact, order as listed): allowed
# language; token-count band; minimum stopword ratio (gibberish gate);
# maximum repeated-token ratio (boilerplate gate).
#
# Scale shape: rules 1-3 are narrow per-row expressions on the scan; rule
# 4's mode-token count is one (doc, token) explode + two hash aggs — the
# only shuffle. The funnel itself folds to ONE aggregate row (4 sums), and
# the output unstacks that row into 4 rule rows: no second corpus pass per
# rule, which is exactly what naive "run each filter, count" pipelines get
# wrong at 100 TB (R passes for R rules).

CASCADE_LANGS = ("en", "de", "fr")
CASCADE_MIN_TOK = 5
CASCADE_MAX_TOK = 1000
# stop_ratio >= 1/50 and max_token_ratio <= 3/10, as integer cross-products
_CASCADE_RULES = ("lang", "length", "stopwords", "repetition")


@query(
    "text_filter_cascade",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, lang,
             len(string_split(trim(text), ' ')) AS n_tok,
             {_sql_hits(STOPWORDS)} AS stop_hits
      FROM documents
    ), modec AS (
      SELECT doc_id, MAX(c) AS maxc FROM (
        SELECT doc_id, COUNT(*) AS c FROM (
          SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t
          FROM documents
        ) GROUP BY doc_id, t
      ) GROUP BY doc_id
    ), flags AS (
      SELECT CASE WHEN b.lang IN ({", ".join(f"'{l}'" for l in CASCADE_LANGS)})
                  THEN 1 ELSE 0 END AS p1,
             CASE WHEN b.n_tok BETWEEN {CASCADE_MIN_TOK} AND {CASCADE_MAX_TOK}
                  THEN 1 ELSE 0 END AS p2,
             CASE WHEN b.stop_hits * 50 >= b.n_tok THEN 1 ELSE 0 END AS p3,
             CASE WHEN m.maxc * 10 <= b.n_tok * 3 THEN 1 ELSE 0 END AS p4
      FROM base b JOIN modec m USING (doc_id)
    ), agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(p1) AS BIGINT) AS s1,
             CAST(SUM(p1 * p2) AS BIGINT) AS s2,
             CAST(SUM(p1 * p2 * p3) AS BIGINT) AS s3,
             CAST(SUM(p1 * p2 * p3 * p4) AS BIGINT) AS s4
      FROM flags
    )
    SELECT * FROM (
      SELECT 1 AS rule_no, 'lang' AS rule, n AS n_in, n - s1 AS n_dropped,
             s1 AS n_out FROM agg
      UNION ALL
      SELECT 2, 'length', s1, s1 - s2, s2 FROM agg
      UNION ALL
      SELECT 3, 'stopwords', s2, s2 - s3, s3 FROM agg
      UNION ALL
      SELECT 4, 'repetition', s3, s3 - s4, s4 FROM agg
    ) ORDER BY rule_no
    """,
    doc="Filter-cascade attrition funnel (C4/FineWeb audit artifact): four "
    "sequential integer-exact rules — allowed language, token-count "
    "band, minimum stopword ratio, maximum repeated-token ratio — "
    "evaluated as per-row flags in ONE corpus pass (the only shuffle is "
    "rule 4's mode-token count), folded to a single aggregate row and "
    "unstacked into per-rule (entered, dropped, remaining) rows. R "
    "rules cost one pass, not R passes.",
)
def text_filter_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.expr("size(split(trim(text), ' '))")
    base = docs.select(
        "doc_id",
        "lang",
        n_tok.alias("n_tok"),
        _hits(STOPWORDS).alias("stop_hits"),
    )
    modec = (
        docs.select(
            "doc_id", F.explode(F.expr("split(trim(text), ' ')")).alias("t")
        )
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("maxc"))
    )
    flags = base.join(modec, "doc_id").select(
        F.when(F.col("lang").isin(*CASCADE_LANGS), 1).otherwise(0).alias("p1"),
        F.when(
            F.col("n_tok").between(CASCADE_MIN_TOK, CASCADE_MAX_TOK), 1
        ).otherwise(0).alias("p2"),
        F.when(F.col("stop_hits") * 50 >= F.col("n_tok"), 1).otherwise(0).alias("p3"),
        F.when(F.col("maxc") * 10 <= F.col("n_tok") * 3, 1).otherwise(0).alias("p4"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("p1").cast("long").alias("s1"),
        F.sum(F.col("p1") * F.col("p2")).cast("long").alias("s2"),
        F.sum(F.col("p1") * F.col("p2") * F.col("p3")).cast("long").alias("s3"),
        F.sum(F.col("p1") * F.col("p2") * F.col("p3") * F.col("p4"))
        .cast("long")
        .alias("s4"),
    )
    return agg.selectExpr(
        """stack(4,
             1, 'lang',       n,  n  - s1, s1,
             2, 'length',     s1, s1 - s2, s2,
             3, 'stopwords',  s2, s2 - s3, s3,
             4, 'repetition', s3, s3 - s4, s4
           ) AS (rule_no, rule, n_in, n_dropped, n_out)"""
    ).orderBy("rule_no")


# ------------------------------------------------------- token entropy ------
#
# Shannon entropy of each document's token distribution — the information-
# density gate: near-zero entropy means one token repeated (progress bars,
# padding, keyword stuffing), high entropy with low stopword mass means
# random noise. Uses the identity H = log2(n) - (1/n) * sum c_t*log2(c_t)
# so only INTEGER counts are ever logged, and evaluates log2 with the same
# Mitchell bitlength approximation as text_dsir_weights — exact integer
# ops + one power-of-two division, bit-identical across engines, with
# per-token weights quantized to BIGINT before any cross-row accumulation.
# One explode + two hash aggs; no Python, no window.

ENT_WSCALE = 1_000_000

_ENT_W_SPARK = (
    "cast(round(1000000.0 * ((length(bin(c)) - 1)"
    " + (c / shiftleft(cast(1 as bigint), length(bin(c)) - 1) - 1.0)))"
    " as bigint)"
)
_ENT_W_SQL = (
    "CAST(round(1000000.0 * ((length(bin(c)) - 1)"
    " + (c / (CAST(1 AS BIGINT) << (length(bin(c)) - 1)) - 1.0)))"
    " AS BIGINT)"
)
# mlog2(n) as a double, same association both engines
_ENT_LOGN_SPARK = (
    "(length(bin(n)) - 1)"
    " + (n / shiftleft(cast(1 as bigint), length(bin(n)) - 1) - 1.0)"
)
_ENT_LOGN_SQL = (
    "(length(bin(n)) - 1)"
    " + (n / (CAST(1 AS BIGINT) << (length(bin(n)) - 1)) - 1.0)"
)


@query(
    "text_token_entropy",
    oracle=f"""
    WITH tc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t
        FROM documents
      ) GROUP BY doc_id, t
    ), perdoc AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(c * {_ENT_W_SQL}) AS BIGINT) AS s
      FROM tc GROUP BY doc_id
    )
    SELECT doc_id, n AS n_tokens, n_types,
           ({_ENT_LOGN_SQL}) - ((s / n) / {ENT_WSCALE}.0) AS entropy_bits
    FROM perdoc
    ORDER BY doc_id
    """,
    doc="Per-document Shannon entropy of the token distribution via "
    "H = log2(n) - (1/n)*sum c*log2(c): only integer counts are logged, "
    "log2 is Mitchell's bitlength approximation (deterministic IEEE "
    "sequence, no libm), per-token weights quantized to BIGINT before "
    "any cross-row sum. The information-density quality gate: ~0 bits "
    "-> one repeated token; the gibberish direction pairs with the "
    "stopword gate in text_filter_cascade. One explode + two hash "
    "aggs.",
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "doc_id", F.explode(F.expr("split(trim(text), ' ')")).alias("t")
        )
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    perdoc = tc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c") * F.expr(_ENT_W_SPARK)).cast("long").alias("s"),
    )
    return perdoc.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        "n_types",
        (
            F.expr(_ENT_LOGN_SPARK)
            - (F.col("s") / F.col("n")) / F.lit(float(ENT_WSCALE))
        ).alias("entropy_bits"),
    ).orderBy("doc_id")


# ------------------------------------------------------- n-gram novelty -----
#
# Corpus-growth monitoring: as ingestion proceeds (doc_id as arrival
# order), what fraction of each new document's shingles has the corpus
# never seen before? A collapsing novelty curve means the crawl is
# saturating (more ingest, little new content) — the signal that decides
# when to stop crawling a source or rotate seeds. Novelty of doc d =
# |shingles whose FIRST occurrence is d| / |shingles of d|; first
# occurrence is one min-aggregation over the inverted index, so the whole
# curve costs the same as one dedup pass: explode -> min per shingle ->
# join back -> per-doc ratio. No windows, no per-doc rescans.

@query(
    "text_ngram_novelty",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct({SHINGLES_SQL})) AS shingle
      FROM documents
    ), first_seen AS (
      SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
    )
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) / CAST(COUNT(*) AS DOUBLE) AS novelty
    FROM sh JOIN first_seen f USING (shingle)
    GROUP BY sh.doc_id
    ORDER BY sh.doc_id
    """,
    doc="Per-document shingle novelty in arrival (doc_id) order: the "
    "fraction of a doc's distinct 3-gram shingles whose corpus-wide "
    "first occurrence is that doc. One explode + one min-agg over the "
    "inverted index + a join back — the crawl-saturation curve for the "
    "cost of a single dedup pass.",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(SHINGLES_SPARK))).alias("shingle"),
    ).select("doc_id", F.xxhash64("shingle").alias("sh")).localCheckpoint(
        eager=False
    )  # consumed by first-seen agg AND the join back
    first_seen = sh.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    ).cast("long")
    return (
        sh.join(first_seen, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            novel.alias("n_novel"),
            (novel / F.count(F.lit(1)).cast("double")).alias("novelty"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------------ vocabulary growth ---
#
# Heaps'-law curve: how the distinct-word vocabulary grows as the corpus is
# ingested in arrival (doc_id) order — the macro twin of text_ngram_novelty
# (that one scores DOCUMENTS, this one plots the CORPUS). Flattening growth
# = the crawl is exhausting its lexical diversity. Reported at bucket grain
# (VOCAB_GROWTH_BUCKET docs per point): each word contributes to the bucket
# of its FIRST occurrence (one min-agg over the inverted index), and the
# running total is a window over the bucket frame — metadata-sized, never a
# corpus-wide ordered window.

VOCAB_GROWTH_BUCKET = 50


@query(
    "text_vocab_growth",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, unnest(list_distinct(string_split(trim(lower(text)), ' ')))
               AS w
      FROM documents
    ), first_seen AS (
      SELECT w, CAST(MIN(doc_id) // {VOCAB_GROWTH_BUCKET} AS BIGINT) AS bucket
      FROM words GROUP BY w
    ), per_bucket AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_types
      FROM first_seen GROUP BY bucket
    ), toks AS (
      SELECT CAST(doc_id // {VOCAB_GROWTH_BUCKET} AS BIGINT) AS bucket,
             CAST(SUM(len(string_split(trim(lower(text)), ' '))) AS BIGINT)
               AS bucket_tokens
      FROM documents GROUP BY bucket
    )
    SELECT t.bucket, t.bucket_tokens,
           COALESCE(p.new_types, 0) AS new_types,
           CAST(SUM(COALESCE(p.new_types, 0)) OVER (
             ORDER BY t.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_types,
           CAST(SUM(t.bucket_tokens) OVER (
             ORDER BY t.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_tokens
    FROM toks t LEFT JOIN per_bucket p ON p.bucket = t.bucket
    ORDER BY t.bucket
    """,
    doc="Heaps'-law vocabulary growth curve at "
    f"{VOCAB_GROWTH_BUCKET}-doc bucket grain: new distinct word types "
    "per ingestion bucket (each word counted at its corpus-wide FIRST "
    "occurrence — one min-agg over the inverted index) with running "
    "type and token totals. The running windows ride the bucket frame "
    "(metadata-sized), never a corpus-wide ordered window. Flattening "
    "growth = the crawl is lexically saturating.",
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.expr("split(trim(lower(text)), ' ')"))
        ).alias("w"),
    )
    first_seen = words.groupBy("w").agg(
        F.expr(f"min(doc_id) div {VOCAB_GROWTH_BUCKET}").cast("long").alias("bucket")
    )
    per_bucket = first_seen.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("new_types")
    )
    toks = docs.groupBy(
        F.expr(f"doc_id div {VOCAB_GROWTH_BUCKET}").cast("long").alias("bucket")
    ).agg(
        F.sum(F.expr("size(split(trim(lower(text)), ' '))"))
        .cast("long")
        .alias("bucket_tokens")
    )
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        toks.join(per_bucket, "bucket", "left")
        .select(
            "bucket",
            "bucket_tokens",
            F.coalesce("new_types", F.lit(0)).cast("long").alias("new_types"),
        )
        .withColumn(
            "cum_types", F.sum("new_types").over(w_cum).cast("long")
        )
        .withColumn(
            "cum_tokens", F.sum("bucket_tokens").over(w_cum).cast("long")
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------- Zipf-law fit ----
#
# The rank-frequency slope of the top vocabulary: natural text sits near
# Zipf's slope -1 in log-log space; machine-generated spam, template
# farms, and over-deduped corpora bend it. Fit = ordinary least squares of
# log2(freq) on log2(rank) over the top ZIPF_V terms — the vocabulary is
# truncated FIRST by a global top-k (TakeOrderedAndProject: per-partition
# heads, driver merge of V-row heaps — the bounded path, no vocab-wide
# window), and both logs are Mitchell bitlength approximations quantized
# to scaled BIGINT, so the regression sums are exact integers (combined in
# DECIMAL(38,0) — the cross-products overflow BIGINT) with one final
# division.

ZIPF_V = 256
ZIPF_LSCALE = 1_000_000

_ZIPF_MLOG_SQL = (
    "CAST(round({s}.0 * ((length(bin({v})) - 1)"
    " + ({v} / (CAST(1 AS BIGINT) << (length(bin({v})) - 1)) - 1.0)))"
    " AS BIGINT)"
)
_ZIPF_MLOG_SPARK = (
    "cast(round({s}.0D * ((length(bin({v})) - 1)"
    " + ({v} / shiftleft(cast(1 as bigint), length(bin({v})) - 1) - 1.0)))"
    " as bigint)"
)


@query(
    "text_zipf_fit",
    oracle=f"""
    WITH wc AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest(string_split(trim(lower(text)), ' ')) AS w
        FROM documents
      ) GROUP BY w
    ), top AS (
      SELECT w, freq FROM wc ORDER BY freq DESC, w LIMIT {ZIPF_V}
    ), ranked AS (
      SELECT freq,
             CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, w) AS BIGINT) AS r
      FROM top
    ), logs AS (
      SELECT {_ZIPF_MLOG_SQL.format(s=ZIPF_LSCALE, v="r")} AS x,
             {_ZIPF_MLOG_SQL.format(s=ZIPF_LSCALE, v="freq")} AS y
      FROM ranked
    ), sums AS (
      SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx
      FROM logs
    )
    SELECT CAST(n AS BIGINT) AS v_terms,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS zipf_slope
    FROM sums
    """,
    doc=f"Zipf rank-frequency slope over the top {ZIPF_V} vocabulary "
    "terms: OLS of log2(freq) on log2(rank), logs via the Mitchell "
    "bitlength approximation quantized to BIGINT, regression sums exact "
    "(DECIMAL(38,0) cross-products), one final division. Natural text "
    "sits near -1; template farms and over-dedup bend it. The "
    "vocabulary truncation is a global top-k (bounded driver merge), "
    "never a vocab-wide window.",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(
            F.explode(F.expr("split(trim(lower(text)), ' ')")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    top = wc.orderBy(F.desc("freq"), "w").limit(ZIPF_V)
    w_rank = Window.orderBy(F.desc("freq"), "w")
    ranked = top.select(
        "freq", F.row_number().over(w_rank).cast("long").alias("r")
    )
    logs = ranked.select(
        F.expr(_ZIPF_MLOG_SPARK.format(s=ZIPF_LSCALE, v="r")).alias("x"),
        F.expr(_ZIPF_MLOG_SPARK.format(s=ZIPF_LSCALE, v="freq")).alias("y"),
    )
    d = "decimal(38,0)"
    sums = logs.agg(
        F.count(F.lit(1)).cast(d).alias("n"),
        F.sum("x").cast(d).alias("sx"),
        F.sum("y").cast(d).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(d).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(d).alias("sxx"),
    )
    return sums.select(
        F.col("n").cast("long").alias("v_terms"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
        ).alias("zipf_slope"),
    )


# ----------------------------------------------- cross-source calibration --
#
# Raw quality scores are not comparable across sources: a web-crawl source
# and a curated source have different score distributions, so one global
# threshold over-prunes the noisy source and under-prunes the clean one.
# The standard fix is within-source quantile normalization — rank each
# document INSIDE its source and gate on the source-relative quantile
# (each source keeps its own top decile). The emitted quantile is
# (rank-1)/(n-1): one exact IEEE division from integer inputs, ranks are
# row_number with doc_id tie-break — fully deterministic, unlike
# percent_rank under score ties.


@query(
    "text_quality_calibration",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, source,
             0.3*ttr + 0.3*stop_ratio + 0.2*(1 - digit_ratio)
               + 0.2*least(avg_token_len/10, 1.0) AS quality
      FROM (
        SELECT doc_id, source,
               CAST(len(list_distinct(string_split(trim(text), ' '))) AS DOUBLE)
                 / len(string_split(trim(text), ' ')) AS ttr,
               CAST({{SQL_HITS}} AS DOUBLE)
                 / len(string_split(trim(text), ' ')) AS stop_ratio,
               CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                 / length(text) AS digit_ratio,
               CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(string_split(trim(text), ' ')) AS avg_token_len
        FROM documents
      )
    ), r AS (
      SELECT doc_id, source, quality,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY quality DESC, doc_id
             ) AS INTEGER) AS src_rank,
             CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
      FROM q
    )
    SELECT doc_id, source, quality, src_rank,
           CASE WHEN n_src > 1
                THEN CAST(src_rank - 1 AS DOUBLE) / (n_src - 1)
                ELSE CAST(0 AS DOUBLE) END AS pct_in_source,
           (src_rank * 10 <= n_src) AS top_decile
    FROM r
    """.replace("{SQL_HITS}", _sql_hits(STOPWORDS)),
    doc="Within-source quality calibration (quantile normalization): each "
        "document ranked inside its source by the heuristic quality score, "
        "emitting the source-relative quantile (rank-1)/(n-1) and a "
        "top-decile gate — the cross-source-fair filter threshold (a "
        "global cutoff over-prunes noisy sources). One window partitioned "
        "by source; at 100 TB source cardinality is modest but balanced — "
        "heavy sources split fine because row_number needs only a sort "
        "within each source partition, and AQE handles stragglers. "
        "Deterministic: row_number with doc_id tie-break (not percent_rank "
        "under ties); one final IEEE division.",
)
def text_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    q = docs.select("doc_id", "source", quality_col().alias("quality"))
    w = Window.partitionBy("source").orderBy(F.col("quality").desc(), "doc_id")
    wn = Window.partitionBy("source")
    r = q.withColumn("src_rank", F.row_number().over(w).cast("int")).withColumn(
        "n_src", F.count(F.lit(1)).over(wn).cast("bigint")
    )
    return r.select(
        "doc_id",
        "source",
        "quality",
        "src_rank",
        F.when(
            F.col("n_src") > 1,
            (F.col("src_rank") - 1).cast("double") / (F.col("n_src") - 1),
        )
        .otherwise(F.lit(0.0))
        .alias("pct_in_source"),
        (F.col("src_rank") * 10 <= F.col("n_src")).alias("top_decile"),
    )


# ------------------------------------------------ n-gram diversity profile -
#
# Corpus diversity by n-gram order: distinct/total ratios for n = 1..4 —
# the "is this corpus repetitive garbage" curve. Natural text keeps the
# distinct ratio climbing steeply with n (most 4-grams are unique);
# template-heavy or model-generated corpora flatten early. One exploded
# frame with the order as a key → one hash agg; all counts integer, one
# IEEE division per order.

_DIVERSITY_MAX_N = 4


def _ngrams_spark(n: int) -> str:
    return (
        f"transform(sequence(1, greatest(size(split(trim(text),' ')) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice(split(trim(text),' '), i, {n})))"
    )


def _ngrams_sql(n: int) -> str:
    return (
        f"list_transform(generate_series(1,"
        f" greatest(len(string_split(trim(text),' ')) - {n - 1}, 1)),"
        f" i -> array_to_string(list_slice(string_split(trim(text),' '),"
        f" i, i + {n - 1}), ' '))"
    )


@query(
    "text_ngram_diversity",
    oracle=f"""
    WITH g AS (
      {" UNION ALL ".join(
          f'''SELECT {n} AS n, unnest({_ngrams_sql(n)}) AS gram
              FROM documents'''
          for n in range(1, _DIVERSITY_MAX_N + 1)
      )}
    )
    SELECT n,
           CAST(COUNT(*) AS BIGINT) AS total_ngrams,
           CAST(COUNT(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
           CAST(COUNT(DISTINCT gram) AS DOUBLE) / COUNT(*) AS distinct_ratio
    FROM g
    GROUP BY n
    ORDER BY n
    """,
    doc=f"N-gram diversity profile (n = 1..{_DIVERSITY_MAX_N}): distinct/"
        "total ratio per order — natural corpora climb steeply with n, "
        "template-heavy or synthetic ones flatten early. One exploded "
        "union keyed by order, one hash agg (count-distinct plans as the "
        "standard Expand); integer counts, one IEEE division per row.",
)
def text_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    parts = [
        docs.select(
            F.lit(n).alias("n"),
            F.explode(F.expr(_ngrams_spark(n))).alias("gram"),
        )
        for n in range(1, _DIVERSITY_MAX_N + 1)
    ]
    g = parts[0]
    for p in parts[1:]:
        g = g.unionAll(p)
    return (
        g.groupBy("n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("total_ngrams"),
            F.countDistinct("gram").cast("bigint").alias("distinct_ngrams"),
            (
                F.countDistinct("gram").cast("double") / F.count(F.lit(1))
            ).alias("distinct_ratio"),
        )
        .orderBy("n")
    )


# ------------------------------------------------ Bloom FPR audit ----------
#
# The measured false-positive rate of the decontamination Bloom filter:
# probe the shingles that are provably NOT in the benchmark set (exact
# anti-join ground truth) and count how many the filter still flags —
# the number that decides whether BLOOM_M/BLOOM_K need resizing before
# the filter over-quarantines a 100-TB corpus. Also emits the bits-set
# load factor and the load^K approximation for comparison (x*x*x, no
# pow). Integer counts; two IEEE divisions + one product chain.


@query(
    "text_bloom_fpr_audit",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct({_SH_SQL})) AS shingle
      FROM documents
    ), bench AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % {PROBE_MOD} = 0
    ), bits AS (
      SELECT DISTINCT p
      FROM (
        SELECT unnest([{", ".join(_bloom_pos_sql(j) for j in range(BLOOM_K))}])
          AS p
        FROM bench
      )
    ), clean AS (
      SELECT DISTINCT s.shingle
      FROM sh s
      WHERE s.doc_id % {PROBE_MOD} <> 0
        AND NOT EXISTS (SELECT 1 FROM bench b WHERE b.shingle = s.shingle)
    ), probed AS (
      SELECT shingle,
             {" AND ".join(
                f"EXISTS (SELECT 1 FROM bits WHERE p = {_bloom_pos_sql(j)})"
                for j in range(BLOOM_K))} AS hit
      FROM clean
    ), agg AS (
      SELECT CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS n_bits_set,
             CAST(COUNT(*) AS BIGINT) AS n_clean,
             CAST(COUNT(*) FILTER (WHERE hit) AS BIGINT) AS n_false_pos
      FROM probed
    )
    SELECT n_bits_set, n_clean, n_false_pos,
           CAST(n_bits_set AS DOUBLE) / {BLOOM_M} AS load_factor,
           CAST(n_false_pos AS DOUBLE) / n_clean AS measured_fpr,
           (CAST(n_bits_set AS DOUBLE) / {BLOOM_M})
             * (CAST(n_bits_set AS DOUBLE) / {BLOOM_M})
             * (CAST(n_bits_set AS DOUBLE) / {BLOOM_M}) AS approx_fpr
    FROM agg
    """,
    doc=f"Bloom-filter false-positive audit: shingles provably outside "
        "the benchmark set (exact anti-join ground truth) probed against "
        f"the {BLOOM_M}-bit/{BLOOM_K}-hash filter — the measured FPR and "
        "bits-set load factor that decide filter sizing before it "
        "over-quarantines at scale, beside the load^k approximation "
        "(explicit product, no pow). The quality gate on "
        "text_bloom_decontaminate's one-sided-error promise.",
)
def text_bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    sh = docs.select(
        "doc_id",
        F.explode(F.expr(f"array_distinct({_SH_SPARK})")).alias("shingle"),
    ).localCheckpoint(eager=False)  # bench build + clean probe reuse
    bench = (
        sh.filter(F.col("doc_id") % PROBE_MOD == 0)
        .select("shingle")
        .distinct()
        .localCheckpoint(eager=False)  # bits build + anti-join reuse
    )
    bits = (
        bench.select(
            F.explode(
                F.array(*[F.expr(_bloom_pos_spark(j)) for j in range(BLOOM_K)])
            ).alias("p")
        )
        .distinct()
    )
    clean = (
        sh.filter(F.col("doc_id") % PROBE_MOD != 0)
        .select("shingle")
        .distinct()
        .join(bench, "shingle", "left_anti")
    )
    words = [0] * (BLOOM_M // 64)
    for (pos,) in bits.collect():
        words[pos >> 6] |= 1 << (pos & 63)
    n_bits_set = sum(bin(w).count("1") for w in words)
    mask = F.array(
        *[
            F.lit(w - (1 << 64) if w >= (1 << 63) else w).cast("long")
            for w in words
        ]
    )

    def slot_hit(j: int) -> F.Column:
        pj = f"({_bloom_pos_spark(j)})"
        return F.expr(
            f"(shiftright(element_at(bloom_mask,"
            f" cast(shiftright({pj}, 6) as int) + 1),"
            f" cast({pj} % 64 as int)) & 1) = 1"
        )

    hit = slot_hit(0)
    for j in range(1, BLOOM_K):
        hit = hit & slot_hit(j)
    probed = clean.withColumn("bloom_mask", mask).select(hit.alias("hit"))
    load = F.lit(n_bits_set).cast("double") / F.lit(BLOOM_M)
    return probed.agg(
        F.lit(n_bits_set).cast("bigint").alias("n_bits_set"),
        F.count(F.lit(1)).cast("bigint").alias("n_clean"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_pos"),
        load.alias("load_factor"),
        (
            F.sum(F.when(F.col("hit"), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("measured_fpr"),
        (load * load * load).alias("approx_fpr"),
    )


# ------------------------------------------------ tokenizer fertility -------
#
# Multilingual token budgeting: the same byte of corpus yields very
# different token counts per language/tokenizer (tokenizer "fertility" —
# e.g. Rust/Scao et al., BLOOM; Ahia et al. 2023), and a 100-TB mixture
# plan is priced in TOKENS, not bytes. This aggregates the engine's two
# token notions (whitespace tokens; the BPE-ish regex tokens of
# text_token_stats) with char and UTF-8 byte mass to (lang, source)
# grain — the exact table a mixture planner (mix_domain_weights,
# sample_token_budget) divides by.
#
# Determinism: one hash aggregate of exact BIGINT sums (< 2^53 at any
# realistic grain — these are per-(lang, source) corpus masses); each
# emitted ratio is ONE exact-input IEEE division, identical in both
# engines. Spark octet_length == DuckDB strlen == UTF-8 bytes (verified).

@query(
    "text_token_fertility",
    oracle="""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT)
             AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS BIGINT)
             AS regex_tokens,
           CAST(SUM(length(text)) AS BIGINT) AS n_chars,
           CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes,
           CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS DOUBLE)
             / CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT)
             AS fertility,
           CAST(SUM(length(text)) AS DOUBLE)
             / CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT)
             AS chars_per_token,
           CAST(SUM(strlen(text)) AS DOUBLE)
             / CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+')))
                    AS BIGINT)
             AS bytes_per_regex_token
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
    doc="Tokenizer fertility by (lang, source): docs, whitespace-token / "
        "BPE-ish-regex-token / char / UTF-8-byte corpus masses and the "
        "ratios a mixture planner prices with (regex tokens per "
        "whitespace token = fertility; chars and bytes per token). One "
        "hash aggregate of exact BIGINT sums, one IEEE division per "
        "ratio; Spark octet_length == DuckDB strlen == UTF-8 bytes.",
)
def text_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    per = docs.select(
        "lang",
        "source",
        F.size(_tokens()).cast("bigint").alias("ws"),
        F.regexp_count(F.col("text"), F.lit("[a-z]+|[0-9]+"))
        .cast("bigint")
        .alias("rx"),
        F.length("text").cast("bigint").alias("ch"),
        F.octet_length("text").cast("bigint").alias("by"),
    )
    agg = per.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("ws").cast("bigint").alias("ws_tokens"),
        F.sum("rx").cast("bigint").alias("regex_tokens"),
        F.sum("ch").cast("bigint").alias("n_chars"),
        F.sum("by").cast("bigint").alias("n_bytes"),
    )
    return agg.select(
        "lang",
        "source",
        "n_docs",
        "ws_tokens",
        "regex_tokens",
        "n_chars",
        "n_bytes",
        (F.col("regex_tokens").cast("double") / F.col("ws_tokens")).alias(
            "fertility"
        ),
        (F.col("n_chars").cast("double") / F.col("ws_tokens")).alias(
            "chars_per_token"
        ),
        (F.col("n_bytes").cast("double") / F.col("regex_tokens")).alias(
            "bytes_per_regex_token"
        ),
    ).orderBy("lang", "source")


# ------------------------------------------- score-agreement diagnostic ----
#
# Production cleaning pipelines run SEVERAL quality signals (heuristic
# rules, LM fluency, classifier scores) and must know where they disagree
# before gating on any one of them: a source whose heuristic quality and
# LM fluency rank documents in OPPOSITE orders is exactly where a single
# cut silently biases the corpus. Spearman rank correlation is the
# standard scale-free agreement measure; computing it per source both
# bounds the rank windows (partition-parallel, no corpus-global sort) and
# answers the actionable question ("which sources need a second look").
#
# Determinism: both scores are already engineered bit-identical across
# engines (quality: fixed IEEE op order; fluency: scaled BIGINT), ranks
# tie-break on doc_id, and rho's Sum(d^2) is an associative integer sum —
# the emitted rho is two IEEE ops on exact inputs. At extreme per-source
# cardinality the rank window swaps for the histogram-offset ranking of
# layout._assign_files; same numbers.

@query(
    "text_score_correlation",
    oracle=f"""
    WITH qual AS (
      SELECT doc_id, quality FROM ({QUERIES['text_quality_score'].oracle})
    ), fl AS (
      SELECT doc_id, fluency_scaled FROM ({QUERIES['lm_bigram_score'].oracle})
    ), j AS (
      SELECT d.source, q.doc_id, q.quality, s.fluency_scaled
      FROM qual q JOIN fl s USING (doc_id) JOIN documents d USING (doc_id)
    ), r AS (
      SELECT source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY quality, doc_id) AS rq,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY fluency_scaled, doc_id) AS rf
      FROM j
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM((rq - rf) * (rq - rf)) AS BIGINT) AS sum_d2,
           1.0 - 6.0 * CAST(SUM((rq - rf) * (rq - rf)) AS BIGINT)
             / NULLIF(CAST(COUNT(*) AS BIGINT)
                      * (CAST(COUNT(*) AS BIGINT)
                         * CAST(COUNT(*) AS BIGINT) - 1), 0) AS spearman_rho
    FROM r GROUP BY source
    """,
    doc="Per-source Spearman rank correlation between the heuristic "
        "quality score and the corpus-trained LM fluency score — the "
        "signal-agreement table a cleaning pipeline reads before gating "
        "on either signal (rho near 0 or negative flags sources where a "
        "single cut biases the corpus). Ranks tie-break on doc_id inside "
        "source-partitioned windows (partition-parallel, no global "
        "sort); Sum(d^2) is an exact associative BIGINT sum; rho is two "
        "IEEE ops on exact inputs.",
)
def text_score_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .lm import lm_bigram_score

    qual = text_quality_score(spark, sf_dir).select("doc_id", "quality")
    fl = lm_bigram_score(spark, sf_dir).select("doc_id", "fluency_scaled")
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    j = qual.join(fl, "doc_id").join(src, "doc_id")
    wq = Window.partitionBy("source").orderBy("quality", "doc_id")
    wf = Window.partitionBy("source").orderBy("fluency_scaled", "doc_id")
    r = j.select(
        "source",
        F.row_number().over(wq).alias("rq"),
        F.row_number().over(wf).alias("rf"),
    )
    d2 = (F.col("rq") - F.col("rf")) * (F.col("rq") - F.col("rf"))
    n = F.count(F.lit(1)).cast("bigint")
    return r.groupBy("source").agg(
        n.alias("n_docs"),
        F.sum(d2).cast("bigint").alias("sum_d2"),
        (
            F.lit(1.0)
            - F.lit(6.0)
            * F.sum(d2).cast("bigint")
            / F.expr(
                "nullif(cast(count(1) as bigint)"
                " * (cast(count(1) as bigint) * cast(count(1) as bigint) - 1),"
                " 0)"
            )
        ).alias("spearman_rho"),
    )


# ----------------------------------------------- feature-hashing audit -----
#
# The hashing trick (Weinberger et al. 2009) maps an unbounded vocabulary
# into D fixed buckets for linear classifiers / quality gates; its cost
# is collisions, and this audit prices them on the REAL corpus before a
# model ships: how many buckets are occupied, how many word types share
# a bucket, and what fraction of token MASS sits in collided buckets
# (mass-weighted collisions are what actually corrupt a classifier's
# features — two rare types colliding is noise, a stopword landing on a
# signal word is damage).
#
# Scale: one token explode -> one (word) hash agg (the vocabulary table,
# orders of magnitude smaller than the corpus) -> one D-bounded bucket
# agg -> a 1-row fold. Nothing after the first agg touches corpus-sized
# data; D is a constant.

FEATURE_HASH_D = 4096
_FH_SALT = "fh1:"


@query(
    "text_feature_hash_audit",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(trim(lower(text)), ' ')) AS w
      FROM documents
    ), vocab AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(('0x' || substr(md5('{_FH_SALT}' || w), 1, 15)) AS BIGINT)
               % {FEATURE_HASH_D} AS b
      FROM toks GROUP BY w
    ), buckets AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(c) AS BIGINT) AS mass
      FROM vocab GROUP BY b
    )
    SELECT CAST({FEATURE_HASH_D} AS BIGINT) AS n_buckets,
           CAST(SUM(mass) AS BIGINT) AS n_tokens,
           CAST(SUM(n_types) AS BIGINT) AS n_types,
           CAST(COUNT(*) AS BIGINT) AS occupied,
           CAST(SUM(n_types) - COUNT(*) AS BIGINT) AS excess_types,
           CAST(MAX(n_types) AS BIGINT) AS max_bucket_types,
           CAST(MAX(mass) AS BIGINT) AS max_bucket_mass,
           CAST(SUM(CASE WHEN n_types > 1 THEN mass ELSE 0 END) AS DOUBLE)
             / CAST(SUM(mass) AS DOUBLE) AS collided_mass_frac,
           CAST(SUM(n_types) AS DOUBLE) / {FEATURE_HASH_D}.0 AS load_factor
    FROM buckets
    """,
    doc=f"Feature-hashing collision audit (Weinberger 2009 hashing "
    f"trick) at D={FEATURE_HASH_D} buckets: occupied buckets, excess "
    "word types (types minus occupied = unavoidable collisions), the "
    "worst bucket by types and by token mass, and collided_mass_frac — "
    "the fraction of token MASS in buckets shared by 2+ types, the "
    "number that says whether a hashed-feature quality classifier can "
    "trust its weights on THIS corpus. Exact integer aggregation; "
    "md5-derived buckets are engine-identical. One explode, one vocab "
    "agg, one D-bounded agg, 1-row output.",
)
def text_feature_hash_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.expr("split(trim(lower(text)), ' ')")).alias("w")
    )
    vocab = toks.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).select(
        "c",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(_FH_SALT), F.col("w"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % FEATURE_HASH_D
        ).alias("b"),
    )
    buckets = vocab.groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum("c").cast("bigint").alias("mass"),
    )
    return buckets.agg(
        F.lit(FEATURE_HASH_D).cast("bigint").alias("n_buckets"),
        F.sum("mass").cast("bigint").alias("n_tokens"),
        F.sum("n_types").cast("bigint").alias("n_types"),
        F.count(F.lit(1)).cast("bigint").alias("occupied"),
        (F.sum("n_types") - F.count(F.lit(1))).cast("bigint").alias(
            "excess_types"
        ),
        F.max("n_types").cast("bigint").alias("max_bucket_types"),
        F.max("mass").cast("bigint").alias("max_bucket_mass"),
        (
            F.sum(F.when(F.col("n_types") > 1, F.col("mass")).otherwise(0))
            .cast("double")
            / F.sum("mass").cast("double")
        ).alias("collided_mass_frac"),
        (
            F.sum("n_types").cast("double") / F.lit(float(FEATURE_HASH_D))
        ).alias("load_factor"),
    )


# ----------------------------------------------------- hapax-ratio audit ---
#
# Lexical richness per source: the share of each source's vocabulary
# that occurs exactly once (hapax legomena) plus the Guiraud index
# |V|/sqrt(N) — template-stamped or boilerplate-heavy sources collapse
# both, organic text holds them up. sqrt is IEEE-correctly-rounded, so
# the index is bit-identical across engines from exact integer inputs.
# One token pass, a (source, word)-grain agg, a |sources|-row result.


@query(
    "text_hapax_ratio",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(string_split(trim(lower(text)), ' ')) AS w
      FROM documents
    ), wc AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY source, w
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS hapax,
           CAST(COUNT(*) FILTER (WHERE c = 1) AS DOUBLE) / COUNT(*)
             AS hapax_ratio,
           COUNT(*) / sqrt(CAST(SUM(c) AS DOUBLE)) AS guiraud
    FROM wc GROUP BY source ORDER BY source
    """,
    doc="Hapax-legomena ratio + Guiraud lexical-richness index per "
        "source: share of the source vocabulary occurring exactly once "
        "and |V|/sqrt(N). Boilerplate/template sources collapse both. "
        "Exact integer counts; sqrt is correctly rounded IEEE, so the "
        "index is engine-identical. One token pass, hash aggs only.",
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    wc = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), " ")).alias("w"),
        )
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return (
        wc.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("vocab"),
            F.count(F.when(F.col("c") == 1, 1)).cast("bigint").alias("hapax"),
            (
                F.count(F.when(F.col("c") == 1, 1)).cast("double")
                / F.count(F.lit(1))
            ).alias("hapax_ratio"),
            (
                F.count(F.lit(1))
                / F.sqrt(F.sum("c").cast("double"))
            ).alias("guiraud"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------- Flesch readability ---
#
# Flesch reading ease (Flesch 1948) — the classic prose-difficulty score
# a quality-filtering pipeline reports next to the Gopher rules: 206.835
# − 1.015·(words/sentences) − 84.6·(syllables/words). Syllables are the
# standard vowel-group approximation (maximal [aeiouy]+ runs — verified
# engine-identical regexp semantics for this class); sentences are
# terminal-punctuation runs. All three counts are exact per-row
# integers (regexp_count / len(regexp_extract_all) agree), the score is
# ONE fixed per-row IEEE expression tree over exact inputs — no float
# accumulation, bit-stable across engines. Zero-word/zero-sentence rows
# clamp the denominators to 1 (documented, mirrored). Narrow per-row
# map: embarrassingly parallel at any corpus size.

_FLESCH = (
    "CAST(206.835 AS DOUBLE)"
    " - CAST(1.015 AS DOUBLE)"
    "   * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))"
    " - CAST(84.6 AS DOUBLE)"
    "   * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))"
)


@query(
    "text_flesch_readability",
    oracle=f"""
    WITH counts AS (
      SELECT doc_id, source,
             GREATEST(CAST(len(string_split(trim(lower(text)), ' '))
                           AS BIGINT), 1) AS n_words,
             GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+'))
                           AS BIGINT), 1) AS n_sentences,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT) AS n_syllables
      FROM documents
    )
    SELECT doc_id, source, n_words, n_sentences, n_syllables,
           {_FLESCH} AS flesch
    FROM counts
    """,
    doc="Flesch reading ease per document: vowel-group syllable "
        "approximation, terminal-punctuation sentence runs, whitespace "
        "words (all exact per-row integers, engine-identical regexp "
        "classes), score = one fixed IEEE expression tree — no float "
        "accumulation. The prose-difficulty signal next to the Gopher "
        "rules in a quality-filter stack; narrow per-row map.",
)
def text_flesch_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.select(
        "doc_id",
        "source",
        F.greatest(
            F.size(F.split(F.trim(F.lower("text")), " ")).cast("bigint"),
            F.lit(1),
        ).alias("n_words"),
        F.greatest(
            F.expr("regexp_count(text, '[.!?]+')").cast("bigint"), F.lit(1)
        ).alias("n_sentences"),
        F.expr("regexp_count(lower(text), '[aeiouy]+')")
        .cast("bigint")
        .alias("n_syllables"),
    )
    return counts.select(
        "doc_id",
        "source",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr(_FLESCH).alias("flesch"),
    )
