"""Streaming corpus ingestion: the training-data cleaning pipeline
(operators/text.py's ``pipeline_training_set``) re-expressed over an
unbounded document stream.

Gates are the SAME column expressions as the batch pipeline (imported, not
re-derived — batch and stream accept identical documents); dedup swaps the
batch fingerprint-window for ``dropDuplicatesWithinWatermark``, whose state
store holds one entry per fingerprint only within the watermark horizon —
bounded state, which is what makes continuous 100-TB/day ingest feasible.
A duplicate arriving later than the horizon is admitted (and removed by the
periodic batch dedup compaction); the horizon is the knob trading state
size against duplicate leakage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import (
    LANG_MARKERS,
    QUALITY_THRESHOLD,
    _hits,
    _tokens,
    quality_col,
)


def clean_doc_stream(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    watermark: str = "10 minutes",
    quality_threshold: float = QUALITY_THRESHOLD,
) -> DataFrame:
    """Language gate → quality gate → within-watermark exact dedup over a
    streaming DataFrame of ``(doc_id, text, <ts_col>)``.

    Returns the cleaned stream with the same signal columns the batch
    pipeline emits (content_fp, n_tokens, quality). All gates are narrow
    codegen expressions — the only stateful stage is the fingerprint dedup.
    """
    scored = docs.select(
        "doc_id",
        ts_col,
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_fp"),
        F.size(_tokens()).alias("n_tokens"),
        quality_col().alias("quality"),
        _hits(LANG_MARKERS["en"]).alias("en_hits"),
    )
    kept = scored.filter(
        (F.col("en_hits") > 0) & (F.col("quality") >= quality_threshold)
    ).drop("en_hits")
    return kept.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_fp"]
    )


def composition_chisq_from_summary(summary: DataFrame) -> DataFrame:
    """Chi-square composition audit over an IVM-maintained (lang, source)
    count summary — the 100-TB form of ``corpus_lang_source_chisq``.

    The batch query re-scans the corpus for its contingency counts; a
    monitoring pipeline instead maintains the counts from the document
    CDC feed in O(delta) per epoch (``ivm.maintain_summary_stream`` with
    ``group_cols=["lang", "source"]``) and runs THIS marginal-sized
    recompute per epoch — the statistic is exact for the net corpus at
    every epoch boundary, with zero base-table scans. Equality with the
    batch query over the same feed is asserted in
    ``tests/test_streaming.py::test_composition_chisq_matches_batch``.
    """
    from ..operators.corpus import chisq_from_counts

    return chisq_from_counts(
        summary.select("lang", "source", F.col("n_rows").cast("bigint").alias("n"))
    )
