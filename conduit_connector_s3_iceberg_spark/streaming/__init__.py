"""Structured Streaming surface: CDC ingestion (micro-batch MERGE apply),
watermarked window rollups, stream dedup, and custom stateful operators."""

from .cdc import (
    apply_cdc_batch,
    apply_cdc_stream,
    collapse_lww,
    decode_cdc,
    read_cdc_stream,
)
from .corpus import clean_doc_stream
from .dedup_stream import apply_dedup_epoch, maintain_dedup_stream
from .semdedup_stream import apply_semdedup_epoch, maintain_semdedup_stream
from .ivm import apply_summary_delta, cdc_delta_frame, maintain_summary_stream
from .joins import enrich_stream, stream_stream_join
from .stateful import anomaly_flags, running_user_totals
from .windows import dedup_stream, session_rollup, sliding_rollup, tumbling_rollup

__all__ = [
    "apply_cdc_batch",
    "apply_cdc_stream",
    "collapse_lww",
    "decode_cdc",
    "read_cdc_stream",
    "clean_doc_stream",
    "apply_dedup_epoch",
    "maintain_dedup_stream",
    "apply_semdedup_epoch",
    "maintain_semdedup_stream",
    "apply_summary_delta",
    "cdc_delta_frame",
    "maintain_summary_stream",
    "anomaly_flags",
    "running_user_totals",
    "stream_stream_join",
    "enrich_stream",
    "dedup_stream",
    "session_rollup",
    "sliding_rollup",
    "tumbling_rollup",
]
