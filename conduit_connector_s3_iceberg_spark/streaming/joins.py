"""Watermarked stream-stream joins.

The remaining piece of the Structured Streaming surface (SURVEY.md §2C
streaming row): joining two live streams requires both sides to buffer
state; the watermark + time-range condition bound that state — without the
range condition the join state grows forever.

Scale: state is partitioned by the join key across executors; each side
evicts buffered rows once the watermark passes ``within`` of their event
time. The canonical use is attribution (left stream = impressions/clicks,
right stream = conversions within a horizon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two event-time streams on ``key`` where the right event happens
    in ``[left_time, left_time + within]``.

    Both sides get watermarks (required for state cleanup; outer joins
    additionally require them to emit null-padded results). Column names of
    the two sides must not collide except for ``key``.
    """
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_time] >= lw[left_time])
        & (rw[right_time] <= lw[left_time] + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, how).drop(rw[key])


def enrich_stream(
    stream: DataFrame,
    dimension: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static join: enrich a stream with a batch dimension table.

    Structured Streaming re-evaluates the static side per micro-batch, so
    a dimension backed by a table picks up updates between batches without
    restarting the query — the standard enrichment pattern (user profile,
    geo, catalog lookups) and stateless, unlike stream-stream joins: no
    watermark, no state store. ``broadcast_dim`` ships the dimension to
    executors once per batch; disable it for dimensions too large to
    broadcast (the join then shuffles the micro-batch, which stays small).
    """
    dim = F.broadcast(dimension) if broadcast_dim else dimension
    return stream.join(dim, on, how)
