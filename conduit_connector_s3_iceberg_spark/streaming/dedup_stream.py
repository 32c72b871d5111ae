"""Streaming incremental dedup against a STANDING fingerprint index.

``clean_doc_stream`` dedups within the stream's watermark horizon (bounded
state-store memory); this module closes the other half of the production
loop: each micro-batch is also checked against the PERSISTED index of
every fingerprint ever admitted — the streaming twin of the batch
``dedup_incremental_delta`` (operators/dedup.py), sharing its join
discipline:

* the standing index is big and is NEVER shuffled or broadcast — the
  micro-batch's fingerprint set (small by construction) broadcasts into
  an inner probe join, and the matched set (smaller still) broadcasts
  back into an anti filter. Cost per epoch is O(batch), not O(corpus).
* admitted documents append to the output table, their fingerprints to
  the index — the index IS the dedup state, surviving restarts and
  shared with batch jobs (Iceberg table in production; the
  ParquetWarehouse analogue here).

Replay safety: foreachBatch is at-least-once, so a re-delivered epoch
must not re-admit documents whose fingerprints its first delivery already
registered (a blind anti-join WOULD filter them — but only after the
index append committed; the epoch sidecar also covers the half-applied
window). Same watermark-sidecar discipline as the CMS/IVM maintainers,
same Parquet-analogue caveat: the two appends and the watermark are
separate commits here, one transaction on Iceberg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _fingerprint() -> F.Column:
    # the engine-wide content fingerprint (operators/dedup.py uses the
    # identical expression, so batch and stream agree on what "duplicate"
    # means)
    return F.md5(F.lower(F.trim(F.col("text"))))


def apply_dedup_epoch(
    wh, fp_table: str, out_table: str, batch: DataFrame, epoch_id: int
) -> None:
    """One idempotent epoch: in-batch keep-first, anti-probe the standing
    index, append survivors + their fingerprints, advance the epoch
    watermark. Module-level so replay semantics are unit-testable."""
    from ..writer import epoch_already_applied, mark_epoch_applied

    epoch_table = f"{fp_table}__applied_epoch"
    if batch.isEmpty():
        return
    if epoch_already_applied(wh, epoch_table, epoch_id):
        return  # re-delivered epoch — already admitted

    fp = batch.withColumn("content_fp", _fingerprint())
    # in-batch keep-first (deterministic: lowest doc_id wins)
    w = Window.partitionBy("content_fp").orderBy("doc_id")
    firsts = (
        fp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    if wh.table_exists(fp_table):
        batch_fps = firsts.select("content_fp").distinct()
        matched = (
            wh.read(fp_table)
            .join(F.broadcast(batch_fps), "content_fp")
            .select("content_fp")
            .distinct()
        )
        novel = firsts.join(F.broadcast(matched), "content_fp", "left_anti")
    else:
        novel = firsts
    spark = batch.sparkSession
    novel = novel.localCheckpoint()  # consumed twice (docs + fps)
    if not wh.table_exists(out_table):
        wh.create_table(out_table, novel.schema)
    wh.append(out_table, novel)
    fps = novel.select("content_fp")
    if not wh.table_exists(fp_table):
        wh.create_table(fp_table, fps.schema)
    wh.append(fp_table, fps)
    mark_epoch_applied(wh, epoch_table, spark, epoch_id)


def maintain_dedup_stream(
    stream: DataFrame,
    wh,
    fp_table: str,
    out_table: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Continuously admit only first-seen documents from ``stream``
    (columns must include ``doc_id`` and ``text``): the streaming face of
    incremental corpus dedup. State = the fingerprint table itself —
    unbounded in fingerprints but O(1) per admitted doc, queryable, and
    shared with the batch engine; nothing lives in the state store."""
    writer = (
        stream.writeStream.foreachBatch(
            lambda batch, epoch_id: apply_dedup_epoch(
                wh, fp_table, out_table, batch, epoch_id
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
