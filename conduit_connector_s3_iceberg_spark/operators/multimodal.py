"""Multimodal column plumbing (north-star layer).

The pattern for image/audio/video at 100 TB: store payloads as opaque
``binary`` columns next to typed metadata, keep all bookkeeping JVM-side,
and run decode/feature-extraction as Arrow-batched pandas transforms
(``mapInPandas``) so Python touches each batch once, vectorized — never
row-at-a-time UDFs.

The container has no image/audio libraries, so the *decode* step is a
clearly-marked stub (:func:`decode_image`); the Spark-side plumbing that the
stub plugs into — binary encode, metadata struct, Arrow batch shape,
partition-parallel ``mapInPandas`` with a stable output schema — is real and
oracle-checked using a deterministic byte-level feature extractor.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

N_BYTE_FEATURES = 4


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to an array.

    STUB: real decoding needs an image library (e.g. Pillow/cv2) that is not
    available in this environment. The surrounding Spark plumbing
    (binary column → mapInPandas batches → fixed-schema features) is real;
    swap this function's body for an actual decoder in production.
    """
    raise NotImplementedError(
        "image decoding requires an image library; not available here"
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload.

    STUB (same contract as :func:`decode_image`): needs an image library.
    The production shape is a ``mapInPandas`` stage identical to
    ``mm_feature_extract`` — binary in, binary out, fixed metadata columns —
    so the plumbing below is what carries it at scale.
    """
    raise NotImplementedError("image resizing requires an image library")


FRAME_STRIDE = 64  # bytes per synthetic "frame"
N_FRAMES = 3       # frames sampled per payload


@query(
    "mm_frame_sample",
    oracle=f"""
    SELECT doc_id,
           {", ".join(
               f"CAST(CASE WHEN strlen(text) > {i * FRAME_STRIDE} THEN "
               f"ord(substr(text, {i * FRAME_STRIDE + 1}, 1)) END AS INTEGER)"
               f" AS frame{i}" for i in range(N_FRAMES)
           )},
           CAST(ceil(strlen(text) / {FRAME_STRIDE}.0) AS BIGINT) AS n_frames
    FROM documents
    """,
    doc="Frame sampling over binary media payloads: every k-th fixed-stride "
        "frame is decoded per payload (deterministic first-byte stand-in "
        "for a real video decoder, cf. decode_image/resize_image stubs). "
        "mapInPandas, Arrow-batched; output schema fixed regardless of "
        "payload length.",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    schema = (
        "doc_id bigint, "
        + ", ".join(f"frame{i} int" for i in range(N_FRAMES))
        + ", n_frames bigint"
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"]}
            for i in range(N_FRAMES):
                pos = i * FRAME_STRIDE
                out[f"frame{i}"] = pdf["payload"].map(
                    lambda b, p=pos: int(b[p]) if len(b) > p else None
                )
            out["n_frames"] = pdf["payload"].map(
                lambda b: -(-len(b) // FRAME_STRIDE)
            )
            yield pd.DataFrame(out)

    return docs.mapInPandas(sample, schema)


@query(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS INTEGER) AS byte_len,
           md5(text) AS content_md5,
           CAST(strlen(text) AS BIGINT) = n_chars AS len_matches_meta
    FROM documents
    """,
    doc="Multimodal metadata layer: payload as opaque bytes + typed metadata "
        "(byte length, content digest, metadata consistency flag) — all "
        "JVM-side expressions over the binary column.",
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length("text").alias("byte_len"),
        F.md5(payload).alias("content_md5"),
        (F.octet_length("text").cast("long") == F.col("n_chars")).alias(
            "len_matches_meta"
        ),
    )


@query(
    "mm_feature_extract",
    oracle=f"""
    SELECT doc_id,
           CAST(strlen(text) AS INTEGER) AS byte_len,
           {", ".join(f"CAST(ord(substr(text, {i + 1}, 1)) AS DOUBLE) AS f{i}" for i in range(N_BYTE_FEATURES))}
    FROM documents
    """,
    doc="Arrow-batched feature extraction over binary payloads via "
        "mapInPandas: deterministic byte-level features stand in for a real "
        "decoder (see decode_image stub). One Python pass per Arrow batch, "
        "vectorized; output schema is fixed so downstream plans are stable.",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    schema = "doc_id bigint, byte_len int, " + ", ".join(
        f"f{i} double" for i in range(N_BYTE_FEATURES)
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "byte_len": pdf["payload"].map(len).astype("int32"),
            }
            for i in range(N_BYTE_FEATURES):
                out[f"f{i}"] = pdf["payload"].map(
                    lambda b, i=i: float(b[i]) if len(b) > i else 0.0
                )
            yield pd.DataFrame(out)

    return docs.mapInPandas(extract, schema)


TRANSCODE_MAX_BYTES = 128  # deterministic "downsample" target size


@query(
    "mm_transcode",
    oracle=f"""
    SELECT doc_id,
           CAST(strlen(text) AS INTEGER) AS orig_len,
           CAST(least(strlen(text), {TRANSCODE_MAX_BYTES}) AS INTEGER) AS out_len,
           md5(substr(text, 1, {TRANSCODE_MAX_BYTES})) AS out_md5
    FROM documents
    """,
    doc="Binary-to-binary transcode stage (the resize_image production "
        "shape): payload in, transformed payload out through one "
        "Arrow-batched mapInPandas pass — here a deterministic truncation "
        "stands in for a real codec (see resize_image stub). Output digest "
        "and lengths are computed JVM-side over the returned binary, "
        "proving the bytes round-trip Arrow intact. At 100 TB this stage "
        "is embarrassingly parallel and its output schema is fixed, so "
        "downstream plans never depend on payload content.",
)
def mm_transcode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    schema = "doc_id bigint, orig_len int, out_payload binary"

    def transcode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_len": pdf["payload"].map(len).astype("int32"),
                    "out_payload": pdf["payload"].map(
                        lambda b: bytes(b[:TRANSCODE_MAX_BYTES])
                    ),
                }
            )

    out = docs.mapInPandas(transcode, schema)
    return out.select(
        "doc_id",
        "orig_len",
        F.octet_length("out_payload").alias("out_len"),
        F.md5("out_payload").alias("out_md5"),
    )


MODALITIES = ("text", "image", "audio", "video")
_MOD_SQL = ", ".join(f"'{m}'" for m in MODALITIES)


@query(
    "mm_modality_mix",
    oracle=f"""
    SELECT [{_MOD_SQL}][CAST(doc_id % 4 AS INTEGER) + 1] AS modality,
           COUNT(*) AS n_assets,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(SUM(octet_length(encode(text))) AS BIGINT)
             / CAST(COUNT(*) AS DOUBLE) AS avg_bytes
    FROM documents
    GROUP BY modality
    """,
    doc="Modality-mix rollup over the asset store: per-modality asset "
        "count, total payload bytes, mean payload size — the dataset-card "
        "summary a multimodal corpus publishes. Modality is derived "
        "deterministically from doc_id (the synthetic store carries text "
        "payloads only); byte accounting runs on the binary column "
        "JVM-side. Narrow map + one 4-group aggregation.",
)
def mm_modality_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col("doc_id") % 4).cast("int") + 1,
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return (
        docs.select(modality.alias("modality"), F.octet_length(payload).alias("nb"))
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("nb").alias("total_bytes"),
            (F.sum("nb") / F.count(F.lit(1)).cast("double")).alias("avg_bytes"),
        )
    )
