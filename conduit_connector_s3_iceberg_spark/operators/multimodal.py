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
