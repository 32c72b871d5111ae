"""Multimodal column plumbing (north-star layer).

The pattern for image/audio/video at 100 TB: store payloads as opaque
``binary`` columns next to typed metadata, keep all bookkeeping JVM-side,
and run decode/feature-extraction as Arrow-batched pandas transforms
(``mapInPandas``) so Python touches each batch once, vectorized — never
row-at-a-time UDFs.

The container has no image/audio libraries, so :func:`decode_image` /
:func:`resize_image` are DETERMINISTIC FAKE codecs (shape + pixels derived
from payload bytes; clearly marked in their docstrings, one-body swap for
Pillow/cv2 in production). Everything around them is real and executes:
binary encode, metadata struct, Arrow batch shape, partition-parallel
``mapInPandas`` with stable output schemas — and ``mm_decode_stats`` runs
the decode path end-to-end against an oracle that recomputes the fake
format arithmetically.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table
from .similarity import _SPARK_NORM as _SPARK_NORM_IMPORTED
from .similarity import _SQL_NORM as _SQL_NORM_IMPORTED
from .similarity import _sql_dot as _sql_dot_imported

N_BYTE_FEATURES = 4


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to a 2-D uint8 array.

    DETERMINISTIC FAKE CODEC — no image library (Pillow/cv2) exists in this
    container, so this "format" derives shape and pixels purely from the
    payload bytes: height = b[0] % 12 + 4, width = b[1] % 12 + 4, pixel i =
    payload[i mod len]. Swap this body for a real decoder in production;
    every caller (the mapInPandas stages, the resize below, the
    ``mm_decode_stats`` oracle query) is agnostic to which decoder runs —
    only the fixed output schema matters.
    """
    import numpy as np

    buf = np.frombuffer(payload, dtype=np.uint8)
    if buf.size == 0:
        return np.zeros((4, 4), dtype=np.uint8)
    h = int(buf[0]) % 12 + 4
    w = (int(buf[1]) if buf.size > 1 else 0) % 12 + 4
    idx = np.arange(h * w) % buf.size
    return buf[idx].reshape(h, w)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an image payload to ``height x width``, re-encoded as bytes.

    Decode (see :func:`decode_image` — deterministic fake codec), resample
    by nearest neighbor (pure numpy index math, deterministic), emit a
    2-byte shape header + row-major pixels. Production swaps the codec,
    not this plumbing; the mapInPandas production shape is ``mm_transcode``.
    """
    import numpy as np

    img = decode_image(payload)
    h, w = img.shape
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    out = img[rows][:, cols]
    return bytes([height & 0xFF, width & 0xFF]) + out.tobytes()


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


@query(
    "mm_decode_stats",
    oracle="""
    WITH base AS (
      SELECT doc_id, text, strlen(text) AS L,
             ord(substr(text, 1, 1)) % 12 + 4 AS img_h,
             ord(substr(text, 2, 1)) % 12 + 4 AS img_w
      FROM documents
    ),
    pix AS (
      SELECT doc_id, img_h, img_w,
             ord(substr(text, (i % L) + 1, 1)) AS px
      FROM (SELECT *, unnest(generate_series(0, img_h * img_w - 1)) AS i
            FROM base)
    )
    SELECT doc_id,
           CAST(img_h AS INTEGER) AS img_h,
           CAST(img_w AS INTEGER) AS img_w,
           CAST(img_h * img_w AS INTEGER) AS n_pixels,
           CAST(SUM(px) AS BIGINT) AS pixel_sum,
           CAST(SUM(px) AS DOUBLE) / (img_h * img_w) AS mean_pixel
    FROM pix
    GROUP BY doc_id, img_h, img_w
    """,
    doc="Decoded-image statistics through the full decode path: payload "
        "bytes -> decode_image (deterministic fake codec; see its "
        "docstring) -> shape + exact integer pixel sum + mean, one "
        "Arrow-batched mapInPandas pass with a fixed output schema. The "
        "oracle recomputes the same 'format' arithmetically, proving the "
        "decode plumbing end-to-end, not just the stub signature. "
        "CORPUS INVARIANT the oracle leans on: the implementation reads "
        "UTF-8 BYTES (numpy uint8 over the encoded payload) while the "
        "oracle reads CODEPOINTS (ord/strlen over text) — they agree "
        "because the synthetic corpus is pure ASCII with length >= 2 "
        "(verified; DuckDB ord('') = -1 and any multi-byte char would "
        "diverge). A non-ASCII corpus needs the oracle rewritten over "
        "encoded bytes. At 100 TB: embarrassingly parallel narrow map, "
        "zero shuffle.",
)
def mm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    schema = (
        "doc_id bigint, img_h int, img_w int, n_pixels int, "
        "pixel_sum bigint, mean_pixel double"
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(bytes(payload))
                h, w = img.shape
                s = int(img.sum(dtype="int64"))
                rows.append((doc_id, h, w, h * w, s, s / (h * w)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "img_h", "img_w", "n_pixels",
                    "pixel_sum", "mean_pixel",
                ],
            )

    return docs.mapInPandas(stats, schema)


AUDIO_CENTER = 108  # fake-PCM midpoint (payloads are ASCII text; see decode_audio)


def decode_audio(payload: bytes) -> "object":
    """Decode an audio payload to a centered int16 sample array.

    DETERMINISTIC FAKE CODEC (same contract as :func:`decode_image`): each
    byte is one PCM sample centered at AUDIO_CENTER. Swap the body for a
    real decoder (soundfile/ffmpeg) in production — downstream feature
    math and schemas don't change.
    """
    import numpy as np

    return np.frombuffer(payload, dtype=np.uint8).astype(np.int16) - AUDIO_CENTER


@query(
    "mm_audio_features",
    oracle=f"""
    WITH px AS (
      SELECT doc_id, i,
             ord(substr(text, i, 1)) - {AUDIO_CENTER} AS s,
             ord(substr(text, i + 1, 1)) - {AUDIO_CENTER} AS s_next,
             strlen(text) AS L
      FROM documents, LATERAL (
        SELECT unnest(generate_series(1, strlen(text))) AS i
      )
    )
    SELECT doc_id,
           CAST(MAX(L) AS BIGINT) AS n_samples,
           CAST(SUM(s * s) AS BIGINT) AS energy,
           CAST(MAX(abs(s)) AS INTEGER) AS peak,
           CAST(SUM(CASE WHEN i < L AND s * s_next < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS zero_crossings
    FROM px
    GROUP BY doc_id
    """,
    doc="Audio feature extraction through the decode path: payload -> "
        "decode_audio (deterministic fake PCM; see its docstring) -> exact "
        "integer energy, peak amplitude, and zero-crossing count per "
        "asset, one Arrow-batched mapInPandas pass. The signal-quality "
        "triage a speech corpus runs before transcription. "
        "CORPUS INVARIANT the oracle leans on: implementation samples are "
        "UTF-8 BYTES, oracle samples are CODEPOINTS (ord) — equal only "
        "because the synthetic corpus is pure ASCII and non-empty "
        "(verified); non-ASCII input needs a bytes-based oracle. Narrow "
        "map, zero shuffle; all sums are exact integers so results are "
        "partition-order independent.",
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    schema = (
        "doc_id bigint, n_samples bigint, energy bigint, "
        "peak int, zero_crossings bigint"
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = decode_audio(bytes(payload)).astype(np.int64)
                zc = int(np.sum(s[:-1] * s[1:] < 0)) if s.size > 1 else 0
                rows.append(
                    (
                        doc_id,
                        int(s.size),
                        int(np.sum(s * s)),
                        int(np.max(np.abs(s))) if s.size else 0,
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "energy", "peak", "zero_crossings"],
            )

    return docs.mapInPandas(feats, schema)


# ------------------------------------------------ perceptual-hash near-dup --
#
# Image-level near-duplicate detection: average-hash (aHash) over the
# DECODED pixels — the multimodal twin of the text dedup family. Two
# re-encodes of the same image (crops aside) decode to near-identical
# pixel grids and collide on the 16-bit hash; grouping by hash is then
# one map-side-combined aggregation, exactly like dedup_exact_groups on
# text. The decode runs through the real Arrow-batched mapInPandas path
# (production swaps decode_image's body for Pillow; the hash math is
# codec-agnostic), and the oracle recomputes the whole decode+hash
# arithmetically from the ASCII-corpus invariant (payload = UTF-8 text,
# same discipline as mm_decode_stats). Threshold test uses integer
# cross-multiplication (pixel * n >= sum) — no division, bit-exact in
# both engines.

PHASH_BITS = 16  # h, w >= 4 so every decoded image has >= 16 pixels


@query(
    "mm_phash_groups",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text, strlen(text) AS L,
             ord(substr(text, 1, 1)) % 12 + 4 AS h,
             ord(substr(text, 2, 1)) % 12 + 4 AS w
      FROM documents
    ), px AS (
      SELECT doc_id, h * w AS n,
             list_reduce(list_transform(generate_series(0, h * w - 1),
               i -> ord(substr(text, (i % L) + 1, 1))), (a, b) -> a + b)
               AS s,
             list_transform(generate_series(0, {PHASH_BITS - 1}),
               i -> ord(substr(text, (i % L) + 1, 1))) AS p
      FROM base
    ), hashed AS (
      SELECT doc_id,
             list_reduce(list_transform(generate_series(1, {PHASH_BITS}),
               j -> CASE WHEN p[j] * n >= s THEN 1 << (j - 1) ELSE 0 END),
               (a, b) -> a + b) AS phash
      FROM px
    )
    SELECT CAST(phash AS INTEGER) AS phash,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(MIN(doc_id) AS BIGINT) AS rep_doc_id
    FROM hashed GROUP BY phash HAVING COUNT(*) >= 2
    """,
    doc=f"Perceptual-hash (aHash, {PHASH_BITS}-bit) near-dup groups over "
        "DECODED image pixels: mean-threshold bits via integer "
        "cross-multiplication, hash-groupBy collision groups. Decode runs "
        "the real mapInPandas path (fake codec, one-body production "
        "swap); the oracle rebuilds decode+hash arithmetically. One "
        "Arrow pass + one combined aggregation.",
)
def mm_phash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            hashes = []
            for b in pdf["payload"]:
                img = decode_image(bytes(b))
                flat = img.ravel().astype(np.int64)
                n, s = flat.size, int(flat.sum())
                bits = flat[:PHASH_BITS] * n >= s
                hashes.append(int((bits << np.arange(PHASH_BITS)).sum()))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "phash": hashes})

    hashed = docs.mapInPandas(phash, "doc_id bigint, phash int")
    return (
        hashed.groupBy("phash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.min("doc_id").cast("long").alias("rep_doc_id"),
        )
        .filter(F.col("n_images") >= 2)
    )


# ------------------------------------------------ paired-dataset manifest ---
#
# CLIP-style training consumes (caption, image-embedding) PAIRS, and the
# manifest that defines them is itself a first-class pipeline artifact:
# which caption pairs with which asset, which pairs survived the quality
# gates, and how many pairs each source contributes (capped, so one crawl
# domain can't dominate the contrastive batch distribution). Here the
# caption side is `documents` and the asset side is `embeddings` keyed by
# doc_id == vec_id — the standard layout where a sibling table holds the
# precomputed vision-tower output.
#
# Scale shape: one equi-join between the two tables (both shuffled on the
# shared id — or co-located for free if both are bucketed by id at write
# time, the warehouse's bucketing seam), narrow per-row gates, and the
# per-source cap as a hash-ranked window inside each source partition.
# No data-sized broadcast, no skew (caps bound every source's output).

PAIR_MIN_TOKENS = 3       # caption gates
PAIR_MAX_TOKENS = 64
PAIR_SOURCE_CAP = 40      # max pairs per source
PAIR_SALT = "mmp1:"


@query(
    "mm_pair_manifest",
    oracle=f"""
    WITH cap AS (
      SELECT doc_id, source, lang,
             len(string_split(trim(text), ' ')) AS n_tokens
      FROM documents
    ), emb AS (
      SELECT vec_id, {_SQL_NORM_IMPORTED} AS emb_norm FROM embeddings
    ), gated AS (
      SELECT c.doc_id, c.source, c.lang, c.n_tokens, e.emb_norm
      FROM cap c JOIN emb e ON e.vec_id = c.doc_id
      WHERE c.n_tokens BETWEEN {PAIR_MIN_TOKENS} AND {PAIR_MAX_TOKENS}
        AND e.emb_norm > 0
    ), ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('{PAIR_SALT}' || doc_id::VARCHAR), doc_id
             ) AS rk
      FROM gated
    )
    SELECT doc_id, source, lang,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           emb_norm
    FROM ranked WHERE rk <= {PAIR_SOURCE_CAP}
    ORDER BY doc_id
    """,
    doc="Paired multimodal training manifest (CLIP shape): captions "
    "joined to their precomputed embedding rows on doc_id = vec_id, "
    "token-length and non-degenerate-norm gates, then a deterministic "
    f"hash-ranked cap of {PAIR_SOURCE_CAP} pairs per source so no crawl "
    "domain dominates the contrastive batch distribution. One id-grain "
    "equi-join (bucketable at write time) + narrow gates + per-source "
    "windows — no broadcast of data, caps bound every partition.",
)
def mm_pair_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "lang",
        F.expr("size(split(trim(text), ' '))").alias("n_tokens"),
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.expr(_SPARK_NORM_IMPORTED).alias("emb_norm"),
    )
    gated = docs.join(emb, "doc_id").filter(
        F.col("n_tokens").between(PAIR_MIN_TOKENS, PAIR_MAX_TOKENS)
        & (F.col("emb_norm") > 0)
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit(PAIR_SALT), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        gated.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= PAIR_SOURCE_CAP)
        .select(
            "doc_id",
            "source",
            "lang",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "emb_norm",
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------ cross-modal alignment ----
#
# CLIP-score alignment gating — the LAION-style filter that decides
# whether an (image, caption) pair belongs in a multimodal training set:
# embed both modalities, keep pairs whose normalized cosine clears a
# threshold, and report retention per slice so a curator can see which
# sources produce misaligned pairs. The pair manifest here is synthetic
# (adjacent vec_ids stand in for the two modality embeddings of one
# pair — production swaps in the real (image_emb, text_emb) join), but
# the plumbing is the real thing: per-pair normalized cosine computed
# JVM-side with the higher-order-fold dot (no Python in the loop),
# quantized to exact integers BEFORE any cross-row aggregation so the
# per-label retention/mean-alignment sums are bit-stable under any
# partitioning. One equi-join on pair id + one hash agg — linear scale.

MM_ALIGN_SCALE = 1_000_000    # per-pair cosine fixed-point scale
MM_ALIGN_THRESH = 0           # keep pairs with cosine >= 0.0 (scaled)


@query(
    "mm_clip_alignment_gate",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb,
             {_SQL_NORM_IMPORTED} AS nrm
      FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS pair_id, a.label AS label,
             CAST(round({{dot}} / (a.nrm * b.nrm) * {MM_ALIGN_SCALE})
                  AS BIGINT) AS cs
      FROM e a JOIN e b ON a.vec_id + 1 = b.vec_id
      WHERE a.vec_id % 2 = 0
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN cs >= {MM_ALIGN_THRESH} THEN 1 ELSE 0 END)
                AS BIGINT) AS kept,
           CAST(SUM(CASE WHEN cs >= {MM_ALIGN_THRESH} THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS retention,
           CAST(SUM(cs) AS BIGINT) AS align_scaled,
           CAST(SUM(cs) AS DOUBLE) / COUNT(*) / {MM_ALIGN_SCALE}
             AS mean_alignment
    FROM pairs
    GROUP BY label
    ORDER BY label
    """.format(dot=_sql_dot_imported("a.emb", "b.emb")),  # DIM-interpolated:
    # the oracle dot always covers the full embedding width, never a
    # hardcoded 64 that would silently truncate if DIM changed
    doc="CLIP-score alignment gate over (image, caption) embedding pairs "
        "(LAION-style cosine filtering): per-pair normalized cosine via "
        "the JVM higher-order-fold dot, quantized to exact integers "
        "before aggregation, then per-label pair counts / retention above "
        "threshold / mean alignment. Pair manifest is adjacent vec_ids "
        "(a deterministic stand-in for the real two-modality join); the "
        "gate itself is one equi-join + one hash agg — linear at 100 TB.",
)
def mm_clip_alignment_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import _SPARK_EMB_D, _spark_dot

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr(_SPARK_EMB_D).alias("emb"),
        F.expr(_SPARK_NORM_IMPORTED).alias("nrm"),
    )
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.filter(F.col("a.vec_id") % 2 == 0)
        .join(b, F.col("a.vec_id") + 1 == F.col("b.vec_id"))
        .select(
            F.col("a.label").alias("label"),
            F.round(
                F.expr(_spark_dot("a.emb", "b.emb"))
                / (F.col("a.nrm") * F.col("b.nrm"))
                * MM_ALIGN_SCALE
            )
            .cast("bigint")
            .alias("cs"),
        )
    )
    kept = F.sum(
        (F.col("cs") >= MM_ALIGN_THRESH).cast("bigint")
    ).cast("bigint")
    return (
        pairs.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            kept.alias("kept"),
            (kept.cast("double") / F.count(F.lit(1))).alias("retention"),
            F.sum("cs").cast("bigint").alias("align_scaled"),
            (
                F.sum("cs").cast("double")
                / F.count(F.lit(1))
                / F.lit(float(MM_ALIGN_SCALE))
            ).alias("mean_alignment"),
        )
        .orderBy("label")
    )


# ------------------------------------------------------ scene detection ----
#
# Video scene segmentation over the synthetic frame codec: one signature
# byte per fixed-stride frame (the mm_frame_sample convention — a real
# pipeline swaps in a per-frame perceptual hash), a cut wherever
# consecutive signatures jump by more than SCENE_TAU, and per-clip shot
# statistics (cut count, mean shot length) — the pre-filter a video
# training set runs to drop static screencasts and strobing junk before
# expensive frame extraction. Entirely JVM-side higher-order functions
# on the payload (sequence → transform → filter): no Python, no
# shuffle, embarrassingly parallel narrow map at 100 TB.

SCENE_TAU = 32  # signature jump (0-255 scale) that counts as a cut


@query(
    "mm_scene_cuts",
    oracle=f"""
    WITH f AS (
      -- CHARACTER convention on both sides: length (chars, not strlen
      -- bytes) + ord == Spark's length + ascii (both return the full
      -- code point, verified incl. astral plane) — byte/char divergence
      -- on non-ASCII text was ADVICE r10's finding
      SELECT doc_id,
             GREATEST(CAST(ceil(length(text) / {FRAME_STRIDE}.0) AS BIGINT),
                      1) AS nf,
             list_transform(
               generate_series(0,
                 CAST(GREATEST(ceil(length(text) / {FRAME_STRIDE}.0), 1)
                      AS BIGINT) - 1),
               p -> ord(substr(text, CAST(p * {FRAME_STRIDE} + 1 AS INTEGER),
                               1))) AS sigs
      FROM documents
    )
    SELECT doc_id, nf AS n_frames,
           CAST(len(list_filter(generate_series(2, nf),
                i -> abs(sigs[i] - sigs[i - 1]) > {SCENE_TAU}))
                AS BIGINT) AS n_cuts,
           CAST(nf AS DOUBLE)
             / (len(list_filter(generate_series(2, nf),
                  i -> abs(sigs[i] - sigs[i - 1]) > {SCENE_TAU})) + 1)
             AS mean_shot_frames
    FROM f
    """,
    doc="Scene-cut detection over binary media payloads: per-frame "
        "signature bytes at the fixed decode stride (deterministic "
        "stand-in for a per-frame perceptual hash), a cut where "
        f"consecutive signatures jump by more than {SCENE_TAU}, per-clip "
        "cut count + mean shot length. Pure JVM higher-order functions "
        "(sequence/transform/filter) over the payload — no Python, no "
        "shuffle, narrow map.",
)
def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nf = (
        f"greatest(cast(ceil(length(text) / {FRAME_STRIDE}.0) as bigint),"
        " 1L)"
    )
    f = docs.select(
        "doc_id",
        F.expr(nf).alias("nf"),
        F.expr(
            f"transform(sequence(0L, {nf} - 1),"
            f" p -> ascii(substr(text, cast(p * {FRAME_STRIDE} + 1 as int),"
            " 1)))"
        ).alias("sigs"),
    )
    # nf = 1 guard: Spark's sequence(2, 1) DESCENDS instead of being
    # empty (DuckDB's generate_series(2, 1) is empty) — gate the filter
    cuts = F.expr(
        "case when nf < 2 then 0L else"
        " cast(size(filter(sequence(2L, nf),"
        f" i -> abs(element_at(sigs, cast(i as int))"
        f" - element_at(sigs, cast(i as int) - 1)) > {SCENE_TAU})) as bigint)"
        " end"
    )
    return f.select(
        "doc_id",
        F.col("nf").alias("n_frames"),
        cuts.cast("bigint").alias("n_cuts"),
        (F.col("nf").cast("double") / (cuts + 1)).alias("mean_shot_frames"),
    )


# -------------------------------------------------- audio VAD segments -----
#
# Voice-activity detection over audio payloads, the frame-energy
# run-length pre-filter an audio training pipeline runs before
# expensive ASR: one energy signature per fixed-stride frame (the
# mm_frame_sample codec convention — a real pipeline swaps in RMS
# energy per hop), frames above VAD_THRESH are "voiced", and the
# per-clip report is voiced-frame count, segment count, and the
# longest voiced segment — dropping silence-only and wall-of-noise
# clips. Segment structure falls out of boundary positions (starts =
# voiced with unvoiced predecessor, ends = voiced with unvoiced
# successor; k-th start pairs with k-th end), all JVM-side higher-order
# functions over the payload: no Python, no shuffle, narrow map at any
# corpus size. Character convention on both engines (length + ord ==
# length + ascii — the mm_scene_cuts discipline).

VAD_THRESH = 96  # signature >= this counts as voiced (lowercase band)


@query(
    "mm_audio_vad_segments",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             GREATEST(CAST(ceil(length(text) / {FRAME_STRIDE}.0) AS BIGINT),
                      1) AS nf,
             list_transform(
               generate_series(0,
                 CAST(GREATEST(ceil(length(text) / {FRAME_STRIDE}.0), 1)
                      AS BIGINT) - 1),
               p -> ord(substr(text, CAST(p * {FRAME_STRIDE} + 1 AS INTEGER),
                               1)) >= {VAD_THRESH}) AS v
      FROM documents
    ), seg AS (
      SELECT doc_id, nf,
             CAST(len(list_filter(generate_series(1, nf),
                  i -> v[i])) AS BIGINT) AS n_voiced,
             list_filter(generate_series(1, nf),
               i -> v[i] AND (i = 1 OR NOT v[i - 1])) AS starts,
             list_filter(generate_series(1, nf),
               i -> v[i] AND (i = nf OR NOT v[i + 1])) AS ends
      FROM f
    )
    SELECT doc_id, nf AS n_frames, n_voiced,
           CAST(len(starts) AS BIGINT) AS n_segments,
           CAST(COALESCE(list_max(list_transform(
                  generate_series(1, len(starts)),
                  k -> ends[k] - starts[k] + 1)), 0) AS BIGINT)
             AS longest_segment,
           CAST(n_voiced AS DOUBLE) / nf AS voiced_ratio
    FROM seg
    """,
    doc="Audio VAD run-length report over binary media payloads: "
        "per-frame energy signatures at the fixed decode stride, voiced "
        f"= signature >= {VAD_THRESH}, segments from boundary-position "
        "pairing (k-th start with k-th end — pure higher-order "
        "functions, no fold state), longest voiced segment + voiced "
        "ratio per clip. The silence/noise pre-filter before ASR; "
        "no Python, no shuffle, narrow map.",
)
def mm_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    nf = (
        f"greatest(cast(ceil(length(text) / {FRAME_STRIDE}.0) as bigint),"
        " 1L)"
    )
    f = docs.select(
        "doc_id",
        F.expr(nf).alias("nf"),
        F.expr(
            f"transform(sequence(0L, {nf} - 1),"
            f" p -> ascii(substr(text, cast(p * {FRAME_STRIDE} + 1 as int),"
            f" 1)) >= {VAD_THRESH})"
        ).alias("v"),
    )
    el = "element_at(v, cast(i as int))"
    el_prev = "element_at(v, cast(i as int) - 1)"
    el_next = "element_at(v, cast(i as int) + 1)"
    seg = f.select(
        "doc_id",
        "nf",
        F.expr(
            f"cast(size(filter(sequence(1L, nf), i -> {el})) as bigint)"
        ).alias("n_voiced"),
        F.expr(
            f"filter(sequence(1L, nf),"
            f" i -> {el} and (i = 1 or not {el_prev}))"
        ).alias("starts"),
        F.expr(
            f"filter(sequence(1L, nf),"
            f" i -> {el} and (i = nf or not {el_next}))"
        ).alias("ends"),
    )
    return seg.select(
        "doc_id",
        F.col("nf").alias("n_frames"),
        "n_voiced",
        F.expr("cast(size(starts) as bigint)").alias("n_segments"),
        F.expr(
            "cast(coalesce(array_max(zip_with(ends, starts,"
            " (e, s) -> e - s + 1)), 0L) as bigint)"
        ).alias("longest_segment"),
        (F.col("n_voiced").cast("double") / F.col("nf")).alias(
            "voiced_ratio"
        ),
    )
