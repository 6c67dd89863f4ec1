"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-preserving
``mapInPandas`` over Arrow batches, typed metadata structs. Media decoding
is CAPABILITY-GATED (``decode_features``): Pillow is tried at call time
and the deterministic fake stands in when it's absent (as in this
container, which has no image/audio libraries) — the same plan runs
production-real wherever the wheel is installed.

Design for 100 TB of media:
- payloads stay opaque binary; all predicates/pruning run on the metadata
  struct columns, so filters never deserialize media bytes.
- feature extraction is ``mapInPandas`` (Arrow batches of bytes into
  Python once, vectorized), never a row-at-a-time UDF.
- frame/audio sampling emits multiple rows per input via the iterator
  contract of ``mapInPandas`` (a flatMap, not a join).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ai_batch_processing_spark.registry import register
from ai_batch_processing_spark.session import load_tables

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("md5", StringType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", media_type: str = "image/fake") -> DataFrame:
    """Synthesize an opaque binary payload column + metadata struct.

    Stands in for reading real media files; the payload is the utf-8 bytes
    of ``text_col`` so every downstream byte-level operator is
    deterministic and oracle-checkable.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("md5"),
        ),
    )


def decode_image(payload: bytes) -> object:
    """Real media decode — raises when no image library is present.

    ``decode_features`` is the capability-gated entry point operators use;
    this raw decoder is kept for callers that need the image object itself.
    """
    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "media decoding requires an image library not present in this environment"
        ) from e
    import io

    return Image.open(io.BytesIO(payload))


def decode_features(payload: bytes) -> tuple[int, int, str]:
    """Capability-gated decode+feature-extract: Pillow when importable,
    the deterministic fake otherwise — the SAME code path becomes
    production-real the moment the dependency exists (no code change,
    just an installed wheel). Import is attempted per call and cached by
    the interpreter; on executors each worker probes once."""
    try:
        from PIL import Image
    except ImportError:
        return fake_decode_features(payload)
    import io

    with Image.open(io.BytesIO(payload)) as img:
        return int(img.width), int(img.height), (img.format or "unknown").lower()


def fake_decode_features(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for decode+feature-extract: derives a fake
    (width, height, format) from the payload bytes."""
    digest = hashlib.sha1(payload).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    fmt = ["png", "jpeg", "webp"][digest[2] % 3]
    return width, height, fmt


def extract_media_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Vectorized feature extraction over Arrow batches of media bytes.

    Output = input columns + (width, height, format). Batch shape: each
    pandas batch holds the payload bytes column; one Python crossing per
    batch, not per row.
    """
    out_schema = StructType(
        df.schema.fields
        + [
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("format", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_features(p) for p in pdf[payload_col]]
            pdf = pdf.copy()
            pdf["width"] = [f[0] for f in feats]
            pdf["height"] = [f[1] for f in feats]
            pdf["format"] = [f[2] for f in feats]
            yield pdf

    return df.mapInPandas(run, out_schema)


def resize_images(
    df: DataFrame,
    max_width: int = 64,
    max_height: int = 64,
    payload_col: str = "payload",
) -> DataFrame:
    """Resize plumbing: payload → payload' with updated dimension metadata.

    The fake transform scales the payload proportionally to the pixel
    reduction (a real implementation decodes, resizes with PIL/cv2,
    re-encodes — one function swap). Aspect ratio is preserved; images
    already within bounds pass through byte-identical. Output = input
    columns with ``payload`` replaced + (width, height, resized).
    """
    out_schema = StructType(
        df.schema.fields
        + [
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("resized", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, resized, payloads = [], [], [], []
            for p in pdf[payload_col]:
                w, h, _fmt = fake_decode_features(p)
                scale = min(max_width / w, max_height / h, 1.0)
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                if scale < 1.0:
                    keep = max(1, int(len(p) * (nw * nh) / (w * h)))
                    payloads.append(p[:keep])
                    resized.append("yes")
                else:
                    payloads.append(p)
                    resized.append("no")
                widths.append(nw)
                heights.append(nh)
            pdf = pdf.copy()
            pdf[payload_col] = payloads
            pdf["width"] = widths
            pdf["height"] = heights
            pdf["resized"] = resized
            yield pdf

    return df.mapInPandas(run, out_schema)


def sample_frames(df: DataFrame, payload_col: str = "payload", every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing: flatMap one media row → many frame rows.

    The fake "decoder" emits one frame per ``every_n_bytes`` chunk; a real
    video decoder would emit one row per sampled frame. Demonstrates the
    one-to-many ``mapInPandas`` shape (iterator of output batches whose
    row count differs from the input's).
    """
    id_cols = [c for c in df.columns if c != payload_col]
    out_schema = StructType(
        [df.schema[c] for c in id_cols]
        + [StructField("frame_idx", IntegerType()), StructField("frame_bytes", BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = row[payload_col]
                for i in range(0, max(1, len(payload) // every_n_bytes)):
                    chunk = payload[i * every_n_bytes : (i + 1) * every_n_bytes]
                    rows.append({**{c: row[c] for c in id_cols}, "frame_idx": i, "frame_bytes": chunk})
            yield pd.DataFrame(rows, columns=id_cols + ["frame_idx", "frame_bytes"])

    return df.mapInPandas(run, out_schema)


@register(
    "q60_multimodal_metadata",
    oracle="""
        SELECT
            doc_id,
            'image/fake' AS media_type,
            CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
            md5(text) AS payload_md5
        FROM documents
        ORDER BY doc_id
    """,
    doc="multimodal metadata plumbing: binary payload + typed metadata struct (decode stubbed).",
    tags=("multimodal",),
)
def q60_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    with_media = attach_payload(t["documents"])
    return (
        with_media.select(
            "doc_id",
            F.col("media_meta.media_type").alias("media_type"),
            F.col("media_meta.n_bytes").alias("n_bytes"),
            F.col("media_meta.md5").alias("payload_md5"),
        )
        .orderBy("doc_id")
    )
