"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features / NotImplementedError for real codecs) —
but the Spark-side plumbing is real: binary columns, metadata structs,
Arrow-batched ``mapInPandas`` with an explicit output schema, and
partition-count-preserving execution. Swapping the stub for PIL/ffmpeg
changes one function body, not the plan.

Scale notes: payload bytes ride the shuffle only if you shuffle them —
feature extraction is mapInPandas over the scan partitioning (no
shuffle); metadata-only queries prune the binary column at the parquet
scan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Output contract of the feature-extraction stage.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_length", LongType()),
        StructField("checksum_md5", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_fake_payload(docs: DataFrame) -> DataFrame:
    """Attach a deterministic binary payload + typed metadata to each
    document row (stands in for real image/audio/video bytes). The
    payload is the utf-8 encoding of the text; media type and fake
    dimensions derive from doc_id."""
    media = (
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").cast(BinaryType()).alias("payload"),
        F.struct(
            media.alias("media_type"),
            (F.col("doc_id") % 1920 + 1).cast("int").alias("width"),
            (F.col("doc_id") % 1080 + 1).cast("int").alias("height"),
            (F.col("doc_id") % 24 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """Real codec hook — intentionally unimplemented in this container
    (no PIL/libjpeg). Replace with e.g. PIL.Image.open(io.BytesIO(b))."""
    raise NotImplementedError("image decoding requires a codec library (e.g. PIL)")


#: Keep in lockstep with textops.portable_hash31 / sql_portable_hash31.
_HASH_P = 2_147_483_647


def _payload_checksum(b: bytes) -> int:
    """Payload checksum over raw bytes — the md5-derived 31-bit hash
    every engine can reproduce (DuckDB:
    ('0x' || substr(md5(x), 1, 8))::BIGINT % P), which is what makes
    the pandas decode stage's output oracle-checkable."""
    return int(hashlib.md5(b).hexdigest()[:8], 16) % _HASH_P


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-Arrow-batch feature extraction (runs on executors). The
    deterministic stand-ins (byte length, md5 checksum, metadata
    passthrough) occupy the exact seam a real decoder would."""
    payloads = pdf["payload"]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].astype("int64"),
            "media_type": pdf["meta"].map(lambda m: m["media_type"]),
            "byte_length": payloads.map(len).astype("int64"),
            "checksum_md5": payloads.map(_payload_checksum).astype("int64"),
            "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
            "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
            "n_frames": pdf["meta"].map(lambda m: m["n_frames"]).astype("int32"),
        }
    )


def extract_features(with_payload: DataFrame, batch_size: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over the multimodal column —
    the mapInPandas pattern for any decode/resize/frame-sample stage.
    Preserves the input partitioning (no shuffle)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _extract_batch(pdf)

    return with_payload.mapInPandas(gen, FEATURE_SCHEMA)


def frame_sample(with_payload: DataFrame, every_n: int = 6) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled frame index (the decode of the frame itself is the stub).
    posexplode keeps it JVM-side until a real decoder exists."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n)
    )
    return (
        with_payload.filter(F.col("meta.media_type") == "video/mp4")
        .select("doc_id", F.explode(frames).alias("frame_index"))
    )
