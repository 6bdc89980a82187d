"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata (driver north star; SURVEY.md §2.9).

The Spark-side plumbing — schema, Arrow batch shape, partition-parallel
decode via ``mapInPandas`` — is real and tested. The actual
codec step is stubbed (image/audio libraries are not in this
container): ``decode_stub='fake'`` derives deterministic pseudo-
metadata from the bytes so pipelines are testable end-to-end;
``decode_stub='error'`` raises ``NotImplementedError`` at the exact
point a real decoder (PIL/ffmpeg/torchaudio) would plug in.
"""

from __future__ import annotations

from collections.abc import Iterator

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

# canonical multimodal record: opaque payload + typed envelope
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_payload(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Build a media table from any source column by treating its UTF-8
    bytes as the opaque payload (what a real ingest would read from
    object storage)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(text_col).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def decode_media(df: DataFrame, decode_stub: str = "fake") -> DataFrame:
    """Partition-parallel 'decode': Arrow-batched ``mapInPandas`` with
    the production batch shape. Swap ``_fake_decode`` for a real codec
    to productionize — nothing else changes."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if decode_stub == "error":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not available in "
                    "this container; plug the codec in here"
                )
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            # deterministic fake: dimensions derived from byte content
            first = payloads.map(lambda b: (b[0] if len(b) else 0))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": (16 + (n_bytes % 64)).astype("int32"),
                    "height": (16 + (first.astype("int64") % 64)).astype("int32"),
                    "n_frames": pd.Series([1] * len(pdf), dtype="int32"),
                }
            )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)
