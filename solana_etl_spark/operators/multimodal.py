"""Multimodal column plumbing (charter §2.11): opaque ``binary`` payloads +
typed metadata, with decode / feature-extraction stages as Arrow-batched
Pandas UDFs over ``mapInPandas``.

The container has no image/audio codecs, so the decode kernel is STUBBED
(deterministic fake features; a real deployment swaps `_decode_stub` for
PIL/ffmpeg). Everything Spark-side — schema, batch shape, partitioning,
UDF signature — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("meta_source", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapt the documents table into a binary-payload media table (utf-8
    payload + metadata) — the plumbing a real image/audio corpus uses."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.col("source").alias("meta_source"),
    )


def binary_metadata(documents: DataFrame) -> DataFrame:
    """Pure-SQL metadata over the binary payload (no UDF): byte length and
    content hash — the cheap pre-filter stage before any decode."""
    media = documents_as_media(documents)
    return media.select(
        "media_id",
        "mime",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """STUB decode kernel. Deterministic fake dimensions derived from the
    payload; a real deployment replaces this with an image/audio decoder.

    Raises NotImplementedError for mimes we would never fake.
    """
    if payload is None:
        raise NotImplementedError("no payload")
    return (len(payload) % 640 + 1, len(payload) % 480 + 1)


def extract_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched decode/feature stage via ``mapInPandas`` — the canonical
    shape for Python-side media kernels: batches stream through Arrow, rows
    never materialize one-by-one, and the output schema is declared."""
    import hashlib

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "content_md5": [
                        hashlib.md5(p).hexdigest() for p in pdf["payload"]
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return media.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)
