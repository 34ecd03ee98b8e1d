"""Multimodal span processing: decode / feature-extract over opaque media
references, as Arrow-batched mapInPandas stages.

Image/audio decode libraries are NOT available in this container, so the
decode kernel is STUBBED (clearly marked below) with a deterministic fake:
feature vector = bytes of md5(media_ref) scaled to [0,1). Everything
around the stub — schema, batch iteration, partitioning, UDF signature —
is the real Spark plumbing a production decode would use; swapping the
fake for PIL/ffmpeg is a one-function change.

Scale notes: media decode is CPU-heavy and embarrassingly parallel —
mapInPandas keeps it off the driver, Arrow batches amortize serde, and
`repartition(n)` before the map sizes tasks to decode cost rather than
input bytes. Binary payloads stay opaque `binary`/ref columns; only
derived features enter downstream shuffles.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _decode_stub(refs: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """STUB — deterministic fake decode (no image libs in this container).

    Real implementation would fetch the blob and run PIL/ffmpeg here.
    Returns (width, height, features[16]) derived from md5(ref) so tests
    are reproducible. Raises nothing; empty refs get zeros.
    """
    n = len(refs)
    feats = np.zeros((n, 16), dtype=np.float32)
    w = np.zeros(n, dtype=np.int32)
    h = np.zeros(n, dtype=np.int32)
    digests = np.frombuffer(
        b"".join(hashlib.md5(r.encode("utf-8")).digest() for r in refs.fillna("")),
        dtype=np.uint8,
    ).reshape(n, 16) if n else np.zeros((0, 16), np.uint8)
    if n:
        feats = (digests.astype(np.float32) / 256.0)
        w = 64 + (digests[:, 0].astype(np.int32) % 64) * 16
        h = 64 + (digests[:, 1].astype(np.int32) % 64) * 16
    return w, h, feats


def extract_media_features(docs: DataFrame, partitions: int | None = None) -> DataFrame:
    """documents(spans) → one feature row per media span.

    explode (JVM) → repartition to decode-sized tasks → Arrow-batched
    mapInPandas decode."""
    media = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .filter((F.col("s.kind") == "media") & (F.col("s.media_ref") != ""))
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
    )
    if partitions:
        media = media.repartition(partitions)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, feats = _decode_stub(pdf["media_ref"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_ref": pdf["media_ref"].values,
                    "width": w,
                    "height": h,
                    "features": list(feats),
                }
            )

    return media.mapInPandas(decode, schema=MEDIA_FEATURES_SCHEMA)
