"""Streaming exact deduplication over a document stream.

The training-pipeline counterpart of operators/dedup.dedup_exact for
continuous ingestion (web crawl / feed): duplicates are identified by
md5(text) and suppressed with BOUNDED state via
`dropDuplicatesWithinWatermark` — a key's state is evicted once the
event-time watermark passes its ts + delay, so state size follows the
duplicate-arrival horizon, not the stream length. A duplicate arriving
later than the watermark horizon is re-emitted (by design: at crawl
scale, horizon-windowed dedup + a periodic batch compaction with
dedup_exact is the standard split).

Scale notes: state is keyed by the 128-bit digest only (not the text),
RocksDB-backed on a real cluster; the md5 projection and watermark run
JVM-side — no Python in the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DOCS_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def streaming_exact_dedup(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "2 hours",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """readStream → md5 key → watermark-bounded duplicate suppression.
    Returns the streaming DataFrame (doc_id, text_md5, ts): first
    occurrence of each text within the watermark horizon."""
    stream = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    return (
        stream.withColumn("text_md5", F.md5("text"))
        .select("doc_id", "text_md5", "ts")
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["text_md5"])
    )
