"""Structured Streaming surface: watermarked windowed rollup over the
events stream.

The reference is strictly batch (SURVEY.md §2.8); this exists for the
training-pipeline capability set. Batch/stream parity: the streaming
aggregation uses the same (window, event_type) grouping as
operators/events.hourly_rollup, so a backfill (batch) and the live stream
produce unionable outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def streaming_hourly_rollup(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """readStream over a parquet directory → watermarked windowed agg.

    Late events beyond `watermark` are dropped; state for closed windows
    is evicted — bounded memory at any stream length."""
    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 3).alias("sum_value"))
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_available_now(result: DataFrame, query_name: str = "rollup") -> list:
    """Drain everything currently available into an in-memory sink and
    return the rows (test/backfill harness)."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result.sparkSession.sql(f"SELECT * FROM {query_name}").collect()
