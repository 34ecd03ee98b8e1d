"""Streaming spatial enrichment: geocode-match a live address-point
stream against the static geocode-roads relation.

Why foreachBatch and not a plain stream-static join: the matcher ends in
a per-point top-1 AGGREGATE (nearest segment), and an unwatermarked
streaming aggregate would keep unbounded state. Every candidate for a
point arrives in the point's own micro-batch (the roads side is static),
so per-batch batch-semantics are exact — the canonical Structured
Streaming shape for stream-vs-static enrichment with non-trivial plans.

Exactly-once: each micro-batch OVERWRITES its own `batch=<id>` output
directory. Offsets commit to the checkpoint AFTER the sink call, so a
crash between write and commit replays the same batchId into the same
directory — idempotent. Resuming from the checkpoint processes only
unseen source files (pytest drives stop → append files → restart).

Scale notes: the static side is re-used across batches (cache it for a
long-running query); per-batch work is the same broadcast-hash-join plan
as the batch matcher, so throughput follows the batch numbers at
micro-batch granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: address-point stream schema (matches the derived addrpnts relation's
#: geocode-relevant columns)
POINTS_STREAM_SCHEMA = StructType(
    [
        StructField("objectid", LongType()),
        StructField("AddSystem", StringType()),
        StructField("AddNum", StringType()),
        StructField("StreetName", StringType()),
        StructField("StreetType", StringType()),
        StructField("SuffixDir", StringType()),
        StructField("PrefixDir", StringType()),
        StructField("px", DoubleType()),
        StructField("py", DoubleType()),
    ]
)


def streaming_geocode_match(
    spark: SparkSession,
    source_dir: str,
    geocode_roads: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
    shuffle_sides: bool = False,
):
    """Start (availableNow) a streaming geocode enrichment; returns the
    StreamingQuery. Output parquet under out_dir/batch=<id>/.

    shuffle_sides passes through to geocode_match: with a persisted
    static side its accurate (small) stats make the planner broadcast
    it, and rebuilding that broadcast hash relation in EVERY micro-batch
    measured strictly slower than the signature-shuffle plan (r7 4-way
    A/B: persist+shuffle_sides 2.7 s vs persist-broadcast 3.7 s vs lazy
    4.1 s per drain at sf0.1) — the same per-batch-broadcast cost the
    batch matcher's knn_join documented at round 1."""
    from ..spatial.join import geocode_match

    static_roads = geocode_roads

    stream = (
        spark.readStream.schema(POINTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        matched = geocode_match(batch_df, static_roads, shuffle_sides=shuffle_sides)
        # idempotent per-batch overwrite => exactly-once under replays
        matched.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_streamed_matches(spark: SparkSession, out_dir: str) -> DataFrame:
    """Union of all committed batch outputs."""
    return spark.read.option("basePath", out_dir).parquet(f"{out_dir}/batch=*")
