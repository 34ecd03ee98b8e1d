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


def backfill_hourly_rollup(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "2 hours",
    query_name: str = "rollup_backfill",
) -> DataFrame:
    """Complete backfill = streaming rollup ∪ batch tail (ADVICE r1).

    In append mode under trigger(availableNow), windows not yet closed by
    the watermark are NEVER emitted — the tail hours of a backfill are
    silently missing from the pure streaming result. This harness drains
    the stream, then fills exactly the missing (hour, event_type) groups
    from a batch rollup over the same source (anti-join keeps the
    streaming rows authoritative). Result equals the batch rollup
    row-for-row as long as no event arrived later than `watermark` out of
    order (the streaming test asserts emitted windows already match
    batch values)."""
    from ..operators.events import hourly_rollup

    streamed_rows = run_available_now(
        streaming_hourly_rollup(spark, source_dir, watermark=watermark),
        query_name=query_name,
    )
    streamed = spark.createDataFrame(
        streamed_rows,
        "hour timestamp, event_type string, n bigint, sum_value double",
    )
    batch = hourly_rollup(spark.read.parquet(source_dir)).withColumn(
        "hour", F.col("hour").cast("timestamp")  # parquet NTZ -> stream LTZ dtype
    )
    tail = batch.join(
        streamed.select("hour", "event_type"), ["hour", "event_type"], "left_anti"
    )
    return streamed.unionByName(tail)


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


# ---------------------------------------------------------------------------
# custom stateful streaming operator: gap sessionization with
# applyInPandasWithState (timeout-driven session close)
# ---------------------------------------------------------------------------

def streaming_sessionize(
    spark: SparkSession, source_dir: str, gap_minutes: int = 30,
    state_timeout_ms: int = 60_000,
):
    """Per-user gap sessions over the event stream, closed via processing-
    time timeout — the canonical applyInPandasWithState shape. Emits one
    row per CLOSED session (user_id, n_events, started, ended).

    Note: with ProcessingTimeTimeout the query does NOT self-terminate
    under trigger(availableNow) — timeouts need further (empty)
    micro-batches to fire. Callers poll the sink and stop() when the
    session count stabilizes (see tests) or run continuously in prod."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("started", TimestampType()),
            StructField("ended", TimestampType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n_events", LongType()),
            StructField("started_ns", LongType()),
            StructField("ended_ns", LongType()),
        ]
    )
    gap_ns = gap_minutes * 60 * 1_000_000_000

    def update(key, pdfs, state: GroupState):
        import pandas as pd  # noqa: F811 — runs on workers

        (user_id,) = key
        closed = []
        if state.hasTimedOut:
            n, s_ns, e_ns = state.get
            closed.append((user_id, n, s_ns, e_ns))
            state.remove()
        else:
            n, s_ns, e_ns = (state.get if state.exists else (0, None, None))
            # a group's rows may span several Arrow chunks in one micro-
            # batch: concatenate, THEN sort — per-chunk sorting would
            # corrupt session boundaries for large groups
            chunks = [pdf["ts"] for pdf in pdfs]
            all_ts = pd.concat(chunks) if chunks else pd.Series([], dtype="datetime64[ns]")
            if len(all_ts):
                ts_ns = all_ts.astype("int64").sort_values()
                for t in ts_ns:
                    t = int(t)
                    if e_ns is not None and t - e_ns > gap_ns:
                        closed.append((user_id, n, s_ns, e_ns))
                        n, s_ns = 0, None
                    if s_ns is None:
                        s_ns = t
                    n += 1
                    e_ns = t
            state.update((n, s_ns, e_ns))
            state.setTimeoutDuration(state_timeout_ms)
        if closed:
            df = pd.DataFrame(
                closed, columns=["user_id", "n_events", "started_ns", "ended_ns"]
            )
            yield pd.DataFrame(
                {
                    "user_id": df["user_id"],
                    "n_events": df["n_events"],
                    "started": pd.to_datetime(df["started_ns"], unit="ns"),
                    "ended": pd.to_datetime(df["ended_ns"], unit="ns"),
                }
            )

    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    return (
        stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
