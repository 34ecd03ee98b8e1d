"""Driver-gate drains of the streaming surface (VERDICT r2 #4).

Each function stages the driver's parquet table as a file-stream source
in a temp directory, runs the real Structured Streaming query with
trigger(availableNow), and returns the drained result as a STATIC
DataFrame whose value is deterministic and equal to the batch operator's
semantics — so the batch operators' DuckDB oracles apply verbatim and
the streaming surface gets rows+schema+hash coverage at the driver gate
instead of pytest-only parity.

Determinism notes:
  * rollup/sessionize drains stage ONE source file: the watermark then
    closes a fixed set of windows and the batch-tail closure
    (streaming ∪ batch anti-join) fills exactly the rest — the union is
    the batch result row-for-row regardless of what closed.
  * the geocode drain stages multiple files (real multi-batch run): each
    point's match depends only on the static roads side, so the union of
    per-batch outputs is batching-independent.
  * the dedup drain returns the distinct suppressed-key set: WHICH
    arrival is emitted per key depends on batch order, but the key set
    within the watermark horizon does not.
"""

from __future__ import annotations

import itertools
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tmpdir_removed_at_exit as _tmpdir_removed_at_exit
from .rollup import EVENTS_STREAM_SCHEMA, backfill_hourly_rollup, run_available_now

_SEQ = itertools.count()


def _uniq(prefix: str) -> str:
    return f"{prefix}_{os.getpid()}_{next(_SEQ)}"


from contextlib import contextmanager


@contextmanager
def _stream_shuffle(spark: SparkSession, *src_dirs: str, target_bytes: int = 32 << 20):
    """Size the STATEFUL drains' shuffle partitions to the staged stream
    volume instead of the batch session default.

    Every stateful streaming operator instantiates one state store PER
    shuffle partition per operator, each with its own delta/commit file
    I/O per micro-batch — fixed cost that scales with the partition
    count, not the data (r7 measurement, guide §1/§2: the stream-stream
    interval-join drain took 5.9 s at 32 partitions vs 2.4 s at 8 on the
    SAME input, and a ZERO-ROW drain took 3.5 s vs 1.8 s). Partitions
    here derive from staged source bytes (~target_bytes of input per
    state partition, floor 8) so the setting is scale-adaptive: tiny
    gate stages get the floor, a corpus-scale stream grows back to the
    session value. The session conf is restored on exit; results are
    partitioning-invariant."""
    size = 0
    for sd in src_dirs:
        try:
            for f in os.listdir(sd):
                size += os.path.getsize(os.path.join(sd, f))
        except OSError:
            pass
    cur = spark.conf.get("spark.sql.shuffle.partitions")
    n = max(8, min(int(cur), -(-size // target_bytes)))
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", cur)


def _stage_copy(src_file: str, prefix: str) -> str:
    """Stage one parquet file as a single-file stream-source directory."""
    d = _tmpdir_removed_at_exit(prefix)
    src = os.path.join(d, "src")
    os.makedirs(src, exist_ok=True)
    shutil.copy(src_file, os.path.join(src, "part-0.parquet"))
    return src


def drained_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """availableNow drain of the watermarked windowed rollup + batch-tail
    closure; equals operators/events.hourly_rollup exactly. Emitted with
    epoch-micros hours (the r1 sessionize lesson: integer micros are the
    hash-stable cross-engine timestamp form)."""
    src = _stage_copy(f"{sf_dir}/events.parquet", "rg_sgate_roll_")
    with _stream_shuffle(spark, src):
        out = backfill_hourly_rollup(spark, src, query_name=_uniq("rollup_gate"))
    return out.select(
        F.unix_micros("hour").alias("hour_us"), "event_type", "n", "sum_value"
    )


ORACLE_STREAM_HOURLY_ROLLUP = (
    "SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS hour_us, "
    "event_type, count(*) AS n, round(sum(value), 3) AS sum_value "
    "FROM events GROUP BY 1, 2"
)


def drained_sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """availableNow drain of a native session_window aggregation + batch
    tail, renumbered per user — equals operators/events.sessionize.

    session_window merges events with gap < duration (strict), while the
    batch rule keeps gap <= 30 min in-session; the extra microsecond
    makes the two rules identical at Spark's microsecond timestamp
    resolution."""
    from ..operators.events import sessionize

    src = _stage_copy(f"{sf_dir}/events.parquet", "rg_sgate_sess_")
    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(src)
    )
    res = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(
            "user_id",
            F.session_window("ts", f"{gap_minutes} minutes 1 microseconds"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_micros("ts")).alias("started"),
            F.max(F.unix_micros("ts")).alias("ended"),
        )
        .select("user_id", "n_events", "started", "ended")
    )
    with _stream_shuffle(spark, src):
        rows = run_available_now(res, query_name=_uniq("sess_gate"))
    streamed = spark.createDataFrame(
        rows, "user_id long, n_events bigint, started long, ended long"
    )
    batch = sessionize(spark.read.parquet(src), gap_minutes=gap_minutes).drop(
        "session_idx"
    )
    tail = batch.join(
        streamed.select("user_id", "started"), ["user_id", "started"], "left_anti"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("started")
    return (
        streamed.unionByName(tail)
        .withColumn("session_idx", F.row_number().over(w).cast("long"))
        .select("user_id", "session_idx", "n_events", "started", "ended")
    )


def drained_geocode_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-batch availableNow run of the foreachBatch geocode enrichment
    (streaming/geocode.py) over the derived address points; the union of
    idempotent per-batch outputs equals the batch matcher."""
    from .. import datagen
    from ..operators import roadgrinder as rg
    from .geocode import read_streamed_matches, streaming_geocode_match

    d = _tmpdir_removed_at_exit("rg_sgate_geo_")
    src, out_dir, ckpt = (os.path.join(d, x) for x in ("src", "out", "ckpt"))
    pnts = datagen.derive_addrpnts(spark, sf_dir)
    (
        pnts.select(
            "objectid", "AddSystem", "AddNum", "StreetName", "StreetType",
            "SuffixDir", "PrefixDir", "px", "py",
        )
        .repartition(3, "objectid")
        .write.mode("overwrite")
        .parquet(src)
    )
    # r7, measured twice (guide §1): the per-batch cost of the static
    # side is BROADCAST-BUILD dominated, not recompute dominated — a
    # parquet dimension (accurate small stats → broadcast per batch)
    # made the drain SLOWER than the lazy CTE (5.7 s vs 3.5 s stream
    # run), and the winner of the 4-way A/B is persist + the
    # signature-shuffle plan (2.7 s vs 4.1 s lazy per drain): computed
    # once per drain from the sf inputs, no broadcast rebuild per batch,
    # dropped before returning (outputs are already materialized in the
    # sink's parquet).
    from pyspark import StorageLevel

    gcr = (
        rg.explode_aliases(datagen.derive_roads(spark, sf_dir))
        .geocode_roads.persist(StorageLevel.MEMORY_AND_DISK)
    )
    gcr.count()
    try:
        q = streaming_geocode_match(
            spark, src, gcr, out_dir, ckpt, max_files_per_trigger=2,
            shuffle_sides=True,
        )
        q.awaitTermination()
    finally:
        gcr.unpersist()
    return read_streamed_matches(spark, out_dir).select(
        "point_id", "road_gid", "side"
    )


def drained_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """availableNow drain of the watermark-bounded streaming dedup over a
    two-file (multi-batch) doc stream; all synthetic timestamps sit
    inside the watermark horizon, so the emitted key set is exactly the
    distinct md5 set (cross-batch duplicates suppressed by state)."""
    from .dedup import streaming_exact_dedup

    d = _tmpdir_removed_at_exit("rg_sgate_dd_")
    src = os.path.join(d, "src")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    (
        docs.select(
            "doc_id",
            "text",
            F.timestamp_seconds(
                F.lit(1700000000) + F.col("doc_id") % 3600
            ).alias("ts"),
        )
        .repartition(2, "doc_id")
        .write.mode("overwrite")
        .parquet(src)
    )
    res = streaming_exact_dedup(spark, src, watermark="2 hours")
    with _stream_shuffle(spark, src):
        rows = run_available_now(res, query_name=_uniq("dedup_gate"))
    emitted = spark.createDataFrame(
        [(r["text_md5"],) for r in rows], "text_md5 string"
    )
    return emitted.distinct()


ORACLE_STREAM_EXACT_DEDUP = "SELECT DISTINCT md5(text) AS text_md5 FROM documents"


def drained_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """availableNow drain of a watermarked STREAM-STREAM interval join —
    each purchase joined to the same user's clicks in the preceding hour
    (the attribution-window join). Single-file staging keeps the run one
    micro-batch, so the watermark never advances mid-run and no state is
    dropped: the drained output equals the batch interval join exactly,
    and the batch oracle applies verbatim."""
    src = _stage_copy(f"{sf_dir}/events.parquet", "rg_sgate_ij_")

    def side(event_type: str, prefix: str):
        return (
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 4)
            .parquet(src)
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "4 hours")
        )

    l, r = side("purchase", "l"), side("click", "r")
    joined = l.join(
        r,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("r_ts") <= F.col("l_ts")),
        "inner",
    ).select(
        F.col("l_id").alias("purchase_id"),
        F.col("r_id").alias("click_id"),
        F.col("l_user").alias("user_id"),
        F.unix_micros("l_ts").alias("purchase_us"),
        F.unix_micros("r_ts").alias("click_us"),
    )
    with _stream_shuffle(spark, src):
        rows = run_available_now(joined, query_name=_uniq("ij_gate"))
    return spark.createDataFrame(
        rows,
        "purchase_id long, click_id long, user_id long, "
        "purchase_us long, click_us long",
    )


def drained_tile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-batch availableNow run of STREAMING incremental tile
    refresh — the production shape for a continuously-updating density
    raster (heatmap tiles over an arriving point feed): each micro-batch
    aggregates its points to partial per-cell counts via foreachBatch
    (idempotent parquet sink keyed by batch id, checkpointed), and the
    serving merge is an additive sum by cell. Counts are additive, so
    partial(b1) + partial(b2) + ... equals the batch rasterize EXACTLY,
    independent of how the files were batched — the batch
    rasterize_points oracle applies verbatim.

    Scale: per-batch state is one map-side-combined aggregate over the
    batch (no global state store — the raster IS the accumulated sink),
    and the merge is a sum over rasters, thousands× smaller than the
    points."""
    from .. import datagen
    from ..spatial.raster import rasterize_points

    d = _tmpdir_removed_at_exit("rg_sgate_tile_")
    src, out_dir, ckpt = (os.path.join(d, x) for x in ("src", "out", "ckpt"))
    pnts = datagen.derive_addrpnts(spark, sf_dir)
    (
        pnts.select("objectid", "px", "py")
        .repartition(3, "objectid")
        .write.mode("overwrite")
        .parquet(src)
    )
    stream = (
        spark.readStream.schema("objectid long, px double, py double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def write_partial(batch_df: DataFrame, batch_id: int) -> None:
        # overwrite-by-batch-id directory => re-run of a batch after a
        # checkpoint recovery replaces rather than double-counts
        (
            rasterize_points(batch_df)
            .select("cx", "cy", "n")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch_id={batch_id}"))
        )

    q = (
        stream.writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from ..spatial.cells import pack_cell

    partials = spark.read.parquet(out_dir)
    return (
        partials.groupBy("cx", "cy")
        .agg(F.sum("n").alias("n"))
        .select(
            pack_cell(F.col("cx"), F.col("cy")).alias("cell"), "cx", "cy", "n"
        )
    )


ORACLE_STREAM_INTERVAL_JOIN = """
SELECT l.event_id AS purchase_id, r.event_id AS click_id,
       l.user_id,
       CAST(epoch_us(l.ts) AS BIGINT) AS purchase_us,
       CAST(epoch_us(r.ts) AS BIGINT) AS click_us
FROM events l JOIN events r
  ON l.event_type = 'purchase' AND r.event_type = 'click'
 AND r.user_id = l.user_id
 AND r.ts >= l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts"""
