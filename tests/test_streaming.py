"""Structured Streaming rollup: batch/stream parity on closed windows."""

from __future__ import annotations

import pytest

from roadgrinder_spark.operators.events import hourly_rollup
from roadgrinder_spark.streaming.rollup import run_available_now, streaming_hourly_rollup

from .conftest import SF_DIR


def test_stream_rollup_matches_batch_closed_windows(spark, tmp_path_factory):
    # readStream sources are directories of files
    src_dir = tmp_path_factory.mktemp("events_stream")
    import shutil

    shutil.copy(f"{SF_DIR}/events.parquet", src_dir / "part-0.parquet")
    src = str(src_dir)
    result = streaming_hourly_rollup(spark, src, watermark="2 hours")
    rows = run_available_now(result, query_name="rollup_t")
    got = {(r["hour"], r["event_type"]): (r["n"], r["sum_value"]) for r in rows}
    assert got, "stream emitted nothing"

    batch = hourly_rollup(spark.read.parquet(f"{SF_DIR}/events.parquet")).collect()
    batch_map = {(r["hour"], r["event_type"]): (r["n"], r["sum_value"]) for r in batch}
    # every emitted (closed) window must match batch exactly
    for key, val in got.items():
        assert batch_map[key] == val
    # emitted windows are those older than max(ts) - watermark
    assert len(got) > 0.5 * len(batch_map)


def test_backfill_rollup_full_batch_parity(spark, tmp_path_factory):
    """streaming ∪ batch-tail backfill equals the batch rollup exactly —
    the append-mode tail-window gap is closed (ADVICE r1)."""
    import shutil

    from roadgrinder_spark.streaming.rollup import backfill_hourly_rollup

    src_dir = tmp_path_factory.mktemp("events_backfill")
    shutil.copy(f"{SF_DIR}/events.parquet", src_dir / "part-0.parquet")
    full = backfill_hourly_rollup(spark, str(src_dir)).collect()
    got = {(r["hour"], r["event_type"]): (r["n"], r["sum_value"]) for r in full}
    batch = hourly_rollup(spark.read.parquet(f"{SF_DIR}/events.parquet")).collect()
    want = {(r["hour"], r["event_type"]): (r["n"], r["sum_value"]) for r in batch}
    assert got == want


def test_stateful_sessionize_matches_batch(spark, tmp_path_factory):
    """applyInPandasWithState gap sessions: once all state times out, the
    closed-session set equals the batch sessionize result."""
    import shutil
    import time

    from roadgrinder_spark.operators.events import sessionize
    from roadgrinder_spark.streaming.rollup import streaming_sessionize

    src_dir = tmp_path_factory.mktemp("events_state")
    shutil.copy(f"{SF_DIR}/events.parquet", src_dir / "part-0.parquet")
    res = streaming_sessionize(spark, str(src_dir), state_timeout_ms=2000)
    q = (
        res.writeStream.format("memory").queryName("sess_state")
        .outputMode("append").trigger(processingTime="1 second").start()
    )
    batch = sessionize(spark.read.parquet(f"{SF_DIR}/events.parquet")).collect()
    # batch sessionize emits epoch-micros BIGINT (driver-oracle contract);
    # the streaming op keeps timestamps — normalize to micros for compare.
    def _us(t):
        import datetime

        return (t.replace(tzinfo=None) - datetime.datetime(1970, 1, 1)) // datetime.timedelta(
            microseconds=1
        )

    want = {(b["user_id"], b["started"], b["ended"], b["n_events"]) for b in batch}
    deadline = time.time() + 120
    got = set()
    try:
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM sess_state").collect()
            got = {
                (r["user_id"], _us(r["started"]), _us(r["ended"]), r["n_events"])
                for r in rows
            }
            if len(got) >= len(want):
                break
            time.sleep(2)
    finally:
        q.stop()
    assert got == want


def test_streaming_geocode_matches_batch_and_resumes(spark, tmp_path_factory):
    """foreachBatch streaming geocode: (1) full availableNow drain equals
    the batch matcher row-for-row; (2) restart from checkpoint processes
    ONLY newly-arrived files and the union equals the bigger batch run."""
    from roadgrinder_spark import datagen
    from roadgrinder_spark.operators import roadgrinder as rg
    from roadgrinder_spark.spatial.join import geocode_match
    from roadgrinder_spark.streaming.geocode import (
        POINTS_STREAM_SCHEMA,
        read_streamed_matches,
        streaming_geocode_match,
    )

    base = tmp_path_factory.mktemp("stream_geocode")
    src, out, ckpt = str(base / "src"), str(base / "out"), str(base / "ckpt")
    roads = datagen.derive_roads(spark, SF_DIR)
    gcr = rg.explode_aliases(roads).geocode_roads
    pnts = datagen.derive_addrpnts(spark, SF_DIR).select(
        *[f.name for f in POINTS_STREAM_SCHEMA.fields]
    )
    first = pnts.filter(pnts.objectid % 2 == 0)
    second = pnts.filter(pnts.objectid % 2 == 1)
    first.coalesce(2).write.mode("overwrite").parquet(src)

    q = streaming_geocode_match(spark, src, gcr, out, ckpt)
    q.awaitTermination()
    got = {tuple(r) for r in read_streamed_matches(spark, out).drop("batch").collect()}
    want = {tuple(r) for r in geocode_match(first, gcr).collect()}
    assert got == want and len(got) > 0

    # arrive more files, resume from checkpoint
    second.coalesce(2).write.mode("append").parquet(src)
    q2 = streaming_geocode_match(spark, src, gcr, out, ckpt)
    q2.awaitTermination()
    got_all = {
        tuple(r) for r in read_streamed_matches(spark, out).drop("batch").collect()
    }
    want_all = {tuple(r) for r in geocode_match(pnts, gcr).collect()}
    assert got_all == want_all and len(got_all) > len(got)


def test_streaming_exact_dedup_suppresses_in_horizon_dups(spark, tmp_path_factory):
    """dropDuplicatesWithinWatermark dedup: planted duplicates inside the
    watermark horizon are emitted once; distinct texts all pass through."""
    import datetime

    from roadgrinder_spark.streaming.dedup import streaming_exact_dedup

    src = tmp_path_factory.mktemp("docs_stream")
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    for i in range(50):
        rows.append((i, f"text body {i}", base + datetime.timedelta(minutes=i)))
    # duplicates of texts 0..9, 5 minutes after the originals
    for i in range(10):
        rows.append((1000 + i, f"text body {i}", base + datetime.timedelta(minutes=i + 5)))
    spark.createDataFrame(
        rows, "doc_id long, text string, ts timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(str(src))

    res = streaming_exact_dedup(spark, str(src))
    q = (
        res.writeStream.format("memory").queryName("dedup_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM dedup_stream").collect()
    md5s = [r["text_md5"] for r in got]
    assert len(md5s) == 50 and len(set(md5s)) == 50  # one per distinct text
    assert all(r["doc_id"] < 1000 for r in got)  # originals won, dups dropped


def test_gate_drains_match_batch(spark):
    """Driver-gate streaming drains (streaming/gate.py) equal their batch
    operators exactly — session_window boundary semantics included."""
    from roadgrinder_spark.operators.events import hourly_rollup, sessionize
    from roadgrinder_spark.streaming import gate
    from pyspark.sql import functions as F

    sf = SF_DIR
    got = gate.drained_sessionize(spark, sf)
    want = sessionize(spark.read.parquet(f"{sf}/events.parquet"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    got_r = gate.drained_hourly_rollup(spark, sf)
    want_r = hourly_rollup(spark.read.parquet(f"{sf}/events.parquet")).select(
        F.unix_micros(F.col("hour").cast("timestamp")).alias("hour_us"),
        "event_type", "n", "sum_value",
    )
    assert sorted(map(tuple, got_r.collect())) == sorted(map(tuple, want_r.collect()))

    got_d = gate.drained_exact_dedup(spark, sf)
    n_distinct = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select(F.md5("text")).distinct().count()
    )
    assert got_d.count() == n_distinct
