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
