"""Driver-gate parity for the TAIL queries() entries.

The grading driver records correctness rows for the first GATE_WINDOW
(=50) entries only; this suite re-runs the driver's exact compare
(order-insensitive full-frame equality vs the DuckDB oracle) over every
entry PAST the window, so the whole 77-query surface keeps an
oracle-exact check each round — 50 at the driver, the rest here.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

from .conftest import SF_DIR, assert_frames_match


def _tail_names() -> list[str]:
    return list(entry_mod.queries())[entry_mod.GATE_WINDOW :]


def test_window_layout():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert len(q) == 77
    missing = [k for k in q if k not in o]
    assert not missing, f"queries without oracle SQL: {missing}"
    window = list(q)[: entry_mod.GATE_WINDOW]
    # the entries VERDICT r3 flagged as never-checked must sit inside the
    # driver's window this round
    for k in (
        "sessionize", "top_users", "events_cube", "stream_hourly_rollup",
        "stream_sessionize", "stream_geocode_match", "stream_exact_dedup",
        "media_features", "media_resize", "media_frame_sample",
        "tile_pyramid",
    ):
        assert k in window, f"{k} fell out of the driver gate window"


@pytest.mark.parametrize("name", _tail_names())
def test_tail_entry_matches_oracle(name, spark, duck):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sdf = fn(spark, SF_DIR)
    assert_frames_match(sdf, duck.sql(sql).df(), name)
