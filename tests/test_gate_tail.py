"""Driver-gate parity for the TAIL queries() entries.

The grading driver records correctness rows for the first GATE_WINDOW
(=50) entries only; this suite re-runs the driver's exact compare
(order-insensitive full-frame equality vs the DuckDB oracle) over every
entry PAST the window, so the whole query surface keeps an
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
    missing = [k for k in q if k not in o]
    assert not missing, f"queries without oracle SQL: {missing}"
    # GATE_HISTORY is DERIVED from the committed CORRECTNESS_r*.json
    # artifacts at import (round 6, VERDICT r5 #7) — re-derive it here
    # independently and assert equality, so a loader regression or a
    # missing artifact can't silently mis-rotate the window.
    assert entry_mod.GATE_HISTORY == entry_mod._load_gate_history()
    assert entry_mod.GATE_HISTORY, "no CORRECTNESS artifacts found"
    # history keys not registered as queries must be exactly the
    # documented retirements — an accidentally dropped entry would show
    # up here, not vanish quietly
    gone = set(entry_mod.GATE_HISTORY) - set(q)
    assert gone == set(entry_mod.RETIRED_VARIANTS), (
        f"gate entries missing without a documented retirement: "
        f"{gone - set(entry_mod.RETIRED_VARIANTS)}"
    )
    # ordering IS the documented rotation rule — nothing hand-curated
    assert list(q) == entry_mod.rotation_order(list(entry_mod._all_queries()))
    window = set(list(q)[: entry_mod.GATE_WINDOW])
    # every never-driver-gated entry holds a window slot this round
    never = [k for k in q if not entry_mod.GATE_HISTORY.get(k)]
    assert set(never) <= window, f"never-gated outside window: {set(never) - window}"
    # staleness guarantee (round-6 generalization of the 2-round rule):
    # stalest-first rotation gives every entry a driver row at least
    # every K = ceil(T / WINDOW) rounds — each round the WINDOW stalest
    # entries are checked, so an entry can be skipped at most
    # ceil(T/W) - 1 consecutive rounds before it is strictly stalest
    # than every entry checked since. Pin K <= 2 while T <= 2W, and hard
    # cap the surface at 3 windows so the bound never silently degrades
    # past 3 rounds.
    import math

    K = math.ceil(len(q) / entry_mod.GATE_WINDOW)
    assert K <= 3, f"gate surface {len(q)} needs K={K} rounds — consolidate"
    # while the tail still fits one window, the stronger 2-round rule
    # must keep holding (this is the current regime at <=100 entries)
    if len(q) <= 2 * entry_mod.GATE_WINDOW:
        assert len(q) - entry_mod.GATE_WINDOW <= entry_mod.GATE_WINDOW
    # K-round staleness bound (VERDICT r5 #2, K=3 documented): an entry
    # skipped this round was last gated at round `cur` at the earliest
    # minus 1; its gap closes next round because stalest-first makes it
    # outrank everything gated since. Insertion bursts (new never-gated
    # entries jump the queue) can push one extra round — so the hard
    # rule is: any entry whose last green row is already K-1 rounds old
    # MUST hold a window slot now, i.e. no entry ever exceeds K rounds
    # without a driver row. Entries outside the window are still
    # oracle-checked every pytest run below.
    K = 3
    cur = max(r for h in entry_mod.GATE_HISTORY.values() for r in h)
    must = [
        k for k in q
        if entry_mod.GATE_HISTORY.get(k)
        and max(entry_mod.GATE_HISTORY[k]) <= cur - (K - 1)
    ]
    assert set(must) <= window, (
        f"entries about to exceed the {K}-round bound outside window: "
        f"{set(must) - window}"
    )


@pytest.mark.parametrize("name", _tail_names())
def test_tail_entry_matches_oracle(name, spark, duck):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sdf = fn(spark, SF_DIR)
    assert_frames_match(sdf, duck.sql(sql).df(), name)
