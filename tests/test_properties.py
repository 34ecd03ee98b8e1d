"""Property-based tests (hypothesis) against the pure-Python oracle —
a THIRD independent implementation (Spark vs DuckDB vs Python).

Strategy generates adversarial row batches: tiny key spaces force 5-key
collisions across PREDIR quadrants, zeros land in every range slot, names
mix empty/numeric/alphabetic — exactly the edge surface SURVEY.md §2
documents. A handful of examples with ~40 rows each beats thousands of
trivial ones (each example pays a Spark job)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from roadgrinder_spark.operators import roadgrinder as rg
from roadgrinder_spark.schemas import ADDRPNTS_SCHEMA, ROADS_SCHEMA

from . import oracle_py

NAMES = st.sampled_from(["", "MAIN", "STREET 5", "4500", "ROUNDABOUT 2", "Oak"])
DIRS = st.sampled_from(["", "N", "S", "E", "W"])
ADDR = st.sampled_from([0.0, 1.0, 50.0, 99.0, 100.0, 199.0])


@st.composite
def road_rows(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for i in range(n):
        rows.append(
            {
                "objectid": i,
                "CARTOCODE": draw(st.sampled_from(["1", "5", "7", "99", "12"])),
                "ADDRSYS_L": draw(st.sampled_from(["Provo", "OGDEN"])),
                "ADDRSYS_R": draw(st.sampled_from(["Provo", "OGDEN"])),
                "FROMADDR_L": draw(ADDR),
                "TOADDR_L": draw(ADDR),
                "FROMADDR_R": draw(ADDR),
                "TOADDR_R": draw(ADDR),
                "PREDIR": draw(DIRS),
                "NAME": draw(NAMES),
                "POSTTYPE": draw(st.sampled_from(["", "ST"])),
                "POSTDIR": draw(st.sampled_from(["", "N"])),
                "A1_NAME": draw(st.sampled_from(["", "ALT A"])),
                "A1_POSTTYPE": "RD",
                "A2_NAME": draw(st.sampled_from(["", "ALT B"])),
                "A2_POSTTYPE": "LN",
                "AN_NAME": draw(st.sampled_from(["", "700"])),
                "AN_POSTDIR": draw(st.sampled_from(["", "S"])),
                "ZIPCODE_L": "84001",
                "ZIPCODE_R": "84002",
                "GlobalID": f"{{{i}}}",
                "x1": 0.0,
                "y1": 0.0,
                "x2": 10.0,
                "y2": 0.0,
                "geometry": "LINESTRING (0 0, 10 0)",
            }
        )
    return rows


def _norm(rows: list[dict]) -> pd.DataFrame:
    if not rows:
        return pd.DataFrame()
    df = pd.DataFrame(rows)
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=road_rows())
def test_x1_x2_match_python_oracle(spark, rows):
    sdf = spark.createDataFrame(rows, schema=ROADS_SCHEMA)
    out = rg.explode_aliases(sdf)
    g_py, a1_py, scratch_py = oracle_py.explode_aliases_py(rows)
    x2_py = oracle_py.altnames_nopredir_py(scratch_py)

    got_g = _norm([r.asDict() for r in out.geocode_roads.drop(
        "x1", "y1", "x2", "y2", "geometry").collect()])
    pd.testing.assert_frame_equal(got_g, _norm(g_py), check_dtype=False)

    got_x2 = _norm([r.asDict() for r in rg.altnames_roads_nopredir(out.scratch).collect()])
    pd.testing.assert_frame_equal(got_x2, _norm(x2_py), check_dtype=False)


@st.composite
def pnt_rows(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for i in range(n):
        rows.append(
            {
                "objectid": i,
                "AddSystem": draw(st.sampled_from(["PROVO", "OGDEN"])),
                "AddNum": draw(st.sampled_from(["1", "50", "120"])),
                "AddNumSuffix": draw(st.sampled_from(["", "A"])),
                "PrefixDir": draw(DIRS),
                "StreetName": draw(
                    st.sampled_from(["", "CENTER", "4500", "HIGHWAY 89", "Oak"])
                ),
                "StreetType": draw(st.sampled_from(["", "ST"])),
                "SuffixDir": draw(st.sampled_from(["", "N"])),
                "ZipCode": "84601",
                "UnitType": "",
                "UnitID": "",
                "City": draw(st.sampled_from(["PROVO", "OGDEN"])),
                "CountyID": "49",
                "px": 0.0,
                "py": 0.0,
            }
        )
    return rows


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=pnt_rows())
def test_x3_matches_python_oracle(spark, rows):
    sdf = spark.createDataFrame(rows, schema=ADDRPNTS_SCHEMA)
    got = _norm([r.asDict() for r in rg.altnames_addrpnts(sdf).collect()])
    want = _norm(oracle_py.altnames_addrpnts_py(rows))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(max_examples=50, deadline=None)
@given(
    fl=st.integers(min_value=0, max_value=10**6),
    fr=st.integers(min_value=0, max_value=10**6),
    tl=st.integers(min_value=0, max_value=10**6),
    tr=st.integers(min_value=0, max_value=10**6),
)
def test_low_high_properties(fl, fr, tl, tr):
    """F6 invariants: low is never 0 unless both inputs are 0; high is the
    plain max (no zero guard)."""
    r = {"FROMADDR_L": fl, "FROMADDR_R": fr, "TOADDR_L": tl, "TOADDR_R": tr}
    low, high = oracle_py._low_high(r)
    assert high == max(tl, tr)
    if fl == 0 and fr == 0:
        assert low == 0
    elif fl == 0:
        assert low == fr
    elif fr == 0:
        assert low == fl
    else:
        assert low == min(fl, fr)


# ---------------------------------------------------------------------------
# round-3 operators vs pure-Python oracles
# ---------------------------------------------------------------------------

@st.composite
def edge_lists(draw):
    n_nodes = draw(st.integers(min_value=2, max_value=30))
    n_edges = draw(st.integers(min_value=1, max_value=60))
    mk = st.integers(min_value=0, max_value=n_nodes - 1)
    return [(draw(mk), draw(mk)) for _ in range(n_edges)]


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edge_lists(), cap=st.integers(min_value=1, max_value=10))
def test_cc_matches_python_oracle(spark, edges, cap):
    """connected_components vs a python BFS over adversarial tiny graphs
    (self-loops, duplicates, forced contraction recursion via tiny cap)."""
    from roadgrinder_spark.operators.graph import connected_components

    e = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(e, max_iters=1, max_driver_edges=cap).collect()
    }
    # python oracle: BFS components over the same edges, min-id label
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for start in adj:
        if start in want:
            continue
        comp, todo = set(), [start]
        while todo:
            x = todo.pop()
            if x in comp:
                continue
            comp.add(x)
            todo.extend(adj[x] - comp)
        root = min(comp)
        for x in comp:
            want[x] = root
    assert got == want


@st.composite
def event_logs(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                draw(st.integers(min_value=0, max_value=3)),       # user
                draw(st.sampled_from(["purchase", "click", "view"])),
                draw(st.integers(min_value=0, max_value=5)),       # second
            )
        )
    return rows


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=event_logs())
def test_asof_matches_python_oracle(spark, rows):
    """asof_join vs a row-at-a-time python scan — duplicate timestamps
    (the tie surface) are generated on purpose."""
    import datetime as dt

    from roadgrinder_spark.operators.events import asof_join

    base = dt.datetime(2024, 1, 1)
    data = [
        (eid, base + dt.timedelta(seconds=sec), uid, ty, 0.0, "")
        for eid, uid, ty, sec in rows
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        r["event_id"]: (r["matched_event_id"], r["matched_ts_us"])
        for r in asof_join(df, "purchase", "click").collect()
    }
    want = {}
    for eid, uid, ty, sec in rows:
        if ty != "purchase":
            continue
        cands = [
            (s2, e2)
            for e2, u2, t2, s2 in rows
            if u2 == uid and t2 == "click"
            and (s2, ) <= (sec, )  # at-or-before on ts…
        ]
        # …tie on equal ts resolved to the highest event_id
        best = max(cands, key=lambda c: (c[0], c[1]), default=None)
        us = int((base + dt.timedelta(seconds=best[0])).timestamp() * 1e6) if best else None
        want[eid] = (best[1] if best else None, us)
    assert got == want
