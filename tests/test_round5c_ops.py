"""Round-5 wave-3 operators vs independent pure-Python references.

The driver gate (and test_gate_tail) already checks these against the
DuckDB oracles; this suite re-derives expected outputs with hand-rolled
Python (dict/loop) implementations on planted inputs, so a bug shared
by both SQL dialects can't hide.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, LongType, StringType, StructField, StructType, TimestampType,
    DoubleType,
)

from roadgrinder_spark.spatial import network as nw
from roadgrinder_spark.spatial import raster as sr
from roadgrinder_spark.spatial import trajectory as tj
from roadgrinder_spark.operators import spans as sp_ops

PACK = 1 << 26
CY_BIAS = 1 << 25


def _cell(x: float, y: float, cs: float) -> int:
    return math.floor(x / cs) * PACK + math.floor(y / cs) + CY_BIAS


PING_SCHEMA = StructType([
    StructField("ping_id", LongType()),
    StructField("user_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("px", DoubleType()),
    StructField("py", DoubleType()),
])

T0 = datetime(2024, 1, 1, 8, 0, 0)


def _pings_df(spark, rows):
    return spark.createDataFrame(
        [(i, u, t, float(x), float(y)) for i, (u, t, x, y) in enumerate(rows)],
        PING_SCHEMA,
    )


def test_dwell_detect_runs_and_threshold(spark):
    cs = 250.0
    # user 1: 4 pings cell A, 2 pings cell B, 3 pings cell A again;
    # user 2: 2 pings cell C only (below threshold -> no output)
    rows = (
        [(1, T0 + timedelta(minutes=m), 10 + m, 50) for m in range(4)]
        + [(1, T0 + timedelta(minutes=4 + m), 300 + m, 50) for m in range(2)]
        + [(1, T0 + timedelta(minutes=6 + m), 40 + m, 50) for m in range(3)]
        + [(2, T0 + timedelta(minutes=m), 900 + m, 900) for m in range(2)]
    )
    out = tj.dwell_detect(_pings_df(spark, rows), cell_size=cs, min_pings=3)
    got = {
        (r["user_id"], r["dwell_id"]): (
            r["cell"], r["enter_ts"], r["exit_ts"], r["n_pings"]
        )
        for r in out.collect()
    }
    a = _cell(10, 50, cs)
    assert got == {
        (1, 1): (a, T0, T0 + timedelta(minutes=3), 4),
        # dwell_id 2 is the dropped cell-B run; the second A-run keeps id 3
        (1, 3): (a, T0 + timedelta(minutes=6), T0 + timedelta(minutes=8), 3),
    }


def test_dwell_detect_orders_by_ts_then_ping_id(spark):
    # two pings share a timestamp; ping_id breaks the tie, so the run
    # sequence is A,A | B — one kept run of 2 at min_pings=2
    rows = [
        (7, T0, 10, 10),
        (7, T0, 20, 10),       # same ts, later ping_id, same cell
        (7, T0 + timedelta(seconds=30), 500, 10),
    ]
    out = tj.dwell_detect(_pings_df(spark, rows), cell_size=250.0, min_pings=2)
    rs = out.collect()
    assert len(rs) == 1 and rs[0]["n_pings"] == 2 and rs[0]["dwell_id"] == 1


def test_od_matrix_trip_split_and_endpoints(spark):
    cs, gap = 500.0, 3600
    # user 1, trip 1: origin cell (0,0) -> dest cell (2,0); then a 2 h
    # gap; trip 2: single-ping trip (origin == dest). user 2: one trip
    # with out-of-order-looking coords, origin (9,9) dest (0,0).
    rows = [
        (1, T0, 100, 100),
        (1, T0 + timedelta(minutes=10), 600, 100),
        (1, T0 + timedelta(minutes=20), 1100, 100),
        (1, T0 + timedelta(hours=2, minutes=21), 2600, 100),
        (2, T0, 4700, 4700),
        (2, T0 + timedelta(minutes=5), 100, 100),
    ]
    out = tj.od_matrix(_pings_df(spark, rows), gap_s=gap, cell_size=cs)
    got = {(r["o_cell"], r["d_cell"]): r["n_trips"] for r in out.collect()}
    c = lambda x, y: _cell(x, y, cs)
    assert got == {
        (c(100, 100), c(1100, 100)): 1,
        (c(2600, 100), c(2600, 100)): 1,
        (c(4700, 4700), c(100, 100)): 1,
    }


def test_od_matrix_gap_boundary_not_split(spark):
    # exactly gap_s seconds apart is NOT a new trip (> strict)
    rows = [(5, T0, 100, 100), (5, T0 + timedelta(seconds=3600), 5100, 100)]
    out = tj.od_matrix(_pings_df(spark, rows), gap_s=3600, cell_size=500.0)
    rs = out.collect()
    assert len(rs) == 1 and rs[0]["n_trips"] == 1
    assert rs[0]["o_cell"] != rs[0]["d_cell"]


def test_colocation_pairs_counts_distinct_presence(spark):
    cs = 1000.0
    day2 = T0 + timedelta(days=1)
    rows = [
        # users 3 & 4 share cell (0,0) on day 1 (4 has TWO pings there —
        # presence dedup means it still counts once) and cell (5,5) on
        # day 2; user 5 sits alone far away; 3 & 5 share nothing
        (3, T0, 100, 100),
        (4, T0 + timedelta(hours=1), 900, 900),
        (4, T0 + timedelta(hours=2), 500, 500),
        (3, day2, 5100, 5100),
        (4, day2 + timedelta(hours=3), 5900, 5900),
        (5, T0, 99000, 99000),
    ]
    out = tj.colocation_pairs(_pings_df(spark, rows), cell_size=cs, bucket="day")
    got = {(r["user_a"], r["user_b"]): r["n_events"] for r in out.collect()}
    assert got == {(3, 4): 2}


def _roads_df(spark, segs):
    return spark.createDataFrame(
        [(i, float(x1), float(y1), float(x2), float(y2))
         for i, (x1, y1, x2, y2) in segs.items()],
        "objectid long, x1 double, y1 double, x2 double, y2 double",
    )


def _py_edges(segs, tol):
    eps = {i: [(x1, y1), (x2, y2)] for i, (x1, y1, x2, y2) in segs.items()}
    out = set()
    for a, pa in eps.items():
        for b, pb in eps.items():
            if a == b:
                continue
            for ax, ay in pa:
                for bx, by in pb:
                    if (bx - ax) ** 2 + (by - ay) ** 2 <= tol * tol:
                        out.add((a, b))
    return out


def _py_bfs(segs, tol, seed_mod, max_hops):
    edges = _py_edges(segs, tol)
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    hops = {i: 0 for i in segs if i % seed_mod == 0}
    frontier = set(hops)
    for h in range(1, max_hops + 1):
        frontier = {
            d for s in frontier for d in adj.get(s, ()) if d not in hops
        }
        if not frontier:
            break
        for d in frontier:
            hops[d] = h
    return hops


def _lattice_segs():
    # an irregular lattice: a 12-segment chain with one gap (segment 5
    # displaced beyond tol), a branch off segment 3, and an island
    segs = {}
    for i in range(12):
        x = i * 100.0 + (500.0 if i == 5 else 0.0)
        segs[i] = (x, 0.0, x + 100.0, 0.0)
    segs[20] = (300.0, 0.0, 300.0, 120.0)   # branch at chain joint 2/3
    segs[21] = (300.0, 120.0, 300.0, 240.0)
    segs[41] = (9000.0, 9000.0, 9100.0, 9000.0)  # island, unreachable
    return segs


def test_road_edges_match_bruteforce(spark):
    segs, tol = _lattice_segs(), 50.0
    got = {(r["src"], r["dst"]) for r in nw.road_edges(_roads_df(spark, segs), tol).collect()}
    assert got == _py_edges(segs, tol)


def test_bfs_hops_exact_levels(spark, tmp_path):
    segs, tol = _lattice_segs(), 50.0
    out = nw.bfs_hops(
        _roads_df(spark, segs), seed_mod=20, max_hops=4, snap_tol=tol,
        work_dir=str(tmp_path / "bfs"),
    )
    got = {r["road_id"]: r["hops"] for r in out.collect()}
    exp = _py_bfs(segs, tol, seed_mod=20, max_hops=4)
    assert got == exp
    assert 41 not in got          # island unreached (and not a seed)
    assert got[0] == 0 and got[20] == 0 and got[21] == 1
    # odd hop cap (the two-level-per-barrier loop ends on a single
    # step) + saturation early-exit, against the same python reference
    out5 = nw.bfs_hops(
        _roads_df(spark, segs), seed_mod=20, max_hops=5, snap_tol=tol,
        work_dir=str(tmp_path / "bfs5"),
    )
    got5 = {r["road_id"]: r["hops"] for r in out5.collect()}
    assert got5 == _py_bfs(segs, tol, seed_mod=20, max_hops=5)


def test_kde_heatmap_matches_bruteforce(spark):
    radius = 2
    cells = [(0, 0, 5), (1, 0, 2), (10, 10, 1), (-3, 4, 7)]
    raster = spark.createDataFrame(cells, "cx long, cy long, n long")
    exp: dict[tuple[int, int], int] = {}
    for cx, cy, n in cells:
        for dx in range(-radius, radius + 1):
            for dy in range(-radius, radius + 1):
                w = (radius + 1 - max(abs(dx), abs(dy))) ** 2
                k = (cx + dx, cy + dy)
                exp[k] = exp.get(k, 0) + n * w
    out = sr.kde_heatmap(raster, radius=radius)
    got = {(r["cx"], r["cy"]): r["density"] for r in out.collect()}
    assert got == exp
    # pack is consistent with the grid convention
    one = out.filter((F.col("cx") == 0) & (F.col("cy") == 0)).collect()[0]
    assert one["cell"] == 0 * PACK + 0 + CY_BIAS


SPAN_SCHEMA = StructType([
    StructField("doc_id", StringType()),
    StructField("spans", ArrayType(StructType([
        StructField("kind", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", LongType()),
    ]))),
])


def _sbs_py(rows, bs=500.0, patch=5, ring=1,
            weights=(("train", 0.8), ("val", 0.1), ("test", 0.1))):
    import hashlib

    n_b = 1 << 16
    bounds, acc = [], 0.0
    for i, (lab, w) in enumerate(weights):
        acc += w
        bounds.append((lab, n_b if i == len(weights) - 1 else int(round(acc * n_b))))
    test_lo = bounds[-2][1]

    def bucket(pid):
        return int(hashlib.md5(str(pid).encode()).hexdigest()[:4], 16)

    def patch_id(bx, by):
        return (math.floor(bx / patch) * PACK
                + math.floor(by / patch) + CY_BIAS)

    out = {}
    for oid, x, y in rows:
        bx, by = math.floor(x / bs), math.floor(y / bs)
        b = bucket(patch_id(bx, by))
        lab = next(l for l, hi in bounds if b < hi)
        if lab == "train":
            for dx in range(-ring, ring + 1):
                for dy in range(-ring, ring + 1):
                    if (dx or dy) and bucket(patch_id(bx + dx, by + dy)) >= test_lo:
                        lab = "buffer"
        out[oid] = (bx * PACK + by + CY_BIAS, lab)
    return out


def test_spatial_block_split_matches_python_and_leakage_free(spark):
    from roadgrinder_spark.operators.sampling import spatial_block_split

    # a 40x40 fine-block extent incl. negative coords (patch boundaries
    # at odd offsets), one point per block corner region
    rows = [
        (i, -5000.0 + (i % 40) * 500.0 + 7.0, -5000.0 + (i // 40) * 500.0 + 3.0)
        for i in range(1600)
    ]
    df = spark.createDataFrame(rows, "objectid long, px double, py double")
    out = spatial_block_split(df)
    got = {r["objectid"]: (r["block"], r["split"]) for r in out.collect()}
    want = _sbs_py(rows)
    assert got == want
    # the leakage guarantee, re-derived independently: no train point has
    # ANY ring-1 fine-block neighbor inside a test patch
    labs = {oid: v[1] for oid, v in want.items()}
    assert set(labs.values()) == {"train", "val", "test", "buffer"}
    for oid, x, y in rows:
        if labs[oid] != "train":
            continue
        bx, by = math.floor(x / 500.0), math.floor(y / 500.0)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = _sbs_py([(0, (bx + dx) * 500.0 + 1.0, (by + dy) * 500.0 + 1.0)])[0][1]
                assert nb != "test", (oid, dx, dy)
    # scale contract: pure projection — no shuffle anywhere in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_spatial_block_split_ring2_matches_full_enumeration(spark):
    """ADVICE r5: the 4-corner identity needs 2*ring < patch. ring=2,
    patch=5 sits at the widest legal config (2*2 = 4 < 5); verify the
    corner check against the full (2r+1)^2 python enumeration, which
    would catch any missed middle-column patch."""
    from roadgrinder_spark.operators.sampling import spatial_block_split

    rows = [
        (i, -5000.0 + (i % 40) * 500.0 + 7.0, -5000.0 + (i // 40) * 500.0 + 3.0)
        for i in range(1600)
    ]
    df = spark.createDataFrame(rows, "objectid long, px double, py double")
    out = spatial_block_split(df, ring=2)
    got = {r["objectid"]: (r["block"], r["split"]) for r in out.collect()}
    assert got == _sbs_py(rows, ring=2)


def test_spatial_block_split_rejects_wide_ring(spark):
    """ADVICE r5 (medium): patch <= 2*ring silently leaked before — the
    guard must reject it in BOTH the engine and the oracle builder."""
    from roadgrinder_spark.operators.sampling import (
        oracle_spatial_block_split_sql,
        spatial_block_split,
    )

    df = spark.createDataFrame(
        [(1, 0.0, 0.0)], "objectid long, px double, py double"
    )
    for patch, ring in ((5, 3), (4, 2), (3, 2)):
        with pytest.raises(ValueError):
            spatial_block_split(df, patch=patch, ring=ring)
        with pytest.raises(ValueError):
            oracle_spatial_block_split_sql(patch=patch, ring=ring)


# ---------------------------------------------------------------------------
# property tests: randomized ping streams vs pure-Python third engines
# (adversarial: duplicate timestamps, negative coords, cell-boundary
# values, single-ping users)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

COORD = st.sampled_from([-0.1, 0.0, 100.0, 249.9, 250.0, 400.0, 625.0, 1300.0])
MINUTE = st.integers(min_value=0, max_value=200)


@st.composite
def ping_streams(draw):
    n = draw(st.integers(min_value=1, max_value=14))
    rows = []
    for _ in range(n):
        rows.append((
            draw(st.integers(min_value=1, max_value=3)),          # user
            T0 + timedelta(minutes=draw(MINUTE)),                 # ts (dups ok)
            draw(COORD), draw(COORD),
        ))
    return rows


def _sorted_user_rows(rows):
    by_user: dict[int, list] = {}
    for i, (u, t, x, y) in enumerate(rows):
        by_user.setdefault(u, []).append((t, i, x, y))
    for v in by_user.values():
        v.sort(key=lambda r: (r[0], r[1]))
    return by_user


def _dwell_py(rows, cs, min_pings):
    out = {}
    for u, pings in _sorted_user_rows(rows).items():
        did, run = 0, None
        for t, i, x, y in pings:
            c = _cell(x, y, cs)
            if run is None or run[0] != c:
                if run is not None and run[3] >= min_pings:
                    out[(u, did)] = (run[0], run[1], run[2], run[3])
                did += 1
                run = [c, t, t, 1]
            else:
                run[2] = t
                run[3] += 1
        if run is not None and run[3] >= min_pings:
            out[(u, did)] = (run[0], run[1], run[2], run[3])
    return out


def _od_py(rows, gap_s, cs):
    out: dict[tuple[int, int], int] = {}
    for u, pings in _sorted_user_rows(rows).items():
        trips, prev = [], None
        for t, i, x, y in pings:
            if prev is None or (t - prev).total_seconds() > gap_s:
                trips.append([])
            trips[-1].append((x, y))
            prev = t
        for tr in trips:
            k = (_cell(*tr[0], cs), _cell(*tr[-1], cs))
            out[k] = out.get(k, 0) + 1
    return out


def _coloc_py(rows, cs):
    pres = {(u, _cell(x, y, cs), t.date()) for u, t, x, y in rows}
    out: dict[tuple[int, int], int] = {}
    for ua, ca, ba in pres:
        for ub, cb, bb in pres:
            if ua < ub and ca == cb and ba == bb:
                k = (ua, ub)
                out[k] = out.get(k, 0) + 1
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ping_streams())
def test_dwell_detect_matches_python(spark, rows):
    out = tj.dwell_detect(_pings_df(spark, rows), cell_size=250.0, min_pings=2)
    got = {
        (r["user_id"], r["dwell_id"]): (
            r["cell"], r["enter_ts"], r["exit_ts"], r["n_pings"])
        for r in out.collect()
    }
    assert got == _dwell_py(rows, 250.0, 2)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ping_streams())
def test_od_matrix_matches_python(spark, rows):
    out = tj.od_matrix(_pings_df(spark, rows), gap_s=1800, cell_size=250.0)
    got = {(r["o_cell"], r["d_cell"]): r["n_trips"] for r in out.collect()}
    assert got == _od_py(rows, 1800, 250.0)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ping_streams())
def test_colocation_matches_python(spark, rows):
    out = tj.colocation_pairs(_pings_df(spark, rows), cell_size=250.0)
    got = {(r["user_a"], r["user_b"]): r["n_events"] for r in out.collect()}
    assert got == _coloc_py(rows, 250.0)


def test_span_media_align_lookback(spark):
    # doc d1: text@0 text@2 text@4 media@1 media@3 media@5 media@7;
    # drop_mod=3 drops text whose offset % 6 == 0 (offsets 0, 6, ...)
    d1 = [
        ("text", None, 0), ("media", "m1", 1),
        ("text", None, 2), ("media", "m3", 3),
        ("text", None, 4), ("media", "m5", 5),
        ("text", None, 6), ("media", "m7", 7),
    ]
    d2 = [("media", "x1", 1)]  # media-only doc -> NULL ctx
    docs = spark.createDataFrame([("d1", d1), ("d2", d2)], SPAN_SCHEMA)
    out = sp_ops.span_media_align(docs, drop_mod=3)
    got = {
        (r["doc_id"], r["offset"]): (r["media_ref"], r["ctx_offset"])
        for r in out.collect()
    }
    assert got == {
        ("d1", 1): ("m1", None),     # text@0 dropped, nothing earlier
        ("d1", 3): ("m3", 2),
        ("d1", 5): ("m5", 4),
        ("d1", 7): ("m7", 4),        # text@6 dropped -> falls back to 4
        ("d2", 1): ("x1", None),
    }
