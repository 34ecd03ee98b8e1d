"""Round-6 operators: weighted network distance, duplicated-span dedup,
HMM map-matching — each pinned against an independent pure-Python
reference (not the DuckDB oracle, which shares parameters with the
engine; these references share nothing but the spec).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from .conftest import SF_DIR, assert_frames_match


# ---------------------------------------------------------------------------
# network_distance vs a pure-python bounded Bellman-Ford on a brute-force
# edge list (O(n^2) numpy endpoint pairs — no cell cover, no SQL)
# ---------------------------------------------------------------------------


def _py_network_distance(roads_pd, seed_mod=97, max_hops=4, snap_tol=150.0):
    rid = roads_pd["objectid"].to_numpy()
    ex = np.concatenate([roads_pd["x1"].to_numpy(), roads_pd["x2"].to_numpy()])
    ey = np.concatenate([roads_pd["y1"].to_numpy(), roads_pd["y2"].to_numpy()])
    er = np.concatenate([rid, rid])
    d2 = (ex[:, None] - ex[None, :]) ** 2 + (ey[:, None] - ey[None, :]) ** 2
    ii, jj = np.nonzero(d2 <= snap_tol * snap_tol)
    mask = er[ii] != er[jj]
    pairs = set(zip(er[ii][mask].tolist(), er[jj][mask].tolist()))
    wmap = {
        int(r): int(
            math.floor(
                math.sqrt((x2 - x1) ** 2 + (y2 - y1) ** 2) * 10.0
            )
        )
        for r, x1, y1, x2, y2 in roads_pd[
            ["objectid", "x1", "y1", "x2", "y2"]
        ].itertuples(index=False)
    }
    adj: dict[int, list[tuple[int, int]]] = {}
    for s, t in pairs:
        adj.setdefault(int(s), []).append((int(t), wmap[int(t)]))
    best = {int(r): 0 for r in rid if int(r) % seed_mod == 0}
    frontier = dict(best)
    for _ in range(max_hops):
        nxt: dict[int, int] = {}
        for u, du in frontier.items():
            for v, w in adj.get(u, ()):
                c = du + w
                if c < best.get(v, c + 1) and c < nxt.get(v, c + 1):
                    nxt[v] = c
        if not nxt:
            break
        best.update(nxt)
        frontier = nxt
    return best


def test_network_distance_vs_python(spark):
    from roadgrinder_spark import datagen
    from roadgrinder_spark.spatial import network as nw

    roads = datagen.derive_roads(spark, SF_DIR)
    got = {
        int(r.road_id): int(r.dist_dm)
        for r in nw.network_distance(roads).collect()
    }
    want = _py_network_distance(roads.toPandas())
    assert got == want
    # seeds label 0; non-seed labels are strictly positive path costs
    assert all(v == 0 for k, v in got.items() if k % 97 == 0)
    assert all(v > 0 for k, v in got.items() if k % 97 != 0)


def test_network_distance_dominates_more_hops(spark):
    """More relax rounds can only reach more roads with <= costs (the
    bounded-BF monotonicity the unrolled oracle relies on)."""
    from roadgrinder_spark import datagen
    from roadgrinder_spark.spatial import network as nw

    roads = datagen.derive_roads(spark, SF_DIR)
    d2 = {
        int(r.road_id): int(r.dist_dm)
        for r in nw.network_distance(roads, max_hops=2).collect()
    }
    d4 = {
        int(r.road_id): int(r.dist_dm)
        for r in nw.network_distance(roads, max_hops=4).collect()
    }
    assert set(d2) <= set(d4)
    assert all(d4[k] <= v for k, v in d2.items())


# ---------------------------------------------------------------------------
# span_dedup: planted cross-doc spans + interval invariants
# ---------------------------------------------------------------------------


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_duplicate_spans_planted(spark):
    from roadgrinder_spark.operators.dedup import duplicate_spans

    import random

    rng = random.Random(7)

    def noise(n):
        return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(n))

    shared = "THE-QUICK-BROWN-FOX-JUMPS-OVER-THE-LAZY-DOG-0123456789-SHARED"
    d1 = noise(50) + shared + noise(50)
    d2 = noise(40) + shared + noise(70)
    d3 = noise(160)  # no shared content
    out = duplicate_spans(
        _mkdocs(spark, [(1, d1), (2, d2), (3, d3)]), k=20, min_len=40
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end, r.span_len))
    assert 3 not in by_doc
    # the planted span is recovered exactly: every 20-gram inside it is
    # shared, nothing outside is, so the merged island is the span itself
    assert by_doc[1] == [(51, 50 + len(shared), len(shared))]
    assert by_doc[2] == [(41, 40 + len(shared), len(shared))]
    # and the recovered slice IS the shared string
    s, e, _ = by_doc[1][0]
    assert d1[s - 1 : e] == shared


def test_duplicate_spans_invariants(spark):
    """Spans lie inside their doc, are >= min_len, and never overlap
    (interval merge leaves gaps > k between islands)."""
    from roadgrinder_spark.operators.dedup import duplicate_spans

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lens = {r.doc_id: len(r.text) for r in docs.select("doc_id", "text").collect()}
    rows = duplicate_spans(docs, k=20, min_len=40).collect()
    assert rows, "gate corpus must produce non-vacuous spans"
    per_doc = {}
    for r in rows:
        assert 1 <= r.span_start <= r.span_end <= lens[r.doc_id]
        assert r.span_len == r.span_end - r.span_start + 1 >= 40
        per_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for spans in per_doc.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1, "merged islands must not overlap"


def test_duplicate_spans_self_repeat_not_cross_doc(spark):
    """A substring repeated WITHIN one doc only (distinct-doc df = 1)
    does not create spans — the op is cross-doc by contract."""
    from roadgrinder_spark.operators.dedup import duplicate_spans

    rep = "SELF-REPEATED-BLOCK-OF-TEXT-1234567890-ABCDEF"
    doc = rep + ("x" * 60) + rep
    out = duplicate_spans(
        _mkdocs(spark, [(1, doc), (2, "y" * 200)]), k=20, min_len=40
    ).collect()
    assert out == []


# ---------------------------------------------------------------------------
# route_match_hmm: intersection recovery + independent python reference
# ---------------------------------------------------------------------------


def _mk_roads(spark, rows):
    return spark.createDataFrame(
        rows, "objectid bigint, x1 double, y1 double, x2 double, y2 double"
    )


def _mk_pings(spark, rows):
    return spark.createDataFrame(
        rows, "ping_id bigint, user_id bigint, ts bigint, px double, py double"
    )


def test_hmm_recovers_where_top1_snap_is_wrong(spark):
    """A noisy ping near a crossing street top-1-snaps to the WRONG road;
    the Viterbi pass keeps the coherent route (emission +1 beats two
    non-adjacent transitions at +5 each)."""
    from roadgrinder_spark.spatial.join import knn_join
    from roadgrinder_spark.spatial.trajectory import route_match_hmm

    roads = _mk_roads(
        spark,
        [(1, 0.0, 0.0, 1000.0, 0.0), (2, 500.0, 155.0, 500.0, 500.0)],
    )
    # user walks along road 1 at y=30; ping 3 drifts to (500, 80):
    # dist to road 2 = 75 < dist to road 1 = 80
    pings = _mk_pings(
        spark,
        [
            (1, 7, 1, 100.0, 30.0),
            (2, 7, 2, 300.0, 30.0),
            (3, 7, 3, 500.0, 80.0),
            (4, 7, 4, 700.0, 30.0),
            (5, 7, 5, 900.0, 30.0),
        ],
    )
    snap = {
        r.point_id: r.road_id
        for r in knn_join(
            pings.selectExpr("ping_id AS objectid", "px", "py"), roads, k=1
        ).collect()
    }
    assert snap[3] == 2, "precondition: top-1 snap picks the crossing road"
    hmm = {
        r.ping_id: r.road_id
        for r in route_match_hmm(pings, roads).collect()
    }
    assert hmm == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def _py_dist2(px, py, x1, y1, x2, y2):
    ax, ay = px - x1, py - y1
    abx, aby = x2 - x1, y2 - y1
    len2 = abx * abx + aby * aby
    dot = ax * abx + ay * aby
    t = 0.0 if dot <= 0.0 else (1.0 if dot >= len2 else dot / len2)
    dx, dy = px - (x1 + t * abx), py - (y1 + t * aby)
    return dx * dx + dy * dy


def test_hmm_vs_python_enumeration(spark):
    """Independent pure-python reference: brute-force candidates, brute
    edges, exhaustive path enumeration per chunk with the same
    (cost, lexicographic) argmin — no SQL, no cell cover."""
    import itertools

    from roadgrinder_spark import datagen
    from roadgrinder_spark.spatial import trajectory as tj

    roads = datagen.derive_roads(spark, SF_DIR)
    pings = tj.derive_pings(spark, SF_DIR).filter("user_id % 17 = 3")
    got = {
        (r.user_id, r.ping_id): r.road_id
        for r in tj.route_match_hmm(pings, roads).collect()
    }

    rp = roads.toPandas()
    pp = pings.toPandas().sort_values(["user_id", "ts", "ping_id"])
    # brute adjacency (150 m endpoint snap)
    import numpy as np

    ex = np.concatenate([rp.x1.to_numpy(), rp.x2.to_numpy()])
    ey = np.concatenate([rp.y1.to_numpy(), rp.y2.to_numpy()])
    er = np.concatenate([rp.objectid.to_numpy()] * 2)
    d2m = (ex[:, None] - ex[None, :]) ** 2 + (ey[:, None] - ey[None, :]) ** 2
    ii, jj = np.nonzero(d2m <= 150.0 * 150.0)
    adj = {
        (int(er[i]), int(er[j]))
        for i, j in zip(ii, jj)
        if er[i] != er[j]
    }
    SENT = tj.HMM_NULL_SENTINEL

    def cands(px, py):
        ds = []
        for r in rp.itertuples():
            d2 = _py_dist2(px, py, r.x1, r.y1, r.x2, r.y2)
            if d2 <= 100.0 * 100.0:
                ds.append((d2, int(r.objectid)))
        ds.sort()
        out = [(rid, e) for e, (_, rid) in enumerate(ds[:3])]
        return out or [(SENT, 0)]

    def tr(a, b):
        if a == SENT and b == SENT:
            return 0
        if a == SENT or b == SENT:
            return tj.HMM_TR_NULL
        if a == b:
            return 0
        if (a, b) in adj:
            return tj.HMM_TR_ADJ
        return tj.HMM_TR_JUMP

    want = {}
    for uid, grp in pp.groupby("user_id"):
        rows = list(grp.itertuples())
        for c0 in range(0, len(rows), tj.HMM_CHUNK):
            ch = rows[c0 : c0 + tj.HMM_CHUNK]
            cand_lists = [cands(r.px, r.py) for r in ch]
            best = None
            for path in itertools.product(*cand_lists):
                cost = sum(e for _, e in path) + sum(
                    tr(path[i][0], path[i + 1][0]) for i in range(len(path) - 1)
                )
                key = (cost,) + tuple(r for r, _ in path)
                if best is None or key < best:
                    best = key
            for r, rid in zip(ch, best[1:]):
                want[(int(uid), int(r.ping_id))] = None if rid == SENT else rid
    assert got == want


def test_duplicate_spans_sampled_mode(spark):
    """sample_mod=p (the 100 TB path) is content-defined: both copies of
    a duplicated substring sample identical grams, so a long planted
    span is still recovered; the recovered span sits INSIDE the planted
    region (sampling can only trim boundaries, never extend past them
    when the surrounding text is unique)."""
    import random

    from roadgrinder_spark.operators.dedup import duplicate_spans

    rng = random.Random(11)

    def noise(n):
        return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(n))

    shared = noise(600).upper()  # 600-char planted duplicate
    d1 = noise(100) + shared + noise(100)
    d2 = noise(80) + shared + noise(120)
    docs = _mkdocs(spark, [(1, d1), (2, d2)])
    out = duplicate_spans(docs, k=20, min_len=40, sample_mod=8).collect()
    by_doc = {r.doc_id: (r.span_start, r.span_end) for r in out}
    assert set(by_doc) == {1, 2}
    s1, e1 = by_doc[1]
    # containment in the planted region [101, 700] and substantial recall
    assert 101 <= s1 and e1 <= 700
    assert e1 - s1 + 1 >= 300
    # and the sampled span is contained in the exact-mode span
    exact = {
        r.doc_id: (r.span_start, r.span_end)
        for r in duplicate_spans(docs, k=20, min_len=40).collect()
    }
    assert exact[1][0] <= s1 and e1 <= exact[1][1]


# ---------------------------------------------------------------------------
# isochrone_cells and idw_interpolate invariants
# ---------------------------------------------------------------------------


def test_isochrone_bands_consistent(spark):
    from roadgrinder_spark import datagen
    from roadgrinder_spark.spatial import network as nw

    roads = datagen.derive_roads(spark, SF_DIR)
    iso = nw.isochrone_cells(roads).collect()
    assert iso
    labels = {
        int(r.road_id): int(r.dist_dm)
        for r in nw.network_distance(roads).collect()
    }
    # every cell's min_dist_dm is an actual label value and band = floor
    vals = set(labels.values())
    for r in iso:
        assert r.min_dist_dm in vals
        assert r.band == r.min_dist_dm // 5000
    # cell count <= reached-road count (aggregation can only shrink)
    assert len(iso) <= len(labels)


def test_idw_vs_python(spark):
    """IDW estimates match a brute-force python reference exactly (the
    integer-weight discipline makes the whole aggregate deterministic)."""
    import math

    from roadgrinder_spark import datagen
    from roadgrinder_spark.spatial import raster as sr

    pnts = datagen.derive_addrpnts(spark, SF_DIR)
    from pyspark.sql import functions as F

    pts = pnts.select("px", "py", (F.col("objectid") % 1000).alias("v"))
    got = {
        (r.cx, r.cy): (r.n_samples, r.est)
        for r in sr.idw_interpolate(pts).collect()
    }
    rows = pts.collect()
    s = sr.DEFAULT_CELL_SIZE
    cells = {(math.floor(r.px / s), math.floor(r.py / s)) for r in rows}
    want = {}
    for cx, cy in cells:
        cxc, cyc = (cx + 0.5) * s, (cy + 0.5) * s
        ws, wvs, n = 0, 0, 0
        for r in rows:
            d2 = (r.px - cxc) ** 2 + (r.py - cyc) ** 2
            if d2 <= s * s:
                w = math.floor(sr.IDW_SCALE / (d2 + sr.IDW_SMOOTH))
                ws += w
                wvs += w * r.v
                n += 1
        if n:
            want[(cx, cy)] = (n, round(wvs / ws, 6))
    assert got == want
