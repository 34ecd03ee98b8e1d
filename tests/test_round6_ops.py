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
