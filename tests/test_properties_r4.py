"""Property-based tests for the round-4 operators — each checked against
an independent pure-Python implementation (the third-engine discipline of
test_properties.py), with adversarial small inputs: empty lines, repeated
paragraphs, degenerate zero-length segments, single-token docs."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

LINES = st.sampled_from(
    ["", "  ", "shared header", "BODY text 1", "body 2", "tail  ", "x"]
)
DOC_TEXT = st.lists(LINES, min_size=0, max_size=6).map(lambda ls: "\n".join(ls))


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=1, max_value=10))
    return [(i, draw(DOC_TEXT)) for i in range(n)]


def _paragraph_dedup_py(docs: list[tuple[int, str]]):
    per_doc = {
        d: {ln.strip() for ln in txt.split("\n") if ln.strip() != ""}
        for d, txt in docs
    }
    counts: dict[str, int] = {}
    for paras in per_doc.values():
        for p in paras:
            counts[p] = counts.get(p, 0) + 1
    out = {}
    for d, paras in per_doc.items():
        n_shared = sum(1 for p in paras if counts[p] >= 2)
        out[d] = (len(paras), n_shared)
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpora())
def test_paragraph_dedup_matches_python(spark, docs):
    from roadgrinder_spark.functions.text import paragraph_dedup

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_paras"], r["n_shared"])
        for r in paragraph_dedup(df).collect()
    }
    want = _paragraph_dedup_py(docs)
    assert set(got) == {d for d, _ in docs}
    for d, (np_, ns) in want.items():
        assert got[d] == (np_, ns), (d, got[d], (np_, ns))


SEGS = st.tuples(
    st.floats(min_value=-1e4, max_value=1e4),
    st.floats(min_value=-1e4, max_value=1e4),
    st.floats(min_value=-1e4, max_value=1e4),
    st.floats(min_value=-1e4, max_value=1e4),
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(SEGS, min_size=1, max_size=15),
       st.sampled_from([10.0, 50.0, 1000.0]))
def test_segment_sample_geometry(spark, segs, spacing):
    from roadgrinder_spark.spatial.cells import segment_sample

    rows = [(i, x1, y1, x2, y2) for i, (x1, y1, x2, y2) in enumerate(segs)]
    df = spark.createDataFrame(
        rows, "objectid long, x1 double, y1 double, x2 double, y2 double"
    )
    got = segment_sample(df, spacing=spacing).collect()
    by_road: dict[int, list] = {}
    for r in got:
        by_road.setdefault(r["road_id"], []).append(r)
    for i, (x1, y1, x2, y2) in enumerate(segs):
        length = math.hypot(x2 - x1, y2 - y1)
        n = max(1, math.floor(length / spacing))
        pts = sorted(by_road[i], key=lambda r: r["seq"])
        assert len(pts) == n + 1
        # first point is exactly the start (t=0 adds a signed zero);
        # every point sits on the lerp within float tolerance
        assert (pts[0]["sx"], pts[0]["sy"]) == (x1, y1)
        tol = 1e-9 * max(1.0, abs(x1), abs(x2), abs(y1), abs(y2))
        for r in pts:
            t = r["seq"] / n
            assert abs(r["sx"] - (x1 + t * (x2 - x1))) <= tol
            assert abs(r["sy"] - (y1 + t * (y2 - y1))) <= tol


def _tfidf_py(docs: list[tuple[int, str]], k: int):
    tf: dict[tuple[int, str], int] = {}
    df_: dict[str, int] = {}
    for d, txt in docs:
        terms = [w for w in txt.split() if w]
        seen = set()
        for w in terms:
            tf[(d, w)] = tf.get((d, w), 0) + 1
            if w not in seen:
                df_[w] = df_.get(w, 0) + 1
                seen.add(w)
    n = len(docs)
    out: dict[int, list] = {}
    for (d, w), f_ in tf.items():
        score = round(f_ * math.log(float(n) / df_[w]), 6)
        out.setdefault(d, []).append((-score, w, f_, df_[w]))
    return {
        d: [(w, f_, dfv, -ns) for ns, w, f_, dfv in sorted(v)[:k]]
        for d, v in out.items()
    }


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpora())
def test_tfidf_matches_python(spark, docs):
    from roadgrinder_spark.functions.text import tfidf_topk_terms

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict[int, list] = {}
    for r in tfidf_topk_terms(df, k=3).orderBy("doc_id", "rank").collect():
        got.setdefault(r["doc_id"], []).append(
            (r["term"], r["tf"], r["df"], r["score"])
        )
    want = _tfidf_py(docs, k=3)
    assert got == {d: v for d, v in want.items() if v}


def _hex_py(px: float, py: float, size: float):
    """Independent cube-rounding hex assignment (the textbook algorithm,
    written numerically differently from the SQL string builder)."""
    qf = ((3 ** 0.5) / 3 * px - py / 3) / size
    rf = (2 * py / 3) / size
    xf, zf = qf, rf
    yf = -qf - rf
    rx, ry, rz = (math.floor(v + 0.5) for v in (xf, yf, zf))
    dx, dy, dz = abs(rx - xf), abs(ry - yf), abs(rz - zf)
    if dx > dy and dx > dz:
        rx = -ry - rz
    elif dz >= dy:  # textbook else-branch: dy > dz fixes ry (not emitted)
        rz = -rx - ry
    return rx, rz


def test_hex_cells_match_python_and_tile_the_plane(spark):
    """Engine hex assignment equals the independent Python cube-round on
    a dense point grid, and the result is a valid tiling: per-cell point
    counts are hexagon-shaped (interior cells of a uniform grid get equal
    mass) and total mass is conserved."""
    from roadgrinder_spark.spatial.cells import hex_rasterize

    size = 10.0
    pts = [
        (i * 97 + j, 400000 + i * 1.25, 4500000 + j * 1.25)
        for i in range(60) for j in range(60)
    ]
    df = spark.createDataFrame(pts, "objectid long, px double, py double")
    cells = hex_rasterize(df, size=size).collect()
    assert sum(r["n"] for r in cells) == len(pts)  # mass conserved
    want: dict[tuple[int, int], int] = {}
    for _, px, py in pts:
        key = _hex_py(px, py, size)
        want[key] = want.get(key, 0) + 1
    got = {(r["hq"], r["hr"]): r["n"] for r in cells}
    assert got == want


RECTS = st.tuples(
    st.integers(min_value=0, max_value=20),
    st.integers(min_value=0, max_value=20),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=10),
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(RECTS, min_size=1, max_size=8),
       st.lists(RECTS, min_size=1, max_size=8))
def test_zone_overlay_matches_python(spark, ra, rb):
    """Overlay equals the independent python rect-intersection on random
    integer rectangles (touching edges excluded, area always positive)."""
    from roadgrinder_spark.spatial.pip import zone_overlay

    def frame(rs, base):
        rows = [
            (base + i, f"z{base + i}", float(x), float(x + w), float(y), float(y + h))
            for i, (x, y, w, h) in enumerate(rs)
        ]
        return spark.createDataFrame(
            rows,
            "zone_id long, zone_name string, x_min double, x_max double, "
            "y_min double, y_max double",
        )

    got = {
        (r["zone_a"], r["zone_b"]): r["inter_area"]
        for r in zone_overlay(frame(ra, 0), frame(rb, 100)).collect()
    }
    want = {}
    for i, (ax, ay, aw, ah) in enumerate(ra):
        for j, (bx, by, bw, bh) in enumerate(rb):
            w = min(ax + aw, bx + bw) - max(ax, bx)
            h = min(ay + ah, by + bh) - max(ay, by)
            if w > 0 and h > 0:
                want[(i, 100 + j)] = float(w * h)
    assert got == want
