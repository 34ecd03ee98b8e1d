"""Polyline simplification (round 5): distributed Douglas–Peucker.

The geometry-reduction primitive (generalization for web-map tiles,
storage compaction of densified traces). Spark shape: one applyInPandas
over the line key — per-line vertex counts are bounded (a polyline's
vertices fit one task by construction), so the only shuffle is the
group-by-line exchange; the kernel is numpy over Arrow batches, no
per-row Python.

The kernel is the classic stack-based DP: keep the endpoints, find the
vertex farthest from the chord, split there while the distance exceeds
the tolerance. Deterministic: np.argmax takes the FIRST max index, and
all arithmetic is IEEE double — the pure-Python reference in
tests/test_round5b_ops.py reproduces it exactly on jittered corpora.

The gate entry runs it over the densified road samples (segment_sample),
which are collinear by construction — DP therefore returns exactly the
two chord endpoints per line, which is what the DuckDB oracle states in
SQL (min/max seq per line). The nontrivial geometry path (planted
perpendicular jitter, tolerance splits) is pinned by the pytest against
the independent reference implementation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

SIMPLIFY_SCHEMA = "road_id long, seq long, sx double, sy double"


def _dp_mask(xs: np.ndarray, ys: np.ndarray, tol: float) -> np.ndarray:
    """Boolean keep-mask for one vertex chain (stack-based DP)."""
    n = xs.shape[0]
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    if n <= 2:
        return keep
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        ax, ay, bx, by = xs[a], ys[a], xs[b], ys[b]
        dx, dy = bx - ax, by - ay
        seg = np.hypot(dx, dy)
        ix = np.arange(a + 1, b)
        if seg == 0.0:
            d = np.hypot(xs[ix] - ax, ys[ix] - ay)
        else:
            # perpendicular distance to the (infinite) chord line — the
            # classic DP distance; endpoints of the chord bound the chain
            d = np.abs(dx * (ys[ix] - ay) - dy * (xs[ix] - ax)) / seg
        j = int(ix[int(np.argmax(d))])
        if float(d.max()) > tol:
            keep[j] = True
            stack.append((a, j))
            stack.append((j, b))
    return keep


def polyline_simplify(vertices: DataFrame, tolerance: float = 1.0) -> DataFrame:
    """Simplify per-line vertex chains (road_id, seq, sx, sy) — returns
    the kept vertices with their ORIGINAL seq (so downstream joins still
    line up). tolerance in the coordinate units (meters here)."""
    tol = float(tolerance)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        m = _dp_mask(
            pdf["sx"].to_numpy(np.float64), pdf["sy"].to_numpy(np.float64), tol
        )
        return pdf.loc[m, ["road_id", "seq", "sx", "sy"]]

    return (
        vertices.select("road_id", "seq", "sx", "sy")
        .groupBy("road_id")
        .applyInPandas(run, SIMPLIFY_SCHEMA)
    )


def oracle_simplify_collinear_sql(samples_cte: str = "ss_pts") -> str:
    """Oracle for DP over COLLINEAR chains (the densified road samples):
    every interior vertex is exactly on the chord, so for any tolerance
    > 0 the simplification is precisely the first+last vertex per line.
    `samples_cte` must provide (road_id, seq, sx, sy)."""
    return f"""
dp_rng AS (
  SELECT road_id, min(seq) AS lo, max(seq) AS hi
  FROM {samples_cte} GROUP BY road_id
)
SELECT s.road_id, s.seq, s.sx, s.sy
FROM {samples_cte} s JOIN dp_rng r
  ON r.road_id = s.road_id AND (s.seq = r.lo OR s.seq = r.hi)"""
