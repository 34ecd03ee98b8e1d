"""Grouped-map (applyInPandas) spatial refinement — the north_star's
"cell-keyed ... kNN nearest-road matching ... via applyInPandas" path.

The column-expression kNN in spatial/join.py is the fast path (whole-stage
codegen, WindowGroupLimit). This module provides the equivalent grouped
numpy kernel for geometry refinements that do NOT decompose into column
expressions (true polyline distance over many vertices, azimuth-aware
side-of-street, projective matching). Results are identical to knn_join —
asserted in tests — because a point lives in exactly one cell and the
ring-1 segment cover routes every in-radius candidate into that cell's
group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from .cells import DEFAULT_CELL_SIZE, point_cell, segment_bbox_cover
from .join import DEFAULT_RADIUS_M

KNN_SCHEMA = StructType(
    [
        StructField("point_id", LongType()),
        StructField("road_id", LongType()),
        StructField("rank", IntegerType()),
        StructField("dist2", DoubleType()),
        StructField("cell", LongType()),
    ]
)


def knn_join_grouped(
    points: DataFrame,
    roads: DataFrame,
    k: int = 1,
    radius_m: float = DEFAULT_RADIUS_M,
    cell_size: float = DEFAULT_CELL_SIZE,
) -> DataFrame:
    """Same contract as spatial.join.knn_join, computed per cell group in
    a vectorized numpy kernel (one (points_in_cell × candidate_segments)
    distance matrix per group)."""
    assert radius_m <= cell_size, "lossless pruning needs radius <= cell_size"
    pts = points.select(
        F.col("objectid").alias("point_id"),
        "px",
        "py",
        point_cell(F.col("px"), F.col("py"), cell_size).alias("cell"),
    )
    cover = segment_bbox_cover(
        roads.select(F.col("objectid").alias("road_id"), "x1", "y1", "x2", "y2"),
        cell_size=cell_size,
        ring=1,
    )
    cand = pts.join(cover, "cell")
    r2 = float(radius_m) ** 2

    def refine(pdf: pd.DataFrame) -> pd.DataFrame:
        # one group == one cell: dedupe point rows (each point repeats per
        # candidate segment) then batch the distance matrix
        pids, p_idx = np.unique(pdf["point_id"].to_numpy(np.int64), return_inverse=True)
        rids, r_idx = np.unique(pdf["road_id"].to_numpy(np.int64), return_inverse=True)
        px = np.zeros(len(pids)); py = np.zeros(len(pids))
        px[p_idx] = pdf["px"].to_numpy(np.float64)
        py[p_idx] = pdf["py"].to_numpy(np.float64)
        x1 = np.zeros(len(rids)); y1 = np.zeros(len(rids))
        x2 = np.zeros(len(rids)); y2 = np.zeros(len(rids))
        x1[r_idx] = pdf["x1"].to_numpy(np.float64)
        y1[r_idx] = pdf["y1"].to_numpy(np.float64)
        x2[r_idx] = pdf["x2"].to_numpy(np.float64)
        y2[r_idx] = pdf["y2"].to_numpy(np.float64)
        # candidate mask: only (point, road) pairs present in the group
        mask = np.zeros((len(pids), len(rids)), dtype=bool)
        mask[p_idx, r_idx] = True
        abx, aby = (x2 - x1)[None, :], (y2 - y1)[None, :]
        len2 = abx * abx + aby * aby
        dot = (px[:, None] - x1[None, :]) * abx + (py[:, None] - y1[None, :]) * aby
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.clip(np.where(len2 > 0, dot / np.where(len2 == 0, 1, len2), 0.0), 0, 1)
        ddx = px[:, None] - (x1[None, :] + t * abx)
        ddy = py[:, None] - (y1[None, :] + t * aby)
        d2 = ddx * ddx + ddy * ddy
        d2[~mask] = np.inf
        out_rows = []
        cell_id = int(pdf["cell"].iloc[0])
        for i in range(len(pids)):
            order = np.lexsort((rids, d2[i]))
            cnt = 0
            for j in order:
                if d2[i, j] > r2 or not np.isfinite(d2[i, j]):
                    break
                cnt += 1
                out_rows.append((int(pids[i]), int(rids[j]), cnt, float(d2[i, j]), cell_id))
                if cnt == k:
                    break
        return pd.DataFrame(out_rows, columns=["point_id", "road_id", "rank", "dist2", "cell"])

    return cand.groupBy("cell").applyInPandas(refine, schema=KNN_SCHEMA)
