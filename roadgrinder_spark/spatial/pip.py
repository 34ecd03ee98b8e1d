"""Point-in-polygon (J5 family, north rule: "point-in-polygon").

Zones are polygon rings (array<struct<x,y>>, closed). Two paths:
  * engine: broadcast the zone dimension, evaluate a vectorized numpy
    ray-cast over Arrow batches (mapInPandas) — works for ARBITRARY
    simple polygons; each batch tests all points against all zone
    vertices in one (points × vertices) ndarray pass.
  * oracle: the derived test zones are axis-aligned rectangles, so the
    same answer is expressible as BETWEEN filters in DuckDB — which
    cross-checks the ray-cast kernel end-to-end.

Zone bounds sit on odd multiples of 3.125 while point coordinates are
multiples of 6.25, so no point ever lies exactly on a boundary and the
ray-cast's half-open semantics agree with BETWEEN.

Scale: zones are a dimension table (thousands of rows) → broadcast; the
fact side streams through mapInPandas with no shuffle. For zone sets too
large to broadcast, pre-cover zones with grid cells (spatial/cells) and
cell-join first — same pattern as knn_join.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

#: zones derived from `nation` (25 rows): one rectangle per nation key,
#: laid out on a 5x5 grid of 10 km squares with 3.125 m inset.
ZONES_CTE = """
zones AS (
  SELECT
    n_nationkey AS zone_id,
    n_name AS zone_name,
    CAST(400000 + (n_nationkey % 5) * 10000 AS DOUBLE) + 3.125 AS x_min,
    CAST(400000 + (n_nationkey % 5) * 10000 + 10000 AS DOUBLE) - 3.125 AS x_max,
    CAST(4500000 + CAST(FLOOR(n_nationkey / 5) AS BIGINT) * 10000 AS DOUBLE) + 3.125 AS y_min,
    CAST(4500000 + CAST(FLOOR(n_nationkey / 5) AS BIGINT) * 10000 + 10000 AS DOUBLE) - 3.125 AS y_max
  FROM nation
)
"""


def derive_zones(spark, sf_dir: str) -> DataFrame:
    """Zone rectangles + their closed rings (ring built Spark-side; the
    oracle only needs the min/max columns)."""
    spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView("nation")
    rect = spark.sql(f"WITH {ZONES_CTE.strip().strip(',')} SELECT * FROM zones")
    ring = F.array(
        F.struct(F.col("x_min").alias("x"), F.col("y_min").alias("y")),
        F.struct(F.col("x_max").alias("x"), F.col("y_min").alias("y")),
        F.struct(F.col("x_max").alias("x"), F.col("y_max").alias("y")),
        F.struct(F.col("x_min").alias("x"), F.col("y_max").alias("y")),
        F.struct(F.col("x_min").alias("x"), F.col("y_min").alias("y")),
    )
    return rect.withColumn("ring", ring)


def ray_cast_numpy(
    px: np.ndarray, py: np.ndarray, ring_x: np.ndarray, ring_y: np.ndarray
) -> np.ndarray:
    """Vectorized even-odd ray cast: (n_points,) bool for one ring.

    ring_x/ring_y: (n_vertices,) closed ring (first == last). Standard
    crossing test evaluated for all points at once.
    """
    x1, y1 = ring_x[:-1][None, :], ring_y[:-1][None, :]
    x2, y2 = ring_x[1:][None, :], ring_y[1:][None, :]
    p_x, p_y = px[:, None], py[:, None]
    crosses = (y1 > p_y) != (y2 > p_y)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_at = x1 + (p_y - y1) * (x2 - x1) / np.where(y2 == y1, 1.0, y2 - y1)
    hits = crosses & (p_x < x_at)
    return hits.sum(axis=1) % 2 == 1


def pip_join(points: DataFrame, zones: DataFrame) -> DataFrame:
    """(point_id, zone_id) for every point inside a zone ring.

    Broadcast-dimension pattern: zone rings are collected once (small
    dim), shipped in the closure, and each Arrow batch of points is
    tested against every ring in vectorized numpy.
    """
    zone_rows = zones.select("zone_id", "ring").collect()
    rings = [
        (
            int(r["zone_id"]),
            np.array([v["x"] for v in r["ring"]], dtype=np.float64),
            np.array([v["y"] for v in r["ring"]], dtype=np.float64),
        )
        for r in zone_rows
    ]
    bc = points.sparkSession.sparkContext.broadcast(rings)
    schema = StructType(
        [StructField("point_id", LongType()), StructField("zone_id", LongType())]
    )

    def test(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = pdf["px"].to_numpy(np.float64)
            py = pdf["py"].to_numpy(np.float64)
            pid = pdf["point_id"].to_numpy(np.int64)
            out_p, out_z = [], []
            for zid, rx, ry in bc.value:  # zones: small dim, not per-row
                inside = ray_cast_numpy(px, py, rx, ry)
                out_p.append(pid[inside])
                out_z.append(np.full(int(inside.sum()), zid, dtype=np.int64))
            yield pd.DataFrame(
                {
                    "point_id": np.concatenate(out_p) if out_p else [],
                    "zone_id": np.concatenate(out_z) if out_z else [],
                }
            )

    pts = points.select(F.col("objectid").alias("point_id"), "px", "py")
    return pts.mapInPandas(test, schema=schema)


def oracle_pip_sql() -> str:
    """Rect-zone oracle: BETWEEN join (IEJoin in DuckDB)."""
    return """
SELECT p.objectid AS point_id, z.zone_id
FROM addrpnts p JOIN zones z
  ON p.px > z.x_min AND p.px < z.x_max
 AND p.py > z.y_min AND p.py < z.y_max"""


def zonal_stats(points: DataFrame, zones: DataFrame) -> DataFrame:
    """Zonal statistics: per zone, the count / exact centroid / bounding
    extent of the points inside it — the aggregate companion to pip_join
    (standard GIS 'zonal stats' over a polygon layer).

    Exactness without float-aggregation drift: point coordinates are
    multiples of 6.25 m (see module docstring), so px*16 is an exact
    integer — the centroid is accumulated as BIGINT sums (association-
    order-free) and converted to metres once at the end. min/max are
    order-free already. One shuffle after the broadcast PIP pass."""
    hits = pip_join(points, zones)
    pts = points.select(F.col("objectid").alias("point_id"), "px", "py")
    agg = (
        hits.join(pts, "point_id")
        .groupBy("zone_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum((F.col("px") * 16).cast("long")).alias("_sx"),
            F.sum((F.col("py") * 16).cast("long")).alias("_sy"),
            F.min("px").alias("x_min_pt"),
            F.max("px").alias("x_max_pt"),
            F.min("py").alias("y_min_pt"),
            F.max("py").alias("y_max_pt"),
        )
    )
    return agg.join(
        F.broadcast(zones.select("zone_id", "zone_name")), "zone_id"
    ).select(
        "zone_id",
        "zone_name",
        "n_points",
        F.round(F.col("_sx") / 16.0 / F.col("n_points"), 6).alias("centroid_x"),
        F.round(F.col("_sy") / 16.0 / F.col("n_points"), 6).alias("centroid_y"),
        "x_min_pt",
        "x_max_pt",
        "y_min_pt",
        "y_max_pt",
    )


def oracle_zonal_stats_sql() -> str:
    return """
zs_hits AS (
  SELECT p.objectid AS point_id, z.zone_id, p.px, p.py
  FROM addrpnts p JOIN zones z
    ON p.px > z.x_min AND p.px < z.x_max
   AND p.py > z.y_min AND p.py < z.y_max
),
zs_agg AS (
  SELECT zone_id, count(*) AS n_points,
         CAST(sum(CAST(px * 16 AS BIGINT)) AS BIGINT) AS _sx,
         CAST(sum(CAST(py * 16 AS BIGINT)) AS BIGINT) AS _sy,
         min(px) AS x_min_pt, max(px) AS x_max_pt,
         min(py) AS y_min_pt, max(py) AS y_max_pt
  FROM zs_hits GROUP BY zone_id
)
SELECT a.zone_id, z.zone_name, a.n_points,
       round(_sx / 16.0 / n_points, 6) AS centroid_x,
       round(_sy / 16.0 / n_points, 6) AS centroid_y,
       x_min_pt, x_max_pt, y_min_pt, y_max_pt
FROM zs_agg a JOIN zones z ON z.zone_id = a.zone_id"""


#: second zone layer for overlay tests: the same nation-derived grid
#: shifted half a cell diagonally (ids offset by 100). Deterministic and
#: dual-dialect like ZONES_CTE.
ZONES_B_CTE = """
zones_b AS (
  SELECT zone_id + 100 AS zone_id, zone_name,
         x_min + 5000.0 AS x_min, x_max + 5000.0 AS x_max,
         y_min + 5000.0 AS y_min, y_max + 5000.0 AS y_max
  FROM zones
)
"""


def derive_zones_shifted(spark, sf_dir: str) -> DataFrame:
    z = derive_zones(spark, sf_dir)
    return z.select(
        (F.col("zone_id") + 100).alias("zone_id"),
        "zone_name",
        (F.col("x_min") + 5000.0).alias("x_min"),
        (F.col("x_max") + 5000.0).alias("x_max"),
        (F.col("y_min") + 5000.0).alias("y_min"),
        (F.col("y_max") + 5000.0).alias("y_max"),
    )


def zone_overlay(zones_a: DataFrame, zones_b: DataFrame) -> DataFrame:
    """Polygon overlay (rectangular zones): every intersecting (a, b)
    pair with its intersection area — the classic GIS overlay, here a
    broadcast join with interval arithmetic (bounds are exact binary
    fractions, so areas are bit-identical cross-engine). For zone layers
    too large to broadcast, cell-cover both layers and equi-join on cell
    first (the knn_join pattern); the per-pair arithmetic is unchanged."""
    a = zones_a.select(
        F.col("zone_id").alias("zone_a"),
        F.col("x_min").alias("ax0"), F.col("x_max").alias("ax1"),
        F.col("y_min").alias("ay0"), F.col("y_max").alias("ay1"),
    )
    b = zones_b.select(
        F.col("zone_id").alias("zone_b"),
        F.col("x_min").alias("bx0"), F.col("x_max").alias("bx1"),
        F.col("y_min").alias("by0"), F.col("y_max").alias("by1"),
    )
    w = F.least("ax1", "bx1") - F.greatest("ax0", "bx0")
    h = F.least("ay1", "by1") - F.greatest("ay0", "by0")
    return (
        a.join(
            F.broadcast(b),
            (F.col("ax0") < F.col("bx1")) & (F.col("bx0") < F.col("ax1"))
            & (F.col("ay0") < F.col("by1")) & (F.col("by0") < F.col("ay1")),
        )
        .select("zone_a", "zone_b", (w * h).alias("inter_area"))
    )


def oracle_zone_overlay_sql() -> str:
    """Requires zones + zones_b CTEs in scope."""
    return """
SELECT a.zone_id AS zone_a, b.zone_id AS zone_b,
       (least(a.x_max, b.x_max) - greatest(a.x_min, b.x_min))
     * (least(a.y_max, b.y_max) - greatest(a.y_min, b.y_min)) AS inter_area
FROM zones a JOIN zones_b b
  ON a.x_min < b.x_max AND b.x_min < a.x_max
 AND a.y_min < b.y_max AND b.y_min < a.y_max"""


def areal_interp(
    raster: DataFrame, zones: DataFrame, cell_size: float = 125.0
) -> DataFrame:
    """Areal interpolation: transfer the cell raster's point counts onto
    the zone layer, each cell weighted by its EXACT overlap fraction
    with the zone — the standard GIS re-aggregation when source and
    target units don't nest (census tracts -> service areas). Returns
    (zone_id, zone_name, n_cells, wsum64, est_points).

    Exactness: cell bounds are multiples of cell_size and zone bounds
    multiples of 1/8 m (ZONES_CTE's +-3.125 insets), so overlap widths
    x8 are exact integers and area x64 is an exact BIGINT — the weighted
    count accumulates as SUM(n * area64) in integer arithmetic
    (association-order-free, the zonal_stats discipline) and divides by
    the constant cell area (cell_size^2 * 64; 1e6 at the 125 m default)
    ONCE at the end. cell_size MUST match the raster's and be a multiple
    of 1/8 m — validated, not assumed (a mismatched cell_size would be
    silently wrong everywhere).

    Plan: one broadcast nested-loop join of the aggregated raster
    against the small zone dimension (the pip_join pattern — zones are
    the broadcast side by construction), then one hash aggregate keyed
    by zone. Scale is bounded by OCCUPIED CELLS, not points; for zone
    layers too large to broadcast, cell-cover the zones and equi-join on
    cell id first (the knn_join pattern), per-pair arithmetic unchanged.
    """
    s = float(cell_size)
    if s <= 0 or not (s * 8).is_integer():
        raise ValueError(
            "cell_size must be a positive multiple of 1/8 m for exact "
            "integer overlap areas"
        )
    c = raster.select(
        "cx", "cy", "n",
        (F.col("cx") * F.lit(s)).alias("x0"),
        ((F.col("cx") + 1) * F.lit(s)).alias("x1"),
        (F.col("cy") * F.lit(s)).alias("y0"),
        ((F.col("cy") + 1) * F.lit(s)).alias("y1"),
    )
    z = zones.select(
        "zone_id", "zone_name",
        F.col("x_min").alias("zx0"), F.col("x_max").alias("zx1"),
        F.col("y_min").alias("zy0"), F.col("y_max").alias("zy1"),
    )
    w8 = ((F.least("x1", "zx1") - F.greatest("x0", "zx0")) * 8).cast("long")
    h8 = ((F.least("y1", "zy1") - F.greatest("y0", "zy0")) * 8).cast("long")
    area64 = w8 * h8
    hits = c.join(
        F.broadcast(z),
        (F.col("x0") < F.col("zx1")) & (F.col("zx0") < F.col("x1"))
        & (F.col("y0") < F.col("zy1")) & (F.col("zy0") < F.col("y1")),
    )
    agg = hits.groupBy("zone_id", "zone_name").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.col("n") * area64).alias("wsum64"),
    )
    cell_area64 = float(int(s * 8) * int(s * 8))
    return agg.select(
        "zone_id", "zone_name", "n_cells", "wsum64",
        F.round(F.col("wsum64") / F.lit(cell_area64), 6).alias("est_points"),
    )


def oracle_areal_interp_sql() -> str:
    """Requires zones CTE + a rasterize CTE named ai_cells in scope."""
    return """
ai_rect AS (
  SELECT cx, cy, n,
         cx * 125.0 AS x0, (cx + 1) * 125.0 AS x1,
         cy * 125.0 AS y0, (cy + 1) * 125.0 AS y1
  FROM ai_cells
),
ai_hits AS (
  SELECT z.zone_id, z.zone_name, c.n,
         CAST((least(c.x1, z.x_max) - greatest(c.x0, z.x_min)) * 8
              AS BIGINT)
       * CAST((least(c.y1, z.y_max) - greatest(c.y0, z.y_min)) * 8
              AS BIGINT) AS area64
  FROM ai_rect c JOIN zones z
    ON c.x0 < z.x_max AND z.x_min < c.x1
   AND c.y0 < z.y_max AND z.y_min < c.y1
)
SELECT zone_id, zone_name, count(*) AS n_cells,
       CAST(sum(n * area64) AS BIGINT) AS wsum64,
       ROUND(CAST(sum(n * area64) AS BIGINT) / 1000000.0, 6) AS est_points
FROM ai_hits GROUP BY 1, 2"""
