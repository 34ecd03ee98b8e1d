"""Raster ↔ vector conversions over the grid-cell index (north rule:
"raster↔vector").

A "raster" here is the canonical distributed form: one row per non-empty
cell with band values — (cell, cx, cy, value…). Rasterize = aggregate
vector features into cells (one hash aggregate, map-side combined).
Vectorize = emit geometry (WKT) back out of cells; contiguous regions of
a thresholded raster are merged into per-region multi-cell geometries via
an iterative label-propagation join (connected components), each step a
cell-neighbor equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cells import CY_BIAS, DEFAULT_CELL_SIZE, PACK, cell_xy, pack_cell


def rasterize_points(
    points: DataFrame, cell_size: float = DEFAULT_CELL_SIZE
) -> DataFrame:
    """Point density raster: (cell, cx, cy, n)."""
    cx, cy = cell_xy(F.col("px"), F.col("py"), cell_size)
    return (
        points.select(cx.alias("cx"), cy.alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(pack_cell(F.col("cx"), F.col("cy")).alias("cell"), "cx", "cy", "n")
    )


def oracle_rasterize_points_sql(cell_size: float = DEFAULT_CELL_SIZE) -> str:
    return f"""
SELECT cx * {PACK} + cy + {CY_BIAS} AS cell, cx, cy, count(*) AS n
FROM (
  SELECT CAST(FLOOR(px / {cell_size}) AS BIGINT) AS cx,
         CAST(FLOOR(py / {cell_size}) AS BIGINT) AS cy
  FROM addrpnts
) GROUP BY cx, cy"""


def raster_to_vector(raster: DataFrame, cell_size: float = DEFAULT_CELL_SIZE) -> DataFrame:
    """Cell → polygon WKT (the cell's bbox). Pure string arithmetic, so
    it is oracle-checkable; geometry leaves the engine as standard WKT."""
    s = float(cell_size)

    def coord(c, mult):
        # cell coords are integers; corner = c * size with size=125.0 →
        # exact; render via BIGINT when integral to match DuckDB's format
        return (c * F.lit(s) + F.lit(mult * s)).cast("long").cast("string")

    wkt = F.concat(
        F.lit("POLYGON (("),
        coord(F.col("cx"), 0), F.lit(" "), coord(F.col("cy"), 0), F.lit(", "),
        coord(F.col("cx"), 1), F.lit(" "), coord(F.col("cy"), 0), F.lit(", "),
        coord(F.col("cx"), 1), F.lit(" "), coord(F.col("cy"), 1), F.lit(", "),
        coord(F.col("cx"), 0), F.lit(" "), coord(F.col("cy"), 1), F.lit(", "),
        coord(F.col("cx"), 0), F.lit(" "), coord(F.col("cy"), 0),
        F.lit("))"),
    )
    return raster.select("cell", "n", wkt.alias("wkt"))


def oracle_raster_to_vector_sql(cell_size: float = DEFAULT_CELL_SIZE) -> str:
    s = cell_size
    base = oracle_rasterize_points_sql(cell_size)

    def coord(c, mult):
        return f"CAST(CAST({c} * {s} + {mult * s} AS BIGINT) AS STRING)"

    wkt = (
        f"'POLYGON ((' || {coord('cx', 0)} || ' ' || {coord('cy', 0)} || ', ' || "
        f"{coord('cx', 1)} || ' ' || {coord('cy', 0)} || ', ' || "
        f"{coord('cx', 1)} || ' ' || {coord('cy', 1)} || ', ' || "
        f"{coord('cx', 0)} || ' ' || {coord('cy', 1)} || ', ' || "
        f"{coord('cx', 0)} || ' ' || {coord('cy', 0)} || '))'"
    )
    return f"SELECT cell, n, {wkt} AS wkt FROM ({base})"


def oracle_threshold_regions_sql(
    cell_size: float = DEFAULT_CELL_SIZE, min_count: int = 1
) -> str:
    """DuckDB recursive-CTE oracle for threshold_regions: transitive
    closure over the 4-neighborhood edge set, then min label per cell —
    identical semantics to the distributed label propagation. Needs the
    `addrpnts` CTE in scope and a WITH RECURSIVE prefix."""
    return f"""
tr_rast AS (
  SELECT CAST(FLOOR(px / {cell_size}) AS BIGINT) AS cx,
         CAST(FLOOR(py / {cell_size}) AS BIGINT) AS cy, count(*) AS n
  FROM addrpnts GROUP BY 1, 2
),
tr_cells AS (
  SELECT cx, cy, cx * {PACK} + cy + {CY_BIAS} AS cell
  FROM tr_rast WHERE n >= {min_count}
),
tr_edges AS (
  SELECT a.cell AS ca, b.cell AS cb
  FROM tr_cells a JOIN tr_cells b
    ON abs(a.cx - b.cx) + abs(a.cy - b.cy) = 1
),
tr_walk(cell, label) AS (
  SELECT cell, cell FROM tr_cells
  UNION
  SELECT e.ca, w.label FROM tr_walk w JOIN tr_edges e ON e.cb = w.cell
)
SELECT cell, min(label) AS region FROM tr_walk GROUP BY cell"""


def threshold_regions(
    raster: DataFrame, min_count: int = 1, max_iters: int = 20
) -> DataFrame:
    """Connected components (4-neighborhood) of cells with n >= min_count.

    Label propagation: every cell starts labeled with its own cell id;
    each iteration joins cells to their 4 neighbors and takes the min
    label; stops early when no label changes. Iterations are O(diameter
    of the largest region) — for density blobs that is tens, not
    thousands; each step is one equi-join on the packed neighbor id.
    Returns (cell, region) — region = min cell id of the component.
    """
    cells = raster.filter(F.col("n") >= min_count).select("cell", "cx", "cy")
    labels = cells.withColumn("region", F.col("cell"))
    neighbor_offsets = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    converged = False
    for _ in range(max_iters):
        nbrs = None
        for dx, dy in neighbor_offsets:
            shifted = labels.select(
                pack_cell(F.col("cx") + dx, F.col("cy") + dy).alias("cell"),
                F.col("region").alias("nbr_region"),
            )
            nbrs = shifted if nbrs is None else nbrs.unionByName(shifted)
        joined = (
            labels.join(nbrs, "cell", "left")
            .groupBy("cell", "cx", "cy")
            .agg(
                F.least(
                    F.min("nbr_region"), F.first("region", ignorenulls=True)
                ).alias("new_region"),
                F.first("region", ignorenulls=True).alias("region"),
            )
        )
        stepped = joined.select(
            "cell",
            "cx",
            "cy",
            F.coalesce(F.least("new_region", "region"), F.col("region")).alias("region"),
            F.col("region").alias("_old"),
        )
        # pointer-jumping hop (ADVICE r1): region := label of the cell the
        # current region points to (labels are always cell ids within the
        # component, so the lookup is a plain equi-join). Halves the
        # remaining diameter each pass -> convergence in O(log d), so
        # max_iters=20 covers regions ~2^20 cells across.
        hop = labels.select(
            F.col("cell").alias("region"), F.col("region").alias("_hopr")
        )
        stepped = stepped.join(hop, "region", "left").select(
            "cell",
            "cx",
            "cy",
            F.least(F.coalesce("_hopr", "region"), F.col("region")).alias("region"),
            "_old",
        )
        changed = stepped.filter(F.col("region") < F.col("_old")).limit(1).count()
        labels = stepped.drop("_old").localCheckpoint()  # truncate lineage
        if changed == 0:
            converged = True
            break
    if not converged:
        # silently returning split regions would corrupt downstream rollups
        raise RuntimeError(
            f"threshold_regions: label propagation did not converge in "
            f"{max_iters} iterations — raise max_iters (pointer-jumping "
            f"needs ~log2(region diameter) passes)"
        )
    return labels.select("cell", "region")
