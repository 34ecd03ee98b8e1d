"""Deterministic planar grid-cell index (H3/S2 stand-in, J5 substrate).

No H3/S2 native lib exists in this environment, and the north rule only
needs a *deterministic, reproducible-across-cluster-sizes* cell id. We use
a square grid over projected meters (NAD83/UTM-style coords):

    cx = floor(x / cell_size),  cy = floor(y / cell_size)
    cell_id = cx * 2^26 + cy            (packed BIGINT)

Properties that matter:
  * pure integer arithmetic → bit-identical across engines, parallelism
    levels, and cluster sizes (tile-parity requirement, BASELINE.json);
  * SQL-expressible → every tile assignment is DuckDB-oracle checkable;
  * resolution ladder: halving cell_size = one finer level (quadtree).

Candidate-generation guarantee used by the kNN join: if cell_size >= R
(match radius), any point within R of a segment lies in the segment's
bbox cover dilated by ring=1. Proof sketch: the point's cell center is
within R + cell diagonal of the segment's bbox, and one ring covers any
offset < cell_size in each axis.

Segment cover here is *bbox cover* via built-in sequence()/explode — pure
JVM whole-stage-codegen, no Python in the hot path. Road substrates are
pre-split into short segments (SGID centerlines are; ours are <=150 m), so
bbox cover is at most ~(2+2r)^2 cells. For long diagonal geometries use
`supercover_cells_udf` (vectorized numpy pandas_udf) instead — O(cells
touched), not O(bbox area).

Reference parity note: the reference has NO spatial join (the NextGen
grinder throws, grinders/NextGenGrinder.cs:6-17); this layer implements
the capability BASELINE.json `north_star` mandates.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

#: 2^26 cells per axis — at 31.25 m resolution that spans ±2097 km, far
#: beyond any single projected CRS zone.
PACK = 1 << 26
#: cy bias before packing (ADVICE r1): raw packing cx*PACK + cy is not
#: injective for negative cy — (cx, -1) collides with (cx-1, PACK-1).
#: Biasing cy into [0, PACK) makes the pack injective over
#: cy in [-2^25, 2^25), i.e. y in ±4194 km at the default 125 m cell —
#: every projected-CRS zone, both hemispheres.
CY_BIAS = 1 << 25

#: default grid resolution (m). >= default match radius (100 m) so the
#: ring=1 cover guarantee holds.
DEFAULT_CELL_SIZE = 125.0


def cell_xy(x: Column, y: Column, cell_size: float) -> tuple[Column, Column]:
    return (
        F.floor(x / F.lit(float(cell_size))).cast("long"),
        F.floor(y / F.lit(float(cell_size))).cast("long"),
    )


def pack_cell(cx: Column, cy: Column) -> Column:
    return (cx * F.lit(PACK) + cy + F.lit(CY_BIAS)).cast("long")


def point_cell(x: Column, y: Column, cell_size: float = DEFAULT_CELL_SIZE) -> Column:
    """Tile assignment for a point — the `tiles` parity column."""
    cx, cy = cell_xy(x, y, cell_size)
    return pack_cell(cx, cy)


def point_cell_sql(x: str, y: str, cell_size: float = DEFAULT_CELL_SIZE) -> str:
    """DuckDB/ANSI spelling of point_cell (for oracle SQL)."""
    return (
        f"CAST(FLOOR({x} / {cell_size}) AS BIGINT) * {PACK} "
        f"+ CAST(FLOOR({y} / {cell_size}) AS BIGINT) + {CY_BIAS}"
    )


def segment_bbox_cover(
    df: DataFrame,
    cell_size: float = DEFAULT_CELL_SIZE,
    ring: int = 1,
    x1: str = "x1",
    y1: str = "y1",
    x2: str = "x2",
    y2: str = "y2",
    out: str = "cell",
) -> DataFrame:
    """Explode each segment row into one row per covered cell (+ring).

    Pure built-in expressions: sequence() over the bbox cell ranges,
    exploded twice. Stays inside whole-stage codegen; Catalyst prunes and
    pushes the rest of the plan around it.
    """
    s = float(cell_size)
    cx_lo = F.floor(F.least(F.col(x1), F.col(x2)) / s).cast("long") - ring
    cx_hi = F.floor(F.greatest(F.col(x1), F.col(x2)) / s).cast("long") + ring
    cy_lo = F.floor(F.least(F.col(y1), F.col(y2)) / s).cast("long") - ring
    cy_hi = F.floor(F.greatest(F.col(y1), F.col(y2)) / s).cast("long") + ring
    return (
        df.withColumn("_cx", F.explode(F.sequence(cx_lo, cx_hi)))
        .withColumn("_cy", F.explode(F.sequence(cy_lo, cy_hi)))
        .withColumn(out, pack_cell(F.col("_cx"), F.col("_cy")))
        .drop("_cx", "_cy")
    )


# ---------------------------------------------------------------------------
# Vectorized numpy kernels (Arrow pandas_udf) — the long-segment path and
# the locality (Morton) key. No per-row Python: everything is ndarray ops.
# ---------------------------------------------------------------------------

def _morton_interleave(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    """Interleave low 26 bits of cx/cy → Z-order key (locality clustering)."""

    def spread(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.uint64) & np.uint64((1 << 26) - 1)
        v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
        return v

    return (spread(cx) | (spread(cy) << np.uint64(1))).astype(np.int64)


@F.pandas_udf(LongType())
def morton_cell_udf(cx: pd.Series, cy: pd.Series) -> pd.Series:
    """Z-order locality key from cell coords — use as a repartition /
    Iceberg sort key so spatially-near cells land in the same files."""
    return pd.Series(_morton_interleave(cx.to_numpy(np.int64), cy.to_numpy(np.int64)))


def supercover_numpy(
    x1: np.ndarray,
    y1: np.ndarray,
    x2: np.ndarray,
    y2: np.ndarray,
    cell_size: float,
    ring: int = 0,
) -> list[np.ndarray]:
    """Exact grid supercover (cells a segment passes through), vectorized.

    Parameterize each segment by t∈[0,1]; every cell-boundary crossing in
    x or y contributes a t value. The cell between two consecutive
    crossings is the cell of the interval midpoint — exactly the set of
    cells the segment intersects. All math is padded (n, max_crossings)
    ndarray ops; the only per-row work is the final unique-split.
    """
    n = len(x1)
    dx, dy = x2 - x1, y2 - y1
    cx1 = np.floor(x1 / cell_size).astype(np.int64)
    cx2 = np.floor(x2 / cell_size).astype(np.int64)
    cy1 = np.floor(y1 / cell_size).astype(np.int64)
    cy2 = np.floor(y2 / cell_size).astype(np.int64)
    nx = np.abs(cx2 - cx1)
    ny = np.abs(cy2 - cy1)
    max_nx = int(nx.max()) if n else 0
    max_ny = int(ny.max()) if n else 0

    def crossings(c_lo, count, p1, dp, max_count):
        if max_count == 0:
            return np.full((n, 0), 1.0)
        ks = np.arange(1, max_count + 1, dtype=np.float64)[None, :]
        bounds = (c_lo[:, None] + ks) * cell_size
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (bounds - p1[:, None]) / dp[:, None]
        t = np.where(ks <= count[:, None], t, 1.0)  # pad -> degenerate
        return np.nan_to_num(t, nan=1.0, posinf=1.0, neginf=1.0)

    tx = crossings(np.minimum(cx1, cx2), nx, x1, dx, max_nx)
    ty = crossings(np.minimum(cy1, cy2), ny, y1, dy, max_ny)
    ends = np.tile(np.array([[0.0, 1.0]]), (n, 1))
    ts = np.sort(np.concatenate([ends, tx, ty], axis=1), axis=1)
    ts = np.clip(ts, 0.0, 1.0)
    mid = (ts[:, :-1] + ts[:, 1:]) / 2.0
    sx = x1[:, None] + mid * dx[:, None]
    sy = y1[:, None] + mid * dy[:, None]
    cx = np.floor(sx / cell_size).astype(np.int64)
    cy = np.floor(sy / cell_size).astype(np.int64)
    if ring:
        offs = np.arange(-ring, ring + 1, dtype=np.int64)
        ox, oy = np.meshgrid(offs, offs)
        cx = (cx[:, :, None] + ox.ravel()[None, None, :]).reshape(n, -1)
        cy = (cy[:, :, None] + oy.ravel()[None, None, :]).reshape(n, -1)
    packed = cx * PACK + cy + CY_BIAS
    out: list[np.ndarray] = []
    for i in range(n):  # O(rows) unique-split; heavy math above is batched
        out.append(np.unique(packed[i]))
    return out


def supercover_cells_udf(cell_size: float, ring: int = 0):
    """pandas_udf: (x1,y1,x2,y2) -> array<long> of covered cell ids."""

    @F.pandas_udf(ArrayType(LongType()))
    def _cover(x1: pd.Series, y1: pd.Series, x2: pd.Series, y2: pd.Series) -> pd.Series:
        cells = supercover_numpy(
            x1.to_numpy(np.float64),
            y1.to_numpy(np.float64),
            x2.to_numpy(np.float64),
            y2.to_numpy(np.float64),
            cell_size,
            ring,
        )
        return pd.Series(cells)

    return _cover


def choose_cell_size(
    points, candidates=(31.25, 62.5, 125.0, 250.0, 500.0),
    target_p99_per_cell: int = 50_000, sample_fraction: float = 0.05,
    min_radius_m: float = 100.0, seed: int = 42,
):
    """Resolution chooser: the finest candidate cell size (>= min_radius_m,
    to keep ring-1 pruning lossless) whose sampled p99 cell occupancy,
    scaled back up by the sample fraction, stays under the target.

    One sampled aggregate per candidate (cheap: the sample is scanned
    once per size; at 10^12 rows use a smaller fraction). Returns
    (cell_size, {size: estimated_p99_per_cell}).
    """
    from pyspark.sql import functions as F

    sample = points.sample(fraction=sample_fraction, seed=seed).select("px", "py")
    sample = sample.persist()
    stats = {}
    try:
        for s in sorted(candidates):
            if s < min_radius_m:
                continue
            occ = (
                sample.groupBy(point_cell(F.col("px"), F.col("py"), s).alias("c"))
                .count()
                .agg(F.expr("percentile_approx(count, 0.99)").alias("p99"))
                .collect()[0]["p99"]
            )
            stats[s] = int((occ or 0) / sample_fraction)
        for s in sorted(stats):
            if stats[s] <= target_p99_per_cell:
                return s, stats
        return max(stats), stats
    finally:
        sample.unpersist()


def segment_sample(roads, spacing: float = 50.0):
    """Densify segments into evenly-spaced points (map-matching /
    coverage-analysis substrate): each segment emits
    n = max(1, floor(len/spacing)) + 1 points at fractions i/n, endpoints
    inclusive. One sequence explode per row, no shuffle; output is
    O(total length / spacing) regardless of segment count.

    Float parity: sqrt is IEEE-exact and the lerp shares the engine's
    expression shapes, so (sx, sy) are bit-identical cross-engine."""
    from pyspark.sql import functions as F

    seg_len = F.sqrt(
        (F.col("x2") - F.col("x1")) * (F.col("x2") - F.col("x1"))
        + (F.col("y2") - F.col("y1")) * (F.col("y2") - F.col("y1"))
    )
    n = F.greatest(F.lit(1), F.floor(seg_len / F.lit(float(spacing)))).cast("long")
    t = F.col("i") / F.col("n")
    return (
        roads.select(
            F.col("objectid").alias("road_id"), "x1", "y1", "x2", "y2",
            n.alias("n"),
        )
        .select(
            "road_id", "x1", "y1", "x2", "y2", "n",
            F.explode(F.sequence(F.lit(0), F.col("n"))).alias("i"),
        )
        .select(
            "road_id",
            F.col("i").alias("seq"),
            (F.col("x1") + t * (F.col("x2") - F.col("x1"))).alias("sx"),
            (F.col("y1") + t * (F.col("y2") - F.col("y1"))).alias("sy"),
        )
    )


def oracle_segment_sample_sql(spacing: float = 50.0) -> str:
    s = float(spacing)
    return f"""
ss_base AS (
  SELECT objectid AS road_id, x1, y1, x2, y2,
         CAST(greatest(1, FLOOR(sqrt((x2 - x1) * (x2 - x1) +
                                     (y2 - y1) * (y2 - y1)) / {s})) AS BIGINT) AS n
  FROM roads
)
SELECT road_id, CAST(p.i AS BIGINT) AS seq,
       x1 + (CAST(p.i AS BIGINT) / n) * (x2 - x1) AS sx,
       y1 + (CAST(p.i AS BIGINT) / n) * (y2 - y1) AS sy
FROM ss_base b, LATERAL (SELECT unnest(range(0, b.n + 1)) AS i) p"""


# ---------------------------------------------------------------------------
# hexagonal cell index (round 4): an H3-style pointy-top hex binning —
# axial coordinates via the standard cube-rounding algorithm, pure column
# arithmetic (both engines run the identical IEEE expression shapes, so
# assignments are bit-identical). Hexagons give ~13% tighter worst-case
# cell radius than squares of equal area and uniform 6-neighbor
# adjacency — the reason H3 exists. The square grid stays the default
# join index (range cover over rectangles is simpler); the hex index
# serves density rollups / heatmaps.
# ---------------------------------------------------------------------------

_SQRT3_OVER_3 = "(sqrt(3.0) / 3.0)"


def _hex_qr_exprs(px: str, py: str, size: float) -> tuple[str, str]:
    """SQL expression strings for the axial (q, r) hex coordinates —
    used VERBATIM by both the Spark column builder (via F.expr) and the
    DuckDB oracle, so cross-engine parity is by construction.

    floor(x + 0.5) is the explicit round-half-up both engines share
    (their native round() functions disagree on halves)."""
    s = float(size)
    qf = f"({_SQRT3_OVER_3} * {px} - ({py}) / 3.0) / {s}"
    rf = f"((2.0 * ({py})) / 3.0) / {s}"
    xf, zf = qf, rf
    yf = f"(-({qf}) - ({rf}))"
    rx = f"FLOOR({xf} + 0.5)"
    ry = f"FLOOR({yf} + 0.5)"
    rz = f"FLOOR({zf} + 0.5)"
    dx = f"abs({rx} - ({xf}))"
    dy = f"abs({ry} - ({yf}))"
    dz = f"abs({rz} - ({zf}))"
    q = (
        f"CAST(CASE WHEN {dx} > {dy} AND {dx} > {dz} "
        f"THEN -({ry}) - ({rz}) ELSE {rx} END AS BIGINT)"
    )
    # rz is corrected in the textbook ELSE branch, i.e. when the rx-fix
    # did not fire AND NOT (dy > dz) — note >=: an exact dy == dz tie
    # (reachable: coordinates land on hex-edge midpoints) must fix rz,
    # or the rounded cube triple stays off-lattice (review r4)
    r = (
        f"CAST(CASE WHEN NOT ({dx} > {dy} AND {dx} > {dz}) "
        f"AND {dz} >= {dy} THEN -({rx}) - ({ry}) ELSE {rz} END AS BIGINT)"
    )
    return q, r


def hex_cell_cols(px, py, size: float = DEFAULT_CELL_SIZE):
    """(q, r) axial hex-cell Columns for point coordinates.

    Fine for AGGREGATE consumers (rasterize/neighborhood). Do NOT use the
    result as a JOIN key: the join's inferred isnotnull(key) predicate is
    pushed below upstream projections with the whole expression tree
    substituted in — the hex expression duplicates its qf/rf subtrees
    ~15×, and with derived inputs the pushed filter re-evaluates the
    fully-inlined monster on every SOURCE row (measured 22 s vs 0.8 s at
    sf0.1). Join paths use hex_pack_udf, which is opaque to pushdown."""
    from pyspark.sql import functions as F

    qs, rs = _hex_qr_exprs(str(px), str(py), size)
    return F.expr(qs), F.expr(rs)


def hex_pack_udf(size: float = DEFAULT_CELL_SIZE):
    """Packed hex cell id as a vectorized Arrow kernel. float64 op order
    mirrors _hex_qr_exprs exactly (same multiplies/divides/floor(x+0.5)
    half-up), so ids are bit-identical to the expression form — pinned
    by tests/test_round5_ops.py::test_hex_kernel_equals_expression.
    hex_knn itself stays JVM-side via a null-safe equality join (the
    better fix for the pushdown trap — see hex_cell_cols); this kernel
    is the alternative when a plan needs the id as a plain equi-join
    key or a partitioning column that must not be substituted into
    pushed predicates."""
    s = np.float64(float(size))

    @F.pandas_udf(LongType())
    def _pack(px: pd.Series, py: pd.Series) -> pd.Series:
        x = px.to_numpy(np.float64)
        y = py.to_numpy(np.float64)
        s3 = np.sqrt(np.float64(3.0)) / np.float64(3.0)
        qf = (s3 * x - y / 3.0) / s
        rf = ((2.0 * y) / 3.0) / s
        xf, zf = qf, rf
        yf = -qf - rf
        rx = np.floor(xf + 0.5)
        ry = np.floor(yf + 0.5)
        rz = np.floor(zf + 0.5)
        dx = np.abs(rx - xf)
        dy = np.abs(ry - yf)
        dz = np.abs(rz - zf)
        fix_x = (dx > dy) & (dx > dz)
        q = np.where(fix_x, -ry - rz, rx).astype(np.int64)
        r = np.where(~fix_x & (dz >= dy), -rx - ry, rz).astype(np.int64)
        return pd.Series(q * np.int64(PACK) + r + np.int64(CY_BIAS))

    return _pack


def hex_segment_cover(
    roads: DataFrame,
    size: float = DEFAULT_CELL_SIZE,
    pad: float = 0.0,
    out: str = "hcell",
) -> DataFrame:
    """Explode each segment into the hex cells whose CENTER lies inside
    the segment bbox dilated by `pad`, ±1 index ring of slack — the hex
    analogue of segment_bbox_cover, and the candidate-generation side of
    hex_knn.

    Losslessness: a pointy-top hex of size s has circumradius s, so any
    point inside hex (q, r) is within s of its center. If a point p is
    within `radius` of the segment, p lies in bbox+radius, hence p's hex
    center lies in bbox + radius + s — pass pad = radius + size and every
    possible candidate hex is enumerated (the ±1 ring absorbs the
    floor-boundary/fp edge). Pure sequence/explode arithmetic — stays in
    whole-stage codegen, same scale shape as the square cover.

    Hex centers: x = s*sqrt(3)*(q + r/2), y = s*1.5*r (inverse of the
    axial transform in _hex_qr_exprs)."""
    s = float(size)
    p = float(pad)
    r_pitch = 1.5 * s
    q_pitch = math.sqrt(3.0) * s
    x_lo = F.least(F.col("x1"), F.col("x2")) - p
    x_hi = F.greatest(F.col("x1"), F.col("x2")) + p
    y_lo = F.least(F.col("y1"), F.col("y2")) - p
    y_hi = F.greatest(F.col("y1"), F.col("y2")) + p
    # centers at pitch*k ∈ [lo, hi] are k ∈ [ceil(lo/pitch),
    # floor(hi/pitch)]; floor(lo)..floor(hi)+1 is that range with ≤1
    # slack cell per side for fp boundary equality. A full ±1 ring on
    # top of the pad (the first cut) nearly doubled each axis and blew
    # the candidate set to 8× the square grid's — measured at sf0.1.
    hr_lo = F.floor(y_lo / r_pitch).cast("long")
    hr_hi = F.floor(y_hi / r_pitch).cast("long") + 1
    with_r = roads.withColumn("_hr", F.explode(F.sequence(hr_lo, hr_hi)))
    # per-row q range depends on the exploded r (centers shear by r/2)
    hq_lo = F.floor(x_lo / q_pitch - F.col("_hr") / 2.0).cast("long")
    hq_hi = F.floor(x_hi / q_pitch - F.col("_hr") / 2.0).cast("long") + 1
    return (
        with_r.withColumn("_hq", F.explode(F.sequence(hq_lo, hq_hi)))
        .withColumn(out, pack_cell(F.col("_hq"), F.col("_hr")))
        .drop("_hq", "_hr")
    )


def hex_rasterize(points, size: float = DEFAULT_CELL_SIZE):
    """Hexagonal density raster: (hq, hr, cell, n) — one hash aggregate,
    the hex analogue of rasterize_points."""
    from pyspark.sql import functions as F

    q, r = hex_cell_cols("px", "py", size)
    return (
        points.select(q.alias("hq"), r.alias("hr"))
        .groupBy("hq", "hr")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            pack_cell(F.col("hq"), F.col("hr")).alias("cell"), "hq", "hr", "n"
        )
    )


def oracle_hex_rasterize_sql(size: float = DEFAULT_CELL_SIZE) -> str:
    q, r = _hex_qr_exprs("px", "py", size)
    return f"""
hx AS (SELECT {q} AS hq, {r} AS hr FROM addrpnts)
SELECT hq * {PACK} + hr + {CY_BIAS} AS cell, hq, hr, count(*) AS n
FROM hx GROUP BY hq, hr"""


def quadkey_sql(
    x: str, y: str, level: int = 8, cell_size: float = DEFAULT_CELL_SIZE
) -> str:
    """SQL expression string for the web-map QUADKEY of a point — the
    Bing-style base-4 string whose k-th character addresses the tile at
    zoom k, so every prefix IS the ancestor tile id (string-prefix
    rollups replace arithmetic tile math). Used VERBATIM by the Spark
    column (F.expr) and the DuckDB oracle — parity by construction, the
    _hex_qr_exprs discipline.

    Tile coords at `level` are the TOP `level` bits of the 26-bit biased
    grid coords (same grid as point_cell, so quadkey and cell pyramids
    agree); digit k (MSB first) = bit_k(tx) + 2 * bit_k(ty), extracted
    with FLOOR-div/mod — no bit builtins needed in the shared dialect."""
    if not 1 <= level <= 26:
        raise ValueError(f"quadkey level must be in [1, 26], got {level}")
    s = float(cell_size)
    bias = 1 << 25
    shift = 1 << (26 - level)
    tx = f"CAST(FLOOR((CAST(FLOOR({x} / {s}) AS BIGINT) + {bias}) / {shift}) AS BIGINT)"
    ty = f"CAST(FLOOR((CAST(FLOOR({y} / {s}) AS BIGINT) + {bias}) / {shift}) AS BIGINT)"
    digits = []
    for k in range(level - 1, -1, -1):
        p = 1 << k
        digits.append(
            f"CAST(CAST(FLOOR({tx} / {p}) AS BIGINT) % 2"
            f" + 2 * (CAST(FLOOR({ty} / {p}) AS BIGINT) % 2) AS STRING)"
        )
    return "(" + " || ".join(digits) + ")"


def quadkey_col(px, py, level: int = 8, cell_size: float = DEFAULT_CELL_SIZE):
    """Quadkey Column for point coordinates (shared-SQL F.expr)."""
    return F.expr(quadkey_sql(str(px), str(py), level, cell_size))


def quadkey_tiles(
    points: DataFrame, level: int = 8, cell_size: float = DEFAULT_CELL_SIZE
) -> DataFrame:
    """Web-map tile counts keyed by quadkey: (qk, n) — ONE hash
    aggregate. Serving any coarser zoom is substring(qk, 1, z) + re-agg
    (prefix rollup), and a quadkey ORDER BY is a Z-order curve — writing
    tiles sorted by qk gives Iceberg/parquet files spatial locality for
    free (min/max pruning on the key prunes spatially)."""
    qk = quadkey_col("px", "py", level, cell_size)
    return (
        points.select(qk.alias("qk"))
        .groupBy("qk")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def oracle_quadkey_tiles_sql(
    level: int = 8, cell_size: float = DEFAULT_CELL_SIZE
) -> str:
    qk = quadkey_sql("px", "py", level, cell_size)
    return (
        f"SELECT {qk} AS qk, count(*) AS n FROM addrpnts GROUP BY 1"
    )


def adaptive_tile_index(
    points: DataFrame,
    coarse: int = 18,
    fine: int = 22,
    split_threshold: int = 10_000,
    cell_size: float = DEFAULT_CELL_SIZE,
) -> DataFrame:
    """Quadtree-refined tile index: coarse tiles whose point count
    exceeds `split_threshold` are split into their observed fine-level
    children; the rest stay coarse. Returns (qk, level, n) — the
    adaptive partitioning layer for skewed point sets (dense downtown
    tiles get fine cells, empty desert stays coarse), i.e. the index a
    balanced spatial-shuffle or a tile server would key on.

    Plan: ONE fine-level hash aggregate (the only pass over the points),
    a substring re-aggregate to the coarse level, and a broadcast
    semi/anti join of the fine counts against the (tiny — bounded by
    distinct coarse tiles) split set. Because every prefix rollup is
    exact (quadkey property), the adaptive index is a pure function of
    the fine raster — no second scan of the points at any scale."""
    if not 1 <= coarse < fine <= 26:
        raise ValueError(f"need 1 <= coarse < fine <= 26, got {coarse},{fine}")
    fine_tiles = quadkey_tiles(points, level=fine, cell_size=cell_size)
    coarse_tiles = (
        fine_tiles.groupBy(F.substring("qk", 1, coarse).alias("qk"))
        .agg(F.sum("n").alias("n"))
    )
    split = coarse_tiles.filter(F.col("n") > split_threshold).select(
        F.col("qk").alias("pref")
    )
    keep_coarse = (
        coarse_tiles.filter(F.col("n") <= split_threshold)
        .select("qk", F.lit(coarse).alias("level"), "n")
    )
    refined = (
        fine_tiles.join(
            F.broadcast(split),
            F.substring(F.col("qk"), 1, coarse) == F.col("pref"),
            "left_semi",
        )
        .select("qk", F.lit(fine).alias("level"), "n")
    )
    return keep_coarse.unionByName(refined)


def oracle_adaptive_tiles_sql(
    coarse: int = 18,
    fine: int = 22,
    split_threshold: int = 10_000,
    cell_size: float = DEFAULT_CELL_SIZE,
) -> str:
    qk = quadkey_sql("px", "py", fine, cell_size)
    # inner SELECTs are indented: the gate's _split_body helper treats
    # the last column-0 "\nSELECT" as the statement body
    return f"""
at_fine AS (SELECT {qk} AS qk, count(*) AS n FROM addrpnts GROUP BY 1),
at_coarse AS (
  SELECT substring(qk, 1, {coarse}) AS qk, CAST(sum(n) AS BIGINT) AS n
  FROM at_fine GROUP BY 1
),
at_out AS (
  SELECT qk, {coarse} AS level, n FROM at_coarse WHERE n <= {split_threshold}
  UNION ALL
  SELECT f.qk, {fine} AS level, f.n FROM at_fine f
  WHERE substring(f.qk, 1, {coarse}) IN
        (SELECT qk FROM at_coarse WHERE n > {split_threshold})
)
SELECT qk, level, n FROM at_out"""


def assign_adaptive_tiles(
    points: DataFrame,
    coarse: int = 18,
    fine: int = 22,
    split_threshold: int = 10_000,
    cell_size: float = DEFAULT_CELL_SIZE,
) -> DataFrame:
    """Point → adaptive-tile assignment (the hierarchical prefix join
    that closes the adaptive_tile_index loop): each point lands in its
    fine tile when its coarse ancestor was split, else in the coarse
    tile. Returns (point_id, qk, level).

    Plan: the point's fine quadkey is ONE Project; membership in the
    split set is a broadcast LEFT SEMI-shaped lookup realized as a
    broadcast left join + CASE (the split set is bounded by the number
    of dense coarse tiles — corpus_points / split_threshold — tiny at
    any scale); no second pass over the points beyond the index build's
    own aggregate."""
    idx = adaptive_tile_index(points, coarse, fine, split_threshold, cell_size)
    split = idx.filter(F.col("level") == fine).select(
        F.substring("qk", 1, coarse).alias("pref")
    ).distinct()
    qk = quadkey_col("px", "py", fine, cell_size)
    pts = points.select(
        F.col("objectid").alias("point_id"), qk.alias("qk_fine")
    ).withColumn("pref", F.substring("qk_fine", 1, coarse))
    joined = pts.join(
        F.broadcast(split.withColumn("_split", F.lit(True))), "pref", "left"
    )
    return joined.select(
        "point_id",
        F.when(F.col("_split"), F.col("qk_fine")).otherwise(F.col("pref")).alias("qk"),
        F.when(F.col("_split"), F.lit(fine)).otherwise(F.lit(coarse)).alias("level"),
    )


def oracle_assign_adaptive_sql(
    coarse: int = 18,
    fine: int = 22,
    split_threshold: int = 10_000,
    cell_size: float = DEFAULT_CELL_SIZE,
) -> str:
    qk = quadkey_sql("px", "py", fine, cell_size)
    return f"""
aa_fine AS (SELECT {qk} AS qk, count(*) AS n FROM addrpnts GROUP BY 1),
aa_coarse AS (
  SELECT substring(qk, 1, {coarse}) AS qk, CAST(sum(n) AS BIGINT) AS n
  FROM aa_fine GROUP BY 1
),
aa_split AS (SELECT qk FROM aa_coarse WHERE n > {split_threshold}),
aa_pts AS (
  SELECT objectid AS point_id, {qk} AS qk_fine FROM addrpnts
)
SELECT p.point_id,
       CASE WHEN s.qk IS NOT NULL THEN p.qk_fine
            ELSE substring(p.qk_fine, 1, {coarse}) END AS qk,
       CASE WHEN s.qk IS NOT NULL THEN {fine} ELSE {coarse} END AS level
FROM aa_pts p LEFT JOIN aa_split s ON substring(p.qk_fine, 1, {coarse}) = s.qk"""


#: axial offsets of a hex cell's 1-ring (the 6 neighbours) + itself —
#: shared between the Spark explode and the DuckDB VALUES list
HEX_RING1 = ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1))


def hex_neighborhood(
    hex_raster: DataFrame, stat: str = "sum"
) -> DataFrame:
    """Focal pass over the hex raster — each cell's count spread to its
    6 axial neighbours + itself (the hex analogue of the square
    raster_neighborhood; hex focal windows are isotropic, which is why
    heat/coverage maps prefer them). stat='sum' box-smooths densities,
    stat='max' is hex dilation.

    Plan: one 7-way offset explode + ONE hash aggregate with map-side
    partial combine — shuffle ≈ 7N rows, no self-join, no window. Same
    scale shape as raster_neighborhood."""
    if stat not in ("sum", "max"):
        raise ValueError(f"hex_neighborhood: stat must be sum|max, got {stat}")
    offs = F.expr(
        "array(" + ", ".join(
            f"struct({dq} AS dq, {dr} AS dr)" for dq, dr in HEX_RING1
        ) + ")"
    )
    spread = (
        hex_raster.select("hq", "hr", "n", F.explode(offs).alias("o"))
        .select(
            (F.col("hq") + F.col("o.dq")).alias("hq"),
            (F.col("hr") + F.col("o.dr")).alias("hr"),
            "n",
        )
    )
    agg = F.sum("n") if stat == "sum" else F.max("n")
    return (
        spread.groupBy("hq", "hr")
        .agg(agg.alias("n"))
        .select(
            pack_cell(F.col("hq"), F.col("hr")).alias("cell"), "hq", "hr", "n"
        )
    )


def oracle_hex_neighborhood_sql(
    size: float = DEFAULT_CELL_SIZE, stat: str = "sum"
) -> str:
    """Requires the addrpnts CTE in scope; embeds the hex_rasterize CTE.
    sum(BIGINT) widens to HUGEINT in DuckDB — cast back (the tile_pyramid
    lesson, VERDICT r3)."""
    q, r = _hex_qr_exprs("px", "py", size)
    vals = ", ".join(f"({dq}, {dr})" for dq, dr in HEX_RING1)
    agg = "CAST(sum(h.n) AS BIGINT)" if stat == "sum" else "max(h.n)"
    return f"""
hx AS (SELECT {q} AS hq, {r} AS hr FROM addrpnts),
hraster AS (SELECT hq, hr, count(*) AS n FROM hx GROUP BY hq, hr)
SELECT (h.hq + o.dq) * {PACK} + (h.hr + o.dr) + {CY_BIAS} AS cell,
       h.hq + o.dq AS hq, h.hr + o.dr AS hr, {agg} AS n
FROM hraster h CROSS JOIN (VALUES {vals}) AS o(dq, dr)
GROUP BY h.hq + o.dq, h.hr + o.dr"""
