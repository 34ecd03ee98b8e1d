"""Spatial-autocorrelation hotspot analytics over the cell raster:
Getis–Ord Gi* z-scores (local hotspot/coldspot detection), global
Moran's I (clustering vs dispersion of the whole surface), Anselin's
local Moran / LISA quadrants, bivariate Moran's I (cross-layer
co-location), join-count statistics (categorical autocorrelation), and
Mann–Kendall emerging-hotspot trends (per-cell monotone trend over the
daily series).

These are the standard "where are the statistically significant dense
clusters" operators a locator/analytics stack runs AFTER rasterizing —
the reference's spatial capability is a stub that throws
(NextGenGrinder.cs:8-16), so like the rest of the spatial layer this is
net-new surface, expressed in the engine's aggregate-shaped raster
idiom.

Spatial units are the OCCUPIED cells of the point raster (the standard
choice for point-derived surfaces: an all-cells universe would make the
statistic a function of an arbitrary bounding box). Weights are binary
Chebyshev ring-1 (queen contiguity): w_ij = 1 when cell j is one of the
(2r+1)^2 - 1 neighbors of i (Gi* additionally includes j = i).

Numeric discipline (the IDW/KDE lesson): every aggregate is an exact
BIGINT in both engines — x, Σx, Σx², ΣwΣ, neighbor sums and counts — so
aggregation ORDER cannot perturb the result; the z-score / index is ONE
final double expression written with identical operation order in Spark
and DuckDB, rounded to 6 decimals.

    Gi*_i  = (n·wx_i − S1·wi_i) /
             sqrt((n·S2 − S1²) · (n·wi_i − wi_i²) / (n − 1))
    I      = (n²·A − n·S1·B + S1²·W) / (W · (n·S2 − S1²))

with n = #units, S1 = Σx, S2 = Σx², wx_i = Σ_{j∈N(i)∪{i}} x_j,
wi_i = |N(i)∪{i}| (present cells only), and over directed present
neighbor PAIRS (j ≠ i): A = Σ x_i·x_j, B = Σ (x_i + x_j), W = #pairs.
Both formulas are the textbook statistics with numerator/denominator
cleared of the rational mean X̄ = S1/n, so every term before the final
division is integer-exact.

Scale: the unit set is the AGGREGATED raster (bounded by occupied cells,
not points), the neighbor pass is the raster_neighborhood shape — one
(2r+1)² offset explode + ONE hash aggregate + one equi-join back to the
units — and the three global scalars ride in on a broadcast of a 1-row
aggregate. No point-pair stage, no window functions; survives any raster
the base rasterize handles. The final combination arithmetic is done in
DOUBLE (inputs exact integers) so no n²·A BIGINT overflow at extreme
unit counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .cells import CY_BIAS, DEFAULT_CELL_SIZE, PACK, pack_cell
from .raster import oracle_rasterize_points_sql


def round6z(col: Column) -> Column:
    """6-dp round matching DuckDB ROUND's signed-zero behavior.

    DuckDB's ROUND preserves the sign of a zero result (-1e-9 → -0.0);
    Spark's HALF_UP round collapses it to +0.0, and the driver's value
    hash distinguishes the two (CORRECTNESS r6: `lisa_quadrants` red on
    exactly this, every value equal otherwise). Both engines compute the
    identical pre-round double, so emitting a negative zero exactly when
    the pre-round value is negative (or is -0.0 itself — both read off
    the sign of the value's string form; a 1/x sign probe would raise
    DIVIDE_BY_ZERO under Spark 4's default ANSI mode) makes the rounded
    doubles bit-identical to the oracle's.
    Applied to every statistic emitter whose pre-round value can be
    negative (gi z, lisa, Mann–Kendall z, Moran's I, bivariate I, Knox
    z); always-nonnegative emitters are left on plain F.round."""
    r = F.round(col, 6)
    neg = col.cast("string").startswith("-")
    return F.when((r == 0) & neg, -F.abs(r)).otherwise(r)


def _nsjoin(left: DataFrame, right: DataFrame, keys: list[str], how: str = "inner") -> DataFrame:
    """Equi-join on never-null keys via eqNullSafe, keeping exchange
    reuse alive (r7, guide §2.4). A plain equi-join infers
    isnotnull(key) and pushes it — with the key EXPRESSION substituted —
    below ONE side's aggregates; the raster subplans that feed the
    units, spread, and globals branches of every statistic then stop
    canonicalizing equal, and ReuseExchange cannot dedupe them: morans_i
    scanned the points parquet and re-ran the rasterize aggregate 3× per
    query (plan audit, plans/r07/q_morans_i_before.txt ops 1/12/23, the
    op-13 filter being the vacuous isnotnull(FLOOR(px/125))). eqNullSafe
    suppresses the inference (the hex_knn / BASELINE lesson-9 trick).
    All keys routed here are FLOOR()/explode-derived and never null on
    the probe side, so eqNullSafe ≡ '=' row-for-row."""
    cond = None
    renamed = right
    for k in keys:
        renamed = renamed.withColumnRenamed(k, f"_ns_{k}")
    for k in keys:
        c = left[k].eqNullSafe(renamed[f"_ns_{k}"])
        cond = c if cond is None else (cond & c)
    return left.join(renamed, cond, how).drop(*[f"_ns_{k}" for k in keys])


def _globals_row(raster: DataFrame) -> DataFrame:
    """(n_units, s1, s2) — exact BIGINTs over the unit set."""
    return raster.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )


def gi_star(raster: DataFrame, radius: int = 1) -> DataFrame:
    """(cell, cx, cy, x, wi, wx, z): Getis–Ord Gi* z-score per occupied
    cell. raster: (cell, cx, cy, n) from rasterize_points. z > ~2 marks
    a statistically hot cell, z < ~-2 a cold one."""
    offs = F.sequence(F.lit(-radius), F.lit(radius))
    # each unit j spreads x_j into every cell of its (2r+1)^2 window;
    # grouping by target gives wx (present-neighbor value sum, incl the
    # unit itself via the (0,0) offset) and wi (present-neighbor count)
    spread = (
        raster.select("cx", "cy", "n", F.explode(offs).alias("dx"))
        .select("cx", "cy", "n", "dx", F.explode(offs).alias("dy"))
        .select(
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
            "n",
        )
    )
    nb = spread.groupBy("cx", "cy").agg(
        F.sum("n").alias("wx"), F.count(F.lit(1)).alias("wi")
    )
    nd = F.col("n_units").cast("double")
    wxd, wid = F.col("wx").cast("double"), F.col("wi").cast("double")
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    z = (nd * wxd - s1d * wid) / F.sqrt(
        (nd * s2d - s1d * s1d)
        * (nd * wid - wid * wid)
        / (nd - F.lit(1.0))
    )
    return (
        _nsjoin(raster.withColumnRenamed("n", "x"), nb, ["cx", "cy"])
        .crossJoin(F.broadcast(_globals_row(raster.select("n"))))
        .select(
            pack_cell(F.col("cx"), F.col("cy")).alias("cell"),
            "cx", "cy", "x", "wi", "wx",
            round6z(z).alias("z"),
        )
    )


def oracle_gi_star_sql(
    cell_size: float = DEFAULT_CELL_SIZE, radius: int = 1
) -> str:
    base = oracle_rasterize_points_sql(cell_size)
    return f"""
gi_base AS ({base}),
gi_g AS (
  SELECT count(*) AS n_units,
         CAST(sum(n) AS BIGINT) AS s1,
         CAST(sum(n * n) AS BIGINT) AS s2
  FROM gi_base
),
gi_nb AS (
  SELECT b.cx + dx.dx AS cx, b.cy + dy.dy AS cy,
         CAST(sum(b.n) AS BIGINT) AS wx, count(*) AS wi
  FROM gi_base b,
       LATERAL (SELECT unnest(range({-radius}, {radius} + 1)) AS dx) dx,
       LATERAL (SELECT unnest(range({-radius}, {radius} + 1)) AS dy) dy
  GROUP BY 1, 2
)
SELECT u.cx * {PACK} + u.cy + {CY_BIAS} AS cell, u.cx, u.cy,
       u.n AS x, nb.wi, nb.wx,
       ROUND((CAST(g.n_units AS DOUBLE) * CAST(nb.wx AS DOUBLE)
              - CAST(g.s1 AS DOUBLE) * CAST(nb.wi AS DOUBLE))
             / SQRT((CAST(g.n_units AS DOUBLE) * CAST(g.s2 AS DOUBLE)
                     - CAST(g.s1 AS DOUBLE) * CAST(g.s1 AS DOUBLE))
                    * (CAST(g.n_units AS DOUBLE) * CAST(nb.wi AS DOUBLE)
                       - CAST(nb.wi AS DOUBLE) * CAST(nb.wi AS DOUBLE))
                    / (CAST(g.n_units AS DOUBLE) - 1.0)), 6) AS z
FROM gi_base u
JOIN gi_nb nb ON nb.cx = u.cx AND nb.cy = u.cy
CROSS JOIN gi_g g"""


def local_morans(raster: DataFrame, radius: int = 1) -> DataFrame:
    """(cell, cx, cy, x, wi, lx, lisa, quadrant): Anselin's local Moran
    I_i per occupied cell with binary queen weights (self EXCLUDED —
    unlike Gi*), plus the LISA quadrant label:

      hh  high cell in a high neighborhood (hotspot core)
      ll  low-low (coldspot core)      hl / lh  spatial outliers
      na  isolated cell (no present neighbor) or exact mean ties

    Cleared-denominator form (all-integer until one division):
      I_i = (n·x_i − S1)(n·lx_i − wi_i·S1) / (n·S2 − S1²)
    with lx_i = Σ_{j∈N(i)} x_j and wi_i = |N(i)| over PRESENT neighbors.
    Quadrants compare the same integer products (n·x vs S1, n·lx vs
    wi·S1), so the labels are exact — no float threshold.

    Same plan as gi_star minus the self offset, with a LEFT join back to
    the units (an isolated cell has no neighbor row; lx/wi coalesce to
    0 and I_i = 0)."""
    offs = F.sequence(F.lit(-radius), F.lit(radius))
    spread = (
        raster.select("cx", "cy", "n", F.explode(offs).alias("dx"))
        .select("cx", "cy", "n", "dx", F.explode(offs).alias("dy"))
        .filter(~((F.col("dx") == 0) & (F.col("dy") == 0)))
        .select(
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
            "n",
        )
    )
    nb = spread.groupBy("cx", "cy").agg(
        F.sum("n").alias("lx"), F.count(F.lit(1)).alias("wi")
    )
    nd = F.col("n_units").cast("double")
    xd, lxd, wid = (
        F.col("x").cast("double"),
        F.col("lx").cast("double"),
        F.col("wi").cast("double"),
    )
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    lisa = (
        (nd * xd - s1d)
        * (nd * lxd - wid * s1d)
        / (nd * s2d - s1d * s1d)
    )
    x_hi = F.col("n_units") * F.col("x") > F.col("s1")
    x_lo = F.col("n_units") * F.col("x") < F.col("s1")
    l_hi = F.col("n_units") * F.col("lx") > F.col("wi") * F.col("s1")
    l_lo = F.col("n_units") * F.col("lx") < F.col("wi") * F.col("s1")
    quad = (
        F.when(F.col("wi") == 0, F.lit("na"))
        .when(x_hi & l_hi, F.lit("hh"))
        .when(x_lo & l_lo, F.lit("ll"))
        .when(x_hi & l_lo, F.lit("hl"))
        .when(x_lo & l_hi, F.lit("lh"))
        .otherwise(F.lit("na"))
    )
    return (
        _nsjoin(raster.withColumnRenamed("n", "x"), nb, ["cx", "cy"], "left")
        .withColumn("lx", F.coalesce(F.col("lx"), F.lit(0)))
        .withColumn("wi", F.coalesce(F.col("wi"), F.lit(0)))
        .crossJoin(F.broadcast(_globals_row(raster.select("n"))))
        .select(
            pack_cell(F.col("cx"), F.col("cy")).alias("cell"),
            "cx", "cy", "x", "wi", "lx",
            round6z(lisa).alias("lisa"),
            quad.alias("quadrant"),
        )
    )


def oracle_local_morans_sql(
    cell_size: float = DEFAULT_CELL_SIZE, radius: int = 1
) -> str:
    base = oracle_rasterize_points_sql(cell_size)
    return f"""
lm_base AS ({base}),
lm_g AS (
  SELECT count(*) AS n_units,
         CAST(sum(n) AS BIGINT) AS s1,
         CAST(sum(n * n) AS BIGINT) AS s2
  FROM lm_base
),
lm_nb AS (
  SELECT b.cx + dx.dx AS cx, b.cy + dy.dy AS cy,
         CAST(sum(b.n) AS BIGINT) AS lx, count(*) AS wi
  FROM lm_base b,
       LATERAL (SELECT unnest(range({-radius}, {radius} + 1)) AS dx) dx,
       LATERAL (SELECT unnest(range({-radius}, {radius} + 1)) AS dy) dy
  WHERE NOT (dx.dx = 0 AND dy.dy = 0)
  GROUP BY 1, 2
)
SELECT u.cx * {PACK} + u.cy + {CY_BIAS} AS cell, u.cx, u.cy,
       u.n AS x, COALESCE(nb.wi, 0) AS wi, COALESCE(nb.lx, 0) AS lx,
       ROUND((CAST(g.n_units AS DOUBLE) * CAST(u.n AS DOUBLE)
              - CAST(g.s1 AS DOUBLE))
             * (CAST(g.n_units AS DOUBLE) * CAST(COALESCE(nb.lx, 0) AS DOUBLE)
                - CAST(COALESCE(nb.wi, 0) AS DOUBLE) * CAST(g.s1 AS DOUBLE))
             / (CAST(g.n_units AS DOUBLE) * CAST(g.s2 AS DOUBLE)
                - CAST(g.s1 AS DOUBLE) * CAST(g.s1 AS DOUBLE)), 6) AS lisa,
       CASE
         WHEN COALESCE(nb.wi, 0) = 0 THEN 'na'
         WHEN g.n_units * u.n > g.s1
          AND g.n_units * COALESCE(nb.lx, 0) > COALESCE(nb.wi, 0) * g.s1
           THEN 'hh'
         WHEN g.n_units * u.n < g.s1
          AND g.n_units * COALESCE(nb.lx, 0) < COALESCE(nb.wi, 0) * g.s1
           THEN 'll'
         WHEN g.n_units * u.n > g.s1
          AND g.n_units * COALESCE(nb.lx, 0) < COALESCE(nb.wi, 0) * g.s1
           THEN 'hl'
         WHEN g.n_units * u.n < g.s1
          AND g.n_units * COALESCE(nb.lx, 0) > COALESCE(nb.wi, 0) * g.s1
           THEN 'lh'
         ELSE 'na'
       END AS quadrant
FROM lm_base u
LEFT JOIN lm_nb nb ON nb.cx = u.cx AND nb.cy = u.cy
CROSS JOIN lm_g g"""


#: Mann–Kendall day-bucket count for the emerging-hotspot trend: the
#: driver events table spans one month; the day-of-month bucket (1..T)
#: is identical in Spark (dayofmonth) and DuckDB (day).
MK_DAYS = 30


def emerging_hotspots(
    pings: DataFrame,
    cell_size: float = DEFAULT_CELL_SIZE,
    days: int = MK_DAYS,
    z_crit: float = 1.96,
) -> DataFrame:
    """(cell, cx, cy, n_total, mk_stat, z, trend): emerging-hotspot
    detection — per-cell Mann–Kendall trend over the daily activity
    series. trend = 'emerging' (significant increase), 'declining', or
    'stable' at the z_crit normal threshold (untied-variance MK
    approximation: Var = T(T-1)(2T+5)/18; the deterministic spec both
    engines evaluate identically).

    Shape: rasterize per (cell, day) → densify each occupied cell to the
    full T-day series (absent day = 0 — REQUIRED: an empty day is a real
    zero observation, not a gap) → co-partitioned self-join on the cell
    key for the T(T-1)/2 ordered day pairs → sign-sum aggregate. The
    pair fan-out is the constant 435 rows/cell at T=30 — bounded per
    cell, shuffled once by cell key, no cross-cell stage; the textbook
    O(T log T) inversion-count refinement only matters when T is large.
    """
    from .cells import cell_xy

    cx, cy = cell_xy(F.col("px"), F.col("py"), cell_size)
    counts = (
        pings.select(
            cx.alias("cx"), cy.alias("cy"), F.dayofmonth("ts").alias("b")
        )
        .groupBy("cx", "cy", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    dense = _nsjoin(
        counts.groupBy("cx", "cy")
        .agg(F.sum("n").alias("n_total"))
        .withColumn("b", F.explode(F.sequence(F.lit(1), F.lit(days)))),
        counts,
        ["cx", "cy", "b"],
        "left",
    ).withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
    a = dense.select("cx", "cy", "n_total", F.col("b").alias("b1"), F.col("n").alias("n1"))
    b = dense.select("cx", "cy", F.col("b").alias("b2"), F.col("n").alias("n2"))
    sgn = (
        F.when(F.col("n2") > F.col("n1"), F.lit(1))
        .when(F.col("n2") < F.col("n1"), F.lit(-1))
        .otherwise(F.lit(0))
    )
    mk = (
        _nsjoin(a, b, ["cx", "cy"])
        .filter(F.col("b2") > F.col("b1"))
        .groupBy("cx", "cy", "n_total")
        .agg(F.sum(sgn).alias("mk_stat"))
    )
    var = days * (days - 1) * (2 * days + 5) / 18.0
    z = F.col("mk_stat").cast("double") / F.lit(float(var) ** 0.5)
    trend = (
        F.when(z > F.lit(float(z_crit)), F.lit("emerging"))
        .when(z < F.lit(-float(z_crit)), F.lit("declining"))
        .otherwise(F.lit("stable"))
    )
    return mk.select(
        pack_cell(F.col("cx"), F.col("cy")).alias("cell"),
        "cx", "cy", "n_total", "mk_stat",
        round6z(z).alias("z"),
        trend.alias("trend"),
    )


def oracle_emerging_hotspots_sql(
    cell_size: float = DEFAULT_CELL_SIZE,
    days: int = MK_DAYS,
    z_crit: float = 1.96,
) -> str:
    """DuckDB mirror over the shared pings CTE (caller composes
    trajectory.PINGS_CTE)."""
    var = days * (days - 1) * (2 * days + 5) / 18.0
    sd = float(var) ** 0.5
    return f"""
eh_counts AS (
  SELECT CAST(FLOOR(px / {cell_size}) AS BIGINT) AS cx,
         CAST(FLOOR(py / {cell_size}) AS BIGINT) AS cy,
         day(ts) AS b, count(*) AS n
  FROM pings GROUP BY 1, 2, 3
),
eh_dense AS (
  SELECT c.cx, c.cy, c.n_total, d.b,
         COALESCE(k.n, 0) AS n
  FROM (SELECT cx, cy, CAST(sum(n) AS BIGINT) AS n_total
        FROM eh_counts GROUP BY 1, 2) c
  CROSS JOIN (SELECT unnest(range(1, {days} + 1)) AS b) d
  LEFT JOIN eh_counts k ON k.cx = c.cx AND k.cy = c.cy AND k.b = d.b
),
eh_mk AS (
  SELECT a.cx, a.cy, a.n_total,
         CAST(sum(CASE WHEN b2.n > a.n THEN 1
                       WHEN b2.n < a.n THEN -1 ELSE 0 END) AS BIGINT)
             AS mk_stat
  FROM eh_dense a
  JOIN eh_dense b2 ON b2.cx = a.cx AND b2.cy = a.cy AND b2.b > a.b
  GROUP BY 1, 2, 3
)
SELECT cx * {PACK} + cy + {CY_BIAS} AS cell, cx, cy, n_total, mk_stat,
       ROUND(CAST(mk_stat AS DOUBLE) / {sd!r}, 6) AS z,
       CASE WHEN CAST(mk_stat AS DOUBLE) / {sd!r} > {z_crit}
                THEN 'emerging'
            WHEN CAST(mk_stat AS DOUBLE) / {sd!r} < -{z_crit}
                THEN 'declining'
            ELSE 'stable' END AS trend
FROM eh_mk"""


def morans_i(raster: DataFrame, radius: int = 1) -> DataFrame:
    """One row (n_units, w_pairs, morans_i, expected_i): global Moran's
    I over the occupied-cell raster with binary queen-contiguity
    weights. I > E[I] = -1/(n-1) indicates spatial clustering of the
    density surface; I < E[I] dispersion."""
    offs = F.sequence(F.lit(-radius), F.lit(radius))
    # directed present pairs (i, j), j a distinct in-window neighbor of
    # i: spread copy-i onto neighbor coordinates, equi-join units
    spread = (
        raster.select("cx", "cy", "n", F.explode(offs).alias("dx"))
        .select("cx", "cy", "n", "dx", F.explode(offs).alias("dy"))
        .filter(~((F.col("dx") == 0) & (F.col("dy") == 0)))
        .select(
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
            F.col("n").alias("xi"),
        )
    )
    pairs = _nsjoin(
        spread, raster.select("cx", "cy", F.col("n").alias("xj")), ["cx", "cy"]
    ).agg(
        F.sum(F.col("xi") * F.col("xj")).alias("a"),
        F.sum(F.col("xi") + F.col("xj")).alias("b"),
        F.count(F.lit(1)).alias("w_pairs"),
    )
    nd = F.col("n_units").cast("double")
    ad, bd = F.col("a").cast("double"), F.col("b").cast("double")
    wd = F.col("w_pairs").cast("double")
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    i_val = (nd * nd * ad - nd * s1d * bd + s1d * s1d * wd) / (
        wd * (nd * s2d - s1d * s1d)
    )
    return (
        pairs.crossJoin(F.broadcast(_globals_row(raster.select("n"))))
        .select(
            "n_units",
            "w_pairs",
            round6z(i_val).alias("morans_i"),
            round6z(F.lit(-1.0) / (nd - F.lit(1.0))).alias("expected_i"),
        )
    )


def oracle_morans_i_sql(
    cell_size: float = DEFAULT_CELL_SIZE, radius: int = 1
) -> str:
    base = oracle_rasterize_points_sql(cell_size)
    return f"""
mi_base AS ({base}),
mi_g AS (
  SELECT count(*) AS n_units,
         CAST(sum(n) AS BIGINT) AS s1,
         CAST(sum(n * n) AS BIGINT) AS s2
  FROM mi_base
),
mi_pairs AS (
  SELECT CAST(sum(xi * xj) AS BIGINT) AS a,
         CAST(sum(xi + xj) AS BIGINT) AS b,
         count(*) AS w_pairs
  FROM (
    SELECT i.n AS xi, j.n AS xj
    FROM mi_base i,
         LATERAL (SELECT unnest(range({-radius}, {radius} + 1)) AS dx) dx,
         LATERAL (SELECT unnest(range({-radius}, {radius} + 1)) AS dy) dy,
         mi_base j
    WHERE NOT (dx.dx = 0 AND dy.dy = 0)
      AND j.cx = i.cx + dx.dx AND j.cy = i.cy + dy.dy
  )
)
SELECT g.n_units, p.w_pairs,
       ROUND((CAST(g.n_units AS DOUBLE) * CAST(g.n_units AS DOUBLE)
                  * CAST(p.a AS DOUBLE)
              - CAST(g.n_units AS DOUBLE) * CAST(g.s1 AS DOUBLE)
                  * CAST(p.b AS DOUBLE)
              + CAST(g.s1 AS DOUBLE) * CAST(g.s1 AS DOUBLE)
                  * CAST(p.w_pairs AS DOUBLE))
             / (CAST(p.w_pairs AS DOUBLE)
                * (CAST(g.n_units AS DOUBLE) * CAST(g.s2 AS DOUBLE)
                   - CAST(g.s1 AS DOUBLE) * CAST(g.s1 AS DOUBLE))), 6)
           AS morans_i,
       ROUND(-1.0 / (CAST(g.n_units AS DOUBLE) - 1.0), 6) AS expected_i
FROM mi_pairs p CROSS JOIN mi_g g"""


def join_counts(
    raster: DataFrame, hot_threshold: int = 2, radius: int = 1
) -> DataFrame:
    """One row (n_units, n_hot, j_pairs, bb, bw, ww, e_bb, e_bw, e_ww):
    join-count statistics — the categorical-autocorrelation companion to
    morans_i. Cells are classified hot (n >= hot_threshold) / cold, and
    every unordered pair of ADJACENT occupied cells (Chebyshev ring-1,
    queen contiguity) is counted by class: BB (hot-hot joins), BW
    (mixed), WW (cold-cold). Clustering shows as BB/WW above and BW
    below the nonfree-sampling (hypergeometric) expectations

      E[BB] = J·nb·(nb−1)/(n·(n−1))   E[BW] = J·2·nb·nw/(n·(n−1))
      E[WW] = J·nw·(nw−1)/(n·(n−1))

    with J = bb+bw+ww total adjacent pairs. All observed counts are
    exact integers; the three expectations are one final double
    expression each (identical op order cross-engine, rounded to 6).

    Shape: the morans_i pair pass with a packed-id tiebreak (each
    adjacent unordered pair joins EXACTLY once: the a side keeps its own
    cell, the b side explodes the (2r+1)² window, strict pack < pack
    keeps one orientation and drops the self-offset) reduced by one
    conditional aggregate; globals ride a broadcast 1-row join.
    """
    offs = F.sequence(F.lit(-radius), F.lit(radius))
    hot = (F.col("n") >= F.lit(int(hot_threshold))).cast("long")
    a = raster.select(
        "cx", "cy", hot.alias("ha"), pack_cell(F.col("cx"), F.col("cy")).alias("pa")
    )
    b = (
        raster.select("cx", "cy", hot.alias("hb"))
        .select("cx", "cy", "hb", F.explode(offs).alias("dx"))
        .select("cx", "cy", "hb", "dx", F.explode(offs).alias("dy"))
        .select(
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
            "hb",
            pack_cell(F.col("cx"), F.col("cy")).alias("pb"),
        )
    )
    obs = (
        _nsjoin(a.hint("shuffle_hash"), b, ["cx", "cy"])
        .filter(F.col("pa") < F.col("pb"))
        .agg(
            F.sum(F.col("ha") * F.col("hb")).alias("bb"),
            F.sum(
                (F.lit(1) - F.col("ha")) * (F.lit(1) - F.col("hb"))
            ).alias("ww"),
            F.sum(
                F.col("ha") + F.col("hb")
                - 2 * F.col("ha") * F.col("hb")
            ).alias("bw"),
        )
    )
    g = raster.agg(
        F.count(F.lit(1)).alias("n_units"), F.sum(hot).alias("n_hot")
    )
    nd = F.col("n_units").cast("double")
    nb_ = F.col("n_hot").cast("double")
    nw_ = nd - nb_
    jd = (F.col("bb") + F.col("bw") + F.col("ww")).cast("double")
    denom = nd * (nd - F.lit(1.0))
    return (
        g.crossJoin(F.broadcast(obs))
        .select(
            "n_units",
            "n_hot",
            (F.col("bb") + F.col("bw") + F.col("ww")).alias("j_pairs"),
            "bb",
            "bw",
            "ww",
            F.round(jd * (nb_ * (nb_ - F.lit(1.0))) / denom, 6).alias("e_bb"),
            F.round(jd * (F.lit(2.0) * nb_ * nw_) / denom, 6).alias("e_bw"),
            F.round(jd * (nw_ * (nw_ - F.lit(1.0))) / denom, 6).alias("e_ww"),
        )
    )


def oracle_join_counts_sql(
    cell_size: float = DEFAULT_CELL_SIZE,
    hot_threshold: int = 2,
    radius: int = 1,
) -> str:
    """DuckDB mirror: range self-join on cx/cy deltas with the same
    packed-id tiebreak (different pruning than the engine's explode —
    the match is evidence the exactly-once pairing is right)."""
    base = oracle_rasterize_points_sql(cell_size)
    t = int(hot_threshold)
    r = int(radius)
    return f"""
jc_base AS (
  SELECT cx, cy, CASE WHEN n >= {t} THEN 1 ELSE 0 END AS h,
         cx * {PACK} + cy + {CY_BIAS} AS p
  FROM ({base.strip()})
),
jc_obs AS (
  SELECT CAST(sum(a.h * b.h) AS BIGINT) AS bb,
         CAST(sum((1 - a.h) * (1 - b.h)) AS BIGINT) AS ww,
         CAST(sum(a.h + b.h - 2 * a.h * b.h) AS BIGINT) AS bw
  FROM jc_base a JOIN jc_base b
    ON b.cx BETWEEN a.cx - {r} AND a.cx + {r}
   AND b.cy BETWEEN a.cy - {r} AND a.cy + {r}
   AND a.p < b.p
),
jc_g AS (
  SELECT count(*) AS n_units, CAST(sum(h) AS BIGINT) AS n_hot
  FROM jc_base
)
SELECT g.n_units, g.n_hot,
       o.bb + o.bw + o.ww AS j_pairs, o.bb, o.bw, o.ww,
       ROUND(CAST(o.bb + o.bw + o.ww AS DOUBLE)
             * (CAST(g.n_hot AS DOUBLE) * (CAST(g.n_hot AS DOUBLE) - 1.0))
             / (CAST(g.n_units AS DOUBLE)
                * (CAST(g.n_units AS DOUBLE) - 1.0)), 6) AS e_bb,
       ROUND(CAST(o.bb + o.bw + o.ww AS DOUBLE)
             * (2.0 * CAST(g.n_hot AS DOUBLE)
                * (CAST(g.n_units AS DOUBLE) - CAST(g.n_hot AS DOUBLE)))
             / (CAST(g.n_units AS DOUBLE)
                * (CAST(g.n_units AS DOUBLE) - 1.0)), 6) AS e_bw,
       ROUND(CAST(o.bb + o.bw + o.ww AS DOUBLE)
             * ((CAST(g.n_units AS DOUBLE) - CAST(g.n_hot AS DOUBLE))
                * (CAST(g.n_units AS DOUBLE) - CAST(g.n_hot AS DOUBLE) - 1.0))
             / (CAST(g.n_units AS DOUBLE)
                * (CAST(g.n_units AS DOUBLE) - 1.0)), 6) AS e_ww
FROM jc_g g CROSS JOIN jc_obs o"""


def bivariate_moran(
    raster_x: DataFrame, raster_y: DataFrame, radius: int = 1
) -> DataFrame:
    """One row (n_units, w_pairs, a_xy, bivariate_i): bivariate Moran's
    I between two cell rasters — does variable x in a cell co-locate
    with variable y in the NEIGHBORING cells? (e.g. address density vs
    activity density: the cross-layer question the univariate morans_i
    cannot ask.)

      I_xy = n·Σ_pairs (x_i−x̄)(y_j−ȳ)
             / (W · sqrt(Σ(x−x̄)² · Σ(y−ȳ)²))

    over directed present-neighbor pairs (j ≠ i, binary queen weights).
    Units are the UNION of cells occupied by either layer with the
    missing side an explicit 0 (a cell with addresses but no activity is
    a real observation of y = 0, not a gap).

    Numerics (the morans_i discipline): the pair pass reduces to four
    exact BIGINT sums (A = Σx_i·y_j, Bx = Σx_i, By = Σy_j, W) and the
    globals to five (n, S1x, S2x, S1y, S2y); the index is ONE final
    double expression with the numerator expanded to integer terms
      n²·A − n·S1y·Bx − n·S1x·By + S1x·S1y·W
    evaluated in DOUBLE (n²·A overflows BIGINT at extreme unit counts).

    Shape: full-outer equi-join of the two aggregated rasters, then the
    morans_i spread/join/aggregate — bounded by occupied cells, one
    cell-keyed shuffle, globals on a broadcast 1-row join.
    """
    x = raster_x.select("cx", "cy", F.col("n").alias("x"))
    y = raster_y.select("cx", "cy", F.col("n").alias("y"))
    units = (
        x.join(y, ["cx", "cy"], "full")
        .withColumn("x", F.coalesce(F.col("x"), F.lit(0)))
        .withColumn("y", F.coalesce(F.col("y"), F.lit(0)))
    )
    g = units.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("x").alias("s1x"),
        F.sum(F.col("x") * F.col("x")).alias("s2x"),
        F.sum("y").alias("s1y"),
        F.sum(F.col("y") * F.col("y")).alias("s2y"),
    )
    offs = F.sequence(F.lit(-radius), F.lit(radius))
    spread = (
        units.select("cx", "cy", "y", F.explode(offs).alias("dx"))
        .select("cx", "cy", "y", "dx", F.explode(offs).alias("dy"))
        .filter(~((F.col("dx") == 0) & (F.col("dy") == 0)))
        .select(
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
            F.col("y").alias("yj"),
        )
    )
    pairs = (
        _nsjoin(units.select("cx", "cy", "x").hint("shuffle_hash"), spread, ["cx", "cy"])
        .agg(
            F.sum(F.col("x") * F.col("yj")).alias("a_xy"),
            F.sum("x").alias("bx"),
            F.sum("yj").alias("by"),
            F.count(F.lit(1)).alias("w_pairs"),
        )
    )
    nd = F.col("n_units").cast("double")
    ad = F.col("a_xy").cast("double")
    bxd, byd = F.col("bx").cast("double"), F.col("by").cast("double")
    wd = F.col("w_pairs").cast("double")
    s1x, s2x = F.col("s1x").cast("double"), F.col("s2x").cast("double")
    s1y, s2y = F.col("s1y").cast("double"), F.col("s2y").cast("double")
    num = nd * nd * ad - nd * s1y * bxd - nd * s1x * byd + s1x * s1y * wd
    den = wd * F.sqrt((nd * s2x - s1x * s1x) * (nd * s2y - s1y * s1y))
    return (
        g.crossJoin(F.broadcast(pairs))
        .select(
            "n_units",
            "w_pairs",
            "a_xy",
            round6z(num / den).alias("bivariate_i"),
        )
    )


def oracle_bivariate_moran_sql(
    cell_size: float = DEFAULT_CELL_SIZE, radius: int = 1
) -> str:
    """DuckDB mirror: x from the addrpnts raster, y from the pings
    raster (caller composes the addrpnts + pings CTEs)."""
    base_x = oracle_rasterize_points_sql(cell_size)
    return f"""
bm_x AS ({base_x.strip()}),
bm_y AS (
  SELECT CAST(FLOOR(px / {cell_size}) AS BIGINT) AS cx,
         CAST(FLOOR(py / {cell_size}) AS BIGINT) AS cy,
         count(*) AS n
  FROM pings GROUP BY 1, 2
),
bm_u AS (
  SELECT COALESCE(x.cx, y.cx) AS cx, COALESCE(x.cy, y.cy) AS cy,
         COALESCE(x.n, 0) AS x, COALESCE(y.n, 0) AS y
  FROM bm_x x FULL JOIN bm_y y ON x.cx = y.cx AND x.cy = y.cy
),
bm_g AS (
  SELECT count(*) AS n_units,
         CAST(sum(x) AS BIGINT) AS s1x, CAST(sum(x * x) AS BIGINT) AS s2x,
         CAST(sum(y) AS BIGINT) AS s1y, CAST(sum(y * y) AS BIGINT) AS s2y
  FROM bm_u
),
bm_s AS (
  SELECT u.cx + dx.dx AS cx, u.cy + dy.dy AS cy, u.y AS yj
  FROM bm_u u,
       LATERAL (SELECT unnest(range({-radius}, {radius} + 1)) AS dx) dx,
       LATERAL (SELECT unnest(range({-radius}, {radius} + 1)) AS dy) dy
  WHERE NOT (dx.dx = 0 AND dy.dy = 0)
),
bm_p AS (
  SELECT CAST(sum(u.x * s.yj) AS BIGINT) AS a_xy,
         CAST(sum(u.x) AS BIGINT) AS bx,
         CAST(sum(s.yj) AS BIGINT) AS b_y,
         count(*) AS w_pairs
  FROM bm_u u JOIN bm_s s ON s.cx = u.cx AND s.cy = u.cy
)
SELECT g.n_units, p.w_pairs, p.a_xy,
       ROUND((CAST(g.n_units AS DOUBLE) * CAST(g.n_units AS DOUBLE)
              * CAST(p.a_xy AS DOUBLE)
              - CAST(g.n_units AS DOUBLE) * CAST(g.s1y AS DOUBLE)
                * CAST(p.bx AS DOUBLE)
              - CAST(g.n_units AS DOUBLE) * CAST(g.s1x AS DOUBLE)
                * CAST(p.b_y AS DOUBLE)
              + CAST(g.s1x AS DOUBLE) * CAST(g.s1y AS DOUBLE)
                * CAST(p.w_pairs AS DOUBLE))
             / (CAST(p.w_pairs AS DOUBLE)
                * SQRT((CAST(g.n_units AS DOUBLE) * CAST(g.s2x AS DOUBLE)
                        - CAST(g.s1x AS DOUBLE) * CAST(g.s1x AS DOUBLE))
                       * (CAST(g.n_units AS DOUBLE) * CAST(g.s2y AS DOUBLE)
                          - CAST(g.s1y AS DOUBLE) * CAST(g.s1y AS DOUBLE)))),
             6) AS bivariate_i
FROM bm_g g CROSS JOIN bm_p p"""
