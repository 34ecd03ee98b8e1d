"""Point-pattern statistics: Ripley's K / L function (multi-radius
second-order clustering profile) and the Knox space–time interaction
statistic.

These complete the hotspot family (hotspot.py answers "WHERE is the
surface clustered"; these answer "at WHAT SCALE does the point process
cluster" and "do events cluster in space AND time TOGETHER") — standard
epidemiology / urban-analytics follow-ups to rasterized density. Like
the rest of the spatial layer this is net-new surface vs the reference,
whose spatial capability is a stub that throws (NextGenGrinder.cs:8-16).

Numeric discipline (hotspot.py's): every aggregate is an exact integer
in both engines — pair counts, conditional pair counts — plus exact
min/max bbox doubles; each statistic is ONE final double expression
written with identical operation order in Spark and DuckDB, rounded to
6 decimals.

Scale shape:
- ripley_k reuses the `point_pairs_within` single-equi-join pair pass
  (own-cell left x ring-1-exploded right, every qualifying pair exactly
  once, shuffle keyed by cell — AQE skew-split applies to dense
  downtown cells) and reduces it with ONE conditional aggregate row (no
  per-radius rescan: all radii are conditional sums over the same pair
  stream). Radii are capped at cell_size so the ring-1 cover stays
  lossless.
- knox runs two bounded pair passes: the spatial one (same cell-ring
  shape, threshold ds <= cell_size) and a temporal one (1-D analogue:
  own dt-bucket left x {-1,0,1}-bucket-exploded right). The temporal
  pass is the op's inherent quadratic-in-temporal-density surface —
  candidate volume is sum over dt-buckets of n_b * (n_b-1 + neighbors),
  the same class of bound as colocation_pairs' within-zone surface; dt
  is the knob, and the bucket key is the AQE skew axis.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cells import DEFAULT_CELL_SIZE, cell_xy, pack_cell
from .hotspot import round6z
from .join import oracle_point_pairs_sql, point_pairs_within

#: default K-function evaluation radii (m) — quarter-cell steps up to
#: the lossless ring-1 bound (= DEFAULT_CELL_SIZE).
RIPLEY_RADII = (31.25, 62.5, 93.75, 125.0)

#: Knox defaults: "close" = within 50 m and within 30 minutes.
KNOX_DS = 50.0
KNOX_DT_US = 30 * 60 * 1_000_000


def ripley_k(
    points: DataFrame,
    radii: tuple[float, ...] = RIPLEY_RADII,
    cell_size: float = DEFAULT_CELL_SIZE,
) -> DataFrame:
    """(radius, n_points, pairs_le, k_hat, l_hat): Ripley's K-function
    profile of the point set at each radius, with the variance-
    stabilized L transform.

      K̂(r) = A · 2·P(r) / (n·(n−1))      L̂(r) = sqrt(K̂(r)/π) − r

    with P(r) = #unordered pairs within r and A the bounding-box area
    (naive estimator, no edge correction — stated, not hidden: at the
    engine's scale the bbox interior dominates the boundary band).
    L̂ > 0 marks clustering at that scale, L̂ < 0 inhibition.

    One pair pass at max(radii) + one conditional-sum aggregate for ALL
    radii + a broadcast 1-row globals join; the per-radius rows come
    from exploding a literal struct array, not rescanning pairs.
    """
    rs = sorted(float(r) for r in radii)
    if not rs or rs[0] <= 0:
        raise ValueError("radii must be positive")
    if rs[-1] > cell_size:
        # same precondition as point_pairs_within: ring-1 cover is only
        # lossless when the search distance fits one cell
        raise ValueError("max radius must be <= cell_size for ring-1 pairing")
    pairs = point_pairs_within(points, distance_m=rs[-1], cell_size=cell_size)
    counts = pairs.agg(
        *[
            F.coalesce(
                F.sum((F.col("dist2") <= F.lit(r * r)).cast("long")),
                F.lit(0).cast("long"),
            ).alias(f"c_{i}")
            for i, r in enumerate(rs)
        ]
    )
    g = points.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("px").alias("xmin"),
        F.max("px").alias("xmax"),
        F.min("py").alias("ymin"),
        F.max("py").alias("ymax"),
    )
    per_r = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("radius"),
                    F.col(f"c_{i}").alias("pairs_le"),
                )
                for i, r in enumerate(rs)
            ]
        )
    ).alias("e")
    nd = F.col("n_points").cast("double")
    ad = (F.col("xmax") - F.col("xmin")) * (F.col("ymax") - F.col("ymin"))
    cd = F.col("e.pairs_le").cast("double")
    k_hat = (ad * (F.lit(2.0) * cd)) / (nd * (nd - F.lit(1.0)))
    l_hat = F.sqrt(k_hat / F.lit(math.pi)) - F.col("e.radius")
    return (
        g.crossJoin(F.broadcast(counts))
        .select("n_points", "xmin", "xmax", "ymin", "ymax", per_r)
        .select(
            F.col("e.radius").alias("radius"),
            "n_points",
            F.col("e.pairs_le").alias("pairs_le"),
            F.round(k_hat, 6).alias("k_hat"),
            F.round(l_hat, 6).alias("l_hat"),
        )
    )


def oracle_ripley_k_sql(
    radii: tuple[float, ...] = RIPLEY_RADII,
    cell_size: float = DEFAULT_CELL_SIZE,
) -> str:
    """DuckDB mirror over the addrpnts CTE. The pair set comes from the
    bbox-range self-join (different pruning than the engine's cell
    ring — the match is evidence the single-join pairing is exact)."""
    rs = sorted(float(r) for r in radii)
    pair_sql = oracle_point_pairs_sql(distance_m=rs[-1])
    conds = ",\n         ".join(
        f"COALESCE(CAST(sum(CASE WHEN dist2 <= {r * r!r} THEN 1 ELSE 0 END)"
        f" AS BIGINT), 0) AS c_{i}"
        for i, r in enumerate(rs)
    )
    # CAST: a bare 31.25 literal is DECIMAL in DuckDB; the engine column
    # is DOUBLE and the gate compares schemas
    branches = "\n  UNION ALL ".join(
        f"SELECT CAST({r!r} AS DOUBLE) AS radius, c_{i} AS pairs_le"
        " FROM rip_c"
        for i, r in enumerate(rs)
    )
    khat = (
        "(((g.xmax - g.xmin) * (g.ymax - g.ymin))"
        " * (2.0 * CAST(r.pairs_le AS DOUBLE)))"
        " / (CAST(g.n_points AS DOUBLE)"
        " * (CAST(g.n_points AS DOUBLE) - 1.0))"
    )
    return f"""
rip_pairs AS ({pair_sql}),
rip_g AS (
  SELECT count(*) AS n_points,
         min(px) AS xmin, max(px) AS xmax,
         min(py) AS ymin, max(py) AS ymax
  FROM addrpnts
),
rip_c AS (
  SELECT {conds}
  FROM rip_pairs
),
rip_r AS (
  {branches}
)
SELECT r.radius, g.n_points, r.pairs_le,
       ROUND({khat}, 6) AS k_hat,
       ROUND(SQRT({khat} / {math.pi!r}) - r.radius, 6) AS l_hat
FROM rip_g g CROSS JOIN rip_r r"""


def knox(
    pings: DataFrame,
    ds: float = KNOX_DS,
    dt_us: int = KNOX_DT_US,
    cell_size: float = DEFAULT_CELL_SIZE,
) -> DataFrame:
    """One row (n_events, total_pairs, s_pairs, t_pairs, st_pairs,
    expected_st, z): Knox space–time interaction test over the ping
    stream — are event pairs that are close in space (<= ds metres)
    ALSO close in time (<= dt_us microseconds) more often than
    independence predicts?

      E[X] = S·T / N_pairs   (S space-close, T time-close, X = both)
      z    = (X − E) / sqrt(E)     (Poisson approximation)

    z >> 0 is the contagion / co-movement signature. All four counts
    are exact integers; time arithmetic is integer microseconds
    (unix_micros / epoch_us — identical in both engines, no float
    epoch round-trip).

    Plan: the spatial pair pass is point_pairs_within's shape (carrying
    ts), counted with one conditional aggregate into (s_pairs,
    st_pairs); the temporal pass is its 1-D analogue — left side keeps
    its own floor(t/dt) bucket, right side explodes to the 3 adjacent
    buckets, so |t_a − t_b| <= dt implies exactly one bucket match and
    each unordered pair is counted once (a_id < b_id). No global sort,
    no window over the full stream; both shuffles are keyed (cell,
    bucket) and AQE-splittable.
    """
    if ds > cell_size:
        raise ValueError("lossless ring-1 pairing needs ds <= cell_size")
    if dt_us <= 0:
        raise ValueError("dt_us must be positive")
    # parquet TIMESTAMP_NTZ → epoch micros (session TZ pinned UTC, so
    # this agrees with DuckDB's epoch_us — same pattern as events.py)
    ev = pings.select(
        F.col("ping_id").alias("a_id"),
        "px",
        "py",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )
    # spatial pass: own cell vs ring-1 cover, each qualifying pair once
    cx, cy = cell_xy(F.col("px"), F.col("py"), cell_size)
    a = ev.select(
        "a_id",
        F.col("px").alias("ax"),
        F.col("py").alias("ay"),
        F.col("t").alias("at"),
        pack_cell(cx, cy).alias("cell"),
    )
    ring = F.sequence(F.lit(-1), F.lit(1))
    b = (
        ev.select(
            F.col("a_id").alias("b_id"),
            F.col("px").alias("bx"),
            F.col("py").alias("by"),
            F.col("t").alias("bt"),
            cx.alias("cx"),
            cy.alias("cy"),
        )
        .select(
            "b_id", "bx", "by", "bt", "cx", "cy",
            F.explode(ring).alias("dx"),
        )
        .select(
            "b_id", "bx", "by", "bt", "cx", "cy", "dx",
            F.explode(ring).alias("dy"),
        )
        .select(
            "b_id", "bx", "by", "bt",
            pack_cell(
                F.col("cx") + F.col("dx"), F.col("cy") + F.col("dy")
            ).alias("cell"),
        )
    )
    dist2 = (F.col("bx") - F.col("ax")) * (F.col("bx") - F.col("ax")) + (
        F.col("by") - F.col("ay")
    ) * (F.col("by") - F.col("ay"))
    close_t = (
        F.abs(F.col("bt") - F.col("at")) <= F.lit(int(dt_us))
    ).cast("long")
    # shuffle_hash with the build on the UNEXPLODED a side (lesson 11:
    # the 9x ring side must be the streamed side), and NO stats-driven
    # broadcast: Generate keeps the child's size estimate, so at clone
    # scale Catalyst plans a "small" broadcast that is actually 10 GiB —
    # measured failing at 10 M pings before this hint
    sp = (
        a.hint("shuffle_hash").join(b, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(dist2 <= F.lit(float(ds) * float(ds)))
        .agg(
            F.count(F.lit(1)).alias("s_pairs"),
            F.coalesce(F.sum(close_t), F.lit(0).cast("long")).alias(
                "st_pairs"
            ),
        )
    )
    # temporal pass: own bucket vs {-1,0,1} exploded buckets
    ta = ev.select("a_id", F.col("t").alias("at"), F.expr(
        f"t div {int(dt_us)}").alias("tb"))
    tb = ev.select(
        F.col("a_id").alias("b_id"),
        F.col("t").alias("bt"),
        F.expr(f"t div {int(dt_us)}").alias("tb0"),
    ).select(
        "b_id",
        "bt",
        "tb0",
        F.explode(ring).alias("d"),
    ).select(
        "b_id", "bt", (F.col("tb0") + F.col("d")).alias("tb")
    )
    tp = (
        ta.hint("shuffle_hash").join(tb, "tb")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.abs(F.col("bt") - F.col("at")) <= F.lit(int(dt_us)))
        .agg(F.count(F.lit(1)).alias("t_pairs"))
    )
    g = pings.agg(F.count(F.lit(1)).alias("n_events"))
    nd = F.col("n_events").cast("double")
    total = F.col("n_events") * (F.col("n_events") - F.lit(1)) / F.lit(2)
    sd, td = F.col("s_pairs").cast("double"), F.col("t_pairs").cast("double")
    xd = F.col("st_pairs").cast("double")
    ed = (sd * td) / (nd * (nd - F.lit(1.0)) / F.lit(2.0))
    z = F.when(
        (F.col("s_pairs") > 0) & (F.col("t_pairs") > 0),
        (xd - ed) / F.sqrt(ed),
    )
    return (
        g.crossJoin(F.broadcast(sp))
        .crossJoin(F.broadcast(tp))
        .select(
            "n_events",
            total.cast("long").alias("total_pairs"),
            "s_pairs",
            "t_pairs",
            "st_pairs",
            F.round(ed, 6).alias("expected_st"),
            round6z(z).alias("z"),
        )
    )


def oracle_knox_sql(
    ds: float = KNOX_DS,
    dt_us: int = KNOX_DT_US,
) -> str:
    """DuckDB mirror over the pings CTE. Pair sets come from bbox /
    plain-range self-joins (different pruning than the engine's
    cell-ring and bucket-ring passes — the match is evidence both
    exactly-once pairings are correct)."""
    d = float(ds)
    e_expr = (
        "(CAST(kx_sp.s_pairs AS DOUBLE) * CAST(kx_tp.t_pairs AS DOUBLE))"
        " / (CAST(kx_g.n_events AS DOUBLE)"
        " * (CAST(kx_g.n_events AS DOUBLE) - 1.0) / 2.0)"
    )
    return f"""
kx_ev AS (
  SELECT ping_id AS a_id, px, py, epoch_us(ts) AS t FROM pings
),
kx_sp AS (
  SELECT count(*) AS s_pairs,
         COALESCE(CAST(sum(CASE WHEN abs(b.t - a.t) <= {int(dt_us)}
                                THEN 1 ELSE 0 END) AS BIGINT), 0)
             AS st_pairs
  FROM kx_ev a JOIN kx_ev b
    ON b.a_id > a.a_id
   AND b.px BETWEEN a.px - {d!r} AND a.px + {d!r}
   AND b.py BETWEEN a.py - {d!r} AND a.py + {d!r}
  WHERE (b.px - a.px) * (b.px - a.px)
        + (b.py - a.py) * (b.py - a.py) <= {d * d!r}
),
kx_tp AS (
  SELECT count(*) AS t_pairs
  FROM kx_ev a JOIN kx_ev b
    ON b.a_id > a.a_id
   AND b.t BETWEEN a.t - {int(dt_us)} AND a.t + {int(dt_us)}
),
kx_g AS (
  SELECT count(*) AS n_events FROM kx_ev
)
SELECT kx_g.n_events,
       CAST(kx_g.n_events * (kx_g.n_events - 1) / 2 AS BIGINT)
           AS total_pairs,
       kx_sp.s_pairs, kx_tp.t_pairs, kx_sp.st_pairs,
       ROUND({e_expr}, 6) AS expected_st,
       ROUND(CASE WHEN kx_sp.s_pairs > 0 AND kx_tp.t_pairs > 0
                  THEN (CAST(kx_sp.st_pairs AS DOUBLE) - {e_expr})
                       / SQRT({e_expr})
             END, 6) AS z
FROM kx_g CROSS JOIN kx_sp CROSS JOIN kx_tp"""


def g_function(
    points: DataFrame,
    radii: tuple[float, ...] = RIPLEY_RADII,
    cell_size: float = DEFAULT_CELL_SIZE,
) -> DataFrame:
    """(radius, n_points, nn_le, g_hat): nearest-neighbor distance
    distribution (the G-function) at each radius — the FIRST-order
    companion to ripley_k's second-order K: G(r) = fraction of points
    whose nearest neighbor lies within r.

    Censoring is explicit and exact: a point with NO neighbor within
    max(radii) (= the lossless ring-1 bound) simply never enters nn_le;
    G(r) is a true count ratio, not an estimate, for every r <= the cap.
    Under CSR G(r) = 1 - exp(-λπr²); G above that curve means
    aggregation — at the engine's lattice-clustered address points
    G(31.25) is already near 1.

    Shape: the same single pair pass as ripley_k, mirrored to both
    directions (each unordered pair serves as a candidate for BOTH
    endpoints), one min-per-point HashAggregate, then ONE conditional-
    sum aggregate for all radii. nn_le counts are exact integers; g_hat
    is the one final double division.
    """
    rs = sorted(float(r) for r in radii)
    if not rs or rs[0] <= 0:
        raise ValueError("radii must be positive")
    if rs[-1] > cell_size:
        raise ValueError("max radius must be <= cell_size for ring-1 pairing")
    pairs = point_pairs_within(points, distance_m=rs[-1], cell_size=cell_size)
    # mirror each pair to both endpoints with ONE generator — a union of
    # two selects would make Spark evaluate the whole pair join twice
    both = pairs.select(
        F.explode(F.array("a_id", "b_id")).alias("pid"), "dist2"
    )
    nn = both.groupBy("pid").agg(F.min("dist2").alias("nn_dist2"))
    counts = nn.agg(
        *[
            F.coalesce(
                F.sum((F.col("nn_dist2") <= F.lit(r * r)).cast("long")),
                F.lit(0).cast("long"),
            ).alias(f"c_{i}")
            for i, r in enumerate(rs)
        ]
    )
    g = points.agg(F.count(F.lit(1)).alias("n_points"))
    per_r = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("radius"),
                    F.col(f"c_{i}").alias("nn_le"),
                )
                for i, r in enumerate(rs)
            ]
        )
    ).alias("e")
    g_hat = F.col("e.nn_le").cast("double") / F.col("n_points").cast("double")
    return (
        g.crossJoin(F.broadcast(counts))
        .select("n_points", per_r)
        .select(
            F.col("e.radius").alias("radius"),
            "n_points",
            F.col("e.nn_le").alias("nn_le"),
            F.round(g_hat, 6).alias("g_hat"),
        )
    )


def oracle_g_function_sql(
    radii: tuple[float, ...] = RIPLEY_RADII,
    cell_size: float = DEFAULT_CELL_SIZE,
) -> str:
    """DuckDB mirror over the addrpnts CTE — bbox-range self-join
    (per-point min, both directions via objectid !=), different pruning
    than the engine's mirrored cell-ring pass."""
    rs = sorted(float(r) for r in radii)
    d = rs[-1]
    conds = ",\n         ".join(
        f"COALESCE(CAST(sum(CASE WHEN nn_dist2 <= {r * r!r} THEN 1 ELSE 0 END)"
        f" AS BIGINT), 0) AS c_{i}"
        for i, r in enumerate(rs)
    )
    branches = "\n  UNION ALL ".join(
        f"SELECT CAST({r!r} AS DOUBLE) AS radius, c_{i} AS nn_le FROM gf_c"
        for i, r in enumerate(rs)
    )
    return f"""
gf_nn AS (
  SELECT a.objectid AS pid,
         min((b.px - a.px) * (b.px - a.px)
             + (b.py - a.py) * (b.py - a.py)) AS nn_dist2
  FROM addrpnts a JOIN addrpnts b
    ON b.objectid <> a.objectid
   AND b.px BETWEEN a.px - {d!r} AND a.px + {d!r}
   AND b.py BETWEEN a.py - {d!r} AND a.py + {d!r}
  WHERE (b.px - a.px) * (b.px - a.px)
        + (b.py - a.py) * (b.py - a.py) <= {d * d!r}
  GROUP BY 1
),
gf_c AS (
  SELECT {conds}
  FROM gf_nn
),
gf_g AS (
  SELECT count(*) AS n_points FROM addrpnts
),
gf_r AS (
  {branches}
)
SELECT r.radius, g.n_points, r.nn_le,
       ROUND(CAST(r.nn_le AS DOUBLE) / CAST(g.n_points AS DOUBLE), 6)
           AS g_hat
FROM gf_g g CROSS JOIN gf_r r"""
