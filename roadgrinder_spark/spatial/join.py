"""Cell-keyed spatial join, kNN nearest-road, and the geocode matcher (J5).

The reference never implemented this (grinders/NextGenGrinder.cs:6-17
throws); BASELINE.json `north_star` mandates it. Everything here is
built-in Column arithmetic — whole-stage codegen, no Python in the hot
path — so the same expression shapes can be mirrored in DuckDB oracle SQL
for exact value checks.

Scale design:
  * kNN candidates come from the grid-cell equi-join (spatial/cells.py):
    shuffle partitions by cell id, so co-located geometry lands in the
    same partition. Dense urban cells are heavy-hitter keys → use
    spatial/skew.salted_cell_join (explicit salting) on top of AQE's
    skew-join splitting.
  * The pruning is lossless for radius <= cell_size with ring=1 cover, so
    the final answer is identical to a brute-force join — verified by the
    DuckDB oracle which prunes differently (bbox ranges).
  * geocode match joins on the street signature (addrsys/name/type/dirs):
    bounded per-key group size at any scale except mega-skewed names
    ("MAIN ST") — same salting utility applies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .cells import DEFAULT_CELL_SIZE, pack_cell, point_cell, segment_bbox_cover

DEFAULT_RADIUS_M = 100.0


def point_segment_dist2(
    px: Column, py: Column, x1: Column, y1: Column, x2: Column, y2: Column
) -> Column:
    """Squared distance point→segment, clamped-projection form, as ONE
    column expression. Same IEEE op order as `dist2_select_sql`, so
    doubles are bit-identical and rank tiebreaks agree across engines.

    Prefer `with_dist2` in plans — the single-expression form duplicates
    the dot/len2 subtrees ~20x, which bloats analysis/codegen time even
    when runtime CSE kicks in."""
    ax, ay = px - x1, py - y1
    abx, aby = x2 - x1, y2 - y1
    len2 = abx * abx + aby * aby
    dot = ax * abx + ay * aby
    t = (
        F.when(dot <= 0.0, F.lit(0.0))
        .when(dot >= len2, F.lit(1.0))
        .otherwise(dot / len2)
    )
    ddx = px - (x1 + t * abx)
    ddy = py - (y1 + t * aby)
    return ddx * ddx + ddy * ddy


def with_dist2(
    df: DataFrame,
    px: str = "px",
    py: str = "py",
    x1: str = "x1",
    y1: str = "y1",
    x2: str = "x2",
    y2: str = "y2",
) -> DataFrame:
    """Add `dist2` via staged columns (linear-size expression tree).

    Each intermediate is used more than once downstream, so Catalyst's
    CollapseProject keeps the stages separate instead of re-inlining —
    every value is computed exactly once per row. IEEE op order matches
    point_segment_dist2 / dist2_select_sql exactly."""
    c = F.col
    t = (
        F.when(c("_dot") <= 0.0, F.lit(0.0))
        .when(c("_dot") >= c("_len2"), F.lit(1.0))
        .otherwise(c("_dot") / c("_len2"))
    )
    return (
        df.withColumns(
            {"_abx": c(x2) - c(x1), "_aby": c(y2) - c(y1)}
        )
        .withColumns(
            {
                "_dot": (c(px) - c(x1)) * c("_abx") + (c(py) - c(y1)) * c("_aby"),
                "_len2": c("_abx") * c("_abx") + c("_aby") * c("_aby"),
            }
        )
        .withColumn("_t", t)
        .withColumns(
            {
                "_ddx": c(px) - (c(x1) + c("_t") * c("_abx")),
                "_ddy": c(py) - (c(y1) + c("_t") * c("_aby")),
            }
        )
        .withColumn("dist2", c("_ddx") * c("_ddx") + c("_ddy") * c("_ddy"))
        .drop("_abx", "_aby", "_dot", "_len2", "_t", "_ddx", "_ddy")
    )


def dist2_select_sql(
    src: str,
    px: str = "px",
    py: str = "py",
    x1: str = "x1",
    y1: str = "y1",
    x2: str = "x2",
    y2: str = "y2",
) -> str:
    """DuckDB spelling of point_segment_dist2: a staged SELECT over `src`
    (a table/CTE name) that adds a `dist2` column. Same IEEE op shapes as
    the Column version, so doubles match bit-for-bit."""
    return f"""
      SELECT * EXCLUDE (_abx, _aby, _dot, _len2, _t, _ddx, _ddy),
             _ddx * _ddx + _ddy * _ddy AS dist2 FROM (
        SELECT *, {px} - ({x1} + _t * _abx) AS _ddx, {py} - ({y1} + _t * _aby) AS _ddy FROM (
          SELECT *, CASE WHEN _dot <= 0.0 THEN 0.0
                         WHEN _dot >= _len2 THEN 1.0
                         ELSE _dot / _len2 END AS _t FROM (
            SELECT *, ({px} - {x1}) * _abx + ({py} - {y1}) * _aby AS _dot,
                   _abx * _abx + _aby * _aby AS _len2 FROM (
              SELECT *, {x2} - {x1} AS _abx, {y2} - {y1} AS _aby FROM {src}
            )
          )
        )
      )"""


def knn_join(
    points: DataFrame,
    roads: DataFrame,
    k: int = 1,
    radius_m: float = DEFAULT_RADIUS_M,
    cell_size: float = DEFAULT_CELL_SIZE,
    salt_threshold: int | None = None,
    n_salt: int = 16,
    join_strategy: str = "shuffle_hash",
) -> DataFrame:
    """k nearest road segments within radius for each point.

    points: objectid, px, py.  roads: objectid, x1, y1, x2, y2.
    Returns (point_id, road_id, rank, dist2, cell) — `cell` is the point's
    tile assignment (parity column).

    Plan: point→cell (arith) ⋈ segment bbox+ring cover (sequence/explode)
    on cell id → exact dist² residual → per-point top-k window. With
    salt_threshold set, hot cells are salted via skew.salted_cell_join.

    join_strategy='shuffle_hash' (default) hints the cell join away from
    broadcast: measured ~20% faster at EVERY parallelism level on the
    7M-point scaling job (2c 14.6→11.6 s, 8c 4.7→3.9 s, 32c 2.9→2.35 s)
    — rebuilding the 184k-row broadcast hash relation per job costs more
    than the extra exchange. It is also the only viable strategy once the
    cover side outgrows broadcast thresholds at corpus scale. Pass
    'broadcast' to restore the old plan for small-dim cases.
    """
    if radius_m > cell_size:
        # ValueError, not assert: python -O strips asserts, and a violating
        # caller would silently lose matches past the ring-1 cover
        # (orphan_points would then report FALSE orphans — ADVICE r5).
        raise ValueError(
            f"lossless pruning needs radius_m ({radius_m}) <= cell_size "
            f"({cell_size})"
        )
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
    if salt_threshold is not None:
        from .skew import salted_cell_join

        cand = salted_cell_join(pts, cover, threshold=salt_threshold, n_salt=n_salt)
    else:
        if join_strategy == "shuffle_hash":
            cover = cover.hint("shuffle_hash")
        elif join_strategy == "broadcast":
            cover = F.broadcast(cover)
        cand = pts.join(cover, "cell")
    # dist2 computed in a Project AFTER the join (whole-stage codegen CSEs
    # the shared subtrees there); the radius filter is applied AFTER the
    # rank — it commutes with a distance-ordered row_number, and keeping it
    # out of the join residual stops Catalyst from inlining the huge dist2
    # expression into the join condition where it would be re-evaluated per
    # subtree per pair. WindowGroupLimit prunes to top-k map-side.
    cand = with_dist2(cand)
    r2 = F.lit(float(radius_m) ** 2)
    if k == 1:
        # top-1 as an AGGREGATE: min(dist2) + min_by over the unique
        # ordering struct(dist2, road_id) — deterministic (the ordering
        # key is unique per candidate). Struct-ordered min_by still
        # compiles to SortAggregate (struct buffers are not hash-
        # aggregable), but the partial phase sorts by GROUP KEY only and
        # emits ~1 row per point, so the exchange is tiny. VERDICT r1 #6
        # measured at sf0.1/local[32]: this form 1.61 s vs 1.77 s for
        # min(struct) and 2.84 s for a two-pass HashAggregate
        # (min(dist2) then join-back + min(road_id)) — the hash-agg
        # rewrite LOSES because the candidate join is recomputed; and an
        # exact packed-bigint key is unbuildable (no double->bits
        # builtin; 63 dist2 bits + road_id exceed 64 bits).
        best = (
            cand.groupBy("point_id", "cell")
            .agg(
                F.min("dist2").alias("dist2"),
                F.min_by("road_id", F.struct("dist2", "road_id")).alias("road_id"),
            )
            .filter(F.col("dist2") <= r2)
        )
        return best.select(
            "point_id", "road_id", F.lit(1).alias("rank"), "dist2", "cell"
        )
    w = Window.partitionBy("point_id").orderBy(F.col("dist2").asc(), F.col("road_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") <= k) & (F.col("dist2") <= r2))
        .select("point_id", "road_id", "rank", "dist2", "cell")
    )


#: default hex size for the kNN join: hex WIDTH (sqrt(3)*size) equals the
#: square grid pitch, so per-cell point density matches the square join's
#: and the smaller pad (radius + size) keeps the candidate fanout
#: comparable — with hexes at size=DEFAULT_CELL_SIZE the candidate set
#: measured 8x the square grid's and 60M-point throughput dropped 5x.
HEX_KNN_SIZE = DEFAULT_CELL_SIZE / 1.7320508075688772


def hex_knn(
    points: DataFrame,
    roads: DataFrame,
    k: int = 1,
    radius_m: float = DEFAULT_RADIUS_M,
    size: float = HEX_KNN_SIZE,
) -> DataFrame:
    """kNN nearest-road on the HEX index (VERDICT r4 #7): same contract
    as knn_join, but candidates come from the axial hex-cell equi-join —
    point → (hq, hr) via hex_cell_cols, segment → hex_segment_cover with
    pad = radius + size (lossless for ANY radius: the pad absorbs the hex
    circumradius, see the cover's docstring). Exact dist² residual +
    identical top-k ordering, so the (point_id, road_id, rank, dist2)
    result EQUALS knn_join's at matched resolution — pinned by
    tests/test_spatial.py::test_hex_knn_equals_square_grid.

    Returns (point_id, road_id, rank, dist2, hq, hr) — hq/hr are the
    point's hex tile assignment (parity columns).

    Scale shape is the square-grid plan's: shuffle by hex cell id, hot
    downtown hexes are the same heavy-hitter keys (skew.salted_cell_join
    composes — the salt is on the packed cell)."""
    from .cells import hex_cell_cols, hex_segment_cover, pack_cell

    # the candidate join uses NULL-SAFE equality (<=>) on the packed hex
    # id: a plain equi-join infers isnotnull(key) and pushes it below
    # the upstream projections with the key EXPRESSION substituted in —
    # the hex tree (which duplicates its qf/rf subtrees ~15×) then gets
    # re-evaluated on every raw source row: 22 s vs 1.7 s for the same
    # join at sf0.1 (BASELINE.md lesson 9). eqNullSafe suppresses the
    # inference, keeping the id evaluated ONCE in its Project, fully
    # JVM-side. Null keys cannot produce spurious matches: the cover
    # side never emits a null id (null bounds explode to zero rows).
    hq, hr = hex_cell_cols("px", "py", size)
    pts = points.select(
        F.col("objectid").alias("point_id"),
        "px",
        "py",
        hq.alias("hq"),
        hr.alias("hr"),
    ).withColumn("hcell", pack_cell(F.col("hq"), F.col("hr")))
    cover = hex_segment_cover(
        roads.select(F.col("objectid").alias("road_id"), "x1", "y1", "x2", "y2"),
        size=size,
        pad=float(radius_m) + float(size),
    ).withColumnRenamed("hcell", "hcell_r").hint("shuffle_hash")
    cand = with_dist2(
        pts.join(cover, F.col("hcell").eqNullSafe(F.col("hcell_r"))).drop("hcell_r")
    )
    r2 = F.lit(float(radius_m) ** 2)
    if k == 1:
        best = (
            cand.groupBy("point_id", "hq", "hr")
            .agg(
                F.min("dist2").alias("dist2"),
                F.min_by("road_id", F.struct("dist2", "road_id")).alias("road_id"),
            )
            .filter(F.col("dist2") <= r2)
        )
        return best.select(
            "point_id", "road_id", F.lit(1).alias("rank"), "dist2", "hq", "hr"
        )
    w = Window.partitionBy("point_id").orderBy(
        F.col("dist2").asc(), F.col("road_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") <= k) & (F.col("dist2") <= r2))
        .select("point_id", "road_id", "rank", "dist2", "hq", "hr")
    )


def oracle_hex_knn_sql(
    k: int = 1,
    radius_m: float = DEFAULT_RADIUS_M,
    size: float = HEX_KNN_SIZE,
) -> str:
    """DuckDB oracle for hex_knn: bbox-range candidate join (a different
    pruning than the hex cover — agreement is evidence the cover is
    lossless) + identical dist²/rank, hex tile via the shared
    _hex_qr_exprs strings."""
    from .cells import _hex_qr_exprs

    r = float(radius_m)
    hq, hr = _hex_qr_exprs("p.px", "p.py", size)
    return f"""
hknn_cand0 AS (
  SELECT p.objectid AS point_id, r.objectid AS road_id, p.px, p.py,
         r.x1, r.y1, r.x2, r.y2,
         {hq} AS hq, {hr} AS hr
  FROM addrpnts p JOIN roads r
    ON p.px BETWEEN (CASE WHEN r.x1 < r.x2 THEN r.x1 ELSE r.x2 END) - {r}
               AND (CASE WHEN r.x1 > r.x2 THEN r.x1 ELSE r.x2 END) + {r}
   AND p.py BETWEEN (CASE WHEN r.y1 < r.y2 THEN r.y1 ELSE r.y2 END) - {r}
               AND (CASE WHEN r.y1 > r.y2 THEN r.y1 ELSE r.y2 END) + {r}
),
hknn_cand AS ({dist2_select_sql('hknn_cand0')})
SELECT point_id, road_id, rank, dist2, hq, hr FROM (
  SELECT point_id, road_id, dist2, hq, hr,
         row_number() OVER (PARTITION BY point_id ORDER BY dist2, road_id) AS rank
  FROM hknn_cand WHERE dist2 <= {r * r}
) WHERE rank <= {k}"""


def point_pairs_within(
    points: DataFrame,
    distance_m: float = 25.0,
    cell_size: float = DEFAULT_CELL_SIZE,
) -> DataFrame:
    """Distance-band spatial SELF-join: all unordered point pairs within
    `distance_m` — the co-location primitive behind duplicate-address
    detection and spatial clustering. Returns (a_id, b_id, dist2) with
    a_id < b_id.

    Plan (no dedup pass needed): the LEFT side keeps only its OWN cell;
    the RIGHT side explodes into its 3×3 ring. For distance <= cell_size
    the ring-1 cover of b always contains a's cell when the pair is
    within range, and since a's cell is unique each qualifying pair
    joins EXACTLY once — candidate join is a plain equi-join on cell,
    residual is the exact point distance. Shuffle is by cell id (9N
    ring rows); dense downtown cells are the usual heavy hitters and
    AQE skew-split applies (same key shape as knn_join)."""
    if distance_m > cell_size:
        raise ValueError("lossless ring-1 pairing needs distance <= cell_size")
    s = float(cell_size)
    a = points.select(
        F.col("objectid").alias("a_id"),
        F.col("px").alias("ax"),
        F.col("py").alias("ay"),
        point_cell(F.col("px"), F.col("py"), s).alias("cell"),
    )
    ring = F.sequence(F.lit(-1), F.lit(1))
    b = (
        points.select(
            F.col("objectid").alias("b_id"),
            F.col("px").alias("bx"),
            F.col("py").alias("by"),
        )
        .withColumn("_dx", F.explode(ring))
        .withColumn("_dy", F.explode(ring))
        .withColumn("_cx", F.floor(F.col("bx") / s).cast("long") + F.col("_dx"))
        .withColumn("_cy", F.floor(F.col("by") / s).cast("long") + F.col("_dy"))
        .withColumn("cell", pack_cell(F.col("_cx"), F.col("_cy")))
        .drop("_dx", "_dy", "_cx", "_cy")
    )
    d2 = F.lit(float(distance_m) ** 2)
    dx = F.col("bx") - F.col("ax")
    dy = F.col("by") - F.col("ay")
    # build the per-partition hash relation from the UNEXPLODED side —
    # it is 9× smaller than the ring side by construction. Hinting the
    # ring side OOMed the build at 6.9M points ("can't acquire 128 MB
    # for hash relation"); the a-side build scales with N, not 9N.
    return (
        a.hint("shuffle_hash").join(b, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("dist2", dx * dx + dy * dy)
        .filter(F.col("dist2") <= d2)
        .select("a_id", "b_id", "dist2")
    )


def oracle_point_pairs_sql(distance_m: float = 25.0) -> str:
    """Bbox-range self-join (different pruning than the cell ring — the
    match is evidence the single-join pairing is exact)."""
    d = float(distance_m)
    return f"""
SELECT a.objectid AS a_id, b.objectid AS b_id,
       (b.px - a.px) * (b.px - a.px) + (b.py - a.py) * (b.py - a.py) AS dist2
FROM addrpnts a JOIN addrpnts b
  ON b.objectid > a.objectid
 AND b.px BETWEEN a.px - {d} AND a.px + {d}
 AND b.py BETWEEN a.py - {d} AND a.py + {d}
WHERE (b.px - a.px) * (b.px - a.px) + (b.py - a.py) * (b.py - a.py) <= {d * d}"""


def segment_intersections(
    roads: DataFrame, cell_size: float = DEFAULT_CELL_SIZE
) -> DataFrame:
    """Line-line intersection SELF-join over road segments — the
    topology primitive (crossing detection / planarization input).
    Returns (a_id, b_id) with a_id < b_id for every pair of segments
    that intersect (properly or touching), by the classic orientation
    test: AB and CD intersect iff the signed areas put C,D on opposite
    (or boundary) sides of AB AND A,B likewise for CD, with the
    collinear case restricted by bbox overlap. All double arithmetic,
    identical expression shapes engine-side and oracle-side.

    Plan: both sides explode to their bbox cell cover (ring 0); pairs
    sharing ANY cover cell are candidates, de-duplicated with ONE
    distinct on (a_id, b_id) BEFORE the O(1) predicate — the join ships
    only ids+coords. Cover overlap is a superset of bbox overlap, which
    is a superset of intersection, so the candidate set is lossless.
    Shuffle keys are cell ids (bounded cover per segment ≈ bbox/cell²),
    then the pair key; nothing quadratic outside a cell."""
    seg = roads.select(F.col("objectid").alias("sid"), "x1", "y1", "x2", "y2")
    cov = segment_bbox_cover(seg, cell_size=cell_size, ring=0)
    a = cov.select(
        F.col("sid").alias("a_id"), F.col("x1").alias("ax1"),
        F.col("y1").alias("ay1"), F.col("x2").alias("ax2"),
        F.col("y2").alias("ay2"), "cell",
    )
    b = cov.select(
        F.col("sid").alias("b_id"), F.col("x1").alias("bx1"),
        F.col("y1").alias("by1"), F.col("x2").alias("bx2"),
        F.col("y2").alias("by2"), "cell",
    )
    # no join-strategy hint: both cover sides have identical cardinality
    # and grow with the corpus, so the scale-safe plan is whatever the
    # planner picks (sort-merge once neither side fits a per-partition
    # hash build) — unlike knn_join, where the cover side is bounded by
    # the road network and shuffle_hash measured faster.
    cand = (
        a.join(b, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .drop("cell")
        .distinct()
    )

    def orient(ox, oy, px_, py_, qx, qy):
        return (px_ - ox) * (qy - oy) - (py_ - oy) * (qx - ox)

    c = F.col
    o1 = orient(c("ax1"), c("ay1"), c("ax2"), c("ay2"), c("bx1"), c("by1"))
    o2 = orient(c("ax1"), c("ay1"), c("ax2"), c("ay2"), c("bx2"), c("by2"))
    o3 = orient(c("bx1"), c("by1"), c("bx2"), c("by2"), c("ax1"), c("ay1"))
    o4 = orient(c("bx1"), c("by1"), c("bx2"), c("by2"), c("ax2"), c("ay2"))
    bbox = (
        (F.least(c("ax1"), c("ax2")) <= F.greatest(c("bx1"), c("bx2")))
        & (F.greatest(c("ax1"), c("ax2")) >= F.least(c("bx1"), c("bx2")))
        & (F.least(c("ay1"), c("ay2")) <= F.greatest(c("by1"), c("by2")))
        & (F.greatest(c("ay1"), c("ay2")) >= F.least(c("by1"), c("by2")))
    )
    hit = (o1 * o2 <= 0.0) & (o3 * o4 <= 0.0) & bbox
    return cand.filter(hit).select("a_id", "b_id")


def intersection_gate_corpus(roads: DataFrame, every: int = 7) -> DataFrame:
    """Deterministic crossing-augmented corpus for the intersection gate
    entry: the derived road grid is DISJOINT by construction (zero
    bbox-overlapping pairs — measured), so gating segment_intersections
    on it alone would be vacuous (the lsh_gate_corpus lesson). Every
    `every`-th segment gets a PERPENDICULAR clone through its midpoint
    (endpoints mid ∓ (−dy, dx)/2) — guaranteed to cross its source.
    Pure shared-dialect arithmetic; the oracle rebuilds the identical
    rows in SQL."""
    c = F.col
    src = roads.select("objectid", "x1", "y1", "x2", "y2")
    mx = (c("x1") + c("x2")) / 2.0
    my = (c("y1") + c("y2")) / 2.0
    dx = c("x2") - c("x1")
    dy = c("y2") - c("y1")
    clones = src.filter(F.pmod(c("objectid"), F.lit(every)) == 0).select(
        (c("objectid") + F.lit(10_000_000)).alias("objectid"),
        (mx - dy / 2.0).alias("x1"),
        (my + dx / 2.0).alias("y1"),
        (mx + dy / 2.0).alias("x2"),
        (my - dx / 2.0).alias("y2"),
    )
    return src.unionByName(clones)


def oracle_intersection_corpus_cte(every: int = 7) -> str:
    """CTE `aug_roads` = roads + the perpendicular clones (requires the
    roads CTE in scope). Same arithmetic as intersection_gate_corpus."""
    return f"""
aug_roads AS (
  SELECT objectid, x1, y1, x2, y2 FROM roads
  UNION ALL
  SELECT objectid + 10000000 AS objectid,
         (x1 + x2) / 2.0 - (y2 - y1) / 2.0 AS x1,
         (y1 + y2) / 2.0 + (x2 - x1) / 2.0 AS y1,
         (x1 + x2) / 2.0 + (y2 - y1) / 2.0 AS x2,
         (y1 + y2) / 2.0 - (x2 - x1) / 2.0 AS y2
  FROM roads WHERE objectid % {every} = 0
)"""


def oracle_segment_intersections_sql(src: str = "roads") -> str:
    """Bbox-overlap candidate self-join + the SAME orientation test.
    least/greatest are materialized in a CTE first: inlining them into
    the inequality-join ON clause trips a DuckDB IEJoin internal
    assertion ("requires a flat vector")."""

    def orient(ox, oy, px_, py_, qx, qy):
        return f"(({px_} - {ox}) * ({qy} - {oy}) - ({py_} - {oy}) * ({qx} - {ox}))"

    o1 = orient("a.x1", "a.y1", "a.x2", "a.y2", "b.x1", "b.y1")
    o2 = orient("a.x1", "a.y1", "a.x2", "a.y2", "b.x2", "b.y2")
    o3 = orient("b.x1", "b.y1", "b.x2", "b.y2", "a.x1", "a.y1")
    o4 = orient("b.x1", "b.y1", "b.x2", "b.y2", "a.x2", "a.y2")
    return f"""
ix_segs AS (
  SELECT objectid, x1, y1, x2, y2,
         least(x1, x2) AS xlo, greatest(x1, x2) AS xhi,
         least(y1, y2) AS ylo, greatest(y1, y2) AS yhi
  FROM {src}
)
SELECT a.objectid AS a_id, b.objectid AS b_id
FROM ix_segs a JOIN ix_segs b
  ON a.xlo <= b.xhi AND a.xhi >= b.xlo
 AND a.ylo <= b.yhi AND a.yhi >= b.ylo
 AND b.objectid > a.objectid
WHERE {o1} * {o2} <= 0.0 AND {o3} * {o4} <= 0.0"""


def road_sides(geocode_roads: DataFrame) -> DataFrame:
    """Explode each geocodable road into its L/R address-range sides.

    Turns the OR over (ADDRSYS_L, range L) / (ADDRSYS_R, range R) into an
    equi-joinable relation — keeps the geocode join a hash join instead of
    a nested-loop over an OR predicate.
    """
    side = F.explode(
        F.array(
            F.struct(
                F.lit("L").alias("side"),
                F.col("ADDRSYS_L").alias("addrsys"),
                F.col("FROMADDR_L").cast("long").alias("addr_from"),
                F.col("TOADDR_L").cast("long").alias("addr_to"),
            ),
            F.struct(
                F.lit("R").alias("side"),
                F.col("ADDRSYS_R").alias("addrsys"),
                F.col("FROMADDR_R").cast("long").alias("addr_from"),
                F.col("TOADDR_R").cast("long").alias("addr_to"),
            ),
        )
    )
    return (
        geocode_roads.withColumn("s", side)
        .select(
            "NAME",
            "POSTTYPE",
            "POSTDIR",
            "PREDIR",
            "GLOBALID_SGID",
            "x1",
            "y1",
            "x2",
            "y2",
            F.col("s.side").alias("side"),
            F.col("s.addrsys").alias("addrsys"),
            F.col("s.addr_from").alias("addr_from"),
            F.col("s.addr_to").alias("addr_to"),
        )
        .filter(~((F.col("addr_from") == 0) & (F.col("addr_to") == 0)))
    )


def geocode_match(
    addrpnts: DataFrame,
    geocode_roads: DataFrame,
    radius_m: float = 200.0,
    with_detail: bool = False,
    hash_keys: bool = False,
    salt_threshold: int | None = None,
    n_salt: int = 16,
    shuffle_sides: bool = False,
) -> DataFrame:
    """Flagship: assign each address point its candidate street segment.

    Match rule (address-locator semantics over the reference's outputs):
    street signature equality — upper(AddSystem)=ADDRSYS(side),
    StreetName=NAME, StreetType=POSTTYPE, SuffixDir=POSTDIR,
    PrefixDir=PREDIR — the house number inside the side's address range,
    the point within radius_m of the segment, nearest segment wins
    (tiebreak dist2, GLOBALID_SGID, side).

    Returns (point_id, road_gid, side) and, with_detail, the
    interpolation fraction + matched coordinate + dist2.

    salt_threshold: street signatures are Zipfian ("MAIN" + the metro's
    dominant posttype can dominate a corpus's address points) — when set,
    signatures with more than salt_threshold points route through
    skew.salted_equi_join (detect → broadcast → salt/replicate, n_salt
    ways); result set provably identical (equivalence pytest + the
    oracle row stays green). Mutually exclusive with hash_keys.

    shuffle_sides hints the signature join away from broadcast — at this
    repo's test scales the sides relation broadcasts (map-side join, no
    key skew possible); at corpus scale it outgrows the threshold and the
    join shuffles BY SIGNATURE, which is where hot-signature salting
    matters. The bench's skew_attr section uses this to emulate that
    regime honestly rather than benchmarking salting against a broadcast
    plan it can't beat.
    """
    sides = road_sides(geocode_roads)
    if shuffle_sides and salt_threshold is None:
        sides = sides.hint("shuffle_hash")
    pts = addrpnts.select(
        F.col("objectid").alias("point_id"),
        F.upper(F.col("AddSystem")).alias("p_addrsys"),
        F.col("StreetName"),
        F.col("StreetType"),
        F.col("SuffixDir"),
        F.col("PrefixDir"),
        F.col("AddNum").cast("long").alias("addnum"),
        "px",
        "py",
    ).filter(F.col("addnum").isNotNull())
    if hash_keys:
        # signature dictionary-encoding: join on TWO independent xxhash64
        # digests of the 5-string street signature instead of the strings.
        # Round-1 measured it ~27% faster when the datagen CTEs ran
        # inline; round-2, with parquet-backed inputs, the STRKEY path
        # wins (2.1-2.7 s vs 3.2-3.4 s interleaved at sf0.1) — the hash
        # projections cost more than the string-compare savings once the
        # scan is columnar. Kept as an option for string-heavy corpora
        # with long signatures. False pair probability <= 2^-128 per
        # candidate — astronomically below any practical corpus size, but
        # NOT exactly zero: strkey stays the default, where bit-exact
        # parity is contractual.
        sides = sides.withColumn(
            "_k1", F.xxhash64("addrsys", "NAME", "POSTTYPE", "POSTDIR", "PREDIR")
        ).withColumn(
            "_k2",
            F.xxhash64(F.lit("s2"), "addrsys", "NAME", "POSTTYPE", "POSTDIR", "PREDIR"),
        )
    pts_sig = [
        "p_addrsys", "StreetName", "StreetType", "SuffixDir", "PrefixDir"
    ]
    key_cols = None
    if hash_keys:
        key_cols = (
            F.xxhash64(*pts_sig),
            F.xxhash64(F.lit("s2"), *pts_sig),
        )
    between = F.col("addnum").between(
        F.least(sides["addr_from"], sides["addr_to"]),
        F.greatest(sides["addr_from"], sides["addr_to"]),
    )
    if hash_keys:
        cond = (
            (key_cols[0] == sides["_k1"]) & (key_cols[1] == sides["_k2"]) & between
        )
    else:
        cond = (
            (F.col("p_addrsys") == sides["addrsys"])
            & (F.col("StreetName") == sides["NAME"])
            & (F.col("StreetType") == sides["POSTTYPE"])
            & (F.col("SuffixDir") == sides["POSTDIR"])
            & (F.col("PrefixDir") == sides["PREDIR"])
            & between
        )
    # See knn_join: dist2 lives in a post-join Project (CSE'd by codegen),
    # and the radius cut happens after the rank (equivalent: the filter
    # commutes with a distance-ordered row_number).
    if salt_threshold is not None:
        assert not hash_keys, "salting operates on the string signature keys"
        from .skew import salted_equi_join

        sig = ["p_addrsys", "StreetName", "StreetType", "SuffixDir", "PrefixDir"]
        sides_renamed = (
            sides.withColumnRenamed("addrsys", "p_addrsys")
            .withColumnRenamed("NAME", "StreetName")
            .withColumnRenamed("POSTTYPE", "StreetType")
            .withColumnRenamed("POSTDIR", "SuffixDir")
            .withColumnRenamed("PREDIR", "PrefixDir")
        )
        joined = salted_equi_join(
            pts, sides_renamed, keys=sig, left_row_id="point_id",
            threshold=salt_threshold, n_salt=n_salt,
        )
        # the address-range residual commutes with the equi-join
        cand = joined.filter(
            F.col("addnum").between(
                F.least("addr_from", "addr_to"), F.greatest("addr_from", "addr_to")
            )
        )
    else:
        cand = pts.join(sides, cond, "inner")
    cand = with_dist2(cand)
    # nearest = min over struct(dist2, GLOBALID_SGID, side, <payload>):
    # a single-pass aggregate (SortAggregate with a partial phase — struct
    # buffers are not hash-aggregable — but the map side emits one row per
    # point, so the exchange is tiny). Same winner as a row_number window
    # ordered (dist2, gid, side): struct comparison is field-lexicographic
    # and payload fields only break exact ties. Radius filter after — it
    # commutes with the min.
    payload = F.struct(
        "dist2", "GLOBALID_SGID", "side", "addnum",
        "addr_from", "addr_to", "x1", "y1", "x2", "y2",
    )
    # min(payload) measured FASTER here than the knn-style min_by form
    # (1.65 s vs 1.86 s at sf0.1/local[32]): min_by's buffer carries
    # payload + ordering struct, while min's carries payload only and the
    # leading (dist2, gid, side) fields already define the order. See
    # knn_join for the full SortAggregate-vs-HashAggregate measurements
    # (VERDICT r1 #6).
    best = (
        cand.groupBy("point_id")
        .agg(F.min(payload).alias("b"))
        .filter(F.col("b.dist2") <= F.lit(float(radius_m) ** 2))
        .select("point_id", F.col("b.*"))
    )
    if not with_detail:
        return best.select("point_id", F.col("GLOBALID_SGID").alias("road_gid"), "side")
    t_addr = F.when(
        F.col("addr_to") != F.col("addr_from"),
        (F.col("addnum") - F.col("addr_from"))
        / (F.col("addr_to") - F.col("addr_from")),
    ).otherwise(F.lit(0.5))
    return best.select(
        "point_id",
        F.col("GLOBALID_SGID").alias("road_gid"),
        "side",
        "addnum",
        t_addr.alias("t_addr"),
        (F.col("x1") + t_addr * (F.col("x2") - F.col("x1"))).alias("match_x"),
        (F.col("y1") + t_addr * (F.col("y2") - F.col("y1"))).alias("match_y"),
        "dist2",
    )


# ---------------------------------------------------------------------------
# DuckDB oracle-SQL builders (driver correctness gate). The oracle prunes
# candidates with bbox+radius ranges (DuckDB IEJoin) — a DIFFERENT lossless
# pruning than the engine's cell join — so agreement actually validates
# that the cell pruning loses nothing.
# ---------------------------------------------------------------------------

def oracle_knn_sql(
    k: int = 1,
    radius_m: float = DEFAULT_RADIUS_M,
    cell_size: float = DEFAULT_CELL_SIZE,
) -> str:
    from .cells import point_cell_sql

    r = float(radius_m)
    return f"""
knn_cand0 AS (
  SELECT p.objectid AS point_id, r.objectid AS road_id, p.px, p.py,
         r.x1, r.y1, r.x2, r.y2,
         {point_cell_sql('p.px', 'p.py', cell_size)} AS cell
  FROM addrpnts p JOIN roads r
    ON p.px BETWEEN (CASE WHEN r.x1 < r.x2 THEN r.x1 ELSE r.x2 END) - {r}
               AND (CASE WHEN r.x1 > r.x2 THEN r.x1 ELSE r.x2 END) + {r}
   AND p.py BETWEEN (CASE WHEN r.y1 < r.y2 THEN r.y1 ELSE r.y2 END) - {r}
               AND (CASE WHEN r.y1 > r.y2 THEN r.y1 ELSE r.y2 END) + {r}
),
knn_cand AS ({dist2_select_sql('knn_cand0')})
SELECT point_id, road_id, rank, dist2, cell FROM (
  SELECT point_id, road_id, dist2, cell,
         row_number() OVER (PARTITION BY point_id ORDER BY dist2, road_id) AS rank
  FROM knn_cand WHERE dist2 <= {r * r}
) WHERE rank <= {k}"""


def oracle_geocode_match_sql(radius_m: float = 200.0, detail: bool = False) -> str:
    """`detail=True` mirrors geocode_match(with_detail=True): the winning
    candidate's address-range interpolation (t_addr = position of the
    house number inside the matched range, lerped onto the segment).
    Expression shapes match the engine exactly — long-long subtraction,
    IEEE double division, x1 + t*(x2-x1) — so the unrounded doubles are
    bit-identical (same discipline as the raw dist2 column)."""
    r = float(radius_m)
    side = (
        "SELECT NAME, POSTTYPE, POSTDIR, PREDIR, GLOBALID_SGID, x1, y1, x2, y2, "
        "'{s}' AS side, ADDRSYS_{s} AS addrsys, "
        "CAST(FROMADDR_{s} AS BIGINT) AS addr_from, "
        "CAST(TOADDR_{s} AS BIGINT) AS addr_to "
        "FROM scratch WHERE _kind = 'primary'"
    )
    return f"""
gc_sides AS (
  SELECT * FROM ({side.format(s='L')} UNION ALL {side.format(s='R')})
  WHERE NOT (addr_from = 0 AND addr_to = 0)
),
gc_pts AS (
  SELECT objectid AS point_id, upper(AddSystem) AS p_addrsys, StreetName,
         StreetType, SuffixDir, PrefixDir, TRY_CAST(AddNum AS BIGINT) AS addnum,
         px, py
  FROM addrpnts WHERE TRY_CAST(AddNum AS BIGINT) IS NOT NULL
),
gc_cand0 AS (
  SELECT p.point_id, p.px, p.py, s.x1, s.y1, s.x2, s.y2, s.side,
         s.GLOBALID_SGID, s.addr_from, s.addr_to, p.addnum
  FROM gc_pts p JOIN gc_sides s
    ON p.p_addrsys = s.addrsys AND p.StreetName = s.NAME
   AND p.StreetType = s.POSTTYPE AND p.SuffixDir = s.POSTDIR
   AND p.PrefixDir = s.PREDIR
   AND p.addnum BETWEEN least(s.addr_from, s.addr_to)
                    AND greatest(s.addr_from, s.addr_to)
),
gc_cand AS ({dist2_select_sql('gc_cand0')}),
gc_best AS (
  SELECT * FROM (
    SELECT point_id, GLOBALID_SGID AS road_gid, side, addnum, addr_from,
           addr_to, x1, y1, x2, y2, dist2,
           row_number() OVER (PARTITION BY point_id
                              ORDER BY dist2, GLOBALID_SGID, side) AS rank
    FROM gc_cand WHERE dist2 <= {r * r}
  ) WHERE rank = 1
)
{_GC_DETAIL_SELECT if detail else "SELECT point_id, road_gid, side FROM gc_best"}"""


#: final projection for oracle_geocode_match_sql(detail=True) — t_addr
#: computed once in a subquery so the lerp reuses the identical double
_GC_DETAIL_SELECT = """SELECT point_id, road_gid, side, addnum, t_addr,
       x1 + t_addr * (x2 - x1) AS match_x,
       y1 + t_addr * (y2 - y1) AS match_y, dist2
FROM (
  SELECT *, CASE WHEN addr_to <> addr_from
                 THEN (addnum - addr_from) / (addr_to - addr_from)
                 ELSE 0.5 END AS t_addr
  FROM gc_best
)"""


# ---------------------------------------------------------------------------
# spatial anti-join (round 5): address points with NO road within the
# match radius — the QA/exception report every geocoding pipeline ships
# next to its match table (unmatchable points = bad coordinates or missing
# network). Same candidate machinery as knn_join, reduced the other way.
# ---------------------------------------------------------------------------

def orphan_points(
    points: DataFrame,
    roads: DataFrame,
    radius_m: float = DEFAULT_RADIUS_M,
    cell_size: float = DEFAULT_CELL_SIZE,
) -> DataFrame:
    """(point_id, px, py) for every point with no segment within
    radius_m. Plan: cell-cover candidate join (lossless for radius <=
    cell_size, ring 1) → distinct matched point ids → LEFT ANTI against
    the full point set. The anti-join is a hash join on the point id —
    the matched-id set is a single BIGINT column, far below the point
    payload the naive not-exists plan would re-shuffle."""
    if radius_m > cell_size:
        # ValueError, not assert: python -O strips asserts, and a violating
        # caller would silently lose matches past the ring-1 cover
        # (orphan_points would then report FALSE orphans — ADVICE r5).
        raise ValueError(
            f"lossless pruning needs radius_m ({radius_m}) <= cell_size "
            f"({cell_size})"
        )
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
    ).hint("shuffle_hash")
    matched = (
        with_dist2(pts.join(cover, "cell"))
        .filter(F.col("dist2") <= F.lit(float(radius_m) ** 2))
        .select("point_id")
        .distinct()
    )
    # r7 plan audit (plans/r07/q_orphan_points_audit.txt): the anti-join
    # was planned SortMergeJoin — the matched-id set has no stats, so the
    # planner defaulted to the sort path and paid two full sorts.
    # shuffle_hash builds the hash from the single-BIGINT matched side
    # (bounded by the point count, scales per-partition; broadcast would
    # not, the same reasoning as the cover-side hint above).
    return pts.join(
        matched.hint("shuffle_hash"), "point_id", "left_anti"
    ).select("point_id", "px", "py")


def oracle_orphan_points_sql(radius_m: float = DEFAULT_RADIUS_M) -> str:
    """bbox-range candidate join (different pruning than the cell cover)
    + identical dist², anti via left-join-null."""
    r = float(radius_m)
    return f"""
orph_cand0 AS (
  SELECT p.objectid AS point_id, p.px, p.py, r.x1, r.y1, r.x2, r.y2
  FROM addrpnts p JOIN roads r
    ON p.px BETWEEN (CASE WHEN r.x1 < r.x2 THEN r.x1 ELSE r.x2 END) - {r}
               AND (CASE WHEN r.x1 > r.x2 THEN r.x1 ELSE r.x2 END) + {r}
   AND p.py BETWEEN (CASE WHEN r.y1 < r.y2 THEN r.y1 ELSE r.y2 END) - {r}
               AND (CASE WHEN r.y1 > r.y2 THEN r.y1 ELSE r.y2 END) + {r}
),
orph_cand AS ({dist2_select_sql('orph_cand0')}),
orph_hit AS (SELECT DISTINCT point_id FROM orph_cand WHERE dist2 <= {r * r})
SELECT p.objectid AS point_id, p.px, p.py
FROM addrpnts p LEFT JOIN orph_hit h ON h.point_id = p.objectid
WHERE h.point_id IS NULL"""
