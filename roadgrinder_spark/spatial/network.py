"""Road-network topology + breadth-first network distance (round 5).

The GIS network-analysis pair the reference's road pipeline feeds but
never implements itself (RoadGrinder emits geocodable segments; routing
runs downstream): build the segment adjacency graph by snap-tolerance
endpoint matching (the standard topology-build step — endpoints within
`snap_tol` connect their segments), then label every segment with its
minimum hop count from a seed set — service-area / reachability
analysis.

Scale design: the edge build is the cell-cover self-join from
point_pairs_within (left side keeps its own cell, right side explodes
the 3x3 ring, one equi-join on cell id — each ordered endpoint pair
joins exactly once); BFS is a bounded frontier loop — `max_hops`
rounds of (frontier JOIN edges) ANTI (visited), each barriered through
a parquet round-trip (the threshold_regions lesson: localCheckpoint
loops blow up ~5x/round after ~20 iterations on this Spark version;
storage round-trips stay flat and match the checkpoint-resumable
pipeline design). Edges are materialized ONCE before the loop, so the
spatial join never re-runs; per-round shuffle is by road id, bounded by
the frontier size. This is exact min-hop BFS: the anti-join guarantees
a road enters `visited` at its first (minimum) hop only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .cells import pack_cell, point_cell

#: endpoint snap tolerance (m) — also the cover cell size, so the ring-1
#: cover is lossless (the point_pairs_within guarantee: distance <= cell).
DEFAULT_SNAP_TOL = 150.0


def _endpoints(roads: DataFrame) -> DataFrame:
    a = roads.select(
        F.col("objectid").alias("rid"),
        F.col("x1").alias("ex"),
        F.col("y1").alias("ey"),
    )
    b = roads.select(
        F.col("objectid").alias("rid"),
        F.col("x2").alias("ex"),
        F.col("y2").alias("ey"),
    )
    return a.unionByName(b)


def road_edges(
    roads: DataFrame, snap_tol: float = DEFAULT_SNAP_TOL, dedup: bool = True
) -> DataFrame:
    """Directed adjacency (src, dst): road pairs with any endpoint pair
    within snap_tol. Both directions present; DISTINCT collapses multi-
    endpoint contacts. Shuffle is by endpoint cell id (9N ring rows);
    the unexploded side builds the hash relation (the point_pairs
    build-side lesson).

    dedup=False skips the DISTINCT (one exchange + aggregate over the
    full edge set) for consumers whose semantics are set-insensitive —
    route_match_hmm uses the edges only as a left-semi right side, where
    duplicate rows cannot change the result (r7, guide §2.4)."""
    s = float(snap_tol)
    nodes = _endpoints(roads)
    a = nodes.select(
        F.col("rid").alias("src"),
        F.col("ex").alias("ax"),
        F.col("ey").alias("ay"),
        point_cell(F.col("ex"), F.col("ey"), s).alias("cell"),
    )
    ring = F.sequence(F.lit(-1), F.lit(1))
    b = (
        nodes.select(
            F.col("rid").alias("dst"),
            F.col("ex").alias("bx"),
            F.col("ey").alias("by"),
        )
        .withColumn("_dx", F.explode(ring))
        .withColumn("_dy", F.explode(ring))
        .withColumn(
            "cell",
            pack_cell(
                F.floor(F.col("bx") / s).cast("long") + F.col("_dx"),
                F.floor(F.col("by") / s).cast("long") + F.col("_dy"),
            ),
        )
        .drop("_dx", "_dy")
    )
    dx = F.col("bx") - F.col("ax")
    dy = F.col("by") - F.col("ay")
    out = (
        a.hint("shuffle_hash")
        .join(b, "cell")
        .filter(F.col("src") != F.col("dst"))
        .filter(dx * dx + dy * dy <= F.lit(s * s))
        .select("src", "dst")
    )
    return out.distinct() if dedup else out


def bfs_hops(
    roads: DataFrame,
    seed_mod: int = 97,
    max_hops: int = 6,
    snap_tol: float = DEFAULT_SNAP_TOL,
    work_dir: str | None = None,
) -> DataFrame:
    """Minimum hop count from the seed set (objectid % seed_mod == 0)
    over the snap-tolerance adjacency, capped at max_hops. Returns
    (road_id, hops) for every reached road — exact BFS levels.

    r7 (guide §1/§2 — the per-round FIXED costs, not the data, dominated
    this probe at sf scales): edges are persisted (MEMORY_AND_DISK —
    spills gracefully) instead of a parquet round-trip, since every
    round re-reads them and they are dropped at function exit; and the
    per-round empty-frontier probe is a driver-side parquet FOOTER read
    of the level just written (pure metadata, zero Spark jobs) instead
    of a limit(1) count job. A two-levels-per-barrier batch was ALSO
    measured (A/B, warm session): it LOST to the one-level loop (5.7 s
    vs 4.7 s) — the level-h plan re-executing inside the level-h+1
    anti-join costs more than the saved barrier. Results are exact BFS
    levels, unchanged."""
    from pyspark import StorageLevel

    from ..session import parquet_row_count, tmpdir_removed_at_exit as _tmpdir

    spark = roads.sparkSession
    wd = work_dir or _tmpdir("rg_bfs_")
    edges = road_edges(roads, snap_tol).persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    try:
        seeds = roads.filter(F.col("objectid") % seed_mod == 0).select(
            F.col("objectid").alias("road_id"), F.lit(0).alias("hops")
        )
        # each level is written ONCE to its own path; `visited` is the
        # multi-path read over all levels so far — total rows written is
        # O(reached), not O(reached * levels) as a rewritten-visited
        # loop would be
        levels = [f"{wd}/lvl=0"]
        seeds.write.mode("overwrite").parquet(levels[0])
        visited = spark.read.parquet(*levels)
        frontier = visited
        for h in range(1, max_hops + 1):
            nxt = (
                frontier.join(
                    edges, frontier["road_id"] == edges["src"], "inner"
                )
                .select(F.col("dst").alias("road_id"))
                .distinct()
                .join(visited, "road_id", "left_anti")
                .withColumn("hops", F.lit(h))
            )
            path = f"{wd}/lvl={h}"
            nxt.write.mode("overwrite").parquet(path)
            n_rows = parquet_row_count(path)
            if n_rows is None:  # non-local path: Spark probe fallback
                n_rows = spark.read.parquet(path).limit(1).count()
            if n_rows == 0:
                break
            frontier = spark.read.parquet(path)
            levels.append(path)
            visited = spark.read.parquet(*levels)
        return visited
    finally:
        edges.unpersist()


def segment_weights(roads: DataFrame) -> DataFrame:
    """(rid, w): segment length in integer decimetres — the edge-relax
    weight. Integer weights make every path cost a bigint sum, so the
    Spark rounds and the DuckDB unrolled levels agree bit-for-bit (no
    float-accumulation-order risk). floor(sqrt(.)*10) is deterministic:
    sqrt is correctly rounded IEEE in both engines."""
    dx = F.col("x2") - F.col("x1")
    dy = F.col("y2") - F.col("y1")
    return roads.select(
        F.col("objectid").alias("rid"),
        F.floor(F.sqrt(dx * dx + dy * dy) * F.lit(10.0)).cast("long").alias("w"),
    )


_W_SQL = (
    "CAST(FLOOR(sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) * 10.0)"
    " AS BIGINT)"
)


def network_distance(
    roads: DataFrame,
    seed_mod: int = 97,
    max_hops: int = 4,
    snap_tol: float = DEFAULT_SNAP_TOL,
    work_dir: str | None = None,
) -> DataFrame:
    """Edge-weighted network distance (VERDICT r5 #3): minimum-cost label
    per road over paths of at most `max_hops` edges from the seed set,
    where traversing the edge (u, v) costs w(v) = v's segment length in
    decimetres. Returns (road_id, dist_dm) — the service-area metric the
    locator context implies (bfs_hops upgraded from hop counts to
    metres).

    Exactness: this is bounded Bellman–Ford with the frontier
    optimization — round h relaxes only roads improved in round h-1.
    After K rounds the label equals min cost over <= K-edge paths: every
    value present after h rounds is realized by some <= h-edge path
    (each round appends one edge), and every <= h-edge path's cost is
    reached because each strict-improvement prefix re-enters the
    frontier the round it improves. The DuckDB oracle computes the same
    function as K unrolled min-aggregate levels, so the semantics is
    pinned engine-independently.

    Scale design: edges (with dst weights joined on) are persisted ONCE
    (MEMORY_AND_DISK, dropped at function exit — cheaper than the r6
    parquet round-trip, spills gracefully); each round is one equi-join
    (frontier x edges, shuffle bounded by frontier size) + one min
    aggregate folded into the label table by a full-outer merge. r7
    barrier layout (guide §1/§2: write/read/probe fixed costs dominated
    at 4 rounds): TWO relax rounds chain lazily per barrier and ONE
    merged (road_id, dist_dm, _imp) table is written per barrier — the
    improved-flag column replaces the separate frontier file, halving
    the O(V) writes and dropping the per-round probe jobs. Labels are
    identical to the per-round loop: each merge keeps min(best, cand)
    and flags strict improvements, so round h's frontier is exactly the
    r6 frontier. A 1000-executor run shards all of it by road_id."""
    from pyspark import StorageLevel

    from ..session import parquet_bool_any, tmpdir_removed_at_exit as _tmpdir

    spark = roads.sparkSession
    wd = work_dir or _tmpdir("rg_netdist_")
    w = segment_weights(roads)
    edges = (
        road_edges(roads, snap_tol)
        .join(w.withColumnRenamed("rid", "dst"), "dst")
        .select("src", "dst", "w")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.count()
    try:
        seeds = roads.filter(F.col("objectid") % seed_mod == 0).select(
            F.col("objectid").alias("road_id"),
            F.lit(0).cast("long").alias("dist_dm"),
            F.lit(True).alias("_imp"),
        )
        seeds.write.mode("overwrite").parquet(f"{wd}/best0")
        cur = spark.read.parquet(f"{wd}/best0")
        h = 0
        while h < max_hops:
            steps = min(2, max_hops - h)
            b = cur
            for _ in range(steps):
                h += 1
                f = b.filter(F.col("_imp")).select("road_id", "dist_dm")
                cand = (
                    f.join(edges, f["road_id"] == edges["src"])
                    .select(
                        F.col("dst").alias("road_id"),
                        (F.col("dist_dm") + F.col("w")).alias("cand_dm"),
                    )
                    .groupBy("road_id")
                    .agg(F.min("cand_dm").alias("cand_dm"))
                )
                imp = F.col("cand_dm").isNotNull() & (
                    F.col("dist_dm").isNull()
                    | (F.col("cand_dm") < F.col("dist_dm"))
                )
                b = (
                    b.select("road_id", "dist_dm")
                    .join(cand, ["road_id"], "full")
                    .select(
                        "road_id",
                        F.when(imp, F.col("cand_dm"))
                        .otherwise(F.col("dist_dm"))
                        .alias("dist_dm"),
                        imp.alias("_imp"),
                    )
                )
            bpath = f"{wd}/best{h}"
            b.write.mode("overwrite").parquet(bpath)
            cur = spark.read.parquet(bpath)
            # any-improvement probe from the written footers' _imp column
            # statistics — zero Spark jobs; falls back to a limit(1)
            # probe if a writer ever omits boolean min/max stats
            any_imp = parquet_bool_any(bpath, "_imp")
            if any_imp is None:
                any_imp = cur.filter(F.col("_imp")).limit(1).count() > 0
            if not any_imp:
                break
        return cur.select("road_id", "dist_dm")
    finally:
        edges.unpersist()


def oracle_network_distance_sql(
    seed_mod: int = 97,
    max_hops: int = 4,
    snap_tol: float = DEFAULT_SNAP_TOL,
) -> str:
    """DuckDB oracle: the same bounded Bellman–Ford as K UNROLLED
    min-aggregate levels (d_h = min over d_{h-1} and d_{h-1} relaxed by
    one edge) — a recursive CTE cannot aggregate in the recursive part,
    and the un-aggregated walk enumerates paths (exponential in a
    weighted graph because distinct costs defeat UNION dedup). K is a
    fixed parameter, so unrolling is exact, polynomial, and plain SQL.
    Needs the roads CTE in scope."""
    t = float(snap_tol)
    parts = [
        f"""
nd_nodes AS (
  SELECT objectid AS rid, x1 AS ex, y1 AS ey FROM roads
  UNION ALL SELECT objectid, x2, y2 FROM roads
),
nd_w AS (SELECT objectid AS rid, {_W_SQL} AS w FROM roads),
nd_edges AS MATERIALIZED (
  SELECT e.src, e.dst, nw.w
  FROM (
    SELECT DISTINCT a.rid AS src, b.rid AS dst
    FROM nd_nodes a JOIN nd_nodes b
      ON b.ex BETWEEN a.ex - {t} AND a.ex + {t}
     AND b.ey BETWEEN a.ey - {t} AND a.ey + {t}
    WHERE a.rid <> b.rid
      AND (b.ex - a.ex) * (b.ex - a.ex)
        + (b.ey - a.ey) * (b.ey - a.ey) <= {t * t}
  ) e JOIN nd_w nw ON nw.rid = e.dst
),
nd_d0 AS (
  SELECT objectid AS road_id, CAST(0 AS BIGINT) AS dist_dm
  FROM roads WHERE objectid % {seed_mod} = 0
)"""
    ]
    for h in range(1, max_hops + 1):
        parts.append(
            f""",
nd_d{h} AS (
  SELECT road_id, min(dist_dm) AS dist_dm FROM (
    SELECT road_id, dist_dm FROM nd_d{h - 1}
    UNION ALL
    SELECT e.dst, d.dist_dm + e.w
    FROM nd_d{h - 1} d JOIN nd_edges e ON e.src = d.road_id
  ) GROUP BY road_id
)"""
        )
    return (
        "".join(parts)
        + f"\nSELECT road_id, dist_dm FROM nd_d{max_hops}"
    )


def oracle_bfs_sql(
    seed_mod: int = 97,
    max_hops: int = 6,
    snap_tol: float = DEFAULT_SNAP_TOL,
) -> str:
    """DuckDB oracle: bbox-range endpoint self-join (different pruning
    than the cell ring) + recursive walk with per-level dedup (recursive
    UNION keeps (road_id, hops) states unique), then min per road.
    Needs the roads CTE and a WITH RECURSIVE prefix.

    rn_edges MUST be MATERIALIZED: DuckDB inlines plain CTEs into the
    recursive iteration, re-running the IEJoin edge build every level
    (measured 54 s vs 8 s at sf0.01)."""
    t = float(snap_tol)
    return f"""
rn_nodes AS (
  SELECT objectid AS rid, x1 AS ex, y1 AS ey FROM roads
  UNION ALL SELECT objectid, x2, y2 FROM roads
),
rn_edges AS MATERIALIZED (
  SELECT DISTINCT a.rid AS src, b.rid AS dst
  FROM rn_nodes a JOIN rn_nodes b
    ON b.ex BETWEEN a.ex - {t} AND a.ex + {t}
   AND b.ey BETWEEN a.ey - {t} AND a.ey + {t}
  WHERE a.rid <> b.rid
    AND (b.ex - a.ex) * (b.ex - a.ex)
      + (b.ey - a.ey) * (b.ey - a.ey) <= {t * t}
),
rn_walk(road_id, hops) AS (
  SELECT objectid, 0 FROM roads WHERE objectid % {seed_mod} = 0
  UNION
  SELECT e.dst, w.hops + 1
  FROM rn_walk w JOIN rn_edges e ON e.src = w.road_id
  WHERE w.hops < {max_hops}
)
SELECT road_id, min(hops) AS hops FROM rn_walk GROUP BY road_id"""


def isochrone_cells(
    roads: DataFrame,
    band_dm: int = 5000,
    seed_mod: int = 97,
    max_hops: int = 4,
    snap_tol: float = DEFAULT_SNAP_TOL,
    cell_size: float = 250.0,
    work_dir: str | None = None,
) -> DataFrame:
    """Service-area isochrone raster: grid cells reachable from the seed
    set, labeled with the minimum network distance of any road segment
    whose MIDPOINT falls in the cell, bucketed into `band_dm` rings.
    Returns (cell, cx, cy, min_dist_dm, band) — the polygonal service
    area a locator publishes (raster form; raster_to_vector emits WKT).

    Composition: network_distance labels -> join back to segment
    geometry -> midpoint cell -> one min aggregate. All integer after
    the cell arithmetic, so the oracle matches bit-for-bit."""
    labels = network_distance(
        roads, seed_mod=seed_mod, max_hops=max_hops,
        snap_tol=snap_tol, work_dir=work_dir,
    )
    mid = roads.select(
        F.col("objectid").alias("road_id"),
        ((F.col("x1") + F.col("x2")) / 2.0).alias("mx"),
        ((F.col("y1") + F.col("y2")) / 2.0).alias("my"),
    )
    s = float(cell_size)
    j = labels.join(mid, "road_id").select(
        "dist_dm",
        F.floor(F.col("mx") / s).cast("long").alias("cx"),
        F.floor(F.col("my") / s).cast("long").alias("cy"),
    )
    return (
        j.groupBy("cx", "cy")
        .agg(F.min("dist_dm").alias("min_dist_dm"))
        .select(
            pack_cell(F.col("cx"), F.col("cy")).alias("cell"),
            "cx",
            "cy",
            "min_dist_dm",
            F.floor(F.col("min_dist_dm") / F.lit(band_dm)).cast("long").alias("band"),
        )
    )


def oracle_isochrone_sql(
    band_dm: int = 5000,
    seed_mod: int = 97,
    max_hops: int = 4,
    snap_tol: float = DEFAULT_SNAP_TOL,
    cell_size: float = 250.0,
) -> str:
    """DuckDB mirror: the network_distance oracle CTEs + midpoint cell
    min-aggregate. Needs roads in scope."""
    from .cells import CY_BIAS, PACK

    nd = oracle_network_distance_sql(
        seed_mod=seed_mod, max_hops=max_hops, snap_tol=snap_tol
    )
    # embed the unrolled levels as CTEs and aggregate the final level
    idx = nd.rfind("\nSELECT")
    ctes = nd[:idx]
    s = float(cell_size)
    return f"""{ctes},
iso_mid AS (
  SELECT objectid AS road_id, (x1 + x2) / 2.0 AS mx, (y1 + y2) / 2.0 AS my
  FROM roads
),
iso_cells AS (
  SELECT CAST(FLOOR(m.mx / {s}) AS BIGINT) AS cx,
         CAST(FLOOR(m.my / {s}) AS BIGINT) AS cy,
         min(d.dist_dm) AS min_dist_dm
  FROM nd_d{max_hops} d JOIN iso_mid m ON m.road_id = d.road_id
  GROUP BY 1, 2
)
SELECT cx * {PACK} + cy + {CY_BIAS} AS cell, cx, cy, min_dist_dm,
       CAST(FLOOR(min_dist_dm / {band_dm}) AS BIGINT) AS band
FROM iso_cells"""
