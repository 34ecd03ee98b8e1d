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


def road_edges(roads: DataFrame, snap_tol: float = DEFAULT_SNAP_TOL) -> DataFrame:
    """Directed adjacency (src, dst): road pairs with any endpoint pair
    within snap_tol. Both directions present; DISTINCT collapses multi-
    endpoint contacts. Shuffle is by endpoint cell id (9N ring rows);
    the unexploded side builds the hash relation (the point_pairs
    build-side lesson)."""
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
    return (
        a.hint("shuffle_hash")
        .join(b, "cell")
        .filter(F.col("src") != F.col("dst"))
        .filter(dx * dx + dy * dy <= F.lit(s * s))
        .select("src", "dst")
        .distinct()
    )


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

    Per round: one equi-join frontier x edges + one anti-join against
    visited, barriered via parquet; early-exits when the frontier
    drains. Edge materialization happens once up front."""
    from ..session import tmpdir_removed_at_exit as _tmpdir

    spark = roads.sparkSession
    wd = work_dir or _tmpdir("rg_bfs_")
    edges = road_edges(roads, snap_tol)
    edges.write.mode("overwrite").parquet(f"{wd}/edges")
    edges = spark.read.parquet(f"{wd}/edges")

    seeds = roads.filter(F.col("objectid") % seed_mod == 0).select(
        F.col("objectid").alias("road_id"), F.lit(0).alias("hops")
    )
    # each level is written ONCE to its own path; `visited` is the
    # multi-path read over all levels so far — total rows written is
    # O(reached), not O(reached * levels) as a rewritten-visited loop
    # would be, and every round still reads only flat parquet lineage
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
        frontier = spark.read.parquet(path)
        if frontier.limit(1).count() == 0:
            break
        levels.append(path)
        visited = spark.read.parquet(*levels)
    return visited


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
