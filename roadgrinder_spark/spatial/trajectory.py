"""Trajectory map-matching (round 5): GPS ping streams snapped to the
road network and collapsed into per-user route segments.

The classic mobile-data pipeline shape (map-matching lite): each ping is
assigned its nearest road segment (the kNN machinery from spatial/join),
then consecutive same-road pings collapse into one traversal run with
enter/exit timestamps — the input to travel-time and road-usage rollups.

Pings are derived deterministically from the driver's `events` table with
a dual-dialect CTE (datagen.py discipline): a per-user base block on the
road lattice plus a slow walk + jitter, all exact binary fractions
(multiples of 6.25 m) so Spark and DuckDB produce bit-identical doubles.
Users wander within a block, so nearest-road runs genuinely alternate —
the collapse is non-vacuous — and pings in empty blocks (no road within
radius) become off-road runs (NULL road_id), exercising the null path.

Scale design: the snap is the cell-cover kNN join (shuffle by cell id,
skew-salting composes); the run collapse shuffles once by user_id and is
a window + one aggregate — the sessionize shape, bounded per-user state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .join import DEFAULT_RADIUS_M, dist2_select_sql, knn_join

#: dual-dialect ping derivation (valid verbatim in Spark SQL and DuckDB).
#: Base block from user_id, drifting one 250 m lattice block every
#: 150/250 event ids (so every user crosses several road blocks over the
#: stream and nearest-road runs genuinely alternate — the first cut kept
#: users inside one block and collapsed to ~1 run per user, vacuous),
#: plus sub-block jitter. All terms are multiples of 6.25 m.
PINGS_CTE = """
pings AS (
  SELECT event_id AS ping_id, user_id, ts,
         CAST(400000 + ((user_id * 11
              + CAST(FLOOR(event_id / 150) AS BIGINT)) % 200) * 250
              + (event_id % 5) * 6.25 AS DOUBLE) AS px,
         CAST(4500000 + ((user_id * 17
              + CAST(FLOOR(event_id / 250) AS BIGINT)) % 200) * 250
              + (event_id % 3) * 12.5 AS DOUBLE) AS py
  FROM events
)
"""


def derive_pings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ping_id, user_id, ts, px, py) — deterministic function of events."""
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(f"WITH {PINGS_CTE} SELECT * FROM pings")


def route_snap(
    pings: DataFrame, roads: DataFrame, radius_m: float = DEFAULT_RADIUS_M
) -> DataFrame:
    """Snap pings to nearest road, collapse consecutive same-road pings
    per user into traversal runs.

    Returns (user_id, run_id, road_id, enter_ts, exit_ts, n_pings);
    road_id is NULL for off-road runs (no segment within radius_m).
    run_id is 1-based per user in (ts, ping_id) order.

    Plan: kNN top-1 snap (cell-cover equi-join + min_by aggregate) →
    left join back onto the ping payload by ping id → per-user window
    (lag for run boundaries, running sum for run ids) → one aggregate.
    """
    snap = knn_join(
        pings.select(F.col("ping_id").alias("objectid"), "px", "py"),
        roads,
        k=1,
        radius_m=radius_m,
    ).select(F.col("point_id").alias("ping_id"), "road_id")
    snapped = pings.join(snap, "ping_id", "left")
    w = Window.partitionBy("user_id").orderBy("ts", "ping_id")
    prev = F.lag("road_id").over(w)
    rn = F.row_number().over(w)
    new_run = (
        F.when(rn == 1, F.lit(1))
        .when(~prev.eqNullSafe(F.col("road_id")), F.lit(1))
        .otherwise(F.lit(0))
    )
    runs = snapped.withColumn(
        "run_id",
        F.sum(new_run).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return runs.groupBy("user_id", "run_id", "road_id").agg(
        F.min("ts").alias("enter_ts"),
        F.max("ts").alias("exit_ts"),
        F.count(F.lit(1)).alias("n_pings"),
    )


def oracle_route_snap_sql(radius_m: float = DEFAULT_RADIUS_M) -> str:
    """DuckDB oracle: bbox-range snap (different pruning than the cell
    cover) + identical dist²/tiebreak, then the same window collapse.
    Needs the pings CTE (and roads) in scope. DuckDB's window SUM over
    INTEGER yields HUGEINT — cast to BIGINT to match Spark's LONG."""
    r = float(radius_m)
    return f"""
rs_cand0 AS (
  SELECT p.ping_id, r.objectid AS road_id, p.px, p.py,
         r.x1, r.y1, r.x2, r.y2
  FROM pings p JOIN roads r
    ON p.px BETWEEN (CASE WHEN r.x1 < r.x2 THEN r.x1 ELSE r.x2 END) - {r}
               AND (CASE WHEN r.x1 > r.x2 THEN r.x1 ELSE r.x2 END) + {r}
   AND p.py BETWEEN (CASE WHEN r.y1 < r.y2 THEN r.y1 ELSE r.y2 END) - {r}
               AND (CASE WHEN r.y1 > r.y2 THEN r.y1 ELSE r.y2 END) + {r}
),
rs_cand AS ({dist2_select_sql('rs_cand0')}),
rs_snap AS (
  SELECT ping_id, road_id FROM (
    SELECT ping_id, road_id,
           row_number() OVER (PARTITION BY ping_id
                              ORDER BY dist2, road_id) AS rnk
    FROM rs_cand WHERE dist2 <= {r * r}
  ) WHERE rnk = 1
),
rs_joined AS (
  SELECT p.user_id, p.ts, p.ping_id, s.road_id
  FROM pings p LEFT JOIN rs_snap s ON s.ping_id = p.ping_id
),
rs_flag AS (
  SELECT user_id, ts, ping_id, road_id,
         CASE WHEN row_number() OVER w = 1 THEN 1
              WHEN lag(road_id) OVER w IS DISTINCT FROM road_id THEN 1
              ELSE 0 END AS new_run
  FROM rs_joined
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, ping_id)
),
rs_runs AS (
  SELECT user_id, ts, road_id,
         CAST(sum(new_run) OVER (PARTITION BY user_id ORDER BY ts, ping_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
  FROM rs_flag
)
SELECT user_id, run_id, road_id,
       min(ts) AS enter_ts, max(ts) AS exit_ts,
       count(*) AS n_pings
FROM rs_runs GROUP BY user_id, run_id, road_id"""
