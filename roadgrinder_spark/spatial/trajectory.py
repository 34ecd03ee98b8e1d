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
#: the px/py derivation expressions, shared verbatim by the DuckDB CTE
#: below and the Spark selectExpr in derive_pings — single source of
#: truth, and derive_pings no longer registers any temp view (ADVICE r5:
#: createOrReplaceTempView('events') on every call clobbered session-
#: global catalog state under a generic name).
_PX_EXPR = (
    "CAST(400000 + ((user_id * 11"
    " + CAST(FLOOR(event_id / 150) AS BIGINT)) % 200) * 250"
    " + (event_id % 5) * 6.25 AS DOUBLE)"
)
_PY_EXPR = (
    "CAST(4500000 + ((user_id * 17"
    " + CAST(FLOOR(event_id / 250) AS BIGINT)) % 200) * 250"
    " + (event_id % 3) * 12.5 AS DOUBLE)"
)

PINGS_CTE = f"""
pings AS (
  SELECT event_id AS ping_id, user_id, ts,
         {_PX_EXPR} AS px,
         {_PY_EXPR} AS py
  FROM events
)
"""


def derive_pings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ping_id, user_id, ts, px, py) — deterministic function of events.

    Pure column expressions over the parquet read: no temp-view
    registration, so callers' catalog state is untouched (ADVICE r5)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.selectExpr(
        "event_id AS ping_id",
        "user_id",
        "ts",
        f"{_PX_EXPR} AS px",
        f"{_PY_EXPR} AS py",
    )


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
    # r7 plan audit (plans/r07/q_route_snap_audit.txt): the payload
    # re-attach was planned SortMergeJoin (no stats on the aggregated
    # snap side); shuffle_hash builds the per-partition hash from the
    # narrow (ping_id, road_id) snap relation instead of sorting both
    # sides — scales with pings/partitions, unlike a broadcast
    snapped = pings.join(snap.hint("shuffle_hash"), "ping_id", "left")
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


# ---------------------------------------------------------------------------
# round-5 wave 3: trajectory analytics over the ping stream — stay-point
# (dwell) detection, origin–destination matrices, and space-time
# co-location pairs. Together with route_snap these cover the standard
# mobile-trace pipeline (RoadGrinder's address/road matching feeds the
# same downstream rollups; the reference has no trajectory surface, so
# these are engine-native extensions over the same spatial index).
# ---------------------------------------------------------------------------

from .cells import point_cell, point_cell_sql


def dwell_detect(
    pings: DataFrame,
    cell_size: float = 250.0,
    min_pings: int = 3,
) -> DataFrame:
    """Stay-point detection: maximal runs of consecutive pings (per user,
    (ts, ping_id) order) inside the SAME grid cell, kept when the run has
    >= min_pings pings. Returns (user_id, dwell_id, cell, enter_ts,
    exit_ts, n_pings); dwell_id numbers ALL runs 1-based per user (kept
    and dropped alike), so ids are stable under threshold changes.

    The route_snap collapse keyed by the tile instead of the road: one
    shuffle by user_id, window + one aggregate, bounded per-user state —
    the sessionize shape, scale-safe at any ping volume."""
    cell = point_cell(F.col("px"), F.col("py"), cell_size).alias("cell")
    df = pings.select("user_id", "ts", "ping_id", cell)
    w = Window.partitionBy("user_id").orderBy("ts", "ping_id")
    prev = F.lag("cell").over(w)
    rn = F.row_number().over(w)
    new_run = (
        F.when(rn == 1, F.lit(1))
        .when(~prev.eqNullSafe(F.col("cell")), F.lit(1))
        .otherwise(F.lit(0))
    )
    runs = df.withColumn(
        "dwell_id",
        F.sum(new_run).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        runs.groupBy("user_id", "dwell_id", "cell")
        .agg(
            F.min("ts").alias("enter_ts"),
            F.max("ts").alias("exit_ts"),
            F.count(F.lit(1)).alias("n_pings"),
        )
        .filter(F.col("n_pings") >= min_pings)
    )


def oracle_dwell_sql(cell_size: float = 250.0, min_pings: int = 3) -> str:
    """DuckDB oracle: same window collapse (window SUM casts to BIGINT to
    match Spark's LONG — the route_snap lesson). Needs the pings CTE."""
    cell = point_cell_sql("px", "py", cell_size)
    return f"""
dw_cells AS (
  SELECT user_id, ts, ping_id, {cell} AS cell FROM pings
),
dw_flag AS (
  SELECT user_id, ts, ping_id, cell,
         CASE WHEN row_number() OVER w = 1 THEN 1
              WHEN lag(cell) OVER w IS DISTINCT FROM cell THEN 1
              ELSE 0 END AS new_run
  FROM dw_cells
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, ping_id)
),
dw_runs AS (
  SELECT user_id, ts, cell,
         CAST(sum(new_run) OVER (PARTITION BY user_id ORDER BY ts, ping_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS dwell_id
  FROM dw_flag
)
SELECT user_id, dwell_id, cell,
       min(ts) AS enter_ts, max(ts) AS exit_ts, count(*) AS n_pings
FROM dw_runs GROUP BY user_id, dwell_id, cell
HAVING count(*) >= {min_pings}"""


def od_matrix(
    pings: DataFrame,
    gap_s: int = 21600,
    cell_size: float = 500.0,
) -> DataFrame:
    """Origin–destination matrix: pings sessionize into trips at time
    gaps > gap_s (per user, (ts, ping_id) order); each trip contributes
    one (origin cell, destination cell) of its first/last ping; trips
    aggregate into (o_cell, d_cell, n_trips) — the OD rollup behind
    travel-demand and flow maps.

    Two window passes over the same user_id partitioning (one shuffle),
    then two hash aggregates whose output is bounded by trips and by
    distinct cell pairs. Gap arithmetic stays in whole epoch seconds
    (Spark's timestamp→long cast == DuckDB's date_diff('second'): both
    are floor-of-second differences for positive epochs)."""
    cell = point_cell(F.col("px"), F.col("py"), cell_size).alias("cell")
    df = pings.select("user_id", "ts", "ping_id", cell)
    w = Window.partitionBy("user_id").orderBy("ts", "ping_id")
    # parquet TIMESTAMP_NTZ → epoch seconds (session TZ pinned UTC; the
    # events.sessionize idiom). floor-of-second differences == DuckDB's
    # date_diff('second') boundary count for ordered timestamps.
    sec = F.col("ts").cast("timestamp").cast("long")
    gap = sec - F.lag(sec).over(w)
    new_trip = F.when(gap.isNull() | (gap > gap_s), F.lit(1)).otherwise(F.lit(0))
    trips = df.withColumn(
        "trip_id",
        F.sum(new_trip).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    wt = Window.partitionBy("user_id", "trip_id")
    ra = F.row_number().over(wt.orderBy("ts", "ping_id"))
    rd = F.row_number().over(wt.orderBy(F.col("ts").desc(), F.col("ping_id").desc()))
    od = (
        trips.withColumn("_ra", ra)
        .withColumn("_rd", rd)
        .groupBy("user_id", "trip_id")
        .agg(
            F.max(F.when(F.col("_ra") == 1, F.col("cell"))).alias("o_cell"),
            F.max(F.when(F.col("_rd") == 1, F.col("cell"))).alias("d_cell"),
        )
    )
    return od.groupBy("o_cell", "d_cell").agg(
        F.count(F.lit(1)).alias("n_trips")
    )


def oracle_od_matrix_sql(gap_s: int = 21600, cell_size: float = 500.0) -> str:
    """DuckDB oracle. date_diff('second', a, b) == floor-second delta,
    matching Spark's long casts. Needs the pings CTE."""
    cell = point_cell_sql("px", "py", cell_size)
    return f"""
od_cells AS (
  SELECT user_id, ts, ping_id, {cell} AS cell FROM pings
),
od_flag AS (
  SELECT user_id, ts, ping_id, cell,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN date_diff('second', lag(ts) OVER w, ts) > {gap_s} THEN 1
              ELSE 0 END AS new_trip
  FROM od_cells
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, ping_id)
),
od_trips AS (
  SELECT user_id, ts, ping_id, cell,
         CAST(sum(new_trip) OVER (PARTITION BY user_id ORDER BY ts, ping_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS trip_id
  FROM od_flag
),
od_rank AS (
  SELECT user_id, trip_id, cell,
         row_number() OVER (PARTITION BY user_id, trip_id
                            ORDER BY ts, ping_id) AS ra,
         row_number() OVER (PARTITION BY user_id, trip_id
                            ORDER BY ts DESC, ping_id DESC) AS rd
  FROM od_trips
),
od_ends AS (
  SELECT user_id, trip_id,
         max(CASE WHEN ra = 1 THEN cell END) AS o_cell,
         max(CASE WHEN rd = 1 THEN cell END) AS d_cell
  FROM od_rank GROUP BY user_id, trip_id
)
SELECT o_cell, d_cell, count(*) AS n_trips
FROM od_ends GROUP BY o_cell, d_cell"""


def colocation_pairs(
    pings: DataFrame,
    cell_size: float = 6250.0,
    bucket: str = "day",
) -> DataFrame:
    """Space-time co-location: pairs of distinct users observed in the
    same zone (cell_size tile) during the same time bucket, with the
    number of co-located (zone, bucket) events — co-travel / contact
    detection. Returns (user_a, user_b, n_events) with user_a < user_b.

    Plan: DISTINCT presence (user, cell, bucket) — one shuffle that also
    dedups multi-ping buckets — then a self equi-join keyed on (cell,
    bucket) + inequality residual, then one pair aggregate. The join key
    is the zone-time composite, so hot zones are the skew axis (same
    shape as knn_join; AQE skew-split applies). The time bucket never
    reaches the output, so engine bucket-type differences can't leak
    into the compare."""
    cell = point_cell(F.col("px"), F.col("py"), cell_size).alias("cell")
    pres = pings.select(
        "user_id", cell, F.date_trunc(bucket, F.col("ts")).alias("bucket")
    ).distinct()
    a = pres.alias("a")
    b = pres.alias("b")
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def oracle_colocation_sql(cell_size: float = 6250.0, bucket: str = "day") -> str:
    """DuckDB oracle (same presence/self-join shape). Needs pings CTE."""
    cell = point_cell_sql("px", "py", cell_size)
    return f"""
cl_pres AS (
  SELECT DISTINCT user_id, {cell} AS cell,
         date_trunc('{bucket}', ts) AS bucket
  FROM pings
)
SELECT a.user_id AS user_a, b.user_id AS user_b, count(*) AS n_events
FROM cl_pres a JOIN cl_pres b
  ON a.cell = b.cell AND a.bucket = b.bucket AND a.user_id < b.user_id
GROUP BY a.user_id, b.user_id"""


# ---------------------------------------------------------------------------
# round 6 (VERDICT r5 #6): HMM map-matching — route_snap's top-1 snap
# breaks at intersections (a noisy ping near a crossing street snaps to
# the wrong road); a Viterbi pass over the per-user candidate sequence
# recovers the coherent route. Scoring is ALL-INTEGER so the DuckDB
# oracle reproduces the argmin exactly:
#   emission(candidate)   = rank - 1   (0 best, 1, 2; rank by (dist2, id))
#   emission(no road)     = 0          (single NULL candidate)
#   transition(r, r)      = 0
#   transition(r, r') adjacent in the snap-tolerance road graph = HMM_TR_ADJ
#   transition(NULL, NULL) = 0; one side NULL = HMM_TR_NULL
#   transition otherwise  = HMM_TR_JUMP
# Sequences are CHUNKED into windows of HMM_CHUNK pings and Viterbi runs
# exactly within each chunk (the documented approximation: boundary
# transitions between chunks are not scored — the price for an oracle
# that can enumerate paths; full-sequence Viterbi is the same kernel
# with chunk >= max sequence length, pytest-covered only). Tie-break:
# lexicographically smallest road sequence among minimum-cost paths,
# NULL ordered last (sentinel 2^62) — both engines implement this order.
#
# Scale design: candidates come from the cell-cover kNN join; the
# consecutive-candidate self-join is INTERSECTED with the road adjacency
# and only the surviving ADJACENCY rows ship to the kernel — same/null/
# jump costs are pure functions of the two candidate ids, derived
# locally. (Shipping every k^2 pair measured 71.5 M Arrow rows at 10 M
# pings and made the cogroup the dominant stage at 55.7 s with a trivial
# kernel; adjacency rows scale with road geometry, not ping volume.)
# The kernel is O(chunk * k^2) per group; one cogroup shuffle by
# user_id — bounded state, no driver collect, no global edge set in
# Python.
# ---------------------------------------------------------------------------

HMM_CHUNK = 5
HMM_TR_ADJ = 1
HMM_TR_NULL = 3
HMM_TR_JUMP = 5
HMM_NULL_SENTINEL = 1 << 62


def route_match_hmm(
    pings: DataFrame,
    roads: DataFrame,
    k: int = 3,
    radius_m: float = DEFAULT_RADIUS_M,
    chunk: int = HMM_CHUNK,
    snap_tol: float | None = None,
) -> DataFrame:
    """(user_id, ping_id, road_id): per-ping road assignment from exact
    within-chunk Viterbi over top-k candidates. road_id is NULL for
    pings with no road within radius_m."""
    import pandas as pd

    from .network import DEFAULT_SNAP_TOL, road_edges

    snap = DEFAULT_SNAP_TOL if snap_tol is None else snap_tol
    w = Window.partitionBy("user_id").orderBy("ts", "ping_id")
    seq = (
        pings.select("user_id", "ts", "ping_id")
        .withColumn("idx", F.row_number().over(w))
        .withColumn(
            "chunk", F.floor((F.col("idx") - 1) / F.lit(chunk)).cast("long")
        )
        .withColumn("cpos", ((F.col("idx") - 1) % chunk + 1).cast("int"))
        .drop("idx", "ts")
    )
    # candidates PACKED one row per ping (rank order = array index =
    # emission cost): the python-crossing frame is the dominant cost of
    # this operator — 3 rows/ping measured 30 M Arrow rows at 10 M
    # pings; packing cuts the cogroup/Arrow row count 3x. knn output
    # never contains NULL road_id, so array elements are non-null and a
    # missing array (left join) means the off-road candidate.
    knn = (
        knn_join(
            pings.select(F.col("ping_id").alias("objectid"), "px", "py"),
            roads,
            k=k,
            radius_m=radius_m,
        )
        .groupBy(F.col("point_id").alias("ping_id"))
        .agg(
            F.expr("transform(array_sort(collect_list(struct(rank, road_id))), x -> x.road_id)").alias(
                "cand_roads"
            )
        )
    )
    cands = seq.join(knn, "ping_id", "left").select(
        "user_id", "chunk", "cpos", "ping_id", "cand_roads"
    )
    # materialize the candidate frame ONCE: it feeds the pair self-join
    # (twice) and the cogroup, and Spark re-executes the whole kNN +
    # window subplan per reference otherwise (measured 4x = 13.9 s at
    # sf0.01; one barrier cuts the op to ~1/3). Parquet round-trip per
    # the repo's localCheckpoint lesson.
    from ..session import tmpdir_removed_at_exit as _tmpdir

    wd = _tmpdir("rg_hmm_")
    cands.write.mode("overwrite").parquet(f"{wd}/cands")
    cands = pings.sparkSession.read.parquet(f"{wd}/cands")
    # disjoint intermediate names per side — cands joined with itself
    # trips Spark's ambiguous-self-join check on shared attribute ids.
    # The pair candidates re-explode JVM-side (cheap, never crosses to
    # Python).
    a = cands.select(
        F.col("user_id").alias("_au"),
        F.col("chunk").alias("_ac"),
        (F.col("cpos") + 1).alias("_ap"),
        F.explode("cand_roads").alias("rp"),
    )
    b = cands.select(
        F.col("user_id").alias("_bu"),
        F.col("chunk").alias("_bc"),
        F.col("cpos").alias("_bp"),
        F.explode("cand_roads").alias("rn"),
    )
    # pairs frame = ADJACENCY HITS ONLY (inner join with the edge set).
    # Same/null/jump transition costs are pure functions of the two
    # candidate ids, so the kernel derives them locally — shipping every
    # k^2 candidate pair to Python measured 71.5 M Arrow rows at 10 M
    # pings and made the cogroup the dominant stage (55.7 s with a
    # TRIVIAL kernel); adjacency rows are the only data-dependent part
    # and are bounded by road geometry, not ping volume.
    # dedup=False: the semi-join below is set-insensitive, so the edge
    # build's DISTINCT (an exchange + aggregate over the full edge set)
    # is pure overhead here (r7)
    adj = road_edges(roads, snap, dedup=False).select(
        F.col("src").alias("rp"), F.col("dst").alias("rn")
    )
    pairs = (
        a.join(
            b,
            (F.col("_au") == F.col("_bu"))
            & (F.col("_ac") == F.col("_bc"))
            & (F.col("_ap") == F.col("_bp")),
        )
        .join(adj, ["rp", "rn"], "left_semi")
        .select(
            F.col("_au").alias("user_id"),
            F.col("_ac").alias("chunk"),
            F.col("_ap").alias("cpos"),
            "rp",
            "rn",
        )
    )

    SENT = HMM_NULL_SENTINEL

    def _tr(p, kp, kn, adjset):
        # default transition costs are id-derived; only true adjacency
        # needs the shipped edge rows
        if kp == kn:
            return 0
        if kp == SENT or kn == SENT:
            return HMM_TR_NULL
        if (p, kp, kn) in adjset:
            return HMM_TR_ADJ
        return HMM_TR_JUMP

    def _viterbi_chunk(by_pos, ping_at, adjset, out_p, out_r):
        poss = sorted(by_pos)
        L = len(poss)
        # backward suffix DP: S[i][r] = min cost of the path r@i .. end
        # (emissions from i on + transitions from i on)
        S: list[dict[int, int]] = [dict() for _ in range(L)]
        for i in range(L - 1, -1, -1):
            p = poss[i]
            for r, e in by_pos[p].items():
                if i == L - 1:
                    S[i][r] = e
                else:
                    pn = poss[i + 1]
                    S[i][r] = e + min(
                        _tr(pn, r, r2, adjset) + S[i + 1][r2] for r2 in S[i + 1]
                    )
        total = min(S[0].values())
        # greedy forward reconstruct: smallest road (sentinel order) whose
        # suffix still realizes the optimum — the lexicographically
        # smallest minimum-cost path, matching the oracle's ORDER BY
        rem = total
        prev: int | None = None
        for i, p in enumerate(poss):
            for r in sorted(S[i]):
                t = 0 if prev is None else _tr(p, prev, r, adjset)
                if t + S[i][r] == rem:
                    out_p.append(ping_at[p])
                    out_r.append(None if r == SENT else r)
                    rem = rem - t - by_pos[p][r]
                    prev = r
                    break

    def _bucket(key, cdf, pdf):
        # r7 (VERDICT r6 #7): MANY users per Arrow group. The r6 per-user
        # cogroup paid the fixed per-group Arrow overhead (~5.5 ms/group
        # measured with a trivial kernel) once per user — 1,500 groups at
        # sf0.1, ~35 s of the 74.7 s ×100 run was cogroup machinery.
        # Grouping by a hash bucket of user_id packs ~(users / n_groups)
        # users per group, amortizing the flush while keeping the kernel
        # and its output rows byte-identical (the bucket loop below is
        # the old per-user body keyed (user, chunk)).
        if cdf.empty:
            return pd.DataFrame(
                {"user_id": [], "ping_id": [], "road_id": []}
            ).astype({"user_id": "int64", "ping_id": "int64", "road_id": "float64"})
        by_key: dict[tuple[int, int], tuple[dict, dict]] = {}
        for uid, ck, cpos, pid, lst in zip(
            cdf["user_id"], cdf["chunk"], cdf["cpos"], cdf["ping_id"],
            cdf["cand_roads"],
        ):
            bp, pa = by_key.setdefault((int(uid), int(ck)), ({}, {}))
            if lst is None or len(lst) == 0:
                bp[int(cpos)] = {SENT: 0}
            else:
                # rank order == array index == emission cost
                bp[int(cpos)] = {int(r): e for e, r in enumerate(lst)}
            pa[int(cpos)] = int(pid)
        adjs: dict[tuple[int, int], set] = {}
        for uid, ck, cpos, rp, rn in zip(
            pdf["user_id"], pdf["chunk"], pdf["cpos"], pdf["rp"], pdf["rn"]
        ):
            adjs.setdefault((int(uid), int(ck)), set()).add(
                (int(cpos), int(rp), int(rn))
            )
        out_u: list[int] = []
        out_p: list[int] = []
        out_r: list[int | None] = []
        for uk in sorted(by_key):
            bp, pa = by_key[uk]
            n0 = len(out_p)
            _viterbi_chunk(bp, pa, adjs.get(uk, set()), out_p, out_r)
            out_u.extend([uk[0]] * (len(out_p) - n0))
        return pd.DataFrame(
            {
                "user_id": out_u,
                "ping_id": out_p,
                "road_id": pd.array(out_r, dtype="Int64"),
            }
        )

    # explicit width: AQE's coalescer folds the tiny shuffle into ONE
    # partition, serializing the python stage. n_groups scales with the
    # session's parallelism (NOT a local[32] constant): enough buckets
    # for even load, few enough that each amortizes the per-group Arrow
    # flush over many users.
    n_part = max(pings.sparkSession.sparkContext.defaultParallelism, 8)
    n_groups = n_part * 8
    gkey = F.pmod(F.xxhash64(F.col("user_id")), F.lit(n_groups))
    cands_p = cands.withColumn("_g", gkey).repartition(n_part, "_g")
    pairs_p = pairs.withColumn("_g", gkey).repartition(n_part, "_g")
    return (
        cands_p.groupBy("_g")
        .cogroup(pairs_p.groupBy("_g"))
        .applyInPandas(_bucket, "user_id bigint, ping_id bigint, road_id bigint")
    )


def oracle_route_match_hmm_sql(
    k: int = 3,
    radius_m: float = DEFAULT_RADIUS_M,
    chunk: int = HMM_CHUNK,
    snap_tol: float = 150.0,
) -> str:
    """DuckDB oracle: within-chunk Viterbi as EXPLICIT path enumeration —
    one block per chunk length L in 1..chunk (an L-way self-join over the
    candidate CTE, <= k^L paths per chunk), summed integer cost, pick
    row 1 per chunk ordered by (cost, sentinel-coalesced road sequence),
    then unpivot the winning path back to per-ping rows. Exponential in
    `chunk` — chunk is a small fixed parameter, the oracle is a spec.
    Needs roads + pings CTEs in scope."""
    r = float(radius_m)
    t = float(snap_tol)
    sent = HMM_NULL_SENTINEL

    def tr_case(i: int, j: int) -> str:
        return (
            f"CASE WHEN c{i}.road_id IS NULL AND c{j}.road_id IS NULL THEN 0 "
            f"WHEN c{i}.road_id IS NULL OR c{j}.road_id IS NULL THEN {HMM_TR_NULL} "
            f"WHEN c{i}.road_id = c{j}.road_id THEN 0 "
            f"WHEN e{i}{j}.src IS NOT NULL THEN {HMM_TR_ADJ} "
            f"ELSE {HMM_TR_JUMP} END"
        )

    blocks = []
    unions = []
    for L in range(1, chunk + 1):
        sel_cols = ", ".join(
            f"c{i}.ping_id AS g{i}, c{i}.road_id AS r{i}" for i in range(1, L + 1)
        )
        cost = " + ".join(f"c{i}.e" for i in range(1, L + 1))
        if L > 1:
            cost += " + " + " + ".join(
                tr_case(i, i + 1) for i in range(1, L)
            )
        joins = "".join(
            f"\n  JOIN hm_cand c{i} ON c{i}.user_id = c1.user_id"
            f" AND c{i}.chunk = c1.chunk AND c{i}.cpos = {i}"
            for i in range(2, L + 1)
        ) + "".join(
            f"\n  LEFT JOIN hm_edges e{i}{i + 1} ON e{i}{i + 1}.src = c{i}.road_id"
            f" AND e{i}{i + 1}.dst = c{i + 1}.road_id"
            for i in range(1, L)
        )
        order = ", ".join(f"coalesce(r{i}, {sent})" for i in range(1, L + 1))
        blocks.append(
            f"""hm_b{L} AS (
  SELECT c1.user_id, c1.chunk, {sel_cols}, ({cost}) AS cost
  FROM hm_cand c1{joins}
  JOIN hm_len l ON l.user_id = c1.user_id AND l.chunk = c1.chunk AND l.len = {L}
  WHERE c1.cpos = 1
),
hm_w{L} AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, chunk
                                 ORDER BY cost, {order}) AS rk
    FROM hm_b{L}
  ) WHERE rk = 1
)"""
        )
        unions.extend(
            f"SELECT user_id, g{i} AS ping_id, r{i} AS road_id FROM hm_w{L}"
            for i in range(1, L + 1)
        )
    return f"""
hm_seq AS (
  SELECT user_id, ping_id,
         CAST(FLOOR((idx - 1) / {chunk}) AS BIGINT) AS chunk,
         CAST((idx - 1) % {chunk} + 1 AS INT) AS cpos
  FROM (
    SELECT user_id, ping_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, ping_id) AS idx
    FROM pings
  )
),
hm_kc0 AS (
  SELECT p.ping_id, r.objectid AS road_id, p.px, p.py,
         r.x1, r.y1, r.x2, r.y2
  FROM pings p JOIN roads r
    ON p.px BETWEEN (CASE WHEN r.x1 < r.x2 THEN r.x1 ELSE r.x2 END) - {r}
               AND (CASE WHEN r.x1 > r.x2 THEN r.x1 ELSE r.x2 END) + {r}
   AND p.py BETWEEN (CASE WHEN r.y1 < r.y2 THEN r.y1 ELSE r.y2 END) - {r}
               AND (CASE WHEN r.y1 > r.y2 THEN r.y1 ELSE r.y2 END) + {r}
),
hm_kc AS ({dist2_select_sql('hm_kc0')}),
hm_knn AS (
  SELECT ping_id, road_id, rank - 1 AS e FROM (
    SELECT ping_id, road_id,
           row_number() OVER (PARTITION BY ping_id ORDER BY dist2, road_id) AS rank
    FROM hm_kc WHERE dist2 <= {r * r}
  ) WHERE rank <= {k}
),
hm_cand AS (
  SELECT s.user_id, s.chunk, s.cpos, s.ping_id, n.road_id,
         coalesce(n.e, 0) AS e
  FROM hm_seq s LEFT JOIN hm_knn n ON n.ping_id = s.ping_id
),
hm_len AS (
  SELECT user_id, chunk, max(cpos) AS len FROM hm_cand GROUP BY user_id, chunk
),
hm_nodes AS (
  SELECT objectid AS rid, x1 AS ex, y1 AS ey FROM roads
  UNION ALL SELECT objectid, x2, y2 FROM roads
),
hm_edges AS MATERIALIZED (
  SELECT DISTINCT a.rid AS src, b.rid AS dst
  FROM hm_nodes a JOIN hm_nodes b
    ON b.ex BETWEEN a.ex - {t} AND a.ex + {t}
   AND b.ey BETWEEN a.ey - {t} AND a.ey + {t}
  WHERE a.rid <> b.rid
    AND (b.ex - a.ex) * (b.ex - a.ex)
      + (b.ey - a.ey) * (b.ey - a.ey) <= {t * t}
),
{','.join(blocks)}
{' UNION ALL '.join(unions)}"""
