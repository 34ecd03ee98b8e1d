"""Round-5 wave-2 additions: BM25 retrieval, spatial anti-join
(orphan points), grid-density clustering, trajectory map-matching."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

from .conftest import SF_DIR, assert_frames_match

R5B_NAMES = ("bm25_topk", "orphan_points", "cluster_points", "route_snap")


@pytest.mark.parametrize("name", R5B_NAMES)
def test_round5b_entry_matches_oracle(name, spark, duck):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    assert_frames_match(fn(spark, SF_DIR), duck.sql(sql).df(), name)


def test_orphan_partitions_points(spark):
    """orphans ∪ matched = all points, disjointly: a point is an orphan
    iff knn_join (same radius) finds nothing for it."""
    from roadgrinder_spark import datagen
    from roadgrinder_spark.spatial import join as sj

    roads = datagen.derive_roads(spark, SF_DIR)
    pnts = datagen.derive_addrpnts(spark, SF_DIR)
    orphans = sj.orphan_points(pnts, roads).select("point_id")
    matched = sj.knn_join(pnts, roads, k=1).select("point_id").distinct()
    n_all = pnts.count()
    n_orph = orphans.count()
    n_match = matched.count()
    assert n_orph + n_match == n_all
    assert orphans.join(matched, "point_id").count() == 0
    assert 0 < n_orph < n_all  # non-vacuous both ways


def test_cluster_points_noise_iff_sparse_cell(spark):
    """A point is noise (NULL region) iff its cell is below the density
    threshold; clustered points inherit their cell's region label."""
    from roadgrinder_spark import datagen
    from roadgrinder_spark.spatial import raster as sr

    pnts = datagen.derive_addrpnts(spark, SF_DIR)
    out = sr.cluster_points(pnts, min_count=3)
    rast = sr.rasterize_points(pnts)
    sparse = rast.filter(F.col("n") < 3).select("cell")
    noise_cells = out.filter(F.col("region").isNull()).select("cell").distinct()
    dense_cells = out.filter(F.col("region").isNotNull()).select("cell").distinct()
    assert noise_cells.exceptAll(sparse).count() == 0
    assert dense_cells.join(sparse, "cell").count() == 0
    n_noise = out.filter(F.col("region").isNull()).count()
    assert 0 < n_noise < out.count()  # non-vacuous split
    # same-cell points always share a region label
    assert (
        out.filter(F.col("region").isNotNull())
        .groupBy("cell")
        .agg(F.countDistinct("region").alias("k"))
        .filter(F.col("k") > 1)
        .count()
        == 0
    )


def test_route_snap_runs_are_maximal(spark):
    """Run invariants: per-user run_ids are 1..max contiguous, n_pings
    sums to the user's ping count, consecutive runs never share a
    road_id (else the collapse wasn't maximal), and intervals nest in
    time order."""
    from roadgrinder_spark import datagen
    from roadgrinder_spark.spatial import trajectory as tj

    pings = tj.derive_pings(spark, SF_DIR)
    roads = datagen.derive_roads(spark, SF_DIR)
    runs = tj.route_snap(pings, roads)
    per_user = runs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.max("run_id").alias("max_run"),
        F.min("run_id").alias("min_run"),
        F.sum("n_pings").alias("n_pings"),
    )
    bad = per_user.filter(
        (F.col("n_runs") != F.col("max_run")) | (F.col("min_run") != 1)
    )
    assert bad.count() == 0
    ping_counts = pings.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    mismatch = per_user.join(ping_counts, "user_id").filter(
        F.col("n_pings") != F.col("n")
    )
    assert mismatch.count() == 0
    # maximality: adjacent runs differ in road (null-safe)
    a = runs.select("user_id", "run_id", F.col("road_id").alias("ra"))
    b = runs.select(
        "user_id", (F.col("run_id") - 1).alias("run_id"),
        F.col("road_id").alias("rb"),
    )
    stuck = a.join(b, ["user_id", "run_id"]).filter(
        F.col("ra").eqNullSafe(F.col("rb"))
    )
    assert stuck.count() == 0
    # time ordering: a run ends before the next begins
    t = runs.select("user_id", "run_id", "enter_ts", "exit_ts")
    nxt = runs.select(
        "user_id", (F.col("run_id") - 1).alias("run_id"),
        F.col("enter_ts").alias("next_enter"),
    )
    overlap = t.join(nxt, ["user_id", "run_id"]).filter(
        F.col("exit_ts") >= F.col("next_enter")
    )
    assert overlap.count() == 0
    assert runs.filter(F.col("road_id").isNotNull()).count() > 0


def test_bm25_prefers_term_dense_docs(spark):
    """Planted corpus: a doc that is ONLY query terms outranks a same-
    length doc with one query-term hit, which outranks a no-hit doc
    (absent entirely); and df weighting makes the rarer term worth more
    than the common one at equal tf/dl."""
    from roadgrinder_spark.functions import text as T

    rows = [
        (1, "spark spark spark spark"),       # dense in a query term
        (2, "alpha beta gamma spark"),        # one hit, same length
        (3, "alpha beta gamma delta"),        # no hits
    ] + [(10 + i, "spark filler%d" % i) for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = T.bm25_topk_docs(docs, ["spark", "rareterm"], k=10).collect()
    ranked = {r["doc_id"]: r["rank"] for r in out}
    assert ranked[1] < ranked[2]
    assert 3 not in ranked
    # rare term beats common term at matched tf/dl: one doc holding the
    # rare term among many "spark" docs scores higher than a spark doc
    docs2 = spark.createDataFrame(
        [(1, "rareterm pad"), (2, "spark pad"), (3, "spark pad2"),
         (4, "spark pad3")],
        "doc_id long, text string",
    )
    out2 = T.bm25_topk_docs(docs2, ["spark", "rareterm"], k=4).collect()
    r2 = {r["doc_id"]: r["score"] for r in out2}
    assert r2[1] > r2[2]


@pytest.mark.parametrize("name", ("rasterize_segments", "polyline_simplify"))
def test_round5b_geometry_matches_oracle(name, spark, duck):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    assert_frames_match(fn(spark, SF_DIR), duck.sql(sql).df(), name)


def test_rasterize_segments_conserves_length(spark):
    """Clipped per-cell lengths sum back to the total network length —
    the partition-of-unity property of the parametric clip."""
    from roadgrinder_spark import datagen
    from roadgrinder_spark.spatial import raster as sr

    roads = datagen.derive_roads(spark, SF_DIR)
    out = sr.rasterize_segments(roads)
    tot = out.agg(F.sum("length_m")).first()[0]
    exp = roads.select(
        F.sqrt(
            (F.col("x2") - F.col("x1")) ** 2 + (F.col("y2") - F.col("y1")) ** 2
        ).alias("l")
    ).agg(F.sum("l")).first()[0]
    assert abs(tot - exp) < 1e-3 * exp


def _reference_dp(pts, tol):
    """Independent recursive Douglas–Peucker (pure Python) — the spec the
    distributed numpy kernel must reproduce, including first-max ties."""
    import math

    def rec(a, b, keep):
        if b - a < 2:
            return
        ax, ay = pts[a][1], pts[a][2]
        bx, by = pts[b][1], pts[b][2]
        dx, dy = bx - ax, by - ay
        seg = math.hypot(dx, dy)
        best, bi = -1.0, -1
        for i in range(a + 1, b):
            x, y = pts[i][1], pts[i][2]
            d = (
                math.hypot(x - ax, y - ay)
                if seg == 0.0
                else abs(dx * (y - ay) - dy * (x - ax)) / seg
            )
            if d > best:
                best, bi = d, i
        if best > tol:
            keep.add(pts[bi][0])
            rec(a, bi, keep)
            rec(bi, b, keep)

    keep = {pts[0][0], pts[-1][0]}
    rec(0, len(pts) - 1, keep)
    return keep


def test_polyline_simplify_matches_reference_on_jittered(spark):
    """Planted perpendicular jitter makes DP genuinely recursive (splits
    happen); the distributed kernel must equal the independent reference
    per line, and the collinear corpus must reduce to endpoints."""
    from roadgrinder_spark import datagen
    from roadgrinder_spark.spatial import cells as sc
    from roadgrinder_spark.spatial import simplify as ssim
    from roadgrinder_spark.session import ship_package

    ship_package(spark)
    roads = datagen.derive_roads(spark, SF_DIR)
    samples = sc.segment_sample(roads, spacing=25.0)
    # deterministic perpendicular-ish jitter: 0 for most vertices, a big
    # offset on some — amplitudes straddle the tolerance
    jit = ((F.col("road_id") * 31 + F.col("seq") * 17) % 7 - 3).cast("double")
    jittered = samples.select(
        "road_id",
        "seq",
        (F.col("sx") + jit * 4.0).alias("sx"),
        (F.col("sy") - jit * 2.5).alias("sy"),
    )
    tol = 5.0
    out = ssim.polyline_simplify(jittered, tolerance=tol)
    got = {}
    for r in out.collect():
        got.setdefault(r["road_id"], set()).add(r["seq"])
    rows = jittered.orderBy("road_id", "seq").collect()
    by_line = {}
    for r in rows:
        by_line.setdefault(r["road_id"], []).append((r["seq"], r["sx"], r["sy"]))
    n_interior = 0
    for rid, pts in by_line.items():
        exp = _reference_dp(pts, tol)
        assert got.get(rid) == exp, f"road {rid}: {got.get(rid)} != {exp}"
        n_interior += len(exp) - 2
    assert n_interior > 0  # the jitter really forced recursive splits
    # collinear corpus → exactly the chord endpoints
    flat = ssim.polyline_simplify(samples, tolerance=1.0)
    per = flat.groupBy("road_id").agg(F.count(F.lit(1)).alias("n"))
    assert per.filter(F.col("n") != 2).count() == 0
