"""Spatial layer: kNN correctness vs a brute-force numpy oracle, salting
equivalence, cover losslessness, tile parity across parallelism."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from roadgrinder_spark import datagen
from roadgrinder_spark.spatial import cells as sc
from roadgrinder_spark.spatial import join as sj

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def roads_pd(spark):
    return (
        datagen.derive_roads(spark, SF_DIR)
        .select("objectid", "x1", "y1", "x2", "y2")
        .toPandas()
    )


@pytest.fixture(scope="module")
def pnts_pd(spark):
    return (
        datagen.derive_addrpnts(spark, SF_DIR)
        .select("objectid", "px", "py")
        .toPandas()
    )


def brute_force_knn(pnts: pd.DataFrame, roads: pd.DataFrame, k: int, radius: float):
    """Independent numpy oracle: full O(P*R) distance matrix."""
    px = pnts["px"].to_numpy()[:, None]
    py = pnts["py"].to_numpy()[:, None]
    x1 = roads["x1"].to_numpy()[None, :]
    y1 = roads["y1"].to_numpy()[None, :]
    x2 = roads["x2"].to_numpy()[None, :]
    y2 = roads["y2"].to_numpy()[None, :]
    abx, aby = x2 - x1, y2 - y1
    len2 = abx * abx + aby * aby
    dot = (px - x1) * abx + (py - y1) * aby
    t = np.clip(np.where(len2 > 0, dot / np.where(len2 == 0, 1, len2), 0.0), 0.0, 1.0)
    ddx = px - (x1 + t * abx)
    ddy = py - (y1 + t * aby)
    d2 = ddx * ddx + ddy * ddy
    rid = roads["objectid"].to_numpy()
    out = set()
    for i, pid in enumerate(pnts["objectid"].to_numpy()):
        order = np.lexsort((rid, d2[i]))
        cnt = 0
        for j in order:
            if d2[i, j] > radius * radius:
                break
            cnt += 1
            out.add((int(pid), int(rid[j]), cnt))
            if cnt == k:
                break
    return out


def test_knn_matches_numpy_brute_force(spark, roads_pd, pnts_pd):
    roads = datagen.derive_roads(spark, SF_DIR)
    pnts = datagen.derive_addrpnts(spark, SF_DIR)
    got = {
        (r["point_id"], r["road_id"], r["rank"])
        for r in sj.knn_join(pnts, roads, k=3).collect()
    }
    want = brute_force_knn(pnts_pd, roads_pd, k=3, radius=100.0)
    assert got == want


def test_salted_equals_unsalted(spark):
    roads = datagen.derive_roads(spark, SF_DIR)
    pnts = datagen.derive_addrpnts(spark, SF_DIR)
    plain = sj.knn_join(pnts, roads, k=2).toPandas()
    salted = sj.knn_join(pnts, roads, k=2, salt_threshold=3, n_salt=4).toPandas()
    cols = sorted(plain.columns)
    pd.testing.assert_frame_equal(
        plain[cols].sort_values(cols).reset_index(drop=True),
        salted[cols].sort_values(cols).reset_index(drop=True),
    )


def test_tile_parity_across_parallelism(spark):
    """Deterministic tile/kNN outputs regardless of partitioning — the
    sandbox stand-in for N vs 4N executor parity."""
    roads = datagen.derive_roads(spark, SF_DIR)
    pnts = datagen.derive_addrpnts(spark, SF_DIR)
    a = sj.knn_join(pnts.repartition(3), roads.repartition(11), k=1).toPandas()
    b = sj.knn_join(pnts.repartition(17), roads.coalesce(1), k=1).toPandas()
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
    )


def test_supercover_subset_of_bbox_and_contains_segment_cells(spark):
    """supercover ⊆ bbox cover; both contain the cells of sampled points
    on the segment (losslessness of the candidate generator)."""
    rng = np.random.default_rng(42)
    n = 200
    x1 = rng.uniform(400000, 450000, n)
    y1 = rng.uniform(4500000, 4550000, n)
    ang = rng.uniform(0, 2 * np.pi, n)
    ln = rng.uniform(10, 300, n)
    x2, y2 = x1 + ln * np.cos(ang), y1 + ln * np.sin(ang)
    size = 125.0
    covers = sc.supercover_numpy(x1, y1, x2, y2, size)
    for i in range(n):
        cx_lo = int(np.floor(min(x1[i], x2[i]) / size))
        cx_hi = int(np.floor(max(x1[i], x2[i]) / size))
        cy_lo = int(np.floor(min(y1[i], y2[i]) / size))
        cy_hi = int(np.floor(max(y1[i], y2[i]) / size))
        bbox = {
            cx * sc.PACK + cy + sc.CY_BIAS
            for cx in range(cx_lo, cx_hi + 1)
            for cy in range(cy_lo, cy_hi + 1)
        }
        assert set(covers[i]) <= bbox
        # every 1m-sampled point on the segment lands in a covered cell
        ts = np.linspace(0, 1, max(2, int(ln[i])))
        scx = np.floor((x1[i] + ts * (x2[i] - x1[i])) / size).astype(np.int64)
        scy = np.floor((y1[i] + ts * (y2[i] - y1[i])) / size).astype(np.int64)
        assert set(scx * sc.PACK + scy + sc.CY_BIAS) <= set(covers[i])


def test_morton_deterministic_and_local(spark):
    df = spark.range(0, 100).select(
        (F.col("id") % 10).alias("cx"), (F.col("id") / 10).cast("long").alias("cy")
    )
    a = df.select(sc.morton_cell_udf(F.col("cx"), F.col("cy")).alias("m")).toPandas()
    b = df.select(sc.morton_cell_udf(F.col("cx"), F.col("cy")).alias("m")).toPandas()
    pd.testing.assert_frame_equal(a, b)
    # interleave of (1,0) is 1; of (0,1) is 2; of (1,1) is 3
    got = dict(
        zip(
            [(1, 0), (0, 1), (1, 1)],
            [r["m"] for r in spark.createDataFrame(
                [(1, 0), (0, 1), (1, 1)], "cx long, cy long"
            ).select(sc.morton_cell_udf(F.col("cx"), F.col("cy")).alias("m")).collect()],
        )
    )
    assert got == {(1, 0): 1, (0, 1): 2, (1, 1): 3}


def test_geocode_match_interpolation_detail(spark):
    """t_addr lies in [0,1] and matched coords lie on the segment."""
    from roadgrinder_spark.operators import roadgrinder as rg

    roads = datagen.derive_roads(spark, SF_DIR)
    pnts = datagen.derive_addrpnts(spark, SF_DIR)
    out = rg.explode_aliases(roads)
    det = sj.geocode_match(pnts, out.geocode_roads, with_detail=True).toPandas()
    assert len(det) > 0
    assert ((det["t_addr"] >= 0) & (det["t_addr"] <= 1)).all()
    assert (det["dist2"] <= 200.0**2).all()


def test_grouped_knn_equals_column_knn(spark):
    """applyInPandas refinement path must agree with the codegen path."""
    from roadgrinder_spark.spatial import grouped as sg

    roads = datagen.derive_roads(spark, SF_DIR)
    pnts = datagen.derive_addrpnts(spark, SF_DIR)
    a = sj.knn_join(pnts, roads, k=2).toPandas()
    b = sg.knn_join_grouped(pnts, roads, k=2).toPandas()
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
        check_exact=True,
    )


def test_hex_knn_equals_square_grid(spark):
    """Hex-index kNN (VERDICT r4 #7) must produce the identical
    (point_id, road_id, rank, dist2) set as the square-grid join at
    matched resolution — the hex cover + residual is lossless, so cell
    geometry must not leak into the answer. Checked at k=3 and at the
    k=1 aggregate path."""
    roads = datagen.derive_roads(spark, SF_DIR)
    pnts = datagen.derive_addrpnts(spark, SF_DIR)
    cols = ["point_id", "road_id", "rank", "dist2"]
    for k in (1, 3):
        a = sj.knn_join(pnts, roads, k=k).select(*cols).toPandas()
        b = sj.hex_knn(pnts, roads, k=k).select(*cols).toPandas()
        pd.testing.assert_frame_equal(
            a.sort_values(cols).reset_index(drop=True),
            b.sort_values(cols).reset_index(drop=True),
            check_exact=True,
        )


def test_choose_cell_size(spark):
    """Picks the finest lossless size under the occupancy target; a tiny
    target forces the coarsest size."""
    pnts = datagen.derive_addrpnts(spark, SF_DIR)
    size, stats = sc.choose_cell_size(
        pnts, target_p99_per_cell=10**9, sample_fraction=0.5
    )
    assert size == 125.0 and 125.0 in stats  # finest size >= min_radius
    size2, stats2 = sc.choose_cell_size(
        pnts, target_p99_per_cell=1, sample_fraction=0.5
    )
    assert size2 == max(stats2)  # nothing fits -> coarsest measured


def test_geocode_hash_keys_equivalent(spark):
    from roadgrinder_spark.operators import roadgrinder as rg

    roads = datagen.derive_roads(spark, SF_DIR)
    pnts = datagen.derive_addrpnts(spark, SF_DIR)
    gcr = rg.explode_aliases(roads).geocode_roads
    a = sj.geocode_match(pnts, gcr).toPandas()
    b = sj.geocode_match(pnts, gcr, hash_keys=True).toPandas()
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
    )


def test_geocode_match_salted_equals_plain(spark):
    """Attribute-skew salting of the street-signature join is result-
    identical to the plain equi-join (skew.salted_equi_join contract)."""
    from roadgrinder_spark import datagen
    from roadgrinder_spark.operators import roadgrinder as rg
    from roadgrinder_spark.spatial import join as sj

    pnts = datagen.derive_addrpnts(spark, SF_DIR)
    gcr = rg.explode_aliases(datagen.derive_roads(spark, SF_DIR)).geocode_roads
    plain = sj.geocode_match(pnts, gcr)
    salted = sj.geocode_match(pnts, gcr, salt_threshold=5, n_salt=4)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
