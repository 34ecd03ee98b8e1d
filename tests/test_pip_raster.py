"""Point-in-polygon + raster↔vector operators."""

from __future__ import annotations

import numpy as np
import pytest

from roadgrinder_spark import datagen
from roadgrinder_spark.spatial import pip as sp
from roadgrinder_spark.spatial import raster as sr

from .conftest import SF_DIR, assert_frames_match


def test_pip_matches_rect_oracle(spark, duck):
    pts = datagen.derive_addrpnts(spark, SF_DIR)
    zones = sp.derive_zones(spark, SF_DIR)
    got = sp.pip_join(pts, zones)
    osql = (
        "WITH "
        + datagen.ADDRPNTS_CTE.strip().strip(",")
        + ", "
        + sp.ZONES_CTE.strip().strip(",")
        + sp.oracle_pip_sql()
    )
    assert_frames_match(got, duck.sql(osql).df(), "pip")


def test_ray_cast_nonconvex():
    """The kernel handles genuinely non-rectangular rings: a concave
    arrow polygon — points in the notch are OUTSIDE."""
    #   (0,0) (4,0) (4,4) (2,2) (0,4) closed — concave notch at top
    rx = np.array([0.0, 4.0, 4.0, 2.0, 0.0, 0.0])
    ry = np.array([0.0, 0.0, 4.0, 2.0, 4.0, 0.0])
    px = np.array([2.0, 2.0, 1.0, 3.0, 5.0])
    py = np.array([1.0, 3.0, 1.5, 1.5, 1.0])
    got = sp.ray_cast_numpy(px, py, rx, ry)
    assert got.tolist() == [True, False, True, True, False]


def test_raster_roundtrip_and_regions(spark, duck):
    pts = datagen.derive_addrpnts(spark, SF_DIR)
    ras = sr.rasterize_points(pts)
    osql = "WITH " + datagen.ADDRPNTS_CTE.strip().strip(",") + sr.oracle_rasterize_points_sql()
    assert_frames_match(ras.select("cell", "cx", "cy", "n"), duck.sql(osql).df(), "raster")
    vec = sr.raster_to_vector(ras)
    osql2 = "WITH " + datagen.ADDRPNTS_CTE.strip().strip(",") + sr.oracle_raster_to_vector_sql()
    assert_frames_match(vec, duck.sql(osql2).df(), "raster_to_vector")


def test_threshold_regions_two_blobs(spark):
    """Two disconnected 2x2 blobs → exactly 2 regions, labeled by the min
    cell id of each component."""
    rows = [
        (0, 0), (0, 1), (1, 0), (1, 1),        # blob A
        (10, 10), (10, 11), (11, 10), (11, 11)  # blob B
    ]
    from pyspark.sql import functions as F

    from roadgrinder_spark.spatial.cells import pack_cell

    df = spark.createDataFrame(rows, "cx long, cy long").withColumn(
        "n", F.lit(5)
    ).withColumn("cell", pack_cell(F.col("cx"), F.col("cy")))
    got = sr.threshold_regions(df, min_count=1).toPandas()
    assert got["region"].nunique() == 2
    assert len(got) == 8
    # every blob's label is its min cell id
    blob_a = got[got["cell"] < 10 * 2**26]
    assert (blob_a["region"] == blob_a["cell"].min()).all()


def test_validation_counts_quirk_precedence(spark):
    """P7: a NULL NAME on an excluded-CARTOCODE road is NOT counted (the
    AND binds only the first disjunct), but a NULL POSTTYPE on the same
    road IS counted."""
    from roadgrinder_spark.operators.roadgrinder import validation_counts
    from roadgrinder_spark.schemas import ADDRPNTS_SCHEMA, ROADS_SCHEMA

    base = {f.name: None for f in ROADS_SCHEMA.fields}
    base.update({
        "objectid": 1, "CARTOCODE": "1", "ADDRSYS_L": "A", "ADDRSYS_R": "A",
        "FROMADDR_L": 1.0, "TOADDR_L": 9.0, "FROMADDR_R": 2.0, "TOADDR_R": 8.0,
        "PREDIR": "", "NAME": "X", "POSTTYPE": "ST", "POSTDIR": "",
        "A1_NAME": "", "A1_POSTTYPE": "", "A2_NAME": "", "A2_POSTTYPE": "",
        "AN_NAME": "", "AN_POSTDIR": "", "ZIPCODE_L": "1", "ZIPCODE_R": "1",
        "GlobalID": "{1}", "x1": 0.0, "y1": 0.0, "x2": 1.0, "y2": 0.0,
        "geometry": "LINESTRING (0 0, 1 0)",
    })
    rows = [
        {**base},                                            # clean
        {**base, "objectid": 2, "NAME": None},               # carto '1' -> NOT counted
        {**base, "objectid": 3, "CARTOCODE": "5", "NAME": None},  # counted
        {**base, "objectid": 4, "POSTTYPE": None},           # counted (OR arm)
    ]
    roads = spark.createDataFrame(rows, schema=ROADS_SCHEMA)
    pnt = {f.name: None for f in ADDRPNTS_SCHEMA.fields}
    pnt.update({"objectid": 1, "AddSystem": "A", "AddNum": "1", "AddNumSuffix": "",
                "PrefixDir": "", "StreetName": "X", "StreetType": "", "SuffixDir": "",
                "ZipCode": "1", "UnitType": "", "UnitID": "", "City": "C",
                "CountyID": "1", "px": 0.0, "py": 0.0})
    pnts = spark.createDataFrame([pnt], schema=ADDRPNTS_SCHEMA)
    got = {r["relation"]: r["n_bad"] for r in validation_counts(roads, pnts).collect()}
    assert got == {"roads": 2, "addrpnts": 0}
