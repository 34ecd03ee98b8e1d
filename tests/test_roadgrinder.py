"""X1/X2/X3 parity vs DuckDB oracle + quirk-semantics unit tests.

Quirks under test are documented in SURVEY.md §2 (P6 dead branch, F6
asymmetric zero-guard, F3 trim nesting, F4 double-space collapse, X2
PREDIR-drop)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from roadgrinder_spark import datagen
from roadgrinder_spark.operators import roadgrinder as rg

from .conftest import SF_DIR, assert_frames_match


@pytest.fixture(scope="module")
def roads(spark):
    return datagen.derive_roads(spark, SF_DIR).cache()


@pytest.fixture(scope="module")
def pnts(spark):
    return datagen.derive_addrpnts(spark, SF_DIR).cache()


def _q(duck, body, *ctes):
    sql = "WITH " + ", ".join(c.strip().strip(",") for c in ctes) + " " + body
    return duck.sql(sql).df()


class TestOracleParity:
    def test_geocode_roads(self, spark, duck, roads):
        out = rg.explode_aliases(roads)
        assert_frames_match(
            out.geocode_roads,
            _q(duck, rg.ORACLE_GEOCODE_ROADS, datagen.ROADS_CTE, rg.SCRATCH_CTE),
            "geocode_roads",
        )

    def test_altnames_roads_full(self, spark, duck, roads):
        out = rg.explode_aliases(roads)
        assert_frames_match(
            rg.altnames_roads(out.scratch, out.altnames_stage1),
            _q(duck, rg.ORACLE_ALTNAMES_ROADS, datagen.ROADS_CTE, rg.SCRATCH_CTE),
            "altnames_roads",
        )

    def test_altnames_addrpnts(self, spark, duck, pnts):
        assert_frames_match(
            rg.altnames_addrpnts(pnts),
            _q(duck, rg.ORACLE_ALTNAMES_ADDRPNTS, datagen.ADDRPNTS_CTE,
               rg.ADDRPNT_CAND_CTE),
            "altnames_addrpnts",
        )


def _mk_roads(spark, rows):
    """Synthetic roads rows with every required column defaulted."""
    base = {
        "objectid": 1, "CARTOCODE": "5", "ADDRSYS_L": "Salt Lake City",
        "ADDRSYS_R": "Salt Lake City", "FROMADDR_L": 1.0, "TOADDR_L": 99.0,
        "FROMADDR_R": 2.0, "TOADDR_R": 98.0, "PREDIR": "N", "NAME": "STREET 1",
        "POSTTYPE": "ST", "POSTDIR": "", "A1_NAME": "", "A1_POSTTYPE": "",
        "A2_NAME": "", "A2_POSTTYPE": "", "AN_NAME": "", "AN_POSTDIR": "",
        "ZIPCODE_L": "84001", "ZIPCODE_R": "84002", "GlobalID": "{1}",
        "x1": 0.0, "y1": 0.0, "x2": 100.0, "y2": 0.0,
        "geometry": "LINESTRING (0 0, 100 0)",
    }
    data = [{**base, **r} for r in rows]
    from roadgrinder_spark.schemas import ROADS_SCHEMA

    return spark.createDataFrame(data, schema=ROADS_SCHEMA)


class TestQuirks:
    def test_an_branch_blanks_posttype(self, spark):
        """AN alias rows get POSTTYPE='' (needsStreetType=false,
        EsriHelper.cs:354-357) and POSTDIR:=AN_POSTDIR."""
        df = _mk_roads(spark, [{"AN_NAME": "4500", "AN_POSTDIR": "S", "POSTDIR": "N"}])
        out = rg.explode_aliases(df)
        an = out.scratch.filter("_kind = 'an'").collect()
        assert len(an) == 1
        assert an[0]["POSTTYPE"] == "" and an[0]["POSTDIR"] == "S"
        assert an[0]["NAME"] == "4500"

    def test_faithful_acs_branch_never_fires(self, spark):
        """P6: numeric A1 alias keeps POSTDIR in faithful mode (the
        reference's wrapper-ToString bug), drops it in strict mode."""
        df = _mk_roads(spark, [{"A1_NAME": "700", "A1_POSTTYPE": "ST", "POSTDIR": "N"}])
        faith = rg.explode_aliases(df).scratch.filter("_kind='a1'").collect()[0]
        strict = rg.explode_aliases(df, strict_acs=True).scratch.filter("_kind='a1'").collect()[0]
        assert faith["POSTDIR"] == "N"
        assert strict["POSTDIR"] == ""

    def test_f6_zero_guard_asymmetry(self, spark):
        """lowNum zero-guards, highNum does NOT
        (PopulateAltNamesRoadsTableCommand.cs:88-118): a road with
        TOADDR_R=0 gets high = max(to_l, 0) = to_l, but FROMADDR_R=0 gets
        low = from_l (the other side), not 0."""
        from roadgrinder_spark.functions.normalize import plain_high, zero_aware_low

        df = spark.createDataFrame(
            [(11.0, 99.0, 0.0, 0.0), (0.0, 0.0, 7.0, 55.0), (10.0, 50.0, 4.0, 60.0)],
            "fl double, tl double, fr double, tr double",
        )
        got = df.select(
            zero_aware_low(F.col("fl"), F.col("fr")).alias("lo"),
            plain_high(F.col("tl"), F.col("tr")).alias("hi"),
        ).collect()
        assert [(r["lo"], r["hi"]) for r in got] == [(11, 99), (7, 55), (4, 60)]

    def test_x2_overlap_suppression(self, spark):
        """Same 5-key in two PREDIR quads: overlapping ranges suppress the
        no-predir emit; disjoint ranges emit (both directions checked)."""
        rows = [
            # overlapping pair -> both suppressed
            {"objectid": 1, "PREDIR": "N", "FROMADDR_L": 1.0, "TOADDR_L": 99.0,
             "FROMADDR_R": 2.0, "TOADDR_R": 98.0},
            {"objectid": 2, "PREDIR": "S", "FROMADDR_L": 51.0, "TOADDR_L": 149.0,
             "FROMADDR_R": 52.0, "TOADDR_R": 148.0},
            # disjoint pair (different name) -> both emitted
            {"objectid": 3, "NAME": "STREET 2", "PREDIR": "N", "FROMADDR_L": 1.0,
             "TOADDR_L": 99.0, "FROMADDR_R": 2.0, "TOADDR_R": 98.0},
            {"objectid": 4, "NAME": "STREET 2", "PREDIR": "S", "FROMADDR_L": 201.0,
             "TOADDR_L": 299.0, "FROMADDR_R": 202.0, "TOADDR_R": 298.0},
        ]
        df = _mk_roads(spark, rows)
        out = rg.explode_aliases(df)
        got = rg.altnames_roads_nopredir(out.scratch).select("NAME").collect()
        names = sorted(r["NAME"] for r in got)
        assert names == ["STREET 2", "STREET 2"]
        assert all(r["NAME"] != "STREET 1" for r in got)

    def test_apostrophe_name_safe(self, spark):
        """The reference interpolates values into filter strings
        (PopulateAltNamesRoadsTableCommand.cs:52-57) — a quoted name would
        break it. Our Column-based joins must handle it."""
        df = _mk_roads(spark, [
            {"objectid": 1, "NAME": "O'BRIEN", "PREDIR": "N"},
            {"objectid": 2, "NAME": "O'BRIEN", "PREDIR": "S",
             "FROMADDR_L": 51.0, "TOADDR_L": 149.0},
        ])
        out = rg.explode_aliases(df)
        got = rg.altnames_roads_nopredir(out.scratch).collect()
        assert got == []  # overlapping -> suppressed, and no parse crash

    def test_utaddptid_trim_nesting_and_collapse(self, spark):
        """F3: StreetType+' '+trim(SuffixDir) trimmed as a unit; F4: the
        double space from empty AddNumSuffix collapses
        (PopulateAltNamesAddrPntsTableCommand.cs:28,61-72)."""
        from roadgrinder_spark.schemas import ADDRPNTS_SCHEMA

        row = {
            "objectid": 1, "AddSystem": "PROVO", "AddNum": "120",
            "AddNumSuffix": "", "PrefixDir": "N", "StreetName": "CENTER",
            "StreetType": "", "SuffixDir": "E", "ZipCode": "84601",
            "UnitType": "", "UnitID": "", "City": "PROVO", "CountyID": "49",
            "px": 0.0, "py": 0.0,
        }
        df = spark.createDataFrame([row], schema=ADDRPNTS_SCHEMA)
        got = rg.altnames_addrpnts(df).collect()
        assert len(got) == 1
        # raw id would be 'PROVO | 120  N CENTER  E' (double spaces from
        # empty AddNumSuffix and the unit-trim of empty StreetType + E)
        assert got[0]["UTAddPtID"] == "PROVO | 120 N CENTER E"

    def test_x3_different_predir_suppression(self, spark):
        from roadgrinder_spark.schemas import ADDRPNTS_SCHEMA

        base = {
            "objectid": 1, "AddSystem": "PROVO", "AddNum": "120",
            "AddNumSuffix": "", "PrefixDir": "N", "StreetName": "CENTER",
            "StreetType": "ST", "SuffixDir": "", "ZipCode": "84601",
            "UnitType": "", "UnitID": "", "City": "PROVO", "CountyID": "49",
            "px": 0.0, "py": 0.0,
        }
        rows = [
            base,  # N
            {**base, "objectid": 2, "PrefixDir": "S"},      # different predir twin -> both suppressed
            {**base, "objectid": 3, "AddNum": "200"},       # unique -> emitted
        ]
        df = spark.createDataFrame(rows, schema=ADDRPNTS_SCHEMA)
        got = rg.altnames_addrpnts(df).collect()
        assert len(got) == 1 and got[0]["AddNum"] == "200"


def test_bucketed_x2_equals_plain(spark, roads):
    """Range-bucketed interval join (scale path) is result-identical,
    including with a bucket size smaller than typical spans."""
    out = rg.explode_aliases(roads)
    a = rg.altnames_roads_nopredir(out.scratch).toPandas()
    for bucket in (50, 1000):
        b = rg.altnames_roads_nopredir_bucketed(out.scratch, bucket_size=bucket).toPandas()
        cols = sorted(a.columns)
        pd.testing.assert_frame_equal(
            a[cols].sort_values(cols).reset_index(drop=True),
            b[cols].sort_values(cols).reset_index(drop=True),
            check_dtype=False,
        )
