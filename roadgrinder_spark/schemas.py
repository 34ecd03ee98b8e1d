"""Schema constants.

Field sets mirror the reference's hard-coded schema builders:
  GeocodeRoads FC   — /root/reference/RoadGrinder/services/EsriHelper.cs:94-259
  AtlNamesRoads     — /root/reference/RoadGrinder/commands/CreateFieldsCollectionRoadsCommand.cs:7-134
  AtlNamesAddrPnts  — /root/reference/RoadGrinder/commands/CreateFieldsCollectionAddrPntsCommand.cs:7-128
  documents spans   — /root/repo/BASELINE.json input_hint
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# interleaved text+media document substrate (the engine's canonical input)
SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType(), False),       # road|addrpnt|text|media
        StructField("text", StringType(), True),        # JSON payload / prose
        StructField("media_ref", StringType(), True),   # geometry / blob ref
        StructField("offset", IntegerType(), False),    # order within doc
    ]
)
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_STRUCT), False),
    ]
)

# ---------------------------------------------------------------------------
# SGID-shaped relations (attribute payloads carried inside spans)
ROADS_FIELDS = [
    ("objectid", LongType()),
    ("CARTOCODE", StringType()),
    ("ADDRSYS_L", StringType()),
    ("ADDRSYS_R", StringType()),
    ("FROMADDR_L", DoubleType()),
    ("TOADDR_L", DoubleType()),
    ("FROMADDR_R", DoubleType()),
    ("TOADDR_R", DoubleType()),
    ("PREDIR", StringType()),
    ("NAME", StringType()),
    ("POSTTYPE", StringType()),
    ("POSTDIR", StringType()),
    ("A1_NAME", StringType()),
    ("A1_POSTTYPE", StringType()),
    ("A2_NAME", StringType()),
    ("A2_POSTTYPE", StringType()),
    ("AN_NAME", StringType()),
    ("AN_POSTDIR", StringType()),
    ("ZIPCODE_L", StringType()),
    ("ZIPCODE_R", StringType()),
    ("GlobalID", StringType()),
    ("x1", DoubleType()),
    ("y1", DoubleType()),
    ("x2", DoubleType()),
    ("y2", DoubleType()),
    ("geometry", StringType()),
]
ROADS_SCHEMA = StructType([StructField(n, t, True) for n, t in ROADS_FIELDS])

ADDRPNTS_FIELDS = [
    ("objectid", LongType()),
    ("AddSystem", StringType()),
    ("AddNum", StringType()),
    ("AddNumSuffix", StringType()),
    ("PrefixDir", StringType()),
    ("StreetName", StringType()),
    ("StreetType", StringType()),
    ("SuffixDir", StringType()),
    ("ZipCode", StringType()),
    ("UnitType", StringType()),
    ("UnitID", StringType()),
    ("City", StringType()),
    ("CountyID", StringType()),
    ("px", DoubleType()),
    ("py", DoubleType()),
]
ADDRPNTS_SCHEMA = StructType([StructField(n, t, True) for n, t in ADDRPNTS_FIELDS])

#: columns of the GeocodeRoads output FC (EsriHelper.cs:130-241), in our
#: engine carrying the segment endpoints + WKT through untouched (S9).
GEOCODE_ROADS_COLS = [
    "ADDRSYS_L",
    "ADDRSYS_R",
    "FROMADDR_L",
    "TOADDR_L",
    "FROMADDR_R",
    "TOADDR_R",
    "PREDIR",
    "NAME",
    "POSTTYPE",
    "POSTDIR",
    "ZIPCODE_L",
    "ZIPCODE_R",
    "GLOBALID_SGID",
]
GEOMETRY_COLS = ["x1", "y1", "x2", "y2", "geometry"]

#: AtlNamesAddrPnts output (PrefixDir dropped before insert,
#: PopulateAltNamesAddrPntsTableCommand.cs:57)
ALTNAMES_ADDRPNTS_COLS = [
    "AddSystem",
    "AddNum",
    "AddNumSuffix",
    "StreetName",
    "StreetType",
    "SuffixDir",
    "City",
    "ZipCode",
    "CountyID",
    "UTAddPtID",
]
