"""Deterministic synthetic SGID-shaped inputs, derived from the driver's
TPC-H-ish parquet with a *dual-dialect* SQL fragment that executes
identically in Spark SQL and DuckDB.

Why SQL-as-the-generator: the driver's correctness gate runs our Spark
queries side-by-side with DuckDB oracle SQL over the same parquet views
(/root/repo/__spark_entry__.py contract). By deriving the `roads` and
`addrpnts` relations with one shared ANSI-subset CTE, both engines see
bit-identical inputs and every downstream operator becomes value-hash
checkable.

Reference input contracts being modeled (study-only, no code copied):
  roads     — /root/reference/RoadGrinder/grinders/AlternateNamesGrinder.cs:102-107
              (projection list) and :75-77 (filter fields)
  addrpnts  — /root/reference/RoadGrinder/commands/
              PopulateAltNamesAddrPntsTableCommand.cs:27-40 (SQL column set)

The dialect subset used here (valid verbatim in Spark SQL *and* DuckDB):
CASE, %, ||, CAST(x AS STRING/DOUBLE/BIGINT), lpad, FLOOR, upper, trim.
regexp functions are NOT shared (DuckDB regexp_replace is first-match by
default) and are kept out of these fragments.

Coordinates are NAD83 / UTM 12N-style meters (Utah extent ~ x 400-450 km,
y 4500-4550 km). All coordinate arithmetic lands on exact binary fractions
(multiples of 6.25 m) so Spark and DuckDB produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Tables the derivation reads from the driver's testdata directory.
SOURCE_TABLES = ("orders", "lineitem")

# A reusable CASE that maps a grid ordinal 0..6 to an address-system name.
# Mixed case on purpose: the reference uppercases ADDRSYS_L/R on insert
# (EsriHelper.cs:337-338) and we must exercise that.
def _grid_name(expr: str) -> str:
    return (
        f"CASE {expr} "
        "WHEN 0 THEN 'Salt Lake City' "
        "WHEN 1 THEN 'Provo' "
        "WHEN 2 THEN 'OGDEN' "
        "WHEN 3 THEN 'Logan' "
        "WHEN 4 THEN 'St George' "
        "WHEN 5 THEN 'MOAB' "
        "ELSE 'Vernal' END"
    )


# Street-name formula shared by roads and address points so that points
# land on streets that exist. name_num % 10 buckets:
#   0 -> ''                      (fails P2 NAME<>'' arm)
#   1 -> 'ROUNDABOUT n'         (fails P2 NOT LIKE '%ROUNDABOUT%')
#   2 -> pure-numeric ACS name  (no letters -> P4/P5 reject)
#   3 -> 'Main'                 (mixed case, exercises UPPER/LOWER letter test)
#   else 'STREET n'
def _street_name(name_num: str) -> str:
    return (
        f"CASE {name_num} % 10 "
        "WHEN 0 THEN '' "
        f"WHEN 1 THEN 'ROUNDABOUT ' || CAST({name_num} AS STRING) "
        f"WHEN 2 THEN CAST(400 + ({name_num} % 30) * 100 AS STRING) "
        "WHEN 3 THEN 'Main' "
        f"ELSE 'STREET ' || CAST({name_num} AS STRING) END"
    )


def _posttype(name_num: str) -> str:
    return (
        f"CASE {name_num} % 4 WHEN 0 THEN 'ST' WHEN 1 THEN 'AVE' "
        "WHEN 2 THEN 'DR' ELSE '' END"
    )


def _postdir(name_num: str) -> str:
    return f"CASE {name_num} % 3 WHEN 0 THEN '' WHEN 1 THEN 'N' ELSE 'S' END"


#: roads: one synthetic SGID road segment per `orders` row. Deterministic
#: pure function of o_orderkey — no randomness, no current-time.
ROADS_CTE = f"""
__roads_base AS (
  SELECT
    o_orderkey AS k,
    o_orderkey % 7 AS grid,
    CASE WHEN o_orderkey % 31 = 0 THEN (o_orderkey + 1) % 7
         ELSE o_orderkey % 7 END AS grid_r,
    o_orderkey % 37 AS name_num,
    (o_orderkey % 11) * 100 AS b,
    400000 + (o_orderkey % 200) * 250 AS xi1,
    4500000 + (CAST(FLOOR(o_orderkey / 200) AS BIGINT) % 200) * 250 AS yi1,
    CASE o_orderkey % 4 WHEN 0 THEN 150 WHEN 1 THEN 0
         WHEN 2 THEN 150 ELSE 100 END AS dxi,
    CASE o_orderkey % 4 WHEN 0 THEN 0 WHEN 1 THEN 150
         WHEN 2 THEN 150 ELSE 0 END AS dyi
  FROM orders
),
roads AS (
  SELECT
    k AS objectid,
    CASE k % 23 WHEN 0 THEN '1' WHEN 1 THEN '7' WHEN 2 THEN '99'
         ELSE CAST(k % 23 AS STRING) END AS CARTOCODE,
    {_grid_name('grid')} AS ADDRSYS_L,
    {_grid_name('grid_r')} AS ADDRSYS_R,
    CAST(CASE WHEN k % 13 = 0 THEN 0 ELSE b + 1 END AS DOUBLE) AS FROMADDR_L,
    CAST(CASE WHEN k % 13 = 0 THEN 0 ELSE b + 99 END AS DOUBLE) AS TOADDR_L,
    CAST(CASE WHEN k % 17 = 0 THEN 0 ELSE b + 2 END AS DOUBLE) AS FROMADDR_R,
    CAST(CASE WHEN k % 17 = 0 THEN 0 ELSE b + 98 END AS DOUBLE) AS TOADDR_R,
    CASE k % 5 WHEN 0 THEN '' WHEN 1 THEN 'N' WHEN 2 THEN 'S'
         WHEN 3 THEN 'E' ELSE 'W' END AS PREDIR,
    {_street_name('name_num')} AS NAME,
    {_posttype('name_num')} AS POSTTYPE,
    {_postdir('name_num')} AS POSTDIR,
    CASE WHEN k % 6 = 0 THEN 'FRONTAGE ROAD ' || CAST(name_num AS STRING)
         ELSE '' END AS A1_NAME,
    CASE WHEN k % 6 = 0 THEN 'RD' ELSE '' END AS A1_POSTTYPE,
    CASE WHEN k % 9 = 0 THEN 'OLD MILL ' || CAST(name_num AS STRING)
         ELSE '' END AS A2_NAME,
    CASE WHEN k % 9 = 0 THEN 'LN' ELSE '' END AS A2_POSTTYPE,
    CASE WHEN k % 8 = 0 THEN CAST((name_num % 30) * 100 + 100 AS STRING)
         ELSE '' END AS AN_NAME,
    CASE WHEN k % 8 = 0 THEN
      (CASE k % 16 WHEN 0 THEN 'N' ELSE 'S' END) ELSE '' END AS AN_POSTDIR,
    '84' || lpad(CAST(k % 90 AS STRING), 3, '0') AS ZIPCODE_L,
    '84' || lpad(CAST((k + 1) % 90 AS STRING), 3, '0') AS ZIPCODE_R,
    '{{' || lpad(CAST(k AS STRING), 12, '0') || '}}' AS GlobalID,
    CAST(xi1 AS DOUBLE) AS x1,
    CAST(yi1 AS DOUBLE) AS y1,
    CAST(xi1 + dxi AS DOUBLE) AS x2,
    CAST(yi1 + dyi AS DOUBLE) AS y2,
    'LINESTRING (' || CAST(xi1 AS STRING) || ' ' || CAST(yi1 AS STRING)
      || ', ' || CAST(xi1 + dxi AS STRING) || ' '
      || CAST(yi1 + dyi AS STRING) || ')' AS geometry
  FROM __roads_base
)
"""

#: addrpnts: eight-ish synthetic SGID address points per order (one per
#: lineitem), co-located with the road derived from the same o_orderkey so
#: the spatial join has real matches. PrefixDir varies within a FLOOR(k2/5)
#: block while the rest of the 6-key stays fixed -> exercises the X3
#: different-predir anti-join both ways.
ADDRPNTS_CTE = f"""
__pnts_base AS (
  -- DISTINCT: the driver's synthetic lineitem repeats (orderkey, linenumber)
  -- pairs; address-point objectids must be unique
  SELECT
    l_orderkey * 8 + l_linenumber AS k2,
    l_orderkey AS ok,
    l_orderkey % 7 AS grid,
    l_orderkey % 37 AS name_num,
    (l_orderkey % 11) * 100 AS b
  FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)
),
addrpnts AS (
  SELECT
    k2 AS objectid,
    {_grid_name('grid')} AS AddSystem,
    CAST(b + (CAST(FLOOR(k2 / 5) AS BIGINT) % 97) + 1 AS STRING) AS AddNum,
    CASE k2 % 15 WHEN 0 THEN 'A' ELSE '' END AS AddNumSuffix,
    CASE k2 % 5 WHEN 0 THEN '' WHEN 1 THEN 'N' WHEN 2 THEN 'S'
         WHEN 3 THEN 'E' ELSE 'W' END AS PrefixDir,
    {_street_name('name_num')} AS StreetName,
    {_posttype('name_num')} AS StreetType,
    {_postdir('name_num')} AS SuffixDir,
    '84' || lpad(CAST(ok % 90 AS STRING), 3, '0') AS ZipCode,
    CASE k2 % 21 WHEN 0 THEN 'APT' WHEN 1 THEN 'STE' ELSE '' END AS UnitType,
    CASE k2 % 21 WHEN 0 THEN CAST(k2 % 40 AS STRING)
         WHEN 1 THEN CAST(k2 % 12 AS STRING) ELSE '' END AS UnitID,
    {_grid_name('grid')} AS City,
    lpad(CAST(grid * 2 + 1 AS STRING), 2, '0') AS CountyID,
    CAST(400000 + (ok % 200) * 250 + (k2 % 23) * 6.25 AS DOUBLE) AS px,
    CAST(4500000 + (CAST(FLOOR(ok / 200) AS BIGINT) % 200) * 250
         + (k2 % 3) * 12.5 - 12.5 AS DOUBLE) AS py
  FROM __pnts_base
)
"""


def with_sources(sql_body: str, ctes: str) -> str:
    """Wrap a query body with the derivation CTEs (shared by both engines)."""
    return f"WITH {ctes} {sql_body}"


def register_source_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the driver parquet tables as temp views for Spark SQL.

    The testdata files are single small parquet files (1-3 row groups), so
    scans get 1-3 tasks and the CASE-heavy derivation projection would run
    nearly single-threaded. Repartitioning the raw keys first (one cheap
    round-robin shuffle of a narrow table) lets the derivation use every
    core. On a real cluster the sources are multi-file Iceberg tables and
    this is unnecessary — but harmless, AQE coalesces it.
    """
    par = spark.sparkContext.defaultParallelism
    for name in SOURCE_TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name != "lineitem":
            df = df.repartition(par)
        # lineitem's ONLY consumer (ADDRPNTS_CTE) opens with SELECT
        # DISTINCT, whose shuffle already spreads the heavy CASE
        # projection over every core — a round-robin repartition ahead
        # of it was a second full shuffle (plus the mandatory
        # sort-before-repartition) that the aggregate immediately
        # re-partitioned away (guide §2.4: remove shuffles outright).
        df.createOrReplaceTempView(name)


def derive_roads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic SGID roads relation (deterministic function of `orders`)."""
    register_source_views(spark, sf_dir)
    return spark.sql(with_sources("SELECT * FROM roads", ROADS_CTE))


def derive_addrpnts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic SGID address-points relation (from `lineitem`)."""
    register_source_views(spark, sf_dir)
    return spark.sql(with_sources("SELECT * FROM addrpnts", ADDRPNTS_CTE))
