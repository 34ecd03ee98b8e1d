"""The RoadGrinder relational pipeline as pure DataFrame transforms.

Three operators (SURVEY.md §2.7), each with a DuckDB oracle-SQL builder so
the driver can value-check them end-to-end:

  X1 explode_aliases      — alias-record explosion (AlternateNamesGrinder.cs:110-192)
  X2 altnames_roads_nopredir — predir-droppable roads via decorrelated
                            self-anti-join (PopulateAltNamesRoadsTableCommand.cs:14-246)
  X3 altnames_addrpnts    — predir-droppable address points via anti-join
                            (PopulateAltNamesAddrPntsTableCommand.cs:16-113)

Scale notes: X2 is a self-join on a 5-column key; per-key groups are tiny
(the handful of PREDIR quadrants a street name exists in), so the shuffle
hash join partitions evenly by key hash — no skew handling needed here
even at 10^12 rows, because group size is bounded by data semantics, not
data volume. The interval predicate rides along as a join residual. X3's
anti-join equi-keys are 6 columns; same argument.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import (
    collapse_whitespace,
    geocodable_roads_pred,
    has_letter,
    plain_high,
    range_overlap,
    ut_addpt_id,
    zero_aware_low,
)
from ..schemas import ALTNAMES_ADDRPNTS_COLS, GEOCODE_ROADS_COLS, GEOMETRY_COLS

# ---------------------------------------------------------------------------
# X1 — alias-record explosion
# ---------------------------------------------------------------------------

_BRANCH_KINDS = ("primary", "a1", "a2", "an")


@dataclass
class AliasOutputs:
    geocode_roads: DataFrame   # primary rows, GeocodeRoads FC shape (+geometry)
    altnames_stage1: DataFrame  # a1/a2/an rows, AtlNamesRoads table shape
    scratch: DataFrame          # all four kinds (+geometry, +_kind) — X2 input


def explode_aliases(roads: DataFrame, strict_acs: bool = False) -> AliasOutputs:
    """X1 — per geocodable road emit up to 4 rows in ONE scan+explode pass.

    Branch semantics (AlternateNamesGrinder.cs:110-192, insert paths at
    EsriHelper.cs:318-421):
      primary: NAME/POSTTYPE/POSTDIR as-is            → GeocodeRoads + scratch
      a1:      NAME:=A1_NAME, POSTTYPE:=A1_POSTTYPE   → AtlNamesRoads + scratch
      a2:      NAME:=A2_NAME, POSTTYPE:=A2_POSTTYPE   → AtlNamesRoads + scratch
      an:      NAME:=AN_NAME, POSTDIR:=AN_POSTDIR,
               POSTTYPE:='' (needsStreetType=false,
               EsriHelper.cs:354-357)                 → AtlNamesRoads + scratch
    ADDRSYS_L/R are uppercased on every insert (EsriHelper.cs:337-338).

    The reference's ACS branch (AlternateNamesGrinder.cs:136-140) calls
    ToString() on the IndexFieldValue wrapper instead of .Value — the type
    name always contains letters, so the POSTDIR-drop never fires. Default
    (faithful) mode reproduces that by skipping the branch; strict_acs=True
    implements the intended rule: alias rows whose NAME has no letter get
    POSTDIR:=''.
    """
    g = roads.filter(geocodable_roads_pred())

    def branch(kind: str, name, posttype, postdir, emit) -> F.Column:
        return F.struct(
            F.lit(kind).alias("kind"),
            name.alias("name"),
            posttype.alias("posttype"),
            postdir.alias("postdir"),
            emit.alias("emit"),
        )

    postdir = F.col("POSTDIR")
    if strict_acs:
        a1_postdir = F.when(has_letter(F.col("A1_NAME")), postdir).otherwise(F.lit(""))
        a2_postdir = F.when(has_letter(F.col("A2_NAME")), postdir).otherwise(F.lit(""))
    else:
        a1_postdir = postdir
        a2_postdir = postdir

    branches = F.array(
        branch("primary", F.col("NAME"), F.col("POSTTYPE"), postdir, F.col("NAME") != ""),
        branch("a1", F.col("A1_NAME"), F.col("A1_POSTTYPE"), a1_postdir, F.col("A1_NAME") != ""),
        branch("a2", F.col("A2_NAME"), F.col("A2_POSTTYPE"), a2_postdir, F.col("A2_NAME") != ""),
        branch("an", F.col("AN_NAME"), F.lit(""), F.col("AN_POSTDIR"), F.col("AN_NAME") != ""),
    )

    carried = [
        F.upper(F.col("ADDRSYS_L")).alias("ADDRSYS_L"),
        F.upper(F.col("ADDRSYS_R")).alias("ADDRSYS_R"),
        F.col("FROMADDR_L"),
        F.col("TOADDR_L"),
        F.col("FROMADDR_R"),
        F.col("TOADDR_R"),
        F.col("PREDIR"),
        F.col("ZIPCODE_L"),
        F.col("ZIPCODE_R"),
        F.col("GlobalID").alias("GLOBALID_SGID"),
        *[F.col(c) for c in GEOMETRY_COLS],
    ]
    exploded = (
        g.select(*carried, F.explode(branches).alias("b"))
        .filter(F.col("b.emit"))
        .withColumn("NAME", F.col("b.name"))
        .withColumn("POSTTYPE", F.col("b.posttype"))
        .withColumn("POSTDIR", F.col("b.postdir"))
        .withColumn("_kind", F.col("b.kind"))
        .drop("b")
    )
    scratch = exploded.select(*GEOCODE_ROADS_COLS, *GEOMETRY_COLS, "_kind")
    geocode_roads = scratch.filter(F.col("_kind") == "primary").drop("_kind")
    altnames_stage1 = (
        scratch.filter(F.col("_kind").isin("a1", "a2", "an")).select(*GEOCODE_ROADS_COLS)
    )
    return AliasOutputs(geocode_roads, altnames_stage1, scratch)


# ---------------------------------------------------------------------------
# X2 — predir-droppable roads (decorrelated J2+J3+J4)
# ---------------------------------------------------------------------------

def altnames_roads_nopredir(scratch: DataFrame) -> DataFrame:
    """X2 — emit a PREDIR='' record for each predir'd alphabetic scratch row
    that has NO same-keyed row in a different PREDIR quadrant with an
    overlapping address range.

    The reference runs this as an index nested-loop issuing ~3 correlated
    probes per row (PopulateAltNamesRoadsTableCommand.cs:50-214). Here it is
    ONE shuffle-hash LEFT ANTI join: equi-keys (ADDRSYS_L, ADDRSYS_R, NAME,
    POSTTYPE, POSTDIR), residual (PREDIR<>, symmetric interval overlap).
    Catalyst extracts the equality keys for hashing; the anti-join
    short-circuits on first match exactly like the cursor `break`
    (:134-143). Duplicates on the outer side are preserved (bag semantics —
    every qualifying scratch row inserts, :228-239).
    """
    lh = scratch.withColumn(
        "_low", zero_aware_low(F.col("FROMADDR_L"), F.col("FROMADDR_R"))
    ).withColumn("_high", plain_high(F.col("TOADDR_L"), F.col("TOADDR_R")))

    outer = lh.filter((F.col("PREDIR") != "") & has_letter(F.col("NAME"))).alias("o")
    cand = lh.alias("c")

    def oc(side: str, name: str) -> F.Column:
        return F.col(f"{side}.{name}")

    cond = (
        (oc("o", "ADDRSYS_L") == oc("c", "ADDRSYS_L"))
        & (oc("o", "ADDRSYS_R") == oc("c", "ADDRSYS_R"))
        & (oc("o", "NAME") == oc("c", "NAME"))
        & (oc("o", "POSTTYPE") == oc("c", "POSTTYPE"))
        & (oc("o", "POSTDIR") == oc("c", "POSTDIR"))
        & (oc("o", "PREDIR") != oc("c", "PREDIR"))
        & (
            range_overlap(
                oc("o", "_low"),
                oc("o", "_high"),
                {k: oc("c", k) for k in ("FROMADDR_L", "TOADDR_L", "FROMADDR_R", "TOADDR_R")},
            )
            | range_overlap(
                oc("c", "_low"),
                oc("c", "_high"),
                {k: oc("o", k) for k in ("FROMADDR_L", "TOADDR_L", "FROMADDR_R", "TOADDR_R")},
            )
        )
    )
    survivors = outer.join(cand, cond, "left_anti")
    return survivors.withColumn("PREDIR", F.lit("")).select(*GEOCODE_ROADS_COLS)


def altnames_roads(scratch: DataFrame, altnames_stage1: DataFrame) -> DataFrame:
    """Full AtlNamesRoads table: X1 alias rows ∪ X2 no-predir rows
    (both insert into the same table, AlternateNamesGrinder.cs:145-186 and
    PopulateAltNamesRoadsTableCommand.cs:235)."""
    return altnames_stage1.unionByName(altnames_roads_nopredir(scratch))


# ---------------------------------------------------------------------------
# X3 — predir-droppable address points (J1)
# ---------------------------------------------------------------------------

def altnames_addrpnts(addrpnts: DataFrame) -> DataFrame:
    """X3 — DISTINCT candidates with a predir, alphabetic, non-HIGHWAY name;
    anti-join against ALL points on the 6-key with a different PrefixDir;
    drop PrefixDir; whitespace-normalize UTAddPtID.

    Reference runs the whole join remotely in SQL Server
    (PopulateAltNamesAddrPntsTableCommand.cs:27-40) then normalizes
    client-side (:57-72). Here: hash aggregate (distinct) → shuffle-hash
    LEFT ANTI with PrefixDir<> residual → projection.
    """
    cand = (
        addrpnts.filter(
            (F.col("PrefixDir") != "")
            & has_letter(F.col("StreetName"))
            & ~F.col("StreetName").startswith("HIGHWAY ")
        )
        .select(
            "AddSystem",
            "AddNum",
            "AddNumSuffix",
            "PrefixDir",
            "StreetName",
            "StreetType",
            "SuffixDir",
            "City",
            "ZipCode",
            "CountyID",
            ut_addpt_id().alias("UTAddPtID"),
        )
        .distinct()
        .alias("a")
    )
    all_pnts = addrpnts.alias("b")
    cond = (
        (F.col("a.AddSystem") == F.col("b.AddSystem"))
        & (F.col("a.StreetName") == F.col("b.StreetName"))
        & (F.col("a.AddNum") == F.col("b.AddNum"))
        & (F.col("a.StreetType") == F.col("b.StreetType"))
        & (F.col("a.SuffixDir") == F.col("b.SuffixDir"))
        & (F.col("a.AddNumSuffix") == F.col("b.AddNumSuffix"))
        & (F.col("a.PrefixDir") != F.col("b.PrefixDir"))
    )
    kept = cand.join(all_pnts, cond, "left_anti")
    return kept.withColumn("UTAddPtID", collapse_whitespace(F.col("UTAddPtID"))).select(
        *ALTNAMES_ADDRPNTS_COLS
    )


# ---------------------------------------------------------------------------
# DuckDB oracle-SQL builders (driver correctness gate)
# ---------------------------------------------------------------------------

GEOCODABLE_WHERE = (
    "CARTOCODE NOT IN ('1','7','99') "
    "AND ((FROMADDR_L <> 0 AND TOADDR_L <> 0) OR (FROMADDR_R <> 0 AND TOADDR_R <> 0)) "
    "AND NAME <> '' AND NAME NOT LIKE '%ROUNDABOUT%'"
)

_CARRY = (
    "upper(ADDRSYS_L) AS ADDRSYS_L, upper(ADDRSYS_R) AS ADDRSYS_R, "
    "FROMADDR_L, TOADDR_L, FROMADDR_R, TOADDR_R, PREDIR, "
    "ZIPCODE_L, ZIPCODE_R, GlobalID AS GLOBALID_SGID, x1, y1, x2, y2, geometry"
)

#: scratch relation = X1 union of the four branches, plus _low/_high (F6).
SCRATCH_CTE = f"""
geocodable AS (SELECT * FROM roads WHERE {GEOCODABLE_WHERE}),
scratch AS (
  SELECT {_CARRY}, NAME, POSTTYPE, POSTDIR, 'primary' AS _kind
    FROM geocodable WHERE NAME <> ''
  UNION ALL
  SELECT {_CARRY}, A1_NAME AS NAME, A1_POSTTYPE AS POSTTYPE, POSTDIR, 'a1'
    FROM geocodable WHERE A1_NAME <> ''
  UNION ALL
  SELECT {_CARRY}, A2_NAME AS NAME, A2_POSTTYPE AS POSTTYPE, POSTDIR, 'a2'
    FROM geocodable WHERE A2_NAME <> ''
  UNION ALL
  SELECT {_CARRY}, AN_NAME AS NAME, '' AS POSTTYPE, AN_POSTDIR AS POSTDIR, 'an'
    FROM geocodable WHERE AN_NAME <> ''
),
scratch_lh AS (
  SELECT *,
    CASE WHEN CAST(FROMADDR_L AS BIGINT) = 0 OR CAST(FROMADDR_R AS BIGINT) = 0
         THEN CASE WHEN CAST(FROMADDR_L AS BIGINT) = 0
                   THEN CAST(FROMADDR_R AS BIGINT)
                   ELSE CAST(FROMADDR_L AS BIGINT) END
         ELSE CASE WHEN CAST(FROMADDR_L AS BIGINT) < CAST(FROMADDR_R AS BIGINT)
                   THEN CAST(FROMADDR_L AS BIGINT)
                   ELSE CAST(FROMADDR_R AS BIGINT) END END AS _low,
    CASE WHEN CAST(TOADDR_L AS BIGINT) > CAST(TOADDR_R AS BIGINT)
         THEN CAST(TOADDR_L AS BIGINT)
         ELSE CAST(TOADDR_R AS BIGINT) END AS _high
  FROM scratch
)
"""

_GEO_COLS_SQL = ", ".join(GEOCODE_ROADS_COLS)

ORACLE_GEOCODE_ROADS = (
    f"SELECT {_GEO_COLS_SQL}, x1, y1, x2, y2, geometry "
    "FROM scratch WHERE _kind = 'primary'"
)

ORACLE_ALTNAMES_STAGE1 = (
    f"SELECT {_GEO_COLS_SQL} FROM scratch WHERE _kind IN ('a1','a2','an')"
)

_OVERLAP_SQL = " OR ".join(
    f"({a}.{e} BETWEEN CAST({b}.FROMADDR_{s} AS BIGINT) "
    f"AND CAST({b}.TOADDR_{s} AS BIGINT))"
    for a, b in (("o", "c"), ("c", "o"))
    for e in ("_low", "_high")
    for s in ("L", "R")
)

_X2_BODY = f"""
FROM scratch_lh o
WHERE o.PREDIR <> '' AND regexp_matches(o.NAME, '[A-Za-z]')
  AND NOT EXISTS (
    SELECT 1 FROM scratch_lh c
    WHERE c.ADDRSYS_L = o.ADDRSYS_L AND c.ADDRSYS_R = o.ADDRSYS_R
      AND c.NAME = o.NAME AND c.POSTTYPE = o.POSTTYPE AND c.POSTDIR = o.POSTDIR
      AND c.PREDIR <> o.PREDIR
      AND ({_OVERLAP_SQL})
  )
"""

_X2_SELECT = (
    "SELECT o.ADDRSYS_L, o.ADDRSYS_R, o.FROMADDR_L, o.TOADDR_L, o.FROMADDR_R, "
    "o.TOADDR_R, '' AS PREDIR, o.NAME, o.POSTTYPE, o.POSTDIR, o.ZIPCODE_L, "
    "o.ZIPCODE_R, o.GLOBALID_SGID"
)

ORACLE_ALTNAMES_NOPREDIR = _X2_SELECT + _X2_BODY

ORACLE_ALTNAMES_ROADS = (
    ORACLE_ALTNAMES_STAGE1 + " UNION ALL " + ORACLE_ALTNAMES_NOPREDIR
)

_UTADDPTID_SQL = (
    "trim(AddSystem) || ' | ' || trim(AddNum) || ' ' || trim(AddNumSuffix) "
    "|| ' ' || trim(PrefixDir) || ' ' || trim(StreetName) || ' ' "
    "|| trim(StreetType || ' ' || trim(SuffixDir))"
)

ADDRPNT_CAND_CTE = f"""
cand AS (
  SELECT DISTINCT AddSystem, AddNum, AddNumSuffix, PrefixDir, StreetName,
         StreetType, SuffixDir, City, ZipCode, CountyID,
         {_UTADDPTID_SQL} AS UTAddPtID
  FROM addrpnts
  WHERE PrefixDir <> '' AND regexp_matches(StreetName, '[A-Za-z]')
    AND StreetName NOT LIKE 'HIGHWAY %'
)
"""

ORACLE_ALTNAMES_ADDRPNTS = r"""
SELECT AddSystem, AddNum, AddNumSuffix, StreetName, StreetType, SuffixDir,
       City, ZipCode, CountyID,
       regexp_replace(trim(UTAddPtID), '\s+', ' ', 'g') AS UTAddPtID
FROM cand a
WHERE NOT EXISTS (
  SELECT 1 FROM addrpnts b
  WHERE a.AddSystem = b.AddSystem AND a.StreetName = b.StreetName
    AND a.AddNum = b.AddNum AND a.StreetType = b.StreetType
    AND a.SuffixDir = b.SuffixDir AND a.AddNumSuffix = b.AddNumSuffix
    AND a.PrefixDir <> b.PrefixDir
)
"""


# ---------------------------------------------------------------------------
# P7/A1 — pre-run null-validation counts
# ---------------------------------------------------------------------------

def validation_counts(roads: DataFrame, addrpnts: DataFrame) -> DataFrame:
    """The reference's pre-flight null audits (AlternateNamesGrinder.cs:40-41),
    INCLUDING its AND/OR precedence quirk: in
      `CARTOCODE not in (...) and NAME is null or POSTTYPE is null or ...`
    the CARTOCODE filter binds only to the first disjunct. The roads
    failure aborts the reference run; the addr-pnts failure only warns
    (the abort is commented out, :60-61) — we report both counts and leave
    policy to the caller."""
    r_bad = (
        (~F.col("CARTOCODE").isin("1", "7", "99")) & F.col("NAME").isNull()
    )
    for c in ["POSTTYPE", "ADDRSYS_L", "ADDRSYS_R", "PREDIR", "POSTDIR",
              "A1_NAME", "A1_POSTTYPE", "A2_NAME", "A2_POSTTYPE",
              "AN_NAME", "AN_POSTDIR"]:
        r_bad = r_bad | F.col(c).isNull()
    p_bad = F.col("AddNum").isNull()
    for c in ["PrefixDir", "StreetName", "StreetType", "SuffixDir", "AddNumSuffix"]:
        p_bad = p_bad | F.col(c).isNull()
    r = roads.filter(r_bad).select(
        F.lit("roads").alias("relation")
    ).groupBy("relation").agg(F.count(F.lit(1)).alias("n_bad"))
    p = addrpnts.filter(p_bad).select(
        F.lit("addrpnts").alias("relation")
    ).groupBy("relation").agg(F.count(F.lit(1)).alias("n_bad"))
    # emit zero rows too (groupBy of empty filter yields nothing)
    base = roads.sparkSession.createDataFrame(
        [("roads",), ("addrpnts",)], "relation string"
    )
    return (
        base.join(r.unionByName(p), "relation", "left")
        .select("relation", F.coalesce(F.col("n_bad"), F.lit(0)).alias("n_bad"))
    )


ORACLE_VALIDATION_COUNTS = """
SELECT 'roads' AS relation, (
  SELECT count(*) FROM roads
  WHERE CARTOCODE NOT IN ('1','7','99') AND NAME IS NULL
     OR POSTTYPE IS NULL OR ADDRSYS_L IS NULL OR ADDRSYS_R IS NULL
     OR PREDIR IS NULL OR POSTDIR IS NULL OR A1_NAME IS NULL
     OR A1_POSTTYPE IS NULL OR A2_NAME IS NULL OR A2_POSTTYPE IS NULL
     OR AN_NAME IS NULL OR AN_POSTDIR IS NULL
) AS n_bad
UNION ALL
SELECT 'addrpnts', (
  SELECT count(*) FROM addrpnts
  WHERE AddNum IS NULL OR PrefixDir IS NULL OR StreetName IS NULL
     OR StreetType IS NULL OR SuffixDir IS NULL OR AddNumSuffix IS NULL
)
"""


# ---------------------------------------------------------------------------
# X2 at extreme scale — range-bucketed interval join (SURVEY.md §4 #3)
# ---------------------------------------------------------------------------

def altnames_roads_nopredir_bucketed(
    scratch: DataFrame, bucket_size: int = 1000
) -> DataFrame:
    """Result-identical to altnames_roads_nopredir, with candidate pairs
    generated through ADDRESS-RANGE BUCKETS instead of a pure 5-key join.

    When one (addrsys, name, posttype, postdir) key holds millions of
    rows (continental-scale corpora where a single street signature
    repeats across a mega-grid), the plain key join's per-key fanout is
    quadratic. Bucketing each row's address-span [min(F*,T*,low),
    max(F*,T*,high)] into `bucket_size` intervals makes the join key
    (5-key + bucket), bounding fanout by co-located ranges. Lossless: any
    pair satisfying the overlap predicate has intersecting spans, so it
    shares at least one bucket; each matching pair is counted once via a
    canonical-bucket guard (no distinct needed on the inner side).
    """
    lh = (
        scratch.withColumn("_low", zero_aware_low(F.col("FROMADDR_L"), F.col("FROMADDR_R")))
        .withColumn("_high", plain_high(F.col("TOADDR_L"), F.col("TOADDR_R")))
        .withColumn(
            "_span_lo",
            F.least(
                F.col("FROMADDR_L").cast("long"), F.col("TOADDR_L").cast("long"),
                F.col("FROMADDR_R").cast("long"), F.col("TOADDR_R").cast("long"),
                F.col("_low"),
            ),
        )
        .withColumn(
            "_span_hi",
            F.greatest(
                F.col("FROMADDR_L").cast("long"), F.col("TOADDR_L").cast("long"),
                F.col("FROMADDR_R").cast("long"), F.col("TOADDR_R").cast("long"),
                F.col("_high"),
            ),
        )
    )
    # Row identity = the full scratch column tuple (ADVICE r1: a
    # monotonically_increasing_id here was evaluated twice — once under
    # matched keys, once under outer_rows — and ids regenerate per
    # evaluation, silently misaligning under task retry or nondeterministic
    # source order). Keying on the columns themselves is deterministic and
    # semantically exact: identical rows have identical match outcomes, and
    # a left_anti join preserves left-side multiplicity.
    id_cols = list(scratch.columns)
    b = int(bucket_size)
    bucketed = lh.withColumn(
        "_bucket",
        F.explode(
            F.sequence(F.floor(F.col("_span_lo") / b), F.floor(F.col("_span_hi") / b))
        ),
    )
    outer_b = bucketed.filter(
        (F.col("PREDIR") != "") & has_letter(F.col("NAME"))
    ).alias("o")
    cand_b = bucketed.alias("c")

    def oc(side: str, name: str) -> F.Column:
        return F.col(f"{side}.{name}")

    overlap = range_overlap(
        oc("o", "_low"), oc("o", "_high"),
        {k: oc("c", k) for k in ("FROMADDR_L", "TOADDR_L", "FROMADDR_R", "TOADDR_R")},
    ) | range_overlap(
        oc("c", "_low"), oc("c", "_high"),
        {k: oc("o", k) for k in ("FROMADDR_L", "TOADDR_L", "FROMADDR_R", "TOADDR_R")},
    )
    # canonical bucket: count the pair only in the bucket holding the
    # higher of the two span_lo values — exactly one per pair
    canonical = oc("o", "_bucket") == F.floor(
        F.greatest(oc("o", "_span_lo"), oc("c", "_span_lo")) / b
    )
    matched_keys = (
        outer_b.join(
            cand_b,
            (oc("o", "ADDRSYS_L") == oc("c", "ADDRSYS_L"))
            & (oc("o", "ADDRSYS_R") == oc("c", "ADDRSYS_R"))
            & (oc("o", "NAME") == oc("c", "NAME"))
            & (oc("o", "POSTTYPE") == oc("c", "POSTTYPE"))
            & (oc("o", "POSTDIR") == oc("c", "POSTDIR"))
            & (oc("o", "PREDIR") != oc("c", "PREDIR"))
            & (oc("o", "_bucket") == oc("c", "_bucket"))
            & canonical
            & overlap,
            "inner",
        )
        .select(*[oc("o", c).alias(c) for c in id_cols])
        .distinct()
        .alias("m")
    )
    outer_rows = lh.filter(
        (F.col("PREDIR") != "") & has_letter(F.col("NAME"))
    ).alias("s")
    anti_cond = None
    for c in id_cols:  # null-safe equality keeps exact anti-join semantics
        clause = F.col(f"s.{c}").eqNullSafe(F.col(f"m.{c}"))
        anti_cond = clause if anti_cond is None else (anti_cond & clause)
    survivors = outer_rows.join(matched_keys, anti_cond, "left_anti")
    return survivors.withColumn("PREDIR", F.lit("")).select(*GEOCODE_ROADS_COLS)
