"""CHAR max-length / non-nullable constraint audit (SURVEY.md §1.2 / S5).

The reference hard-codes per-field CHAR lengths and `IsNullable_2 = false`
when creating its output tables (RoadGrinder/commands/
CreateFieldsCollectionRoadsCommand.cs:16-130, CreateFieldsCollection
AddrPntsCommand.cs:16-125; FC variant EsriHelper.cs:135-240). ArcSDE
enforces those at insert time; Spark's StringType carries no length, so
this module makes the contract explicit:

  * audit_constraints(df, spec)  — one pass, one aggregate row, unpivoted
    to (check, violations) rows; JVM conditional sums, no extra scans.
  * enforce_constraints(df, spec) — raises on the first audit violation
    (the ArcSDE insert-failure analogue), for use ahead of catalog writes.
  * oracle_constraint_sql(...)   — the same checks in DuckDB SQL, so the
    audit itself is a value-checked driver query.

Spec rows are (column, max_len, nullable) lifted verbatim from the
reference files above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: AtlNamesRoads / GeocodeRoads string fields
#: (CreateFieldsCollectionRoadsCommand.cs:23-130, EsriHelper.cs:135-240)
GEOCODE_ROADS_SPEC: list[tuple[str, int, bool]] = [
    ("ADDRSYS_L", 30, True),
    ("ADDRSYS_R", 30, True),
    ("PREDIR", 1, False),
    ("NAME", 30, False),
    ("POSTTYPE", 4, False),
    ("POSTDIR", 2, False),
    ("ZIPCODE_L", 5, True),
    ("ZIPCODE_R", 5, True),
    ("GLOBALID_SGID", 50, True),
]

#: AtlNamesAddrPnts string fields
#: (CreateFieldsCollectionAddrPntsCommand.cs:23-125); PrefixDir is dropped
#: from the insert so only the surviving output columns are audited.
ALTNAMES_ADDRPNTS_SPEC: list[tuple[str, int, bool]] = [
    ("AddSystem", 40, True),
    ("AddNum", 10, True),
    ("AddNumSuffix", 4, True),
    ("StreetName", 50, True),
    ("StreetType", 4, False),
    ("SuffixDir", 1, False),
    ("ZipCode", 5, True),
    ("City", 30, True),
    ("CountyID", 15, True),
    ("UTAddPtID", 140, True),
]


def _checks(spec: list[tuple[str, int, bool]]) -> list[tuple[str, str]]:
    """(check_name, SQL predicate counting a VIOLATION) — shared dialect."""
    out = []
    for col, max_len, nullable in spec:
        out.append((f"{col}_maxlen_{max_len}", f"length({col}) > {max_len}"))
        if not nullable:
            out.append((f"{col}_notnull", f"{col} IS NULL"))
    return out


def audit_constraints(df: DataFrame, spec: list[tuple[str, int, bool]]) -> DataFrame:
    """(chk string, violations bigint), one row per constraint — a single
    hash aggregate over one scan, then a literal-array explode (no second
    pass, no shuffle beyond the 1-row aggregate)."""
    checks = _checks(spec)
    aggs = [
        F.coalesce(F.sum(F.when(F.expr(pred), 1).otherwise(0)), F.lit(0)).cast("long").alias(f"_c{i}")
        for i, (_, pred) in enumerate(checks)
    ]
    wide = df.agg(*aggs)
    pairs = ", ".join(
        f"struct('{name}' AS chk, _c{i} AS violations)"
        for i, (name, _) in enumerate(checks)
    )
    return wide.select(F.expr(f"explode(array({pairs}))").alias("s")).select("s.*")


def enforce_constraints(df: DataFrame, spec: list[tuple[str, int, bool]]) -> DataFrame:
    """Raise ValueError when any constraint is violated (ArcSDE insert
    semantics); returns df unchanged otherwise so it composes in write
    pipelines."""
    bad = [
        (r["chk"], r["violations"])
        for r in audit_constraints(df, spec).collect()
        if r["violations"] > 0
    ]
    if bad:
        raise ValueError(f"constraint violations: {bad}")
    return df


def oracle_constraint_sql(src: str, spec: list[tuple[str, int, bool]]) -> str:
    """DuckDB mirror: one wide aggregate over `src`, unpivoted by UNION ALL
    of 1-row selects (reads the aggregate CTE, not the source, per row)."""
    checks = _checks(spec)
    aggs = ", ".join(
        f"CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS _c{i}"
        for i, (_, pred) in enumerate(checks)
    )
    rows = " UNION ALL ".join(
        f"SELECT '{name}' AS chk, coalesce(_c{i}, 0) AS violations FROM _cwide"
        for i, (name, _) in enumerate(checks)
    )
    return f"_cwide AS (SELECT {aggs} FROM {src})\nSELECT * FROM ({rows})"
