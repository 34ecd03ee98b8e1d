"""Scalar predicates and normalization expressions (SURVEY.md §2.2/§2.6).

Every function here returns a Catalyst Column — whole-stage-codegen'd
JVM-side expressions, never Python UDFs. Reference semantics cited per
function (file:line relative to /root/reference/RoadGrinder/).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def geocodable_roads_pred(df_prefix: str = "") -> Column:
    """P2 — the geocodable-roads scan filter.

    grinders/AlternateNamesGrinder.cs:75-77:
      CARTOCODE not in ('1','7','99')
      AND ((FROMADDR_L<>0 AND TOADDR_L<>0) OR (FROMADDR_R<>0 AND TOADDR_R<>0))
      AND NAME<>'' AND NAME not like '%ROUNDABOUT%'
    """
    c = lambda n: F.col(df_prefix + n)  # noqa: E731
    return (
        ~c("CARTOCODE").isin("1", "7", "99")
        & (
            ((c("FROMADDR_L") != 0) & (c("TOADDR_L") != 0))
            | ((c("FROMADDR_R") != 0) & (c("TOADDR_R") != 0))
        )
        & (c("NAME") != "")
        & ~c("NAME").contains("ROUNDABOUT")
    )


def has_letter(col: Column) -> Column:
    """F5 — letter detection.

    Three spellings in the reference mean the same thing on ASCII data:
    C# Any(char.IsLetter) (AlternateNamesGrinder.cs:136),
    FileGDB `UPPER(NAME)<>NAME OR LOWER(NAME)<>NAME`
    (PopulateAltNamesRoadsTableCommand.cs:28), and T-SQL `LIKE '%[A-Z]%'`
    under a case-insensitive collation
    (PopulateAltNamesAddrPntsTableCommand.cs:28).
    """
    return col.rlike("[A-Za-z]")


def zero_aware_low(from_l: Column, from_r: Column) -> Column:
    """F6 low side — zero-aware minimum of the two FROM endpoints.

    PopulateAltNamesRoadsTableCommand.cs:88-109: if either side is 0 take
    the other; else plain min. Values compared as int (Convert.ToInt32,
    :80-83) — we cast to long; fixtures keep ranges integral.
    """
    fl, fr = from_l.cast("long"), from_r.cast("long")
    return (
        F.when((fl == 0) | (fr == 0), F.when(fl == 0, fr).otherwise(fl))
        .otherwise(F.least(fl, fr))
    )


def plain_high(to_l: Column, to_r: Column) -> Column:
    """F6 high side — plain max, deliberately NOT zero-guarded
    (PopulateAltNamesRoadsTableCommand.cs:111-118)."""
    return F.greatest(to_l.cast("long"), to_r.cast("long"))


def range_overlap(a_low: Column, a_high: Column, b) -> Column:
    """J3 — one direction of the symmetric interval-overlap probe.

    PopulateAltNamesRoadsTableCommand.cs:121-126: a.low or a.high falls
    inside b's L-range or R-range (SQL BETWEEN: false when the stored range
    is inverted or both-zero, matching the reference's storage-engine
    evaluation). `b` is anything with FROMADDR_L/TOADDR_L/FROMADDR_R/
    TOADDR_R columns (a DataFrame alias accessor).
    """
    bfl = b["FROMADDR_L"].cast("long")
    btl = b["TOADDR_L"].cast("long")
    bfr = b["FROMADDR_R"].cast("long")
    btr = b["TOADDR_R"].cast("long")
    return (
        a_low.between(bfl, btl)
        | a_high.between(bfl, btl)
        | a_low.between(bfr, btr)
        | a_high.between(bfr, btr)
    )


def ut_addpt_id() -> Column:
    """F3 — the UTAddPtID concat, with the exact nested-trim grouping.

    PopulateAltNamesAddrPntsTableCommand.cs:28:
      ltrim(rtrim(AddSystem)) + ' | ' + ltrim(rtrim(AddNum)) + ' ' +
      ltrim(rtrim(AddNumSuffix)) + ' ' + ltrim(rtrim(PrefixDir)) + ' ' +
      ltrim(rtrim(StreetName)) + ' ' +
      ltrim(rtrim(StreetType + ' ' + ltrim(rtrim(SuffixDir))))
    NOT concat_ws: the last two components are trimmed as a unit, and
    PrefixDir is embedded even though the output column is dropped.
    """
    t = lambda n: F.trim(F.col(n))  # noqa: E731
    return F.concat(
        t("AddSystem"),
        F.lit(" | "),
        t("AddNum"),
        F.lit(" "),
        t("AddNumSuffix"),
        F.lit(" "),
        t("PrefixDir"),
        F.lit(" "),
        t("StreetName"),
        F.lit(" "),
        F.trim(F.concat(F.col("StreetType"), F.lit(" "), F.trim(F.col("SuffixDir")))),
    )


def collapse_whitespace(col: Column) -> Column:
    """F4 — Trim() then Regex.Replace(s, "\\s+", " ")
    (PopulateAltNamesAddrPntsTableCommand.cs:66-67)."""
    return F.regexp_replace(F.trim(col), r"\s+", " ")
