"""Straight-line pure-Python oracle of the RoadGrinder pipeline
(SURVEY.md §5 item 1) — an implementation INDEPENDENT of both the Spark
engine and the DuckDB SQL, used by property-based tests.

Mirrors the reference's control flow row-at-a-time:
  X1 AlternateNamesGrinder.cs:110-192, X2 PopulateAltNamesRoadsTable-
  Command.cs:14-246, X3 PopulateAltNamesAddrPntsTableCommand.cs:16-113.
"""

from __future__ import annotations

import re


def geocodable(r: dict) -> bool:
    return (
        r["CARTOCODE"] not in ("1", "7", "99")
        and (
            (r["FROMADDR_L"] != 0 and r["TOADDR_L"] != 0)
            or (r["FROMADDR_R"] != 0 and r["TOADDR_R"] != 0)
        )
        and r["NAME"] != ""
        and "ROUNDABOUT" not in r["NAME"]
    )


def explode_aliases_py(roads: list[dict]) -> tuple[list[dict], list[dict], list[dict]]:
    """Returns (geocode_roads, altnames_stage1, scratch)."""
    geocode, alt1, scratch = [], [], []
    for r in roads:
        if not geocodable(r):
            continue
        base = {
            "ADDRSYS_L": r["ADDRSYS_L"].upper(),
            "ADDRSYS_R": r["ADDRSYS_R"].upper(),
            "FROMADDR_L": r["FROMADDR_L"],
            "TOADDR_L": r["TOADDR_L"],
            "FROMADDR_R": r["FROMADDR_R"],
            "TOADDR_R": r["TOADDR_R"],
            "PREDIR": r["PREDIR"],
            "ZIPCODE_L": r["ZIPCODE_L"],
            "ZIPCODE_R": r["ZIPCODE_R"],
            "GLOBALID_SGID": r["GlobalID"],
        }
        branches = [
            ("primary", r["NAME"], r["POSTTYPE"], r["POSTDIR"]),
            ("a1", r["A1_NAME"], r["A1_POSTTYPE"], r["POSTDIR"]),
            ("a2", r["A2_NAME"], r["A2_POSTTYPE"], r["POSTDIR"]),
            ("an", r["AN_NAME"], "", r["AN_POSTDIR"]),
        ]
        for kind, name, posttype, postdir in branches:
            if name == "":
                continue
            row = {**base, "NAME": name, "POSTTYPE": posttype, "POSTDIR": postdir,
                   "_kind": kind}
            scratch.append(row)
            if kind == "primary":
                geocode.append({k: v for k, v in row.items() if k != "_kind"})
            else:
                alt1.append({k: v for k, v in row.items() if k != "_kind"})
    return geocode, alt1, scratch


def _low_high(r: dict) -> tuple[int, int]:
    fl, fr = int(r["FROMADDR_L"]), int(r["FROMADDR_R"])
    tl, tr = int(r["TOADDR_L"]), int(r["TOADDR_R"])
    if fl == 0 or fr == 0:
        low = fr if fl == 0 else fl
    else:
        low = min(fl, fr)
    high = max(tl, tr)
    return low, high


def _olap(a_low: int, a_high: int, b: dict) -> bool:
    bfl, btl = int(b["FROMADDR_L"]), int(b["TOADDR_L"])
    bfr, btr = int(b["FROMADDR_R"]), int(b["TOADDR_R"])
    return (
        bfl <= a_low <= btl or bfl <= a_high <= btl
        or bfr <= a_low <= btr or bfr <= a_high <= btr
    )


def altnames_nopredir_py(scratch: list[dict]) -> list[dict]:
    out = []
    for o in scratch:
        if o["PREDIR"] == "" or not re.search(r"[A-Za-z]", o["NAME"]):
            continue
        o_low, o_high = _low_high(o)
        found = False
        for c in scratch:
            if (
                c["ADDRSYS_L"] == o["ADDRSYS_L"]
                and c["ADDRSYS_R"] == o["ADDRSYS_R"]
                and c["NAME"] == o["NAME"]
                and c["POSTTYPE"] == o["POSTTYPE"]
                and c["POSTDIR"] == o["POSTDIR"]
                and c["PREDIR"] != o["PREDIR"]
            ):
                c_low, c_high = _low_high(c)
                if _olap(o_low, o_high, c) or _olap(c_low, c_high, o):
                    found = True
                    break
        if not found:
            row = {k: v for k, v in o.items() if k != "_kind"}
            row["PREDIR"] = ""
            out.append(row)
    return out


def altnames_addrpnts_py(pnts: list[dict]) -> list[dict]:
    def ut_id(p: dict) -> str:
        tail = (p["StreetType"] + " " + p["SuffixDir"].strip()).strip()
        return (
            p["AddSystem"].strip() + " | " + p["AddNum"].strip() + " "
            + p["AddNumSuffix"].strip() + " " + p["PrefixDir"].strip() + " "
            + p["StreetName"].strip() + " " + tail
        )

    cand = {}
    for p in pnts:
        if (
            p["PrefixDir"] != ""
            and re.search(r"[A-Za-z]", p["StreetName"])
            and not p["StreetName"].startswith("HIGHWAY ")
        ):
            key = tuple(
                p[k]
                for k in ("AddSystem", "AddNum", "AddNumSuffix", "PrefixDir",
                          "StreetName", "StreetType", "SuffixDir", "City",
                          "ZipCode", "CountyID")
            )
            cand.setdefault(key, {**{k: p[k] for k in (
                "AddSystem", "AddNum", "AddNumSuffix", "PrefixDir", "StreetName",
                "StreetType", "SuffixDir", "City", "ZipCode", "CountyID")},
                "UTAddPtID": ut_id(p)})
    out = []
    for key, c in cand.items():
        suppressed = any(
            b["AddSystem"] == c["AddSystem"]
            and b["StreetName"] == c["StreetName"]
            and b["AddNum"] == c["AddNum"]
            and b["StreetType"] == c["StreetType"]
            and b["SuffixDir"] == c["SuffixDir"]
            and b["AddNumSuffix"] == c["AddNumSuffix"]
            and b["PrefixDir"] != c["PrefixDir"]
            for b in pnts
        )
        if not suppressed:
            row = {k: v for k, v in c.items() if k != "PrefixDir"}
            row["UTAddPtID"] = re.sub(r"\s+", " ", c["UTAddPtID"].strip())
            out.append(row)
    return out
