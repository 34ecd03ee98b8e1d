"""Versioned table catalog over parquet directories — the test-environment
analogue of the Iceberg layer the engine targets in production.

Maps the reference's workspace/table lifecycle (SURVEY.md §2.1):
  S4 create-or-open workspace  → TableCatalog(root)
  S5 create table (fixed schema) → write(..., mode="overwrite")
  S6 rename-on-exists versioning → every write is a new immutable
     snapshot directory <table>/v<N>; `_current` is a pointer file moved
     atomically (os.replace), so readers never observe a half-written
     table and any prior version stays readable (time travel / rollback).

On a real deployment this module is replaced by Iceberg catalog calls
(`df.writeTo(t).createOrReplace()` / snapshot expiry); the interface is
kept deliberately close.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TableCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _tdir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _pointer(self, name: str) -> str:
        return os.path.join(self._tdir(name), "_current.json")

    def current_version(self, name: str) -> int | None:
        try:
            with open(self._pointer(name)) as f:
                return json.load(f)["version"]
        except FileNotFoundError:
            return None

    def snapshots(self, name: str) -> list[dict]:
        log = os.path.join(self._tdir(name), "_snapshots.jsonl")
        if not os.path.exists(log):
            return []
        with open(log) as f:
            return [json.loads(x) for x in f if x.strip()]

    def write(
        self,
        name: str,
        df: DataFrame,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        sort_by: list[str] | None = None,
    ) -> int:
        """Write a new snapshot; returns its version number.

        mode="overwrite": snapshot = df. mode="append": snapshot = current
        ∪ df (copy-on-write append, like an Iceberg append producing a new
        snapshot). partition_by → hive-style dirs (partition pruning);
        sort_by → sortWithinPartitions (e.g. a Morton key for spatial
        file-level locality / min-max skipping).
        """
        tdir = self._tdir(name)
        os.makedirs(tdir, exist_ok=True)
        cur = self.current_version(name)
        # next version comes from the snapshot LOG, not the pointer: after
        # a rollback the pointer is older than the newest snapshot, and
        # pointer+1 would silently overwrite an existing immutable snapshot
        snaps = self.snapshots(name)
        version = (max((s["version"] for s in snaps), default=cur or 0)) + 1
        if mode == "append" and cur is not None:
            df = self.read(name).unionByName(df)
        out = df
        if sort_by:
            out = out.sortWithinPartitions(*sort_by)
        path = os.path.join(tdir, f"v{version}")
        writer = out.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        rows = self.spark.read.parquet(path).count()
        tmp = self._pointer(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "path": path}, f)
        os.replace(tmp, self._pointer(name))  # atomic commit
        with open(os.path.join(tdir, "_snapshots.jsonl"), "a") as f:
            f.write(
                json.dumps(
                    {
                        "version": version,
                        "rows": rows,
                        "mode": mode,
                        "partition_by": partition_by or [],
                        "ts_ms": int(time.time() * 1000),
                    }
                )
                + "\n"
            )
        return version

    def merge(self, name: str, df: DataFrame, keys: list[str]) -> int:
        """Copy-on-write MERGE (upsert) by key: the new snapshot keeps
        every current row whose key is absent from `df`, plus all of
        `df` — the MERGE INTO ... WHEN MATCHED UPDATE / NOT MATCHED
        INSERT shape, as an immutable snapshot (same contract the
        Iceberg adapter maps to a native MERGE at scale). A delta with
        duplicate keys is rejected — MERGE INTO semantics forbid a
        multi-matching source, and silently writing both rows would
        corrupt key uniqueness for every downstream reader."""
        n_dup = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_n"))  # aliased: a key named
            .filter(F.col("_n") > 1)             # 'count' must not clash
            .limit(1)
            .count()
        )
        if n_dup:
            raise ValueError(
                f"merge into {name}: delta contains duplicate keys {keys}"
            )
        # NULL key values are rejected for the same reason duplicates are:
        # the left_anti overwrite below is null-UNSAFE (NULL never equals
        # NULL), so a NULL-key delta row would coexist with a NULL-key
        # current row — two rows under one key, breaking the uniqueness
        # contract this method exists to preserve (ADVICE r3).
        null_pred = None
        for k in keys:
            c = F.col(k).isNull()
            null_pred = c if null_pred is None else (null_pred | c)
        if df.filter(null_pred).limit(1).count():
            raise ValueError(
                f"merge into {name}: delta contains NULL key values in {keys}"
            )
        cur = self.read(name)
        kept = cur.join(df.select(*keys).distinct(), keys, "left_anti")
        return self.write(name, kept.unionByName(df), mode="overwrite")

    def read(self, name: str, version: int | None = None) -> DataFrame:
        v = version if version is not None else self.current_version(name)
        if v is None:
            raise FileNotFoundError(f"table {name} does not exist in {self.root}")
        return self.spark.read.parquet(os.path.join(self._tdir(name), f"v{v}"))

    def rollback(self, name: str, version: int) -> None:
        path = os.path.join(self._tdir(name), f"v{version}")
        if not os.path.exists(path):
            raise FileNotFoundError(f"{name} v{version} not found")
        tmp = self._pointer(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "path": path}, f)
        os.replace(tmp, self._pointer(name))


def write_spatial(
    catalog: TableCatalog,
    name: str,
    df: DataFrame,
    cx: str = "cx",
    cy: str = "cy",
    n_buckets: int = 64,
) -> int:
    """Spatial-locality write: bucket rows by Morton(cx, cy) so nearby
    cells land in the same files (min-max stats then prune range reads)."""
    from ..spatial.cells import morton_cell_udf

    keyed = df.withColumn("_morton", morton_cell_udf(F.col(cx), F.col(cy)))
    bucketed = keyed.repartition(n_buckets, F.col("_morton"))
    return catalog.write(name, bucketed, sort_by=["_morton"])
