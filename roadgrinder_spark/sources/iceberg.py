"""Apache Iceberg implementation of the TableCatalog interface.

sources/catalog.TableCatalog is the test-environment stand-in (parquet
snapshot dirs + an atomically-replaced pointer file). In production the
engine targets a real Iceberg catalog (SURVEY.md §1.3); this adapter
maps the SAME lifecycle onto Iceberg's native primitives so the two are
drop-in interchangeable:

  TableCatalog.write(mode="overwrite")  → df.writeTo(t).createOrReplace()
  TableCatalog.write(mode="append")     → df.writeTo(t).append()
  snapshot versions / _snapshots.jsonl  → the table's `snapshots`
                                          metadata table (snapshot_id)
  TableCatalog.read(version=v)          → SELECT ... VERSION AS OF v
  TableCatalog.rollback(v)              → CALL <cat>.system.
                                          rollback_to_snapshot(t, v)
  rename-on-exists (reference
  AlternateNamesGrinder.cs:239-267)     → replaced by snapshot isolation:
                                          readers pin a snapshot, writers
                                          commit a new one atomically —
                                          the property the reference's
                                          rename dance approximates.

The sandbox ships no iceberg-spark-runtime jar, so construction requires
an already-configured catalog (spark.sql.catalog.<name> = org.apache.
iceberg.spark.SparkCatalog + warehouse); `iceberg_available()` gates the
adapter test (skip-if-absent). Everything here is plain public Spark SQL
/ DataFrameWriterV2 API — no other dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog: str = "iceberg") -> bool:
    """True when `catalog` is a usable Iceberg catalog in this session."""
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    if not impl:
        return False
    try:
        spark.sql(f"SHOW NAMESPACES IN {catalog}").collect()
        return True
    except Exception:
        return False


class IcebergTableCatalog:
    """Same surface as sources/catalog.TableCatalog, over a real Iceberg
    catalog. Version numbers are Iceberg snapshot ids."""

    def __init__(
        self, spark: SparkSession, catalog: str = "iceberg", namespace: str = "rg"
    ):
        if not iceberg_available(spark, catalog):
            raise RuntimeError(
                f"Iceberg catalog '{catalog}' is not configured in this "
                "session (set spark.sql.catalog.* and ship the "
                "iceberg-spark-runtime jar)"
            )
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")

    def _t(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def current_version(self, name: str) -> int | None:
        # the branch ref is the authoritative current-snapshot pointer;
        # sorting snapshots by committed_at is tie-prone (ms granularity)
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self._t(name)}.refs WHERE name = 'main'"
        ).collect()
        return rows[0]["snapshot_id"] if rows else None

    def snapshots(self, name: str) -> list[dict]:
        return [
            {"version": r["snapshot_id"], "ts_ms": r["committed_at"], "mode": r["operation"]}
            for r in self.spark.sql(
                f"SELECT snapshot_id, committed_at, operation "
                f"FROM {self._t(name)}.snapshots ORDER BY committed_at"
            ).collect()
        ]

    def write(
        self,
        name: str,
        df: DataFrame,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        sort_by: list[str] | None = None,
    ) -> int:
        out = df.sortWithinPartitions(*sort_by) if sort_by else df
        w = out.writeTo(self._t(name))
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "append":
            # explicit existence check — a bare try/except around append()
            # would swallow real failures (schema mismatch, commit
            # conflict) and re-raise a misleading 'already exists'
            if self.spark.catalog.tableExists(self._t(name)):
                w.append()
            else:
                w.create()
        else:
            w.createOrReplace()
        v = self.current_version(name)
        assert v is not None
        return v

    def read(self, name: str, version: int | None = None) -> DataFrame:
        if version is None:
            return self.spark.table(self._t(name))
        return self.spark.sql(
            f"SELECT * FROM {self._t(name)} VERSION AS OF {version}"
        )

    def rollback(self, name: str, version: int) -> None:
        self.spark.sql(
            f"CALL {self.catalog}.system.rollback_to_snapshot"
            f"('{self.namespace}.{name}', {version})"
        )
