"""JDBC source adapter (SURVEY.md §2 S2).

The reference streams SQL Server rows through Dapper one connection at a
time (RoadGrinder/commands/PopulateAltNamesAddrPntsTableCommand.cs:43-50;
connection setup at grinders/AlternateNamesGrinder.cs:39-41). The engine's
equivalent is `spark.read.jdbc` — declarative, so Catalyst pushes filters
and column pruning INTO the generated SQL (PushedFilters in the scan
node), and `partition_column` bounds turn the single streamed cursor into
`num_partitions` parallel range queries — the distributed upgrade of the
reference's single-reader loop.

Scale notes: always pass partitioning for big tables; without it the scan
is one executor-side cursor exactly like the reference. Predicate pushdown
means a `WHERE` lands server-side — at 100 TB the database does the
filtering, not the cluster. Tested against embedded Apache Derby (the only
JDBC engine in this container); the call shape is identical for SQL
Server/Postgres — only url/driver change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: driver class per url scheme — extend as deployments need
_DRIVERS = {
    "jdbc:derby": "org.apache.derby.jdbc.EmbeddedDriver",
    "jdbc:sqlserver": "com.microsoft.sqlserver.jdbc.SQLServerDriver",
    "jdbc:postgresql": "org.postgresql.Driver",
}


def _driver_for(url: str) -> str | None:
    for prefix, cls in _DRIVERS.items():
        if url.startswith(prefix):
            return cls
    return None


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    driver: str | None = None,
    **options: str,
) -> DataFrame:
    """DataFrame over a JDBC table, with optional parallel range scan.

    With partition_column/bounds set, Spark issues num_partitions
    concurrent `WHERE col >= lo AND col < hi` range queries. Filters and
    projections applied to the returned DataFrame push down into the
    remote SQL (verify via PushedFilters in `.explain`).
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    drv = driver or _driver_for(url)
    if drv:
        reader = reader.option("driver", drv)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for key, val in options.items():
        reader = reader.option(key, val)
    return reader.load()


def write_jdbc_table(
    df: DataFrame, url: str, table: str, mode: str = "overwrite",
    driver: str | None = None,
) -> None:
    """Counterpart sink (test fixture + S7/S8-style insert over JDBC)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    drv = driver or _driver_for(url)
    if drv:
        writer = writer.option("driver", drv)
    writer.mode(mode).save()
