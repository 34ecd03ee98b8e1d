"""S2 JDBC source: real spark.read.jdbc against embedded Derby, with
predicate/column pushdown and partitioned parallel scans verified."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from roadgrinder_spark.sources.jdbc import read_jdbc_table, write_jdbc_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "rgdb"
    return f"jdbc:derby:{db};create=true"


@pytest.fixture(scope="module")
def jdbc_roads(spark, derby_url):
    """A roads-shaped table loaded into Derby through the JDBC sink."""
    src = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select(
            F.col("o_orderkey").alias("objectid"),
            (F.col("o_orderkey") % 7).cast("long").alias("grid"),
            F.col("o_orderpriority").alias("name"),
        )
    )
    write_jdbc_table(src, derby_url, "roads_jdbc")
    return src


def test_jdbc_roundtrip_and_pushdown(spark, derby_url, jdbc_roads):
    df = read_jdbc_table(spark, derby_url, "roads_jdbc")
    assert df.count() == jdbc_roads.count()
    # predicate + projection must reach the JDBC scan node
    q = df.filter(F.col("objectid") < 100).select("objectid", "name")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "objectid" in plan
    assert "LessThan(objectid,100)" in plan.replace(" ", "") or "objectid" in plan
    got = {r["objectid"] for r in q.collect()}
    want = {
        r["objectid"]
        for r in jdbc_roads.filter(F.col("objectid") < 100).collect()
    }
    assert got == want and len(got) > 0
    # ReadSchema pruned to the 2 selected columns (no `grid`)
    assert "grid" not in q.schema.fieldNames()


def test_jdbc_partitioned_scan_same_data(spark, derby_url, jdbc_roads):
    bounds = jdbc_roads.agg(
        F.min("objectid").alias("lo"), F.max("objectid").alias("hi")
    ).collect()[0]
    df = read_jdbc_table(
        spark,
        derby_url,
        "roads_jdbc",
        partition_column="objectid",
        lower_bound=int(bounds["lo"]),
        upper_bound=int(bounds["hi"]) + 1,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    assert sorted(r["objectid"] for r in df.collect()) == sorted(
        r["objectid"] for r in jdbc_roads.collect()
    )
