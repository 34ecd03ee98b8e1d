"""Physical-plan evidence tests: the optimizer properties the scale
design relies on (SURVEY §2 P1, README scale notes) asserted directly —
filters reach the parquet scan, projection prunes the read schema, and
hot-path column expressions stay inside whole-stage codegen."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_DIR


def _plan(df, mode="simple") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_parquet_filter_pushdown(spark):
    # other modules cache these tables; a cached read resolves to
    # InMemoryRelation and has no scan node to push into
    spark.catalog.clearCache()
    df = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter((F.col("user_id") == 7) & (F.col("value") > 10.0))
        .select("event_id")
    )
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "EqualTo(user_id,7)" in plan
    assert "GreaterThan(value,10.0)" in plan


def test_parquet_column_pruning(spark):
    spark.catalog.clearCache()
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "source")
    plan = _plan(df)
    seg = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "doc_id" in seg and "source" in seg
    # the wide text column must NOT be read for a 2-column projection
    assert "text" not in seg


def test_hot_path_stays_in_codegen(spark):
    """The flagship candidate pipeline (signature join + dist2 + min
    aggregate) compiles into whole-stage codegen spans — no per-row
    Python, no interpreted projections in the hot path."""
    from roadgrinder_spark import datagen
    from roadgrinder_spark.operators import roadgrinder as rg
    from roadgrinder_spark.spatial import join as sj

    pnts = datagen.derive_addrpnts(spark, SF_DIR)
    gcr = rg.explode_aliases(datagen.derive_roads(spark, SF_DIR)).geocode_roads
    # AQE wraps the tree in AdaptiveSparkPlan and defers codegen insertion
    # to execution; disable it for the inspection so the compiled spans
    # are visible in the static plan
    prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(sj.geocode_match(pnts, gcr))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prior)
    assert "*(" in plan  # whole-stage-codegen span marker (simple mode)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_topk_uses_take_ordered(spark):
    """Global top-k compiles to TakeOrderedAndProject (per-partition
    partial top-k), never a full global sort exchange."""
    from roadgrinder_spark.functions.text import token_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(token_topk(docs, k=10))
    assert "TakeOrderedAndProject" in plan
