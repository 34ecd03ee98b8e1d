"""Round-5 additions: hex-index kNN oracle parity, event_quantiles scale
routing, quantile-label endpoints, curate CLI/gate parameter sync."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

from .conftest import SF_DIR, assert_frames_match


R5_NAMES = (
    "hex_knn",
    "hex_neighborhood",
    "quadkey_tiles",
    "point_pairs_within",
    "segment_intersections",
    "doc_media_stats",
    "stream_tile_rollup",
    "adaptive_tiles",
    "assign_adaptive",
)


@pytest.mark.parametrize("name", R5_NAMES)
def test_round5_entry_matches_oracle(name, spark, duck):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    assert_frames_match(fn(spark, SF_DIR), duck.sql(sql).df(), name)


def test_intersection_gate_not_vacuous(spark):
    """The raw derived road grid has ZERO overlapping pairs, so the gate
    runs on the crossing-augmented corpus; every planted perpendicular
    clone must intersect its source (the lsh_gate_corpus discipline)."""
    from pyspark.sql import functions as F

    from roadgrinder_spark import datagen
    from roadgrinder_spark.spatial import join as sj

    roads = datagen.derive_roads(spark, SF_DIR)
    aug = sj.intersection_gate_corpus(roads)
    n_planted = aug.filter(F.col("objectid") >= 10_000_000).count()
    assert n_planted > 0
    hits = sj.segment_intersections(aug)
    # each clone's (source, clone) pair is present
    planted_pairs = hits.filter(
        (F.col("b_id") - F.col("a_id")) == 10_000_000
    ).count()
    assert planted_pairs == n_planted
    # and the raw corpus really is disjoint (documents the vacuity)
    assert sj.segment_intersections(roads).count() == 0


def test_quadkey_prefix_rollup_consistent(spark):
    """Prefix semantics: re-aggregating level-22 quadkeys by their
    level-20 prefix equals computing level-20 tiles directly — the
    property that makes quadkey strings a pyramid."""
    from pyspark.sql import functions as F

    from roadgrinder_spark import datagen
    from roadgrinder_spark.spatial import cells as sc

    pnts = datagen.derive_addrpnts(spark, SF_DIR)
    fine = sc.quadkey_tiles(pnts, level=22)
    coarse = sc.quadkey_tiles(pnts, level=20).toPandas()
    rolled = (
        fine.groupBy(F.substring("qk", 1, 20).alias("qk"))
        .agg(F.sum("n").alias("n"))
        .toPandas()
    )
    cols = ["qk", "n"]
    import pandas as pd

    pd.testing.assert_frame_equal(
        rolled[cols].sort_values(cols).reset_index(drop=True),
        coarse[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False,
    )


def test_hex_kernel_equals_expression(spark):
    """The Arrow hex-id kernel must produce bit-identical packed ids to
    the SQL-expression form at the hex_knn size (the kernel is the
    alternative join-key path; see cells.hex_pack_udf)."""
    from pyspark.sql import functions as F

    from roadgrinder_spark import datagen
    from roadgrinder_spark.spatial import cells as sc
    from roadgrinder_spark.spatial.join import HEX_KNN_SIZE

    pnts = datagen.derive_addrpnts(spark, SF_DIR)
    hq, hr = sc.hex_cell_cols("px", "py", HEX_KNN_SIZE)
    df = pnts.select(
        sc.pack_cell(hq, hr).alias("expr_id"),
        sc.hex_pack_udf(HEX_KNN_SIZE)(F.col("px"), F.col("py")).alias("udf_id"),
    )
    assert df.filter(F.col("expr_id") != F.col("udf_id")).count() == 0


def test_quantile_label_endpoints_and_range():
    from roadgrinder_spark.operators.events import quantile_label

    assert quantile_label(0.0) == "p0"
    assert quantile_label(1.0) == "p100"
    assert quantile_label(0.5) == "p50"
    assert quantile_label(0.505) == "p505"
    assert quantile_label(0.001) == "p001"
    # injective over a representative set incl. the endpoints
    ps = (0.0, 0.001, 0.01, 0.1, 0.25, 0.5, 0.505, 0.9, 0.99, 0.999, 1.0)
    labels = [quantile_label(p) for p in ps]
    assert len(set(labels)) == len(labels)
    for bad in (-0.1, 1.1, 2.0):
        with pytest.raises(ValueError):
            quantile_label(bad)


def test_event_quantiles_auto_routing(spark):
    """mode='auto' (VERDICT r4 #5): exact `percentile` under the
    per-group row bound, approx_percentile beyond it — the caller no
    longer has to read a docstring caveat. The gate entry stays exact at
    testdata scale (routing probe passes), and forcing a tiny bound
    demonstrably takes the approx path."""
    from pyspark.sql import functions as F

    from roadgrinder_spark.operators.events import (
        event_quantiles,
        route_exact_quantiles,
    )

    evts = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # testdata groups fit the default bound -> auto == exact
    assert route_exact_quantiles(evts)
    auto = event_quantiles(evts).toPandas().sort_values("event_type")
    exact = event_quantiles(evts, mode="exact").toPandas().sort_values("event_type")
    assert auto.reset_index(drop=True).equals(exact.reset_index(drop=True))
    # a "high-cardinality" group under a tiny bound routes to approx
    assert not route_exact_quantiles(evts, exact_group_rows=10)
    routed = (
        event_quantiles(evts, mode="auto", exact_group_rows=10)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    approx = (
        event_quantiles(evts, mode="approx")
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert routed.equals(approx)
    # approx tracks exact (GK sketch at accuracy 10000 on small groups)
    for col in ("p50", "p90", "p99"):
        assert (routed[col] - exact.reset_index(drop=True)[col]).abs().max() <= max(
            1.0, float(exact["p99"].max() - exact["p50"].min())
        )
    with pytest.raises(ValueError):
        event_quantiles(evts, mode="bogus")


def test_curate_cli_defaults_match_gate_params():
    """VERDICT r4 #8: the CLI `--job curate` runs curate_corpus with
    CurateConfig() defaults; pin those defaults to the oracle-gated
    dedup_keep_canonical parameters so the composed funnel always
    exercises the configuration the driver hash-checks."""
    import inspect

    from roadgrinder_spark.operators.curate import (
        GATE_DEDUP_MAX_DF,
        GATE_DEDUP_THRESHOLD,
        CurateConfig,
    )

    cfg = CurateConfig()
    assert cfg.dedup_threshold == GATE_DEDUP_THRESHOLD
    assert cfg.dedup_max_df == GATE_DEDUP_MAX_DF
    # the gate entry builds its query AND oracle from the same constants
    # (no literal drift): the oracle SQL must embed the gate threshold
    sql = entry_mod.oracle_sql()["dedup_keep_canonical"]
    assert str(GATE_DEDUP_THRESHOLD) in sql
    # and the CLI wires curate_corpus with no config override
    from roadgrinder_spark import __main__ as cli

    src = inspect.getsource(cli._run_curation_job)
    assert "curate_corpus(docs)" in src
