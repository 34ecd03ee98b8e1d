"""Pipeline: checkpoint/resume, lineage manifest, rename-on-exists
versioning, metrics."""

from __future__ import annotations

import json
import os

import pytest

from roadgrinder_spark import datagen
from roadgrinder_spark.operators import spans
from roadgrinder_spark.plans.pipeline import GrinderConfig, RoadGrinderPipeline

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    r = datagen.derive_roads(spark, SF_DIR)
    p = datagen.derive_addrpnts(spark, SF_DIR)
    return spans.pack_documents(r, p).cache()


def test_grind_end_to_end_with_resume(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("grind"))
    cfg = GrinderConfig(output_dir=out, run_id="r1")
    pipe = RoadGrinderPipeline(spark, cfg)
    pipe.create_output()
    res1 = pipe.grind(docs)
    assert res1.metrics["matched"] > 0
    assert 0 < res1.metrics["match_rate"] <= 1
    manifest = [
        json.loads(x)
        for x in open(os.path.join(out, "stages", "_manifest.jsonl"))
        if x.strip()
    ]
    stages = {m["stage"] for m in manifest}
    assert {"roads", "addrpnts", "geocode_roads", "scratch", "altnames_roads",
            "altnames_addrpnts", "matches", "nearest_road"} <= stages
    # lineage present per stage
    assert all(m["partitions"] and m["rows"] == sum(p["rows"] for p in m["partitions"])
               for m in manifest)

    # resume: rerun — stages must be read back, not recomputed (manifest
    # unchanged: no new entries appended)
    n_before = len(manifest)
    pipe2 = RoadGrinderPipeline(spark, cfg)
    res2 = pipe2.grind(docs)
    manifest2 = [
        json.loads(x)
        for x in open(os.path.join(out, "stages", "_manifest.jsonl"))
        if x.strip()
    ]
    assert len(manifest2) == n_before
    assert res2.metrics["matched"] == res1.metrics["matched"]

    # config change invalidates fingerprints -> stages recompute
    cfg3 = GrinderConfig(output_dir=out, run_id="r3", knn_radius_m=50.0)
    RoadGrinderPipeline(spark, cfg3).grind(docs)
    manifest3 = [
        json.loads(x)
        for x in open(os.path.join(out, "stages", "_manifest.jsonl"))
        if x.strip()
    ]
    assert len(manifest3) > n_before


def test_rename_on_exists_versioning(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("vers"))
    cfg = GrinderConfig(output_dir=out, run_id="a")
    pipe = RoadGrinderPipeline(spark, cfg)
    pipe.create_output()
    pipe.grind(docs)
    assert os.path.exists(os.path.join(out, "GeocodeRoads"))
    cfg2 = GrinderConfig(output_dir=out, run_id="b")
    pipe2 = RoadGrinderPipeline(spark, cfg2)
    pipe2.create_output()
    assert os.path.exists(os.path.join(out, "GeocodeRoads_replaced_b"))
    assert not os.path.exists(os.path.join(out, "GeocodeRoads"))
