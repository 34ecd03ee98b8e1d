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


def test_spark_submit_py_files_launch(tmp_path):
    """North-star launch mode: a REAL `spark-submit --py-files <zip>` run
    of the packaged pipeline in a separate JVM/process — not the test
    session. Smoke-level: the run completes, prints the one-line JSON
    metrics summary, and writes the stage manifest."""
    import json
    import os
    import shutil
    import subprocess
    import sys

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pytest

        pytest.skip("spark-submit not on PATH")
    from roadgrinder_spark.session import build_pyfiles_zip

    zip_path = str(tmp_path / "roadgrinder_spark.zip")
    build_pyfiles_zip(zip_path)
    launcher = tmp_path / "launch.py"
    launcher.write_text(
        "from roadgrinder_spark.__main__ import main\n"
        "import sys\nsys.exit(main(sys.argv[1:]))\n"
    )
    out_dir = str(tmp_path / "out")
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    proc = subprocess.run(
        [
            spark_submit, "--master", "local[4]", "--py-files", zip_path,
            str(launcher),
            "--sf-dir", "/root/testdata/sf0.001",
            "--output", out_dir, "--run-id", "smoke",
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    json_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    assert json_lines, proc.stdout[-2000:]
    summary = json.loads(json_lines[-1])
    assert summary["metrics"]["matched"] > 0
    assert summary["metrics"]["match_rate"] > 0
    assert os.path.isdir(out_dir)


def test_cli_curation_jobs(spark, tmp_path):
    """--job subcommands: each reads the documents table, writes parquet,
    and reports rows (the CLI face of the curation operators)."""
    import contextlib
    import io
    import json

    from roadgrinder_spark.__main__ import main

    for job, check in (
        ("hash_split", lambda df: set(df.columns) >= {"doc_id", "split"}),
        ("pii_redact", lambda df: "text_redacted" in df.columns),
        ("dedup_clusters", lambda df: "is_keeper" in df.columns),
        ("keep_canonical", lambda df: {"canonical_id", "kept"} <= set(df.columns)),
        ("paragraph_dedup", lambda df: "shared_frac" in df.columns),
        ("token_topk", lambda df: {"tok", "n", "rank"} <= set(df.columns)),
        ("zonal_stats", lambda df: {"zone_id", "centroid_x"} <= set(df.columns)),
    ):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main([
                "--sf-dir", "/root/testdata/sf0.001",
                "--output", str(tmp_path / "cli"), "--run-id", "t",
                "--job", job, "--master", "local[4]",
            ])
        assert rc == 0
        line = [l for l in buf.getvalue().splitlines() if l.startswith("{")][-1]
        meta = json.loads(line)
        assert meta["rows"] > 0
        out = spark.read.parquet(meta["output"])
        assert check(out)
