#!/usr/bin/env python
"""Round-7 optimization harness (bench.py is FROZEN for measurement —
this file carries the extra instrumentation the optimization round
needs, per the guide §1):

  * isolated per-operator timing with the noop sink (guide §1.4) and
    interleaved min-of-N (the box shows episodic external CPU steal);
  * `--explain` dumps .explain("formatted") for named queries into
    plans/r07/<name>_<tag>.txt (the judge checks plan claims there);
  * `--streams` times the streaming drains next to a ZERO-ROW drain
    control so stream-machinery setup cost is measured separately from
    per-row cost (VERDICT r6 #5).

Usage:
  python bench_extra.py --probe q_bfs_hops,q_span_dedup [--rounds 3]
  python bench_extra.py --explain q_span_dedup --tag before
  python bench_extra.py --streams
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
os.environ.setdefault("SPARK_OFFHEAP_MEM", "24g")
PLANS_DIR = Path(__file__).resolve().parent / "plans" / "r07"


def _session():
    from roadgrinder_spark.session import build_session

    return build_session(app_name="rg-bench-extra", master=f"local[{CPUS}]")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _materialized_inputs(spark):
    """Same discipline as bench.py run_suite: derived relations
    materialized once, probes read parquet-backed tables."""
    import shutil  # noqa: F401
    import tempfile

    from roadgrinder_spark import datagen

    mat = tempfile.mkdtemp(prefix="rg_bx_inputs_")
    t0 = time.time()
    datagen.derive_roads(spark, SF_DIR).write.mode("overwrite").parquet(f"{mat}/roads")
    datagen.derive_addrpnts(spark, SF_DIR).write.mode("overwrite").parquet(f"{mat}/pnts")
    derive_sec = round(time.time() - t0, 3)
    return mat, derive_sec


def _build_probes(spark, mat):
    """The bench.py headline probes, re-declared against the same
    materialized inputs, as (name -> DataFrame-or-callable). DataFrames
    run through the noop sink; callables (streaming drains, multi-action
    loops) are invoked as-is."""
    from pyspark.sql import functions as F

    from roadgrinder_spark import datagen
    from roadgrinder_spark.functions import text as T
    from roadgrinder_spark.operators import (
        dedup,
        events,
        roadgrinder as rg,
        sampling,
        sketches,
        spans as sp_ops,
        vectors,
    )
    from roadgrinder_spark.spatial import (
        hotspot as hsp,
        join as sj,
        network as nwk,
        pip as spip,
        pointpattern as ppt,
        raster as sra,
        trajectory as tj,
    )
    from roadgrinder_spark.streaming import gate as sgate

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    evts = spark.read.parquet(f"{SF_DIR}/events.parquet")
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    roads = spark.read.parquet(f"{mat}/roads")
    pnts = spark.read.parquet(f"{mat}/pnts")
    out = rg.explode_aliases(roads)
    pings = tj.derive_pings(spark, SF_DIR)
    ping_raster = (
        pings.selectExpr(
            "CAST(FLOOR(px / 125.0) AS BIGINT) AS cx",
            "CAST(FLOOR(py / 125.0) AS BIGINT) AS cy",
        ).groupBy("cx", "cy").count().withColumnRenamed("count", "n")
    )

    p = {
        "q_geocode_match": lambda: sj.geocode_match(pnts, out.geocode_roads),
        "q_geocode_roads": lambda: out.geocode_roads,
        "q_altnames_roads": lambda: rg.altnames_roads(out.scratch, out.altnames_stage1),
        "q_altnames_addrpnts": lambda: rg.altnames_addrpnts(pnts),
        "q_nearest_road": lambda: sj.knn_join(pnts, roads, k=1),
        "q_hex_knn": lambda: sj.hex_knn(pnts, roads, k=1),
        "q_ngram_jaccard": lambda: dedup.ngram_jaccard_pairs(docs, threshold=0.25, max_df=100),
        "q_dedup_clusters": lambda: dedup.dedup_clusters(docs, threshold=0.25, max_df=100),
        "q_minhash_lsh": lambda: dedup.minhash_lsh_pairs(docs, threshold=0.3),
        "q_dedup_embedding": lambda: dedup.embedding_near_dups(embs),
        "q_pii_redact": lambda: T.pii_redact(docs),
        "q_text_embed": lambda: T.hashed_ngram_embedding(docs),
        "q_contamination": lambda: dedup.contamination_check(
            docs, docs.filter(F.col("doc_id") % 97 == 0)
        ),
        "q_tfidf_topk": lambda: T.tfidf_topk_terms(docs, k=5),
        "q_route_snap": lambda: tj.route_snap(pings, roads),
        "q_rasterize_segments": lambda: sra.rasterize_segments(roads),
        "q_orphan_points": lambda: sj.orphan_points(pnts, roads),
        "q_dwell_detect": lambda: tj.dwell_detect(pings),
        "q_od_matrix": lambda: tj.od_matrix(pings),
        "q_colocation": lambda: tj.colocation_pairs(pings),
        "q_kde_heatmap": lambda: sra.kde_heatmap(sra.rasterize_points(pnts)),
        "q_span_media_align": lambda: sp_ops.span_media_align(
            sp_ops.pack_documents(roads, pnts)
        ),
        "q_zonal_stats": lambda: spip.zonal_stats(pnts, spip.derive_zones(spark, SF_DIR)),
        "q_raster_neighborhood": lambda: sra.raster_neighborhood(
            sra.rasterize_points(pnts)
        ),
        "q_route_match_hmm": lambda: tj.route_match_hmm(pings, roads),
        "q_span_dedup": lambda: dedup.duplicate_spans(docs),
        "q_hotspot_gi": lambda: hsp.gi_star(sra.rasterize_points(pnts)),
        "q_morans_i": lambda: hsp.morans_i(sra.rasterize_points(pnts)),
        "q_ripley_k": lambda: ppt.ripley_k(pnts),
        "q_g_function": lambda: ppt.g_function(pnts),
        "q_knox": lambda: ppt.knox(pings),
        "q_bivariate_moran": lambda: hsp.bivariate_moran(
            sra.rasterize_points(pnts), ping_raster
        ),
        "q_join_counts": lambda: hsp.join_counts(sra.rasterize_points(pnts)),
        "q_areal_interp": lambda: spip.areal_interp(
            sra.rasterize_points(pnts), spip.derive_zones(spark, SF_DIR)
        ),
        "q_sessionize": lambda: events.sessionize(evts),
        "q_event_quantiles": lambda: events.event_quantiles(evts),
        "q_paragraph_dedup": lambda: T.paragraph_dedup(docs),
        "q_token_topk": lambda: T.token_topk(docs, k=50),
        "q_bm25_topk": lambda: T.bm25_topk_docs(docs, list(T.GATE_BM25_TERMS), k=20),
        "q_mixture_resample": lambda: sampling.mixture_resample(
            docs.select("doc_id", "source"), "source",
            {"src0": 0.02, "src1": 0.002, "src2": 0.05},
        ),
        "q_spatial_block_split": lambda: sampling.spatial_block_split(pnts),
        "q_kmv_distinct": lambda: sketches.kmv_distinct(docs, "text", k=256),
        "q_asof_join": lambda: events.asof_join(evts),
        "q_ann_brute": lambda: vectors.brute_force_topk(embs),
        # multi-action probes: time the whole callable (parquet-barrier
        # loops / streaming drains can't run through one noop sink)
        "q_bfs_hops": lambda: nwk.bfs_hops(roads).count(),
        "q_network_distance": lambda: nwk.network_distance(roads).count(),
        "q_stream_geocode": lambda: sgate.drained_geocode_match(spark, SF_DIR).count(),
        "q_stream_interval_join": lambda: sgate.drained_interval_join(spark, SF_DIR).count(),
    }
    return p


def run_probes(names: list[str], rounds: int) -> None:
    spark = _session()
    mat, derive_sec = _materialized_inputs(spark)
    probes = _build_probes(spark, mat)
    from pyspark.sql import DataFrame

    bad = [n for n in names if n not in probes]
    if bad:
        raise SystemExit(f"unknown probes: {bad}; known: {sorted(probes)}")
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(rounds):
        for n in names:
            spark.sparkContext.setJobDescription(f"bx:{n}")
            t0 = time.time()
            r = probes[n]()
            if isinstance(r, DataFrame):
                _noop(r)
            samples[n].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {
        "sf_dir": SF_DIR,
        "derive_sec": derive_sec,
        "min": {n: min(s) for n, s in samples.items()},
        "samples": samples,
    }
    print(json.dumps(out))
    import shutil

    spark.stop()
    shutil.rmtree(mat, ignore_errors=True)


def dump_explains(names: list[str], tag: str) -> None:
    spark = _session()
    mat, _ = _materialized_inputs(spark)
    probes = _build_probes(spark, mat)
    from pyspark.sql import DataFrame

    PLANS_DIR.mkdir(parents=True, exist_ok=True)
    for n in names:
        r = probes[n]()
        if not isinstance(r, DataFrame):
            print(f"{n}: multi-action probe, no single plan; skipped")
            continue
        txt = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            r._jdf.queryExecution(), "formatted"
        )
        path = PLANS_DIR / f"{n}_{tag}.txt"
        path.write_text(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")
    import shutil

    spark.stop()
    shutil.rmtree(mat, ignore_errors=True)


def run_streams(rounds: int) -> None:
    """Streaming drains next to a zero-row drain control (VERDICT r6 #5):
    the control stages an EMPTY source of the identical schema and runs
    the same availableNow machinery, so `setup` isolates checkpoint +
    stream-start cost and (drain - setup) is the data cost."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from roadgrinder_spark.streaming import gate as sgate
    from roadgrinder_spark.streaming.rollup import (
        EVENTS_STREAM_SCHEMA,
        run_available_now,
    )

    spark = _session()
    out: dict[str, dict] = {}

    def best(fn):
        b = float("inf")
        for _ in range(rounds):
            t0 = time.time()
            fn()
            b = min(b, time.time() - t0)
        return round(b, 3)

    # zero-row stream-stream interval-join drain (same plan, empty src)
    def zero_ij():
        d = tempfile.mkdtemp(prefix="rg_bx_zij_")
        try:
            src = os.path.join(d, "src")
            spark.createDataFrame([], EVENTS_STREAM_SCHEMA).write.parquet(src)

            def side(et, pre):
                return (
                    spark.readStream.schema(EVENTS_STREAM_SCHEMA)
                    .parquet(src)
                    .filter(F.col("event_type") == et)
                    .select(
                        F.col("event_id").alias(f"{pre}_id"),
                        F.col("user_id").alias(f"{pre}_user"),
                        F.col("ts").alias(f"{pre}_ts"),
                    )
                    .withWatermark(f"{pre}_ts", "4 hours")
                )

            j = side("purchase", "l").join(
                side("click", "r"),
                (F.col("l_user") == F.col("r_user"))
                & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 1 HOUR"))
                & (F.col("r_ts") <= F.col("l_ts")),
                "inner",
            )
            run_available_now(j.select("l_id", "r_id"), query_name="bx_zij")
        finally:
            shutil.rmtree(d, ignore_errors=True)

    out["interval_join"] = {
        "setup_zero_row": best(zero_ij),
        "drain": best(lambda: sgate.drained_interval_join(spark, SF_DIR).count()),
    }
    out["geocode"] = {
        "drain": best(lambda: sgate.drained_geocode_match(spark, SF_DIR).count()),
    }
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", help="comma-separated probe names")
    ap.add_argument("--explain", help="comma-separated probe names")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--streams", action="store_true")
    a = ap.parse_args()
    if a.probe:
        run_probes(a.probe.split(","), a.rounds)
    elif a.explain:
        dump_explains(a.explain.split(","), a.tag)
    elif a.streams:
        run_streams(a.rounds)
    else:
        ap.print_help()


if __name__ == "__main__":
    main()
