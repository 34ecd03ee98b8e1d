#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "flagship": {...}, "scaling": {...}}

Headline suite runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]. The scaling section runs the identical
flagship workload at local[N_LOW] and local[N_HIGH] (default 8 vs 32 — the
sandbox stand-in for N vs 4N executors; BASELINE.json north_rule wants
throughput efficiency >= 0.8) with a work multiplier so the job is
compute-bound rather than overhead-bound. Set SPARK_GRAFT_SCALING=0 to
skip the scaling section.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"
SCALE_LOW = int(os.environ.get("SPARK_GRAFT_SCALE_LOW", "8"))
SCALE_HIGH = int(os.environ.get("SPARK_GRAFT_SCALE_HIGH", "32"))
os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
WORK_MULT = int(os.environ.get("SPARK_GRAFT_WORK_MULT", "4"))


def _flagship(spark, sf_dir: str, mult: int = 1):
    """The metric workload: spatial geocode match (alias pipeline + street-
    signature join + range residual + nearest-window) over the derived
    SGID corpus; `mult` replicates points with shifted ids/coords to scale
    compute without new inputs (deterministic)."""
    from pyspark.sql import functions as F

    from roadgrinder_spark import datagen
    from roadgrinder_spark.operators import roadgrinder as rg
    from roadgrinder_spark.spatial import join as sj

    roads = datagen.derive_roads(spark, sf_dir)
    pnts = datagen.derive_addrpnts(spark, sf_dir)
    if mult > 1:
        pnts = (
            pnts.withColumn("_m", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
            .withColumn("objectid", F.col("objectid") * mult + F.col("_m"))
            .drop("_m")
        )
    gcr = rg.explode_aliases(roads).geocode_roads
    return pnts, sj.geocode_match(pnts, gcr)


def run_suite() -> dict:
    from roadgrinder_spark.session import build_session

    spark = build_session(app_name="rg-bench", master=f"local[{CPUS}]")
    from pyspark.sql import functions as F

    from roadgrinder_spark import datagen
    from roadgrinder_spark.functions import text as T
    from roadgrinder_spark.operators import dedup, events, roadgrinder as rg, vectors
    from roadgrinder_spark.spatial import join as sj

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    evts = spark.read.parquet(f"{SF_DIR}/events.parquet")
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        n = fn()
        timings[name] = round(time.time() - t0, 3)
        return n

    roads = datagen.derive_roads(spark, SF_DIR)
    pnts = datagen.derive_addrpnts(spark, SF_DIR)
    out = rg.explode_aliases(roads)

    timed("q_geocode_roads", lambda: out.geocode_roads.count())
    timed("q_altnames_roads", lambda: rg.altnames_roads(out.scratch, out.altnames_stage1).count())
    timed("q_altnames_addrpnts", lambda: rg.altnames_addrpnts(pnts).count())
    timed("q_nearest_road", lambda: sj.knn_join(pnts, roads, k=1).count())
    n_pnts = pnts.count()
    t0 = time.time()
    n_matched = sj.geocode_match(pnts, out.geocode_roads).count()
    flag_sec = time.time() - t0
    timings["q_geocode_match"] = round(flag_sec, 3)
    timed("q_dedup_text", lambda: dedup.dedup_exact(docs).count()
          + docs.select(T.token_count(F.col("text"))).count())
    timed("q_ngram_jaccard", lambda: dedup.ngram_jaccard_pairs(docs, threshold=0.25, max_df=100).count())
    timed("q_minhash_lsh", lambda: dedup.minhash_lsh_pairs(docs, threshold=0.3).count())
    timed("q_hourly_rollup", lambda: events.hourly_rollup(evts).count())
    timed("q_ann_brute", lambda: vectors.brute_force_topk(embs).count())
    spark.stop()

    return {
        "timings": timings,
        "flagship": {
            "addr_points": n_pnts,
            "matched": n_matched,
            "sec": round(flag_sec, 3),
            "matched_per_sec": round(n_matched / flag_sec, 1) if flag_sec else 0.0,
        },
    }


def run_scaling() -> dict:
    """Identical workload at two parallelism levels; efficiency =
    (thr_high / thr_low) / (cores_high / cores_low)."""
    from roadgrinder_spark.session import build_session

    results = {}
    for cores in (SCALE_LOW, SCALE_HIGH):
        spark = build_session(
            app_name=f"rg-scale-{cores}", master=f"local[{cores}]",
            shuffle_partitions=2 * cores,
        )
        pnts, match = _flagship(spark, SF_DIR, mult=WORK_MULT)
        match.count()  # warm-up: JVM JIT + codegen + parquet footer cache
        t0 = time.time()
        n = match.count()
        sec = time.time() - t0
        results[cores] = {"sec": round(sec, 3), "rows_per_sec": round(n / sec, 1), "matched": n}
        spark.stop()
    lo, hi = results[SCALE_LOW], results[SCALE_HIGH]
    eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / (SCALE_HIGH / SCALE_LOW)
    return {
        f"local{SCALE_LOW}": lo,
        f"local{SCALE_HIGH}": hi,
        "work_mult": WORK_MULT,
        "efficiency": round(eff, 3),
    }


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    suite = run_suite()
    scaling = run_scaling() if RUN_SCALING else {}
    total = round(sum(suite["timings"].values()), 3)
    out = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": suite["timings"],
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "flagship": suite["flagship"],
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
