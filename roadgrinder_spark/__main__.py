"""spark-submit entrypoint (north_star: "launched via spark-submit
--py-files").

Usage (local dev also works with plain `python -m roadgrinder_spark`):

  spark-submit --py-files roadgrinder_spark.zip \
      -m roadgrinder_spark ... # or path to this file
  python -m roadgrinder_spark --sf-dir /root/testdata/sf0.001 \
      --output /tmp/rg_out --run-id r1 [--cell-size 125] [--radius 100] \
      [--salt-threshold N] [--strict-acs] [--job pipeline]

--job pipeline (default): derive (or read) the span-document substrate →
full grinder pipeline with checkpointed stages → one-line JSON metrics
summary (match rate, throughput, per-stage manifest path).

Curation jobs over a documents parquet (--documents or the sf-dir
documents table), each writing parquet under --output and printing a
one-line JSON row-count summary:
  --job dedup_clusters   near-dup clusters (keep-one-per-cluster)
  --job keep_canonical   per-doc retention decision (the deduped corpus)
  --job hash_split       deterministic train/val/test assignment
  --job pii_redact       email/SSN/IP/phone scrubbing
  --job quality          token/lang/quality + repetition signals
  --job paragraph_dedup  cross-doc shared-paragraph fractions
  --job token_topk       exact global heavy-hitter tokens
  --job zonal_stats      per-zone point count/centroid/extent (spatial;
                         reads the sf-dir tables, not --documents)
  --job curate           full curation funnel (quality → language →
                         dedup → redact → split) + per-stage yield report
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="roadgrinder_spark")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                   help="testdata dir to derive the document substrate from")
    p.add_argument("--documents", default=None,
                   help="parquet path of an existing span-document table "
                        "(overrides --sf-dir derivation)")
    p.add_argument("--output", required=True, help="output/checkpoint dir")
    p.add_argument("--run-id", default="run0")
    p.add_argument("--cell-size", type=float, default=125.0)
    p.add_argument("--radius", type=float, default=100.0)
    p.add_argument("--geocode-radius", type=float, default=200.0)
    p.add_argument("--salt-threshold", type=int, default=None)
    p.add_argument("--strict-acs", action="store_true")
    p.add_argument("--master", default=None,
                   help="override master (default: SPARK_GRAFT_CPUS local)")
    p.add_argument("--job", default="pipeline",
                   choices=["pipeline", "dedup_clusters", "keep_canonical",
                            "hash_split", "pii_redact", "quality",
                            "paragraph_dedup", "token_topk", "zonal_stats",
                            "curate"])
    args = p.parse_args(argv)

    from .plans.pipeline import GrinderConfig, RoadGrinderPipeline
    from .session import build_session

    from pyspark.sql import SparkSession

    # embedding main() programmatically (tests, notebooks) must not kill
    # a session the caller owns — getOrCreate reuses the active one
    owns_session = SparkSession.getActiveSession() is None
    spark = build_session(app_name=f"roadgrinder-{args.run_id}", master=args.master)
    try:
        if args.job != "pipeline":
            return _run_curation_job(spark, args)
        if args.documents:
            docs = spark.read.parquet(args.documents)
        else:
            from .datagen import derive_addrpnts, derive_roads
            from .operators.spans import pack_documents

            docs = pack_documents(
                derive_roads(spark, args.sf_dir), derive_addrpnts(spark, args.sf_dir)
            )
        cfg = GrinderConfig(
            output_dir=args.output,
            run_id=args.run_id,
            cell_size_m=args.cell_size,
            knn_radius_m=args.radius,
            geocode_radius_m=args.geocode_radius,
            salt_threshold=args.salt_threshold,
            strict_acs=args.strict_acs,
        )
        pipe = RoadGrinderPipeline(spark, cfg)
        pipe.create_output()
        res = pipe.grind(docs)
        print(json.dumps({"run_id": args.run_id, "output": args.output,
                          "metrics": res.metrics}))
        return 0
    finally:
        if owns_session:
            spark.stop()


def _run_curation_job(spark, args) -> int:
    """Curation jobs: read the documents table, run one operator, write
    parquet, print a one-line JSON summary."""
    from pyspark.sql import functions as F

    if args.job == "zonal_stats":
        # spatial-only job: never resolve the documents parquet (sf dirs
        # carrying only the spatial tables must work); falls through to
        # the shared write/count/summary epilogue below
        from .datagen import derive_addrpnts
        from .spatial.pip import derive_zones, zonal_stats

        out = zonal_stats(
            derive_addrpnts(spark, args.sf_dir), derive_zones(spark, args.sf_dir)
        )
        return _write_job_output(spark, args, out)
    src = args.documents or f"{args.sf_dir}/documents.parquet"
    docs = spark.read.parquet(src)
    if args.job == "curate":
        from .operators.curate import curate_corpus

        res = curate_corpus(docs)
        dest = f"{args.output}/curate"
        res.corpus.write.mode("overwrite").parquet(f"{dest}/corpus")
        res.funnel.write.mode("overwrite").parquet(f"{dest}/funnel")
        n = spark.read.parquet(f"{dest}/corpus").count()
        print(json.dumps({"run_id": args.run_id, "job": "curate",
                          "output": dest, "rows": n,
                          "metrics": res.metrics}))
        return 0
    if args.job == "dedup_clusters":
        from .operators.dedup import dedup_clusters

        out = dedup_clusters(docs, threshold=0.5, max_df=1000)
    elif args.job == "keep_canonical":
        from .operators.dedup import dedup_keep_canonical

        out = dedup_keep_canonical(docs, threshold=0.5, max_df=1000)
    elif args.job == "paragraph_dedup":
        from .functions.text import paragraph_dedup

        out = paragraph_dedup(docs)
    elif args.job == "token_topk":
        from .functions.text import token_topk

        out = token_topk(docs, k=100)
    elif args.job == "hash_split":
        from .operators.sampling import hash_split

        out = hash_split(docs)
    elif args.job == "pii_redact":
        from .functions.text import pii_redact

        out = pii_redact(docs)
    else:  # quality
        from .functions import text as T

        stats = docs.select(
            "doc_id",
            T.token_count(F.col("text")).alias("n_tokens"),
            T.lang_id(F.col("text")).alias("lang_pred"),
            F.round(T.quality_score(F.col("text")), 6).alias("quality"),
        )
        out = stats.join(T.repetition_stats(docs), "doc_id")
    return _write_job_output(spark, args, out)


def _write_job_output(spark, args, out) -> int:
    """Shared job epilogue: write parquet, count, one-line JSON summary."""
    dest = f"{args.output}/{args.job}"
    out.write.mode("overwrite").parquet(dest)
    n = spark.read.parquet(dest).count()
    print(json.dumps({"run_id": args.run_id, "job": args.job,
                      "output": dest, "rows": n}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
