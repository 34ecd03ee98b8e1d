"""Curation-funnel composition tests (operators/curate.py).

Each underlying operator has its own oracle gate entry; here the
COMPOSITION is verified: stage counts match independently-computed SQL
counts, the funnel is monotone, and the output corpus carries the
redacted text and deterministic split labels.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from roadgrinder_spark.functions import text as T
from roadgrinder_spark.operators.curate import CurateConfig, curate_corpus

from .conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_funnel_counts_match_sql(spark, duck):
    """With pass-through quality/language gates, the dedup stage runs on
    the full corpus — its count must equal the keep-canonical oracle's
    kept count; the quality stage count must equal the SQL predicate."""
    cfg = CurateConfig(min_tokens=0, min_quality=-1.0, langs=(),
                       dedup_threshold=0.25, dedup_max_df=100)
    res = curate_corpus(_docs(spark), cfg)
    stages = dict(res.funnel.select("stage", "rows").collect())
    n_docs = duck.sql("SELECT count(*) FROM documents").fetchone()[0]
    assert stages["input"] == n_docs
    assert stages["quality"] == n_docs
    assert stages["language"] == n_docs

    from roadgrinder_spark.operators.dedup import oracle_keep_canonical_sql

    inner = oracle_keep_canonical_sql(threshold=0.25, max_df=100)
    kept = duck.sql(
        "SELECT * FROM (WITH RECURSIVE " + inner.strip() + ") t WHERE t.kept"
    ).df()
    assert stages["dedup"] == len(kept)
    assert stages["redact_split"] == stages["dedup"]
    assert res.metrics["rows_out"] == stages["dedup"]


def test_funnel_monotone_and_output_shape(spark):
    cfg = CurateConfig(min_tokens=5, min_quality=0.2,
                       dedup_threshold=0.25, dedup_max_df=100)
    res = curate_corpus(_docs(spark), cfg)
    rows = {r["stage"]: r["rows"] for r in res.funnel.collect()}
    order = ["input", "quality", "language", "dedup", "redact_split"]
    for a, b in zip(order, order[1:]):
        assert rows[a] >= rows[b], (a, b, rows)
    out = res.corpus
    assert set(out.columns) == {"doc_id", "text_redacted", "lang_pred", "split"}
    # redaction really ran: no raw emails survive in the output text
    n_emails = out.filter(
        out.text_redacted.rlike(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    ).count()
    assert n_emails == 0
    # split labels are the configured ones and deterministic across runs
    labels = {r["split"] for r in out.select("split").distinct().collect()}
    assert labels <= set(cfg.splits)
    again = curate_corpus(_docs(spark), cfg).corpus
    assert (
        out.select("doc_id", "split").exceptAll(again.select("doc_id", "split")).count()
        == 0
    )
    # the reported redact_split count is copied from the dedup count by
    # construction (redact + split are 1:1 on the unique doc_id); pin the
    # invariant so a cardinality-changing edit to pii_redact/hash_split
    # fails loudly instead of silently misreporting (ADVICE r4)
    assert out.count() == rows["dedup"] == rows["redact_split"]


def test_cli_curate_job(spark, tmp_path):
    import contextlib
    import io
    import json

    from roadgrinder_spark.__main__ import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([
            "--sf-dir", SF_DIR, "--output", str(tmp_path / "cur"),
            "--run-id", "t", "--job", "curate", "--master", "local[4]",
        ])
    assert rc == 0
    line = [l for l in buf.getvalue().splitlines() if l.startswith("{")][-1]
    meta = json.loads(line)
    assert meta["rows"] == meta["metrics"]["rows_out"] > 0
    corpus = spark.read.parquet(meta["output"] + "/corpus")
    funnel = spark.read.parquet(meta["output"] + "/funnel")
    assert corpus.count() == meta["rows"]
    assert funnel.count() == 5


def test_resumable_curate_checkpoints(spark, tmp_path):
    """curate_corpus_resumable: unchanged (input, config) recomputes
    nothing; a deleted stage dir recomputes exactly that stage; a changed
    config invalidates all three stages."""
    import shutil

    from roadgrinder_spark.operators.curate import curate_corpus_resumable

    cfg = CurateConfig(min_tokens=0, min_quality=-1.0,
                       dedup_threshold=0.25, dedup_max_df=100)
    docs = _docs(spark)
    out = str(tmp_path / "resume")
    manifest = out + "/stages/_manifest.jsonl"

    r1 = curate_corpus_resumable(docs, out, cfg)
    n1 = sum(1 for _ in open(manifest))
    assert n1 == 3  # three stages materialized

    r2 = curate_corpus_resumable(docs, out, cfg)
    assert sum(1 for _ in open(manifest)) == n1  # nothing recomputed
    assert r2.metrics == r1.metrics

    shutil.rmtree(out + "/stages/curate_corpus")
    r3 = curate_corpus_resumable(docs, out, cfg)
    assert sum(1 for _ in open(manifest)) == n1 + 1  # only the final stage
    assert r3.metrics == r1.metrics

    cfg2 = CurateConfig(min_tokens=1, min_quality=-1.0,
                        dedup_threshold=0.25, dedup_max_df=100)
    curate_corpus_resumable(docs, out, cfg2)
    assert sum(1 for _ in open(manifest)) == n1 + 1 + 3  # full invalidation

    # per-partition lineage recorded for every stage (north-rule surface)
    import json as _json

    with open(manifest) as f:
        entries = [_json.loads(l) for l in f if l.strip()]
    assert all(e["partitions"] for e in entries)
