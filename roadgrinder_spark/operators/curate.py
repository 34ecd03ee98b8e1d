"""End-to-end corpus curation funnel — the composed pipeline a training-
data team actually runs, built entirely from the individually
oracle-checked operators:

  input → quality gate (token count + quality score) → language gate →
  near-dup removal (keep-canonical) → PII redaction → split assignment

Each stage is a pure DataFrame transform; the funnel report records rows
in/out per stage (the curation yield dashboard). Every underlying
operator has its own DuckDB-oracle gate entry; this module is their
composition and is pytest-verified stage-by-stage (tests/test_curate.py)
rather than re-oracled as a monolith.

Scale: the filters are JVM column arithmetic (no shuffle); dedup is the
dominant cost (see operators/dedup.py scale notes); redaction and split
are narrow maps. The funnel therefore inherits the dedup scale path and
adds nothing quadratic.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from .dedup import dedup_keep_canonical
from .sampling import hash_split


#: the oracle-gated dedup configuration — the __spark_entry__
#: `dedup_keep_canonical` gate entry runs dedup_keep_canonical with
#: exactly these values, so the CLI/default funnel exercises the same
#: configuration the driver hash-checks every round (VERDICT r4 #8:
#: pin CLI defaults to the gate params; tests/test_curate.py enforces).
GATE_DEDUP_THRESHOLD = 0.25
GATE_DEDUP_MAX_DF = 100


@dataclass
class CurateConfig:
    min_tokens: int = 5
    min_quality: float = 0.2
    langs: tuple[str, ...] = ()          # empty = keep all languages
    dedup_threshold: float = GATE_DEDUP_THRESHOLD
    dedup_max_df: int = GATE_DEDUP_MAX_DF
    splits: dict[str, float] = field(
        default_factory=lambda: {"train": 0.98, "val": 0.01, "test": 0.01}
    )


@dataclass
class CurateResult:
    corpus: DataFrame            # doc_id, text_redacted, lang_pred, split
    funnel: DataFrame            # stage, stage_idx, rows
    metrics: dict


def _score_and_filter(docs: DataFrame, cfg: CurateConfig):
    """The quality/language gate shared by BOTH funnel variants (review
    r4: the resumable path re-implemented it and the two could drift).
    Returns (scored, q_pred, l_pred, lp): the scored frame, the two gate
    predicates (for single-pass conditional counting), and the filtered
    frame carrying lang_pred."""
    scored = docs.withColumn("n_tokens", T.token_count(F.col("text"))).withColumn(
        "quality", T.quality_score(F.col("text"))
    )
    q_pred = (F.col("n_tokens") >= cfg.min_tokens) & (
        F.col("quality") >= cfg.min_quality
    )
    lang_col = T.lang_id(F.col("text"))
    l_pred = q_pred & (
        lang_col.isin(*cfg.langs) if cfg.langs else F.lit(True)
    )
    lp = scored.filter(q_pred).withColumn("lang_pred", T.lang_id(F.col("text")))
    if cfg.langs:
        lp = lp.filter(F.col("lang_pred").isin(*cfg.langs))
    return scored, q_pred, l_pred, lp


def curate_corpus(docs: DataFrame, cfg: CurateConfig | None = None) -> CurateResult:
    """Run the full funnel. The input/quality/language counts come from
    ONE conditional-aggregation pass over the scored corpus (review r4:
    per-stage count() actions each re-ran the scoring regexes over the
    whole corpus); the redact/split stage is a 1:1 map of the dedup
    survivors, so its count is the dedup count by construction. The
    surviving corpus is returned as a lazy frame over the final plan."""
    cfg = cfg or CurateConfig()
    spark = docs.sparkSession

    scored, q_pred, l_pred, lp = _score_and_filter(docs, cfg)
    counts = scored.agg(
        F.count(F.lit(1)).alias("n_in"),
        F.sum(q_pred.cast("long")).alias("n_q"),
        F.sum(l_pred.cast("long")).alias("n_l"),
    ).collect()[0]
    stages: list[tuple[str, int]] = [
        ("input", counts["n_in"] or 0),
        ("quality", counts["n_q"] or 0),
        ("language", counts["n_l"] or 0),
    ]

    # near-dup removal over the SURVIVING docs (dedup after cheap filters:
    # the quadratic-candidate stage sees the smallest possible corpus)
    keep = dedup_keep_canonical(
        lp, threshold=cfg.dedup_threshold, max_df=cfg.dedup_max_df
    ).filter(F.col("kept"))
    dd = lp.join(keep.select("doc_id"), "doc_id")
    stages.append(("dedup", dd.count()))

    red = T.pii_redact(dd)
    out = (
        hash_split(red.select("doc_id"), weights=cfg.splits)
        .join(red, "doc_id")
        .join(lp.select("doc_id", "lang_pred"), "doc_id")
        .select("doc_id", "text_redacted", "lang_pred", "split")
    )
    # redaction + split are 1:1 inner joins on the unique doc_id, so the
    # final count equals the dedup count structurally — counting it again
    # would re-run the 8-regex redaction chain for an identical number
    stages.append(("redact_split", stages[-1][1]))

    funnel = spark.createDataFrame(
        [(name, i, int(n)) for i, (name, n) in enumerate(stages)],
        "stage string, stage_idx int, rows long",
    )
    n_in, n_out = stages[0][1], stages[-1][1]
    metrics = {
        "rows_in": n_in,
        "rows_out": n_out,
        "yield": round(n_out / n_in, 6) if n_in else None,
        "stages": {name: int(n) for name, n in stages},
    }
    return CurateResult(corpus=out, funnel=funnel, metrics=metrics)


def curate_corpus_resumable(
    docs: DataFrame, output_dir: str, cfg: CurateConfig | None = None
) -> CurateResult:
    """Checkpoint-resumable form of the funnel (north rule: "every stage
    checkpoint-resumable with per-partition lineage + metrics"): each
    stage materializes to parquet under `output_dir`/stages with a
    fingerprint covering the config AND the input plan digest, via the
    same CheckpointManager the grinder pipeline uses. A re-run with an
    unchanged (input, config) recomputes NOTHING — stages read back from
    parquet; a changed config or input invalidates every stage."""
    import hashlib
    import json
    import os

    from ..plans.pipeline import CheckpointManager, _input_digest

    cfg = cfg or CurateConfig()
    spark = docs.sparkSession
    ck = CheckpointManager(spark, os.path.join(output_dir, "stages"))
    inp = _input_digest(docs)

    def fp(stage: str) -> str:
        payload = json.dumps(
            {
                "stage": stage,
                "min_tokens": cfg.min_tokens,
                "min_quality": cfg.min_quality,
                "langs": list(cfg.langs),
                "thr": cfg.dedup_threshold,
                "max_df": cfg.dedup_max_df,
                "splits": cfg.splits,
                "inp": inp,
            },
            sort_keys=True,
        )
        return hashlib.md5(payload.encode()).hexdigest()[:16]

    filtered = ck.stage(
        "curate_filtered",
        fp("filtered"),
        lambda: _score_and_filter(docs, cfg)[3],
    )
    keep = ck.stage(
        "curate_keep",
        fp("keep"),
        lambda: dedup_keep_canonical(
            filtered, threshold=cfg.dedup_threshold, max_df=cfg.dedup_max_df
        ).filter(F.col("kept")),
    )

    def _corpus() -> DataFrame:
        dd = filtered.join(keep.select("doc_id"), "doc_id")
        red = T.pii_redact(dd)
        return (
            hash_split(red.select("doc_id"), weights=cfg.splits)
            .join(red, "doc_id")
            .join(dd.select("doc_id", "lang_pred"), "doc_id")
            .select("doc_id", "text_redacted", "lang_pred", "split")
        )

    corpus = ck.stage("curate_corpus", fp("corpus"), _corpus)

    n_in = docs.count()
    manifest = ck._manifest()
    stages = [
        ("input", n_in),
        ("filtered", manifest["curate_filtered"]["rows"]),
        ("dedup", manifest["curate_keep"]["rows"]),
        ("corpus", manifest["curate_corpus"]["rows"]),
    ]
    funnel = spark.createDataFrame(
        [(name, i, int(n)) for i, (name, n) in enumerate(stages)],
        "stage string, stage_idx int, rows long",
    )
    n_out = stages[-1][1]
    return CurateResult(
        corpus=corpus,
        funnel=funnel,
        metrics={
            "rows_in": n_in,
            "rows_out": int(n_out),
            "yield": round(n_out / n_in, 6) if n_in else None,
            "stages": {name: int(n) for name, n in stages},
        },
    )
