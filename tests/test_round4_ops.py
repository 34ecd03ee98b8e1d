"""Oracle parity for the round-4 operators (the new gate-window group B
entries), via the driver contract itself — same compare as the gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

from .conftest import SF_DIR, assert_frames_match

R4_NAMES = (
    "geocode_interpolate",
    "zonal_stats",
    "raster_neighborhood",
    "paragraph_dedup",
    "token_topk",
    "dedup_keep_canonical",
    "event_quantiles",
    "dedup_embedding_lsh",
)


@pytest.mark.parametrize("name", R4_NAMES)
def test_round4_entry_matches_oracle(name, spark, duck):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    assert_frames_match(fn(spark, SF_DIR), duck.sql(sql).df(), name)


def test_lsh_gate_corpus_plants_pairs(spark, duck):
    """The LSH gate entry must not be vacuous: the augmented corpus has
    one >= 0.8-cosine pair per source vector (the perturbed clone), and
    the sub-quadratic route found every one of them (the MATCH above
    proves equality with the exact all-pairs oracle)."""
    from roadgrinder_spark.operators import dedup

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = embs.count()
    got = dedup.embedding_near_dups(
        dedup.lsh_gate_corpus(embs), threshold=0.8, mode="lsh"
    ).count()
    assert got >= n, f"planted {n} clone pairs, lsh route returned {got}"


def test_sampled_quantiles_accuracy_and_mergeability(spark):
    """The hash-threshold quantile sketch: (a) approximates the exact
    per-group quantiles, (b) is mergeable — sketching two disjoint
    batches and unioning the samples equals sketching the union, because
    membership is a pure function of the row key."""
    from pyspark.sql import functions as F

    from roadgrinder_spark.operators.events import event_quantiles
    from roadgrinder_spark.operators.sketches import sampled_quantiles

    evts = spark.read.parquet(f"{SF_DIR}/events.parquet")
    approx = {r["event_type"]: r for r in sampled_quantiles(evts).collect()}
    exact = {r["event_type"]: r for r in event_quantiles(evts).collect()}
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        assert a["n_sampled"] < e["n"]
        # quantiles of a ~25% deterministic sample track the exact ones
        spread = max(1.0, e["p99"] - e["p50"])
        for col in ("p50", "p90", "p99"):
            assert abs(a[col] - e[col]) <= 0.5 * spread, (et, col, a[col], e[col])
    # mergeability: batch split by parity, union of samples == full sample
    b0 = evts.filter(F.pmod(F.col("event_id"), F.lit(2)) == 0)
    b1 = evts.filter(F.pmod(F.col("event_id"), F.lit(2)) == 1)
    from roadgrinder_spark.operators.sampling import N_BUCKETS, _bucket_col

    thr = int(round(0.25 * N_BUCKETS))
    full = evts.filter(_bucket_col("event_id") < F.lit(thr))
    merged = b0.filter(_bucket_col("event_id") < F.lit(thr)).unionByName(
        b1.filter(_bucket_col("event_id") < F.lit(thr))
    )
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_weighted_sample_bias_and_determinism(spark):
    """A-ES weighted sampling: longer docs (weight = n_chars) must be
    over-represented vs the corpus mean, and the sample is identical
    across runs (hash-derived uniforms, no RNG)."""
    from pyspark.sql import functions as F

    from roadgrinder_spark.operators.sampling import weighted_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    s1 = weighted_sample(docs, "n_chars", 100)
    mean_all = docs.agg(F.avg("n_chars")).first()[0]
    mean_s = s1.agg(F.avg("n_chars")).first()[0]
    assert mean_s > mean_all, (mean_s, mean_all)
    s2 = weighted_sample(docs, "n_chars", 100)
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
