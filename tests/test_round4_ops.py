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
