"""Distributed connected components (operators/graph.py) and the round-3
routing of dedup_clusters / threshold_regions through it."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from roadgrinder_spark.operators import dedup
from roadgrinder_spark.operators.graph import connected_components, union_find_min

from .conftest import SF_DIR


def _expected(edges):
    # every node in the raw edge list appears — self-loop-only nodes as
    # singleton components (the connected_components contract)
    m = union_find_min(edges)
    nodes = {n for a, b in edges for n in (a, b)}
    return {n: m.get(n, n) for n in nodes}


def test_cc_matches_union_find_random_graph(spark):
    random.seed(11)
    edges = [(random.randrange(2000), random.randrange(2000)) for _ in range(1500)]
    e = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["component"] for r in connected_components(e).collect()}
    assert got == _expected(edges)


def test_cc_forced_recursion_still_exact(spark):
    """max_driver_edges so small the contracted graph recurses at least
    once — the multi-level contraction must stay exact."""
    random.seed(13)
    edges = [(random.randrange(3000), random.randrange(3000)) for _ in range(2200)]
    e = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(e, max_iters=2, max_driver_edges=40).collect()
    }
    assert got == _expected(edges)


def test_cc_million_edge_chains(spark):
    """VERDICT r2 #1 done-criterion: >= 10^6 synthetic edges complete with
    no hard scale stop; phase-1 contraction leaves a label graph the
    driver union-find finishes. Chains of length 1000 are the worst case
    for pure min-propagation (long diameter, tiny components... of the
    label graph) — exactly the shape the hybrid exists for."""
    chain = 1000
    n = 1_001_000  # ~1.0M edges
    e = (
        spark.range(n)
        .filter(F.col("id") % chain != chain - 1)
        .select(F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
    )
    cc = connected_components(e, max_iters=4)
    bad = cc.filter(
        F.col("component") != (F.col("node") - F.col("node") % chain)
    ).count()
    assert bad == 0
    assert cc.count() == e.count() + n // chain  # every node labeled


def test_dedup_clusters_distributed_path_equals_driver_path(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    drv = dedup.dedup_clusters(docs, threshold=0.25, max_df=100)
    dist = dedup.dedup_clusters(
        docs, threshold=0.25, max_df=100, driver_max_edges=0
    )
    assert sorted(map(tuple, drv.collect())) == sorted(map(tuple, dist.collect()))


def test_threshold_regions_second_contraction_level(spark):
    """Forcing the contracted label graph over the driver bound must route
    through connected_components and still produce the exact regions."""
    from roadgrinder_spark import datagen
    from roadgrinder_spark.spatial import raster as sr

    raster = sr.rasterize_points(datagen.derive_addrpnts(spark, SF_DIR))
    base = sr.threshold_regions(raster, min_count=2)
    forced = sr.threshold_regions(
        raster, min_count=2, max_iters=1, max_contract_edges=1
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, forced.collect()))


def test_ngram_strategies_identical(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    outs = {}
    for st in ("index", "selfjoin", "prefix"):
        d = dedup.ngram_jaccard_pairs(docs, threshold=0.25, max_df=100, strategy=st)
        outs[st] = sorted(map(tuple, d.collect()))
        d.unpersist()
    assert outs["index"] == outs["selfjoin"] == outs["prefix"]
    assert len(outs["index"]) > 0


def test_minhash_null_text_parity(spark):
    """ADVICE r2 #4: numpy kernel must propagate null text exactly like
    the JVM expression path (sig = array of nulls)."""
    docs = spark.createDataFrame(
        [(1, "some text body here"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    jvm = sorted(map(tuple, dedup.minhash_signatures(docs, n_hashes=8).collect()))
    npk = sorted(map(tuple, dedup.minhash_signatures_numpy(docs, n_hashes=8).collect()))
    assert jvm == npk


def test_embedding_lsh_mode_equals_blocked_at_tight_threshold(spark):
    """mode='lsh' (sub-quadratic sign-LSH candidates + exact rerank) finds
    the same pair set as the exact blocked sweep at a tight threshold on a
    corpus with planted duplicates; mode='auto' routes there."""
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dup = embs.limit(25).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    aug = embs.select("vec_id", "embedding").unionByName(dup)
    bl = sorted(map(tuple, dedup.embedding_near_dups(aug, 0.8, mode="blocked").collect()))
    ls = sorted(map(tuple, dedup.embedding_near_dups(aug, 0.8, mode="lsh").collect()))
    au = sorted(map(tuple, dedup.embedding_near_dups(aug, 0.8, mode="auto").collect()))
    assert bl == ls == au
    assert len(bl) >= 25  # every planted duplicate found


def test_embedding_blocked_handles_negative_ids(spark):
    """pmod grouping: negative vec_ids (signed-hash ids) must not lose
    pairs (code-review r3 finding: % keeps the dividend's sign)."""
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(120)
    neg = embs.select((F.col("vec_id") - 10_000).alias("vec_id"), "embedding")
    got = sorted(map(tuple, dedup.embedding_near_dups(neg, 0.35, mode="blocked").collect()))
    want = sorted(map(tuple, dedup.embedding_near_dups_allpairs(neg, 0.35).collect()))
    assert got == want and len(got) > 0
