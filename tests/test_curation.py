"""Round-3 curation / analytics operators: deterministic sampling, PII
redaction, tile pyramid, as-of join — DuckDB parity + semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from roadgrinder_spark import datagen
from roadgrinder_spark.functions import text as T
from roadgrinder_spark.operators import events, sampling
from roadgrinder_spark.spatial import raster as sr

from .conftest import SF_DIR, assert_frames_match


def test_hash_split_oracle_and_fractions(spark, duck):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    got = sampling.hash_split(docs)
    assert_frames_match(
        got, duck.sql(sampling.oracle_hash_split_sql(cols="doc_id")).df(), "split"
    )
    frac = {
        r["split"]: r["n"]
        for r in got.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n = sum(frac.values())
    assert 0.8 < frac["train"] / n < 0.97  # 500 docs: generous CI around 0.9
    # determinism: second evaluation identical
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, sampling.hash_split(docs).collect())
    )


def test_stratified_sample_oracle_and_quota(spark, duck):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    )
    got = sampling.stratified_sample(docs, "source", 50)
    assert_frames_match(
        got,
        duck.sql(
            sampling.oracle_stratified_sample_sql(
                "documents", "source", 50, cols="doc_id, source"
            )
        ).df(),
        "stratified",
    )
    worst = got.groupBy("source").count().agg(F.max("count")).collect()[0][0]
    assert worst <= 50


def test_pii_redact_planted_and_oracle(spark, duck):
    rows = [
        (1, "mail me at jane.doe+x@example.org or call 555-123-4567 now"),
        (2, "server 10.0.255.7 logged ssn 123-45-6789 twice: 123-45-6789"),
        (3, "clean text, no identifiers at all"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in T.pii_redact(df).collect()}
    assert "<EMAIL>" in got[1]["text_redacted"] and got[1]["n_emails"] == 1
    assert "<PHONE>" in got[1]["text_redacted"] and got[1]["n_phones"] == 1
    assert got[2]["n_ips"] == 1 and got[2]["n_ssns"] == 2
    assert got[2]["text_redacted"].count("<SSN>") == 2
    assert got[3]["text_redacted"] == rows[2][1]
    assert got[4]["text_redacted"] is None
    # corpus-level oracle parity (patterns live in the Java∩RE2 subset)
    corpus = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert_frames_match(
        T.pii_redact(corpus), duck.sql(T.oracle_pii_redact_sql()).df(), "pii"
    )


def test_tile_pyramid_oracle_and_mass_conservation(spark, duck):
    pts = datagen.derive_addrpnts(spark, SF_DIR)
    pyr = sr.tile_pyramid(sr.rasterize_points(pts), levels=4)
    osql = (
        "WITH "
        + datagen.ADDRPNTS_CTE.strip().strip(",")
        + sr.oracle_tile_pyramid_sql()
    )
    assert_frames_match(pyr, duck.sql(osql).df(), "pyramid")
    totals = {
        r["level"]: r["s"]
        for r in pyr.groupBy("level").agg(F.sum("n").alias("s")).collect()
    }
    n_pts = pts.count()
    assert all(v == n_pts for v in totals.values())  # every level conserves mass
    rows_per_level = {
        r["level"]: r["c"]
        for r in pyr.groupBy("level").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert rows_per_level[4] < rows_per_level[0]  # resolution actually halves


def test_asof_join_oracle_and_semantics(spark, duck):
    evts = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = events.asof_join(evts)
    osql = "WITH " + events.oracle_asof_join_sql().strip()
    assert_frames_match(got, duck.sql(osql).df(), "asof")
    # semantics: matched click is at-or-before, and is the latest one
    j = got.filter(F.col("matched_ts_us").isNotNull())
    assert j.filter(F.col("lag_us") < 0).count() == 0
    assert j.count() > 0
    # hand-built case incl. equal-timestamp tie
    rows = [
        (1, 100, "click", 1_000_000), (2, 100, "purchase", 1_000_000),
        (3, 100, "click", 2_000_000), (4, 100, "purchase", 3_000_000),
        (5, 200, "purchase", 500_000),
    ]
    import datetime as dt

    data = [
        (e, dt.datetime(2024, 1, 1, 0, 0, 0)
         + dt.timedelta(microseconds=us), u, ty, 0.0, "")
        for e, u, ty, us in rows
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["event_id"]: r for r in events.asof_join(df).collect()}
    assert out[2]["matched_event_id"] == 1  # equal-ts click IS visible
    assert out[4]["matched_event_id"] == 3  # latest prior click wins
    assert out[5]["matched_event_id"] is None  # no click for user 200


def test_mixture_resample_oracle_and_composition(spark, duck):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    )
    targets = {"src0": 0.02, "src1": 0.002, "src2": 0.05}
    got = sampling.mixture_resample(docs, "source", targets)
    assert_frames_match(
        got,
        duck.sql(
            sampling.oracle_mixture_resample_sql(
                "documents", "source", targets, cols="doc_id, source"
            )
        ).df(),
        "mixture",
    )
    n_tot = docs.count()
    by_src = {r["source"]: r["n"] for r in got.groupBy("source")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(by_src) <= set(targets)  # untargeted groups dropped
    # src1 target (0.002*500=1 doc) must be downsampled well below its 25
    assert by_src.get("src1", 0) < 25 * 0.5
    # rate caps at 1: src2 target (25 docs) keeps everything
    assert by_src["src2"] == 25
    _ = n_tot


def test_incremental_rollup_equals_batch(spark):
    from roadgrinder_spark.operators.events import (
        hourly_rollup, incremental_hourly_rollup,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    batches = [ev.filter(F.pmod(F.col("event_id"), F.lit(4)) == i) for i in range(4)]
    inc = incremental_hourly_rollup(batches)
    full = hourly_rollup(ev)
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))


def test_catalog_merge_upsert(spark, tmp_path):
    from roadgrinder_spark.sources.catalog import TableCatalog

    cat = TableCatalog(spark, str(tmp_path / "cat"))
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    v1 = cat.write("t", base)
    upd = spark.createDataFrame([(2, "B"), (4, "d")], "k long, v string")
    v2 = cat.merge("t", upd, keys=["k"])
    got = {r["k"]: r["v"] for r in cat.read("t").collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}  # update + insert
    assert {r["k"] for r in cat.read("t", version=v1).collect()} == {1, 2, 3}
    cat.rollback("t", v1)  # snapshots remain immutable + rollbackable
    assert cat.read("t").count() == 3
    _ = v2


def test_round3_guard_rails(spark, tmp_path):
    """Contract guards from the round-3 review: merge rejects duplicate
    delta keys; hash_split rejects non-normalized weights; incremental
    rollup rejects an empty batch list; embedding dedup defaults to the
    exact mode regardless of threshold."""
    import inspect

    import pytest

    from roadgrinder_spark.operators import dedup
    from roadgrinder_spark.operators.events import incremental_hourly_rollup
    from roadgrinder_spark.sources.catalog import TableCatalog

    cat = TableCatalog(spark, str(tmp_path / "cat"))
    cat.write("t", spark.createDataFrame([(1, "a")], "k long, v string"))
    dup_delta = spark.createDataFrame([(2, "x"), (2, "y")], "k long, v string")
    with pytest.raises(ValueError, match="duplicate keys"):
        cat.merge("t", dup_delta, keys=["k"])

    with pytest.raises(ValueError, match="sum to 1"):
        sampling.hash_split(
            spark.createDataFrame([(1,)], "doc_id long"),
            weights={"train": 0.5, "val": 0.2},
        )

    with pytest.raises(ValueError, match="at least one batch"):
        incremental_hourly_rollup([])

    assert (
        inspect.signature(dedup.embedding_near_dups).parameters["mode"].default
        == "blocked"
    )


def test_kmv_sketch_oracle_and_accuracy(spark, duck):
    from roadgrinder_spark.operators import sketches

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sketches.kmv_distinct(docs, "text", k=64)
    assert_frames_match(
        got,
        duck.sql(sketches.oracle_kmv_distinct_sql("documents", "text", k=64)).df(),
        "kmv",
    )
    est = got.collect()[0]["est_distinct"]
    true = docs.select("text").distinct().count()
    assert 0.5 * true < est < 2.0 * true  # k=64 → ~12% stderr; generous band
    # exact below k: 20 distinct values, k=64 → est == 20
    small = docs.limit(20)
    row = sketches.kmv_distinct(small, "doc_id", k=64).collect()[0]
    assert row["est_distinct"] == row["n_kept"] == 20
    # per-group variant agrees with the oracle too
    per = sketches.kmv_distinct_per_group(docs, "source", "text", k=16)
    assert_frames_match(
        per,
        duck.sql(
            sketches.oracle_kmv_per_group_sql("documents", "source", "text", k=16)
        ).df(),
        "kmv_group",
    )


def test_hashed_embedding_oracle_and_ann_composition(spark, duck):
    """The hashing-trick vectorizer is exact cross-engine, and its output
    plugs straight into the cosine near-dup operator (text → vector →
    ANN composition): planted duplicate texts score cos 1.0."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = T.hashed_ngram_embedding(docs).toPandas()
    dk = duck.sql("WITH " + T.oracle_hashed_embedding_sql().strip()).df()
    got["embedding"] = got["embedding"].apply(tuple)
    dk["embedding"] = dk["embedding"].apply(tuple)
    got = got.sort_values("doc_id").reset_index(drop=True)
    dk = dk.sort_values("doc_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, dk, check_dtype=False)

    from roadgrinder_spark.operators import dedup

    dup = docs.limit(5).select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    aug = docs.select("doc_id", "text").unionByName(dup)
    emb = T.hashed_ngram_embedding(aug).select(
        F.col("doc_id").alias("vec_id"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
    )
    pairs = dedup.embedding_near_dups(emb, threshold=0.999999, mode="blocked")
    planted = pairs.filter(F.col("id_b") - F.col("id_a") == 1_000_000).count()
    assert planted == 5


def test_contamination_check_planted(spark, duck):
    from roadgrinder_spark.operators import dedup

    bench_text = "the quick brown fox jumps over the lazy benchmark dog"
    rows = [
        (1, f"intro text then {bench_text} and some trailing words"),
        (2, "completely unrelated content with no overlap whatsoever"),
        (3, bench_text),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    probes = spark.createDataFrame([(bench_text,)], "text string")
    got = {r["doc_id"]: r for r in dedup.contamination_check(docs, probes).collect()}
    assert set(got) == {1, 3}  # doc 2 is clean
    assert got[3]["hit_rate"] == 1.0  # verbatim probe: every shingle hits
    assert 0 < got[1]["hit_rate"] < 1.0
    # corpus-scale oracle parity (probe = deterministic corpus slice)
    corpus = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from pyspark.sql import functions as SF

    got_c = dedup.contamination_check(
        corpus, corpus.filter(SF.col("doc_id") % 97 == 0)
    )
    osql = (
        "WITH ct_probes AS (SELECT * FROM documents WHERE doc_id % 97 = 0), "
        + dedup.oracle_contamination_sql("ct_probes").strip()
    )
    assert_frames_match(got_c, duck.sql(osql).df(), "contamination")


def test_short_text_yields_zero_embedding_and_no_contamination(spark):
    """Review r3: sub-k texts must produce NO grams — empty/short docs
    embed as zero vectors and cannot 'contaminate' on truncated grams."""
    from roadgrinder_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, ""), (2, "ab"), (3, None), (4, "abcdefgh long enough text")],
        "doc_id long, text string",
    )
    emb = {r["doc_id"]: r["embedding"]
           for r in T.hashed_ngram_embedding(docs, dim=8, k=3).collect()}
    assert emb[1] == [0] * 8 and emb[2] == [0] * 8 and emb[3] == [0] * 8
    assert sum(emb[4]) > 0
    probes = spark.createDataFrame([("ab",), ("xyz",)], "text string")
    out = dedup.contamination_check(docs, probes, k=12)
    assert out.count() == 0  # nothing >= 12 chars overlaps


def test_repetition_stats_planted_and_oracle(spark, duck):
    rows = [
        (1, "same line\nsame line\nsame line\nother line"),
        (2, "spam spam spam spam spam"),
        (3, "all words here are fully distinct tokens"),
        (4, None),
        (5, "one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in T.repetition_stats(df).collect()}
    assert got[1]["n_lines"] == 4 and got[1]["dup_line_frac"] == 0.5
    assert got[2]["top2gram_frac"] == 1.0  # 'spam spam' is every bigram
    assert got[3]["dup_line_frac"] == 0.0 and got[3]["top2gram_frac"] < 0.5
    assert got[4]["dup_line_frac"] is None  # null text propagates
    assert got[5]["n_bigrams"] == 0 and got[5]["top2gram_frac"] is None
    corpus = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert_frames_match(
        T.repetition_stats(corpus),
        duck.sql("WITH " + T.oracle_repetition_sql().strip()).df(),
        "repetition",
    )


def test_cm_sketch_oracle_and_bounds(spark, duck):
    """Count-min registers are engine-identical; estimates never
    under-count and are exact for heavy hitters at this width."""
    from roadgrinder_spark.operators import sketches

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != F.lit(""))
        ).alias("tok")
    )
    sk = sketches.cm_sketch(toks, "tok", depth=4, width=128)
    src = (
        r"""SELECT t.tok FROM documents d,
        LATERAL (SELECT unnest(regexp_split_to_array(d.text, '\s+')) AS tok) t
        WHERE t.tok <> ''"""
    )
    assert_frames_match(
        sk, duck.sql(sketches.oracle_cm_sketch_sql(src, "tok", 4, 128)).df(), "cm"
    )
    true = toks.groupBy("tok").count()
    top = true.orderBy(F.desc("count")).limit(10)
    est = sketches.cm_estimate(sk, top, "tok", depth=4, width=128)
    j = est.join(true, "tok").collect()
    assert all(r["est_count"] >= r["count"] for r in j)  # one-sided
    assert sum(r["est_count"] - r["count"] for r in j) <= 0.05 * sum(
        r["count"] for r in j
    )
