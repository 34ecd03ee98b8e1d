"""Deduplication operators for the training-data pipeline.

Five families, as first-class `queries()` entries:
  exact            — hash groupBy on text (oracle-checkable via md5)
  ngram_jaccard    — character-shingle Jaccard pairs (oracle-checkable:
                     pure substring/COUNT DISTINCT relational algebra)
  minhash_lsh      — 64-perm MinHash + 8×8 banded LSH, all JVM-side
                     higher-order expressions over xxhash64 (rows-only
                     driver check + pytest estimate-accuracy oracle)
  simhash          — 64-bit SimHash over token hashes (rows-only + pytest)
  embedding cosine — see operators/vectors.py

Scale notes: exact dedup is one hash aggregate (map-side partial combine).
The shingle self-join's skew is vocabulary-Zipfian — the high-DF shingle
cap (`max_df`) bounds per-key fanout *and* is part of the operator's
contract (mirrored in the oracle). MinHash signatures are fixed-width
arrays, so LSH candidate generation is a uniform 8-way band join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(docs: DataFrame) -> DataFrame:
    """One row per distinct text: keeper = min doc_id, n_copies.
    md5 (same algorithm in Spark and DuckDB) keys the output so the check
    doesn't hash megabytes of raw text."""
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_md5"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


ORACLE_DEDUP_EXACT = (
    "SELECT md5(text) AS text_md5, min(doc_id) AS keeper_doc_id, "
    "count(*) AS n_copies FROM documents GROUP BY md5(text)"
)


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs (exact, relational)
# ---------------------------------------------------------------------------

def shingles(docs: DataFrame, k: int = 8) -> DataFrame:
    """Distinct character k-shingles per doc: (doc_id, shingle)."""
    return (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"array_distinct(transform("
                    f"sequence(1, greatest(1, length(text) - {k - 1})), "
                    f"i -> substring(text, i, {k})))"
                )
            ).alias("shingle"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame, k: int = 8, threshold: float = 0.5, max_df: int = 1000
) -> DataFrame:
    """Doc pairs with shingle-Jaccard >= threshold (doc_a < doc_b).

    Shingles with document frequency > max_df are dropped from candidate
    generation AND from the per-doc sizes (consistent contract; the oracle
    applies the same cap). Returns (doc_a, doc_b, inter_n, union_n) —
    jaccard reported as exact integer counts to keep the value-hash
    float-free.
    """
    sh = shingles(docs, k)
    df_ok = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("shingle")
    )
    sh = sh.join(df_ok, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter_n"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("union_n", F.col("na") + F.col("nb") - F.col("inter_n"))
        .filter(F.col("inter_n") >= F.col("union_n") * F.lit(float(threshold)))
        .select("doc_a", "doc_b", "inter_n", "union_n")
    )
    return out


def oracle_ngram_jaccard_sql(k: int = 8, threshold: float = 0.5, max_df: int = 1000) -> str:
    return f"""
sh0 AS (
  SELECT DISTINCT d.doc_id, substr(d.text, CAST(p.pos AS INT), {k}) AS shingle
  FROM documents d,
       LATERAL (SELECT unnest(range(1, greatest(1, length(d.text) - {k - 1}) + 1)) AS pos) p
),
sh AS (
  SELECT * FROM sh0 WHERE shingle IN (
    SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= {max_df})
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter_n
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b, i.inter_n, sa.n_sh + sb.n_sh - i.inter_n AS union_n
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE i.inter_n >= (sa.n_sh + sb.n_sh - i.inter_n) * {float(threshold)}"""


# ---------------------------------------------------------------------------
# MinHash + banded LSH (JVM higher-order expressions; no Python)
# ---------------------------------------------------------------------------

_MH_PRIME = 2147483647  # 2^31 - 1


def _perm_params(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic universal-hash params (a odd, b), fixed — tile/run
    reproducibility requires constants, not RNG."""
    return [((2 * j + 1) * 2654435761 % _MH_PRIME, (j * j * 40503 + 7) % _MH_PRIME)
            for j in range(n_hashes)]


def minhash_signatures(
    docs: DataFrame, k: int = 8, n_hashes: int = 64
) -> DataFrame:
    """(doc_id, sig: array<long>[n_hashes]) MinHash signature per doc.

    Base shingle hashes via xxhash64(substring) inside a single JVM
    transform(); each permutation is min over (a*h'+b) mod P with
    h' = pmod(h, P).
    """
    grams = (
        f"transform(sequence(1, greatest(1, length(text) - {k - 1})), "
        f"i -> pmod(xxhash64(substring(text, i, {k})), {_MH_PRIME}))"
    )
    mins = ", ".join(
        f"array_min(transform(_g, h -> pmod(h * {a}L + {b}L, {_MH_PRIME})))"
        for a, b in _perm_params(n_hashes)
    )
    return (
        docs.withColumn("_g", F.expr(grams))
        .select("doc_id", F.expr(f"array({mins})").alias("sig"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 8,
    n_hashes: int = 64,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs via banded LSH, scored by the MinHash estimate.

    Returns (doc_a, doc_b, est_jaccard) with est >= threshold. Candidate
    generation: band hash = xxhash64 of each sig slice; self-join per
    (band_idx, band_hash) bucket — uniform fanout, no hot keys because
    signatures of distinct docs collide per-band with probability j^rows.
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(docs, k, n_hashes)
    banded = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b AS band, xxhash64(concat_ws(',', "
                f"slice(sig, b * {rows_per_band} + 1, {rows_per_band}))) AS bh))"
            )
        ).alias("bb"),
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.expr(
        f"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / {n_hashes}"
    )
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit) — JVM expressions
# ---------------------------------------------------------------------------

def simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash: long): sign-sum over token xxhash64 bits.

    Token list via split on whitespace; per-bit majority computed with one
    aggregate() per bit over the token-hash array (64 JVM expressions, one
    pass, no shuffle)."""
    toks = "filter(split(text, '\\\\s+'), t -> t <> '')"
    hashes = f"transform({toks}, t -> xxhash64(t))"
    bit_sums = [
        (
            f"aggregate({hashes}, 0L, "
            f"(acc, h) -> acc + CASE WHEN shiftright(h, {j}) & 1 = 1 THEN 1 ELSE -1 END)"
        )
        for j in range(64)
    ]
    # assemble: bit j set iff sum > 0   (shiftleft on BIGINT)
    packed = " + ".join(
        f"(CASE WHEN ({s}) > 0 THEN shiftleft(1L, {j}) ELSE 0L END)"
        for j, s in enumerate(bit_sums)
    )
    return docs.select("doc_id", F.expr(packed).alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup candidates: block on 4×16-bit simhash chunks (a pair within
    hamming<=max_hamming shares at least one chunk when max_hamming<16 per
    the pigeonhole bound with 4 blocks... conservatively max_hamming<=3
    guarantees exactness; above that it's approximate) → verify exact
    hamming via bit_count(xor)."""
    sh = simhash(docs)
    blocks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), "
                "b -> struct(b AS blk, shiftright(simhash, b * 16) & 65535 AS bv))"
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", F.col("bb.blk").alias("blk"), F.col("bb.bv").alias("bv"))
    a, b = blocks.alias("a"), blocks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicates
# ---------------------------------------------------------------------------

def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.35) -> DataFrame:
    """Vector-space near-dup pairs: (id_a < id_b, cos >= threshold).

    Exact all-pairs over the corpus — correct baseline; at 10^9 vectors
    swap the candidate generation for the IVF buckets in
    operators/vectors.py (same rerank). cos rounded to 6 dp for
    engine-portable hashing (see vectors.py notes)."""
    from .vectors import cosine_expr

    a = embeddings.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"))
    b = embeddings.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine_expr("emb_a", "emb_b"), 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def oracle_embedding_near_dups_sql(threshold: float = 0.35) -> str:
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6) >= {threshold}"""
