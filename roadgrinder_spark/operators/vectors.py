"""Similarity search over the embeddings table (array<float> column).

Two paths per the brief:
  brute-force cosine top-k — the exactness baseline. JVM-side sequential
    fold (aggregate over zip_with) so the oracle (DuckDB list_ functions,
    also sequential) accumulates in the same order; ranks computed on
    round(cos, 6) with vec_id tiebreak to absorb any last-ulp drift.
  IVF (inverted-file) top-k — the scale path: deterministic centroid set
    (every stride-th vector), assign each vector to its nearest centroid,
    probe the query's nprobe nearest centroid lists only. Approximate →
    rows-only driver check + pytest recall test vs brute force.

Scale notes: brute force is O(Q·N) — fine for reranking small candidate
sets, not for N=10^9. IVF buckets the corpus by centroid id (one shuffle),
then the query×bucket join fans out only to nprobe buckets. The numpy
mapInPandas kernel does the per-bucket matmul in Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
_NORM = "sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"


def cosine_expr(a: str, b: str) -> F.Column:
    dot = _DOT.format(a=a, b=b)
    na = _NORM.format(a=a)
    nb = _NORM.format(a=b)
    return F.expr(f"({dot}) / (({na}) * ({nb}))")


def brute_force_topk(
    embeddings: DataFrame, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """Exact cosine top-k of every corpus vector for the first `n_queries`
    vec_ids (self-match excluded). Returns (query_id, neighbor_id, rank,
    cos) with cos rounded to 6 dp and rank computed on the rounded value.
    """
    from ..session import spread_input

    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = (
        spread_input(embeddings).crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_expr("q_emb", "embedding"), 6).alias("cos"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def oracle_brute_force_topk_sql(n_queries: int = 10, k: int = 5) -> str:
    """DuckDB oracle: same sequential-fold dot product via list_aggregate-
    free explicit recursion is unavailable — use list_dot_product /
    list_cosine_similarity (sequential over the list) and round to 6 dp.
    """
    return f"""
q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < {n_queries}),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cos
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, rank, cos FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM pairs
) WHERE rank <= {k}"""


# ---------------------------------------------------------------------------
# IVF (scale path) — numpy kernels in mapInPandas / applyInPandas
# ---------------------------------------------------------------------------

def _assign_numpy(emb: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest centroid by cosine (batch matmul)."""
    e = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    c = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    return np.argmax(e @ c.T, axis=1).astype(np.int64)


def ivf_topk_checkable(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 6,
    assign_r: int = 2,
) -> DataFrame:
    """IVF top-k whose ENTIRE algorithm is DuckDB-reproducible, so the
    approximate result is still value-hash-checkable (closing the last
    rows-only driver row). Differences from ivf_topk: deterministic
    stride-sampled centroids (no float k-means), and centroid assignment
    via the JVM sequential-fold cosine (same expression shape as the
    oracle's list_cosine_similarity) ranked on round(cs, 9) with centroid
    tiebreak — bucket membership is a pure function both engines compute
    identically. ivf_topk (k-means + numpy) remains the quality/scale
    path with its recall pytest."""
    from pyspark.sql import Window

    n_total = embeddings.count()
    stride = max(1, n_total // n_centroids)
    cent_rows = (
        embeddings.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .limit(n_centroids)
        .collect()
    )
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("cid"),
                F.array(*[F.lit(float(v)) for v in r["embedding"]]).alias("cemb"),
            )
            for i, r in enumerate(cent_rows)
        ]
    )
    scored = (
        embeddings.withColumn("_c", F.explode(cent_arr))
        .select(
            "vec_id",
            "embedding",
            F.col("_c.cid").alias("cid"),
            F.round(cosine_expr("embedding", "_c.cemb"), 9).alias("cs"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), F.col("cid").asc())
    ranked = scored.withColumn("_rn", F.row_number().over(w))
    corpus = ranked.filter(F.col("_rn") <= assign_r).select(
        "vec_id", "embedding", "cid"
    )
    probes = (
        ranked.filter((F.col("vec_id") < n_queries) & (F.col("_rn") <= nprobe))
        .select(F.col("vec_id").alias("query_id"), "cid")
    )
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cand = (
        corpus.join(probes, "cid")
        .select("query_id", "vec_id", "embedding")
        .dropDuplicates(["query_id", "vec_id"])
        .join(F.broadcast(q), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_expr("q_emb", "embedding"), 6).alias("cos"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def oracle_ivf_topk_sql(
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 6,
    assign_r: int = 2,
) -> str:
    """DuckDB mirror of ivf_topk_checkable — same stride centroids, same
    rounded-cosine assignment ranking, same probe/bucket/rerank steps."""
    return f"""
iv_n AS (SELECT count(*) AS n FROM embeddings),
iv_cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
         CAST(embedding AS DOUBLE[]) AS cemb
  FROM embeddings
  WHERE vec_id % (SELECT greatest(1, CAST(FLOOR(n / {n_centroids}) AS BIGINT)) FROM iv_n) = 0
  ORDER BY vec_id LIMIT {n_centroids}
),
iv_scored AS (
  SELECT e.vec_id, c.cid,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cemb), 9) AS cs
  FROM embeddings e, iv_cent c
),
iv_ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS _rn
  FROM iv_scored
),
iv_corpus AS (SELECT vec_id, cid FROM iv_ranked WHERE _rn <= {assign_r}),
iv_probes AS (
  SELECT vec_id AS query_id, cid FROM iv_ranked
  WHERE vec_id < {n_queries} AND _rn <= {nprobe}
),
iv_cand AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
  FROM iv_corpus c JOIN iv_probes p ON p.cid = c.cid
  WHERE c.vec_id <> p.query_id
),
iv_rr AS (
  SELECT ca.query_id, ca.neighbor_id,
         round(list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
                                      CAST(en.embedding AS DOUBLE[])), 6) AS cos
  FROM iv_cand ca
  JOIN embeddings eq ON eq.vec_id = ca.query_id
  JOIN embeddings en ON en.vec_id = ca.neighbor_id
)
SELECT query_id, neighbor_id, rank, cos FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM iv_rr
) WHERE rank <= {k}"""


def kmeans_centroids(
    spark_embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
) -> np.ndarray:
    """Spherical k-means centroids: deterministic stride-sampled init,
    then `iters` Lloyd passes. Each pass is one distributed assignment
    (numpy matmul in mapInPandas) + a per-(centroid, dim) partial-sum
    aggregate (posexplode + groupBy — map-side combine, K*d tiny rows to
    the driver). Empty clusters keep their previous centroid. Fully
    deterministic: init is a pure function of vec_id, updates are exact
    means of float64 sums (order drift absorbed by the normalization —
    recall, not parity, is the contract here; the driver check for IVF
    is rows-only by design)."""
    n_total = spark_embeddings.count()
    stride = max(1, n_total // n_centroids)
    cent_rows = (
        spark_embeddings.filter((F.col("vec_id") % stride == 0))
        .orderBy("vec_id")
        .limit(n_centroids)
        .collect()
    )
    cents = np.array([r["embedding"] for r in cent_rows], dtype=np.float64)
    sc = spark_embeddings.sparkSession.sparkContext
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("vec_id", LongType()), StructField("centroid", LongType())]
    )
    for _ in range(iters):
        bc_it = sc.broadcast(cents)

        def assign_it(batches):
            for pdf in batches:
                emb = np.array(pdf["embedding"].tolist(), dtype=np.float64)
                cent = (
                    _assign_numpy(emb, bc_it.value) if len(pdf) else np.array([], np.int64)
                )
                yield pd.DataFrame({"vec_id": pdf["vec_id"].values, "centroid": cent})

        sums = (
            spark_embeddings.mapInPandas(assign_it, schema=schema)
            .join(spark_embeddings, "vec_id")
            .select("centroid", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("centroid", "pos")
            .agg(F.sum(F.col("v").cast("double")).alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()
        )
        new = cents.copy()
        acc: dict[int, np.ndarray] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r["centroid"], np.zeros(cents.shape[1]))[r["pos"]] = r["s"]
            cnt[r["centroid"]] = r["c"]
        for cid, vec in acc.items():
            new[cid] = vec / max(cnt[cid], 1)
        cents = new
    return cents


def ivf_topk(
    spark_embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 6,
    kmeans_iters: int = 3,
    assign_r: int = 2,
) -> DataFrame:
    """Approximate cosine top-k: IVF over spherical-k-means centroids
    (VERDICT r1 #8: Lloyd refinement replaces raw stride sampling), with
    multi-assignment — each corpus vector is stored in its `assign_r`
    nearest buckets (storage ×r, recall way up on weakly-clustered data).
    One shuffle to bucket the corpus; queries probe their nprobe nearest
    centroid buckets; duplicate (query, neighbor) hits from overlapping
    buckets are deduped before the exact rerank.
    """
    cents = kmeans_centroids(spark_embeddings, n_centroids, iters=kmeans_iters)
    bc = spark_embeddings.sparkSession.sparkContext.broadcast(cents)

    from pyspark.sql.types import LongType, StructField, StructType

    assign_schema = StructType(
        [StructField("vec_id", LongType()), StructField("centroid", LongType())]
    )

    def assign_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            emb = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            e = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
            c = bc.value / np.maximum(
                np.linalg.norm(bc.value, axis=1, keepdims=True), 1e-12
            )
            top_r = np.argsort(-(e @ c.T), axis=1)[:, :assign_r]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].values, assign_r),
                    "centroid": top_r.reshape(-1).astype(np.int64),
                }
            )

    from ..session import spread_input

    assigned = spread_input(spark_embeddings).mapInPandas(
        assign_batches, schema=assign_schema
    )
    corpus = spark_embeddings.join(assigned, "vec_id")

    # queries → their nprobe nearest centroids (tiny, driver-side math)
    q_rows = (
        spark_embeddings.filter(F.col("vec_id") < n_queries).orderBy("vec_id").collect()
    )
    probe_pairs = []
    for r in q_rows:
        qv = np.array(r["embedding"], dtype=np.float64)
        qn = qv / max(np.linalg.norm(qv), 1e-12)
        cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(cn @ qn))
        for c in order[:nprobe]:
            probe_pairs.append((int(r["vec_id"]), int(c)))
    probes = spark_embeddings.sparkSession.createDataFrame(
        probe_pairs, "query_id long, centroid long"
    )
    q = spark_embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cand = (
        corpus.join(probes, "centroid")
        .select("vec_id", "embedding", "query_id")
        .dropDuplicates(["query_id", "vec_id"])
        .join(F.broadcast(q), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_expr("q_emb", "embedding"), 6).alias("cos"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
