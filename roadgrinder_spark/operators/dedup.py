"""Deduplication operators for the training-data pipeline.

Six families, each a first-class `queries()` entry:
  exact            — hash groupBy on text (oracle-checkable via md5)
  ngram_jaccard    — character-shingle Jaccard pairs, three equivalent
                     plan strategies (inverted index default / self-join
                     / lossless PPJoin prefix)
  dedup_clusters   — connected components over the pair graph; driver
                     union-find for small edge lists, the distributed
                     label-prop/contraction hybrid (operators/graph.py)
                     beyond — no hard scale stop
  minhash_lsh      — 64-perm MinHash + 8×8 banded LSH over the portable
                     polynomial hash (functions/phash.py); Mersenne-fold
                     numpy Arrow signature kernel, DuckDB-oracle-exact
  simhash          — 62-bit SimHash over portable token hashes
                     (DuckDB-oracle-exact)
  embedding cosine — triangle-partitioned exact Arrow matmul, or
                     sign-LSH candidates + exact rerank (mode='auto'
                     routes tight thresholds); see also operators/vectors

Scale notes: exact dedup is one hash aggregate (map-side partial combine).
Shingle skew is vocabulary-Zipfian — the high-DF cap (`max_df`) bounds
per-key fanout *and* is part of the operator's contract (mirrored in the
oracle). MinHash signatures are fixed-width arrays, so LSH candidate
generation is a uniform 8-way band join.
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

from ..session import spread_input as _spread


def shingles(docs: DataFrame, k: int = 8) -> DataFrame:
    """Distinct character k-shingles per doc: (doc_id, shingle)."""
    return (
        _spread(docs).select(
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
    docs: DataFrame,
    k: int = 8,
    threshold: float = 0.5,
    max_df: int = 1000,
    strategy: str = "index",
) -> DataFrame:
    """Doc pairs with shingle-Jaccard >= threshold (doc_a < doc_b).

    Shingles with document frequency > max_df are dropped from candidate
    generation AND from the per-doc sizes (consistent contract; the oracle
    applies the same cap). Returns (doc_a, doc_b, inter_n, union_n) —
    jaccard reported as exact integer counts to keep the value-hash
    float-free.

    Three plan strategies, IDENTICAL output (equality pytest-enforced):
      'index'    (default) — inverted-index pair generation: ONE groupBy
                 collects each shingle's (capped) doc list, pairs explode
                 JVM-side, per-doc sizes come from the same grouped
                 relation. Collapses the r2 plan's dfreq shuffle + cap
                 join + self-join into one aggregation (measured 7.5 s →
                 ~3 s at sf0.1; per-key work bounded by max_df²).
      'selfjoin' — the relational self-join form (r2 plan), whose shape
                 mirrors the DuckDB oracle SQL.
      'prefix'   — PPJoin-style prefix+length filtering (provably
                 lossless; see inline proof). Measured SLOWER here at
                 every cap level (the extra window sort and re-joins cost
                 more than the candidate reduction buys when max_df
                 already bounds fanout); kept for cap-free corpora where
                 no df cap is acceptable and the self-join explodes.
    """
    return _jaccard_pairs_impl(docs, k, threshold, max_df, strategy=strategy)


def _jaccard_pairs_impl(
    docs: DataFrame, k: int, threshold: float, max_df: int, strategy: str
) -> DataFrame:
    from pyspark import StorageLevel

    if strategy == "index":
        # one shuffle builds the inverted index; the df cap is a HAVING on
        # list size; pairs + sizes both read the (small, capped) grouped
        # relation. Persist it — two consumers (VERDICT r2 lesson: lazy
        # caches race under concurrent child stages, count first).
        grouped = (
            shingles(docs, k)
            .groupBy("shingle")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
            .filter(F.size("ds") <= max_df)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        grouped.count()
        pair_arr = F.expr(
            "flatten(transform(sequence(0, size(ds) - 2), "
            "i -> transform(sequence(i + 1, size(ds) - 1), "
            "j -> struct(ds[i] AS doc_a, ds[j] AS doc_b))))"
        )
        inter = (
            grouped.filter(F.size("ds") >= 2)
            .select(F.explode(pair_arr).alias("p"))
            .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("inter_n"))
        )
        sizes = (
            grouped.select(F.explode("ds").alias("doc_id"))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_sh"))
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
        out = out.persist(StorageLevel.MEMORY_AND_DISK)
        out.count()
        grouped.unpersist()
        return out

    # The shingle relation feeds FOUR consumers (the DF cap, the per-doc
    # sizes, and both sides of the self-join); without materialization the
    # substring-heavy explode re-evaluates per consumer — measured 4x the
    # whole query cost at sf0.1. MEMORY_AND_DISK persist computes it once;
    # at petabyte scale swap for an explicit checkpoint table (the
    # pipeline substrate) instead of executor storage.
    sh = shingles(docs, k).persist(StorageLevel.MEMORY_AND_DISK)
    sh.count()  # EAGER: Spark runs independent downstream stages (cap,
    # sizes, both join sides) concurrently, and a lazily-populated cache
    # races — each stage recomputed the explode. One up-front pass fills
    # the cache before the fan-out (measured 10.1 s -> 4.0 s at sf0.1).
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    df_ok = dfreq.filter(F.col("_df") <= max_df)
    sh_ok = sh.join(df_ok.select("shingle"), "shingle")
    sizes = sh_ok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    if strategy == "prefix":
        # PPJoin-style prefix filtering (Chaudhuri et al. SSJoin / Xiao et
        # al. PPJoin) — EXACT: under any global total order on shingles, a
        # pair with J >= t must share a shingle within each doc's first
        # n_sh - ceil(t * n_sh) + 1 shingles (if the intersection avoided
        # the prefix it could have at most n_sh - prefix_len = ceil(t*n_sh)
        # - 1 < t*n_sh <= t*|A∪B| <= |A∩B| elements — contradiction).
        # Order = (df, shingle): rarest shingles first maximizes prefix
        # selectivity. Candidates additionally satisfy the lossless size
        # bound t*na <= nb <= na/t (J >= t forces min >= t * max).
        from pyspark.sql import Window

        t = float(threshold)
        ranked = (
            sh_ok.join(dfreq, "shingle")
            .join(sizes, "doc_id")
            .withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy("doc_id").orderBy("_df", "shingle")
                ),
            )
        )
        prefix = ranked.filter(
            F.col("_rk") <= F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(t)) + 1
        ).select("doc_id", "shingle", "n_sh")
        pa, pb = prefix.alias("pa"), prefix.alias("pb")
        cand = (
            pa.join(
                pb,
                (F.col("pa.shingle") == F.col("pb.shingle"))
                & (F.col("pa.doc_id") < F.col("pb.doc_id"))
                & (F.col("pb.n_sh") * F.lit(t) <= F.col("pa.n_sh"))
                & (F.col("pa.n_sh") * F.lit(t) <= F.col("pb.n_sh")),
            )
            .select(
                F.col("pa.doc_id").alias("doc_a"),
                F.col("pb.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        a, b = sh_ok.alias("a"), sh_ok.alias("b")
        # semi-join both shingle scans down to candidate docs, then count
        # intersections; candidate sizing is left to AQE (a forced
        # broadcast would OOM on exactly the cap-free corpora this
        # strategy exists for)
        inter = (
            a.join(cand, F.col("a.doc_id") == F.col("doc_a"))
            .join(
                b,
                (F.col("b.doc_id") == F.col("doc_b"))
                & (F.col("b.shingle") == F.col("a.shingle")),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("inter_n"))
        )
    else:
        a = sh_ok.alias("a")
        b = sh_ok.alias("b")
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
    # Materialize the (output-bounded, tiny) pair set so the big shingle
    # cache can be released NOW instead of leaking for the session
    # lifetime (ADVICE r2): one eager pass fills the result cache, then
    # the shingle blocks go. Callers may .unpersist() the returned frame.
    out = out.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    sh.unpersist()
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

from ..functions import phash

_MH_PRIME = phash.P  # 2^31 - 1


def _perm_params(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic universal-hash params (a odd, b), fixed — tile/run
    reproducibility requires constants, not RNG."""
    return [((2 * j + 1) * 2654435761 % _MH_PRIME, (j * j * 40503 + 7) % _MH_PRIME)
            for j in range(n_hashes)]


def minhash_signatures(
    docs: DataFrame, k: int = 8, n_hashes: int = 64
) -> DataFrame:
    """(doc_id, sig: array<long>[n_hashes]) MinHash signature per doc.

    Base shingle hash is the portable polynomial (functions/phash.py) so
    the DuckDB oracle reproduces signatures exactly; each permutation is
    min over (a*h + b) mod P. Gram strings are staged through `_gs` so
    the 9-reference poly expression evaluates substring(text, i, k) once
    per gram (Catalyst does not CSE inside lambdas)."""
    gram_strings = (
        f"transform(sequence(1, greatest(1, length(text) - {k - 1})), "
        f"i -> substring(text, i, {k}))"
    )
    mins = ", ".join(
        f"array_min(transform(_g, h -> (h * {a}L + {b}L) % {_MH_PRIME}L))"
        for a, b in _perm_params(n_hashes)
    )
    return (
        _spread(docs).withColumn("_gs", F.expr(gram_strings))
        .withColumn("_g", F.expr(f"transform(_gs, s -> {phash.poly8_sql('s', phash.B1)})"))
        .select("doc_id", F.expr(f"array({mins})").alias("sig"))
    )


def minhash_signatures_numpy(
    docs: DataFrame, k: int = 8, n_hashes: int = 64
) -> DataFrame:
    """Arrow/numpy variant of minhash_signatures — bit-identical output
    (VERDICT r1 #7; equivalence pytest-enforced).

    Per Arrow batch: utf-32 decode gives the code-point array directly
    (matches ascii()'s code-point semantics), a sliding-window matvec
    yields all gram hashes at once, and one (n_hashes × n_grams) modular
    broadcast + row-min produces the signature — no per-row Python in
    the arithmetic, just a thin per-doc loop over vectorized kernels."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    P = phash.P
    pow_rev = np.array(list(reversed(phash._powers(phash.B1))), dtype=np.int64)
    params = _perm_params(n_hashes)
    a = np.array([p[0] for p in params], dtype=np.int64)[:, None]
    b = np.array([p[1] for p in params], dtype=np.int64)[:, None]
    salt = phash.LEN_SALT

    def mod_p(x):
        # exact x mod (2^31-1) for non-negative int64 via the Mersenne
        # fold (shift+mask instead of integer division — the kernel's
        # hot op; measured ~35% off the whole signature pass). Inputs
        # are < 2^62 (products of two 31-bit values), so two folds bring
        # the value under 2^31 and one conditional subtract finishes.
        x = (x >> 31) + (x & P)
        x = (x >> 31) + (x & P)
        return np.where(x >= P, x - P, x)

    out_schema = StructType(
        [
            docs.schema["doc_id"],
            StructField("sig", ArrayType(LongType())),
        ]
    )

    null_sig = [None] * n_hashes  # JVM parity: null text → array of nulls
    # (array_min over a transform of a null gram list is null per perm;
    # empirically verified — ADVICE r2 #4)

    def gen(batches):
        for pdf in batches:
            sigs = []
            for text in pdf["text"]:
                if text is None:
                    sigs.append(null_sig)
                    continue
                codes = np.frombuffer(
                    text.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                n = len(codes)
                if n >= k:
                    w = np.lib.stride_tricks.sliding_window_view(codes, k)
                    g = mod_p(w @ pow_rev + k * salt)
                else:
                    g = mod_p(np.array(
                        [codes @ pow_rev[:n] + n * salt], dtype=np.int64
                    ))
                sigs.append(mod_p(g[None, :] * a + b).min(axis=1))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "sig": sigs})

    return _spread(docs.select("doc_id", "text")).mapInPandas(gen, schema=out_schema)


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 8,
    n_hashes: int = 64,
    bands: int = 8,
    threshold: float = 0.5,
    kernel: str = "numpy",
) -> DataFrame:
    """Candidate pairs via banded LSH, scored by the MinHash estimate.

    Returns (doc_a, doc_b, est_jaccard) with est >= threshold. Candidate
    generation: band hash = md5 of each sig slice (portable; just a bucket
    key); self-join per (band_idx, band_hash) bucket — uniform fanout, no
    hot keys because signatures of distinct docs collide per-band with
    probability j^rows.

    kernel='numpy' (default) computes signatures in the Arrow matvec
    kernel — measured 6.5x faster than the 64-expression JVM path
    (2.7 s vs 17.7 s at sf0.1/local[32]) with bit-identical signatures
    (pytest-enforced); kernel='jvm' keeps the pure-Catalyst form whose
    expression shape mirrors the DuckDB oracle SQL.
    """
    rows_per_band = n_hashes // bands
    sig = (
        minhash_signatures_numpy(docs, k, n_hashes)
        if kernel == "numpy"
        else minhash_signatures(docs, k, n_hashes)
    )
    banded = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b AS band, md5(concat_ws(',', "
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


def dedup_clusters(
    docs: DataFrame,
    k: int = 8,
    threshold: float = 0.5,
    max_df: int = 1000,
    driver_max_edges: int = 2_000_000,
) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the exact
    ngram-Jaccard pair graph. One row per clustered doc:
    (doc_id, cluster_id = min doc_id of the component, is_keeper).
    The keep-one-per-cluster policy most training pipelines want.

    The pair graph is computed ONCE (the pair pipeline is persisted by
    ngram_jaccard_pairs before any action — VERDICT r2 #2). Small edge
    lists (<= driver_max_edges) finish with a driver union-find; anything
    larger routes through the distributed label-propagation/contraction
    hybrid (operators/graph.connected_components — VERDICT r2 #1), so
    there is no hard scale stop: a crawl-scale near-dup graph contracts
    geometrically until the label graph fits the driver."""
    from .graph import connected_components, union_find_min

    pairs = ngram_jaccard_pairs(docs, k=k, threshold=threshold, max_df=max_df)
    edges = pairs.select("doc_a", "doc_b")  # reads the persisted pair set
    n_edges = edges.count()
    spark = docs.sparkSession
    if n_edges <= driver_max_edges:
        rows = edges.collect()
        pairs.unpersist()
        mapping = union_find_min((r["doc_a"], r["doc_b"]) for r in rows)
        nodes = {n for r in rows for n in (r["doc_a"], r["doc_b"])}
        out = spark.createDataFrame(
            [(int(d), int(mapping.get(d, d))) for d in sorted(nodes)],
            "doc_id long, cluster_id long",
        )
    else:
        cc = connected_components(edges, max_driver_edges=driver_max_edges)
        # connected_components materializes its own barriers, so the pair
        # cache is no longer needed once the first action inside it ran;
        # it returns a plan over those barrier files
        pairs.unpersist()
        out = cc.select(
            F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
        )
    return out.select(
        "doc_id", "cluster_id", (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper")
    )


def oracle_dedup_clusters_sql(
    k: int = 8, threshold: float = 0.5, max_df: int = 1000
) -> str:
    """DuckDB mirror: recursive closure over the same pair graph (pair
    components are near-dup clusters — small — so the closure is cheap).
    Needs a WITH RECURSIVE prefix."""
    inner = oracle_ngram_jaccard_sql(k=k, threshold=threshold, max_df=max_df)
    idx = inner.rfind("\nSELECT")
    ctes, body = inner[:idx].strip().rstrip(","), inner[idx + 1 :]
    return f"""{ctes},
dc_pairs AS (SELECT doc_a, doc_b FROM ({body})),
dc_nodes AS (SELECT doc_a AS d FROM dc_pairs UNION SELECT doc_b FROM dc_pairs),
dc_edges AS (
  SELECT doc_a AS a, doc_b AS b FROM dc_pairs
  UNION ALL SELECT doc_b, doc_a FROM dc_pairs
),
dc_walk(d, label) AS (
  SELECT d, d FROM dc_nodes
  UNION
  SELECT e.a, w.label FROM dc_walk w JOIN dc_edges e ON e.b = w.d
)
SELECT d AS doc_id, min(label) AS cluster_id,
       d = min(label) AS is_keeper
FROM dc_walk GROUP BY d"""


def oracle_minhash_lsh_sql(
    k: int = 8, n_hashes: int = 64, bands: int = 8, threshold: float = 0.5
) -> str:
    """DuckDB SQL reproducing minhash_lsh_pairs exactly (portable base
    hash, same permutation constants, same md5 band keys). Signature
    elements live as n_hashes min() aggregate columns m0..m{n-1}."""
    rows = n_hashes // bands
    params = _perm_params(n_hashes)
    mins = ", ".join(
        f"min((g * {a} + {b}) % {_MH_PRIME}) AS m{j}"
        for j, (a, b) in enumerate(params)
    )
    band_rows = " UNION ALL ".join(
        "SELECT *, {b} AS band, md5({cc}) AS bh FROM msig".format(
            b=b,
            cc=" || ',' || ".join(
                f"CAST(m{b * rows + i} AS STRING)" for i in range(rows)
            ),
        )
        for b in range(bands)
    )
    eq_sum = " + ".join(
        f"(CASE WHEN sa.m{j} = sb.m{j} THEN 1 ELSE 0 END)" for j in range(n_hashes)
    )
    return f"""
mg0 AS (
  SELECT d.doc_id, substring(d.text, CAST(p.pos AS INT), {k}) AS gs
  FROM documents d,
       LATERAL (SELECT unnest(range(1, greatest(1, length(d.text) - {k - 1}) + 1)) AS pos) p
),
mgrams AS (SELECT doc_id, {phash.poly8_sql('gs', phash.B1)} AS g FROM mg0),
msig AS (SELECT doc_id, {mins} FROM mgrams GROUP BY doc_id),
mbanded AS ({band_rows}),
mcand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM mbanded a JOIN mbanded b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
mscored AS (
  SELECT c.doc_a, c.doc_b, ({eq_sum}) / {n_hashes} AS est_jaccard
  FROM mcand c
  JOIN msig sa ON sa.doc_id = c.doc_a
  JOIN msig sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, est_jaccard FROM mscored WHERE est_jaccard >= {threshold}"""


# ---------------------------------------------------------------------------
# SimHash (64-bit) — JVM expressions
# ---------------------------------------------------------------------------

SIMHASH_BITS = 62  # two 31-bit portable hashes packed: h1 * 2^31 + h2


def simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash: long): sign-sum over portable token-hash bits.

    Token list via split on whitespace; token hash = two independent
    31-bit polynomial hashes (functions/phash.py) packed into 62 bits,
    so the DuckDB oracle reproduces it exactly. Per-bit majority is one
    aggregate() per bit over the staged token-hash array `_th` (62 flat
    JVM expressions, one pass, no shuffle)."""
    toks = "filter(split(text, '\\\\s+'), t -> t <> '')"
    th = (
        f"transform({toks}, t -> "
        f"{phash.poly8_sql('t', phash.B1)} * 2147483648L + {phash.poly8_sql('t', phash.B2)})"
    )
    bit_sums = [
        (
            f"aggregate(_th, 0L, "
            f"(acc, h) -> acc + CASE WHEN shiftright(h, {j}) & 1 = 1 THEN 1 ELSE -1 END)"
        )
        for j in range(SIMHASH_BITS)
    ]
    packed = " + ".join(
        f"(CASE WHEN ({s}) > 0 THEN {1 << j}L ELSE 0L END)"
        for j, s in enumerate(bit_sums)
    )
    return (
        _spread(docs).withColumn("_th", F.expr(th))
        .select("doc_id", F.expr(packed).alias("simhash"))
    )


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


def oracle_simhash_pairs_sql(max_hamming: int = 8) -> str:
    """DuckDB SQL reproducing simhash_near_pairs exactly. Tokens via
    regexp split; the per-bit majority is SIMHASH_BITS sum() aggregates;
    docs with zero tokens keep simhash 0 via the LEFT JOIN."""
    h1 = phash.poly8_sql("tok", phash.B1)
    h2 = phash.poly8_sql("tok", phash.B2)
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    packed = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(SIMHASH_BITS)
    )
    blocks = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS blk, (simhash >> {b * 16}) & 65535 AS bv FROM sh"
        for b in range(4)
    )
    return rf"""
stoks AS (
  SELECT d.doc_id, t.tok
  FROM documents d,
       LATERAL (SELECT unnest(regexp_split_to_array(d.text, '\s+')) AS tok) t
  WHERE t.tok <> ''
),
sth AS (SELECT doc_id, {h1} * 2147483648 + {h2} AS h FROM stoks),
sbits AS (SELECT doc_id, {bit_sums} FROM sth GROUP BY doc_id),
sh0 AS (SELECT doc_id, {packed} AS simhash FROM sbits),
sh AS (
  SELECT d.doc_id, coalesce(s.simhash, 0) AS simhash
  FROM (SELECT DISTINCT doc_id FROM documents) d
  LEFT JOIN sh0 s ON s.doc_id = d.doc_id
),
sblocks AS ({blocks}),
spairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
  FROM sblocks a JOIN sblocks b
    ON a.blk = b.blk AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM spairs WHERE hamming <= {max_hamming}"""


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicates
# ---------------------------------------------------------------------------

def embedding_near_dups_allpairs(
    embeddings: DataFrame, threshold: float = 0.35
) -> DataFrame:
    """Naive all-pairs form — BroadcastNestedLoopJoin, O(N^2) row pairs.
    Kept ONLY as the pytest equivalence oracle for the blocked kernel
    below; never the production path (VERDICT r1 #3/#4)."""
    from .vectors import cosine_expr

    a = embeddings.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"))
    b = embeddings.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine_expr("emb_a", "emb_b"), 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


#: candidate-stage slack below the requested cosine threshold: the final
#: rerank (and the DuckDB oracle) compare round(cos, 6) >= threshold, so a
#: true cosine as low as threshold - 5e-7 still rounds up and must survive
#: candidate generation; the extra 1e-9 covers BLAS-vs-fold association
#: drift (ADVICE r2 #1 — threshold - 1e-9 alone missed the rounding window)
CAND_SLACK = 5e-7 + 1e-9


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.35,
    mode: str = "blocked",
    block_rows: int = 256,
    n_groups: int | None = None,
    max_group_rows: int = 500_000,
    lsh_bits: int = 12,
    lsh_tables: int = 8,
) -> DataFrame:
    """Vector-space near-dup pairs: (id_a < id_b, cos >= threshold).

    Both modes share the exact JVM-side rerank (same fold expression as
    the DuckDB oracle: round(cos, 6) >= threshold applied bit-identically
    to every candidate); they differ only in candidate generation:

    mode='blocked' — EXACT at any threshold: triangle-partitioned all-
      pairs (Okcan & Riedewald's theta-join triangle scheme). Rows hash
      into G groups; each row is replicated to its G (bi, bj) group-pair
      tasks, so the SHUFFLE is N·G rows with G ≈ sqrt(2 · parallelism)
      (vs N·B with B = N/block_rows blocks in the round-2 plan — r2 #3:
      replication is now decoupled from the kernel's memory blocking,
      which happens INSIDE the task via `block_rows`-row matmul chunks).
      FLOPs stay O(N²d/2) — inherent to the exact contract.
    mode='lsh' — sub-quadratic: sign-LSH (random-hyperplane) bucket
      candidates over `lsh_tables` independent tables of `lsh_bits` bits,
      then the exact rerank. NOT exact: a qualifying pair is missed with
      probability (1 - (1 - θ/π)^bits)^tables per pair (θ = angle at the
      threshold); at cos >= 0.8 / 12 bits / 8 tables that is < 0.4%, and
      the candidate-set-equality pytest pins it to zero misses on the
      test corpus. Use for tight-threshold crawls where N²d is infeasible.
    mode='auto' — 'lsh' when threshold >= 0.8, else 'blocked' (loose
      thresholds admit no lossless bucketing; tight ones don't need the
      quadratic sweep). The DEFAULT stays 'blocked': exactness is the
      r2 contract, and trading it for sub-quadratic candidates must be
      an explicit caller choice ('auto'/'lsh'), never a silent function
      of the threshold value.
    """
    if mode == "auto":
        mode = "lsh" if threshold >= 0.8 else "blocked"
    slack = float(threshold) - CAND_SLACK
    if mode == "lsh":
        cand = _signlsh_candidates(embeddings, lsh_bits, lsh_tables)
    else:
        cand = _blocked_candidates(
            embeddings, slack, block_rows, n_groups, max_group_rows
        )
    return _exact_rerank(embeddings, cand, threshold)


def _blocked_candidates(
    embeddings: DataFrame,
    slack: float,
    block_rows: int,
    n_groups: int | None,
    max_group_rows: int,
) -> DataFrame:
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    spark = embeddings.sparkSession
    par = spark.sparkContext.defaultParallelism
    if n_groups is None:
        n = embeddings.count()
        # G(G+1)/2 tasks ≥ parallelism keeps every core busy; the memory
        # clause caps per-task rows at max_group_rows (kernel memory is
        # further bounded by the block_rows matmul chunking)
        n_groups = max(
            math.ceil((math.sqrt(8 * par + 1) - 1) / 2),
            math.ceil(n / max_group_rows),
        )
    G = max(1, n_groups)
    rep = (
        embeddings.select("vec_id", "embedding")
        # pmod, not %: Spark's remainder keeps the dividend's sign, so a
        # negative id (e.g. from a signed hash) would land in a group no
        # task pairs — qualifying pairs would silently vanish
        .withColumn("grp", F.pmod(F.col("vec_id"), F.lit(G)).cast("int"))
        .withColumn("other", F.explode(F.expr(f"sequence(0, {G - 1})")))
        .withColumn("bi", F.least("grp", "other"))
        .withColumn("bj", F.greatest("grp", "other"))
        .drop("other")
    )
    cand_schema = StructType(
        [StructField("id_a", LongType()), StructField("id_b", LongType())]
    )

    def block_pairs(key: tuple, pdf: pd.DataFrame):
        bi, bj = int(key[0]), int(key[1])
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64")})
        if len(pdf) == 0:
            return empty
        ids = pdf["vec_id"].to_numpy()
        grp = pdf["grp"].to_numpy()
        emb = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        nrm = np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-300)
        emb = emb / nrm
        if bi == bj:  # within-group pairs, dedup'd by the id inequality
            ids_a, emb_a, ids_b, emb_b = ids, emb, ids, emb
        else:  # cross-group only: each side is ONE group (halves FLOPs
            # vs the r2 kernel, which matmul'd the mixed task input)
            ia, ib = grp == bi, grp == bj
            ids_a, emb_a, ids_b, emb_b = ids[ia], emb[ia], ids[ib], emb[ib]
        if len(ids_a) == 0 or len(ids_b) == 0:
            return empty
        out_a, out_b = [], []
        for lo in range(0, len(ids_a), block_rows):  # memory-bounded chunks
            sims = emb_a[lo : lo + block_rows] @ emb_b.T
            iu, ju = np.where(sims >= slack)
            ia_, ib_ = ids_a[lo + iu], ids_b[ju]
            ne = ia_ != ib_
            out_a.append(np.minimum(ia_, ib_)[ne])
            out_b.append(np.maximum(ia_, ib_)[ne])
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a) if out_a else np.array([], dtype=np.int64),
             "id_b": np.concatenate(out_b) if out_b else np.array([], dtype=np.int64)}
        )

    return (
        rep.groupBy("bi", "bj")
        .applyInPandas(block_pairs, schema=cand_schema)
        .dropDuplicates(["id_a", "id_b"])
    )


def _signlsh_candidates(
    embeddings: DataFrame, lsh_bits: int, lsh_tables: int
) -> DataFrame:
    """Sign-LSH buckets: `lsh_tables` independent sets of `lsh_bits`
    fixed-seed random hyperplanes; candidates share a (table, bucket) key.
    Bucket join is a uniform equi-join — one shuffle, no N² anywhere."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    dim_row = (
        embeddings.filter(F.col("embedding").isNotNull())
        .select(F.size("embedding").alias("d"))
        .first()  # O(1): first non-null row, no full-table aggregate
    )
    dim = dim_row["d"] if dim_row is not None else None
    if not dim or dim <= 0:  # empty / all-null input → empty candidates
        spark = embeddings.sparkSession
        return spark.createDataFrame([], "id_a long, id_b long")
    planes = np.random.default_rng(2654435761).standard_normal(
        (lsh_tables, lsh_bits, dim)
    )  # fixed seed: run/tile reproducibility, identical across executors
    weights = 1 << np.arange(lsh_bits, dtype=np.int64)

    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("table", IntegerType()),
            StructField("bucket", LongType()),
        ]
    )

    def buckets(batches):
        for pdf in batches:
            emb = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            for t in range(lsh_tables):
                bits = (emb @ planes[t].T) >= 0  # (n, bits)
                code = bits @ weights
                yield pd.DataFrame(
                    {"vec_id": ids, "table": t, "bucket": code}
                )

    from ..session import spread_input as _spread_in

    bk = _spread_in(embeddings.select("vec_id", "embedding")).mapInPandas(
        buckets, schema=out_schema
    )
    a, b = bk.alias("a"), bk.alias("b")
    return (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def _exact_rerank(
    embeddings: DataFrame, cand: DataFrame, threshold: float
) -> DataFrame:
    from .vectors import cosine_expr

    ea = embeddings.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"))
    eb = embeddings.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"))
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
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


# ---------------------------------------------------------------------------
# benchmark-contamination check (test-set decontamination): flag training
# docs that contain k-gram overlap with a probe corpus (benchmark/test
# texts). The standard pre-training hygiene pass next to dedup: a doc
# sharing >= `min_hits` distinct k-grams with any probe is contaminated.
# One shuffle: doc shingles semi-join the (tiny, broadcast) probe shingle
# set, then a per-doc count — no pairwise doc×probe work anywhere.
# ---------------------------------------------------------------------------

def _full_shingles_expr(text_col: str, k: int) -> str:
    """Distinct FULL k-shingles only: texts shorter than k yield none —
    contamination means verbatim k-char overlap, and the ngram-Jaccard
    truncated-gram contract (shingles(): sub-k text hashes as one
    whole-text shingle) would let a 3-char doc "contaminate" on a 3-char
    match (review r3)."""
    return (
        f"CASE WHEN length({text_col}) >= {k} THEN "
        f"array_distinct(transform(sequence(1, length({text_col}) - {k - 1}), "
        f"i -> substring({text_col}, i, {k}))) "
        f"ELSE CAST(array() AS array<string>) END"
    )


def contamination_check(
    docs: DataFrame,
    probes: DataFrame,
    k: int = 12,
    min_hits: int = 1,
) -> DataFrame:
    """(doc_id, n_hits, n_sh, hit_rate) for docs with >= min_hits distinct
    FULL k-shingles that appear in ANY probe text. `probes` needs a
    `text` column; k defaults longer than near-dup shingles (12) —
    contamination cares about verbatim benchmark strings, not fuzzy
    similarity. Docs or probes shorter than k contribute nothing."""
    from pyspark import StorageLevel

    doc_sh = (
        _spread(docs)
        .select("doc_id", F.explode(F.expr(_full_shingles_expr("text", k))).alias("shingle"))
        # feeds BOTH the sizes aggregate and the probe join — persist +
        # eager count or the corpus-wide explode runs twice (the r2
        # dedup_clusters double-evaluation lesson)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    doc_sh.count()
    probe_sh = (
        probes.select(
            F.explode(F.expr(_full_shingles_expr("text", k))).alias("shingle")
        )
        .distinct()
    )
    sizes = doc_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    hits = (
        doc_sh.join(F.broadcast(probe_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )
    out = (
        hits.join(sizes, "doc_id")
        .select(
            "doc_id",
            "n_hits",
            "n_sh",
            F.round(F.col("n_hits") / F.col("n_sh"), 6).alias("hit_rate"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out.count()  # output-sized; lets the big shingle cache go now
    doc_sh.unpersist()
    return out


def oracle_contamination_sql(
    probe_table: str, k: int = 12, min_hits: int = 1
) -> str:
    def sh(tbl: str, cols: str) -> str:
        return (
            f"SELECT DISTINCT {cols} substring(d.text, CAST(p.pos AS INT), {k}) AS shingle "
            f"FROM {tbl} d, LATERAL (SELECT unnest(range(1, "
            f"CASE WHEN length(d.text) >= {k} THEN length(d.text) - {k - 1} + 1 "
            f"ELSE 1 END)) AS pos) p"
        )

    return f"""
ct_doc_sh AS ({sh('documents', 'd.doc_id,')}),
ct_probe_sh AS ({sh(probe_table, '')}),
ct_sizes AS (SELECT doc_id, count(*) AS n_sh FROM ct_doc_sh GROUP BY doc_id),
ct_hits AS (
  SELECT s.doc_id, count(*) AS n_hits
  FROM ct_doc_sh s JOIN ct_probe_sh p ON p.shingle = s.shingle
  GROUP BY s.doc_id HAVING count(*) >= {min_hits}
)
SELECT h.doc_id, h.n_hits, z.n_sh,
       round(CAST(h.n_hits AS DOUBLE) / z.n_sh, 6) AS hit_rate
FROM ct_hits h JOIN ct_sizes z ON z.doc_id = h.doc_id"""


# ---------------------------------------------------------------------------
# canonical-survivor output (round 4): the consumable end of the dedup
# pipeline. dedup_clusters names the clusters; THIS op emits the per-doc
# retention decision for the WHOLE corpus — the frame a curation job
# filters on (`WHERE kept`) to produce the deduplicated training set.
# ---------------------------------------------------------------------------

def dedup_keep_canonical(
    docs: DataFrame, k: int = 8, threshold: float = 0.5, max_df: int = 1000
) -> DataFrame:
    """Every doc → (doc_id, canonical_id, kept): canonical is the cluster
    minimum for near-dup members, the doc itself otherwise; kept is true
    exactly once per canonical id. Cost = dedup_clusters + one left join
    on doc_id. No broadcast hint: the cluster frame is O(near-dup docs),
    which a boilerplate-heavy corpus makes O(corpus) — AQE picks the
    broadcast itself whenever the frame is actually small (review r4;
    same rule as the cap-free ngram strategy at dedup.py:220)."""
    clusters = dedup_clusters(docs, k=k, threshold=threshold, max_df=max_df)
    canon = F.coalesce("cluster_id", F.col("doc_id"))
    return (
        docs.select("doc_id")
        .join(clusters.select("doc_id", "cluster_id"), "doc_id", "left")
        .select(
            "doc_id",
            canon.alias("canonical_id"),
            (canon == F.col("doc_id")).alias("kept"),
        )
    )


def oracle_keep_canonical_sql(
    k: int = 8, threshold: float = 0.5, max_df: int = 1000, table: str = "documents"
) -> str:
    """Clusters oracle (recursive closure) + the left-join retention
    projection. Needs the WITH RECURSIVE prefix like dedup_clusters."""
    inner = oracle_dedup_clusters_sql(k=k, threshold=threshold, max_df=max_df)
    idx = inner.rfind("\nSELECT")
    ctes, body = inner[:idx].strip().rstrip(","), inner[idx + 1 :]
    return f"""{ctes},
kc_cl AS ({body})
SELECT d.doc_id,
       CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS canonical_id,
       coalesce(c.cluster_id, d.doc_id) = d.doc_id AS kept
FROM {table} d LEFT JOIN kc_cl c ON c.doc_id = d.doc_id"""


# ---------------------------------------------------------------------------
# sign-LSH gate corpus (round 4, VERDICT r3 #5): the driver testdata has
# ZERO embedding pairs at cos >= 0.8, so gating the sub-quadratic 'lsh'
# route on it directly would be vacuous. This helper plants deterministic
# near-duplicates — each vector cloned with coordinate 0 scaled 1.5x
# (cos ~ 0.99 at 64 dims) — with arithmetic DuckDB reproduces bit-
# identically, so the lsh route's OUTPUT is value-hash-checked against
# the exact all-pairs oracle on a corpus where recall actually matters.
# ---------------------------------------------------------------------------

LSH_GATE_OFFSET = 1_000_000


def lsh_gate_corpus(embeddings: DataFrame) -> DataFrame:
    """original ∪ perturbed clone (vec_id + LSH_GATE_OFFSET); everything
    cast to array<double> so both engines run the same IEEE arithmetic."""
    base = embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
    )
    clone = embeddings.select(
        (F.col("vec_id") + F.lit(LSH_GATE_OFFSET)).alias("vec_id"),
        F.expr(
            "concat(array(CAST(embedding[0] AS DOUBLE) * 1.5), "
            "transform(slice(embedding, 2, size(embedding) - 1), "
            "x -> CAST(x AS DOUBLE)))"
        ).alias("embedding"),
    )
    return base.unionByName(clone)


def oracle_lsh_gate_sql(threshold: float = 0.8) -> str:
    return f"""
lg_aug AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {LSH_GATE_OFFSET},
         list_concat([CAST(embedding[1] AS DOUBLE) * 1.5],
                     CAST(embedding[2:] AS DOUBLE[]))
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding, b.embedding), 6) AS cos
FROM lg_aug a JOIN lg_aug b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding, b.embedding), 6) >= {threshold}"""


# ---------------------------------------------------------------------------
# substring-level cross-doc dedup (round 6, VERDICT r5 #4): duplicated
# >=k-char SPANS across documents — the granularity between exact-doc and
# line/paragraph dedup that training-corpus curation standardizes on
# (suffix-array span dedup a la Lee et al., here at k-gram resolution).
#
# Pipeline: char k-gram positions per doc -> global document frequency per
# gram (distinct docs) -> keep grams shared by 2..max_df docs -> per-doc
# interval merge of the hit positions (gap <= k keeps overlapping/touching
# k-char windows in one island) -> spans with length >= min_len.
#
# Scale notes: one explode (L rows/doc — same budget fingerprint_frame's
# oracle pays), one hash aggregate for DF, one semi-join back, one
# per-doc window pass. The df cap (`max_df`) bounds hot-gram fanout
# exactly as in ngram_jaccard. The exact all-grams mode (sample_mod=1) is
# the gate configuration (value-checkable, zero recall caveats); the
# 100 TB path is sample_mod=p: CONTENT-DEFINED mod-p gram sampling (keep
# a gram iff hash(gram) % p == 0) cuts the exploded volume, the DF
# aggregate, and the semi-join by ~1/p while staying deterministic and
# engine-portable — both copies of a duplicated substring sample the
# SAME grams, so shared spans still collide; boundaries quantize to the
# sampled positions (span ⊆ the true duplicated region, start/end lose
# ~p*k/2 chars expected) and the merge gap widens to k * p. Keys are md5
# of the gram (portable across engines); a production run would fold to
# a 64-bit fingerprint to shrink the shuffle.
# ---------------------------------------------------------------------------


def duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 20,
    max_df: int = 100,
    min_len: int = 40,
    sample_mod: int = 1,
) -> DataFrame:
    """(doc_id, span_start, span_end, span_len): maximal merged char
    intervals covered by k-grams that appear in >= 2 (and <= max_df)
    distinct documents; only spans >= min_len chars survive.
    span_start/span_end are 1-based inclusive. sample_mod > 1 enables
    the sub-sampled scale mode (see module comment)."""
    from pyspark.sql import Window

    from ..functions import phash
    from ..session import spread_input

    gap = k * max(1, sample_mod)
    # r7 shape: explode the position sequence FIRST, md5 in a plain
    # projection after. The previous transform(..., i -> md5(...)) lambda
    # ran the md5 per element through the INTERPRETED higher-order-function
    # path (no whole-stage codegen inside array lambdas) — the gram pass
    # alone measured 2.5 s of the 5.0 s probe at sf0.1; explode + project
    # is fully codegen'd and computes the identical md5 strings. The CASE
    # guard also closes ADVICE r6 #1: for docs shorter than k chars,
    # sequence(1, 0) yields a DESCENDING [1, 0] and emitted two spurious
    # gram rows (the oracle's range(1, 1) is empty) — now both engines
    # emit zero grams for such docs.
    grams = (
        spread_input(docs)
        .select(
            "doc_id",
            F.col(text_col).alias("_t"),
            F.explode(
                F.when(
                    F.length(text_col) >= k,
                    F.sequence(F.lit(1), F.length(text_col) - F.lit(k - 1)),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("pos"),
        )
        .select(
            "doc_id",
            "pos",
            F.expr(f"md5(CAST(substring(_t, pos, {k}) AS BINARY))").alias("h"),
        )
    )
    if sample_mod > 1:
        grams = grams.filter(
            F.pmod(phash.md5_prefix_value(F.col("h"), 8), F.lit(sample_mod)) == 0
        )
    shared = (
        grams.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= max_df))
        .select("h")
    )
    # no distinct: grams has exactly one row per (doc_id, pos) by
    # construction (posexplode of the position sequence), and a left-semi
    # join cannot duplicate left rows — the oracle's DISTINCT is a no-op
    # spelled out; dropping it here removes a full shuffle of the hit set
    hits = grams.join(shared, "h", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.lag("pos").over(w).isNull() | (F.col("pos") > F.lag("pos").over(w) + gap),
        F.lit(1),
    ).otherwise(F.lit(0))
    islands = hits.withColumn(
        "island",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        )
        .withColumn("span_len", F.col("span_end") - F.col("span_start") + 1)
        .filter(F.col("span_len") >= min_len)
        .select("doc_id", "span_start", "span_end", "span_len")
    )


def oracle_duplicate_spans_sql(
    k: int = 20, max_df: int = 100, min_len: int = 40
) -> str:
    """DuckDB mirror of duplicate_spans (documents view in scope)."""
    return f"""
sd_g AS (
  SELECT d.doc_id, CAST(p.pos AS INT) AS pos,
         md5(substring(d.text, CAST(p.pos AS INT), {k})) AS h
  FROM documents d,
       LATERAL (SELECT unnest(range(1, greatest(0, length(d.text) - {k - 1}) + 1)) AS pos) p
),
sd_shared AS (
  SELECT h FROM sd_g GROUP BY h
  HAVING count(DISTINCT doc_id) BETWEEN 2 AND {max_df}
),
sd_hits AS (
  SELECT DISTINCT doc_id, pos FROM sd_g JOIN sd_shared USING (h)
),
sd_brk AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos > lag(pos) OVER w + {k} THEN 1 ELSE 0 END AS brk
  FROM sd_hits
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sd_isl AS (
  SELECT doc_id, pos,
         CAST(sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS island
  FROM sd_brk
)
SELECT doc_id, span_start, span_end, span_len FROM (
  SELECT doc_id,
         min(pos) AS span_start,
         max(pos) + {k - 1} AS span_end,
         max(pos) + {k - 1} - min(pos) + 1 AS span_len
  FROM sd_isl GROUP BY doc_id, island
) WHERE span_len >= {min_len}"""
