"""Cardinality sketches: KMV (k-minimum-values) distinct-count
estimation, engine-portable.

Corpus pipelines need cheap cardinality (distinct URLs / shingles /
users per slice) without a full distinct aggregation. KMV keeps the k
smallest hash values of a column; the k-th smallest, read as a fraction
u of the hash space, estimates the distinct count as (k-1)/u (Bar-Yossef
et al. 2002). Error ~ 1/sqrt(k-2); sketches MERGE by keeping the k
smallest of the union — embarrassingly distributable.

Portability: the hash is md5 (identical in Spark and DuckDB) and hex
strings order lexicographically like the values they encode, so the
k-th smallest hash — and therefore the ESTIMATE itself — is a
deterministic value both engines compute bit-identically: even this
approximate operator is value-hash-checked at the driver gate.

Scale notes: the global form is distinct → TakeOrdered(k) (tiny result);
the per-group form is one shuffle by group + a windowed min-k. At crawl
scale prefer the per-partition min-k + merge (same math) over the full
distinct; the result is identical because min-k of a union is min-k of
the parts' min-k's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: nibbles of the md5 prefix read as the hash-space fraction; 12 nibbles
#: = 48 bits — far below double's 53-bit mantissa, so the fraction (and
#: the estimate) is exact in both engines
PREFIX_NIBBLES = 12
HASH_SPACE = float(16 ** PREFIX_NIBBLES)


from ..functions.phash import md5_prefix_sql, md5_prefix_value


def _prefix_value(h):
    return md5_prefix_value(h, PREFIX_NIBBLES).cast("double")


def _prefix_value_sql(h: str) -> str:
    return f"CAST({md5_prefix_sql(h, PREFIX_NIBBLES)} AS DOUBLE)"


def kmv_distinct(df: DataFrame, col: str = "text", k: int = 256) -> DataFrame:
    """One-row estimate of count(distinct col): (k, n_kept, est_distinct).

    When fewer than k distinct values exist the sketch is exact
    (est = n_kept) — the standard KMV small-cardinality rule."""
    topk = (
        df.select(F.md5(F.col(col).cast("string")).alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    kth = F.max("h")  # max of the k smallest = the k-th smallest
    return topk.agg(
        F.lit(k).alias("k"),
        F.count(F.lit(1)).alias("n_kept"),
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
        )
        .otherwise(F.lit(float(k - 1)) / (_prefix_value(kth) / F.lit(HASH_SPACE)))
        .alias("est_distinct"),
    )


def oracle_kmv_distinct_sql(table: str, col: str = "text", k: int = 256) -> str:
    pv = _prefix_value_sql("max(h)")
    return f"""
SELECT CAST({k} AS INT) AS k, count(*) AS n_kept,
       CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
            ELSE CAST({float(k - 1)!r} AS DOUBLE) / ({pv} / {HASH_SPACE!r})
       END AS est_distinct
FROM (
  SELECT DISTINCT md5(CAST({col} AS STRING)) AS h FROM {table}
  WHERE md5(CAST({col} AS STRING)) IS NOT NULL
  ORDER BY h LIMIT {k}
)"""


def kmv_distinct_per_group(
    df: DataFrame, group_col: str, col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV: (group, n_kept, est_distinct). Two exchanges:
    the distinct partitions by (group, hash), the min-k window
    re-partitions by group — the honest cost model; a single-shuffle
    form would need per-partition min-k pre-aggregation (the merge
    property makes that straightforward when it matters)."""
    w = Window.partitionBy(group_col).orderBy("h")
    topk = (
        df.select(F.col(group_col), F.md5(F.col(col).cast("string")).alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
    )
    kth = F.max("h")
    return topk.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
        )
        .otherwise(F.lit(float(k - 1)) / (_prefix_value(kth) / F.lit(HASH_SPACE)))
        .alias("est_distinct"),
    )


def oracle_kmv_per_group_sql(
    table: str, group_col: str, col: str, k: int = 64
) -> str:
    pv = _prefix_value_sql("max(h)")
    return f"""
SELECT {group_col}, count(*) AS n_kept,
       CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
            ELSE CAST({float(k - 1)!r} AS DOUBLE) / ({pv} / {HASH_SPACE!r})
       END AS est_distinct
FROM (
  SELECT * FROM (
    SELECT {group_col}, h,
           row_number() OVER (PARTITION BY {group_col} ORDER BY h) AS _rk
    FROM (SELECT DISTINCT {group_col}, md5(CAST({col} AS STRING)) AS h FROM {table}
          WHERE md5(CAST({col} AS STRING)) IS NOT NULL)
  ) WHERE _rk <= {k}
)
GROUP BY {group_col}"""


# ---------------------------------------------------------------------------
# Count-Min frequency sketch (Cormode & Muthukrishnan 2005): depth
# independent hash rows × width buckets of integer counters. Registers
# are EXACT aggregates of portable hashes, so both engines compute the
# identical sketch — approximate answers, value-hash-checkable state.
# Point estimate = min over rows of the item's register (one-sided:
# never under-counts). Sketches merge by register addition; the explode
# is depth× the token stream feeding ONE hash aggregate of width·depth
# cells — constant-size state at any corpus size.
# ---------------------------------------------------------------------------

def cm_sketch(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """(r, bucket, cnt) counter registers over occurrences of `col`."""
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    (
                        md5_prefix_value(
                            F.md5(
                                F.concat(
                                    F.lit(f"cm{r}:"), F.col(col).cast("string")
                                )
                            ),
                            4,
                        )
                        % width
                    ).alias("bucket"),
                )
                for r in range(depth)
            ]
        )
    ).alias("rb")
    return (
        df.where(F.col(col).isNotNull())
        .select(rows)
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def oracle_cm_sketch_sql(
    source_sql: str, col: str, depth: int = 4, width: int = 256
) -> str:
    """`source_sql` is a relation producing one row per occurrence with
    column `col`."""
    arms = []
    for r in range(depth):
        h = f"md5('cm{r}:' || CAST({col} AS STRING))"
        arms.append(
            f"SELECT {r} AS r, ({md5_prefix_sql(h, 4)}) % {width} AS bucket "
            f"FROM ({source_sql}) WHERE {col} IS NOT NULL"
        )
    arms = " UNION ALL ".join(arms)
    return f"SELECT r, bucket, count(*) AS cnt FROM ({arms}) GROUP BY r, bucket"


def cm_estimate(
    sketch: DataFrame, items: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-estimate counts for `items[col]`: min over the depth rows of
    each item's register (missing register = 0). One broadcast of the
    (width·depth)-row sketch; never under-counts."""
    probes = items.select(F.col(col)).distinct()
    exploded = probes.select(
        col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (
                            md5_prefix_value(
                                F.md5(
                                    F.concat(
                                        F.lit(f"cm{r}:"), F.col(col).cast("string")
                                    )
                                ),
                                4,
                            )
                            % width
                        ).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(col, F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
    joined = exploded.join(F.broadcast(sketch), ["r", "bucket"], "left")
    return joined.groupBy(col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).alias("est_count")
    )


# ---------------------------------------------------------------------------
# deterministic sampled quantiles (round 4): the mergeable quantile
# sketch in the same hash-threshold style as KMV / mixture_resample.
# The "sketch" is a deterministic md5-threshold row sample (a row is IN
# the sample iff bucket16(md5(key)) < rate * 2^16), so
#   * it is mergeable: sample(A ∪ B) = sample(A) ∪ sample(B) — partitions
#     and incremental batches sketch independently and union;
#   * the approximation is hash-CHECKABLE: both engines materialize the
#     identical sample and the identical interpolated quantiles — unlike
#     t-digest/KLL whose internals are engine-private.
# Error behaves like quantiles of a uniform ~rate·N subsample. For exact
# per-group percentiles at bounded cardinality use events.event_quantiles.
# ---------------------------------------------------------------------------

from .events import quantile_label as _qlabel


def sampled_quantiles(
    df,
    key: str = "event_id",
    value: str = "value",
    group: str = "event_type",
    rate: float = 0.25,
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
):
    """Per-group approximate quantiles over the deterministic sample:
    (group, n_sampled, p50, p90, ...) — every column hash-stable."""
    from .sampling import N_BUCKETS, _bucket_col

    thr = int(round(rate * N_BUCKETS))
    aggs = [
        F.round(F.expr(f"percentile({value}, {p})"), 6).alias(_qlabel(p))
        for p in ps
    ]
    return (
        df.filter(_bucket_col(key) < F.lit(thr))
        .groupBy(group)
        .agg(F.count(F.lit(1)).alias("n_sampled"), *aggs)
    )


def oracle_sampled_quantiles_sql(
    table: str = "events",
    key: str = "event_id",
    value: str = "value",
    group: str = "event_type",
    rate: float = 0.25,
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> str:
    from .sampling import N_BUCKETS, _bucket_sql

    thr = int(round(rate * N_BUCKETS))
    qs = ", ".join(
        f"round(quantile_cont({value}, {p}), 6) AS {_qlabel(p)}" for p in ps
    )
    return (
        f"SELECT {group}, count(*) AS n_sampled, {qs} FROM {table} "
        f"WHERE ({_bucket_sql(key)}) < {thr} GROUP BY {group}"
    )
