"""Deterministic sampling operators for training-data pipelines.

Train/val/test assignment and per-group quota sampling must be
REPRODUCIBLE (same row → same split on every run, every engine) and
re-runnable incrementally (assignment is a pure function of the key, so
new data never reshuffles old rows). Both operators therefore key off
md5 — available with identical output in Spark and DuckDB — rather than
any RNG: the driver gate value-checks the exact assignment.

Scale notes: hash_split is a narrow projection (no shuffle at all);
stratified_sample is one window per group ordered by the hash — a single
shuffle by group key, with the same salting/AQE options as any grouped
op if a group is hot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 16-bit bucket from the md5 hex prefix: big enough for 0.01%-grain
#: split weights, small enough that the hex→int parse stays 4 characters
#: (the shared Spark/DuckDB SQL subset has no hex-parse builtin — memory
#: lesson: instr('0123456789abcdef', ...) per nibble is the portable form)
N_BUCKETS = 1 << 16


from ..functions.phash import md5_prefix_sql, md5_prefix_value


def _bucket_col(key: str):
    return md5_prefix_value(F.md5(F.col(key).cast("string")), 4)


def _bucket_sql(key: str) -> str:
    return md5_prefix_sql(f"md5(CAST({key} AS STRING))", 4)


def hash_split(
    df: DataFrame,
    key: str = "doc_id",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Assign each row a deterministic split label from md5(key).

    weights: {label: fraction} in iteration order; fractions are
    quantized to 1/65536 boundaries (cumulative integer thresholds), so
    the assignment is exact integer arithmetic — identical in DuckDB."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total_w = sum(weights.values())
    if abs(total_w - 1.0) > 1e-6:
        raise ValueError(
            f"hash_split weights must sum to 1 (got {total_w}); the last "
            "label absorbs only sub-bucket rounding, not missing mass"
        )
    bounds = _cum_bounds(weights)
    b = _bucket_col(key)
    expr = None
    for label, hi in bounds:
        cond = b < F.lit(hi)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return df.withColumn("split", expr)


def _cum_bounds(weights: dict[str, float]) -> list[tuple[str, int]]:
    labels = list(weights)
    acc, bounds = 0.0, []
    for i, label in enumerate(labels):
        acc += weights[label]
        hi = N_BUCKETS if i == len(labels) - 1 else int(round(acc * N_BUCKETS))
        bounds.append((label, hi))
    return bounds


def oracle_hash_split_sql(
    table: str = "documents",
    key: str = "doc_id",
    weights: dict[str, float] | None = None,
    cols: str = "*",
) -> str:
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    bounds = _cum_bounds(weights)
    cases = " ".join(
        f"WHEN ({_bucket_sql(key)}) < {hi} THEN '{label}'" for label, hi in bounds
    )
    return f"SELECT {cols}, CASE {cases} END AS split FROM {table}"


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    key: str = "doc_id",
) -> DataFrame:
    """Up to n_per_group rows per group, chosen by md5-hash order — an
    unbiased, deterministic quota sample (the standard down-weighting of
    over-represented sources in corpus curation). Tie-break on the key
    itself makes the order total, so both engines agree row-for-row."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key).cast("string")), F.col(key)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_group)
        .drop("_rk")
    )


def oracle_stratified_sample_sql(
    table: str, group_col: str, n_per_group: int, key: str = "doc_id",
    cols: str = "*",
) -> str:
    return f"""
SELECT {cols} FROM (
  SELECT *, row_number() OVER (
    PARTITION BY {group_col}
    ORDER BY md5(CAST({key} AS STRING)), {key}) AS _rk
  FROM {table}
) WHERE _rk <= {n_per_group}"""


def mixture_resample(
    df: DataFrame,
    group_col: str,
    targets: dict[str, float],
    key: str = "doc_id",
) -> DataFrame:
    """Deterministic corpus-mixture downsampling: keep each group at a
    rate that moves the composition toward `targets` (fractions of the
    ORIGINAL total; groups absent from `targets` are dropped; rates cap
    at 1 — this operator only removes rows, never duplicates).

    accept_rate(g) = min(1, target_g · N_total / n_g); a row survives iff
    its md5 bucket < rate · 65536 — a pure function of the key, so the
    SAME rows survive on every run/engine and adding new data never
    flips old rows' fate. Two passes: group counts (tiny aggregate),
    then one broadcast-joined filter scan. The threshold arithmetic is
    spelled identically in the oracle SQL (same op order), so the float
    comparison is bit-identical cross-engine."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n_g"))
    spark = df.sparkSession
    total = df.count()
    tgt = spark.createDataFrame(
        [(g, float(t) * total) for g, t in targets.items()],
        f"{group_col} string, _tn double",
    )
    thr = F.least(
        F.lit(float(N_BUCKETS)),
        F.col("_tn") / F.col("_n_g") * F.lit(float(N_BUCKETS)),
    )
    return (
        df.join(F.broadcast(counts.join(tgt, group_col)), group_col)
        .filter(_bucket_col(key) < thr)
        .drop("_n_g", "_tn")
    )


def oracle_mixture_resample_sql(
    table: str,
    group_col: str,
    targets: dict[str, float],
    key: str = "doc_id",
    cols: str = "*",
) -> str:
    """Mirrors mixture_resample exactly: _tn = t * total as a DOUBLE
    product, threshold = least(65536.0, _tn / n_g * 65536.0) in the same
    association order."""
    vals = ", ".join(f"('{g}', CAST({float(t)!r} AS DOUBLE))" for g, t in targets.items())
    return f"""
SELECT {cols} FROM (
  SELECT d.*, count(*) OVER (PARTITION BY d.{group_col}) AS _n_g,
         t._t * (SELECT count(*) FROM {table}) AS _tn
  FROM {table} d
  JOIN (VALUES {vals}) t({group_col}, _t) USING ({group_col})
)
WHERE ({_bucket_sql(key)})
      < least(CAST({N_BUCKETS} AS DOUBLE), _tn / _n_g * CAST({N_BUCKETS} AS DOUBLE))"""


def weighted_sample(
    df: DataFrame, weight_col: str, n: int, key: str = "doc_id"
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES): each row draws u from the md5 bucket of
    its key (no RNG — reproducible across runs, partitions, and engines)
    and ranks by ln(u)/w, a monotone transform of the classic u^(1/w)
    key; the top-n ranks are the sample, inclusion probability
    proportional to weight. Quality-weighted corpus selection without a
    seed to manage.

    Plan: narrow projection + TakeOrderedAndProject (per-partition
    partial top-n, n rows to the driver — no global sort). Rows with
    non-positive weight are excluded (they have probability 0 and the
    rank key is undefined). The key is rounded to 6 dp with a `key`
    tiebreak so both engines agree on the cut (ln is 1-ulp per engine)."""
    u = (_bucket_col(key).cast("double") + 0.5) / float(N_BUCKETS)
    es = F.round(F.log(u) / F.col(weight_col), 6)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("es_key", es)
        .orderBy(F.col("es_key").desc(), F.col(key).asc())
        .limit(n)
        .select(key, weight_col, "es_key")
    )


def oracle_weighted_sample_sql(
    table: str, weight_col: str, n: int, key: str = "doc_id"
) -> str:
    u = f"(({_bucket_sql(key)}) + 0.5) / {float(N_BUCKETS)}"
    es = f"round(ln({u}) / {weight_col}, 6)"
    return f"""
ws_ranked AS (
  SELECT {key}, {weight_col}, {es} AS es_key,
         row_number() OVER (ORDER BY {es} DESC, {key}) AS rn
  FROM {table} WHERE {weight_col} > 0
)
SELECT {key}, {weight_col}, es_key FROM ws_ranked WHERE rn <= {n}"""


def _patch_id_col(bx, by, patch: int):
    """Packed patch id from fine block coords (floor-div by `patch`;
    FLOOR over double is exact for |coord| < 2^26 and matches the
    DuckDB spelling, unlike integer '/' which truncates toward zero)."""
    from ..spatial.cells import CY_BIAS, PACK

    px_ = F.floor(bx.cast("double") / float(patch)).cast("long")
    py_ = F.floor(by.cast("double") / float(patch)).cast("long")
    return px_ * F.lit(PACK) + py_ + F.lit(CY_BIAS)


def spatial_block_split(
    pts: DataFrame,
    id_col: str = "objectid",
    block_size: float = 500.0,
    patch: int = 5,
    ring: int = 1,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Leakage-free spatial train/val/test split (round 5).

    Standard geospatial-ML practice: randomly splitting POINTS leaks —
    a training point metres from a test point shares its spatial
    signal. The unit of assignment here is a CONTIGUOUS PATCH (patch ×
    patch fine blocks of block_size metres): every point gets its
    patch's md5-hash label, and a would-be train point whose fine block
    lies within `ring` Chebyshev fine blocks of a test patch is
    relabeled 'buffer' (the exclusion band callers drop from training).
    Patch-level assignment keeps test regions contiguous, so the buffer
    is a patch-border band (~ring·4/patch of the test fraction), not
    the 1-(1-p)^9 blanket a scattered per-block split would produce
    (measured: 56% of all points at sf0.01 with scattered 2 km blocks
    vs 11% with 5×5 patches — the first-cut design was methodologically
    wrong, not just slow). Assignment is a pure function of
    coordinates — incremental-safe like hash_split, and new data never
    reshuffles old patches.

    Plan: ONE narrow Project, no shuffle, no join — the neighbor check
    evaluates adjacent patch labels inline (whole-stage codegen), so the
    operator scales exactly like hash_split. md5 is the dominant per-row
    cost, so the check uses the patch-product identity: the (2r+1)²
    block neighborhood spans at most 2 patch columns × 2 patch rows
    (valid iff 2·ring < patch — enforced; a span longer than one patch
    can straddle 3 columns and the corner check would silently skip the
    middle one, re-introducing the leakage this op exists to prevent),
    hence the distinct neighbor patches are exactly
    {px_lo,px_hi} × {py_lo,py_hi} — 4 bucket evaluations instead of 8
    (the own-patch term the product adds is vacuous: a train row's own
    bucket is below the test range by definition; output verified
    bit-identical to the 8-neighbor reference). 3.3 M rows/s at 27.4 M
    points on balanced input — md5 remains the per-row cost, traded
    deliberately for the zero-shuffle plan.

    Returns (id_col, block, split) with split in
    {train, val, test, buffer}; block is the FINE block id."""
    from ..spatial.cells import CY_BIAS, PACK
    from ..functions.phash import md5_prefix_value

    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    labels = list(weights)
    bounds = _cum_bounds(weights)
    test_lo = bounds[-2][1] if len(bounds) > 1 else 0

    bx = F.floor(F.col("px") / F.lit(float(block_size))).cast("long")
    by = F.floor(F.col("py") / F.lit(float(block_size))).cast("long")
    base = pts.select(
        F.col(id_col),
        bx.alias("bx"),
        by.alias("by"),
        (bx * F.lit(PACK) + by + F.lit(CY_BIAS)).alias("block"),
    )

    def bucket(pid):
        return md5_prefix_value(F.md5(pid.cast("string")), 4)

    expr = None
    own = bucket(_patch_id_col(F.col("bx"), F.col("by"), patch))
    for label, hi in bounds:
        cond = own < F.lit(hi)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    if 2 * ring >= patch:
        raise ValueError(
            f"2*ring ({2 * ring}) must be < patch ({patch}) for the 2x2 "
            "patch-product neighbor identity: a (2*ring+1)-block span can "
            "touch 3 patch columns once it exceeds patch blocks, and the "
            "4-corner check would miss the middle column (ADVICE r5)"
        )
    from ..spatial.cells import CY_BIAS as _CYB, PACK as _PK

    def pcoord(c):
        return F.floor(c.cast("double") / float(patch)).cast("long")

    near_test = F.lit(False)
    for pxc in (pcoord(F.col("bx") - ring), pcoord(F.col("bx") + ring)):
        for pyc in (pcoord(F.col("by") - ring), pcoord(F.col("by") + ring)):
            nb = bucket(pxc * F.lit(_PK) + pyc + F.lit(_CYB))
            near_test = near_test | (nb >= F.lit(test_lo))
    split = F.when(
        (expr == F.lit(labels[0])) & near_test, F.lit("buffer")
    ).otherwise(expr)
    return base.select(id_col, "block", split.alias("split"))


def oracle_spatial_block_split_sql(
    table: str = "addrpnts",
    id_col: str = "objectid",
    block_size: float = 500.0,
    patch: int = 5,
    ring: int = 1,
    weights: dict[str, float] | None = None,
) -> str:
    """DuckDB oracle: identical fine-block / patch / bucket / neighbor
    arithmetic, spelled with the shared SQL subset (FLOOR over DOUBLE,
    md5-prefix buckets). Needs the source-point CTE in scope."""
    from ..spatial.cells import CY_BIAS, PACK

    if 2 * ring >= patch:
        raise ValueError(
            f"2*ring ({2 * ring}) must be < patch ({patch}) — same corner "
            "identity bound as spatial_block_split (ADVICE r5)"
        )
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    labels = list(weights)
    bounds = _cum_bounds(weights)
    test_lo = bounds[-2][1] if len(bounds) > 1 else 0

    def pid(dx: int, dy: int) -> str:
        return (
            f"CAST(FLOOR(CAST(bx + {dx} AS DOUBLE) / {float(patch)}) AS BIGINT)"
            f" * {PACK} + "
            f"CAST(FLOOR(CAST(by + {dy} AS DOUBLE) / {float(patch)}) AS BIGINT)"
            f" + {CY_BIAS}"
        )

    cases = " ".join(
        f"WHEN ({_bucket_sql(pid(0, 0))}) < {hi} THEN '{label}'"
        for label, hi in bounds
    )
    def pc(col: str, d: int) -> str:
        return f"CAST(FLOOR(CAST({col} + {d} AS DOUBLE) / {float(patch)}) AS BIGINT)"

    corner_pids = [
        pc("bx", dx) + f" * {PACK} + " + pc("by", dy) + f" + {CY_BIAS}"
        for dx in (-ring, ring)
        for dy in (-ring, ring)
    ]
    near = " OR ".join(
        f"({_bucket_sql(p)}) >= {test_lo}" for p in corner_pids
    )
    return f"""
sbs_pts AS (
  SELECT {id_col},
         CAST(FLOOR(px / {float(block_size)}) AS BIGINT) AS bx,
         CAST(FLOOR(py / {float(block_size)}) AS BIGINT) AS by
  FROM {table}
),
sbs_lab AS (
  SELECT {id_col}, bx * {PACK} + by + {CY_BIAS} AS block,
         CASE {cases} END AS split0,
         ({near}) AS near_test
  FROM sbs_pts
)
SELECT {id_col}, block,
       CASE WHEN split0 = '{labels[0]}' AND near_test
            THEN 'buffer' ELSE split0 END AS split
FROM sbs_lab"""
