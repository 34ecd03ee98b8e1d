"""Event-table operators: time-bucket rollup and gap sessionization.

The reference is batch-only (SURVEY.md §2.8); these cover the analytics
surface a training-data pipeline needs over an append-only event log. The
streaming variants live in roadgrinder_spark/streaming/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Per (hour, event_type): count + sum(value).

    sum is rounded to 3 dp in BOTH engines — double addition order across
    partitions is nondeterministic, so the raw sum is not hash-stable;
    3 dp absorbs the drift (values have 2 dp, groups are ~thousands).
    """
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 3).alias("sum_value"),
        )
    )


ORACLE_HOURLY_ROLLUP = (
    "SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n, "
    "round(sum(value), 3) AS sum_value FROM events GROUP BY 1, 2"
)


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap from
    the previous event exceeds gap_minutes. Returns per-session rows
    (user_id, session_idx, n_events, started, ended)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet TIMESTAMP_NTZ → epoch seconds (session TZ is pinned UTC, so
    # this agrees with DuckDB's epoch())
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    flagged = events.withColumn(
        "_new", F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_idx",
        F.sum("_new").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    # started/ended as epoch MICROSECONDS BIGINT: raw TIMESTAMP_NTZ min/max
    # round-trips with different serialization between Spark and DuckDB
    # (round-1 driver gate: rows/schema matched, hash did not). Canonicalize
    # in the query contract, not the comparator (VERDICT r1 #1). Integer
    # micros (unix_micros / epoch_us) avoid the float rounding that
    # second-granularity epoch() would introduce in DuckDB.
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(micros).alias("started"),
        F.max(micros).alias("ended"),
    )


def oracle_sessionize_sql(gap_minutes: int = 30) -> str:
    return f"""
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR epoch(ts) - epoch(prev_ts) > {gap_minutes * 60}
            THEN 1 ELSE 0 END AS _new
  FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events)
),
sess AS (
  SELECT *, sum(_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       CAST(min(epoch_us(ts)) AS BIGINT) AS started,
       CAST(max(epoch_us(ts)) AS BIGINT) AS ended
FROM sess GROUP BY user_id, session_idx"""


def top_users_by_value(events: DataFrame, per_type: int = 3) -> DataFrame:
    """Per event_type: top-N users by total value (window rank).
    Rounded total for hash stability, rank on the rounded value with
    user_id tiebreak so both engines agree on order."""
    totals = events.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 3).alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id").asc()
    )
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_type)
        .select("event_type", "user_id", "total_value", "rank")
    )


def oracle_top_users_sql(per_type: int = 3) -> str:
    return f"""
totals AS (
  SELECT event_type, user_id, round(sum(value), 3) AS total_value
  FROM events GROUP BY 1, 2
)
SELECT event_type, user_id, total_value, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY total_value DESC, user_id) AS rank
  FROM totals
) WHERE rank <= {per_type}"""


def events_cube(events: DataFrame) -> DataFrame:
    """CUBE over (event_type, hour): all grouping-set combinations with
    count + rounded sum — the multi-dimensional rollup surface (absent in
    the reference, SURVEY.md §2.4; standard for training-data dashboards).
    NULL dimension values mark aggregated-out levels in both engines."""
    return (
        events.cube(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 3).alias("sum_value"))
    )


ORACLE_EVENTS_CUBE = (
    "SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n, "
    "round(sum(value), 3) AS sum_value FROM events "
    "GROUP BY CUBE (event_type, date_trunc('hour', ts))"
)


def quantile_label(p: float) -> str:
    """Injective, readable column label for a quantile probability:
    0.0 -> p0, 0.5 -> p50, 0.9 -> p90, 0.99 -> p99, 0.505 -> p505,
    0.001 -> p001, 1.0 -> p100. int(round(p*100)) collapsed distinct
    probabilities (0.5 and 0.505 both -> p50, review r4); the
    decimal-digit string never does. The endpoints need their own cases
    (ADVICE r4: both used to yield 'p00'), and anything outside [0, 1]
    is not a probability — raise rather than mint a colliding label."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"quantile probability out of range [0, 1]: {p}")
    if p == 0.0:
        return "p0"
    if p == 1.0:
        return "p100"
    g = f"{p:g}"
    frac = g.split(".")[1] if "." in g else "0"
    return "p" + (frac.ljust(2, "0") if len(frac) < 2 else frac)


def route_exact_quantiles(
    events: DataFrame, exact_group_rows: int = 5_000_000
) -> bool:
    """Routing probe for event_quantiles(mode='auto'): True iff the
    largest event_type group fits the exact-percentile buffer bound.
    One count aggregate + a scalar max to the driver — the probe itself
    never materializes group values."""
    row = (
        events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()
    )
    mx = row[0]["mx"] if row else 0
    return (mx or 0) <= exact_group_rows


def event_quantiles(
    events: DataFrame,
    ps: tuple[float, ...] = (0.5, 0.9, 0.99),
    mode: str = "auto",
    exact_group_rows: int = 5_000_000,
) -> DataFrame:
    """Per-event_type value percentiles (linear interpolation): Spark's
    `percentile` aggregate and DuckDB's `quantile_cont` both compute
    v[l] + (idx - l) * (v[l+1] - v[l]) at idx = p * (n - 1) over the
    sorted values, so the exact quantile is cross-engine checkable.
    Rounded to 6 dp: the interpolation multiply is the one place the two
    engines may differ in the last ulp.

    Scale routing (VERDICT r4 #5 — the caller no longer has to read a
    docstring caveat): exact `percentile` buffers each group's values,
    which is fine only under a per-group row bound. mode='auto' probes
    the largest group (route_exact_quantiles) and switches to
    `approx_percentile` (GK sketch, bounded state) when any group
    exceeds `exact_group_rows`; mode='exact'/'approx' force a path."""
    if mode == "auto":
        mode = "exact" if route_exact_quantiles(events, exact_group_rows) else "approx"
    if mode == "exact":
        aggs = [
            F.round(F.expr(f"percentile(value, {p})"), 6).alias(quantile_label(p))
            for p in ps
        ]
    elif mode == "approx":
        aggs = [
            F.round(
                F.expr(f"approx_percentile(value, {p}, 10000)"), 6
            ).alias(quantile_label(p))
            for p in ps
        ]
    else:
        raise ValueError(f"mode must be auto|exact|approx, got {mode!r}")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), *aggs
    )


def oracle_event_quantiles_sql(ps: tuple[float, ...] = (0.5, 0.9, 0.99)) -> str:
    qs = ", ".join(
        f"round(quantile_cont(value, {p}), 6) AS {quantile_label(p)}" for p in ps
    )
    return (
        f"SELECT event_type, count(*) AS n, {qs} FROM events GROUP BY event_type"
    )


def asof_join(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
) -> DataFrame:
    """AS-OF join within the event log: for each `left_type` event, the
    most recent `right_type` event of the SAME user at or before its
    timestamp (ties on ts resolved to the highest event_id — a total,
    engine-portable order). Spark has no ASOF join operator; the
    distributed form is the standard union-and-carry window: tag both
    sides, sort per user by (ts, side, event_id), and carry the last
    right-side id/ts forward with last(..., ignorenulls) — ONE shuffle by
    user_id, no range self-join, no point-per-point probe.

    Returns (event_id, user_id, ts_us, matched_event_id, matched_ts_us,
    lag_us); unmatched left events carry nulls. Timestamps are epoch
    micros BIGINT (the cross-engine hash-stable form)."""
    tagged = (
        events.filter(F.col("event_type").isin(left_type, right_type))
        .select(
            "event_id",
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            (F.col("event_type") == right_type).alias("is_right"),
        )
    )
    # rights sort BEFORE lefts at equal ts (descending boolean), so an
    # equal-timestamp right event is visible to the left row
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us"), F.col("is_right").desc(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.withColumns(
        {
            "matched_event_id": F.last(
                F.when(F.col("is_right"), F.col("event_id")), ignorenulls=True
            ).over(w),
            "matched_ts_us": F.last(
                F.when(F.col("is_right"), F.col("ts_us")), ignorenulls=True
            ).over(w),
        }
    )
    return (
        carried.filter(~F.col("is_right"))
        .select(
            "event_id",
            "user_id",
            "ts_us",
            "matched_event_id",
            "matched_ts_us",
            (F.col("ts_us") - F.col("matched_ts_us")).alias("lag_us"),
        )
    )


def oracle_asof_join_sql(
    left_type: str = "purchase", right_type: str = "click"
) -> str:
    return f"""
ao_tagged AS (
  SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         event_type = '{right_type}' AS is_right
  FROM events WHERE event_type IN ('{left_type}', '{right_type}')
),
ao_carried AS (
  SELECT *,
    last_value(CASE WHEN is_right THEN event_id END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts_us, is_right DESC, event_id
      ROWS UNBOUNDED PRECEDING) AS matched_event_id,
    last_value(CASE WHEN is_right THEN ts_us END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts_us, is_right DESC, event_id
      ROWS UNBOUNDED PRECEDING) AS matched_ts_us
  FROM ao_tagged
)
SELECT event_id, user_id, ts_us, matched_event_id, matched_ts_us,
       ts_us - matched_ts_us AS lag_us
FROM ao_carried WHERE NOT is_right"""


def merge_additive(
    old: DataFrame, delta: DataFrame, keys: list[str], sums: list[str]
) -> DataFrame:
    """Combine two additive-aggregate states (counts/sums roll up by
    addition): full outer on keys, null-safe sum per measure. The core of
    incremental materialized-view refresh — new state = old ⊕ delta."""
    merged = old.select(*keys, *sums).unionByName(delta.select(*keys, *sums))
    return merged.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sums]
    )


def incremental_hourly_rollup(batches: list[DataFrame]) -> DataFrame:
    """Hourly rollup maintained INCREMENTALLY: each event batch only
    computes its own delta rollup and merges additively into the running
    state — no rescan of prior raw events (the continuous-aggregate /
    materialized-view refresh pattern; at scale each merge is a MERGE
    INTO on the rollup table keyed by (hour, event_type)).

    count and sum are additive, so the result equals the batch rollup of
    the concatenated input exactly; sum_value is re-rounded once at the
    END (rounding per batch would break additivity)."""
    if not batches:
        raise ValueError("incremental_hourly_rollup: need at least one batch")
    state = None
    for b in batches:
        delta = b.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        state = delta if state is None else merge_additive(
            state, delta, ["hour", "event_type"], ["n", "sum_value"]
        )
    return state.select(
        "hour", "event_type", "n", F.round("sum_value", 3).alias("sum_value")
    )


def latest_per_key(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Latest event per key (the SCD-style 'current state' materializer /
    changelog compaction): one max(struct) hash aggregate with map-side
    partial combine — never a per-key window sort. Order is (ts micros,
    event_id) — total, engine-portable; payload fields ride in the struct
    and can never flip a winner (event_id is unique)."""
    payload = F.struct(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("event_id"),
        F.col("event_type"),
        F.col("value"),
    )
    return (
        events.groupBy(key)
        .agg(F.max(payload).alias("b"))
        .select(key, F.col("b.ts_us"), F.col("b.event_id"),
                F.col("b.event_type"), F.col("b.value"))
    )


def oracle_latest_per_key_sql(key: str = "user_id") -> str:
    return f"""
lp_r AS (
  SELECT {key}, CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id,
         event_type, value,
         row_number() OVER (PARTITION BY {key}
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
)
SELECT {key}, ts_us, event_id, event_type, value FROM lp_r WHERE rn = 1"""
