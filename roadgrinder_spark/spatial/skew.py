"""Explicit heavy-hitter salting for skewed equi-joins (M4, north_star:
"explicit salting of hot H3 cells (dense urban grids)").

AQE's skew-join splitting only helps sort-merge joins after the fact; for
the worst Zipfian cells (downtown grids where one cell holds 10^8 points
at the 10^12-doc design point) we pre-split the key space:

  * detect hot keys with a cheap groupBy().count() (tiny output: only keys
    above threshold survive) and BROADCAST them;
  * big side:   salt = pmod(hash(row id), n_salt) for hot keys, else 0;
  * small side: replicate hot-key rows n_salt times (explode sequence).

Join on (key, salt) is then uniform. Result set is provably identical to
the unsalted join: each big-side row carries exactly one salt value and
the replicated side contains that salt exactly once per original row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Keys whose row count exceeds threshold. Output is tiny (broadcastable)."""
    return df.groupBy(key).count().filter(F.col("count") > threshold).select(key)


def salted_cell_join(
    points: DataFrame,
    cover: DataFrame,
    threshold: int = 2_000_000,
    n_salt: int = 16,
    key: str = "cell",
    big_row_id: str = "point_id",
) -> DataFrame:
    """Inner join points⋈cover on `key` with hot keys salted n_salt ways.

    `points` is the big side (one row per point), `cover` the replicable
    side (segment cells). Equivalent to points.join(cover, key).
    """
    hot = hot_keys(points, key, threshold).withColumn("_hot", F.lit(True))
    big = points.join(F.broadcast(hot), key, "left").withColumn(
        "_salt",
        F.when(
            F.col("_hot").isNotNull(),
            F.pmod(F.hash(F.col(big_row_id)), F.lit(n_salt)),
        ).otherwise(F.lit(0)),
    ).drop("_hot")
    rep = cover.join(F.broadcast(hot), key, "left").withColumn(
        "_salt",
        F.explode(
            F.when(
                F.col("_hot").isNotNull(),
                F.sequence(F.lit(0), F.lit(n_salt - 1)),
            ).otherwise(F.array(F.lit(0)))
        ),
    ).drop("_hot")
    # shuffle-hash, matching knn_join's default: rebuilding a broadcast
    # relation of the (salt-expanded) cover per job measured slower than
    # the exchange, and the salted path exists precisely because the key
    # space is too hot/big to broadcast away
    return big.join(rep.hint("shuffle_hash"), [key, "_salt"]).drop("_salt")


def salted_equi_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_row_id: str,
    threshold: int = 2_000_000,
    n_salt: int = 16,
) -> DataFrame:
    """General hot-key salted inner equi-join on composite `keys`.

    Use for attribute-skewed joins too (e.g. the geocode matcher where
    'MAIN' + one posttype dominates a metro's address points).
    """
    kc = F.struct(*[F.col(k) for k in keys])
    hot = (
        left.groupBy(*keys)
        .count()
        .filter(F.col("count") > threshold)
        .select(*keys)
        .withColumn("_hot", F.lit(True))
    )
    big = left.join(F.broadcast(hot), keys, "left").withColumn(
        "_salt",
        F.when(
            F.col("_hot").isNotNull(),
            F.pmod(F.hash(F.col(left_row_id)), F.lit(n_salt)),
        ).otherwise(F.lit(0)),
    ).drop("_hot")
    rep = right.join(F.broadcast(hot), keys, "left").withColumn(
        "_salt",
        F.explode(
            F.when(
                F.col("_hot").isNotNull(), F.sequence(F.lit(0), F.lit(n_salt - 1))
            ).otherwise(F.array(F.lit(0)))
        ),
    ).drop("_hot")
    _ = kc  # composite key struct kept for future stats hooks
    return big.join(rep.hint("shuffle_hash"), [*keys, "_salt"]).drop("_salt")
