from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    from roadgrinder_spark.session import build_session

    s = build_session(app_name="rg-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm_datetimes(df: pd.DataFrame) -> pd.DataFrame:
    # Spark and DuckDB hand pandas different datetime resolutions
    # (ns vs us); values are identical — unify before comparing
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df


def assert_frames_match(sdf, duck_df: pd.DataFrame, name: str = "") -> None:
    """Order-insensitive full-frame equality (the driver's compare)."""
    sp = _norm_datetimes(sdf.toPandas())
    duck_df = _norm_datetimes(duck_df)
    cols = sorted(sp.columns)
    assert sorted(duck_df.columns) == cols, f"{name}: schema {cols} vs {sorted(duck_df.columns)}"
    sp = sp[cols].sort_values(cols).reset_index(drop=True)
    dk = duck_df[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(sp, dk, check_dtype=False, obj=name or "frame")
