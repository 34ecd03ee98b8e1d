"""Span-document substrate: pack/unpack roundtrip and the per-row
invariant from BASELINE.json input_hint — span-sequence equality
(kind, text, media_ref, order)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from roadgrinder_spark import datagen
from roadgrinder_spark.operators import media, spans

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def packed(spark):
    r = datagen.derive_roads(spark, SF_DIR)
    p = datagen.derive_addrpnts(spark, SF_DIR)
    return spans.pack_documents(r, p).cache()


def test_span_sequence_invariant(spark, packed):
    """Offsets strictly increase within every doc; kinds alternate
    attr/media; media spans carry a non-empty media_ref."""
    checks = packed.select(
        F.expr(
            "aggregate(slice(spans, 2, size(spans) - 1), "
            "struct(element_at(spans, 1).offset AS prev, true AS ok), "
            "(acc, s) -> struct(s.offset AS prev, acc.ok AND s.offset > acc.prev AS ok)"
            ").ok"
        ).alias("monotone"),
        F.expr(
            "forall(spans, s -> (s.kind = 'media' AND s.media_ref <> '') OR "
            "(s.kind <> 'media' AND s.text <> ''))"
        ).alias("payloads"),
    ).collect()
    assert all(r["monotone"] and r["payloads"] for r in checks)


def test_roundtrip_roads(spark, packed):
    r = datagen.derive_roads(spark, SF_DIR)
    back = spans.unpack_roads(packed).select(*r.columns)
    a = r.toPandas().sort_values("objectid").reset_index(drop=True)
    b = back.toPandas().sort_values("objectid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_roundtrip_addrpnts(spark, packed):
    p = datagen.derive_addrpnts(spark, SF_DIR)
    back = spans.unpack_addrpnts(packed).select(*p.columns)
    a = p.toPandas().sort_values("objectid").reset_index(drop=True)
    b = back.toPandas().sort_values("objectid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_media_features_deterministic_stub(spark, packed):
    mf = media.extract_media_features(packed)
    a = mf.toPandas().sort_values(["doc_id", "media_ref"]).reset_index(drop=True)
    b = media.extract_media_features(packed.repartition(7)).toPandas().sort_values(
        ["doc_id", "media_ref"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a["width"] >= 64).all() and (a["features"].map(len) == 16).all()


def test_media_resize_and_frame_sample(spark, packed):
    feats = media.extract_media_features(packed)
    rs = media.resize_media(feats, max_dim=256).toPandas()
    assert ((rs["resized_w"] <= 256) & (rs["resized_h"] <= 256)).all()
    # aspect preserved within ceil rounding
    import numpy as np

    ratio = rs["width"] / rs["height"]
    ratio2 = rs["resized_w"] / rs["resized_h"]
    # ceil rounding on small target dims distorts extreme aspect ratios
    assert np.allclose(ratio, ratio2, rtol=0.1)
    fs = media.frame_sample(packed.limit(5))
    counts = fs.groupBy("media_ref").count().toPandas()
    assert (counts["count"] >= 1).all()
