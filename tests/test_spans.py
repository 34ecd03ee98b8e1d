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


def test_media_features_deterministic_real_decode(spark, packed):
    """Round 6: features come from PARSING planted BMP/PPM bytes, and are
    partition-invariant."""
    mf = media.extract_media_features(packed)
    a = mf.toPandas().sort_values(["doc_id", "media_ref"]).reset_index(drop=True)
    b = media.extract_media_features(packed.repartition(7)).toPandas().sort_values(
        ["doc_id", "media_ref"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert a["width"].between(media.DIM_MIN, media.DIM_MIN + media.DIM_MOD - 1).all()
    assert (a["sum_r"] <= a["width"] * a["height"] * 255).all()
    # both container formats actually occur in the planted corpus
    fmts = {media.media_spec(r)[3] for r in a["media_ref"].head(200)}
    assert fmts == {"bmp", "ppm"}


def test_media_resize_and_frame_sample(spark, packed):
    feats = media.extract_media_features(packed)
    rs = media.resize_media(feats, max_dim=8).toPandas()
    assert ((rs["resized_w"] <= 8) & (rs["resized_h"] <= 8)).all()
    # the clamp branch is non-vacuous: some dims exceed max_dim=8
    assert ((rs["width"] > 8) | (rs["height"] > 8)).any()
    # aspect preserved within ceil rounding on small dims
    import numpy as np

    big = rs[(rs["width"] > 8) | (rs["height"] > 8)]
    assert (np.maximum(big["resized_w"], big["resized_h"]) == 8).all()
    fs = media.frame_sample(packed.limit(5))
    counts = fs.groupBy("media_ref").count().toPandas()
    assert (counts["count"] >= 1).all()


def test_media_decode_is_layout_sensitive():
    """The decode is a real parse: BMP row order (bottom-up), BGR channel
    order, and row padding are all load-bearing — corrupting each one
    changes the checked features."""
    import numpy as np

    ref = "LINESTRING (1 2, 3 4)"  # md5 → bmp, w=5 (stride 16 ≠ 15: padded)
    w, h, seed, fmt = media.media_spec(ref)
    assert fmt == "bmp" and w * 3 % 4 != 0
    want = media._pixels(w, h, seed)
    blob = bytearray(media.encode_media_blob(ref))
    assert np.array_equal(media.decode_blob(bytes(blob)), want)

    # (a) negative height = top-down storage; parser honors the sign
    topdown = bytearray(blob)
    topdown[22:26] = (-h).to_bytes(4, "little", signed=True)
    stride = (w * 3 + 3) // 4 * 4
    px = np.zeros((h, stride), np.uint8)
    px[:, : w * 3] = want[:, :, ::-1].reshape(h, w * 3)  # no flip
    got = media.decode_blob(bytes(topdown[:54]) + px.tobytes())
    assert np.array_equal(got, want)

    # (b) a parser that forgot the bottom-up flip would report a
    # different top row (the feature the oracle checks)
    flipped = want[::-1]
    assert int(flipped[0, :, 0].sum()) != int(want[0, :, 0].sum())

    # (c) swapped channels change per-channel sums
    assert int(want[:, :, 0].sum()) != int(want[:, :, 2].sum())


def test_media_parsers_reject_garbage():
    import pytest

    for bad in (b"XX123456", b"P5\n2 2\n255\n" + b"\x00" * 4):
        with pytest.raises(ValueError):
            media.decode_blob(bad)
