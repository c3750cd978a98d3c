"""Real-codec contract tests for the multimodal operators.

This container does not ship PIL, so these tests SKIP locally — they pin
the ``real=True`` contract (`operators/multimodal.py`) for any
environment that does have the codec: the PIL-backed kernels must run
through the identical Arrow/mapInPandas plumbing as the fake path and
produce codec-derived (not hash-derived) results.
"""

from __future__ import annotations

import io

import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from dbc_informed_socketcan_to_parquet_spark.operators.multimodal import (  # noqa: E402
    FAKE_FEATURE_DIM,
    extract_features,
    resize_images,
)


def _png_bytes(w: int, h: int, color: tuple[int, int, int]) -> bytes:
    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture()
def images_df(spark):
    rows = [
        (0, _png_bytes(32, 16, (0, 0, 0))),        # black → all mass in bin 0
        (1, _png_bytes(8, 8, (255, 255, 255))),    # white → all mass in bin 7
        (2, _png_bytes(20, 20, (128, 128, 128))),  # mid-gray → bin 4
    ]
    return spark.createDataFrame(rows, "doc_id long, content binary")


def test_extract_features_real(spark, images_df):
    feats = {r.doc_id: r.features for r in extract_features(images_df, real=True).collect()}
    assert set(feats) == {0, 1, 2}
    for v in feats.values():
        assert len(v) == FAKE_FEATURE_DIM
        assert sum(v) == pytest.approx(1.0)  # normalized histogram
    assert feats[0][0] == pytest.approx(1.0)  # black image: bin 0
    assert feats[1][7] == pytest.approx(1.0)  # white image: bin 7
    assert feats[2][4] == pytest.approx(1.0)  # mid-gray: bin 4 (128 // 32)


def test_resize_images_real(spark, images_df):
    out = resize_images(images_df, width=4, height=6, real=True).collect()
    assert len(out) == 3
    for r in out:
        assert (r.width, r.height) == (4, 6)
        img = Image.open(io.BytesIO(bytes(r.content)))
        assert img.size == (4, 6)  # payload is a real PNG at the target size
