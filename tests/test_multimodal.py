"""Multimodal plumbing: binary columns through Arrow-batched decode
stubs (schemas, batch shapes, 1→N frame explode) — SURVEY.md north-star
ops. Decode itself is stubbed (no media libs in this container); the
Spark-side shapes are real."""

import pytest

from arc_jupyter_spark.operators import multimodal


@pytest.fixture()
def binary_df(spark):
    rows = [(i, bytes([i] * (10 + i)),) for i in range(1, 6)]
    return spark.createDataFrame(rows, "id int, value binary")


def test_image_metadata_schema_and_determinism(spark, binary_df):
    out = multimodal.extract_image_metadata(binary_df)
    assert "image_meta" in out.columns
    # input schema untouched (StructType.add mutation regression guard)
    assert "image_meta" not in binary_df.columns
    rows = {r["id"]: r["image_meta"] for r in out.collect()}
    assert len(rows) == 5
    again = {r["id"]: r["image_meta"] for r in multimodal.extract_image_metadata(binary_df).collect()}
    assert rows == again  # deterministic fake decode
    meta = rows[1]
    assert meta["channels"] == 3 and meta["width"] >= 64


def test_image_features_dim_and_range(spark, binary_df):
    out = multimodal.image_features_stub(binary_df, dim=8)
    feats = out.select("features").first()["features"]
    assert len(feats) == 8
    assert all(0.0 <= v <= 1.0 for v in feats)


def test_sample_frames_one_to_many(spark, binary_df):
    out = multimodal.sample_frames_stub(binary_df, every_n=3)
    rows = out.collect()
    assert len(rows) >= 5  # at least one frame per input row
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r["frame_index"])
    for frames in by_id.values():
        assert frames == list(range(len(frames)))  # dense 0..n-1


def test_resize_requires_decoder(spark, binary_df):
    if multimodal._try_import_pil() is not None:
        pytest.skip("PIL installed; stub-unavailable path not reachable")
    with pytest.raises(multimodal.DecoderUnavailable):
        multimodal.resize_images(binary_df, 32, 32)


def test_audio_metadata_schema_and_determinism(spark, binary_df):
    out = multimodal.extract_audio_metadata(binary_df)
    assert out.schema["audio_meta"].dataType == multimodal.AUDIO_META_SCHEMA
    a = sorted((r["id"], tuple(r["audio_meta"])) for r in out.collect())
    b = sorted((r["id"], tuple(r["audio_meta"])) for r in out.collect())
    assert a == b
    for _, (rate, n, ch) in a:
        assert rate in multimodal._AUDIO_RATES
        assert 1000 <= n < 161000
        assert ch in (1, 2)
