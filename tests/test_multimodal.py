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


def test_resize_undecodable_payload_raises(spark, binary_df):
    """Junk bytes are decodable by neither PIL nor the stdlib PNG
    path — the DecoderUnavailable surfaces at execution (Spark wraps
    worker exceptions, so match on the exception text)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError), match="DecoderUnavailable"):
        multimodal.resize_images(binary_df, 32, 32).collect()


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


# --- real decoders (media_codecs): golden fixtures, no external libs ---

# canonical 1x1 transparent GIF89a (35 bytes, public domain)
GIF_1x1 = bytes.fromhex(
    "47494638396101000100800000000000ffffff21f90401000000002c0000"
    "0000010001000002024401003b"
)


def _golden_png(w=5, h=3):
    from arc_jupyter_spark.operators.media_codecs import encode_png

    rgb = bytes((x * 7 + y * 11 + c) % 256
                for y in range(h) for x in range(w) for c in range(3))
    return encode_png(w, h, rgb), rgb


def _golden_bmp(w=4, h=2):
    import struct

    row = bytes(range(w * 3))
    pad = (4 - (w * 3) % 4) % 4
    pixels = (row + b"\x00" * pad) * h
    header = (b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(pixels), 2835, 2835, 0, 0))
    return header + pixels


def test_decode_image_header_real_formats():
    from arc_jupyter_spark.operators.media_codecs import decode_image_header

    png, _ = _golden_png(5, 3)
    assert decode_image_header(png) == (5, 3, 3, "png")
    assert decode_image_header(GIF_1x1) == (1, 1, 3, "gif")
    assert decode_image_header(_golden_bmp(4, 2)) == (4, 2, 3, "bmp")
    assert decode_image_header(b"not an image, just text padding") is None


def test_decode_png_pixels_round_trip():
    """encode_png -> decode_png_pixels is the identity on raw RGB —
    the fixture writer and the filter-decoding reader are independent
    implementations, so agreement is real evidence."""
    from arc_jupyter_spark.operators.media_codecs import decode_png_pixels

    png, rgb = _golden_png(7, 4)
    assert decode_png_pixels(png) == (7, 4, 3, rgb)


def test_decode_wav_header_real_bytes():
    from arc_jupyter_spark.operators.media_codecs import (
        decode_wav_header, encode_wav,
    )

    wav = encode_wav(16000, 2, b"\x00\x01" * 2 * 25)  # 25 stereo frames
    assert decode_wav_header(wav) == (16000, 25, 2)
    assert decode_wav_header(b"RIFFxxxxJUNK") is None


def test_extract_image_metadata_real_bytes_through_arrow(spark):
    """Real PNG/GIF bytes flow through the SAME mapInPandas batch path
    as the stubs and come back with their true dimensions; a junk
    payload in the same batch falls to the digest stub."""
    png, _ = _golden_png(5, 3)
    df = spark.createDataFrame(
        [(1, png), (2, GIF_1x1), (3, b"junk-payload-x")],
        "id int, value binary",
    )
    rows = {r["id"]: r["image_meta"]
            for r in multimodal.extract_image_metadata(df).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["format"]) == (5, 3, "png")
    assert (rows[2]["width"], rows[2]["height"], rows[2]["format"]) == (1, 1, "gif")
    assert rows[3]["format"] == "fake"  # stub path intact


def test_extract_audio_metadata_real_wav_through_arrow(spark):
    from arc_jupyter_spark.operators.media_codecs import encode_wav

    wav = encode_wav(22050, 1, b"\x01\x02" * 40)  # 40 mono frames
    df = spark.createDataFrame(
        [(1, wav), (2, b"junk-payload-y")], "id int, value binary"
    )
    rows = {r["id"]: r["audio_meta"]
            for r in multimodal.extract_audio_metadata(df).collect()}
    assert tuple(rows[1]) == (22050, 40, 1)
    assert rows[2]["sample_rate"] in (8000, 16000, 22050, 44100)  # stub


def test_resize_images_pure_stdlib_png(spark):
    """Real resize without PIL: 6x4 PNG -> 3x2 PNG, verified by
    re-decoding the output bytes."""
    from arc_jupyter_spark.operators.media_codecs import (
        decode_image_header, decode_png_pixels,
    )

    png, rgb = _golden_png(6, 4)
    df = spark.createDataFrame([(1, png)], "id int, value binary")
    out = multimodal.resize_images(df, 3, 2).first()["value"]
    assert decode_image_header(bytes(out))[:2] == (3, 2)
    w, h, ch, pix = decode_png_pixels(bytes(out))
    # nearest-neighbor: output pixel (0,0) is input pixel (0,0)
    assert pix[:3] == rgb[:3]


def test_synthesize_png_roundtrips_real_decoder(spark):
    from arc_jupyter_spark.operators import multimodal
    from arc_jupyter_spark.operators.media_codecs import decode_png_pixels

    ids = spark.createDataFrame([(0,), (3,), (17,)], ["doc_id"])
    rows = multimodal.synthesize_png(ids, "doc_id").collect()
    for r in rows:
        i = r["doc_id"]
        w, h = 4 + i % 5, 3 + i % 4
        out = decode_png_pixels(bytes(r["value"]))
        assert out is not None
        dw, dh, dc, px = out
        assert (dw, dh, dc) == (w, h, 3)
        assert px == bytes((i * 7 + 13 * k) % 256 for k in range(w * h * 3))


def test_image_pixel_stats_null_struct_for_undecodable(spark):
    from arc_jupyter_spark.operators import multimodal

    df = spark.createDataFrame(
        [(1, bytearray(b"not a png")), (2, None)], ["id", "value"]
    )
    rows = {
        r["id"]: r["pixel_stats"]
        for r in multimodal.image_pixel_stats(df).collect()
    }
    assert rows[1] is None and rows[2] is None
