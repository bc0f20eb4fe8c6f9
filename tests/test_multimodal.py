import pytest

from etl_poor_main_pipeline_spark.operators.multimodal import (
    _decode_image,
    _pil,
    extract_media_features,
    sample_frames,
    text_to_binary,
)

HAS_PIL = _pil() is not None


def test_text_to_binary_roundtrip(spark):
    df = spark.createDataFrame([(1, "héllo")], ["doc_id", "text"])
    row = text_to_binary(df).head()
    assert bytes(row.payload).decode("utf-8") == "héllo"
    assert row.n_bytes == len("héllo".encode("utf-8"))  # 6: é is 2 bytes
    assert row.mime == "text/plain"


def test_extract_media_features_deterministic(spark):
    df = spark.createDataFrame([(i, f"doc number {i}") for i in range(10)], ["doc_id", "text"])
    bin_df = text_to_binary(df)
    a = sorted((r.media_id, r.width, r.height) for r in extract_media_features(bin_df).collect())
    b = sorted((r.media_id, r.width, r.height) for r in extract_media_features(bin_df).collect())
    assert a == b
    assert all(64 <= w < 128 and 64 <= h < 128 for _, w, h in a)


def test_extract_media_features_null_payload(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("media_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    df = spark.createDataFrame([(1, None)], schema)
    row = extract_media_features(df).head()
    assert row.n_bytes == 0


def test_frame_sampler_flatmap_contract(spark):
    """One media row fans out to every_n-sampled frames; frame bytes are
    the exact payload slices and frame_idx preserves decode order."""
    text = "ab" * 300  # 600 bytes -> frames 0..2 at 256B, last short
    df = spark.createDataFrame([(7, text)], ["doc_id", "text"])
    rows = sorted(
        sample_frames(text_to_binary(df), frame_bytes=256, every_n=2).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [(r.media_id, r.frame_idx) for r in rows] == [(7, 0), (7, 2)]
    payload = text.encode()
    assert bytes(rows[0].frame) == payload[0:256]
    assert bytes(rows[1].frame) == payload[512:600]


def test_resize_stub_contract(spark):
    from etl_poor_main_pipeline_spark.operators.multimodal import (
        resize_images,
        text_to_binary,
    )
    from etl_poor_main_pipeline_spark.registry import _t

    d = text_to_binary(_t(spark, "/root/testdata/sf0.001", "documents").limit(20))
    out = resize_images(d.withColumnRenamed("doc_id", "media_id"), width=64, height=48)
    rows = out.collect()
    assert len(rows) == 20
    assert all(r.width == 64 and r.height == 48 for r in rows)
    assert all(isinstance(r.payload, (bytes, bytearray)) for r in rows)


def test_decode_image_real_branch_via_injected_module():
    """The real-kernel branch of _decode_image is exercised without
    Pillow by injecting a module-shaped fake (same open() contract), so
    the gate wiring is tested in every environment."""

    class _Im:
        width, height, format = 320, 200, "PNG"

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _FakeImageMod:
        @staticmethod
        def open(fh):
            if fh.read(4) != b"\x89PNG":
                raise ValueError("not an image")
            return _Im()

    assert _decode_image(b"\x89PNG....", _FakeImageMod) == (320, 200, "png")
    # undecodable bytes degrade to the deterministic stub, not an error
    w, h, fmt = _decode_image(b"plain text", _FakeImageMod)
    assert fmt == "fake" and 64 <= w < 128 and 64 <= h < 128


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed (gate: stub path)")
def test_pillow_kernels_decode_and_resize_real_images(spark):
    """Where Pillow exists the kernels are real: a generated PNG decodes
    to its true dimensions/format and resize re-encodes to the target."""
    import io

    from pyspark.sql import types as T

    from etl_poor_main_pipeline_spark.operators.multimodal import resize_images

    Image = _pil()
    buf = io.BytesIO()
    Image.new("RGB", (32, 16), (250, 10, 10)).save(buf, format="PNG")
    png = buf.getvalue()
    schema = T.StructType(
        [T.StructField("media_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    df = spark.createDataFrame([(1, png)], schema)
    feat = extract_media_features(df).head()
    assert (feat.width, feat.height, feat.fmt) == (32, 16, "png")
    resized = resize_images(df, width=8, height=4).head()
    with Image.open(io.BytesIO(bytes(resized.payload))) as im:
        assert (im.width, im.height) == (8, 4)


@pytest.mark.skipif(HAS_PIL, reason="Pillow installed (real kernels active)")
def test_gate_falls_back_to_stub_without_pillow(spark):
    """Without Pillow a real PNG header still goes through the stub —
    deterministic fake dims, 'fake' format, payload passthrough."""
    from pyspark.sql import types as T

    from etl_poor_main_pipeline_spark.operators.multimodal import resize_images

    png_ish = b"\x89PNG\r\n\x1a\n" + bytes(range(64))
    schema = T.StructType(
        [T.StructField("media_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    df = spark.createDataFrame([(1, png_ish)], schema)
    assert extract_media_features(df).head().fmt == "fake"
    assert bytes(resize_images(df).head().payload) == png_ish
