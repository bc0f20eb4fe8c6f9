import pytest

from etl_poor_main_pipeline_spark.operators.multimodal import (
    extract_media_features,
    sample_frames,
    text_to_binary,
)


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
