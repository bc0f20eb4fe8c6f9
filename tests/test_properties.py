"""Property-based pins for P3/P5/P6 (SURVEY §5.4) — run on the driver
side against the same expressions Spark executes, via small literal
DataFrames batched per example set (hypothesis + Spark would be slow
row-by-row, so examples are collected then evaluated in one job)."""

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.operators.relational import temperature_category, truncate_str

BUCKETS = {"Freezing", "Cold", "Mild", "Warm"}


@settings(max_examples=20, deadline=None)
@given(st.floats(allow_nan=False, allow_infinity=False, width=64))
def test_bucket_totality(spark, temp):
    # every finite double maps to exactly one category
    df = spark.createDataFrame([(temp,)], "temperature: double")
    b = df.select(temperature_category().alias("b")).head().b
    assert b in BUCKETS
    if temp < 0:
        assert b == "Freezing"
    elif temp < 10:
        assert b == "Cold"
    elif temp < 20:
        assert b == "Mild"
    else:
        assert b == "Warm"


@settings(max_examples=20, deadline=None)
@given(st.text(min_size=0, max_size=30))
def test_truncate_idempotent_and_bounded(spark, s):
    df = spark.createDataFrame([(s,)], "d: string")
    once = df.select(truncate_str("d").alias("d")).head().d
    again = (
        spark.createDataFrame([(once,)], "d: string")
        .select(truncate_str("d").alias("d"))
        .head()
        .d
    )
    assert once == again
    assert once is None or len(once) <= 10
