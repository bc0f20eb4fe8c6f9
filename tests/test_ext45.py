"""Wave 46: trailing EWMA, CUSUM changepoint, LTTB downsampling."""

import math

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext45 import (
    _EWMA_K,
    _EWMA_W,
    _LTTB_BUCKET,
    q_cusum_changepoint,
    q_ewma_trailing,
    q_lttb_downsample,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_ewma_matches_driver_bruteforce(spark):
    got = {r.event_type: (r.n_used, r.ewma_micro) for r in q_ewma_trailing(spark, SF).collect()}
    pdf = (
        load_table(spark, SF, "events")
        .select("event_type", "value", F.unix_micros("ts").alias("t"), "event_id")
        .toPandas()
    )
    for t, g in pdf.groupby("event_type"):
        g = g.sort_values(["t", "event_id"], ascending=False).head(_EWMA_K)
        st = sum(
            math.floor(1e9 * v * _EWMA_W[i] + 0.5) for i, v in enumerate(g.value)
        )
        sw = sum(math.floor(1e9 * _EWMA_W[i] + 0.5) for i in range(len(g)))
        want = math.floor(1e6 * st / sw + 0.5)
        assert got[t] == (len(g), want), t


def test_cusum_is_exact_argmax(spark):
    rows = q_cusum_changepoint(spark, SF).collect()
    assert len(rows) == 5
    pdf = (
        load_table(spark, SF, "events")
        .select("event_type", "value", F.unix_micros("ts").alias("t"), "event_id")
        .toPandas()
    )
    for r in rows:
        g = pdf[pdf.event_type == r.event_type].sort_values(["t", "event_id"])
        vs = [math.floor(v * 100.0 + 0.5) for v in g.value]
        n, s = len(vs), sum(vs)
        cum, best = 0, (-1, -1)
        for i, v in enumerate(vs, start=1):
            cum += v
            d = abs(n * cum - i * s)
            if d > best[0]:
                best = (d, i)
        assert (r.d_max, r.cp_idx) == best
        assert r.n == n


def test_lttb_keeps_endpoints_and_bucket_cardinality(spark):
    rows = q_lttb_downsample(spark, SF).collect()
    per_type = {}
    for r in rows:
        per_type.setdefault(r.event_type, []).append(r)
    counts = {
        r.event_type: r.n
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for t, rs in per_type.items():
        n = counts[t]
        n_buckets = (n + _LTTB_BUCKET - 1) // _LTTB_BUCKET
        assert len(rs) == n_buckets, t
        rs = sorted(rs, key=lambda r: r.bkt)
        # first bucket pins the first point, last bucket pins the last
        assert rs[0].rn == 1
        assert rs[-1].rn == n
        # one pick per bucket, rank inside the bucket
        for r in rs:
            assert r.bkt * _LTTB_BUCKET < r.rn <= (r.bkt + 1) * _LTTB_BUCKET


def test_wave46_plans_are_scale_safe(spark):
    for fn in (q_ewma_trailing, q_cusum_changepoint, q_lttb_downsample):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
