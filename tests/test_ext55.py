"""Wave 56: nested percentile SLA, centroid drift, volatility."""

import math

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.plans.explain import (
    assert_no_global_window,
    assert_no_python_udf,
)
from etl_poor_main_pipeline_spark.registry_ext55 import (
    q_embedding_centroid_drift,
    q_log_return_volatility,
    q_nested_percentile_sla,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_nested_percentile_matches_bruteforce(spark):
    rows = {r.event_type: r for r in q_nested_percentile_sla(spark, SF).collect()}
    pdf = (
        load_table(spark, SF, "events")
        .select("event_type", "user_id", "value")
        .toPandas()
    )
    pdf["v"] = (pdf.value * 100.0 + 0.5).astype("int64")

    def pick(vals, pct):
        s = sorted(vals)
        return s[math.ceil(pct * len(s) / 100) - 1]

    for t, g in pdf.groupby("event_type"):
        p95s = [pick(u.v.tolist(), 95) for _, u in g.groupby("user_id")]
        assert rows[t].n_users == g.user_id.nunique()
        assert rows[t].p99_of_p95_c == pick(p95s, 99), t
        assert rows[t].global_p99_c == pick(g.v.tolist(), 99), t
        # heavy-user-proof nested number differs from or equals the flat one
        assert rows[t].p99_of_p95_c <= rows[t].global_p99_c + 10_000


def test_centroid_drift_near_one_for_stable_halves(spark):
    rows = q_embedding_centroid_drift(spark, SF).collect()
    # every label that has vectors in BOTH halves gets a row
    emb = load_table(spark, SF, "embeddings").select(
        "label", (F.col("vec_id") % 2).alias("half")
    )
    both = (
        emb.distinct().groupBy("label").count().where(F.col("count") == 2).count()
    )
    assert len(rows) == both
    for r in rows:
        # tiny sf0.001 halves (~2 vectors) can point anywhere; the
        # contract is a valid cosine, not closeness
        assert -1_000_000 <= r.drift_cos_micro <= 1_000_000


def test_volatility_positive_and_bruteforce(spark):
    rows = {r.event_type: r for r in q_log_return_volatility(spark, SF).collect()}
    pdf = (
        load_table(spark, SF, "events")
        .select("event_type", "value", F.unix_micros("ts").alias("t"), "event_id")
        .toPandas()
    )
    for t, g in pdf.groupby("event_type"):
        g = g.sort_values(["t", "event_id"])
        vs = [int(v * 100.0 + 0.5) for v in g.value]
        rets = [
            math.floor(1e9 * math.log(b / a) + 0.5)
            for a, b in zip(vs, vs[1:])
            if a > 0 and b > 0
        ]
        n = len(rets)
        var_num = n * sum(x * x for x in rets) - sum(rets) ** 2
        want = math.floor(math.sqrt(var_num) / n + 0.5)
        assert rows[t].n == n
        assert rows[t].vol_nano == want, t


def test_wave56_plans_are_scale_safe(spark):
    for fn in (
        q_nested_percentile_sla,
        q_embedding_centroid_drift,
        q_log_return_volatility,
    ):
        df = fn(spark, SF)
        assert_no_python_udf(df)
        assert_no_global_window(df)
