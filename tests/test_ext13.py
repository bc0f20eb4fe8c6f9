"""Wave 14: fuzzy levenshtein join and time-series gap-fill."""

from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.registry_ext13 import (
    q_fuzzy_join_levenshtein,
    q_timeseries_gapfill,
)
from etl_poor_main_pipeline_spark.sources.read import load_table

SF = "/root/testdata/sf0.001"


def test_fuzzy_join_blocking_is_lossless(spark):
    """The +-1 length-band blocked plan must return exactly the quadratic
    lev<=1 pair set (blocking is a plan optimization, not a semantics
    change), with each pair appearing once."""
    s = load_table(spark, SF, "supplier").select("s_suppkey", "s_name")
    a, b = s.alias("a"), s.alias("b")
    brute = {
        (r.ka, r.kb)
        for r in a.join(b, F.col("a.s_suppkey") < F.col("b.s_suppkey"))
        .filter(F.levenshtein(F.col("a.s_name"), F.col("b.s_name")) <= 1)
        .select(F.col("a.s_suppkey").alias("ka"), F.col("b.s_suppkey").alias("kb"))
        .collect()
    }
    got = [(r.supkey_a, r.supkey_b) for r in q_fuzzy_join_levenshtein(spark, SF).collect()]
    assert set(got) == brute
    assert len(got) == len(set(got)), "blocked join emitted duplicate pairs"


def test_gapfill_grid_and_interpolation(spark):
    out = q_timeseries_gapfill(spark, SF).collect()
    by_type: dict[str, list] = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append(r)
    # full dense grid: every type covers the same global hour range
    sizes = {len(v) for v in by_type.values()}
    assert len(sizes) == 1
    hours = sorted(r.hour for r in next(iter(by_type.values())))
    assert len(hours) == len(set(hours))
    # no unfilled values anywhere (boundaries use nearest-edge fill)
    assert all(r.sum_value_filled is not None for r in out)
    # gap rows are marked by n_events = 0 and sit between neighbors
    for rows in by_type.values():
        rows.sort(key=lambda r: r.hour)
        for i in range(1, len(rows) - 1):
            r = rows[i]
            if r.n_events == 0 and rows[i - 1].n_events > 0 and rows[i + 1].n_events > 0:
                lo = min(rows[i - 1].sum_value_filled, rows[i + 1].sum_value_filled)
                hi = max(rows[i - 1].sum_value_filled, rows[i + 1].sum_value_filled)
                assert lo - 1e-4 <= r.sum_value_filled <= hi + 1e-4, (
                    f"interpolated value {r.sum_value_filled} outside neighbor"
                    f" envelope [{lo}, {hi}] at {r.event_type} {r.hour}"
                )


def test_bitmap_distinct_is_exact_and_mergeable(spark):
    """The bitmap path must equal COUNT(DISTINCT) exactly, and partial
    bitmaps built on disjoint halves must merge (bitmap_or_agg) to the
    same totals — the property that makes it usable incrementally."""
    from pyspark.sql import functions as F

    from etl_poor_main_pipeline_spark.registry_ext15 import q_bitmap_exact_distinct

    li = load_table(spark, SF, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    got = {
        r.l_returnflag: r.n_distinct_parts
        for r in q_bitmap_exact_distinct(spark, SF).collect()
    }
    assert got == exact
    # mergeability: per-half partial bitmaps OR together to the same count
    half = li.withColumn("_half", (F.col("l_orderkey") % 2).cast("int"))
    partial = half.groupBy(
        "l_returnflag", "_half", F.bitmap_bucket_number("l_partkey").alias("bkt")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("l_partkey")).alias("bm"))
    merged = (
        partial.groupBy("l_returnflag", "bkt")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy("l_returnflag")
        .agg(F.sum(F.bitmap_count("bm")).cast("bigint").alias("n"))
    )
    assert {r.l_returnflag: r.n for r in merged.collect()} == exact


def test_per_source_cap_plan_prunes_before_shuffle(spark):
    """The rank<=15 filter must compile to WindowGroupLimit: each map
    task keeps only its local top-15 per source BEFORE the exchange, so
    at scale the shuffle carries ~cap*sources rows, not the corpus."""
    from etl_poor_main_pipeline_spark.registry_ext15 import q_per_source_cap

    df = q_per_source_cap(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange") == 1
    out = df.collect()
    per_source = {}
    for r in out:
        per_source.setdefault(r.source, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 15
               for v in per_source.values())


def test_merge_upsert_conserves_rows(spark):
    """Upsert accounting: |merged| == |base| + |inserts|; updated keys
    appear exactly once with the new values (updates win over base)."""
    from pyspark.sql import functions as F

    from etl_poor_main_pipeline_spark.registry_ext16 import q_merge_upsert

    o = load_table(spark, SF, "orders")
    n_base = o.count()
    n_upd = o.filter(F.col("o_orderkey") % 97 == 0).count()
    out = {r.o_orderstatus: r.n_orders for r in q_merge_upsert(spark, SF).collect()}
    assert out.get("U", 0) == n_upd and out.get("I", 0) == n_upd
    assert sum(out.values()) == n_base + n_upd  # base w/ updates replaced + inserts
