"""Falsify-or-confirm the q3/q5 x64 "irreducible fact exchange" claim
with the in-repo layout answer (VERDICT r12 Next #3).

The r12 stage breakdown attributed q3/q5's x64 residual (~2.1-2.5s) to
the lineitem<->dim exchange after broadcast demotion. registry_ext125
already demonstrates the zero-exchange bucketed SMJ on orderkey — the
exact fact join key of both queries — so this tool measures tpch_q3/q5
at a replication factor over a bucketBy(orderkey) layout of orders and
lineitem (with every column the two queries touch) against the plain
parquet baseline, and counts the Exchange operators in both plans.

The layout write is one-time amortized setup (the 100 TB posture: one
layout shuffle paid once, every downstream join on the key free), so it
is excluded from the query walls — the same stance as
registry_ext125._ensure_bucketed_layout / bench.py's ensure_layouts.

Usage (idle host only):

    python tools/bucketed_q35.py [--factor 64] [--sf-dir /root/testdata/sf0.1]
        [--buckets 32] [--runs 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _exchanges(df: DataFrame) -> int:
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )
    return plan.count("Exchange")


def _exchanges_executed(df: DataFrame) -> int:
    """Count exchanges in the EXECUTED (AQE-final) plan."""
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def q3_bucketed(spark: SparkSession, sf_dir: str, to: str, tl: str) -> DataFrame:
    c = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        spark.table(to)
        .filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        spark.table(tl)
        .filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    from etl_poor_main_pipeline_spark.registry import _dsum

    dim = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.hint("merge")
        .join(dim, li.l_orderkey == dim.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(revenue, "revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def q5_bucketed(spark: SparkSession, sf_dir: str, to: str, tl: str) -> DataFrame:
    from etl_poor_main_pipeline_spark.registry import _dsum

    r = spark.read.parquet(f"{sf_dir}/region.parquet").select("r_regionkey")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    o = (
        spark.table(to)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = spark.table(tl).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select("s_suppkey")
    cdim = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    odim = o.join(F.broadcast(cdim), o.o_custkey == cdim.c_custkey).select(
        "o_orderkey", "n_name"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.hint("merge")
        .join(odim, li.l_orderkey == odim.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(_dsum(revenue, "revenue"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=64)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--scaled-dir",
        default=None,
        help="reuse an existing replicated dir instead of rebuilding",
    )
    args = ap.parse_args()

    from etl_poor_main_pipeline_spark.fastpath import execution_posture
    from etl_poor_main_pipeline_spark.registry import queries
    from etl_poor_main_pipeline_spark.session import get_spark
    from tools.scaling import make_scaled

    spark = get_spark(app_name="bucketed_q35")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    if args.scaled_dir:
        d = args.scaled_dir
    else:
        d = os.path.join(
            tempfile.mkdtemp(prefix="bktq35_"), f"x{args.factor}"
        )
        os.makedirs(d)
        print(f"replicating x{args.factor} -> {d}", file=sys.stderr)
        make_scaled(args.sf_dir, args.factor, d)

    # warm JVM/codegen
    qs["flagship_silver_shape"](spark, args.sf_dir).count()

    def best(fn, runs: int) -> float:
        w = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            w = min(w, time.perf_counter() - t0)
        return w

    # ---- baselines (plain parquet, same posture policy as scaling.py)
    base = {}
    for name in ("tpch_q3_shipping_priority", "tpch_q5_star_join"):
        def _run(name=name):
            with execution_posture(spark, d, name):
                qs[name](spark, d).count()

        base[name] = best(_run, args.runs)
        print(f"baseline {name}: {base[name]:.3f}s", file=sys.stderr)

    # ---- one-time bucketed layout (setup, not billed to the walls)
    to, tl = f"bq35_orders_x{args.factor}", f"bq35_lineitem_x{args.factor}"
    lay = os.path.join(tempfile.gettempdir(), f"bq35_{os.getpid()}")
    t0 = time.perf_counter()
    for name, src, key, cols in (
        (
            to,
            "orders",
            "o_orderkey",
            ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        ),
        (
            tl,
            "lineitem",
            "l_orderkey",
            [
                "l_orderkey",
                "l_suppkey",
                "l_extendedprice",
                "l_discount",
                "l_shipdate",
            ],
        ),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            spark.read.parquet(f"{d}/{src}.parquet")
            .select(*cols)
            .write.mode("overwrite")
            .option("path", os.path.join(lay, name))
            .bucketBy(args.buckets, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    lay_wall = time.perf_counter() - t0
    print(f"layout write ({args.buckets} buckets): {lay_wall:.1f}s",
          file=sys.stderr)

    # ---- bucketed variants
    bq = {
        "tpch_q3_shipping_priority": lambda: q3_bucketed(spark, d, to, tl),
        "tpch_q5_star_join": lambda: q5_bucketed(spark, d, to, tl),
    }
    for name, mk in bq.items():
        df = mk()
        n_ex = _exchanges_executed(df)
        wall = best(lambda: mk().count(), args.runs)
        ratio = wall / base[name]
        print(
            f"bucketed {name}: {wall:.3f}s (baseline {base[name]:.3f}s, "
            f"{ratio:.2f}x, executed-plan exchanges: {n_ex})"
        )


if __name__ == "__main__":
    main()
