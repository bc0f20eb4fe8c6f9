"""Operator registry, wave 38: the distributed twin of the global
distribution window, seasonal decomposition, and 2-D binning.

Scale stances:
- distributed cume_dist: the per-row twin of the global
  ``CUME_DIST()/PERCENT_RANK() OVER (ORDER BY ...)`` window, built on
  the Blelloch rank (operators/scan_prefix.global_rank_zero) — closes
  the promise in window_distribution's docstring: identical output to
  the literal SQL window, no single-partition stage anywhere. The
  ORACLE is the literal window SQL, so parity PROVES the equivalence.
- seasonal decomposition: two grouped aggregates (seasonal profile,
  residual moments) + a broadcast profile join.
- 2-D heatmap binning: one projection to (xbin, ybin) + one aggregate;
  bounded output cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.scan_prefix import global_rank_zero
from .registry import QuerySpec, _t
from .sources.read import hour_of_day

# --------------------------------------------------------------------------
# Distributed CUME_DIST / PERCENT_RANK (X7 window twin [EXT])
# --------------------------------------------------------------------------


def q_distributed_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 the scale-safe per-row twin of ``window_distribution``:
    cume_dist and percent_rank over the TOTAL (c_acctbal, c_custkey)
    order, computed WITHOUT the single-partition window — Blelloch
    global rank (range partitions + partitioned scans, see
    operators/scan_prefix.py). The order includes the unique custkey
    tiebreak, so every row is its own peer group and the SQL functions
    reduce to pure rank arithmetic: cume_dist = (r0+1)/N, percent_rank
    = r0/(N-1). (For a peer-grouped order, add one aggregate on the
    order-value key mapping each group to its min/max rank.) The
    oracle is the LITERAL global-window SQL — parity proves the
    distributed construction is value-identical. (window_distribution
    keeps the literal Spark window as the sanctioned SQL-semantics
    demo; this op is what you run at 100 TB.)"""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    n_parts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    ranked = global_rank_zero(c, ["c_acctbal", "c_custkey"], n_parts, out="r0")
    total = c.agg(F.count(F.lit(1)).alias("n"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "c_custkey",
            F.round((F.col("r0") + 1) / F.col("n"), 6).alias("bal_cume_dist"),
            F.round(F.col("r0") / (F.col("n") - 1), 6).alias("bal_pct_rank"),
        )
        .orderBy("c_custkey")
    )


_ORACLE_DIST_CUME = """
SELECT c_custkey,
       round(cume_dist() OVER (ORDER BY c_acctbal ASC, c_custkey ASC), 6) AS bal_cume_dist,
       round(percent_rank() OVER (ORDER BY c_acctbal ASC, c_custkey ASC), 6) AS bal_pct_rank
FROM customer ORDER BY c_custkey
"""


# --------------------------------------------------------------------------
# Seasonal mean decomposition (X7 timeseries [EXT])
# --------------------------------------------------------------------------


def q_seasonal_decompose_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 seasonal-mean decomposition of event values by
    hour-of-day (the STL-lite every metrics stack runs before anomaly
    gating): per (event_type, hour) seasonal mean, then per event_type
    the residual's mean-absolute deviation from its seasonal profile.
    Integer micro arithmetic end-to-end: seasonal means floored to
    micro before residuals, so both engines subtract identical values.
    Two grouped aggregates + one broadcast profile join."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        hour_of_day("ts").alias("hod"),
        F.floor(F.lit(1e6) * F.col("value") + F.lit(0.5))
        .cast("bigint")
        .alias("v_micro"),
    )
    prof = e.groupBy("event_type", "hod").agg(
        F.floor(F.avg("v_micro")).cast("bigint").alias("seasonal_micro")
    )
    return (
        e.join(F.broadcast(prof), ["event_type", "hod"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.floor(F.avg(F.abs(F.col("v_micro") - F.col("seasonal_micro"))))
            .cast("bigint")
            .alias("resid_mad_micro"),
            F.max("seasonal_micro").alias("peak_seasonal_micro"),
            F.min("seasonal_micro").alias("trough_seasonal_micro"),
        )
        .orderBy("event_type")
    )


_ORACLE_SEASONAL = """
WITH e AS (
  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hod,
         cast(floor(1000000.0 * value + 0.5) AS bigint) AS v_micro
  FROM events
),
prof AS (
  SELECT event_type, hod,
         cast(floor(avg(v_micro)) AS bigint) AS seasonal_micro
  FROM e GROUP BY event_type, hod
)
SELECT e.event_type,
       count(*)::BIGINT AS n_events,
       cast(floor(avg(abs(e.v_micro - prof.seasonal_micro))) AS bigint) AS resid_mad_micro,
       max(prof.seasonal_micro) AS peak_seasonal_micro,
       min(prof.seasonal_micro) AS trough_seasonal_micro
FROM e JOIN prof USING (event_type, hod)
GROUP BY e.event_type ORDER BY e.event_type
"""


# --------------------------------------------------------------------------
# 2-D heatmap binning (X7 [EXT])
# --------------------------------------------------------------------------

_HM_PRICE_BIN = 50000  # cents per price bin


def q_heatmap_bin_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 2-D equi-width binning (the heatmap/density-matrix prep
    behind every dashboard scatter): orders bucketed by (order month,
    fixed {_HM_PRICE_BIN}-cent price bin) with count and exact decimal
    revenue per cell. One projection + one aggregate; output bounded by
    months x price bins regardless of row count."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.expr(
                f"floor(100.0 * o_totalprice + 0.5) div {_HM_PRICE_BIN}"
            )
            .cast("bigint")
            .alias("price_bin"),
            F.col("o_totalprice").cast("decimal(18,6)").alias("dp"),
        )
        .groupBy("month", "price_bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("dp").cast("double"), 2).alias("revenue"),
        )
        .orderBy("month", "price_bin")
    )


_ORACLE_HEATMAP = f"""
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       cast(floor(100.0 * o_totalprice + 0.5) AS bigint) // {_HM_PRICE_BIN} AS price_bin,
       count(*)::BIGINT AS n,
       round(sum(o_totalprice::DECIMAL(18,6))::DOUBLE, 2) AS revenue
FROM orders
GROUP BY month, price_bin ORDER BY month, price_bin
"""


REGISTRY_EXT37: dict[str, QuerySpec] = {
    "distributed_cume_dist": QuerySpec(
        q_distributed_cume_dist, _ORACLE_DIST_CUME, "X7 [EXT] scale-safe CUME_DIST twin"
    ),
    "seasonal_decompose_mean": QuerySpec(
        q_seasonal_decompose_mean, _ORACLE_SEASONAL, "X7 [EXT] seasonal decomposition"
    ),
    "heatmap_bin_2d": QuerySpec(
        q_heatmap_bin_2d, _ORACLE_HEATMAP, "X7 [EXT] 2-D density binning"
    ),
}
