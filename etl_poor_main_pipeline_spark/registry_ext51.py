"""Operator registry, wave 52: stream-stream OUTER join (a new
Structured Streaming category), file-skipping prune simulation, and
per-series maximum drawdown.

Scale stances:
- Outer stream join: both sides watermarked + time-range condition so
  state expires; the LEFT-OUTER null emission depends on the final
  watermark (a row is emitted unmatched only once the watermark proves
  it can never match), and the oracle REPLICATES that eviction rule
  explicitly — global watermark = min of the two sides' (max event
  time - delay), unmatched click emitted iff click_ts + 1h < watermark.
  This is the semantics a 100 TB deployment actually observes; an
  oracle that pretended every unmatched row appears would be wrong.
- Prune simulation: consumes the zorder-style per-bucket min/max spans
  (a files-bounded stats frame) and counts, for a panel of predicates,
  how many file buckets a stats-aware reader would scan — the
  manifest-pruning arithmetic Iceberg/Delta do at plan time.
- Max drawdown: running peak via a window PARTITIONED by series;
  drawdown = max(peak - value) in integer cents, exact.

Reference parity: streaming is future work in the reference
(README.md:181); [EXT] X7/X10 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t
from .streaming.events import drain_to_table, read_event_stream_parquet

# --------------------------------------------------------------------------
# Stream-stream LEFT OUTER join (X10 [EXT])
# --------------------------------------------------------------------------

_SLJ_DELAY = "10 minutes"


def q_streaming_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X10 stream-stream LEFT OUTER join: every click, attributed
    to a purchase in the following hour when one exists, emitted
    UNMATCHED (null purchase) once the watermark proves no match can
    arrive — the attribution shape that also reports non-converting
    clicks. Both sides carry {d} watermarks and the join carries the
    time-range condition (state expires); the availableNow drain's
    trailing no-data micro-batch advances the final watermark and
    flushes the unmatched-left buffer. Clicks younger than the final
    watermark stay in state by design — the oracle twin encodes
    exactly that eviction rule."""
    clicks = (
        read_event_stream_parquet(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", _SLJ_DELAY)
    )
    purchases = (
        read_event_stream_parquet(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", _SLJ_DELAY)
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "user_id = p_user_id AND p_ts > click_ts "
            "AND p_ts <= click_ts + interval 1 hour"
        ),
        "left_outer",
    ).select(
        "user_id",
        "click_id",
        F.col("purchase_id").cast("bigint").alias("purchase_id"),
        (F.col("purchase_id").isNotNull()).alias("converted"),
    )
    return drain_to_table(joined, "append", state_partitions=8)


_ORACLE_STREAM_LEFT_JOIN = """
WITH wm AS (
  SELECT least(
    (SELECT max(ts) FROM events WHERE event_type = 'click'),
    (SELECT max(ts) FROM events WHERE event_type = 'purchase')
  ) - INTERVAL 10 MINUTE AS w
),
matched AS (
  SELECT a.user_id, a.event_id AS click_id,
         cast(b.event_id AS bigint) AS purchase_id, true AS converted
  FROM events a JOIN events b
    ON a.user_id = b.user_id
   AND a.event_type = 'click' AND b.event_type = 'purchase'
   AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
),
unmatched AS (
  SELECT a.user_id, a.event_id AS click_id,
         cast(NULL AS bigint) AS purchase_id, false AS converted
  FROM events a
  WHERE a.event_type = 'click'
    AND NOT EXISTS (
      SELECT 1 FROM events b
      WHERE b.user_id = a.user_id AND b.event_type = 'purchase'
        AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR)
    AND a.ts + INTERVAL 1 HOUR < (SELECT w FROM wm)
)
SELECT * FROM matched UNION ALL SELECT * FROM unmatched
"""


# --------------------------------------------------------------------------
# File-skipping prune simulation (S/W [EXT])
# --------------------------------------------------------------------------

_PRUNE_BUCKETS = 64


def q_manifest_prune_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] S/W manifest-pruning simulation: lay orders out in
    {b} o_custkey range buckets (the repartitionByRange write), keep
    per-bucket min/max footer stats for BOTH o_custkey and
    o_totalprice, then for a panel of predicates count how many file
    buckets a stats-aware reader scans vs. total — the plan-time
    arithmetic Iceberg/Delta manifests perform. The stats frame is
    FILES-bounded; predicates are evaluated against it with interval
    overlap tests, never against rows."""
    o = _t(spark, sf_dir, "orders")
    keyspace = o.agg(
        F.min("o_custkey").alias("klo"), F.max("o_custkey").alias("khi")
    )
    stats = (
        o.crossJoin(F.broadcast(keyspace))
        .select(
            F.least(
                F.floor(
                    (F.col("o_custkey") - F.col("klo"))
                    * F.lit(_PRUNE_BUCKETS)
                    / (F.col("khi") - F.col("klo") + F.lit(1))
                ).cast("bigint"),
                F.lit(_PRUNE_BUCKETS - 1).cast("bigint"),
            ).alias("file_id"),
            "o_custkey",
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .alias("price_c"),
        )
        .groupBy("file_id")
        .agg(
            F.min("o_custkey").alias("k_min"),
            F.max("o_custkey").alias("k_max"),
            F.min("price_c").alias("p_min"),
            F.max("price_c").alias("p_max"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )
    preds = F.expr(
        "explode(array("
        "  named_struct('pred', 'custkey_point', 'klo', 500L, 'khi', 500L,"
        "               'plo', cast(null as bigint), 'phi', cast(null as bigint)),"
        "  named_struct('pred', 'custkey_range', 'klo', 100L, 'khi', 300L,"
        "               'plo', cast(null as bigint), 'phi', cast(null as bigint)),"
        "  named_struct('pred', 'price_high', 'klo', cast(null as bigint),"
        "               'khi', cast(null as bigint), 'plo', 40000000L,"
        "               'phi', cast(null as bigint)),"
        "  named_struct('pred', 'both', 'klo', 100L, 'khi', 300L,"
        "               'plo', 20000000L, 'phi', cast(null as bigint))"
        ")) as p"
    )
    panel = stats.select("*", preds).select(
        F.col("p.pred").alias("pred"),
        "file_id",
        "n_rows",
        (
            (F.col("p.klo").isNull() | (F.col("k_max") >= F.col("p.klo")))
            & (F.col("p.khi").isNull() | (F.col("k_min") <= F.col("p.khi")))
            & (F.col("p.plo").isNull() | (F.col("p_max") >= F.col("p.plo")))
            & (F.col("p.phi").isNull() | (F.col("p_min") <= F.col("p.phi")))
        ).alias("scanned"),
    )
    return (
        panel.groupBy("pred")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum(F.when(F.col("scanned"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_scanned"),
            F.sum(F.when(F.col("scanned"), F.col("n_rows")).otherwise(0))
            .cast("bigint")
            .alias("rows_scanned"),
        )
        .orderBy("pred")
    )


_ORACLE_PRUNE = f"""
WITH ks AS (SELECT min(o_custkey) AS klo, max(o_custkey) AS khi FROM orders),
stats AS (
  SELECT least(cast(floor((o_custkey - ks.klo) * {_PRUNE_BUCKETS}.0
                          / (ks.khi - ks.klo + 1)) AS bigint),
               {_PRUNE_BUCKETS - 1}) AS file_id,
         min(o_custkey) AS k_min, max(o_custkey) AS k_max,
         min(cast(floor(o_totalprice * 100.0 + 0.5) AS bigint)) AS p_min,
         max(cast(floor(o_totalprice * 100.0 + 0.5) AS bigint)) AS p_max,
         count(*)::BIGINT AS n_rows
  FROM orders CROSS JOIN ks
  GROUP BY 1
),
preds(pred, klo, khi, plo, phi) AS (
  VALUES ('custkey_point', 500, 500, NULL, NULL),
         ('custkey_range', 100, 300, NULL, NULL),
         ('price_high', NULL, NULL, 40000000, NULL),
         ('both', 100, 300, 20000000, NULL)
),
panel AS (
  SELECT p.pred, s.file_id, s.n_rows,
         ((p.klo IS NULL OR s.k_max >= p.klo)
          AND (p.khi IS NULL OR s.k_min <= p.khi)
          AND (p.plo IS NULL OR s.p_max >= p.plo)
          AND (p.phi IS NULL OR s.p_min <= p.phi)) AS scanned
  FROM stats s CROSS JOIN preds p
)
SELECT pred, count(*)::BIGINT AS n_files,
       sum(CASE WHEN scanned THEN 1 ELSE 0 END)::BIGINT AS n_scanned,
       sum(CASE WHEN scanned THEN n_rows ELSE 0 END)::BIGINT AS rows_scanned
FROM panel GROUP BY pred ORDER BY pred
"""


# --------------------------------------------------------------------------
# Maximum drawdown per series (X7 [EXT])
# --------------------------------------------------------------------------


def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 maximum drawdown: per event_type, the largest
    peak-to-trough fall of the value series in time order — the risk
    metric every monitored KPI gets. Running peak is a window
    PARTITIONED by event_type (per-series parallel); drawdown stays in
    integer cents, and the trough pick tie-breaks on the earliest
    event. Also reports the peak value the fall started from."""
    w = Window.partitionBy("event_type").orderBy("t_us", "event_id")
    e = (
        _t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .alias("v"),
            F.unix_micros("ts").alias("t_us"),
            "event_id",
        )
        .withColumn("peak", F.max("v").over(w))
        .withColumn("dd", F.col("peak") - F.col("v"))
    )
    pick = Window.partitionBy("event_type").orderBy(F.desc("dd"), F.asc("t_us"), F.asc("event_id"))
    return (
        e.withColumn("rk", F.row_number().over(pick))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("dd").cast("bigint").alias("max_drawdown_c"),
            F.col("peak").cast("bigint").alias("peak_c"),
            F.col("v").cast("bigint").alias("trough_c"),
        )
        .orderBy("event_type")
    )


_ORACLE_DRAWDOWN = """
WITH e AS (
  SELECT event_type,
         cast(floor(value * 100.0 + 0.5) AS bigint) AS v,
         epoch_us(ts) AS t_us, event_id
  FROM events
),
r AS (
  SELECT *,
         max(v) OVER (PARTITION BY event_type ORDER BY t_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM e
),
d AS (
  SELECT event_type, (peak - v) AS dd, peak, v, t_us, event_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY (peak - v) DESC, t_us, event_id) AS rk
  FROM r
)
SELECT event_type, cast(dd AS bigint) AS max_drawdown_c,
       cast(peak AS bigint) AS peak_c, cast(v AS bigint) AS trough_c
FROM d WHERE rk = 1 ORDER BY event_type
"""


REGISTRY_EXT51: dict[str, QuerySpec] = {
    "streaming_left_join": QuerySpec(
        q_streaming_left_join, _ORACLE_STREAM_LEFT_JOIN, "X10 [EXT] outer stream join"
    ),
    "manifest_prune_sim": QuerySpec(
        q_manifest_prune_sim, _ORACLE_PRUNE, "S/W [EXT] stats-based pruning"
    ),
    "max_drawdown": QuerySpec(q_max_drawdown, _ORACLE_DRAWDOWN, "X7 [EXT] risk metric"),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_streaming_left_join.__doc__ = q_streaming_left_join.__doc__.format(d=_SLJ_DELAY)  # noqa: E501
q_manifest_prune_sim.__doc__ = q_manifest_prune_sim.__doc__.format(b=_PRUNE_BUCKETS)  # noqa: E501
