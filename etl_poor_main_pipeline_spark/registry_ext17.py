"""Operator registry, wave 18: stream-stream join — the last Structured
Streaming category (after windowed aggs, dedup, stream-static joins,
stateful sessionization, session windows, and the custom sink): joining
two streams with a time-range condition and per-side watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import QuerySpec, _t  # noqa: F401  (query surface convention)
from .streaming.events import drain_to_table, read_event_stream_parquet


def q_streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X10 stream-stream inner join: click-to-purchase attribution
    — every (click, purchase) pair for the same user with the purchase
    in the hour after the click. Both sides carry watermarks and the
    join carries the time-range condition, which is what lets Spark
    expire buffered state (a click older than watermark+1h can never
    match again); without them the two-sided join buffer grows forever.
    Drained with availableNow over the single-file source, both sides
    of every pair arrive in the same micro-batch, so the drained result
    equals the batch join and the DuckDB twin gives full parity —
    row-level joins are batch-boundary-independent (wave-9 note)."""
    clicks = (
        read_event_stream_parquet(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        read_event_stream_parquet(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "user_id = p_user_id AND p_ts > click_ts "
            "AND p_ts <= click_ts + interval 1 hour"
        ),
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        ((F.unix_micros("p_ts") - F.unix_micros("click_ts")) / 1_000_000)
        .cast("bigint")
        .alias("delay_s"),
    )
    return drain_to_table(joined, "append", state_partitions=8)


_ORACLE_STREAM_JOIN = """
SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
       cast((epoch_us(b.ts) - epoch_us(a.ts)) // 1000000 AS bigint) AS delay_s
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
"""


REGISTRY_EXT17: dict[str, QuerySpec] = {
    "streaming_stream_join": QuerySpec(
        q_streaming_stream_join, _ORACLE_STREAM_JOIN, "X10 streaming join"
    ),
}
