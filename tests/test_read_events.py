"""read_events contract: the read-path story must match the data (VERDICT r05
What's-wrong #3 — a dead TIMESTAMP(NANOS) branch guarded a hazard the corpus
doesn't have while the real one went unseen).

1. The corpus ``events.ts`` is parquet TIMESTAMP(MICROS, isAdjustedToUTC=false)
   — asserted directly from the footer so a corpus regeneration that changes
   the type fails here, loudly, instead of silently down-path.
2. The tuned session (NTZ inference off) takes the pass-through branch and
   unix_micros(ts) equals the stored naive micros.
3. The NTZ reinterpretation expression is zone-free calendar arithmetic:
   exact on DST fall-back-ambiguous wall clocks under a non-UTC session,
   where the previous convert_timezone+cast path resolved both occurrences
   of the repeated hour to one offset (ADVICE r05, low #1).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_poor_main_pipeline_spark.sources.read import _NTZ_AS_UTC_INSTANT, read_events
from tests.conftest import SF_DIR


def test_events_parquet_logical_type_is_micros_ntz():
    t = pq.read_schema(f"{SF_DIR}/events.parquet").field("ts").type
    assert pa.types.is_timestamp(t)
    assert t.unit == "us", f"corpus regenerated with ts unit {t.unit}"
    assert t.tz is None, f"corpus regenerated with tz-adjusted ts ({t.tz})"


def test_read_events_passthrough_matches_stored_micros(spark):
    truth = sorted(
        pq.read_table(f"{SF_DIR}/events.parquet").column("ts").cast("int64").to_pylist()
    )
    df = read_events(spark, SF_DIR)
    # tuned session: NTZ inference off -> plain TIMESTAMP, no rewrite column
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = sorted(r[0] for r in df.select(F.unix_micros("ts")).collect())
    assert got == truth


def test_ntz_reinterpret_exact_on_dst_ambiguous_wall_clock(spark):
    # 2025-11-02 01:30:00 occurs twice in America/New_York (EDT and EST);
    # a session-zone wall-clock cast picks one offset. The calendar-arithmetic
    # expression never consults the zone: unix_micros == naive micros, always.
    wall_clocks = [
        "2025-11-02 01:30:00",  # fall-back ambiguous
        "2025-03-09 02:30:00",  # spring-forward nonexistent
        "2025-06-15 12:00:00.123456",  # plain, with fractional seconds
    ]
    # naive micros = days-since-epoch * 86400e6 + microsecond-of-day
    import datetime as dt

    def naive_micros(s: str) -> int:
        d = dt.datetime.fromisoformat(s).replace(tzinfo=dt.timezone.utc)
        return int(d.timestamp() * 1_000_000)

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = spark.createDataFrame([(s,) for s in wall_clocks], ["s"]).select(
            "s", F.expr("cast(s as timestamp_ntz)").alias("ts")
        )
        out = df.select(
            "s", F.unix_micros(F.expr(_NTZ_AS_UTC_INSTANT.format(c="ts"))).alias("um")
        ).collect()
        for row in out:
            assert row.um == naive_micros(row.s), row.s
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
