"""Structured Streaming: stream results must equal the batch twin on the
same (bounded) input — the strongest equivalence check for unbounded ops."""

import json

import pytest
from pyspark.sql import functions as F

from etl_poor_main_pipeline_spark.streaming.events import (
    read_event_stream,
    sessionize_stream,
    windowed_event_counts,
)


@pytest.fixture()
def event_dir(spark, tmp_path):
    rows = []
    for uid in range(3):
        for i in range(10):
            # two bursts separated by > 30min -> 2 sessions/user
            base = 1704067200 + uid * 1000 + (0 if i < 5 else 3600) + i * 60
            rows.append(
                {
                    "event_id": uid * 100 + i,
                    "ts": base * 1000,  # ms epoch for JSON timestamp parse
                    "user_id": uid,
                    "event_type": "click" if i % 2 == 0 else "view",
                    "value": float(i),
                    "props": json.dumps({"k": i}),
                }
            )
    src = tmp_path / "stream_src"
    src.mkdir()
    # two files = two micro-batches
    for part, chunk in enumerate((rows[:15], rows[15:])):
        with open(src / f"part{part}.json", "w") as f:
            for r in chunk:
                rec = dict(r)
                rec["ts"] = __import__("datetime").datetime.utcfromtimestamp(
                    rec["ts"] / 1000
                ).strftime("%Y-%m-%dT%H:%M:%S.000Z")
                f.write(json.dumps(rec) + "\n")
    return str(src)


def test_windowed_counts_match_batch(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    q = (
        windowed_event_counts(stream, window="1 hour")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append" if False else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start.isoformat(), r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = spark.read.json(event_dir)
    expected = {
        (r.w.isoformat(), r.event_type): r.n
        for r in (
            batch.withColumn("ts", F.to_timestamp("ts"))
            .groupBy(F.date_trunc("hour", F.col("ts")).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        ).collect()
    }
    assert got == expected


def test_stateful_sessionization_matches_batch(spark, event_dir):
    stream = read_event_stream(spark, event_dir)
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # take the LAST update per user (memory sink keeps every update row)
    rows = spark.sql(
        """SELECT user_id, n_sessions FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
             FROM sessions) WHERE rn = 1"""
    ).collect()
    got = {r.user_id: r.n_sessions for r in rows}
    assert got == {0: 2, 1: 2, 2: 2}  # two bursts per user
