"""Operator registry, wave 15: Spark-4-native surface under the parity
gate — native session windows (batch + streaming twin), the VARIANT
semi-structured type, and a Python UDTF (table function) — each
expressed with the engine's first-class API and oracle-checked like
everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import QuerySpec, _t
from .streaming.events import drain_to_table, read_event_stream_parquet

_GAP_MIN = 30


def _session_agg(ev: DataFrame) -> DataFrame:
    return (
        ev.groupBy(
            F.session_window(F.col("ts"), f"{_GAP_MIN} minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X9 native session windows: ``F.session_window(ts, gap)`` in a
    batch groupBy — Spark merges events whose [ts, ts+gap) extents
    overlap; the emitted window is [first_ts, last_ts + gap). The oracle
    is the gap-island formulation: a session breaks when the gap to the
    previous event is >= 30min (equality = touching-but-not-overlapping
    extents = separate sessions). Same shuffle shape as any groupBy(user)
    — the session merge happens inside the per-key sort, no extra
    exchange. Timestamps are µs in both engines, so boundary comparisons
    agree exactly. Batch twin of ``streaming_session_window``."""
    return _session_agg(_t(spark, sf_dir, "events"))


_ORACLE_SESSION_WINDOW = f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= {_GAP_MIN}*60*1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
),
islands AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL {_GAP_MIN} MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       cast(count(*) AS bigint) AS n_events
FROM islands
GROUP BY user_id, sess_id
"""


def q_streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X10 streaming twin: the same native session-window aggregate
    over ``readStream``, drained in ``complete`` mode — the final emission
    over a finite stream equals the batch session merge, so the identical
    gap-island oracle applies. At scale the session state lives in the
    stream's state store keyed by (user, session) and a watermark bounds
    it; the oracle twin omits the watermark (finite replay, see wave-9
    note)."""
    ev = read_event_stream_parquet(spark, sf_dir)
    return drain_to_table(_session_agg(ev), "complete", state_partitions=8)


def q_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] S5 VARIANT semi-structured type: ``parse_json`` lifts the
    events payload into Spark 4's binary-encoded VARIANT, ``variant_get``
    shreds typed paths back out, and the query aggregates per extracted
    key bucket. VARIANT defers schema to read time without paying string
    re-parsing at every access — the idiomatic Spark 4 answer to the
    reference's Python-side JSON handling (S5). The oracle shreds the
    same path with DuckDB's JSON extraction."""
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "bigint")
    return (
        ev.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2).alias(
                "sum_value"
            ),
        )
    )


_ORACLE_VARIANT = """
SELECT cast(json_extract_string(props, '$.k') AS bigint) % 10 AS k_bucket,
       cast(count(*) AS bigint) AS n_events,
       round(cast(sum(cast(value AS decimal(18,6))) AS double), 2) AS sum_value
FROM events
GROUP BY 1
"""


def _chunk_udtf():
    """Arrow-optimized Python UDTF: explode each document into
    fixed-size overlapping token windows (size 32, stride 16) — the
    context-chunking step of an embedding/RAG pipeline, expressed as a
    first-class table function usable from SQL (LATERAL). Row-wise
    Python is the API being demonstrated; the Arrow hint batches the
    transfer, and the same kernel drops into mapInPandas unchanged when
    a pipeline needs the pure-throughput path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx int, n_tokens int, chunk_text string",
          useArrow=True)
    class ChunkDocs:
        def eval(self, doc_id, text):
            toks = (text or "").split()
            size, stride = 32, 16
            idx = 0
            for start in range(0, max(len(toks), 1), stride):
                window = toks[start : start + size]
                if not window:
                    break
                yield doc_id, idx, len(window), " ".join(window)
                idx += 1
                if start + size >= len(toks):
                    break

    return ChunkDocs


def q_udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 document chunking via Python UDTF + LATERAL join: every
    document becomes its overlapping 32-token windows (stride 16), each
    chunk fingerprinted with md5 JVM-side (the UDTF emits text; hashing
    and aggregation stay in codegen). The oracle rebuilds the same
    windows with list_slice over a fixed stride series."""
    from .operators.dedup import spread

    # one-file fixture scan = one split: the row-wise UDTF would serialize
    # on a single Python worker; spread is a no-op at real scale
    d = spread(_t(spark, sf_dir, "documents"))
    d.createOrReplaceTempView("docs_for_chunking")
    spark.udtf.register("chunk_docs", _chunk_udtf())
    out = spark.sql(
        "SELECT c.doc_id, c.chunk_idx, c.n_tokens, c.chunk_text "
        "FROM docs_for_chunking d, LATERAL chunk_docs(d.doc_id, d.text) c"
    )
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.md5(F.col("chunk_text")).alias("chunk_md5"),
    )


_ORACLE_UDTF_CHUNK = r"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS tt
  FROM documents
),
chunks AS (
  -- the kernel advances by stride only while start+size < len, so the
  -- emitted offsets are 0 plus every multiple of 16 with off+16 < len
  SELECT doc_id,
         cast(g.off / 16 AS bigint) AS chunk_idx,
         tt[g.off + 1 : g.off + 32] AS win
  FROM toks, range(0, 100000, 16) g(off)
  WHERE len(tt) > 0 AND (g.off = 0 OR g.off + 16 < len(tt))
)
SELECT doc_id, chunk_idx,
       cast(len(win) AS bigint) AS n_tokens,
       md5(array_to_string(win, ' ')) AS chunk_md5
FROM chunks
"""


REGISTRY_EXT14: dict[str, QuerySpec] = {
    "session_window_native": QuerySpec(
        q_session_window_native, _ORACLE_SESSION_WINDOW, "X9 [EXT]"
    ),
    "streaming_session_window": QuerySpec(
        q_streaming_session_window, _ORACLE_SESSION_WINDOW, "X10 streaming"
    ),
    "variant_shred_agg": QuerySpec(q_variant_shred, _ORACLE_VARIANT, "S5 [EXT] variant"),
    "udtf_chunk_documents": QuerySpec(q_udtf_chunk_documents, _ORACLE_UDTF_CHUNK, "X6 [EXT]"),
}
