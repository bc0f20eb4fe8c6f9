"""Operator registry, wave 10: scale paths surfaced as graded queries.

Salting (for skewed joins and aggregations) and flat-map frame sampling
exist as operators; these entries put them under the full-parity gate.
The salted shapes are value-identical to their unsalted SQL twins by
construction — the oracle checks exactly that, so the skew machinery can
never silently change semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import QuerySpec, _dsum, _dsum_sql, _t


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X5 video-style frame sampling: binary payloads flat-mapped to
    every-4th 256-byte frame via mapInPandas (stub chunk "decoder", real
    Arrow plumbing). Frames are compared by base64 — the corpus text is
    pure ASCII, so the oracle's VARCHAR slicing equals the byte slicing
    the operator really does."""
    from .operators.multimodal import sample_frames, text_to_binary

    d = _t(spark, sf_dir, "documents")
    frames = sample_frames(text_to_binary(d), frame_bytes=256, every_n=4)
    return frames.select(
        "media_id",
        "frame_idx",
        F.octet_length("frame").cast("long").alias("n_frame_bytes"),
        # Spark's base64 emits MIME \r\n line breaks every 76 chars;
        # strip them to the RFC4648 form DuckDB produces
        F.regexp_replace(F.base64("frame"), "[\\r\\n]", "").alias("frame_b64"),
    )


_ORACLE_FRAME_SAMPLE = """
WITH media AS (
  SELECT doc_id AS media_id, text, length(text) AS nc FROM documents
),
frames AS (
  -- generate_series can't take correlated bounds here, so cross-join a
  -- fixed 0..4095 index (1 MiB payload cap, corpus max ~600 B) and
  -- filter to frames that start inside the payload
  SELECT media_id,
         g.generate_series AS frame_idx,
         substring(text, cast(g.generate_series * 256 + 1 AS bigint), 256) AS frame_txt
  FROM media, generate_series(0, 4095) g
  WHERE g.generate_series * 256 < nc AND g.generate_series % 4 = 0
)
SELECT media_id,
       cast(frame_idx AS bigint) AS frame_idx,
       cast(octet_length(encode(frame_txt)) AS bigint) AS n_frame_bytes,
       base64(encode(frame_txt)) AS frame_b64
FROM frames
"""


def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join surfaced as a graded query: lineitem ⋈ supplier on
    l_suppkey through operators.relational.salted_join (left rows get a
    deterministic salt, the small right side replicates to all salts, the
    join key becomes (key, salt)). The oracle is the PLAIN join — salting
    must be invisible in the result. Aggregated per nation so the compare
    stays compact at any SF."""
    from .operators.relational import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity"
    )
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    joined = salted_join(li, sup, on="suppkey", salt_buckets=8)
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"), _dsum(F.col("l_quantity"), "sum_qty")
    )


_ORACLE_SALTED_JOIN = f"""
SELECT s.s_nationkey,
       count(*) AS n_items,
       {_dsum_sql('l.l_quantity', 'sum_qty')}
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY 1
"""


def q_agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for skewed group keys: phase 1
    aggregates on (key, salt) — spreading a hot key over N reducers —
    phase 2 combines the partials per key. Spark's map-side partial
    aggregation already gives this for algebraic aggs; the explicit shape
    is for skew so extreme that even a single reducer per key is too much
    (the 100 TB power-law-key case). Identical to the plain GROUP BY, as
    the oracle asserts. Counts combine by sum; sums stay on the decimal
    path end-to-end so FP order can't break the hash."""
    li = _t(spark, sf_dir, "lineitem")
    salt = F.pmod(F.xxhash64("l_orderkey", "l_linenumber", "l_partkey"), F.lit(16))
    partial = (
        li.withColumn("_salt", salt)
        .groupBy("l_returnflag", "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("_q"),
        )
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("_n").alias("n_items"),
            F.round(F.sum("_q").cast("double"), 2).alias("sum_qty"),
        )
    )


_ORACLE_SALTED_AGG = f"""
SELECT l_returnflag,
       count(*) AS n_items,
       {_dsum_sql('l_quantity', 'sum_qty')}
FROM lineitem
GROUP BY 1
"""


REGISTRY_EXT9: dict[str, QuerySpec] = {
    "multimodal_frame_sample": QuerySpec(
        q_multimodal_frame_sample, _ORACLE_FRAME_SAMPLE, "X5"
    ),
    "join_salted_skew": QuerySpec(q_join_salted_skew, _ORACLE_SALTED_JOIN, "§2.6 join scale"),
    "agg_salted_twophase": QuerySpec(q_agg_salted_twophase, _ORACLE_SALTED_AGG, "§2.6 agg scale"),
}
