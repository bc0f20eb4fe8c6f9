"""Operator registry, wave 31: complex-event-processing emulation and an
information-theoretic quality signal — the MATCH_RECOGNIZE-style
sequence detector SQL engines bolt on, and per-document character
entropy (the compression-ratio proxy computable in pure SQL).

Scale stances:
- sequence match: the pattern window is two lead()s over the per-user
  event order — state is the pattern length, shuffles only on user_id.
  This is how CEP patterns compile onto a batch engine: no NFA state
  store, just offset windows.
- entropy: one explode to (doc, char) counts, one aggregate back;
  alphabet-bounded group count per doc. ln on identical doubles,
  decimal sums for the cross-partition reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.dedup import spread
from .registry import QuerySpec, _t

_PATTERN = ("view", "click", "purchase")


def q_sequence_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X9 CEP / MATCH_RECOGNIZE emulation: count, per user, the
    occurrences of the CONSECUTIVE event pattern view -> click ->
    purchase in the (ts, event_id)-ordered stream, plus the timestamp
    of the first match. Pattern detection compiles to lead() offsets —
    pattern length fixed, state none, shuffle only the user key. Users
    with zero matches are excluded (the match table, not a roster)."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        e.select("user_id", "event_id", "ts", "event_type")
        .withColumn("e1", F.lead("event_type", 1).over(w))
        .withColumn("e2", F.lead("event_type", 2).over(w))
    )
    hits = seq.where(
        (F.col("event_type") == _PATTERN[0])
        & (F.col("e1") == _PATTERN[1])
        & (F.col("e2") == _PATTERN[2])
    )
    return (
        hits.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matches"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_match_at"),
        )
        .orderBy("user_id")
    )


_ORACLE_SEQMATCH = f"""
WITH seq AS (
  SELECT user_id, ts, event_type,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e1,
         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2
  FROM events
)
SELECT user_id,
       cast(count(*) AS bigint) AS n_matches,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_match_at
FROM seq
WHERE event_type = '{_PATTERN[0]}' AND e1 = '{_PATTERN[1]}' AND e2 = '{_PATTERN[2]}'
GROUP BY user_id ORDER BY user_id
"""


def q_char_entropy_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6/X7 per-document character-distribution Shannon entropy
    (bits/char) — the pure-SQL stand-in for the compression-ratio
    quality signal: repetitive/boilerplate text scores low, natural
    text sits near the corpus mode, random noise scores high. One
    (doc, char) count aggregate (alphabet-bounded per doc), entropy =
    -sum p*log2 p via decimal-summed terms, micro-int output ordered by
    doc."""
    d = spread(_t(spark, sf_dir, "documents"))
    chars = (
        d.select("doc_id", F.explode(F.split(F.col("text"), "")).alias("ch"))
        .where(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    tot = chars.groupBy("doc_id").agg(F.sum("n").alias("t"))
    return (
        chars.join(tot, "doc_id")
        .select(
            "doc_id",
            (
                -(F.col("n") / F.col("t")) * F.log2(F.col("n") / F.col("t"))
            ).cast("decimal(38,16)").alias("term"),
        )
        .groupBy("doc_id")
        .agg(
            F.floor(F.lit(1000000.0) * F.sum("term").cast("double") + F.lit(0.5))
            .cast("bigint")
            .alias("entropy_micro")
        )
        .orderBy("doc_id")
    )


_ORACLE_ENTROPY = """
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
),
counts AS (
  SELECT doc_id, ch, cast(count(*) AS double) AS n
  FROM chars WHERE ch <> '' GROUP BY doc_id, ch
),
tot AS (SELECT doc_id, sum(n) AS t FROM counts GROUP BY doc_id)
SELECT c.doc_id,
       cast(floor(1000000.0 * cast(sum(cast(-(c.n / tot.t) * log2(c.n / tot.t) AS decimal(38,16))) AS double) + 0.5) AS bigint) AS entropy_micro
FROM counts c JOIN tot ON tot.doc_id = c.doc_id
GROUP BY c.doc_id ORDER BY c.doc_id
"""


REGISTRY_EXT30: dict[str, QuerySpec] = {
    "sequence_pattern_match": QuerySpec(
        q_sequence_pattern_match, _ORACLE_SEQMATCH, "X9 [EXT] CEP emulation"
    ),
    "char_entropy_score": QuerySpec(
        q_char_entropy_score, _ORACLE_ENTROPY, "X6/X7 [EXT] entropy signal"
    ),
}
