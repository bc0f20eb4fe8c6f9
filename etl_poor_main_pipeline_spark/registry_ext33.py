"""Operator registry, wave 34: tokenizer application, distributed
skyline, partitioned rolling quantiles, and source-format evolution.

Scale stances:
- BPE apply: the merge table is a constant folded into a chain of
  ``replace`` expressions — per-token work inside the scan stage, one
  bounded-cardinality aggregate at the end.
- skyline: the classic "needs a global sort" operator rebuilt on the
  Blelloch scan (operators/scan_prefix.exclusive_prefix_max): grouped
  per-price maxima, exclusive prefix max across price groups, one
  broadcast join back. No unpartitioned window (the ORACLE keeps the
  literal global-window SQL spelling — that is the semantics being
  matched, and the guard test pins OUR plan as partition-parallel).
- rolling quantile: percentile over a bounded ROWS frame inside a
  PARTITIONED window — state is the frame, shuffle is the user key.
- JSONL round trip / schema merge: the interchange + evolution paths a
  lakehouse ingest hits daily; schema-explicit JSON read (no inference
  scan), mergeSchema parquet read across heterogenous batches.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators.dedup import spread
from .operators.scan_prefix import exclusive_prefix_max
from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# BPE merge application (X6 [EXT])
# --------------------------------------------------------------------------

#: Ordered merge table (the output side of bpe_merge_candidates): each
#: step rewrites the separator-joined symbol stream left-to-right,
#: non-overlapping — the greedy BPE apply rule. Constant-folded literals,
#: identical in both engines.
_BPE_MERGES = [
    ("t", "h"),
    ("th", "e"),
    ("a", "n"),
    ("i", "n"),
    ("e", "r"),
    ("o", "r"),
    ("s", "t"),
    ("c", "an"),
    ("s", "can"),
]
_BPE_TOPK = 40


def q_bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 BPE tokenizer APPLICATION (the other half of
    bpe_merge_candidates, which mines the merges): split every token to
    characters, apply the fixed {n} -merge table in order via chained
    ``replace`` over a '|'-separated symbol stream (replace is global
    left-to-right non-overlapping in both engines — exactly greedy BPE),
    then report the corpus's top-{k} post-merge symbols. All per-token
    work is constant-folded expressions in the scan stage; the only
    shuffle is the final bounded symbol aggregate."""
    d = spread(_t(spark, sf_dir, "documents"))
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit("")
    )
    tok = d.select(F.explode(toks).alias("tok"))
    sym = F.array_join(F.split(F.col("tok"), ""), "|")
    for a, b in _BPE_MERGES:
        sym = F.replace(sym, F.lit(a + "|" + b), F.lit(a + b))
    return (
        tok.select(F.explode(F.split(sym, r"\|")).alias("symbol"))
        .groupBy("symbol")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("symbol"))
        .limit(_BPE_TOPK)
    )


def _oracle_bpe_apply() -> str:
    expr = "array_to_string(string_split(tok, ''), '|')"
    for a, b in _BPE_MERGES:
        expr = f"replace({expr}, '{a}|{b}', '{a}{b}')"
    return rf"""
WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            t -> t <> '')) AS tok
  FROM documents
),
syms AS (
  SELECT unnest(string_split({expr}, '|')) AS symbol FROM tok
)
SELECT symbol, cast(count(*) AS bigint) AS n
FROM syms GROUP BY symbol
ORDER BY n DESC, symbol ASC LIMIT {_BPE_TOPK}
"""


# --------------------------------------------------------------------------
# Distributed 2-D skyline / Pareto frontier (X7 [EXT])
# --------------------------------------------------------------------------

_SKY_EPOCH = "1992-01-01"


def q_pareto_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Pareto skyline over orders: keep every order NOT strictly
    dominated in BOTH price and recency (exists p' > p AND d' > d).
    Textbook algorithm sorts globally by price and keeps a running date
    max — a single-partition trap at scale. Here: group by price (cents),
    per-group max date, EXCLUSIVE PREFIX MAX across descending price
    groups via the Blelloch scan (scan_prefix.exclusive_prefix_max — no
    unpartitioned window), broadcast the per-price threshold back, filter
    ``day >= prior_max``. The oracle keeps the literal global-window SQL;
    tests/test_no_global_window.py pins that OUR plan stays
    partition-parallel."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.lit(100.0) * F.col("o_totalprice") + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit(_SKY_EPOCH)))
        .cast("bigint")
        .alias("day"),
    )
    pg = o.groupBy("cents").agg(F.max("day").alias("dmax"))
    pm = exclusive_prefix_max(
        pg.withColumn("_nk", -F.col("cents")), "_nk", "dmax", out="mprev"
    ).select("cents", "mprev")
    return (
        # pm has one row per DISTINCT price — domain-bounded (cents of a
        # price column), so broadcast keeps the fact side entirely
        # shuffle-free; at a cardinality where this stopped holding the
        # planner's size check would fall back to a shuffle join.
        o.join(F.broadcast(pm), "cents")
        .where(F.col("mprev").isNull() | (F.col("day") >= F.col("mprev")))
        .select("o_orderkey", "cents", "day")
        .orderBy(F.desc("cents"), F.asc("o_orderkey"))
    )


_ORACLE_SKYLINE = f"""
WITH o AS (
  SELECT o_orderkey,
         cast(floor(100.0 * o_totalprice + 0.5) AS bigint) AS cents,
         cast(date_diff('day', DATE '{_SKY_EPOCH}', o_orderdate::DATE) AS bigint) AS day
  FROM orders
),
pg AS (SELECT cents, max(day) AS dmax FROM o GROUP BY cents),
pm AS (
  SELECT cents,
         max(dmax) OVER (ORDER BY cents DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mprev
  FROM pg
)
SELECT o.o_orderkey, o.cents, o.day
FROM o JOIN pm USING (cents)
WHERE pm.mprev IS NULL OR o.day >= pm.mprev
ORDER BY o.cents DESC, o.o_orderkey ASC
"""


# --------------------------------------------------------------------------
# Partitioned rolling quantile (X7 window [EXT])
# --------------------------------------------------------------------------

_RQ_FRAME = 4  # current row + 4 preceding = 5-event window


def q_rolling_quantile_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 rolling median of event value over each user's last
    {w} events — the per-entity smoothing every metrics pipeline runs.
    percentile over a bounded ROWS frame inside a PARTITIONED window:
    state is the {w}-row frame, shuffle only the user key. Values are
    micro-scaled to integers first so the interpolated median lands on
    exact .5 steps — 2*median is integer, zero FP ties cross-engine."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.lit(1e6) * F.col("value") + F.lit(0.5))
        .cast("bigint")
        .alias("v_micro"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-_RQ_FRAME, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        (F.lit(2.0) * F.percentile("v_micro", F.lit(0.5)).over(w))
        .cast("bigint")
        .alias("med_micro_x2"),
    ).orderBy("user_id", "event_id")


_ORACLE_ROLLING_Q = f"""
WITH e AS (
  SELECT user_id, event_id, ts,
         cast(floor(1000000.0 * value + 0.5) AS bigint) AS v_micro
  FROM events
)
SELECT user_id, event_id,
       cast(2.0 * quantile_cont(v_micro, 0.5) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN {_RQ_FRAME} PRECEDING AND CURRENT ROW)
            AS bigint) AS med_micro_x2
FROM e ORDER BY user_id, event_id
"""


# --------------------------------------------------------------------------
# JSONL round trip (S [EXT] source/sink format)
# --------------------------------------------------------------------------


def q_jsonl_round_trip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] S-tier JSON-lines interchange: project documents to a
    3-column frame, write JSONL, read it back with an EXPLICIT schema
    (no inference scan — at 100 TB schema inference is a full extra
    pass), and aggregate per language. The oracle aggregates the source
    parquet directly: equality proves the round trip is lossless.
    Executors write/read their partitions in parallel; the temp
    directory stands in for the object-store landing zone."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = os.path.join(
        tempfile.gettempdir(),
        # per-session path component: fixed names under the shared
        # tempdir race across parallel sessions (ADVICE r9 / shard
        # workers) — same stance as registry_ext125._session_tag
        f"jsonl_rt_{spark.sparkContext.applicationId.replace('-', '_')}"
        f"_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    d.write.mode("overwrite").json(path)
    back = spark.read.schema("doc_id bigint, lang string, n_chars bigint").json(path)
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
        .orderBy("lang")
    )


_ORACLE_JSONL = """
SELECT lang,
       cast(count(*) AS bigint) AS n_docs,
       cast(sum(n_chars) AS bigint) AS sum_chars,
       cast(min(doc_id) AS bigint) AS min_doc,
       cast(max(doc_id) AS bigint) AS max_doc
FROM documents GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# Parquet schema evolution via mergeSchema (S [EXT])
# --------------------------------------------------------------------------


def q_schema_merge_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] S-tier schema evolution: batch A lands (doc_id, lang),
    batch B lands (doc_id, n_chars) — the column-added-later shape every
    long-lived dataset develops. ``mergeSchema`` parquet read unifies
    them with NULLs where a batch lacks the column; the aggregate proves
    both batches survive with their columns intact. The oracle emulates
    the evolved read with a UNION ALL of NULL-padded projections."""
    d = _t(spark, sf_dir, "documents")
    base = os.path.join(
        tempfile.gettempdir(),
        f"schema_evo_{spark.sparkContext.applicationId.replace('-', '_')}"
        f"_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    pa, pb = os.path.join(base, "batch_a"), os.path.join(base, "batch_b")
    d.select("doc_id", "lang").write.mode("overwrite").parquet(pa)
    d.select("doc_id", "n_chars").write.mode("overwrite").parquet(pb)
    merged = spark.read.option("mergeSchema", "true").parquet(pa, pb)
    return (
        merged.groupBy(F.coalesce("lang", F.lit("<absent>")).alias("lang"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count("n_chars").cast("bigint").alias("n_with_chars"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("bigint").alias("sum_chars"),
        )
        .orderBy("lang")
    )


_ORACLE_SCHEMA_EVO = """
WITH evolved AS (
  SELECT doc_id, lang, NULL::BIGINT AS n_chars FROM documents
  UNION ALL
  SELECT doc_id, NULL::VARCHAR AS lang, n_chars FROM documents
)
SELECT coalesce(lang, '<absent>') AS lang,
       cast(count(*) AS bigint) AS n_rows,
       cast(count(n_chars) AS bigint) AS n_with_chars,
       cast(coalesce(sum(n_chars), 0) AS bigint) AS sum_chars
FROM evolved GROUP BY coalesce(lang, '<absent>') ORDER BY lang
"""


REGISTRY_EXT33: dict[str, QuerySpec] = {
    "bpe_apply_merges": QuerySpec(
        q_bpe_apply_merges, _oracle_bpe_apply(), "X6 [EXT] BPE tokenizer apply"
    ),
    "pareto_skyline_2d": QuerySpec(
        q_pareto_skyline_2d, _ORACLE_SKYLINE, "X7 [EXT] distributed skyline"
    ),
    "rolling_quantile_window": QuerySpec(
        q_rolling_quantile_window, _ORACLE_ROLLING_Q, "X7 [EXT] rolling median"
    ),
    "jsonl_round_trip": QuerySpec(
        q_jsonl_round_trip, _ORACLE_JSONL, "S [EXT] JSONL interchange"
    ),
    "schema_merge_evolution": QuerySpec(
        q_schema_merge_evolution, _ORACLE_SCHEMA_EVO, "S [EXT] mergeSchema evolution"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_bpe_apply_merges.__doc__ = q_bpe_apply_merges.__doc__.format(n=len(_BPE_MERGES), k=_BPE_TOPK)  # noqa: E501
q_rolling_quantile_window.__doc__ = q_rolling_quantile_window.__doc__.format(w=_RQ_FRAME + 1)  # noqa: E501
