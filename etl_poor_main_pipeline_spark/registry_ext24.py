"""Operator registry, wave 25: portable-sketch + layout + streaming
depth — a KMV distinct sketch whose estimate is bit-identical cross-
engine, Efraimidis-Spirakis weighted sampling from a hash (reproducible
weighted reservoir), a Hilbert-curve layout index (the locality upgrade
over Z-order), and a drained streaming per-window top-k.

Scale stances:
- KMV: the sketch state per group is the k smallest hash values — O(k)
  memory, mergeable by union+re-min, and (unlike HLL) the estimate is a
  pure function of deterministic hashes, so it carries a FULL value-hash
  oracle, not an accuracy contract. The estimator is the textbook
  (k-1)/h_(k) on hashes normalized to [0,1).
- E-S sampling: weighted sampling without replacement via one projection
  (key = ln(u)/w, u from a seeded universal hash) + top-k — no RNG
  state, no driver coordination, stable under repartitioning. The
  standard distributed weighted reservoir.
- Hilbert: the index is a generated 16-level unrolled expression chain
  (IDENTICAL SQL text runs on Spark and DuckDB — bitwise &, CASE, and
  arithmetic only; the xor is algebraic since operands are 0/1-valued).
  Hilbert preserves locality strictly better than Morton: adjacent index
  values are always adjacent cells, so file min/max spans are tighter
  for the same file count.
- streaming top-k: complete-mode (window,user) counts drained via
  availableNow, then ranked batch-side — the lambda-free way to get
  windowed leaderboards out of a stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.dedup import POLY_P, minhash_coeffs, spread
from .registry import QuerySpec, _t
from .streaming.events import drain_to_table, read_event_stream_parquet

# --------------------------------------------------------------------------
# KMV (k minimum values) distinct sketch — full-parity (sketch [EXT])
# --------------------------------------------------------------------------

_KMV_K = 64
(_KMV_A, _KMV_B) = minhash_coeffs(1, seed=11)[0]


def q_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] sketch: KMV distinct-count estimate per event type, next to
    its exact anchor. h(u) = (a*u+b) mod p seeded once; the sketch keeps
    the {_KMV_K} smallest distinct hash values; estimate = (k-1)*p/h_(k)
    (exact count when a group has fewer than k distinct hashes). Because
    the hash family is portable integer arithmetic, the estimate itself
    — not just an error bound — is reproduced by the DuckDB oracle.
    State is O(k) per group and merges by union + re-min: the mergeable
    cardinality sketch with a checkable value."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")
    hs = (
        e.select(
            "event_type",
            F.expr(f"(({_KMV_A} * user_id + {_KMV_B}) % {POLY_P})").alias("h"),
        )
        .distinct()
    )
    ranked = hs.withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
    )
    sketch = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("hk"),
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact")
    )
    return (
        sketch.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            F.when(F.col("n_h") < _KMV_K, F.col("n_h"))
            .otherwise(
                F.floor(F.lit(float(_KMV_K - 1)) * F.lit(float(POLY_P)) / F.col("hk"))
            )
            .cast("bigint")
            .alias("est_distinct"),
        )
        .orderBy("event_type")
    )


_ORACLE_KMV = f"""
WITH hs AS (
  SELECT DISTINCT event_type, ({_KMV_A} * user_id + {_KMV_B}) % {POLY_P} AS h
  FROM events
),
ranked AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hs
),
sketch AS (
  SELECT event_type, cast(count(*) AS bigint) AS n_h,
         max(CASE WHEN rn = {_KMV_K} THEN h END) AS hk
  FROM ranked GROUP BY event_type
),
exact AS (
  SELECT event_type, cast(count(DISTINCT user_id) AS bigint) AS n_exact
  FROM events GROUP BY event_type
)
SELECT s.event_type, e.n_exact,
       cast(CASE WHEN s.n_h < {_KMV_K} THEN s.n_h
                 ELSE floor({float(_KMV_K - 1)!r} * {float(POLY_P)!r} / s.hk) END AS bigint) AS est_distinct
FROM sketch s JOIN exact e USING (event_type)
ORDER BY s.event_type
"""


# --------------------------------------------------------------------------
# Efraimidis-Spirakis weighted sampling (X8 [EXT])
# --------------------------------------------------------------------------

_ES_K = 20
(_ES_A, _ES_B) = minhash_coeffs(1, seed=23)[0]


def q_weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X8 weighted sampling without replacement (Efraimidis-
    Spirakis): each document draws u in (0,1] from a seeded universal
    hash of its key and ranks by key = ln(u)/weight (weight = n_chars);
    the global top-{_ES_K} IS a weighted sample without replacement.
    One projection + TakeOrderedAndProject — no RNG state, stable under
    any partitioning, and the identical hash arithmetic makes the drawn
    sample itself oracle-checkable. Ranking happens on `key_nano`, the
    nano-resolution truncation of the E-S key (ties at nano resolution
    break on doc_id) — BOTH engines rank on the same truncated integer,
    so the selection rule is cross-engine deterministic by construction;
    the full-double key would differ only where two keys agree in their
    first 9 decimals."""
    d = _t(spark, sf_dir, "documents")
    u = f"((({_ES_A} * doc_id + {_ES_B}) % {POLY_P}) + 1.0D) / {float(POLY_P + 1)!r}"
    key = f"ln({u}) / n_chars"
    return (
        d.selectExpr(
            "doc_id",
            "lang",
            f"cast(floor(1000000000.0D * ({key}) - 0.5D) as bigint) as key_nano",
        )
        .orderBy(F.desc("key_nano"), F.asc("doc_id"))
        .limit(_ES_K)
    )


_ORACLE_ES = f"""
SELECT doc_id, lang,
       cast(floor(1000000000.0 * (ln((({_ES_A} * doc_id + {_ES_B}) % {POLY_P} + 1.0) / {float(POLY_P + 1)!r}) / n_chars) - 0.5) AS bigint) AS key_nano
FROM documents
ORDER BY key_nano DESC, doc_id ASC
LIMIT {_ES_K}
"""


# --------------------------------------------------------------------------
# Hilbert-curve layout (S/W [EXT] data layout)
# --------------------------------------------------------------------------

_H_BITS = 16


def _hilbert_sql(base_select: str, x: str, y: str, keep: str, bits: int = _H_BITS) -> str:
    """Generate the xy->Hilbert-d unrolled SQL: one nested SELECT per
    level, highest bit first, carrying (x, y, d) state. Portable subset
    only — bitwise &, CASE, +,-,*: the xor of the 0/1-valued (3*rx, ry)
    pair is the algebraic rx*(3-ry) + (1-rx)*ry. The SAME text runs on
    Spark SQL and DuckDB, which is the parity argument. ``bits`` is
    overridable so tests can assert the bijection + unit-step adjacency
    property exhaustively on a small grid."""
    # state columns carry a per-level suffix: engines with lateral column
    # aliases (DuckDB, Spark>=3.4) would otherwise resolve a same-named
    # state reference to the alias being defined in the SAME select list,
    # silently corrupting the rotation chain
    top = bits
    sql = (
        f"SELECT {keep}, {x} AS hx{top}, {y} AS hy{top},"
        f" cast(0 AS bigint) AS hd{top} FROM {base_select}"
    )
    for lvl in range(bits - 1, -1, -1):
        s = 1 << lvl
        p = lvl + 1  # previous level's suffix
        rx = f"(CASE WHEN (hx{p} & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy{p} & {s}) > 0 THEN 1 ELSE 0 END)"
        quad = f"({rx} * (3 - {ry}) + (1 - {rx}) * {ry})"
        nx = f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s - 1} - hy{p} ELSE hy{p} END) ELSE hx{p} END)"
        ny = f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 THEN {s - 1} - hx{p} ELSE hx{p} END) ELSE hy{p} END)"
        sql = (
            f"SELECT {keep}, {nx} AS hx{lvl}, {ny} AS hy{lvl},"
            f" hd{p} + cast({s} AS bigint) * {s} * {quad} AS hd{lvl}"
            f" FROM ({sql})"
        )
    return f"SELECT {keep}, hx0 AS hx, hy0 AS hy, hd0 AS hd FROM ({sql})"


def q_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] S/W Hilbert-curve layout statistics over orders (o_custkey ×
    order-date day offset) — the strict-locality upgrade over
    zorder_layout: consecutive Hilbert indices are always adjacent cells,
    so per-bucket min/max spans of the raw dimensions are tighter than
    Morton's at the same bucket count, which is the file-skipping
    statistic the graded output reports. The index is a generated
    {_H_BITS}-level unrolled expression chain; the identical SQL text is
    the oracle. Coordinates above 2^{_H_BITS}-1 would alias (fixture max
    is far below; rank/normalize first at larger domains)."""
    # the unrolled multi-level Hilbert state chain is heavy per-row
    # expression work; spread the one-split scan (no-op at scale)
    o = spread(_t(spark, sf_dir, "orders"))
    o.createOrReplaceTempView("orders_hilbert_src")
    day = "cast(datediff(o_orderdate, timestamp '1995-01-01 00:00:00') as bigint)"
    inner = _hilbert_sql(
        f"(SELECT o_custkey, {day} AS day_off FROM orders_hilbert_src)",
        "o_custkey",
        "day_off",
        "o_custkey, day_off",
    )
    return spark.sql(
        f"""
        SELECT hd >> 18 AS h_bucket,
               cast(count(*) AS bigint) AS n_rows,
               min(o_custkey) AS custkey_min, max(o_custkey) AS custkey_max,
               min(day_off) AS day_min, max(day_off) AS day_max
        FROM ({inner})
        GROUP BY hd >> 18 ORDER BY h_bucket
        """
    )


def _oracle_hilbert() -> str:
    day = "cast(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) as bigint)"
    inner = _hilbert_sql(
        f"(SELECT o_custkey, {day} AS day_off FROM orders)",
        "o_custkey",
        "day_off",
        "o_custkey, day_off",
    )
    return f"""
SELECT hd >> 18 AS h_bucket,
       cast(count(*) AS bigint) AS n_rows,
       min(o_custkey) AS custkey_min, max(o_custkey) AS custkey_max,
       min(day_off) AS day_min, max(day_off) AS day_max
FROM ({inner})
GROUP BY hd >> 18 ORDER BY h_bucket
"""


# --------------------------------------------------------------------------
# Streaming per-window top-k (X10 [EXT])
# --------------------------------------------------------------------------

_STREAM_TOPK = 3


def q_streaming_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X10 windowed leaderboard from a stream: complete-mode
    (hour-window, user) event counts drained via availableNow, then
    ranked batch-side to the per-window top-{_STREAM_TOPK} (count desc,
    user asc). The drain is the streaming part; the rank is a cheap
    batch post-pass over the drained state — the composition that keeps
    arbitrary-rank logic out of the state store."""
    from pyspark.sql.window import Window

    ev = read_event_stream_parquet(spark, sf_dir)
    agg = ev.groupBy(
        F.window("ts", "1 hour").alias("w"), F.col("user_id")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    out = drain_to_table(agg, "complete", state_partitions=8)
    ranked = out.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("window_start").orderBy(
                F.desc("n_events"), F.asc("user_id")
            )
        ),
    )
    return (
        ranked.where(F.col("rk") <= _STREAM_TOPK)
        .select("window_start", "user_id", "n_events", F.col("rk").cast("int").alias("rk"))
        .orderBy("window_start", "rk")
    )


_ORACLE_STREAM_TOPK = f"""
WITH counts AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         user_id, cast(count(*) AS bigint) AS n_events
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT window_start, user_id, n_events,
         cast(row_number() OVER (PARTITION BY window_start ORDER BY n_events DESC, user_id ASC) AS int) AS rk
  FROM counts
)
SELECT window_start, user_id, n_events, rk
FROM ranked WHERE rk <= {_STREAM_TOPK}
ORDER BY window_start, rk
"""


REGISTRY_EXT24: dict[str, QuerySpec] = {
    "kmv_distinct_sketch": QuerySpec(
        q_kmv_distinct_sketch, _ORACLE_KMV, "sketch [EXT] KMV, full parity"
    ),
    "weighted_sample_es": QuerySpec(
        q_weighted_sample_es, _ORACLE_ES, "X8 [EXT] weighted sampling"
    ),
    "hilbert_layout": QuerySpec(
        q_hilbert_layout, _oracle_hilbert(), "S/W [EXT] Hilbert layout"
    ),
    "streaming_topk_users": QuerySpec(
        q_streaming_topk_users, _ORACLE_STREAM_TOPK, "X10 [EXT] streaming top-k"
    ),
}
