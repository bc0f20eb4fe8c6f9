"""Operator registry, wave 53: late-data audit, attribute-partition
modularity, and Neyman-optimal stratified sample allocation.

Scale stances:
- Late-data audit: the per-key watermark simulation uses a running max
  over a window PARTITIONED by event_type (the Kafka-partition-wise
  watermark shape); lateness stays in integer microseconds.
- Modularity: edge and degree frames are graph-bounded aggregates over
  the (already blocked) near-dup pair pipeline; each community's
  Q-term lands on a nano-int before the final integer sum. Communities
  here are an ATTRIBUTE partition (source), so the oracle needs no
  iterative component computation.
- Neyman: everything is strata-bounded. The key identity N_h*sigma_h =
  sqrt(N_h*sum(v^2) - (sum v)^2) keeps the weight EXACT-integer under
  the sqrt (decimal(38,0) / HUGEINT — no double summation anywhere);
  the largest-remainder top-up ranks 5 strata via a triangular
  broadcast join, not a window.

Reference parity: none; [EXT] X7/X8/X9/X10-adjacent tier per
BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators import dedup
from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Late-data audit (X7/X10 [EXT])
# --------------------------------------------------------------------------

_LATE_DELAY_S = 300  # 5-minute allowed lateness


def q_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7/X10 late-data accounting: replaying events in ARRIVAL
    order (event_id — the ingestion sequence), an event is late when
    its event time falls more than {d}s behind the running max event
    time seen so far on its key — exactly what a watermark with {d}s
    allowed lateness would drop. Reports per event_type the late count
    and the worst lateness; the running max is a window PARTITIONED by
    event_type (the per-partition watermark shape), integer
    microseconds throughout."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e = (
        _t(spark, sf_dir, "events")
        .select("event_type", F.unix_micros("ts").alias("t_us"), "event_id")
        .withColumn("wm_us", F.max("t_us").over(w) - F.lit(_LATE_DELAY_S * 1_000_000))
        .withColumn(
            "late_us",
            F.when(
                F.col("wm_us").isNotNull() & (F.col("t_us") < F.col("wm_us")),
                F.col("wm_us") - F.col("t_us"),
            ).otherwise(F.lit(0)),
        )
    )
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_late"),
            F.floor(F.max("late_us") / F.lit(1_000_000)).cast("bigint").alias(
                "max_lateness_s"
            ),
        )
        .orderBy("event_type")
    )


_ORACLE_LATE = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) AS t_us, event_id FROM events
),
r AS (
  SELECT event_type, t_us,
         max(t_us) OVER (PARTITION BY event_type ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           - {_LATE_DELAY_S * 1_000_000} AS wm_us
  FROM e
),
l AS (
  SELECT event_type,
         CASE WHEN wm_us IS NOT NULL AND t_us < wm_us
              THEN wm_us - t_us ELSE 0 END AS late_us
  FROM r
)
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)::BIGINT AS n_late,
       cast(floor(max(late_us) / 1000000.0) AS bigint) AS max_lateness_s
FROM l GROUP BY 1 ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Attribute-partition modularity (X9 [EXT])
# --------------------------------------------------------------------------


def q_partition_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X9 graph modularity of the SOURCE partition over the
    document near-dup graph (token Jaccard >= 0.8, the
    dedup_jaccard_pairs edges): Q = sum_c [ e_c/m - (d_c/2m)^2 ] —
    "are near-duplicates concentrated within sources?", the score that
    validates attribute blocking before committing to it at 100 TB.
    Edge/degree frames are graph-bounded; each community's Q-term is
    two exact-int divisions and lands on a nano-int before summation.
    Reports per source: internal edges, total degree, and the term."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.jaccard_token_sets(
        d, threshold=0.8, block_cols=["lang"], length_window=16
    ).select("id_a", "id_b").localCheckpoint(eager=False)
    src_of = d.select("doc_id", "source")
    lab = (
        pairs.join(src_of.select(F.col("doc_id").alias("id_a"), F.col("source").alias("s_a")), "id_a")
        .join(src_of.select(F.col("doc_id").alias("id_b"), F.col("source").alias("s_b")), "id_b")
    )
    m_tot = lab.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    e_in = (
        lab.where(F.col("s_a") == F.col("s_b"))
        .groupBy(F.col("s_a").alias("source"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_in"))
    )
    deg = (
        lab.select(F.col("s_a").alias("source"))
        .unionAll(lab.select(F.col("s_b").alias("source")))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d_c"))
    )
    per_c = (
        deg.join(e_in, "source", "left")
        .crossJoin(F.broadcast(m_tot))
        .select(
            "source",
            F.coalesce("e_in", F.lit(0)).cast("bigint").alias("e_in"),
            "d_c",
            F.floor(
                F.lit(1e9)
                * (
                    F.coalesce("e_in", F.lit(0)).cast("double") / F.col("m")
                    - (F.col("d_c").cast("double") / (F.lit(2.0) * F.col("m")))
                    * (F.col("d_c").cast("double") / (F.lit(2.0) * F.col("m")))
                )
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("q_term_nano"),
        )
    )
    return per_c.orderBy("source")


_ORACLE_MODULARITY = r"""
WITH toks AS (
  SELECT doc_id, lang, n_chars, source,
         list_distinct(list_filter(string_split_regex(lower(text), '\s+'),
                                   t -> t <> '')) AS tok_set
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.source AS s_a, b.source AS s_b
  FROM toks a JOIN toks b
    ON a.doc_id < b.doc_id AND a.lang = b.lang AND abs(a.n_chars - b.n_chars) <= 16
  WHERE cast(len(list_intersect(a.tok_set, b.tok_set)) as double)
        / cast(len(list_distinct(list_concat(a.tok_set, b.tok_set))) as double) >= 0.8
),
m_tot AS (SELECT count(*)::BIGINT AS m FROM pairs),
e_in AS (
  SELECT s_a AS source, count(*)::BIGINT AS e_in
  FROM pairs WHERE s_a = s_b GROUP BY 1
),
deg AS (
  SELECT source, count(*)::BIGINT AS d_c FROM (
    SELECT s_a AS source FROM pairs
    UNION ALL
    SELECT s_b AS source FROM pairs
  ) GROUP BY 1
)
SELECT d.source,
       coalesce(e.e_in, 0)::BIGINT AS e_in,
       d.d_c,
       cast(floor(1e9 * (coalesce(e.e_in, 0) * 1.0 / t.m
                         - (d.d_c * 1.0 / (2.0 * t.m)) * (d.d_c * 1.0 / (2.0 * t.m)))
                  + 0.5) AS bigint) AS q_term_nano
FROM deg d LEFT JOIN e_in e USING (source) CROSS JOIN m_tot t
ORDER BY d.source
"""


# --------------------------------------------------------------------------
# Neyman-optimal stratified allocation (X8 [EXT])
# --------------------------------------------------------------------------

_NEYMAN_BUDGET = 1000


def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X8 Neyman-optimal stratified sampling allocation: split a
    {n}-row sample budget across event_type strata proportionally to
    N_h * sigma_h — the allocation minimizing estimator variance. The
    weight stays EXACT under the sqrt via N_h*sigma_h =
    sqrt(N_h*sum(v^2) - (sum v)^2) on integer cents (decimal(38,0) —
    no double summation anywhere); fractional seats are settled by
    largest remainder, ranked over the strata-bounded frame with a
    triangular broadcast join (no window). Allocations sum to exactly
    {n}."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("bigint").alias("v"),
    )
    strata = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("sv"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).alias("sv2"),
    )
    w = strata.select(
        "event_type",
        "n_h",
        # N*sigma = sqrt(N*sum(v^2) - (sum v)^2), exact integer inside
        F.floor(
            F.lit(1e6)
            * F.sqrt(
                (
                    F.col("n_h").cast("decimal(38,0)") * F.col("sv2")
                    - F.col("sv") * F.col("sv")
                ).cast("double")
            )
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("w_micro"),
    )
    tot = w.agg(F.sum("w_micro").cast("bigint").alias("wt"))
    frac = w.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_h",
        "w_micro",
        (F.lit(float(_NEYMAN_BUDGET)) * F.col("w_micro") / F.col("wt")).alias("frac"),
    )
    base = frac.select(
        "event_type",
        "n_h",
        "w_micro",
        F.floor("frac").cast("bigint").alias("base"),
        (F.col("frac") - F.floor("frac")).alias("rem"),
    )
    spare = base.agg(
        (F.lit(_NEYMAN_BUDGET) - F.sum("base")).cast("bigint").alias("spare")
    )
    # largest-remainder rank via triangular broadcast join (strata-bounded)
    b2 = base.select(
        F.col("event_type").alias("et2"), F.col("rem").alias("rem2")
    )
    ranked = (
        base.join(
            F.broadcast(b2),
            (F.col("rem2") > F.col("rem"))
            | ((F.col("rem2") == F.col("rem")) & (F.col("et2") < F.col("event_type"))),
            "left",
        )
        .groupBy("event_type", "n_h", "w_micro", "base")
        .agg(F.count("et2").cast("bigint").alias("ahead"))
    )
    return (
        ranked.crossJoin(F.broadcast(spare))
        .select(
            "event_type",
            "n_h",
            # w_micro = 1e6 * N_h * sigma, so w_micro / n_h = sigma in
            # micro-cents — reported at that precision
            F.floor(F.col("w_micro") / F.col("n_h"))
            .cast("bigint")
            .alias("sigma_micro"),
            (
                F.col("base")
                + F.when(F.col("ahead") < F.col("spare"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("alloc"),
        )
        .orderBy("event_type")
    )


_ORACLE_NEYMAN = f"""
WITH e AS (
  SELECT event_type, cast(floor(value * 100.0 + 0.5) AS bigint) AS v FROM events
),
strata AS (
  SELECT event_type, count(*)::BIGINT AS n_h,
         sum(cast(v AS hugeint)) AS sv,
         sum(cast(v AS hugeint) * cast(v AS hugeint)) AS sv2
  FROM e GROUP BY 1
),
w AS (
  SELECT event_type, n_h,
         cast(floor(1e6 * sqrt(cast(n_h * sv2 - sv * sv AS double)) + 0.5) AS bigint)
           AS w_micro
  FROM strata
),
tot AS (SELECT sum(w_micro)::BIGINT AS wt FROM w),
frac AS (
  SELECT event_type, n_h, w_micro,
         {float(_NEYMAN_BUDGET)!r} * w_micro / t.wt AS frac
  FROM w CROSS JOIN tot t
),
base AS (
  SELECT event_type, n_h, w_micro,
         cast(floor(frac) AS bigint) AS base, frac - floor(frac) AS rem
  FROM frac
),
spare AS (SELECT ({_NEYMAN_BUDGET} - sum(base))::BIGINT AS spare FROM base),
ranked AS (
  SELECT b.event_type, b.n_h, b.w_micro, b.base,
         (SELECT count(*) FROM base o
          WHERE o.rem > b.rem OR (o.rem = b.rem AND o.event_type < b.event_type))
           AS ahead
  FROM base b
)
SELECT event_type, n_h,
       cast(floor(w_micro * 1.0 / n_h) AS bigint) AS sigma_micro,
       (base + CASE WHEN ahead < (SELECT spare FROM spare) THEN 1 ELSE 0 END)::BIGINT
         AS alloc
FROM ranked ORDER BY event_type
"""


REGISTRY_EXT52: dict[str, QuerySpec] = {
    "late_data_audit": QuerySpec(
        q_late_data_audit, _ORACLE_LATE, "X7/X10 [EXT] watermark accounting"
    ),
    "partition_modularity": QuerySpec(
        q_partition_modularity, _ORACLE_MODULARITY, "X9 [EXT] community quality"
    ),
    "neyman_allocation": QuerySpec(
        q_neyman_allocation, _ORACLE_NEYMAN, "X8 [EXT] optimal stratified sampling"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_late_data_audit.__doc__ = q_late_data_audit.__doc__.format(d=_LATE_DELAY_S)  # noqa: E501
q_neyman_allocation.__doc__ = q_neyman_allocation.__doc__.format(n=_NEYMAN_BUDGET)  # noqa: E501
