"""Operator registry, wave 54: trigram substring-search index, Poisson
bootstrap confidence intervals, and CDC net-effect compaction.

Scale stances:
- Trigram index: the pg_trgm / code-search shape — postings are built
  map-side (per-doc distinct trigrams), immediately FILTERED to the
  pattern's trigram set (so the shuffled frame is |pattern-trigrams| *
  matching-docs, never the full index), candidates need ALL pattern
  trigrams (count == m), and only candidates pay the verify scan.
  A LIKE '%p%' full scan reads every byte of every document; the
  index path reads candidate docs only.
- Poisson bootstrap: THE way bootstrap runs on clusters (resampling
  with replacement is impossible distributed; per-row Poisson(1)
  weights are equivalent for large n). Weights come from an md5-hash
  uniform pushed through literal-embedded inverse-CDF thresholds —
  fully deterministic, no RNG state; replica means are exact-int
  ratios; the CI is the min/max order statistic of the 32-replica,
  strata-bounded frame.
- CDC net-effect: per-key first/last ops from (ts, event_id)-ordered
  windows PARTITIONED by key — the Debezium-style changelog
  compaction (I+...+D collapses to nothing, etc.).

Reference parity: none; [EXT] X1/X6/X7/X8 tier per BASELINE.json.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators.dedup import spread
from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Trigram substring-search index (X6 [EXT])
# --------------------------------------------------------------------------

_TRGM_PATTERN = "scan query"


def _pattern_trigrams(p: str) -> list[str]:
    return sorted({p[i : i + 3] for i in range(len(p) - 2)})


def q_trigram_like_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 trigram-index substring search: find documents
    containing '{p}' the way pg_trgm / code-search engines do — build
    per-doc distinct character trigrams, keep only postings for the
    pattern's {m} trigrams (the index probe), candidates are docs
    holding ALL of them, then verify with a real contains() on the
    candidate set only. Output equals the brute-force LIKE scan, but
    the scan cost is candidates, not corpus."""
    tris = _pattern_trigrams(_TRGM_PATTERN)
    tris_arr = F.array(*[F.lit(t) for t in tris])
    d = _t(spark, sf_dir, "documents")
    # ~len(text) substring ops per doc; spread the one-split scan so the
    # trigram extraction uses every core (no-op at scale)
    doc_tris = spread(d).select(
        "doc_id",
        # Spark sequence(1, 0) yields a DESCENDING [1, 0] — guard short
        # docs explicitly instead of clamping the bound
        F.array_distinct(
            F.expr(
                "CASE WHEN length(text) >= 3 THEN"
                " transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"
                " ELSE array() END"
            )
        ).alias("tris"),
    )
    postings = doc_tris.select(
        "doc_id", F.explode(F.array_intersect(F.col("tris"), tris_arr)).alias("tri")
    )
    candidates = (
        postings.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("m"))
        .where(F.col("m") == len(tris))
        .select("doc_id")
    )
    return (
        candidates.join(d, "doc_id")
        .where(F.contains(F.col("text"), F.lit(_TRGM_PATTERN)))
        .select("doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars"))
        .orderBy("doc_id")
    )


def _oracle_trigram() -> str:
    tris = _pattern_trigrams(_TRGM_PATTERN)
    tris_sql = ", ".join(f"'{t}'" for t in tris)
    return f"""
WITH doc_tris AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(text) - 1, 1)),
                                      i -> substr(text, i, 3))) AS tris
  FROM documents
),
postings AS (
  SELECT doc_id, unnest(list_intersect(tris, [{tris_sql}])) AS tri FROM doc_tris
),
candidates AS (
  SELECT doc_id FROM postings GROUP BY doc_id HAVING count(*) = {len(tris)}
)
SELECT d.doc_id, d.lang, cast(d.n_chars AS bigint) AS n_chars
FROM candidates c JOIN documents d USING (doc_id)
WHERE contains(d.text, '{_TRGM_PATTERN}')
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Poisson bootstrap CI (X7/X8 [EXT])
# --------------------------------------------------------------------------

_BOOT_B = 32
# inverse-CDF thresholds for Poisson(1): P(X <= k), k = 0..6; weight 7 beyond.
_POIS_CUM = []
_acc = 0.0
for _k in range(7):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _POIS_CUM.append(_acc)


def _poisson_case(u_expr: str) -> str:
    """CASE chain mapping a uniform [0,1) to a Poisson(1) draw via the
    literal-embedded inverse CDF — identical SQL text in both engines."""
    whens = " ".join(
        f"WHEN {u_expr} < {c!r} THEN {k}" for k, c in enumerate(_POIS_CUM)
    )
    return f"CASE {whens} ELSE 7 END"


def q_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7/X8 Poisson bootstrap: {b} deterministic resampling
    replicas of the per-event_type mean value — per-(row, replica)
    Poisson(1) weights derived from an md5 uniform through the
    literal inverse CDF (the distributed bootstrap: no sampling with
    replacement, no RNG state, bit-reproducible). Replica means are
    exact-int cent ratios; the interval is the min/max order statistic
    across the {b}-replica strata-bounded frame."""
    u = (
        "cast(conv(substring(md5(concat(cast(event_id as string), '|',"
        " cast(r as string))), 1, 13), 16, 10) as bigint) / 4503599627370496.0"
    )
    e = (
        # B md5 evaluations per event ride the explode; spread the
        # one-split scan across cores (no-op at scale)
        spread(_t(spark, sf_dir, "events"))
        .select(
            "event_type",
            "event_id",
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .alias("v"),
        )
        .selectExpr("event_type", "event_id", "v", f"explode(sequence(1, {_BOOT_B})) as r")
        .selectExpr("event_type", "v", "r", f"{_poisson_case(u)} as w")
    )
    reps = e.groupBy("event_type", "r").agg(
        F.sum(F.col("w") * F.col("v")).cast("bigint").alias("swv"),
        F.sum("w").cast("bigint").alias("sw"),
    )
    means = reps.select(
        "event_type",
        F.floor(F.lit(1e6) * F.col("swv") / F.col("sw")).cast("bigint").alias("m_micro"),
    )
    boot = means.groupBy("event_type").agg(
        F.min("m_micro").alias("boot_lo_micro"),
        F.max("m_micro").alias("boot_hi_micro"),
    )
    point = (
        _t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .alias("v"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.floor(F.lit(1e6) * F.sum("v") / F.count(F.lit(1)))
            .cast("bigint")
            .alias("mean_micro"),
        )
    )
    return point.join(boot, "event_type").orderBy("event_type")


def _oracle_bootstrap() -> str:
    u = (
        "('0x' || substr(md5(cast(event_id AS varchar) || '|' ||"
        " cast(r AS varchar)), 1, 13))::BIGINT / 4503599627370496.0"
    )
    return f"""
WITH base AS (
  SELECT event_type, event_id,
         cast(floor(value * 100.0 + 0.5) AS bigint) AS v
  FROM events
),
reps AS (
  SELECT event_type, v, r, {_poisson_case(u)} AS w
  FROM base CROSS JOIN (SELECT unnest(range(1, {_BOOT_B + 1})) AS r)
),
agg AS (
  SELECT event_type, r, sum(w * v)::BIGINT AS swv, sum(w)::BIGINT AS sw
  FROM reps GROUP BY 1, 2
),
means AS (
  SELECT event_type,
         cast(floor(1e6 * swv / sw) AS bigint) AS m_micro
  FROM agg
),
boot AS (
  SELECT event_type, min(m_micro) AS boot_lo_micro, max(m_micro) AS boot_hi_micro
  FROM means GROUP BY 1
),
point AS (
  SELECT event_type, count(*)::BIGINT AS n,
         cast(floor(1e6 * sum(v) / count(*)) AS bigint) AS mean_micro
  FROM base GROUP BY 1
)
SELECT p.event_type, p.n, p.mean_micro, b.boot_lo_micro, b.boot_hi_micro
FROM point p JOIN boot b USING (event_type)
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# CDC net-effect compaction (X1/W [EXT])
# --------------------------------------------------------------------------


def q_cdc_net_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X1/W changelog net-effect compaction: mapping events to a
    per-user change log (signup=INSERT, error=DELETE, others=UPDATE in
    (ts, event_id) order), collapse each key's history to its net
    effect — I+...+D vanishes, I+...+U stays an INSERT with the final
    image, U..D is a DELETE, etc. This is the compaction a CDC
    pipeline applies before merging a day of changes into the target.
    First/last ops come from rank windows PARTITIONED by user."""
    op = (
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
    )
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        op.alias("op"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("bigint").alias("v"),
        F.unix_micros("ts").alias("t_us"),
        "event_id",
    )
    wa = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    wd = Window.partitionBy("user_id").orderBy(F.desc("t_us"), F.desc("event_id"))
    r = e.withColumn("ra", F.row_number().over(wa)).withColumn(
        "rd", F.row_number().over(wd)
    )
    per_key = r.groupBy("user_id").agg(
        F.max(F.when(F.col("ra") == 1, F.col("op"))).alias("first_op"),
        F.max(F.when(F.col("rd") == 1, F.col("op"))).alias("last_op"),
        F.max(F.when(F.col("rd") == 1, F.col("v"))).cast("bigint").alias("last_v"),
        F.count(F.lit(1)).cast("bigint").alias("n_changes"),
    )
    net = per_key.select(
        "user_id",
        F.when(
            (F.col("first_op") == "I") & (F.col("last_op") == "D"), F.lit("NONE")
        )
        .when(F.col("last_op") == "D", F.lit("D"))
        .when(F.col("first_op") == "I", F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("net_op"),
        F.when(F.col("last_op") != "D", F.col("last_v")).alias("last_value_c"),
        "n_changes",
    )
    return net.where(F.col("net_op") != "NONE").orderBy("user_id")


_ORACLE_CDC = """
WITH e AS (
  SELECT user_id,
         CASE WHEN event_type = 'signup' THEN 'I'
              WHEN event_type = 'error' THEN 'D'
              ELSE 'U' END AS op,
         cast(floor(value * 100.0 + 0.5) AS bigint) AS v,
         epoch_us(ts) AS t_us, event_id
  FROM events
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS ra,
         row_number() OVER (PARTITION BY user_id ORDER BY t_us DESC, event_id DESC)
           AS rd
  FROM e
),
per_key AS (
  SELECT user_id,
         max(CASE WHEN ra = 1 THEN op END) AS first_op,
         max(CASE WHEN rd = 1 THEN op END) AS last_op,
         max(CASE WHEN rd = 1 THEN v END)::BIGINT AS last_v,
         count(*)::BIGINT AS n_changes
  FROM r GROUP BY 1
),
net AS (
  SELECT user_id,
         CASE WHEN first_op = 'I' AND last_op = 'D' THEN 'NONE'
              WHEN last_op = 'D' THEN 'D'
              WHEN first_op = 'I' THEN 'I'
              ELSE 'U' END AS net_op,
         CASE WHEN last_op <> 'D' THEN last_v END AS last_value_c,
         n_changes
  FROM per_key
)
SELECT user_id, net_op, last_value_c, n_changes
FROM net WHERE net_op <> 'NONE' ORDER BY user_id
"""


REGISTRY_EXT53: dict[str, QuerySpec] = {
    "trigram_like_index": QuerySpec(
        q_trigram_like_index, _oracle_trigram(), "X6 [EXT] substring search index"
    ),
    "poisson_bootstrap_ci": QuerySpec(
        q_poisson_bootstrap_ci, _oracle_bootstrap(), "X7/X8 [EXT] distributed bootstrap"
    ),
    "cdc_net_effect": QuerySpec(
        q_cdc_net_effect, _ORACLE_CDC, "X1/W [EXT] changelog compaction"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_trigram_like_index.__doc__ = q_trigram_like_index.__doc__.format(p=_TRGM_PATTERN, m=len(_pattern_trigrams(_TRGM_PATTERN)))  # noqa: E501
q_poisson_bootstrap_ci.__doc__ = q_poisson_bootstrap_ci.__doc__.format(b=_BOOT_B)  # noqa: E501
