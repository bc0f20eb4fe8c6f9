"""Operator registry, wave 64: Kaplan-Meier survival, Hill tail-index
estimation, and one-pass inferior-member dedup pruning.

Scale stances:
- Kaplan-Meier: the product-limit estimator as exp(cumulative sum of
  ln(1 - d_t/n_t)) — deaths and risk sets reduce to a DAY-bounded
  frame, the cumulative sum is the Blelloch prefix
  (operators/scan_prefix.exclusive_prefix_sum), and each log term
  lands on a nano-int so the curve is integer-deterministic.
- Hill: the heavy-tail index from the top-k order statistics (TakeOrdered
  per key, no global sort); log-ratio terms are nano-ints and the
  estimator is one exact-int ratio.
- Inferior-member pruning: the one-pass dedup policy (drop any doc
  that loses a quality comparison inside a near-dup pair) — no
  transitive closure needed, so unlike cluster collapse it is fully
  SQL-expressible AND embarrassingly parallel; the full iterative
  pipeline remains dedup_collapse_components + dedup_keep_best.

Reference parity: none; [EXT] X2/X7/X9 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators import dedup
from .operators.scan_prefix import exclusive_prefix_sum
from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Kaplan-Meier survival curve (X7/X9 [EXT])
# --------------------------------------------------------------------------


def q_kaplan_meier_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7/X9 Kaplan-Meier product-limit survival: time from a
    user's first click to first subsequent purchase, right-censored at
    the corpus end — S(day) for the conversion-delay question with
    censoring handled correctly (naive averages are biased). Deaths
    and risk sets live on a DAY-bounded frame; the cumulative
    log-product is a Blelloch prefix sum of nano-int ln(1 - d/n)
    terms, exponentiated to a micro survival value."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t_us")
    )
    first_click = (
        e.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("t_us").alias("t0"))
    )
    first_purch = (
        e.where(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .where(F.col("t_us") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("t_us").alias("tp"))
    )
    t_end = e.agg(F.max("t_us").alias("t_max"))
    durs = (
        first_click.join(first_purch, "user_id", "left")
        .crossJoin(F.broadcast(t_end))
        .select(
            "user_id",
            F.when(
                F.col("tp").isNotNull(),
                ((F.col("tp") - F.col("t0")) / F.lit(86_400_000_000)).cast("bigint"),
            )
            .otherwise(
                ((F.col("t_max") - F.col("t0")) / F.lit(86_400_000_000)).cast("bigint")
            )
            .alias("day"),
            F.col("tp").isNotNull().alias("observed"),
        )
    )
    n_total = durs.agg(F.count(F.lit(1)).cast("bigint").alias("n_all"))
    per_day = durs.groupBy("day").agg(
        F.sum(F.when(F.col("observed"), 1).otherwise(0)).cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("leave"),
    )
    # risk set at day t = n_all - (all users whose duration < t)
    left_before = exclusive_prefix_sum(per_day, "day", "leave", out="gone")
    risk = left_before.crossJoin(F.broadcast(n_total)).select(
        "day", "d", (F.col("n_all") - F.col("gone")).alias("n_risk")
    )
    terms = risk.where(F.col("d") > 0).select(
        "day",
        "d",
        "n_risk",
        # d == n_risk empties the risk set (only possible on the last
        # death day): S drops to exactly 0, ln is undefined — carry a
        # zero term and override the output below
        F.when(
            F.col("d") < F.col("n_risk"),
            F.floor(
                F.lit(1e9)
                * F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk"))
                + F.lit(0.5)
            ).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("ln_nano"),
    )
    cum = exclusive_prefix_sum(terms, "day", "ln_nano", out="ln_before")
    return (
        cum.select(
            "day",
            "d",
            "n_risk",
            F.when(F.col("d") == F.col("n_risk"), F.lit(0).cast("bigint"))
            .otherwise(
                F.floor(
                    F.lit(1e6)
                    * F.exp((F.col("ln_before") + F.col("ln_nano")) / F.lit(1e9))
                    + F.lit(0.5)
                ).cast("bigint")
            )
            .alias("s_micro"),
        )
        .orderBy("day")
    )


_ORACLE_KM = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS t_us FROM events
),
first_click AS (
  SELECT user_id, min(t_us) AS t0 FROM e WHERE event_type = 'click' GROUP BY 1
),
first_purch AS (
  SELECT e.user_id, min(e.t_us) AS tp
  FROM e JOIN first_click f USING (user_id)
  WHERE e.event_type = 'purchase' AND e.t_us > f.t0
  GROUP BY 1
),
t_end AS (SELECT max(t_us) AS t_max FROM e),
durs AS (
  SELECT f.user_id,
         CASE WHEN p.tp IS NOT NULL
              THEN cast((p.tp - f.t0) // 86400000000 AS bigint)
              ELSE cast(((SELECT t_max FROM t_end) - f.t0) // 86400000000 AS bigint)
         END AS day,
         (p.tp IS NOT NULL) AS observed
  FROM first_click f LEFT JOIN first_purch p USING (user_id)
),
n_total AS (SELECT count(*)::BIGINT AS n_all FROM durs),
per_day AS (
  SELECT day,
         sum(CASE WHEN observed THEN 1 ELSE 0 END)::BIGINT AS d,
         count(*)::BIGINT AS leave
  FROM durs GROUP BY 1
),
risk AS (
  SELECT day, d,
         (SELECT n_all FROM n_total)
           - coalesce(sum(leave) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
  FROM per_day
),
terms AS (
  SELECT day, d, n_risk,
         CASE WHEN d < n_risk
              THEN cast(floor(1e9 * ln(1.0 - d * 1.0 / n_risk) + 0.5) AS bigint)
              ELSE 0 END AS ln_nano
  FROM risk WHERE d > 0
)
SELECT day, d, n_risk::BIGINT AS n_risk,
       CASE WHEN d = n_risk THEN 0
            ELSE cast(floor(1e6 * exp(sum(ln_nano) OVER (ORDER BY day) / 1e9)
                            + 0.5) AS bigint) END AS s_micro
FROM terms ORDER BY day
"""


# --------------------------------------------------------------------------
# Hill tail-index estimator (X7 [EXT])
# --------------------------------------------------------------------------

_HILL_K = 100


def q_hill_tail_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Hill estimator of the heavy-tail index per event_type:
    alpha = (k-1) / sum(ln(x_i / x_k)) over the top-{k} order
    statistics — the tail diagnostic behind capacity planning and
    outlier budgets (alpha < 2 means infinite variance territory).
    Top-k per key via rank windows; log ratios land on nano-ints, so
    the estimator is one exact-int ratio."""
    w = Window.partitionBy("event_type").orderBy(F.desc("v"), F.asc("event_id"))
    top = (
        _t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("bigint").alias("v"),
            "event_id",
        )
        .where(F.col("v") > 0)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _HILL_K)
    )
    # the rk == K filter already yields exactly one row per event_type;
    # folding it through an Aggregate makes that bound VISIBLE to the
    # unbounded-broadcast guard (max over a single row is the row itself)
    ref = (
        top.where(F.col("rk") == _HILL_K)
        .groupBy("event_type")
        .agg(F.max("v").alias("x_ref"))
    )
    terms = (
        top.where(F.col("rk") < _HILL_K)
        .join(F.broadcast(ref), "event_type")
        .select(
            "event_type",
            F.floor(
                F.lit(1e9) * F.log(F.col("v").cast("double") / F.col("x_ref"))
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("ln_nano"),
        )
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_used"),
            F.sum("ln_nano").cast("bigint").alias("sum_ln_nano"),
        )
        .select(
            "event_type",
            "k_used",
            F.floor(
                F.lit(1e6) * F.col("k_used") * F.lit(1e9) / F.col("sum_ln_nano")
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("alpha_micro"),
        )
        .orderBy("event_type")
    )


_ORACLE_HILL = f"""
WITH top AS (
  SELECT event_type, v, rk FROM (
    SELECT event_type,
           cast(floor(value * 100.0 + 0.5) AS bigint) AS v,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY cast(floor(value * 100.0 + 0.5) AS bigint)
                                DESC, event_id ASC) AS rk
    FROM events WHERE cast(floor(value * 100.0 + 0.5) AS bigint) > 0
  ) WHERE rk <= {_HILL_K}
),
ref AS (SELECT event_type, v AS x_ref FROM top WHERE rk = {_HILL_K}),
terms AS (
  SELECT t.event_type,
         cast(floor(1e9 * ln(t.v * 1.0 / r.x_ref) + 0.5) AS bigint) AS ln_nano
  FROM top t JOIN ref r USING (event_type)
  WHERE t.rk < {_HILL_K}
)
SELECT event_type, count(*)::BIGINT AS k_used,
       cast(floor(1e6 * count(*) * 1e9 / sum(ln_nano) + 0.5) AS bigint)
         AS alpha_micro
FROM terms GROUP BY 1 ORDER BY event_type
"""


# --------------------------------------------------------------------------
# One-pass inferior-member dedup pruning (X2 [EXT])
# --------------------------------------------------------------------------


def q_dedup_prune_inferior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X2 one-pass dedup pruning: inside every near-dup pair
    (token Jaccard >= 0.8, the dedup_jaccard_pairs relation), the
    lower-quality member (shorter n_chars, doc_id tie-break) is marked
    inferior; survivors are docs never marked. Unlike full cluster
    collapse this needs NO transitive closure — one pair scan, one
    anti-join — the cheap first-cut that removes the bulk of
    duplication before the iterative pipeline runs. Reports per lang:
    docs in, docs pruned, docs surviving, chars surviving."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.jaccard_token_sets(
        d, threshold=0.8, block_cols=["lang"], length_window=16
    ).select("id_a", "id_b")
    meta = d.select("doc_id", "lang", "n_chars")
    j = (
        pairs.join(
            meta.select(
                F.col("doc_id").alias("id_a"),
                F.col("n_chars").alias("ca"),
            ),
            "id_a",
        )
        .join(
            meta.select(
                F.col("doc_id").alias("id_b"),
                F.col("n_chars").alias("cb"),
            ),
            "id_b",
        )
    )
    inferior = j.select(
        F.when(
            (F.col("ca") < F.col("cb"))
            | ((F.col("ca") == F.col("cb")) & (F.col("id_a") > F.col("id_b"))),
            F.col("id_a"),
        )
        .otherwise(F.col("id_b"))
        .alias("doc_id")
    ).distinct()
    survivors = meta.join(inferior, "doc_id", "left_anti")
    pruned = meta.join(inferior, "doc_id", "left_semi")
    return (
        meta.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_in"))
        .join(
            pruned.groupBy("lang").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_pruned")
            ),
            "lang",
            "left",
        )
        .join(
            survivors.groupBy("lang").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_out"),
                F.sum("n_chars").cast("bigint").alias("chars_out"),
            ),
            "lang",
            "left",
        )
        .select(
            "lang",
            "n_in",
            F.coalesce("n_pruned", F.lit(0)).cast("bigint").alias("n_pruned"),
            F.coalesce("n_out", F.lit(0)).cast("bigint").alias("n_out"),
            F.coalesce("chars_out", F.lit(0)).cast("bigint").alias("chars_out"),
        )
        .orderBy("lang")
    )


_ORACLE_PRUNE_INFERIOR = r"""
WITH toks AS (
  SELECT doc_id, lang, n_chars,
         list_distinct(list_filter(string_split_regex(lower(text), '\s+'),
                                   t -> t <> '')) AS tok_set
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         a.n_chars AS ca, b.n_chars AS cb
  FROM toks a JOIN toks b
    ON a.doc_id < b.doc_id AND a.lang = b.lang
   AND abs(a.n_chars - b.n_chars) <= 16
  WHERE len(list_intersect(a.tok_set, b.tok_set)) * 1.0
        / len(list_distinct(list_concat(a.tok_set, b.tok_set))) >= 0.8
),
inferior AS (
  SELECT DISTINCT CASE WHEN ca < cb OR (ca = cb AND id_a > id_b)
                       THEN id_a ELSE id_b END AS doc_id
  FROM pairs
),
meta AS (SELECT doc_id, lang, n_chars FROM documents)
SELECT m.lang,
       count(*)::BIGINT AS n_in,
       sum(CASE WHEN i.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_pruned,
       sum(CASE WHEN i.doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_out,
       sum(CASE WHEN i.doc_id IS NULL THEN m.n_chars ELSE 0 END)::BIGINT
         AS chars_out
FROM meta m LEFT JOIN inferior i USING (doc_id)
GROUP BY 1 ORDER BY lang
"""


REGISTRY_EXT63: dict[str, QuerySpec] = {
    "kaplan_meier_curve": QuerySpec(
        q_kaplan_meier_curve, _ORACLE_KM, "X7/X9 [EXT] survival analysis"
    ),
    "hill_tail_estimator": QuerySpec(
        q_hill_tail_estimator, _ORACLE_HILL, "X7 [EXT] heavy-tail index"
    ),
    "dedup_prune_inferior": QuerySpec(
        q_dedup_prune_inferior, _ORACLE_PRUNE_INFERIOR, "X2 [EXT] one-pass pruning"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_hill_tail_estimator.__doc__ = q_hill_tail_estimator.__doc__.format(k=_HILL_K)  # noqa: E501
