"""Operator registry, wave 29: curation capstones — quality-aware dedup
representative selection (keep the BEST duplicate, not the first) and
classifier evaluation metrics (per-class precision/recall/F1 of the
language-ID heuristic against labels).

Scale stances:
- keep-best: components come from the same blocked-pair + min-label
  propagation as dedup_collapse_components; the representative election
  is one window over (component) ranked by (quality desc, id) — the
  same shuffle the min-id rule needs, so quality-aware selection is
  free at scale. Choosing best-not-first is what production dedup does
  (drop the boilerplate copy, keep the clean one).
- eval metrics: predictions are a pure projection (the lang_id
  expression); the confusion aggregate is |classes|²-bounded and the
  metric table |classes|-sized. The evaluation pass costs one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import lang_id_expr
from .operators.dedup import connected_components, jaccard_token_sets
from .registry import QuerySpec, _t
from .registry_ext2 import _ORACLE_DEDUP_COLLAPSE

# --------------------------------------------------------------------------
# Quality-aware dedup representative (X2 [EXT])
# --------------------------------------------------------------------------


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X2 quality-aware near-dup collapse: same connected
    components as dedup_collapse_components (Jaccard >= 0.8, min-label
    propagation), but each cluster keeps its HIGHEST-quality member
    (chars-per-token micro score, doc_id tiebreak) instead of the
    smallest id — production dedup keeps the cleanest copy, not the
    earliest crawl. Output per cluster: the kept doc, its quality, and
    the cluster size; singletons keep themselves."""
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    pairs = jaccard_token_sets(d, threshold=0.8, block_cols=["lang"], length_window=16)
    comp = connected_components(pairs, d.select("doc_id"))
    quality = d.selectExpr(
        "doc_id",
        r"cast(floor(10000.0D * n_chars / greatest(size(filter(split(text, '\\s+'), t -> t <> '')), 1) + 0.5D) as bigint) as q_micro",
    )
    ranked = (
        comp.join(quality, "doc_id")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("component").orderBy(
                    F.desc("q_micro"), F.asc("doc_id")
                )
            ),
        )
    )
    kept = ranked.where(F.col("rn") == 1).select(
        "component", F.col("doc_id").alias("kept_doc_id"), F.col("q_micro").alias("kept_q_micro")
    )
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return (
        kept.join(sizes, "component")
        .select("kept_doc_id", "kept_q_micro", "cluster_size")
        .orderBy("kept_doc_id")
    )


# reuse the proven recursive-CTE component oracle, swap the election rule
_ORACLE_KEEP_BEST = (
    _ORACLE_DEDUP_COLLAPSE.split("labels AS")[0]
    + r"""labels AS (SELECT node, min(comp) AS component FROM walk GROUP BY node),
quality AS (
  SELECT doc_id,
         cast(floor(10000.0 * n_chars
              / greatest(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')), 1) + 0.5) AS bigint) AS q_micro
  FROM documents
),
ranked AS (
  SELECT l.component, l.node AS doc_id, q.q_micro,
         row_number() OVER (PARTITION BY l.component ORDER BY q.q_micro DESC, l.node ASC) AS rn
  FROM labels l JOIN quality q ON q.doc_id = l.node
),
sizes AS (SELECT component, cast(count(*) AS bigint) AS cluster_size FROM labels GROUP BY component)
SELECT r.doc_id AS kept_doc_id, r.q_micro AS kept_q_micro, s.cluster_size
FROM ranked r JOIN sizes s USING (component)
WHERE r.rn = 1
ORDER BY kept_doc_id
"""
)


# --------------------------------------------------------------------------
# Classifier evaluation metrics (X6/eval [EXT])
# --------------------------------------------------------------------------


def q_classifier_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6/eval per-class precision/recall/F1 of the stopword-marker
    language classifier (text_lang_id's expression) against the labeled
    lang column — the evaluation pass every curation classifier needs
    before it gates data. Predictions are one projection; tp/fp/fn come
    from a |classes|²-bounded confusion aggregate; metrics are
    micro-ints (0 where undefined). Classes = labeled langs; predictions
    outside the label set count as false negatives for their true
    class, the standard open-set convention."""
    d = _t(spark, sf_dir, "documents")
    pred = d.select(
        F.col("lang").alias("truth"), lang_id_expr(F.col("text")).alias("pred")
    )
    per_class = pred.groupBy(F.col("truth").alias("clazz")).agg(
        F.sum(F.when(F.col("pred") == F.col("truth"), 1).otherwise(0))
        .cast("double")
        .alias("tp"),
        F.count(F.lit(1)).cast("double").alias("n_true"),
    )
    pred_tot = pred.groupBy(F.col("pred").alias("clazz")).agg(
        F.count(F.lit(1)).cast("double").alias("n_pred")
    )
    m = per_class.join(pred_tot, "clazz", "left").na.fill({"n_pred": 0.0})
    prec = "CASE WHEN n_pred > 0 THEN tp / n_pred ELSE 0.0D END"
    rec = "CASE WHEN n_true > 0 THEN tp / n_true ELSE 0.0D END"
    f1 = (
        f"CASE WHEN ({prec}) + ({rec}) > 0"
        f" THEN 2.0D * ({prec}) * ({rec}) / (({prec}) + ({rec})) ELSE 0.0D END"
    )
    return (
        m.selectExpr(
            "clazz",
            "cast(tp as bigint) as tp",
            "cast(n_pred - tp as bigint) as fp",
            "cast(n_true - tp as bigint) as fn",
            f"cast(floor(1000000.0D * ({prec}) + 0.5D) as bigint) as precision_micro",
            f"cast(floor(1000000.0D * ({rec}) + 0.5D) as bigint) as recall_micro",
            f"cast(floor(1000000.0D * ({f1}) + 0.5D) as bigint) as f1_micro",
        )
        .orderBy("clazz")
    )


def _oracle_eval() -> str:
    from .registry import _lang_score_sql, LANG_PRIORITY

    scores = {lang: _lang_score_sql(lang) for lang in LANG_PRIORITY}
    greatest = "greatest(" + ", ".join(scores.values()) + ")"
    cases = " ".join(
        f"WHEN {scores[lang]} = {greatest} AND {greatest} > 0 THEN '{lang}'"
        for lang in LANG_PRIORITY
    )
    prec = "CASE WHEN n_pred > 0 THEN tp / n_pred ELSE 0.0 END"
    rec = "CASE WHEN n_true > 0 THEN tp / n_true ELSE 0.0 END"
    f1 = (
        f"CASE WHEN ({prec}) + ({rec}) > 0"
        f" THEN 2.0 * ({prec}) * ({rec}) / (({prec}) + ({rec})) ELSE 0.0 END"
    )
    return f"""
WITH pred AS (
  SELECT lang AS truth, CASE {cases} ELSE 'unknown' END AS pred FROM documents
),
per_class AS (
  SELECT truth AS clazz,
         cast(sum(CASE WHEN pred = truth THEN 1 ELSE 0 END) AS double) AS tp,
         cast(count(*) AS double) AS n_true
  FROM pred GROUP BY truth
),
pred_tot AS (
  SELECT pred AS clazz, cast(count(*) AS double) AS n_pred FROM pred GROUP BY pred
),
m AS (
  SELECT p.clazz, p.tp, p.n_true, coalesce(t.n_pred, 0.0) AS n_pred
  FROM per_class p LEFT JOIN pred_tot t USING (clazz)
)
SELECT clazz,
       cast(tp AS bigint) AS tp,
       cast(n_pred - tp AS bigint) AS fp,
       cast(n_true - tp AS bigint) AS fn,
       cast(floor(1000000.0 * ({prec}) + 0.5) AS bigint) AS precision_micro,
       cast(floor(1000000.0 * ({rec}) + 0.5) AS bigint) AS recall_micro,
       cast(floor(1000000.0 * ({f1}) + 0.5) AS bigint) AS f1_micro
FROM m ORDER BY clazz
"""


REGISTRY_EXT28: dict[str, QuerySpec] = {
    "dedup_keep_best": QuerySpec(
        q_dedup_keep_best, _ORACLE_KEEP_BEST, "X2 [EXT] quality-aware collapse"
    ),
    "classifier_eval_metrics": QuerySpec(
        q_classifier_eval_metrics, _oracle_eval(), "X6/eval [EXT] P/R/F1"
    ),
}
